"""Semi-structured (JSON string column) schema census.

The reference is a schema-INFERENCE engine (`util.clj` infers the type
of values it is shown); the engine analog over a relational corpus is a
typed census of the one column whose schema is NOT declared — the JSON
payload blob every transcript/event table carries (`props` here; tool
arguments, metadata, client context in production transcripts). This
module infers, per JSON key, how often it appears and what value type
it carries, as COUNTS rather than a single verdict — the by-value
failure-reporting philosophy of the reference (`util.clj`'s failure
objects) applied to semi-structured payloads: a key that is int in
99.99% of rows and string in 12 rows yields 12 in the gap between
``n_present`` and ``n_int``, not an exception.

Scale shape: ``from_json`` + ``explode`` are JVM generators inside
WholeStageCodegen (no Python, no UDF); the only shuffle is the final
groupBy on the key name, whose cardinality is the payload vocabulary
(tiny), with map-side partial aggregation doing almost all the work.
At 100 TB this is a single scan producing a KB-sized result.

Semantics notes (shared contract with the DuckDB oracle mirror):
- "valid" means *parses as a JSON object* — scalars/arrays/malformed
  all count as invalid (``from_json`` to a map returns null for each;
  the SQL mirror is ``json_valid(x) AND json_type(x)='OBJECT'``).
- nested values are carried as their JSON text (map<string,string>);
  a numeric census sees them as non-numeric, which is the point.
- key names are assumed not to contain '.', '"' or '$' (the oracle's
  dynamic '$.'||key path would diverge); transcript payload vocabs
  satisfy this, and the census itself would surface such keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def json_key_census(df: DataFrame, json_col: str) -> DataFrame:
    """Per-key typed census of a JSON object column: one row per key
    observed anywhere in the corpus with

    - ``n_present``: rows whose object carries the key
    - ``n_int``:     of those, values that parse as exact integers
    - ``min_int`` / ``max_int``: integer value range (null if none)

    ``n_present - n_int`` is the by-value type-violation count per key
    — the census IS the schema inference, and its gaps are the failure
    report.

    "integer" is regex-gated (``^-?[0-9]+$``) rather than try_cast
    because cast semantics diverge across engines (DuckDB
    ``try_cast('8.5' AS BIGINT)`` ROUNDS to 9; Spark yields null) — the
    regex is the one formula both engines compute identically."""
    from .dedup import eval_once

    # from_json is CodegenFallback and the null-filter pushdown inlines
    # it into both the filter and the explode — the eval_once barrier
    # parses each row exactly once
    parsed = F.from_json(F.col(json_col), "map<string,string>")
    kv = (eval_once(df.select(F.col(json_col)), "_m", parsed)
          .filter(F.col("_m").isNotNull())
          .select(F.explode("_m").alias("key", "_val")))
    as_int = F.when(F.col("_val").rlike("^-?[0-9]+$"),
                    F.col("_val").cast("bigint"))
    return (kv.groupBy("key")
            .agg(F.count(F.lit(1)).alias("n_present"),
                 F.count(as_int).alias("n_int"),
                 F.min(as_int).alias("min_int"),
                 F.max(as_int).alias("max_int"))
            .select("key",
                    F.col("n_present").cast("bigint").alias("n_present"),
                    F.col("n_int").cast("bigint").alias("n_int"),
                    "min_int", "max_int"))


def json_validity(df: DataFrame, json_col: str) -> DataFrame:
    """One-row validity summary of a JSON object column: total rows,
    non-null rows, and rows that are non-null yet do NOT parse as a
    JSON object (malformed, scalar, or array payloads) — the
    text_validity analog for the semi-structured column, same
    single-scan zero-shuffle shape."""
    parsed = F.from_json(F.col(json_col), "map<string,string>")
    nn = F.col(json_col).isNotNull()
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(nn.cast("int")).cast("bigint").alias("n_present"),
        F.sum((nn & parsed.isNull()).cast("int")).cast("bigint")
         .alias("n_invalid"))


def json_schema_drift(df: DataFrame, json_col: str, ts_col: str) -> DataFrame:
    """Payload schema EVOLUTION: the per-key census computed on the two
    time-halves of the corpus (split at the midpoint of the observed
    time range — exact integer microseconds, the transition_drift
    split), full-outer-joined per key with a verdict:

    - ``added``      key absent early, present late (producer started
                     emitting a new field)
    - ``dropped``    present early, absent late (field removed — the
                     change that silently breaks downstream extractors)
    - ``type_shift`` present in both, but the integer share moved across
                     the all-or-nothing boundary (was always-int, now
                     carries non-ints, or vice versa)
    - ``ok``         stable

    This is the reference's schema-inference unify step lifted across
    TIME: two inferred payload schemas, diffed by key. Counts are exact
    integers; the midpoint is exact; both halves are computed in ONE
    conditional aggregation over the exploded keys (map-side partials
    collapse to the tiny key vocabulary), so the corpus is JSON-parsed
    twice total — once for the midpoint scalar, once for the census —
    instead of once per half per subtree (the earlier full-outer-join
    form re-parsed it 4x and shuffled twice; absent-in-a-half keys now
    carry count 0 where the join carried NULL, which the verdict
    already coalesced to 0)."""
    from .dedup import eval_once

    # same eval_once barrier as json_key_census: each branch (midpoint
    # scalar, key census) parses the payload once per row, not once per
    # inlined reference
    parsed = F.from_json(F.col(json_col), "map<string,string>")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = (eval_once(df.select(F.col(json_col), us.alias("_us")), "_m",
                      parsed)
            .select("_m", "_us")
            .filter(F.col("_m").isNotNull()))
    mid = base.agg(F.floor((F.min("_us") + F.max("_us")) / 2)
                   .cast("bigint").alias("_mid"))
    kv = (base.join(F.broadcast(mid))
          .select(F.explode("_m").alias("key", "_val"),
                  (F.col("_us") < F.col("_mid")).alias("_early")))
    is_int = F.col("_val").rlike("^-?[0-9]+$").cast("int")

    one = F.lit(1)
    j = kv.groupBy("key").agg(
        F.sum(F.when(F.col("_early"), one).otherwise(0)).alias("n_early"),
        F.sum(F.when(F.col("_early"), is_int).otherwise(0))
         .alias("n_int_early"),
        F.sum(F.when(~F.col("_early"), one).otherwise(0)).alias("n_late"),
        F.sum(F.when(~F.col("_early"), is_int).otherwise(0))
         .alias("n_int_late"))
    n_e, n_l = F.col("n_early"), F.col("n_late")
    all_int_e = F.col("n_int_early") == n_e
    all_int_l = F.col("n_int_late") == n_l
    verdict = (F.when(n_e == 0, "added")
               .when(n_l == 0, "dropped")
               .when(all_int_e != all_int_l, "type_shift")
               .otherwise("ok"))
    return j.select(
        "key",
        n_e.cast("bigint").alias("n_early"),
        F.col("n_int_early").cast("bigint").alias("n_int_early"),
        n_l.cast("bigint").alias("n_late"),
        F.col("n_int_late").cast("bigint").alias("n_int_late"),
        verdict.alias("verdict"))
