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
    parsed = F.from_json(F.col(json_col), "map<string,string>")
    kv = (df.select(parsed.alias("_m"))
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
