"""As-of (point-in-time) join — the temporal-enrichment primitive.

A transcripts/agent-events pipeline constantly needs "the most recent X
at or before this turn": the model config active when a conversation
ran, the last tool-registry snapshot before a tool call, the latest
price quote before a purchase event. Spark has no ASOF JOIN; the naive
encodings are a range join (quadratic blowup per key) or a broadcast of
one side (dies when both sides are large).

This implementation is the union-window plan — the only shape that
survives two 100-TB sides:

  1. project both sides onto one schema, tag probe rows side=1 and
     reference rows side=0 (reference payload carried in ONE nullable
     struct so legitimately-NULL payload fields survive);
  2. union (no shuffle yet — union is plan-level concatenation);
  3. one window over (keys) ordered by (event time, side):
     ``last(payload, ignorenulls=True)`` carries the most recent
     reference payload forward onto every probe row.

Cost: exactly ONE hash exchange on the join keys plus a per-partition
sort — identical to any windowed aggregation, with zero row
amplification (|L| + |R| rows move, never |L| x |R|). At equal
timestamps the side tiebreak makes the match INCLUSIVE (reference row
at ts == probe ts wins), matching DuckDB/pandas ``merge_asof``
``direction='backward'`` semantics (allow_exact_matches=True).

Skew: a hot join key serializes its sort into one task. The standard
mitigation — pre-bucketing time into coarse ranges and unioning a
carry-forward row per bucket boundary — composes on top of this
operator; at transcript scale the key (conv_id / user_id) matches the
partitioning every other per-key check uses, so the Exchange is shared.

Reference parity: the reference engine (thelmuth/schema-inference) has
no relational surface; this operator belongs to the engine-gap family
(SURVEY.md §2.D, joins D22) extended per the round-1 brief ("as-of
join" named as a required custom operator).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Optional[List[str]] = None,
    direction: str = "backward",
    tolerance_s: Optional[float] = None,
) -> DataFrame:
    """For every left row, attach the nearest right row per key:
    at-or-before ``left_ts`` (``direction='backward'``) or at-or-after
    (``'forward'``). Adds one column per entry of ``value_cols`` plus
    ``matched_ts`` (the matched right row's timestamp, NULL when no
    match / outside ``tolerance_s``).

    Ties on the right side (two right rows sharing (key, ts)) are
    resolved by whichever sorts last within the window frame — callers
    needing exact determinism should pre-aggregate the right side to
    one row per (key, ts), which is also what keeps the oracle
    (DuckDB ASOF) well-defined.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    keys = list(on)
    value_cols = list(value_cols or
                      [c for c in right.columns
                       if c not in keys and c != right_ts])

    # one nullable struct carries the right payload + its timestamp, so
    # NULL payload *fields* survive last(ignorenulls) — only the struct
    # itself is null (on probe rows / unmatched keys).
    payload = F.struct(
        F.col(right_ts).cast("timestamp").alias("matched_ts"),
        *[F.col(c).alias(c) for c in value_cols])

    left_cols = left.columns
    probe = left.select(
        *left_cols,
        F.col(left_ts).cast("timestamp").alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(
            f"struct<matched_ts:timestamp,{','.join(f'{c}:' + dict(right.dtypes)[c] for c in value_cols)}>"
        ).alias(_PAYLOAD))
    # key columns must carry the REAL right-side key values (they define
    # the window partition); only non-key left payload columns are nulled
    left_types = dict(left.dtypes)
    ref = right.select(
        *[(F.col(c).cast(left_types[c]).alias(c) if c in keys
           else F.lit(None).cast(left_types.get(c, "string")).alias(c))
          for c in left_cols],
        F.col(right_ts).cast("timestamp").alias(_TS),
        F.lit(0).alias(_SIDE),
        payload.alias(_PAYLOAD))

    unioned = probe.unionByName(ref)
    if direction == "backward":
        order = [F.col(_TS).asc(), F.col(_SIDE).asc()]
    else:
        order = [F.col(_TS).desc(), F.col(_SIDE).asc()]
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    matched = F.last(_PAYLOAD, ignorenulls=True).over(w)
    out = (unioned
           .withColumn(_PAYLOAD, matched)
           .filter(F.col(_SIDE) == 1))

    if tolerance_s is not None:
        delta = F.abs(F.col(_TS).cast("double")
                      - F.col(_PAYLOAD)["matched_ts"].cast("double"))
        out = out.withColumn(
            _PAYLOAD, F.when(delta <= float(tolerance_s), F.col(_PAYLOAD)))

    return out.select(
        *left_cols,
        F.col(_PAYLOAD)["matched_ts"].alias("matched_ts"),
        *[F.col(_PAYLOAD)[c].alias(c) for c in value_cols])


def interval_join(
    probes: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    probe_ts: str,
    start_ts: str,
    end_ts: str,
    value_cols: Sequence[str],
    bin_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Range (interval-containment) join: every (probe, interval) pair
    sharing the ``on`` keys with ``start_ts <= probe_ts <= end_ts``
    (inclusive both ends) — "which maintenance window / session /
    config epoch was active when this event fired". Spark plans a raw
    BETWEEN predicate as a nested-loop join (quadratic per key); this
    is the binned encoding that survives two large sides:

      1. each interval explodes onto the fixed-width time bins it
         touches (``sequence(floor(start/bin), floor(end/bin))`` —
         expansion = span/bin + 1 rows, bounded by choosing
         ``bin_seconds`` near the typical interval length);
      2. each probe maps to exactly ONE bin;
      3. equi-join on (keys..., bin) — a plain shuffled hash/merge
         join Catalyst can plan, size-estimate, and AQE-skew-split —
         then the exact BETWEEN filter.

    No dedup step is needed: an interval occupies each of its bins
    once and a probe lives in one bin, so a qualifying pair meets
    exactly once. Matches multiply per probe (unlike asof_join's
    most-recent-one). ``how='inner'`` drops probes matching nothing;
    ``how='left'`` keeps them with null interval columns (the BETWEEN
    predicate rides the join condition, so a left join's misses
    survive it). Timestamps compare in exact integer microseconds."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left: {how}")
    bin_us = int(bin_seconds) * 1_000_000
    p_us = F.unix_micros(F.col(probe_ts).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_ts).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_ts).cast("timestamp"))
    keys = list(on)
    p = probes.select(*probes.columns, p_us.alias("_p_us"),
                      F.floor(p_us / bin_us).alias("_bin"))
    iv = (intervals.select(*[F.col(k).alias(f"_iv_{k}") for k in keys],
                           s_us.alias("_s_us"), e_us.alias("_e_us"),
                           *[F.col(c) for c in value_cols])
          .withColumn("_bin", F.explode(F.sequence(
              F.floor(F.col("_s_us") / bin_us),
              F.floor(F.col("_e_us") / bin_us)))))
    conds = ([p[k] == iv[f"_iv_{k}"] for k in keys]
             + [p["_bin"] == iv["_bin"],
                p["_p_us"] >= iv["_s_us"], p["_p_us"] <= iv["_e_us"]])
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    out = p.join(iv, cond, how)
    return out.select(*probes.columns,
                      F.col("_s_us").alias("interval_start_us"),
                      F.col("_e_us").alias("interval_end_us"),
                      *[F.col(c) for c in value_cols])
