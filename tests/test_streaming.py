"""D20 — streaming validation converges to the batch engine's rows.

Strategy (SURVEY.md §5.2 golden style): run the batch fused checks over a
fixture snapshot as ground truth, then stream the SAME files in small
micro-batches (maxFilesPerTrigger) and assert the streaming operators'
final output is row-identical:

- vocab checks (stateless, append): exact row multiset match;
- conv-state checks (stateful, update): latest emission per conv_id,
  unioned, equals the batch unique_key/turn_gap/turn_dup/ts_order rows;
- windowed stats: streaming complete-mode result equals the batch
  groupBy(window(ts)) on the same input.
"""

import os

import pytest

from pyspark.sql import functions as F

from schema_inference_spark.operators import checks as C
from schema_inference_spark.pipeline import ROLE_VOCAB, TOOL_VOCAB
from schema_inference_spark.streaming.stream_checks import (
    conv_state_checks,
    read_turn_stream,
    vocab_violations_stream,
    window_stats_stream,
)

SNAP = "s1"


@pytest.fixture(scope="module")
def snap_dir(fixture_root):
    return os.path.join(fixture_root, SNAP)


@pytest.fixture(scope="module")
def batch_df(spark, catalog):
    return catalog.read_snapshot(spark, SNAP)


@pytest.fixture(scope="module")
def batch_violations(spark, batch_df):
    rows = (C.check_rowlevel_fused(batch_df, SNAP, ROLE_VOCAB, TOOL_VOCAB)
            .collect())
    return {tuple(r) for r in rows}


def test_vocab_stream_matches_batch(spark, snap_dir, batch_violations,
                                    tmp_path):
    sdf = read_turn_stream(spark, snap_dir, max_files_per_trigger=3)
    out = vocab_violations_stream(sdf, SNAP, ROLE_VOCAB, TOOL_VOCAB)
    got = []
    q = (out.writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_vocab"))
         .foreachBatch(lambda df, _eid: got.extend(
             tuple(r) for r in df.collect()))
         .start())
    q.processAllAvailable()
    q.stop()
    want = {r for r in batch_violations if r[2] in ("ref_role", "ref_tool")}
    assert set(got) == want
    assert len(got) == len(want)  # append mode: no duplicates either


def test_conv_state_stream_converges_to_batch(spark, snap_dir,
                                              batch_violations, tmp_path):
    sdf = read_turn_stream(spark, snap_dir, max_files_per_trigger=2)
    out = conv_state_checks(sdf, SNAP)
    latest = {}  # conv_id -> set of rows from its most recent emission

    def collect(df, _epoch):
        for conv_id, rows in df.toPandas().groupby("conv_id"):
            latest[conv_id] = {
                tuple(None if v != v or v is None else v for v in r)
                for r in rows.itertuples(index=False, name=None)}

    q = (out.writeStream.outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_state"))
         .foreachBatch(collect)
         .start())
    q.processAllAvailable()
    q.stop()
    got = set().union(*latest.values()) if latest else set()
    got = {(s, int(p) if p is not None else None, c, m, s1, s2, cv,
            int(t), pl) for (s, p, c, m, s1, s2, cv, t, pl) in got}
    want = {r for r in batch_violations
            if r[2] in ("unique_key", "turn_gap", "turn_dup", "ts_order")}
    assert got == want


def test_window_stats_stream_matches_batch(spark, snap_dir, batch_df,
                                           tmp_path):
    sdf = read_turn_stream(spark, snap_dir, max_files_per_trigger=4)
    out = window_stats_stream(sdf, "1 hour")
    q = (out.writeStream.outputMode("complete")
         .format("memory").queryName("win_stats")
         .option("checkpointLocation", str(tmp_path / "ckpt_win"))
         .start())
    q.processAllAvailable()
    q.stop()
    got = {tuple(r) for r in spark.table("win_stats").collect()}
    want = {tuple(r) for r in
            window_stats_stream_batch_equiv(batch_df).collect()}
    assert got == want
    assert len(want) > 1  # fixture spans multiple hourly windows


def window_stats_stream_batch_equiv(df):
    return (df.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.col("tool").isNull().cast("long")).alias("n_tool_null"),
                 F.min("turn_idx").alias("min_turn"),
                 F.max("turn_idx").alias("max_turn"),
                 F.avg(F.length("text")).alias("avg_text_len"))
            .select(F.col("w.start").alias("w_start"),
                    F.col("w.end").alias("w_end"),
                    "n_rows", "n_tool_null", "min_turn", "max_turn",
                    "avg_text_len"))
