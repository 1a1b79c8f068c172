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


def test_state_ttl_evicts_abandoned_conversations(spark, tmp_path):
    """An idle conversation's state is dropped after the TTL: eviction
    itself emits nothing (the last update-mode emission stands as final),
    and a late duplicate arriving after eviction is counted against a
    FRESH state (n_copies restarts at 2, not 4) — proving the evicted
    arrays are gone, i.e. state is bounded.

    Note on pacing: with processing-time timeouts registered, Spark
    schedules micro-batches continuously even with no new data (timers
    must be checked), so the test polls the emission log instead of
    processAllAvailable() — which never settles on such a stream. Prod
    paces the same loop with trigger(processingTime=...).
    """
    import datetime
    import json
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    stream_dir = tmp_path / "ttl_stream"
    (stream_dir / "bucket=0").mkdir(parents=True)
    base = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)

    def write_file(name, rows):
        t = pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array(["t"] * len(rows), pa.string()),
            "tool": pa.array([None] * len(rows), pa.string()),
            "ts": pa.array([base + datetime.timedelta(minutes=r[1])
                            for r in rows], pa.timestamp("us", tz="UTC")),
        })
        pq.write_table(t, str(stream_dir / "bucket=0" / name))

    sdf = read_turn_stream(spark, str(stream_dir))
    out = conv_state_checks(sdf, "ttl", state_ttl_ms=300)
    emissions = []  # (conv_id, check_id, payload) per emitted row

    def collect(df, _epoch):
        emissions.extend((r.conv_id, r.check_id, r.payload)
                         for r in df.collect())

    def wait_for(pred, timeout_s=90):
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            if pred():
                return
            time.sleep(0.2)
        raise AssertionError("condition not reached within timeout")

    # file 1: conv A with a duplicated turn -> unique_key(n_copies=2)
    write_file("f1.parquet", [("A", 1), ("A", 1), ("A", 2)])
    q = (out.writeStream.outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_ttl"))
         .foreachBatch(collect)
         .start())
    try:
        wait_for(lambda: any(c == "unique_key" for (_, c, _) in emissions))
        n_first = len(emissions)
        assert {c for (cv, c, _) in emissions if cv == "A"} == \
            {"unique_key", "turn_dup"}

        # idle past the TTL: timer batches run, A is evicted — and the
        # eviction emits NOTHING (no re-emission of A's violations)
        time.sleep(1.5)
        assert emissions[n_first:] == []

        # a late duplicate of turn 1 arrives AFTER eviction: fresh state,
        # so the duplicate count restarts at 2 — with retained state it
        # would be 4 (documented late-data tradeoff; proves the evicted
        # arrays are gone)
        write_file("f3.parquet", [("A", 1), ("A", 1)])
        wait_for(lambda: len(emissions) > n_first)
        late = [(c, p) for (cv, c, p) in emissions[n_first:] if cv == "A"]
        uk = [json.loads(p) for (c, p) in late if c == "unique_key"]
        assert uk == [{"n_copies": 2}]
    finally:
        q.stop()


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


def test_drift_stream_matches_batch_twin_and_flags_shift(spark, snap_dir,
                                                         batch_df, tmp_path):
    """D13 x D20: windowed PSI against a baseline KLL. (1) the streaming
    plan equals the identical plan run in batch over the same rows;
    (2) a planted distribution shift (text length doubled) drifts every
    window while the unshifted stream stays below it."""
    from schema_inference_spark.streaming.stream_checks import drift_stream

    kll = bytes(batch_df.select(
        F.kll_sketch_agg_double(F.length("text").cast("double"))
        .alias("k")).collect()[0]["k"])

    def run_stream(transform, ckpt):
        sdf = transform(read_turn_stream(spark, snap_dir,
                                         max_files_per_trigger=3))
        out = drift_stream(sdf, kll, window_duration="4 hours",
                           min_rows=50)
        rows = {}
        q = (out.writeStream.outputMode("complete")
             .option("checkpointLocation", str(tmp_path / ckpt))
             .foreachBatch(lambda df, _eid: rows.update(
                 {r["w_start"]: tuple(r) for r in df.collect()}))
             .start())
        q.processAllAvailable()
        q.stop()
        return rows

    # (1) exactness vs the batch twin (same plan, static input)
    got = run_stream(lambda s: s, "ckpt_drift")
    want = {r["w_start"]: tuple(r)
            for r in drift_stream(batch_df, kll, window_duration="4 hours",
                                  min_rows=50).collect()}
    assert got == want
    assert len(want) > 1

    # (2) planted shift: double every text -> length distribution moves.
    # Compare on windows past the min_rows gate (partial edge windows
    # are emitted but not flag-eligible).
    shifted = run_stream(
        lambda s: s.withColumn("text", F.concat("text", "text")),
        "ckpt_drift_shift")
    gated_shift = {k: r for k, r in shifted.items() if r[2] >= 50}
    gated_base = {k: r for k, r in got.items() if r[2] >= 50}
    assert gated_shift and gated_base
    assert all(r[-1] for r in gated_shift.values())      # drifted everywhere
    assert max(r[3] for r in gated_base.values()) < min(
        r[3] for r in gated_shift.values())              # psi separation


def test_pii_stream_matches_batch(spark, tmp_path):
    """pii_stream is the stateless stream form of operators.pii.pii_flags:
    streaming the files in micro-batches yields exactly the batch
    operator's nonzero rows, once each (append mode)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from schema_inference_spark.operators.pii import pii_flags
    from schema_inference_spark.streaming.stream_checks import pii_stream

    stream_dir = tmp_path / "pii_stream"
    base = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    texts = [
        "clean turn",
        "write to ops@example.com or 10.1.2.3",
        "ssn 123-45-6789",
        "dial 555-123-4567 then 555-987-6543",
        "also clean",
        "a@b.io plus 1.2.3.4 plus 999-88-7777",
    ]
    for bucket in (0, 1):
        (stream_dir / f"bucket={bucket}").mkdir(parents=True)
        rows = list(enumerate(texts))
        t = pa.table({
            "conv_id": pa.array([f"c{bucket}"] * len(rows), pa.string()),
            "turn_idx": pa.array([i for i, _ in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([tx for _, tx in rows], pa.string()),
            "tool": pa.array([None] * len(rows), pa.string()),
            "ts": pa.array([base + datetime.timedelta(minutes=i)
                            for i, _ in rows], pa.timestamp("us", tz="UTC")),
        })
        # two files per bucket so maxFilesPerTrigger makes >1 micro-batch
        pq.write_table(t.slice(0, 3), str(stream_dir / f"bucket={bucket}"
                                          / "part-0.parquet"))
        pq.write_table(t.slice(3), str(stream_dir / f"bucket={bucket}"
                                       / "part-1.parquet"))

    sdf = read_turn_stream(spark, str(stream_dir), max_files_per_trigger=1)
    got = []
    q = (pii_stream(sdf).writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_pii"))
         .foreachBatch(lambda df, _eid: got.extend(df.collect()))
         .start())
    q.processAllAvailable()
    q.stop()

    batch = spark.read.schema(
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, bucket int"
    ).option("basePath", str(stream_dir)).parquet(str(stream_dir / "bucket=*"))
    flags = pii_flags(batch.withColumn(
        "doc_id", F.col("turn_idx").cast("bigint")), id_col="doc_id")
    # batch operator keys by doc_id only; rebuild the per-(conv, turn)
    # expectation from the raw frame with the same expressions
    want = {(r.conv_id, r.turn_idx, r.bucket)
            for r in batch.collect()
            if any(tok in (r.text or "") for tok in ("@", "-45-", "555-",
                                                     "10.1", "1.2.3", "-88-"))}
    got_keys = {(r.conv_id, r.turn_idx, r.partition_id) for r in got}
    assert got_keys == want
    assert len(got) == len(got_keys)  # append mode: no duplicates
    # per-class counts agree with the batch operator on a spot row
    by_key = {(r.conv_id, r.turn_idx): r for r in got}
    spot = by_key[("c0", 3)]
    assert (spot.n_phone, spot.n_pii) == (2, 2)
    fl = {r.doc_id: r for r in flags.collect()}
    assert fl[3].n_phone == 2 and fl[1].n_email == 1 and fl[1].n_ipv4 == 1


def test_dedup_stream_ttl_evicts_idle_hashes(spark, tmp_path):
    """dedup_stream's state_ttl_ms contract: an idle content hash is
    evicted (eviction emits nothing), and a duplicate re-delivered
    AFTER eviction re-reports against a FRESH canonical — the
    documented late-data tradeoff, proving per-hash state is bounded.
    Same pacing note as the conv-state TTL test: with processing-time
    timeouts registered, processAllAvailable() never settles, so the
    test polls the emission log."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from schema_inference_spark.streaming.stream_checks import dedup_stream

    stream_dir = tmp_path / "ttl_dedup_stream"
    stream_dir.mkdir()

    def write_file(name, rows):
        pq.write_table(pa.table({
            "doc_id": pa.array([i for i, _ in rows], pa.int64()),
            "text": pa.array([t for _, t in rows], pa.string()),
        }), str(stream_dir / name))

    def wait_for(pred, timeout_s=90):
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            if pred():
                return
            time.sleep(0.2)
        raise AssertionError("condition not reached within timeout")

    sdf = (spark.readStream.schema("doc_id bigint, text string")
           .parquet(str(stream_dir)))
    got = []
    write_file("f1.parquet", [(1, "same body"), (2, "same  BODY")])
    q = (dedup_stream(sdf, state_ttl_ms=300).writeStream
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_dedup_ttl"))
         .foreachBatch(lambda df, _eid: got.extend(df.collect()))
         .start())
    try:
        wait_for(lambda: len(got) >= 1)
        assert [(r.doc_id, r.canonical_id) for r in got] == [(2, 1)]
        n_first = len(got)

        # idle past the TTL: the hash's state is dropped; the eviction
        # batch itself emits no rows. 2.5s against a 300ms TTL — the
        # margin absorbs a slow timer batch on a loaded host (the
        # no-data batches that fire timeouts run continuously)
        time.sleep(2.5)
        assert got[n_first:] == []

        # duplicates re-delivered after eviction (one batch, so the TTL
        # cannot race between them): fresh state, so doc 3 becomes its
        # own NEW canonical and doc 4 reports against 3 — with retained
        # state both would have reported against the evicted canonical 1
        write_file("f2.parquet", [(3, "SAME body"), (4, "same body")])
        wait_for(lambda: len(got) > n_first)
        assert [(r.doc_id, r.canonical_id) for r in got[n_first:]] \
            == [(4, 3)]
    finally:
        q.stop()


def test_near_dup_stream_matches_per_batch_probe(spark, tmp_path):
    """near_dup_stream probes each micro-batch against the STATIC
    two-table MinHash index exactly as the batch operator would probe
    that ingest: per-epoch reports equal near_dup_against_index run on
    the same batch, and batches never see each other's state (cross
    -batch memory is the index's job)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from schema_inference_spark.operators.dedup import (
        build_minhash_index,
        build_minhash_sigs,
        near_dup_against_index,
    )
    from schema_inference_spark.streaming.stream_checks import (
        near_dup_stream,
    )

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away home tonight")
    other = ("completely different words in this other document about "
             "spark engines and their shuffle behavior at scale")
    corpus = spark.createDataFrame(
        [(1, base), (2, other)], "doc_id bigint, text string")
    idx, sigs = build_minhash_index(corpus), build_minhash_sigs(corpus)

    stream_dir = tmp_path / "ingest_stream"
    stream_dir.mkdir()
    part0 = [(10, base.replace("tonight", "today")),
             (11, "utterly unrelated text about databases and storage")]
    part1 = [(20, other.replace("scale", "volume")),
             (21, base.replace("quick", "sly"))]
    for age, (name, rows) in enumerate(
            (("part-0.parquet", part0), ("part-1.parquet", part1))):
        pq.write_table(pa.table({
            "doc_id": pa.array([i for i, _ in rows], pa.int64()),
            "text": pa.array([t for _, t in rows], pa.string()),
        }), str(stream_dir / name))
        os.utime(str(stream_dir / name), (1_000_000 + age,) * 2)

    sdf = (spark.readStream.schema("doc_id bigint, text string")
           .option("maxFilesPerTrigger", "1")
           .parquet(str(stream_dir)))
    got = {}

    def emit(report, epoch_id):
        got[epoch_id] = {tuple(r) for r in report.collect()}

    q = (near_dup_stream(sdf, idx, sigs, emit)
         .option("checkpointLocation", str(tmp_path / "ckpt_near_dup"))
         .start())
    q.processAllAvailable()
    q.stop()

    want = []
    for rows in (part0, part1):
        b = spark.createDataFrame(rows, "doc_id bigint, text string")
        want.append({tuple(r) for r in
                     near_dup_against_index(b, idx, sigs).collect()})
    emitted = [got[e] for e in sorted(got)]
    assert emitted == want
    # the planted near-dups really surfaced, in their own epochs
    assert {p[:2] for p in emitted[0]} == {(10, 1)}
    assert {p[:2] for p in emitted[1]} == {(20, 2), (21, 1)}


def test_dedup_stream_expands_batch_groups(spark, tmp_path):
    """dedup_stream is the stateful stream form of dedup.exact_dup_groups:
    after full ingest, the emitted (hash, dup, canonical) rows expand the
    batch groups exactly — each group's non-canonical members reported
    once, against the first-seen canonical (== the batch min-id canonical
    when arrival order follows id order, as engineered here: part-0
    carries the low ids and is listed first)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from schema_inference_spark.operators.dedup import exact_dup_groups
    from schema_inference_spark.streaming.stream_checks import dedup_stream

    stream_dir = tmp_path / "docs_stream"
    stream_dir.mkdir()
    # texts normalize-equal across case/whitespace; group A spans both
    # files (cross-batch dup), group B duplicates within part-0
    # (within-batch tie -> min id canonical), ids 4/5 unique
    part0 = [(0, "The Quick  brown fox"), (1, "some unique text one"),
             (2, "the quick brown fox"), (3, "ANOTHER duplicate body")]
    part1 = [(4, "the   quick BROWN fox"), (5, "another  duplicate body"),
             (6, "some unique text two")]
    # part-2 RE-DELIVERS group A's canonical (at-least-once source): it
    # must not self-report as its own duplicate — the idempotence
    # contract shared with dedup_against_index
    part2 = [(0, "the quick  BROWN fox")]
    for age, (name, rows) in enumerate(
            (("part-0.parquet", part0), ("part-1.parquet", part1),
             ("part-2.parquet", part2))):
        pq.write_table(pa.table({
            "doc_id": pa.array([i for i, _ in rows], pa.int64()),
            "text": pa.array([t for _, t in rows], pa.string()),
        }), str(stream_dir / name))
        # the file source orders by modification time; same-ms writes
        # make the order (and thus first-seen canonicals) flaky, so pin
        # part-0 strictly earlier
        os.utime(str(stream_dir / name), (1_000_000 + age, 1_000_000 + age))

    sdf = (spark.readStream.schema("doc_id bigint, text string")
           .option("maxFilesPerTrigger", "1")
           .parquet(str(stream_dir)))
    got = []
    q = (dedup_stream(sdf).writeStream.outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
         .foreachBatch(lambda df, _eid: got.extend(df.collect()))
         .start())
    q.processAllAvailable()
    q.stop()

    batch = spark.read.schema("doc_id bigint, text string").parquet(
        str(stream_dir))
    groups = exact_dup_groups(batch).collect()
    from pyspark.sql import functions as FF
    from schema_inference_spark.operators.dedup import normalized
    members = {}
    for r in batch.select(
            FF.md5(normalized(FF.col("text"))).alias("h"), "doc_id").collect():
        members.setdefault(r.h, set()).add(r.doc_id)
    want = {(g.content_hash, i, g.canonical_id)
            for g in groups
            for i in members[g.content_hash] - {g.canonical_id}}
    assert {(r.content_hash, r.doc_id, r.canonical_id) for r in got} == want
    assert len(got) == len(want)        # each duplicate reported once
    assert want                          # fixture really planted dups


def test_segment_dedup_stream_matches_per_batch_probe(spark, tmp_path):
    """segment_dedup_stream cleans each micro-batch against the STATIC
    segment index exactly as the batch operator would clean that
    ingest; batches never see each other's segments (cross-batch
    memory is the index's job)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from schema_inference_spark.operators.dedup import (
        build_segment_index,
        segment_dedup_against_index,
    )
    from schema_inference_spark.streaming.stream_checks import (
        segment_dedup_stream,
    )

    seg = lambda c: " ".join(f"{c}{i}" for i in range(10))  # noqa: E731
    hist = spark.createDataFrame([(1, f"{seg('a')} {seg('b')}")],
                                 "doc_id bigint, text string")
    idx = build_segment_index(hist)

    part0 = [(10, f"{seg('a')} {seg('c')}")]     # a indexed, c new
    part1 = [(20, f"{seg('c')} {seg('d')}")]     # c NOT indexed here:
    # the static index was never updated, so epoch 1 keeps c AND d —
    # exactly what the batch probe against the same index computes
    stream_dir = tmp_path / "seg_stream"
    stream_dir.mkdir()
    for age, (name, rows) in enumerate(
            (("part-0.parquet", part0), ("part-1.parquet", part1))):
        pq.write_table(pa.table({
            "doc_id": pa.array([i for i, _ in rows], pa.int64()),
            "text": pa.array([t for _, t in rows], pa.string()),
        }), str(stream_dir / name))
        os.utime(str(stream_dir / name), (1_000_000 + age,) * 2)

    sdf = (spark.readStream.schema("doc_id bigint, text string")
           .option("maxFilesPerTrigger", "1")
           .parquet(str(stream_dir)))
    got = {}

    def emit(clean, epoch_id):
        got[epoch_id] = {tuple(r) for r in clean.collect()}

    q = (segment_dedup_stream(sdf, idx, emit)
         .option("checkpointLocation", str(tmp_path / "ckpt_seg"))
         .start())
    q.processAllAvailable()
    q.stop()

    assert len(got) == 2
    for epoch, rows in enumerate((part0, part1)):
        batch = spark.createDataFrame(rows, "doc_id bigint, text string")
        want = {tuple(r) for r in
                segment_dedup_against_index(batch, idx).collect()}
        assert got[epoch] == want, epoch
    # and the epoch-1 content is the documented static-index semantics
    assert any(r[3] == f"{seg('c')} {seg('d')}" for r in got[1])


def test_assembly_stream_exports_on_idle(spark, tmp_path):
    """assembly_stream: a conversation is exported once when idle past
    the TTL, with the row equal to the batch fold over the same turns;
    state is dropped (no re-emission while idle continues)."""
    import datetime
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from schema_inference_spark.operators.conversations import (
        assemble_conversations,
    )
    from schema_inference_spark.streaming.stream_checks import (
        assembly_stream,
        read_turn_stream,
    )

    stream_dir = tmp_path / "asm_stream"
    (stream_dir / "bucket=0").mkdir(parents=True)
    base = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    rows = [("A", 0, "system"), ("A", 1, "user"), ("A", 2, "assistant"),
            ("B", 0, "user"), ("B", 1, "assistant")]

    def to_table(rs):
        return pa.table({
            "conv_id": pa.array([r[0] for r in rs], pa.string()),
            "turn_idx": pa.array([r[1] for r in rs], pa.int32()),
            "role": pa.array([r[2] for r in rs], pa.string()),
            "text": pa.array(["t"] * len(rs), pa.string()),
            "tool": pa.array([None] * len(rs), pa.string()),
            "ts": pa.array([base + datetime.timedelta(minutes=r[1])
                            for r in rs], pa.timestamp("us", tz="UTC")),
        })

    pq.write_table(to_table(rows), str(stream_dir / "bucket=0" / "f1.parquet"))

    sdf = read_turn_stream(spark, str(stream_dir))
    out = assembly_stream(sdf, seq_col="role", idle_ms=300)
    got = []

    def collect(df, _epoch):
        got.extend(tuple(r) for r in df.collect())

    q = (out.writeStream.outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_asm"))
         .foreachBatch(collect)
         .start())
    try:
        deadline = time.monotonic() + 90
        while time.monotonic() < deadline and len(got) < 2:
            time.sleep(0.2)
        assert len(got) == 2
        # equality with the batch fold over the same turns
        bdf = spark.createDataFrame(
            [(c, i, r, base + datetime.timedelta(minutes=i))
             for (c, i, r) in rows],
            "conv_id string, turn_idx int, role string, ts timestamp")
        want = {tuple(r) for r in assemble_conversations(
            bdf, "conv_id", "ts", "role", "turn_idx").collect()}
        assert {tuple(r) for r in got} == want
        # idle continues: no re-emission (state dropped at export)
        n = len(got)
        time.sleep(1.5)
        assert len(got) == n
    finally:
        q.stop()


def test_volume_stream_matches_batch(spark, snap_dir, batch_df, tmp_path):
    """Per-day volume verdicts on the stream converge row-for-row to the
    batch formula for every day that arrives, given the batch profile's
    median as the expectation; batch-'missing' days are exactly the days
    the stream (by design) never emits."""
    from schema_inference_spark.operators.anomaly import volume_anomaly
    from schema_inference_spark.streaming.stream_checks import volume_stream

    batch = volume_anomaly(batch_df, "ts").collect()
    med = batch[0].median_n

    sdf = read_turn_stream(spark, snap_dir, max_files_per_trigger=4)
    out = volume_stream(sdf, expected_daily=med)
    q = (out.writeStream.outputMode("complete")
         .format("memory").queryName("vol_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt_vol"))
         .start())
    q.processAllAvailable()
    q.stop()

    got = {r.day: r for r in spark.table("vol_stream").collect()}
    present = {r.day: r for r in batch if r.n_rows > 0}
    missing = [r.day for r in batch if r.n_rows == 0]
    assert len(present) > 1           # fixture spans multiple days
    assert set(got) == set(present)   # every arrived day emitted once
    for day, r in got.items():
        b = present[day]
        assert (r.n_rows, r.ratio_bp) == (b.n_rows, b.ratio_bp)
        assert r.expected_n == b.median_n
        assert r.verdict == b.verdict  # never 'missing' for arrived days
    assert all(d not in got for d in missing)


def test_embedding_stream_matches_batch(spark, tmp_path):
    """embedding_stream is the stateless stream form of
    embeddings.embedding_quality: streaming the files in micro-batches
    yields exactly the batch operator's non-ok rows, once each (append
    mode), with identical measurements."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from schema_inference_spark.operators.embeddings import embedding_quality
    from schema_inference_spark.streaming.stream_checks import (
        embedding_stream,
        read_embedding_stream,
    )

    stream_dir = tmp_path / "emb_stream"
    stream_dir.mkdir()
    nan, inf = float("nan"), float("inf")
    vecs = [
        (0, [0.5, -0.25, 0.125, 0.75]),       # ok
        (1, [0.0, 0.0, 0.0, 0.0]),            # zero_norm
        (2, [nan, 0.5, 0.25, 0.1]),           # nonfinite
        (3, [0.5, -0.25, 0.125]),             # bad_dim
        (4, None),                             # null_vec
        (5, [0.1, 0.2, 0.3, 0.4]),            # ok
        (6, [inf, 1.0, 1.0, 1.0]),            # nonfinite
        (7, [0.9, 0.8, 0.7, 0.6, 0.5]),       # bad_dim (too long)
    ]
    typ = pa.list_(pa.float32())
    for i, chunk in enumerate((vecs[:4], vecs[4:])):
        t = pa.table({
            "vec_id": pa.array([v[0] for v in chunk], pa.int64()),
            "embedding": pa.array([v[1] for v in chunk], typ),
        })
        pq.write_table(t, str(stream_dir / f"part-{i}.parquet"))

    sdf = read_embedding_stream(spark, str(stream_dir),
                                max_files_per_trigger=1)
    got = []
    q = (embedding_stream(sdf, expected_dim=4)
         .writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_emb"))
         .foreachBatch(lambda df, _eid: got.extend(df.collect()))
         .start())
    q.processAllAvailable()
    q.stop()

    batch = spark.read.schema(
        "vec_id bigint, embedding array<float>").parquet(str(stream_dir))
    want = {r.vec_id: r for r in
            embedding_quality(batch, expected_dim=4)
            .filter(F.col("verdict") != "ok").collect()}
    got_by_id = {r.vec_id: r for r in got}
    assert set(got_by_id) == set(want) == {1, 2, 3, 4, 6, 7}
    assert len(got) == len(got_by_id)  # append mode: no duplicates
    for vid, w in want.items():
        g = got_by_id[vid]
        assert (g.dim, g.n_nonfinite, g.norm_sq_fp, g.verdict) == \
            (w.dim, w.n_nonfinite, w.norm_sq_fp, w.verdict), vid


def test_text_validity_stream_matches_batch(spark, tmp_path):
    """text_validity_stream is the stateless stream form of
    textstats.text_validity: streaming the files in micro-batches
    yields exactly the batch operator's non-ok rows, once each (append
    mode), with identical measurements."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from schema_inference_spark.operators.textstats import text_validity
    from schema_inference_spark.streaming.stream_checks import (
        text_validity_stream,
    )

    stream_dir = tmp_path / "tv_stream"
    base = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    texts = [
        "clean turn",
        None,                      # null_text
        "   ",                     # empty
        "ctl\x07byte",             # control_chars
        "scar � here",        # replacement_char
        "tabs\tare\nfine",         # ok
    ]
    for bucket in (0, 1):
        (stream_dir / f"bucket={bucket}").mkdir(parents=True)
        rows = list(enumerate(texts))
        t = pa.table({
            "conv_id": pa.array([f"c{bucket}"] * len(rows), pa.string()),
            "turn_idx": pa.array([i for i, _ in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([tx for _, tx in rows], pa.string()),
            "tool": pa.array([None] * len(rows), pa.string()),
            "ts": pa.array([base + datetime.timedelta(minutes=i)
                            for i, _ in rows], pa.timestamp("us", tz="UTC")),
        })
        pq.write_table(t.slice(0, 3), str(stream_dir / f"bucket={bucket}"
                                          / "part-0.parquet"))
        pq.write_table(t.slice(3), str(stream_dir / f"bucket={bucket}"
                                       / "part-1.parquet"))

    sdf = read_turn_stream(spark, str(stream_dir), max_files_per_trigger=1)
    got = []
    q = (text_validity_stream(sdf).writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_tv"))
         .foreachBatch(lambda df, _eid: got.extend(df.collect()))
         .start())
    q.processAllAvailable()
    q.stop()

    batch = spark.read.schema(
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, bucket int"
    ).option("basePath", str(stream_dir)).parquet(str(stream_dir / "bucket=*"))
    want = {(r._k.split("#")[0], int(r._k.split("#")[1])): r
            for r in text_validity(
                batch.withColumn(
                    "_k", F.concat_ws("#", "conv_id",
                                      F.col("turn_idx").cast("bigint"))),
                id_col="_k")
            .filter(F.col("verdict") != "ok").collect()}
    got_by_key = {(r.conv_id, r.turn_idx): r for r in got}
    assert set(got_by_key) == set(want)
    assert {t for _, t in got_by_key} == {1, 2, 3, 4}
    assert len(got) == len(got_by_key)  # append mode: no duplicates
    for key, w in want.items():
        g = got_by_key[key]
        assert (g.n_chars, g.n_control, g.n_replacement, g.verdict) == \
            (w.n_chars, w.n_control, w.n_replacement, w.verdict), key


def test_stuck_loop_stream_converges_to_batch(spark, tmp_path):
    """stuck_loop_stream over an in-order feed, reduced by
    latest-emission-wins per (conv, start_idx), is row-identical to the
    batch repeated_runs — including a run that SPANS the micro-batch
    boundary (the state-continuity case)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from schema_inference_spark.operators.conversations import repeated_runs
    from schema_inference_spark.streaming.stream_checks import (
        stuck_loop_stream,
    )

    stream_dir = tmp_path / "turns_stream"
    stream_dir.mkdir()
    # conv A: run of 4 'x' spanning part-0 (2) -> part-1 (2), then 'y';
    # conv B: run of 3 'z' entirely inside part-0; conv C: no runs
    base = 1_700_000_000_000_000
    part0 = [("A", 0, "x"), ("A", 1, "x"),
             ("B", 0, "z"), ("B", 1, "z"), ("B", 2, "z"), ("B", 3, "w"),
             ("C", 0, "p"), ("C", 1, "q")]
    part1 = [("A", 2, "x"), ("A", 3, "x"), ("A", 4, "y"),
             ("C", 2, "p")]
    for age, (name, rows) in enumerate(
            (("part-0.parquet", part0), ("part-1.parquet", part1))):
        pq.write_table(pa.table({
            "conv_id": pa.array([c for c, _, _ in rows], pa.string()),
            "turn_idx": pa.array([i for _, i, _ in rows], pa.int64()),
            "role": pa.array([v for _, _, v in rows], pa.string()),
            "ts": pa.array([base + i * 1_000_000 for _, i, _ in rows],
                           pa.timestamp("us")),
        }), str(stream_dir / name))
        os.utime(str(stream_dir / name), (1_000_000 + age, 1_000_000 + age))

    sdf = (spark.readStream
           .schema("conv_id string, turn_idx bigint, role string, "
                   "ts timestamp")
           .option("maxFilesPerTrigger", "1")
           .parquet(str(stream_dir)))
    got = []
    q = (stuck_loop_stream(sdf, min_run=3).writeStream
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_stuck"))
         .foreachBatch(lambda df, _eid: got.extend(df.collect()))
         .start())
    q.processAllAvailable()
    q.stop()

    # latest-emission-wins: max end_idx (and its run_len) per (conv, start)
    latest = {}
    for r in got:
        k = (r.conv_id, r.start_idx)
        if k not in latest or r.end_idx > latest[k][1]:
            latest[k] = (r.value, r.end_idx, r.run_len)
    stream_rows = {(c, v, rl, s, e)
                   for (c, s), (v, e, rl) in latest.items()}

    batch = spark.read.schema(
        "conv_id string, turn_idx bigint, role string, ts timestamp"
    ).parquet(str(stream_dir))
    want = {(r.conv_id, r.value, r.run_len, r.start_idx, r.end_idx)
            for r in repeated_runs(batch, "conv_id", "ts", "role",
                                   "turn_idx", min_run=3).collect()}
    assert stream_rows == want
    # the cross-batch run really exists and really spanned the boundary
    assert ("A", "x", 4, 1, 4) in want


def test_json_census_stream_matches_batch(spark, tmp_path):
    """Complete-mode streaming census after full ingest equals the
    batch census over the same files — including the malformed/scalar
    rows both engines must skip."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from schema_inference_spark.operators.semistructured import (
        json_key_census,
    )
    from schema_inference_spark.streaming.stream_checks import (
        json_census_stream,
    )

    stream_dir = tmp_path / "props_stream"
    stream_dir.mkdir()
    part0 = ['{"k": 1, "s": "x"}', '{"k": 2}', '{bad', None]
    part1 = ['{"k": "oops"}', '{"n": -3}', '87']
    for age, (name, rows) in enumerate(
            (("part-0.parquet", part0), ("part-1.parquet", part1))):
        pq.write_table(pa.table({"props": pa.array(rows, pa.string())}),
                       str(stream_dir / name))
        os.utime(str(stream_dir / name), (1_000_000 + age,) * 2)

    sdf = (spark.readStream.schema("props string")
           .option("maxFilesPerTrigger", "1").parquet(str(stream_dir)))
    final = {}
    q = (json_census_stream(sdf, "props").writeStream
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt_census"))
         .foreachBatch(lambda df, _eid: final.update(
             {"rows": {tuple(r) for r in df.collect()}}))
         .start())
    q.processAllAvailable()
    q.stop()

    batch = spark.read.schema("props string").parquet(str(stream_dir))
    want = {tuple(r) for r in json_key_census(batch, "props").collect()}
    assert final["rows"] == want
    assert ("k", 3, 2, 1, 2) in want   # the type-violation gap survived


def test_interval_stream_matches_batch(spark, tmp_path):
    """interval_stream over micro-batched probes, unioned, equals the
    batch interval_join over the same probe set."""
    import datetime as dtm

    import pyarrow as pa
    import pyarrow.parquet as pq

    from schema_inference_spark.operators.temporal import interval_join
    from schema_inference_spark.streaming.stream_checks import (
        interval_stream,
    )

    base = dtm.datetime(2026, 1, 1)
    intervals = spark.createDataFrame(
        [(1, base, base + dtm.timedelta(seconds=30), "w1"),
         (2, base + dtm.timedelta(seconds=10),
          base + dtm.timedelta(seconds=20), "w2")],
        "k int, s_ts timestamp, e_ts timestamp, name string")

    stream_dir = tmp_path / "probe_stream"
    stream_dir.mkdir()
    parts = ([(1, 5, "a"), (1, 35, "b"), (2, 15, "c")],
             [(2, 25, "d"), (1, 30, "e")])
    for age, rows in enumerate(parts):
        pq.write_table(pa.table({
            "k": pa.array([k for k, _, _ in rows], pa.int32()),
            "ts": pa.array([base + dtm.timedelta(seconds=s)
                            for _, s, _ in rows], pa.timestamp("us")),
            "pid": pa.array([p for _, _, p in rows]),
        }), str(stream_dir / f"part-{age}.parquet"))
        os.utime(str(stream_dir / f"part-{age}.parquet"),
                 (1_000_000 + age,) * 2)

    sdf = (spark.readStream.schema("k int, ts timestamp, pid string")
           .option("maxFilesPerTrigger", "1").parquet(str(stream_dir)))
    got = []
    q = (interval_stream(sdf, intervals, on=["k"],
                         value_cols=["name"], bin_seconds=10,
                         emit=lambda df, _eid: got.extend(df.collect()))
         .option("checkpointLocation", str(tmp_path / "ckpt_iv"))
         .start())
    q.processAllAvailable()
    q.stop()

    batch = spark.read.schema("k int, ts timestamp, pid string").parquet(
        str(stream_dir))
    want = {(r.pid, r.name) for r in interval_join(
        batch, intervals, on=["k"], probe_ts="ts", start_ts="s_ts",
        end_ts="e_ts", value_cols=["name"], bin_seconds=10).collect()}
    assert {(r.pid, r.name) for r in got} == want
    assert ("a", "w1") in want and ("c", "w2") in want


def test_split_stream_matches_batch_assignment(spark, tmp_path):
    """split_stream routes every arriving row to the SAME split the
    batch split_assign gives it (shared split_columns definition) —
    the holdout contract at the stream boundary."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from schema_inference_spark.operators.curation import split_assign
    from schema_inference_spark.streaming.stream_checks import split_stream

    stream_dir = tmp_path / "split_stream"
    stream_dir.mkdir()
    rows = [(i, f"text number {i}", f"s{i % 2}") for i in range(200)]
    pq.write_table(pa.table({
        "doc_id": pa.array([i for i, _, _ in rows], pa.int64()),
        "text": pa.array([t for _, t, _ in rows], pa.string()),
        "source": pa.array([s for _, _, s in rows], pa.string()),
    }), str(stream_dir / "part-0.parquet"))

    sdf = (spark.readStream
           .schema("doc_id bigint, text string, source string")
           .parquet(str(stream_dir)))
    got = []
    q = (split_stream(sdf).writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_split"))
         .foreachBatch(lambda df, _eid: got.extend(df.collect()))
         .start())
    q.processAllAvailable()
    q.stop()

    batch = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string")
    want = {r.doc_id: (r.bucket, r.split)
            for r in split_assign(batch).collect()}
    assert {r.doc_id: (r.bucket, r.split) for r in got} == want
    assert len(got) == 200


def test_contamination_stream_matches_per_batch_probe(spark, tmp_path):
    """contamination_stream screens each micro-batch against the static
    bench set exactly as the batch operator would screen that ingest:
    per-epoch reports equal contamination_pairs on the same batch, and
    epochs never see each other (no cross-batch state by design)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from schema_inference_spark.operators.contamination import (
        contamination_pairs,
    )
    from schema_inference_spark.streaming.stream_checks import (
        contamination_stream,
    )

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota"
    bench = spark.createDataFrame([(100, bench_text)],
                                  "bench_id bigint, text string")
    stream_dir = tmp_path / "contam_stream"
    stream_dir.mkdir()
    parts = ([(1, "prefix " + bench_text + " suffix"),
              (2, "nothing shared with the benchmark here at all")],
             [(3, bench_text), (4, "another fully unrelated document")])
    for age, rows in enumerate(parts):
        pq.write_table(pa.table({
            "doc_id": pa.array([i for i, _ in rows], pa.int64()),
            "text": pa.array([t for _, t in rows], pa.string()),
        }), str(stream_dir / f"part-{age}.parquet"))
        os.utime(str(stream_dir / f"part-{age}.parquet"),
                 (1_000_000 + age,) * 2)

    sdf = (spark.readStream.schema("doc_id bigint, text string")
           .option("maxFilesPerTrigger", "1").parquet(str(stream_dir)))
    got = {}
    q = (contamination_stream(
            sdf, bench, threshold=0.5,
            emit=lambda df, eid: got.setdefault(
                eid, [tuple(r) for r in df.collect()]))
         .option("checkpointLocation", str(tmp_path / "ckpt_contam"))
         .start())
    q.processAllAvailable()
    q.stop()

    # every epoch's report equals the batch operator on that ingest
    seen = [r for rows_ in got.values() for r in rows_]
    for age, rows in enumerate(parts):
        batch = spark.createDataFrame(rows, "doc_id bigint, text string")
        want = [tuple(r) for r in
                contamination_pairs(batch, bench, 0.5).collect()]
        assert sorted(want) == sorted(
            got.get(age, [])), f"epoch {age} mismatch"
    # docs 1 and 3 are contaminated, 2 and 4 are not
    assert sorted(r[0] for r in seen) == [1, 3]


def test_conv_sig_stream_converges_to_batch_fold(spark, tmp_path):
    """conv_sig_stream: each conversation emits ONE signature row on
    idle timeout, byte-identical to the batch conv_sigs digest-turns
    fold over the same turns; the dup-probe composition against a
    static signature index then reports exactly the batch
    conv_dup_against_index rows."""
    import datetime
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from schema_inference_spark.operators.conversations import (
        build_conv_sig_index,
        conv_dup_against_index,
        conv_sigs,
    )
    from schema_inference_spark.streaming.stream_checks import (
        conv_dup_stream,
        read_turn_stream,
    )

    stream_dir = tmp_path / "sig_stream"
    (stream_dir / "bucket=0").mkdir(parents=True)
    base = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    # B duplicates the indexed conversation X; C is novel; D has a NULL
    # turn text (must fold as the marker, not be skipped)
    rows = [("B", 0, "hi"), ("B", 1, "yo"),
            ("C", 0, "fresh"), ("C", 1, None),
            ("D", 0, "hi"), ("D", 1, None)]

    def to_table(rs):
        return pa.table({
            "conv_id": pa.array([r[0] for r in rs], pa.string()),
            "turn_idx": pa.array([r[1] for r in rs], pa.int32()),
            "role": pa.array(["user"] * len(rs), pa.string()),
            "text": pa.array([r[2] for r in rs], pa.string()),
            "tool": pa.array([None] * len(rs), pa.string()),
            "ts": pa.array([base + datetime.timedelta(minutes=r[1])
                            for r in rs], pa.timestamp("us", tz="UTC")),
        })

    pq.write_table(to_table(rows), str(stream_dir / "bucket=0" / "f1.parquet"))

    args = dict(key_col="conv_id", ts_col="ts", text_col="text",
                tiebreak_col="turn_idx")
    hist = spark.createDataFrame(
        [("X", 0, "hi", base), ("X", 1, "yo",
                                base + datetime.timedelta(minutes=1))],
        "conv_id string, turn_idx int, text string, ts timestamp")
    index = build_conv_sig_index(conv_sigs(hist, **args)).cache()
    index.count()

    got = []

    def emit(df, _epoch):
        got.extend(tuple(r) for r in df.collect())

    sdf = read_turn_stream(spark, str(stream_dir))
    q = (conv_dup_stream(sdf, index, emit, idle_ms=300)
         .option("checkpointLocation", str(tmp_path / "ckpt_sig"))
         .start())
    try:
        deadline = time.monotonic() + 90
        while time.monotonic() < deadline and len(got) < 1:
            time.sleep(0.2)
    finally:
        q.stop()

    bdf = spark.createDataFrame(
        [(c, i, t, base + datetime.timedelta(minutes=i))
         for (c, i, t) in rows],
        "conv_id string, turn_idx int, text string, ts timestamp")
    want = {tuple(r) for r in conv_dup_against_index(
        conv_sigs(bdf, **args), index).collect()}
    assert set(got) == want
    # the batch twin itself found the planted dup (non-vacuous)
    assert {r[1] for r in want} == {"B"}
