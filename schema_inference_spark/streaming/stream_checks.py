"""D20 — Structured Streaming validation of arriving transcript turns.

The batch engine validates committed snapshots (D19 resume makes that
incremental at partition grain). This module validates turns AS THEY
ARRIVE, with the same violation-row contract (checks.VIOLATION_DDL), so a
stream consumer sees the exact rows a later batch `validate()` of the same
data would emit:

- vocabulary checks (D11) are stateless per-row predicates — a plain
  streaming select/filter, append-mode, no state at all;
- uniqueness (D10) and ordering (D12) need cross-batch memory, keyed by
  conv_id — implemented with ``applyInPandasWithState`` (Arrow-batched,
  never per-row Python), state = the conversation's (turn_idx, ts, bucket)
  arrays, output mode UPDATE: every micro-batch that touches a
  conversation re-emits that conversation's CURRENT violation set, which
  converges to the batch engine's rows once the conversation is fully
  ingested (asserted row-for-row in tests/test_streaming.py);
- per-window column stats (D7 in stream form) are a watermarked
  window aggregation — built-in, incremental, no custom state.

Scale notes (10^12 turns/day):
- state per key is one conversation's turn keys — bounded by conversation
  length, the same boundedness assumption the batch window check makes
  (checks.py:150-157); abandoned conversations are EVICTED via the
  ``state_ttl_ms`` processing-time TTL (state dropped, last update-mode
  emission stands as final; tested in tests/test_streaming.py).
- the stateful operator shuffles once on conv_id — identical key
  distribution to the batch window pass, so the same skew analysis holds
  (a hot conversation is row-skew absorbed by Arrow batching).

Reference seam: the reference is batch-only (schema-inference has no
stream surface at all); the violation shape is its failure object
(util.clj:153-155) unchanged.
"""

from __future__ import annotations

import json
import os
import re
from typing import Iterator, List, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.checks import VIOLATION_DDL

TURN_STREAM_SCHEMA = ("conv_id string, turn_idx int, role string, "
                      "text string, tool string, ts timestamp, bucket int")

# conversation state: the turn keys seen so far (sorted lazily at check
# time), ts in epoch-microseconds so the state schema stays Arrow-plain
CONV_STATE_SCHEMA = "turn_idx array<bigint>, ts_us array<bigint>, bucket array<int>"


def read_turn_stream(spark: SparkSession, snapshot_dir: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over a bucket-partitioned snapshot directory —
    the sandbox stand-in for an Iceberg/ Kafka turn feed. New files
    appearing under bucket=*/ become micro-batches."""
    reader = (spark.readStream
              .schema(TURN_STREAM_SCHEMA)
              .option("basePath", snapshot_dir))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(os.path.join(snapshot_dir, "bucket=*"))


# ---------------------------------------------------------------------------
# stateless: vocabulary checks (D11) on a stream
# ---------------------------------------------------------------------------

def vocab_violations_stream(sdf: DataFrame, snapshot_id: str,
                            role_vocab: List[str],
                            tool_vocab: List[str]) -> DataFrame:
    """Row-identical to the batch ``check_referential`` pair (asserted in
    tests): vocab membership is a literal-enum predicate, so the streaming
    plan is a stateless project+filter — append mode, zero state."""
    vj = lambda vocab: json.dumps(  # noqa: E731
        {"type": "enum", "values": sorted(vocab)},
        sort_keys=True, separators=(",", ":"))
    enum1 = lambda c: F.to_json(F.struct(  # noqa: E731
        F.lit("enum").alias("type"), F.array(F.col(c)).alias("values")))

    def mk(check_id, s1, s2, payload):
        return F.struct(
            F.lit(check_id).alias("check_id"),
            F.lit("non_equal").cast("string").alias("mgu_failure"),
            s1.cast("string").alias("schema_1"),
            s2.cast("string").alias("schema_2"),
            payload.cast("string").alias("payload"))

    role_cond = F.col("role").isNull() | ~F.col("role").isin(role_vocab)
    tool_cond = F.col("tool").isNotNull() & ~F.col("tool").isin(tool_vocab)
    arr = F.array(
        F.when(role_cond, mk("ref_role", enum1("role"), F.lit(vj(role_vocab)),
                             F.to_json(F.struct(F.col("role").alias("value"))))),
        F.when(tool_cond, mk("ref_tool", enum1("tool"), F.lit(vj(tool_vocab)),
                             F.to_json(F.struct(F.col("tool").alias("value"))))),
    )
    return (sdf
            .select("conv_id", "turn_idx", "bucket",
                    F.explode(F.filter(arr, lambda x: x.isNotNull())).alias("_v"))
            .select(F.lit(snapshot_id).alias("snapshot_id"),
                    F.col("bucket").cast("int").alias("partition_id"),
                    F.col("_v.check_id").alias("check_id"),
                    F.col("_v.mgu_failure").alias("mgu_failure"),
                    F.col("_v.schema_1").alias("schema_1"),
                    F.col("_v.schema_2").alias("schema_2"),
                    F.col("conv_id").cast("string").alias("conv_id"),
                    F.col("turn_idx").cast("bigint").alias("turn_idx"),
                    F.col("_v.payload").alias("payload")))


# ---------------------------------------------------------------------------
# stateless: PII surfacing on a stream (pii.py, stream form)
# ---------------------------------------------------------------------------

def pii_stream(sdf: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-turn PII flags on a turn stream: turns whose text matches any
    PII class, with per-class counts — the ingest-time surfacing of what
    ``operators.pii.pii_flags`` computes in batch (same JVM regex
    expressions; batch row-identity asserted in tests). Stateless
    project+filter, append mode, zero state: the natural shape for a
    redaction-queue feed. Output is sparse (only matching turns)."""
    from ..operators.pii import pii_count_columns
    counts, total = pii_count_columns(text_col)
    return (sdf
            .select(F.col("conv_id").cast("string").alias("conv_id"),
                    F.col("turn_idx").cast("bigint").alias("turn_idx"),
                    F.col("bucket").cast("int").alias("partition_id"),
                    *counts)
            .withColumn("n_pii", total)
            .filter(F.col("n_pii") > 0))


# ---------------------------------------------------------------------------
# stateless: FK orphans on a stream vs a static dimension (checks.py
# fk_orphans, stream form)
# ---------------------------------------------------------------------------

def fk_orphans_stream(sdf: DataFrame, dim: DataFrame, fact_key: str,
                      dim_key: str) -> DataFrame:
    """Ingest-time twin of ``checks.fk_orphans``: arriving rows whose
    FK has no match in a STATIC dimension snapshot, emitted as
    individual orphan rows (stream-static LEFT ANTI join — an
    append-mode-supported shape, no watermark, no state).

    Two deliberate asymmetries vs the batch operator, both inherent:
    the dim is the last validated snapshot (a stream cannot re-resolve
    against a moving dimension without stream-stream state), and the
    output is per-ROW rather than per-key counts — counting would need
    a stateful aggregation; at ingest time the quarantine queue wants
    the rows themselves, and retrospective per-key totals stay
    batch-side (the ``volume_stream`` division of labor)."""
    return sdf.join(dim.select(F.col(dim_key).alias(fact_key)),
                    on=fact_key, how="left_anti")


# ---------------------------------------------------------------------------
# stateless: text validity on a turn stream (textstats.py, stream form)
# ---------------------------------------------------------------------------

def text_validity_stream(sdf: DataFrame,
                         text_col: str = "text") -> DataFrame:
    """Ingest-time twin of ``textstats.text_validity``: turns whose
    text fails an encoding-corruption verdict (null, empty, control
    bytes, U+FFFD), surfaced as they land — the quarantine-queue feed
    for a corrupted capture pipeline. The column expressions are
    SHARED with the batch operator (``text_validity_columns``, the
    ``pii_count_columns`` pattern) keyed by (conv_id, turn_idx)
    instead of doc_id; stateless project+filter, append mode, zero
    state (the ``pii_stream`` shape)."""
    from ..operators.textstats import text_validity_columns
    return (sdf.select(
                F.col("conv_id").cast("string").alias("conv_id"),
                F.col("turn_idx").cast("bigint").alias("turn_idx"),
                F.col("bucket").cast("int").alias("partition_id"),
                *text_validity_columns(text_col))
            .filter(F.col("verdict") != "ok"))


# ---------------------------------------------------------------------------
# stateless: embedding quality on a vector ingest feed (embeddings.py,
# stream form)
# ---------------------------------------------------------------------------

EMBEDDING_STREAM_SCHEMA = "vec_id bigint, embedding array<float>"


def read_embedding_stream(spark: SparkSession, snapshot_dir: str,
                          max_files_per_trigger: int | None = None
                          ) -> DataFrame:
    """File-source stream over a directory of embedding parquet files —
    the sandbox stand-in for a vector ingest feed (encoder output
    landing next to the turn stream)."""
    reader = spark.readStream.schema(EMBEDDING_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    return reader.parquet(snapshot_dir)


def embedding_stream(sdf: DataFrame, vec_col: str = "embedding",
                     id_col: str = "vec_id",
                     expected_dim: int = 64) -> DataFrame:
    """Ingest-time twin of ``embeddings.embedding_quality``: vectors
    failing any per-row quality verdict (null, wrong dimension,
    NaN/Inf elements, zero norm), surfaced as they land so a bad
    encoder deploy is caught in the batch it ships in, not at the next
    snapshot validation. Same column expressions as the batch operator
    (batch row-identity asserted in tests); stateless project+filter,
    append mode, zero state — the quarantine-queue feed shape. Norm
    FENCES stay batch-side by design: they need the corpus median,
    which a stream cannot see (the same asymmetry as
    ``volume_stream``'s supplied expectation)."""
    from ..operators.embeddings import embedding_quality
    return (embedding_quality(sdf, vec_col=vec_col, id_col=id_col,
                              expected_dim=expected_dim)
            .filter(F.col("verdict") != "ok"))


# ---------------------------------------------------------------------------
# stateful: streaming exact dedup on a document ingest feed (dedup.py,
# stream form)
# ---------------------------------------------------------------------------

DEDUP_STATE_SCHEMA = "canonical_id bigint"
DEDUP_OUT_DDL = "content_hash string, doc_id bigint, canonical_id bigint"


def dedup_stream(sdf: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 state_ttl_ms: int | None = None) -> DataFrame:
    """Streaming exact dedup: one row per arriving DUPLICATE document,
    naming its canonical (first-seen) doc — the ingest-time form of
    ``operators.dedup.exact_dup_groups``, same content key (md5 over the
    same normalization), so once a corpus is fully ingested the emitted
    (doc, canonical) pairs expand the batch groups exactly (asserted in
    tests/test_streaming.py; arrival order following id order makes
    first-seen == the batch's min-id canonical).

    State per content hash is ONE bigint — the smallest state any
    cross-batch dedup can hold, vs. Spark's own streaming
    ``dropDuplicates`` which keys state on the whole dedup column set
    and emits survivors rather than naming duplicates. Keys are
    unbounded over an infinite feed, so ``state_ttl_ms`` evicts hashes
    idle past the TTL (pick it like a watermark: re-ingesting a
    duplicate after eviction re-reports it against a new canonical —
    the standard late-data tradeoff, same contract as
    ``conv_state_checks``). One shuffle on the hash; a pathological
    all-duplicates feed is one hot key absorbed by Arrow batching."""
    from ..operators.dedup import normalized

    hashed = sdf.select(
        F.md5(normalized(F.col(text_col))).alias("content_hash"),
        F.col(id_col).cast("bigint").alias("doc_id"))

    def fn(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=["content_hash", "doc_id",
                                        "canonical_id"])
            return
        ids: List[int] = []
        for pdf in pdfs:
            ids.extend(int(i) for i in pdf["doc_id"])
        if state.exists:
            (canon,) = state.get
            # exclude the stored canonical: an at-least-once source (or a
            # replay after repair) can re-deliver the canonical document
            # itself, and it must not self-report as its own duplicate —
            # same idempotence contract as dedup_against_index's
            # `id != canonical` filter
            dups = sorted(i for i in ids if i != canon)
        else:
            canon = min(ids)            # within-batch tie -> smallest id
            dups = sorted(i for i in ids if i != canon)
        state.update((int(canon),))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame({"content_hash": [key[0]] * len(dups),
                            "doc_id": dups,
                            "canonical_id": [int(canon)] * len(dups)})

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if state_ttl_ms is not None else GroupStateTimeout.NoTimeout)
    return (hashed.groupBy("content_hash")
            .applyInPandasWithState(
                fn,
                outputStructType=DEDUP_OUT_DDL,
                stateStructType=DEDUP_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=timeout))


# ---------------------------------------------------------------------------
# per-batch: streaming NEAR-dup probe against the static MinHash index
# ---------------------------------------------------------------------------

def near_dup_stream(sdf: DataFrame, index: DataFrame,
                    index_sigs: DataFrame, emit,
                    threshold: float = 0.5, id_col: str = "doc_id",
                    text_col: str = "text", n_hashes: int = 64,
                    bands: int = 16, k: int = 3):
    """Streaming form of ``operators.dedup.near_dup_against_index``:
    each arriving micro-batch of documents probes the static two-table
    MinHash index (band rows + signatures) and ``emit(report_df,
    epoch_id)`` receives that batch's (doc_id, index_id, est_jaccard)
    report — the stream-shaped incremental-ingest cycle, where a
    micro-batch IS an ingest.

    Deliberately ``foreachBatch``, not a stateful streaming aggregation:
    the probe needs a per-batch signature AGGREGATION (min over each
    doc's hashed shingles), and a streaming groupBy would instead
    accumulate signature state across batches forever — unbounded state
    for memory the INDEX already provides. Cross-batch near-dup memory
    is the index's job: append/compact it off the ingest path
    (``update_minhash_index`` / ``compact_minhash_index``) and the next
    micro-batch probes the refreshed artifact. Contrast with
    ``dedup_stream`` above, whose per-key state is one bigint — THERE
    the stateful form wins; here it would re-implement the index badly.

    Returns the ``DataStreamWriter`` (caller adds checkpoint/trigger
    options and ``.start()``s it). ``persist_sig=False`` on the inner
    probe: micro-batches are small, and recomputing their signatures
    twice beats leaking one cache entry per epoch."""
    from ..operators.dedup import near_dup_against_index

    def _probe(batch_df: DataFrame, epoch_id: int) -> None:
        emit(near_dup_against_index(batch_df, index, index_sigs,
                                    threshold, id_col, text_col,
                                    n_hashes, bands, k,
                                    persist_sig=False), epoch_id)

    return sdf.writeStream.foreachBatch(_probe)


def asof_stream(sdf: DataFrame, reference: DataFrame, emit,
                on, left_ts: str = "ts", right_ts: str = "ts",
                value_cols=None, direction: str = "backward",
                tolerance_s=None):
    """Streaming form of ``operators.temporal.asof_join``: each arriving
    micro-batch of probe rows is point-in-time enriched against a
    static reference table (the latest model-config/tool-registry/quote
    snapshot) and ``emit(enriched_df, epoch_id)`` receives the batch's
    result.

    Deliberately ``foreachBatch``, not a stateful stream-stream join:
    Spark's stream-stream join buffers BOTH sides within watermark
    bounds, but an as-of reference must stay addressable arbitrarily
    far back (the match is "most recent at-or-before", unbounded) — a
    watermark either evicts matches or holds unbounded state. The
    reference is an artifact: refresh it off-path (append the new
    reference rows, like the dedup index cycle) and the next
    micro-batch joins the refreshed frame. Per batch the union-window
    plan costs one Exchange of |batch|+|reference| rows on the key.

    Returns the ``DataStreamWriter`` (caller adds checkpoint/trigger
    and ``.start()``s it)."""
    from ..operators.temporal import asof_join

    def _enrich(batch_df: DataFrame, epoch_id: int) -> None:
        emit(asof_join(batch_df, reference, on, left_ts, right_ts,
                       value_cols, direction, tolerance_s), epoch_id)

    return sdf.writeStream.foreachBatch(_enrich)


def curation_stream(sdf: DataFrame, index: DataFrame, emit,
                    id_col: str = "doc_id", text_col: str = "text",
                    source_col: str = "source", **thresholds):
    """Streaming form of ``operators.curation.curation_summary``: each
    micro-batch (an ingest) runs the full dedup -> lang -> quality ->
    repetition cascade with the dup stage probing the persistent
    content-hash index, and ``emit(summary_df, epoch_id)`` receives
    that batch's per-source audit summary (additive across epochs —
    sum the buckets to get the run total).

    Same doctrine as ``near_dup_stream``: ``foreachBatch``, not a
    stateful aggregation — cross-batch dup memory is the hash index's
    job (append it off the ingest path), every other stage is
    stateless per document, so streaming state here would only
    re-implement the index. Returns the ``DataStreamWriter``."""
    from ..operators.curation import curation_summary_incremental

    def _probe(batch_df: DataFrame, epoch_id: int) -> None:
        emit(curation_summary_incremental(
            batch_df, index, id_col, text_col, source_col,
            **thresholds), epoch_id)

    return sdf.writeStream.foreachBatch(_probe)


def segment_dedup_stream(sdf: DataFrame, index: DataFrame, emit,
                         id_col: str = "doc_id", text_col: str = "text",
                         seg_words: int = 10):
    """Streaming form of ``operators.dedup.segment_dedup_against_index``:
    each micro-batch's documents are cleaned against the persistent
    segment-hash index and ``emit(clean_df, epoch_id)`` receives the
    batch's (doc_id, n_segs, n_kept, clean_text) rows. Same doctrine as
    the other index probes: ``foreachBatch``, cross-batch segment
    memory is the index's job (``update_segment_index`` off-path); a
    stateful streaming formulation would accumulate every segment hash
    ever seen as store state to duplicate what the index already
    persists."""
    from ..operators.dedup import segment_dedup_against_index

    def _probe(batch_df: DataFrame, epoch_id: int) -> None:
        emit(segment_dedup_against_index(batch_df, index, id_col,
                                         text_col, seg_words), epoch_id)

    return sdf.writeStream.foreachBatch(_probe)


# ---------------------------------------------------------------------------
# stateful: uniqueness + ordering per conversation (D10 + D12)
# ---------------------------------------------------------------------------

def _conv_violations(snapshot_id: str, conv_id: str,
                     turn: np.ndarray, ts_us: np.ndarray,
                     bucket: np.ndarray) -> pd.DataFrame:
    """Recompute a conversation's violation set from its full turn-key
    arrays — the vectorized equivalent of the batch window pass
    (checks.check_ordering / the per-key count in check_rowlevel_fused),
    over one conversation's bounded rows."""
    order = np.lexsort((bucket, ts_us, turn))
    t, s, b = turn[order], ts_us[order], bucket[order]
    rows: List[Tuple] = []

    # uniqueness: first row of each duplicated key, n_copies + min-bucket
    # attribution (mirrors fused: _krn==1 ordered by (ts, bucket))
    uniq, first_pos, counts = np.unique(t, return_index=True,
                                        return_counts=True)
    for k in np.nonzero(counts > 1)[0]:
        i0, n = first_pos[k], counts[k]
        pid = int(b[i0:i0 + n].min())
        rows.append((snapshot_id, pid, "unique_key", None, None, None,
                     conv_id, int(uniq[k]),
                     json.dumps({"n_copies": int(n)},
                                separators=(",", ":"))))

    # ordering: lag over the (turn_idx, ts)-sorted rows
    if len(t) > 1:
        prev_t, cur_t = t[:-1], t[1:]
        prev_s, cur_s = s[:-1], s[1:]
        cur_b = b[1:]
        for i in np.nonzero(cur_t > prev_t + 1)[0]:
            rows.append((snapshot_id, int(cur_b[i]), "turn_gap", None,
                         None, None, conv_id, int(cur_t[i]),
                         json.dumps({"prev_idx": int(prev_t[i]),
                                     "missing": int(cur_t[i] - prev_t[i] - 1)},
                                    separators=(",", ":"))))
        for i in np.nonzero(cur_t == prev_t)[0]:
            rows.append((snapshot_id, int(cur_b[i]), "turn_dup", None,
                         None, None, conv_id, int(cur_t[i]),
                         json.dumps({"prev_idx": int(prev_t[i])},
                                    separators=(",", ":"))))
        fmt = (lambda us: pd.Timestamp(us, unit="us", tz="UTC")
               .strftime("%Y-%m-%dT%H:%M:%SZ"))
        for i in np.nonzero(cur_s < prev_s)[0]:
            rows.append((snapshot_id, int(cur_b[i]), "ts_order", None,
                         None, None, conv_id, int(cur_t[i]),
                         json.dumps({"prev_ts": fmt(prev_s[i]),
                                     "ts": fmt(cur_s[i])},
                                    separators=(",", ":"))))
    return pd.DataFrame(
        rows, columns=["snapshot_id", "partition_id", "check_id",
                       "mgu_failure", "schema_1", "schema_2",
                       "conv_id", "turn_idx", "payload"])


_VIOLATION_COLS = [f.strip().split(" ")[0] for f in VIOLATION_DDL.split(",")]


def conv_state_checks(sdf: DataFrame, snapshot_id: str,
                      state_ttl_ms: int | None = None) -> DataFrame:
    """Stateful uniqueness + ordering over a turn stream, keyed by conv_id
    (``applyInPandasWithState``, Arrow-batched). UPDATE semantics: a
    micro-batch that touches a conversation re-emits that conversation's
    full current violation set; keep the latest set per conv_id downstream.
    Once a conversation is fully ingested its emitted set equals the batch
    engine's rows for that conversation exactly (tests/test_streaming.py).

    ``state_ttl_ms``: processing-time TTL for abandoned conversations —
    at 10^12 turns/day, conversations that never finish would otherwise
    grow state unboundedly. A conversation idle for the TTL is EVICTED:
    its state is dropped and its last UPDATE emission stands as final
    (eviction emits nothing — downstream keeps latest-per-conv, so a
    re-emission would be pure write amplification). A turn arriving
    AFTER eviction restarts the conversation from empty state; its
    subsequent emissions cover post-eviction rows only — the standard
    late-data tradeoff, same contract as a watermark (pick the TTL like
    a watermark: longer than any legitimate conversation gap).
    ``None`` = no eviction (deterministic tests / bounded backfills).
    """
    def fn(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        if state.hasTimedOut:
            # TTL eviction: no new rows for this conversation within the
            # TTL. Flush-as-final = drop state, emit nothing new.
            state.remove()
            yield pd.DataFrame(columns=_VIOLATION_COLS)
            return
        if state.exists:
            t_prev, s_prev, b_prev = state.get
        else:
            t_prev, s_prev, b_prev = [], [], []
        t_new, s_new, b_new = [], [], []
        for pdf in pdfs:
            t_new.append(pdf["turn_idx"].to_numpy(dtype=np.int64))
            s_new.append(pdf["ts"].astype("datetime64[us]")
                         .to_numpy().astype(np.int64))
            b_new.append(pdf["bucket"].to_numpy(dtype=np.int32))
        turn = np.concatenate([np.asarray(t_prev, dtype=np.int64)] + t_new)
        ts_us = np.concatenate([np.asarray(s_prev, dtype=np.int64)] + s_new)
        bucket = np.concatenate([np.asarray(b_prev, dtype=np.int32)] + b_new)
        state.update((turn.tolist(), ts_us.tolist(), bucket.tolist()))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield _conv_violations(snapshot_id, conv_id, turn, ts_us, bucket)

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if state_ttl_ms is not None else GroupStateTimeout.NoTimeout)
    return (sdf.select("conv_id", "turn_idx", "ts", "bucket")
            .groupBy("conv_id")
            .applyInPandasWithState(
                fn,
                outputStructType=VIOLATION_DDL,
                stateStructType=CONV_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=timeout))


# ---------------------------------------------------------------------------
# conversation-protocol check on a stream (role-transition matrix)
# ---------------------------------------------------------------------------

PROTO_STATE_SCHEMA = ("turn_idx array<bigint>, ts_us array<bigint>, "
                      "bucket array<int>, role array<string>")


def protocol_stream(sdf: DataFrame, snapshot_id: str, allowed,
                    state_ttl_ms: int | None = None) -> DataFrame:
    """Stateful stream form of ``checks.check_role_protocol``: per
    conversation, every (prev_role -> role) transition outside the
    ``allowed`` protocol matrix becomes a violation row (canonical
    VIOLATION_DDL shape, check_id='role_protocol').

    Same contract as ``conv_state_checks`` — UPDATE semantics (a touched
    conversation re-emits its full current violation set; keep latest per
    conv downstream), convergence to the batch check's rows once the
    conversation is fully ingested (tested), state = the conversation's
    (turn_idx, ts_us, bucket, role) arrays bounded by conversation
    length, optional processing-time TTL eviction with the same
    late-arrival tradeoff. Kept separate from conv_state_checks so the
    protocol matrix stays opt-in there exactly as in the batch pipeline
    (validate(role_protocol=...)).
    """
    allowed_set = {(a, b) for a, b in allowed}

    def _viol(conv_id: str, turn: np.ndarray, ts_us: np.ndarray,
              bucket: np.ndarray, role: np.ndarray) -> pd.DataFrame:
        # same (turn_idx, ts, role) tie order as the batch check — a
        # duplicated turn's transition sequence must not depend on
        # arrival order (role cast to str: None sorts as 'None', fine —
        # NULL-role transitions are skipped below anyway)
        role_key = np.asarray([str(x) for x in role])
        order = np.lexsort((role_key, ts_us, turn))
        t, b, r = turn[order], bucket[order], role[order]
        rows: List[Tuple] = []
        for i in range(1, len(t)):
            prev, cur = r[i - 1], r[i]
            if prev is None or cur is None:
                continue  # NULL roles belong to the D11 referential check
            if (prev, cur) not in allowed_set:
                rows.append((snapshot_id, int(b[i]), "role_protocol",
                             None, None, None, conv_id, int(t[i]),
                             json.dumps({"prev": prev, "cur": cur},
                                        separators=(",", ":"))))
        return pd.DataFrame(rows, columns=_VIOLATION_COLS)

    def fn(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=_VIOLATION_COLS)
            return
        t_prev, s_prev, b_prev, r_prev = (state.get if state.exists
                                          else ([], [], [], []))
        t_new, s_new, b_new, r_new = [], [], [], []
        for pdf in pdfs:
            t_new.append(pdf["turn_idx"].to_numpy(dtype=np.int64))
            s_new.append(pdf["ts"].astype("datetime64[us]")
                         .to_numpy().astype(np.int64))
            b_new.append(pdf["bucket"].to_numpy(dtype=np.int32))
            r_new.append(pdf["role"].to_numpy(dtype=object))
        turn = np.concatenate([np.asarray(t_prev, dtype=np.int64)] + t_new)
        ts_us = np.concatenate([np.asarray(s_prev, dtype=np.int64)] + s_new)
        bucket = np.concatenate([np.asarray(b_prev, dtype=np.int32)] + b_new)
        role = np.concatenate(
            [np.asarray(r_prev, dtype=object)] + r_new)
        state.update((turn.tolist(), ts_us.tolist(), bucket.tolist(),
                      [None if x is None else str(x) for x in role]))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield _viol(conv_id, turn, ts_us, bucket, role)

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if state_ttl_ms is not None else GroupStateTimeout.NoTimeout)
    return (sdf.select("conv_id", "turn_idx", "ts", "bucket", "role")
            .groupBy("conv_id")
            .applyInPandasWithState(
                fn,
                outputStructType=VIOLATION_DDL,
                stateStructType=PROTO_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=timeout))


# ---------------------------------------------------------------------------
# conversation assembly on a stream (TTL-finalized SFT export)
# ---------------------------------------------------------------------------

ASSEMBLY_OUT_SCHEMA = ("conv_id string, n_turns bigint, seq string, "
                       "first_us bigint, last_us bigint")
ASSEMBLY_STATE_SCHEMA = ("turn_idx array<bigint>, ts_us array<bigint>, "
                         "val array<string>")


def assembly_stream(sdf: DataFrame, seq_col: str = "role",
                    idle_ms: int = 60_000, sep: str = ">") -> DataFrame:
    """Streaming form of ``conversations.assemble_conversations``: a
    conversation is EXPORTED (one assembled row — ordered sequence,
    turn count, span) when it goes idle for ``idle_ms`` — the natural
    close signal on an endless turn stream, where no other event says
    "this dialogue is finished". Arriving turns only update state (no
    emission); the TTL timeout assembles, emits once, and drops the
    state, so each conversation costs exactly one output row and zero
    state afterwards.

    Ordering matches the batch fold: (ts, turn_idx, value). A turn that
    arrives after its conversation was exported restarts the state and
    would export a second partial row on the next idle — the standard
    late-data tradeoff (size ``idle_ms`` like a watermark); downstream
    dedup on conv_id keeps the first (complete-at-eviction) row. State
    per key is one conversation's (turn_idx, ts_us, value) arrays —
    bounded by dialogue length, same boundedness as the batch fold."""
    def fn(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        cols = ["conv_id", "n_turns", "seq", "first_us", "last_us"]
        if state.hasTimedOut:
            t_prev, s_prev, v_prev = state.get
            state.remove()
            t = np.asarray(t_prev, dtype=np.int64)
            s = np.asarray(s_prev, dtype=np.int64)
            v = np.asarray(v_prev, dtype=object)
            vk = np.asarray([str(x) for x in v])
            order = np.lexsort((vk, t, s))
            yield pd.DataFrame(
                [(conv_id, len(t), sep.join(str(x) for x in v[order]),
                  int(s.min()), int(s.max()))], columns=cols)
            return
        t_prev, s_prev, v_prev = (state.get if state.exists
                                  else ([], [], []))
        t_new, s_new, v_new = [], [], []
        for pdf in pdfs:
            t_new.append(pdf["turn_idx"].to_numpy(dtype=np.int64))
            s_new.append(pdf["ts"].astype("datetime64[us]")
                         .to_numpy().astype(np.int64))
            v_new.append(pdf[seq_col].to_numpy(dtype=object))
        turn = np.concatenate([np.asarray(t_prev, dtype=np.int64)] + t_new)
        ts_us = np.concatenate([np.asarray(s_prev, dtype=np.int64)] + s_new)
        val = np.concatenate([np.asarray(v_prev, dtype=object)] + v_new)
        state.update((turn.tolist(), ts_us.tolist(),
                      [None if x is None else str(x) for x in val]))
        state.setTimeoutDuration(idle_ms)
        yield pd.DataFrame(columns=cols)

    return (sdf.select("conv_id", "turn_idx", "ts", F.col(seq_col))
            .groupBy("conv_id")
            .applyInPandasWithState(
                fn,
                outputStructType=ASSEMBLY_OUT_SCHEMA,
                stateStructType=ASSEMBLY_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))


CONV_SIG_OUT_SCHEMA = "conv_id string, conv_sig string, n_turns bigint"
CONV_SIG_STATE_SCHEMA = ("turn_idx array<bigint>, ts_us array<bigint>, "
                         "dig array<string>")


def conv_sig_stream(sdf: DataFrame, text_col: str = "text",
                    idle_ms: int = 60_000) -> DataFrame:
    """Streaming form of ``conversations.conv_sigs`` (digest-turns
    fold): a conversation's signature is emitted ONCE when it goes idle
    for ``idle_ms`` (the close signal on an endless turn stream), equal
    byte-for-byte to the batch fold over the same turns — asserted
    row-for-row in tests/test_streaming.py.

    State per key is (turn_idx, ts_us, per-turn md5 hex) arrays —
    arriving turns are digested IMMEDIATELY (hashlib md5 over the
    UTF-8 text, NULL folding as the same \\x00 marker the batch side
    uses), so the state never holds transcript payload, the streaming
    analog of the batch fold's digest-only exchange. Ordering matches
    the batch ``array_sort(struct(us, tb, v))``: (ts, turn_idx,
    digest). A turn arriving after its conversation was exported
    restarts the state (late-data tradeoff, size ``idle_ms`` like a
    watermark); downstream consumers dedup on conv_id keeping the
    first emission."""
    import hashlib

    def _digest(x) -> str:
        s = "\x00" if x is None else str(x)
        return hashlib.md5(s.encode("utf-8")).hexdigest()

    def fn(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        cols = ["conv_id", "conv_sig", "n_turns"]
        if state.hasTimedOut:
            t_prev, s_prev, d_prev = state.get
            state.remove()
            t = np.asarray(t_prev, dtype=np.int64)
            s = np.asarray(s_prev, dtype=np.int64)
            d = np.asarray(d_prev, dtype=object)
            order = np.lexsort((d, t, s))
            sig = hashlib.md5(
                "\x1f".join(d[order]).encode("utf-8")).hexdigest()
            yield pd.DataFrame([(conv_id, sig, len(t))], columns=cols)
            return
        t_prev, s_prev, d_prev = (state.get if state.exists
                                  else ([], [], []))
        t_new, s_new, d_new = [], [], []
        for pdf in pdfs:
            t_new.append(pdf["turn_idx"].to_numpy(dtype=np.int64))
            s_new.append(pdf["ts"].astype("datetime64[us]")
                         .to_numpy().astype(np.int64))
            d_new.append(np.asarray(
                [_digest(x) for x in pdf[text_col]], dtype=object))
        turn = np.concatenate([np.asarray(t_prev, dtype=np.int64)] + t_new)
        ts_us = np.concatenate([np.asarray(s_prev, dtype=np.int64)] + s_new)
        dig = np.concatenate([np.asarray(d_prev, dtype=object)] + d_new)
        state.update((turn.tolist(), ts_us.tolist(), dig.tolist()))
        state.setTimeoutDuration(idle_ms)
        yield pd.DataFrame(columns=cols)

    return (sdf.select("conv_id", "turn_idx", "ts", F.col(text_col))
            .groupBy("conv_id")
            .applyInPandasWithState(
                fn,
                outputStructType=CONV_SIG_OUT_SCHEMA,
                stateStructType=CONV_SIG_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))


def conv_dup_stream(sdf: DataFrame, index: DataFrame, emit,
                    text_col: str = "text", idle_ms: int = 60_000):
    """Streaming incremental whole-conversation dedup: conv_sig_stream
    closes each conversation to one signature row, and every micro-batch
    of closed conversations probes the STATIC signature index
    (``conversations.build_conv_sig_index``) via
    ``conv_dup_against_index`` — the stream form of
    conv_dup_incremental, same foreachBatch composition as
    segment_dedup_stream. ``emit(df, epoch)`` receives the dup rows
    (conv_sig, conv_id, canonical_id, source). Batch-internal dups
    resolve within one micro-batch; in production the index is unioned
    with each batch's signatures afterwards so cross-batch new dups
    resolve on the next probe (same append-shaped maintenance as
    build_hash_index). Returns the writeStream handle (caller starts)."""
    from ..operators.conversations import conv_dup_against_index

    sigs = conv_sig_stream(sdf, text_col=text_col, idle_ms=idle_ms)
    # conv_sig_stream's contract — "downstream consumers dedup on
    # conv_id keeping the first emission" — is enforced HERE: a turn
    # arriving after its conversation was exported restarts state and
    # re-emits a FRAGMENT signature covering only the late turns, and
    # fragments of DIFFERENT conversations can collide (two convs each
    # re-opened by an identical trailing 'ok' ping sign equal), so
    # probing re-emissions would report false whole-conversation dups.
    # The filter is a driver-side seen-set in the foreachBatch closure
    # — exact for one query lifetime (it does not survive a checkpoint
    # restart); at warehouse scale the sink itself dedups (MERGE on
    # conv_id into the probed-conversations table) instead of holding
    # the set in driver memory.
    seen: set = set()

    def _probe(batch_df: DataFrame, epoch_id: int) -> None:
        rows = batch_df.collect()
        fresh = [r for r in rows if r["conv_id"] not in seen]
        first = batch_df.sparkSession.createDataFrame(fresh, batch_df.schema)
        emit(conv_dup_against_index(first, index), epoch_id)
        # only after a successful emit: if emit (or the probe) throws and
        # the engine retries this micro-batch, a pre-updated seen-set
        # would make the retry's `fresh` empty and those conversations
        # would never be probed (silent at-most-once loss); updating
        # afterwards keeps the retry exact and costs only the documented
        # checkpoint-restart duplicate direction
        seen.update(r["conv_id"] for r in fresh)

    return (sigs.writeStream.outputMode("update").foreachBatch(_probe))


# ---------------------------------------------------------------------------
# streaming incremental MinHash → conversation near-dup against an index
# ---------------------------------------------------------------------------

MINHASH_SIG_OUT_SCHEMA = "conv_id string, minhash array<bigint>, n_turns bigint"
# per-conversation state: 64 running minima + per-turn boundary rows —
# a LONG turn (>= 2k-1 tokens) stores only its first/last k-1 words
# (its interior shingles fold into `mins` on arrival); a SHORT turn
# stores its whole <= 2k-2-token text in `head`. State is O(turns ×
# constant), never the transcript: the payload-free doctrine of
# conv_sig_stream applied to a fold whose shingles cross turn
# boundaries (the cross-boundary windows are resolved at close from
# the stored boundary words alone).
MINHASH_SIG_STATE_SCHEMA = (
    "mins array<bigint>, turn_idx array<bigint>, ts_us array<bigint>, "
    "n_tok array<int>, head array<string>, tail array<string>")


def minhash_sig_stream(sdf: DataFrame, text_col: str = "text",
                       idle_ms: int = 60_000, n_hashes: int = 64,
                       k: int = 3,
                       max_turns: int | None = None) -> DataFrame:
    """Streaming form of ``dedup.minhash_signature`` over the ASSEMBLED
    conversation (ordered turn texts joined by spaces): each
    conversation's MinHash signature is emitted ONCE when it goes idle
    for ``idle_ms``, byte-identical to the batch fold over the same
    turns (asserted in tests/test_streaming_minhash.py) — the signature
    half of the streaming conversation near-dup probe.

    ``max_turns`` is the streaming face of ``check_conv_near_dup``'s
    whale guard: per-conversation state holds one boundary row per
    turn, so without a cap a megaturn conversation (the scaling
    corpus plants 1.9M turns) accumulates an unbounded state value.
    Turns with ``turn_idx >= max_turns`` are ignored entirely —
    neither folded nor stored — making the signature the PREFIX
    signature, byte-identical to the batch fold over
    ``turn_idx < max_turns`` (tested). Default None preserves exact
    whole-transcript parity; a deployment that caps must build its
    MinHash index artifacts from the SAME capped assembled fold, or
    probe Jaccard estimates silently degrade toward the prefix
    fraction (the cap is a property of the text fed to the fold —
    upstream of the ``mh_params`` stamp's scope).

    The fold is INCREMENTAL because min is associative/commutative: a
    turn's interior word k-shingles are hashed on arrival (pure-Python
    XXH64 bit-equal to the JVM's ``xxhash64`` — xxh64.py — with the
    per-shingle seed sweep vectorized in numpy) and folded into the 64
    running minima; only each turn's boundary words (first/last k-1)
    persist, so the k-windows that CROSS turn boundaries — including
    runs of sub-k-word turns a window can span entirely — are formed at
    close, in (ts, turn_idx) order, from those stored fragments.
    Out-of-order arrival therefore costs nothing: interior shingles are
    order-free under min, and boundary adjacency is resolved only at
    close. A conversation with fewer than k total tokens emits nothing,
    mirroring the batch frame's absence of a signature row. Same
    late-turn contract as conv_sig_stream: arrival after close restarts
    state (a fragment re-emission downstream consumers must dedup on
    first emission — conv_near_dup_stream does)."""
    from ..xxh64 import hash_int32_vec, xxh64

    BIG = np.int64(2_147_483_647)
    seeds = np.arange(n_hashes)
    boundary = k - 1
    short_cap = 2 * k - 2

    def _fold(mins: np.ndarray, windows) -> np.ndarray:
        for w in windows:
            h = xxh64(" ".join(w).encode("utf-8"), 42)
            mins = np.minimum(mins, hash_int32_vec(seeds, h) % BIG)
        return mins

    # tokenization mirrors dedup.normalized(): Java's \s is ASCII-only
    # ([ \t\n\x0b\f\r]), so a Unicode space (\xa0,  , ...) stays
    # INSIDE its token exactly as the batch fold keeps it — Python's
    # str.split() would split there and the signatures would diverge.
    # One known residual vs the batch: a conversation whose FIRST
    # turn's text begins with non-space ASCII whitespace gains an
    # empty head token batch-side (F.trim strips 0x20 only, before the
    # \s+ collapse), i.e. one extra leading shingle this per-turn fold
    # cannot see; everywhere else per-turn edge whitespace merges into
    # the assembled join-space and collapses identically.
    _ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def _tok(x) -> list:
        return ([] if x is None
                else [t for t in _ws.split(str(x).lower()) if t])

    def fn(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        cols = ["conv_id", "minhash", "n_turns"]
        if state.hasTimedOut:
            mins_p, ti_p, ts_p, nt_p, hd_p, tl_p = state.get
            state.remove()
            if not ti_p:
                # every arrived turn was beyond the max_turns cap —
                # the capped batch frame has no row for it either
                return
            mins = np.asarray(mins_p, dtype=np.int64)
            # (ts, turn_idx, stored-head-words): the batch fold's
            # array_sort(struct(us, tb, text)) breaks (ts, turn_idx)
            # ties on the RAW turn text; state holds only the
            # normalized head fragment, so the tie lands on that
            # instead (numpy unicode compare = code-point order =
            # UTF-8 byte order = Spark's string compare). Residual
            # divergence: tied turns whose raw texts order differently
            # than their normalized heads — the price of the
            # payload-free state doctrine, documented over stored.
            order = np.lexsort((np.asarray(hd_p, dtype="U"),
                                np.asarray(ti_p, dtype=np.int64),
                                np.asarray(ts_p, dtype=np.int64)))
            # reduced token stream: short turns whole, long turns
            # head + sentinel + tail; windows containing a sentinel
            # would span an omitted interior (already folded) — skip
            stream: list = []
            for j in order:
                # _tok, not str.split(): the stored fragments are
                # " "-joined _tok output, and a token carrying a
                # Unicode space must survive the round-trip intact
                toks = _tok(hd_p[j])
                if nt_p[j] > short_cap:
                    stream += toks + [None] + _tok(tl_p[j])
                else:
                    stream += toks
            wins = [stream[i:i + k] for i in range(len(stream) - k + 1)]
            mins = _fold(mins, [w for w in wins if None not in w])
            # any folded shingle lowers every lane below the int64.max
            # sentinel; an all-sentinel vector means < k total tokens —
            # the batch frame has no signature row for it either
            if mins[0] != np.iinfo(np.int64).max:
                yield pd.DataFrame(
                    [(conv_id, mins.tolist(), len(ti_p))], columns=cols)
            return
        if state.exists:
            mins_p, ti_p, ts_p, nt_p, hd_p, tl_p = state.get
            mins = np.asarray(mins_p, dtype=np.int64)
            ti, ts_us = list(ti_p), list(ts_p)
            nt, hd, tl = list(nt_p), list(hd_p), list(tl_p)
        else:
            mins = np.full(n_hashes, np.iinfo(np.int64).max,
                           dtype=np.int64)
            ti, ts_us, nt, hd, tl = [], [], [], [], []
        for pdf in pdfs:
            if max_turns is not None:
                # the whale guard: beyond-cap turns never enter state
                # or the fold (prefix-signature semantics, see above)
                pdf = pdf[pdf["turn_idx"] < max_turns]
            ts_col = (pdf["ts"].astype("datetime64[us]")
                      .to_numpy().astype(np.int64))
            for row_i, text in enumerate(pdf[text_col]):
                toks = _tok(text)
                ti.append(int(pdf["turn_idx"].iloc[row_i]))
                ts_us.append(int(ts_col[row_i]))
                nt.append(len(toks))
                if len(toks) > short_cap:
                    mins = _fold(mins, (toks[i:i + k]
                                        for i in range(len(toks) - k + 1)))
                    hd.append(" ".join(toks[:boundary]))
                    tl.append(" ".join(toks[-boundary:]))
                else:
                    hd.append(" ".join(toks))
                    tl.append("")
        state.update((mins.tolist(), ti, ts_us, nt, hd, tl))
        state.setTimeoutDuration(idle_ms)
        yield pd.DataFrame(columns=cols)

    return (sdf.select("conv_id", "turn_idx", "ts", F.col(text_col))
            .groupBy("conv_id")
            .applyInPandasWithState(
                fn,
                outputStructType=MINHASH_SIG_OUT_SCHEMA,
                stateStructType=MINHASH_SIG_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))


def conv_near_dup_stream(sdf: DataFrame, index: DataFrame,
                         index_sigs: DataFrame, emit,
                         text_col: str = "text", idle_ms: int = 60_000,
                         threshold: float = 0.5, n_hashes: int = 64,
                         k: int = 3, max_turns: int | None = None):
    """Streaming conversation-level near-dup against a persistent
    MinHash index: minhash_sig_stream closes each conversation to one
    signature row, and every micro-batch of closed conversations runs
    the O(new) probe (``dedup.near_dup_candidates_from_sigs`` — banding,
    capped index equi-join, signature-agreement verify) against the
    STATIC (index, index_sigs) artifact pair — the stream form of
    conv_near_dup_incremental. ``emit(df, epoch)`` receives
    (conv_id, index_id, est_jaccard) rows. Same first-emission dedup as
    conv_dup_stream: fragment re-emissions from late turns never probe.
    ``max_turns`` forwards to ``minhash_sig_stream``'s whale guard —
    if set, the index artifacts must come from the SAME capped fold
    (see the guard's docstring). Returns the writeStream handle
    (caller starts)."""
    from ..operators.dedup import (
        near_dup_candidates_from_sigs,
        near_dup_verify,
    )

    sigs = minhash_sig_stream(sdf, text_col=text_col, idle_ms=idle_ms,
                              n_hashes=n_hashes, k=k, max_turns=max_turns)
    seen: set = set()

    def _probe(batch_df: DataFrame, epoch_id: int) -> None:
        rows = batch_df.collect()
        fresh = [r for r in rows if r["conv_id"] not in seen]
        first = batch_df.sparkSession.createDataFrame(fresh,
                                                      batch_df.schema)
        # k is passed EXPLICITLY: this probe's signatures come from the
        # stream fold above, whose shingle width is k — omitting it
        # (k=None) would skip the mh_params shingle-width comparison
        # and a k-mismatched index would silently admit every streamed
        # near-duplicate as novel, the exact failure the stamp exists
        # to make loud
        # fold_cap declares this probe's assembled-fold shape (its
        # prefix cap, 0 = whole transcript) so an index built from the
        # OTHER fold fails loudly instead of silently degrading every
        # Jaccard estimate toward the prefix fraction
        cand = near_dup_candidates_from_sigs(
            first.select(F.col("conv_id").alias("doc_id"), "minhash"),
            index, index_sigs, n_hashes=n_hashes, k=k,
            fold_cap=(int(max_turns) if max_turns is not None else 0))
        emit(near_dup_verify(cand, threshold, n_hashes=n_hashes)
             .withColumnRenamed("doc_id", "conv_id"), epoch_id)
        # after the emit — see conv_dup_stream's retry note
        seen.update(r["conv_id"] for r in fresh)

    return (sigs.writeStream.outputMode("update").foreachBatch(_probe))


# ---------------------------------------------------------------------------
# windowed column stats on a stream (D7, stream form)
# ---------------------------------------------------------------------------

def drift_stream(sdf: DataFrame, baseline_kll: bytes,
                 value=None, window_duration: str = "1 hour",
                 watermark: str | None = None, n_bins: int = 10,
                 threshold: float = 0.25, min_rows: int = 100,
                 prior_strength: float | None = None) -> DataFrame:
    """D13 x D20: distribution drift per event-time window against a
    BASELINE snapshot's KLL sketch, on a stream.

    The batch drift check (operators/drift.py) rank-queries two merged
    sketches; a stream has no finished sketch to query, but the baseline
    side is fixed — so bin edges (baseline interior quantiles) and the
    baseline bin masses are computed ONCE driver-side from the baseline
    sketch, and the stream side reduces to counting rows per bin per
    window: a plain built-in windowed aggregation (incremental, no custom
    state), with PSI/KS assembled from the bin counts as column
    expressions. Everything per-row is JVM-side; the sketch is touched
    only at plan-build time.

    Default ``value`` is length(text) — the FIXTURES.md F3 drift signal.
    Output: one row per window with psi, ks, and drifted (psi > threshold
    AND n_rows >= min_rows); equals the same binning computed in batch
    over the same rows exactly (asserted in tests/test_streaming.py).

    Small-sample handling — where this deliberately differs from the
    batch sketch comparison (drift.py clamps near-zero CDF differences
    with eps, fine at snapshot row counts): a window holds finitely many
    rows, and with raw fractions one empty bin at n=20 contributes
    ~(0-p)·ln(eps/p) — an enormous spurious PSI. Current bin mass is
    therefore shrunk toward the baseline prior, q_i = (cnt_i + k·p_i) /
    (n + k) with k = ``prior_strength`` (default n_bins pseudo-rows):
    aligned data stays near zero at any n, real shifts still dominate as
    n grows, and ``min_rows`` gates the drifted FLAG (psi/ks are always
    emitted) so a near-empty window can't page anyone.
    """
    from ..operators.stats import kll_cdf, kll_quantiles

    spark = sdf.sparkSession
    if value is None:
        value = F.length("text").cast("double")
    eps = 1e-6

    probs = [i / n_bins for i in range(1, n_bins)]
    edges = kll_quantiles(spark, baseline_kll, probs)
    uniq: List[float] = []
    for e in edges:
        if not uniq or e > uniq[-1]:
            uniq.append(e)
    base_cdf = [0.0] + kll_cdf(spark, baseline_kll, uniq) + [1.0]
    p = [max(base_cdf[i] - base_cdf[i - 1], eps)
         for i in range(1, len(base_cdf))]  # baseline bin masses, literals

    base = sdf
    if watermark is not None:
        base = base.withWatermark("ts", watermark)
    v = value
    # the baseline KLL sketch never saw nulls (sketch aggs skip them), so
    # null-valued rows must not enter n_rows either — otherwise a window
    # with 50% nulls deflates every q_i and reads as drift with an
    # unchanged value distribution
    base = base.filter(v.isNotNull())
    # bin i = (edge[i-1], edge[i]] with open outer bins — the same "<= e"
    # convention as the sketch CDF rank query
    conds = []
    for i in range(len(p)):
        lo = F.lit(True) if i == 0 else (v > F.lit(uniq[i - 1]))
        hi = F.lit(True) if i == len(p) - 1 else (v <= F.lit(uniq[i]))
        conds.append(lo & hi)
    counts = (base
              .groupBy(F.window("ts", window_duration).alias("w"))
              .agg(F.count(F.lit(1)).alias("n_rows"),
                   *[F.sum(c.cast("long")).alias(f"_b{i}")
                     for i, c in enumerate(conds)]))

    k = float(prior_strength if prior_strength is not None else len(p))
    q = [(F.col(f"_b{i}") + F.lit(k * p[i]))
         / (F.col("n_rows") + F.lit(k)) for i in range(len(p))]
    psi = None
    for i in range(len(p)):
        term = (q[i] - F.lit(p[i])) * F.log(q[i] / F.lit(p[i]))
        psi = term if psi is None else psi + term
    # KS over the shared edges: max |cur_cdf - base_cdf| at each interior
    # edge (cumulative sums of the raw bin fractions, unclamped)
    ks_terms = []
    run = None
    for i in range(len(p) - 1):
        frac = F.col(f"_b{i}") / F.col("n_rows")
        run = frac if run is None else run + frac
        ks_terms.append(F.abs(run - F.lit(base_cdf[i + 1])))
    ks = F.greatest(*ks_terms) if len(ks_terms) > 1 else (
        ks_terms[0] if ks_terms else F.lit(0.0))

    return (counts
            .select(F.col("w.start").alias("w_start"),
                    F.col("w.end").alias("w_end"),
                    "n_rows",
                    F.round(psi, 6).alias("psi"),
                    F.round(ks, 6).alias("ks"))
            .withColumn("drifted",
                        (F.col("psi") > F.lit(threshold))
                        & (F.col("n_rows") >= F.lit(min_rows))))


def window_stats_stream(sdf: DataFrame, window_duration: str = "1 hour",
                        watermark: str | None = None) -> DataFrame:
    """Per-event-time-window column stats — built-in incremental window
    aggregation (complete/update mode without a watermark; append with
    one). Matches the batch groupBy(window(ts)) on the same data exactly
    (asserted in tests)."""
    base = sdf
    if watermark is not None:
        base = base.withWatermark("ts", watermark)
    return (base
            .groupBy(F.window("ts", window_duration).alias("w"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.col("tool").isNull().cast("long")).alias("n_tool_null"),
                 F.min("turn_idx").alias("min_turn"),
                 F.max("turn_idx").alias("max_turn"),
                 F.avg(F.length("text")).alias("avg_text_len"))
            .select(F.col("w.start").alias("w_start"),
                    F.col("w.end").alias("w_end"),
                    "n_rows", "n_tool_null", "min_turn", "max_turn",
                    "avg_text_len"))


def volume_stream(sdf: DataFrame, expected_daily: float,
                  ts_col: str = "ts", low_bp: int = 5000,
                  high_bp: int = 15000,
                  watermark: str | None = None) -> DataFrame:
    """Ingest-time twin of ``anomaly.volume_anomaly``: per-day row
    counts verdicted against a SUPPLIED expected daily volume in basis
    points (``low`` < ``low_bp``, ``high`` > ``high_bp``, else ``ok``).

    Two deliberate asymmetries vs the batch operator, both inherent to
    streaming rather than implementation shortcuts:

    - the expectation is a parameter, not a computed median — a stream
      cannot see the corpus history; operationally the value comes from
      the last validated snapshot's batch profile (the median
      ``volume_anomaly`` reports), so the stream judges arriving days
      against the committed baseline, the same baseline-vs-current
      shape as ``drift_stream``. The column is named ``expected_n``
      (not ``median_n``) to keep that provenance visible.
    - a MISSING day never self-reports: a day with zero rows produces
      no window on a stream, so there is nothing to emit a verdict
      from. Retrospective completeness (the densified calendar with
      ``missing`` rows) stays the batch operator's job; the stream
      covers the at-ingest low/high half of the contract. Row-value
      convergence to the batch formula for every day that DOES arrive
      is asserted in tests.

    Scale shape: one built-in incremental window aggregation — |days|
    state rows total, map-side partials absorb the per-batch volume
    before the exchange (same argument as the batch groupBy). Complete
    or update mode without a watermark; append with one.
    """
    base = sdf
    if watermark is not None:
        base = base.withWatermark(ts_col, watermark)
    exp = F.lit(float(expected_daily))
    counts = (base.groupBy(F.window(ts_col, "1 day").alias("w"))
              .agg(F.count(F.lit(1)).alias("n_rows")))
    n = F.col("n_rows")
    ratio = F.floor(n.cast("double") * 10000.0 / exp).cast("bigint")
    verdict = (F.when(ratio < low_bp, F.lit("low"))
               .when(ratio > high_bp, F.lit("high"))
               .otherwise(F.lit("ok")))
    return counts.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
        n.alias("n_rows"),
        F.round(exp, 4).alias("expected_n"),
        ratio.alias("ratio_bp"),
        verdict.alias("verdict"))


# ---------------------------------------------------------------------------
# declared rule constraints on a stream (operators/constraints.py twins)
# ---------------------------------------------------------------------------

def implication_rules_stream(sdf: DataFrame, snapshot_id: str,
                             rules, partition_col: str = "bucket"
                             ) -> DataFrame:
    """Implication rules (``when => then``) on a turn stream: the batch
    compiler (constraints.implication_rule_violations) is a pure
    project+filter, so the SAME plan runs on a streaming frame —
    stateless, append mode, zero state, row-identical to the batch
    rows for the same data (asserted in tests). The ingest-time form
    of validate(rules=[...])'s implication subset.

    FD rules are deliberately NOT accepted here: they need cross-batch
    per-determinant memory — that's ``fd_rule_stream`` below."""
    from ..operators.constraints import implication_rule_violations
    out = None
    for r in rules:
        if r["kind"] != "implication":
            raise ValueError(
                f"implication_rules_stream got kind={r['kind']!r}; "
                "use fd_rule_stream for stateful FD rules")
        v = implication_rule_violations(
            sdf, snapshot_id, r["check_id"], r["when"], r["then"],
            r.get("payload_cols", ()), partition_col)
        out = v if out is None else out.unionByName(v)
    return out


# FD state: the distinct dependent tuples seen (their sentinel-joined
# string forms, sorted) + total rows under the determinant
FD_STATE_SCHEMA = "deps array<string>, n_rows bigint"


def fd_rule_stream(sdf: DataFrame, snapshot_id: str, check_id: str,
                   determinants, dependents,
                   state_ttl_ms: int | None = None) -> DataFrame:
    """Streaming functional-dependency rule: per determinant value the
    state holds the distinct dependent tuples seen so far; every
    micro-batch that grows a key past one distinct tuple re-emits that
    key's CURRENT violation row (update mode), converging to the batch
    ``fd_rule_violations`` row once the corpus is fully ingested
    (asserted row-for-row in tests — including the payload JSON, so
    the stream feed and the snapshot validate() stay interchangeable;
    to_json omits null fields, so parity is over non-null determinant
    values — a null determinant key is a data-quality problem the
    vocabulary checks own).

    Scale: state per key is the distinct dependent SET — bounded by the
    dependent's true cardinality under that key (an FD that's violated
    by millions of distinct values is not an FD; a rule author caps it
    by choosing real dependencies). Keys are unbounded over an infinite
    feed: ``state_ttl_ms`` evicts idle determinants (the standard
    late-data tradeoff — a conflict split around an eviction
    under-counts, same contract as dedup_stream). One shuffle on the
    determinant; Arrow-batched, never per-row Python."""
    from ..operators.constraints import _dep_key

    det = list(determinants)
    is_conv = det == ["conv_id"]
    keyed = sdf.select(
        *[F.col(c) for c in det],
        _dep_key(list(dependents)).alias("_dep"))

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        cols = ["snapshot_id", "partition_id", "check_id", "mgu_failure",
                "schema_1", "schema_2", "conv_id", "turn_idx", "payload"]
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=cols)
            return
        fresh: List[str] = []
        for pdf in pdfs:
            fresh.extend(str(v) for v in pdf["_dep"])
        if state.exists:
            prev_deps, prev_n = state.get
            dep_set = set(prev_deps)
        else:
            dep_set, prev_n = set(), 0
        dep_set.update(fresh)
        n_rows = int(prev_n) + len(fresh)
        state.update((sorted(dep_set), n_rows))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if len(dep_set) <= 1:
            yield pd.DataFrame(columns=cols)
            return
        # payload mirrors the batch to_json(struct(det..., n_rows,
        # n_distinct)) byte-for-byte: same key order, compact separators
        kv = {}
        for c, v in zip(det, key):
            if v is not None:
                kv[c] = v.item() if hasattr(v, "item") else v
        kv["n_rows"] = n_rows
        kv["n_distinct"] = len(dep_set)
        ordered = sorted(dep_set)
        yield pd.DataFrame({
            "snapshot_id": [snapshot_id],
            "partition_id": [-1],
            "check_id": [check_id],
            "mgu_failure": ["non_equal"],
            "schema_1": [ordered[0]],
            "schema_2": [ordered[-1]],
            "conv_id": [str(key[0]) if is_conv and key[0] is not None
                        else None],
            "turn_idx": [None],
            "payload": [json.dumps(kv, separators=(",", ":"))],
        })

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if state_ttl_ms is not None else GroupStateTimeout.NoTimeout)
    return (keyed.groupBy(*det)
            .applyInPandasWithState(
                fn,
                outputStructType=VIOLATION_DDL,
                stateStructType=FD_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=timeout))


# ---------------------------------------------------------------------------
# stateful: stuck-loop detection on a turn stream (conversations.py
# repeated_runs, stream form)
# ---------------------------------------------------------------------------

STUCK_STATE_SCHEMA = "last_val string, run_len bigint, n_seen bigint"
STUCK_OUT_DDL = ("conv_id string, value string, run_len bigint, "
                 "start_idx bigint, end_idx bigint")


def stuck_loop_stream(sdf: DataFrame, key_col: str = "conv_id",
                      ts_col: str = "ts", seq_col: str = "role",
                      tiebreak_col: str = "turn_idx",
                      min_run: int = 3,
                      state_ttl_ms: int | None = None) -> DataFrame:
    """Ingest-time stuck-loop detection: the streaming twin of
    ``operators.conversations.repeated_runs``. State per conversation is
    three scalars — (last value, current run length, turns seen) — so a
    10^9-conversation feed holds one tiny row each, never a turn buffer.

    Emission contract (update mode): a run that ENDS inside a batch is
    emitted once, final; the batch's TRAILING run is emitted whenever it
    has reached ``min_run`` and is re-emitted extended if the next batch
    continues it — the consumer keeps the max ``end_idx`` per
    (conv, start_idx), the same latest-emission-wins doctrine as
    ``conv_state_checks``. After full in-order ingest that reduction is
    row-identical to the batch operator (asserted in tests).

    Ordering: within a micro-batch rows sort by (ts, tiebreak) — the
    same stable order as batch; cross-batch continuity assumes the feed
    delivers each conversation's turns in order (true for a log-ordered
    source; an out-of-order replay is the standard late-data tradeoff,
    same contract as the other stateful checks). Nulls are null-safe
    (consecutive nulls DO form a run, matching the batch operator).
    ``state_ttl_ms`` evicts idle conversations; eviction emits nothing
    (the last update-mode emission stands as final)."""
    keyed = sdf.select(
        F.col(key_col).cast("string").alias("_k"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
        F.col(tiebreak_col).cast("bigint").alias("_tb"),
        F.col(seq_col).cast("string").alias("_v"))

    def fn(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                columns=["conv_id", "value", "run_len",
                         "start_idx", "end_idx"])
            return
        rows = pd.concat(list(pdfs)).sort_values(["_ts", "_tb"])
        if state.exists:
            last, rl, seen = state.get
            rl, seen = int(rl), int(seen)
        else:
            last, rl, seen = None, 0, 0
        out = []
        idx = seen
        for v in rows["_v"]:
            v = None if (v is None or v != v) else str(v)
            idx += 1
            same = rl > 0 and ((v is None and last is None)
                               or (v is not None and last is not None
                                   and v == last))
            if same:
                rl += 1
            else:
                if rl >= min_run:          # a run just ENDED — final
                    out.append((last, rl, idx - rl, idx - 1))
                last, rl = v, 1
        if rl >= min_run:                  # trailing run — provisional
            out.append((last, rl, idx - rl + 1, idx))
        state.update((last, int(rl), int(idx)))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame({
            "conv_id": [key[0]] * len(out),
            "value": [o[0] for o in out],
            "run_len": [o[1] for o in out],
            "start_idx": [o[2] for o in out],
            "end_idx": [o[3] for o in out]})

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if state_ttl_ms is not None else GroupStateTimeout.NoTimeout)
    return (keyed.groupBy("_k")
            .applyInPandasWithState(
                fn,
                outputStructType=STUCK_OUT_DDL,
                stateStructType=STUCK_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=timeout))


# ---------------------------------------------------------------------------
# streaming aggregation: JSON payload census (semistructured.py, stream
# form)
# ---------------------------------------------------------------------------

def json_census_stream(sdf: DataFrame, json_col: str) -> DataFrame:
    """Streaming complete-mode form of
    ``operators.semistructured.json_key_census`` — the SAME column
    definitions and plan (from_json + explode inside codegen, groupBy
    on the key name), run as a native streaming aggregation: Spark
    keeps one state row per JSON key (the payload vocabulary — tiny),
    and each micro-batch folds its keys in map-side before touching
    state. After full ingest the complete-mode result is row-identical
    to the batch census (asserted in tests).

    This is the ingest-time form of payload schema inference: the
    census (and its n_present - n_int type-violation gap) is always
    current as producer traffic lands, without re-scanning the
    corpus."""
    from ..operators.semistructured import json_key_census
    return json_key_census(sdf, json_col)


def interval_stream(sdf: DataFrame, intervals: DataFrame, emit,
                    on, probe_ts: str = "ts",
                    start_ts: str = "s_ts", end_ts: str = "e_ts",
                    value_cols=(), bin_seconds: int = 3600,
                    how: str = "inner"):
    """Streaming form of ``operators.temporal.interval_join``: each
    arriving micro-batch of probe rows is containment-joined against a
    static interval table (maintenance windows, config epochs, session
    registries) and ``emit(joined_df, epoch_id)`` receives the batch's
    result.

    Same doctrine as ``asof_stream``: deliberately ``foreachBatch``,
    not a stream-stream join — intervals must stay addressable however
    old they are, which a watermarked join cannot promise. The interval
    table is an artifact refreshed off-path; per batch the cost is the
    binned equi-join on (keys, bin) over |batch| probe rows.

    Returns the ``DataStreamWriter`` (caller adds checkpoint/trigger
    and ``.start()``s it)."""
    from ..operators.temporal import interval_join

    def _probe(batch_df: DataFrame, epoch_id: int) -> None:
        emit(interval_join(batch_df, intervals, on, probe_ts,
                           start_ts, end_ts, list(value_cols),
                           bin_seconds, how), epoch_id)

    return sdf.writeStream.foreachBatch(_probe)


def split_stream(sdf: DataFrame, id_col: str = "doc_id",
                 salt: str = "v1") -> DataFrame:
    """Ingest-time train/val/test routing: append the (bucket, split)
    columns of ``operators.curation.split_assign`` to every arriving
    row — the expressions come from the SAME ``split_columns``
    definition, so a document's split at ingest equals its split in
    every later batch pass (the holdout contract extended to the
    stream boundary). Stateless projection, append mode, zero state:
    the natural shape for partitioned-by-split sink routing
    (``.writeStream.partitionBy('split')``)."""
    from ..operators.curation import split_columns

    bucket, split = split_columns(id_col, salt)
    return (sdf.withColumn("bucket", bucket)
            .withColumn("split", split))


def contamination_stream(sdf: DataFrame, bench: DataFrame, emit,
                         threshold: float = 0.5, k: int = 3,
                         id_col: str = "doc_id",
                         bench_id_col: str = "bench_id",
                         text_col: str = "text"):
    """Ingest-time benchmark-contamination screening: each micro-batch
    runs ``operators.contamination.contamination_pairs`` against the
    STATIC bench set and ``emit(pairs_df, epoch_id)`` receives that
    batch's (doc_id, bench_id, n_matched, bench_n, containment_bp)
    rows — the quarantine feed a pipeline wants BEFORE contaminated
    documents reach the training corpus.

    Same doctrine as ``curation_stream``: ``foreachBatch``, not a
    stateful aggregation — containment is per (arriving doc, bench
    item), needs no cross-batch state at all, and the bench side stays
    the broadcast-sized static frame the batch operator already
    requires. Returns the ``DataStreamWriter``."""
    from ..operators.contamination import contamination_pairs

    def _probe(batch_df: DataFrame, epoch_id: int) -> None:
        emit(contamination_pairs(batch_df, bench, threshold, k,
                                 id_col=id_col, bench_id_col=bench_id_col,
                                 text_col=text_col), epoch_id)

    return sdf.writeStream.foreachBatch(_probe)
