"""Deterministic synthetic transcripts generator (FIXTURES.md F1).

Input shape per BASELINE.json input_hint:
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Written as hash-bucketed partitioned parquet + a JSON snapshot manifest —
the sandbox stand-in for an Iceberg snapshot (SURVEY.md §7.0: no Iceberg
jar present; the catalog seam swaps in ``format("iceberg")`` in prod).

Everything is seeded — same arguments, byte-identical output. Planted
anomalies (exact, per FIXTURES.md F1) make golden violation rows possible:

- c000017 duplicates turn_idx=3           (uniqueness, D10)
- c000023 skips turn_idx=2                (ordering gap, D12)
- c000031 has one ts regression           (ordering ts, D12)
- role='moderator' every 1000th turn      (referential, D11)
- tool='telepathy' every 1500th tool turn (referential, D11)
- snapshot s2: one partition writes turn_idx as float64 (double) — the
  schema merge must fail non_equal, never widen (SURVEY.md §7.3-1)
- snapshot s3: tool entirely NULL — inferred as s-var, generalized
- snapshot s4: text lengths shifted +50% (drift, D13)
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROLES = ["system", "user", "assistant", "tool"]
TOOLS = ["search", "code", "browser", "none"]
BASE_TS_US = 1767225600_000_000  # 2026-01-01T00:00:00Z in microseconds

_WORDS = np.array([
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu",
])


def _hash_bucket(conv_ids: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic string hash -> bucket, stable across runs/processes
    (FNV-1a over the 7-char conv id 'cNNNNNN'; NOT Python's salted hash).
    Vectorized: one numpy pass per character position."""
    b = conv_ids.astype("S7").view(np.uint8).reshape(len(conv_ids), 7)
    with np.errstate(over="ignore"):
        h = np.full(len(conv_ids), 14695981039346656037, dtype=np.uint64)
        prime = np.uint64(1099511628211)
        for j in range(7):
            h = (h ^ b[:, j].astype(np.uint64)) * prime
    return (h % np.uint64(n_buckets)).astype(np.int32)


def generate_turns(
    n_conv: int = 200,
    seed: int = 42,
    hot_conv_share: float = 0.10,
    text_len_scale: float = 1.0,
    tool_all_null: bool = False,
) -> pa.Table:
    """Build one snapshot's turns as an Arrow table (int32 turn_idx)."""
    rng = np.random.default_rng(seed)
    # turn counts: zipf-ish, with conv 0 the designated hot key (~10%)
    lens = rng.integers(4, 40, size=n_conv)
    total_other = int(lens[1:].sum())
    lens[0] = max(int(total_other * hot_conv_share / (1 - hot_conv_share)), 4)

    # fully vectorized ragged expansion: conv_num + within-conv turn index
    lens64 = lens.astype(np.int64)
    starts = np.zeros(n_conv, dtype=np.int64)
    np.cumsum(lens64[:-1], out=starts[1:])
    total = int(lens64.sum())
    conv_num_arr = np.repeat(np.arange(n_conv, dtype=np.int64), lens64)
    idx_arr = (np.arange(total, dtype=np.int64)
               - np.repeat(starts, lens64)).astype(np.int32)

    # planted anomalies (FIXTURES.md F1), patched in place on two convs
    if n_conv > 17 and lens64[17] > 4:
        # duplicate turn_idx=3: rows from position 4 shift down by one, so
        # the sequence is 0,1,2,3,3,4,... — a dup with no gap
        s, n = starts[17], lens64[17]
        idx_arr[s + 4:s + n] -= 1
    if n_conv > 23 and lens64[23] > 3:
        # gap: rows from turn 2 onward shift up by one (turn_idx 2 skipped)
        s, n = starts[23], lens64[23]
        idx_arr[s + 2:s + n] += 1

    # conv id strings: format the n_conv uniques once, fancy-index to rows
    conv_strings = np.array([f"c{i:06d}" for i in range(n_conv)])
    conv_arr = conv_strings[conv_num_arr]
    n_rows = total

    role = np.array(ROLES)[np.arange(n_rows) % 4]
    role[np.arange(n_rows) % 1000 == 999] = "moderator"  # out-of-vocab

    is_tool = role == "tool"
    tool = np.where(is_tool,
                    np.array(TOOLS)[np.arange(n_rows) % 4], None)
    tool_positions = np.flatnonzero(is_tool)
    if len(tool_positions) > 0:
        bad = tool_positions[::1500 // 4 or 1][:max(len(tool_positions) // 375, 1)]
        tool[bad] = "telepathy"  # out-of-vocab
    if tool_all_null:
        tool = np.full(n_rows, None, dtype=object)

    n_words = np.maximum((rng.integers(1, 60, size=n_rows)
                          * text_len_scale).astype(np.int64), 1)
    word_pick = rng.integers(0, len(_WORDS), size=int(n_words.sum()))
    # vectorized join: Arrow list-of-words -> binary_join (no Python loop)
    import pyarrow.compute as pc
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_words, out=offsets[1:])
    # Arrow take (not numpy fancy indexing): 25x faster at 10^8 words;
    # large_string end-to-end — joined text exceeds the 2GB StringArray cap
    # beyond ~15M turns
    word_values = pc.take(pa.array(_WORDS.tolist(), type=pa.large_string()),
                          pa.array(word_pick, type=pa.int32()))
    if isinstance(word_values, pa.ChunkedArray):
        word_values = word_values.combine_chunks()
    word_lists = pa.LargeListArray.from_arrays(offsets, word_values)
    texts_arr = pc.binary_join(word_lists,
                               pa.scalar(" ", type=pa.large_string()))

    # ts: base + conv offset hours + turn_idx minutes (monotone per conv)
    ts_us = (BASE_TS_US + conv_num_arr * 3_600_000_000
             + idx_arr.astype(np.int64) * 60_000_000)
    # planted ts regression in conv 31: second turn jumps back 1h
    c31 = np.flatnonzero(conv_num_arr == 31)
    if len(c31) > 2:
        ts_us[c31[2]] -= 7_200_000_000

    return pa.table({
        "conv_id": pa.array(conv_arr, type=pa.string()),
        "turn_idx": pa.array(idx_arr, type=pa.int32()),
        "role": pa.array(role, type=pa.string()),
        "text": texts_arr,
        "tool": pa.array(tool, type=pa.string()),
        "ts": pa.array(ts_us, type=pa.timestamp("us", tz="UTC")),
    })


def _table_is_clustered(table: pa.Table) -> bool:
    """Cheap vectorized verification of the clustered write contract on
    the INPUT table: conv_id contiguous (one run per conv), (turn_idx, ts)
    non-decreasing within each conv, no nulls in the keys. Row filtering
    preserves relative order, so holding on the input implies holding in
    every bucket file."""
    import pyarrow.compute as pc
    n = table.num_rows
    if n == 0:
        return True
    conv = table.column("conv_id").combine_chunks()
    turn = table.column("turn_idx")
    ts = table.column("ts")
    if conv.null_count or turn.null_count or ts.null_count:
        return False
    if n == 1:
        return True
    same = pc.equal(conv.slice(1), conv.slice(0, n - 1)) \
        .to_numpy(zero_copy_only=False)
    if 1 + int((~same).sum()) != pc.count_distinct(conv).as_py():
        return False
    t = turn.cast(pa.int64()).combine_chunks().to_numpy()
    m = ts.cast(pa.int64()).combine_chunks().to_numpy()
    bad = same & ((t[1:] < t[:-1]) | ((t[1:] == t[:-1]) & (m[1:] < m[:-1])))
    return not bool(bad.any())


def write_snapshot(
    root: str,
    snapshot_id: str,
    table: pa.Table,
    n_buckets: int = 8,
    type_conflict_partition: Optional[int] = None,
    row_group_size: Optional[int] = None,
    declare_write_order: Optional[bool] = None,
) -> Dict:
    """Write one snapshot as bucket-partitioned parquet + manifest.json.

    ``type_conflict_partition``: write that bucket's ``turn_idx`` as float64
    — the planted physical-type conflict for snapshot s2.

    ``declare_write_order``: whether the manifest declares the Iceberg
    write-spec contract (clustered by conv_id, sorted by (conv_id,
    turn_idx, ts)) that lets validate() take the zero-shuffle clustered
    path. Default (None) VERIFIES the input cheaply and declares only
    when true — this generic writer must not stamp a guarantee that
    belongs to the caller's data (ADVICE r2: a lying manifest costs the
    reader a wasted corpus pass before the layout-lie fallback). Pass
    True to force (tests that engineer lies), False to never declare.
    """
    snap_dir = os.path.join(root, snapshot_id)
    os.makedirs(snap_dir, exist_ok=True)
    conv = table.column("conv_id").to_numpy(zero_copy_only=False)
    buckets = _hash_bucket(conv, n_buckets)
    partitions = []
    for b in range(n_buckets):
        mask = buckets == b
        part = table.filter(pa.array(mask))
        if type_conflict_partition is not None and b == type_conflict_partition:
            idx = part.column("turn_idx").cast(pa.float64())
            part = part.set_column(part.schema.get_field_index("turn_idx"),
                                   "turn_idx", idx)
        part_dir = os.path.join(snap_dir, f"bucket={b}")
        os.makedirs(part_dir, exist_ok=True)
        fpath = os.path.join(part_dir, "part-0.parquet")
        pq.write_table(part, fpath,
                       **({"row_group_size": row_group_size}
                          if row_group_size else {}))
        partitions.append({
            "partition_id": b,
            "path": f"bucket={b}",
            "files": ["part-0.parquet"],
            "n_rows": part.num_rows,
        })
    manifest = {
        "snapshot_id": snapshot_id,
        "table": "transcripts",
        "format": "parquet",
        "n_buckets": n_buckets,
        "partition_by": "bucket",
        "partitions": partitions,
        "n_rows": table.num_rows,
    }
    declare = (_table_is_clustered(table) if declare_write_order is None
               else declare_write_order)
    if declare:
        manifest["write_order"] = {"clustered_by": ["conv_id"],
                                   "sorted_by": ["conv_id", "turn_idx", "ts"]}
    with open(os.path.join(snap_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def generate_fixture_snapshots(root: str, n_conv: int = 200,
                               n_buckets: int = 8, seed: int = 42) -> Dict[str, Dict]:
    """The four FIXTURES.md snapshots: s1 clean-ish, s2 type-conflict,
    s3 all-NULL tool, s4 drifted text length."""
    out = {}
    t1 = generate_turns(n_conv=n_conv, seed=seed)
    out["s1"] = write_snapshot(root, "s1", t1, n_buckets)
    out["s2"] = write_snapshot(root, "s2", t1, n_buckets,
                               type_conflict_partition=2)
    t3 = generate_turns(n_conv=n_conv, seed=seed, tool_all_null=True)
    out["s3"] = write_snapshot(root, "s3", t3, n_buckets)
    t4 = generate_turns(n_conv=n_conv, seed=seed, text_len_scale=1.5)
    out["s4"] = write_snapshot(root, "s4", t4, n_buckets)
    return out
