"""Zonemap (min/max data-skipping) file pruning over a multi-file
parquet snapshot — the engine-side analog of Iceberg manifest pruning,
for snapshots clustered on the probe column (the layout
``repartitionByRange(...).write`` or an Iceberg sort order produces).

The reference's validator (`/root/reference/src/.../api.clj`) has no
storage layer at all; this is the D1-scan-family scale path: a range
probe over a ts-clustered 100-TB snapshot must open only the files
whose zone overlaps the range, not 10^6 footers' worth of data pages.

Exactness contract (same shape as ``checks.fk_orphans_bloom``): the
zonemap only SHRINKS the file list; the exact predicate is re-applied
to every surviving row, so a stale/absent/truncated footer stat can
cost performance, never correctness — provided the keep-rule is
conservative, which `zonemap_prune` is:

- a file with no stats for the column (or stats on only some row
  groups) is KEPT;
- a file whose non-null values may overlap the range is KEPT;
- only files that provably cannot match are dropped — all-null files
  (a BETWEEN/range predicate never matches NULL) and files whose
  [min, max] is disjoint from [lo, hi].

Footer reads go through ``operators.infer.keyed_footer_map`` — driver
thread pool below 512 files, a Spark job above, so a 10^6-file
manifest prunes distributedly.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Dict, List, Optional, Tuple

import pyarrow.parquet as pq

from ..operators.infer import keyed_footer_map


def _file_zone(item: Tuple[str, str]):
    """(path, column) -> (path, zone) where zone is
    {"rows", "nulls", "min", "max", "exact"}; exact=False means the
    footer could not vouch for every row group (file must be kept)."""
    path, column = item
    md = pq.ParquetFile(path).metadata
    rows = nulls = 0
    mn: Any = None
    mx: Any = None
    exact = True
    for i in range(md.num_row_groups):
        rg = md.row_group(i)
        got = False
        for j in range(rg.num_columns):
            cc = rg.column(j)
            if cc.path_in_schema != column:
                continue
            got = True
            st = cc.statistics
            rows += rg.num_rows
            if st is None or not st.has_null_count:
                exact = False
                break
            nulls += st.null_count
            if st.has_min_max:
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
            elif st.null_count < rg.num_rows:
                exact = False  # non-null values exist, no bounds
            break
        if not got:
            exact = False  # column absent from this row group's footer
    return path, {"rows": rows, "nulls": nulls, "min": mn, "max": mx,
                  "exact": exact}


def zonemap_prune(spark, paths: List[str], column: str,
                  lo: Any, hi: Any) -> Tuple[List[str], Dict[str, Any]]:
    """Prune ``paths`` against ``column BETWEEN lo AND hi`` using footer
    zones. Returns (kept_paths, audit) where audit records the decision
    per file — the lineage a 100-TB scan plan should log."""
    zones = keyed_footer_map(spark, [(p, column) for p in paths],
                             _file_zone)
    kept: List[str] = []
    decisions: Dict[str, str] = {}
    for p in paths:
        z = zones[p]
        if not z["exact"]:
            kept.append(p)
            decisions[p] = "kept:no_stats"
        elif z["nulls"] >= z["rows"]:
            decisions[p] = "pruned:all_null"
        elif z["min"] is None or z["max"] is None:
            kept.append(p)
            decisions[p] = "kept:no_bounds"
        elif z["max"] < lo or z["min"] > hi:
            decisions[p] = "pruned:disjoint"
        else:
            kept.append(p)
            decisions[p] = "kept:overlap"
    audit = {"n_files": len(paths), "n_kept": len(kept),
             "decisions": decisions}
    return kept, audit


def zonemap_scan(spark, paths: List[str], column: str, lo: Any, hi: Any,
                 audit_out: Optional[dict] = None):
    """Range scan with zonemap pruning: reads ONLY the surviving files
    and re-applies the exact predicate (Catalyst additionally pushes it
    into the surviving scans' row-group filters — two pruning levels,
    file then row group, exactly Iceberg's manifest->page cascade).
    Empty survivor set still returns a correctly-typed frame (read the
    schema from one footer, filter false)."""
    from pyspark.sql import functions as F

    kept, audit = zonemap_prune(spark, paths, column, lo, hi)
    if audit_out is not None:
        audit_out.update(audit)
    pred = (F.col(column) >= F.lit(lo)) & (F.col(column) <= F.lit(hi))
    if not kept:
        return spark.read.parquet(paths[0]).filter(F.lit(False))
    return spark.read.parquet(*kept).filter(pred)


def micros_to_naive_ts(us: int) -> _dt.datetime:
    """Exact micros-since-epoch -> naive datetime (TIMESTAMP_NTZ-safe:
    no tz conversion, so the literal compares bit-exactly with parquet
    timestamp[us] stats and Spark TIMESTAMP_NTZ columns)."""
    return _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=us)
