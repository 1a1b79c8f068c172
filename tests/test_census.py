"""Footer census row-group statistics (SURVEY.md §2.D1/D7): the parquet
footer's per-row-group min/max/null-count is a scan-less stats source at
100 TB — it must AGREE with the scan-path stats wherever it claims
exactness.
"""

from schema_inference_spark.operators.infer import (
    census_stats,
    infer_snapshot,
    physical_census,
)


def _census(spark, catalog, snap):
    files = []
    for p in catalog.manifest(snap)["partitions"]:
        for fname in p["files"]:
            files.append((p["partition_id"],
                          f"{catalog.root}/{snap}/{p['path']}/{fname}"))
    return physical_census(spark, files)


def test_census_stats_agree_with_scan(spark, catalog):
    """count/nulls always exact; numeric + timestamp min/max exact; string
    min/max are bounds containing the scan extremes."""
    inf = infer_snapshot(spark, catalog, "s1")
    cs = census_stats(_census(spark, catalog, "s1"))
    for col, scan in inf.column_stats.items():
        c = cs[col]
        assert c["count"] == scan["count"], col
        assert c["nulls"] == scan["nulls"], col
        if col in ("turn_idx",):
            assert c["exact"] and c["min"] == scan["min"]
            assert c["max"] == scan["max"]
        if col == "ts":
            assert c["min"] == scan["min"] and c["max"] == scan["max"]
        if col in ("conv_id", "role", "text"):
            # string stats may be writer-truncated: bounds, not values
            assert c["min"] <= scan["min"]
            assert c["max"] >= scan["max"]


def test_census_stats_all_null_column(spark, catalog):
    """s3's all-NULL tool column: footer knows the null count without any
    scan; min/max stay None."""
    cs = census_stats(_census(spark, catalog, "s3"))
    tool = cs["tool"]
    assert tool["count"] == tool["nulls"] > 0
    assert tool["min"] is None and tool["max"] is None


def test_census_rg_merge_across_files(spark, tmp_path):
    """Many-files-per-partition: row-group stats aggregate across a
    partition's files (the 100TB layout)."""
    import json
    import os

    import pyarrow.parquet as pq

    from schema_inference_spark.sources.catalog import SnapshotCatalog
    from schema_inference_spark.sources.transcripts import generate_turns

    root = str(tmp_path)
    table = generate_turns(n_conv=20, seed=11)
    snap = f"{root}/c1"
    os.makedirs(f"{snap}/bucket=0", exist_ok=True)
    half = table.num_rows // 2
    pq.write_table(table.slice(0, half), f"{snap}/bucket=0/part-0.parquet")
    pq.write_table(table.slice(half), f"{snap}/bucket=0/part-1.parquet")
    with open(f"{snap}/manifest.json", "w") as f:
        json.dump({"snapshot_id": "c1", "partitions": [
            {"partition_id": 0, "path": "bucket=0",
             "files": ["part-0.parquet", "part-1.parquet"],
             "n_rows": table.num_rows}], "n_rows": table.num_rows}, f)
    cat = SnapshotCatalog(root)
    cs = census_stats(_census(spark, cat, "c1"))
    assert cs["turn_idx"]["count"] == table.num_rows
    import pyarrow.compute as pc
    assert cs["turn_idx"]["min"] == pc.min(table["turn_idx"]).as_py()
    assert cs["turn_idx"]["max"] == pc.max(table["turn_idx"]).as_py()
