"""Per-partition verdict='error' path (SURVEY.md §2.B :throw analog at
partition granularity): an infrastructure failure — corrupt parquet
footer, corrupt data page — yields an error verdict row for THAT
partition while the run continues over the healthy ones, and resume
re-validates exactly the errored partitions after repair.

Two failure depths x both check paths:
- footer corruption: caught by the metadata census probe (works on the
  clustered AND the shuffle path — the partition never reaches a scan);
- data-page corruption (footer intact): caught executor-side by the
  clustered native reader's per-split by-value error rows.
"""

import glob
import os

import pytest

from schema_inference_spark.pipeline import validate
from schema_inference_spark.sources.catalog import SnapshotCatalog
from schema_inference_spark.sources.transcripts import (
    generate_turns,
    write_snapshot,
)


@pytest.fixture()
def snap(tmp_path):
    root = str(tmp_path)
    table = generate_turns(n_conv=40, seed=7)
    write_snapshot(root, "snap", table, n_buckets=4)
    files = {int(os.path.basename(os.path.dirname(f)).split("=")[1]): f
             for f in glob.glob(f"{root}/snap/bucket=*/*.parquet")}
    return SnapshotCatalog(root), files


def _verdicts(res):
    return {r.partition_id: r.verdict for r in res.verdicts.collect()
            if r.partition_id >= 0}


def _corrupt(path, mode):
    orig = open(path, "rb").read()
    if mode == "footer":
        open(path, "wb").write(b"this is not a parquet file")
    else:  # data page: keep the footer (tail) intact, garble a page
        bad = bytearray(orig)
        bad[200:400] = b"\xff" * 200
        open(path, "wb").write(bytes(bad))
    return orig


@pytest.mark.parametrize("clustered", [False, True],
                         ids=["shuffle", "clustered"])
def test_footer_corruption_errors_partition_and_resumes(
        spark, snap, clustered):
    cat, files = snap
    orig = _corrupt(files[2], "footer")

    res = validate(spark, cat, "snap", clustered_checks=clustered)
    assert set(res.errors) == {2}
    assert "part-0.parquet" in res.errors[2]
    v = _verdicts(res)
    assert v[2] == "error"
    assert all(v[p] in ("pass", "fail") for p in (0, 1, 3))
    # healthy partitions completed; the errored one is retried on resume
    assert 2 not in cat.completed_partitions(spark, "snap")
    assert cat.pending_partitions(spark, "snap") == [2]
    # violations from healthy partitions survived the error
    assert res.violations.filter("partition_id != 2").count() >= 0

    open(files[2], "wb").write(orig)
    res2 = validate(spark, cat, "snap")     # resume: only partition 2
    assert res2.partitions == [2]
    assert res2.errors == {}
    assert _verdicts(res2)[2] in ("pass", "fail")
    assert cat.pending_partitions(spark, "snap") == []


def test_datapage_corruption_errors_partition_clustered(spark, snap):
    """Footer reads fine, a data page doesn't: the clustered native
    reader emits a by-value error row for the split; the partition gets
    verdict='error', its rows never reach any check, and resume
    re-validates it after repair."""
    cat, files = snap
    orig = _corrupt(files[1], "page")

    # precondition of the test: the census (footer) still succeeds
    import pyarrow.parquet as pq
    assert pq.ParquetFile(files[1]).metadata.num_rows > 0

    res = validate(spark, cat, "snap", clustered_checks=True)
    assert set(res.errors) == {1}
    v = _verdicts(res)
    assert v[1] == "error"
    assert all(v[p] in ("pass", "fail") for p in (0, 2, 3))
    assert res.violations.filter("partition_id = 1").count() == 0
    assert cat.pending_partitions(spark, "snap") == [1]

    open(files[1], "wb").write(orig)
    res2 = validate(spark, cat, "snap", clustered_checks=True)
    assert res2.partitions == [1]
    assert _verdicts(res2)[1] in ("pass", "fail")
    assert cat.pending_partitions(spark, "snap") == []


def test_all_partitions_errored_still_returns(spark, snap):
    cat, files = snap
    origs = {p: _corrupt(f, "footer") for p, f in files.items()}
    res = validate(spark, cat, "snap")
    assert set(res.errors) == {0, 1, 2, 3}
    assert res.partitions == []
    assert all(v == "error" for v in _verdicts(res).values())
    assert res.violations.count() == 0
    for p, f in files.items():
        open(f, "wb").write(origs[p])
    res2 = validate(spark, cat, "snap")
    assert sorted(res2.partitions) == [0, 1, 2, 3]
    assert res2.errors == {}
