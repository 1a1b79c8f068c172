"""check_conv_dup (operators/checks.py): whole-conversation duplicate
members as pipeline violation rows, and the validate(conv_dedup=True)
opt-in. The driver-query form (conv_dup_exact / conv_dup_incremental)
is oracle-gated in tests/test_conversations.py; this file covers the
violation-store shape and the planted end-to-end path."""

import datetime as dt
import json

import pyarrow as pa

from schema_inference_spark.operators.checks import check_conv_dup


def _turn(bucket, conv, idx, role, text):
    return (bucket, conv, idx, role, text,
            dt.datetime(2026, 1, 1) + dt.timedelta(seconds=idx))


def test_check_conv_dup_shape_and_role_sensitivity(spark):
    rows = [
        _turn(0, "a", 0, "user", "hi"),
        _turn(0, "a", 1, "assistant", "yo"),
        _turn(0, "b", 0, "user", "hi"),          # b duplicates a
        _turn(0, "b", 1, "assistant", "yo"),
        _turn(1, "c", 0, "system", "hi"),        # same texts, different
        _turn(1, "c", 1, "assistant", "yo"),     # role -> NOT a dup
    ]
    df = spark.createDataFrame(
        rows, "bucket int, conv_id string, turn_idx int, "
              "role string, text string, ts timestamp")
    out = check_conv_dup(df, "snap").collect()
    assert len(out) == 1
    (v,) = out
    assert (v.check_id, v.conv_id, v.partition_id, v.turn_idx) == \
        ("conv_dup", "b", 0, 2)
    payload = json.loads(v.payload)
    assert payload["canonical_id"] == "a" and payload["n_convs"] == 2


def test_pipeline_conv_dedup_optin(spark, tmp_path):
    """Planted whole-conversation dups in a real snapshot: two existing
    conversations re-ingested under new conv_ids must surface as
    conv_dup violations naming their canonicals; the canonicals never
    self-report; a re-run without the flag emits no conv_dup rows."""
    from schema_inference_spark.pipeline import validate
    from schema_inference_spark.sources.catalog import SnapshotCatalog
    from schema_inference_spark.sources.transcripts import (
        generate_turns,
        write_snapshot,
    )

    table = generate_turns(n_conv=40, seed=7)
    pdf = table.to_pandas()
    dup = {"c000003": "zdup0003", "c000010": "zdup0010"}
    planted = pdf[pdf.conv_id.isin(dup)].copy()
    planted["conv_id"] = planted["conv_id"].map(dup)
    merged = pa.Table.from_pandas(
        __import__("pandas").concat([pdf, planted], ignore_index=True),
        schema=table.schema, preserve_index=False)
    root = str(tmp_path / "snap")
    write_snapshot(root, "s1", merged, n_buckets=4)
    cat = SnapshotCatalog(root)

    res = validate(spark, cat, "s1", conv_dedup=True,
                   resume=False, write_audit=False)
    v = res.violations.filter("check_id = 'conv_dup'").collect()
    got = {r.conv_id: json.loads(r.payload)["canonical_id"] for r in v}
    assert got == {"zdup0003": "c000003", "zdup0010": "c000010"}

    res_off = validate(spark, cat, "s1",
                       resume=False, write_audit=False)
    assert res_off.violations.filter("check_id = 'conv_dup'").count() == 0
