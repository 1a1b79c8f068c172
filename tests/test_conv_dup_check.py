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


def test_validate_replica_localizes_planted_divergence(spark, tmp_path):
    """validate_replica: a migrated copy with one corrupted turn, one
    lost turn, and one fabricated turn yields exactly three violation
    rows with the right check_ids, keys, and digests — the row-level
    localization stage behind the aggregate reconcile detector."""
    import pandas as pd

    from schema_inference_spark.pipeline import validate_replica
    from schema_inference_spark.sources.catalog import SnapshotCatalog
    from schema_inference_spark.sources.transcripts import (
        generate_turns,
        write_snapshot,
    )

    table = generate_turns(n_conv=30, seed=11)
    root = str(tmp_path / "snap")
    write_snapshot(root, "ref", table, n_buckets=4)

    pdf = table.to_pandas()
    # the candidate copy: corrupt c000005 turn 1, lose c000008 turn 0,
    # fabricate a turn the reference never had (c000002, turn 999)
    mut = (pdf.conv_id == "c000005") & (pdf.turn_idx == 1)
    assert mut.sum() == 1
    pdf.loc[mut, "text"] = pdf.loc[mut, "text"] + " CORRUPTED"
    pdf = pdf[~((pdf.conv_id == "c000008") & (pdf.turn_idx == 0))]
    extra = pdf[(pdf.conv_id == "c000002") & (pdf.turn_idx == 0)].copy()
    extra["turn_idx"] = 999
    pdf = pd.concat([pdf, extra], ignore_index=True)
    copy_table = pa.Table.from_pandas(pdf, schema=table.schema,
                                      preserve_index=False)
    write_snapshot(root, "copy", copy_table, n_buckets=4)

    cat = SnapshotCatalog(root)
    v = validate_replica(spark, cat, "copy", "ref").collect()
    got = {(r.check_id, r.conv_id, r.turn_idx) for r in v}
    assert got == {
        ("replica_text_mismatch", "c000005", 1),
        ("replica_missing_turn", "c000008", 0),
        ("replica_extra_turn", "c000002", 999),
    }
    # digests present on both sides only for the mismatch row
    by_check = {r.check_id: r for r in v}
    mm = json.loads(by_check["replica_text_mismatch"].payload)
    assert mm["copy_md5"] and mm["reference_md5"] \
        and mm["copy_md5"] != mm["reference_md5"]
    # to_json drops NULL fields: the lost turn has no copy-side digest
    assert json.loads(
        by_check["replica_missing_turn"].payload).get("copy_md5") is None
