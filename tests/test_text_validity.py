"""text_validity (operators/textstats.py): encoding-corruption verdict
semantics on constructed frames and plan shape. The driver query's
oracle gate runs in tests/test_driver_extras.py via EXTRA_ORACLES."""

from pyspark.sql import functions as F

from schema_inference_spark.operators import textstats as TS


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_verdict_priority_and_counts(spark):
    rows = [
        (0, "a clean document"),
        (1, None),                      # null_text
        (2, ""),                        # empty
        (3, "   "),                     # empty (whitespace-only)
        (4, "bad\x00byte\x07here"),     # control_chars (2 hits)
        (5, "tabs\tand\nnewlines\rok"), # ok: \t \n \r are not violations
        (6, "mojibake � scar"),    # replacement_char
        # control wins over replacement when both present
        (7, "\x1f then �"),
    ]
    out = {r.doc_id: r for r in TS.text_validity(_df(spark, rows)).collect()}
    assert out[0].verdict == "ok"
    assert out[1].verdict == "null_text" and out[1].n_chars is None
    assert out[2].verdict == "empty"
    assert out[3].verdict == "empty" and out[3].n_chars == 3
    assert out[4].verdict == "control_chars" and out[4].n_control == 2
    assert out[5].verdict == "ok" and out[5].n_control == 0
    assert out[6].verdict == "replacement_char" and out[6].n_replacement == 1
    assert out[7].verdict == "control_chars"
    assert out[7].n_control == 1 and out[7].n_replacement == 1


def test_plan_has_no_shuffle(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = TS.text_validity(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
