"""Sub-schema goldens from the reference README's structural spec
(README.md:260-353 — documented there as not-working code; implemented
here as working engine semantics)."""

from schema_inference_spark.ir.subschema import schema_equivalent, sub_schema


INT = {"type": "int"}
STR = {"type": "string"}
FLOAT = {"type": "float"}
KW = {"type": "keyword"}
NUM = {"type": "number"}


def test_enum_subset():
    # (README.md:273-279)
    assert sub_schema({"type": "enum", "values": ["A", "C"]},
                      {"type": "enum", "values": ["A", "B", "C"]})
    assert not sub_schema({"type": "enum", "values": ["A", "D"]},
                          {"type": "enum", "values": ["A", "B", "C"]})


def test_or_and():
    # (README.md:286-301)
    assert sub_schema(INT, {"type": "or", "children": [INT, FLOAT]})
    assert not sub_schema({"type": "or", "children": [INT, FLOAT]}, FLOAT)
    assert not sub_schema(KW, {"type": "and", "children": [{"type": "qualified-ident"}, KW]})
    assert sub_schema({"type": "and", "children": [{"type": "qualified-ident"}, KW]}, KW)


def test_map_width_depth():
    # (README.md:303-332)
    date_time = {"type": "map", "entries": {
        "year": INT, "month": INT, "day": INT,
        "hour": INT, "minute": INT, "second": INT}}
    date = {"type": "map", "entries": {"year": INT, "month": INT, "day": INT}}
    assert sub_schema(date_time, date)
    assert not sub_schema(date, date_time)
    proba_rank = {"type": "map", "entries": {"product_id": KW, "rank": FLOAT}}
    num_rank = {"type": "map", "entries": {"product_id": KW, "rank": NUM}}
    assert sub_schema(proba_rank, num_rank)
    assert not sub_schema(num_rank, proba_rank)


def test_collection_covariance():
    # (README.md:336-350)
    assert sub_schema({"type": "vector", "child": INT},
                      {"type": "vector", "child": NUM})
    assert sub_schema({"type": "set", "child": STR},
                      {"type": "set", "child": {"type": "maybe", "child": STR}})
    assert sub_schema({"type": "vector", "child": {"type": "boolean"}},
                      {"type": "sequential", "child": {"type": "boolean"}})
    assert not sub_schema({"type": "sequential", "child": INT},
                          {"type": "vector", "child": INT})


def test_maybe():
    assert sub_schema(INT, {"type": "maybe", "child": INT})
    assert not sub_schema({"type": "maybe", "child": INT}, INT)
    assert sub_schema({"type": "maybe", "child": INT},
                      {"type": "maybe", "child": NUM})


def test_equivalence():
    # (README.md:352-353)
    assert schema_equivalent(INT, {"type": "long"})
    assert not schema_equivalent(INT, NUM)


def test_vocab_containment_is_enum_subset():
    # the engine's referential check D11 is this rule over data
    observed = {"type": "enum", "values": ["system", "user"]}
    vocab = {"type": "enum", "values": ["system", "user", "assistant", "tool"]}
    assert sub_schema(observed, vocab)
    drifted = {"type": "enum", "values": ["system", "moderator"]}
    assert not sub_schema(drifted, vocab)
