"""Inference goldens translated from the reference's algo_w test suite
(test/erp12/schema_inference/impl/algo_w_test.clj) into engine expression IR.
Covers the core lambda-calculus rules incl. substitution *counts*, the exact
branch-mismatch failure object, and polymorphic instantiation.
"""

import pytest

import schema_inference_spark.ir.algo_w as w
import schema_inference_spark.ir.schema_ir as u


def sv(sym):
    return {"type": "s-var", "sym": sym}


INT = {"type": "int"}
STR = {"type": "string"}
BOOL = {"type": "boolean"}


def fn(children, output):
    return {"type": "=>", "input": {"type": "cat", "children": children},
            "output": output}


def lit(v):
    return {"op": "lit", "val": v}


def var(s):
    return {"op": "var", "sym": s}


def app(f, *args):
    return {"op": "app", "fn": f, "args": list(args)}


# Fixture env mirroring algo_w_test.clj:12-47
TEST_ENV = {
    "inc": fn([INT], INT),
    "if": w.IF_SCHEME,
    "map": {"type": "scheme", "s_vars": ["a", "b"],
            "body": fn([fn([sv("a")], sv("b")),
                        {"type": "vector", "child": sv("a")}],
                       {"type": "vector", "child": sv("b")})},
}


def test_const():
    # (algo_w_test.clj:49-52) — keyword literal; engine: string literal
    assert w.algo_w(lit("a"), TEST_ENV) == {"subs": {}, "schema": STR}
    assert w.algo_w(lit(1), TEST_ENV) == {"subs": {}, "schema": INT}
    assert w.algo_w(lit(1.5), TEST_ENV) == {"subs": {}, "schema": {"type": "double"}}
    assert w.algo_w(lit(True), TEST_ENV) == {"subs": {}, "schema": BOOL}


def test_do():
    # (algo_w_test.clj:54-57) only :ret is typed
    expr = {"op": "do", "statements": [lit("!")], "ret": lit(1)}
    assert w.algo_w(expr, TEST_ENV) == {"subs": {}, "schema": INT}


def test_fn_monomorphic():
    # (fn [x] (inc x)) — algo_w_test.clj:59-67 incl. substitution count
    r = w.algo_w({"op": "abs", "params": ["x"],
                  "body": app(var("inc"), var("x"))}, TEST_ENV)
    assert "failure" not in r
    assert r["schema"] == fn([INT], INT)
    assert len(r["subs"]) == 2


def test_fn_with_polymorphic_f():
    # (fn [x] (f (inc x) 1)) with f : ∀a. [a a] -> a — algo_w_test.clj:68-84
    env = dict(TEST_ENV)
    env["f"] = {"type": "scheme", "s_vars": ["a"],
                "body": fn([sv("a"), sv("a")], sv("a"))}
    r = w.algo_w({"op": "abs", "params": ["x"],
                  "body": app(var("f"), app(var("inc"), var("x")), lit(1))},
                 env)
    assert "failure" not in r
    assert r["schema"] == fn([INT], INT)
    assert len(r["subs"]) == 4


def test_fn_nullary():
    # ((fn [] 1)) — algo_w_test.clj:85-91
    r = w.algo_w(app({"op": "abs", "params": [], "body": lit(1)}), {})
    assert "failure" not in r
    assert r["schema"] == INT
    assert len(r["subs"]) == 1


def test_fn_polymorphic_passthrough():
    # (fn [x y] (f x y)) with f : ∀a b. [a b] -> b — algo_w_test.clj:92-109
    env = dict(TEST_ENV)
    env["f"] = {"type": "scheme", "s_vars": ["a", "b"],
                "body": fn([sv("a"), sv("b")], sv("b"))}
    r = w.algo_w({"op": "abs", "params": ["x", "y"],
                  "body": app(var("f"), var("x"), var("y"))}, env)
    assert "failure" not in r
    schema = r["schema"]
    inputs = schema["input"]["children"]
    output = schema["output"]
    assert schema["type"] == "=>"
    assert len(inputs) == 2
    assert output in inputs
    assert all(s["type"] == "s-var" for s in inputs + [output])
    assert len(r["subs"]) == 3


def test_if_ok():
    # (if true 1 2) — algo_w_test.clj:111-116
    r = w.algo_w({"op": "if", "test": lit(True), "then": lit(1),
                  "else": lit(2)}, TEST_ENV)
    assert "failure" not in r
    assert r["schema"] == INT
    assert len(r["subs"]) == 2


def test_if_branch_mismatch_exact_failure():
    # (if true 1 "2") — EXACT failure object (algo_w_test.clj:117-125)
    r = w.algo_w({"op": "if", "test": lit(True), "then": lit(1),
                  "else": lit("2")}, TEST_ENV)
    assert r == {"failure": {"unification_failure": {
        "mgu_failure": "non_equal",
        "schema_1": INT,
        "schema_2": STR}}}


def test_var_not_found():
    # (ref: algo_w.clj:33-39 miss branch)
    r = w.algo_w(var("nope"), TEST_ENV)
    assert r == {"failure": {"var_not_found": "nope"}}


def test_invoke_map_polymorphic():
    # (map inc [1 2 3]) : vector<int> — algo_w_test.clj invoke test analog
    r = w.algo_w(app(var("map"), var("inc"), lit([1, 2, 3])), TEST_ENV)
    assert "failure" not in r
    assert r["schema"] == {"type": "vector", "child": INT}


def test_let_polymorphism():
    # (let [id (fn [x] x)] (id 1)) — generalization at the binding
    # (ref: algo_w.clj:92-111)
    expr = {"op": "let",
            "bindings": [["id", {"op": "abs", "params": ["x"],
                                 "body": var("x")}]],
            "body": app(var("id"), lit(1))}
    r = w.algo_w(expr, TEST_ENV)
    assert "failure" not in r
    assert r["schema"] == INT
    # and the polymorphic binding can be used at two types
    expr2 = {"op": "let",
             "bindings": [["id", {"op": "abs", "params": ["x"],
                                  "body": var("x")}]],
             "body": app(var("f2"), app(var("id"), lit(1)),
                         app(var("id"), lit("s")))}
    env = dict(TEST_ENV)
    env["f2"] = {"type": "scheme", "s_vars": ["a", "b"],
                 "body": fn([sv("a"), sv("b")], sv("b"))}
    r2 = w.algo_w(expr2, env)
    assert "failure" not in r2
    assert r2["schema"] == STR


def test_quote_heterogeneous_literal():
    # heterogeneous literal collection -> sequential of any
    # (algo_w_test.clj:198-202 quote test analog)
    assert (w.provide_value([1, "a"])
            == {"type": "sequential", "child": {"type": "any"}})


def test_infer_schema_api_throws():
    # only the API boundary throws (api.clj:5-8, algo_w.clj:16-17)
    with pytest.raises(ValueError):
        w.infer_schema(var("nope"), {})


def test_concretize():
    # (api.clj:10-15, README.md:114-127): bind, then re-generalize the rest
    sch = {"type": "scheme", "s_vars": ["a", "b"],
           "body": fn([sv("a")], sv("b"))}
    out = w.concretize({"a": INT}, sch)
    assert out == {"type": "scheme", "s_vars": ["b"],
                   "body": fn([INT], sv("b"))}
    fully = w.concretize({"a": INT, "b": STR}, sch)
    assert fully == fn([INT], STR)
