"""Schema-algebra goldens, translated 1:1 from the reference test suite
(test/erp12/schema_inference/impl/util_test.clj) into engine IR dicts.
Pure Python — no Spark. Same expected maps, same failure shapes.
"""

from schema_inference_spark.ir import schema_ir as u


def sv(sym):
    return {"type": "s-var", "sym": sym}


INT = {"type": "int"}
STR = {"type": "string"}
BOOL = {"type": "boolean"}


def fn(children, output):
    return {"type": "=>", "input": {"type": "cat", "children": children},
            "output": output}


# --- ground? (util_test.clj:6-19) -----------------------------------------

def test_ground():
    assert u.is_ground(STR)
    assert not u.is_ground({"type": "vector", "child": INT})
    assert not u.is_ground(fn([INT], {"type": "float"}))
    assert not u.is_ground({"type": "scheme", "s_vars": ["x"],
                            "body": fn([INT], {"type": "float"})})
    assert not u.is_ground(sv("x"))


def test_canonical_ground():
    assert u.canonical_ground({"type": "long"}) == INT
    assert u.canonical_ground({"type": "int32"}) == INT
    assert u.canonical_ground({"type": "float64"}) == {"type": "double"}
    assert u.canonical_ground({"type": "str"}) == STR


# --- substitute (util_test.clj:21-52) --------------------------------------

X2Y = {"x": sv("y")}


def test_substitute_var():
    assert u.substitute(X2Y, sv("x")) == sv("y")
    assert u.substitute(X2Y, sv("z")) == sv("z")


def test_substitute_tuple():
    assert (u.substitute(X2Y, {"type": "tuple", "children": [sv("x"), sv("x")]})
            == {"type": "tuple", "children": [sv("y"), sv("y")]})


def test_substitute_fn():
    assert u.substitute(X2Y, fn([sv("x")], sv("x"))) == fn([sv("y")], sv("y"))


def test_substitute_scheme_shadowing():
    # non-shadowed bound var: body substituted
    assert (u.substitute(X2Y, {"type": "scheme", "s_vars": ["z"],
                               "body": sv("x")})
            == {"type": "scheme", "s_vars": ["z"], "body": sv("y")})
    # shadowed: bound 'x' blocks the substitution (util_test.clj:46-52)
    assert (u.substitute(X2Y, {"type": "scheme", "s_vars": ["x"],
                               "body": sv("x")})
            == {"type": "scheme", "s_vars": ["x"], "body": sv("x")})


def test_substitute_env():
    env = {"a": {"type": "scheme", "s_vars": ["z"],
                 "body": {"type": "vector", "child": sv("x")}},
           "b": {"type": "scheme", "s_vars": ["x"],
                 "body": {"type": "set", "child": sv("x")}}}
    out = u.substitute_env(X2Y, env)
    assert out["a"]["body"] == {"type": "vector", "child": sv("y")}
    assert out["b"]["body"] == {"type": "set", "child": sv("x")}


# --- compose-substitutions (util_test.clj:73-84) ----------------------------

def test_compose_empty():
    assert u.compose_substitutions({}, {}) == {}


def test_compose_applies_first_to_second():
    assert (u.compose_substitutions({"a": sv("b")}, {"b": BOOL})
            == {"a": sv("b"), "b": BOOL})


def test_compose_tie_second_substituted_wins():
    assert (u.compose_substitutions({"x": STR, "y": INT}, {"y": sv("x")})
            == {"x": STR, "y": STR})


# --- free-type-vars (util_test.clj:86-126) ----------------------------------

def test_ftv():
    assert u.free_type_vars(sv("x")) == {"x"}
    assert u.free_type_vars(STR) == set()
    assert u.free_type_vars(fn([sv("x")], sv("y"))) == {"x", "y"}
    assert u.free_type_vars(fn([sv("x"), sv("y")], sv("x"))) == {"x", "y"}
    assert u.free_type_vars({"type": "map-of", "key": INT, "value": STR}) == set()


def test_ftv_scheme():
    assert (u.free_type_vars({"type": "scheme", "s_vars": ["x"],
                              "body": fn([sv("x")], sv("y"))}) == {"y"})
    assert (u.free_type_vars({"type": "scheme", "s_vars": ["x", "y"],
                              "body": fn([sv("x")], sv("y"))}) == set())


def test_ftv_env():
    env = {"a": {"type": "scheme", "s_vars": ["z"],
                 "body": {"type": "vector", "child": sv("x")}},
           "b": {"type": "scheme", "s_vars": ["x"],
                 "body": {"type": "set", "child": sv("x")}}}
    assert u.free_type_vars_env(env) == {"x"}


# --- instantiate (util_test.clj:128-139) ------------------------------------

def test_instantiate_non_scheme_identity():
    assert u.instantiate(INT) == INT
    assert u.instantiate(sv("x")) == sv("x")


def test_instantiate_freshness():
    s = u.instantiate({"type": "scheme", "s_vars": ["x"],
                       "body": {"type": "vector", "child": sv("x")}})
    assert s["type"] == "vector"
    assert s["child"]["type"] == "s-var"
    assert s["child"]["sym"].startswith("s-")
    s2 = u.instantiate({"type": "scheme", "s_vars": ["x"],
                        "body": {"type": "vector", "child": sv("x")}})
    assert s2["child"]["sym"] != s["child"]["sym"]  # fresh each time


# --- generalize (util_test.clj:141-154) -------------------------------------

def test_generalize():
    env = {"a": INT, "b": sv("x")}
    assert u.generalize(env, INT) == INT
    # 'x' is free in env -> not quantified
    assert u.generalize(env, sv("x")) == sv("x")
    assert (u.generalize(env, {"type": "vector", "child": sv("y")})
            == {"type": "scheme", "s_vars": ["y"],
                "body": {"type": "vector", "child": sv("y")}})


# --- mgu (util_test.clj:156-236) --------------------------------------------

def test_mgu_atomic():
    assert u.mgu(INT, INT) == {}
    assert u.mgu(INT, STR) == {"mgu_failure": "non_equal",
                               "schema_1": INT, "schema_2": STR}


def test_mgu_no_widening():
    # the semantic cornerstone: int does not merge with double
    # (util_test.clj:160-163 analog; SURVEY.md §1.2)
    r = u.mgu(INT, {"type": "double"})
    assert u.is_failure(r) and r["mgu_failure"] == "non_equal"
    # but aliases canonicalize before comparison
    assert u.mgu({"type": "long"}, {"type": "int32"}) == {}


def test_mgu_svars():
    assert u.mgu(sv("a"), sv("b")) == {"a": sv("b")}
    assert u.mgu(INT, sv("a")) == {"a": INT}
    assert u.mgu(sv("a"), sv("a")) == {}


def test_mgu_fn():
    assert u.mgu(fn([sv("a")], sv("a")), fn([sv("b")], sv("b"))) == {"a": sv("b")}
    assert (u.mgu(fn([sv("a"), sv("a")], sv("a")),
                  fn([sv("b"), sv("b")], sv("b"))) == {"a": sv("b")})


def test_mgu_occurs_check():
    r = u.mgu(fn([sv("a")], sv("a")),
              fn([sv("b")], {"type": "vector", "child": sv("b")}))
    assert r == {"mgu_failure": "occurs_check",
                 "schema_1": sv("b"),
                 "schema_2": {"type": "vector", "child": sv("b")}}


def test_mgu_map_of():
    assert (u.mgu({"type": "map-of", "key": STR, "value": sv("v")},
                  {"type": "map-of", "key": sv("k"), "value": BOOL})
            == {"k": STR, "v": BOOL})


def test_mgu_tuple():
    assert (u.mgu({"type": "tuple", "children": [sv("a"), INT]},
                  {"type": "tuple", "children": [STR, sv("b")]})
            == {"a": STR, "b": INT})
    r = u.mgu({"type": "tuple", "children": [sv("a"), INT, sv("c")]},
              {"type": "tuple", "children": [STR, sv("b")]})
    assert u.is_failure(r) and r["mgu_failure"] == "mismatched_arity"


def test_mgu_set():
    assert (u.mgu({"type": "set", "child": sv("a")},
                  {"type": "set", "child": INT}) == {"a": INT})


def test_mgu_maybe_precedence():
    # [maybe maybe] dispatches before s-var cases (util.clj:142-151)
    assert (u.mgu({"type": "maybe", "child": sv("a")},
                  {"type": "maybe", "child": INT}) == {"a": INT})
    # maybe vs bare is strict (reference default: non_equal)
    r = u.mgu({"type": "maybe", "child": INT}, INT)
    assert u.is_failure(r) and r["mgu_failure"] == "non_equal"


def test_mgu_non_positional_args():
    a = {"type": "=>", "input": {"type": "map-of", "key": STR, "value": INT},
         "output": INT}
    b = fn([INT], INT)
    r = u.mgu(a, b)
    assert u.is_failure(r) and r["mgu_failure"] == "non_positional_args"


# --- merge monoid ------------------------------------------------------------

def test_merge_column_schema_monoid():
    assert u.merge_column_schema(None, INT) == INT
    assert u.merge_column_schema(INT, None) == INT
    assert u.merge_column_schema(INT, INT) == INT
    fail = u.merge_column_schema(INT, {"type": "double"})
    assert u.is_failure(fail)
    # failures absorb (by-value propagation, algo_w.clj:9-11)
    assert u.merge_column_schema(fail, INT) == fail
    assert u.merge_column_schema(STR, fail) == fail


def test_merge_binds_svar():
    # all-NULL partition (s-var) merged with typed partition binds the var
    merged = u.merge_column_schema(sv("t0"), STR)
    assert merged == STR


def test_normalize_svars():
    s = fn([sv("s-93"), sv("s-41")], sv("s-93"))
    assert u.normalize_svars(s) == fn([sv("t0"), sv("t1")], sv("t0"))
