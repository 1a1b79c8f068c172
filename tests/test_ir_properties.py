"""Property-based tests for the schema algebra (hypothesis).

The reference ships only golden unit tests (SURVEY.md §5.1); these pin the
algebraic LAWS the engine's merge correctness depends on:

- mgu(s, s) == {} (reflexivity on var-free schemas)
- mgu soundness: applying the unifier makes both sides equal
- substitution composition: sub(compose(s1,s2), x) == sub(s1, sub(s2, x))
- merge monoid: associativity up to failure absorption
- normalize_svars idempotence
"""

from hypothesis import given, settings
from hypothesis import strategies as st

import schema_inference_spark.ir.schema_ir as u

GROUNDS = ["boolean", "int", "float", "double", "string", "timestamp",
           "bytes"]

ground_s = st.sampled_from(GROUNDS).map(lambda t: {"type": t})
svar_s = st.sampled_from(["a", "b", "c"]).map(lambda s: {"type": "s-var",
                                                         "sym": s})


def schemas(max_depth=3, with_vars=True):
    leaf = st.one_of(ground_s, svar_s) if with_vars else ground_s

    def extend(children):
        return st.one_of(
            st.builds(lambda c: {"type": "vector", "child": c}, children),
            st.builds(lambda c: {"type": "set", "child": c}, children),
            st.builds(lambda c: {"type": "maybe", "child": c}, children),
            st.builds(lambda a, b: {"type": "tuple", "children": [a, b]},
                      children, children),
            st.builds(lambda k, v: {"type": "map-of", "key": k, "value": v},
                      children, children),
        )

    return st.recursive(leaf, extend, max_leaves=8)


@settings(max_examples=200, deadline=None)
@given(schemas(with_vars=False))
def test_mgu_reflexive_on_closed(s):
    assert u.mgu(s, s) == {}


@settings(max_examples=200, deadline=None)
@given(schemas(), schemas())
def test_mgu_sound(a, b):
    r = u.mgu(a, b)
    if not u.is_failure(r):
        assert u.substitute(r, a) == u.substitute(r, b)


@settings(max_examples=200, deadline=None)
@given(st.dictionaries(st.sampled_from(["a", "b", "c"]),
                       schemas(with_vars=False), max_size=3),
       st.dictionaries(st.sampled_from(["a", "b", "c"]),
                       schemas(with_vars=False), max_size=3),
       schemas())
def test_compose_substitutions_law(s1, s2, x):
    # sub(compose(s1, s2), x) == sub(s1, sub(s2, x))  (util.clj:106-113)
    lhs = u.substitute(u.compose_substitutions(s1, s2), x)
    rhs = u.substitute(s1, u.substitute(s2, x))
    assert lhs == rhs


@settings(max_examples=200, deadline=None)
@given(schemas(with_vars=False), schemas(with_vars=False),
       schemas(with_vars=False))
def test_merge_associative_up_to_failure(a, b, c):
    left = u.merge_column_schema(u.merge_column_schema(a, b), c)
    right = u.merge_column_schema(a, u.merge_column_schema(b, c))
    # either both succeed with the same schema, or both fail
    assert u.is_failure(left) == u.is_failure(right)
    if not u.is_failure(left):
        assert left == right


@settings(max_examples=200, deadline=None)
@given(schemas())
def test_normalize_idempotent(s):
    once = u.normalize_svars(s)
    assert u.normalize_svars(once) == once


@settings(max_examples=200, deadline=None)
@given(schemas(with_vars=False))
def test_generalize_closed_is_identity(s):
    assert u.generalize({}, s) == s


@settings(max_examples=100, deadline=None)
@given(schemas(with_vars=False))
def test_subschema_reflexive(s):
    from schema_inference_spark.ir.subschema import sub_schema
    assert sub_schema(s, s)
