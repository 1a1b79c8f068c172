"""Structural sub-schema (compatibility) checking.

The reference only implements the ``[:class :class]`` case via JVM class
hierarchy (ref: impl/util.clj:257-278) and throws on everything else
(util.clj:271-274); the richer structural spec lives in its README as
documented-but-not-working code (README.md:260-353). This module implements
that spec for the engine, where it serves as the baseline-compatibility gate
for drift: "is the snapshot schema a sub-schema of the baseline schema".

Spec rules implemented (README.md):
- enum subset                         (README.md:273-279)
- X <= [:or ... X ...]; [:and ... X ...] <= X   (README.md:286-301)
- map width/depth subtyping           (README.md:303-332)
- collection covariance, vector/set <= sequential  (README.md:336-350)
- maybe: X <= [:maybe X]; [:maybe X] <= [:maybe Y] iff X <= Y
- numeric tower: int/float/double <= "number" pseudo-ground
  (README `number?` example at README.md:320-326)
"""

from __future__ import annotations

from typing import Any, Dict

from .schema_ir import canonical_ground, is_ground

Schema = Dict[str, Any]

# grounds that conform to the "number" super-ground
_NUMERIC = {"int", "float", "double", "decimal"}
# seq-like constructors covariant into "sequential" (README.md:336-350)
_SEQ_LIKE = {"vector", "set", "sequential"}


def sub_schema(sub: Schema, sup: Schema) -> bool:
    """Do all values of schema ``sub`` conform to schema ``sup``?"""
    sub = canonical_ground(sub)
    sup = canonical_ground(sup)
    if sub == sup:
        return True
    st, pt = sub.get("type"), sup.get("type")

    # top
    if pt == "any":
        return True

    # or / and on the super side (README.md:286-301)
    if pt == "or":
        if st == "or":
            return all(any(sub_schema(c, p) for p in sup["children"])
                       for c in sub["children"])
        return any(sub_schema(sub, p) for p in sup["children"])
    if pt == "and":
        return all(sub_schema(sub, p) for p in sup["children"])

    # or / and on the sub side
    if st == "or":
        return all(sub_schema(c, sup) for c in sub["children"])
    if st == "and":
        return any(sub_schema(c, sup) for c in sub["children"])

    # maybe: non-null conforms to nullable; nullable only to nullable
    if pt == "maybe":
        inner = sup["child"]
        if st == "maybe":
            return sub_schema(sub["child"], inner)
        if st == "nil" or sub == {"type": "nil"}:
            return True
        return sub_schema(sub, inner)
    if st == "maybe":
        return False

    # enum subset (README.md:273-279)
    if st == "enum" and pt == "enum":
        return set(sub["values"]) <= set(sup["values"])
    if st == "enum" and is_ground(sup):
        # an enum of strings conforms to string, etc.
        return all(_value_conforms(v, sup) for v in sub["values"])

    # numeric tower into pseudo-ground "number"
    if pt == "number" or sup == {"type": "number"}:
        return st in _NUMERIC
    if is_ground(sub) and is_ground(sup):
        return sub == sup

    # collections: covariant; vector/set <= sequential (README.md:336-350)
    if st in _SEQ_LIKE and pt in _SEQ_LIKE:
        if pt == "sequential" or st == pt:
            return sub_schema(sub["child"], sup["child"])
        return False

    # tuples: pointwise; tuple <= sequential of common super is out of spec
    if st == "tuple" and pt == "tuple":
        a, b = sub["children"], sup["children"]
        return len(a) == len(b) and all(sub_schema(x, y) for x, y in zip(a, b))

    # map-of: covariant in key and value
    if st == "map-of" and pt == "map-of":
        return (sub_schema(sub["key"], sup["key"])
                and sub_schema(sub["value"], sup["value"]))

    # map width/depth (README.md:303-332): every (required) key of the
    # super-schema present in the sub-schema; shared keys covariant
    if st == "map" and pt == "map":
        sub_e = sub.get("entries", {})
        sup_e = sup.get("entries", {})
        optional = set(sup.get("optional", ()))
        for k, v in sup_e.items():
            if k not in sub_e:
                if k in optional:
                    continue
                return False
            if not sub_schema(sub_e[k], v):
                return False
        return True

    # function schemas: contravariant input, covariant output
    if st == "=>" and pt == "=>":
        ai, bi = sub["input"].get("children", []), sup["input"].get("children", [])
        if len(ai) != len(bi):
            return False
        return (all(sub_schema(y, x) for x, y in zip(ai, bi))
                and sub_schema(sub["output"], sup["output"]))

    return False


def _value_conforms(value: Any, ground_schema: Schema) -> bool:
    t = ground_schema.get("type")
    if t == "string":
        return isinstance(value, str)
    if t == "keyword":
        return isinstance(value, str)
    if t == "int":
        return isinstance(value, int) and not isinstance(value, bool)
    if t == "double" or t == "float" or t == "number":
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if t == "boolean":
        return isinstance(value, bool)
    if t == "any":
        return True
    return False


def schema_equivalent(a: Schema, b: Schema) -> bool:
    """Naive equivalence via mutual sub-schema (README.md:352-353)."""
    return sub_schema(a, b) and sub_schema(b, a)
