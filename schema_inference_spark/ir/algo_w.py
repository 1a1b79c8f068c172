"""Algorithm W over the engine's expression IR.

The reference runs Hindley–Milner inference over tools.analyzer ASTs
(ref: impl/algo_w.clj). In the engine, Catalyst's Analyzer already performs
APP-style typing for SQL expressions (SURVEY.md §2.B :APP row); this module
types the engine's *own* registered constraint/check expressions — the small
lambda language in which custom checks declare their signatures — with the
same rules, substitution threading, and by-value failure propagation as the
reference:

- lit  (ref :LIT  algo_w.clj:26-31)   value -> schema, via provide_value
- var  (ref :VAR  algo_w.clj:33-39)   env lookup + instantiate
- app  (ref :APP  algo_w.clj:41-73)   fresh result var; args threaded
                                      left-to-right; reverse compose; unify
- abs  (ref :ABS  algo_w.clj:75-90)   fresh param vars; no variadics
- let  (ref :LET  algo_w.clj:92-111)  sequential bindings, let-polymorphism
- if   (ref :if   algo_w.clj:160-166) desugars to app of env "if"
- do   (ref :do   algo_w.clj:139-141) types only the return expression

Expression IR:
  {"op": "lit", "val": <python value>}
  {"op": "var", "sym": "name"}
  {"op": "app", "fn": <expr>, "args": [<expr>...]}
  {"op": "abs", "params": ["x", ...], "body": <expr>}
  {"op": "let", "bindings": [["name", <expr>], ...], "body": <expr>}
  {"op": "if", "test": <expr>, "then": <expr>, "else": <expr>}
  {"op": "do", "statements": [<expr>...], "ret": <expr>}

Results: {"subs": <subs>, "schema": <schema>} or {"failure": <reason>}.
Failures are values, never exceptions (ref: algo_w.clj:9-11); only
``infer_schema`` throws at the API boundary (ref: api.clj:5-8,
algo_w.clj:16-17).
"""

from __future__ import annotations

import datetime
import uuid as _uuid
from typing import Any, Dict, List

from .schema_ir import (
    compose_substitutions,
    fresh_var,
    generalize,
    instantiate,
    is_failure,
    mgu,
    substitute,
    substitute_env,
)

Schema = Dict[str, Any]

# The polymorphic conditional every env gets for free; the reference models
# `if` as an env fn with scheme [boolean?, a, a] -> a
# (ref fixture: algo_w_test.clj:26-33).
IF_SCHEME: Schema = {
    "type": "scheme", "s_vars": ["a"],
    "body": {"type": "=>",
             "input": {"type": "cat",
                       "children": [{"type": "boolean"},
                                    {"type": "s-var", "sym": "a"},
                                    {"type": "s-var", "sym": "a"}]},
             "output": {"type": "s-var", "sym": "a"}},
}


def provide_value(val: Any) -> Schema:
    """Value -> schema (the reference's `mp/provide`, ref algo_w.clj:26-31).

    Widening to a top-ish type happens *within* one value sample —
    a heterogeneous collection infers sequential-of-any (golden:
    algo_w_test.clj:198-202) — never across merge boundaries.
    """
    if val is None:
        return {"type": "nil"}
    if isinstance(val, bool):
        return {"type": "boolean"}
    if isinstance(val, int):
        return {"type": "int"}
    if isinstance(val, float):
        return {"type": "double"}
    if isinstance(val, str):
        return {"type": "string"}
    if isinstance(val, (bytes, bytearray)):
        return {"type": "bytes"}
    if isinstance(val, datetime.datetime):
        return {"type": "timestamp"}
    if isinstance(val, datetime.date):
        return {"type": "date"}
    if isinstance(val, _uuid.UUID):
        return {"type": "uuid"}
    if isinstance(val, (list, tuple, set, frozenset)):
        ctor = "set" if isinstance(val, (set, frozenset)) else "vector"
        items = [provide_value(v) for v in val]
        if not items:
            return {"type": ctor, "child": {"type": "any"}}
        first = items[0]
        if all(i == first for i in items):
            return {"type": ctor, "child": first}
        return {"type": "sequential", "child": {"type": "any"}}
    if isinstance(val, dict):
        keys = [provide_value(k) for k in val]
        vals = [provide_value(v) for v in val.values()]
        if keys and all(k == keys[0] for k in keys) and all(v == vals[0] for v in vals):
            return {"type": "map-of", "key": keys[0], "value": vals[0]}
        return {"type": "map",
                "entries": {str(k): provide_value(v) for k, v in val.items()}}
    return {"type": f"py:{type(val).__name__}"}


def _is_w_failure(x: Any) -> bool:
    return isinstance(x, dict) and "failure" in x


def algo_w(expr: Dict[str, Any], env: Dict[str, Schema]) -> Dict[str, Any]:
    op = expr["op"]

    if op == "lit":
        return {"subs": {}, "schema": provide_value(expr["val"])}

    if op == "var":
        sym = expr["sym"]
        if sym not in env:
            return {"failure": {"var_not_found": sym}}
        return {"subs": {}, "schema": instantiate(env[sym])}

    if op == "app":
        result_var = fresh_var()
        fn_r = algo_w(expr["fn"], env)
        if _is_w_failure(fn_r):
            return fn_r
        # infer args left-to-right, threading substitutions through the env
        # (ref: algo_w.clj:47-58)
        env2 = substitute_env(fn_r["subs"], env)
        args_ti: List[Dict[str, Any]] = []
        for arg in expr["args"]:
            a_r = algo_w(arg, env2)
            if _is_w_failure(a_r):
                return a_r
            env2 = substitute_env(a_r["subs"], env2)
            args_ti.append(a_r)
        # compose arg substitutions in reverse (ref: algo_w.clj:61-64)
        subs: Dict[str, Schema] = {}
        for ti in reversed(args_ti):
            subs = compose_substitutions(subs, ti["subs"])
        target = {"type": "=>",
                  "input": {"type": "cat",
                            "children": [ti["schema"] for ti in args_ti]},
                  "output": result_var}
        u = mgu(substitute(subs, fn_r["schema"]), target)
        if is_failure(u):
            return {"failure": {"unification_failure": u}}
        return {"subs": compose_substitutions(u, subs),
                "schema": substitute(u, result_var)}

    if op == "abs":
        params = expr["params"]
        svars = [fresh_var() for _ in params]
        env2 = dict(env)
        env2.update(zip(params, svars))
        body_r = algo_w(expr["body"], env2)
        if _is_w_failure(body_r):
            return body_r
        return {"subs": body_r["subs"],
                "schema": {"type": "=>",
                           "input": {"type": "cat",
                                     "children": [substitute(body_r["subs"], v)
                                                  for v in svars]},
                           "output": body_r["schema"]}}

    if op == "let":
        env2 = dict(env)
        subs: Dict[str, Schema] = {}
        for name, init in expr["bindings"]:
            init_r = algo_w(init, env2)
            if _is_w_failure(init_r):
                return init_r
            env2.pop(name, None)
            # let-polymorphism: generalize against the *outer* env under the
            # local substitution (ref: algo_w.clj:104-108)
            gen = generalize(substitute_env(init_r["subs"], env),
                             init_r["schema"])
            env2[name] = gen
            subs = compose_substitutions(init_r["subs"], subs)
        body_r = algo_w(expr["body"], substitute_env(subs, env2))
        if _is_w_failure(body_r):
            return body_r
        return {"subs": compose_substitutions(body_r["subs"], subs),
                "schema": body_r["schema"]}

    if op == "if":
        # desugar to app of env "if" (ref: algo_w.clj:160-166)
        env2 = dict(env)
        env2.setdefault("if", IF_SCHEME)
        return algo_w({"op": "app", "fn": {"op": "var", "sym": "if"},
                       "args": [expr["test"], expr["then"], expr["else"]]},
                      env2)

    if op == "do":
        # side-effect statements are unchecked; only :ret is typed
        # (ref: algo_w.clj:139-141)
        return algo_w(expr["ret"], env)

    raise ValueError(f"unknown expression op: {op!r}")


def infer_schema(expr: Dict[str, Any], env: Dict[str, Schema]) -> Schema:
    """API gate: throws on failure (ref: api.clj:5-8, algo_w.clj:16-17)."""
    result = algo_w(expr, env)
    if _is_w_failure(result):
        raise ValueError(f"Schema inference failure: {result['failure']!r}")
    return result["schema"]


def concretize(bindings: Dict[str, Schema], schema: Schema) -> Schema:
    """Bind known types into a scheme, re-generalizing the rest
    (ref: api.clj:10-15). Engine use: bind baseline column types into a
    snapshot schema that still contains unknowns (all-NULL columns).
    """
    body = schema["body"] if schema.get("type") == "scheme" else schema
    return generalize({}, substitute(bindings, body))
