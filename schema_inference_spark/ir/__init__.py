"""Pure-Python schema IR: algebra, unification, inference, subschema."""

from .schema_ir import (  # noqa: F401
    canonical_ground,
    canonical_ground_name,
    compose_substitutions,
    free_type_vars,
    free_type_vars_env,
    fresh_var,
    generalize,
    ground,
    instantiate,
    is_failure,
    is_ground,
    merge_column_schema,
    mgu,
    normalize_svars,
    reset_fresh_counter,
    s_var,
    schema_to_json,
    substitute,
    substitute_env,
    unify_or_failure,
)
from .subschema import schema_equivalent, sub_schema  # noqa: F401
from .algo_w import concretize, infer_schema, provide_value  # noqa: F401
