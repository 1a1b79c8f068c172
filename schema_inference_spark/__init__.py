"""schema_inference_spark — PySpark-native schema inference + constraint
validation engine over transcript tables.

Built from scratch against the semantics of thelmuth/schema-inference
(/root/reference, a Clojure Hindley–Milner schema-inference PoC): its schema
algebra becomes the engine's pure-Python IR (`ir/`), its value->schema rule
becomes the per-partition Arrow column-state extraction, its unification
failures become violation rows, and its constraint surface is extended to
the relational checks BASELINE.json specifies (uniqueness, referential
integrity, turn ordering, distribution drift), all expressed Spark-first.
"""

__version__ = "0.1.0"
