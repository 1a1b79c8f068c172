"""Shared Spark helpers: session builder, salting, canonical output order."""

from .session import get_spark, stop_spark  # noqa: F401
