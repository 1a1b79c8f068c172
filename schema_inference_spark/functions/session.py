"""SparkSession builder with the engine's scale-minded defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _resolve_master(explicit: str | None, cpus: str,
                    env: "os._Environ[str] | dict[str, str]") -> str | None:
    """Pick the master to force on the builder, or None to defer.

    Under spark-submit the JVM gateway already exists and carries the
    submitted conf (--master, --conf ...); setting .master() here would
    silently override the cluster. PYSPARK_GATEWAY_PORT is how the
    PythonRunner child finds that JVM, so its presence means "defer to
    the submitted master" unless the caller forces one explicitly.
    """
    if explicit is not None:
        return explicit
    if "PYSPARK_GATEWAY_PORT" in env:
        return None
    return f"local[{cpus}]"


def get_spark(app_name: str = "schema-inference-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              max_partition_bytes: str | None = None) -> SparkSession:
    """local[$SPARK_GRAFT_CPUS] by default; AQE on (coalesce + skew-join,
    SURVEY.md §2.D18); Arrow on for every pandas/Arrow UDF boundary.

    max_partition_bytes: local-mode inputs are small relative to the 128MB
    default, which starves the scan of splits (a 650MB snapshot = 6 tasks
    regardless of cores). 16MB keeps local scans parallel; prod clusters
    keep the default.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = _resolve_master(master, cpus, os.environ)
    shuffle = shuffle_partitions if shuffle_partitions is not None else int(cpus)
    mpb = max_partition_bytes or os.environ.get(
        "SPARK_GRAFT_MAX_PARTITION_BYTES", "16m")
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.files.maxPartitionBytes", mpb)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # local analog of the 16m scan-split note above: AQE's 64MB
        # advisory target coalesces the CPU-heavy post-shuffle stages
        # (JSON parse, regex, digest folds) of MB-sized local inputs
        # down to a handful of tasks; 16m keeps them spread (measured
        # ~10% on a warm mid-tier subset, and removes whole-stage
        # serialization cliffs). Prod clusters override via env to the
        # guide's 100MB-1GB sizing (§2.2).
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "16m"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", driver_mem)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    # Pre-size and PRE-TOUCH the heap at JVM start (once per process,
    # before any query runs) instead of letting every big first
    # execution page-fault its working set in: a cold 100M-group
    # aggregation measured 42.6s against 18.2s with a pre-touched heap
    # (the first touch of ~20GB of heap pages IS the difference — -Xms
    # alone, without AlwaysPreTouch, changed nothing). A long-lived
    # cluster executor pays this once at executor launch and never per
    # query, which is exactly what the flag reproduces locally (guide
    # §5: memory behavior belongs to process lifecycle, not to the
    # queries that happen to run first). Opt out / resize via env for
    # memory-tight hosts; no effect under spark-submit (the JVM is
    # already up, Spark ignores driver extraJavaOptions then).
    if os.environ.get("SPARK_GRAFT_PRETOUCH", "1") != "0":
        xms = os.environ.get("SPARK_GRAFT_XMS", driver_mem)
        builder = builder.config(
            "spark.driver.extraJavaOptions",
            f"-Xms{xms} -XX:+AlwaysPreTouch")
    if master is not None:
        builder = builder.master(master)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
