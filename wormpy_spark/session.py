"""SparkSession factory tuned for the crawl engine.

Scale posture: every knob here is chosen so the same code runs on a
1000-executor cluster — AQE on (runtime re-planning + skew-join
splitting), Arrow on (all Python logic rides vectorized batches, never
per-row), shuffle partitions sized to the local core count but
overridable via ``SPARK_GRAFT_CPUS`` / explicit args for cluster runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def iceberg_conf(
    catalog: str = "wormpy", warehouse: str | None = None
) -> dict[str, str]:
    """The standard (public, documented) Iceberg-on-Spark wiring: a
    SparkCatalog entry + the runtime's SQL extensions. This is the
    config-only swap SURVEY §7.5-4 describes — when
    ``iceberg-spark-runtime`` is on the classpath these settings make
    ``spark.table(f"{catalog}.db.t")`` a real Iceberg catalog; without
    the jar the session still builds and the engine selects the
    parquet+manifest shim (sources/catalog.py). Exercised by
    tests/test_catalog.py::test_iceberg_config_contract."""
    conf = {
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
    }
    if warehouse is not None:
        conf[f"spark.sql.catalog.{catalog}.warehouse"] = warehouse
    return conf


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the iceberg-spark-runtime jar is actually on the JVM
    classpath (the shim stays in charge otherwise)."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def select_catalog_backend(spark: SparkSession) -> str:
    """'iceberg' when the runtime jar is present, else 'shim' — the
    documented swap path, as a function instead of prose."""
    return "iceberg" if iceberg_available(spark) else "shim"


def get_spark(
    app_name: str = "wormpy_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    iceberg: bool = False,
    iceberg_warehouse: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard conf.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox;
    on a real cluster spark-submit supplies the master and these
    settings remain valid.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing, skew-join splitting, plan re-optimization.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # NOTE: coalescePartitions.parallelismFirst stays at its default
        # (true). Crawl stages are CPU-heavy per byte (HTML parsing in
        # Arrow UDFs), so size-based coalescing to few partitions
        # serializes the real work — measured 2x slower with it off.
        # Arrow: all pandas UDF traffic is columnar batches.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Image/binary payload rows are fat — keep Arrow batches bounded
        # so an executor never materializes multi-GB batches.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # DF-cache columnar batches: default 10000 rows/batch makes
        # multi-MB humongous allocations out of binary body columns
        # (measured 250s+ of GC while building the web cache); smaller
        # batches keep allocations region-sized.
        .config("spark.sql.inMemoryColumnarStorage.batchSize", "1024")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Broadcast threshold: small dimension tables (robots rules,
        # host state) broadcast instead of shuffling the big frontier.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if iceberg:
        for k, v in iceberg_conf(warehouse=iceberg_warehouse).items():
            builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
