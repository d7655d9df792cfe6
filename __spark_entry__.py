"""Driver contract for the spark-graft builder (PySpark target).

``entry``     — flagship query (TPC-H Q1-style pricing summary) at
                sf0.001.
``queries``   — every implemented operator from SURVEY.md §2 plus the
                training-data pipeline ops (dedup families, ANN,
                text analysis, multimodal plumbing, crawl ordering).
``oracle_sql``— the DuckDB-runnable ANSI equivalents; scale-path ops
                (MinHash-LSH, LSH-ANN, blocked/banded embedding dedup)
                are oracled against their brute-force equivalents so
                the check proves recall. Fixture-driven ops (image
                decode/verify, phash pairing, crawl ordering) are
                oracled via deterministic sidecar parquet that
                full_registry() materializes from the seeded
                generators / the reference-semantics python oracle —
                every registered query carries an oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from wormpy_spark.plans.registry import full_registry

    return full_registry()["q1_pricing_summary"][0](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from wormpy_spark.plans.registry import full_registry

    return {name: fn for name, (fn, _) in full_registry().items()}


def oracle_sql() -> dict[str, str]:
    from wormpy_spark.plans.registry import full_registry

    return {
        name: sql for name, (_, sql) in full_registry().items() if sql is not None
    }
