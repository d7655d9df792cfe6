"""Shared test fixtures: one SparkSession per test run + the
deterministic synthetic corpus (as pandas and as Spark DataFrames)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    ArrayType,
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from wormpy_spark.fixtures.webgen import generate_corpus  # noqa: E402
from wormpy_spark.session import get_spark  # noqa: E402

WEB_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("url_norm", StringType()),
        StructField("host", StringType()),
        StructField("status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("body", BinaryType()),
        StructField("links", ArrayType(StringType())),
        StructField("is_dynamic", BooleanType()),
        StructField("dynamic_body", BinaryType()),
        StructField("dynamic_links", ArrayType(StringType())),
        StructField("image_id", StringType()),
        StructField("fail_attempts", IntegerType()),
        StructField("selenium_fail_attempts", IntegerType()),
        StructField("raise_in_loop", BooleanType()),
    ]
)

IMAGES_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
    ]
)

SITEMAPS_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("kind", StringType()),
        StructField("probe_rank", IntegerType()),
        StructField("content_type", StringType()),
        StructField("xml", StringType()),
    ]
)

ROBOTS_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("status", IntegerType()),
        StructField("body", StringType()),
    ]
)


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("wormpy_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus():
    return generate_corpus()


def _native(v):
    """numpy scalar / NaN → python native / None for createDataFrame."""
    import numpy as np

    if v is None:
        return None
    if isinstance(v, float) and v != v:  # NaN
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (np.bool_,)):
        return bool(v)
    return v


def _rows(pdf, schema):
    cols = [f.name for f in schema.fields]
    return [tuple(_native(v) for v in rec) for rec in pdf[cols].itertuples(index=False)]


def corpus_to_spark(spark, corpus):
    """pandas corpus → Spark DataFrames with explicit schemas (binary
    columns don't survive createDataFrame schema inference)."""
    return {
        "web": spark.createDataFrame(_rows(corpus["web"], WEB_SCHEMA), WEB_SCHEMA),
        "images": spark.createDataFrame(_rows(corpus["images"], IMAGES_SCHEMA), IMAGES_SCHEMA),
        "sitemaps": spark.createDataFrame(_rows(corpus["sitemaps"], SITEMAPS_SCHEMA), SITEMAPS_SCHEMA),
        "robots": spark.createDataFrame(_rows(corpus["robots"], ROBOTS_SCHEMA), ROBOTS_SCHEMA),
    }


@pytest.fixture(scope="session")
def spark_corpus(spark, corpus):
    return corpus_to_spark(spark, corpus)
