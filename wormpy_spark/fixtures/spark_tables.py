"""Corpus (pandas) → Spark DataFrames with explicit schemas.

Binary/array columns don't survive createDataFrame schema inference,
and numpy scalars need native coercion; shared by tests, the crawl
query entries, and bench."""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

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

TRUTH_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("pixels_sha256", StringType()),
        StructField("psnr_floor_db", StringType()),  # 'inf' for lossless
        StructField("caption", StringType()),
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


def _native(v):
    if v is None:
        return None
    if isinstance(v, float) and v != v:  # NaN
        return None
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, np.bool_):
        return bool(v)
    return v


def _rows(pdf, schema):
    cols = [f.name for f in schema.fields]
    out = []
    for rec in pdf[cols].itertuples(index=False):
        out.append(tuple(_native(v) for v in rec))
    return out


def images_to_spark(spark: SparkSession, images_pdf):
    return spark.createDataFrame(_rows(images_pdf, IMAGES_SCHEMA), IMAGES_SCHEMA)


def truth_to_spark(spark: SparkSession, truth_pdf):
    pdf = truth_pdf.copy()
    pdf["psnr_floor_db"] = pdf["psnr_floor_db"].map(str)
    return spark.createDataFrame(_rows(pdf, TRUTH_SCHEMA), TRUTH_SCHEMA)


def corpus_to_spark(spark: SparkSession, corpus: dict) -> dict:
    return {
        "web": spark.createDataFrame(_rows(corpus["web"], WEB_SCHEMA), WEB_SCHEMA),
        "images": images_to_spark(spark, corpus["images"]),
        "images_truth": truth_to_spark(spark, corpus["images_truth"]),
        "sitemaps": spark.createDataFrame(
            _rows(corpus["sitemaps"], SITEMAPS_SCHEMA), SITEMAPS_SCHEMA
        ),
        "robots": spark.createDataFrame(
            _rows(corpus["robots"], ROBOTS_SCHEMA), ROBOTS_SCHEMA
        ),
    }


AUDIO_SCHEMA = StructType(
    [
        StructField("audio_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
    ]
)

VIDEO_SCHEMA = StructType(
    [
        StructField("video_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("fps", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
    ]
)


def audio_to_spark(spark: SparkSession, audio_pdf):
    return spark.createDataFrame(_rows(audio_pdf, AUDIO_SCHEMA), AUDIO_SCHEMA)


def video_to_spark(spark: SparkSession, video_pdf):
    return spark.createDataFrame(_rows(video_pdf, VIDEO_SCHEMA), VIDEO_SCHEMA)
