"""Sitemap scan + recursive parse as DataFrame transforms (S2/S3).

Reference behavior (modules/utils/sitemap_parser.py):
- probe 9 well-known locations in order, first response whose
  Content-Type contains 'xml' wins (:49-67)
- parse <loc> elements; locs ending '.xml' recurse exactly one level
  into sub-sitemaps; other locs pass is_valid_url (:69-114)
- result: sorted(set(...)) (:22)

This implementation is multi-host: seeding a crawl over thousands of
hosts is one DataFrame job (probe-join → first-hit window → XML-parse
pandas UDF → explode → sub-sitemap join → second parse pass), not a
per-host Python loop. XML parsing runs inside Arrow batches.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, BooleanType, StringType

from ..functions.urlnorm import is_valid_url

SITEMAP_LOCATIONS = [  # sitemap_parser.py:49-53
    "sitemap.xml", "sitemap_index.xml", "sitemap/", "sitemap1.xml",
    "post-sitemap.xml", "page-sitemap.xml", "sitemapindex.xml",
    "sitemap-index.xml", "wp-sitemap.xml",
]


@pandas_udf(ArrayType(StringType()))
def _parse_locs_udf(xmls: pd.Series) -> pd.Series:
    """All <loc> texts in document order; [] on parse error
    (sitemap_parser.py:90-93)."""
    out = []
    for xml in xmls:
        if xml is None:
            out.append([])
            continue
        try:
            root = ET.fromstring(xml)
            out.append([e.text.strip() for e in root.iter() if "loc" in e.tag and e.text])
        except ET.ParseError:
            out.append([])
    return pd.Series(out)


@pandas_udf(ArrayType(StringType()))
def _probe_urls_udf(bases: pd.Series) -> pd.Series:
    return bases.map(lambda b: [urljoin(b, loc) for loc in SITEMAP_LOCATIONS])


@pandas_udf(BooleanType())
def _is_valid_vs_base_udf(urls: pd.Series, bases: pd.Series) -> pd.Series:
    return pd.Series([is_valid_url(u, b) for u, b in zip(urls, bases)])


def expand_sitemaps(
    spark: SparkSession, sitemaps: DataFrame, bases: DataFrame
) -> DataFrame:
    """bases(base_url) → (base_url, url) of sitemap-discovered URLs.

    ``sitemaps`` is the fixture table (url, content_type, xml); on a
    live crawl the same plan applies with the probe join replaced by a
    mapInPandas HTTP fetch.
    """
    # probe_rank = position in the locations list (posexplode keeps order)
    probes = bases.select(
        "base_url", F.posexplode(_probe_urls_udf(F.col("base_url"))).alias("probe_rank", "probe_url")
    )
    hits = probes.join(
        sitemaps.select(F.col("url").alias("probe_url"), "content_type", "xml"),
        on="probe_url",
        how="inner",
    ).filter(F.col("content_type").contains("xml"))
    first_hit = (
        hits.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("base_url").orderBy("probe_rank")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("base_url", "xml")
    )
    locs = first_hit.select(
        "base_url", F.explode(_parse_locs_udf(F.col("xml"))).alias("loc")
    )
    direct = locs.filter(~F.col("loc").endswith(".xml")).filter(
        _is_valid_vs_base_udf(F.col("loc"), F.col("base_url"))
    )
    # one-level recursion into sub-sitemaps (sitemap_parser.py:95-114)
    subs = (
        locs.filter(F.col("loc").endswith(".xml"))
        .join(
            sitemaps.select(F.col("url").alias("loc"), F.col("xml").alias("sub_xml")),
            on="loc",
            how="inner",
        )
        .select(
            "base_url", F.explode(_parse_locs_udf(F.col("sub_xml"))).alias("loc")
        )
        .filter(_is_valid_vs_base_udf(F.col("loc"), F.col("base_url")))
    )
    return (
        direct.select("base_url", F.col("loc").alias("url"))
        .unionByName(subs.select("base_url", F.col("loc").alias("url")))
        .distinct()
    )
