"""Full query registry for the driver contract (__spark_entry__.py).

Three families:
1. SQL-oracled analytics/training-data ops (plans/analytics.py)
2. Scale-path operators whose output equals a brute-force SQL oracle
   (MinHash-LSH dedup, LSH ANN) — the driver check doubles as a
   recall proof
3. Non-SQL-expressible ops (crawl ordering, binary image decode) —
   rows-only checks; their exactness is covered by tests/ (golden
   oracle, sha invariants)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures.imagegen import generate_images
from ..fixtures.spark_tables import corpus_to_spark, images_to_spark, truth_to_spark
from ..fixtures.webgen import generate_corpus
from ..operators.dedup import minhash_lsh_jaccard_pairs
from ..operators.multimodal import decode_verify, phash_neardup_pairs
from ..operators.similarity import ann_lsh_topk
from .analytics import NGRAM_JACCARD_DUCK, ANN_TOPK_DUCK, REGISTRY, load_views
from .crawl import CrawlConfig, run_crawl

# -- scale-path entries (SQL-oracled via brute-force equivalents) -----------

def _dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    docs = spark.table("documents")
    return minhash_lsh_jaccard_pairs(spark, docs)


def _ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    emb = spark.table("embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in qrow["embedding"]]
    # radius 16 = exact (all buckets probed); the recall/scan-fraction
    # trade-off is exercised in tests with smaller radii
    return ann_lsh_topk(emb, qvec, k=10, hamming_radius=16, exclude_id=0)


# -- non-SQL entries (rows-only driver check; exactness pinned in tests) ----

def _mm_decode_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    images_pdf, truth_pdf = generate_images(n_images=48, seed=123)
    return decode_verify(
        images_to_spark(spark, images_pdf), truth_to_spark(spark, truth_pdf)
    )


def _mm_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    images_pdf, _ = generate_images(n_images=64, seed=321, near_dup_fraction=0.25)
    return phash_neardup_pairs(images_to_spark(spark, images_pdf))


def _crawl_discovery_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = generate_corpus(seed=11, n_hosts=2, pages_per_host=12, n_images_per_host=4)
    tables = corpus_to_spark(spark, corpus)
    cfg = CrawlConfig(base_url="https://host0.test", budget=50, politeness_seed=7)
    res = run_crawl(spark, tables["web"], cfg, sitemaps=tables["sitemaps"])
    return res.order


EXTRA_REGISTRY: dict[str, tuple] = {
    "dedup_minhash_lsh": (_dedup_minhash_lsh, NGRAM_JACCARD_DUCK),
    "ann_lsh_topk": (_ann_lsh, ANN_TOPK_DUCK),
    "mm_image_decode_verify": (_mm_decode_verify, None),
    "mm_phash_neardup": (_mm_phash_neardup, None),
    "crawl_discovery_order": (_crawl_discovery_order, None),
}


def full_registry() -> dict[str, tuple]:
    return {**REGISTRY, **EXTRA_REGISTRY}
