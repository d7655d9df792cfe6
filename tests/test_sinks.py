"""Output-sink parity (S9/S10): engine sinks must produce the
reference's JSON/CSV shapes, equal to the same structures built from
the golden oracle's results."""

from __future__ import annotations

import json

from wormpy_spark.fixtures.spark_tables import corpus_to_spark
from wormpy_spark.fixtures.webgen import generate_corpus
from wormpy_spark.oracle import crawl_oracle
from wormpy_spark.plans.crawl import CrawlConfig, run_crawl
from wormpy_spark.sources.sinks import collect_csv, collect_json, write_csv_distributed


def test_sink_shapes_match_oracle(spark, tmp_path):
    corpus = generate_corpus(seed=11, n_hosts=2, pages_per_host=12, n_images_per_host=4)
    tables = corpus_to_spark(spark, corpus)
    oracle = crawl_oracle(corpus, "https://host0.test", budget=50, politeness_seed=7)
    res = run_crawl(
        spark, tables["web"],
        CrawlConfig(base_url="https://host0.test", budget=50, politeness_seed=7),
        sitemaps=tables["sitemaps"],
    )

    # JSON wrapper (main.py:65-69): sorted scraped_data + sitemap list
    got = json.loads(collect_json(res.pages, res.sitemap_urls))
    want = {
        "sitemap_urls": oracle.sitemap_urls,
        "scraped_data": dict(sorted(oracle.pages.items())),
    }
    assert got == json.loads(json.dumps(want))  # normalize via json round-trip
    # dict order == sorted order (utils.py:103)
    assert list(got["scraped_data"]) == sorted(got["scraped_data"])

    # CSV shape (utils.py:105-115 + main.py:70-72)
    csv_rows = collect_csv(res.pages, res.sitemap_urls)
    assert csv_rows[0] == ["Sitemap URL"]
    split = csv_rows.index(["Scraped Data"])
    assert [r[0] for r in csv_rows[1:split]] == oracle.sitemap_urls
    assert csv_rows[split + 1] == ["URL", "Content", "Discovered URLs", "Metadata"]
    data_rows = csv_rows[split + 2 :]
    assert [r[0] for r in data_rows] == sorted(oracle.pages)
    for r in data_rows:
        want_page = oracle.pages[r[0]]
        assert r[1] == want_page.get("content")
        assert r[2] == ", ".join(want_page.get("discovered_urls") or [])

    # distributed CSV writes with header and the same row count
    out = str(tmp_path / "csv_out")
    write_csv_distributed(res.pages, out)
    # Content carries newlines → quoted multi-line CSV fields
    back = spark.read.option("header", True).option("multiLine", True).csv(out)
    assert back.count() == len(oracle.pages)
    assert back.columns == ["URL", "Content", "Discovered URLs", "Metadata"]
