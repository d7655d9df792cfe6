"""spark-submit / python -m CLI entry (reference main.py parity):
offline crawl over a web-table parquet, JSON + CSV outputs in the
reference's scrapes/<domain>/scrape_<ts>.<fmt> layout."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from wormpy_spark.__main__ import main
from wormpy_spark.fixtures.webgen import generate_corpus


def _write_web(tmp_path) -> str:
    corpus = generate_corpus(seed=21, n_hosts=1, pages_per_host=8)
    path = str(tmp_path / "web")
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(corpus["web"], preserve_index=False),
        os.path.join(path, "part-0.parquet"),
    )
    return path


def test_cli_json_output(spark, tmp_path):
    web = _write_web(tmp_path)
    out = main([
        "https://host0.test", "--discovery", "--budget", "12",
        "--web-table", web, "--format", "json",
        "--out-root", str(tmp_path), "--now", "20260101_000000",
    ])
    assert out.endswith("scrapes/host0.test/scrape_20260101_000000.json")
    data = json.load(open(out))
    assert set(data) == {"sitemap_urls", "scraped_data"}
    assert len(data["scraped_data"]) == 12
    assert list(data["scraped_data"]) == sorted(data["scraped_data"])
    # log file exists in the reference layout and carries the banner
    log = os.path.join(str(tmp_path), "scrapes", "host0.test",
                       "scrape_log_20260101_000000.log")
    assert "Scraping complete" in open(log).read()


def test_cli_csv_output(spark, tmp_path):
    web = _write_web(tmp_path)
    out = main([
        "https://host0.test", "--budget", "1",
        "--web-table", web, "--format", "csv",
        "--out-root", str(tmp_path), "--now", "20260101_000001",
    ])
    lines = open(out).read().splitlines()
    assert lines[0] == "Sitemap URL"
    assert "Scraped Data" in lines
    hdr = lines[lines.index("Scraped Data") + 1]
    assert hdr.split(",")[:2] == ["URL", "Content"]
