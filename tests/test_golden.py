"""Golden scrape-session replay (SURVEY.md §5.3-2, BASELINE.json):
the Spark engine's crawl ordering, URL-seen set, page payloads, and
politeness budget must EXACTLY equal the reference-semantics oracle
on the same corpus + seed list + politeness seed."""

from __future__ import annotations

import pytest

from wormpy_spark.oracle import crawl_oracle
from wormpy_spark.plans.crawl import CrawlConfig, run_crawl

RUNS = [
    # (run_id, base_url, budget, discovery, politeness_seed)
    ("discovery_h0", "https://HOST0.test/", 100, True, 42),
    ("single_h1", "https://host1.test/p/1?x=1", 100, False, 42),
    ("subtree_h2", "https://host2.test/sub", 100, True, 43),
    ("budget20_h0", "https://host0.test", 20, True, 44),
]


def engine_pages_as_oracle_dicts(pages_rows) -> dict[str, dict]:
    out = {}
    for r in pages_rows:
        if r["error"] == "loop_error":
            out[r["url_norm"]] = {"content": r["text"]}  # R3 shape
        else:
            out[r["url_norm"]] = {
                "metadata": dict(r["metadata"]) if r["metadata"] is not None else None,
                "content": r["text"],
                "discovered_urls": list(r["discovered_urls"])
                if r["discovered_urls"] is not None
                else None,
            }
    return out


@pytest.mark.parametrize("run_id,base_url,budget,discovery,seed", RUNS)
def test_golden_parity(spark, corpus, spark_corpus, run_id, base_url, budget, discovery, seed):
    oracle = crawl_oracle(
        corpus, base_url, budget=budget, discovery=discovery, politeness_seed=seed
    )
    cfg = CrawlConfig(
        base_url=base_url,
        budget=budget,
        discovery=discovery,
        politeness_seed=seed,
    )
    res = run_crawl(
        spark,
        spark_corpus["web"],
        cfg,
        sitemaps=spark_corpus["sitemaps"],
        robots=spark_corpus["robots"],
    )

    # 1. sitemap seeding parity (S2/S3/O3)
    if discovery:
        assert res.sitemap_urls == oracle.sitemap_urls

    # 2. crawl ordering: exact (seq, url_norm) equality (O1-O4)
    engine_order = [r["url_norm"] for r in res.order.collect()]
    assert engine_order == oracle.order, (
        f"[{run_id}] order diverges at "
        f"{next(i for i, (a, b) in enumerate(zip(engine_order, oracle.order)) if a != b) if engine_order != oracle.order and len(engine_order) == len(oracle.order) else 'length'}"
    )

    # 3. URL-seen set: exact equality (J1/J3)
    engine_seen = {r["url_norm"] for r in res.seen.collect()}
    assert engine_seen == oracle.seen

    # 4. page payloads: metadata/text/discovered incl. R2/R3 shapes
    engine_pages = engine_pages_as_oracle_dicts(
        [r.asDict(recursive=True) for r in res.pages.collect()]
    )
    assert engine_pages.keys() == oracle.pages.keys()
    for url in oracle.pages:
        assert engine_pages[url] == oracle.pages[url], f"[{run_id}] payload mismatch: {url}"

    # 5. politeness budget: per-host attempts + simulated clock (T1/T2)
    engine_hosts = {
        r["host"]: r for r in res.host_state.collect()
    }
    assert set(engine_hosts) == set(oracle.politeness)
    for host, st in oracle.politeness.items():
        eh = engine_hosts[host]
        assert eh["attempts"] == st["attempts"], f"[{run_id}] attempts {host}"
        assert abs(eh["clock_s"] - (st["delay_s"] + st["debit_s"])) < 1e-6, f"[{run_id}] clock {host}"
