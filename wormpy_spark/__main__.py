"""spark-submit / python -m entry point (reference main.py parity).

Cluster usage (north_rule packaging):

    zip -r wormpy_spark.zip wormpy_spark
    spark-submit --py-files wormpy_spark.zip \
        --master <cluster> run.py https://host0.test --discovery \
        --web-table s3://bucket/web_snapshot --format json

where run.py is two lines (``from wormpy_spark.__main__ import main;
main()``) — or locally just ``python -m wormpy_spark <url> ...``.

Arguments mirror the reference CLI (main.py:84-126): url, --discovery,
--format {json,csv}, --savename, --log; engine additions: --web-table
(parquet snapshot of the offline web; omit for --live real HTTP),
--budget, --checkpoint/--resume, --respect-robots.
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime


def main(argv: list[str] | None = None) -> str:
    ap = argparse.ArgumentParser(prog="wormpy_spark")
    ap.add_argument("url")
    ap.add_argument("--discovery", action="store_true")
    ap.add_argument("--format", choices=["json", "csv"], default="json")
    ap.add_argument("--savename", default=None)
    ap.add_argument("--log", default="INFO")
    ap.add_argument("--budget", type=int, default=100)
    ap.add_argument("--web-table", default=None,
                    help="parquet path of the offline web snapshot")
    ap.add_argument("--live", action="store_true",
                    help="real HTTP via requests (no web table)")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--respect-robots", action="store_true")
    ap.add_argument("--out-root", default=".",
                    help="root for scrapes/<domain>/ output")
    ap.add_argument("--now", default=None, help=argparse.SUPPRESS)  # test hook
    args = ap.parse_args(argv)

    from .functions.urlnorm import get_domain, normalize_url
    from .sources.logsink import configure_logging
    from .sources.sinks import (
        collect_csv,
        collect_json,
        log_filename,
        save_output,
        set_filename,
    )

    import logging

    base = normalize_url(args.url)
    domain = args.savename or get_domain(base)
    now = args.now or datetime.now().strftime("%Y%m%d_%H%M%S")
    log_path = os.path.join(args.out_root, "scrapes", domain, log_filename(now))
    app_logger = logging.getLogger("wormpy_spark")
    app_logger.propagate = False  # keep Spark's root log4j bridge clean
    logger = configure_logging(
        log_level=args.log, log_file=log_path, logger=app_logger
    )
    logger.info("Starting web scraping process...")

    from .plans.crawl import CrawlConfig, run_crawl
    from .session import get_spark

    spark = get_spark("wormpy_spark_cli")
    if args.web_table:
        web = spark.read.parquet(args.web_table)
    elif args.live:
        raise SystemExit(
            "--live crawling drives make_live_fetch (operators/fetch.py) and "
            "needs network access; supply --web-table for offline runs"
        )
    else:
        raise SystemExit("one of --web-table or --live is required")

    cfg = CrawlConfig(
        base_url=args.url,
        budget=args.budget,
        discovery=args.discovery,
        respect_robots=args.respect_robots,
        checkpoint_dir=args.checkpoint,
        resume=args.resume,
    )
    res = run_crawl(spark, web, cfg)
    if args.format == "json":
        import json as _json

        data = _json.loads(collect_json(res.pages, res.sitemap_urls))
        n = len(data["scraped_data"])
    else:
        data = collect_csv(res.pages, res.sitemap_urls)
        n = max(len(data) - 2 - len(res.sitemap_urls), 0)
    path = save_output(
        data, domain, set_filename(args.format, now), args.format,
        root=args.out_root,
    )
    logger.info(f"Scraping complete. Saved output to {path}.")
    logger.info(f"Total URLs scraped: {n}")
    return path


if __name__ == "__main__":
    main()
