"""Golden oracle: an in-memory executor of the reference's crawl-loop
semantics (SURVEY.md §5.3-2).

This is NOT engine code — it exists so tests can assert that the Spark
engine's crawl ordering, URL-seen set, page payloads, and politeness
budget are exactly equal to the reference's behavior. Every branch
cites the reference line it replicates. Determinism shims (applied
identically on both sides, SURVEY.md §2.5-O4): one logical scraper,
expansions enqueued in sorted(url_norm) order, politeness delays from
the shared seeded schedule in ``operators.politeness``.

Control flow replicated from /root/reference:
- seed = normalized base (main.py:111, main.py:52) + sorted sitemap
  URLs in discovery mode (main.py:55-58, sitemap_parser.py:22)
- pop-order FIFO (url_tracker.py:75); budget check after pop, popped
  URL discarded (scraper.py:66-69)
- scope prefix on normalized URL (scraper.py:73-75)
- visited check at pop (scraper.py:77-79)
- suspicious → HEAD image probe → skip only if image/* (scraper.py:81-84)
- rate-limit draw before processing (scraper.py:88-89)
- Selenium driver-construction failure → requeue at head, no result,
  not visited (scraper.py:119-125; draws a delay per pop, no fetch)
- fetch: raise_for_status, ≤2 attempts, 1s backoff (content_processor.py:87-133)
- dynamic: extracted text < 500 chars → selenium body + DOM links take
  precedence (content_processor.py:113-119, :55, :270-287)
- R2: fetch failure → row(metadata=None, content=None, discovered=[]),
  visited, counts toward budget (content_processor.py:58-60,
  scraper.py:107-113)
- R3: loop error → row(content=<msg>) only, visited (scraper.py:127-131)
- expansions: normalize, prefix-filter, admit-if-not-visited at tail
  (scraper.py:99-105, url_tracker.py:84-87)
- result row: metadata/content/sorted(discovered) (scraper.py:107-111)
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections import deque
from dataclasses import dataclass, field
from urllib.parse import urljoin

import pandas as pd

from .functions.extract import (
    extract_links,
    extract_meta,
    extract_text,
    is_dynamic_content,
    pdf_info,
    pdf_text,
)
from .functions.urlnorm import (
    get_domain,
    is_pdf_path,
    is_suspicious_url,
    is_valid_url,
    normalize_url,
)
from .operators.politeness import MAX_RETRIES, backoff_debit, politeness_delay

SCRAPER_ID = 1  # canonical single scraper (run_scrapers uses id 1)

SITEMAP_LOCATIONS = [  # sitemap_parser.py:49-53
    "sitemap.xml", "sitemap_index.xml", "sitemap/", "sitemap1.xml",
    "post-sitemap.xml", "page-sitemap.xml", "sitemapindex.xml",
    "sitemap-index.xml", "wp-sitemap.xml",
]


def sitemap_get_all_urls(base_url: str, sitemaps: pd.DataFrame) -> list[str]:
    """Replicates get_all_urls (sitemap_parser.py:12-22): first XML hit
    of the 9 probe locations, recursive one level into .xml locs,
    is_valid_url filter, returns sorted list."""
    by_url = {r["url"]: r for _, r in sitemaps.iterrows()}

    content = None
    for loc in SITEMAP_LOCATIONS:
        full = urljoin(base_url, loc)
        row = by_url.get(full)
        if row is not None and "xml" in (row["content_type"] or ""):
            content = row["xml"]
            break
    if content is None:
        return []
    try:
        root = ET.fromstring(content)
    except ET.ParseError:
        return []
    urls: set[str] = set()
    for elem in root.iter():
        if "loc" in elem.tag:
            url = elem.text.strip()
            if url.endswith(".xml"):
                sub = by_url.get(url)
                if sub is None:
                    continue
                try:
                    sub_root = ET.fromstring(sub["xml"])
                    urls.update(
                        e.text.strip()
                        for e in sub_root.iter()
                        if "loc" in e.tag and is_valid_url(e.text.strip(), base_url)
                    )
                except ET.ParseError:
                    continue
            elif is_valid_url(url, base_url):
                urls.add(url)
    return sorted(urls)


@dataclass
class OracleResult:
    order: list[str] = field(default_factory=list)  # url_norm in seq order
    pages: dict[str, dict] = field(default_factory=dict)
    seen: set[str] = field(default_factory=set)
    sitemap_urls: list[str] = field(default_factory=list)
    politeness: dict[str, dict] = field(default_factory=dict)  # host → stats


def crawl_oracle(
    corpus: dict[str, pd.DataFrame],
    base_url: str,
    budget: int = 100,
    discovery: bool = True,
    politeness_seed: int = 42,
    respect_robots: bool = False,
) -> OracleResult:
    web = {r["url_norm"]: r for _, r in corpus["web"].iterrows()}
    res = OracleResult()

    base = normalize_url(base_url)  # main.py:111
    pool: deque[str] = deque([base])  # main.py:52
    if discovery:
        res.sitemap_urls = sitemap_get_all_urls(base, corpus["sitemaps"])
        for u in res.sitemap_urls:  # add_bulk filters vs visited only
            if u not in res.seen:
                pool.append(u)

    robots = None
    if respect_robots:
        from .operators.robots import RobotsCache

        robots = RobotsCache.from_fixture(corpus["robots"])

    sel_remaining: dict[str, int] = {}
    host_ix: dict[str, int] = {}

    def draw(host: str) -> float:
        ix = host_ix.get(host, 0)
        host_ix[host] = ix + 1
        d = politeness_delay(politeness_seed, host, ix)
        st = res.politeness.setdefault(host, {"attempts": 0, "delay_s": 0.0, "debit_s": 0.0})
        st["attempts"] += 1
        st["delay_s"] += d
        return d

    while True:
        url = pool.popleft() if pool else None
        if url is None or (discovery and len(res.pages) >= budget):
            break  # scraper.py:66-69 (popped URL discarded on budget hit)

        norm = normalize_url(url)  # scraper.py:71
        if not norm.startswith(base):  # scraper.py:73-75
            continue
        if norm in res.seen:  # scraper.py:77-79
            continue
        if is_suspicious_url(norm):  # scraper.py:81-84
            row_probe = web.get(norm)
            ctype = row_probe["content_type"] if row_probe is not None else ""
            if ctype.startswith("image/"):
                continue
        if robots is not None and not robots.allows(norm):
            continue  # north_rule addition — OFF in golden runs

        row = web.get(norm)
        host = get_domain(norm)
        draw(host)  # scraper.py:88-89

        # T3: Selenium driver construction failure (scraper.py:90-95,119-125)
        # — requeue at pool head, no result, not visited; next pop retries.
        if row is not None:
            if norm not in sel_remaining:
                sel_remaining[norm] = int(row.get("selenium_fail_attempts", 0) or 0)
            if sel_remaining[norm] > 0:
                sel_remaining[norm] -= 1
                pool.appendleft(norm)  # url_tracker.py:117-126
                continue

        if row is not None and bool(row.get("raise_in_loop", False)):
            # R3 (scraper.py:127-131)
            msg = f"Scraper {SCRAPER_ID}: Error processing {norm}: synthetic loop error"
            res.pages[norm] = {"content": msg}
            res.seen.add(norm)
            res.order.append(norm)
            continue

        failed = (
            row is None
            or int(row["status"]) != 200
            or int(row["fail_attempts"]) >= MAX_RETRIES
        )
        first_attempt_failed = row is None or int(row["status"]) != 200 or int(row["fail_attempts"]) >= 1
        res.politeness[host]["debit_s"] += backoff_debit(first_attempt_failed)

        if failed:
            # R2 (content_processor.py:58-60; scraper.py:107-113)
            res.pages[norm] = {
                "metadata": None,
                "content": None,
                "discovered_urls": [],
            }
            res.seen.add(norm)
            res.order.append(norm)
            continue

        ctype = row["content_type"]
        discovered: list[str] | set[str] = set()
        if ctype.lower().startswith("text/html"):
            body = bytes(row["body"]).decode("utf-8", errors="replace")
            fetched_urls: list[str] = []
            if is_dynamic_content(body):  # content_processor.py:113-119
                if row["dynamic_body"] is None:
                    # selenium couldn't fetch → R2 after retries
                    res.pages[norm] = {"metadata": None, "content": None, "discovered_urls": []}
                    res.seen.add(norm)
                    res.order.append(norm)
                    continue
                body = bytes(row["dynamic_body"]).decode("utf-8", errors="replace")
                fetched_urls = list(row["dynamic_links"] or [])
            metadata = extract_meta(body, ctype, norm)
            text = extract_text(body)
            discovered = fetched_urls if fetched_urls else extract_links(body, norm, ctype)
        elif ctype.lower() == "application/pdf" or is_pdf_path(norm):
            body_b = bytes(row["body"])
            metadata = {"url": norm, "content_type": ctype, **pdf_info(body_b)}
            text = pdf_text(body_b)
            discovered = set()
        else:
            metadata = {"url": norm, "content_type": ctype}
            text = f"Scraper {SCRAPER_ID}: Unsupported content type: {ctype}"
            discovered = set()

        if discovery:
            all_norm = {normalize_url(u) for u in discovered}  # scraper.py:99
            in_scope = {u for u in all_norm if u.startswith(base)}  # scraper.py:102
            for u in sorted(in_scope):  # determinism shim (O4)
                if u not in res.seen:  # url_tracker.py:84-87
                    pool.append(u)

        res.pages[norm] = {
            "metadata": metadata,
            "content": text,
            "discovered_urls": sorted(discovered) if discovery else [],
        }
        res.seen.add(norm)  # scraper.py:113
        res.order.append(norm)

        if not discovery:
            break  # scraper.py:116-117

    return res
