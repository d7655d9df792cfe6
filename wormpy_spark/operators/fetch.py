"""Fetch + extract: the engine's "HTTP GET" (S4-S7, F1-F3, F7, R2/R3).

Offline, the network is the synthetic ``web`` table and fetching is an
equi-join of the due frontier against it (SURVEY.md §2.3-J7); the
joined batch then flows through ONE ``mapInPandas`` pass that performs
everything the reference's ``process_page`` does
(content_processor.py:20-60):

- decode bytes utf-8/replace (:40-41)
- dynamic trigger: extracted text < 500 chars → selenium-model body +
  DOM links take precedence (:113-119, :55, :270-287)
- metadata / text / link extraction (F1-F3)
- PDF branch via the shared stub extractor (F4, offline)
- unsupported-type literal text (F7, :52)
- R2 fetch-failure rows: metadata=None, content=None, discovered=[]
  (:58-60 + scraper.py:107-113)
- R3 loop-error rows: content=<message> only (scraper.py:127-131)

One Arrow pass means body bytes cross the JVM↔Python boundary exactly
once per row; the output columns are small (text/meta/links), so the
shuffle that follows never carries raw bodies.

A live-mode ``mapInPandas`` fetcher (real HTTP, batched) is stubbed at
the bottom — same output schema, gated on the requests library, not
exercisable in the sandbox.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from ..functions.extract import (
    extract_links,
    extract_meta,
    extract_text,
    is_dynamic_content,
    pdf_stub_text,
)
from ..functions.urlnorm import is_pdf_path
from ..operators.politeness import MAX_RETRIES

SCRAPER_ID = 1

PAGES_SCHEMA = (
    "seq long, round int, url_norm string, host string, host_shard int, "
    "content_type string, text string, metadata map<string,string>, "
    "discovered_urls array<string>, error string, image_id string, "
    "attempts int, fetch_failed_first boolean"
)


def _isnull(v) -> bool:
    """None/NaN check that tolerates numpy arrays (Arrow batches hand
    list columns to Python as ndarrays, and a left-join miss turns
    int columns into float NaN)."""
    if v is None:
        return True
    if isinstance(v, float) and v != v:
        return True
    return False


def process_row(row: dict, discovery: bool) -> dict:
    """process_page semantics for one joined (frontier ⋈ web) row.
    Pure function — unit-testable without Spark."""
    out = {
        "seq": row["seq"],
        "round": row["round"],
        "url_norm": row["url_norm"],
        "host": row["host"],
        "host_shard": row.get("host_shard", 0),
        "content_type": None,
        "text": None,
        "metadata": None,
        "discovered_urls": None,
        "error": None,
        "image_id": None if _isnull(row.get("image_id")) else row.get("image_id"),
        "attempts": 1
        + (0 if _isnull(row.get("selenium_fail_attempts")) else int(row["selenium_fail_attempts"])),
        "fetch_failed_first": False,
    }
    norm = row["url_norm"]
    missing = _isnull(row.get("status"))

    if not missing and bool(row.get("raise_in_loop") or False):
        # R3 — generic loop exception (scraper.py:127-131)
        out["text"] = f"Scraper {SCRAPER_ID}: Error processing {norm}: synthetic loop error"
        out["error"] = "loop_error"
        return out

    fail_attempts = 0 if _isnull(row.get("fail_attempts")) else int(row["fail_attempts"])
    failed = missing or int(row["status"]) != 200 or fail_attempts >= MAX_RETRIES
    out["fetch_failed_first"] = bool(
        missing or int(row["status"]) != 200 or fail_attempts >= 1
    )
    if failed:
        # R2 — fetch failure after retries
        out["discovered_urls"] = []
        out["error"] = "fetch_error"
        return out

    ctype = row["content_type"]
    out["content_type"] = ctype
    if ctype.lower().startswith("text/html"):
        body = bytes(row["body"]).decode("utf-8", errors="replace")
        fetched_urls: list[str] = []
        if is_dynamic_content(body):
            if _isnull(row.get("dynamic_body")):
                out["discovered_urls"] = []  # selenium failed → R2
                out["error"] = "fetch_error"
                out["fetch_failed_first"] = True
                out["content_type"] = None
                return out
            body = bytes(row["dynamic_body"]).decode("utf-8", errors="replace")
            dl = row.get("dynamic_links")
            fetched_urls = [] if _isnull(dl) else list(dl)
        out["metadata"] = extract_meta(body, ctype, norm)
        out["text"] = extract_text(body)
        discovered = fetched_urls if fetched_urls else extract_links(body, norm, ctype)
    elif ctype.lower() == "application/pdf" or is_pdf_path(norm):
        out["metadata"] = {"url": norm, "content_type": ctype}
        out["text"] = pdf_stub_text(bytes(row["body"]))
        discovered = set()
    else:
        out["metadata"] = {"url": norm, "content_type": ctype}
        out["text"] = f"Scraper {SCRAPER_ID}: Unsupported content type: {ctype}"
        discovered = set()

    out["discovered_urls"] = sorted(discovered) if discovery else []
    return out


def make_fetch_extract(discovery: bool):
    """mapInPandas function over the (due frontier ⋈ web) join."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [process_row(r, discovery) for r in pdf.to_dict("records")]
            yield pd.DataFrame(
                rows,
                columns=[
                    "seq", "round", "url_norm", "host", "host_shard",
                    "content_type", "text", "metadata", "discovered_urls",
                    "error", "image_id", "attempts", "fetch_failed_first",
                ],
            )

    return fn


# ---------------------------------------------------------------------------
# Live mode (real HTTP) — same schema, batched; NOT exercisable offline.
# ---------------------------------------------------------------------------

def make_live_fetch(discovery: bool, timeout: float = 10.0):
    """Arrow-batched real fetcher: each executor task GETs its batch of
    URLs (requests, REQUEST_TIMEOUT=10 per config.py:25) and runs the
    same extraction. Raises if the requests library is unavailable."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import requests  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "live fetch requires the 'requests' library; offline runs "
                "use the web-fixture join instead"
            ) from e
        raise NotImplementedError(
            "live HTTP fetch is stubbed in the sandbox (no network); "
            "the offline fixture join exercises identical semantics"
        )

    return fn
