"""Driver fast path for tiny crawl rounds (T4 head/tail optimization).

A BSP crawl's first rounds are tiny (the seed round fetches 1 URL, the
second a few hundred) yet each pays the same fixed per-round cost as an
80k-URL round: ~4 blocking Spark actions of job-scheduling / Python-
worker / parquet-commit latency (~6s/round measured — the dominant
serial term in the N→4N scaling analysis, BENCH/BASELINE.md). When the
whole frontier fits in the driver's hand (≤ CrawlConfig.fast_round_max
rows), this module executes the ENTIRE round driver-side — one Spark
job remains (the broadcast-semi web lookup + the same Arrow extraction
kernel the Spark path runs, returning only the small extracted rows),
everything else is plain Python over a few hundred rows.

Parity obligations (tested: tests/test_golden.py runs entirely through
this path with default config, and test_properties.py asserts
fast-vs-Spark equality including a mid-crawl transition):
- identical filter-chain semantics (scope → seen anti-join → in-round
  first-occurrence dedup → probe skip → robots → per-host deferral →
  global seq → budget cut) — same pure predicates the Spark path's
  column expressions mirror;
- identical pages rows: the very same ``make_fetch_extract`` Arrow
  kernel produces them;
- bit-identical ``host_shard``: pure-Python XXH64 (functions.xxhash)
  matches Spark's ``xxhash64``, so snapshots written here stay
  compatible with the sharded bloom sidecar built later;
- snapshot-compatible parquet: pyarrow writes the exact PAGES_SCHEMA /
  FRONTIER_SCHEMA arrow types, so Spark unions fast-round and
  Spark-round snapshot files transparently (resume, seen derivation,
  final assembly are unchanged).

At 10^10-URL scale this is the standard driver-side tail/head
optimization: rounds 0-1 of ANY crawl are tiny regardless of corpus
size, and a 1000-executor cluster pays scheduler latency per job just
like local mode does.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

import pandas as pd

from ..functions.urlnorm import get_domain, is_suspicious_url, normalize_url
from ..functions.xxhash import pmod, xxhash64_str
from ..operators.fetch import (
    PAGES_SCHEMA,
    PAGES_SCHEMA_EXPAND,
    make_fetch_extract,
)

PAGES_ARROW_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),
        ("round", pa.int32()),
        ("url_norm", pa.string()),
        ("host", pa.string()),
        ("host_shard", pa.int32()),
        ("content_type", pa.string()),
        ("text", pa.string()),
        ("metadata", pa.map_(pa.string(), pa.string())),
        ("discovered_urls", pa.list_(pa.string())),
        ("error", pa.string()),
        ("image_id", pa.string()),
        ("attempts", pa.int32()),
        ("fetch_failed_first", pa.bool_()),
    ]
)

FRONTIER_ARROW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("round_enqueued", pa.int32()),
        ("parent_seq", pa.int64()),
        ("sibling_rank", pa.int32()),
        ("url_norm", pa.string()),
        # FRONTIER_SCHEMA_V2 admission-derived columns (see
        # operators/frontier.py) — python-side xxhash64_str is
        # parity-tested against F.xxhash64
        ("host", pa.string()),
        ("url_hash", pa.int64()),
        ("host_shard", pa.int32()),
    ]
)


def write_pages_parquet(path: str, rows: list[dict]) -> None:
    os.makedirs(path, exist_ok=True)
    cols: dict = {name: [] for name in PAGES_ARROW_SCHEMA.names}
    for p in rows:
        for name in cols:
            v = p[name]
            if name == "metadata" and isinstance(v, dict):
                v = list(v.items())
            cols[name].append(v)
    table = pa.Table.from_pydict(cols, schema=PAGES_ARROW_SCHEMA)
    pq.write_table(table, os.path.join(path, "part-00000.parquet"))


def write_frontier_parquet(
    path: str, rows: list[tuple], n_host_shards: int = 64,
    seq_buckets: list[int] | None = None,
) -> None:
    """rows: (url, round_enqueued, parent_seq, sibling_rank, url_norm);
    the v2 derived columns (host, url_hash, host_shard) are computed
    here so the Spark loop never re-derives them. ``seq_buckets``
    (parallel to rows) adds the fused-seq bucket column the Spark
    loop's fused path consumes (see plans/crawl.py)."""
    os.makedirs(path, exist_ok=True)
    hosts = [get_domain(r[4]) for r in rows]
    cols: dict[str, list] = {
        name: [r[i] for r in rows] for i, name in enumerate(
            ("url", "round_enqueued", "parent_seq", "sibling_rank", "url_norm")
        )
    }
    cols["host"] = hosts
    cols["url_hash"] = [xxhash64_str(r[4]) for r in rows]
    cols["host_shard"] = [pmod(xxhash64_str(h), n_host_shards) for h in hosts]
    schema = FRONTIER_ARROW_SCHEMA
    if seq_buckets is not None:
        cols["seq_bucket"] = seq_buckets
        schema = schema.append(pa.field("seq_bucket", pa.int32()))
    table = pa.Table.from_pydict(cols, schema=schema)
    pq.write_table(table, os.path.join(path, "part-00000.parquet"))


@dataclass
class FastRound:
    pages: list[dict]
    frontier_next: list[tuple]  # FRONTIER_SCHEMA column order
    n_eligible: int
    due_count: int
    n_errors: int
    seq_s: float = 0.0
    fetch_s: float = 0.0
    expand_s: float = 0.0


def run_fast_round(
    r: int,
    frontier_rows: list[tuple],
    seen_set: set[str],
    processed: int,
    budget: int,
    base: str,
    config,
    web_fetch,
    probe_skip: frozenset,
    robots_cache,
    probe_skip_bc=None,
) -> FastRound:
    """One crawl round over a driver-resident frontier.

    ``frontier_rows``: (url, round_enqueued, parent_seq, sibling_rank,
    url_norm) tuples. Mutates ``seen_set`` with this round's processed
    keys (J3), exactly as the Spark path's seen derivation would.
    """
    t0 = time.time()
    # P4 scope + J1 seen anti-join, then J2 first-occurrence-by-priority
    work = sorted(
        (renq, pseq, srank, url, un)
        for (url, renq, pseq, srank, un) in frontier_rows
        if un.startswith(base) and un not in seen_set
    )
    in_round: set[str] = set()
    eligible: list[tuple] = []
    for row in work:
        un = row[4]
        if un in in_round:
            continue
        in_round.add(un)
        # P5/P6: suspicious URLs consult the probe; image/* skipped
        if is_suspicious_url(un) and un in probe_skip:
            continue
        if robots_cache is not None and not robots_cache.allows(un):
            continue
        eligible.append(row)

    deferred: list[tuple] = []
    if config.max_per_host_per_round is not None:
        counts: dict[str, int] = {}
        kept = []
        for row in eligible:  # priority order ⇒ rank within host
            host = get_domain(row[4])
            c = counts.get(host, 0) + 1
            counts[host] = c
            (kept if c <= config.max_per_host_per_round else deferred).append(row)
        eligible = kept

    n_eligible = len(eligible)
    t_seq = time.time()
    if n_eligible == 0:
        return FastRound([], [], 0, 0, 0, seq_s=round(t_seq - t0, 2))

    due = eligible[: max(budget - processed, 0)]
    due_count = len(due)

    # S4/J7 + F1-F3: the ONE Spark job — broadcast-semi key lookup into
    # the web table, the SAME Arrow extraction kernel the Spark path
    # runs (HTML parsing distributes across cores; doing it driver-side
    # measured ~10ms/page serial), and only the SMALL extracted rows
    # (text/meta/links — never bodies) come back to the driver.
    spark = web_fetch.sparkSession
    due_pdf = pd.DataFrame(
        {
            "url_norm": [row[4] for row in due],
            "seq": range(processed, processed + due_count),
            "round": r,
            "host": [get_domain(row[4]) for row in due],
        }
    )
    due_pdf["host_shard"] = [
        pmod(xxhash64_str(h), config.n_host_shards) for h in due_pdf["host"]
    ]
    due_df = spark.createDataFrame(
        due_pdf, "url_norm string, seq long, round int, host string, host_shard int"
    )
    # literal IN filter instead of a broadcast semi-join: the due keys
    # are already driver-resident (≤ fast_round_max) and a literal
    # predicate is eligible for the cache's batch-statistics pruning —
    # with the prep-sorted cache (prepare_fetch_table) the scan skips
    # every 1024-row batch whose url_norm range contains no key,
    # instead of decoding the whole cached web table to keep ~300 rows.
    web_small = web_fetch.filter(
        F.col("url_norm").isin(due_pdf["url_norm"].tolist())
    )
    joined = due_df.join(F.broadcast(web_small), on="url_norm", how="left")
    # scope_base + probe_skip_bc: the kernel pre-canonicalizes, scope-
    # filters and probe-skips each page's expansion set IN the parallel
    # workers (``discovered_norm``), so the driver expansion below
    # iterates ready-made lists instead of running ~links-many
    # normalize_url calls single-threaded (measured 2-3 s of driver-
    # only wall in round 1 at every parallelism level).
    if config.discovery and probe_skip_bc is not None:
        kernel = make_fetch_extract(
            config.discovery, scope_base=base, probe_skip_bc=probe_skip_bc
        )
        out_schema = PAGES_SCHEMA_EXPAND
    else:
        kernel = make_fetch_extract(config.discovery)
        out_schema = PAGES_SCHEMA
    page_rows = joined.mapInArrow(kernel, out_schema).collect()
    pages = sorted(
        (row.asDict(recursive=True) for row in page_rows),
        key=lambda p: p["seq"],
    )
    n_errors = sum(1 for p in pages if p["error"] is not None)
    t_fetch = time.time()

    # J3: mark processed (error rows included) BEFORE expansion admission
    for p in pages:
        seen_set.add(p["url_norm"])

    # J4/O4 expansion → J2 global first-occurrence → J1 admission.
    # The probe-skip (P5/P6) and robots filters apply at ADMISSION,
    # mirroring the Spark kernel's discovered_norm filter: a dropped
    # URL would be filtered before seq assignment at pop time anyway,
    # so pages/order/seen are identical — and the pop-time checks
    # above stay as identities for rows admitted here.
    frontier_next: list[tuple] = list(deferred)
    if config.discovery:
        best: dict[str, tuple] = {}
        for p in pages:
            if p["error"] is not None or not p["discovered_urls"]:
                continue
            if "discovered_norm" in p:
                # kernel-computed per-parent set: already normalized,
                # scope-filtered, probe-skipped, distinct and sorted —
                # byte-identical to the fallback below by construction
                # (same normalize_url, same filters, same sort)
                per_parent = p["discovered_norm"]
            else:
                per_parent = sorted(
                    {
                        nn
                        for nn in (normalize_url(l) for l in p["discovered_urls"])
                        if nn.startswith(base) and nn not in probe_skip
                    }
                )
            for pos, nn in enumerate(per_parent):
                cand = (r + 1, p["seq"], pos + 1, nn, nn)
                prev = best.get(nn)
                if prev is None or cand[:3] < prev[:3]:
                    best[nn] = cand
        admitted = sorted(
            c
            for un, c in best.items()
            if un not in seen_set
            and (robots_cache is None or robots_cache.allows(un))
        )
        frontier_next += admitted
    # back to FRONTIER_SCHEMA column order
    frontier_next = [
        (url, renq, pseq, srank, un)
        for (renq, pseq, srank, url, un) in frontier_next
    ]
    t_expand = time.time()

    return FastRound(
        pages=pages,
        frontier_next=frontier_next,
        n_eligible=n_eligible,
        due_count=due_count,
        n_errors=n_errors,
        seq_s=round(t_seq - t0, 2),
        fetch_s=round(t_fetch - t_seq, 2),
        expand_s=round(t_expand - t_fetch, 2),
    )
