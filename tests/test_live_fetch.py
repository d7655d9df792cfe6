"""Live-mode fetcher (injectable transport): success / retry / failure
paths must produce rows identical to the offline fixture-join model
(same PAGES_SCHEMA, same extraction), per reference
content_processor.py:62-133 (timeout=10, 2 total attempts, backoff).
"""

from __future__ import annotations

import pandas as pd
import pytest

from wormpy_spark.fixtures.webgen import generate_corpus
from wormpy_spark.operators.fetch import (
    LIVE_MAX_ATTEMPTS,
    PAGES_SCHEMA,
    TransportError,
    fetch_live_row,
    make_live_fetch,
    process_row,
)


class MockTransport:
    """url → list of scripted outcomes; each get() pops the next one.
    An outcome is (status, ctype, body) or TransportError."""

    def __init__(self, script: dict):
        self.script = {k: list(v) for k, v in script.items()}
        self.calls: list[str] = []

    def __call__(self, url):
        self.calls.append(url)
        outcome = self.script[url].pop(0)
        if isinstance(outcome, Exception):
            raise outcome
        return outcome


def _frontier_row(url, seq=0):
    host = url.split("//")[1].split("/")[0]
    return {
        "seq": seq, "round": 0, "url_norm": url, "host": host, "host_shard": 0,
    }


HTML = (
    b"<html><head><title>T</title></head><body><p>"
    + b"word " * 200
    + b'</p><a href="/next">n</a></body></html>'
)


def test_live_success_equals_offline_join():
    url = "https://h.test/p/1"
    get = MockTransport({url: [(200, "text/html", HTML)]})
    sleeps: list[float] = []
    live = fetch_live_row(_frontier_row(url), True, get, sleeps.append)

    offline = process_row(
        {
            **_frontier_row(url),
            "status": 200, "content_type": "text/html", "body": HTML,
            "fail_attempts": 0, "selenium_fail_attempts": 0,
            "raise_in_loop": False, "dynamic_body": None,
            "dynamic_links": None, "image_id": None,
        },
        True,
    )
    assert live == offline
    assert live["discovered_urls"] == ["https://h.test/next"]
    assert sleeps == []


def test_live_retry_then_success():
    url = "https://h.test/flaky"
    get = MockTransport({url: [TransportError("reset"), (200, "text/html", HTML)]})
    sleeps: list[float] = []
    row = fetch_live_row(_frontier_row(url), True, get, sleeps.append)
    assert row["error"] is None
    assert row["attempts"] == 2
    assert row["fetch_failed_first"] is True
    assert len(sleeps) == 1  # backoff between the two attempts
    assert row["text"]  # extraction ran on the retried body


def test_live_persistent_failure():
    url = "https://h.test/gone"
    get = MockTransport({url: [(500, "text/html", b""), (500, "text/html", b"")]})
    row = fetch_live_row(_frontier_row(url), True, get, lambda s: None)
    assert row["error"] == "fetch_error"
    assert row["discovered_urls"] == []
    assert row["metadata"] is None and row["content_type"] is None
    assert row["attempts"] == LIVE_MAX_ATTEMPTS
    assert len(get.calls) == LIVE_MAX_ATTEMPTS


def test_live_dynamic_shell_flagged_not_failed():
    """S7 in live mode: a <500-char JS-shell page would go to a real
    browser in the reference; without one, the row must carry its
    static text + static DOM links AND a dynamic_suspected flag —
    never a silent under-extraction, never a fetch_error."""
    url = "https://h.test/app"
    shell = (
        b"<html><head><title>App</title><script src=\"/a.js\"></script>"
        b"</head><body><div id=root>loading</div>"
        b'<a href="/static-nav">nav</a></body></html>'
    )
    get = MockTransport({url: [(200, "text/html", shell)]})
    row = fetch_live_row(_frontier_row(url), True, get, lambda s: None)
    assert row["error"] is None
    assert row["metadata"]["dynamic_suspected"] == "true"
    assert row["metadata"]["title"] == "App"
    assert row["text"] == "App\nloading\nnav"
    assert row["discovered_urls"] == ["https://h.test/static-nav"]
    # offline rows never carry the flag (they have the selenium model)
    offline = process_row(
        {
            **_frontier_row("https://h.test/p/1"),
            "status": 200, "content_type": "text/html", "body": HTML,
            "fail_attempts": 0, "selenium_fail_attempts": 0,
            "raise_in_loop": False, "dynamic_body": None,
            "dynamic_links": None, "image_id": None,
        },
        True,
    )
    assert "dynamic_suspected" not in offline["metadata"]


def test_live_connection_error_then_http_error():
    url = "https://h.test/half"
    get = MockTransport({url: [TransportError("dns"), (404, None, b"")]})
    row = fetch_live_row(_frontier_row(url), True, get, lambda s: None)
    assert row["error"] == "fetch_error"
    assert row["fetch_failed_first"] is True


def test_live_mapinpandas_golden_vs_fixture_join(spark):
    """Spark-level: live-fetch the fixture corpus's static pages through
    a transport backed by the web table — rows must equal the offline
    join path exactly."""
    corpus = generate_corpus(seed=31, n_hosts=1, pages_per_host=6)
    web = corpus["web"]
    static = web[
        (web["content_type"] == "text/html")
        & (~web["is_dynamic"])
        & (web["fail_attempts"] == 0)
        & (~web["raise_in_loop"])
        & (web["status"] == 200)
    ].head(4)

    responses = {
        r["url_norm"]: (int(r["status"]), r["content_type"], bytes(r["body"]))
        for _, r in static.iterrows()
    }

    def factory():
        # nested closure (cloudpickle serializes it by value, so the
        # executor needs no test module import)
        def get(url):
            return responses[url]

        return get

    due = spark.createDataFrame(
        pd.DataFrame(
            [_frontier_row(u, seq=i) for i, u in enumerate(sorted(responses))]
        )
    )
    live = (
        due.mapInPandas(make_live_fetch(True, factory, lambda s: None), PAGES_SCHEMA)
        .collect()
    )
    assert len(live) == len(responses)
    for r in live:
        w = web[web["url_norm"] == r["url_norm"]].iloc[0]
        offline = process_row(
            {
                **_frontier_row(r["url_norm"], seq=r["seq"]),
                "status": int(w["status"]), "content_type": w["content_type"],
                "body": bytes(w["body"]), "fail_attempts": 0,
                "selenium_fail_attempts": 0, "raise_in_loop": False,
                "dynamic_body": None, "dynamic_links": None, "image_id": None,
            },
            True,
        )
        got = r.asDict(recursive=True)
        assert got["text"] == offline["text"]
        assert got["discovered_urls"] == offline["discovered_urls"]
        assert got["metadata"] == offline["metadata"]
        assert got["error"] is None


def test_requests_transport_unavailable_is_lazy():
    """Building the live fn must not import requests; only task
    execution does (so offline clusters can still import the module)."""
    fn = make_live_fetch(True)
    assert callable(fn)


def test_live_politeness_sleeps_follow_seeded_schedule():
    """T1 in live mode: with politeness_seed set, each request is
    preceded by the seeded per-host U(1,5) draw at that host's
    task-local attempt index — interleaved hosts keep independent
    streams, and retry backoff sleeps still appear in between."""
    from wormpy_spark.operators.politeness import politeness_delay

    urls = [
        "https://a.test/1", "https://b.test/1",
        "https://a.test/2", "https://a.test/3", "https://b.test/2",
    ]
    script = {u: [(200, "text/html", HTML)] for u in urls}
    script["https://a.test/2"] = [TransportError("reset"), (200, "text/html", HTML)]
    get = MockTransport(script)

    sleeps: list[float] = []
    fn = make_live_fetch(
        True, lambda: get, sleeps.append, politeness_seed=99
    )
    pdf = pd.DataFrame([_frontier_row(u, seq=i) for i, u in enumerate(urls)])
    out = pd.concat(list(fn(iter([pdf]))))
    assert len(out) == len(urls)
    assert out["error"].isna().all()

    want = [
        politeness_delay(99, "a.test", 0),
        politeness_delay(99, "b.test", 0),
        politeness_delay(99, "a.test", 1),
        1.0,  # backoff before a.test/2's retry (BACKOFF_BASE_S * 1)
        politeness_delay(99, "a.test", 2),
        politeness_delay(99, "b.test", 1),
    ]
    assert sleeps == want


def test_live_without_politeness_seed_never_sleeps_between_requests():
    urls = ["https://a.test/1", "https://a.test/2"]
    get = MockTransport({u: [(200, "text/html", HTML)] for u in urls})
    sleeps: list[float] = []
    fn = make_live_fetch(True, lambda: get, sleeps.append)
    pdf = pd.DataFrame([_frontier_row(u, seq=i) for i, u in enumerate(urls)])
    list(fn(iter([pdf])))
    assert sleeps == []
