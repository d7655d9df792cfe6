"""Real-socket live fetch: the requests-based transport
(operators/fetch.py requests_transport) exercised against a local
threaded ``http.server`` on an ephemeral port — success, 404,
retry-after-500, slow-response timeout, and the politeness sleep
schedule, with zero external network. This covers the one branch the
mock-transport matrix (tests/test_live_fetch.py) cannot: the actual
``requests.Session().get`` call path (VERDICT r4 "What's missing" #2).
"""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

pytest.importorskip("requests")

from wormpy_spark.operators.fetch import (  # noqa: E402
    LIVE_MAX_ATTEMPTS,
    TransportError,
    fetch_live_row,
    requests_transport,
)

HTML = (
    b"<html><head><title>Sock</title>"
    b'<meta name="description" content="d"></head><body><p>'
    + b"word " * 200
    + b'</p><a href="/next">n</a></body></html>'
)


class _Handler(BaseHTTPRequestHandler):
    server_version = "TestSrv/1.0"
    flaky_state: dict[str, int] = {}

    def log_message(self, *a):  # keep pytest output clean
        pass

    def do_GET(self):
        if self.path == "/ok":
            body = HTML
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/missing":
            self.send_error(404)
        elif self.path == "/flaky":
            # first hit 500, second hit 200 — the retry path
            n = self.flaky_state.get("flaky", 0)
            self.flaky_state["flaky"] = n + 1
            if n == 0:
                self.send_error(500)
            else:
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(HTML)))
                self.end_headers()
                self.wfile.write(HTML)
        elif self.path == "/slow":
            time.sleep(2.0)  # beyond the test's 0.5s timeout
            self.send_response(200)
            self.send_header("Content-Length", "2")
            self.end_headers()
            self.wfile.write(b"ok")
        else:
            self.send_error(404)


class _QuietServer(ThreadingHTTPServer):
    def handle_error(self, request, client_address):
        pass  # client-side timeout disconnects (the /slow test) are expected


@pytest.fixture(scope="module")
def server():
    _Handler.flaky_state = {}
    srv = _QuietServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _row(url):
    return {
        "seq": 0, "round": 0, "url_norm": url,
        "host": url.split("//")[1].split("/")[0], "host_shard": 0,
    }


def test_socket_success_extracts(server):
    get = requests_transport()
    out = fetch_live_row(_row(f"{server}/ok"), True, get, lambda s: None)
    assert out["error"] is None
    assert out["content_type"] == "text/html"
    assert out["metadata"]["title"] == "Sock"
    assert out["attempts"] == 1 and out["fetch_failed_first"] is False
    assert any(u.endswith("/next") for u in out["discovered_urls"])


def test_socket_404_is_fetch_error(server):
    get = requests_transport()
    out = fetch_live_row(_row(f"{server}/missing"), True, get, lambda s: None)
    assert out["error"] == "fetch_error"
    assert out["discovered_urls"] == []
    assert out["attempts"] == LIVE_MAX_ATTEMPTS


def test_socket_retry_after_500(server):
    get = requests_transport()
    sleeps: list[float] = []
    out = fetch_live_row(_row(f"{server}/flaky"), True, get, sleeps.append)
    assert out["error"] is None
    assert out["attempts"] == 2
    assert out["fetch_failed_first"] is True
    assert sleeps == [1.0]  # one backoff between the two attempts


def test_socket_timeout_is_transport_error(server):
    get = requests_transport(timeout=0.5)
    with pytest.raises(TransportError):
        get(f"{server}/slow")
    # and through the row path: both attempts time out -> fetch_error
    out = fetch_live_row(_row(f"{server}/slow"), True, get, lambda s: None)
    assert out["error"] == "fetch_error"
    assert out["attempts"] == LIVE_MAX_ATTEMPTS


def test_socket_connection_refused_is_transport_error():
    # an (almost certainly) unbound port — connection-level failure
    get = requests_transport(timeout=1.0)
    with pytest.raises(TransportError):
        get("http://127.0.0.1:9/never")


def test_socket_politeness_schedule(server):
    """make_live_fetch politeness: seeded per-host sleeps precede each
    real request, matching operators.politeness.politeness_delay."""
    import pandas as pd

    from wormpy_spark.operators.fetch import make_live_fetch
    from wormpy_spark.operators.politeness import politeness_delay

    sleeps: list[float] = []
    fn = make_live_fetch(
        True,
        transport_factory=requests_transport,
        sleep=sleeps.append,
        politeness_seed=7,
    )
    host = server.split("//")[1]
    batch = pd.DataFrame([_row(f"{server}/ok"), _row(f"{server}/ok")])
    out = pd.concat(list(fn(iter([batch]))), ignore_index=True)
    assert list(out["error"]) == [None, None]
    assert sleeps[:2] == [
        politeness_delay(7, host, 0),
        politeness_delay(7, host, 1),
    ]
