"""robots.txt cache + filter (north_rule addition — the reference has
no robots code, only a README compliance disclaimer, README.md:109).

Rules are parsed once per host with stdlib ``urllib.robotparser``,
broadcast to executors, and applied as an Arrow-batched pandas UDF —
a tiny dimension broadcast against the big frontier, never a shuffle.
Hosts whose robots.txt is missing/404 are treated allow-all.

Golden-parity note: robots enforcement is an engine *option*
(``CrawlConfig.respect_robots``), OFF for golden replay runs because
the reference never filters by robots; the oracle accepts the same
flag so robots-enabled runs are verified against the same semantics.
"""

from __future__ import annotations

import io
from urllib.parse import urlparse
from urllib.robotparser import RobotFileParser

import pandas as pd

USER_AGENT = "wormpy-spark"


class RobotsCache:
    """host → parsed rules; picklable enough to broadcast (we store the
    raw bodies and parse lazily per executor)."""

    def __init__(self, bodies: dict[str, str | None]):
        self.bodies = bodies
        self._parsers: dict[str, RobotFileParser | None] = {}

    @classmethod
    def from_fixture(cls, robots_df: pd.DataFrame) -> "RobotsCache":
        bodies: dict[str, str | None] = {}
        for _, r in robots_df.iterrows():
            ok = int(r.get("status", 200) or 200) == 200 and r["body"] is not None
            bodies[r["host"]] = r["body"] if ok else None
        return cls(bodies)

    def __getstate__(self):
        return self.bodies

    def __setstate__(self, bodies):
        self.bodies = bodies
        self._parsers = {}

    def _parser(self, host: str) -> RobotFileParser | None:
        if host not in self._parsers:
            body = self.bodies.get(host)
            if body is None:
                self._parsers[host] = None  # missing/404 ⇒ allow-all
            else:
                p = RobotFileParser()
                p.parse(io.StringIO(body).read().splitlines())
                self._parsers[host] = p
        return self._parsers[host]

    def allows(self, url: str) -> bool:
        host = urlparse(url).netloc
        p = self._parser(host)
        return True if p is None else p.can_fetch(USER_AGENT, url)

    def crawl_delay(self, host: str) -> float | None:
        p = self._parser(host)
        if p is None:
            return None
        d = p.crawl_delay(USER_AGENT)
        return float(d) if d is not None else None


def robots_allows_udf(cache_broadcast):
    """pandas UDF factory: urls series → boolean series, evaluated
    against the broadcast rule cache on executors."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    @pandas_udf(BooleanType())
    def allows(urls: pd.Series) -> pd.Series:
        cache: RobotsCache = cache_broadcast.value
        return urls.map(cache.allows)

    return allows
