"""robots.txt rules.

The reference ships a backport of CPython's ``urllib.robotparser``
extended with ``crawl_delay`` / ``request_rate`` / ``site_maps``
(``/root/reference/darc/_robotparser.py:28-279``) and gates fetches via
``can_fetch`` with a root-path bypass (``darc/parse.py:158-183``).
Python ≥3.8's stdlib parser has all three accessors, so we wrap the
stdlib instead of re-backporting; semantics are identical.

``RobotsRules`` is the parsed, picklable-enough unit the host-state
actors cache per host (parse once, not per check — reference re-parses
per call, ``darc/parse.py:175-182``).
"""

from __future__ import annotations

from urllib.parse import urlsplit
from urllib.robotparser import RobotFileParser

USER_AGENT = "darc-ray/0.1"


class RobotsRules:
    """Parsed robots.txt for one host."""

    def __init__(self, text: str | None) -> None:
        self.text = text
        self._rp: RobotFileParser | None = None
        if text:
            rp = RobotFileParser()
            rp.parse(text.splitlines())
            self._rp = rp

    def can_fetch(self, url: str, user_agent: str = USER_AGENT) -> bool:
        """``check_robots`` semantics (parse.py:158-183): root path is
        always allowed; no/empty robots allows everything."""
        try:
            path = urlsplit(url).path
        except ValueError:
            path = ""
        if path in ("", "/"):
            return True
        if self._rp is None:
            return True
        return self._rp.can_fetch(user_agent, url)

    def crawl_delay(self, user_agent: str = USER_AGENT) -> float | None:
        if self._rp is None:
            return None
        delay = self._rp.crawl_delay(user_agent)
        return float(delay) if delay is not None else None

    def request_rate(self, user_agent: str = USER_AGENT) -> tuple[int, int] | None:
        if self._rp is None:
            return None
        rr = self._rp.request_rate(user_agent)
        return (rr.requests, rr.seconds) if rr is not None else None

    def site_maps(self) -> list[str] | None:
        if self._rp is None:
            return None
        sm = self._rp.site_maps()
        return list(sm) if sm else None

    def effective_delay(self, user_agent: str = USER_AGENT) -> float:
        """Politeness interval in seconds: max of crawl-delay and the
        request-rate-implied spacing; 0 when unspecified."""
        delay = self.crawl_delay(user_agent) or 0.0
        rr = self.request_rate(user_agent)
        if rr is not None and rr[0] > 0:
            delay = max(delay, rr[1] / rr[0])
        return delay
