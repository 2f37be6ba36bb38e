"""User-extension surface: site / proxy / round-hook registries.

Mirrors the reference's three extension points (SURVEY §2.10):

* **site hooks** — subclass :class:`BaseSite` with ``crawler`` /
  ``loader`` staticmethods and register per-hostname via
  :func:`register_sites` (ref ``darc/sites/__init__.py:46-144``,
  ``darc/sites/_abc.py:31-65``).  Raise :class:`LinkNoReturn` with
  ``drop=True`` to drop the link from the frontier, ``drop=False``
  to leave it leased (retried after the TTL) — ref
  ``darc/error.py:40-56``, ``darc/crawl.py:172-190``.
* **proxy hooks** — :func:`register_proxy` maps a proxy type to a
  (session-factory, driver-factory) pair resolved once per fetch
  worker (ref ``darc/proxy/__init__.py:29-50``).  Here a "session" is
  a callable ``url -> (status, mime, body, history)`` built around the
  engine's fetch fabric; in a live deployment the factory ignores the
  fabric and wraps a proxied ``requests.Session`` (and bootstraps its
  proxy daemon, St5) instead.
* **round hooks** — :func:`register_hooks` adds
  ``fn(worker_type, link_pool)`` callbacks run after every round;
  raise :class:`WorkerBreak` to stop after the current round (ref
  ``darc/process.py:45-111``).

Ray note: registries are module-level for API parity, but the engine
**snapshots** them at construction and ships the snapshot into its
fetch/render stages (cloudpickle serializes user classes), so hooks
registered on the driver reach every worker process — unlike the
reference, nothing relies on fork-time module state.
"""

from __future__ import annotations

from typing import Any, Callable


class LinkNoReturn(Exception):
    """The link has no return response from a hook; ``drop`` controls
    whether it leaves the task queue (ref darc/error.py:40-56)."""

    def __init__(self, link: Any = None, *, drop: bool = True) -> None:
        self.link = link
        self.drop = drop
        super().__init__()


class WorkerBreak(Exception):
    """Break from the round loop after the current round
    (ref darc/error.py:64-65)."""


class HookExecutionFailed(Warning):
    """A round hook raised; execution continues (ref darc/error.py)."""


class BaseSite:
    """Abstract base for site customisations (ref darc/sites/_abc.py:31-65).

    ``session`` / ``driver`` are the per-proxy callables resolved from
    the proxy registry: ``session(url) -> (status, mime, body bytes,
    history)``; ``driver(url)`` the same for the render stage.  ``row``
    is the frontier row dict (url, url_hash, host, proxy, scheme,
    backref, depth).
    """

    hostname: list[str] | None = None

    @staticmethod
    def crawler(timestamp: float, session: Callable, row: dict) -> tuple:
        raise LinkNoReturn(row)

    @staticmethod
    def loader(timestamp: float, driver: Callable, row: dict) -> str:
        raise LinkNoReturn(row)


class DefaultSite(BaseSite):
    """Default hooks: plain GET (ref darc/sites/default.py:28-83)."""

    @staticmethod
    def crawler(timestamp: float, session: Callable, row: dict) -> tuple:
        return session(row["url"])

    @staticmethod
    def loader(timestamp: float, driver: Callable, row: dict) -> str:
        status, _mime, body, _hist = driver(row["url"])
        if status == 0:
            raise ConnectionError(row["url"])     # WebDriverException analog
        return body.decode("utf-8", "replace")


SITE_REGISTRY: dict[str, type[BaseSite]] = {}
PROXY_REGISTRY: dict[str, tuple[Callable | None, Callable | None]] = {}
HOOK_REGISTRY: list[Callable[[str, list[dict]], None]] = []
SIGNAL_REGISTRY: dict[int, Callable] = {}

# graceful-stop flag (ref darc/process.py:114-115: the round loop
# checks the signal-set stop condition between rounds); set by the
# default register_signal handler or request_stop(), checked by
# CrawlEngine.run after every round — a stopped run resumes exactly
# from its checkpoints (CrawlEngine.resume)
import threading as _threading

STOP_EVENT = _threading.Event()


def request_stop() -> None:
    """Ask every engine round loop in this process to stop after the
    current round (the ``ray job stop`` graceful analog)."""
    STOP_EVENT.set()


def stop_requested() -> bool:
    return STOP_EVENT.is_set()


def clear_stop() -> None:
    STOP_EVENT.clear()


def register_sites(site: type[BaseSite], *hostnames: str) -> None:
    """Register a site customisation for its hostnames (case-insensitive);
    mirrors ref ``darc.sites.register`` (sites/__init__.py:108-121)."""
    names = list(hostnames) or list(site.hostname or [])
    if site.hostname is None:
        site.hostname = names
    for h in names:
        SITE_REGISTRY[h.casefold()] = site


def register_proxy(proxy: str, session_factory: Callable | None = None,
                   driver_factory: Callable | None = None) -> None:
    """Register per-proxy session/driver factories; mirrors ref
    ``darc.proxy.register`` (proxy/__init__.py:38-50).  A factory takes
    the engine's base fetch fabric and returns the session callable:
    ``factory(fetch_fn) -> (url -> (status, mime, body, history))``."""
    PROXY_REGISTRY[proxy] = (session_factory, driver_factory)


def register_hooks(hook: Callable[[str, list[dict]], None], *,
                   _index: int | None = None) -> None:
    """Register a between-rounds hook ``fn(worker_type, link_pool)``;
    mirrors ref ``darc.process.register`` (process.py:45-75)."""
    if _index is None:
        HOOK_REGISTRY.append(hook)
    else:
        HOOK_REGISTRY.insert(_index, hook)


def register_signal(signum: int, handler: Callable | None = None) -> Callable:
    """Register a signal handler on the DRIVER process; mirrors ref
    ``darc.signal.register`` (signal.py:35-63).  The reference installs
    handlers at worker-process start; here all control flow lives on
    the Ray driver (workers are stateless tasks/actors), so the handler
    installs immediately.  ``handler=None`` installs the graceful-stop
    handler: the signal sets :data:`STOP_EVENT`, and every running
    ``CrawlEngine.run`` loop exits after its current round with
    checkpoints intact (ref darc/process.py:114-115 stop handling;
    the ``ray job stop`` analog for driver-owned runs)."""
    import signal as _signal

    if handler is None:
        def handler(_signum, _frame):            # noqa: ANN001
            request_stop()
    SIGNAL_REGISTRY[signum] = handler
    _signal.signal(signum, handler)
    return handler


def clear_registries() -> None:
    """Reset all registries (test hygiene)."""
    import signal as _signal

    SITE_REGISTRY.clear()
    PROXY_REGISTRY.clear()
    HOOK_REGISTRY.clear()
    for signum in list(SIGNAL_REGISTRY):
        try:
            _signal.signal(signum, _signal.SIG_DFL)
        except (ValueError, OSError):
            pass                                  # non-main thread / exotic signum
    SIGNAL_REGISTRY.clear()
    clear_stop()


def site_for(host: str | None, site_map: dict[str, type[BaseSite]]
             ) -> type[BaseSite] | None:
    """Hostname lookup (ref sites/__init__.py:124-144); None means "no
    customisation" so the fast default path can skip row-dict building."""
    if not site_map:
        return None
    return site_map.get((host or "<null>").casefold())


def run_hooks(hooks: list[Callable], worker_type: str,
              link_pool: list[dict]) -> bool:
    """Run round hooks; returns True if any raised WorkerBreak
    (ref process.py:100-111).  Other exceptions warn and continue."""
    import warnings

    brk = False
    for hook in hooks:
        try:
            hook(worker_type, link_pool)
        except WorkerBreak:
            brk = True
        except Exception as exc:  # noqa: BLE001 — hook errors never kill a round
            warnings.warn(f"hook execution failed: {exc!r}", HookExecutionFailed)
    return brk
