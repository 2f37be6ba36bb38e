"""Deterministic synthetic web corpus (FIXTURES.md §1-4).

Replaces live HTTP for tests and benchmarks: a seeded graph of hosts →
pages → links covering every proxy class of the reference classifier
(``/root/reference/darc/link.py:327-390``), per-host robots.txt /
sitemap / i2p hosts.txt control files (all the variants the reference
exercises, ``darc/proxy/null.py:144-332``, ``darc/proxy/i2p.py:282-362``),
and one image+caption payload per page in the ``input_hint`` schema.

Everything derives from one integer seed — no wall clock, no network,
no global RNG.  ``Corpus.lookup`` is the synthetic HTTP fabric the
fetch stage resolves URLs against.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from darc_ray.functions import image as img
from darc_ray.schemas import IMAGES
from darc_ray.sources.table_io import read_table, write_table

WEB_SCHEMA = pa.schema([
    pa.field("url", pa.string()),
    pa.field("host", pa.string()),
    pa.field("status", pa.int32()),
    pa.field("mime", pa.string()),
    pa.field("body", pa.large_binary()),
    pa.field("redirect_to", pa.string()),
])

HOST_META_SCHEMA = pa.schema([
    pa.field("host", pa.string()),
    pa.field("proxy", pa.string()),
    pa.field("robots_txt", pa.string()),
    pa.field("sitemap_xml", pa.string()),
    pa.field("hosts_txt", pa.string()),
])

_WORDS = ("amber basalt cedar dune ember fjord garnet heath iris juniper kelp"
          " lumen marsh nectar onyx prism quartz reef sable tide umber vale"
          " willow xenon yarrow zephyr").split()


@dataclass
class _Host:
    ix: int
    proxy: str
    host: str          # Link.host (netloc)
    root: str          # root URL
    prefix: str        # URL prefix for pages


class Corpus:
    """In-memory synthetic web; materializable to table files."""

    def __init__(self, web: pa.Table, host_meta: pa.Table, images: pa.Table,
                 seeds: list[str]):
        self.web = web
        self.host_meta = host_meta
        self.images = images
        self.seeds = seeds
        self._index: dict[str, tuple[int, str, bytes, str]] | None = None

    # -- fetch fabric ------------------------------------------------------
    def index(self) -> dict[str, tuple[int, str, bytes, str]]:
        """url → (status, mime, body, redirect_to); built lazily once."""
        if self._index is None:
            cols = self.web.to_pydict()
            self._index = {
                u: (s, m, b, r)
                for u, s, m, b, r in zip(cols["url"], cols["status"], cols["mime"],
                                         cols["body"], cols["redirect_to"])
            }
        return self._index

    def lookup(self, url: str, max_hops: int = 5) -> tuple[int, str, bytes, list[tuple[str, int]]]:
        """Resolve one URL following redirect chains (requests-style):
        returns (status, mime, body, history) where history is the list
        of (url, status) redirect hops."""
        idx = self.index()
        history: list[tuple[str, int]] = []
        cur = url
        for _ in range(max_hops):
            row = idx.get(cur)
            if row is None:
                return 404, "text/html", b"<html><body>not found</body></html>", history
            status, mime, body, redirect = row
            if redirect:
                history.append((cur, status))
                cur = redirect
                continue
            return status, mime, body, history
        return 508, "text/html", b"", history  # redirect loop guard

    def resolve(self, url: str, max_hops: int = 5) -> str:
        """Final URL after following redirects (the HEAD probe's
        ``response.request.url``, ref darc/parse.py:240)."""
        idx = self.index()
        cur = url
        for _ in range(max_hops):
            row = idx.get(cur)
            if row is None or not row[3]:
                return cur
            cur = row[3]
        return cur

    # -- persistence -------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        write_table(self.web, os.path.join(path, "web"))
        write_table(self.host_meta, os.path.join(path, "host_meta"))
        write_table(self.images, os.path.join(path, "images"))
        with open(os.path.join(path, "seeds.json"), "w") as f:
            json.dump(self.seeds, f)

    @classmethod
    def load(cls, path: str) -> "Corpus":
        with open(os.path.join(path, "seeds.json")) as f:
            seeds = json.load(f)
        return cls(
            read_table(os.path.join(path, "web")),
            read_table(os.path.join(path, "host_meta")),
            read_table(os.path.join(path, "images")),
            seeds,
        )


def _host_spec(ix: int, proxy: str) -> _Host:
    if proxy == "null":
        h = f"h{ix:03d}.example"
        return _Host(ix, proxy, h, f"http://{h}/", f"http://{h}")
    if proxy == "tor":
        h = f"t{ix:03d}{'o' * 48}.onion"
        return _Host(ix, proxy, h, f"http://{h}/", f"http://{h}")
    if proxy == "tor2web":
        h = f"w{ix:03d}.onion.sh"
        return _Host(ix, proxy, h, f"https://{h}/", f"https://{h}")
    if proxy == "i2p":
        h = f"s{ix:03d}.i2p"
        return _Host(ix, proxy, h, f"http://{h}/", f"http://{h}")
    if proxy == "zeronet":
        site = f"1Zn{ix:03d}HeLLoAddr"
        return _Host(ix, proxy, "127.0.0.1:43110",
                     f"http://127.0.0.1:43110/{site}/",
                     f"http://127.0.0.1:43110/{site}")
    if proxy == "freenet":
        site = f"USK@f{ix:03d}key,check,AQACAAE"
        return _Host(ix, proxy, "127.0.0.1:8888",
                     f"http://127.0.0.1:8888/{site}/",
                     f"http://127.0.0.1:8888/{site}")
    raise ValueError(proxy)


def _caption(rng: np.random.Generator, image_id: str) -> str:
    n = int(rng.integers(4, 9))
    words = [_WORDS[int(rng.integers(0, len(_WORDS)))] for _ in range(n)]
    return f"{image_id}: " + " ".join(words)


def _pixels(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    fx, fy = float(rng.uniform(0.5, 4.0)), float(rng.uniform(0.5, 4.0))
    base = (128 + 60 * np.sin(2 * np.pi * fx * xx / w)
            + 60 * np.cos(2 * np.pi * fy * yy / h))
    noise = rng.integers(-12, 13, size=(h, w, 3))
    return np.clip(base[..., None] + noise, 0, 255).astype(np.uint8)


def make_corpus(seed: int = 42, n_hosts: int = 20, pages_per_host: int = 25,
                seed_count: int = 10, with_images: bool = True) -> Corpus:
    """Build the deterministic corpus.

    Proxy mix: every class gets at least one host once ``n_hosts ≥ 8``;
    the remainder are ``null``/``tor``/``i2p`` in proportion.
    """
    proxies = []
    base_cycle = ["null", "tor", "i2p", "tor2web", "zeronet", "freenet", "null", "tor"]
    for ix in range(n_hosts):
        if ix < len(base_cycle):
            proxies.append(base_cycle[ix])
        else:
            proxies.append(["null", "null", "null", "tor", "i2p"][ix % 5])
    hosts = [_host_spec(ix, p) for ix, p in enumerate(proxies)]

    web_rows: dict[str, tuple[str, int, str, bytes, str]] = {}   # url → (host,…)
    meta_rows: list[tuple[str, str, str | None, str | None, str | None]] = []
    image_rows: list[tuple[str, bytes, int, int, str, str, int]] = []

    def add(url: str, host: str, status: int, mime: str, body: bytes,
            redirect: str = "") -> None:
        web_rows.setdefault(url, (host, status, mime, body, redirect))

    for hspec in hosts:
        rng = np.random.default_rng(seed * 1_000_003 + hspec.ix)
        robots_kind = hspec.ix % 7
        pages = []
        for j in range(pages_per_host):
            if robots_kind == 2 and j % 5 == 3:
                path = f"/private/p{j:03d}.html"
            else:
                path = f"/p{j:03d}.html"
            pages.append(f"{hspec.prefix}{path}" if hspec.proxy not in ("zeronet", "freenet")
                         else f"{hspec.prefix}{path}")
        page_urls = [hspec.root] + pages

        # --- robots.txt (variants cycle; reference null.py:231-286 fetch path)
        robots_txt: str | None
        if robots_kind == 0:
            robots_txt = None                                   # 404
        elif robots_kind == 1:
            robots_txt = "User-agent: *\nAllow: /\n"
        elif robots_kind == 2:
            robots_txt = "User-agent: *\nDisallow: /private/\n"
        elif robots_kind == 3:
            robots_txt = "User-agent: *\nCrawl-delay: 2\n"
        elif robots_kind == 4:
            robots_txt = "User-agent: *\nRequest-rate: 1/3\n"
        elif robots_kind == 5:
            robots_txt = f"User-agent: *\nSitemap: {hspec.prefix}/sm_custom.xml\n"
        else:
            robots_txt = "User-agent: *\nDisallow: /\n"         # only root fetchable

        # --- sitemap (plain / index / gzip; lists some sitemap-only pages)
        sm_extra = [f"{hspec.prefix}/sm_only_{k}.html" for k in range(2)]
        listed = [u for u in pages[: max(2, pages_per_host // 3)]] + sm_extra
        urlset = ("<?xml version=\"1.0\"?>\n<urlset>"
                  + "".join(f"<url><loc>{u}</loc></url>" for u in listed)
                  + "</urlset>")
        sitemap_kind = hspec.ix % 3
        sm_url = (f"{hspec.prefix}/sm_custom.xml" if robots_kind == 5
                  else f"{hspec.prefix}/sitemap.xml")
        if hspec.proxy in ("zeronet", "freenet"):
            sitemap_xml = None                                  # skipped by crawler anyway
        elif sitemap_kind == 0:
            sitemap_xml = urlset
            add(sm_url, hspec.host, 200, "text/xml", urlset.encode())
        elif sitemap_kind == 1:
            half = len(listed) // 2
            us1 = ("<urlset>" + "".join(f"<url><loc>{u}</loc></url>" for u in listed[:half])
                   + "</urlset>")
            us2 = ("<urlset>" + "".join(f"<url><loc>{u}</loc></url>" for u in listed[half:])
                   + "</urlset>")
            smi = (f"<sitemapindex><sitemap><loc>{hspec.prefix}/sm_1.xml</loc></sitemap>"
                   f"<sitemap><loc>{hspec.prefix}/sm_2.xml</loc></sitemap></sitemapindex>")
            sitemap_xml = smi
            add(sm_url, hspec.host, 200, "text/xml", smi.encode())
            add(f"{hspec.prefix}/sm_1.xml", hspec.host, 200, "text/xml", us1.encode())
            add(f"{hspec.prefix}/sm_2.xml", hspec.host, 200, "text/xml", us2.encode())
        else:
            import gzip as _gzip
            sitemap_xml = urlset
            add(sm_url, hspec.host, 200, "application/gzip",
                _gzip.compress(urlset.encode(), 5, mtime=0))

        # --- robots URL + i2p hosts.txt
        robots_url = f"{hspec.prefix.split('/', 3)[0]}//{hspec.host}/robots.txt" \
            if hspec.proxy not in ("zeronet", "freenet") else None
        if robots_txt is not None and robots_url is not None:
            add(robots_url, hspec.host, 200, "text/plain", robots_txt.encode())

        hosts_txt: str | None = None
        if hspec.proxy == "i2p":
            peers = [h for h in hosts if h.proxy == "i2p" and h.ix != hspec.ix]
            lines = ["# i2p address book"]
            lines += [f"{p.host}=b64key{p.ix}" for p in peers[:3]]
            lines += [f"x{hspec.ix:03d}dark.i2p=b64keyx{hspec.ix}"]   # undiscovered host
            lines += ["bad-host.example=nope"]
            hosts_txt = "\n".join(lines) + "\n"
            add(f"http://{hspec.host}/hosts.txt", hspec.host, 200, "text/plain",
                hosts_txt.encode())
            # the undiscovered i2p host serves a tiny page so it's crawlable
            add(f"http://x{hspec.ix:03d}dark.i2p", f"x{hspec.ix:03d}dark.i2p", 200,
                "text/html", b"<html><body>dark</body></html>")

        meta_rows.append((hspec.host if hspec.proxy not in ("zeronet", "freenet")
                          else hspec.prefix.rsplit("/", 1)[-1],
                          hspec.proxy, robots_txt, sitemap_xml, hosts_txt))

        # --- sitemap-only pages
        for u in sm_extra:
            if hspec.proxy not in ("zeronet", "freenet"):
                add(u, hspec.host, 200, "text/html",
                    f"<html><body>sitemap-only page {u}</body></html>".encode())

        # --- pages + images
        for j, url in enumerate(page_urls):
            r = rng.random()
            status, redirect = 200, ""
            if j > 0:
                if r < 0.04:
                    status = 404
                elif r < 0.06:
                    status = 500
                elif r < 0.08:
                    status = 0                                  # connection error
                elif r < 0.11 and j + 1 < len(page_urls):
                    status, redirect = 301, page_urls[j + 1]

            # image payload for this page
            img_url = f"{hspec.prefix}/img/i{j:03d}"
            image_id = f"{hspec.host}/{j}" if hspec.proxy not in ("zeronet", "freenet") \
                else f"{hspec.prefix.rsplit('/', 1)[-1]}/{j}"
            if with_images:
                h_px = int(rng.integers(24, 72))
                w_px = int(rng.integers(24, 72))
                pix = _pixels(rng, h_px, w_px)
                fmt = "png" if (hspec.ix + j) % 2 == 0 else "jpeg"
                payload = img.encode(pix, fmt)
                caption = _caption(rng, image_id)
                image_rows.append((image_id, payload, w_px, h_px, fmt, caption,
                                   img.phash64(img.decode(payload, fmt))))
                add(f"{img_url}.{fmt}", hspec.host, 200, f"image/{fmt}", payload)
                img_ref = f"{img_url}.{fmt}"
            else:
                img_ref = f"{img_url}.png"
                add(img_ref, hspec.host, 200, "image/png", b"")

            # build HTML
            links = [f'<a href="/">root</a>', f'<img src="{img_ref}">']
            nxt = page_urls[(j + 1) % len(page_urls)]
            links.append(f'<a href="{nxt}">next</a>')
            for _ in range(3):
                tgt = page_urls[int(rng.integers(0, len(page_urls)))]
                links.append(f'<a href="{tgt}">in</a>')
            # cross-host links
            for _ in range(2):
                other = hosts[int(rng.integers(0, len(hosts)))]
                links.append(f'<a href="{other.root}">x</a>')
            # special-scheme sprinkles
            extra_bits = []
            rs = rng.random()
            if rs < 0.15:
                extra_bits.append(f"mailto:user{hspec.ix}@mail{j % 5}.example")
            elif rs < 0.25:
                extra_bits.append("pay 1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa now")
            elif rs < 0.32:
                extra_bits.append("eth 0x32Be343B94f860124dC4fEe278FDCBD38C102D88 ok")
            elif rs < 0.38:
                links.append('<a href="javascript:void(0)">js</a>')
            elif rs < 0.44:
                links.append('<a href="data:text/plain;base64,aGVsbG8=">d</a>')
            elif rs < 0.50:
                links.append(f'<a href="ftp://files{hspec.ix}.example/pub">f</a>')
            elif rs < 0.56:
                extra_bits.append(f"irc://irc{hspec.ix % 3}.example/chan")
            elif rs < 0.62:
                links.append('<a href="magnet:?xt=urn:btih:deadbeefcafe">m</a>')
            elif rs < 0.66:
                links.append('<a href="ed2k://|file|f|1|AA|/">e</a>')
            elif rs < 0.70:
                extra_bits.append(f"wss://push{hspec.ix % 3}.example/sock")
            elif rs < 0.74:
                extra_bits.append("tel:+1-202-555-0143")
            body = ("<html><head><title>p</title></head><body>"
                    + "\n".join(links)
                    + f"<p>page {j} of {hspec.host} " + " ".join(extra_bits) + "</p>"
                    + "</body></html>")
            add(url, hspec.host, status, "text/html", body.encode(), redirect)

    urls = list(web_rows.keys())
    web = pa.Table.from_pydict(
        {
            "url": urls,
            "host": [web_rows[u][0] for u in urls],
            "status": [web_rows[u][1] for u in urls],
            "mime": [web_rows[u][2] for u in urls],
            "body": [web_rows[u][3] for u in urls],
            "redirect_to": [web_rows[u][4] for u in urls],
        },
        schema=WEB_SCHEMA,
    )
    host_meta = pa.Table.from_pydict(
        {
            "host": [r[0] for r in meta_rows],
            "proxy": [r[1] for r in meta_rows],
            "robots_txt": [r[2] for r in meta_rows],
            "sitemap_xml": [r[3] for r in meta_rows],
            "hosts_txt": [r[4] for r in meta_rows],
        },
        schema=HOST_META_SCHEMA,
    )
    images = pa.Table.from_pydict(
        {
            "image_id": [r[0] for r in image_rows],
            "bytes": [r[1] for r in image_rows],
            "w": [r[2] for r in image_rows],
            "h": [r[3] for r in image_rows],
            "fmt": [r[4] for r in image_rows],
            "caption": [r[5] for r in image_rows],
            "phash": [r[6] for r in image_rows],
        },
        schema=IMAGES,
    )

    seeds = [hosts[i % len(hosts)].root for i in range(min(seed_count, len(hosts)))]
    # two non-fetchable seeds exercising the artifact sinks from round 0
    seeds += ["bitcoin:1BoatSLRHtKNngkdXEeobR76b53LETtpyT", "mailto:seed@mail.example"]
    return Corpus(web, host_meta, images, seeds)
