"""Content routing helpers: data-URI decoding.

Reference: ``/root/reference/darc/proxy/data.py:33-56`` decodes a
``data:`` URI and writes the payload to a file; here the decoded bytes
become the ``payload`` column of the ``artifacts`` table.
"""

from __future__ import annotations

import base64
import binascii
from urllib.parse import unquote_to_bytes

HTML_MIMES = ("text/html", "application/xhtml+xml")  # darc/crawl.py:198


def parse_data_uri(url: str) -> tuple[str, bytes] | None:
    """``data:[<mime>][;base64],<data>`` → (mime, payload bytes);
    None when malformed (reference catches ValueError, sites/data.py:45)."""
    if not url.startswith("data:"):
        return None
    rest = url[5:]
    head, sep, data = rest.partition(",")
    if not sep:
        return None
    is_base64 = head.endswith(";base64")
    if is_base64:
        head = head[: -len(";base64")]
    mime = head.split(";", 1)[0] or "text/plain"
    try:
        if is_base64:
            payload = base64.b64decode(data, validate=False)
        else:
            payload = unquote_to_bytes(data)
    except (binascii.Error, ValueError):
        return None
    return mime, payload
