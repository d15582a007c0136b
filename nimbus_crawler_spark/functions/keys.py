"""Deterministic blob object keys.

Reproduces the reference's MinIO key scheme
(``/root/reference/internal/storage/keys.go:16-47``):

    <host><path or /index, one trailing '/' stripped>_<first 8 bytes of
    sha256(rawURL) as hex>.<ext>

Invalid URLs map to ``unknown/<sanitized>.<ext>``. The engine has no object
store — page bytes live in table columns — but the key columns are emitted so
a user of the reference can join our output against their bucket layout.
Unit vectors ported from keys_test.go:8-130 in tests/test_keys.py.
"""

from __future__ import annotations

import hashlib

from .urlnorm import parse_url

HTML_BUCKET = "nimbus-html"
TEXT_BUCKET = "nimbus-text"


def _sanitize(s: str) -> str:
    for ch in "/:?&=":
        s = s.replace(ch, "_")
    return s


def object_key(raw_url: str, ext: str) -> str:
    p = parse_url(raw_url)
    if p is None:
        return f"unknown/{_sanitize(raw_url)}.{ext}"
    path = p.path
    if path in ("", "/"):
        path = "/index"
    if path.endswith("/"):  # strings.TrimSuffix: one occurrence
        path = path[: -1]
    h = hashlib.sha256(raw_url.encode("utf-8")).hexdigest()[:16]
    return f"{p.netloc}{path}_{h}.{ext}"


def html_key(raw_url: str) -> str:
    return object_key(raw_url, "html")


def text_key(raw_url: str) -> str:
    return object_key(raw_url, "txt")
