"""URL parsing / canonicalization kernels (pure Python, vectorization-friendly).

Re-expresses the semantics of the reference's URL handling:

* Go ``net/url.Parse`` validation quirks — the reference drops links whose
  URL fails Go's parser (``/root/reference/internal/parser/extractor.go:55-58``,
  ``internal/crawler/crawler.go:112-119``, ``internal/seeder/seeder.go:34-49``).
* purell normalization with the reference's 9 flags
  (``internal/parser/extractor.go:11-19``): lowercase scheme, lowercase host,
  uppercase escapes, remove default port, remove trailing slash, remove dot
  segments, remove duplicate slashes, remove fragment, sort query.
* Go ``URL.Hostname()`` (port/bracket stripping, NO lowercasing) used as the
  politeness key (``internal/crawler/crawler.go:120``).

These are plain functions over Python strings; Spark wraps them in pandas
UDFs (see ``functions/udfs.py``) so the per-row work is Arrow-batched, never
row-at-a-time over the wire.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from urllib.parse import unquote_plus
from urllib.parse import urljoin as _std_urljoin

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*$")
# one C-level scan replacing the per-char Python loops in parse_url (its
# callers run per URL per page in the parse kernel): control chars Go
# rejects, and the scheme-prefix shape the Go getScheme loop accepts
_CTRL_RE = re.compile(r"[\x00-\x1f\x7f]")
_SCHEME_PREFIX_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
_PCT_RE = re.compile(r"%(?![0-9A-Fa-f]{2})")
_PCT_UPPER_RE = re.compile(r"%[0-9A-Fa-f]{2}")

# Default ports stripped by purell's FlagRemoveDefaultPort.
_DEFAULT_PORTS = {"http": "80", "https": "443"}


@dataclass
class ParsedURL:
    """Decomposed URL mirroring the fields of Go's url.URL we rely on."""

    scheme: str
    netloc: str  # Go's u.Host: host[:port], brackets kept for IPv6
    path: str
    query: str  # raw query, no leading '?'
    fragment: str

    @property
    def hostname(self) -> str:
        """Go URL.Hostname(): strip port and IPv6 brackets; no case folding."""
        h = self.netloc
        if h.startswith("["):
            end = h.find("]")
            return h[1:end] if end >= 0 else h[1:]
        colon = h.rfind(":")
        if colon >= 0 and h[colon + 1 :].isdigit():
            return h[:colon]
        if colon >= 0 and h[colon + 1 :] == "":
            return h[:colon]
        return h

    @property
    def port(self) -> str:
        h = self.netloc
        if h.startswith("["):
            end = h.find("]")
            rest = h[end + 1 :] if end >= 0 else ""
            return rest[1:] if rest.startswith(":") else ""
        colon = h.rfind(":")
        if colon >= 0:
            return h[colon + 1 :]
        return ""

    def request_uri(self) -> str:
        """Go URL.RequestURI(): path?query, path defaulting to '/'."""
        p = self.path or "/"
        if self.query:
            return f"{p}?{self.query}"
        return p

    def unparse(self) -> str:
        out = ""
        if self.scheme:
            out += self.scheme + ":"
        if self.netloc or self.scheme in ("http", "https", "ftp", "file"):
            out += "//" + self.netloc
        out += self.path
        if self.query:
            out += "?" + self.query
        if self.fragment:
            out += "#" + self.fragment
        return out


def parse_url(raw: str) -> ParsedURL | None:
    """Parse ``raw`` with (a subset of) Go net/url.Parse's strictness.

    Returns None where Go's parser would return an error; the callers drop
    such rows exactly like the reference does. Divergence policy: we reject a
    superset-of-none / subset-of-all of what Go rejects for the URL shapes in
    our fixtures; adversarial shapes outside the corpus are documented risk.

    Go behaviors reproduced:
    - '://x' and ':rest' → "missing protocol scheme" error.
    - control characters anywhere → error.
    - invalid percent escapes ('%zz') in path/query/fragment → error.
    - non-numeric port → error.
    - scheme is lowercased; host case preserved.
    """
    if raw is None:
        return None
    if _CTRL_RE.search(raw):
        return None

    rest = raw
    fragment = ""
    if "#" in rest:
        rest, fragment = rest.split("#", 1)

    scheme = ""
    # Go getScheme semantics via ONE anchored match: the char-by-char loop
    # set a scheme exactly when the prefix was [A-Za-z][A-Za-z0-9+.-]*':'
    # (any '/', '?', ':'-after-invalid-candidate, or other char broke the
    # loop without a scheme), and errored only on a leading ':'.
    m = _SCHEME_PREFIX_RE.match(rest)
    if m is not None:
        scheme = rest[: m.end() - 1].lower()
        rest = rest[m.end() :]
    elif rest[:1] == ":":
        return None  # missing protocol scheme

    query = ""
    if "?" in rest:
        rest, query = rest.split("?", 1)

    netloc = ""
    path = rest
    if rest.startswith("//"):
        rest = rest[2:]
        # the query was split off above, so '/' is the only terminator left
        slash = rest.find("/")
        if slash < 0:
            slash = len(rest)
        netloc, path = rest[:slash], rest[slash:]
        if "@" in netloc:  # userinfo not used by the crawler; keep verbatim
            hostport = netloc.rsplit("@", 1)[1]
        else:
            hostport = netloc
        # port validation (Go: "invalid port" error)
        if hostport.startswith("["):
            end = hostport.find("]")
            if end < 0:
                return None
            after = hostport[end + 1 :]
            if after and (not after.startswith(":") or not after[1:].isdigit()):
                if after != ":":
                    return None
        else:
            colon = hostport.rfind(":")
            if colon >= 0:
                port = hostport[colon + 1 :]
                if port and not port.isdigit():
                    return None

    for part in (path, query, fragment):
        if _PCT_RE.search(part):
            return None  # invalid URL escape

    return ParsedURL(scheme=scheme, netloc=netloc, path=path, query=query, fragment=fragment)


def hostname(raw: str) -> str | None:
    """Politeness key of the reference: Go url.Parse(u).Hostname().

    Reference: internal/crawler/crawler.go:112-120, internal/parser/parser.go:173-178.
    Returns None if the URL does not parse (caller drops the row).
    """
    p = parse_url(raw)
    if p is None:
        return None
    return p.hostname


def _remove_dot_segments(path: str, has_host: bool) -> str:
    """purell removeDotSegments (split on '/', drop '.'/'..' with pop)."""
    if not path:
        return path
    sections = path.split("/")
    out: list[str] = []
    last_is_dot = False
    for s in sections:
        if s == "..":
            if out:
                out.pop()
        elif s != ".":
            out.append(s)
        last_is_dot = s in (".", "..")
    new = "/".join(out)
    if has_host and not new.startswith("/"):
        new = "/" + new
    if last_is_dot and not new.endswith("/"):
        new += "/"
    return new


def _sort_query(query: str) -> str:
    """purell FlagSortQuery: decode into key→[values], sort keys then values,
    emit 'k=v' joined by '&' (values re-encoded minimally; see module doc)."""
    if not query:
        return query
    pairs: dict[str, list[str]] = {}
    for part in query.split("&"):
        if not part:
            continue
        if "=" in part:
            k, v = part.split("=", 1)
        else:
            k, v = part, ""
        k = unquote_plus(k)
        v = unquote_plus(v)
        pairs.setdefault(k, []).append(v)
    chunks: list[str] = []
    for k in sorted(pairs):
        for v in sorted(pairs[k]):
            chunks.append(f"{_escape_query(k)}={_escape_query(v)}")
    return "&".join(chunks)


def _escape_query(s: str) -> str:
    """Minimal query-component re-escape with uppercase hex (urlesc-style)."""
    out = []
    for ch in s:
        if ch.isalnum() or ch in "-._~!$'()*,;:@/?":
            out.append(ch)
        elif ch == " ":
            out.append("%20")
        else:
            out.extend(f"%{b:02X}" for b in ch.encode("utf-8"))
    return "".join(out)


def _uppercase_escapes(s: str) -> str:
    return _PCT_UPPER_RE.sub(lambda m: m.group(0).upper(), s)


def canonicalize(raw: str) -> str | None:
    """purell NormalizeURL with the reference's 9 flags.

    Reference: internal/parser/extractor.go:11-19,66. Flag application order
    follows purell's flagsOrder: lowercase scheme/host → remove default port →
    remove dot segments → remove fragment → remove duplicate slashes → sort
    query → remove trailing slash; escapes uppercased on output.

    Test vector (extractor_test.go:117-122):
    'https://Example.COM/path?b=2&a=1#frag' → 'https://example.com/path?a=1&b=2'

    Returns None if the URL does not parse (caller drops the row).
    """
    p = parse_url(raw)
    if p is None:
        return None
    return _canonicalize_parsed(p)


def _canonicalize_parsed(p: ParsedURL) -> str:
    """``canonicalize`` after the parse — callers that already hold a
    ParsedURL (the link pipeline parses each resolved URL once for its
    scheme gate) skip the second parse. Mutates ``p``."""
    p.scheme = p.scheme.lower()
    p.netloc = p.netloc.lower()
    # FlagRemoveDefaultPort
    port = p.port
    if port and _DEFAULT_PORTS.get(p.scheme) == port:
        p.netloc = p.netloc[: p.netloc.rfind(":")]
    # FlagRemoveDotSegments
    p.path = _remove_dot_segments(p.path, has_host=bool(p.netloc))
    # FlagRemoveFragment
    p.fragment = ""
    # FlagRemoveDuplicateSlashes (path only)
    while "//" in p.path:
        p.path = p.path.replace("//", "/")
    # FlagSortQuery
    p.query = _sort_query(p.query)
    # FlagRemoveTrailingSlash (root '/' collapses to empty — purell strips it too)
    if p.path.endswith("/"):
        p.path = p.path[:-1]
    # FlagUppercaseEscapes (purell defers to urlesc on output)
    p.path = _uppercase_escapes(p.path)
    return p.unparse()


def resolve_reference(base: str, href: str) -> str | None:
    """RFC 3986 resolution matching Go's base.ResolveReference.

    Reference: internal/parser/extractor.go:33-36,55-60. Both Go's resolver
    and urllib.parse.urljoin implement RFC 3986 §5; href and base must each
    survive the Go-like parse first (the reference drops rows otherwise).
    """
    if parse_url(base) is None:
        return None
    return resolve_with_parsed_base(base, href)


def resolve_with_parsed_base(base: str, href: str) -> str | None:
    """``resolve_reference`` for a base the caller has already validated
    with ``parse_url`` — the per-page link loop validates its base once
    instead of once per href."""
    if parse_url(href) is None:
        return None
    try:
        return _std_urljoin(base, href)
    except ValueError:
        return None


# --- registrable domain (north-rule politeness key option) ------------------

# Vendored public-suffix snapshot (psl_data.py) — deterministic, offline.
# The config default politeness_key='hostname' reproduces reference parity
# per crawler.go:120; 'registrable_domain' mode (the north-rule politeness
# key) uses the full PSL algorithm over the snapshot.
from .psl_data import PSL_EXCEPTIONS, PSL_RULES, PSL_WILDCARDS


def registrable_domain(host: str) -> str:
    """eTLD+1 via the complete publicsuffix.org algorithm over the vendored
    snapshot: exception rules (``!``) prevail, then the longest matching rule
    (``*`` matches exactly one label), else the implicit ``*`` default (last
    label). Hosts that *are* a public suffix, IPs, and bracketed literals
    return as-is; registrable = prevailing suffix plus one label.
    """
    if not host or host.replace(".", "").isdigit() or host.startswith("["):
        return host
    labels = host.lower().rstrip(".").split(".")
    n = len(labels)
    ps_len = 0
    for i in range(n):  # longest tails first: first hit wins
        if "!" + ".".join(labels[i:]) in PSL_EXCEPTIONS:
            # exception: the public suffix is the rule minus its left label
            ps_len = n - i - 1
            break
        if ".".join(labels[i:]) in PSL_RULES or (
            i + 1 < n and "*." + ".".join(labels[i + 1 :]) in PSL_WILDCARDS
        ):
            ps_len = n - i
            break
    if ps_len == 0:
        ps_len = 1  # implicit '*' default rule: unknown TLD
    if ps_len >= n:
        return ".".join(labels)  # the host IS a public suffix
    return ".".join(labels[-(ps_len + 1) :])
