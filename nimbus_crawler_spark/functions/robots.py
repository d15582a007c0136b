"""robots.txt parsing and matching (temoto/robotstxt semantics).

The reference gates every fetch on robots.txt via github.com/temoto/robotstxt
(``/root/reference/internal/robots/robots.go:54-83``) and derives the per-host
crawl delay from the matched group's ``Crawl-delay``
(``robots.go:157-177``). Python's stdlib ``urllib.robotparser`` does NOT
implement Google-style ``*``/``$`` wildcards or longest-match precedence, so
this module implements the matcher from scratch (SURVEY.md §7.3 risk 3):

* group selection: lowercase the agent token; a group whose (lowercased)
  user-agent token is a *prefix* of the agent wins; longest token wins;
  ``*`` is the fallback with pseudo-length 1 (temoto FindGroup). The
  reference asks for group ``NimbusCrawler`` then falls back to ``*``
  (robots.go:71-74) — FindGroup already does the fallback, so both paths
  produce the same group.
* rule matching: rules containing ``*`` or ``$`` compile to anchored regexes
  (``*`` → ``.*``, trailing ``$`` → end anchor); plain rules match by path
  prefix. Among matching rules the one with the longest pattern string wins;
  no match ⇒ allowed (temoto Group.Test/findRule). Paths are matched with
  query included — the reference passes ``URL.RequestURI()`` (robots.go:76-80).
* crawl delay: matched group's Crawl-delay seconds → ms, clamped to
  ``MIN_CRAWL_DELAY_MS`` (100); absent/invalid ⇒ ``DEFAULT_CRAWL_DELAY_MS``
  (200). Constants from robots.go:29-32.

A host with no robots body ⇒ allow-all at the default delay (robots.go:56-59,
126-141: fetch failures and non-200s yield an empty body).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

CRAWLER_NAME = "NimbusCrawler"
CRAWLER_USER_AGENT = "NimbusCrawler/1.0"
DEFAULT_CRAWL_DELAY_MS = 200
MIN_CRAWL_DELAY_MS = 100


@dataclass
class _Rule:
    path: str
    allow: bool
    pattern: re.Pattern | None = None

    @property
    def precedence_len(self) -> int:
        # temoto findRule: len(pattern.String()) for wildcard rules,
        # len(path) for plain rules.
        return len(self.pattern.pattern) if self.pattern is not None else len(self.path)


@dataclass
class _Group:
    agent: str
    rules: list[_Rule] = field(default_factory=list)
    crawl_delay_s: float | None = None


def _compile_pattern(path: str) -> re.Pattern:
    pat = re.escape(path).replace(r"\*", ".*")
    if pat.endswith(r"\$"):
        pat = pat[: -2] + "$"
    return re.compile("^" + pat)


@dataclass
class RobotsData:
    groups: dict[str, _Group] = field(default_factory=dict)

    def find_group(self, agent: str) -> _Group | None:
        agent = agent.lower()
        best = self.groups.get("*")
        best_len = 1 if best is not None else 0
        for token, group in self.groups.items():
            if token != "*" and agent.startswith(token) and len(token) > best_len:
                best, best_len = group, len(token)
        return best

    def test_agent(self, path: str, agent: str) -> bool:
        group = self.find_group(agent)
        if group is None:
            return True
        chosen: _Rule | None = None
        chosen_len = 0
        for r in group.rules:
            if r.pattern is not None:
                if r.pattern.match(path) and r.precedence_len > chosen_len:
                    chosen, chosen_len = r, r.precedence_len
            elif r.path:
                if path.startswith(r.path) and r.precedence_len > chosen_len:
                    chosen, chosen_len = r, r.precedence_len
        return chosen is None or chosen.allow

    def crawl_delay_ms(self, agent: str) -> int:
        group = self.find_group(agent)
        if group is None or group.crawl_delay_s is None or group.crawl_delay_s <= 0:
            return DEFAULT_CRAWL_DELAY_MS
        ms = int(group.crawl_delay_s * 1000)  # Duration.Milliseconds truncates
        return max(ms, MIN_CRAWL_DELAY_MS)


def parse_robots(body: str) -> RobotsData:
    """Line-oriented parse: '#' comments, User-agent blocks, Allow/Disallow/
    Crawl-delay directives. Consecutive User-agent lines share the following
    rules; a blank-line-separated repeat of an agent merges (append)."""
    data = RobotsData()
    current: list[_Group] = []
    last_was_agent = False
    for raw_line in (body or "").splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            token = value.lower()
            if not last_was_agent:
                current = []
            group = data.groups.get(token)
            if group is None:
                group = _Group(agent=token)
                data.groups[token] = group
            current.append(group)
            last_was_agent = True
            continue
        last_was_agent = False
        if not current:
            continue  # directive before any User-agent: ignored
        if key in ("allow", "disallow"):
            rule = _Rule(path=value, allow=(key == "allow"))
            if value and ("*" in value or "$" in value):
                rule.pattern = _compile_pattern(value)
            for g in current:
                g.rules.append(rule)
        elif key == "crawl-delay":
            try:
                delay = float(value)
            except ValueError:
                continue
            for g in current:
                g.crawl_delay_s = delay
    return data


def robots_allowed(body: str | None, request_uri: str, agent: str = CRAWLER_NAME) -> bool:
    """IsAllowed semantics (robots.go:54-83): empty/missing body ⇒ allow."""
    if not body:
        return True
    return parse_robots(body).test_agent(request_uri, agent)


def extract_crawl_delay_ms(body: str | None, agent: str = CRAWLER_NAME) -> int:
    """extractCrawlDelay semantics (robots.go:157-177).

    Unit vectors ported from robots_test.go:5-54 in tests/test_robots.py.
    """
    if not body:
        return DEFAULT_CRAWL_DELAY_MS
    return parse_robots(body).crawl_delay_ms(agent)
