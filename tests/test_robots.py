"""robots.txt vectors ported from /root/reference/internal/robots/robots_test.go
and cache_test.go (allow/deny matching), plus wildcard cases per temoto
semantics."""

from nimbus_crawler_spark.functions.robots import (
    DEFAULT_CRAWL_DELAY_MS,
    MIN_CRAWL_DELAY_MS,
    extract_crawl_delay_ms,
    robots_allowed,
)


class TestExtractCrawlDelay:
    # robots_test.go:5-54
    def test_nimbus_crawler_group(self):
        assert extract_crawl_delay_ms("User-agent: NimbusCrawler\nCrawl-delay: 2\n") == 2000

    def test_fallback_to_wildcard(self):
        assert extract_crawl_delay_ms("User-agent: *\nCrawl-delay: 3\n") == 3000

    def test_no_crawl_delay_returns_default(self):
        assert (
            extract_crawl_delay_ms("User-agent: *\nDisallow: /private\n")
            == DEFAULT_CRAWL_DELAY_MS
        )

    def test_below_minimum_clamped(self):
        assert (
            extract_crawl_delay_ms("User-agent: NimbusCrawler\nCrawl-delay: 0.01\n")
            == MIN_CRAWL_DELAY_MS
        )

    def test_empty_body_returns_default(self):
        assert extract_crawl_delay_ms("") == DEFAULT_CRAWL_DELAY_MS
        assert extract_crawl_delay_ms(None) == DEFAULT_CRAWL_DELAY_MS

    def test_nimbus_preferred_over_wildcard(self):
        body = "User-agent: *\nCrawl-delay: 5\n\nUser-agent: NimbusCrawler\nCrawl-delay: 2\n"
        assert extract_crawl_delay_ms(body) == 2000


class TestRobotsAllowed:
    # cache_test.go:138-197 (matching performed on RequestURI = path?query)
    def test_disallow_prefix(self):
        body = "User-agent: *\nDisallow: /admin/\n"
        assert not robots_allowed(body, "/admin/page")
        assert robots_allowed(body, "/public")

    def test_query_included_in_match(self):
        body = "User-agent: *\nDisallow: /search\n"
        assert not robots_allowed(body, "/search?q=test")
        assert robots_allowed(body, "/about")

    def test_empty_body_allows(self):
        assert robots_allowed("", "/anything")
        assert robots_allowed(None, "/anything")

    def test_empty_disallow_allows_all(self):
        assert robots_allowed("User-agent: *\nDisallow:\n", "/x")

    def test_allow_overrides_shorter_disallow(self):
        # Google/temoto precedence: longest matching rule wins
        body = "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
        assert not robots_allowed(body, "/a/c")
        assert robots_allowed(body, "/a/b/c")

    def test_wildcard_star(self):
        body = "User-agent: *\nDisallow: /*.pdf\n"
        assert not robots_allowed(body, "/docs/file.pdf")
        assert robots_allowed(body, "/docs/file.html")

    def test_dollar_anchor(self):
        body = "User-agent: *\nDisallow: /tmp$\n"
        assert not robots_allowed(body, "/tmp")
        assert robots_allowed(body, "/tmp/inner")

    def test_group_selection_prefix_match(self):
        # temoto FindGroup: token must be a prefix of the agent, longest wins
        body = (
            "User-agent: *\nDisallow: /\n\n"
            "User-agent: Nimbus\nDisallow: /private\n"
        )
        assert robots_allowed(body, "/public")  # NimbusCrawler matches 'Nimbus' group
        assert not robots_allowed(body, "/private/x")

    def test_disallow_all(self):
        body = "User-agent: *\nDisallow: /\n"
        assert not robots_allowed(body, "/")
        assert not robots_allowed(body, "/a")

    def test_comments_stripped(self):
        body = "# hello\nUser-agent: *  # inline\nDisallow: /a # comment\n"
        assert not robots_allowed(body, "/a/b")
        assert robots_allowed(body, "/b")

    def test_shared_group_user_agents(self):
        body = "User-agent: A\nUser-agent: NimbusCrawler\nDisallow: /x\n"
        assert not robots_allowed(body, "/x/1")
        assert robots_allowed(body, "/y")
