"""Canonicalization / parsing vectors: the reference's purell flags
(/root/reference/internal/parser/extractor.go:11-19) plus adversarial cases
from FIXTURES.md §5 vec_canonicalize."""

from nimbus_crawler_spark.functions.urlnorm import (
    canonicalize,
    hostname,
    parse_url,
    registrable_domain,
    resolve_reference,
)


class TestCanonicalize:
    def test_reference_vector(self):
        # extractor_test.go:117-122
        assert (
            canonicalize("https://Example.COM/path?b=2&a=1#frag")
            == "https://example.com/path?a=1&b=2"
        )

    def test_lowercase_scheme_host(self):
        assert canonicalize("HTTPS://WWW.Example.COM/Path") == "https://www.example.com/Path"

    def test_remove_default_port(self):
        assert canonicalize("http://example.com:80/a") == "http://example.com/a"
        assert canonicalize("https://example.com:443/a") == "https://example.com/a"
        assert canonicalize("https://example.com:8443/a") == "https://example.com:8443/a"
        assert canonicalize("http://example.com:443/a") == "http://example.com:443/a"

    def test_remove_trailing_slash_incl_root(self):
        assert canonicalize("https://example.com/") == "https://example.com"
        assert canonicalize("https://example.com/page/") == "https://example.com/page"

    def test_remove_dot_segments(self):
        assert canonicalize("https://example.com/a/b/../c/./d") == "https://example.com/a/c/d"
        assert canonicalize("https://example.com/../a") == "https://example.com/a"

    def test_remove_duplicate_slashes(self):
        assert canonicalize("https://example.com/a//b///c") == "https://example.com/a/b/c"

    def test_remove_fragment(self):
        assert canonicalize("https://example.com/a#sec") == "https://example.com/a"

    def test_sort_query_repeated_keys(self):
        assert canonicalize("https://e.com/x?b=2&a=9&a=1") == "https://e.com/x?a=1&a=9&b=2"

    def test_uppercase_escapes(self):
        assert canonicalize("https://e.com/a%2fb") == "https://e.com/a%2Fb"

    def test_invalid_returns_none(self):
        assert canonicalize("://invalid") is None
        assert canonicalize("https://e.com/%zz") is None

    def test_idempotent(self):
        u = "https://Example.COM:443//a/../b/?z=1&a=2#f"
        once = canonicalize(u)
        assert canonicalize(once) == once


class TestParseURL:
    def test_invalid_missing_scheme(self):
        assert parse_url("://invalid") is None

    def test_control_chars_rejected(self):
        assert parse_url("https://e.com/a\x00b") is None

    def test_bad_port_rejected(self):
        assert parse_url("https://e.com:port/a") is None

    def test_request_uri(self):
        assert parse_url("https://e.com/search?q=test").request_uri() == "/search?q=test"
        assert parse_url("https://e.com").request_uri() == "/"

    def test_hostname_strips_port(self):
        assert hostname("https://e.com:8080/a") == "e.com"
        assert hostname("https://Example.COM/a") == "Example.COM"  # Go: no case fold
        assert hostname("://x") is None


class TestResolve:
    def test_relative(self):
        assert resolve_reference("https://e.com/dir/page", "../up") == "https://e.com/up"
        assert resolve_reference("https://e.com", "/about") == "https://e.com/about"

    def test_absolute_href_wins(self):
        assert resolve_reference("https://e.com", "https://other.com/x") == "https://other.com/x"

    def test_invalid_base(self):
        assert resolve_reference("://x", "/a") is None


class TestRegistrableDomain:
    def test_basic(self):
        assert registrable_domain("www.example.com") == "example.com"
        assert registrable_domain("a.b.example.co.uk") == "example.co.uk"
        assert registrable_domain("user.github.io") == "user.github.io"  # private suffix
        assert registrable_domain("example.com") == "example.com"
        assert registrable_domain("localhost") == "localhost"
        assert registrable_domain("127.0.0.1") == "127.0.0.1"

    def test_registrable_domain_full_psl_semantics(self):
        # multi-label ICP rules
        assert registrable_domain("www.bbc.co.uk") == "bbc.co.uk"
        assert registrable_domain("a.b.city.gov.uk") == "city.gov.uk"
        assert registrable_domain("shop.example.com.au") == "example.com.au"
        assert registrable_domain("x.y.rakuten.co.jp") == "rakuten.co.jp"
        assert registrable_domain("pref.metro.tokyo.jp") == "metro.tokyo.jp"
        assert registrable_domain("b.k12.ca.us") == "b.k12.ca.us"
        assert registrable_domain("school.k12.ca.us") == "school.k12.ca.us"
        # wildcard rules: '*' matches exactly one label
        assert registrable_domain("a.b.ck") == "a.b.ck"
        assert registrable_domain("x.a.b.ck") == "a.b.ck"
        assert registrable_domain("vm1.us-east-1.compute.amazonaws.com") == (
            "vm1.us-east-1.compute.amazonaws.com"
        )
        # exception rules prevail over wildcards
        assert registrable_domain("www.ck") == "www.ck"
        assert registrable_domain("foo.www.ck") == "www.ck"
        assert registrable_domain("city.kawasaki.jp") == "city.kawasaki.jp"
        assert registrable_domain("sub.city.kawasaki.jp") == "city.kawasaki.jp"
        # '*.kawasaki.jp' makes ward.kawasaki.jp itself a public suffix
        assert registrable_domain("ward.kawasaki.jp") == "ward.kawasaki.jp"
        assert registrable_domain("x.ward.kawasaki.jp") == "x.ward.kawasaki.jp"
        # a host that IS a public suffix returns as-is
        assert registrable_domain("co.uk") == "co.uk"
        assert registrable_domain("github.io") == "github.io"
        # unknown TLD falls back to the implicit '*' default rule
        assert registrable_domain("foo.bar.unknowntld") == "bar.unknowntld"
        # trailing dot + case normalization
        assert registrable_domain("WWW.Example.CO.UK.") == "example.co.uk"
