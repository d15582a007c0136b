"""Object-key vectors ported from /root/reference/internal/storage/keys_test.go."""

from nimbus_crawler_spark.functions.keys import html_key, object_key, text_key


class TestHTMLKey:
    # keys_test.go:8-61
    def test_standard_url(self):
        got = html_key("https://example.com/page/about")
        assert got.startswith("example.com/page/about_") and got.endswith(".html")

    def test_root_path(self):
        got = html_key("https://example.com/")
        assert got.startswith("example.com/index_") and got.endswith(".html")

    def test_no_path(self):
        got = html_key("https://example.com")
        assert got.startswith("example.com/index_") and got.endswith(".html")

    def test_trailing_slash_stripped(self):
        got = html_key("https://example.com/page/")
        assert got.startswith("example.com/page_") and got.endswith(".html")

    def test_query_and_fragment(self):
        got = html_key("https://example.com/search?q=test#top")
        assert got.startswith("example.com/search_") and got.endswith(".html")

    # keys_test.go:63-87
    def test_invalid_url(self):
        got = html_key("://invalid")
        assert got.startswith("unknown/") and got.endswith(".html")

    def test_deterministic(self):
        assert html_key("https://example.com/page") == html_key("https://example.com/page")

    def test_different_urls_different_keys(self):
        assert html_key("https://example.com/page?a=1") != html_key("https://example.com/page?b=2")

    def test_hash_is_8_bytes_hex(self):
        got = html_key("https://example.com/p")
        h = got.rsplit("_", 1)[1].removesuffix(".html")
        assert len(h) == 16 and all(c in "0123456789abcdef" for c in h)


class TestTextKey:
    # keys_test.go:89-130
    def test_standard_url(self):
        got = text_key("https://example.com/page/about")
        assert got.startswith("example.com/page/about_") and got.endswith(".txt")

    def test_root_path(self):
        got = text_key("https://example.com/")
        assert got.startswith("example.com/index_") and got.endswith(".txt")

    def test_host_keeps_port(self):
        assert object_key("https://example.com:8080/a", "html").startswith(
            "example.com:8080/a_"
        )
