"""Unit vectors for text/link extraction, ported from the reference's
table-driven tests (/root/reference/internal/parser/extractor_test.go)."""

from nimbus_crawler_spark.functions.extract import extract_links, extract_text


class TestExtractText:
    # extractor_test.go:19-66
    def test_basic_body_text(self):
        assert "Hello World" in extract_text("<html><body><p>Hello World</p></body></html>")

    def test_strips_script_style_noscript_iframe(self):
        html = (
            "<html><body><script>var x=1;</script><style>.a{}</style>"
            "<noscript>no</noscript><iframe>frame</iframe><p>Visible</p></body></html>"
        )
        got = extract_text(html)
        assert "Visible" in got
        for bad in ("var x=1;", ".a{}", "no", "frame"):
            assert bad not in got.replace("Visible", "")

    def test_empty_body(self):
        assert extract_text("<html><body></body></html>") == ""

    def test_nested_elements(self):
        got = extract_text("<html><body><div><span>Nested</span> <b>Text</b></div></body></html>")
        assert "Nested" in got
        assert got == "Nested Text"

    # extractor_test.go:68-75
    def test_strips_script_content(self):
        got = extract_text("<html><body><script>var secret=1;</script><p>OK</p></body></html>")
        assert "secret" not in got
        assert got == "OK"

    def test_exact_bytes(self):
        # byte-identity checks beyond the reference's 'contains' assertions
        assert extract_text("<html><body><p>Hello World</p></body></html>") == "Hello World"
        assert extract_text("<html><body>  padded  </body></html>") == "padded"
        assert (
            extract_text("<html><body><p>a</p><p>b</p></body></html>") == "ab"
        )  # no separator between text nodes (goquery Text())

    def test_bytes_input(self):
        assert extract_text(b"<html><body><p>Hi</p></body></html>") == "Hi"

    def test_head_text_excluded(self):
        got = extract_text(
            "<html><head><title>T</title></head><body><p>B</p></body></html>"
        )
        assert got == "B"

    def test_entities_decoded(self):
        assert extract_text("<html><body><p>a &amp; b</p></body></html>") == "a & b"


class TestExtractURLs:
    # extractor_test.go:77-164, table rows in order
    def test_absolute_urls(self):
        html = '<html><body><a href="https://example.com/page">link</a></body></html>'
        assert extract_links(html, "https://example.com") == ["https://example.com/page"]

    def test_relative_urls_resolved(self):
        html = '<html><body><a href="/about">about</a></body></html>'
        assert extract_links(html, "https://example.com") == ["https://example.com/about"]

    def test_javascript_mailto_tel_hash_filtered(self):
        html = (
            '<html><body><a href="javascript:void(0)">js</a><a href="mailto:a@b.com">mail</a>'
            '<a href="tel:123">tel</a><a href="#top">hash</a><a href="https://ok.com">ok</a></body></html>'
        )
        assert extract_links(html, "https://example.com") == ["https://ok.com"]

    def test_non_http_scheme_filtered_after_resolution(self):
        html = (
            '<html><body><a href="ftp://files.example.com/data">ftp</a>'
            '<a href="https://ok.com">ok</a></body></html>'
        )
        assert extract_links(html, "https://example.com") == ["https://ok.com"]

    def test_duplicates_deduplicated(self):
        html = (
            '<html><body><a href="https://example.com/page">a</a>'
            '<a href="https://example.com/page">b</a></body></html>'
        )
        assert extract_links(html, "https://example.com") == ["https://example.com/page"]

    def test_normalization_lowercase_host_remove_fragment_sort_query(self):
        html = '<html><body><a href="https://Example.COM/path?b=2&a=1#frag">link</a></body></html>'
        assert extract_links(html, "https://example.com") == [
            "https://example.com/path?a=1&b=2"
        ]

    def test_invalid_base_url_returns_none(self):
        html = '<html><body><a href="/page">link</a></body></html>'
        assert extract_links(html, "://invalid") is None

    def test_empty_href_skipped(self):
        html = '<html><body><a href="">empty</a><a href="https://ok.com">ok</a></body></html>'
        assert extract_links(html, "https://example.com") == ["https://ok.com"]

    def test_mixed_valid_and_invalid_hrefs(self):
        html = (
            '<html><body><a href="javascript:alert(1)">bad</a>'
            '<a href="https://good.com/a">good</a><a href="mailto:x@y.z">mail</a>'
            '<a href="/relative">rel</a></body></html>'
        )
        assert extract_links(html, "https://example.com") == [
            "https://good.com/a",
            "https://example.com/relative",
        ]

    def test_document_order_preserved(self):
        html = (
            '<html><body><div><a href="/z">z</a></div><a href="/a">a</a>'
            '<span><a href="/m">m</a></span></body></html>'
        )
        assert extract_links(html, "https://h.test") == [
            "https://h.test/z",
            "https://h.test/a",
            "https://h.test/m",
        ]

    def test_dedup_is_on_normalized_form(self):
        html = (
            '<html><body><a href="https://E.com/x?b=1&a=2">1</a>'
            '<a href="https://e.com/x?a=2&b=1#f">2</a></body></html>'
        )
        assert extract_links(html, "https://e.com") == ["https://e.com/x?a=2&b=1"]
