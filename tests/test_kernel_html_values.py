"""Unquoted-HTML-value goldens, ported from
/root/reference/test/unit/layer3_html_content_test.exs (HTML blob in
value position consumed with tag-depth tracking and quoted)."""

import pytest

from json_remedy_spark.kernel import repair


def rep(s):
    r = repair(s)
    assert r.ok, f"{r.error} for {s!r}"
    return r.value


def test_simple_html_fragment():
    # layer3_html_content_test.exs:36-41
    r = rep('{"content":<div class="test">Hello World</div>}')
    assert r["content"] == '<div class="test">Hello World</div>'


def test_html_with_nested_json_braces_in_attr():
    # :43-49
    r = rep('{"template":<div data-config=\'{"key":"value"}\'>Content</div>, "other": "value"}')
    assert r["template"] == '<div data-config=\'{"key":"value"}\'>Content</div>'
    assert r["other"] == "value"


def test_multiple_html_values():
    # :51-59
    r = rep('{"header":<h1>Title</h1>, "body":<p>Paragraph</p>, "footer":<div>Footer</div>}')
    assert r["header"] == "<h1>Title</h1>"
    assert r["body"] == "<p>Paragraph</p>"
    assert r["footer"] == "<div>Footer</div>"


def test_html_in_array():
    # :61-67
    r = rep('{"items": [<li>Item 1</li>, <li>Item 2</li>, <li>Item 3</li>]}')
    assert r["items"] == ["<li>Item 1</li>", "<li>Item 2</li>", "<li>Item 3</li>"]


def test_html_entities_preserved():
    # :106-111
    r = rep('{"content":<p>Read more &raquo; or &amp; continue</p>}')
    assert r["content"] == "<p>Read more &raquo; or &amp; continue</p>"


def test_doctype_error_page():
    # :7-33 (assertion-style golden: structure + containment)
    malformed = (
        '{\n  "responses": [\n    {\n      "id": "33",\n      "status": 503,\n'
        '      "headers": {"Content-Type": "text/html; charset=us-ascii"},\n'
        '      "body":<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01//EN""http://www.w3.org/TR/html4/strict.dtd">\n'
        "<HTML><HEAD><TITLE>Service Unavailable</TITLE>\n"
        '<META HTTP-EQUIV="Content-Type" Content="text/html; charset=us-ascii"></HEAD>\n'
        "<BODY><h2>Service Unavailable</h2>\n"
        "<hr><p>HTTP Error 503. The service is unavailable.</p>\n"
        "</BODY></HTML>\n    }\n  ]\n}\n"
    )
    r = rep(malformed)
    resp = r["responses"][0]
    assert resp["status"] == 503
    assert resp["body"].startswith("<!DOCTYPE HTML")
    assert "Service Unavailable" in resp["body"]
