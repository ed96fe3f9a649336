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


def test_html_table_with_commas():
    # :69-87 — commas and currency inside <td> stay inside the value
    r = rep(
        '{\n  "report": {\n    "title": "Sales Summary",\n'
        '    "content":<table>\n'
        "<tr><td>Widget A</td><td>$4,500</td></tr>\n"
        "<tr><td>Widget B</td><td>$6,000</td></tr>\n"
        "</table>,\n    \"total\": 10500\n  }\n}"
    )
    rep_ = r["report"]
    assert rep_["title"] == "Sales Summary"
    assert "$4,500" in rep_["content"] and "$6,000" in rep_["content"]
    assert rep_["total"] == 10500


def test_html_quotes_in_content():
    # :89-94
    r = rep('{"snippet":<div><p>User said: "Hello World"</p></div>}')
    assert 'User said: "Hello World"' in r["snippet"]


def test_html_windows_newlines():
    # :96-105 — \r\n inside the HTML body survives
    r = rep(
        '\n  {"responses": [{"id":"33","status":503,'
        '"headers":{"Content-Type":"text/html; charset=us-ascii"},'
        '"body":<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01//EN"'
        '"http://www.w3.org/TR/html4/strict.dtd"><HTML><HEAD>'
        "<TITLE>Service Unavailable</TITLE>"
        '<META HTTP-EQUIV="Content-Type" Content="text/html; charset=us-ascii">'
        "</HEAD><BODY><h2>Application Request Queue Full</h2><hr>"
        "<p>HTTP Error 503. The application request queue is full.</p>\r\n"
        "</BODY></HTML>}]}\n"
    )
    body = r["responses"][0]["body"]
    assert "\r\n" in body and "Application Request Queue Full" in body


def test_html_inline_style_braces():
    # :114-119 — JSON-like braces inside a style attribute are inert
    r = rep('{"widget":<div style="font: {size: 12px}">Text</div>}')
    assert "font: {size: 12px}" in r["widget"]


def test_html_array_with_jsonlike_content():
    # :121-133
    r = rep(
        '{\n  "alerts": [\n'
        '    <div class="alert">Error: {code: 500}</div>,\n'
        '    <div class="warning">Warning: {timeout: true}</div>\n  ]\n}'
    )
    assert len(r["alerts"]) == 2
    assert "code: 500" in r["alerts"][0] and "timeout: true" in r["alerts"][1]


def test_html_nested_data_attributes():
    # :135-144 — single-quoted JSON inside a data attribute survives
    r = rep(
        '{\n  "element":<div data-meta=\'{"views":1000,"likes":50}\'>\n'
        "    <h3>Title</h3>\n  </div>\n}"
    )
    assert 'data-meta=\'{"views":1000,"likes":50}\'' in r["element"]


def test_html_script_tag_with_json():
    # :146-157
    r = rep(
        '{\n  "config":<div>\n    <script type="application/json">\n'
        '      {"embedded": "data"}\n    </script>\n  </div>\n}'
    )
    assert '{"embedded": "data"}' in r["config"]


def test_html_self_closing_tag():
    # :159-164
    r = rep('{"image":<img src="test.jpg" alt="Test" />}')
    assert r["image"] == '<img src="test.jpg" alt="Test" />'


def test_html_comment_inside_value():
    # :166-171
    r = rep('{"content":<div><!-- Comment -->Text</div>}')
    assert r["content"] == "<div><!-- Comment -->Text</div>"


def test_html_deeply_nested():
    # :173-178
    r = rep('{"html":<div><ul><li><a href="#">Link</a></li></ul></div>}')
    assert '<a href="#">Link</a>' in r["html"]


def test_html_examples_complex_nested_attributes():
    """examples/html_content_examples.exs:201-224 — unquoted HTML value
    whose attributes embed a single-quoted JSON config and a script."""
    import json as _json

    doc = """{
    "page_data": {
        "title": "Dashboard",
        "rendered_html":<div class="dashboard" data-config='{"theme":"dark","refresh":30}'>
<section id="stats">
    <div class="stat-card">
        <h3>Active Users</h3>
        <p class="value">1,234</p>
    </div>
    <!-- More stats here -->
</section>
<script type="text/javascript">
    console.log("Dashboard loaded");
</script>
</div>,
        "metadata": {
            "generated_at": "2025-10-24",
            "version": "2.0"
        }
    }
}
"""
    r = repair(doc)
    assert r.ok
    got = _json.loads(r.repaired)["page_data"]
    assert got["title"] == "Dashboard"
    assert got["rendered_html"].startswith('<div class="dashboard"')
    assert '{"theme":"dark","refresh":30}' in got["rendered_html"]
    assert got["metadata"]["version"] == "2.0"


def test_html_examples_crlf_terminated_body():
    """examples/html_content_examples.exs:251-259 — one-line API blob
    with a CRLF inside the unquoted HTML body."""
    import json as _json

    doc = (
        '{"responses": [{"id":"33","status":503,'
        '"headers":{"Content-Type":"text/html; charset=us-ascii"},'
        '"body":<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01//EN"'
        '"http://www.w3.org/TR/html4/strict.dtd"><HTML><HEAD>'
        "<TITLE>Service Unavailable</TITLE>"
        '<META HTTP-EQUIV="Content-Type" Content="text/html; charset=us-ascii">'
        "</HEAD><BODY><h2>Application Request Queue Full</h2><hr>"
        "<p>HTTP Error 503. The application request queue is full.</p>\r\n"
        "</BODY></HTML>}]} "
    )
    r = repair(doc)
    assert r.ok
    resp = _json.loads(r.repaired)["responses"][0]
    assert resp["status"] == 503
    assert resp["body"].startswith("<!DOCTYPE HTML")
    assert "queue is full" in resp["body"]
