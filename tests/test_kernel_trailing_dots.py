"""Trailing-dots truncation goldens, ported from
/root/reference/test/unit/layer1_trailing_dots_test.exs (Gemini
max-token artifact: content then a run of dots)."""

from json_remedy_spark.kernel import repair


def rep(s):
    r = repair(s)
    assert r.ok, f"{r.error} for {s[:80]!r}"
    return r.value


def test_truncated_json_with_dots():
    # :15-28 — dots fill the remaining tokens mid-string
    r = rep('{"title": "Test", "excerpt": "Some text................')
    assert r["title"] == "Test"
    assert "excerpt" in r


def test_massive_trailing_dots():
    # :30-42 — ~14K dots after truncated content
    s = '{"title": "Review", "citations": [{"label": "Test"' + "." * 14_000
    r = rep(s)
    assert r["title"] == "Review"
    assert isinstance(r["citations"], list)


def test_dots_inside_strings_preserved():
    # :44-56
    r = rep('{"message": "Hello... how are you?", "status": "ok"}')
    assert r == {"message": "Hello... how are you?", "status": "ok"}


def test_truncated_string_with_dots():
    # :58-68
    r = rep('{"excerpt": "This is some text that gets cut off mid-sen' + "." * 45)
    assert "excerpt" in r


def test_truncated_array_with_dots():
    # :70-79
    r = rep('{"items": [1, 2, 3, 4' + "." * 44)
    assert r["items"][:3] == [1, 2, 3]


def test_truncated_nested_object_with_dots():
    # :81-89
    r = rep('{"user": {"name": "Alice", "profile": {"city": "New York' + "." * 15)
    assert r["user"]["name"] == "Alice"


def test_three_dot_ellipsis_preserved():
    # :91-100
    r = rep('{"note": "More items...", "count": 5}')
    assert r == {"note": "More items...", "count": 5}


def test_dots_after_complete_json():
    # :102-111
    r = rep('{"complete": true}..................')
    assert r == {"complete": True}


def test_newlines_mixed_with_dots():
    # :145-150
    r = rep('{"key": "value"..\n..\n............')
    assert r["key"].startswith("value")


# hardcoded-patterns e2e (layer3_hardcoded_patterns_test.exs:255-305)
def test_thousands_with_escapes():
    r = rep('{"amount": 1,234, "text": "value", "escaped": "line\\n"}')
    assert r == {"amount": 1234, "text": "value", "escaped": "line\n"}


def test_combined_smart_quotes_thousands():
    r = rep('{“name”: “José”, “balance”: 1,234.56}')
    assert r == {"name": "José", "balance": 1234.56}
