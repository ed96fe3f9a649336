"""Port of /root/reference/test/missing_patterns/doubled_quotes_test.exs.

The reference DEFERS this entire pattern class: every case is tagged
``:layer5_target`` ("DEFERRED TO LAYER 5", doubled_quotes_test.exs:11-16)
and excluded from its CI.  We implement the deferred spec behind the
DEFAULT-OFF ``fix_doubled_quotes`` flag (kernel/pipeline.py), so the
at-parity default is byte-identical to today's behavior while the
flag-on path passes the suite the reference only aspires to.
"""

import json

import pytest

from json_remedy_spark.kernel import repair


def fixed(s):
    r = repair(s, fix_doubled_quotes=True)
    assert r.ok, f"{r.error} for {s!r}"
    return r.value


# ---- doubled quotes at string boundaries (:27-107) -----------------------

@pytest.mark.parametrize(
    "src,expected",
    [
        ('{"key": ""value""}', {"key": "value"}),
        ('{"key1": ""value1"", "key2": ""value2""}',
         {"key1": "value1", "key2": "value2"}),
        ('[""value1"", ""value2"", ""value3""]', ["value1", "value2", "value3"]),
        ('{"outer": {"inner": ""value""}}', {"outer": {"inner": "value"}}),
        ('{"key": """"}', {"key": ""}),
        ('{"key": ""value"}', {"key": "value"}),     # asymmetric start
        ('{"key": "value""}', {"key": "value"}),     # asymmetric end
        ('{"key": """value"""}', {"key": "value"}),  # tripled
        ("{'key': ''value''}", {"key": "value"}),    # single-quote doubling
    ],
)
def test_doubled_quote_boundaries(src, expected):
    assert fixed(src) == expected


def test_escaped_quotes_unaffected():
    # :92-99
    assert fixed('{"key": "value with \\"escaped\\" quotes"}') == {
        "key": 'value with "escaped" quotes'}


# ---- edge cases: doubled quotes that must NOT be removed (:111-137) ------

def test_legitimate_empty_string_stays():
    assert fixed('{"key": "", "key2": "value"}') == {"key": "", "key2": "value"}
    # empty string must not log a doubled-quote repair
    r = repair('{"key": "", "key2": "value"}', fix_doubled_quotes=True,
               fast_path_optimization=False)
    assert not any("doubled" in a["action"] for a in r.repairs)


def test_doubled_quotes_inside_content_ambiguous_but_ok():
    # :121-128 — the suite accepts any valid repair here
    r = repair('{"message": "He said ""hello"" to me"}', fix_doubled_quotes=True)
    assert r.ok
    json.loads(r.repaired)


def test_doubled_quotes_in_object_key():
    assert fixed('{""key"": "value"}') == {"key": "value"}


# ---- combined with other malformations (:140-168) ------------------------

@pytest.mark.parametrize(
    "src,expected",
    [
        ('{"key": ""value"",}', {"key": "value"}),      # + trailing comma
        ('{"key": ""value""', {"key": "value"}),        # + missing brace
        ('{key: ""value""}', {"key": "value"}),         # + unquoted key
    ],
)
def test_doubled_quotes_with_other_malformations(src, expected):
    assert fixed(src) == expected


# ---- unicode content (:172-195) ------------------------------------------

@pytest.mark.parametrize(
    "src,expected",
    [
        ('{"key": ""café""}', {"key": "café"}),
        ('{"message": ""Hello 👋""}', {"message": "Hello 👋"}),
        ('{"key": ""line1\\nline2""}', {"key": "line1\nline2"}),
    ],
)
def test_doubled_quotes_unicode(src, expected):
    assert fixed(src) == expected


# ---- performance shape (:198-215) ----------------------------------------

def test_many_doubled_quotes():
    pairs = ", ".join(f'""key{i}"": ""value{i}""' for i in range(1, 101))
    r = repair("{%s}" % pairs, fix_doubled_quotes=True)
    assert r.ok
    v = r.value
    assert len(v) == 100 and v["key1"] == "value1" and v["key100"] == "value100"
    assert '""""' not in r.repaired


# ---- default-off parity canaries -----------------------------------------

def test_default_off_behavior_unchanged():
    # flag off, the embedded-quote rules apply exactly as before
    assert repair('{"key": ""value""}').repaired == '{"key":"\\"value"}'


def test_embedded_quote_invariant_holds_with_flag():
    # the pinned `v"alue` case (recent_python_cases_test.exs:97-98) is
    # byte-identical with the flag on AND off: a single embedded quote
    # is not a doubled boundary
    for kw in ({}, {"fix_doubled_quotes": True}):
        assert repair('{"key": "v"alue"}', **kw).repaired == '{"key":"v\\"alue\\""}'
