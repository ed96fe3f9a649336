"""Behavioral ports of the reference's internal-module suites.

The reference tests its context-stack and char-utility modules
directly (test/unit/context/json_context_test.exs,
test/unit/context/context_values_test.exs,
test/unit/utils/char_utils_test.exs,
test/unit/layer3_html_handlers_metadata_test.exs,
test/unit/issue8_missing_terminators_test.exs).  Our kernel is a
single stack parser with no separate JsonContext/CharUtils modules,
so these ports assert the BEHAVIORS those modules guarantee, at the
observable repair() surface: in-string repair suppression, context
transitions, UTF-8-safe position handling, whitespace skipping, and
the issue-8 missing-terminator regressions.
"""

import json

import pytest

from json_remedy_spark.kernel import repair


# ---- json_context_test.exs: in_string? / can_apply_repair? ----------------
# "prevents repair when in string for most repair types" (:223) — every
# repair trigger (colon, booleans, trailing comma, comment markers)
# appearing INSIDE a string literal must come through untouched.

@pytest.mark.parametrize(
    "doc,expected",
    [
        ('{"key": "name: value"}', '{"key":"name: value"}'),
        ('{"k": "True story, false alarm"}', '{"k":"True story, false alarm"}'),
        ('{"k": "a,"}', '{"k":"a,"}'),
        ('{"k": "see // notes and /* block */"}', '{"k":"see // notes and /* block */"}'),
        ('{"k": "trailing }brace"}', '{"k":"trailing }brace"}'),
        ('{"k": "[not, an, array]"}', '{"k":"[not, an, array]"}'),
    ],
)
def test_repairs_suppressed_inside_strings(doc, expected):
    r = repair(doc)
    assert r.ok and r.repaired == expected


def test_string_delimiter_repair_allowed_in_string():
    # "allows string delimiter repair when in string" (:237) — closing
    # an unterminated string is the ONE in-string repair permitted
    r = repair('{"k": "abc')
    assert r.ok and r.repaired == '{"k":"abc"}'


def test_single_quote_delimiter_context():
    # enter_string/2 "handles single quote delimiter" (:89)
    r = repair("{'key': 'value'}")
    assert r.ok and r.repaired == '{"key":"value"}'


# ---- json_context_test.exs: push/pop/transition ---------------------------

def test_nested_context_transitions_roundtrip():
    # object_key -> object_value -> object_key transitions (:145,:160)
    # and push/pop for object-in-array-in-object
    r = repair('{"a": [1, {"b": 2}, [3]]')
    assert r.ok and r.repaired == '{"a":[1,{"b":2},[3]]}'


def test_context_stack_depth_tracked_through_deep_nesting():
    # context_stack_depth/1 (:196-203): 10-deep alternating nesting,
    # all closers missing -> LIFO close restores every level
    doc = '[' + '{"x": [' * 10
    r = repair(doc)
    assert r.ok
    expected = '[' + '{"x":[' * 10 + ']}' * 10 + ']'
    assert r.repaired == expected
    assert json.loads(r.repaired) is not None


def test_numeric_key_transition_quoted():
    # context transition from "{" expects a key; a numeric token there
    # is re-typed to a quoted key (context_values next_expected_context)
    r = repair('{1: 2}')
    assert r.ok and r.repaired == '{"1":2}'


def test_valid_transitions_preserve_all_value_types():
    # can_transition_to? happy paths: every scalar/value context in one doc
    doc = '{"a": "b", "c": [true, false, null], "d": {"e": 1.5}}'
    r = repair(doc)
    assert r.ok
    assert json.loads(r.repaired) == {
        "a": "b", "c": [True, False, None], "d": {"e": 1.5}
    }


# ---- char_utils_test.exs: UTF-8-safe positions + whitespace ---------------

def test_whitespace_skipping_matrix():
    # skip_whitespaces_at/3 (:79-130): tabs, newlines, CRs between all
    # tokens parse identically to the single-space form
    messy = '{\t"a"\n:\r 1\t,\n"b" :\t2\r}'
    clean = '{"a": 1, "b": 2}'
    assert repair(messy).repaired == repair(clean).repaired == '{"a":1,"b":2}'


def test_utf8_characters_position_safe():
    # get_char_at "handles UTF-8 characters correctly" (:23) — multi-byte
    # chars in keys and values; the trailing comma after the emoji must
    # be repaired without splitting any character
    r = repair('{"héllo": "wörld", "emoji": "🚀",}')
    assert r.ok and r.repaired == '{"héllo":"wörld","emoji":"🚀"}'
    assert json.loads(r.repaired)["emoji"] == "🚀"


def test_empty_and_oob_inputs_graceful():
    # "handles empty string" (:18) / nil-input guards (:34,:73,:127)
    assert repair("").ok
    assert repair("   \t\n  ").ok


# ---- layer3_html_handlers_metadata_test.exs -------------------------------

def test_html_extraction_multibyte_fragment():
    # "returns grapheme and byte counts for multi-byte HTML fragments"
    # (:7) — the behavioral core: extraction must be exact when the
    # payload's byte length differs from its grapheme length
    payload = '{"k": "héllo🚀"}'
    assert len(payload.encode()) != len(payload)  # the suite's premise
    r = repair(f"<pre>{payload}</pre>")
    assert r.ok and r.repaired == '{"k":"héllo🚀"}'
    # either the html-wrapper handler or the balanced-span fast path
    # may claim the extraction; both are "extracted" actions
    assert any("extracted" in a["action"] for a in r.repairs)


def test_html_extraction_nonzero_start_position():
    # "respects non-zero starting positions" (:18) — multi-byte prose
    # BEFORE the wrapper must not shift the extraction window
    r = repair('héllo wörld says: <code>{"a": "✓", "b": 2}</code> thanks')
    assert r.ok and r.repaired == '{"a":"✓","b":2}'


# ---- issue8_missing_terminators_test.exs (all 4 regressions x LF/CRLF) ----

_ISSUE8 = [
    (
        '{\n    "foo": [\n        {\n            "bar": {\n                '
        '"baz":  {\n        }},\n        {\n            "foo": {\n          '
        '      "bar":  1\n            }\n        }\n    ]\n}\n',
        {"foo": [{"bar": {"baz": {}}}, {"foo": {"bar": 1}}]},
    ),
    (
        '{\n    "foo": [\n        {\n            "bar": {\n                '
        '"baz":  {\n        },\n        {\n            "foo": {\n           '
        '     "bar":  1\n            }\n        }\n    ]\n}\n',
        {"foo": [{"bar": {"baz": {}}}, {"foo": {"bar": 1}}]},
    ),
    (
        '{\n    "foo": [\n        {\n            "bar": {\n                '
        '"baz":  [\n        },\n        {\n            "foo": {\n           '
        '     "bar":  1\n            }\n        }\n    ]\n}\n',
        {"foo": [{"bar": {"baz": []}}, {"foo": {"bar": 1}}]},
    ),
    (
        '{\n    "foo": [\n        {\n            "bar": {\n                '
        '"baz":  [\n        }\n    ]\n}\n',
        {"foo": [{"bar": {"baz": []}}]},
    ),
]


@pytest.mark.parametrize("newline", ["\n", "\r\n"])
@pytest.mark.parametrize("case_no", range(len(_ISSUE8)))
def test_issue8_missing_terminators(case_no, newline):
    doc, expected = _ISSUE8[case_no]
    r = repair(doc.replace("\n", newline))
    assert r.ok
    assert json.loads(r.repaired) == expected


def test_trailing_prose_with_citation_brackets_dropped():
    """Review r3 regression: bracketed citations / brace mentions in
    trailing prose must NOT be fabricated into JSON values; a real
    object after prose (colon inside the opener's tail) survives."""
    assert repair('{"a": 1} Thanks, see [1] for details.').repaired == '{"a":1}'
    assert repair('{"a": 1} Use {curly} syntax.').repaired == '{"a":1}'
    r = repair('{"a": 1} log follows {"level": "INFO"}')
    assert json.loads(r.repaired) == [{"a": 1}, {"level": "INFO"}]
