"""Port of the two remaining critical layer-3 suites:

* /root/reference/test/critical/critical_issues_layer_3_tests.exs
  (UTF-8 safety, bounds/edge handling, state-management consistency,
  rule composition)
* /root/reference/test/critical/function_reference_layer_3_test.exs
  (processor input/expected pairs, chaining, idempotency)

The reference tests drive SyntaxNormalization sub-functions; our
kernel fuses the layer-3 passes into one parser, so every case is
asserted END-TO-END through ``repair`` — same inputs, same observable
contract (parsed values / canonical bytes), which is the only surface
a user of either library sees.  Elixir-only plumbing (rule-struct
validation, processor arity checks, :erlang memory probes) is out of
scope by design.

Internal-module suites intentionally NOT ported (they test Elixir data
structures with no behavioral surface): context/json_context_test.exs,
context/context_values_test.exs (stack push/pop mechanics — our
equivalent state lives inline in kernel/tolerant.py's parser loop and
is covered by the layer-2 contract suite), utils/char_utils_test.exs
(grapheme navigation helpers — covered behaviorally by
test_kernel_critical_utf8.py).
"""

import json

import pytest

from json_remedy_spark.kernel import repair


def ok(s):
    r = repair(s)
    assert r.ok, f"{r.error} for {s!r}"
    return r


def parsed(s):
    return json.loads(ok(s).repaired)


# ---- UTF-8 safety (critical_issues_layer_3_tests.exs:8-95) ---------------

@pytest.mark.parametrize(
    "src,expected",
    [
        # accented characters through quote normalization (:10-17)
        ("{'café': 'naïve', 'résumé': 'François'}",
         {"café": "naïve", "résumé": "François"}),
        # 4-byte emoji (:19-27)
        ("{'status': '✅ done', 'emoji': '🚀💯'}",
         {"status": "✅ done", "emoji": "🚀💯"}),
        # CJK 3-byte sequences (:29-36)
        ("{'name': '田中', 'city': '東京'}", {"name": "田中", "city": "東京"}),
        # unquoted UTF-8 identifiers as keys (:60-67)
        ('{café: "value", naïve: "test"}', {"café": "value", "naïve": "test"}),
        # literal normalization must not disturb UTF-8 keys (:69-76)
        ('{"café": True, "naïve": False}', {"café": True, "naïve": False}),
    ],
)
def test_utf8_safety_end_to_end(src, expected):
    assert parsed(src) == expected


def test_full_processing_preserves_utf8():
    # :78-95 — every repair class at once on a UTF-8 document
    r = ok("{café: 'naïve', active: True, 東京: None,}")
    assert r.repaired == '{"café":"naïve","active":true,"東京":null}'
    assert r.repairs and len(r.repairs) >= 4


# ---- bounds / malformed-input robustness (:155-250) ----------------------

@pytest.mark.parametrize(
    "src",
    ["{", "}", "{'incomplete", "not json at all", "{'a': 'b'",
     "", "a", "a:", "a: b", "a" * 1000 + ":"],
)
def test_no_crash_on_malformed_fragments(src):
    r = repair(src)  # contract: never raises; ok flag may be False
    assert isinstance(r.ok, bool)
    assert r.repaired is None or isinstance(r.repaired, str)


@pytest.mark.parametrize(
    "src",
    ["True", "TrueFalse", "NotTrue", "True True", "True " * 100,
     "{'True': True}", '"True"'],
)
def test_literal_edge_cases_never_corrupt(src):
    r = repair(src)
    if r.ok:
        json.loads(r.repaired)  # whatever is produced must be valid JSON


def test_literal_in_key_vs_value_vs_string():
    # 'True' as key stays a string; as value becomes a boolean;
    # inside a quoted string it is inert
    assert parsed("{'True': True}") == {"True": True}
    assert parsed('{"s": "True"}') == {"s": "True"}


def test_missing_colon_nesting_ladder():
    # :201-216 — deep missing-colon nesting must terminate
    assert parsed('{"a" "b"}') == {"a": "b"}
    assert parsed('{"a": {"b" "c"}}') == {"a": {"b": "c"}}
    # multi-doc of STRUCTURALLY IDENTICAL missing-colon objects: the
    # object merger collapses them (reference pattern2_object_merging)
    r = repair('{"a" "b"}' * 3)
    assert r.ok and json.loads(r.repaired) == {"a": "b"}
    assert sum(a["action"] == "replaced structurally identical value" for a in r.repairs) == 2


def test_long_key_position_overflow():
    # :218-227
    long_key = "a" * 1000
    assert parsed("{%s: \"value\"}" % long_key) == {long_key: "value"}


# ---- state management and consistency (:253-345) -------------------------

def test_complex_state_transitions():
    src = """
    {
      "level1": {
        "level2": [
          {"key1": 'value1', active: True},
          {"key2": 'value2', active: False, data: None,}
        ],
        "other": 'test'
      },
      final: NULL
    }
    """
    v = parsed(src)
    assert v["level1"]["level2"][0] == {"key1": "value1", "active": True}
    assert v["level1"]["level2"][1] == {"key2": "value2", "active": False, "data": None}
    assert v["final"] is None


def test_nested_quotes_and_escapes():
    # :298-316 — escape sequences survive the syntax passes
    assert parsed("{'message': 'Don\\'t do this', 'other': True}") == {
        "message": "Don't do this", "other": True}
    assert parsed("{'path': 'C:\\\\Users\\\\Test', 'valid': False}") == {
        "path": "C:\\Users\\Test", "valid": False}
    assert parsed("{'json': '{\\'nested\\': \\'value\\'}', 'type': None}") == {
        "json": "{'nested': 'value'}", "type": None}
    assert parsed("{'unicode': '\\u0048\\u0065\\u006c\\u006c\\u006f', 'flag': TRUE}") == {
        "unicode": "Hello", "flag": True}


def test_large_input_100_keys():
    # :318-345 — 100 keys x 3 repairs each, plus the final literal
    big = "{" + ", ".join(
        f"key{i}: 'value{i}', active{i}: True, data{i}: None" for i in range(1, 101)
    ) + ", final: FALSE}"
    v = parsed(big)
    assert len(v) == 301
    assert v["key1"] == "value1" and v["active100"] is True
    assert v["data50"] is None and v["final"] is False


def test_pathological_literal_flood():
    # :347-369 — 1000 bare literals before a malformed object; must
    # terminate fast and keep the trailing object's repairs
    src = "True " * 1000 + "{active: False}"
    r = ok(src)
    v = json.loads(r.repaired)
    assert v[-1] == {"active": False}
    assert v[:3] == [True, True, True] and len(v) == 1001


# ---- processor pairs + composition (function_reference_...exs) -----------

@pytest.mark.parametrize(
    "src,expected",
    [
        # normalize_quotes pairs (:57-75)
        ("{'name': 'Alice'}", {"name": "Alice"}),
        ('{"already_double": "quotes"}', {"already_double": "quotes"}),
        ("{'mixed': \"quotes\"}", {"mixed": "quotes"}),
        # normalize_literals pairs (:83-101)
        ('{"active": True}', {"active": True}),
        ('{"active": False}', {"active": False}),
        ('{"value": None}', {"value": None}),
        ('{"value": NULL}', {"value": None}),
        ('{"already": True}', {"already": True}),
        # fix_trailing_commas pairs (:111-127)
        ('{"name": "Alice",}', {"name": "Alice"}),
        ("[1, 2, 3,]", [1, 2, 3]),
        ('{"clean": "json"}', {"clean": "json"}),
    ],
)
def test_processor_pairs_end_to_end(src, expected):
    assert parsed(src) == expected


def test_rule_composition_golden():
    # function_reference :176-199 / critical_issues :430-447 — all four
    # default rules on one document, byte-exact canonical output
    r = ok("{name: 'Alice', active: True, value: None,}")
    assert r.repaired == '{"name":"Alice","active":true,"value":null}'
    assert r.repairs and len(r.repairs) >= 4


@pytest.mark.parametrize(
    "src",
    [
        "{name: 'Alice', active: True, value: None,}",
        "{'café': 'naïve'}",
        '{"a" "b"}',
        "[1 2 3]",
        '{"body":<span data-info="café">Text</span>,"status":200}',
    ],
)
def test_repair_is_idempotent(src):
    # function_reference :237-256 — a second pass over repaired output
    # must be a fast-path no-op with identical bytes
    first = ok(src)
    second = repair(first.repaired)
    assert second.ok and second.repaired == first.repaired
    assert not second.repairs


# ---- HTML handler metadata (layer3_html_handlers_metadata_test.exs) ------

def test_html_fragment_value_multibyte_preserved():
    # the behavioral core of extract_html_content/2: an unquoted HTML
    # fragment value is string-quoted with its multi-byte content
    # byte-identical, and parsing resumes at the following key
    v = parsed('{"body":<span data-info="café">Text</span>,"status":200}')
    assert v == {"body": '<span data-info="café">Text</span>', "status": 200}


def test_html_fragment_with_emoji():
    v = parsed('{"x": <div>café 🚀</div>, "next": 1}')
    assert v["x"] == "<div>café 🚀</div>" and v["next"] == 1
