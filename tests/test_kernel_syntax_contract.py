"""Layer-3 syntax-normalization contract, ported from the remaining
sections of /root/reference/test/unit/layer3_syntax_normalization_test.exs
(:242-296 supports?/LayerBehaviour, :299-553 public API behaviors,
:555-595 complex scenarios).  Elixir-specific plumbing (rule structs,
validate_options keyword lists, get_position_info line/column) is out
of scope — we log byte offsets only (SURVEY.md §7.4); everything
behavioral is ported.
"""

import pytest
from pyspark.sql import functions as F

from json_remedy_spark.kernel import repair
from json_remedy_spark.kernel.cleaning import _quote_parity_even


def rep(s):
    r = repair(s)
    assert r.ok, f"{r.error} for {s!r}"
    return r


# ------------------------------ supports?/1 detection set (:243-266)
SUPPORTS_CASES = [
    ("{'name': 'Alice'}", True),  # single quotes
    ('{name: "Alice"}', True),  # unquoted keys
    ('{"active": True}', True),  # Python booleans
    ('{"name": "Alice",}', True),  # trailing commas
    ('{"a": 1 "b": 2}', True),  # missing commas
    ('{"clean": "json"}', False),
    ("[1, 2, 3]", False),
]


def test_needs_repair_predicate_matches_reference_supports(spark):
    from json_remedy_spark.operators.repair_udf import needs_repair_predicate

    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(SUPPORTS_CASES)], ["i", "text"])
    got = {
        r["i"]: r["p"]
        for r in df.select("i", needs_repair_predicate(F.col("text")).alias("p")).collect()
    }
    for i, (s, exp) in enumerate(SUPPORTS_CASES):
        assert got[i] == exp, f"supports? mismatch for {s!r}: got {got[i]}"


# ---------------------------------- inside_string?/2 (:407-437)
# our analogue is quote-parity (True = OUTSIDE any string literal)
INSIDE_STRING = [
    (0, True),  # at '{'
    (10, False),  # inside "value with 'quotes'"
    (30, True),  # at the space before `name`
    (40, False),  # inside "Alice"
]


@pytest.mark.parametrize("pos,outside", INSIDE_STRING)
def test_inside_string_positions(pos, outside):
    s = '{"key": "value with \'quotes\'", name: "Alice"}'
    assert _quote_parity_even(s, pos) == outside


# ------------------------------- public API behaviors (:300-553)
def test_normalize_quotes_logs_action():
    r = rep("{'name': 'Alice'}")
    assert r.value == {"name": "Alice"}
    assert any("quote" in a["action"] for a in r.repairs)


def test_normalize_booleans_logs_action():
    r = rep('{"active": True}')
    assert r.value == {"active": True}
    assert any("literal" in a["action"] for a in r.repairs)


def test_fix_commas_logs_action():
    r = rep('{"name": "Alice",}')
    assert r.value == {"name": "Alice"}
    assert any("trailing comma" in a["action"] for a in r.repairs)


def test_quotes_inside_string_content_preserved():
    # :45-53 — no repairs on valid JSON with quote-like content
    s = '{"message": "She said \'hello\' to me", "code": "Use \\"quotes\\" properly"}'
    r = rep(s)
    assert r.fast_path and r.repairs == []
    assert r.value == {"message": "She said 'hello' to me", "code": 'Use "quotes" properly'}


def test_only_unquoted_key_repaired():
    # :86-92 — mixed quoted/unquoted keys: exactly one repair
    r = rep('{"name": "Alice", age: 30, "active": true}')
    assert r.value == {"name": "Alice", "age": 30, "active": True}
    assert len(r.repairs) == 1 and r.repairs[0]["action"] == "quoted unquoted key"


QUOTE_KEYS = [
    ('{user_name_1: "Alice"}', {"user_name_1": "Alice"}),
    ('{userName: "Alice"}', {"userName": "Alice"}),
    ('{user$name: "Alice"}', {"user$name": "Alice"}),
    ('{user_id: 123}', {"user_id": 123}),
]


@pytest.mark.parametrize("inp,exp", QUOTE_KEYS)
def test_complex_key_names(inp, exp):
    # :72-84, :430-448
    assert rep(inp).value == exp


def test_normalize_literals_all_variants_with_actions():
    # :452-476
    cases = [
        ('{"active": True}', {"active": True}),
        ('{"active": False}', {"active": False}),
        ('{"value": None}', {"value": None}),
        ('{"value": NULL}', {"value": None}),
        ('{"value": Null}', {"value": None}),
        ('{"a": True, "b": None}', {"a": True, "b": None}),
    ]
    for inp, exp in cases:
        r = rep(inp)
        assert r.value == exp and len(r.repairs) > 0
    # no literals -> no repairs
    r = rep('{"active": true}')
    assert r.repairs == []


def test_fix_colons_adds_missing_colons_with_actions():
    # :479-492
    r = rep('{"name" "Alice"}')
    assert r.value == {"name": "Alice"}
    assert any("colon" in a["action"] for a in r.repairs)
    r2 = rep('{"name" "Alice", "age" 30}')
    assert r2.value == {"name": "Alice", "age": 30}


# ----------------------------------- complex scenarios (:555-595)
def test_multiple_syntax_issues_one_input():
    r = rep("{name: 'Alice', active: True, value: None,}")
    assert r.repaired == '{"name":"Alice","active":true,"value":null}'
    assert len(r.repairs) >= 4  # keys, quotes, boolean, null, trailing comma


def test_preserves_structure_while_fixing_syntax():
    doc = (
        "{\n  name: 'Alice',\n  details: {\n    age: 30,\n    active: True,\n"
        "    skills: ['coding', 'testing',]\n  },\n  metadata: None,\n}\n"
    )
    r = rep(doc)
    assert r.value == {
        "name": "Alice",
        "details": {"age": 30, "active": True, "skills": ["coding", "testing"]},
        "metadata": None,
    }
    assert ",}" not in r.repaired and ",]" not in r.repaired
    assert len(r.repairs) >= 5


# ------- state management / parameter scenarios, ported from
# /root/reference/test/critical/state_managemenet_and_parameter_layer_3_test.exs
COLON_STATE = [
    ('{"name" "Alice"}', {"name": "Alice"}),
    ('{"name" "Alice", "age" 30}', {"name": "Alice", "age": 30}),
    ('{"user" {"name" "Alice", "age" 30}}', {"user": {"name": "Alice", "age": 30}}),
]


@pytest.mark.parametrize("inp,exp", COLON_STATE)
def test_missing_colon_state(inp, exp):
    assert rep(inp).value == exp


def test_colonless_brace_coerces_to_set_with_clean_elements():
    # `{name "Alice", active True}` has NO depth-1 colon -> structure
    # coercion (pipeline order: coercion BEFORE layer 3,
    # json_remedy.ex:416) makes it an array; the bare-value scanner must
    # stop at `}` (binary_processors.ex:528-533) so the closer never
    # leaks into the last element
    r = rep('{name "Alice", active True}')
    assert r.value == ["name", "Alice", "active True"]


COMMA_STATE = [
    ('{"name": "Alice",}', {"name": "Alice"}),
    ("[1, 2, 3,]", [1, 2, 3]),
    ('{"name": "Alice" "age": 30}', {"name": "Alice", "age": 30}),
    ("[1 2 3]", [1, 2, 3]),
    ('{"a": 1 "b": 2,}', {"a": 1, "b": 2}),
    ('[{"a": 1,}, {"b": 2 "c": 3}]', [{"a": 1}, {"b": 2, "c": 3}]),
    ('{"users": [{"name": "Alice",}, {"name": "Bob" "age": 30,}]}',
     {"users": [{"name": "Alice"}, {"name": "Bob", "age": 30}]}),
]


@pytest.mark.parametrize("inp,exp", COMMA_STATE)
def test_comma_state_complexity(inp, exp):
    assert rep(inp).value == exp


def test_pathological_uniform_nesting_ladder():
    for depth in (1, 5, 10, 20, 50):
        doc = '{"level": ' * depth + '"value"' + "}" * depth
        r = rep(doc)
        assert '"value"' in r.repaired and r.repairs == []


def test_bare_key_and_top_level_strings_graceful():
    assert rep('{"name"').value == {"name": ""}  # truncated key -> empty value
    assert rep('"name" "value"').value == ["name", "value"]  # multi-doc wrap


def test_complex_state_transitions():
    # critical_issues_layer_3_tests.exs:256-285
    r = rep(
        '{\n  "level1": {\n    "level2": [\n      {"key1": \'value1\', active: True},\n'
        "      {\"key2\": 'value2', active: False, data: None,}\n    ],\n"
        "    \"other\": 'test'\n  },\n  final: NULL\n}\n"
    )
    assert r.value == {
        "level1": {
            "level2": [
                {"key1": "value1", "active": True},
                {"key2": "value2", "active": False, "data": None},
            ],
            "other": "test",
        },
        "final": None,
    }
    assert len(r.repairs) >= 6


NESTED_ESCAPES = [
    ("{'message': 'Don\\'t do this', 'other': True}",
     {"message": "Don't do this", "other": True}),
    ("{'path': 'C:\\\\Users\\\\Test', 'valid': False}",
     {"path": "C:\\Users\\Test", "valid": False}),  # \\ decodes once at parse
    ("{'unicode': '\\u0048\\u0065\\u006c\\u006c\\u006f', 'flag': TRUE}",
     {"unicode": "Hello", "flag": True}),
]


@pytest.mark.parametrize("inp,exp", NESTED_ESCAPES)
def test_nested_quotes_and_escapes(inp, exp):
    # critical_issues_layer_3_tests.exs:287-304 (term-level: valid JSON
    # escapes decode; single-quote escapes resolve to the character)
    assert rep(inp).value == exp


def test_string_content_never_confuses_state_machine():
    # state_managemenet:50-84 — JSON-like syntax inside strings is inert
    r = rep(
        "{\n"
        '  "json_example": "Use {\'key\': \'value\'} format",\n'
        '  "boolean_text": "Set active: True or False",\n'
        '  "null_example": "Value can be None or NULL",\n'
        '  "quote_mix": \'Use "double quotes" inside single\',\n'
        '  "comma_text": "Arrays use [1, 2, 3,] format",\n'
        '  "colon_text": "Object syntax is key: value",\n'
        "  actual_key: 'This should be quoted',\n"
        "  real_boolean: True,\n"
        "  real_null: None\n"
        "}"
    )
    v = r.value
    assert v["json_example"] == "Use {'key': 'value'} format"
    assert v["boolean_text"] == "Set active: True or False"
    assert v["null_example"] == "Value can be None or NULL"
    assert v["quote_mix"] == 'Use "double quotes" inside single'
    assert v["comma_text"] == "Arrays use [1, 2, 3,] format"
    assert v["colon_text"] == "Object syntax is key: value"
    assert v["actual_key"] == "This should be quoted"
    assert v["real_boolean"] is True and v["real_null"] is None
    assert len(r.repairs) >= 3


def test_rapidly_alternating_contexts():
    # state_managemenet:86-116
    r = rep(
        "[\n"
        "  {\"key1\": 'value1', flag1: True},\n"
        "  'string_in_array',\n"
        '  {"key2": False, data2: None},\n'
        "  42,\n"
        "  {\"key3\": NULL, text3: 'more'},\n"
        '  [1, 2, {"nested": TRUE}]\n'
        "]"
    )
    assert r.value == [
        {"key1": "value1", "flag1": True},
        "string_in_array",
        {"key2": False, "data2": None},
        42,
        {"key3": None, "text3": "more"},
        [1, 2, {"nested": True}],
    ]
    assert len(r.repairs) >= 8


def test_string_context_preserved_across_complex_operations():
    # state_managemenet:373-412 — code/SQL/example syntax inside strings
    # is inert; only the 3 real issues repair
    r = rep(
        "{\n"
        '  "instructions": "Use format {key: \'value\', active: True}",\n'
        '  "examples": [\n'
        '    "Example 1: name: \'Alice\', status: False",\n'
        '    "Example 2: data: None, valid: TRUE"\n'
        "  ],\n"
        '  "code_sample": "if (obj.active == True) { obj.data = None; }",\n'
        '  "sql_like": "WHERE status = \'active\' AND deleted = False",\n'
        "  actual_key: 'This should be quoted',\n"
        "  real_flag: True,\n"
        "  real_data: None\n"
        "}"
    )
    v = r.value
    assert v["instructions"] == "Use format {key: 'value', active: True}"
    assert v["examples"] == [
        "Example 1: name: 'Alice', status: False",
        "Example 2: data: None, valid: TRUE",
    ]
    assert v["code_sample"] == "if (obj.active == True) { obj.data = None; }"
    assert v["sql_like"] == "WHERE status = 'active' AND deleted = False"
    assert v["actual_key"] == "This should be quoted"
    assert v["real_flag"] is True and v["real_data"] is None
    assert len(r.repairs) >= 3
    actions = [a["action"] for a in r.repairs]
    assert any("quoted unquoted key" in a for a in actions)
    assert any("normalized" in a for a in actions)


def test_nested_quote_handling_preserves_escapes():
    # state_managemenet:414-452 (term-level: \" decodes to ", and the
    # escaped quotes inside the single-quoted value survive)
    r = rep(
        "{\n"
        '  "json_string": "{\\"nested\\": \\"value\\", \\"active\\": true}",\n'
        '  "escaped_quotes": "She said \\"Hello\\" and he said \\"Hi\\"",\n'
        '  "regex_pattern": "\\"^[a-zA-Z]+$\\" matches letters",\n'
        "  unquoted_key: 'Value with \\\"escaped\\\" quotes',\n"
        "  another_key: \"Value with 'single' quotes inside\"\n"
        "}"
    )
    v = r.value
    assert v["json_string"] == '{"nested": "value", "active": true}'
    assert v["escaped_quotes"] == 'She said "Hello" and he said "Hi"'
    assert v["regex_pattern"] == '"^[a-zA-Z]+$" matches letters'
    assert v["unquoted_key"] == 'Value with "escaped" quotes'
    assert v["another_key"] == "Value with 'single' quotes inside"
    assert len(r.repairs) >= 2
