"""Critical UTF-8 / byte-position suites, ported from the reference.

Sources (behavioral spec only):
  /root/reference/test/critical/byte_size_vs_string_length_layer_3_test.exs
  /root/reference/test/critical/critical_issues_test.exs

The reference's critical suite exists because its Elixir implementation
mixed byte_size and String.length; Python strings are code-point
indexed so the failure mode cannot occur structurally — these ports
pin the OBSERVABLE contract: UTF-8 in keys, values, and unquoted
identifiers survives every repair rule byte-for-byte.
"""

import pytest

from json_remedy_spark.kernel import repair


def rep(s):
    r = repair(s)
    assert r.ok, f"repair failed: {r.error} for {s!r}"
    return r


UTF8_REPAIRS = [
    # quote normalization preserves multi-byte content
    ("{'café': 'naïve résumé'}", '{"café":"naïve résumé"}'),
    # unquoted UTF-8 identifiers become quoted keys
    ('{café: "value", résumé: "data", 東京: "tokyo"}',
     '{"café":"value","résumé":"data","東京":"tokyo"}'),
    # emoji inside single-quoted value
    ("{café: 'naïve résumé with 🚀'}", '{"café":"naïve résumé with 🚀"}'),
    # literal normalization with UTF-8/emoji keys
    ('{"café": True, "naïve": False, "東京": None, "🚀": NULL}',
     '{"café":true,"naïve":false,"東京":null,"🚀":null}'),
    # emoji-PREFIXED unquoted key keeps the emoji (reference
    # byte_size_vs_string_length test: `🚀status`)
    ("{🚀status: None}", '{"🚀status":null}'),
    ("{data🎯: NULL}", '{"data🎯":null}'),
    ("{🚀: rocket}", '{"🚀":"rocket"}'),
]


@pytest.mark.parametrize("inp,exp", UTF8_REPAIRS)
def test_utf8_repairs_exact(inp, exp):
    assert rep(inp).repaired == exp


def test_full_mixed_utf8_scenario():
    inp = (
        "{\n  café: 'naïve value',\n  résumé: True,\n  東京: False,\n"
        "  🚀status: None,\n  data🎯: NULL,\n  'mixed': \"quotes\",\n"
        "  final: TRUE,\n}"
    )
    r = rep(inp)
    assert r.value == {
        "café": "naïve value", "résumé": True, "東京": False,
        "🚀status": None, "data🎯": None, "mixed": "quotes", "final": True,
    }
    assert len(r.repairs) >= 6


def test_string_boundary_detection_with_utf8():
    inp = (
        '{\n'
        '  "café_description": "A café is a place where people drink café au lait",\n'
        '  "emoji_status": "🚀 Ready for launch 💯",\n'
        '  "mixed_content": "English, français, 日本語, and 🌍",\n'
        "  unquoted_café: 'This contains café and naïve words',\n"
        '  "escape_test": "Quote: \\"café\\" and emoji: \\"🚀\\""\n'
        "}"
    )
    r = rep(inp)
    v = r.value
    assert v["café_description"].endswith("café au lait")
    assert v["emoji_status"] == "🚀 Ready for launch 💯"
    assert v["mixed_content"] == "English, français, 日本語, and 🌍"
    assert v["unquoted_café"] == "This contains café and naïve words"
    assert v["escape_test"] == 'Quote: "café" and emoji: "🚀"'


def test_very_long_utf8_string_value():
    long_val = "café naïve résumé 東京 🚀 " * 200
    r = rep('{"long_content": "%s", status: True}' % long_val)
    assert r.value["long_content"] == long_val
    assert r.value["status"] is True


def test_utf8_stress_many_pairs():
    # performance/robustness shape from the reference stress test: 100
    # repeated UTF-8 pairs with unquoted keys and Python literals
    inp = "{" + "".join(
        f"café{i}: 'naïve', 東京{i}: True, " for i in range(100)
    ) + "🚀final: False}"
    r = rep(inp)
    assert len(r.value) == 201
    assert r.value["🚀final"] is False
    assert r.value["café7"] == "naïve" and r.value["東京42"] is True


def test_positions_are_codepoint_indexed():
    # action positions must be code-point offsets (usable with
    # Python/Spark string APIs), not byte offsets
    inp = "{'café': 'naïve', bad: True}"
    r = rep(inp)
    for a in r.repairs:
        assert 0 <= a["position"] <= len(inp)


# --------------------------------------------- state-machine stress
# /root/reference/test/critical/state_managemenet_and_parameter_layer_3_test.exs


def test_deeply_nested_state_transitions():
    inp = """{
  "level1": {
    "array": [
      {'nested_obj': True, items: [1, 2, 3,]},
      {another: 'string', flag: False},
      'simple_string_in_array'
    ],
    "more_data": None
  },
  final_key: NULL
}"""
    r = rep(inp)
    assert r.value == {
        "level1": {
            "array": [
                {"nested_obj": True, "items": [1, 2, 3]},
                {"another": "string", "flag": False},
                "simple_string_in_array",
            ],
            "more_data": None,
        },
        "final_key": None,
    }
    assert len(r.repairs) >= 6


def test_state_machine_not_confused_by_string_content():
    inp = """{
  "json_example": "Use {'key': 'value'} format",
  "boolean_text": "Set active: True or False",
  "null_example": "Value can be None or NULL",
  "quote_mix": 'Use "double quotes" inside single',
  "comma_text": "Arrays use [1, 2, 3,] format",
  "colon_text": "Object syntax is key: value",
  actual_key: 'This should be quoted',
  real_boolean: True,
  real_null: None
}"""
    r = rep(inp)
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


def test_alternating_contexts():
    inp = """[
  {"key1": 'value1', flag1: True},
  'string_in_array',
  {"key2": False, data2: None},
  42,
  {"key3": NULL, text3: 'more'},
  [1, 2, {"nested": TRUE}]
]"""
    r = rep(inp)
    assert r.value == [
        {"key1": "value1", "flag1": True},
        "string_in_array",
        {"key2": False, "data2": None},
        42,
        {"key3": None, "text3": "more"},
        [1, 2, {"nested": True}],
    ]
    assert len(r.repairs) >= 8


def test_repair_is_idempotent_on_its_own_output():
    # "multiple passes without state corruption": repairing the
    # canonical output must be a fast-path no-op
    inp = "{name: 'Alice', active: True, data: None, items: [1, 2, 3,]}"
    first = rep(inp)
    second = repair(first.repaired)
    assert second.ok and second.fast_path and second.repaired == first.repaired
