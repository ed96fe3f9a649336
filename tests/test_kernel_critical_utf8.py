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
