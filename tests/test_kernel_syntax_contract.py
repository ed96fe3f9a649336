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
