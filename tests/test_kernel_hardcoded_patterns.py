"""Hardcoded-pattern suite, ported from
/root/reference/test/unit/layer3_hardcoded_patterns_test.exs (326
lines): smart-quote normalization, literal escape-sequence
normalization (default-off flag), thousands-separator number formats,
doubled-quote pass-through, combined passes, edge cases.

Unit-level cases drive the prepass functions directly (our analogue of
the reference's ``HardcodedPatterns`` module); number-format cases
drive the full kernel because our architecture fuses the
thousands-comma lookahead into the number tokenizer
(binary_processors.ex:274-290) rather than a standalone regex pass.
"""

import pytest

from json_remedy_spark.kernel import repair
from json_remedy_spark.kernel.prepass import (
    normalize_escape_sequences,
    normalize_smart_quotes,
)


def rep(s):
    r = repair(s)
    assert r.ok, f"repair failed: {r.error} for {s!r}"
    return r.value


def smart(s):
    return normalize_smart_quotes(s, [])


# ------------------------------------------------ smart quotes (:24-70)
SMART = [
    ('{“key”: “value”}', '{"key": "value"}'),
    ('{“outer”: {“inner”: “value”}}', '{"outer": {"inner": "value"}}'),
    ('[“item1”, “item2”]', '["item1", "item2"]'),
    ("«value»", '"value"'),
    ("‹value›", '"value"'),
    ('{"key": "value"}', '{"key": "value"}'),  # standard quotes preserved
    ("", ""),
    ('{“café”: “résumé”}', '{"café": "résumé"}'),
]


@pytest.mark.parametrize("inp,exp", SMART)
def test_normalize_smart_quotes(inp, exp):
    assert smart(inp) == exp


# --------------------------------------- escape sequences (:76-137)
# default-off flag in the pipeline; unit function tested directly
ESCAPES = [
    ('{"text": "hello\\tworld"}', '{"text": "hello\tworld"}'),
    ('{"text": "line1\\nline2"}', '{"text": "line1\nline2"}'),
    ('{"text": "text\\rmore"}', '{"text": "text\rmore"}'),
    ('{"text": "back\\bspace"}', '{"text": "back\bspace"}'),
    ('{"text": "form\\ffeed"}', '{"text": "form\ffeed"}'),
    ('{"emoji": "\\u263a"}', '{"emoji": "☺"}'),
    ('{"hex": "\\x41"}', '{"hex": "A"}'),
    ('{"text": "tab\\there\\nnewline"}', '{"text": "tab\there\nnewline"}'),
    ('{"text": "already\\nescaped"}', '{"text": "already\nescaped"}'),
    ("", ""),
]


@pytest.mark.parametrize("inp,exp", ESCAPES)
def test_normalize_escape_sequences(inp, exp):
    assert normalize_escape_sequences(inp) == exp


def test_escape_sequences_in_key_position_stay_text():
    # :130-136 — asserts only that the result is a string
    out = normalize_escape_sequences('{"key\\n": "value"}')
    assert isinstance(out, str)


# --------------------------------- number formats via the kernel (:143-192)
NUMBER_FORMATS = [
    ('{"amount": 1,234,567}', {"amount": 1234567}),
    ('{"price": "10/20"}', {"price": "10/20"}),  # strings untouched
    ('{"value": 123.45}', {"value": 123.45}),
    ('{"sci": 1.23e10}', {"sci": 1.23e10}),
    ('{"neg": -1,234}', {"neg": -1234}),
    ('{"normal": 12345}', {"normal": 12345}),
    ('{"a": 1,234, "b": 5,678}', {"a": 1234, "b": 5678}),
    ('{"text": "1,234 items"}', {"text": "1,234 items"}),
]


@pytest.mark.parametrize("inp,exp", NUMBER_FORMATS)
def test_number_formats(inp, exp):
    assert rep(inp) == exp


# -------------------------- doubled quotes: documented no-op (:198-247)
def test_doubled_quotes_empty_string_passthrough():
    # `""` is a legitimate empty string, never rewritten
    assert rep('{"key": ""}') == {"key": ""}


def test_doubled_quotes_escaped_quotes_preserved():
    assert rep('{"text": "He said \\"hello\\""}') == {"text": 'He said "hello"'}


# -------------------------------------- combined passes (:253-292)
def test_combined_smart_quotes_then_escapes():
    out = normalize_escape_sequences(smart('{“text”: “hello\\nworld”}'))
    assert out == '{"text": "hello\nworld"}'


def test_combined_all_pattern_types_end_to_end():
    # thousands separator + smart quotes + (escapes stay literal by
    # default — the flag is off, matching the reference default)
    v = rep('{"amount": 1,234, “text”: “value”}')
    assert v == {"amount": 1234, "text": "value"}
    v2 = rep(
        '{"name": "John", "balance": 1,234.56, "message": "Hello\\nWorld"}'
    )
    assert v2["name"] == "John" and v2["balance"] == 1234.56
    assert v2["message"] == "Hello\nWorld"  # valid JSON escape decodes


def test_combined_with_escape_flag_on():
    r = repair('{"message": "Hello\\qWorld"}', normalize_escapes=True)
    assert r.ok  # unknown escape survives the flag without crashing


# ------------------------------------------- edge cases (:298-325)
def test_long_string_efficient():
    long_string = "a" * 10_000
    out = smart('{"key": "%s"}' % long_string)
    assert len(out) > 10_000


def test_deeply_nested_identity():
    nested = '{"a": {"b": {"c": {"d": "value"}}}}'
    assert smart(nested) == nested


def test_malformed_input_no_crash():
    out = smart('{"key": "value')
    assert isinstance(out, str)


def test_null_bytes_no_crash():
    out = smart("test\0null")
    assert isinstance(out, str)
    r = repair("test\0null")
    assert r.ok  # plain text -> dropped, never a crash


def test_examples_combined_patterns():
    """examples/hardcoded_patterns_examples.exs:263-269 — guillemets,
    thousands commas, and in-string comma preservation in ONE doc."""
    import json

    r = repair('{"name": "John Doe", "balance": 1,234.56, "message": «Welcome!»}')
    assert r.ok
    assert json.loads(r.repaired) == {
        "name": "John Doe", "balance": 1234.56, "message": "Welcome!"
    }
    r2 = repair('{"message": "We sold 1,234 units", "count": 1,234}')
    assert json.loads(r2.repaired) == {
        "message": "We sold 1,234 units", "count": 1234
    }
