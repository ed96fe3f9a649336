"""Reference option parity on ``repair()`` (VERDICT r2 #6).

The four per-call toggles mirror lib/json_remedy.ex:90 (fast path),
:355 (:enable_multiple_json_aggregation), :389
(:enable_object_merging), :398 (:enable_early_hardcoded_patterns) —
all default ON, matching the reference's app-env defaults.  Each case
exercises the flag off AND re-asserts the default-on behavior so a
regression in either direction fails.
"""

from json_remedy_spark.kernel import repair


# --------------------------------------------------------- fast path

def test_fast_path_off_still_parses_valid_json():
    """layer4/validation_test.exs:494-503: both settings must accept
    valid JSON; off routes through the full pipeline."""
    s = '{"test": "value"}'
    on = repair(s)
    off = repair(s, fast_path_optimization=False)
    assert on.ok and off.ok
    assert on.repaired == off.repaired == '{"test":"value"}'
    assert on.fast_path is True
    assert off.fast_path is False  # pipeline route, same result


def test_fast_path_off_wrapped_json():
    """The span fast path is also gated: wrapped-but-valid JSON must
    produce the identical value through the tolerant pipeline."""
    s = 'Here is the data: {"a": [1, 2, 3]} hope it helps'
    on = repair(s)
    off = repair(s, fast_path_optimization=False)
    assert on.repaired == off.repaired == '{"a":[1,2,3]}'
    assert not off.fast_path


def test_fast_path_off_malformed_unchanged():
    """Malformed input never took the fast path — flag is a no-op."""
    s = "{'a': True,}"
    assert repair(s, fast_path_optimization=False).repaired == repair(s).repaired == '{"a":true}'


# --------------------------------------------------- object merging

def test_object_merging_flag():
    """object_merger.ex:19-48 boundary merge: `{"a":1}, "b":2}` merges
    by default; with the flag off the merge never happens and only the
    first object parses."""
    s = '{"a": 1}, "b": 2}'
    on = repair(s)
    assert on.repaired == '{"a":1,"b":2}'
    off = repair(s, enable_object_merging=False)
    assert off.ok
    assert off.repaired == '{"a":1}'


def test_object_merging_off_keeps_empty_trailer():
    """The `, []` empty-trailer drop is part of the merger — off, the
    trailing empty array survives as a second value (aggregation)."""
    s = '{"a": 1}, []'
    assert repair(s).repaired == '{"a":1}'
    off = repair(s, enable_object_merging=False)
    assert off.repaired == '[{"a":1},[]]'


# ------------------------------------------- multiple JSON aggregation

def test_multiple_json_aggregation_flag():
    """multiple_json_detector.ex:28-75: concatenated values aggregate
    by default; off parses the first value only (single-value
    pipeline, json_remedy.ex:355-376)."""
    s = '{"a": 1} [2, 3]'
    on = repair(s)
    assert on.repaired == '[{"a":1},[2,3]]'
    off = repair(s, enable_multiple_json_aggregation=False)
    assert off.ok
    assert off.repaired == '{"a":1}'


def test_multiple_json_aggregation_off_single_value_unchanged():
    s = "{'only': 1}"
    assert repair(s, enable_multiple_json_aggregation=False).repaired == '{"only":1}'


def test_multiple_json_structural_replace_needs_flag():
    """Structurally identical consecutive values replace the previous
    one under aggregation; off keeps just the first."""
    s = '{"a": 1} {"a": 2}'
    assert repair(s).repaired == '{"a":2}'
    assert repair(s, enable_multiple_json_aggregation=False).repaired == '{"a":1}'


# ---------------------------------------------- early hardcoded patterns

def test_early_hardcoded_patterns_flag_smart_quotes():
    """hardcoded_patterns.ex smart-quote normalization is part of the
    early block, but layer-3 quote handling inside the parser still
    repairs smart-quoted keys — reference parity: the flag moves WHERE
    the repair happens, not whether basic quote repair exists."""
    s = "{“name”: “Alice”}"
    on = repair(s)
    off = repair(s, enable_early_hardcoded_patterns=False)
    assert on.repaired == off.repaired == '{"name":"Alice"}'


def test_early_hardcoded_patterns_flag_fence_in_string():
    """Fence-in-string extraction (Preprocessing.
    extract_code_fence_json_in_string_values) runs only in the early
    block: off, the fenced payload survives the prepass as a string
    value and the post-parse unwrap walk handles it instead — same
    final value, different repair route (action lineage proves which
    stage fired)."""
    s = '{"data": "```json {x: 1}```",}'  # trailing comma defeats the fast path
    on = repair(s)
    off = repair(s, enable_early_hardcoded_patterns=False)
    assert on.repaired == off.repaired == '{"data":{"x":1}}'
    on_actions = [a["action"] for a in on.repairs]
    off_actions = [a["action"] for a in off.repairs]
    assert "extracted fenced JSON from string value" in on_actions
    assert "extracted fenced JSON from string value" not in off_actions
    assert "unwrapped fenced JSON string" in off_actions


def test_early_hardcoded_patterns_default_unchanged():
    s = '{"a": "x", "b": 1'
    assert repair(s).repaired == repair(s, enable_early_hardcoded_patterns=True).repaired
