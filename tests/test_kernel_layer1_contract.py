"""Layer-1 content-cleaning contract, ported from
/root/reference/test/unit/layer1_content_cleaning_test.exs (380 lines).

Unit-level cases drive ``kernel.cleaning`` (string -> string, the
reference's ContentCleaning.process analogue) and assert on the repair
log; prose/trailing-wrapper cases drive the full kernel because our
pipeline extracts prose-embedded JSON at the balanced-span stage, not
inside clean() (same observable result, different factoring).  Elixir
plumbing (validate_options keyword lists, priority/name callbacks) is
out of scope.
"""

import pytest

from json_remedy_spark.kernel import cleaning, repair


def clean(s):
    log = []
    out = cleaning.clean(s, log)
    return out, log


def rep(s):
    r = repair(s)
    assert r.ok, f"{r.error} for {s!r}"
    return r


# ------------------------------------------- code fence removal (:5-70)
def test_standard_json_fence():
    out, log = clean('```json\n{"name": "Alice", "age": 30}\n```\n')
    assert out.strip() == '{"name": "Alice", "age": 30}'
    assert len(log) == 1 and "code fence" in log[0]["action"]


FENCE_VARIANTS = [
    '```json\n{"a": 1}\n```',
    '```JSON\n{"a": 1}\n```',
    '```javascript\n{"a": 1}\n```',
    '```json\n{"a": 1}``',
    '```json\n{"a": 1}\n```\n```json\n{"b": 2}\n```',
]


@pytest.mark.parametrize("inp", FENCE_VARIANTS)
def test_fence_syntax_variants(inp):
    out, log = clean(inp)
    assert '{"a": 1}' in out or '{"b": 2}' in out
    assert len(log) > 0


def test_malformed_double_backtick_fence():
    # ``json open fence: the trailing ``` is stripped, the residue
    # parses end-to-end (reference only asserts containment + repairs)
    r = rep('``json\n{"a": 1}```')
    assert r.value == {"a": 1}


def test_fence_inside_string_preserved():
    out, log = clean('{"example": "Use ```json for highlighting"}')
    assert out == '{"example": "Use ```json for highlighting"}'
    assert log == []


def test_nested_fence_like_content():
    out, _ = clean(
        '```json\n{\n  "description": "Code block: ```python\\nprint(\'hello\')\\n```",\n'
        '  "value": 42\n}\n```\n'
    )
    assert "Code block: ```python" in out
    assert '"value": 42' in out
    assert not out.startswith("```json")


# ---------------------------------------------- comment removal (:72-131)
LINE_COMMENTS = [
    '// Comment\n{"name": "Alice"}',
    '{"name": "Alice"} // Comment',
    '{"name": "Alice", // Comment\n"age": 30}',
]


@pytest.mark.parametrize("inp", LINE_COMMENTS)
def test_line_comments_removed(inp):
    out, log = clean(inp)
    assert "Alice" in out and "Comment" not in out and len(log) > 0


BLOCK_COMMENTS = [
    '/* Comment */ {"name": "Alice"}',
    '{"name": "Alice" /* Comment */}',
    '{\n  /* Multi\n     line\n     comment */\n  "name": "Alice"\n}\n',
]


@pytest.mark.parametrize("inp", BLOCK_COMMENTS)
def test_block_comments_removed(inp):
    out, log = clean(inp)
    assert "Alice" in out and "Comment" not in out and "Multi" not in out
    assert len(log) > 0


def test_comment_like_content_in_strings_preserved():
    s = '{"message": "This // is not a comment", "note": "Neither /* is this */"}'
    out, log = clean(s)
    assert out == s and log == []


def test_nested_block_comments():
    out, _ = clean('{"name": "Alice" /* outer /* inner */ still outer */}')
    assert "Alice" in out and "outer" not in out and "inner" not in out


# ------------------------------------- wrapper text extraction (:133-207)
def test_extract_json_from_prose():
    r = rep(
        "Here's the data you requested:\n\n"
        '{"name": "Alice", "age": 30}\n\n'
        "Let me know if you need anything else!\n"
    )
    assert r.value == {"name": "Alice", "age": 30}


def test_multiple_json_objects_in_text():
    # reference: "may or may not include Bob" — our parse_multiple
    # applies the same-structure REPLACE rule (multiple_json_detector.ex
    # same_structure?), so the later object wins
    r = rep('First user: {"name": "Alice"}\nSecond user: {"name": "Bob"}\n')
    assert r.value in ({"name": "Alice"}, {"name": "Bob"})


HTML_WRAPPERS = [
    '<pre>{"name": "Alice"}</pre>',
    '<code>{"name": "Alice"}</code>',
    '<json>{"name": "Alice"}</json>',
]


@pytest.mark.parametrize("inp", HTML_WRAPPERS)
def test_extract_from_html_wrappers(inp):
    out, log = clean(inp)
    assert "Alice" in out and "<" not in out and len(log) > 0


def test_trailing_wrapper_text_github_issue_1():
    r = rep(
        '[\n  {\n    "volumeID": "f3a6ffd2-0111-4235-980c-a5ceec215e93",\n'
        '    "name": "km-tst-20",\n    "cloudID": "75b10103873d4a1ba0d52b43159a2842",\n'
        '    "size": 1,\n    "storageType": "ssd",\n    "state": "creating",\n'
        '    "shareable": false,\n    "bootable": false,\n'
        '    "volumePool": "General-Flash-002"\n  }\n]\n1 Volume(s) created\n'
    )
    assert isinstance(r.value, list) and r.value[0]["volumeID"].startswith("f3a6")
    assert "Volume(s)" not in r.repaired
    assert len(r.repairs) > 0


# ---------------------------------------- encoding normalization (:209-235)
def test_utf8_content_unchanged():
    s = '{"name": "José", "city": "São Paulo"}'
    out, log = clean(s)
    assert out == s and log == []


ENCODING_CASES = [
    '{"emoji": "🚀💯✨"}',
    '{"unicode": "\\u0048\\u0065\\u006c\\u006c\\u006f"}',
    '{"accented": "café"}',
]


@pytest.mark.parametrize("inp", ENCODING_CASES)
def test_encodings_stay_valid_utf8(inp):
    r = rep(inp)
    r.repaired.encode("utf-8")  # must not raise


# ------------------------------------------- complex scenarios (:237-289)
def test_multiple_issues_one_input():
    r = rep(
        "Here's your data:\n```json\n// User data\n{\n  \"name\": \"Alice\",\n"
        '  /* age field */\n  "age": 30\n}\n```\nHope this helps!\n'
    )
    assert r.value == {"name": "Alice", "age": 30}
    assert "```" not in r.repaired and "Hope" not in r.repaired
    assert len(r.repairs) >= 2


def test_windows_newlines_across_fences_and_comments():
    r = rep(
        "Here's your data:\r\n```json\r\n// User data\r\n{\r\n  \"name\": \"Alice\",\r\n"
        '  /* age field */\r\n  "age": 30\r\n}\r\n```\r\nHope this helps!\r\n'
    )
    assert r.value == {"name": "Alice", "age": 30}
    assert "```" not in r.repaired and "Hope this helps!" not in r.repaired


def test_trailing_wrapper_with_windows_newlines():
    r = rep('[\r\n  {"id": 1}\r\n]\r\n1 Volume(s) created\r\n')
    assert r.value == [{"id": 1}]
    assert "1 Volume(s) created" not in r.repaired


# ------------------------------------ supports?/1 detection set (:293-317)
SUPPORTS = [
    ('```json\n{"test": true}\n```', True),
    ('```\n{"test": true}\n```', True),
    ('// Comment\n{"test": true}', True),
    ('{"test": true} /* comment */', True),
    ('<pre>{"test": true}</pre>', True),
    ('<code>{"test": true}</code>', True),
    ("This is prose text. " * 10 + '{"test": true}', True),
    ('{"clean": "json"}', False),
    ("[1, 2, 3]", False),
]


@pytest.mark.parametrize("inp,exp", SUPPORTS)
def test_layer1_supports(inp, exp):
    assert cleaning.supports(inp) == exp


# ------------------------------------------ public API functions (:350-379)
def test_strip_comments_direct():
    log = []
    out = cleaning.remove_comments('// Test comment\n{"name": "Alice"}', log)
    assert "Alice" in out and "Test comment" not in out
    assert len(log) > 0 and "comment" in log[0]["action"]


def test_extract_json_content_direct():
    log = []
    out = cleaning.extract_from_html('<pre>{"name": "Alice"}</pre>', log)
    assert "Alice" in out and "<pre>" not in out
    assert len(log) > 0 and "html wrapper" in log[0]["action"]


def test_normalize_encoding_direct():
    log = []
    out = cleaning.normalize_encoding('{"name": "Alice"}', log)
    assert out == '{"name": "Alice"}' and log == []


def test_fenced_string_unwrap_via_escaped_backticks():
    """VERDICT r4 #4c regression: the unwrap gate must keep the walk
    when backticks reach the DECODED value only through \\u0060
    escapes (the reference's code_fence_extractor inspects the decoded
    value, not the source bytes).  Trailing comma forces the repair
    path — the whole-input fast path returns valid JSON untouched by
    design (lib/json_remedy.ex:118-127)."""
    from json_remedy_spark.kernel import repair

    src = '{"a": "\\u0060\\u0060\\u0060json\\n{\\"b\\": 1}\\n\\u0060\\u0060\\u0060",}'
    assert "`" not in src
    r = repair(src)
    assert r.ok and r.value == {"a": {"b": 1}}
    assert any(a["action"] == "unwrapped fenced JSON string" for a in r.repairs)


def test_fenced_string_valid_json_fast_path_untouched():
    """Reference parity: a fully VALID doc takes the whole-input fast
    path and its fenced string values stay literal strings."""
    from json_remedy_spark.kernel import repair

    src = '{"a": "```json\\n{\\"b\\": 1}\\n```"}'
    r = repair(src)
    assert r.ok and r.value == {"a": '```json\n{"b": 1}\n```'}
