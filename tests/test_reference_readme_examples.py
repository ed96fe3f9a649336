"""The reference README's own usage examples (README.md:178-257) and
the basic_usage example script (examples/basic_usage.exs) — the first
things a migrating user runs.  Parsed results are pinned to the
values the reference documents; serialization is our canonical form.
"""

import json

from json_remedy_spark.kernel import repair


def _parsed(doc: str):
    r = repair(doc)
    assert r.ok, r.error
    return json.loads(r.repaired)


# ---- README "Basic Usage" (:178-194) --------------------------------------

def test_readme_basic_repair():
    doc = '{name: "Alice", age: 30, active: True}'
    assert _parsed(doc) == {"name": "Alice", "age": 30, "active": True}


def test_readme_repair_to_string_canonical():
    r = repair('{name: "Alice", age: 30, active: True}')
    assert r.repaired == '{"name":"Alice","age":30,"active":true}'


def test_readme_repair_logging_layers():
    # README shows syntax_normalization actions for this doc; our
    # action names differ, but repairs must be reported and include
    # the unquoted-key and boolean normalizations
    r = repair('{name: "Alice", age: 30, active: True}')
    acts = " ".join(a["action"] for a in r.repairs)
    assert r.repairs and "key" in acts and ("True" in acts or "boolean" in acts)


# ---- README "Real-World Examples" (:198-257) ------------------------------

def test_readme_llm_output_block():
    doc = (
        "Here's the user data you requested:\n\n"
        "```json\n{\n  // User information\n  users: [\n    {\n"
        "      name: 'Alice Johnson',\n      email: \"alice@example.com\",\n"
        "      age: 30,\n      active: True,\n"
        "      scores: [95, 87, 92,],  // Test scores\n"
        "      profile: {\n        city: \"New York\",\n"
        "        interests: [\"coding\", \"music\", \"travel\",]\n      },\n"
        "    },\n    {\n      name: 'Bob Smith',\n"
        "      email: \"bob@example.com\", \n      age: 25,\n"
        "      active: False\n      // Missing comma above\n    }\n  ],\n"
        "  metadata: {\n    total: 2,\n    updated: \"2024-01-15\"\n"
        "    // Missing closing brace\n```\n\n"
        "That should give you what you need!\n"
    )
    got = _parsed(doc)
    assert got == {
        "users": [
            {
                "name": "Alice Johnson",
                "email": "alice@example.com",
                "age": 30,
                "active": True,
                "scores": [95, 87, 92],
                "profile": {
                    "city": "New York",
                    "interests": ["coding", "music", "travel"],
                },
            },
            {
                "name": "Bob Smith",
                "email": "bob@example.com",
                "age": 25,
                "active": False,
            },
        ],
        "metadata": {"total": 2, "updated": "2024-01-15"},
    }


def test_readme_python_style():
    doc = "{'users': [{'name': 'Alice', 'active': True, 'metadata': None}]}"
    assert _parsed(doc) == {
        "users": [{"name": "Alice", "active": True, "metadata": None}]
    }


def test_readme_js_object_function_removed():
    # README.md:247-249: "(function removed)" — the getValue PAIR drops
    doc = '{name: "Alice", getValue: function() { return 42; }, data: [1,2,3]}'
    assert _parsed(doc) == {"name": "Alice", "data": [1, 2, 3]}


def test_function_literal_edge_cases():
    # named function with braces in a body string; truncated body;
    # array-element position; 'function' INSIDE a string untouched
    assert _parsed('{"a": function namedFn(x) { return "}"; }, "b": 2}') == {"b": 2}
    assert _parsed('{"cb": function() { return 42;') == {}
    assert _parsed("[1, function() { return 0; }, 3]") == [1, 3]
    assert _parsed('{"f": "function() { not code }"}') == {
        "f": "function() { not code }"
    }


def test_readme_streaming_incomplete():
    doc = '{"status": "processing", "data": [1, 2, 3'
    assert _parsed(doc) == {"status": "processing", "data": [1, 2, 3]}


def test_readme_human_input():
    doc = "{name: Alice, age: 30, scores: [95 87 92], active: true,}"
    assert _parsed(doc) == {
        "name": "Alice",
        "age": 30,
        "scores": [95, 87, 92],
        "active": True,
    }


# ---- examples/basic_usage.exs (:52-188) -----------------------------------

def test_basic_usage_unquoted_keys():
    assert _parsed('{name: "Alice", age: 30, city: "New York"}') == {
        "name": "Alice", "age": 30, "city": "New York"
    }


def test_basic_usage_single_quotes():
    assert _parsed("{'username': 'bob_smith', 'active': true}") == {
        "username": "bob_smith", "active": True
    }


def test_basic_usage_trailing_commas():
    assert _parsed('{"items": [1, 2, 3,], "count": 3,}') == {
        "items": [1, 2, 3], "count": 3
    }


def test_basic_usage_python_literals():
    assert _parsed('{"active": True, "inactive": False, "empty": None}') == {
        "active": True, "inactive": False, "empty": None
    }


def test_basic_usage_truncated_nesting():
    assert _parsed('{"user": {"name": "Charlie", "profile": {"age": 25') == {
        "user": {"name": "Charlie", "profile": {"age": 25}}
    }


def test_basic_usage_combined():
    doc = "{name: 'Alice', age: 30, settings: {theme: 'dark', notifications: True,"
    assert _parsed(doc) == {
        "name": "Alice",
        "age": 30,
        "settings": {"theme": "dark", "notifications": True},
    }


# ---- repair_to_string jason_options analogue (json_remedy.ex:152-165) -----

def test_repair_to_string_doc_examples_compact():
    """The three repair_to_string doctest examples, compact default."""
    from json_remedy_spark.kernel.pipeline import repair_to_string

    assert repair_to_string('{name: "Alice"}').repaired == '{"name":"Alice"}'
    assert repair_to_string("[1, 2, 3,]").repaired == "[1,2,3]"
    assert repair_to_string('```json\n{"test": true}\n```').repaired == '{"test":true}'


def test_repair_to_string_pretty_indent():
    """indent= mirrors jason_options [pretty: true] (2-space indent,
    'key': value lines); value and repairs are unchanged, key order
    stays the pinned insertion-order delta (SURVEY 7.4)."""
    from json_remedy_spark.kernel.pipeline import repair_to_string

    r = repair_to_string('{name: "Alice", age: 30,}', indent=2)
    assert r.ok and r.value == {"name": "Alice", "age": 30}
    assert r.repaired == '{\n  "name": "Alice",\n  "age": 30\n}'
    # error results pass through untouched
    bad = repair_to_string("[" * 5001, indent=2)
    assert not bad.ok and bad.repaired is None


def test_to_canonical_indent_nested():
    from json_remedy_spark.kernel.pipeline import to_canonical

    assert to_canonical({"a": [1, {"b": None}]}, indent=2) == (
        '{\n  "a": [\n    1,\n    {\n      "b": null\n    }\n  ]\n}'
    )
    # default stays the compact invariant form
    assert to_canonical({"a": [1]}) == '{"a":[1]}'
