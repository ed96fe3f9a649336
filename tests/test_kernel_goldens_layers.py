"""Second golden batch, ported from the reference layer-level unit
suites (term-level comparison — canonical serialization is ours, per
SURVEY.md §7.4 pinned delta).

Sources: /root/reference/test/unit/layer2_structural_repair_test.exs,
layer3_syntax_normalization_test.exs, layer1_trailing_dots_test.exs.
"""

import pytest

from json_remedy_spark.kernel import repair


def rep(s):
    r = repair(s)
    assert r.ok, f"{r.error} for {s!r}"
    return r.value


LAYER3 = [
    # quote normalization (layer3_syntax_normalization_test.exs:14-30)
    ("{'name': 'Alice'}", {"name": "Alice"}),
    ("{'users': [{'name': 'Alice'}, {'name': 'Bob'}]}",
     {"users": [{"name": "Alice"}, {"name": "Bob"}]}),
    ("{'mixed': \"quotes\"}", {"mixed": "quotes"}),
    # booleans / null variants (:107-158)
    ('{"active": True}', {"active": True}),
    ('{"active": False}', {"active": False}),
    ('{"verified": True, "deleted": False}', {"verified": True, "deleted": False}),
    ('{"active": TRUE}', {"active": True}),
    ('{"active": FALSE}', {"active": False}),
    ('{"value": None}', {"value": None}),
    ('{"value": NULL}', {"value": None}),
    ('{"value": Null}', {"value": None}),
    # in-string literals preserved (:151-157)
    ('{"message": "The value is True", "note": "Set to None"}',
     {"message": "The value is True", "note": "Set to None"}),
    # trailing commas (:162-188)
    ('{"name": "Alice",}', {"name": "Alice"}),
    ('{"name": "Alice", "age": 30,}', {"name": "Alice", "age": 30}),
    ('{"users": [{"name": "Alice",}],}', {"users": [{"name": "Alice"}]}),
    ('["a", "b", "c",]', ["a", "b", "c"]),
    ("[[1, 2,], [3, 4,],]", [[1, 2], [3, 4]]),
    # missing commas (:190-215)
    ('{"name": "Alice" "age": 30}', {"name": "Alice", "age": 30}),
    ('{"a": 1 "b": 2 "c": 3}', {"a": 1, "b": 2, "c": 3}),
    ("[1 2 3]", [1, 2, 3]),
    ('["a" "b" "c"]', ["a", "b", "c"]),
    ('[{"name": "Alice"} {"name": "Bob"}]', [{"name": "Alice"}, {"name": "Bob"}]),
    # missing colons (:217-229)
    ('{"name" "Alice", "age" 30}', {"name": "Alice", "age": 30}),
    # in-string commas/colons preserved (:96-102, :232-238)
    ('{"message": "Item1, Item2, Item3", "code": "if (a,b,) return"}',
     {"message": "Item1, Item2, Item3", "code": "if (a,b,) return"}),
    ('{"description": "Use format key: value", "example": "name: Alice"}',
     {"description": "Use format key: value", "example": "name: Alice"}),
    # unquoted key mixed with quoted (:86-92)
    ('{"name": "Alice", age: 30, "active": true}',
     {"name": "Alice", "age": 30, "active": True}),
]


@pytest.mark.parametrize("inp,exp", LAYER3)
def test_layer3_goldens(inp, exp):
    assert rep(inp) == exp


LAYER2 = [
    # nesting depth (layer2_structural_repair_test.exs:44-52)
    ('{"level1": {"level2": {"level3": "value"',
     {"level1": {"level2": {"level3": "value"}}}),
    # complex mismatch (:96-124)
    ('{"users": [{"name": "Alice"}, {"name": "Bob"}}',
     {"users": [{"name": "Alice"}, {"name": "Bob"}]}),
    # state machine sanity (:126+, valid passthrough)
    ('{"key": "value", "array": [1, 2, {"nested": true}]}',
     {"key": "value", "array": [1, 2, {"nested": True}]}),
]


@pytest.mark.parametrize("inp,exp", LAYER2)
def test_layer2_goldens(inp, exp):
    assert rep(inp) == exp


DOTS = [
    ('{"a": 1}..........', {"a": 1}),
    ('{"a": 1}' + "." * 30, {"a": 1}),
    ('{"a": "value..."}', {"a": "value..."}),            # dots in string kept
    ('{"a": 1.5}', {"a": 1.5}),                          # decimal untouched
]


@pytest.mark.parametrize("inp,exp", DOTS)
def test_trailing_dots_goldens(inp, exp):
    assert rep(inp) == exp


def test_repair_log_counts_three_missing_braces():
    r = repair('{"level1": {"level2": {"level3": "value"')
    closes = [a for a in r.repairs if "missing closing brace" in a["action"]]
    assert len(closes) >= 1  # we close LIFO in one pass; at least logged


def test_repair_with_debug_five_layer_records():
    """Reference debug-record shape (lib/json_remedy.ex:464-636): one
    step per layer with status in {processed, skipped, error},
    input/output sizes, the layer's new repairs + repair_count, and
    per-layer timing, wrapped in {steps, total_repairs,
    processing_time_us}.  The doc exercises every layer: fence (L1),
    smart quotes (preprocessing), missing closer (L2), unquoted key +
    trailing comma (L3), validation (L4)."""
    from json_remedy_spark.kernel.pipeline import repair_with_debug

    r, debug = repair_with_debug('```json\n{name: “Alice”, "x": [1,\n```')
    assert r.ok and r.value == {"name": "Alice", "x": [1]}
    steps = debug["steps"]
    assert [s["layer"] for s in steps] == [
        "layer1", "preprocessing", "layer2", "layer3", "layer4"
    ]
    for s in steps:
        assert s["status"] in ("processed", "skipped", "error")
        assert s["input_size"] >= 0 and s["output_size"] >= 0
        assert s["repair_count"] == len(s["repairs"])
        assert "processing_time_us" in s
        for a in s["repairs"]:
            # full repair_action struct (layer_behaviour.ex:9-15)
            assert set(a) == {"layer", "action", "position", "original", "replacement"}
    assert steps[0]["status"] == "processed"  # fence removed
    assert steps[2]["status"] == "processed"  # missing ] and } closed
    assert any("missing closing" in a["action"] for a in steps[2]["repairs"])
    assert steps[3]["status"] == "processed"  # unquoted key quoted
    assert steps[4]["status"] == "processed"  # validated
    assert debug["total_repairs"] == len(r.repairs) == sum(
        s["repair_count"] for s in steps
    )
    assert debug["processing_time_us"] >= sum(s["processing_time_us"] for s in steps)


def test_repair_with_debug_result_parity():
    """The debug path delegates to repair() itself (one control flow),
    so results are identical BY CONSTRUCTION on every corpus row —
    including the plain-text / span-fast-path / post-clean short
    circuits the old standalone reimplementation drifted on."""
    from json_remedy_spark.kernel import repair
    from json_remedy_spark.kernel.pipeline import repair_with_debug
    from json_remedy_spark.sources.webpages import make_row

    for i in range(0, 3000, 7):
        t = make_row(i)["text"]
        r = repair(t)
        rd, dbg = repair_with_debug(t)
        assert (r.ok, r.repaired, r.error) == (rd.ok, rd.repaired, rd.error), i
        if dbg["steps"][0]["layer"] not in ("fast_path", "guard"):
            assert dbg["total_repairs"] == sum(
                s["repair_count"] for s in dbg["steps"]
            ), i


def test_repair_with_debug_short_circuit_shapes():
    """Short-circuit paths still emit the five-layer skeleton."""
    from json_remedy_spark.kernel.pipeline import repair_with_debug

    rd, dbg = repair_with_debug("the plain text doc")
    assert rd.ok and rd.repaired == '""'
    shapes = [(s["layer"], s["status"]) for s in dbg["steps"]]
    assert shapes == [
        ("layer1", "processed"), ("preprocessing", "skipped"),
        ("layer2", "skipped"), ("layer3", "skipped"), ("layer4", "processed"),
    ]

    rd, dbg = repair_with_debug("[" * 5000)
    assert not rd.ok and dbg["error_at_layer"] == "layer2"
    assert [s["status"] for s in dbg["steps"]][2:] == ["error", "error", "error"]


def test_repair_with_debug_fast_path_record():
    """Fast-path hit emits the single validated step (json_remedy.ex:320-329)."""
    from json_remedy_spark.kernel.pipeline import repair_with_debug

    r2, debug2 = repair_with_debug('{"a": 1}')
    assert r2.fast_path
    assert debug2["steps"] == [
        {"layer": "fast_path", "status": "validated", "input_size": 8}
    ]
    assert debug2["total_repairs"] == 0


def test_repair_actions_carry_original_replacement():
    """Reference value conventions: layer2 removals carry the removed
    char + "" (structural_repair.ex:166-171), layer2 additions carry
    the added closer (json_remedy.ex:28), layer1 extractions carry
    input -> content (content_cleaning.ex:334-335), comments carry the
    comment text -> "" (content_cleaning.ex:556-559), layer3 records
    stay nil/nil (json_remedy.ex:80,251-254)."""
    from json_remedy_spark.kernel import repair

    r = repair('{"a": 1')
    add = [a for a in r.repairs if a["action"] == "added missing closing brace at EOF"]
    assert add and add[0]["original"] is None and add[0]["replacement"] == "}"

    r = repair('{{"a": 1}')  # doubled opener skipped as stray char
    rem = [a for a in r.repairs if "skipped non-JSON character" in a["action"]]
    assert rem and rem[0]["original"] == "{" and rem[0]["replacement"] == ""

    r = repair('{"a": 1, // note\n"b": 2}')
    com = [a for a in r.repairs if a["action"] == "removed comments"]
    assert com and com[0]["original"] == "// note" and com[0]["replacement"] == ""

    # malformed inner so the span fast path can't short-circuit the cleaner
    src = '```json\n{"a": 1,}\n```'
    r = repair(src)
    fen = [a for a in r.repairs if a["action"] == "removed code fences"]
    assert fen and fen[0]["original"] == src and fen[0]["replacement"] == '{"a": 1,}'

    r = repair("{'a': 1,}")
    l3 = [a for a in r.repairs if a["layer"] == "layer3"]
    assert l3 and all(a["original"] is None and a["replacement"] is None for a in l3)


def test_issue8_missing_terminators_crlf():
    """issue8_missing_terminators_test.exs:8-44 — unclosed object in an
    array closed by the comma before the next element, under \n and \r\n."""
    inp = (
        '{\n    "foo": [\n        {\n            "bar": {\n'
        '                "baz":  {\n        }},\n        {\n'
        '            "foo": {\n                "bar":  1\n'
        "            }\n        }\n    ]\n}\n"
    )
    exp = {"foo": [{"bar": {"baz": {}}}, {"foo": {"bar": 1}}]}
    for nl in ("\n", "\r\n"):
        s = inp.replace("\n", nl) if nl != "\n" else inp
        r = repair(s)
        assert r.ok and r.value == exp, (nl, r.value)


def test_reference_invalid_json_fixture():
    """Integration parity: the reference's shipped 271-line fixture has
    exactly one defect (`"name": Weiss Savage`, unquoted multi-word
    value) and must repair with exactly that action
    (test/integration/repair_example_test.exs:38-63).  Read in place —
    reference tree is read-only and must not be copied."""
    import os

    import pytest as _pytest

    path = "/root/reference/test/data/invalid.json"
    if not os.path.exists(path):
        _pytest.skip("reference fixture not present")
    with open(path) as fh:
        raw = fh.read()
    r = repair(raw)
    assert r.ok and isinstance(r.value, list) and len(r.value) == 6

    def walk(v):
        if isinstance(v, dict):
            for x in v.values():
                yield from walk(x)
        elif isinstance(v, list):
            for x in v:
                yield from walk(x)
        else:
            yield v

    # the defect is a nested friends[].name; the fixture also lacks its
    # final `]` (closed by layer 2)
    assert "Weiss Savage" in set(walk(r.value))
    value_actions = [a for a in r.repairs if a["action"] == "quoted unquoted string value"]
    assert len(value_actions) == 1, r.repairs
