"""Performance/robustness stress suite, ported from
/root/reference/test/critical/performance_stress_layer_3_test.exs (578
lines).  Time bounds are the reference's intent with generous headroom
for this host's CPU-steal windows (CLAUDE.md); correctness assertions
are exact.  Concurrency cases port as thread-pool determinism — the
kernel is pure, shared-nothing by construction.
"""

import time
from concurrent.futures import ThreadPoolExecutor

import pytest

from json_remedy_spark.kernel import repair


def rep(s):
    r = repair(s)
    assert r.ok, f"repair failed: {r.error}"
    return r


def test_very_large_number_of_repairs():
    # :63-98 — 1000 blocks x (unquoted key, quote, literal x2) + final
    big = (
        "{"
        + " ".join(f"key{i}: 'value{i}', active{i}: True, data{i}: None," for i in range(1, 1001))
        + " final: FALSE}"
    )
    t0 = time.time()
    r = rep(big)
    assert time.time() - t0 < 20  # reference bound 5 s on BEAM; ~30 ms here
    assert len(r.repairs) >= 3000
    assert '"key1":"value1"' in r.repaired and '"final":false' in r.repaired
    assert ",}" not in r.repaired


def test_deeply_nested_with_issues_each_level():
    # :100-129 — 50 nested levels, issues at every level
    deep = (
        "{"
        + "".join(f"level{i}: {{nested{i}: 'value{i}', active{i}: True, " for i in range(1, 51))
        + "final: None "
        + "}" * 50
    )
    t0 = time.time()
    r = rep(deep)
    assert time.time() - t0 < 12
    assert '"level1"' in r.repaired and '"level50"' in r.repaired
    assert '"final":null' in r.repaired
    assert len(r.repairs) >= 50


def test_many_repeated_patterns():
    # :131-155 — 500 identical malformed blocks (duplicate keys: term
    # semantics keep the last value; repairs still log per occurrence)
    doc = "{" + "name: 'Alice', active: True, value: None, " * 500 + "final: FALSE}"
    t0 = time.time()
    r = rep(doc)
    assert time.time() - t0 < 10  # reference bound 30 ms; ~10 ms here
    assert len(r.repairs) >= 1500
    assert '"name":"Alice"' in r.repaired and '"final":false' in r.repaired


def test_alternating_quote_styles():
    # :158-188
    alt = (
        "{"
        + ", ".join(
            (f"\"key{i}\": 'value{i}'" if i % 2 == 0 else f"'key{i}': \"value{i}\"")
            for i in range(1, 201)
        )
        + "}"
    )
    r = rep(alt)
    assert "'" not in r.repaired
    assert '"key1":"value1"' in r.repaired and '"key200":"value200"' in r.repaired
    assert len(r.repairs) >= 100


def test_many_boolean_null_variants():
    # :190-220
    variants = ["True", "False", "TRUE", "FALSE", "None", "NULL", "Null"]
    doc = "{" + ", ".join(f'"key{i}": {variants[i % 7]}' for i in range(1, 101)) + "}"
    r = rep(doc)
    assert '"key1":false' in r.repaired and '"key100":true' in r.repaired
    assert "True" not in r.repaired and "None" not in r.repaired
    assert len(r.repairs) >= 100


def test_mixed_syntax_issues():
    # :222-264 — worst case: 4-5 issues per block + trailing comma
    doc = (
        "{"
        + " ".join(
            f"key{i}: 'value{i}', active{i}: True, data{i}: None, count{i}: FALSE,"
            for i in range(1, 101)
        )
        + " final: NULL,}"
    )
    r = rep(doc)
    assert '"key1":"value1"' in r.repaired
    assert '"active1":true' in r.repaired and '"data1":null' in r.repaired
    assert '"final":null' in r.repaired and ",}" not in r.repaired


def test_very_long_string_values_untouched():
    # :266-293 — literal-looking words INSIDE a long string stay put
    long_value = (
        "This is a very long string value that contains words like True and False "
        "and None but should not be modified because it's inside quotes. " * 100
    )
    r = rep('{"description": "%s", status: True}' % long_value)
    assert long_value in r.repaired
    assert '"status":true' in r.repaired


def test_many_escape_sequences_preserved():
    # :295-315
    esc = '\\"escaped\\" and \\\\backslash\\\\, ' * 100
    r = rep('{"content": "%s", unquoted: \'test\'}' % esc)
    assert esc in r.repaired
    assert '"unquoted":"test"' in r.repaired
    assert len(r.repairs) <= 3


def test_input_size_ladder():
    # :344-382 — scaling ladder; throughput must stay sane per KB
    base = "key: 'value', active: True, data: None, "
    for size in (100, 500, 1000, 2000):
        doc = "{" + base * size + "final: FALSE}"
        t0 = time.time()
        r = rep(doc)
        dt = time.time() - t0
        kb = len(doc) / 1024
        assert dt / kb < 0.05, f"{dt:.2f}s for {kb:.0f} KB at size {size}"
        assert '"final":false' in r.repaired


def test_malformed_utf8_graceful():
    # :431-456 — replacement chars and emoji floods never crash
    cases = [
        "{café: 'naïve'}",
        b"{\xff\xfe: 'test'}".decode("utf-8", "replace"),
        "🚀" * 1000 + ": True",
    ]
    for doc in cases:
        r = repair(doc)
        assert r.ok or r.error  # graceful either way
        if r.ok:
            r.repaired.encode("utf-8")  # output stays valid UTF-8


def test_thread_safety_shared_nothing():
    # :520-576 — concurrent repairs equal serial repairs (pure kernel)
    docs = [f"{{key{i}: 'v{i}', active: True,}}" for i in range(64)]
    serial = [repair(d).repaired for d in docs]
    with ThreadPoolExecutor(max_workers=8) as ex:
        concurrent = list(ex.map(lambda d: repair(d).repaired, docs))
    assert concurrent == serial


def test_repeated_processing_stable():
    # :384-429 — no state corruption across repeated calls
    doc = "{name: 'Alice', active: True, value: None,}"
    outs = {repair(doc).repaired for _ in range(200)}
    assert outs == {'{"name":"Alice","active":true,"value":null}'}
