"""Property-based kernel robustness (hypothesis).

Invariants:
* repair never raises, for arbitrary unicode garbage;
* repair of VALID json round-trips exactly (fast path == identity);
* idempotence: repairing the canonical output is a fixpoint;
* corrupting valid JSON with reference malformation operators still
  yields ok=True and parseable canonical output.
"""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from json_remedy_spark.kernel import repair

json_values = st.recursive(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(10**12), max_value=10**12),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
            max_size=20,
        ),
    ),
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=8), children, max_size=4),
    ),
    max_leaves=12,
)

CFG = settings(max_examples=150, deadline=None, suppress_health_check=[HealthCheck.too_slow])


@given(st.text(max_size=400))
@CFG
def test_never_raises(s):
    r = repair(s)
    assert r.ok or r.error


@given(json_values)
@CFG
def test_valid_json_round_trips(v):
    s = json.dumps(v, ensure_ascii=False)
    r = repair(s)
    assert r.ok and r.fast_path
    assert json.loads(r.repaired) == json.loads(s)


@given(json_values)
@CFG
def test_idempotent(v):
    s = json.dumps(v, ensure_ascii=False)
    r1 = repair(s)
    r2 = repair(r1.repaired)
    assert r2.ok and r2.repaired == r1.repaired


@given(json_values, st.sampled_from([
    "fence", "comment", "dots", "truncate", "extra_closer", "trailing_comma",
]))
@CFG
def test_corrupted_still_repairs(v, op):
    s = json.dumps({"payload": v}, ensure_ascii=False)
    if op == "fence":
        s = f"```json\n{s}\n```"
    elif op == "comment":
        s = "// header\n" + s
    elif op == "dots":
        s = s + "." * 12
    elif op == "truncate":
        s = s[:-1]
    elif op == "extra_closer":
        s = s + "}"
    elif op == "trailing_comma":
        s = s[:-1] + ",}"
    r = repair(s)
    assert r.ok, (op, s[:120], r.error)
    json.loads(r.repaired)  # canonical output must be valid JSON


_UNI_SPACES = st.sampled_from([" ", " ", " ", " ", "　"])


@given(json_values, _UNI_SPACES)
@settings(max_examples=60, suppress_health_check=[HealthCheck.too_slow], deadline=None)
def test_unicode_whitespace_between_tokens_is_transparent(v, sp):
    """Exotic Unicode spaces between tokens must behave exactly like
    ASCII spaces UNDER THE TOLERANT PATH (r2 _NONWS extension) — the
    comparison target is the tolerant parse of the ASCII text, since a
    unicode-space doc is strict-invalid and can never take the
    fast path (e.g. the doubled-opener collapse of ``[[]]`` applies to
    both spellings once the parser sees them)."""
    from hypothesis import assume

    from json_remedy_spark.kernel import cleaning, prepass
    from json_remedy_spark.kernel.tolerant import SKIP, TolerantParser

    # compact form has no inter-token spaces, so a space there is
    # STRING CONTENT — the blanket replace below would corrupt it
    ascii_text = json.dumps(v, ensure_ascii=False, indent=1)
    assume(" " not in json.dumps(v, ensure_ascii=False, separators=(",", ":")))
    # scope to prepass-neutral docs: smart-quote/ellipsis/keyword
    # content is blind-rewritten by prepass (reference behavior) and
    # garbage-in diverges on garbage-out regardless of whitespace
    log: list = []
    assume(prepass.apply(cleaning.clean(ascii_text, log), log) == ascii_text)
    expected = TolerantParser(ascii_text).parse()
    assume(expected is not SKIP)
    r = repair(ascii_text.replace("\n", sp).replace(" ", sp))
    assert r.ok and r.value == expected


@given(st.text(max_size=300))
@settings(max_examples=150, suppress_health_check=[HealthCheck.too_slow], deadline=None)
def test_repaired_text_is_always_utf8_encodable(s):
    """Arrow-column safety: whatever the input (including literal
    lone-surrogate escapes), the repaired text must encode to utf-8."""
    r = repair(s)
    if r.ok and r.repaired is not None:
        r.repaired.encode("utf-8")


@given(st.integers(0xD800, 0xDBFF))
@settings(max_examples=40, deadline=None)
def test_lone_surrogate_escapes_never_poison(cp):
    r = repair('{"k": "\\u%04x"}' % cp)
    assert r.ok
    r.repaired.encode("utf-8")
    assert json.loads(r.repaired) == {"k": chr(cp)}


@given(st.text(max_size=200))
@settings(max_examples=150, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_nfc_kernel_matches_duckdb(t):
    """The normalize module's NFC (Python unicodedata) must match
    DuckDB's nfc_normalize byte-for-byte on arbitrary unicode — the
    exactness contract behind the normalize_text oracle."""
    import unicodedata

    import duckdb

    from hypothesis import assume

    # DuckDB strings are UTF-8; lone surrogates are not representable
    # and NUL truncates its varchar params — both outside the oracle's
    # domain (parquet corpus text carries neither)
    assume("\x00" not in t)
    assume(all(not 0xD800 <= ord(c) <= 0xDFFF for c in t))
    got = duckdb.sql("select nfc_normalize(?)", params=[t]).fetchone()[0]
    assert got == unicodedata.normalize("NFC", t)


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=120))
@settings(max_examples=100, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_mojibake_chain_spark_sql_equivalence(t):
    """fix_mojibake's JVM replace chain and fix_mojibake_sql's DuckDB
    chain are the same pure function — evaluated here via the pair
    table applied in plain Python vs the DuckDB expression."""
    import duckdb

    from json_remedy_spark.functions.normalize import MOJIBAKE_PAIRS, fix_mojibake_sql

    py = t
    for broken, fixed in MOJIBAKE_PAIRS:
        py = py.replace(broken, fixed)
    got = duckdb.sql(f"select {fix_mojibake_sql('?')}", params=[t]).fetchone()[0]
    assert got == py
