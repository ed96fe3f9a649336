"""Port of /root/reference/test/performance/layer1_performance_test.exs.

The reference asserts micro-timings on the layer-1 public functions
(<500us per small doc, <50us per supports? probe).  We assert the same
shape with 20x headroom (the sandbox host has multi-minute CPU-steal
windows — CLAUDE.md; a tight bound would flake), which still catches
any accidental O(n^2) regression by orders of magnitude.
"""

import time

from json_remedy_spark.kernel import repair
from json_remedy_spark.kernel.cleaning import (
    clean,
    extract_from_html,
    normalize_encoding,
    remove_code_fences,
    remove_comments,
    supports,
)

SMALL_INPUTS = [
    '{"name": "Alice"}',
    '```json\n{"name": "Alice"}\n```',
    '// Comment\n{"name": "Alice"}',
    '<pre>{"name": "Alice"}</pre>',
]


def _avg_us(fn, arg, n=50):
    fn(arg)  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn(arg)
    return (time.perf_counter() - t0) / n * 1e6


def test_content_cleaning_small_input_speed():
    # reference bound: <500us; ours: <10ms (20x steal headroom)
    for src in SMALL_INPUTS:
        us = _avg_us(lambda s: clean(s, []), src)
        assert us < 10_000, f"clean took {us:.0f}us on {src!r}"


def test_public_cleaning_function_speed():
    comment_doc = "// c\n" + '{"name": "Alice"} /* block */'
    assert _avg_us(lambda s: remove_comments(s, []), comment_doc) < 10_000
    assert _avg_us(lambda s: remove_code_fences(s, []), SMALL_INPUTS[1]) < 10_000
    assert _avg_us(lambda s: extract_from_html(s, []), SMALL_INPUTS[3]) < 10_000
    assert _avg_us(lambda s: normalize_encoding(s.encode(), []), SMALL_INPUTS[0]) < 4_000


def test_supports_probe_speed():
    # reference bound: <50us per probe; ours <1ms
    for src in SMALL_INPUTS:
        assert _avg_us(supports, src) < 1_000


def test_large_doc_cleaning_linear():
    # the O(n^2) tripwire: 100x the input must cost far less than
    # 1000x the time (generous vs linear's 100x)
    small = ('{"k": "v"} // trailing\n') * 10
    big = ('{"k": "v"} // trailing\n') * 1000
    t_small = _avg_us(lambda s: clean(s, []), small, n=10)
    t_big = _avg_us(lambda s: clean(s, []), big, n=10)
    assert t_big < max(t_small, 50.0) * 1000


def test_repair_small_doc_end_to_end_speed():
    # end-to-end analogue of the memory test (:107-122): repeated small
    # repairs stay fast and allocate nothing persistent
    us = _avg_us(lambda s: repair(s), '{"name": \'Alice\', "ok": True}')
    assert us < 20_000
