"""In-engine BPE tokenizer learning (functions/bpe.py)."""

import pytest

from json_remedy_spark.functions.bpe import (
    _merge_once,
    apply_merges,
    learn_bpe_from_freqs,
)


def test_merge_once_is_greedy_left_to_right():
    assert _merge_once(tuple("aaa"), "a", "a") == ("aa", "a")
    assert _merge_once(tuple("aaaa"), "a", "a") == ("aa", "aa")
    assert _merge_once(("x", "a", "b", "a", "b"), "a", "b") == ("x", "ab", "ab")
    # whole-token equality, never substring matching
    assert _merge_once(("xa", "b"), "a", "b") == ("xa", "b")


def test_learn_bpe_textbook_example():
    """The Sennrich et al. §3.2 flavor: 'est' assembles from the
    highest-frequency suffix pairs first."""
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_bpe_from_freqs(wf, 3)
    assert merges[0] == ("e", "s")  # 9 weighted occurrences
    assert merges[1] == ("es", "t")
    assert apply_merges("newest", merges)[-1] == "est"


def test_learn_bpe_tie_break_and_exhaustion():
    # both pairs of "ab" occur once: tie -> lexicographically smallest
    merges = learn_bpe_from_freqs([("ab", 1), ("ba", 1)], 10)
    assert merges[0] == ("a", "b")
    # single-char words give no pairs: learning stops early, no error
    assert learn_bpe_from_freqs([("a", 5)], 4) == []


def test_bpe_learn_and_encode_roundtrip(spark):
    from pyspark.sql import functions as F

    from json_remedy_spark.functions.bpe import (
        bpe_learn,
        bpe_token_counts,
        pair_counts,
        word_freqs,
    )

    docs = spark.createDataFrame(
        [
            (1, "the lowest newest thing"),
            (2, "The newest widest LOWEST"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    merges = bpe_learn(docs, 6)
    # parity with the driver-side loop on the collected freqs
    wf_rows = [
        (r["word"], r["freq"]) for r in word_freqs(docs).collect()
    ]
    assert merges == learn_bpe_from_freqs(sorted(wf_rows), 6)

    tok = {r["doc_id"]: r["n_tokens"] for r in bpe_token_counts(docs, merges).collect()}
    assert tok[3] == 0
    assert tok[1] == sum(
        len(apply_merges(w, merges)) for w in "the lowest newest thing".split()
    )
    # distributed round-0 pair counts match the in-memory statistic
    pc = {(r["a"], r["b"]): r["cnt"] for r in pair_counts(word_freqs(docs)).collect()}
    acc = {}
    for w, f in wf_rows:
        for i in range(len(w) - 1):
            acc[(w[i], w[i + 1])] = acc.get((w[i], w[i + 1]), 0) + f
    assert pc == acc
    # encoder kernel is map-only
    plan = (
        bpe_token_counts(docs, merges)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_bpe_merge_order_matters_for_encoding():
    merges = [("e", "s"), ("es", "t")]
    assert apply_merges("best", merges) == ("b", "est")
    # without the first merge the second can never fire
    assert apply_merges("best", [("es", "t")]) == ("b", "e", "s", "t")
