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


def test_oracle_replay_matches_greedy_on_doubled_pairs():
    """Regression (review finding): the DuckDB replace()-replay must
    equal the kernel's greedy merge even when a merged pair occurs
    doubled within a word ('banana' + merge (a,n)) — the double-space
    token delimiting guarantees neighbouring matches never share a
    space.  Replays both the segmentation and the per-round argmax
    chain on an adversarial vocabulary."""
    import duckdb

    wf = [
        ("banana", 3), ("ananan", 2), ("aaaa", 5), ("aaa", 4),
        ("abab", 2), ("low", 5), ("newest", 6), ("mama", 7),
    ]
    merges = learn_bpe_from_freqs(wf, 14)
    assert ("a", "n") in merges or ("a", "a") in merges  # doubled pairs exercised
    con = duckdb.connect()
    con.execute("CREATE TABLE wf(word VARCHAR, freq BIGINT)")
    con.executemany("INSERT INTO wf VALUES (?, ?)", wf)
    con.execute("CREATE TABLE m(rank BIGINT, a VARCHAR, b VARCHAR)")
    con.executemany(
        "INSERT INTO m VALUES (?, ?, ?)",
        [(i, a, b) for i, (a, b) in enumerate(merges)],
    )
    seg_sql = """
    WITH RECURSIVE seg AS (
      SELECT 0 AS r, word, freq,
             ' ' || array_to_string(list_transform(range(1, len(word) + 1), i -> word[i]), '  ') || ' ' AS s
      FROM wf
      UNION ALL
      SELECT seg.r + 1, seg.word, seg.freq,
             replace(seg.s, ' ' || m.a || '  ' || m.b || ' ', ' ' || m.a || m.b || ' ')
      FROM seg JOIN m ON m.rank = seg.r
    )
    """
    for w, toks in con.execute(
        seg_sql
        + "SELECT word, string_split(trim(s), '  ') FROM seg "
        "WHERE r = (SELECT count(*) FROM m)"
    ).fetchall():
        assert toks == list(apply_merges(w, merges)), w
    got = [
        (a, b)
        for _, a, b in con.execute(
            seg_sql
            + """,
      counts AS (
        SELECT seg.r, t.a, t.b, sum(seg.freq) AS cnt
        FROM seg,
             LATERAL (
               SELECT toks[i] AS a, toks[i + 1] AS b
               FROM (SELECT string_split(trim(seg.s), '  ') AS toks) z,
                    LATERAL (SELECT unnest(range(1, len(toks))) AS i) y
             ) t
        WHERE seg.r < (SELECT count(*) FROM m)
        GROUP BY seg.r, t.a, t.b
      )
      SELECT r, a, b FROM (
        SELECT r, a, b, row_number() OVER (PARTITION BY r ORDER BY cnt DESC, a, b) AS rn
        FROM counts) WHERE rn = 1 ORDER BY r
    """
        ).fetchall()
    ]
    assert got == merges


# ---------------------------------------------------------------------------
# byte-level BPE (GPT-2 style)
# ---------------------------------------------------------------------------


def test_byte_pretoken_pattern_is_lossless_and_gpt2_shaped(spark):
    """The pre-tokenizer covers every char (concatenation re-yields
    the text) and keeps GPT-2's signature shapes: contraction
    suffixes, space-prefixed words; documented delta: multi-space runs
    stay one token."""
    from pyspark.sql import functions as F

    from json_remedy_spark.functions.bpe import BYTE_PRETOKEN_PATTERN

    samples = [
        "Hello, world! it's 2026.",
        "don't we'll I'm you're",
        "naïve café ΣΦ 北京 ¡hola! e=mc²",
        "a  b\tc\nd",
        "  leading and trailing  ",
        "emoji 😀🎉 mix",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    rows = df.select(
        "t",
        F.regexp_extract_all("t", F.lit(BYTE_PRETOKEN_PATTERN), F.lit(0)).alias("p"),
    ).collect()
    by_text = {r["t"]: r["p"] for r in rows}
    for s in samples:
        assert "".join(by_text[s]) == s  # lossless
    assert by_text["Hello, world! it's 2026."] == [
        "Hello", ",", " world", "!", " it", "'s", " 2026", ".",
    ]
    assert by_text["a  b\tc\nd"] == ["a", "  ", "b", "\t", "c", "\n", "d"]


def test_byte_vocab_ids_and_decode():
    from json_remedy_spark.functions.bpe import byte_vocab, byte_vocab_decode

    merges = [("74", "68"), ("7468", "65"), ("74", "68")]  # dup keeps first id
    v = byte_vocab(merges)
    assert v["00"] == 1 and v["ff"] == 256 and v["61"] == 0x61 + 1
    assert v["7468"] == 257 and v["746865"] == 258
    assert len(v) == 258  # the duplicate consumed no slot
    dec = byte_vocab_decode(v)
    assert dec[257] == b"th" and dec[258] == b"the" and dec[2] == b"\x01"


def test_byte_bpe_learn_encode_decode_roundtrip(spark):
    """learn -> encode -> decode re-yields every document's exact
    UTF-8 bytes (the pre-tokenizer is lossless and every byte is in
    the base vocab — no unk)."""
    from json_remedy_spark.functions.bpe import (
        bpe_encode_bytes,
        bpe_learn_bytes,
        byte_vocab,
        byte_vocab_decode,
    )

    texts = {
        1: "the cat sat on the mat, the cat sat!",
        2: "Thé cät — naïve 北京 text with don't and we'll",
        3: "numbers 123 456 123 and spaces  double",
        4: "",
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()] + [(5, None)],
        "doc_id long, text string",
    )
    merges = bpe_learn_bytes(docs, 12)
    assert merges and all(
        len(a) % 2 == 0 and len(b) % 2 == 0 and set(a + b) <= set("0123456789abcdef")
        for a, b in merges
    )
    vocab = byte_vocab(merges)
    dec = byte_vocab_decode(vocab)
    enc = bpe_encode_bytes(docs, merges, vocab).collect()
    by_doc: dict[int, list] = {}
    for r in enc:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["token_id"]))
    for did, text in texts.items():
        toks = [t for _, t in sorted(by_doc.get(did, []))]
        assert b"".join(dec[t] for t in toks) == text.encode("utf-8")
        # positions are dense 0..n-1
        assert [p for p, _ in sorted(by_doc.get(did, []))] == list(range(len(toks)))
    assert 5 not in by_doc  # null text encodes to nothing
    # merges actually compress: fewer tokens than bytes for doc 1
    n_bytes = len(texts[1].encode())
    assert 0 < len(by_doc[1]) < n_bytes


def test_byte_bpe_learning_weights_by_frequency():
    """' the' (space-prefixed, GPT-2 shape) dominates a corpus of
    'the'-heavy text: the first merges assemble its bytes."""
    from json_remedy_spark.functions.bpe import _hex_tokens, learn_bpe_from_freqs

    wf = [("the", 2), (" the", 10), (" cat", 3)]
    merges = learn_bpe_from_freqs(wf, 3, to_tokens=_hex_tokens)
    # ' t' = 20+74 appears 10x, 't h' 12x, 'h e' 12x -> first merge is
    # (68,65) or (74,68) by tie-break; ' the' assembles within 3 merges
    seg = _hex_tokens(" the")
    from json_remedy_spark.functions.bpe import apply_merges_tokens

    final = apply_merges_tokens(seg, merges)
    assert len(final) <= 2  # 4 bytes collapsed to <=2 tokens
