"""Deterministic synthetic Common-Crawl-style web-page corpus.

Input table shape per BASELINE.json input_hint:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Each row embeds a JSON payload rendered through one of the reference's
malformation classes (FIXTURES.md §2, ported from
``/root/reference/test``).  The generator *constructs* the malformed
text from a known clean value, so ``expected_repaired`` /
``expected_keep`` labels are ground truth by construction — the repair
pipeline has to recover them, making byte-identical and F1 checks
non-circular.

Scale design: generation is keyed purely on ``(seed, doc_id)`` so it
distributes via ``spark.range(n).mapInPandas`` — no driver-side loop,
no cross-partition state; the same doc_id yields the same row on any
cluster size.
"""

from __future__ import annotations

import datetime as _dt
import json
import random
from typing import Iterator

LANGS = ["en", "en", "en", "en", "en", "en", "de", "fr", "xx"]

_PROSE = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then it runs away "
        "with a happy smile because this is what foxes do in the morning "
        "when the sun is shining and the birds are singing in the trees"
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und die "
        "katze schläft unter dem baum während die vögel singen und der "
        "wind durch die blätter weht an einem schönen morgen im wald"
    ),
    "fr": (
        "le renard brun rapide saute par dessus le chien paresseux et le "
        "chat dort sous un arbre pendant que les oiseaux chantent et que "
        "le vent souffle dans les feuilles par un beau matin dans la forêt"
    ),
    "xx": "zxq vbn wrt plm kjh gfd qwe rty uio asd fgh jkl zxc vbn mnb " * 3,
}

_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]
_KEYS = ["name", "count", "status", "score", "tags", "active", "city", "note"]

CLEAN_CLASSES = ["clean", "clean_ws"]
MALFORMED_CLASSES = [
    "code_fence", "line_comment", "block_comment", "html_pre", "prose_wrap",
    "trailing_dots", "missing_closer", "extra_closer", "mismatched",
    "single_quotes", "smart_quotes", "unquoted_keys", "python_literals",
    "trailing_comma", "missing_comma", "ellipsis", "underscore_number",
    "leading_dot_number", "thousands_number", "unquoted_value",
    "multiple_json", "object_merge", "unclosed_string",
    # stacked defects — real LLM output rarely fails one way at a time
    "combo_fence_trailing_comma", "combo_comment_missing_closer",
    "combo_quotes_literals", "combo_prose_unquoted_keys",
]
DROP_CLASSES = ["plain_text", "garbage"]

CORPUS_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)
LABELS_SCHEMA = (
    "url string, expected_repaired string, expected_keep boolean, "
    "malformation_class string, lang string"
)

_BASE_TS = _dt.datetime(2026, 1, 1, 0, 0, 0)


def _canon(v) -> str:
    return json.dumps(v, ensure_ascii=False, separators=(",", ":"))


def _rand_value(rng: random.Random, depth: int = 0):
    kind = rng.randrange(6 if depth < 2 else 4)
    if kind == 0:
        return rng.choice(_WORDS)
    if kind == 1:
        return rng.randrange(-1000, 100000)
    if kind == 2:
        return round(rng.uniform(0, 100), 3)
    if kind == 3:
        return rng.choice([True, False, None])
    if kind == 4:
        return [_rand_value(rng, depth + 1) for _ in range(rng.randrange(1, 4))]
    return {rng.choice(_KEYS) + str(i): _rand_value(rng, depth + 1) for i in range(rng.randrange(1, 3))}


def _rand_obj(rng: random.Random) -> dict:
    n = rng.randrange(2, 6)
    keys = rng.sample(_KEYS, min(n, len(_KEYS)))
    return {k: _rand_value(rng) for k in keys}


def _malform(cls: str, value: dict, rng: random.Random):
    """Render ``value`` through a malformation class.

    Returns (malformed_text, expected_value).  ``expected_value`` is what
    the reference pipeline recovers (usually ``value`` itself).
    """
    s = _canon(value)
    if cls == "clean":
        return s, value
    if cls == "clean_ws":
        return json.dumps(value, ensure_ascii=False, indent=2), value
    if cls == "code_fence":
        return f"```json\n{s}\n```", value
    if cls == "line_comment":
        return f"// generated output\n{s}", value
    if cls == "block_comment":
        return f"{s} /* end of response */", value
    if cls == "html_pre":
        return f"<pre>{s}</pre>", value
    if cls == "prose_wrap":
        # wrapper kept free of langid stopwords so it doesn't flip the
        # document's language signal
        return f"Result >> {s} << done.", value
    if cls == "trailing_dots":
        return s + "." * rng.randrange(10, 16), value
    if cls == "missing_closer":
        return s[:-1], value
    if cls == "extra_closer":
        return s + "}", value
    if cls == "mismatched":
        return s[:-1] + "]", value
    if cls == "single_quotes":
        if any('"' in str(v) or "'" in str(v) for v in value.values()):
            return s, value
        return s.replace('"', "'"), value
    if cls == "smart_quotes":
        out = []
        open_q = True
        for ch in s:
            if ch == '"':
                out.append("“" if open_q else "”")
                open_q = not open_q
            else:
                out.append(ch)
        return "".join(out), value
    if cls == "unquoted_keys":
        out = s
        for k in value:
            out = out.replace(f'"{k}":', f"{k}:", 1)
        return out, value
    if cls == "python_literals":
        v2 = dict(value)
        v2["flag"] = rng.choice([True, False, None])
        s2 = _canon(v2)
        tok = {True: "true", False: "false", None: "null"}[v2["flag"]]
        rep = {True: "True", False: "False", None: "None"}[v2["flag"]]
        return s2[::-1].replace(tok[::-1], rep[::-1], 1)[::-1], v2
    if cls == "trailing_comma":
        return s[:-1] + ",}" if s.endswith("}") else s[:-1] + ",]", value
    if cls == "missing_comma":
        i = s.find('","')
        if i == -1:
            return s, value
        return s[: i + 1] + " " + s[i + 2 :], value
    if cls == "ellipsis":
        v2 = dict(value)
        v2["items"] = [rng.randrange(100) for _ in range(3)]
        s2 = _canon(v2)
        j = s2.rfind("]")
        return s2[:j] + ", ..." + s2[j:], v2
    if cls == "underscore_number":
        v2 = dict(value)
        v2["big"] = rng.randrange(10**6, 10**9)
        s2 = _canon(v2)
        big = str(v2["big"])
        grouped = f"{v2['big']:_}"
        return s2.replace(f'"big":{big}', f'"big":{grouped}'), v2
    if cls == "leading_dot_number":
        v2 = dict(value)
        frac = rng.randrange(1, 999)
        v2["ratio"] = float(f"0.{frac}")
        s2 = _canon(v2)
        return s2.replace(f'"ratio":0.{frac}', f'"ratio":.{frac}'), v2
    if cls == "thousands_number":
        v2 = dict(value)
        v2["population"] = rng.randrange(10**6, 10**8)
        s2 = _canon(v2)
        with_commas = f"{v2['population']:,}"
        return s2.replace(f'"population":{v2["population"]}', f'"population":{with_commas}'), v2
    if cls == "unquoted_value":
        v2 = dict(value)
        word = rng.choice(_WORDS)
        v2["label"] = word
        s2 = _canon(v2)
        return s2.replace(f'"label":"{word}"', f'"label": {word}'), v2
    if cls == "multiple_json":
        other = {"extra": rng.choice(_WORDS), "n": rng.randrange(100)}
        return s + _canon(other), [value, other]
    if cls == "object_merge":
        k = "appendix"
        extra = rng.choice(_WORDS)
        v2 = dict(value)
        v2[k] = extra
        return s + f', "{k}": "{extra}"}}', v2
    if cls == "combo_fence_trailing_comma":
        return f"```json\n{s[:-1]},}}\n```", value
    if cls == "combo_comment_missing_closer":
        return f"// model output below\n{s[:-1]}", value
    if cls == "combo_quotes_literals":
        if any('"' in str(v) or "'" in str(v) for v in value.values()):
            return s, value
        v2 = dict(value)
        v2["flag"] = True
        s2 = _canon(v2).replace('"', "'")
        return s2[::-1].replace("true"[::-1], "True"[::-1], 1)[::-1], v2
    if cls == "combo_prose_unquoted_keys":
        out = s
        for k in value:
            out = out.replace(f'"{k}":', f"{k}:", 1)
        return f"Model says => {out} <= end of output", value
    if cls == "unclosed_string":
        v2 = dict(value)
        word = rng.choice(_WORDS)
        v2["tail"] = word
        s2 = _canon(v2)
        assert s2.endswith(f'"tail":"{word}"}}')
        return s2[: -len('"}')] + "}", v2
    raise ValueError(cls)


def make_row(doc_id: int, seed: int = 42) -> dict:
    """One deterministic corpus row + its label — pure function of
    (seed, doc_id); safe to call from any partition."""
    rng = random.Random((seed << 32) ^ doc_id)
    lang = LANGS[rng.randrange(len(LANGS))]
    r = rng.random()
    if r < 0.60:
        cls = rng.choice(CLEAN_CLASSES)
    elif r < 0.95:
        cls = MALFORMED_CLASSES[rng.randrange(len(MALFORMED_CLASSES))]
    else:
        cls = DROP_CLASSES[rng.randrange(len(DROP_CLASSES))]

    prose = _PROSE[lang]
    if cls == "plain_text":
        text = prose
        expected = ""
    elif cls == "garbage":
        text = "".join(rng.choice("~!@#$%^&*()_+|<>?;x ") for _ in range(rng.randrange(40, 200)))
        expected = ""
    else:
        value = _rand_obj(rng)
        payload, expected_value = _malform(cls, value, rng)
        text = f"{prose[: rng.randrange(40, len(prose))]}\n{payload}"
        expected = _canon(expected_value)

    # skew knob: a small fraction of docs are 50x median length via
    # repetition — these are ground-truth drops (Gopher repetition rule)
    # AND processing-skew stressors
    skewed = rng.random() < 0.005
    if skewed:
        text = text + "\n" + prose * 50

    url = f"https://site{doc_id % 997:04d}.example/{doc_id:08d}"
    ts = _BASE_TS + _dt.timedelta(seconds=doc_id % 86400, days=doc_id % 30)
    html = f"<html><head><title>doc {doc_id}</title></head><body><p>{text}</p></body></html>".encode()
    if rng.random() < 0.01:
        html = b"\xff\xfe" + html  # invalid UTF-8 head: encoding normalization path
    keep = lang == "en" and cls not in DROP_CLASSES and not skewed
    return {
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": text,
        "lang": lang,
        "expected_repaired": expected if cls not in DROP_CLASSES else '""',
        "expected_keep": keep,
        "malformation_class": cls,
    }


def synthesize_pandas(n_docs: int, seed: int = 42):
    """Small-scale driver-side generation for pytest (no Spark)."""
    import pandas as pd

    rows = [make_row(i, seed) for i in range(n_docs)]
    df = pd.DataFrame(rows)
    corpus = df[["url", "warc_ts", "html", "text", "lang"]]
    labels = df[["url", "expected_repaired", "expected_keep", "malformation_class", "lang"]]
    return corpus, labels


def synthesize_corpus(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """Distributed generation: ``spark.range`` -> ``mapInPandas``.

    Returns (corpus_df, labels_df); both partition-parallel, keyed only
    on doc_id so the output is identical at any parallelism.
    """
    import pandas as pd

    base = spark.range(0, n_docs, numPartitions=partitions)

    full_schema = CORPUS_SCHEMA + ", expected_repaired string, expected_keep boolean, malformation_class string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [make_row(int(i), seed) for i in pdf["id"]]
            out = pd.DataFrame(rows)
            yield out[[
                "url", "warc_ts", "html", "text", "lang",
                "expected_repaired", "expected_keep", "malformation_class",
            ]]

    full = base.mapInPandas(gen, schema=full_schema)
    corpus = full.select("url", "warc_ts", "html", "text", "lang")
    labels = full.select(
        "url", "expected_repaired", "expected_keep", "malformation_class", "lang"
    )
    return corpus, labels
