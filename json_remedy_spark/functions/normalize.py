"""Unicode text normalization for web corpora — the CCNet/C4 cleanup
stages the repair pipeline feeds on:

* ``nfc_normalize``  — Unicode NFC (UAX #15) via an Arrow kernel;
  DuckDB's ``nfc_normalize`` implements the same algorithm, giving a
  byte-exact oracle.
* ``fix_mojibake``   — deterministic repair of the classic UTF-8-read-
  as-cp1252 double encoding ("â€™" -> "’", "Ã©" -> "é").  A curated
  sequence table applied as a chained literal replace — pure JVM
  column algebra (whole-stage codegen), mirrored verbatim in the SQL
  oracle.  The table is GENERATED from the target characters through
  the sloppy-cp1252 byte map (cp1252 with latin-1 fallback for the
  five undefined bytes — the de-facto encoding of mojibake in the
  wild), so the pairs cannot drift from the transform.

No reference analogue (lib/json_remedy.ex repairs JSON syntax, not
encodings); graft-mandated corpus cleaning.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sloppy_cp1252(bs: bytes) -> str:
    """cp1252 with latin-1 fallback for the 5 undefined bytes —
    how mojibake actually renders in the wild (ftfy's model)."""
    out = []
    for b in bs:
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


# Characters whose mojibake forms are unambiguous (each broken form is
# a >=2-char sequence starting with â/Ã/Â/Ã¢ that clean text never
# contains).  Order by broken-form length DESC so longer sequences win.
_TARGETS = "’‘“”—–…€éèêëáàâäçñóòôöúùûü«»°"
MOJIBAKE_PAIRS: list[tuple[str, str]] = sorted(
    ((_sloppy_cp1252(ch.encode("utf-8")), ch) for ch in _TARGETS),
    key=lambda p: -len(p[0]),
)


def fix_mojibake(col: Column) -> Column:
    """Chained literal replaces over the generated pair table —
    JVM-side, codegen-friendly, zero shuffle."""
    out = col
    for broken, fixed in MOJIBAKE_PAIRS:
        out = F.replace(out, F.lit(broken), F.lit(fixed))
    return out


def fix_mojibake_sql(expr: str) -> str:
    """The identical replace chain as a DuckDB expression."""
    out = expr
    for broken, fixed in MOJIBAKE_PAIRS:
        b = broken.replace("'", "''")
        f = fixed.replace("'", "''")
        out = f"replace({out}, '{b}', '{f}')"
    return out


def _nfc_udf():
    """One NFC kernel definition for both entry points (factory so the
    decorator binds inside an active SparkContext)."""

    @F.pandas_udf("string")
    def nfc_udf(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    return nfc_udf


def nfc_normalize(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, text) with ``text`` NFC-normalized and mojibake fixed
    (fix first, then NFC, so repaired chars compose too), plus a
    ``changed`` flag.  One Arrow hop for NFC; the mojibake chain runs
    JVM-side before it.  Map-only — no shuffle."""
    nfc_udf = _nfc_udf()
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_orig")
    ).withColumn("text", nfc_udf(fix_mojibake(F.col("_orig"))))
    # NULL text: `text != _orig` is NULL, not False — coalesce so the
    # flag is NULL-total like the ngram kernel (ADVICE r3)
    return src.select(
        "doc_id",
        "text",
        F.coalesce(F.col("text") != F.col("_orig"), F.lit(False)).alias("changed"),
    )


def normalize_text_col(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """In-place variant for pipelines: replaces ``text_col`` with its
    mojibake-fixed + NFC form, preserving every other column."""
    return docs.withColumn(text_col, _nfc_udf()(fix_mojibake(F.col(text_col))))
