"""Text-analysis operators over a documents table
(doc_id, text, lang, source, n_chars).

Everything here is built-in pyspark.sql.functions only — JVM-side,
whole-stage-codegen, no Python in the plan — and each operator has a
bit-exact DuckDB oracle (see __spark_entry__.py): the expressions are
written against the shared portable subset (length/replace/
regexp/split/md5/hex-cast).

Portable 60-bit hash used across the dedup/text family:
  Spark : conv(substring(md5(x), 1, 15), 16, 10) :: long
  DuckDB: cast(('0x' || substr(md5(x), 1, 15)) as bigint)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def portable_hash64(col: Column) -> Column:
    """Deterministic 60-bit hash from md5 hex — reproducible in any SQL
    engine with md5 + hex parsing (the cross-engine contract)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def norm_text(col: Column) -> Column:
    """lower + collapse whitespace + trim — the canonical form every
    text-dedup operator keys on."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword proxy (runs of letters,
    digits, or single punctuation — the standard pre-tokenizer shape)."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)
            )
        ).cast("long").alias("n_subwords"),
        F.length("text").cast("long").alias("n_chars_measured"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features + composite score: length band,
    alpha ratio, punctuation density, uppercase shouting, mean word
    length. Mirrors the standard pretraining-corpus filters."""
    text = F.col("text")
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^.!?,;:]", ""))
    n_tokens = F.size(F.split(F.trim(text), r"\s+"))
    alpha_ratio = F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 4)
    upper_ratio = F.round(n_upper / F.greatest(n_alpha, F.lit(1)), 4)
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4)
    mean_word_len = F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 4)
    score = F.round(
        F.when(n_chars >= 200, F.lit(1.0)).otherwise(n_chars / 200.0)
        * alpha_ratio
        * (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0)))
        * (1.0 - F.least(upper_ratio * 2.0, F.lit(1.0))),
        4,
    )
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars_measured"),
        n_tokens.cast("long").alias("n_tokens"),
        alpha_ratio.alias("alpha_ratio"),
        upper_ratio.alias("upper_ratio"),
        punct_ratio.alias("punct_ratio"),
        mean_word_len.alias("mean_word_len"),
        score.alias("quality"),
    )


_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to "],
    "de": [" der ", " und ", " die ", " nicht "],
    "fr": [" le ", " et ", " les ", " des "],
    "es": [" el ", " de la ", " que ", " los "],
}


def _occurrences(text: Column, marker: str) -> Column:
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit(""))))
        / len(marker)
    ).cast("long")


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID (n-gram heuristic): count stopword-marker
    occurrences per language in the lowercased text; argmax with a
    deterministic tie-break on language code; 'und' when no marker hits."""
    text = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    scores = {
        lang: sum(
            (_occurrences(text, m) for m in markers), start=F.lit(0)
        ).alias(f"score_{lang}")
        for lang, markers in _LANG_MARKERS.items()
    }
    lang_col = (
        F.col("lang") if "lang" in docs.columns else F.lit(None).cast("string")
    ).alias("lang")
    out = docs.select("doc_id", lang_col, *scores.values())
    best = F.lit(0)
    for lang in _LANG_MARKERS:
        best = F.greatest(best, F.col(f"score_{lang}"))
    pred = F.lit("und")
    for lang in sorted(_LANG_MARKERS, reverse=True):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return out.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[F.col(f"score_{lang}") for lang in _LANG_MARKERS],
        pred.alias("pred_lang"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprints: md5 of normalized text (exact-dup key)
    plus the portable 60-bit hash (join-friendly long)."""
    norm = norm_text(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        portable_hash64(norm).alias("fp64"),
    )


def clean_html_docs(docs: DataFrame) -> DataFrame:
    """Reference CleanHtml(depth=5) over a deterministic pseudo-HTML
    wrap of each document (`app/spider/common/common.go:18-41`): strips
    style/script blocks, replaces tags with newlines, collapses
    whitespace runs — the whole chain is JVM regexp_replace (codegen),
    no Python in the plan."""
    from ..functions.html_clean import clean_html

    raw = F.concat(
        F.lit('<DIV id="c"><SCRIPT>track();</SCRIPT>'),
        F.col("text"),
        F.lit('<Style>.x{}</Style><P>tail</P></DIV>'),
    )
    cleaned = clean_html(raw, depth=5)
    return docs.select(
        "doc_id",
        F.md5(cleaned).alias("clean_md5"),
        F.length(cleaned).cast("long").alias("clean_len"),
    )
