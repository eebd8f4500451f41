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
from pyspark.sql.window import Window


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


# PII scrub rules, applied IN ORDER as a redaction chain: each stage's
# count is measured on the PREVIOUS stage's output, so an ipv4-looking
# substring inside an already-redacted email is not double-counted and
# the counts always equal the number of replacements actually made.
# Regexes are written in the Java-regex ∩ RE2 shared dialect (no
# backrefs, no lookaround, char classes + bounded/greedy quantifiers
# only — both engines resolve these greedy matches leftmost-longest),
# so the DuckDB oracle runs the SAME patterns.
_PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (
        "ipv4",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
    # international-format numbers only (leading +): an unanchored
    # digit-run rule would eat ids/quantities wholesale
    ("phone", r"\+[0-9][0-9()\- ]{6,}[0-9]", "<PHONE>"),
]


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect + redact PII (emails, IPv4 addresses, intl phone numbers)
    — the standard pre-training scrub pass. Pure JVM regexp expressions
    (codegen, no Python in the plan); per-category counts plus the
    redacted text. Beyond-reference training-data operator
    (BASELINE.json first-class additions)."""
    from ..session import spread_scan

    stage = F.col(text_col)
    counts = []
    for name, pattern, repl in _PII_RULES:
        counts.append(
            F.size(F.regexp_extract_all(stage, F.lit(pattern), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        stage = F.regexp_replace(stage, pattern, repl)
    # spread (guide §6): the chained regex scan per document otherwise
    # runs on one task for a single-row-group input; no-op when wide
    return spread_scan(docs).select(
        "doc_id", *counts, stage.alias("text_clean")
    )


def decontaminate(
    docs: DataFrame, benchmark: DataFrame, n: int = 8
) -> DataFrame:
    """Benchmark decontamination: drop every document sharing ANY word
    ``n``-gram with the benchmark/eval set (the Lee et al. / GPT-3
    appendix-C style overlap rule). Scale shape: the benchmark side is
    tiny by definition (an eval set), so its distinct shingle set is
    BROADCAST and the probe is a map-side left-semi — the 100 TB corpus
    is never shuffled; only the matched doc_ids (small) hit a shuffle
    for the final anti-join.

    Returns the surviving rows of ``docs`` unchanged.
    """
    from .dedup import word_shingles

    bench_sh = word_shingles(benchmark, n=n).select("shingle").distinct()
    doc_sh = word_shingles(docs, n=n)
    hit = (
        doc_sh.join(F.broadcast(bench_sh), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return docs.join(hit, "doc_id", "left_anti")


def repetition_stats(
    docs: DataFrame, n: int = 2, text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals: duplicate-line counts and the
    most-frequent word ``n``-gram's share — the standard filters for
    boilerplate/spam in a pretraining corpus. Line stats are pure
    map-side array ops (split / array_distinct); the top-n-gram pass is
    explode → two hash aggregations on (doc_id[, gram]) — one shuffle,
    partial-aggregated map-side. All counts are INTEGERS (the
    ``*_frac`` ratios are convenience doubles; exactness-critical
    consumers — and the DuckDB gate — use the counts)."""
    from ..session import spread_scan

    # materialize both splits ONCE per doc in their own projection —
    # referencing the split expression inside the gram lambda would
    # re-tokenize the document per gram index (O(len²) per doc;
    # measured ~2× on the sf0.1 gate). Narrow scans spread to the core
    # count first (guide §6): the tokenize + gram explode is the
    # dominant map-side cost and serializes on one task otherwise.
    pre = spread_scan(docs).select(
        "doc_id",
        F.split(F.col(text_col), "\n").alias("_lines"),
        F.split(F.trim(text_col), r"\s+").alias("_w"),
    )
    w = F.col("_w")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(w, i, n)),
    )
    line_stats = pre.select(
        "doc_id",
        F.size("_lines").cast("long").alias("n_lines"),
        (F.size("_lines") - F.size(F.array_distinct("_lines")))
        .cast("long").alias("dup_lines"),
        F.explode(grams).alias("_g"),
    )
    per_gram = line_stats.groupBy("doc_id", "n_lines", "dup_lines", "_g").agg(
        F.count("*").alias("_c")
    )
    agg = per_gram.groupBy("doc_id", "n_lines", "dup_lines").agg(
        F.max("_c").cast("long").alias("top_ngram_count"),
        F.sum("_c").cast("long").alias("n_ngrams"),
    )
    return agg.select(
        "doc_id", "n_lines", "dup_lines", "top_ngram_count", "n_ngrams",
        (F.col("dup_lines") / F.col("n_lines")).alias("dup_line_frac"),
        (F.col("top_ngram_count") / F.col("n_ngrams")).alias("top_ngram_frac"),
    )


def exact_substring_stats(
    docs: DataFrame,
    k: int = 50,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """ExactSubstr dedup signals (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499):
    for every document, how many tokens sit inside a ``k``-token
    window whose exact text occurs ``min_count``+ times anywhere in
    the corpus (within-doc repeats count — the paper removes those
    too). The paper builds a corpus suffix array; the distributed
    re-expression is sliding window fingerprints, which finds the
    same duplicated-span coverage for spans >= k tokens:

    1. one map-side projection tokenizes each doc ONCE and emits
       ``md5`` fingerprints of every k-token window (the gram text
       never leaves the task — only the 32-char digest shuffles);
       md5 rather than xxhash64 so a SQL oracle replays it bit-exactly;
    2. one partial-aggregated shuffle on the fingerprint counts
       corpus-wide occurrences; positions equi-join the >=min_count
       survivors on the same key (AQE reuses the hash partitioning);
    3. one shuffle back on doc_id merges the surviving windows into
       covered-token counts: window positions are intervals
       ``[pos, pos+k)``; with ``lead(pos)`` the union length is
       ``sum(least(next-pos, k, doc_end-pos+1))`` — no interval list
       ever materializes on the driver.

    Every stage is linear in corpus tokens (the honest cost of exact
    substring dedup; MinHash/SimHash are the cheaper approximate
    tiers). All counts are integers; ``dup_frac`` is a convenience
    ratio — filter with ``dup_frac >= 0.x`` or drop exact spans
    downstream. Docs with no duplicated window are returned with 0s.
    """
    # window fingerprints WITHOUT a higher-order lambda: explode the
    # start positions, then md5(concat_ws(slice)) in a plain projection
    # — stays inside whole-stage codegen (the F.transform form of the
    # same expressions runs interpreted per window: 7× slower measured
    # at sf0.1). Generate + projection fuse into one map stage; _w is
    # pruned right after the gram is built, so nothing array-typed
    # shuffles.
    from ..session import spread_scan

    # spread a narrow doc scan to the core count (guide §6) BEFORE the
    # gram stage — it runs twice (once per join side), so a one-task
    # scan pays the whole tokenize+md5 cost serially, twice
    docs = spread_scan(docs)
    w = F.col("_w")
    positions = (
        docs.select("doc_id", F.split(F.trim(text_col), r"\s+").alias("_w"))
        .select(
            "doc_id",
            "_w",
            F.size(w).cast("long").alias("n_tokens"),
            F.explode(
                F.sequence(
                    F.lit(1), F.greatest(F.size(w) - (k - 1), F.lit(1))
                )
            ).alias("pos"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "pos",
            F.md5(F.concat_ws(" ", F.slice(w, F.col("pos"), k))).alias("_h"),
        )
    )
    # duplicate windows via a count(*) pre-aggregate joined back to the
    # positions — NOT collect_list per fingerprint: a boilerplate
    # fingerprint shared by millions of docs would build one giant
    # array in a single task (a join spreads the same rows across
    # tasks; the array lands on one straggler). count(*) partial-
    # aggregates map-side, the surviving-fingerprint set is small, and
    # AQE reuses the hash partitioning for the equi-join. The gram
    # stage runs twice (once per join side) — a linear map stage,
    # deliberately recomputed rather than persisting O(corpus tokens).
    dup_keys = (
        positions.groupBy("_h")
        .agg(F.count("*").alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("_h")
    )
    dup_pos = positions.join(dup_keys, "_h").select(
        "doc_id", "n_tokens", "pos"
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    covered = (
        dup_pos.select(
            "doc_id",
            "n_tokens",
            "pos",
            F.lead("pos").over(win).alias("_next"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.least(
                F.coalesce(F.col("_next") - F.col("pos"), F.lit(k)),
                F.lit(k),
                F.col("n_tokens") - F.col("pos") + 1,
            ).alias("_cov"),
        )
        .groupBy("doc_id", "n_tokens")
        .agg(
            F.count("*").cast("long").alias("dup_windows"),
            F.sum("_cov").cast("long").alias("dup_tokens"),
        )
    )
    # zero-fill docs with no duplicated window from a cheap re-scan
    # (doc_id + token count only — no gram work on this branch)
    base = docs.select(
        "doc_id",
        F.size(F.split(F.trim(text_col), r"\s+")).cast("long").alias(
            "n_tokens"
        ),
    )
    return base.join(covered, ["doc_id", "n_tokens"], "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("dup_windows", F.lit(0).cast("long")).alias("dup_windows"),
        F.coalesce("dup_tokens", F.lit(0).cast("long")).alias("dup_tokens"),
        (
            F.coalesce("dup_tokens", F.lit(0).cast("long"))
            / F.greatest("n_tokens", F.lit(1).cast("long"))
        ).alias("dup_frac"),
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
    from ..session import spread_scan

    # spread (guide §6): the regexp_replace chain per document runs on
    # one task for a narrow single-row-group scan; no-op when wide
    return spread_scan(docs).select(
        "doc_id",
        F.md5(cleaned).alias("clean_md5"),
        F.length(cleaned).cast("long").alias("clean_len"),
    )


def main_content(
    docs: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Readability-style main-content extraction — boilerplate removal
    for a web-scale text pipeline, with the reference's exact heuristic
    (`baidunews.go:183-216` commonPrase/findP): climb from the page's
    last h1/h2/h3 to the nearest ancestor whose subtree contains a
    ``<p>`` and keep that container's inner HTML; nav bars, sidebars
    and footers outside it are dropped. Returns ``(id_col, content)``.

    The page parse cannot be a JVM expression, so this is the sanctioned
    slow path done right: ONE Arrow-batched pandas UDF (never per-row
    Python), embarrassingly parallel, no shuffle — the same shape as the
    engine's fused extraction kernel. Chain
    ``functions.html_clean.clean_html(F.col("content"), 5)`` after it
    for the reference's text-only form."""
    from pyspark.sql.functions import pandas_udf

    from ..functions.content import common_parse

    # lambda form: this module uses `from __future__ import annotations`,
    # under which decorator-style pd.Series annotations don't resolve
    _mc = pandas_udf(
        lambda s: s.map(
            lambda v: common_parse(v) if isinstance(v, str) else ""
        ),
        "string",
    )
    from ..session import spread_scan

    # spread (guide §6): one Arrow python stage inherits the scan's
    # width — a one-row-group input would run a single python worker
    return spread_scan(docs).select(id_col, _mc(html_col).alias("content"))


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k retrieval over the corpus — the keyword-search half
    of a curation stack (retrieval-based decontamination, seed-doc
    expansion, quality probes). One full map-side scan + one single-row
    global aggregate + a top-k: no per-term shuffle, no inverted-index
    materialization — per-document term frequencies are
    ``size(filter(tokens, ...))`` higher-order expressions (whole-stage
    codegen), corpus stats ride a broadcast 1-row crossJoin, and the
    final ``ORDER BY ... LIMIT k`` is a TakeOrdered, not a full sort.
    At 100 TB this is one pass over the text column.

    Cross-engine exactness (the DuckDB gate hashes doubles): k1=1.2 /
    b=0.75 are folded into the decimal literals 2.2 / 0.3 / 0.9, the
    classic log-idf is replaced by the raw Robertson–Sparck-Jones odds
    ``(N - df + 0.5) / (df + 0.5)`` (same ranking direction, no
    libm-log ULP divergence), every input to every division is an
    exact integer, and the per-term contributions are summed in FIXED
    term order — identical IEEE ops on identical ints in both engines.

    Tokenization: lowercase whitespace split (the ``token_count``
    n_tokens convention). Ties break on ascending id; zero-score
    documents (no query term present) are excluded.
    """
    terms = [str(t).lower() for t in query_terms]
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    dl = F.size(toks).cast("long")

    def _eq(term):
        # one-arg closure: a defaulted second lambda param would make
        # pyspark pick the (element, index) higher-order form
        return lambda x: x == F.lit(term)

    from ..session import spread_scan

    # spread (guide §6): the per-term filter() HOFs are interpreted and
    # the per_doc projection is evaluated on BOTH the stats and scored
    # branches — a one-task scan pays that serially, twice
    per_doc = spread_scan(docs).select(
        F.col(id_col),
        dl.alias("_dl"),
        *[
            F.size(F.filter(toks, _eq(t))).cast("long").alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count("*").cast("long").alias("_n"),
        F.sum("_dl").alias("_tot"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}").cast("double")
        idf = (
            (F.col("_n") - F.col(f"_df{i}")).cast("double") + F.lit(0.5)
        ) / (F.col(f"_df{i}").cast("double") + F.lit(0.5))
        denom = (
            tf
            + F.lit(0.3)
            + F.lit(0.9)
            * (F.col("_dl") * F.col("_n")).cast("double")
            / F.col("_tot").cast("double")
        )
        contrib = idf * (tf * F.lit(2.2)) / denom
        score = contrib if score is None else score + contrib
    return (
        scored.select(id_col, score.alias("_score"))
        .where(F.col("_score") > 0)
        .orderBy(F.desc("_score"), F.asc(id_col))
        .limit(k)
        # rank on the raw double (bit-identical cross-engine), round
        # only the emitted value (the sim_cosine_topk convention)
        .select(id_col, F.round("_score", 6).alias("score"))
    )


# Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", §A1.1 — the
# standard rule-based pretraining filter). All pure JVM: split /
# higher-order array functions / occurrence counting, no UDFs.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _gopher_cols(text_col: str) -> dict:
    """The rule metrics as row-local Column expressions (shared by the
    metrics view and the filter, so the filter is a plain where() with
    no join/shuffle)."""
    text = F.col(text_col)
    words = F.split(F.trim(text), r"\s+")
    n_words = F.size(words)
    nw = F.greatest(n_words, F.lit(1))
    sum_wlen = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_wl = F.round(sum_wlen / nw, 4)
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ell = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / 3
    symbol_ratio = F.round((n_hash + n_ell) / nw, 4)
    lines = F.split(text, "\n")
    nl = F.greatest(F.size(lines), F.lit(1))
    bullet_lines = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*\u2022]"))
    )
    ell_lines = F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.$")))
    bullet_frac = F.round(bullet_lines / nl, 4)
    ell_frac = F.round(ell_lines / nl, 4)
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_frac = F.round(alpha_words / nw, 4)
    low = F.transform(words, lambda w: F.lower(w))
    stop_hits = sum(
        (
            F.when(F.array_contains(low, sw), F.lit(1)).otherwise(F.lit(0))
            for sw in GOPHER_STOPWORDS
        ),
        start=F.lit(0),
    ).cast("int")
    gopher_pass = (
        n_words.between(50, 100000)
        & mean_wl.between(3.0, 10.0)
        & (symbol_ratio <= 0.1)
        & (bullet_frac < 0.9)
        & (ell_frac <= 0.3)
        & (alpha_frac >= 0.8)
        & (stop_hits >= 2)
    )
    return {
        "n_words": n_words.cast("long"),
        "mean_word_len": mean_wl,
        "symbol_ratio": symbol_ratio,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ell_frac,
        "alpha_word_frac": alpha_frac,
        "stop_hits": stop_hits,
        "gopher_pass": gopher_pass,
    }


def gopher_rules(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Gopher rule metrics + pass flag:

    * 50 <= word count <= 100000
    * 3 <= mean word length <= 10
    * symbol-to-word ratio ('#' or '...') <= 0.1
    * < 90% of lines starting with a bullet ('-' / '*' / U+2022);
      <= 30% of lines ending with '...'
    * >= 80% of words contain an alphabetic character
    * >= 2 distinct stop words from {the be to of and that have with}

    Ratios round to 4 places so the DuckDB oracle restatement is
    bit-identical."""
    cols = _gopher_cols(text_col)
    return docs.select(
        "doc_id", *(c.alias(name) for name, c in cols.items())
    )


def gopher_filter(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep only rule-passing documents (the curation-pipeline step):
    a row-local where() — one scan, no join, no shuffle."""
    return docs.where(_gopher_cols(text_col)["gopher_pass"])


# URL parsing for curation is regexp-based rather than F.parse_url so a
# SQL oracle replays it bit-exactly (same tradeoff as md5-over-xxhash):
# scheme://authority[/path][?query][#fragment], lowercased upstream
_URL_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]*)"
_URL_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)"
_URL_QUERY_RE = r"\?([^#]*)"
_TRACKING_QUERY_RE = (
    r"(^|&)(utm_[a-z]+|gclid|fbclid|sessionid|phpsessid|sid)="
)


def url_quality_flags(
    df: DataFrame,
    url_col: str = "url",
    blocked_domains=(),
    allowed_tlds=("com", "org", "net", "edu", "gov", "io"),
    max_url_len: int = 512,
    max_path_depth: int = 8,
    max_digit_frac: float = 0.4,
) -> DataFrame:
    """URL-based curation signals — the web-corpus filtering stage that
    runs BEFORE any text is read (RefinedWeb §3.1 / FineWeb both gate
    on URL blocklists + heuristics; the reference engine's analog is
    the LinkRule pattern gate, spiderspec routing):

    * ``blocked_domain`` — registrable-ish domain (last two host
      labels) in the blocklist. Pass a sequence for a literal IN (small
      lists fold into codegen); pass a one-column DataFrame for a
      broadcast join (the UT1-scale path: ~4M domains is a dim, never
      a literal).
    * ``bad_tld`` — TLD outside the allowlist.
    * ``too_long`` — overall URL length (spam/tracking tails).
    * ``deep_path`` — path depth beyond ``max_path_depth`` (calendar /
      faceted-navigation traps).
    * ``tracking_query`` — utm_*/gclid/fbclid/session-id parameters.
    * ``digit_heavy_path`` — digit fraction of the path above
      ``max_digit_frac`` (id-soup URLs: galleries, session paths).
    * ``url_keep`` — none of the above.

    Row-local regexp/string expressions only (one scan, no UDF, no
    shuffle except the optional broadcast blocklist join); ratios round
    to 4 places for the cross-engine contract."""
    u = F.lower(F.trim(F.col(url_col)))
    host = F.regexp_replace(
        F.regexp_extract(u, _URL_HOST_RE, 1), r":\d+$", ""
    )
    labels = F.split(host, r"\.")
    tld = F.element_at(labels, -1)
    domain = F.when(
        F.size(labels) >= 2,
        F.concat(F.element_at(labels, -2), F.lit("."), tld),
    ).otherwise(host)
    path = F.regexp_extract(u, _URL_PATH_RE, 1)
    query = F.regexp_extract(u, _URL_QUERY_RE, 1)
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    digit_frac = F.round(
        F.length(F.regexp_replace(path, r"[^0-9]", ""))
        / F.greatest(F.length(path), F.lit(1)),
        4,
    )
    out = df.withColumns({"_host": host, "_domain": domain})
    if isinstance(blocked_domains, DataFrame):
        dim = blocked_domains.toDF("_bd").withColumn(
            "_blocked", F.lit(True)
        )
        out = (
            out.join(
                F.broadcast(dim), out["_domain"] == dim["_bd"], "left"
            )
            .drop("_bd")
            .withColumn(
                "blocked_domain",
                F.coalesce(F.col("_blocked"), F.lit(False)),
            )
            .drop("_blocked")
        )
    else:
        out = out.withColumn(
            "blocked_domain",
            F.col("_domain").isin(list(blocked_domains))
            if blocked_domains
            else F.lit(False),
        )
    flags = {
        "bad_tld": ~tld.isin(list(allowed_tlds)),
        "too_long": F.length(u) > max_url_len,
        "deep_path": depth > max_path_depth,
        "tracking_query": query.rlike(_TRACKING_QUERY_RE),
        "digit_heavy_path": digit_frac > max_digit_frac,
    }
    out = out.withColumns(flags)
    keep = ~F.col("blocked_domain")
    for name in flags:
        keep = keep & ~F.col(name)
    return (
        out.withColumn("url_keep", keep)
        .withColumnsRenamed({"_host": "url_host", "_domain": "url_domain"})
    )


def url_filter(df: DataFrame, url_col: str = "url", **kwargs) -> DataFrame:
    """Keep only rows whose URL passes every signal (the pipeline step
    form of :func:`url_quality_flags`); signal columns are dropped."""
    flagged = url_quality_flags(df, url_col=url_col, **kwargs)
    return flagged.where(F.col("url_keep")).select(*df.columns)
