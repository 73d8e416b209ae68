"""Text-analysis operators for LLM training-data pipelines
(SURVEY §2.12): tokenization, quality scoring, language ID,
fingerprinting, shingling. All pure JVM-side built-in expressions —
no Python UDFs in the hot path — so they whole-stage-codegen and scale
linearly with the scan.

Ratio/score outputs follow the exact-arithmetic policy
(lakeflow.functions.exact): integer micro-units at the operator
boundary so distributed results hash-match a single-node oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakeflow.functions.hashing import seeded_hash

# marker stopwords per language for the n-gram-free heuristic language ID
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "is", "and"],
    "de": ["der", "die", "und", "das", "ein"],
    "es": ["el", "los", "las", "y", "una"],
    "fr": ["le", "la", "les", "et", "une"],
    "zh": ["的", "是", "了"],
}
STOPWORDS = LANG_MARKERS["en"] + ["to", "in", "for", "on", "with"]


def tokens(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.split(F.trim(c), r"\s+")


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c))


def _in_list(value: Column, words: list[str]) -> Column:
    return F.array_contains(F.array([F.lit(w) for w in words]), value)


def word_hits(c: Column | str, words: list[str]) -> Column:
    """Occurrence count (with repeats) of any listed word among tokens."""
    return F.size(F.filter(tokens(c), lambda t: _in_list(t, words)))


def non_alnum_ratio(c: Column | str) -> Column:
    """Share of characters outside [a-zA-Z0-9 ] — punctuation/noise proxy."""
    c = F.col(c) if isinstance(c, str) else c
    clean = F.regexp_replace(c, "[^a-zA-Z0-9 ]", "")
    return (F.length(c) - F.length(clean)) / F.greatest(F.length(c), F.lit(1)).cast(
        "double"
    )


def quality_score(c: Column | str) -> Column:
    """Heuristic document quality in [0,1]: length signal + cleanliness +
    stopword density (natural-language-ness). Deterministic double expr."""
    nt = token_count(c).cast("double")
    stop_ratio = word_hits(c, STOPWORDS).cast("double") / F.greatest(
        token_count(c), F.lit(1)
    ).cast("double")
    return (
        F.lit(0.4) * F.least(nt / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - non_alnum_ratio(c))
        + F.lit(0.3) * F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
    )


def lang_scores(c: Column | str) -> dict[str, Column]:
    return {lang: word_hits(c, words) for lang, words in LANG_MARKERS.items()}


def lang_pred(scores: dict[str, Column]) -> Column:
    """Argmax with fixed priority order en>de>es>fr>zh on ties."""
    order = ["en", "de", "es", "fr", "zh"]
    expr = F.lit(order[-1])
    for i in range(len(order) - 2, -1, -1):
        lang = order[i]
        cond = None
        for other in order[i + 1 :]:
            c2 = scores[lang] >= scores[other]
            cond = c2 if cond is None else (cond & c2)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def normalized_fingerprint(c: Column | str) -> Column:
    """Rolling-noise-insensitive content fingerprint: lowercase, strip
    non-alphanumerics, collapse whitespace, md5 (SURVEY §2.12)."""
    c = F.col(c) if isinstance(c, str) else c
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), "[^a-z0-9 ]", " "), r"\s+", " "
        )
    )
    return F.md5(norm)


def shingles_from_tokens(toks: Column | str, n: int = 3) -> Column:
    """Array of word n-gram shingle strings from a PRE-SPLIT token array
    column (empty if fewer than n tokens). Keep the split in its own
    projection: inlining it here makes Catalyst re-evaluate the regex
    split once per element access — measured 10x slower at sf0.1."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    sz = F.size(toks)
    idx = F.when(sz >= n, F.sequence(F.lit(0), sz - n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(n)]),
    )


def explode_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, shingle) rows: tokenize in one projection, shingle+explode in
    the next."""
    pre = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    return pre.select(
        F.col(id_col), F.explode(shingles_from_tokens("__toks", n)).alias("s")
    )


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash per document over distinct tokens: per-bit +/-1
    votes from a seeded token hash, sign-aggregated. One explode + one
    hash-agg; no UDFs. Returns (id_col, simhash)."""
    ex = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    )
    h = seeded_hash(F.col("tok"), "sim")
    votes = [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(16)
    ]
    agg = ex.groupBy(id_col).agg(*votes)
    sim = None
    for j in range(16):
        bit = F.when(F.col(f"b{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = bit if sim is None else (sim + bit)
    return agg.select(F.col(id_col), sim.cast("long").alias("simhash"))
