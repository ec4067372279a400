"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in pyspark.sql.functions (JVM-side,
whole-stage-codegen) — no per-row Python anywhere. Each operator is
SQL-mirrorable so the DuckDB oracle can verify it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"]

# tiny per-language character/stopword hints for the n-gram heuristic
_LANG_HINTS = {
    "en": ["the", "and", "is"],
    "de": ["der", "und", "ist"],
    "es": ["el", "los", "que"],
    "fr": ["le", "les", "est"],
}


def token_count(col: Column) -> Column:
    """Whitespace token count, codegen-friendly: no split/array materialize.
    Normalize runs of whitespace to single spaces, then tokens = spaces + 1."""
    t = F.trim(F.regexp_replace(col, r"\s+", " "))
    return F.when(F.length(t) == 0, F.lit(0).cast("long")).otherwise(
        (F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1).cast("long")
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_chars, n_stopwords, avg_token_len) — the building
    blocks of quality scoring. Pure built-ins; mirrored in SQL by
    replace/length arithmetic."""
    t = F.col(text_col)
    padded = F.concat(F.lit(" "), t, F.lit(" "))
    # tokens = spaces + 1 on single-space-separated text
    n_tokens = (
        F.length(t) - F.length(F.expr(f"replace({text_col}, ' ', '')")) + F.lit(1)
    ).cast("long")
    n_stop = None
    for w in STOPWORDS[:5]:
        occ = (
            (F.length(padded) - F.length(F.expr(f"replace(concat(' ', {text_col}, ' '), ' {w} ', '')")))
            / F.lit(len(w) + 2)
        ).cast("long")
        n_stop = occ if n_stop is None else (n_stop + occ)
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.length(t).cast("long").alias("n_chars"),
        n_stop.alias("n_stopwords"),
        F.round(F.length(t) / n_tokens, 6).alias("avg_token_len"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, quality): [0,1] heuristic — length band + stopword presence.
    Deterministic arithmetic only (SQL-mirrorable)."""
    s = text_stats(df, text_col, id_col)
    len_band = F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0))
    stop_ratio = F.least(
        F.col("n_stopwords") / F.greatest(F.col("n_tokens"), F.lit(1)) * 5.0,
        F.lit(1.0),
    )
    return s.select(
        F.col(id_col),
        F.round(0.5 * len_band + 0.5 * stop_ratio, 6).alias("quality"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, lang_pred): stopword-hit n-gram heuristic over a tiny per-language
    vocabulary; argmax with deterministic (count desc, lang asc) tie-break."""
    t = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    scores = []
    for lang, words in sorted(_LANG_HINTS.items()):
        sc = None
        for w in words:
            occ = (
                F.length(t)
                - F.length(F.expr(
                    f"replace(concat(' ', {text_col}, ' '), ' {w} ', '')"
                ))
            ) / F.lit(len(w) + 2)
            sc = occ if sc is None else sc + occ
        scores.append((lang, sc.cast("long")))
    # argmax via greatest + chained when (deterministic tie-break: first in
    # sorted-lang order wins on equal counts)
    best = F.greatest(*[s for _, s in scores])
    expr = None
    for lang, s in scores:
        cond = s == best
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return df.select(
        F.col(id_col),
        F.when(best > 0, expr).otherwise(F.lit("und")).alias("lang_pred"),
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, fp): 64-bit document fingerprint via xxhash64 of normalized text
    (lower, collapsed whitespace) — the exact-dedup key at scale."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.select(F.col(id_col), F.xxhash64(norm).alias("fp"))


def trigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 1.0,
) -> DataFrame:
    """(id, score): corpus-self-trained character-trigram fluency score —
    the cheap perplexity proxy training-data pipelines use for quality
    filtering (boilerplate/garbled text scores low against the corpus LM).
    score(d) = mean over d's trigrams of ln P(trigram), with
    P = (count + smoothing) / (total + smoothing·vocab) estimated on the
    WHOLE input (add-one smoothed unigram-of-trigrams model — deterministic,
    join-only, no training loop). Pure column program: explode trigrams,
    one global count table, one broadcastable join back."""
    t = F.lower(F.col(text_col))
    n = F.length(t) - 2
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.transform(
                # sequence(1, 0) DESCENDS in Spark — guard short texts with
                # an explicitly empty array
                F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
                    F.array().cast("array<int>")
                ),
                lambda i: t.substr(i, F.lit(3)),
            )
        ).alias("g"),
    )
    counts = grams.groupBy("g").agg(F.count("*").alias("c"))
    totals = counts.agg(
        F.sum("c").alias("tot"), F.count("*").alias("vocab")
    )
    scored = (
        grams.join(counts, "g")
        .crossJoin(F.broadcast(totals))
        .groupBy("id")
        .agg(
            F.avg(
                F.log(
                    (F.col("c") + F.lit(smoothing))
                    / (F.col("tot") + F.lit(smoothing) * F.col("vocab"))
                )
            ).alias("score")
        )
    )
    return df.select(F.col(id_col).alias("id")).join(
        scored, "id", "left"
    ).select("id", F.round(F.coalesce("score", F.lit(0.0)), 6).alias("score"))
