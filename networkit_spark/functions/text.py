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


def _tokens(text_col: str) -> Column:
    """Whitespace-normalized token array (empty array for blank text)."""
    t = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, " ")
    )


def _word_grams(tokens: Column, k: int) -> Column:
    """Array of word k-grams (space-joined) via a higher-order transform —
    JVM-side, no explode needed for the within-doc fractions."""
    n = F.size(tokens)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + j) for j in range(k)]
        ),
    )


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/RefinedWeb-style repetition quality signals, per document:

      dup_2gram_frac / dup_3gram_frac — fraction of the document's word
        k-grams that are repeats of an earlier k-gram in the SAME document
        (1 - distinct/total). Pure array program (transform + array_distinct)
        — no shuffle at all for these two columns.
      top_token_frac — occurrences of the document's most frequent token /
        total tokens (boilerplate detector). Explode → two-level agg; the
        (id, token) pre-aggregation is the map-side-combine-friendly shape.
      dup_5gram_frac — fraction of the document's DISTINCT word 5-grams that
        occur in at least one other document (corpus-level near-duplication
        signal, the cheap exact-substring-dedup proxy). Explode distinct
        grams → one hash-shuffled df count → join back. At 100 TB the gram
        table is the shuffle key and hot grams are bounded by a df cap
        upstream (see ngram dedup); here df is exact.

    Rounds to 6 like every cross-engine float (CLAUDE.md rule 5).
    Training-pipeline op beyond the reference (round brief); no reference
    twin to cite.
    """
    toks = _tokens(text_col)
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks"))

    def dup_frac(k: int) -> Column:
        grams = _word_grams(F.col("toks"), k)
        tot = F.size(grams)
        return F.when(tot <= 0, F.lit(0.0)).otherwise(
            F.round(1.0 - F.size(F.array_distinct(grams)) / tot, 6)
        )

    within = base.select(
        "id",
        dup_frac(2).alias("dup_2gram_frac"),
        dup_frac(3).alias("dup_3gram_frac"),
    )

    tok_rows = base.select("id", F.explode("toks").alias("tok"))
    top = (
        tok_rows.groupBy("id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(F.round(F.max("c") / F.sum("c"), 6).alias("top_token_frac"))
    )

    doc_grams = base.select(
        "id", F.explode(F.array_distinct(_word_grams(F.col("toks"), 5))).alias("g")
    )
    gram_df = doc_grams.groupBy("g").agg(F.count("*").alias("df"))
    dup5 = (
        doc_grams.join(gram_df, "g")
        .groupBy("id")
        .agg(
            F.round(
                F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)) / F.count("*"), 6
            ).alias("dup_5gram_frac")
        )
    )

    return (
        within.join(top, "id", "left")
        .join(dup5, "id", "left")
        .select(
            F.col("id"),
            "dup_2gram_frac",
            "dup_3gram_frac",
            F.coalesce("top_token_frac", F.lit(0.0)).alias("top_token_frac"),
            F.coalesce("dup_5gram_frac", F.lit(0.0)).alias("dup_5gram_frac"),
        )
    )


def decontaminate(
    df: DataFrame,
    bench_pred: Column,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, contaminated 0/1): flag documents sharing any word k-gram with a
    held-out benchmark/eval subset (rows where bench_pred is true) — the
    standard pre-training decontamination pass. The eval gram set is tiny
    relative to the corpus, so it is BROADCAST and the flag is a broadcast
    left-semi join against the exploded training grams: no shuffle of the
    corpus at any scale. Benchmark rows flag themselves (they share their
    own grams) — callers typically drop them separately.
    Training-pipeline op beyond the reference (round brief)."""
    toks = _tokens(text_col)
    base = df.select(
        F.col(id_col).alias("id"), bench_pred.alias("is_bench"), toks.alias("toks")
    )
    grams = base.select(
        "id",
        "is_bench",
        F.explode(F.array_distinct(_word_grams(F.col("toks"), k))).alias("g"),
    )
    bench_grams = grams.filter("is_bench").select("g").distinct()
    hit = (
        grams.join(F.broadcast(bench_grams), "g", "left_semi")
        .select("id")
        .distinct()
        .withColumn("contaminated", F.lit(1).cast("long"))
    )
    return (
        base.select("id")
        .join(hit, "id", "left")
        .select(
            "id", F.coalesce("contaminated", F.lit(0).cast("long")).alias("contaminated")
        )
    )


# PII patterns — shared Java-regex/RE2 subset (no lookaround, no \p classes)
# so the SAME string drives both Spark and the DuckDB oracle.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_emails, n_ipv4, n_phones, scrubbed): the standard pre-training
    PII pass — count then mask emails / IPv4 literals / NANP-style phone
    numbers with <EMAIL> / <IP> / <PHONE> tokens. Counts are taken on the
    ORIGINAL text (mask order can't hide a category from its own counter);
    masking applies email → ip → phone (the patterns are mutually
    non-overlapping: an IPv4 needs three dots with 1-3 digit octets, a
    phone needs a 3-3-4 digit shape). Pure regexp column expressions —
    JVM-side, zero shuffle, trivially 100 TB-safe.
    Training-pipeline op beyond the reference (round brief)."""
    t = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_IPV4)).cast("long").alias("n_ipv4"),
        F.regexp_count(t, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        scrubbed.alias("scrubbed"),
    )
