"""BM25 retrieval + DSIR importance sampling vs pure-Python oracles."""

import math

import pytest
from pyspark.sql import functions as F

A, C, M = 1103515245, 12345, 2147483648


def _bm25_ref(docs, queries, k1=1.2, b=0.75):
    """(query, doc) -> score with the exact retrieval.py formula."""
    toks = {i: t.split() for i, t in docs}
    dl = {i: len(t) for i, t in toks.items()}
    n = float(len(docs))
    avgdl = sum(dl.values()) / n
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out = {}
    for q in queries:
        for i, t in toks.items():
            s = 0.0
            for term in sorted(set(q.split())):
                tf = t.count(term)
                if tf == 0 or term not in df:
                    continue
                idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
                s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl[i] / avgdl))
            if s > 0:
                out[(q, i)] = round(s, 6)
    return out


def test_bm25_matches_reference(spark):
    from networkit_spark.functions.retrieval import bm25_search

    docs = [
        (0, "spark spark join fast table"),
        (1, "join table scan row"),
        (2, "hash hash hash spark"),
        (3, "window stream batch"),
        (4, "spark join hash window"),
    ]
    queries = ["spark join", "hash window"]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = bm25_search(df, queries, k=3).collect()
    want = _bm25_ref(docs, queries)
    # scores match the reference formula
    for r in got:
        assert r["score"] == pytest.approx(
            want[(r["query"], r["doc_id"])], abs=2e-6
        )
    # ranks follow (score desc, id asc) within each query
    for q in queries:
        rows = sorted(
            [r for r in got if r["query"] == q], key=lambda r: r["rank"]
        )
        expect = sorted(
            [(i, s) for (qq, i), s in want.items() if qq == q],
            key=lambda x: (-x[1], x[0]),
        )[:3]
        assert [(r["doc_id"], r["score"]) for r in rows] == [
            (i, pytest.approx(s, abs=2e-6)) for i, s in expect
        ]


def test_bm25_no_match_query_absent(spark):
    from networkit_spark.functions.retrieval import bm25_search

    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")], ["doc_id", "text"]
    )
    got = bm25_search(df, ["zeta"], k=3).collect()
    assert got == []


def test_importance_sample_planted(spark):
    from networkit_spark.functions.sampling import importance_sample

    rows = [(0, 0.0), (1, 1.0), (2, 2.0), (3, 4.0)]
    df = spark.createDataFrame(rows, ["id", "score"])
    out = {
        r["id"]: r
        for r in importance_sample(df, "score", "id", seed=9, floor=0.05).collect()
    }
    for i, w in rows:
        p = round(0.05 + 0.95 * w / 4.0, 6)
        assert out[i]["accept_p"] == pytest.approx(p, abs=1e-9)
        u = ((i + 9) % M * A + C) % M
        assert out[i]["kept"] == (1 if u < p * M else 0)
    # degenerate corpus: all weights equal -> everything kept with p = 1
    same = spark.createDataFrame([(0, 2.0), (1, 2.0)], ["id", "score"])
    out2 = importance_sample(same, "score", "id").collect()
    assert all(r["accept_p"] == 1.0 and r["kept"] == 1 for r in out2)


def test_bm25_two_stage_topk_plan(spark):
    """The per-query top-k must be the two-stage salted pattern: a
    (query, _salt) window BEFORE the per-query window, so no hot query
    ever owns a whole-candidate sort task."""
    from networkit_spark.functions.retrieval import bm25_search

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta tok"), (F.col("id") % 7).cast("string")).alias(
            "text"
        ),
    )
    out = bm25_search(df, ["alpha beta"], k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly two Window operator nodes: the salted stage-1 and the final
    # per-query stage (WindowGroupLimit helper nodes don't count)
    assert plan.count("Window [") == 2
    assert "_salt" in plan
