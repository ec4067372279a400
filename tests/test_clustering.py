"""k-means / semantic-dedup / PII-scrub kernels vs pure-numpy oracles on
planted fixtures (same determinism contract as the rest of the suite:
LCG seeding, rounded floats, id tie-breaks)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

A, C, M = 1103515245, 12345, 2147483648


def _numpy_kmeans(ids, vecs, k, iterations, seed):
    """Reference Lloyd with the EXACT clustering.py rules: LCG-order init,
    assignment by round(cos, 6) argmax with min-ctid tie-break, per-dim
    means rounded to 6 each update."""
    order = sorted(range(len(ids)), key=lambda j: (((ids[j] + seed) * A + C) % M, ids[j]))
    cents = {ids[j]: vecs[j].astype(float) for j in order[:k]}

    def assign(cents):
        out = {}
        for j, i in enumerate(ids):
            best = None
            for ct in sorted(cents):
                cv = cents[ct]
                cos = round(
                    float(np.dot(vecs[j], cv))
                    / (np.linalg.norm(vecs[j]) * np.linalg.norm(cv)),
                    6,
                )
                # max cos, then min ctid (sorted order makes > strict)
                if best is None or cos > best[0]:
                    best = (cos, ct)
            out[i] = best
        return out

    for _ in range(iterations):
        asg = assign(cents)
        new = {}
        for ct in set(c for _, c in asg.values()):
            members = np.stack(
                [vecs[j] for j, i in enumerate(ids) if asg[i][1] == ct]
            ).astype(float)
            new[ct] = np.round(members.mean(axis=0), 6)
        cents = new
    return assign(cents)


def test_kmeans_matches_numpy_lloyd(spark):
    from networkit_spark.functions.clustering import kmeans

    rng = np.random.RandomState(3)
    # two planted blobs + noise, 20 vectors, dim 6
    base = np.vstack(
        [
            rng.normal(0, 0.05, (8, 6)) + np.array([1, 0, 0, 0, 0, 0]),
            rng.normal(0, 0.05, (8, 6)) + np.array([0, 1, 0, 0, 0, 0]),
            rng.normal(0, 0.4, (4, 6)) + 0.5,
        ]
    )
    ids = list(range(20))
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in ids], ["vec_id", "embedding"]
    )
    got = {
        r["id"]: (r["cos"], r["cell"])
        for r in kmeans(df, k=3, iterations=2, seed=42).collect()
    }
    want = _numpy_kmeans(ids, base, k=3, iterations=2, seed=42)
    for i in ids:
        assert got[i][1] == want[i][1], f"cell mismatch at {i}"
        assert got[i][0] == pytest.approx(want[i][0], abs=2e-6)


def test_semantic_dedup_planted(spark):
    from networkit_spark.functions.clustering import kmeans, semantic_dedup

    # ids 0-2: one tight bundle (pairwise cos ~1); ids 3-4: another; 5-6 far
    rows = [
        (0, [1.0, 0.0, 0.0, 0.01]),
        (1, [1.0, 0.01, 0.0, 0.0]),
        (2, [0.99, 0.0, 0.01, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.02]),
        (4, [0.0, 0.99, 0.01, 0.0]),
        (5, [0.0, 0.0, 1.0, 0.0]),
        (6, [0.0, 0.01, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    # one shared cell: the threshold alone decides (cross-bundle cos ≈ 0)
    one_cell = df.select(F.col("vec_id").alias("id"), F.lit(0).alias("cell"))
    out = {
        r["id"]: (r["survivor"], r["is_survivor"])
        for r in semantic_dedup(df, one_cell, 0.9).collect()
    }
    assert out[0] == (0, True)
    assert out[1] == (0, False) and out[2] == (0, False)
    assert out[3] == (3, True) and out[4] == (3, False)
    assert out[5] == (5, True) and out[6] == (6, True)

    # cell restriction prunes: same threshold, but 1 and 2 quarantined in
    # their own cells -> they survive despite being near-dups of 0
    cells = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 2), (3, 0), (4, 0), (5, 0), (6, 0)],
        ["id", "cell"],
    )
    out2 = {
        r["id"]: r["is_survivor"]
        for r in semantic_dedup(df, cells, 0.9).collect()
    }
    assert out2[1] and out2[2] and out2[0]
    assert not out2[4]  # 3-4 still collapse inside cell 0

    # composes with kmeans() output shape end-to-end (values engine-checked
    # by the driver oracle; here just schema/na-free)
    asg = kmeans(df, k=4, iterations=2, seed=42)
    sd = semantic_dedup(df, asg.select("id", "cell"), 0.9).collect()
    assert len(sd) == 7 and all(r["survivor"] is not None for r in sd)


def test_pii_scrub_planted(spark):
    from networkit_spark.functions.text import pii_scrub

    rows = [
        (0, "mail me at jane.doe+x@sub.example.co or call 415-555-0199 now"),
        (1, "server at 10.0.200.255 and 192.168.1.1 replied"),
        (2, "no pii here, just 1234 and a.b and x@y (not an email)"),
        (3, "two mails a@b.io c@d.org one phone 212 555 0000"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["id"]: r for r in pii_scrub(df).collect()}
    assert (out[0]["n_emails"], out[0]["n_ipv4"], out[0]["n_phones"]) == (1, 0, 1)
    assert out[0]["scrubbed"] == "mail me at <EMAIL> or call <PHONE> now"
    assert (out[1]["n_emails"], out[1]["n_ipv4"], out[1]["n_phones"]) == (0, 2, 0)
    assert out[1]["scrubbed"] == "server at <IP> and <IP> replied"
    assert (out[2]["n_emails"], out[2]["n_ipv4"], out[2]["n_phones"]) == (0, 0, 0)
    assert out[2]["scrubbed"] == rows[2][1]
    assert (out[3]["n_emails"], out[3]["n_ipv4"], out[3]["n_phones"]) == (2, 0, 1)
    assert out[3]["scrubbed"] == "two mails <EMAIL> <EMAIL> one phone <PHONE>"


def test_kmeans_assignment_plan_broadcast_no_window(spark):
    """Cell assignment must be a broadcast join + struct-max agg — no
    window operator (no per-id sort task), centroids on the broadcast
    side."""
    from networkit_spark.functions.clustering import kmeans

    df = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 5).cast("double"),
            (F.col("id") % 3).cast("double"),
            F.lit(1.0),
        ).alias("embedding"),
    )
    out = kmeans(df, k=3, iterations=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Broadcast" in plan
