import shutil
import tempfile

import pytest

from networkit_spark.graph import GraphDF
from networkit_spark.operators.components import connected_components
from networkit_spark.operators.pagerank import pagerank
from networkit_spark.plans.checkpoint import SuperstepCheckpointer

from tests.fixtures import KARATE_EDGES, KARATE_N, TINY_CC_EDGES, TINY_CC_N


@pytest.fixture()
def ckpt_dir():
    d = tempfile.mkdtemp(prefix="nk_ckpt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _scores(df):
    return {r["id"]: r["score"] for r in df.collect()}


def test_pagerank_resume_identical(spark, ckpt_dir):
    """Kill after superstep k, resume from checkpoint, identical final
    scores (north rule: resumable mid-iteration)."""
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    want = _scores(pagerank(g, tol=-1.0, max_iterations=10))

    # run 1: "crashes" after 4 supersteps (max_iterations caps it)
    ck = SuperstepCheckpointer(spark, ckpt_dir, "pagerank")
    pagerank(g, tol=-1.0, max_iterations=4, checkpointer=ck)
    assert ck.completed_steps() == [0, 1, 2, 3]

    # run 2: fresh checkpointer over the same dir resumes at superstep 4
    ck2 = SuperstepCheckpointer(spark, ckpt_dir, "pagerank")
    got = _scores(pagerank(g, tol=-1.0, max_iterations=10, checkpointer=ck2))
    assert ck2.completed_steps() == list(range(10))
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, v


def test_metrics_recorded(spark, ckpt_dir):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    ck = SuperstepCheckpointer(spark, ckpt_dir, "pagerank")
    pagerank(g, tol=1e-3, checkpointer=ck)
    m = ck.metrics()
    assert len(m) >= 2
    assert all("delta_norm" in row and "wall_ms" in row for row in m)
    assert all(row["lineage"] is not None for row in m)
    # delta norms decrease monotonically for pagerank on a fixed graph
    deltas = [row["delta_norm"] for row in m[1:]]
    assert deltas == sorted(deltas, reverse=True)


def test_cc_resume(spark, ckpt_dir):
    g = GraphDF.from_edge_list(spark, TINY_CC_EDGES, num_nodes=TINY_CC_N)
    want = {r["id"]: r["component"] for r in connected_components(g).collect()}
    ck = SuperstepCheckpointer(spark, ckpt_dir, "cc")
    connected_components(g, max_iterations=1, checkpointer=ck)
    ck2 = SuperstepCheckpointer(spark, ckpt_dir, "cc")
    got = {
        r["id"]: r["component"]
        for r in connected_components(g, checkpointer=ck2).collect()
    }
    assert got == want


def test_incomplete_step_ignored(spark, ckpt_dir):
    import os

    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    ck = SuperstepCheckpointer(spark, ckpt_dir, "pagerank")
    pagerank(g, tol=-1.0, max_iterations=3, checkpointer=ck)
    # simulate a crash mid-write: step=3 dir exists but no _DONE marker
    broken = os.path.join(ck.state_dir, "step=3", "rank")
    os.makedirs(broken)
    ck2 = SuperstepCheckpointer(spark, ckpt_dir, "pagerank")
    assert ck2.completed_steps() == [0, 1, 2]
    assert ck2.latest_state()["superstep"] == 2
