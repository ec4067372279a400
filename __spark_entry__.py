"""Driver contract for the spark-graft builder (PySpark target).

Every `queries()` entry has a DuckDB `oracle_sql()` twin producing
IDENTICAL rows (same column names, BIGINT/DOUBLE types, floats rounded to
6 decimals on both sides). Iterative kernels run a FIXED number of
supersteps here so the oracle can unroll the same iterations as CTEs;
convergence-mode semantics are covered by the pytest suite against numpy
oracles (tests/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF
from networkit_spark.session import tune_for_iteration
from networkit_spark.sources import tpch_graph as tg
from networkit_spark.sources.transcripts import (
    mint_ids,
    reply_pairs,
    synthesize_transcripts,
    transcripts_sql,
)

N_CONVS = 400  # transcripts scale for the driver gate (deterministic)
PR_ITERS_CS = 15
PR_ITERS_TR = 10
PLP_SWEEPS = 4
DAMPING = 0.85


# ===================================================================== Spark
def _round6(df: DataFrame, *cols: str) -> DataFrame:
    out = df
    for c in cols:
        out = out.withColumn(c, F.round(F.col(c), 6))
    return out


def q_pagerank_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.pagerank import pagerank_fixed

    tune_for_iteration(spark)
    g = tg.customer_supplier_graph(spark, sf_dir)
    out = pagerank_fixed(g, damping=DAMPING, iterations=PR_ITERS_CS)
    return _round6(out, "score").orderBy("id")


def q_wcc_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.components import weakly_connected_components

    tune_for_iteration(spark)
    g = tg.customer_supplier_graph(spark, sf_dir)
    return weakly_connected_components(g).orderBy("id")


def q_plp_supplier_co(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.plp import plp_fixed

    tune_for_iteration(spark)
    g = tg.supplier_co_graph(spark, sf_dir)
    return plp_fixed(g, iterations=PLP_SWEEPS).orderBy("id")


def q_triangles_supplier_co(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.triangles import triangle_counts

    tune_for_iteration(spark)
    g = tg.supplier_co_graph(spark, sf_dir)
    return triangle_counts(g).orderBy("id")


def q_lcc_supplier_co(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.triangles import local_clustering_coefficient

    tune_for_iteration(spark)
    g = tg.supplier_co_graph(spark, sf_dir)
    return _round6(local_clustering_coefficient(g), "lcc").orderBy("id")


def q_degrees_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tg.customer_supplier_graph(spark, sf_dir)
    deg = g.degrees().withColumnRenamed("degree", "out_degree")
    ind = g.in_degrees()
    wdeg = g.weighted_degrees().withColumnRenamed("wdeg", "wdeg_out")
    return (
        deg.join(ind, "id")
        .join(wdeg, "id")
        .select(
            "id",
            F.col("out_degree").cast("long").alias("out_degree"),
            F.col("in_degree").cast("long").alias("in_degree"),
            F.round("wdeg_out", 6).alias("wdeg_out"),
        )
        .orderBy("id")
    )


def q_transcripts_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = synthesize_transcripts(spark, N_CONVS)
    return t.select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts_off"
    ).orderBy("conv_id", "turn_idx")


def q_transcripts_reply_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = synthesize_transcripts(spark, N_CONVS)
    _, edges = mint_ids(reply_pairs(t))
    return edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long"), "weight"
    ).orderBy("src", "dst")


def q_pagerank_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.pagerank import pagerank_fixed

    tune_for_iteration(spark)
    t = synthesize_transcripts(spark, N_CONVS)
    _, edges = mint_ids(reply_pairs(t))
    g = GraphDF.from_edges(edges, directed=True, weighted=True)
    out = pagerank_fixed(g, damping=DAMPING, iterations=PR_ITERS_TR)
    return _round6(out, "score").orderBy("id")


def q_dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.functions.dedup import exact_duplicates

    docs = tg.load(spark, sf_dir, "documents")
    return exact_duplicates(docs).orderBy("keep_id")


def q_text_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.functions.text import text_stats

    docs = tg.load(spark, sf_dir, "documents")
    return text_stats(docs).orderBy("doc_id")


def q_knn_cosine_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.functions.similarity import knn_bruteforce

    emb = tg.load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    out = knn_bruteforce(emb, queries, k=5)
    return out.select(
        F.col("qid").cast("long"),
        F.col("cid").cast("long"),
        "cos",
        F.col("rank").cast("long").alias("rank"),
    ).orderBy("qid", "rank")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pagerank_customer_supplier": q_pagerank_customer_supplier,
        "wcc_customer_supplier": q_wcc_customer_supplier,
        "plp_supplier_co": q_plp_supplier_co,
        "triangles_supplier_co": q_triangles_supplier_co,
        "lcc_supplier_co": q_lcc_supplier_co,
        "degrees_customer_supplier": q_degrees_customer_supplier,
        "transcripts_table": q_transcripts_table,
        "transcripts_reply_edges": q_transcripts_reply_edges,
        "pagerank_transcripts": q_pagerank_transcripts,
        "dedup_exact_documents": q_dedup_exact_documents,
        "text_stats_documents": q_text_stats_documents,
        "knn_cosine_embeddings": q_knn_cosine_embeddings,
    }


# ================================================================ oracle SQL
def _mat(sql: str) -> str:
    """Force CTE materialization in DuckDB — inlined CTE chains re-evaluate
    the whole unrolled iteration pyramid (77s → 0.2s on the sf0.01 pagerank
    oracle). Recursive CTEs must stay plain."""
    return (
        sql.replace("reach(id, r) AS (", "@@REC@@")
        .replace(" AS (", " AS MATERIALIZED (")
        .replace("@@REC@@", "reach(id, r) AS (")
    )


def _pagerank_sql(edges_cte: str, iters: int, damping: float) -> str:
    """Unrolled power iteration matching operators/pagerank.py exactly:
    directed in-edge sums, dangling mass dropped, final renormalize."""
    parts = [
        f"WITH {edges_cte},",
        "v AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),",
        "deg AS (SELECT src, SUM(weight) AS wdeg FROM edges GROUP BY src),",
        "ef AS (SELECT e.src, e.dst, e.weight / d.wdeg AS frac"
        " FROM edges e JOIN deg d ON e.src = d.src),",
        "r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS score FROM v),",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"r{k} AS (SELECT v.id, ({1.0 - damping} / (SELECT n FROM nn))"
            f" + {damping} * COALESCE(m.mass, 0.0) AS score FROM v LEFT JOIN ("
            f"SELECT ef.dst, SUM(ef.frac * r.score) AS mass"
            f" FROM ef JOIN r{k-1} r ON ef.src = r.id GROUP BY ef.dst"
            f") m ON v.id = m.dst),"
        )
    parts.append(
        f"tot AS (SELECT SUM(score) AS s FROM r{iters})\n"
        f"SELECT id, ROUND(score / (SELECT s FROM tot), 6) AS score"
        f" FROM r{iters} ORDER BY id"
    )
    return "\n".join(parts)


def _wcc_sql(edges_cte: str) -> str:
    return f"""
WITH RECURSIVE {edges_cte},
und AS (SELECT src AS a, dst AS b FROM edges
        UNION SELECT dst, src FROM edges),
v AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
reach(id, r) AS (
  SELECT id, id FROM v
  UNION
  SELECT u.b, reach.r FROM reach JOIN und u ON u.a = reach.id
),
comp AS (SELECT id, MIN(r) AS mn FROM reach GROUP BY id)
SELECT id, CAST(DENSE_RANK() OVER (ORDER BY mn) - 1 AS BIGINT) AS component
FROM comp ORDER BY id
"""


def _plp_sql(edges_cte: str, sweeps: int) -> str:
    """Synchronous PLP, unrolled; (max summed weight, min label) tie-break —
    matches operators/plp.py plp_fixed."""
    parts = [
        f"WITH {edges_cte},",
        "esym AS (SELECT src, dst, weight FROM edges WHERE src != dst"
        " UNION ALL SELECT dst, src, weight FROM edges WHERE src != dst"
        " UNION ALL SELECT src, dst, weight FROM edges WHERE src = dst),",
        "v AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),",
        "l0 AS (SELECT id, id AS label FROM v),",
    ]
    for k in range(1, sweeps + 1):
        parts.append(
            f"l{k} AS (SELECT p.id, COALESCE(w.new_label, p.label) AS label"
            f" FROM l{k-1} p LEFT JOIN ("
            f"  SELECT id, new_label FROM ("
            f"    SELECT e.dst AS id, r.label AS new_label, SUM(e.weight) AS w,"
            f"    ROW_NUMBER() OVER (PARTITION BY e.dst"
            f"      ORDER BY SUM(e.weight) DESC, r.label ASC) AS rn"
            f"    FROM esym e JOIN l{k-1} r ON e.src = r.id"
            f"    GROUP BY e.dst, r.label)"
            f"  WHERE rn = 1"
            f") w ON p.id = w.id),"
        )
    parts[-1] = parts[-1].rstrip(",")  # last CTE: no trailing comma
    parts.append(
        f"SELECT id, CAST(label AS BIGINT) AS label FROM l{sweeps} ORDER BY id"
    )
    return "\n".join(parts)


_TRIANGLE_CORE = """
esym AS (SELECT src, dst FROM edges WHERE src != dst
         UNION SELECT dst, src FROM edges WHERE src != dst),
v AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
deg AS (SELECT src AS id, COUNT(*) AS d FROM esym GROUP BY src),
eo AS (
  SELECT e.src, e.dst FROM esym e
  JOIN deg ds ON e.src = ds.id JOIN deg dd ON e.dst = dd.id
  WHERE ds.d < dd.d OR (ds.d = dd.d AND e.src < e.dst)
),
tri AS (
  SELECT a.src AS u, a.dst AS v2, b.dst AS w
  FROM eo a JOIN eo b ON a.dst = b.src
  JOIN eo c ON c.src = a.src AND c.dst = b.dst
),
corners AS (
  SELECT u AS id FROM tri UNION ALL SELECT v2 FROM tri UNION ALL SELECT w FROM tri
),
tc AS (SELECT id, COUNT(*) AS t FROM corners GROUP BY id)
"""


def _triangles_sql(edges_cte: str) -> str:
    return f"""
WITH {edges_cte},
{_TRIANGLE_CORE}
SELECT v.id, CAST(COALESCE(tc.t, 0) AS BIGINT) AS triangles
FROM v LEFT JOIN tc ON v.id = tc.id ORDER BY v.id
"""


def _lcc_sql(edges_cte: str) -> str:
    return f"""
WITH {edges_cte},
{_TRIANGLE_CORE}
SELECT v.id,
  ROUND(CASE WHEN COALESCE(deg.d, 0) >= 2
        THEN 2.0 * COALESCE(tc.t, 0) / (deg.d * (deg.d - 1))
        ELSE 0.0 END, 6) AS lcc
FROM v LEFT JOIN tc ON v.id = tc.id LEFT JOIN deg ON v.id = deg.id
ORDER BY v.id
"""


def _transcripts_cte(n_convs: int) -> str:
    """transcripts_sql(...) as a CTE body named t_all."""
    inner = transcripts_sql(n_convs).strip()
    return f"t_all AS ({inner})"


def _reply_edges_cte(n_convs: int) -> str:
    return f"""
{_transcripts_cte(n_convs)},
nx AS (
  SELECT agent, role, conv_id, turn_idx,
         LEAD(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_role,
         LEAD(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_tool
  FROM t_all
),
pairs AS (
  SELECT agent AS agent_key, next_tool AS tool_key,
         CAST(COUNT(*) AS DOUBLE) AS weight
  FROM nx WHERE role = 'assistant' AND next_role = 'tool'
  GROUP BY 1, 2
),
ents AS (SELECT agent_key AS entity_key FROM pairs
         UNION SELECT tool_key FROM pairs),
verts AS (SELECT entity_key,
          CAST(DENSE_RANK() OVER (ORDER BY entity_key) - 1 AS BIGINT) AS id
          FROM ents),
edges AS (
  SELECT s.id AS src, d.id AS dst, p.weight
  FROM pairs p
  JOIN verts s ON p.agent_key = s.entity_key
  JOIN verts d ON p.tool_key = d.entity_key
)
"""


def oracle_sql() -> dict[str, str]:
    return {k: _mat(v) for k, v in _oracle_sql_raw().items()}


def _oracle_sql_raw() -> dict[str, str]:
    stop5 = ["the", "a", "of", "and", "to"]
    stop_terms = " + ".join(
        f"CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' {w} ', ''))) / {len(w) + 2} AS BIGINT)"
        for w in stop5
    )
    return {
        "pagerank_customer_supplier": _pagerank_sql(
            tg.CS_EDGES_CTE.strip(), PR_ITERS_CS, DAMPING
        ),
        "wcc_customer_supplier": _wcc_sql(tg.CS_EDGES_CTE.strip()),
        "plp_supplier_co": _plp_sql(tg.SUPPLIER_CO_EDGES_CTE.strip(), PLP_SWEEPS),
        "triangles_supplier_co": _triangles_sql(tg.SUPPLIER_CO_EDGES_CTE.strip()),
        "lcc_supplier_co": _lcc_sql(tg.SUPPLIER_CO_EDGES_CTE.strip()),
        "degrees_customer_supplier": f"""
WITH {tg.CS_EDGES_CTE.strip()},
v AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
outd AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS od,
         SUM(weight) AS wd FROM edges GROUP BY src),
ind AS (SELECT dst AS id, CAST(COUNT(*) AS BIGINT) AS idg FROM edges GROUP BY dst)
SELECT v.id, COALESCE(outd.od, 0) AS out_degree,
       COALESCE(ind.idg, 0) AS in_degree,
       ROUND(COALESCE(outd.wd, 0.0), 6) AS wdeg_out
FROM v LEFT JOIN outd ON v.id = outd.id LEFT JOIN ind ON v.id = ind.id
ORDER BY v.id
""",
        "transcripts_table": f"""
WITH {_transcripts_cte(N_CONVS)}
SELECT conv_id, turn_idx, role, text, tool, ts_off
FROM t_all ORDER BY conv_id, turn_idx
""",
        "transcripts_reply_edges": f"""
WITH {_reply_edges_cte(N_CONVS)}
SELECT src, dst, weight FROM edges ORDER BY src, dst
""",
        "pagerank_transcripts": _pagerank_sql(
            _reply_edges_cte(N_CONVS).strip(), PR_ITERS_TR, DAMPING
        ),
        "dedup_exact_documents": """
SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM documents GROUP BY text ORDER BY keep_id
""",
        "text_stats_documents": f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST({stop_terms} AS BIGINT) AS n_stopwords,
  ROUND(length(text) / (length(text) - length(replace(text, ' ', '')) + 1), 6)
    AS avg_token_len
FROM documents ORDER BY doc_id
""",
        "knn_cosine_embeddings": """
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
dims AS (SELECT range AS i FROM range(0, 64)),
sims AS (
  SELECT qid, cid,
    SUM(CAST(qv[i+1] AS DOUBLE) * CAST(cv[i+1] AS DOUBLE)) AS dot,
    SUM(CAST(qv[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE)) AS na,
    SUM(CAST(cv[i+1] AS DOUBLE) * CAST(cv[i+1] AS DOUBLE)) AS nb
  FROM q CROSS JOIN c CROSS JOIN dims
  WHERE qid != cid
  GROUP BY qid, cid
),
ranked AS (
  SELECT qid, cid, ROUND(dot / (SQRT(na) * SQRT(nb)), 6) AS cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY ROUND(dot / (SQRT(na) * SQRT(nb)), 6) DESC, cid ASC) AS BIGINT) AS rank
  FROM sims
)
SELECT qid, cid, cos, rank FROM ranked WHERE rank <= 5 ORDER BY qid, rank
""",
    }


# ===================================================================== entry
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank over the customer→supplier link graph at sf0.001."""
    from networkit_spark.operators.pagerank import pagerank_fixed

    tune_for_iteration(spark)
    g = tg.customer_supplier_graph(spark, "/root/testdata/sf0.001")
    out = pagerank_fixed(g, damping=DAMPING, iterations=10)
    return out.orderBy(F.desc("score"), "id").limit(25)
