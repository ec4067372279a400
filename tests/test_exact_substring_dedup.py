"""exact_substring_dedup — RefinedWeb-style cross-doc span removal.

Verified two ways: a hand-computed planted fixture, and a DuckDB oracle
(rule-8 unnest/list_transform SQL) over a slice of the synthetic
documents table — oracle-grade parity without a driver-registry slot.
"""

import duckdb

from networkit_spark.functions.dedup import exact_substring_dedup


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["id"]: (r["text_dedup"], r["n_tokens"], r["n_removed"])
        for r in exact_substring_dedup(df, k=k).collect()
    }


def test_planted_duplicate_span(spark):
    # docs 1 and 2 share the 4-gram "a b c d"; doc 1 is the keeper
    rows = [
        (1, "a b c d x"),
        (2, "y a b c d z"),
        (3, "unrelated words only here"),
    ]
    got = _run(spark, rows, k=4)
    assert got[1] == ("a b c d x", 5, 0)  # keeper intact
    assert got[2] == ("y z", 6, 4)  # span stripped, order kept
    assert got[3] == ("unrelated words only here", 4, 0)


def test_within_doc_repeat_is_not_cross_doc(spark):
    # the k-gram repeats only INSIDE doc 1 -> not a cross-doc duplicate
    rows = [(1, "a b c a b c"), (2, "totally different text here")]
    got = _run(spark, rows, k=3)
    assert got[1] == ("a b c a b c", 6, 0)


def test_overlapping_spans_union(spark):
    # two overlapping duplicated 3-grams in doc 2 cover positions 0..3
    rows = [
        (1, "a b c"),
        (2, "a b c d e"),
        (3, "b c d"),
    ]
    got = _run(spark, rows, k=3)
    # doc 1 keeps "a b c" (keeper), doc 2 loses "a b c" (keeper 1) and
    # "b c d" (keeper 2? no - keeper is min id = 2 for "b c d"? occurrences
    # in docs 2 and 3 -> keeper 2), so doc 2 keeps "b c d" span.
    assert got[1] == ("a b c", 3, 0)
    assert got[2][0] == "d e"  # only "a b c" removed (pos 0-2)
    assert got[3] == ("", 3, 3)  # "b c d" keeper is doc 2 -> doc 3 stripped


def test_blank_and_empty_docs(spark):
    rows = [(1, ""), (2, "   "), (3, "one two")]
    got = _run(spark, rows, k=2)
    assert got[1] == ("", 0, 0)
    assert got[2] == ("", 0, 0)
    assert got[3] == ("one two", 2, 0)


def test_duckdb_oracle_on_documents(spark):
    # run the same computation in DuckDB (rule-8 list_transform SQL) over
    # synthetic docs with planted shared spans
    rows = []
    boiler = "this span is shared boilerplate text across docs"
    for i in range(40):
        body = f"doc {i} body token{i} token{i+1} alpha beta gamma delta"
        if i % 3 == 0:
            body = boiler + " " + body
        rows.append((i, body))
    k = 8
    got = _run(spark, rows, k=k)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in rows)
        + ") AS t(doc_id, text)"
    )
    leads = ", ".join(
        f"lead(tok, {j}) OVER (PARTITION BY id ORDER BY pos) AS t{j}"
        for j in range(1, k)
    )
    gram_cat = "tok || ' ' || " + " || ' ' || ".join(
        f"t{j}" for j in range(1, k)
    )
    oracle = con.execute(f"""
WITH base AS (
  SELECT doc_id AS id,
         string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS toks
  FROM docs
), toks AS (
  SELECT id, u.pos, u.tok FROM base,
  unnest(list_transform(range(len(toks)),
         i -> {{'pos': i, 'tok': toks[i + 1]}})) AS t(u)
), grams AS (
  SELECT id, pos AS gpos, {gram_cat} AS g
  FROM (SELECT id, pos, tok, {leads} FROM toks)
  WHERE t{k - 1} IS NOT NULL
), dup AS (
  SELECT g, MIN(id) AS keeper FROM grams
  GROUP BY g HAVING COUNT(DISTINCT id) >= 2
), covered AS (
  SELECT DISTINCT gr.id, gr.gpos + off.j AS pos
  FROM grams gr JOIN dup USING (g)
  CROSS JOIN (SELECT unnest(range({k})) AS j) off
  WHERE gr.id != dup.keeper
), kept AS (
  SELECT t.id, t.pos, t.tok FROM toks t
  ANTI JOIN covered c ON t.id = c.id AND t.pos = c.pos
), rebuilt AS (
  SELECT id, string_agg(tok, ' ' ORDER BY pos) AS text_dedup,
         COUNT(*) AS n_kept
  FROM kept GROUP BY id
)
SELECT b.id, COALESCE(r.text_dedup, '') AS text_dedup,
       len(b.toks) AS n_tokens,
       len(b.toks) - COALESCE(r.n_kept, 0) AS n_removed
FROM base b LEFT JOIN rebuilt r ON b.id = r.id
ORDER BY b.id
""").fetchall()
    want = {r[0]: (r[1], r[2], r[3]) for r in oracle}
    assert got == want
    # sanity: the boilerplate actually got stripped somewhere
    assert any(v[2] > 0 for v in got.values())


def test_plan_shape_no_cartesian_no_single_partition(spark):
    # scale guard: the dedup plan must never cross-join the corpus or
    # collapse it to one partition; the dup-gram set may broadcast
    rows = [(i, f"token{i} alpha beta gamma delta") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = exact_substring_dedup(df, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SinglePartition" not in plan
