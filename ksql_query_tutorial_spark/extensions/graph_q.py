"""Graph extension queries (triangles, clustering coefficient, k-core, pagerank, assortativity).

Split from the former extensions.py monolith (pure move; VERDICT r6 #3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ksql_query_tutorial_spark.operators import (
    dedup,
)
from ksql_query_tutorial_spark.tables import load

from ._registry import EXTENSION_ORACLES, EXTENSION_QUERIES
from ._shared import *  # noqa: F401,F403 — shared constants/SQL fragments


# ----------------------------------------------- graph pagerank

PR_ITERATIONS = 5


PR_DAMPING = 85


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the near-dup similarity graph (LSH
    pairs — recall 1 at the oracle sf, so the exact-Jaccard-pairs
    oracle applies, as with dedup_clusters_lsh). Integer micro-unit
    arithmetic makes all 5 iterations bit-reproducible in the oracle —
    an ITERATIVE algorithm under full value-hash verification. See
    operators.graph.pagerank_fixed_point."""
    from ksql_query_tutorial_spark.operators.graph import pagerank_fixed_point

    d = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, "doc_id", threshold=JACCARD_THRESHOLD)
    return pagerank_fixed_point(
        pairs, iterations=PR_ITERATIONS, damping_pct=PR_DAMPING
    )


EXTENSION_QUERIES["graph_pagerank"] = graph_pagerank


def _pagerank_oracle_sql(
    iterations: int = PR_ITERATIONS,
    damping: int = PR_DAMPING,
    scale: int = 10**12,
) -> str:
    """DuckDB twin of graph.pagerank_fixed_point over exact-Jaccard
    pairs: recursive CTEs cannot aggregate, so the fixed iteration
    count is UNROLLED as chained CTEs with identical BIGINT
    arithmetic (// == Spark's div on non-negative longs)."""
    cte = [f"""
    t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS s FROM t),
    post AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    sizes AS (SELECT doc_id, len(s) AS n FROM sh),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM post a JOIN post b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT id_a, id_b
              FROM inter JOIN sizes sa ON id_a = sa.doc_id
                         JOIN sizes sb ON id_b = sb.doc_id
              WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE)
                    >= {JACCARD_THRESHOLD}),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
            FROM edges GROUP BY 1),
    nn AS (SELECT count(*) AS c FROM deg),
    pr0 AS (SELECT src, outdeg,
                   {scale} // (SELECT c FROM nn) AS pr,
                   ({100 - damping} * ({scale} // (SELECT c FROM nn))) // 100
                     AS base
            FROM deg)"""]
    for it in range(1, iterations + 1):
        cte.append(f"""
    pr{it} AS (SELECT n.src, n.outdeg, n.base,
                      n.base + ({damping} * COALESCE(s.inc, 0)) // 100 AS pr
               FROM pr0 n LEFT JOIN
                    (SELECT e.dst, sum(p.pr // p.outdeg) AS inc
                     FROM edges e JOIN pr{it - 1} p ON e.src = p.src
                     GROUP BY 1) s
                 ON n.src = s.dst)""")
    return (
        "WITH " + ",".join(cte) + f"""
    -- pr is HUGEINT by here (sum + // promote) -> pandas float64 ->
    -- strict-hash "x.0" vs Spark's int64 "x" (VERDICT r5 #4); re-pin.
    SELECT src AS id, CAST(pr AS BIGINT) AS pr,
           ROUND(CAST(pr AS DOUBLE) / {float(scale)}, 6) AS pr_norm
    FROM pr{iterations} ORDER BY id
    """
    )


EXTENSION_ORACLES["graph_pagerank"] = _pagerank_oracle_sql()


LP_ITERATIONS = 3


LP_SEED_MOD = 3


def graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped-seed label propagation over the near-dup similarity
    graph: every third document's lang is the seed set; the rest take
    neighborhood majority votes for 3 rounds. Same recall-1 LSH edge
    regime as graph_pagerank, so the exact-Jaccard oracle applies.
    See operators.graph.label_propagation."""
    from ksql_query_tutorial_spark.operators.graph import label_propagation

    d = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, "doc_id", threshold=JACCARD_THRESHOLD)
    seeds = d.select(
        F.col("doc_id").alias("id"),
        F.when(F.col("doc_id") % LP_SEED_MOD == 0, F.col("lang")).alias(
            "seed_label"
        ),
    )
    return label_propagation(pairs, seeds, iterations=LP_ITERATIONS)


EXTENSION_QUERIES["graph_label_prop"] = graph_label_prop


def _lp_cte_list(iterations: int = LP_ITERATIONS) -> list[str]:
    """The unrolled label-propagation CTE chain (exact-Jaccard pairs →
    clamped-majority rounds → ``lab{iterations}``), shared by the
    label-prop oracle and the modularity oracle built on top of it."""
    cte = [f"""
    t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS s FROM t),
    post AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    sizes AS (SELECT doc_id, len(s) AS n FROM sh),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM post a JOIN post b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT id_a, id_b
              FROM inter JOIN sizes sa ON id_a = sa.doc_id
                         JOIN sizes sb ON id_b = sb.doc_id
              WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE)
                    >= {JACCARD_THRESHOLD}),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    seeds AS (SELECT n.id, d.lang AS seed
              FROM nodes n LEFT JOIN documents d
                ON n.id = d.doc_id AND d.doc_id % {LP_SEED_MOD} = 0),
    lab0 AS (SELECT id, seed, seed AS lab FROM seeds)"""]
    for it in range(1, iterations + 1):
        cte.append(f"""
    v{it} AS (SELECT e.dst AS id, p.lab AS lab, count(*) AS c
              FROM edges e JOIN lab{it - 1} p ON e.src = p.id
              WHERE p.lab IS NOT NULL GROUP BY 1, 2),
    b{it} AS (SELECT id, lab FROM (
                SELECT id, lab,
                       row_number() OVER (PARTITION BY id
                                          ORDER BY c DESC, lab) AS rn
                FROM v{it}) WHERE rn = 1),
    lab{it} AS (SELECT s.id, s.seed,
                       COALESCE(s.seed, b.lab, p.lab) AS lab
                FROM seeds s
                LEFT JOIN b{it} b ON s.id = b.id
                JOIN lab{it - 1} p ON s.id = p.id)""")
    return cte


def _label_prop_oracle_sql(iterations: int = LP_ITERATIONS) -> str:
    """DuckDB twin of graph.label_propagation over exact-Jaccard
    pairs, iterations unrolled as chained CTEs (the PageRank
    pattern); the argmax is row_number ORDER BY c DESC, lab — the
    SQL spelling of min(struct(-c, lab))."""
    return (
        "WITH " + ",".join(_lp_cte_list(iterations)) + f"""
    SELECT id, lab AS label, seed IS NOT NULL AS is_seed
    FROM lab{iterations} ORDER BY id
    """
    )


EXTENSION_ORACLES["graph_label_prop"] = _label_prop_oracle_sql()


COPURCHASE_MIN_SUPPORT = 1  # raise on a real corpus; 1 keeps tiny SFs non-degenerate


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts on the co-purchase graph (parts
    sharing ≥ COPURCHASE_MIN_SUPPORT orders). Edge generation is
    per-order pair expansion — bounded fan-out since TPC-H-shaped
    orders carry ≤7 lines — then degree-ordered triangle counting.
    See graph.triangle_counts for the orientation argument.
    """
    from ksql_query_tutorial_spark.operators.graph import (
        copurchase_edges,
        triangle_counts,
    )

    li = load(spark, sf_dir, "lineitem")
    edges = copurchase_edges(li, COPURCHASE_MIN_SUPPORT)
    # copurchase_edges already emits DISTINCT id_a < id_b pairs (the
    # support rollup groups on the ordered pair), so the operator's
    # re-normalization distinct — a full 1.2M-row exchange at sf0.1 —
    # is skipped (r8, measured)
    return triangle_counts(edges, normalized=True).withColumnRenamed(
        "id", "part_key")


EXTENSION_QUERIES["graph_triangles"] = graph_triangles


EXTENSION_ORACLES["graph_triangles"] = f"""
    WITH pp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
    e AS (SELECT a.p AS u, b.p AS v
          FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p
          GROUP BY 1, 2
          HAVING count(*) >= {COPURCHASE_MIN_SUPPORT}),
    t AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
          FROM e e1
          JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
          JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
    m AS (SELECT x AS part_key FROM t
          UNION ALL SELECT y FROM t
          UNION ALL SELECT z FROM t)
    SELECT part_key, CAST(count(*) AS BIGINT) AS n_triangles
    FROM m GROUP BY 1 ORDER BY 1
"""


def graph_clustering_coef(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per part on the co-purchase graph
    (the graph_triangles edge set). See graph.local_clustering."""
    from ksql_query_tutorial_spark.operators.graph import (
        copurchase_edges,
        local_clustering,
    )

    li = load(spark, sf_dir, "lineitem")
    edges = copurchase_edges(li, COPURCHASE_MIN_SUPPORT)
    # normalized=True: see graph_triangles (same edge contract)
    return local_clustering(edges, normalized=True).withColumnRenamed(
        "id", "part_key")


EXTENSION_QUERIES["graph_clustering_coef"] = graph_clustering_coef


EXTENSION_ORACLES["graph_clustering_coef"] = f"""
    WITH pp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
    e AS (SELECT a.p AS u, b.p AS v
          FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p
          GROUP BY 1, 2
          HAVING count(*) >= {COPURCHASE_MIN_SUPPORT}),
    deg AS (SELECT id, CAST(count(*) AS BIGINT) AS degree
            FROM (SELECT u AS id FROM e UNION ALL SELECT v FROM e)
            GROUP BY 1),
    t AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
          FROM e e1
          JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
          JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
    m AS (SELECT x AS id FROM t
          UNION ALL SELECT y FROM t
          UNION ALL SELECT z FROM t),
    tc AS (SELECT id, CAST(count(*) AS BIGINT) AS n_triangles
           FROM m GROUP BY 1)
    SELECT deg.id AS part_key, degree,
           CAST(COALESCE(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
           ROUND(2.0 * COALESCE(tc.n_triangles, 0)
                 / (CAST(degree AS DOUBLE) * (degree - 1.0)), 6)
               AS clustering_coef
    FROM deg LEFT JOIN tc ON deg.id = tc.id
    WHERE degree >= 2
    ORDER BY part_key
"""


KCORE_K = 2


KCORE_ROUNDS = 3


def _kcore_oracle_sql(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    """DuckDB twin of graph.kcore over exact-Jaccard pairs: the fixed
    peel count is UNROLLED as chained CTEs (the PageRank pattern),
    each round a degree rollup + two semi-filters."""
    cte = [f"""
    p AS ({_JACCARD_PAIRS_ORACLE.replace("ORDER BY id_a, id_b", "")}),
    e0 AS (SELECT id_a AS a, id_b AS b FROM p)"""]
    for r in range(1, rounds + 1):
        cte.append(f"""
    d{r} AS (SELECT id, count(*) AS c
             FROM (SELECT a AS id FROM e{r - 1}
                   UNION ALL SELECT b FROM e{r - 1})
             GROUP BY 1),
    e{r} AS (SELECT a, b FROM e{r - 1}
             WHERE a IN (SELECT id FROM d{r} WHERE c >= {k})
               AND b IN (SELECT id FROM d{r} WHERE c >= {k}))""")
    return (
        "WITH " + ",".join(cte) + f"""
    SELECT id, CAST(count(*) AS BIGINT) AS degree
    FROM (SELECT a AS id FROM e{rounds} UNION ALL SELECT b FROM e{rounds})
    GROUP BY 1 ORDER BY id
""")


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-round 2-core of the near-dup similarity graph (LSH pairs
    — recall 1 at the oracle sf): keeps mutually-corroborated
    duplicate families, peels pendant single-link chains.
    See graph.kcore."""
    from ksql_query_tutorial_spark.operators.graph import kcore

    d = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, "doc_id", threshold=JACCARD_THRESHOLD)
    return kcore(pairs, k=KCORE_K, rounds=KCORE_ROUNDS)


EXTENSION_QUERIES["graph_kcore"] = graph_kcore


EXTENSION_ORACLES["graph_kcore"] = _kcore_oracle_sql()


def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph: the Pearson
    correlation of endpoint degrees over edges (Newman's r) — positive
    = hubs buy with hubs (hub-clustered catalog), negative = hubs
    bridge small-degree parts (hub-and-spoke). One number that
    characterizes the whole graph's mixing, completing the graph-stats
    family next to triangles/clustering/k-core.

    Determinism design: each edge contributes BOTH orientations (the
    standard symmetrized form), all sums are exact integers over
    degrees, and the final r is one fixed-shape double expression.

    Scale design (r7 rewrite): the degree rollup explodes [u, v] from
    ONE edge pass (a unionAll of two selects re-executes the whole
    co-purchase pipeline per branch), and the symmetrized moments are
    DERIVED algebraically from single-orientation sums — for the
    both-orientations multiset, n = 2·n₀, Σx = Σx₀+Σy₀, Σxy = 2·Σx₀y₀,
    Σx² = Σx₀²+Σy₀² — instead of unioning sym with its swap, which
    doubled the edges+joins pipeline again. Exact integer arithmetic,
    identical r; measured 2.66s → 2.37s best-of-3 at sf0.1 (modest
    locally because AQE stage reuse already deduplicated the repeated
    exchanges; the plan-size halving is the durable win — on a
    cluster the duplicated branches would also double scan traffic
    before their first exchange).
    The remaining joins are the triangle family's edge-keyed
    shapes; the moment reduction is a single row. No windows.
    """
    from ksql_query_tutorial_spark.operators.graph import copurchase_edges

    li = load(spark, sf_dir, "lineitem")
    edges = copurchase_edges(li, COPURCHASE_MIN_SUPPORT).select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    )
    deg = (
        edges.select(F.explode(F.array("u", "v")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("d").alias("dv"))
    one = (
        edges.join(du, "u").join(dv, "v")
        .select(F.col("du").alias("x"), F.col("dv").alias("y"))
    )
    m0 = one.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum("x").cast("long").alias("sx0"),
        F.sum("y").cast("long").alias("sy0"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy0"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx0"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy0"),
    )
    m = m0.select(
        (F.col("n0") * 2).alias("n"),
        (F.col("sx0") + F.col("sy0")).alias("sx"),
        (F.col("sxy0") * 2).alias("sxy"),
        (F.col("sxx0") + F.col("syy0")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sx")
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    return m.select(
        (F.col("n") / 2).cast("long").alias("n_edges"),
        F.round(F.when(den != 0, num / den), 6).alias("assortativity"),
    )


EXTENSION_QUERIES["graph_assortativity"] = graph_assortativity


EXTENSION_ORACLES["graph_assortativity"] = f"""
    WITH pp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
    e AS (SELECT a.p AS u, b.p AS v
          FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p
          GROUP BY 1, 2 HAVING count(*) >= {COPURCHASE_MIN_SUPPORT}),
    deg AS (SELECT id, CAST(count(*) AS BIGINT) AS d
            FROM (SELECT u AS id FROM e UNION ALL SELECT v FROM e)
            GROUP BY 1),
    sym AS (SELECT du.d AS x, dv.d AS y
            FROM e JOIN deg du ON e.u = du.id JOIN deg dv ON e.v = dv.id
            UNION ALL
            SELECT dv.d, du.d
            FROM e JOIN deg du ON e.u = du.id JOIN deg dv ON e.v = dv.id),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx
          FROM sym)
    SELECT CAST(n / 2 AS BIGINT) AS n_edges,
           ROUND(CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx
                           <> 0
                 THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sx)
                      / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 END, 6) AS assortativity
    FROM m
"""


# Link prediction runs on the REPEAT co-purchase graph (support >= 2):
# at support 1 the TPC-H-shaped graph is near-complete inside each
# order's clique overlay (147M wedges at sf0.1 — measured via the
# oracle CTEs) and every 2-hop pair is already an edge, so prediction
# is vacuous; requiring a repeated pair keeps the graph sparse at
# every SF (13k wedges at sf0.01, 1.4k at sf0.1) and makes the scores
# mean something ("parts that keep being bought with the same
# partners"). hub_cap stays None here — the support filter already
# bounds degrees (max 13 at sf0.01); it exists for corpora where it
# doesn't (see operators.graph.link_prediction).
LINKPRED_MIN_SUPPORT = 2


def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbors / resource-allocation / neighbor-Jaccard link
    scores for every 2-hop pair of the repeat co-purchase graph, with
    already-connected pairs flagged. See graph.link_prediction."""
    from ksql_query_tutorial_spark.operators.graph import (
        copurchase_edges,
        link_prediction,
    )

    li = load(spark, sf_dir, "lineitem")
    edges = copurchase_edges(li, LINKPRED_MIN_SUPPORT)
    # copurchase_edges emits DISTINCT id_a < id_b pairs (support
    # rollup on the ordered pair) — the normalized=True fast path, as
    # with graph_triangles
    return link_prediction(edges, normalized=True)


EXTENSION_QUERIES["graph_link_prediction"] = graph_link_prediction


EXTENSION_ORACLES["graph_link_prediction"] = f"""
    WITH pp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
    e AS (SELECT a.p AS u, b.p AS v
          FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p
          GROUP BY 1, 2 HAVING count(*) >= {{sup}}),
    adj AS (SELECT u AS z, v AS n FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT z AS id, CAST(count(*) AS BIGINT) AS d
            FROM adj GROUP BY 1),
    w AS (SELECT a1.n AS x, a2.n AS y, a1.z AS z
          FROM adj a1 JOIN adj a2 ON a1.z = a2.z AND a1.n < a2.n),
    g AS (SELECT x, y, CAST(count(*) AS BIGINT) AS common_neighbors,
                 CAST(sum({{ra}} // dz.d) AS BIGINT) AS ra_micro
          FROM w JOIN deg dz ON w.z = dz.id GROUP BY 1, 2)
    SELECT g.x AS id_a, g.y AS id_b, common_neighbors, ra_micro,
           CAST(({{jm}} * common_neighbors)
                // (dx.d + dy.d - common_neighbors) AS BIGINT)
             AS jaccard_micro,
           (e.u IS NOT NULL) AS is_edge
    FROM g JOIN deg dx ON g.x = dx.id JOIN deg dy ON g.y = dy.id
    LEFT JOIN e ON e.u = g.x AND e.v = g.y
    ORDER BY id_a, id_b
""".format(sup=LINKPRED_MIN_SUPPORT, ra=10**12, jm=10**6)


def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the label-propagation partition on the
    near-dup similarity graph — "did the propagated labels find real
    structure" as one exact-arithmetic score per community plus the
    partition total. Recomputes graph_label_prop's labels (same seed
    rule, same recall-1 LSH edge regime, so the exact-Jaccard oracle
    applies end-to-end) and scores them; the LSH pair frame is
    eagerly localCheckpoint-ed ONCE (the family convention —
    pagerank/label-prop checkpoint their edges the same way): both the
    propagation and the scored edge set consume it, the frame is
    bounded by the near-dup pair count (hundreds, not corpus-sized, so
    the graph-family GC concern about pinning big checkpoints doesn't
    apply), and truncating the lineage keeps the Arrow LSH signature
    stage out of every downstream plan instead of reprinting the whole
    pair pipeline per consumer. See
    operators.graph.community_modularity."""
    from ksql_query_tutorial_spark.operators.graph import (
        community_modularity,
        label_propagation,
    )

    d = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        d, "doc_id", threshold=JACCARD_THRESHOLD
    ).localCheckpoint()
    seeds = d.select(
        F.col("doc_id").alias("id"),
        F.when(F.col("doc_id") % LP_SEED_MOD == 0, F.col("lang")).alias(
            "seed_label"
        ),
    )
    labels = label_propagation(pairs, seeds, iterations=LP_ITERATIONS)
    # minhash_lsh_pairs emits verified id_a < id_b pairs (a subset of
    # the exact-Jaccard pair set) — the normalized=True fast path
    return community_modularity(pairs, labels, normalized=True)


EXTENSION_QUERIES["graph_modularity"] = graph_modularity


def _modularity_oracle_sql(iterations: int = LP_ITERATIONS) -> str:
    """Label-prop CTE chain + the modularity rollup: all formula
    inputs are exact integers, and q_total derives from exact integer
    TOTALS (Σe_c, Σd_c² as HUGEINT), never a double sum over
    per-community terms (addition order differs between engines)."""
    return (
        "WITH " + ",".join(_lp_cte_list(iterations)) + f"""
    , lnodes AS (SELECT id, lab FROM lab{iterations} WHERE lab IS NOT NULL),
    le AS (SELECT la.lab AS lab_a, lb.lab AS lab_b
           FROM pairs p JOIN lnodes la ON p.id_a = la.id
                        JOIN lnodes lb ON p.id_b = lb.id),
    mm AS (SELECT CAST(count(*) AS BIGINT) AS m,
                  CAST(sum(CASE WHEN lab_a = lab_b THEN 1 ELSE 0 END)
                       AS BIGINT) AS te
           FROM le),
    degsum AS (SELECT lab AS label, CAST(count(*) AS BIGINT) AS degree_sum
               FROM (SELECT lab_a AS lab FROM le
                     UNION ALL SELECT lab_b FROM le)
               GROUP BY 1),
    td2 AS (SELECT sum(CAST(degree_sum AS HUGEINT) * degree_sum) AS d2
            FROM degsum),
    intra AS (SELECT lab_a AS label,
                     CAST(count(*) AS BIGINT) AS internal_edges
              FROM le WHERE lab_a = lab_b GROUP BY 1),
    nn AS (SELECT lab AS label, CAST(count(*) AS BIGINT) AS n_nodes
           FROM lnodes GROUP BY 1)
    SELECT nn.label, nn.n_nodes,
           CAST(coalesce(intra.internal_edges, 0) AS BIGINT)
             AS internal_edges,
           CAST(coalesce(degsum.degree_sum, 0) AS BIGINT) AS degree_sum,
           ROUND(CASE WHEN m > 0 THEN
                 CAST(coalesce(intra.internal_edges, 0) AS DOUBLE)
                   / CAST(m AS DOUBLE)
                 - (CAST(coalesce(degsum.degree_sum, 0) AS DOUBLE)
                    / (2.0 * CAST(m AS DOUBLE)))
                   * (CAST(coalesce(degsum.degree_sum, 0) AS DOUBLE)
                      / (2.0 * CAST(m AS DOUBLE)))
                 END, 6) AS q_term,
           ROUND(CASE WHEN m > 0 THEN
                 CAST(te AS DOUBLE) / CAST(m AS DOUBLE)
                 - CAST(d2 AS DOUBLE)
                   / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE))
                 END, 6) AS q_total
    FROM nn LEFT JOIN intra ON nn.label = intra.label
            LEFT JOIN degsum ON nn.label = degsum.label
            CROSS JOIN mm CROSS JOIN td2
    ORDER BY nn.label
    """
    )


EXTENSION_ORACLES["graph_modularity"] = _modularity_oracle_sql()
