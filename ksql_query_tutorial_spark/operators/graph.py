"""Iterative graph analytics over derived document graphs.

The second iterative operator family next to the connected-components
dedup (``dedup.duplicate_clusters``): PageRank-style influence scoring
over the near-dup similarity graph — "which documents sit at the
center of a duplication neighborhood" is the ranking signal pipelines
use to pick canonical representatives and to spot template farms.

Determinism design (what makes an ITERATIVE float algorithm
oracle-able): ranks are integer FIXED-POINT micro-units (``scale`` =
10^12), so every per-iteration step — integer division by out-degree,
long-sum of contributions, damping as ``(d·x) // 100`` — is exact,
order-independent (long addition commutes; double summation does not),
and bit-reproducible in any BIGINT SQL engine via the same unrolled
arithmetic. Mass leaked by the floor divisions is ≤ outdeg·1 micro-unit
per node per round — bounded rounding, identical in both engines.

Scale design: per iteration ONE join (ranks → edges on src) and ONE
id-keyed union-aggregate with map-side partial sums — the per-edge
contribution stream is unioned with the node base rows and folded in a
single exchange (r9: the former dst-keyed aggregate + left-join-back
paid two more exchanges per round).
Edge/degree tables are checkpointed eagerly ONCE (they are referenced
every round; a lazy plan would recompute the pair-generation subtree
per iteration); each iteration's result is a LAZY local checkpoint —
lineage stays O(1) deep and the single final action materializes the
chain. Fixed iteration count: no convergence action per round (a
diameter-bounded graph converges in few rounds; callers needing exact
convergence can compare successive frames the way the CC operator
does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ksql_query_tutorial_spark import cache

PR_SCALE = 10**12


def copurchase_edges(
    lineitem: DataFrame,
    min_support: int,
    order_col: str = "l_orderkey",
    part_col: str = "l_partkey",
) -> DataFrame:
    """Co-purchase edge list: unordered part pairs (``id_a < id_b``)
    sharing at least ``min_support`` orders — the shared input of the
    triangles / clustering-coefficient / assortativity family.

    Scale design (r6 rewrite): the previous shape self-joined the
    distinct (order, part) projection on the order key — a distinct
    exchange plus a sort-merge join plus the pair rollup (4 wide
    exchanges). Packing each order's parts into one sorted deduped
    array (``collect_set`` — ONE order-keyed exchange with map-side
    partials, which also subsumes the distinct) and expanding the
    C(k, 2) ordered pairs INSIDE codegen emits the identical pair
    multiset with the join eliminated: 2 exchanges total. The
    expansion is bounded — TPC-H-shaped orders carry ≤7 lines, so
    ≤21 pairs per order regardless of corpus size. Measured at sf0.1:
    identical 1,196,000-edge output, ~2× faster cold, equal-or-better
    warm.
    """
    arr = (
        lineitem.select(
            F.col(order_col).alias("o"), F.col(part_col).alias("p")
        )
        .groupBy("o")
        .agg(F.sort_array(F.collect_set("p")).alias("ps"))
    )
    pairs = arr.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) -> "
                "transform(slice(ps, i + 2, size(ps) - i - 1), "
                "y -> struct(x AS id_a, y AS id_b))))"
            )
        ).alias("pr")
    ).select("pr.id_a", "pr.id_b")
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__support"))
        .filter(F.col("__support") >= min_support)
        .select("id_a", "id_b")
    )


def pagerank_fixed_point(
    pairs: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Fixed-point PageRank over the UNDIRECTED graph given as
    ``id_a``/``id_b`` pairs (symmetrized internally; every node then
    has out-degree ≥ 1, so there are no dangling-mass corrections).

    ``pr_0 = scale // n``;
    ``pr_{t+1} = ((100-d)·(scale // n)) // 100
                 + (d · Σ_in pr_t // outdeg) // 100``.

    All arithmetic is BIGINT: Spark's ``div`` and DuckDB's ``//`` agree
    on non-negative operands, long sums are order-independent, and the
    total mass stays ≤ ``scale`` ≪ 2^63 — no overflow, ANSI-safe.

    Returns ``id, pr`` (micro-units) and ``pr_norm = pr / scale``
    rounded to 6 (exact: pr < 2^53 and the divisor is a power of ten).
    """
    directed = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).localCheckpoint()
    edges = directed.union(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))

    n = deg.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    # nodes ⋈ broadcast(n): init + the constant teleport base per node
    nodes = deg.crossJoin(F.broadcast(n)).select(
        "src",
        "outdeg",
        F.expr(f"{scale} div __n").alias("pr"),
        F.expr(
            f"({100 - damping_pct} * ({scale} div __n)) div 100"
        ).alias("base"),
    ).localCheckpoint()

    ranks = nodes
    # r9 optimization (guide §2.4 — remove shuffles): the step used to
    # aggregate contributions by dst and LEFT-JOIN them back onto the
    # node frame — a dst-keyed exchange plus a two-sided join exchange
    # per round. Instead, UNION the raw per-edge contributions with the
    # node base rows and fold both in ONE id-keyed aggregate (map-side
    # partials reduce the edge stream exactly as the old groupBy did;
    # sum ignores the node rows' NULL c, max picks each node's unique
    # outdeg/base). Two exchanges and a join collapse into one
    # exchange per round; results are bit-identical (long sums commute,
    # every node appears exactly once in the node rows).
    node_rows = nodes.select(F.col("src").alias("id"), "outdeg", "base")
    for _ in range(iterations):
        contribs = edges.join(
            ranks.select("src", F.expr("pr div outdeg").alias("c")), "src"
        ).select(F.col("dst").alias("id"), "c")
        ranks = (
            contribs.unionByName(node_rows, allowMissingColumns=True)
            .groupBy("id")
            .agg(
                F.max("outdeg").alias("outdeg"),
                F.max("base").alias("base"),
                F.sum("c").alias("inc"),
            )
            .select(
                F.col("id").alias("src"),
                "outdeg",
                "base",
                (
                    F.col("base")
                    + F.expr(
                        f"({damping_pct} * coalesce(inc, 0L)) div 100"
                    )
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select(
        F.col("src").alias("id"),
        "pr",
        F.round(F.col("pr").cast("double") / F.lit(float(scale)), 6).alias(
            "pr_norm"
        ),
    )


def label_propagation(
    pairs: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
) -> DataFrame:
    """Semi-supervised label propagation over the UNDIRECTED graph
    given as ``id_a``/``id_b`` pairs: seeded nodes keep their label
    (clamped), unlabeled nodes take the majority label of their
    neighbors each round (ties → lexicographically smallest label;
    no labeled neighbor → keep the previous state). The standard
    cheap way to extend a small labeled set across a similarity
    graph — here, spreading known document metadata through the
    near-dup neighborhood.

    Determinism design: votes are exact integer counts and the argmax
    is ``min(struct(-count, label))`` — order-independent and
    reproducible in SQL as ``row_number() OVER (ORDER BY c DESC,
    label)``; no floats anywhere, so the fixed iteration count is
    fully oracle-able via unrolled CTEs (the PageRank pattern).

    Scale design mirrors PageRank: edges checkpointed once; per
    iteration ONE labels→edges join on src plus a (dst, label)-keyed
    aggregate with map-side partials whose output is bounded by
    |nodes × labels|; each round's frame is a LAZY local checkpoint so
    lineage stays O(1) deep.

    ``seeds``: DataFrame ``(id, seed_label)`` — NULL labels mean
    unseeded. Returns ``id, label, is_seed`` for every node WITH at
    least one edge, ordered by id.
    """
    directed = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).localCheckpoint()
    edges = directed.union(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("id")).distinct()
        .join(seeds, "id", "left")
        .select("id", F.col("seed_label").alias("__seed"))
        .localCheckpoint()
    )
    lab = nodes.select("id", "__seed", F.col("__seed").alias("__lab"))
    # r9 optimization (guide §2.4): the step used to argmax the votes
    # per node and then run TWO id-keyed joins (nodes for the seed,
    # previous lab for the fallback). Both joins fold into the argmax
    # aggregate itself: union the (id, __nl, __c) vote rows with the
    # carried (id, __seed, __prev) state rows and aggregate once per
    # id — min(struct) ignores the state rows' NULL vote struct, max
    # picks each node's unique seed/prev. Per round this replaces one
    # aggregate exchange plus two join exchanges with ONE exchange;
    # results identical (exact integer votes, the same
    # (-count, label) total order, every node present in the state
    # rows).
    for _ in range(iterations):
        votes = (
            edges.join(
                lab.filter(F.col("__lab").isNotNull()).select(
                    F.col("id").alias("src"), F.col("__lab").alias("__nl")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"), "__nl")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        vote_rows = votes.select(
            "id",
            F.struct(
                (-F.col("__c")).alias("nc"), F.col("__nl").alias("lab")
            ).alias("__vs"),
        )
        state_rows = lab.select(
            "id", "__seed", F.col("__lab").alias("__prev")
        )
        lab = (
            vote_rows.unionByName(state_rows, allowMissingColumns=True)
            .groupBy("id")
            .agg(
                F.min("__vs").alias("__b"),
                F.max("__seed").alias("__seed"),
                F.max("__prev").alias("__prev"),
            )
            .select(
                "id",
                "__seed",
                F.coalesce(
                    F.col("__seed"), F.col("__b.lab"), F.col("__prev")
                ).alias("__lab"),
            )
            .localCheckpoint(eager=False)
        )
    return lab.select(
        "id",
        F.col("__lab").alias("label"),
        F.col("__seed").isNotNull().alias("is_seed"),
    ).orderBy("id")


def _as_edge_cols(pairs: DataFrame) -> DataFrame:
    """Rename a caller-guaranteed distinct ``id_a < id_b`` pair frame
    to the internal ``(a, b)`` edge columns — a narrow projection, no
    exchange (the ``normalized=True`` fast path)."""
    return pairs.select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    )


def _normalized_edges(pairs: DataFrame) -> DataFrame:
    """Undirected simple-graph edge list ``(a < b)`` — self-loops
    dropped, duplicates and orientation collapsed."""
    return (
        pairs.select(
            F.least("id_a", "id_b").alias("a"),
            F.greatest("id_a", "id_b").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _degrees(und: DataFrame) -> DataFrame:
    """Per-node degree of the normalized edge list: one endpoint-keyed
    rollup over the 2|E| endpoint stream."""
    return (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )


def _triangle_triples(und: DataFrame, deg: DataFrame) -> DataFrame:
    """Every triangle of the normalized edge list, once, as
    ``(src, dst, z)`` — degree-ordered orientation + packed-array
    intersection (see :func:`triangle_counts` for the argument)."""
    da = deg.select(F.col("id").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("d").alias("db"))
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    # single consumer since the r10 explode rewrite below — no pin
    oriented = (
        und.join(da, "a").join(db, "b")
        .select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
    )
    # pin the out-adjacency rollup: the edge-with-nx frame AND the ny
    # attach both consume it, and without the pin the collect_list
    # aggregate over the full edge list runs once per build (r8,
    # measured)
    adj = cache.pin(
        oriented.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
    )
    # r10 (guide §2.4, VERDICT r9 #1): the (src, dst, N⁺(src)) frame
    # used to be oriented ⋈ adj on src — a second |E|-row join (and a
    # pin of `oriented` to feed it). But adj IS the oriented edge list
    # grouped by src, so exploding nbrs back out reproduces the exact
    # edge multiset (oriented edges are distinct — `und` is a distinct
    # simple-graph list and the orientation is a bijection on edges)
    # with nx already attached: one join and one |E|-row pin
    # materialization removed from the triangle core.
    withx = adj.select(
        "src", F.explode("nbrs").alias("dst"), F.col("nbrs").alias("nx")
    )
    withy = withx.join(
        adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("ny")),
        "dst",
    )
    return withy.select(
        "src",
        "dst",
        F.explode(F.array_intersect("nx", "ny")).alias("z"),
    )


def triangle_counts(pairs: DataFrame, normalized: bool = False) -> DataFrame:
    """Per-node triangle counts over the UNDIRECTED simple graph given
    as ``id_a``/``id_b`` pairs — the local-clustering primitive behind
    community detection, spam/template-farm spotting (near-dup
    neighborhoods with many triangles are mutually-similar families,
    not chains), and recommendation strength on co-purchase graphs.

    Algorithm: degree-ordered edge orientation ("compact-forward").
    Every edge is directed from its (degree, id)-smaller endpoint to
    the larger one, making the orientation a DAG under a total order;
    the triangle x<y<z (in that order) is found exactly once AT ITS
    BASE EDGE x→y as the common out-neighbor z ∈ N⁺(x) ∩ N⁺(y). The
    triangle SET is orientation-invariant, so an independent SQL
    engine can enumerate the same triangles with plain id-ordering —
    what makes this oracle-able.

    Scale design: orientation bounds every out-degree by O(√(2·|E|))
    (the classic arboricity argument), so out-adjacency lists are
    bounded arrays, and the join graph is: adjacency build (one
    src-keyed exchange with bounded ``collect_list``), two |E|-row
    equi-joins attaching N⁺(src) and N⁺(dst) to every edge, then a
    per-row ``array_intersect`` INSIDE codegen. The Θ(Σ outdeg²)
    wedge volume — 41M rows at sf0.1 for 1.9M triangles — never hits
    a shuffle: it stays packed in the per-edge arrays, and only the
    actual triangles (the exploded intersections) flow into the final
    id-keyed rollup. A first cut that exploded wedges into rows and
    equi-joined them against the edge list ran 5× slower at sf1
    (153s → 30s) and scaled super-linearly (14.9× for 10× data,
    vs 5.9× for this shape) — the measured reason for this shape.
    The normalized edge list is persist()-ed once (the degree
    rollup and the orientation join both consume it — without it
    Catalyst re-executes the upstream pair generation per branch);
    the oriented list likewise (adjacency build + edge probe).
    persist(), NOT localCheckpoint(): no lineage truncation is needed
    (nothing iterates), and persisted blocks stay LRU-evictable —
    checkpoint blocks pinned a 12M-row edge list per call at sf1 and
    repeated runs in one session degraded 2.4× from GC pressure
    (measured). Every persist here routes through the session cache
    registry (``cache.pin``) so long-lived sessions reclaim the blocks
    with ``cache.release()`` between queries (VERDICT r7 #4); batch
    harnesses that ``clearCache()`` need nothing. No windows, no
    driver actions.

    ``normalized=True`` asserts the caller's pairs are ALREADY a
    distinct ``id_a < id_b`` simple-graph edge list (e.g.
    :func:`copurchase_edges`' support rollup guarantees it), skipping
    the re-normalization distinct — one full edge-sized exchange.

    Returns ``id, n_triangles`` for every node in ≥1 triangle,
    ordered by id.
    """
    und = cache.pin(_as_edge_cols(pairs) if normalized
                    else _normalized_edges(pairs))
    # pin degrees: the orientation attaches them to BOTH endpoints (da
    # and db broadcast builds), re-running the endpoint rollup twice
    # without it
    tri = _triangle_triples(und, cache.pin(_degrees(und)))
    return (
        tri.select(F.explode(F.array("src", "dst", "z")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        .orderBy("id")
    )


def local_clustering(pairs: DataFrame, normalized: bool = False) -> DataFrame:
    """Local clustering coefficient per node — 2·T(v) / (d(v)·(d(v)−1))
    over the undirected simple graph given as ``id_a``/``id_b`` pairs:
    the fraction of a node's neighbor pairs that are themselves
    connected. High coefficient + high degree = a tight community hub;
    high degree + near-zero coefficient = a broker/hub spanning
    unrelated neighborhoods (on co-purchase graphs: staple parts that
    co-occur with everything without their partners relating).

    Scale design: shares ONE checkpointed normalized edge list across
    the degree rollup, the orientation, and the final coefficient join
    (a first cut that called triangle_counts() on the raw pairs
    re-executed the upstream pair-generation subtree per branch —
    3 scans instead of 1); the triangle core is the packed-array
    intersection of :func:`triangle_counts`. Nodes with degree < 2
    have no neighbor pairs and are excluded (the coefficient is
    undefined there).

    ``normalized=True`` as in :func:`triangle_counts`.

    Returns ``id, degree, n_triangles, clustering_coef`` (rounded 6)
    ordered by id.
    """
    und = cache.pin(_as_edge_cols(pairs) if normalized
                    else _normalized_edges(pairs))
    deg = cache.pin(_degrees(und))
    tri_nodes = (
        _triangle_triples(und, deg)
        .select(F.explode(F.array("src", "dst", "z")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    d = F.col("d").cast("double")
    return (
        deg.filter(F.col("d") >= 2)
        .join(tri_nodes, "id", "left")
        .select(
            "id",
            F.col("d").cast("long").alias("degree"),
            F.coalesce(F.col("n_triangles"), F.lit(0))
            .cast("long")
            .alias("n_triangles"),
            F.round(
                2.0
                * F.coalesce(F.col("n_triangles"), F.lit(0)).cast("double")
                / (d * (d - 1.0)),
                6,
            ).alias("clustering_coef"),
        )
        .orderBy("id")
    )


def kcore(pairs: DataFrame, k: int = 2, rounds: int = 3) -> DataFrame:
    """Fixed-round k-core peeling over the UNDIRECTED simple graph
    given as ``id_a``/``id_b`` pairs: each round drops every node
    whose CURRENT degree is below ``k`` (with all its edges) and
    recomputes degrees. After ``rounds`` rounds the survivors are a
    superset of the true k-core that shrinks monotonically to it —
    the same fixed-iteration contract as the PageRank and
    label-propagation operators (no convergence action per round; a
    caller needing the exact core compares successive frames the way
    the CC operator does). On a near-dup graph the 2-core separates
    mutually-corroborated duplicate FAMILIES (clique-ish templates)
    from pendant chains — single LSH links that connect otherwise
    unrelated documents.

    Determinism design: degrees are exact integer counts and the
    node filter is a pure threshold, so the fixed round count is
    fully oracle-able as unrolled CTEs (the PageRank pattern).

    Scale design: per round ONE endpoint-keyed degree rollup (map-side
    partials) and two semi-joins of the edge list against the bounded
    survivor set. The base edge list is localCheckpoint-ed EAGERLY and
    each round's frame is a LAZY local checkpoint — the CC/label-prop
    pattern, and here it is about PLAN size, not recompute: each round
    nests the previous round's logical plan ~3× (edge frame + two
    semi-join branches), and without truncation Catalyst re-optimizes
    an exponentially growing tree (measured on the 256-edge sf0.1
    LSH-pair graph: per-round wall time 1.7s → 2.9s → 13.9s under
    persist(), flat ~0.2s under checkpoints — 58s → ~3s total). The
    pinned blocks are the PEELED frames, bounded by the near-dup pair
    count, not the corpus.

    Returns ``id, degree`` over the surviving subgraph (nodes with ≥1
    surviving edge), ordered by id.
    """
    edges = _normalized_edges(pairs).localCheckpoint()
    for _ in range(rounds):
        deg = _degrees(edges)
        keep = deg.filter(F.col("d") >= k).select("id")
        edges = (
            edges.join(keep.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("id", "b"), "b", "left_semi")
            .localCheckpoint(eager=False)
        )
    return (
        _degrees(edges)
        .select("id", F.col("d").cast("long").alias("degree"))
        .orderBy("id")
    )


RA_SCALE = 10**12


JACCARD_MICRO = 10**6


def link_prediction(
    pairs: DataFrame,
    normalized: bool = False,
    hub_cap: int | None = None,
) -> DataFrame:
    """Neighborhood link prediction over the UNDIRECTED simple graph
    given as ``id_a``/``id_b`` pairs: every 2-hop pair (two nodes
    sharing ≥1 common neighbor) scored by the three classic local
    indices — common-neighbor count, resource allocation (Zhou/Lü/
    Zhang 2009: Σ_z 1/deg(z), the top performer of the degree-weighted
    family; Adamic-Adar's 1/ln deg is the same shape with a libm
    transcendental that is NOT bit-portable across engines), and
    neighbor-set Jaccard. Already-connected pairs are flagged
    ``is_edge`` rather than dropped — scoring known edges is the
    standard calibration read-out, and on sparse graphs (tiny SFs,
    fresh corpora) the non-edge candidate set is legitimately empty.

    Determinism design: all three scores are exact integers —
    ``ra_micro`` = Σ (10^12 div deg(z)) (long sums commute; the
    pagerank fixed-point move), ``jaccard_micro`` =
    (10^6·cn) div (deg_a + deg_b − cn) — so any BIGINT SQL engine
    reproduces them bit-for-bit; no doubles anywhere.

    Scale design: the wedge set is generated the ``copurchase_edges``
    way — ONE z-keyed exchange packs each node's neighbors into a
    sorted array (deg(z) = array size, so the RA weight needs NO
    degree join), and the C(k, 2) pair expansion runs INSIDE codegen;
    the only wide exchange after that is the pair-keyed score rollup,
    whose volume is Σ_z C(deg_z, 2) — the same wedge volume every
    common-neighbor method must touch. ``hub_cap`` is the relief
    valve for skewed graphs: a node of degree d contributes C(d, 2)
    wedges, so one mega-hub (a boilerplate-heavy doc, a staple part)
    turns the rollup quadratic; capping drops wedges THROUGH hubs
    wider than the cap (predictions mediated by a mega-hub are the
    weakest signals — the exact frequency-cut argument of
    ``_cap_bucket_width``), while Jaccard denominators keep the TRUE
    degrees. The endpoint-degree attachment joins are key-partitioned
    on the node id; the edge-flag probe is one left join against the
    (a, b)-keyed edge list. The normalized edge list is pinned once
    (wedge expansion + degree rollup + edge probe all consume it) via
    the session cache registry.

    Returns ``id_a, id_b, common_neighbors, ra_micro, jaccard_micro,
    is_edge`` for every 2-hop pair, ordered by the pair.
    """
    und = cache.pin(_as_edge_cols(pairs) if normalized
                    else _normalized_edges(pairs))
    adj = und.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("z"), F.col("b").alias("n")),
                F.struct(F.col("b").alias("z"), F.col("a").alias("n")),
            )
        ).alias("e")
    ).select("e.z", "e.n")
    nbrs = adj.groupBy("z").agg(F.sort_array(F.collect_set("n")).alias("ns"))
    if hub_cap is not None:
        nbrs = nbrs.filter(F.size("ns") <= hub_cap)
    wedges = nbrs.select(
        F.size("ns").alias("dz"),
        F.explode(
            F.expr(
                "flatten(transform(ns, (x, i) -> "
                "transform(slice(ns, i + 2, size(ns) - i - 1), "
                "y -> struct(x AS a, y AS b))))"
            )
        ).alias("pr"),
    ).select("pr.a", "pr.b", "dz")
    scored = wedges.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("common_neighbors"),
        F.sum(F.expr(f"{RA_SCALE} div dz")).cast("long").alias("ra_micro"),
    )
    deg = _degrees(und)
    da = deg.select(F.col("id").alias("a"), F.col("d").alias("__da"))
    db = deg.select(F.col("id").alias("b"), F.col("d").alias("__db"))
    flagged = (
        scored.join(da, "a")
        .join(db, "b")
        .join(und.withColumn("__e", F.lit(1)), ["a", "b"], "left")
    )
    return flagged.select(
        F.col("a").alias("id_a"),
        F.col("b").alias("id_b"),
        "common_neighbors",
        "ra_micro",
        F.expr(f"({JACCARD_MICRO} * common_neighbors) div (__da + __db - common_neighbors)")
        .cast("long")
        .alias("jaccard_micro"),
        F.col("__e").isNotNull().alias("is_edge"),
    ).orderBy("id_a", "id_b")


def community_modularity(
    pairs: DataFrame,
    labels: DataFrame,
    normalized: bool = False,
) -> DataFrame:
    """Newman modularity of a node partition over the UNDIRECTED
    simple graph given as ``id_a``/``id_b`` pairs — the standard
    quality score for a community assignment (how much denser inside
    communities than a degree-preserving random graph): per community
    c, ``q_term = e_c/m − (d_c/2m)²``; the partition's Q is their
    sum. Pairs naturally with :func:`label_propagation` — "did the
    propagated labels actually find structure" is the read-out that
    decides whether to trust them downstream.

    Semantics: ``labels`` is ``(id, label)``; NULL labels (label-prop
    nodes no vote ever reached) are excluded, and modularity is
    computed on the LABELED subgraph — edges with both endpoints
    labeled — so m, degrees, and community masses are all consistent
    within one well-defined graph.

    Determinism design: every input to the formula (m, e_c, d_c,
    n_nodes) is an exact integer from a keyed rollup, and Q_total is
    derived from exact integer TOTALS (Σe_c and Σd_c² as
    decimal(38,0) / HUGEINT) — never by summing per-community double
    terms, whose addition order differs between engines:
    ``Q = Σe_c/m − Σd_c²/(4m²)`` in one fixed-shape expression.

    Scale design (r9): ONE endpoint-explode rollup over the labeled
    edge list feeds degree_sum, internal_edges, AND the one-row totals
    (the pre-r9 shape ran four separate aggregates over a pinned edge
    frame — three edge-sized passes and a pin materialization more);
    every aggregate is a keyed rollup with map-side partials over
    edge-sized or |communities|-sized frames; the single-row totals
    ride in via a broadcast cross join. The edge list now has exactly
    one consumer, so it is no longer pinned. No windows, no all-pairs
    anything.

    Returns ``label, n_nodes, internal_edges, degree_sum, q_term,
    q_total`` (doubles rounded 6; q_total identical on every row),
    ordered by label.
    """
    und = _as_edge_cols(pairs) if normalized else _normalized_edges(pairs)
    lab = labels.filter(F.col("label").isNotNull()).select("id", "label")
    # single consumer since the r9 one-rollup rewrite — no pin needed
    le = und.join(
        lab.select(F.col("id").alias("a"), F.col("label").alias("__la")),
        "a",
    ).join(
        lab.select(F.col("id").alias("b"), F.col("label").alias("__lb")),
        "b",
    )
    # r9 optimization (guide §2.4): degree_sum, internal_edges, and the
    # m/Σe totals used to be FOUR separate aggregates over the pinned
    # labeled-edge frame (each its own exchange + AQE job). One
    # endpoint-explode rollup now feeds them all: every edge emits its
    # two endpoint labels with an is-intra marker, so per label
    # degree_sum = count(rows) and internal_edges = sum(marker) div 2
    # (an intra edge contributes exactly two marked rows — the halved
    # sum is exact), and the one-row totals (__m = Σdegree_sum div 2,
    # __te = Σinternal, __td2 = Σdegree_sum²) are a second aggregate
    # over the |labels|-row rollup instead of a second pass over the
    # edges. Exact integers throughout, identical outputs.
    # pin the |labels|-row rollup (ADVICE r9): BOTH the totals aggregate
    # and the output join consume per_label, and without the pin the
    # edge-sized join+explode subtree under it executes twice per run
    # (the r9 plan dump showed the subtree physically duplicated with no
    # ReusedExchange). The pinned frame is |communities|-bounded — the
    # cheapest possible cache — while the subtree it guards is edge-sized.
    per_label = cache.pin(
        le.select(
            F.explode(F.array("__la", "__lb")).alias("label"),
            F.when(F.col("__la") == F.col("__lb"), 1)
            .otherwise(0).alias("__i"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("degree_sum"),
            F.expr("sum(__i) div 2").cast("long").alias("internal_edges"),
        )
    )
    nn = lab.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    dec = "decimal(38,0)"
    totals = per_label.agg(
        F.expr("sum(degree_sum) div 2").cast("long").alias("__m"),
        F.sum("internal_edges").cast("long").alias("__te"),
        F.sum((F.col("degree_sum").cast(dec))
              * (F.col("degree_sum").cast(dec))).alias("__td2"),
    )
    joined = (
        nn.join(per_label, "label", "left")
        .crossJoin(F.broadcast(totals))
    )
    e_c = F.coalesce(F.col("internal_edges"), F.lit(0)).cast("long")
    d_c = F.coalesce(F.col("degree_sum"), F.lit(0)).cast("long")
    m = F.col("__m").cast("double")
    q_term = F.when(
        F.col("__m") > 0,
        e_c.cast("double") / m
        - (d_c.cast("double") / (F.lit(2.0) * m))
        * (d_c.cast("double") / (F.lit(2.0) * m)),
    )
    q_total = F.when(
        F.col("__m") > 0,
        F.col("__te").cast("double") / m
        - F.col("__td2").cast("double")
        / (F.lit(4.0) * m * m),
    )
    return joined.select(
        "label",
        "n_nodes",
        e_c.alias("internal_edges"),
        d_c.alias("degree_sum"),
        F.round(q_term, 6).alias("q_term"),
        F.round(q_total, 6).alias("q_total"),
    ).orderBy("label")
