"""Similarity search over embedding columns (``array<float>``).

Two tiers, per the north-star brief:

- **Brute-force cosine top-k** — the exact baseline. Broadcast the
  (small) query set against the full corpus: one map-side pass over the
  corpus, a single shuffle for the per-query top-k. Cosine is
  ``zip_with`` + ``aggregate`` (JVM, codegen) — no Python, no UDF.
- **LSH-bucketed ANN (random hyperplanes)** — the 100 TB path. A
  deterministic hyperplane matrix (seeded RNG, data-independent) maps
  each vector to a sign-bit bucket code; search joins queries to corpus
  rows by bucket (with optional multi-probe over Hamming-1 neighbor
  buckets), then ranks exactly within candidates. Pair generation is an
  equality join on the bucket code — never O(n²). An IVF analog would
  swap bucket codes for nearest-centroid ids; the plumbing is identical.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def as_double(vec_col: Column) -> Column:
    """Cast array<float> → array<double> so Spark and any oracle agree
    on arithmetic precision."""
    return F.transform(vec_col, lambda x: x.cast("double"))


def l2_norm(vec: Column) -> Column:
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                       lambda acc, x: acc + x)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    The query side is broadcast (top-k search with a small query set is
    the common shape); the corpus streams through map-side, then one
    shuffle on query_id ranks candidates. Ties broken by neighbor id for
    determinism.

    Returns: ``query_id``, ``neighbor_id``, ``rank``, ``cosine``.
    """
    par = corpus.sparkSession.sparkContext.defaultParallelism
    c = corpus.select(F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("cv"))
    c = c.withColumn("cn", l2_norm(F.col("cv"))).repartition(par)
    q = queries.select(F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv"))
    q = q.withColumn("qn", l2_norm(F.col("qv")))

    scored = (
        c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .withColumn("cosine", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random-hyperplane matrix (data-independent)."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def bucket_code(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit LSH bucket code: bit i = (vec · plane_i) >= 0."""
    code = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        code = code.bitwiseOR(F.shiftleft(bit, i))
    return code


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing the query's
    LSH bucket (plus Hamming-1 probe buckets when ``multiprobe``), ranked
    by exact cosine within candidates.

    2^n_planes buckets; recall rises with multiprobe breadth. The join
    is bucket-equality (shuffle on an 8-bit code → heavily skew-prone at
    tiny n_planes; size n_planes so buckets ≈ corpus/2^n stay fine-
    grained at scale).

    Returns: ``query_id``, ``neighbor_id``, ``rank``, ``cosine``.
    """
    planes = hyperplanes(dim, n_planes)
    par = corpus.sparkSession.sparkContext.defaultParallelism
    c = corpus.select(F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("cv"))
    c = c.withColumn("cn", l2_norm(F.col("cv"))).withColumn(
        "bucket", bucket_code(F.col("cv"), planes)
    ).repartition(par)
    q = queries.select(F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv"))
    q = q.withColumn("qn", l2_norm(F.col("qv"))).withColumn(
        "qbucket", bucket_code(F.col("qv"), planes)
    )
    if multiprobe:
        probes = F.array(
            F.col("qbucket"),
            *[F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
        )
        q = q.select("qid", "qv", "qn", F.explode(probes).alias("qbucket"))

    scored = (
        c.join(F.broadcast(q), (F.col("bucket") == F.col("qbucket")) & (F.col("qid") != F.col("nid")))
        .withColumn("cosine", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )
