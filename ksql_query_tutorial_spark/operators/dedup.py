"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design (the whole point — these must survive 100 TB):

- **Exact** is a hash-groupBy: one shuffle on ``md5(normalized text)``,
  map-side combine, no text comparison.
- **n-gram Jaccard** builds an inverted index (shingle → doc) and
  generates candidate pairs by self-joining postings. The join shuffles
  on the shingle hash; ultra-frequent shingles are the skew hazard, so
  postings longer than ``max_posting`` are dropped (a standard
  frequency-cut: a shingle shared by thousands of docs carries ~no
  similarity signal but produces O(n²) pairs). AQE skew-join covers the
  residual.
- **MinHash LSH** reduces pair generation to equality joins on band
  buckets: signature = k hash permutations (deterministic affine
  transforms of xxhash64), banded so that only likely-similar docs
  collide; candidates are then verified with exact Jaccard. Cost is
  O(docs·k) + O(collisions), never O(n²).
- **SimHash** computes a 64-bit sketch per doc with ONE shuffle
  (explode tokens → per-bit ±1 sums), then finds Hamming-≤d pairs by
  pigeonhole banding (d+1 chunks: any pair within distance d agrees on
  at least one chunk) — again equality joins, never O(n²).
- **Embedding cosine** has a brute-force baseline (correct; fine to
  O(10⁴) docs) and the LSH route in
  :mod:`ksql_query_tutorial_spark.operators.similarity` for scale.

All expressions are JVM array HOFs (``transform``/``filter``/
``aggregate``) — zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: modulus for MinHash affine permutations. A
# 31-bit hash space keeps a·h+b far below 2^63 (Spark 4 runs ANSI mode:
# long overflow THROWS, it doesn't wrap), while 2^31 ≫ shingle counts so
# collision impact on the min-estimate is negligible.
_MERSENNE = (1 << 31) - 1


def shingles(col: Column, n: int = 3) -> Column:
    """n-token shingles of a text column (JVM-side).

    tokens = whitespace split of lower(trim(text)); shingle i =
    tokens[i..i+n-1] joined by a single space. Docs with < n tokens get
    an empty array.
    """
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    body = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(n)]),
    )
    # sequence(0, negative) would produce a DESCENDING range, so guard
    # short docs explicitly with an empty shingle set.
    return F.when(F.size(toks) >= n, body).otherwise(F.array().cast("array<string>"))


def exact_duplicates(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Exact dedup via hash-groupBy: one row per distinct content with
    the keeper id (min id) and the duplicate count.

    Returns columns: ``keeper_id``, ``dup_count``.
    """
    from ksql_query_tutorial_spark.operators.text import normalized

    return (
        df.select(F.col(id_col), F.md5(normalized(F.col(text_col))).alias("__h"))
        .groupBy("__h")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select("keeper_id", "dup_count")
    )


def _distinct_shingle_posting(df: DataFrame, id_col: str, text_col: str,
                              n: int) -> DataFrame:
    """Inverted index: (shingle, id), distinct per doc."""
    return (
        df.select(F.col(id_col).alias("id"),
                  F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("sh"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_posting: int | None = None,
) -> DataFrame:
    """Exact n-gram (shingle-set) Jaccard similarity pairs ≥ threshold.

    Candidate generation via the inverted index (shingle self-join),
    intersection counts from the join, union sizes from per-doc distinct
    shingle counts. ``max_posting`` applies the frequency cut for skew
    (None = exact mode, used when an oracle must match).

    Returns: ``id_a``, ``id_b`` (id_a < id_b), ``jaccard`` (rounded 6).
    """
    post = _distinct_shingle_posting(df, id_col, text_col, n)
    # join on the 64-bit shingle hash, not the string: smaller shuffle
    # rows; collision probability over the corpus is ~2^-64·|pairs|,
    # i.e. vanishing (and would only perturb one intersection count).
    post = post.select("id", F.xxhash64("sh").alias("h"))
    if max_posting is not None:
        post = (
            post.withColumn("__df", F.count(F.lit(1)).over(Window.partitionBy("h")))
            .filter(F.col("__df") <= max_posting)
            .drop("__df")
        )
    # carry each doc's shingle-set size on the posting rows (one window
    # shuffle on id) so no extra sizes-join is needed, and persist: the
    # self-join reads the posting twice and shingle generation is the
    # expensive part. At cluster scale this persist is a few bytes/doc.
    post = post.withColumn(
        "n_sh", F.count(F.lit(1)).over(Window.partitionBy("id"))
    ).persist()

    a, b = post.alias("a"), post.alias("b")
    pair = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first("a.n_sh").alias("n_a"),
            F.first("b.n_sh").alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.round(F.col("inter").cast("double")
                    / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double"), 6),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return pair.select("id_a", "id_b", "jaccard")


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
) -> DataFrame:
    """MinHash signatures: columns ``id, m0..m{k-1}`` where ``m_i`` is the
    min over the doc's shingle hashes of the deterministic affine
    permutation ``(a_i·h + b_i) mod (2^31−1)``.

    Formulated as explode → groupBy(id) with k ``min`` aggregates: ONE
    shuffle on the doc id with map-side partial mins — the shape that
    scales (an array-HOF formulation re-inlines the shingle expression
    per permutation and blows up codegen; measured 90× slower).

    Docs with fewer than ``n`` tokens have no shingles and drop out.
    """
    sh_sets = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(F.col(text_col), n)).alias("sh"),
    )
    post = sh_sets.select(
        "id", F.explode("sh").alias("s")
    ).withColumn("h", F.pmod(F.xxhash64("s"), F.lit(_MERSENNE)))
    aggs = []
    for i in range(num_hashes):
        a = 2 * i + 1          # odd multipliers; deterministic, no RNG
        b = (i * i + 1) % _MERSENNE
        aggs.append(F.min((a * F.col("h") + b) % _MERSENNE).alias(f"m{i}"))
    return post.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH near-dup pairs, verified with exact Jaccard.

    bands=32 × rows=4 over 128 hashes: detection prob at j=0.5 is
    1−(1−0.5⁴)³² ≈ 0.87, at j=0.7 ≈ 0.9998 — the standard S-curve for
    a 0.5 threshold with exact verification discarding false positives.

    Returns: ``id_a``, ``id_b``, ``jaccard`` (exact, rounded 6) — a
    subset of :func:`ngram_jaccard_pairs` with the same threshold
    (equal when LSH recall is 1 on the data).
    """
    rows = num_hashes // bands
    # persist the per-doc distinct shingle sets ONCE: signatures (via
    # explode) and exact verification both read them.
    sh_sets = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(F.col(text_col), n)).alias("sh"),
    ).persist()
    post = sh_sets.select("id", F.explode("sh").alias("s")).withColumn(
        "h", F.pmod(F.xxhash64("s"), F.lit(_MERSENNE))
    )
    aggs = []
    for i in range(num_hashes):
        a_c = 2 * i + 1
        b_c = (i * i + 1) % _MERSENNE
        aggs.append(F.min((a_c * F.col("h") + b_c) % _MERSENNE).alias(f"m{i}"))
    sig_df = post.groupBy("id").agg(*aggs)
    band_cols = [
        F.md5(F.concat_ws(",", F.lit(bi), *[F.col(f"m{bi * rows + r}") for r in range(rows)]))
        .alias("bucket")
        for bi in range(bands)
    ]
    buckets = sig_df.select("id", F.explode(F.array(*band_cols)).alias("bucket"))
    l, r = buckets.alias("l"), buckets.alias("r")
    candidates = (
        l.join(r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    # exact verification on CANDIDATES ONLY: join each side's distinct
    # shingle set and compute Jaccard pairwise (array_intersect) — cost
    # O(collisions · shingles), never the full inverted-index join.
    verified = (
        candidates.join(sh_sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh_sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(F.col("inter").cast("double")
                    / (F.size("sh_a") + F.size("sh_b") - F.col("inter")).cast("double"), 6),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


def simhash64(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document with one shuffle.

    Explode tokens → xxhash64 per token → for each bit, sum(+1/−1) per
    doc → sign bit. Weighted variant would weight by token frequency;
    this uses distinct-token presence (unweighted) for determinism.

    Returns: ``id``, ``simhash`` (signed 64-bit long).
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
        ).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), k).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{k}")
            for k in range(64)
        ]
    )
    sim = F.lit(0).cast("long")
    for k in range(64):
        sim = sim.bitwiseOR(
            F.when(F.col(f"b{k}") > 0, F.shiftleft(F.lit(1).cast("long"), k)).otherwise(0)
        )
    return bit_sums.select("id", sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance ≤ ``max_hamming``.

    Pigeonhole banding: split the 64-bit sketch into ``max_hamming+1``
    chunks; any pair within the distance bound agrees exactly on ≥1
    chunk, so equality joins on (chunk_index, chunk_value) generate all
    candidates; verify with ``bit_count(xor) ≤ d``.

    Returns: ``id_a``, ``id_b``, ``hamming``.
    """
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    sim = simhash64(df, id_col, text_col)
    chunks = sim.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("ci"),
                    F.shiftrightunsigned(F.col("simhash"), i * width)
                    .bitwiseAND(F.lit((1 << width) - 1)).alias("cv"),
                )
                for i in range(n_chunks)
            ])
        ).alias("c"),
    ).select("id", "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    l, r = chunks.alias("l"), chunks.alias("r")
    return (
        l.join(
            r,
            (F.col("l.ci") == F.col("r.ci"))
            & (F.col("l.cv") == F.col("r.cv"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold.

    Brute-force baseline (exact): self-join with id_a < id_b, cosine via
    ``zip_with`` + ``aggregate`` (JVM, codegen). O(n²·d): correct answer
    and fine to ~10⁴ rows; beyond that use the LSH bucketing in
    operators/similarity (same verify step, candidate set from banding).

    Returns: ``id_a``, ``id_b``, ``cosine`` (rounded 6).
    """
    v = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    v = v.withColumn("norm", norm)
    # The broadcast-nested-loop join streams the left side: spread it
    # across all cores (a small parquet read arrives as ONE partition —
    # measured 4-5x on local[32], and the difference between one busy
    # executor and a full cluster at scale).
    par = df.sparkSession.sparkContext.defaultParallelism
    a, b = v.repartition(par).alias("a"), v.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(dot / (F.col("a.norm") * F.col("b.norm")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
