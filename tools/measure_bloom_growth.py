"""Measure decontaminate (exact broadcast shingle index) vs
bloom_decontaminate (constant-size bit-packed filter) as the benchmark
set grows (VERDICT r3 #5).

Train side is fixed (sf0.1 documents minus the eval split); the bench
side is scaled 1x / 10x / 100x by replicating the eval split with a
per-replica token appended (near-dup replicas — distinct shingles GROW
with the replica count, which is exactly the regime that blows up the
exact index and where the Bloom filter's <= m_bits state wins).

For each scale: wall time of both operators (best-of-2) and the size
of the broadcast artifact — distinct bench shingles for the exact op
(8 bytes/hash in the broadcast index) vs the fixed m_bits/8 bytes of
the packed filter.

Usage: python tools/measure_bloom_growth.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksql_query_tutorial_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [1, 10, 100, 1000]
M_BITS = 1 << 20
K_HASHES = 4


def bench_at(spark, base_bench, scale: int, doc_base: int):
    """Replicate the bench split `scale`x. `doc_base` must come from the
    FULL documents table max (not the bench split max) so replica ids
    never collide with train-side doc_ids (ADVICE r4)."""
    from pyspark.sql import functions as F

    if scale == 1:
        return base_bench
    return (
        base_bench.crossJoin(
            spark.range(scale).withColumnRenamed("id", "__r")
        )
        .withColumn("doc_id", F.col("doc_id") + F.col("__r") * F.lit(doc_base))
        .withColumn(
            "text",
            F.when(F.col("__r") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" btag"), F.col("__r"))
            ),
        )
        .drop("__r")
    )


def timed(fn, passes: int = 2) -> float:
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark("bloom-growth")
    from pyspark.sql import functions as F

    from ksql_query_tutorial_spark.operators import corpus
    from ksql_query_tutorial_spark.operators.dedup import shingles_of
    from ksql_query_tutorial_spark.operators.text import tokens
    from ksql_query_tutorial_spark.tables import load

    d = load(spark, SF, "documents")
    train = d.filter(F.col("doc_id") % 50 != 0)
    base_bench = d.filter(F.col("doc_id") % 50 == 0)
    doc_base = d.agg(F.max("doc_id")).collect()[0][0] + 1
    train.count()  # warm footers

    print(f"{'bench':>8s} {'shingles':>10s} {'exact idx':>10s} {'bloom bc':>9s} "
          f"{'exact s':>8s} {'bloom s':>8s}")
    for scale in SCALES:
        b = bench_at(spark, base_bench, scale, doc_base).persist()
        n_bench = b.count()
        n_shingles = (
            b.select(
                F.explode(
                    F.array_distinct(shingles_of(tokens(F.col("text")), 3))
                ).alias("sh")
            )
            .agg(F.countDistinct("sh"))
            .collect()[0][0]
        )
        t_exact = timed(
            lambda: corpus.decontaminate(train, b, min_hits=2).count()
        )
        t_bloom = timed(
            lambda: corpus.bloom_decontaminate(
                train, b, m_bits=M_BITS, k_hashes=K_HASHES, min_hits=2
            ).count()
        )
        print(
            f"{n_bench:8d} {n_shingles:10d} {n_shingles * 8 / 1024:8.0f}KB "
            f"{M_BITS / 8 / 1024:7.0f}KB {t_exact:8.2f} {t_bloom:8.2f}"
        )
        b.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
