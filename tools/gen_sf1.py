"""Generate an sf1-equivalent fixture by FK-consistent 10x replication
of the driver's sf0.1 tables (the driver ships sf0.1 as its largest).

Replication model: replica i shifts every entity key by i * (max_key+1)
for that entity, applied consistently on both sides of each foreign key
(orders.o_custkey shifts with customer.c_custkey, lineitem's order/
part/supp keys shift with their parents). The bounded dimensions
(region, nation) are NOT replicated — they are bounded domains at any
scale factor, which is exactly what keeps them broadcast-able; replicas
keep their nationkey references into the shared dimension. Value
distributions are preserved exactly (10x the rows, same histograms), so
per-query work should scale ~linearly in sf.

Output: .stress/sf1/*.parquet (git-ignored scratch). Usage:
    python tools/gen_sf1.py [dst_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksql_query_tutorial_spark.session import get_spark  # noqa: E402
from ksql_query_tutorial_spark.tables import load  # noqa: E402

SRC = "/root/testdata/sf0.1"
# 10 -> sf1; override (e.g. GEN_SF_REPLICAS=30 -> sf3) for extra
# scale points on the stress curve
REPLICAS = int(os.environ.get("GEN_SF_REPLICAS", "10"))

# table -> columns sharing that table's key domain (shift together)
KEY_DOMAINS = {
    "customer": {"customer": ["c_custkey"], "orders": ["o_custkey"]},
    "orders": {"orders": ["o_orderkey"], "lineitem": ["l_orderkey"]},
    "part": {"part": ["p_partkey"], "lineitem": ["l_partkey"]},
    "supplier": {"supplier": ["s_suppkey"], "lineitem": ["l_suppkey"]},
    "events": {"events": ["event_id", "user_id"]},
}
REPLICATED = ("customer", "supplier", "part", "orders", "lineitem", "events")
SHARED_DIMS = ("region", "nation")


def main(dst: str) -> None:
    spark = get_spark("gen_sf1")
    os.makedirs(dst, exist_ok=True)

    # one base per key domain: max key + 1 at sf0.1 (cheap scalar aggs)
    base: dict[str, int] = {}
    for domain, users in KEY_DOMAINS.items():
        owner_table, owner_cols = next(iter(users.items()))
        df = load(spark, SRC, owner_table)
        base[domain] = int(df.agg(F.max(owner_cols[0])).collect()[0][0]) + 1

    for name in SHARED_DIMS:
        load(spark, SRC, name).write.mode("overwrite").parquet(f"{dst}/{name}.parquet")

    for name in REPLICATED:
        df = load(spark, SRC, name)
        shifted = df.crossJoin(
            spark.range(REPLICAS).withColumnRenamed("id", "__r")
        )
        for domain, users in KEY_DOMAINS.items():
            for col in users.get(name, []):
                shifted = shifted.withColumn(
                    col, F.col(col) + F.col("__r") * F.lit(base[domain])
                )
        shifted.drop("__r").write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(f"{name}: written", flush=True)

    # documents: shift ids; append a per-replica token so copies are
    # NEAR-dups (replica structure stays realistic for shingle ops
    # without collapsing to exact duplicates). Replica 0 is left
    # UNTOUCHED so the sf1 corpus is a strict superset of the base
    # corpus — any parity comparison anchored to base document text
    # stays valid (ADVICE r3: the old version rtagged replica 0 too).
    d = load(spark, SRC, "documents")
    doc_base = int(d.agg(F.max("doc_id")).collect()[0][0]) + 1
    dd = (
        d.crossJoin(spark.range(REPLICAS).withColumnRenamed("id", "__r"))
        .withColumn("doc_id", F.col("doc_id") + F.col("__r") * F.lit(doc_base))
        .withColumn(
            "text",
            F.when(F.col("__r") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" rtag"), F.col("__r"))
            ),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .drop("__r")
    )
    dd.write.mode("overwrite").parquet(f"{dst}/documents.parquet")
    print("documents: written", flush=True)

    # embeddings: shift ids, keep vectors (timing-faithful; planted
    # neighbor structure replicates per copy)
    e = load(spark, SRC, "embeddings")
    vec_base = int(e.agg(F.max("vec_id")).collect()[0][0]) + 1
    ee = (
        e.crossJoin(spark.range(REPLICAS).withColumnRenamed("id", "__r"))
        .withColumn("vec_id", F.col("vec_id") + F.col("__r") * F.lit(vec_base))
        .drop("__r")
    )
    ee.write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")
    print("embeddings: written", flush=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".stress/sf1")
