"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented query/operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-equivalent SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ksql_query_tutorial_spark.extensions import EXTENSION_ORACLES, EXTENSION_QUERIES
from ksql_query_tutorial_spark.oracles import TUTORIAL_ORACLES
from ksql_query_tutorial_spark.queries import TUTORIAL_QUERIES, q17_player_stats


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the player_stats CTAS analog (all.sql:129-160) —
    join + conditional sums + count-distinct ratio + max_by in one pass.
    """
    return q17_player_stats(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    training-data-pipeline extensions (dedup/similarity/text/multimodal)."""
    return {**TUTORIAL_QUERIES, **EXTENSION_QUERIES}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL, keyed identically to :func:`queries`.

    Everything gets the full value-hash compare — including MinHash-LSH
    and embedding-LSH (recall-1 regime at the oracle sf, verified, so
    the exact oracles apply), LSH-ANN (the seeded hyperplanes are
    data-independent constants inlined into the SQL), the mapInPandas
    byte features (histogram() aggregate), and the iterative
    connected-components dedup (recursive CTE) — EXCEPT the only two
    provably non-reproducible ops: dedup_simhash (defined over Spark's
    xxhash64, absent in DuckDB) and ann_ivf_topk (recall < 1 with
    driver-trained centroids); those two take the rows-only check and
    carry the proof in their docstrings."""
    return {**TUTORIAL_ORACLES, **EXTENSION_ORACLES}
