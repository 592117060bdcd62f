"""localCheckpoint lifecycle sweep (VERDICT r8 #4).

The cache-registry sweep (``test_cache_registry.py``) deliberately
excludes operators whose intermediates are ``localCheckpoint``-backed:
their blocks cannot be unpersisted early (that would destroy the
checkpoint the returned plan still reads) and are instead reclaimed by
``ContextCleaner`` when the JVM RDD object is garbage-collected. This
companion sweep proves that contract actually holds for every excluded
family — after dropping all Python references to a query's result and
forcing a JVM GC, the checkpointed RDD blocks really are removed from
the persistent-RDD map, so a long-lived session (the EngineSession /
bench process model) cannot accumulate unreclaimable storage.

Mechanics: the Python DataFrame is the only holder of the py4j proxy
chain to the JVM Dataset whose plan pins the LogicalRDD; CPython
refcounting frees the proxy immediately on ``del``, py4j detaches the
JVM object, and the next JVM GC enqueues the RDD on ContextCleaner's
reference queue, whose (asynchronous) cleanup unpersists the blocks —
hence the bounded poll loop rather than a single assert.
"""

from __future__ import annotations

import gc
import time

import pytest

import __spark_entry__ as entrymod
from ksql_query_tutorial_spark import cache
from tests.conftest import SF_SMOKE

QUERIES = entrymod.queries()

# One representative per localCheckpoint-backed family excluded from
# the cache-registry sweep: k-core, pagerank, label-prop, PCA
# (covariance + power iteration), modularity, IVF assignment skew,
# connected-components dedup, and the as-of range-join source.
CHECKPOINT_SWEEP = [
    "graph_kcore",
    "graph_pagerank",
    "graph_label_prop",
    "graph_modularity",
    "embedding_pca_project",
    "embedding_pca_power",
    "embedding_assign_skew",
    "dedup_clusters",
    "sample_importance",
    # NOT range_orders_90d / asof queries: range_join checkpoints only
    # on how="left" (the __lid-correlation materialization), and every
    # declared query drives the inner path — nothing to reclaim.
]


def _persistent_rdd_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def _await_reclaim(spark, baseline: set[int], timeout: float = 60.0) -> set[int]:
    """Poll until no persistent RDDs beyond ``baseline`` remain,
    nudging the JVM GC each round (ContextCleaner cleans via a
    weak-reference queue, so reclamation is GC-driven and async)."""
    deadline = time.monotonic() + timeout
    leaked = _persistent_rdd_ids(spark) - baseline
    while leaked and time.monotonic() < deadline:
        gc.collect()  # free any lingering py4j proxies first
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        leaked = _persistent_rdd_ids(spark) - baseline
    return leaked


def test_sweep_names_exist():
    missing = [n for n in CHECKPOINT_SWEEP if n not in QUERIES]
    assert not missing, missing


@pytest.mark.parametrize("name", CHECKPOINT_SWEEP)
def test_checkpoint_blocks_reclaimed_after_gc(spark, name):
    cache.release()
    # settle any droppings from earlier tests so the baseline is honest
    _await_reclaim(spark, set(), timeout=10.0)
    before = _persistent_rdd_ids(spark)

    df = QUERIES[name](spark, SF_SMOKE)
    df.count()
    during = _persistent_rdd_ids(spark) - before
    # the family is checkpoint-backed: blocks exist while referenced
    assert during, (
        f"{name} checkpointed nothing — if it no longer uses "
        f"localCheckpoint, move it to the cache-registry sweep")

    del df
    cache.release()  # some families ALSO pin via the registry
    leaked = _await_reclaim(spark, before)
    assert not leaked, (
        f"{name}: {len(leaked)} checkpointed RDD block set(s) survived "
        f"reference drop + JVM GC — a long-lived session would "
        f"accumulate unreclaimable storage")
