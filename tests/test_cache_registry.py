"""Session cache-registry lifecycle (VERDICT r7 #4).

Operators that persist return-path intermediates (shingle postings,
LSH sketches, normalized edge lists, BPE states) route them through
``ksql_query_tutorial_spark.cache.pin`` so a long-lived session can
reclaim every block with ``cache.release()`` — without it, repeated
operator calls accumulate pinned blocks the caller has no handle on
(the r6 dedup finding, extended to graph/corpus/similarity in r8).

The sweep below runs each persist-backed query in ONE shared session,
forces it, releases, and asserts the JVM's persistent-RDD map returns
to its pre-query state. localCheckpoint-based operators (k-core,
pagerank, label-prop, CC, PCA, as-of) are excluded: their blocks are
freed by ContextCleaner on RDD garbage-collection, not unpersist —
the r7-measured ``System.gc()`` pattern — and cannot be dropped early
without destroying the checkpoint.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from ksql_query_tutorial_spark import cache
from tests.conftest import SF_SMOKE

QUERIES = entrymod.queries()

# Every query whose plan pins blocks via cache.pin and uses NO
# localCheckpoint anywhere in its lineage.
PERSIST_ONLY_SWEEP = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_containment",
    "dedup_minhash_eval",
    # dedup_embedding_lsh is NOT here: bucket-mode verify scores inside
    # per-(table, code) applyInPandas groups with no shared persisted
    # frame (the pin sits on the join-mode path only).
    "dedup_shingle_sweep",
    "graph_triangles",
    "graph_clustering_coef",
    "graph_link_prediction",
    "corpus_novelty",
    "corpus_cms_counts",
    "corpus_lm_score",
    "corpus_kn_bigram",
    # corpus_bpe_encode moved to the checkpoint-lifecycle sweep in r9:
    # its rounds chain through lazy localCheckpoints now (the former
    # per-round cache.pin was the plan-nesting cost the r9 optimization
    # removed).
    "embedding_kmeans",
]


def _persistent_rdd_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def test_sweep_names_exist():
    missing = [n for n in PERSIST_ONLY_SWEEP if n not in QUERIES]
    assert not missing, missing


@pytest.mark.parametrize("name", PERSIST_ONLY_SWEEP)
def test_no_pinned_blocks_after_release(spark, name):
    cache.release()  # start clean w.r.t. the registry
    before = _persistent_rdd_ids(spark)
    QUERIES[name](spark, SF_SMOKE).count()
    released = cache.release()
    assert released > 0, (
        f"{name} is in the persist-only sweep but pinned nothing — "
        f"either it stopped persisting (update the sweep) or a persist "
        f"bypassed cache.pin")
    after = _persistent_rdd_ids(spark)
    leaked = after - before
    assert not leaked, (
        f"{name} left {len(leaked)} pinned RDD(s) after cache.release() "
        f"— a persist that bypassed the registry")


def test_release_is_idempotent_and_counts(spark):
    cache.release()
    assert cache.release() == 0
    QUERIES["dedup_minhash_lsh"](spark, SF_SMOKE).count()
    n = cache.pinned_count()
    assert n > 0
    assert cache.release() == n
    assert cache.pinned_count() == 0
