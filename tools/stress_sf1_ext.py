"""sf1 scaling check for the EXTENSION families (VERDICT r3 #6):
dedup (MinHash-LSH, SimHash, embedding-LSH, LSH-fed clusters),
quantized similarity search, Bloom decontamination, and the KMV
sketch, timed at sf0.1 vs the 10x-replicated sf1 fixture — plus a
recall re-verification of the MinHash-LSH recall-1 claim at sf1.

The recall check exploits the fixture construction (tools/gen_sf1.py):
replica 0 is the base corpus VERBATIM (ids and text unchanged), so the
exact near-dup pairs of the base corpus are a subset of sf1's true pair
set, and LSH-at-sf1 restricted to base-id pairs must equal the exact
all-pairs Jaccard result on the base corpus. Usage:
    python tools/gen_sf1.py .stress/sf1   # once
    python tools/stress_sf1_ext.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksql_query_tutorial_spark.session import get_spark  # noqa: E402
from tools.stress_sf1 import SF01, SF1, SF_WARM, time_queries  # noqa: E402

# The verdict-listed ops plus their family siblings; text_token_stats
# rides along as the pure-scan anchor (its ratio ~ the raw IO ratio).
EXT_NAMES = [
    "text_token_stats",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "dedup_clusters_lsh",
    "similarity_topk_q8",
    "decontaminate_bloom",
    "corpus_kmv_vocab",
    # r5 additions: deterministic split/shuffle, hashed linear scoring,
    # the end-to-end curate pipeline, and PQ ANN with exact rerank.
    # (corpus_split is a pure narrow map — a second scan-bound anchor.)
    "corpus_split",
    "corpus_shuffle",
    "text_quality_score",
    "corpus_curate",
    "ann_pq_topk",
    "corpus_lm_score",
    "events_funnel",
    # r5 mid-round additions: context-window chunking (narrow map +
    # generator, zero shuffles) and per-domain frequency capping
    # (skew-safe two-level per-group rank).
    "corpus_chunk",
    "corpus_domain_cap",
    # r5 late additions: schemaless-JSON stats, cohort retention, and
    # deterministic nearest-centroid assignment.
    "events_props_stats",
    "events_retention",
    "embedding_cluster_assign",
    "events_anomaly",
    "embedding_label_centroids",
    "text_entropy",
    "events_salted_agg",
    "audit_referential",
    "corpus_diff",
    "corpus_cooccurrence",
    "events_moving_avg",
    "corpus_summary",
    # r5 final batch: session paths, CMS sketch, containment dedup,
    # z-order layout audit, novelty, temperature mix, histograms.
    "events_top_paths",
    "corpus_cms_counts",
    "dedup_containment",
    "layout_zorder",
    "corpus_novelty",
    "corpus_mix_temperature",
    "events_histogram",
    "graph_pagerank",
    "embedding_covariance",
    "embedding_outliers",
    "customer_rfm",
    "orders_basket",
    "events_markov",
    "corpus_clean",
    "hybrid_search",
    "mm_frame_dedup",
    "sample_weighted",
    "events_attribution",
    "events_scd2",
    "orders_fulfillment",
    "events_active_users",
    # r5 final additions: HLL sketch, per-group top-k, Pareto
    # concentration, session stats, the Q1-style pricing summary, and
    # the BPE merge trainer (iterative; vocab-bounded after round 0).
    "events_hll_users",
    "orders_top_customers",
    "orders_pareto",
    "events_sessions",
    "lineitem_pricing_summary",
    "corpus_bpe_merges",
    # r5 closing batch: single-pass column profile, time-decay
    # engagement, Levenshtein blocking dedup, Q3-shape top-N, and the
    # inverted-index materialization.
    "profile_orders",
    "events_decay",
    "dedup_levenshtein",
    "orders_shipping_priority",
    "corpus_index",
    "corpus_bpe_encode",
    "orders_count_distribution",
    "lineitem_revenue_delta",
    "corpus_drift",
    "embedding_matryoshka",
    "orders_winsorized",
    "privacy_k_anonymity",
    "events_seasonal_baseline",
    "graph_label_prop",
    "events_multitouch",
    "events_incremental_rollup",
    "lineitem_correlations",
    "events_ab_test",
    "orders_cohort_ltv",
    "mm_audio_windows",
    "orders_returned_revenue",
    "orders_large_volume",
    "events_gap_fill",
    "orders_backlog",
    "orders_equidepth_bins",
    "customer_spend_ranks",
    "audit_benford",
    "embedding_pca_power",
    "embedding_pca_project",
    "lineitem_elasticity",
    "text_lang_confusion",
    "corpus_zipf",
    # r5 decision-support batch: Q15/Q22/Q14/Q7/Q19 shapes.
    "supplier_top_revenue",
    "customer_rich_inactive",
    "part_promo_share",
    "nation_trade_flows",
    "part_band_revenue",
    # r5 second decision-support batch: Q4/Q5/Q8/Q9/Q12/Q17/Q21 shapes.
    "orders_priority_check",
    "nation_local_volume",
    "nation_market_share",
    "supplier_profit",
    "orders_ship_lag",
    "part_small_lots",
    "supplier_sole_late",
    # r5 pipeline batch: cohort conversion lag, GDPR cascade impact,
    # LSH-vs-exact dedup evaluation, conjunctive index retrieval.
    "events_conversion_lag",
    "privacy_delete_impact",
    "dedup_minhash_eval",
    "corpus_search",
    # r5 iterative/streaming-shape batch: Lloyd round, hopping windows.
    "embedding_kmeans",
    "events_hopping_window",
    # r5 skew/Q2/Q16 batch.
    "orders_key_skew",
    "part_min_cost_supplier",
    "supplier_part_counts",
    # r5 eval/readability/cadence batch.
    "ann_recall_eval",
    "text_readability",
    "orders_reorder_intervals",
    # r5 changelog/quantile batch.
    "events_tombstone_state",
    "events_value_quantiles",
    # r5 DP release + Q20 batch.
    "privacy_dp_counts",
    "supplier_dominant_parts",
    # r5 comparable-period / calibration batch.
    "lineitem_yoy_growth",
    "nation_rank_movers",
    "embedding_cos_histogram",
    # r5 SLO / graph-composition batch.
    "events_slo_burn",
    "dedup_graph_degrees",
    # r5 reliability/traffic batch.
    "supplier_lead_time",
    "events_bot_flags",
    # r5 concentration batch.
    "nation_revenue_hhi",
    # r5 curation-calibration batch.
    "corpus_yield_curve",
    # r5 corpus-statistics / behavior batch.
    "corpus_heaps",
    "events_behavior_entropy",
    # r5 dedup-accounting batch.
    "dedup_savings_report",
    # r5 graph/privacy/featurization batch: co-purchase triangles,
    # l-diversity, hashing-trick signatures.
    "graph_triangles",
    "privacy_l_diversity",
    "corpus_feature_hash",
    # r5 occupancy/graph-coefficient/provenance batch.
    "events_concurrency",
    "graph_clustering_coef",
    "dedup_source_matrix",
    # r5 temporal/churn batch.
    "events_twa",
    "customer_survival",
    # r5 peeling/drift batch.
    "graph_kcore",
    "events_cusum",
    # r5 governance/experimentation/calibration batch.
    "privacy_generalization",
    "events_power_analysis",
    "embedding_threshold_sweep",
    # r5 forward-asof batch.
    "asof_click_next_purchase",
    # r5 growth-metrics batch.
    "events_rolling_actives",
    # r5 privacy-triad/text-routing batch.
    "privacy_t_closeness",
    "text_code_detect",
    # r5 embedding-monitoring batch.
    "embedding_centroid_drift",
    # r5 audience-analytics batch.
    "events_audience_overlap",
    # r5 shingle-calibration batch.
    "dedup_shingle_sweep",
    # r5 calendar-analytics batch.
    "events_seasonal_profile",
    # r5 simhash-calibration batch.
    "text_simhash_histogram",
    # r5 tokenizer-economics batch.
    "corpus_fertility",
    # r5 embedding-eval / token-accounting batch.
    "embedding_centroid_confusion",
    "dedup_token_savings",
    # r5 experiment-hygiene batch.
    "events_ab_srm",
    # r5 growth/supply-risk batch.
    "events_new_vs_returning",
    "supplier_single_source",
    # r5 graph-mixing / pricing-audit batch.
    "graph_assortativity",
    "part_price_dispersion",
    # r5 corpus-monitoring batch.
    "corpus_length_drift",
]


def main() -> None:
    spark = get_spark("stress-sf1-ext")
    from pyspark.sql import functions as F

    from ksql_query_tutorial_spark.extensions import EXTENSION_QUERIES
    from ksql_query_tutorial_spark.tables import load

    qs = {n: EXTENSION_QUERIES[n] for n in EXT_NAMES}

    # warm footers + codegen + Arrow workers at the smallest sf
    for t in ("documents", "embeddings", "events"):
        load(spark, SF1, t).count()
    from bench import _force

    for name in sorted(qs):
        _force(qs[name](spark, SF_WARM))  # warm the SAME final stage the
        # timed checksum pass runs (count() compiles a different plan tail)
    spark.catalog.clearCache()

    t01 = time_queries(spark, qs, SF01)
    t1 = time_queries(spark, qs, SF1)

    print(f"\n{'query':32s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s}")
    worst = 0.0
    for name in EXT_NAMES:
        ratio = t1[name] / max(t01[name], 1e-9)
        worst = max(worst, ratio)
        print(f"{name:32s} {t01[name]:8.3f} {t1[name]:8.3f} {ratio:7.2f}")
    tot01, tot1 = sum(t01.values()), sum(t1.values())
    print(f"{'TOTAL':32s} {tot01:8.3f} {tot1:8.3f} {tot1 / tot01:7.2f}")
    print(f"worst per-query ratio: {worst:.2f} (linear = 10)")

    # ---- MinHash-LSH recall-1 re-verification at sf1 ----------------
    # Base-id pairs found by LSH on the FULL sf1 corpus must equal the
    # exact all-pairs Jaccard result on the base corpus: replica 0 is
    # byte-identical to base, so any base pair LSH misses at sf1 is a
    # recall loss, and any extra base pair is a verification bug (the
    # operator exact-verifies candidates, so precision is 1 by
    # construction — this checks recall survives the 10x corpus).
    doc_base = (
        load(spark, SF01, "documents").agg(F.max("doc_id")).collect()[0][0] + 1
    )
    lsh_sf1 = {
        (r.id_a, r.id_b)
        for r in EXTENSION_QUERIES["dedup_minhash_lsh"](spark, SF1)
        .filter((F.col("id_a") < doc_base) & (F.col("id_b") < doc_base))
        .collect()
    }
    exact_base = {
        (r.id_a, r.id_b)
        for r in EXTENSION_QUERIES["dedup_ngram_jaccard"](spark, SF01).collect()
    }
    missed = exact_base - lsh_sf1
    extra = lsh_sf1 - exact_base
    assert not missed, f"LSH @ sf1 lost recall on base pairs: {sorted(missed)[:10]}"
    assert not extra, f"LSH @ sf1 emitted non-pairs among base ids: {sorted(extra)[:10]}"
    print(
        f"recall check: LSH@sf1 base-id pairs == exact base pairs "
        f"({len(exact_base)} pairs, recall 1.0)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
