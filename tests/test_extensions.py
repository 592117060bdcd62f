"""Property tests for the non-SQL-expressible extension operators
(the ones the driver can only rows-only check): MinHash-LSH, SimHash,
LSH-ANN, multimodal feature extraction."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ksql_query_tutorial_spark.extensions import (
    ann_lsh_topk,
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash,
    mm_features,
    similarity_topk,
)
from ksql_query_tutorial_spark.operators import dedup, multimodal
from ksql_query_tutorial_spark.tables import load
from tests.conftest import SF_ORACLE


def test_minhash_lsh_is_high_recall_subset_of_exact(spark):
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup_ngram_jaccard(spark, SF_ORACLE).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup_minhash_lsh(spark, SF_ORACLE).collect()
    }
    # soundness: every LSH pair is a true pair with the exact jaccard
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]
    # recall: banding (b=32, r=4) at the planted-jaccard levels (>0.5)
    assert len(exact) > 0, "fixture should contain planted near-dups"
    recall = len(lsh) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.2f} below expectation"


def test_simhash_banding_equals_brute_force(spark):
    d = load(spark, SF_ORACLE, "documents")
    banded = {
        (r.id_a, r.id_b, r.hamming) for r in dedup.simhash_pairs(d, "doc_id").collect()
    }
    # brute force: cross-join the 64-bit sketches, same hamming bound
    sim = dedup.simhash64(d, "doc_id")
    a, b = sim.alias("a"), sim.alias("b")
    brute = {
        (r.id_a, r.id_b, r.hamming)
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    # pigeonhole banding must lose nothing within the distance bound
    assert banded == brute


def test_ann_structure_and_recall(spark):
    ann = ann_lsh_topk(spark, SF_ORACLE).collect()
    by_q: dict[int, list] = {}
    for r in ann:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)
    exact = similarity_topk(spark, SF_ORACLE).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = total = 0
    for q, rows in by_q.items():
        got = {r.neighbor_id for r in rows}
        hits += len(got & exact_sets.get(q, set()))
        total += len(exact_sets.get(q, set()))
    assert total > 0
    assert hits / total >= 0.2, f"ANN recall {hits}/{total} unexpectedly low"


def test_mm_features_match_payload_bytes(spark):
    feats = {r.media_id: r for r in mm_features(spark, SF_ORACLE).collect()}
    docs = {
        r.doc_id: r.text for r in load(spark, SF_ORACLE, "documents").collect()
    }
    assert set(feats) == set(docs)
    for i, txt in docs.items():
        payload = txt.encode("utf-8")
        f = feats[i]
        assert f.n_bytes == len(payload)
        assert abs(f.mean_byte - sum(payload) / len(payload)) < 1e-9
        assert f.byte_entropy is not None and 0 <= f.byte_entropy <= 8


def test_decode_image_is_a_guarded_stub():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"abc", fake=False)
    counts = multimodal.decode_image(b"abc", fake=True)
    assert sum(counts) == 3


def test_sample_frames_counts(spark):
    d = load(spark, SF_ORACLE, "documents")
    media = multimodal.media_from_documents(d)
    frames = multimodal.sample_frames(media, every_n_bytes=64, frame_bytes=16)
    got = {r.media_id: r.cnt for r in frames.groupBy("media_id").agg(F.count("*").alias("cnt")).collect()}
    want = {
        r.media_id: math.floor((r.n - 1) / 64) + 1
        for r in media.filter(F.col("media_type") == "video")
        .select("media_id", F.length("payload").alias("n"))
        .collect()
    }
    assert got == want
