"""Corpus-level training-data pipeline operators.

The ops a 100 TB pretraining pipeline runs AFTER per-document scoring
(operators/text.py) and near-dup removal (operators/dedup.py):

- :func:`pack_sequences` — concatenate-and-chunk token packing into
  fixed context windows (the GPT-style pretraining layout).
- :func:`decontaminate` — n-gram overlap of the training corpus
  against a benchmark/eval set.
- :func:`boilerplate_stats` — corpus-frequent shingle detection and
  the per-document boilerplate fraction.
- :func:`with_repetition` — Gopher-style intra-document repetition
  signals (duplicate-word fraction, top-bigram fraction).
- :func:`sample_stratified` — deterministic hash-based per-stratum
  downsampling.
- :func:`mix_budget` — per-source token accounting and sampling
  fractions for a weighted training mixture.

Everything is JVM-side DataFrame ops (no Python UDFs); every shuffle
key includes the document id or a bounded domain, so nothing here
concentrates data by an unbounded hot key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ksql_query_tutorial_spark import cache
from ksql_query_tutorial_spark.operators.dedup import shingles_of
from ksql_query_tutorial_spark.operators.text import tokens

# documents per prefix-sum block in pack_sequences; a block's subtotal
# row is ~16 bytes, so even 10^12 docs yield a 160 MB block table —
# still a groupBy away from broadcastable prefix offsets at 100 TB.
PACK_BLOCK = 100_000


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concatenate-and-chunk sequence packing: lay every document's
    tokens end-to-end in ``id_col`` order and cut the stream into
    fixed ``budget``-token context windows (documents may straddle a
    cut — exactly how GPT-style pretraining packs its batches).

    Scale design — the global running token offset is a HIERARCHICAL
    prefix sum, not one global window (a single-partition
    ``Window.orderBy`` serializes the whole corpus through one task):

    1. intra-block exclusive cumsum, window partitioned by
       ``block = id div PACK_BLOCK`` (parallel across blocks);
    2. per-block totals (groupBy — tiny: corpus_rows / PACK_BLOCK);
    3. exclusive cumsum OVER BLOCKS (single-partition window over the
       tiny block table only);
    4. broadcast the block offsets back.

    Returns one row per document: ``doc_id, n_tokens, begin_offset,
    pack_id, pack_end, straddles`` where ``pack_id``/``pack_end`` are
    the first/last context windows the document touches.
    """
    n_tok = F.size(tokens(F.col(text_col)))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        n_tok.cast("long").alias("n_tokens"),
        (F.col(id_col).cast("long") / F.lit(PACK_BLOCK)).cast("long").alias("__blk"),
    )

    intra_w = (
        Window.partitionBy("__blk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn(
        "__local", F.coalesce(F.sum("n_tokens").over(intra_w), F.lit(0))
    )

    blk_w = (
        Window.orderBy("__blk").rowsBetween(Window.unboundedPreceding, -1)
    )
    blk_offsets = (
        base.groupBy("__blk")
        .agg(F.sum("n_tokens").alias("__blk_total"))
        .withColumn("__blk_off", F.coalesce(F.sum("__blk_total").over(blk_w), F.lit(0)))
        .select("__blk", "__blk_off")
    )

    packed = (
        local.join(F.broadcast(blk_offsets), "__blk")
        .withColumn("begin_offset", F.col("__blk_off") + F.col("__local"))
        .withColumn("pack_id", (F.col("begin_offset") / budget).cast("long"))
        .withColumn(
            "pack_end",
            ((F.col("begin_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
             / budget).cast("long"),
        )
        .withColumn("straddles", F.col("pack_end") > F.col("pack_id"))
    )
    return packed.select(
        "doc_id", "n_tokens", "begin_offset", "pack_id", "pack_end", "straddles"
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_hits: int = 2,
) -> DataFrame:
    """Benchmark decontamination: for every training document, how many
    of its distinct ``n``-gram shingles also occur ANYWHERE in the
    benchmark set; ``contaminated`` flags docs with ≥ ``min_hits``.

    Plan shape: both sides explode to distinct (doc, shingle) postings;
    the benchmark side collapses to its distinct-shingle index (eval
    sets are tiny next to a training corpus, so Catalyst/AQE broadcasts
    it); a LEFT join + count keeps zero-hit documents in the output.

    Returns ``doc_id, n_shingles, n_contaminated, contamination_frac,
    contaminated`` for every training document.
    """
    t_post = (
        train.select(
            F.col(id_col).alias("doc_id"),
            tokens(F.col(text_col)).alias("__toks"),
        )
        .select(
            "doc_id",
            F.explode_outer(
                F.array_distinct(shingles_of(F.col("__toks"), n))
            ).alias("shingle"),
        )
    )
    bench_index = (
        bench.select(tokens(F.col(text_col)).alias("__toks"))
        .select(
            F.explode(F.array_distinct(shingles_of(F.col("__toks"), n))).alias("shingle")
        )
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    per_doc = (
        t_post.join(F.broadcast(bench_index), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("shingle").alias("n_shingles"),
            F.count("__hit").alias("n_contaminated"),
        )
        .withColumn(
            "contamination_frac",
            F.round(
                F.col("n_contaminated").cast("double")
                / F.greatest(F.col("n_shingles"), F.lit(1)).cast("double"),
                6,
            ),
        )
        .withColumn("contaminated", F.col("n_contaminated") >= min_hits)
    )
    return per_doc.select(
        "doc_id", "n_shingles", "n_contaminated", "contamination_frac", "contaminated"
    )


def boilerplate_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_docs: int = 10,
) -> DataFrame:
    """Corpus-level boilerplate detection: a shingle occurring in
    ≥ ``min_docs`` DISTINCT documents is boilerplate (headers, nav
    bars, license blurbs — the cross-document repetition that survives
    per-document quality filters); report each document's share.

    Two shuffles, both well-keyed: (doc, shingle) postings groupBy
    shingle for document frequency (shingle keys are long-tailed; the
    distinct-per-doc explode caps any one doc's contribution at 1 per
    shingle), then groupBy doc for the per-document rollup.

    Returns ``doc_id, n_shingles, n_boilerplate, boilerplate_frac``.
    """
    post = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("__toks"),
    ).select(
        "doc_id",
        F.explode_outer(F.array_distinct(shingles_of(F.col("__toks"), n))).alias(
            "shingle"
        ),
    )
    freq = (
        post.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("shingle", F.lit(1).alias("__bp"))
    )
    return (
        post.join(freq, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("shingle").alias("n_shingles"),
            F.count("__bp").alias("n_boilerplate"),
        )
        .withColumn(
            "boilerplate_frac",
            F.round(
                F.col("n_boilerplate").cast("double")
                / F.greatest(F.col("n_shingles"), F.lit(1)).cast("double"),
                6,
            ),
        )
        .select("doc_id", "n_shingles", "n_boilerplate", "boilerplate_frac")
    )


def with_repetition(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document:

    - ``dup_word_frac`` — 1 − distinct/total tokens (shuffle-free HOF);
    - ``top_bigram_frac`` — share of all bigram occurrences taken by
      the single most frequent bigram (explode + two doc-keyed
      aggregations; every shuffle key contains ``doc_id``, so skew is
      bounded by document length, not corpus size).

    High values ⇒ degenerate/templated text (Rae et al., Gopher
    appendix A): cut before tokenization, they are the cheapest
    quality win after URL filtering.

    Shape (r7): ONE corpus scan and tokenization — the per-doc scalar
    stats ride the bigram rows as grouping keys (constant per doc,
    two numeric columns of shuffle weight) instead of a second scan
    branch joined back. The explode is OUTER on purpose, and not only
    for the <2-token docs: a plain explode lets Catalyst infer a
    ``size(__bigrams) > 0 AND isnotnull(__bigrams)`` filter below the
    Generate, and pushing that predicate through the projection
    inlines the whole split+transform pipeline SEVERAL times per row
    — measured 10.5s vs ~1.1s at sf0.1 (the pre-r7 join shape paid
    exactly this). The null row a doc with <2 tokens emits is kept
    out of the counts by the conditional aggregates, so
    top_bigram_frac stays 0.0 for those docs as before.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("__toks"),
    ).select(
        "doc_id",
        F.size("__toks").cast("long").alias("n_tokens"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct("__toks")).cast("double")
            / F.greatest(F.size("__toks"), F.lit(1)).cast("double"),
            6,
        ).alias("dup_word_frac"),
        shingles_of(F.col("__toks"), 2).alias("__bigrams"),
    )
    rows = base.select(
        "doc_id", "n_tokens", "dup_word_frac",
        F.explode_outer("__bigrams").alias("bigram"),
    )
    counts = rows.groupBy(
        "doc_id", "n_tokens", "dup_word_frac", "bigram"
    ).agg(F.count(F.lit(1)).alias("c"))
    real = F.when(F.col("bigram").isNotNull(), F.col("c"))
    return (
        counts.groupBy("doc_id", "n_tokens", "dup_word_frac")
        .agg(
            F.max(real).alias("__top"),
            F.sum(F.coalesce(real, F.lit(0))).alias("__total"),
        )
        .select(
            "doc_id", "n_tokens", "dup_word_frac",
            F.round(
                F.coalesce(F.col("__top"), F.lit(0)).cast("double")
                / F.greatest(F.col("__total"), F.lit(1)).cast("double"),
                6,
            ).alias("top_bigram_frac"),
        )
    )


# multiplier/modulus for the portable sampling hash: doc_id is folded
# below 2**20 FIRST so the product stays far under 2**63 in any engine
# (Knuth's 2654435761 times 2**20 < 2**52) — the hash must be
# reproducible in plain BIGINT SQL, not just in Spark.
_HASH_FOLD = 1_048_573        # largest prime < 2**20
_HASH_MULT = 2_654_435_761    # Knuth multiplicative constant
_HASH_MOD = 1_000_000


def sample_hash(col) -> F.Column:
    """Deterministic uniform-ish hash of an integer id into
    [0, 1e6) — portable arithmetic (fold, multiply, mod) that any SQL
    engine reproduces exactly, unlike xxhash64/rand(seed)."""
    return F.pmod(F.pmod(col.cast("long"), F.lit(_HASH_FOLD)) * _HASH_MULT,
                  F.lit(_HASH_MOD))


def sample_stratified(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic stratified downsampling: keep a row iff
    ``sample_hash(id) < rate[stratum] * 1e6``. A pure narrow filter —
    no shuffle, no rand() (re-running the pipeline or re-reading a
    partition yields the SAME sample, which nondeterministic sampling
    breaks under task retries at cluster scale).

    Returns the sampled rows with the hash exposed as ``u`` (audit
    column: u/1e6 is the uniform variate the rate was compared to).
    """
    rate_expr = F.lit(float(default_rate))
    for stratum, rate in sorted(rates.items()):
        rate_expr = F.when(
            F.col(stratum_col) == stratum, F.lit(float(rate))
        ).otherwise(rate_expr)
    u = sample_hash(F.col(id_col))
    # round, don't truncate: rate * 1e6 for e.g. rate=0.29 is
    # 289999.99999... in binary floating point; a bare cast('long')
    # floors it and silently undershoots the requested rate.
    return (
        df.withColumn("u", u)
        .filter(F.col("u") < F.round(rate_expr * _HASH_MOD).cast("long"))
    )


def mix_budget(
    df: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    default_weight: float = 1.0,
) -> DataFrame:
    """Training-mixture planning: given per-source mixture ``weights``
    and a global ``total_tokens`` budget, compute each source's token
    allocation and the deterministic sampling fraction that realizes
    it (capped at 1 — a source cannot contribute more than it has).

    One bounded aggregation (sources are a small domain) + arithmetic;
    the output feeds :func:`sample_stratified` with
    ``rates = {source: sample_frac}``.

    Returns ``source, n_docs, n_tokens, weight, alloc_tokens,
    sample_frac`` ordered by source.
    """
    w_expr = F.lit(float(default_weight))
    for s, w in sorted(weights.items()):
        w_expr = F.when(F.col(source_col) == s, F.lit(float(w))).otherwise(w_expr)
    per_source = (
        df.select(
            F.col(source_col).alias("source"),
            F.size(tokens(F.col(text_col))).cast("long").alias("__t"),
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("__t").alias("n_tokens"))
        .withColumn("weight", F.round(w_expr, 6))
    )
    total_w = per_source.groupBy().agg(F.sum("weight").alias("__tw"))
    return (
        per_source.crossJoin(F.broadcast(total_w))
        .withColumn(
            "alloc_tokens",
            F.floor(F.lit(float(total_tokens)) * F.col("weight") / F.col("__tw"))
            .cast("long"),
        )
        .withColumn(
            "sample_frac",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.col("alloc_tokens").cast("double")
                    / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
                ),
                6,
            ),
        )
        .select("source", "n_docs", "n_tokens", "weight", "alloc_tokens", "sample_frac")
    )


def span_dedup_stats(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Duplicate-SPAN detection (the shingle approximation of
    suffix-array substring dedup, Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better"): any ``k``-token span
    whose text occurred earlier in the corpus (earlier doc, or earlier
    position in the same doc) marks its tokens as duplicated; the
    covered-token count per document is the union of those (possibly
    overlapping) spans.

    Plan shape — two shuffles, both scale-safe:

    1. spans explode to ``(doc_id, pos, xxhash64(span))``, repartitioned
       on the span hash; first occurrence per span hash is a
       groupBy-min joined back on the hash. Measured r7 note: the
       explicit repartition was added to let ReusedExchange share one
       occ pipeline between the agg and the join, but self-join
       attribute deduplication re-aliases one branch and defeats the
       canonical-plan match (both branches still materialize — a
       known Catalyst limitation); it still measured 2.20s → 1.46s
       at sf0.1 (best-of-3) because the downstream agg and join run
       over the repartitioned width instead of the parquet split
       count, and it removes their ENSURE_REQUIREMENTS exchanges. The
       window-over-``__h`` single-pipeline alternative was considered
       and rejected: an unbounded min window puts every occurrence of
       one hot boilerplate span in ONE task, while the groupBy keeps
       map-side combine and AQE splits any residual hot join
       partition;
    2. interval union per document is a gaps-and-islands running max
       over ``Window.partitionBy(doc_id)`` — parallel across docs,
       ordered only within one document's duplicate spans.

    Returns one row per input document: ``doc_id, n_tokens,
    dup_tokens, kept_tokens, dup_frac`` (dup_tokens = size of the
    union of duplicated spans; kept = tokens surviving span removal).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    docs = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).cast("int").alias("n_tokens"),
    )
    occ = (
        df.select(
            F.col(id_col).alias("doc_id"),
            tokens(F.col(text_col)).alias("__toks"),
        )
        .select(
            "doc_id",
            F.posexplode(shingles_of(F.col("__toks"), k)).alias("pos", "__sh"),
        )
        .select("doc_id", "pos", F.xxhash64("__sh").alias("__h"))
        .repartition(F.col("__h"))
    )
    firsts = occ.groupBy("__h").agg(
        F.min(F.struct("doc_id", "pos")).alias("__first")
    )
    dup = occ.join(firsts, "__h").filter(
        (F.col("doc_id") != F.col("__first.doc_id"))
        | (F.col("pos") != F.col("__first.pos"))
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    covered = dup.select(
        "doc_id",
        F.greatest(
            F.lit(0),
            (F.col("pos") + k) - F.greatest(F.coalesce(prev_end, F.col("pos")), F.col("pos")),
        ).alias("__new"),
    ).groupBy("doc_id").agg(F.sum("__new").cast("long").alias("dup_tokens"))
    return (
        docs.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
            (F.col("n_tokens").cast("long")
             - F.coalesce(F.col("dup_tokens"), F.lit(0))).alias("kept_tokens"),
            F.round(
                F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
                / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
                6,
            ).alias("dup_frac"),
        )
    )


# bloom position-hash constants: fold the (≤62-bit) shingle hash into
# the Mersenne-31 domain first so (2i+1)·h + i²+1 stays < 2^36, far
# from signed-64 overflow (Spark ANSI mode throws on wrap), and the
# same arithmetic reproduces in any BIGINT SQL engine.
_BLOOM_M31 = (1 << 31) - 1


def _bloom_positions(h: F.Column, k_hashes: int, m_bits: int) -> list[F.Column]:
    h31 = F.pmod(h, F.lit(_BLOOM_M31))
    return [
        F.pmod(F.pmod(h31 * (2 * i + 1) + (i * i + 1), F.lit(_BLOOM_M31)),
               F.lit(m_bits))
        for i in range(k_hashes)
    ]


def _bloom_shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int, portable: bool
) -> DataFrame:
    """``doc_id, h`` — one hash per distinct n-shingle per document
    (null h for shingle-less docs, kept so every doc survives to the
    rollup)."""
    from ksql_query_tutorial_spark.operators.dedup import (
        portable_token_hash,
        shingles_of,
    )
    from ksql_query_tutorial_spark.operators.text import tokens

    sh = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("__toks"),
    ).select(
        "doc_id",
        F.explode_outer(
            F.array_distinct(shingles_of(F.col("__toks"), n))
        ).alias("sh"),
    )
    h = portable_token_hash(F.col("sh")) if portable else F.xxhash64("sh")
    return sh.select("doc_id", F.when(F.col("sh").isNotNull(), h).alias("h"))


def _bloom_bitset_for_test(
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
    portable: bool = False,
) -> DataFrame:
    """The broadcastable filter artifact alone — exactly ONE row of
    bit-packed ``array<long>`` (``m_bits/64`` words), zero-filled when
    the benchmark is empty. Split out so tests can pin the payload
    shape without running the train-side probe plan."""
    n_words = (m_bits + 63) // 64

    def build_bits(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(n_words, dtype=np.uint64)
        pos = pdf["pos"].to_numpy(dtype=np.int64)
        np.bitwise_or.at(
            bits, pos >> 6, np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
        )
        return pd.DataFrame({"bits": [bits.astype(np.int64)]})

    return (
        _bloom_shingle_hashes(bench, id_col, text_col, n, portable)
        .filter(F.col("h").isNotNull())
        .select(
            F.explode(
                F.array(*_bloom_positions(F.col("h"), k_hashes, m_bits))
            ).alias("pos")
        )
        .distinct()
        .withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(lambda _key, pdf: build_bits(pdf), schema="bits array<long>")
        # An empty benchmark produces ZERO groups above (no filter row),
        # and a crossJoin against an empty side would drop every training
        # document. A global agg always emits exactly one row: OR-fold the
        # <=1 packed rows into a zero-filled array<long> init, so the
        # empty-bench case degrades to an all-zero filter (n_flagged=0
        # everywhere), matching decontaminate() and the oracle.
        .agg(
            F.aggregate(
                F.collect_list("bits"),
                F.array_repeat(F.lit(0).cast("long"), n_words),
                lambda acc, x: F.zip_with(acc, x, lambda a, b: a.bitwiseOR(b)),
            ).alias("bits")
        )
    )


def bloom_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
    min_hits: int = 2,
    portable: bool = False,
) -> DataFrame:
    """Bloom-filter decontamination — the constant-size-broadcast scale
    path for :func:`decontaminate`: the benchmark set is compressed to
    the SET OF SET BIT POSITIONS of a Bloom filter (``k_hashes``
    positions per distinct benchmark shingle, folded into ``m_bits``);
    a training shingle is flagged iff ALL its ``k_hashes`` positions
    are set. Classic Bloom semantics: no false negatives (every truly
    contaminated shingle flags), false positives at the standard
    ``(1-e^{-kn/m})^k`` rate — deterministic and reproduced exactly by
    the oracle, which computes the same positions.

    Plan shape: the bench side collapses to ≤ ``min(k·|shingles|,
    m_bits)`` distinct positions — bounded by ``m_bits`` (128 KiB of
    bit-packed state at 2^20) REGARDLESS of benchmark size, which is
    what a 100 TB pipeline broadcasts where :func:`decontaminate` would
    broadcast the full shingle index. The train side explodes each
    shingle to ``k_hashes`` position probes, broadcast-left-joins the
    position set (no shuffle of the corpus), and two doc-keyed
    aggregations roll up to per-document counts. (Here the broadcast
    is the position set itself; a production variant would bit-pack it
    into ``m/8`` bytes — the probe plan is identical.)

    ``portable=True`` swaps xxhash64 for the Mersenne-31 char fold so
    an independent SQL engine recomputes identical positions (the
    DuckDB oracle path); xxhash64 is the production default.

    Returns ``doc_id, n_shingles, n_flagged, flag_frac, contaminated``
    for every training document.
    """
    # Bench side → ONE bit-packed filter row (array<long>, m_bits/64
    # entries — 16 KiB at 2^20 bits): all positions funnel through a
    # single-group applyInPandas, which is bounded by construction
    # (≤ min(k·|bench shingles|, m_bits) distinct positions). This IS
    # the artifact a 100 TB job broadcasts.
    bitset = _bloom_bitset_for_test(
        bench, id_col, text_col, n, m_bits, k_hashes, portable
    )

    # Train side: project the k positions, cross-join the broadcast
    # filter row, and test bits with pure codegen arithmetic — no
    # explode, no probe join, no per-shingle aggregation; the ONLY
    # shuffle left is the final doc-keyed rollup. A null h (shingle-
    # less doc) gives null positions → null flag → counted as 0 below.
    probes = _bloom_shingle_hashes(train, id_col, text_col, n, portable).select(
        "doc_id",
        "h",
        *[
            p.alias(f"p{i}")
            for i, p in enumerate(_bloom_positions(F.col("h"), k_hashes, m_bits))
        ],
    ).crossJoin(F.broadcast(bitset))
    flag = None
    for i in range(k_hashes):
        # element_at is 1-indexed; shift amounts must be expressions,
        # which the SQL form allows (the python wrapper takes only
        # literals)
        bit_i = F.expr(
            f"(shiftrightunsigned(element_at(bits, CAST(p{i} DIV 64 AS INT) + 1), "
            f"CAST(p{i} % 64 AS INT)) & 1) = 1"
        )
        flag = bit_i if flag is None else (flag & bit_i)
    per_doc = (
        probes.withColumn("__flag", flag)
        .groupBy("doc_id")
        .agg(
            F.count("h").alias("n_shingles"),
            F.count(F.when(F.col("__flag"), F.lit(1))).alias("n_flagged"),
        )
        .withColumn(
            "flag_frac",
            F.round(F.col("n_flagged").cast("double")
                    / F.greatest(F.col("n_shingles"), F.lit(1)).cast("double"), 6),
        )
        .withColumn("contaminated", F.col("n_flagged") >= min_hits)
    )
    return per_doc.select(
        "doc_id", "n_shingles", "n_flagged", "flag_frac", "contaminated"
    )


# KMV estimate numerator: the mixed portable hash is uniform-ish on
# [0, 2^62) (two finished 31-bit folds), so E[kth min / 2^62] = k/(D+1).
_KMV_DOMAIN = float(1 << 62)
# Finishing multipliers (xxhash primes): the raw char fold is AFFINE in
# the char codes, so sequential vocabularies ("tok1".."tok999") produce
# arithmetic-progression hash values whose order statistics are wildly
# non-uniform — measured 2.7x overestimate at k=128 on a sequential
# vocabulary. A multiply-mod by a large constant is a bijection on the
# Mersenne ring that scatters those progressions; rel_err drops into
# the 1/sqrt(k) band. Both multipliers < 2^32 keep fold·mult < 2^63
# (ANSI long arithmetic, and plain BIGINT in the oracle engine).
_KMV_MIX1 = 2_654_435_761
_KMV_MIX2 = 2_246_822_519


def _kmv_mix(h: F.Column) -> F.Column:
    # decompose with bit ops, NOT `/` (Spark's / is a double divide,
    # which loses exactness above 2^53 — h ranges up to 2^62)
    h0 = h.bitwiseAND(F.lit((1 << 31) - 1))
    h1 = F.shiftright(h, 31)
    return (
        F.pmod(h0 * _KMV_MIX1, F.lit(_BLOOM_M31))
        + F.pmod(h1 * _KMV_MIX2, F.lit(_BLOOM_M31)) * F.lit(1 << 31)
    )


def kmv_distinct_estimate(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 256,
    portable: bool = True,
) -> DataFrame:
    """Approximate distinct-token count per group via a KMV (k minimum
    values) sketch — the mergeable bounded-state sketch a 100 TB
    pipeline uses where exact ``COUNT(DISTINCT)`` would shuffle the
    full vocabulary: state is the k smallest hash values per group
    (relative error ~ 1/sqrt(k-2), ~6% at k=256).

    Unlike HLL (``approx_count_distinct``), every step here is plain
    integer/double arithmetic over a deterministic hash, so an
    independent SQL engine reproduces the ESTIMATE bit-for-bit — an
    oracle-verifiable approximate sketch. ``exact_distinct`` and
    ``rel_err`` ride along as the accuracy diagnostic (a production
    run at scale would drop them; the sketch itself never touches
    full-vocabulary state).

    Plan shape (VERDICT r4 #4 — no per-group vocabulary sort, no
    Python stage): distinct (group, hash) — one shuffle with map-side
    partial dedup — then a TWO-LEVEL k-smallest merge. Level 1 keys on
    ``(group, spark_partition_id())``: every globally k-smallest hash
    is among its partition's k smallest, so each cell keeps only
    ``slice(sort_array, 1, k)`` plus its row count, and the sort is a
    partition-local cell (vocab/P rows), parallel across P·G evenly
    distributed keys — never one task sorting a whole group's
    vocabulary (the old ``row_number`` window concentrated each
    group's full distinct set on one reducer). Level 2 merges the
    k-lists per group: ``k·P`` longs per group (k=256 at P=10^4
    AQE-coalesced partitions is ~20 MB — bounded; at extreme partition
    counts insert one intermediate merge keyed ``(group, pid % 256)``,
    the same hierarchical-merge move :func:`pack_sequences` documents
    for its block table). Estimator: ``(k-1) · 2^62 / kth_min`` when
    the group has ≥ k distinct hashes, else the exact count (the
    sketch holds the whole set; the level-2 ``F.get`` yields NULL).

    Returns ``group, n_distinct_exact, kth_min, est_distinct,
    rel_err`` ordered by group.
    """
    from ksql_query_tutorial_spark.operators.dedup import portable_token_hash
    from ksql_query_tutorial_spark.operators.text import tokens

    tok = df.select(
        F.col(group_col).alias("group"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    )
    h = (
        _kmv_mix(portable_token_hash(F.col("tok")))
        if portable
        # xxhash64 is already well-mixed; fold into the same 2^62 domain
        else F.pmod(F.xxhash64("tok"), F.lit(1 << 62))
    )
    hashes = tok.select("group", h.alias("h")).distinct()

    # level 1: per-(group, partition) k smallest + cell count. The
    # cells tile the distinct set, so counts sum to the exact total,
    # and the union of cell minima contains the global k-th min.
    lvl1 = (
        hashes.withColumn("__pid", F.spark_partition_id())
        .groupBy("group", "__pid")
        .agg(
            F.slice(F.sort_array(F.collect_list("h")), 1, k).alias("__ks"),
            F.count(F.lit(1)).alias("__cnt"),
        )
    )
    # level 2: merge ≤ k·P candidates per group; F.get is NULL when
    # the group holds fewer than k distinct hashes (exact branch)
    per_group = (
        lvl1.groupBy("group")
        .agg(
            F.sum("__cnt").alias("n_distinct_exact"),
            F.get(F.sort_array(F.flatten(F.collect_list("__ks"))), k - 1).alias(
                "kth_min"
            ),
        )
        .withColumn(
            "est_distinct",
            F.round(
                F.when(
                    F.col("kth_min").isNotNull(),
                    F.lit(float(k - 1)) * F.lit(_KMV_DOMAIN) / F.col("kth_min").cast("double"),
                ).otherwise(F.col("n_distinct_exact").cast("double")),
                6,
            ),
        )
        .withColumn(
            "rel_err",
            F.round(
                (F.col("est_distinct") - F.col("n_distinct_exact").cast("double"))
                / F.greatest(F.col("n_distinct_exact"), F.lit(1)).cast("double"),
                6,
            ),
        )
    )
    return per_group.select(
        "group", "n_distinct_exact", "kth_min", "est_distinct", "rel_err"
    )


def vocab(
    df: DataFrame,
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Corpus vocabulary: one row per distinct token with collection
    frequency (``tf_total``) and document frequency (``df``).

    One shuffle, keyed by term; both aggregates get map-side partial
    aggregation (the per-doc ``array_distinct`` bounds any single
    document's df contribution at 1). Hot stopword terms are absorbed
    by the partial agg before the exchange — this is the word-count
    plan, it survives any corpus size.

    Returns ``term, tf_total, df`` filtered to ``df >= min_df``.
    """
    per_doc = df.select(
        F.explode(tokens(F.col(text_col))).alias("term"),
        F.lit(1).alias("__one"),
    )
    tf = per_doc.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("tf_total"))
    dfreq = (
        df.select(F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    return (
        tf.join(dfreq, "term")
        .filter(F.col("df") >= min_df)
        .select("term", "tf_total", "df")
    )


def tf_idf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document TF-IDF term weights with smoothed IDF
    ``ln((N+1)/(df+1)) + 1`` (scikit-learn's convention).

    Term/document frequencies are exact-integer aggregations; the
    corpus size ``N`` rides in via a broadcast 1-row cross join (NO
    driver-side ``count()`` action — the plan stays lazy end-to-end).
    The doc-frequency table is its own per-doc-distinct explode pass
    (the :func:`vocab` plan: one term-keyed exchange whose partial
    aggregation bounds hot-term skew) joined back broadcast onto the
    postings — deriving it FROM the postings subtree would re-execute
    the (doc, term) exchange a second time (Catalyst does not reuse
    the stage across the two consumers), paying scan + explode + TWO
    exchanges where this pays scan + explode + one. The r7 scan-audit
    A/B re-confirmed the shape: persisting the input measured 0.92×
    at BOTH sf0.1 and sf1 — inside host noise, and a corpus-sized
    cache at 100 TB (STRESS.md r7 scan-audit burn-down).

    Returns ``doc_id, term, tf, df, tfidf`` (tfidf rounded to 6
    decimals), one row per (document, distinct term).
    """
    postings = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = (
        df.select(
            F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    n_docs = df.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    return (
        postings.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf").cast("double")
                * (
                    F.log(
                        (F.col("__n").cast("double") + F.lit(1.0))
                        / (F.col("df").cast("double") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                6,
            ).alias("tfidf"),
        )
    )


def heavy_hitters(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Exact top-``k`` most frequent terms per group (tie-break:
    lexicographically smaller term wins) — per-source vocabulary
    skew is the first diagnostic for a contaminated or templated
    slice of a training mixture.

    Plan: one groupBy on (group, term) — partial aggregation absorbs
    hot terms map-side — then a per-group top-k window. The window
    partitions by the GROUP key only, but its input is one row per
    (group, distinct term), already aggregated: bounded by vocabulary
    size, not corpus size, so the sort-per-group stays small at any
    scale. (For unbounded vocabularies swap the window for a
    count-min + per-partition top-k union; exactness is the point
    here.)

    Returns ``group, term, cnt, rank`` with rank 1..k.
    """
    counts = (
        df.select(
            F.col(group_col).alias("group"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("group", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("group").orderBy(F.col("cnt").desc(), F.col("term").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("group", "term", "cnt", "rank")
    )


def split_assign(
    df: DataFrame,
    train_frac: float = 0.9,
    valid_frac: float = 0.05,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/valid/test split: a document's split is a
    pure function of its id (``sample_hash`` thresholds), so the
    assignment is stable under re-runs, task retries, partial
    re-ingestion, and corpus growth — adding documents never moves an
    existing document between splits, which ``rand()``/``randomSplit``
    cannot guarantee. A narrow shuffle-free projection: at 100 TB this
    is a pure map over the scan, and a downstream
    ``partitionBy("split")`` write needs no extra exchange beyond the
    writer's own.

    Returns the input plus ``u`` (the hash variate, audit column) and
    ``split`` ('train' | 'valid' | 'test').
    """
    u = sample_hash(F.col(id_col))
    t_cut = F.round(F.lit(float(train_frac)) * _HASH_MOD).cast("long")
    v_cut = F.round(F.lit(float(train_frac + valid_frac)) * _HASH_MOD).cast("long")
    return (
        df.withColumn("u", u)
        .withColumn(
            "split",
            F.when(F.col("u") < t_cut, F.lit("train"))
            .when(F.col("u") < v_cut, F.lit("valid"))
            .otherwise(F.lit("test")),
        )
    )


# range-bucket count for shuffle_positions' hierarchical rank; must
# divide _HASH_MOD exactly so bucket = u DIV width is integer-exact.
SHUFFLE_BUCKETS = 1_000


def shuffle_positions(
    df: DataFrame,
    id_col: str = "doc_id",
    n_buckets: int = SHUFFLE_BUCKETS,
) -> DataFrame:
    """Deterministic global shuffle for training-data ordering: every
    row gets its exact 0-based position in the corpus ordered by
    ``(sample_hash(id), id)`` — the reproducible analog of "shuffle the
    dataset once before training".

    A naive ``row_number() OVER (ORDER BY u)`` collapses to ONE
    partition (the whole corpus through a single task). This is the
    hierarchical two-level rank instead (same trick as
    :func:`pack_sequences`):

    1. range-bucket each row by ``u DIV (mod/n_buckets)`` — buckets
       partition the sort domain, so bucket order == global order;
    2. per-bucket counts (one tiny groupBy on a bounded domain) →
       running offsets via a window over ``n_buckets`` rows, broadcast
       back;
    3. position = bucket offset + (row_number within bucket) - 1;
       the per-bucket window sees ~N/n_buckets rows per task.

    ``n_buckets`` must divide ``_HASH_MOD``; size it ~10× parallelism
    at scale (hash keys distribute uniformly, so buckets are balanced
    by construction). Returns ``id, u, shuffle_pos``.
    """
    if _HASH_MOD % n_buckets != 0:
        raise ValueError(f"n_buckets must divide {_HASH_MOD}")
    width = _HASH_MOD // n_buckets
    keyed = df.select(
        F.col(id_col),
        sample_hash(F.col(id_col)).alias("u"),
    ).withColumn("__b", (F.col("u") - F.pmod(F.col("u"), width)) / width)
    keyed = keyed.withColumn("__b", F.col("__b").cast("int"))
    counts = keyed.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    woff = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__n").over(woff), F.lit(0))
    ).select("__b", "__off")
    win = Window.partitionBy("__b").orderBy(F.col("u").asc(), F.col(id_col).asc())
    return (
        keyed.join(F.broadcast(offsets), "__b")
        .withColumn(
            "shuffle_pos", (F.col("__off") + F.row_number().over(win) - 1).cast("long")
        )
        .select(id_col, "u", "shuffle_pos")
    )


# curate() stage thresholds — integer arithmetic only, so every flag is
# bit-reproducible in any SQL engine (no float threshold boundaries).
CURATE_MIN_TOKENS = 10
CURATE_STOPWORD_PCT = 3      # stopwords must be >= 3% of tokens
CURATE_SAMPLE_CUT = 800_000  # keep u < 0.8e6 (80% deterministic sample)


def curate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_hits: int = 2,
) -> DataFrame:
    """The end-to-end curation pipeline a pretraining corpus goes
    through, composed from this repo's per-stage operators into ONE
    DataFrame plan — language filter, heuristic quality filter, exact
    dedup keeper selection, benchmark decontamination, deterministic
    sampling — emitting every stage's verdict per document (flags, not
    a destructive filter, so the pipeline is auditable: each stage's
    yield is one groupBy away).

    Stage flags (all integer/string comparisons — no float thresholds):

    - ``pass_lang``   — marker-word language ID predicts 'en';
    - ``pass_quality``— ≥ ``CURATE_MIN_TOKENS`` tokens and stopwords ≥
      ``CURATE_STOPWORD_PCT``% of tokens (``100·stop ≥ pct·n`` exact);
    - ``is_keeper``   — min-id representative of its exact-content
      group (md5 of whitespace-normalized text);
    - ``not_contaminated`` — < ``min_hits`` distinct shingles shared
      with the benchmark set (:func:`decontaminate`);
    - ``sampled``     — portable hash < ``CURATE_SAMPLE_CUT``;
    - ``kept``        — conjunction of all five.

    Plan shape at 100 TB: the lang/quality/sample flags are narrow
    projections fused into the scan; dedup adds one shuffle on the
    content hash; decontamination adds the broadcast bench index plus
    its doc-keyed rollup; the final assembly joins on ``id`` (both
    sides already id-partitioned; the per-stage branches re-scan the
    pruned input rather than share a persisted copy — measured
    0.93×/0.95× sub-noise at sf0.1/sf1, not worth a corpus-sized
    cache, STRESS.md r7 scan-audit burn-down). No driver actions, no unbounded
    windows.
    """
    from ksql_query_tutorial_spark.operators.text import (
        STOPWORDS,
        _count_in,
        _stage_toks,
        normalized,
        tokens,
        with_lang_id,
    )

    # materialized tokens attribute (r7): the inline form re-split the
    # text once per reference in the quality conjunction (3×/row)
    t = F.col("__qtoks")
    flags = (
        with_lang_id(train, text_col)
        .transform(lambda f: _stage_toks(f, text_col, "__qtoks"))
        .select(
            F.col(id_col),
            F.col("lang_pred"),
            (F.col("lang_pred") == "en").alias("pass_lang"),
            (
                (F.size(t) >= CURATE_MIN_TOKENS)
                & (_count_in(t, STOPWORDS) * 100
                   >= CURATE_STOPWORD_PCT * F.size(t))
            ).alias("pass_quality"),
            (sample_hash(F.col(id_col)) < CURATE_SAMPLE_CUT).alias("sampled"),
            F.md5(normalized(F.col(text_col))).alias("__h"),
        )
    )
    # keeper = min id per content-hash group, via a window min — ONE
    # shuffle on the hash (a groupBy + join-back costs the same shuffle
    # plus a join); group sizes are duplicate-cluster sizes, bounded.
    wk = Window.partitionBy("__h")
    decon = decontaminate(
        train, bench, id_col=id_col, text_col=text_col, min_hits=min_hits
    ).select(F.col("doc_id").alias(id_col), (~F.col("contaminated")).alias("not_contaminated"))
    out = (
        flags.withColumn("is_keeper", F.col(id_col) == F.min(id_col).over(wk))
        .join(decon, id_col)
        .withColumn(
            "kept",
            F.col("pass_lang")
            & F.col("pass_quality")
            & F.col("is_keeper")
            & F.col("not_contaminated")
            & F.col("sampled"),
        )
    )
    return out.select(
        id_col, "lang_pred", "pass_lang", "pass_quality", "is_keeper",
        "not_contaminated", "sampled", "kept",
    )


def lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-self n-gram LM scoring (the CCNet/KenLM-shaped quality
    signal, with the corpus itself as the LM): every document is scored
    by how common its bigrams are in the whole corpus — documents full
    of corpus-rare constructions (OCR noise, lorem-ipsum, hostile spam)
    sit in the low tail, boilerplate in the high tail. The real-world
    twin swaps the corpus bigram table for a pretrained LM's counts;
    the PLAN — posting, count, posting-vs-count join, doc rollup — is
    identical.

    Plan shape (word-count discipline, every stage map-side-combined):
    bigram posting (doc-keyed lead window, one shuffle) → global bigram
    counts (one shuffle, partial aggs absorb hot bigrams) → 1:1
    equi-join of posting to counts on the bigram hash → doc-keyed
    rollup. The count table is vocabulary²-bounded, not corpus-bounded;
    the scalar total rides a 1-row broadcast.

    Returns per document: ``n_bigrams, sum_count, min_count`` (exact
    integers) and ``avg_log_count, lm_logprob`` (rounded doubles;
    Scan shape (r7 measured-kept): the bigram posting is rebuilt per
    consumer instead of persisted — the persist variant measured
    1.13× at sf0.1 and 2.26× at sf1 (STRESS.md r7 scan-audit
    burn-down): the posting is corpus-sized, so caching it costs more
    than the pruned re-scan it saves, increasingly so with scale.

    ``lm_logprob = avg(ln(C(b)/T))``). Docs with < 2 tokens keep NULL
    floats and zero counts.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    pos_toks = (
        df.repartition(par, F.col(id_col))
        .select(
            F.col(id_col).alias("id"),
            F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
        )
    )
    w = Window.partitionBy("id").orderBy("pos")
    posting = (
        pos_toks.select("id", "tok", F.lead("tok", 1).over(w).alias("t1"))
        .filter(F.col("t1").isNotNull())
        .select("id", F.xxhash64(F.concat_ws(" ", "tok", "t1")).alias("h"))
    )
    # persist the count table (vocabulary²-bounded — the SMALL side):
    # it feeds both the posting join and the scalar total, and without
    # the persist the whole posting pipeline re-executes to rebuild it.
    # The posting itself is NOT persisted by design: at corpus scale it
    # is ~16 bytes/token (bigger than the text); recomputing the narrow
    # tokenize+lead pipeline is the right trade.
    counts = cache.pin(
        posting.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.groupBy().agg(F.sum("cnt").alias("t"))
    per_doc = (
        posting.join(counts, "h")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.sum("cnt").cast("long").alias("sum_count"),
            F.min("cnt").cast("long").alias("min_count"),
            F.avg(F.log("cnt")).alias("__avg_log"),
        )
    )
    out = (
        df.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .crossJoin(F.broadcast(total))
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("sum_count", F.lit(0)).alias("sum_count"),
            "min_count",
            F.round("__avg_log", 6).alias("avg_log_count"),
            F.round(F.col("__avg_log") - F.log(F.col("t").cast("double")), 6)
            .alias("lm_logprob"),
        )
    )
    return out


def chunk_spans(
    df: DataFrame,
    budget: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Context-window chunking: cut every document's token stream into
    consecutive ``budget``-token chunks — the per-document inverse of
    :func:`pack_sequences` (RAG / SFT / embedding pipelines chunk
    WITHIN a document instead of packing across documents). The last
    chunk of a document may be short; a document always emits at least
    one chunk (the tokenizer never returns an empty array — an empty
    text is one empty token, matching every other op in this module).

    Plan shape at 100 TB: a narrow projection plus one generator
    (``explode`` over a ``sequence`` of chunk ids) — NO shuffle
    anywhere, no window, no Python. Chunk rows stay co-partitioned
    with their source document, so a downstream ``groupBy(doc_id)`` or
    partitioned write is the first exchange in the whole job. All
    expressions (split / slice / array_join) run inside whole-stage
    codegen.

    Returns one row per chunk: ``doc_id, chunk_id, begin_tok,
    n_chunk_tokens, chunk_text``.
    """
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("__toks"),
        F.size(toks).alias("__n"),
    )
    n_chunks = F.ceil(F.col("__n") / F.lit(float(budget))).cast("int")
    exploded = base.select(
        "doc_id",
        "__toks",
        "__n",
        F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_id"),
    )
    begin = F.col("chunk_id") * budget
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        begin.cast("int").alias("begin_tok"),
        F.least(F.lit(budget), F.col("__n") - begin).cast("int")
        .alias("n_chunk_tokens"),
        F.array_join(F.slice(F.col("__toks"), begin + F.lit(1), F.lit(budget)), " ")
        .alias("chunk_text"),
    )


# per-domain sub-bucket count for domain_cap's hierarchical rank; must
# divide _HASH_MOD exactly so bucket = u DIV width is integer-exact.
DOMAIN_CAP_BUCKETS = 100


def domain_cap(
    df: DataFrame,
    cap: int = 100,
    id_col: str = "doc_id",
    domain_col: str = "source",
    n_buckets: int = DOMAIN_CAP_BUCKETS,
    rank_all: bool = True,
    broadcast_offsets: bool = True,
) -> DataFrame:
    """C4/RefinedWeb-style per-domain frequency capping: keep at most
    ``cap`` documents per ``domain_col``, chosen by a DETERMINISTIC
    priority (``sample_hash(id)``, ties broken by id) so the keeper
    set is a pure function of the input — stable under re-runs and
    task retries, unlike ``rand()``-ordered capping.

    Skew design — a plain ``row_number() OVER (PARTITION BY domain)``
    funnels each domain through ONE task; at 100 TB a mega-domain
    (one host contributing billions of pages) serializes the stage.
    This is the hierarchical two-level rank of
    :func:`shuffle_positions` applied per group:

    1. sub-bucket each row by its hash variate: ``bucket = u DIV
       (mod/n_buckets)`` — hash order makes bucket order == priority
       order within the domain;
    2. per-(domain, bucket) counts (one groupBy; ≤ |domains|·n_buckets
       non-empty rows) → exclusive running offsets via a window over
       the tiny counts table;
    3. rank = offset + row_number within (domain, bucket) — each
       window task sees ~|domain|/n_buckets rows.

    ``broadcast_offsets`` hints the offsets join; disable it when the
    domain universe is huge (millions of URL hosts) and let the
    (domain, bucket)-keyed shuffle join distribute it. ``rank_all=
    False`` is the cheap destructive-scale path: buckets whose offset
    already ≥ ``cap`` can contain no survivors, so their rows skip the
    window entirely (``dom_rank`` NULL, ``kept`` false) — only the
    ~cap head rows per domain pay for exact ranks.

    Emits EVERY input row (flag, not destructive): ``doc_id,
    <domain>, u, dom_rank, kept`` with 1-based ``dom_rank``.
    """
    if _HASH_MOD % n_buckets != 0:
        raise ValueError(f"n_buckets must divide {_HASH_MOD}")
    width = _HASH_MOD // n_buckets
    keyed = (
        df.select(
            F.col(id_col),
            F.col(domain_col),
            sample_hash(F.col(id_col)).alias("u"),
        )
        .withColumn("__b", ((F.col("u") - F.pmod(F.col("u"), F.lit(width))) / width)
                    .cast("int"))
    )
    counts = keyed.groupBy(domain_col, "__b").agg(F.count(F.lit(1)).alias("__n"))
    woff = (
        Window.partitionBy(domain_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__n").over(woff), F.lit(0))
    ).select(domain_col, "__b", "__off")
    if broadcast_offsets:
        offsets = F.broadcast(offsets)

    win = Window.partitionBy(domain_col, "__b").orderBy(
        F.col("u").asc(), F.col(id_col).asc()
    )
    joined = keyed.join(offsets, [domain_col, "__b"])
    if rank_all:
        ranked = joined.withColumn(
            "dom_rank", (F.col("__off") + F.row_number().over(win)).cast("long")
        )
    else:
        head = joined.filter(F.col("__off") < cap).withColumn(
            "dom_rank", (F.col("__off") + F.row_number().over(win)).cast("long")
        )
        tail = joined.filter(F.col("__off") >= cap).withColumn(
            "dom_rank", F.lit(None).cast("long")
        )
        ranked = head.unionByName(tail)
    return ranked.select(
        id_col,
        domain_col,
        "u",
        "dom_rank",
        F.coalesce(F.col("dom_rank") <= cap, F.lit(False)).alias("kept"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "fp",
) -> DataFrame:
    """Corpus snapshot diff: classify every document across two corpus
    versions as ``added`` / ``removed`` / ``changed`` / ``unchanged``
    by content fingerprint — the incremental-refresh primitive (what a
    crawl-over-crawl update or a dataset version audit starts from).

    Both inputs must expose ``(id_col, fp_col)``; compute the
    fingerprint upstream (e.g. ``md5`` of normalized text) so this
    stays a pure id-keyed FULL OUTER join — one co-partitioned shuffle
    on the id, no content movement, no skew (ids are unique per side).

    Returns ``id_col, status, old_fp, new_fp``.
    """
    o = old.select(F.col(id_col).alias("__id"), F.col(fp_col).alias("old_fp"))
    n = new.select(F.col(id_col).alias("__id"), F.col(fp_col).alias("new_fp"))
    joined = o.join(n, "__id", "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.col("__id").alias(id_col), status.alias("status"), "old_fp", "new_fp"
    )


def cooccurrence_pmi(
    df: DataFrame,
    text_col: str = "text",
    window: int = 3,
    min_count: int = 3,
) -> DataFrame:
    """Word co-occurrence counts with pointwise mutual information —
    the count pipeline under word2vec/GloVe-style embeddings and
    collocation mining: ordered token pairs ``(w1 at i, w2 at j)``
    with ``i < j <= i + window``, PMI against the corpus unigram
    distribution.

    Scale design: pair generation is a NARROW nested-``transform`` +
    ``slice`` over each token array (JVM HOFs — never a positions
    self-join, which re-shuffles the corpus and explodes the join
    input); the only full-data exchanges are the (w1, w2) pair count
    and the unigram count, both with map-side partials. The
    ``min_count`` prune runs before the PMI joins so the joined
    relation is the (much smaller) frequent-pair table, and the two
    scalar totals ride in as a broadcast literal row.

    PMI = log2( (c12/T_pairs) / ((c1/T_uni)·(c2/T_uni)) ), rounded 6.

    Returns ``w1, w2, n_pair, pmi``.
    """
    from ksql_query_tutorial_spark.operators.text import tokens

    toks = df.select(tokens(F.col(text_col)).alias("toks"))
    pairs = toks.select(
        F.explode(
            F.flatten(
                F.transform(
                    "toks",
                    lambda x, i: F.transform(
                        # i is 0-based; slice() is 1-based, so the
                        # forward window starts at element i+2
                        F.slice("toks", i + 2, window),
                        lambda y: F.struct(x.alias("w1"), y.alias("w2")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    pair_counts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    totals = pair_counts.agg(F.sum("n_pair").alias("tp")).crossJoin(
        uni.agg(F.sum("cu").alias("tu"))
    )
    frequent = pair_counts.filter(F.col("n_pair") >= min_count)
    return (
        frequent.join(uni.withColumnRenamed("w", "w1").withColumnRenamed("cu", "c1"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("cu", "c2"), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1", "w2", "n_pair",
            F.round(
                F.log2(
                    (F.col("n_pair") / F.col("tp"))
                    / ((F.col("c1") / F.col("tu")) * (F.col("c2") / F.col("tu")))
                ),
                6,
            ).alias("pmi"),
        )
    )


def cms_token_counts(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 8192,
    portable: bool = True,
) -> DataFrame:
    """Count-Min sketch token frequencies — the mergeable bounded-state
    FREQUENCY sketch (Cormode & Muthukrishnan), completing the sketch
    triad next to KMV (cardinality, :func:`kmv_distinct_estimate`) and
    Bloom (membership, :func:`bloom_decontaminate`): ``depth × width``
    counters answer "how often does token t appear?" with one-sided
    error (estimate ≥ truth, overshoot ≤ εN w.h.p., ε = e/width)
    regardless of corpus size.

    Like the KMV op — and unlike ``count_min_sketch()``'s opaque binary
    — every step is deterministic integer arithmetic over the portable
    hash (positions reuse the Bloom row scheme), so an independent SQL
    engine reproduces the ESTIMATES bit-for-bit: an oracle-verifiable
    approximate sketch. ``exact_count`` rides along as the accuracy
    diagnostic; ``overshoot = est - exact`` is provably ≥ 0 (the CMS
    one-sided-error invariant, pinned by a unit test).

    Plan shape: token counts first (ONE full-data exchange, map-side
    partials collapse each task to its local vocabulary), then the
    ``depth × width``-bounded grid rollup and a grid join — both over
    vocabulary-sized inputs, never the raw token stream. At 100 TB the
    grid IS the artifact a pipeline ships (16k longs here); the
    per-token estimate join is the diagnostic read path.

    Returns ``tok, exact_count, est_count, overshoot`` per distinct
    token.
    """
    from ksql_query_tutorial_spark.operators.dedup import portable_token_hash
    from ksql_query_tutorial_spark.operators.text import tokens

    # persist: the vocabulary table is referenced by BOTH the grid
    # build and the estimate join; without it the full token explode
    # re-executes per reference (measured 3 scans -> 1 at sf3). The
    # cached state is vocabulary-sized — a few KB.
    tok_counts = cache.pin(
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    h = (
        portable_token_hash(F.col("tok"))
        if portable
        else F.pmod(F.xxhash64("tok"), F.lit(1 << 62))
    )
    posed = tok_counts.withColumn(
        "__pos",
        F.array(*_bloom_positions(h, depth, width)),
    ).select(
        "tok",
        "exact_count",
        F.posexplode("__pos").alias("row", "pos"),
    )
    grid = posed.groupBy("row", "pos").agg(
        F.sum("exact_count").alias("cell")
    )
    est = (
        posed.join(F.broadcast(grid), ["row", "pos"])
        .groupBy("tok")
        .agg(
            F.max("exact_count").alias("exact_count"),
            F.min("cell").alias("est_count"),
        )
    )
    return est.select(
        "tok",
        "exact_count",
        "est_count",
        (F.col("est_count") - F.col("exact_count")).alias("overshoot"),
    )


def novelty_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document shingle NOVELTY: the fraction of a doc's distinct
    n-shingles whose corpus-wide first occurrence (min doc id) is this
    doc — the diversity/contribution signal dedup-ordered pipelines
    use to rank docs for keeping (a doc that only repeats earlier
    content scores 0; fresh content scores 1).

    Word-count-shaped: the distinct posting (id, h), a min-id aggregate
    keyed on the shingle hash, a join back on that hash (reusing the
    aggregate's partitioning — no extra exchange), and a doc-keyed
    rollup. No all-pairs anything; every exchange carries posting-sized
    rows with map-side partials.

    Returns ``doc_id, n_shingles, n_novel, novelty`` for EVERY doc
    (shingle-less docs score 0 over 0 shingles).
    """
    from ksql_query_tutorial_spark.operators.dedup import shingle_hash_posting

    post = cache.pin(shingle_hash_posting(df, id_col, text_col, n))
    firsts = post.groupBy("h").agg(F.min("id").alias("first_id"))
    per = (
        post.join(firsts, "h")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("first_id") == F.col("id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.round(
                F.coalesce("n_novel", F.lit(0)).cast("double")
                / F.greatest(F.coalesce("n_shingles", F.lit(0)), F.lit(1)),
                6,
            ).alias("novelty"),
        )
    )


def mix_temperature(
    df: DataFrame,
    alpha: float = 0.3,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled mixture weights: each source's sampling
    probability is its token share raised to ``alpha`` and renormalized
    (the mT5/XLM-R multilingual mixing rule — alpha < 1 upsamples small
    sources, alpha = 1 is proportional, alpha = 0 uniform). The
    EXPLICIT-weights planner is :func:`mix_budget`; this derives the
    weights from the corpus itself.

    One bounded per-source aggregate + a broadcast totals row; the
    ``boost`` column (p_temp / p_raw) is the per-source up/down-sampling
    factor a sampler applies.

    Returns ``source, n_docs, n_tokens, p_raw, p_temp, boost``
    ordered by source.
    """
    from ksql_query_tutorial_spark.operators.text import tokens

    per_source = (
        df.select(
            F.col(source_col).alias("source"),
            F.size(tokens(F.col(text_col))).cast("long").alias("__t"),
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("__t").alias("n_tokens"))
    )
    totals = per_source.groupBy().agg(
        F.sum("n_tokens").alias("__tot"),
    )
    scaled = (
        per_source.crossJoin(F.broadcast(totals))
        .withColumn(
            "p_raw",
            F.col("n_tokens").cast("double")
            / F.greatest(F.col("__tot"), F.lit(1)).cast("double"),
        )
        .withColumn("__w", F.pow(F.col("p_raw"), F.lit(float(alpha))))
    )
    wsum = scaled.groupBy().agg(F.sum("__w").alias("__ws"))
    return (
        scaled.crossJoin(F.broadcast(wsum))
        .withColumn("p_temp", F.col("__w") / F.col("__ws"))
        .withColumn(
            "boost",
            F.round(F.col("p_temp") / F.col("p_raw"), 6),
        )
        .select(
            "source", "n_docs", "n_tokens",
            F.round("p_raw", 6).alias("p_raw"),
            F.round("p_temp", 6).alias("p_temp"),
            "boost",
        )
    )


def clean_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = 3,
) -> DataFrame:
    """C4-style text REPAIR — the transform companion to
    :func:`curate`'s verdict flags: strip control characters, split
    into lines, drop lines with fewer than ``min_line_words`` words
    (the C4 heuristic that removes nav/boilerplate fragments), rejoin,
    and collapse runs of whitespace.

    Pure narrow map — regexp/array expressions per row, zero shuffles,
    rides the scan at any corpus size. Every regex stays inside the
    Java↔RE2 common subset (explicit char classes, no \\p escapes), so
    the oracle reproduces the exact byte output.

    Returns ``doc_id, clean_text, n_lines_kept, n_lines_dropped,
    n_chars_before, n_chars_after``.
    """
    no_ctrl = F.regexp_replace(
        F.col(text_col), "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", ""
    )
    lines = F.split(no_ctrl, "\n")
    words_of = lambda ln: F.size(  # noqa: E731
        F.filter(F.split(F.trim(ln), "[ \\t]+"), lambda w: w != "")
    )
    kept = F.filter(lines, lambda ln: words_of(ln) >= min_line_words)
    joined = F.array_join(kept, "\n")
    collapsed = F.trim(F.regexp_replace(joined, "[ \\t]+", " "))
    return df.select(
        F.col(id_col).alias("doc_id"),
        collapsed.alias("clean_text"),
        F.size(kept).cast("int").alias("n_lines_kept"),
        (F.size(lines) - F.size(kept)).cast("int").alias("n_lines_dropped"),
        F.length(text_col).cast("int").alias("n_chars_before"),
        F.length(collapsed).cast("int").alias("n_chars_after"),
    )


def sample_weighted(
    df: DataFrame,
    k: int = 200,
    id_col: str = "doc_id",
    weight_col: str | F.Column | None = None,
) -> DataFrame:
    """Deterministic WEIGHTED sampling without replacement
    (Efraimidis–Spirakis A-Res): each row draws ``u = sample_hash(id)
    / 1e6`` and keeps key ``u^(1/w)``; the global top-k keys are the
    sample, with inclusion probability proportional to weight — the
    importance-sampling primitive (sample long/high-quality docs more
    often) next to :func:`sample_stratified`'s fixed per-stratum
    rates.

    Same determinism contract as the stratified sampler: the variate
    comes from the portable id hash, not ``rand()``, so the sample is
    retry-stable, subset-stable under corpus growth at fixed k is NOT
    guaranteed (top-k is competitive by construction) — and the
    oracle recomputes the identical keys. ``u = 0`` maps to key 0
    (never sampled unless fewer than k positive keys exist); ``w ≤ 0``
    is rejected upstream by the weight expression contract.

    Plan: narrow map + distributed TakeOrdered top-k — no global
    sort, no shuffle beyond the ≤ k survivors.

    Returns ``doc_id, weight, u, key (rounded 12)`` for the k
    sampled rows.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    if w is None:
        w = F.lit(1.0)
    u = sample_hash(F.col(id_col)).cast("double") / F.lit(1e6)
    key = F.pow(u, F.lit(1.0) / w.cast("double"))
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.round(w.cast("double"), 6).alias("weight"),
            F.round(u, 6).alias("u"),
            F.round(key, 12).alias("key"),
        )
        .orderBy(F.col("key").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def _bpe_pair_argmax(state: DataFrame) -> DataFrame:
    """One BPE round's pair-count + argmax over the vocabulary state
    (``freq, syms``): explode adjacent symbol pairs, partial-agg the
    counts, and take the single most frequent pair (ties broken
    lexicographically so the learned sequence is deterministic).
    The ``orderBy.limit(1)`` compiles to ``TakeOrderedAndProject`` —
    no global sort ever materializes (plan-pinned in
    tests/test_plans.py)."""
    return (
        state.select(
            "freq",
            F.explode(
                F.expr(
                    "zip_with(slice(syms, 1, size(syms) - 1), "
                    "slice(syms, 2, size(syms) - 1), "
                    "(a, b) -> struct(a AS l, b AS r))"
                )
            ).alias("pr"),
        )
        .groupBy("pr.l", "pr.r")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
        .limit(1)
    )


def _bpe_words(
    df: DataFrame, text_col: str, max_word_chars: int
) -> DataFrame:
    """Word-frequency rollup + initial symbolization shared by the BPE
    trainer and encoder — the ONLY corpus-sized pass either makes."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .select(
            F.substring("word", 1, max_word_chars).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "syms",
            F.concat(F.split("word", ""), F.array(F.lit("</w>"))),
        )
    )


def _java_pattern_quote(s: str) -> str:
    """java.util.regex.Pattern.quote: literal-quote a symbol for use
    inside a Java regex (handles embedded ``\\E`` the same way)."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _java_replacement_quote(s: str) -> str:
    """java.util.regex.Matcher.quoteReplacement: escape ``\\`` and
    ``$`` so the merged symbol is a literal replacement."""
    return s.replace("\\", "\\\\").replace("$", "\\$")


def _bpe_apply_rule(a: str, b: str):
    """Greedy left-to-right non-overlapping rewrite of one merge rule
    over the ``syms`` array (see bpe_merges docstring for the 'aaaa'
    semantics).

    Implemented as ONE codegen ``regexp_replace`` over the
    space-joined symbols: Java's replaceAll resumes AFTER each match,
    which IS the greedy non-overlapping fold ("a a a" under (a, a) →
    "aa a"), and the ``(^| )…(?= |$)`` boundaries pin whole symbols
    (symbols never contain whitespace — the tokenizer splits on
    ``\\s+``). Both rule symbols are Pattern.quote-d and the merged
    replacement Matcher.quoteReplacement-d, so regex metacharacters
    in real tokens are inert. The previous array-fold formulation
    (``F.aggregate`` copying its accumulator per element) was an
    interpreted CodegenFallback lambda costing O(L²) per word —
    A/B-measured 2.2× slower per round at sf0.1; equivalence on
    metacharacter-heavy and overlapping-run inputs is pinned by
    tests/test_corpus.py against the fold kept there as the
    reference implementation.

    Total on the empty array too (ADVICE r6): ``split('' , ' ')``
    yields ``[""]``, not ``[]``, so the empty case is short-circuited
    to keep parity with the array-fold reference — unreachable from
    ``_bpe_words`` (every word gets ≥2 symbols) but the helper should
    not lie if reused.
    """
    pat = (
        "(^| )" + _java_pattern_quote(a) + " " + _java_pattern_quote(b)
        + "(?= |$)"
    )
    repl = "$1" + _java_replacement_quote(a + b)
    return F.when(
        F.size("syms") == 0, F.col("syms")
    ).otherwise(
        F.split(
            F.regexp_replace(F.concat_ws(" ", F.col("syms")), pat, repl), " "
        )
    )


def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 12,
    max_word_chars: int = 256,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules from the corpus
    (Sennrich et al. 2016: iterated most-frequent-adjacent-pair over
    the word-frequency table, words terminated with '</w>').

    Scale design — the trainer never touches corpus-sized data after
    round 0: the ONLY full-data pass is the word-frequency rollup
    (word-count plan, map-side partials); every merge round then runs
    over the VOCABULARY (|distinct words| rows, each holding its
    symbol array). Per round: one pair-explode + groupBy whose output
    is |distinct adjacent pairs| (alphabet²-bounded), an
    ``orderBy.limit(1)`` for the argmax (AQE collapses it to a
    TakeOrdered — no global sort materializes), a ONE-ROW driver
    collect (the same bounded-scalar pattern as the JDBC watermark),
    and a narrow JVM array fold applying the rule. State chains
    through lazy localCheckpoints (the pagerank pattern), so lineage,
    per-round PLANNING, and recompute all stay O(1) per round.

    The rewrite fold is greedy left-to-right non-overlapping (merge
    when the accumulator's last symbol is ``l`` and the current is
    ``r``) — for runs like 'aaaa' with rule (a,a) this yields
    [aa, aa], matching the reference implementation. Ties on pair
    count break lexicographically on (l, r), so the learned sequence
    is deterministic and engine-independent.

    Words are truncated to ``max_word_chars`` before symbolization
    (the standard BPE-trainer guard — cf. SentencePiece's
    max_sentencepiece_length / sentence-length caps): the greedy
    rewrite fold copies its accumulator per element, so cost is
    O(L²) per word type — bounded and trivial at L ≤ 256, a hang on
    an adversarial 200k-char single-token document. The oracle SQL
    applies the identical truncation, so the learned sequence stays
    hash-verified.

    Returns ``rank, left_sym, right_sym, pair_count`` — one row per
    learned merge, in learning order (may be fewer than ``n_merges``
    when the corpus runs dry).
    """
    schema = (
        "rank long, left_sym string, right_sym string, pair_count long"
    )
    spark = df.sparkSession
    words = _bpe_words(df, text_col, max_word_chars).select("freq", "syms")
    # r9 optimization: rounds chain through LAZY localCheckpoint()s
    # instead of persist(). A persist() keeps the previous round's full
    # logical plan nested inside the new one, so by round k Catalyst
    # re-analyzes a k-deep regexp chain per argmax — driver planning
    # cost growing with the round number (guide §3.3/§7.3 plan-size
    # trap); the checkpoint truncates each round's plan to a constant
    # scan + one rewrite + the argmax. Blocks are vocabulary-bounded
    # and freed by the ContextCleaner on GC (the lifecycle-sweep
    # family contract).
    #
    # r10 (VERDICT r9 #3, guide §1.2 step 3): the ONLY corpus-sized
    # pass — the word-frequency rollup — materializes EAGERLY here,
    # under the session's AQE (coalescing/skew handling for the one
    # shuffle whose volume scales with the corpus). The merge rounds
    # then run with AQE OFF: each round's shuffle is an
    # alphabet²-bounded pair aggregate where AQE has nothing to decide,
    # but its per-exchange query-stage materialization turned every
    # round into 2+ scheduler round-trips. Measured at sf0.1:
    # 28 → 15 jobs for the 12-merge trainer, interleaved best-of-5
    # 3.76s → 3.47s, identical learned sequence. The toggle is scoped
    # to the loop and restored in a finally.
    state = words.localCheckpoint()
    rules: list[tuple] = []
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for k in range(n_merges):
            top = _bpe_pair_argmax(state).collect()
            if not top:
                break
            a, b, cnt = top[0].l, top[0].r, top[0].cnt
            rules.append((k + 1, a, b, int(cnt)))
            merged = _bpe_apply_rule(a, b)
            state = state.withColumn("syms", merged).localCheckpoint(
                eager=False
            )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    return spark.createDataFrame(rules, schema)


def bpe_encode(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    max_word_chars: int = 256,
) -> DataFrame:
    """Tokenize the corpus VOCABULARY with BPE merges learned from the
    same corpus — the encoder half of the tokenizer story
    (:func:`bpe_merges` is the trainer). Rules are applied
    sequentially in rank order with the identical greedy fold the
    trainer uses, so on the training vocabulary this reproduces the
    trainer's final symbolization exactly. BPE merge sequences are
    prefix-stable, so an ``n_merges`` smaller than the trainer's
    yields the trainer's first ``n_merges`` rules.

    Scale design matches the trainer: one corpus-sized word-frequency
    rollup, then every round runs over |distinct words| rows chained
    through lazy localCheckpoints (r9 — constant per-round plan, see
    :func:`bpe_merges`). The returned frame reads the final round's
    materialized checkpoint blocks; they are vocabulary-bounded and
    freed by the ContextCleaner on GC, the lifecycle-sweep contract.

    Durability caveat (ADVICE r9): localCheckpoint blocks are
    non-replicated and their lineage is truncated, so on a real cluster
    the RETURNED frame fails permanently if an executor holding its
    blocks dies before the caller consumes it (local mode: driver ==
    executor, no exposure). Callers that must survive executor loss
    should persist the result with replication or write it out; the
    lazy-checkpoint chain for loop-internal rounds is unaffected.

    Returns ``word, freq, n_syms, encoded`` (symbols space-joined,
    including the '</w>' terminator), ordered by word.
    """
    words = _bpe_words(df, text_col, max_word_chars)
    # r9: lazy localCheckpoint chain instead of per-round persist — see
    # bpe_merges (same measured plan-nesting fix; the returned frame
    # reads the final round's materialized checkpoint blocks).
    # r10: eager corpus rollup under AQE + AQE off for the
    # vocabulary-bounded rounds — see bpe_merges (same measured
    # job-count halving).
    spark = df.sparkSession
    state = words.localCheckpoint()
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for _ in range(n_merges):
            top = _bpe_pair_argmax(state.select("freq", "syms")).collect()
            if not top:
                break
            a, b = top[0].l, top[0].r
            state = state.withColumn(
                "syms", _bpe_apply_rule(a, b)
            ).localCheckpoint(eager=False)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    return state.select(
        "word",
        F.col("freq").cast("long").alias("freq"),
        F.size("syms").cast("int").alias("n_syms"),
        F.array_join("syms", " ").alias("encoded"),
    ).orderBy("word")


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_postings: int = 10,
    min_df: int = 2,
) -> DataFrame:
    """Materialized inverted index: per term, document frequency,
    collection frequency, and the first ``k_postings`` doc ids (sorted,
    comma-joined — engine-portable scalar output) — the retrieval-side
    artifact a search/RAG pipeline persists next to the embedding
    index.

    Scale design: term stats ride the word-count plan (one term-keyed
    exchange, map-side partials). The posting sample uses the same
    TWO-LEVEL k-smallest merge as the KMV sketch — level 1 keys on
    ``(term, spark_partition_id())`` so no single task ever holds a
    stopword's full posting list; level 2 merges the bounded
    per-partition lists at ``k_postings`` ids per term. A naive
    ``collect_list`` + slice would buffer the whole posting list of
    every hot term in one aggregation task.
    """
    posting = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(F.array_distinct(tokens(F.col(text_col)))).alias(
                "term"
            ),
        )
        .select(
            "term",
            "__id",
            F.spark_partition_id().alias("__pid"),
        )
    )
    lvl1 = (
        posting.groupBy("term", "__pid")
        .agg(
            F.slice(
                F.sort_array(F.collect_list("__id")), 1, k_postings
            ).alias("__ids"),
            F.count(F.lit(1)).cast("long").alias("__df"),
        )
    )
    merged = (
        lvl1.groupBy("term")
        .agg(
            F.array_join(
                F.slice(
                    F.sort_array(F.flatten(F.collect_list("__ids"))),
                    1,
                    k_postings,
                ),
                ",",
            ).alias("postings"),
            F.sum("__df").cast("long").alias("df"),
        )
    )
    cf = (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cf"))
    )
    return (
        merged.join(cf, "term")
        .filter(F.col("df") >= min_df)
        .select("term", "df", "cf", "postings")
        .orderBy("term")
    )


def distribution_drift(
    df: DataFrame,
    category_col: str = "lang",
    split_a: str = "train",
    split_b: str = "valid",
) -> DataFrame:
    """Per-category drift between the category distributions of two
    deterministic corpus splits — Laplace-smoothed KL contribution and
    total-variation term per category, the dataset-card check that a
    hash split did not skew languages/sources between train and valid.

    Scale design: one category-keyed exchange (conditional-sum rollup
    over the split assignment, map-side partials — no per-split scans,
    no join between the split tables); totals and the category count
    come from an UNPARTITIONED window over the |categories| rollup —
    its single-task input is bounded by the category domain, and it
    keeps the plan to ONE scan (a separate totals aggregate would
    re-scan: Catalyst does not reuse the rollup subtree across two
    aggregate consumers). Everything downstream of the rollup is
    |categories|-sized.

    Returns ``<category_col>, n_a, n_b, p, q, kl_term, tv_term``
    ordered by category. Sum the ``kl_term`` / ``tv_term`` columns for
    the scalar divergences.
    """
    cat = F.col(category_col)
    counts = (
        split_assign(df)
        .filter(F.col("split").isin(split_a, split_b))
        .groupBy(category_col)
        .agg(
            F.sum(F.when(F.col("split") == split_a, 1).otherwise(0))
            .cast("long").alias("n_a"),
            F.sum(F.when(F.col("split") == split_b, 1).otherwise(0))
            .cast("long").alias("n_b"),
        )
    )
    w = Window.partitionBy()
    with_totals = (
        counts.withColumn("__ta", F.sum("n_a").over(w))
        .withColumn("__tb", F.sum("n_b").over(w))
        .withColumn("__k", F.count(F.lit(1)).over(w))
    )
    p = (F.col("n_a") + F.lit(1.0)) / (F.col("__ta") + F.col("__k"))
    q = (F.col("n_b") + F.lit(1.0)) / (F.col("__tb") + F.col("__k"))
    return (
        with_totals
        .select(
            cat,
            "n_a",
            "n_b",
            F.round(p, 6).alias("p"),
            F.round(q, 6).alias("q"),
            F.round(p * F.log(p / q), 6).alias("kl_term"),
            F.round(F.lit(0.5) * F.abs(p - q), 6).alias("tv_term"),
        )
        .orderBy(category_col)
    )


ZIPF_TOP_K = 500


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = ZIPF_TOP_K,
) -> DataFrame:
    """Zipf-law fit over the token frequency distribution: OLS of
    ``ln(frequency)`` on ``ln(rank)`` for the top-k terms — slope near
    −1 is natural language; a flat or broken slope flags synthetic or
    boilerplate-heavy corpora in a curation dashboard.

    Scale design: term counts are the word-count plan (map-side
    partials absorb stopword mass before the one exchange); the top-k
    cut is a ``TakeOrderedAndProject`` (distributed partial top-k,
    never a global sort), and the rank window + regression run over
    that ≤ top_k-row table. The fit reuses
    :func:`analytics.ols_regression`'s closed form.
    """
    from ksql_query_tutorial_spark.operators.analytics import ols_regression

    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    top = counts.orderBy(F.col("n").desc(), "term").limit(top_k)
    rank_w = Window.orderBy(F.col("n").desc(), "term")
    pts = top.select(
        F.lit("corpus").alias("scope"),
        F.log(F.row_number().over(rank_w).cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    return ols_regression(pts, x_col="x", y_col="y", group_col="scope")


def boolean_search(
    df: DataFrame,
    terms: tuple[str, ...] = ("spark", "join", "window"),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Conjunctive (AND-of-terms) document retrieval: the query-time
    twin of :func:`inverted_index` — documents containing EVERY query
    term at least once, with their metadata.

    Scale design: the posting stream is filtered to the |terms| query
    terms BEFORE any shuffle (the isin prunes at the exploded map
    side), so the doc-keyed "did all terms hit" rollup exchanges at
    most |terms| rows per matching document — posting-list
    intersection as a count aggregate, never a per-term join chain.
    The metadata join back is a semi join on the doc id.
    """
    from ksql_query_tutorial_spark.operators.text import tokens

    qterms = [t.lower() for t in terms]
    posting = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("term"),
    ).filter(F.col("term").isin(qterms))
    hits = (
        posting.groupBy(id_col)
        .agg(F.countDistinct("term").alias("__n"))
        .filter(F.col("__n") == len(set(qterms)))
        .select(id_col)
    )
    return (
        df.join(hits, id_col, "left_semi")
        .select(id_col, "lang", "source", "n_chars")
        .orderBy(id_col)
    )


YIELD_THRESHOLDS = (-0.1, -0.05, 0.0, 0.05, 0.1)


def quality_yield_curve(
    scored: DataFrame,
    thresholds: tuple = YIELD_THRESHOLDS,
    score_col: str = "quality_score",
    weight_col: str = "n_distinct_tokens",
) -> DataFrame:
    """Filter-calibration yield curve: for each candidate quality
    threshold, how many documents and how much token mass survive —
    the readout that picks the cutoff meeting a token budget (the
    decision the curation pipeline makes BEFORE running the filter).

    Scale design: the scored table fans out by the |thresholds|
    constant (a broadcast cross join — bounded multiplier, collapsed
    by map-side partials in the same stage), and one rollup per
    threshold finishes. Shares divide exact integer sums once per
    cell. Output is |thresholds| rows.

    Returns ``threshold, n_docs_kept, doc_share, tokens_kept,
    token_share`` (shares rounded 6) ordered by threshold.
    """
    spark = scored.sparkSession
    grid = spark.createDataFrame(
        [(float(t),) for t in thresholds], "threshold double"
    )
    keep = F.col(score_col) >= F.col("threshold")
    kept_doc = F.when(keep, 1).otherwise(0)
    kept_w = F.when(keep, F.col(weight_col)).otherwise(F.lit(0))
    return (
        scored.crossJoin(F.broadcast(grid))
        .groupBy("threshold")
        .agg(
            F.sum(kept_doc).cast("long").alias("n_docs_kept"),
            F.round(
                F.sum(kept_doc).cast("double") / F.count(F.lit(1)).cast(
                    "double"
                ),
                6,
            ).alias("doc_share"),
            F.sum(kept_w).cast("long").alias("tokens_kept"),
            F.round(
                F.sum(kept_w).cast("double")
                / F.sum(F.col(weight_col)).cast("double"),
                6,
            ).alias("token_share"),
        )
        .orderBy("threshold")
    )


HEAPS_BINS = 10


def heaps_fit(
    df: DataFrame,
    n_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bins: int = HEAPS_BINS,
) -> DataFrame:
    """Heaps'-law fit: OLS of ``ln(vocabulary)`` on ``ln(tokens
    processed)`` over cumulative corpus prefixes — the companion to
    :func:`zipf_fit` (β well under 1 is natural language; β near 1
    flags a corpus whose vocabulary never saturates, e.g. serial
    numbers or noise).

    Scale design: prefixes are ``n_bins`` doc-id slices (``n_docs``
    comes from parquet footer statistics — no count job). New-vocab
    mass per slice is one term-keyed rollup (``min(doc_id)`` per term
    — the first-occurrence move novelty uses); token mass per slice
    is a narrow per-doc map. Both cumulate with windows over the
    ≤``n_bins`` cell table and the fit reuses
    :func:`analytics.ols_regression`'s closed form. The corpus is
    touched twice, shuffles carry vocabulary / n_bins cells only.
    """
    from ksql_query_tutorial_spark.operators.analytics import ols_regression
    from ksql_query_tutorial_spark.operators.text import tokens

    n = max(int(n_docs), 1)

    def slice_of(col):
        return F.least(
            F.floor(col * n_bins / F.lit(float(n))).cast("int"),
            F.lit(n_bins - 1),
        )

    new_vocab = (
        df.select(
            F.col(id_col),
            F.explode(F.array_distinct(tokens(F.col(text_col)))).alias(
                "term"
            ),
        )
        .groupBy("term")
        .agg(F.min(id_col).alias("__first"))
        .groupBy(slice_of(F.col("__first")).alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("__new_vocab"))
    )
    token_mass = (
        df.select(
            slice_of(F.col(id_col)).alias("bin"),
            F.size(tokens(F.col(text_col))).cast("long").alias("__nt"),
        )
        .groupBy("bin")
        .agg(F.sum("__nt").alias("__tokens"))
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cells = (
        token_mass.join(new_vocab, "bin", "left_outer")
        .select(
            "bin",
            F.sum("__tokens").over(w).alias("__tok_cum"),
            F.sum(F.coalesce(F.col("__new_vocab"), F.lit(0)))
            .over(w)
            .alias("__voc_cum"),
        )
        .filter((F.col("__tok_cum") > 0) & (F.col("__voc_cum") > 0))
    )
    pts = cells.select(
        F.lit("corpus").alias("scope"),
        F.log(F.col("__tok_cum").cast("double")).alias("x"),
        F.log(F.col("__voc_cum").cast("double")).alias("y"),
    )
    return ols_regression(pts, x_col="x", y_col="y", group_col="scope")


FEATURE_HASH_BUCKETS = 256  # power of two: bucket = h & (D-1)


def feature_hash_signature(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = FEATURE_HASH_BUCKETS,
    portable: bool = True,
) -> DataFrame:
    """Hashing-trick featurization (Weinberger et al.'s feature
    hashing / scikit-learn's HashingVectorizer): every token is hashed
    into one of ``n_buckets`` signed slots — bucket = low bits of the
    hash, sign = the next bit — and per-document slot values are the
    signed term-count sums. The standard way to get fixed-width
    bag-of-words features without materializing (or shipping to every
    executor) a vocabulary, which is what makes it the featurizer that
    still works at 100 TB: no global vocab build, no dictionary
    broadcast, no OOV handling.

    Output is the per-document SIGNATURE of the hashed vector —
    ``nnz`` (occupied slots after sign cancellation), ``l1``,
    ``sum_sq``, and the slot-weighted ``checksum`` Σ bucket·value —
    all exact integers, which pins every hash, sign, and count without
    emitting |docs| × n_buckets rows. Callers wanting the raw vector
    stop one aggregate earlier.

    Scale design: tokenize → per-(doc, term) count (dedups BEFORE
    hashing so the interpreted portable char-fold runs once per
    distinct pair, not per occurrence) → per-(doc, bucket) signed sum
    → per-doc rollup. Every exchange is doc-keyed with map-side
    partials; no windows, no joins, no driver actions. ``n_buckets``
    must be a power of two so the bucket/sign split is bit arithmetic
    (``h & (D−1)``, ``(h >> log2 D) & 1``) — portable to any BIGINT
    SQL engine, which is how the DuckDB oracle recomputes it.

    Returns ``doc_id, nnz, l1, sum_sq, checksum`` ordered by doc id.
    """
    from ksql_query_tutorial_spark.operators.dedup import (
        portable_token_hash,
    )

    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    shift = n_buckets.bit_length() - 1
    tc = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    h = (
        portable_token_hash(F.col("tok"))
        if portable
        else F.xxhash64("tok").bitwiseAND(F.lit((1 << 62) - 1))
    )
    slots = (
        tc.select(
            "doc_id",
            h.bitwiseAND(F.lit(n_buckets - 1)).alias("bucket"),
            F.when(
                F.shiftright(h, shift).bitwiseAND(F.lit(1)) == 0,
                F.col("cnt"),
            )
            .otherwise(-F.col("cnt"))
            .alias("sval"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sval").alias("val"))
    )
    v = F.col("val")
    return (
        slots.groupBy("doc_id")
        .agg(
            F.sum((v != 0).cast("long")).cast("long").alias("nnz"),
            F.sum(F.abs(v)).cast("long").alias("l1"),
            F.sum(v * v).cast("long").alias("sum_sq"),
            F.sum(F.col("bucket") * v).cast("long").alias("checksum"),
        )
        .orderBy("doc_id")
    )


def sample_importance(
    df: DataFrame,
    target_shares: dict[str, float] | None = None,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Importance-weighting plan for domain rebalancing: per-source
    weights ``w_s = target_share / corpus_share`` (token shares) that
    re-tilt the corpus toward a declared target mixture WITHOUT
    dropping data — the reweight-at-loss alternative to
    :func:`mix_budget`'s sample-and-discard plan. ``target_shares``
    defaults to uniform across observed sources. The effective sample
    size ``ESS = (Σw)²/Σw²`` (Kish) quantifies the variance cost: an
    aggressive re-tilt can leave a 1B-doc corpus with the statistical
    power of far fewer — the go/no-go number for reweighting vs
    recollecting.

    Scale design: ONE partial-aggregated rollup to a |sources|-row
    frame; weights, per-source expected mass, and the Kish ratio are
    closed-form arithmetic on that frame (ESS needs only Σ n_s·w_s and
    Σ n_s·w_s² because the weight is constant within a source — no
    second pass over the corpus).

    Returns one row per source: ``source, n_docs, n_tokens,
    corpus_share, target_share, weight, expected_mass, ess_ratio``
    (shares/weights rounded 6; ``ess_ratio`` — the corpus-wide
    ESS / n_docs, identical on every row by construction — lets a
    single-row consumer read the headline without a second query).
    """
    # eager localCheckpoint: the |sources|-row rollup is consumed by
    # THREE downstream frames (totals, the Kish moments, and the final
    # projection) — without materialization each re-executes the full
    # corpus tokenization scan (the expr-dup gate caught 4 scans; the
    # assign_skew/modularity convention applies: tiny frame, one job).
    per_source = (
        df.select(
            F.col(source_col).alias("source"),
            F.size(tokens(F.col(text_col))).cast("long").alias("__t"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__t").cast("long").alias("n_tokens"),
        )
        .localCheckpoint()
    )
    if target_shares is None:
        tgt = None
    else:
        tgt = F.lit(0.0)
        for s, w in sorted(target_shares.items()):
            tgt = F.when(F.col("source") == s, F.lit(float(w))).otherwise(tgt)
    totals = per_source.groupBy().agg(
        F.sum("n_tokens").alias("__tok_total"),
        F.count(F.lit(1)).alias("__n_sources"),
        F.sum("n_docs").alias("__doc_total"),
    )
    base = per_source.crossJoin(F.broadcast(totals)).withColumn(
        "corpus_share",
        F.col("n_tokens").cast("double") / F.col("__tok_total").cast("double"),
    ).withColumn(
        "target_share",
        tgt if tgt is not None
        else F.lit(1.0) / F.col("__n_sources").cast("double"),
    ).withColumn(
        "weight", F.col("target_share") / F.col("corpus_share")
    )
    # Kish ESS over docs: weights constant within source, so the doc
    # sums collapse to source-level closed form.
    nd = F.col("n_docs").cast("double")
    kish = base.groupBy().agg(
        F.sum(nd * F.col("weight")).alias("__sw"),
        F.sum(nd * F.col("weight") * F.col("weight")).alias("__sw2"),
        F.sum("n_docs").alias("__nd"),
    )
    return (
        base.crossJoin(F.broadcast(kish))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round("corpus_share", 6).alias("corpus_share"),
            F.round("target_share", 6).alias("target_share"),
            F.round("weight", 6).alias("weight"),
            F.round(nd * F.col("weight"), 6).alias("expected_mass"),
            F.round(
                (F.col("__sw") * F.col("__sw"))
                / F.col("__sw2") / F.col("__nd").cast("double"),
                6,
            ).alias("ess_ratio"),
        )
        .orderBy("source")
    )


def kn_bigram(
    df: DataFrame,
    discount: float = 0.75,
    min_count: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities over the corpus —
    the smoothing real n-gram LMs (KenLM) ship, where
    :func:`lm_score`'s raw relative frequencies break: KN discounts
    every observed bigram by a fixed ``discount`` and redistributes the
    held-out mass over CONTINUATION counts (in how many distinct left
    contexts does w2 appear), so "francisco" — frequent but only ever
    after "san" — stops looking like a good unigram fallback.

        p_kn(w2|w1) = max(c12 − D, 0)/c1 + D·N1+(w1,·)/c1 · p_cont(w2)
        p_cont(w2)  = N1+(·,w2) / |distinct bigrams|

    Every input to the formula is an exact integer count, so the
    derived doubles are engine-reproducible with no float-sum order
    concerns.

    Scale design: ONE tokenize+lead pass builds the bigram posting
    (never persisted — at corpus scale it outweighs the text; the
    lm_score trade); the vocabulary²-bounded count table IS pinned
    (cache registry) because four rollups consume it: left-context
    totals + fan-out, continuation counts, the distinct-bigram scalar,
    and the final projection. Everything downstream of the posting
    rollup is vocabulary-bounded, not corpus-bounded. ``min_count``
    trims the report to bigrams with support (stats still use full
    counts).

    Returns ``w1, w2, c12, p_kn`` (rounded 6) for bigrams with
    ``c12 >= min_count``.
    """
    # r10 (guide §2.4, VERDICT r9 #6): adjacent-pair generation used to
    # posexplode the token array and re-pair it with a lead window —
    # which cost a full id-keyed repartition PLUS a per-doc sort, only
    # to reconstruct adjacency the array already encodes. Zipping the
    # array against its own 1-shifted slice (the BPE trainer's pattern,
    # and literally the oracle's list_transform) emits the identical
    # bigram multiset with ZERO exchanges before the count rollup:
    # a size<2 array slices to [] and explodes to nothing, exactly the
    # lead filter's behavior. Measured at sf0.1: 15 → 14 jobs (the
    # repartition exchange and the per-doc window sort disappear from
    # the corpus-sized segment), interleaved best-of-4 2.70s → 2.32s
    # with the new side winning every paired rep; identical output.
    pairs = df.select(tokens(F.col(text_col)).alias("__t")).select(
        F.explode(
            F.expr(
                "zip_with(slice(__t, 1, size(__t) - 1), "
                "slice(__t, 2, size(__t) - 1), "
                "(a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("__p")
    ).select("__p.w1", "__p.w2")
    big = cache.pin(
        pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    )
    left = big.groupBy("w1").agg(
        F.sum("c12").alias("c1"),
        F.count(F.lit(1)).alias("n1p_fw"),
    )
    cont = big.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_bw"))
    n_types = big.groupBy().agg(F.count(F.lit(1)).alias("n_types"))
    d = F.lit(float(discount))
    p_kn = (
        F.greatest(F.col("c12").cast("double") - d, F.lit(0.0))
        / F.col("c1").cast("double")
        + d * F.col("n1p_fw").cast("double") / F.col("c1").cast("double")
        * (F.col("n1p_bw").cast("double") / F.col("n_types").cast("double"))
    )
    return (
        big.filter(F.col("c12") >= min_count)
        .join(left, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(n_types))
        .select("w1", "w2", "c12", F.round(p_kn, 6).alias("p_kn"))
        .orderBy("w1", "w2")
    )


DSIR_BUCKETS = 1024  # power of two: hashed n-gram feature space


def dsir_importance(
    docs: DataFrame,
    target_lang: str = "en",
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al.
    2023): score every document by how much more likely its hashed
    bag-of-words is under a TARGET distribution (here: the corpus's
    ``target_lang`` slice, standing in for "looks like the domain we
    want") than under the RAW corpus distribution. The per-document
    log importance weight is ``Σ_f c_{d,f}·(ln p_tgt(f) − ln p_raw(f))``
    over hashed unigram features with add-one smoothing across the
    ``n_buckets`` feature space — the standard content-based
    pretraining-data selector, complementary to
    :func:`sample_importance` (which rebalances SOURCES, blind to
    content).

    The length-normalized ``logw_per_tok`` is the selection signal
    (raw logw scales with document length); ``selected`` is the
    zero-threshold readout.

    Scale design: tokenize → per-(doc, term) counts → the interpreted
    portable char-fold runs once per DISTINCT TOKEN (a Heaps-law-
    bounded vocabulary frame), joined back onto the counts — AQE
    broadcasts the vocabulary side while it fits, degrading to a
    token-keyed shuffle join beyond that; measured at sf0.1 this beats
    folding per distinct (doc, token) pair 2.38s vs 2.75s best-of-3,
    and the gap widens with corpus size because |doc,token| grows
    linearly while |vocab| saturates. (Pinning the tokenized counts to
    avoid the vocabulary pass's second tokenize measured WORSE, 3.78s
    vs 2.92s — materializing the |doc,token|-row frame costs more than
    the narrow re-scan.) The hashed per-(doc, bucket) frame is pinned
    for its three consumers; the two corpus-level distributions are
    ≤ ``n_buckets``-row aggregates joined back as ONE broadcast of a
    1024-row log-ratio table → per-doc rollup. The only data-sized
    exchanges are doc/token-keyed; target/raw tables are constant-size
    at any corpus scale. Smoothed probabilities use exact BIGINT
    counts folded into ln at the last step (the counts-into-ln
    convention), doubles rounded 6.

    Returns ``doc_id, n_toks, logw, logw_per_tok, selected`` ordered
    by doc id.
    """
    from ksql_query_tutorial_spark.operators.dedup import (
        portable_token_hash,
    )

    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    tc = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            (F.col(lang_col) == target_lang).alias("__tgt"),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "__tgt", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    # fold once per distinct token (vocabulary-bounded), not per
    # (doc, token) pair — see the measured A/B in the docstring.
    # r10 note: dropping this pre-aggregation and joining the RAW
    # token stream to the broadcast vocabulary (straight to a
    # (doc, bucket) rollup — one corpus exchange fewer on paper) was
    # implemented and interleave-measured: it LOST every paired rep
    # (best-of-4 2.72s → 3.93s at sf0.1) — probing the vocabulary hash
    # table and feeding the partial aggregate with the full 6M-token
    # stream costs more than the (doc, tok) pre-collapse saves. Kept.
    vocab = tc.select("tok").distinct().select(
        "tok",
        portable_token_hash(F.col("tok"))
        .bitwiseAND(F.lit(n_buckets - 1))
        .alias("bucket"),
    )
    # pin the hashed per-(doc, bucket) frame: it has THREE consumers
    # (per-doc rollup, bucket distributions, totals) and rebuilding it
    # re-runs tokenize + vocabulary hash + join each time (the
    # expr-dup gate caught exactly that on first write)
    db = cache.pin(
        tc.join(vocab, "tok")
        .groupBy("doc_id", "__tgt", "bucket")
        .agg(F.sum("cnt").alias("c"))
    )
    dist = db.groupBy("bucket").agg(
        F.sum(F.when(F.col("__tgt"), F.col("c")).otherwise(F.lit(0)))
        .cast("long").alias("c_tgt"),
        F.sum("c").cast("long").alias("c_raw"),
    )
    totals = dist.agg(
        F.sum("c_tgt").cast("long").alias("t_tgt"),
        F.sum("c_raw").cast("long").alias("t_raw"),
    )
    ratio = (
        dist.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.col("c_tgt") + 1).cast("double"))
                - F.log((F.col("t_tgt") + n_buckets).cast("double"))
                - F.log((F.col("c_raw") + 1).cast("double"))
                + F.log((F.col("t_raw") + n_buckets).cast("double"))
            ).alias("lr"),
        )
    )
    per_doc = (
        db.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_toks"),
            F.sum(F.col("c").cast("double") * F.col("lr")).alias("__lw"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_toks",
        F.round(F.col("__lw"), 6).alias("logw"),
        F.round(F.col("__lw") / F.col("n_toks").cast("double"), 6)
        .alias("logw_per_tok"),
        (F.round(F.col("__lw"), 6) > 0).alias("selected"),
    ).orderBy("doc_id")
