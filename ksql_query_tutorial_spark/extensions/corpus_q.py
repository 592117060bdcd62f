"""Corpus-curation extension queries (chunk, tf-idf, split/shuffle, BPE, decontamination, sketches, Heaps/Zipf, packing, mixing).

Split from the former extensions.py monolith (pure move; VERDICT r6 #3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ksql_query_tutorial_spark.operators import (
    corpus,
    text,
)
from ksql_query_tutorial_spark.tables import load

from ._registry import EXTENSION_ORACLES, EXTENSION_QUERIES
from ._shared import *  # noqa: F401,F403 — shared constants/SQL fragments


# ------------------------------------------------------------------ corpus
# pipeline-planning ops over the documents table: packing /
# decontamination / boilerplate / repetition / sampling / mixing

PACK_BUDGET = 512


DECON_MIN_HITS = 2


BOILERPLATE_MIN_DOCS = 5


SAMPLE_RATES = {"en": 0.5, "zh": 0.25}


MIX_WEIGHTS = {"src0": 2.0, "src1": 0.5}


MIX_TOTAL_TOKENS = 100_000


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concatenate-and-chunk packing of the corpus into
    512-token context windows (hierarchical prefix sum — no
    single-partition global window; see corpus.pack_sequences)."""
    d = load(spark, sf_dir, "documents")
    return corpus.pack_sequences(d, budget=PACK_BUDGET)


def decontaminate_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 50th document plays the eval
    set; training docs are scored by distinct-shingle overlap with it."""
    d = load(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0)
    train = d.filter(F.col("doc_id") % 50 != 0)
    return corpus.decontaminate(train, bench, min_hits=DECON_MIN_HITS)


def corpus_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return corpus.boilerplate_stats(d, min_docs=BOILERPLATE_MIN_DOCS)


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsampling (en 0.5, zh 0.25,
    rest 1.0) — the hash is portable BIGINT arithmetic, so the oracle
    reproduces the exact sample, not just its size."""
    d = load(spark, sf_dir, "documents")
    out = corpus.sample_stratified(d, SAMPLE_RATES)
    return out.select("doc_id", "lang", "source", "u")


def mix_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture planning: token accounting per source + the sampling
    fraction realizing a 100k-token budget at weights src0=2.0,
    src1=0.5, rest 1.0."""
    d = load(spark, sf_dir, "documents")
    return corpus.mix_budget(d, MIX_WEIGHTS, MIX_TOTAL_TOKENS)


EXTENSION_QUERIES["pack_sequences"] = pack_sequences


EXTENSION_QUERIES["decontaminate_bench"] = decontaminate_bench


EXTENSION_QUERIES["corpus_boilerplate"] = corpus_boilerplate


EXTENSION_QUERIES["sample_stratified"] = sample_stratified


EXTENSION_QUERIES["mix_budget"] = mix_budget


# ------------------------------------------------------------------ corpus
# oracles for the pipeline-planning ops; all reuse the _TOKS/_SHINGLES
# fragments so tokenization is character-identical with the Spark side

EXTENSION_ORACLES["pack_sequences"] = f"""
    WITH t AS (SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, n_tokens,
                 -- DuckDB SUM(BIGINT) OVER returns HUGEINT, which pandas
                 -- maps to float64 and the driver's strict CSV hash then
                 -- reads "0.0" vs Spark's "0"; pin every derived integer
                 -- back to BIGINT (VERDICT r5 #1).
                 CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS BIGINT) AS begin_offset
          FROM t)
    SELECT doc_id, n_tokens, begin_offset,
           CAST(begin_offset // {PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST((begin_offset + GREATEST(n_tokens, 1) - 1) // {PACK_BUDGET}
               AS BIGINT) AS pack_end,
           ((begin_offset + GREATEST(n_tokens, 1) - 1) // {PACK_BUDGET})
               > (begin_offset // {PACK_BUDGET}) AS straddles
    FROM c ORDER BY doc_id
"""


EXTENSION_ORACLES["decontaminate_bench"] = f"""
    WITH tr AS (SELECT doc_id, {_TOKS} AS toks FROM documents
                WHERE doc_id % 50 <> 0),
    sh AS (SELECT doc_id, {_SHINGLES} AS s FROM tr),
    post AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    bt AS (SELECT {_TOKS} AS toks FROM documents WHERE doc_id % 50 = 0),
    bidx AS (SELECT DISTINCT unnest(s) AS shingle
             FROM (SELECT {_SHINGLES} AS s FROM bt)),
    hits AS (SELECT p.doc_id, count(*) AS n_hit
             FROM post p JOIN bidx b ON p.shingle = b.shingle GROUP BY 1)
    SELECT sh.doc_id, CAST(len(sh.s) AS BIGINT) AS n_shingles,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_contaminated,
           ROUND(CAST(COALESCE(h.n_hit, 0) AS DOUBLE)
                 / GREATEST(len(sh.s), 1), 6) AS contamination_frac,
           COALESCE(h.n_hit, 0) >= {DECON_MIN_HITS} AS contaminated
    FROM sh LEFT JOIN hits h USING (doc_id) ORDER BY doc_id
"""


EXTENSION_ORACLES["corpus_boilerplate"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS s FROM t),
    post AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    freq AS (SELECT shingle FROM post GROUP BY 1
             HAVING count(*) >= {BOILERPLATE_MIN_DOCS}),
    hits AS (SELECT p.doc_id, count(*) AS n_bp
             FROM post p JOIN freq f ON p.shingle = f.shingle GROUP BY 1)
    SELECT sh.doc_id, CAST(len(sh.s) AS BIGINT) AS n_shingles,
           CAST(COALESCE(h.n_bp, 0) AS BIGINT) AS n_boilerplate,
           ROUND(CAST(COALESCE(h.n_bp, 0) AS DOUBLE)
                 / GREATEST(len(sh.s), 1), 6) AS boilerplate_frac
    FROM sh LEFT JOIN hits h USING (doc_id) ORDER BY doc_id
"""


EXTENSION_ORACLES["sample_stratified"] = """
    SELECT doc_id, lang, source,
           (doc_id % 1048573) * 2654435761 % 1000000 AS u
    FROM documents
    WHERE (doc_id % 1048573) * 2654435761 % 1000000
          < CASE lang WHEN 'en' THEN 500000
                      WHEN 'zh' THEN 250000
                      ELSE 1000000 END
    ORDER BY doc_id
"""


EXTENSION_ORACLES["mix_budget"] = f"""
    WITH s AS (SELECT source, count(*) AS n_docs,
                      SUM(CAST(len({_TOKS}) AS BIGINT)) AS n_tokens,
                      ROUND(CASE source WHEN 'src0' THEN 2.0
                                        WHEN 'src1' THEN 0.5
                                        ELSE 1.0 END, 6) AS weight
               FROM documents GROUP BY 1)
    SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens, weight,
           CAST(FLOOR({MIX_TOTAL_TOKENS}.0 * weight
                      / (SELECT SUM(weight) FROM s)) AS BIGINT) AS alloc_tokens,
           ROUND(LEAST(1.0,
                 CAST(FLOOR({MIX_TOTAL_TOKENS}.0 * weight
                            / (SELECT SUM(weight) FROM s)) AS DOUBLE)
                 / GREATEST(n_tokens, 1)), 6) AS sample_frac
    FROM s ORDER BY source
"""


def corpus_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return corpus.vocab(d)


def corpus_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc, term) TF-IDF weights, smoothed IDF (sklearn
    convention), N via broadcast cross join — no driver action."""
    d = load(spark, sf_dir, "documents")
    return corpus.tf_idf(d)


EXTENSION_QUERIES["corpus_vocab"] = corpus_vocab


EXTENSION_QUERIES["corpus_tfidf"] = corpus_tfidf


EXTENSION_ORACLES["corpus_vocab"] = f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    tf AS (SELECT term, CAST(count(*) AS BIGINT) AS tf_total FROM tok GROUP BY term),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
            FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term)
    SELECT term, tf_total, df FROM tf JOIN dfq USING (term) ORDER BY term
"""


EXTENSION_ORACLES["corpus_tfidf"] = f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    post AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             FROM tok GROUP BY doc_id, term),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term),
    n AS (SELECT count(*) AS nn FROM documents)
    SELECT doc_id, term, tf, df,
           ROUND(tf * (LN((nn + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
    FROM post JOIN dfq USING (term) CROSS JOIN n
    ORDER BY doc_id, term
"""


# ----------------------------------------------------------- heavy hitters

def corpus_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 terms per source (deterministic tie-break on term)."""
    d = load(spark, sf_dir, "documents")
    return corpus.heavy_hitters(d, k=5)


EXTENSION_QUERIES["corpus_heavy_hitters"] = corpus_heavy_hitters


EXTENSION_ORACLES["corpus_heavy_hitters"] = f"""
    WITH tok AS (SELECT source AS "group", unnest({_TOKS}) AS term FROM documents),
    cnt AS (SELECT "group", term, CAST(count(*) AS BIGINT) AS cnt
            FROM tok GROUP BY 1, 2),
    ranked AS (SELECT "group", term, cnt,
                      CAST(row_number() OVER (PARTITION BY "group"
                          ORDER BY cnt DESC, term ASC) AS INT) AS rank
               FROM cnt)
    SELECT "group", term, cnt, rank FROM ranked WHERE rank <= 5
    ORDER BY "group", rank
"""


# ------------------------------------------- bloom decontamination (scale)

def _portable_hash_sql(col: str) -> str:
    """DuckDB twin of dedup.portable_token_hash over an arbitrary
    string expression: two Mersenne-31 char folds, h0 + h1·2^31."""
    def fold(mult: int, init: int) -> str:
        return (
            f"list_reduce(list_prepend(CAST({init} AS BIGINT), "
            f"list_transform(string_split({col}, ''), "
            "c -> CAST(ascii(c) AS BIGINT))), "
            f"(a, b) -> (a * {mult} + b) % 2147483647)"
        )

    return f"({fold(131, 7)} + 2147483648 * {fold(137, 11)})"


BLOOM_M_BITS = 1 << 20


def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter benchmark decontamination (the constant-size-
    broadcast scale path of decontaminate_bench: the eval set compresses
    to <= m_bits of filter state no matter how large it grows). Same
    fixture split; the oracle recomputes the identical filter positions,
    so Bloom false positives — part of the operator's contract — are
    verified, not worked around."""
    d = load(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0)
    train = d.filter(F.col("doc_id") % 50 != 0)
    return corpus.bloom_decontaminate(
        train, bench, m_bits=BLOOM_M_BITS, k_hashes=BLOOM_K,
        min_hits=DECON_MIN_HITS, portable=True,
    )


EXTENSION_QUERIES["decontaminate_bloom"] = decontaminate_bloom


_PSH = _portable_hash_sql("sh")


EXTENSION_ORACLES["decontaminate_bloom"] = f"""
    WITH tr AS (SELECT doc_id, {_TOKS} AS toks FROM documents
                WHERE doc_id % 50 <> 0),
    be AS (SELECT {_TOKS} AS toks FROM documents WHERE doc_id % 50 = 0),
    trh AS (SELECT doc_id, {_PSH} AS h FROM
            (SELECT doc_id, unnest(s) AS sh
             FROM (SELECT doc_id, {_SHINGLES} AS s FROM tr))),
    beh AS (SELECT DISTINCT {_PSH} AS h FROM
            (SELECT unnest(s) AS sh
             FROM (SELECT {_SHINGLES} AS s FROM be))),
    iq AS (SELECT unnest(range({BLOOM_K})) AS i),
    setpos AS (SELECT DISTINCT
                   ((h % 2147483647) * (2*i+1) + (i*i+1))
                       % 2147483647 % {BLOOM_M_BITS} AS pos
               FROM beh, iq),
    probe AS (SELECT doc_id, h,
                  ((h % 2147483647) * (2*i+1) + (i*i+1))
                      % 2147483647 % {BLOOM_M_BITS} AS pos
              FROM (SELECT DISTINCT doc_id, h FROM trh), iq),
    persh AS (SELECT doc_id, h, count(sp.pos) = {BLOOM_K} AS flag
              FROM probe LEFT JOIN setpos sp USING (pos)
              GROUP BY doc_id, h),
    agg AS (SELECT doc_id, count(*) AS n_sh,
                   sum(CASE WHEN flag THEN 1 ELSE 0 END) AS n_fl
            FROM persh GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(COALESCE(a.n_sh, 0) AS BIGINT) AS n_shingles,
           CAST(COALESCE(a.n_fl, 0) AS BIGINT) AS n_flagged,
           ROUND(CAST(COALESCE(a.n_fl, 0) AS DOUBLE)
                 / GREATEST(COALESCE(a.n_sh, 0), 1), 6) AS flag_frac,
           COALESCE(a.n_fl, 0) >= {DECON_MIN_HITS} AS contaminated
    FROM tr t LEFT JOIN agg a USING (doc_id) ORDER BY t.doc_id
"""


# --------------------------------------------------- KMV distinct sketch

KMV_K = 256


def corpus_kmv_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-token estimate via a KMV sketch — the
    oracle-verifiable approximate-distinct op (HLL estimates can't be
    reproduced across engines; the k-minimum-values estimator over the
    portable hash can)."""
    d = load(spark, sf_dir, "documents")
    return corpus.kmv_distinct_estimate(d, k=KMV_K, portable=True)


EXTENSION_QUERIES["corpus_kmv_vocab"] = corpus_kmv_vocab


_PTOK = _portable_hash_sql("tok")


# the KMV finishing mix (corpus._kmv_mix): scatter the affine char-fold
# progressions with multiply-mod bijections on the Mersenne ring
_KMV_MIXED = (
    f"((h0 % 2147483648) * {corpus._KMV_MIX1}) % 2147483647"
    f" + (((h0 // 2147483648) * {corpus._KMV_MIX2}) % 2147483647) * 2147483648"
)


EXTENSION_ORACLES["corpus_kmv_vocab"] = f"""
    WITH tok AS (SELECT source AS "group", unnest(list_distinct({_TOKS})) AS tok
                 FROM documents),
    h0s AS (SELECT "group", {_PTOK} AS h0 FROM tok),
    hs AS (SELECT DISTINCT "group", {_KMV_MIXED} AS h FROM h0s),
    r AS (SELECT "group", h,
                 row_number() OVER (PARTITION BY "group" ORDER BY h) AS rn
          FROM hs),
    g AS (SELECT "group", count(*) AS n_exact,
                 max(CASE WHEN rn = {KMV_K} THEN h END) AS kth
          FROM r GROUP BY 1),
    est AS (SELECT "group", n_exact, kth,
                   ROUND(CASE WHEN kth IS NOT NULL
                         THEN {KMV_K - 1}.0 * 4611686018427387904.0 / kth
                         ELSE CAST(n_exact AS DOUBLE) END, 6) AS est_distinct
            FROM g)
    SELECT "group", CAST(n_exact AS BIGINT) AS n_distinct_exact,
           kth AS kth_min, est_distinct,
           ROUND((est_distinct - n_exact) / GREATEST(n_exact, 1), 6) AS rel_err
    FROM est ORDER BY "group"
"""


# ------------------------------------------------- split / shuffle / scoring

SPLIT_TRAIN_FRAC = 0.9


SPLIT_VALID_FRAC = 0.05


def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment: split is a pure
    function of doc_id (portable-hash thresholds), stable under
    re-runs, retries, and corpus growth."""
    d = load(spark, sf_dir, "documents")
    out = corpus.split_assign(
        d, train_frac=SPLIT_TRAIN_FRAC, valid_frac=SPLIT_VALID_FRAC
    )
    return out.select("doc_id", "lang", "u", "split")


EXTENSION_QUERIES["corpus_split"] = corpus_split


EXTENSION_ORACLES["corpus_split"] = """
    WITH u AS (SELECT doc_id, lang,
                      (doc_id % 1048573) * 2654435761 % 1000000 AS u
               FROM documents)
    SELECT doc_id, lang, u,
           CASE WHEN u < 900000 THEN 'train'
                WHEN u < 950000 THEN 'valid'
                ELSE 'test' END AS split
    FROM u ORDER BY doc_id
"""


def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle rank: each document's exact 0-based
    position in hash order, computed with a hierarchical two-level rank
    (bucket offsets + per-bucket windows) — no single-partition global
    window anywhere in the plan."""
    d = load(spark, sf_dir, "documents")
    return corpus.shuffle_positions(d)


EXTENSION_QUERIES["corpus_shuffle"] = corpus_shuffle


EXTENSION_ORACLES["corpus_shuffle"] = """
    WITH u AS (SELECT doc_id,
                      (doc_id % 1048573) * 2654435761 % 1000000 AS u
               FROM documents)
    SELECT doc_id, u,
           row_number() OVER (ORDER BY u, doc_id) - 1 AS shuffle_pos
    FROM u ORDER BY doc_id
"""


def corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship curation pipeline: lang ID + quality heuristics + exact
    dedup keepers + benchmark decontamination + deterministic sampling
    composed into one auditable plan (per-stage verdict flags). Bench
    split: every 50th doc (the decontaminate_bench convention)."""
    d = load(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0)
    train = d.filter(F.col("doc_id") % 50 != 0)
    return corpus.curate(train, bench, min_hits=DECON_MIN_HITS)


EXTENSION_QUERIES["corpus_curate"] = corpus_curate


EXTENSION_ORACLES["corpus_curate"] = f"""
    WITH tr AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents
                WHERE doc_id % 50 <> 0),
    lang AS (SELECT doc_id,
        CAST(len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein'))) AS INT) AS score_de,
        CAST(len(list_filter(toks, t -> t IN ('the','a','and','is','of','to','in'))) AS INT) AS score_en,
        CAST(len(list_filter(toks, t -> t IN ('el','la','los','y','es','de','un'))) AS INT) AS score_es,
        CAST(len(list_filter(toks, t -> t IN ('le','la','les','et','est','un','une'))) AS INT) AS score_fr
      FROM tr),
    pred AS (SELECT doc_id,
        CASE
          WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr AND score_de > 0 THEN 'de'
          WHEN score_en >= score_es AND score_en >= score_fr AND score_en > 0 THEN 'en'
          WHEN score_es >= score_fr AND score_es > 0 THEN 'es'
          WHEN score_fr > 0 THEN 'fr'
          ELSE 'xx'
        END AS lang_pred
      FROM lang),
    qual AS (SELECT doc_id,
        len(toks) >= 10 AND
        100 * len(list_filter(toks, t -> t IN
          ('the','a','and','is','of','to','in','that','it'))) >= 3 * len(toks)
          AS pass_quality
      FROM tr),
    keep AS (SELECT min(doc_id) AS keeper FROM tr
             GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))),
    sh AS (SELECT doc_id, {_SHINGLES} AS s FROM tr),
    post AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    bt AS (SELECT {_TOKS} AS toks FROM documents WHERE doc_id % 50 = 0),
    bidx AS (SELECT DISTINCT unnest(s) AS shingle
             FROM (SELECT {_SHINGLES} AS s FROM bt)),
    hits AS (SELECT p.doc_id, count(*) AS n_hit
             FROM post p JOIN bidx b ON p.shingle = b.shingle GROUP BY 1),
    fl AS (SELECT tr.doc_id,
        pred.lang_pred,
        pred.lang_pred = 'en' AS pass_lang,
        qual.pass_quality,
        tr.doc_id IN (SELECT keeper FROM keep) AS is_keeper,
        COALESCE(h.n_hit, 0) < {DECON_MIN_HITS} AS not_contaminated,
        (tr.doc_id % 1048573) * 2654435761 % 1000000 < 800000 AS sampled
      FROM tr
      JOIN pred USING (doc_id) JOIN qual USING (doc_id)
      LEFT JOIN hits h USING (doc_id))
    SELECT doc_id, lang_pred, pass_lang, pass_quality, is_keeper,
           not_contaminated, sampled,
           pass_lang AND pass_quality AND is_keeper AND not_contaminated
             AND sampled AS kept
    FROM fl ORDER BY doc_id
"""


def corpus_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self bigram LM scoring (CCNet/KenLM-shaped quality
    signal): documents scored by how common their bigrams are in the
    corpus — integer-count fields exact, log fields rounded."""
    d = load(spark, sf_dir, "documents")
    return corpus.lm_score(d)


EXTENSION_QUERIES["corpus_lm_score"] = corpus_lm_score


EXTENSION_ORACLES["corpus_lm_score"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    bg AS (SELECT doc_id,
                  unnest(CASE WHEN len(toks) >= 2 THEN
                    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
                  ELSE [] END) AS b
           FROM t),
    cnt AS (SELECT b, count(*) AS cnt FROM bg GROUP BY 1),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM cnt),
    per AS (SELECT doc_id, CAST(count(*) AS INT) AS n_bigrams,
                   CAST(sum(cnt) AS BIGINT) AS sum_count,
                   CAST(min(cnt) AS BIGINT) AS min_count,
                   avg(ln(cnt)) AS al
            FROM bg JOIN cnt USING (b) GROUP BY 1)
    SELECT d.doc_id,
           CAST(COALESCE(per.n_bigrams, 0) AS INT) AS n_bigrams,
           CAST(COALESCE(per.sum_count, 0) AS BIGINT) AS sum_count,
           per.min_count,
           ROUND(per.al, 6) AS avg_log_count,
           ROUND(per.al - ln((SELECT t FROM tot)), 6) AS lm_logprob
    FROM documents d LEFT JOIN per USING (doc_id)
    ORDER BY d.doc_id
"""


# ------------------------------------------------- chunking / domain capping

CHUNK_BUDGET = 16   # fixture docs average ~54 tokens -> ~4 chunks each


DOMAIN_CAP = 15     # fixture sources hold 25 (sf0.01) / 250 (sf0.1) docs


def corpus_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: each document cut into consecutive
    fixed-token-budget chunks (the per-document inverse of
    pack_sequences) — pure narrow map + generator, zero shuffles."""
    d = load(spark, sf_dir, "documents")
    return corpus.chunk_spans(d, budget=CHUNK_BUDGET)


EXTENSION_QUERIES["corpus_chunk"] = corpus_chunk


EXTENSION_ORACLES["corpus_chunk"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    c AS (SELECT doc_id, toks, len(toks) AS n,
                 unnest(range(0, CAST(ceil(len(toks) / {CHUNK_BUDGET}.0) AS BIGINT)))
                   AS chunk_id
          FROM t)
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           CAST(chunk_id * {CHUNK_BUDGET} AS INT) AS begin_tok,
           CAST(LEAST({CHUNK_BUDGET}, n - chunk_id * {CHUNK_BUDGET}) AS INT)
             AS n_chunk_tokens,
           array_to_string(toks[CAST(chunk_id * {CHUNK_BUDGET} + 1 AS BIGINT)
                                : CAST(chunk_id * {CHUNK_BUDGET} + {CHUNK_BUDGET} AS BIGINT)],
                           ' ') AS chunk_text
    FROM c ORDER BY doc_id, chunk_id
"""


def corpus_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source frequency capping (C4/RefinedWeb-style): at most
    DOMAIN_CAP docs kept per source, deterministic hash priority,
    skew-safe two-level rank (no single-task-per-domain window)."""
    d = load(spark, sf_dir, "documents")
    return corpus.domain_cap(d, cap=DOMAIN_CAP)


EXTENSION_QUERIES["corpus_domain_cap"] = corpus_domain_cap


EXTENSION_ORACLES["corpus_domain_cap"] = f"""
    WITH u AS (SELECT doc_id, source,
                      (doc_id % 1048573) * 2654435761 % 1000000 AS u
               FROM documents),
    r AS (SELECT doc_id, source, u,
                 row_number() OVER (PARTITION BY source ORDER BY u, doc_id)
                   AS dom_rank
          FROM u)
    SELECT doc_id, source, u, CAST(dom_rank AS BIGINT) AS dom_rank,
           dom_rank <= {DOMAIN_CAP} AS kept
    FROM r ORDER BY doc_id
"""


def corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two deterministic views of the documents
    fixture (old = ids not divisible by 7, new = ids not divisible by
    5 with every 11th doc's text rewritten): per-doc added / removed /
    changed / unchanged classification via an id-keyed full outer
    join on md5 fingerprints."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    old = d.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id", F.md5(F.col("text")).alias("fp")
    )
    new_text = F.when(
        F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
    ).otherwise(F.col("text"))
    new = d.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id", F.md5(new_text).alias("fp")
    )
    return corpus.snapshot_diff(old, new)


EXTENSION_QUERIES["corpus_diff"] = corpus_diff


EXTENSION_ORACLES["corpus_diff"] = """
    WITH o AS (SELECT doc_id, md5(text) AS old_fp FROM documents
               WHERE doc_id % 7 <> 0),
    n AS (SELECT doc_id,
                 md5(CASE WHEN doc_id % 11 = 0 THEN text || ' [rev2]'
                          ELSE text END) AS new_fp
          FROM documents WHERE doc_id % 5 <> 0)
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.old_fp IS NULL THEN 'added'
                WHEN n.new_fp IS NULL THEN 'removed'
                WHEN o.old_fp = n.new_fp THEN 'unchanged'
                ELSE 'changed' END AS status,
           o.old_fp, n.new_fp
    FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
    ORDER BY doc_id
"""


COOC_WINDOW = 3


COOC_MIN_COUNT = 3


def corpus_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word co-occurrence + PMI over the documents table (the
    word2vec/GloVe count pipeline): forward-window token pairs, PMI vs
    the unigram distribution, min-count pruned."""
    d = load(spark, sf_dir, "documents")
    return corpus.cooccurrence_pmi(
        d, window=COOC_WINDOW, min_count=COOC_MIN_COUNT
    )


EXTENSION_QUERIES["corpus_cooccurrence"] = corpus_cooccurrence


EXTENSION_ORACLES["corpus_cooccurrence"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    pos AS (SELECT doc_id, unnest(toks) AS w,
                   generate_subscripts(toks, 1) AS i
            FROM t),
    pr AS (SELECT a.w AS w1, b.w AS w2
           FROM pos a JOIN pos b
             ON a.doc_id = b.doc_id
            AND b.i > a.i AND b.i <= a.i + {COOC_WINDOW}),
    pc AS (SELECT w1, w2, count(*) AS n_pair FROM pr GROUP BY 1, 2),
    uc AS (SELECT w, count(*) AS cu FROM pos GROUP BY 1),
    tot AS (SELECT (SELECT count(*) FROM pr) AS tp,
                   (SELECT count(*) FROM pos) AS tu)
    SELECT pc.w1, pc.w2, pc.n_pair,
           round(log2((CAST(pc.n_pair AS DOUBLE) / tot.tp)
                      / ((CAST(u1.cu AS DOUBLE) / tot.tu)
                         * (CAST(u2.cu AS DOUBLE) / tot.tu))), 6) AS pmi
    FROM pc
    JOIN uc u1 ON pc.w1 = u1.w
    JOIN uc u2 ON pc.w2 = u2.w
    CROSS JOIN tot
    WHERE pc.n_pair >= {COOC_MIN_COUNT}
    ORDER BY pc.w1, pc.w2
"""


def corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus dashboard: doc/source/lang counts, token volume,
    and the exact-duplicate ratio — the audit header every dataset card
    starts with."""
    from ksql_query_tutorial_spark.operators.text import tokens

    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id", "lang", "source",
            F.length("text").alias("_chars"),
            F.size(tokens(F.col("text"))).alias("_toks"),
            F.md5("text").alias("_fp"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("_chars").alias("total_chars"),
            F.sum("_toks").alias("total_tokens"),
            F.round(F.avg("_toks"), 6).alias("avg_tokens"),
            F.round(
                1 - F.countDistinct("_fp") / F.count(F.lit(1)), 6
            ).alias("exact_dup_ratio"),
        )
    )


EXTENSION_QUERIES["corpus_summary"] = corpus_summary


EXTENSION_ORACLES["corpus_summary"] = f"""
    SELECT count(*) AS n_docs,
           count(DISTINCT source) AS n_sources,
           count(DISTINCT lang) AS n_langs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(sum(len({_TOKS})) AS BIGINT) AS total_tokens,
           round(avg(len({_TOKS})), 6) AS avg_tokens,
           round(1 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / count(*), 6)
             AS exact_dup_ratio
    FROM documents
"""


# ----------------------------------------------- Count-Min sketch

CMS_DEPTH = 4


CMS_WIDTH = 8192


def corpus_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch token frequencies — the bounded-state frequency
    sketch completing the KMV/Bloom/CMS triad; estimates are exact
    deterministic arithmetic over the portable hash, so the oracle
    verifies the sketch's actual (one-sided) error, not a workaround.
    See corpus.cms_token_counts."""
    d = load(spark, sf_dir, "documents")
    return corpus.cms_token_counts(
        d, depth=CMS_DEPTH, width=CMS_WIDTH, portable=True
    )


EXTENSION_QUERIES["corpus_cms_counts"] = corpus_cms_counts


_CMS_H = _portable_hash_sql("tok")


EXTENSION_ORACLES["corpus_cms_counts"] = f"""
    WITH tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_count
                FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
                WHERE tok <> '' GROUP BY tok),
    th AS (SELECT tok, exact_count, {_CMS_H} AS h FROM tc),
    pos AS (SELECT tok, exact_count, i,
                   ((h % 2147483647) * (2*i+1) + (i*i+1))
                       % 2147483647 % {CMS_WIDTH} AS pos
            FROM th, (SELECT unnest(range({CMS_DEPTH})) AS i)),
    grid AS (SELECT i, pos, sum(exact_count) AS cell
             FROM pos GROUP BY i, pos),
    est AS (SELECT tok, max(exact_count) AS exact_count,
                   min(cell) AS est_count
            FROM pos JOIN grid USING (i, pos) GROUP BY tok)
    SELECT tok, exact_count,
           CAST(est_count AS BIGINT) AS est_count,
           CAST(est_count - exact_count AS BIGINT) AS overshoot
    FROM est ORDER BY tok
"""


# ----------------------------------------------- novelty / temperature mix / histogram

MIX_ALPHA = 0.3


def corpus_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc first-occurrence shingle novelty (fresh-content ranking
    signal). See corpus.novelty_scores."""
    d = load(spark, sf_dir, "documents")
    return corpus.novelty_scores(d)


EXTENSION_QUERIES["corpus_novelty"] = corpus_novelty


EXTENSION_ORACLES["corpus_novelty"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES} AS s FROM t),
    post AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    firsts AS (SELECT shingle, min(doc_id) AS fid FROM post GROUP BY 1),
    per AS (SELECT p.doc_id, count(*) AS n_sh,
                   sum(CASE WHEN f.fid = p.doc_id THEN 1 ELSE 0 END) AS nn
            FROM post p JOIN firsts f USING (shingle) GROUP BY 1)
    SELECT d.doc_id,
           CAST(COALESCE(per.n_sh, 0) AS BIGINT) AS n_shingles,
           CAST(COALESCE(per.nn, 0) AS BIGINT) AS n_novel,
           ROUND(CAST(COALESCE(per.nn, 0) AS DOUBLE)
                 / greatest(COALESCE(per.n_sh, 0), 1), 6) AS novelty
    FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id
"""


def corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha = 0.3) per-source sampling
    probabilities derived from token shares — the mT5-style mixing
    rule. See corpus.mix_temperature."""
    d = load(spark, sf_dir, "documents")
    return corpus.mix_temperature(d, alpha=MIX_ALPHA)


EXTENSION_QUERIES["corpus_mix_temperature"] = corpus_mix_temperature


EXTENSION_ORACLES["corpus_mix_temperature"] = f"""
    WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                        CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
                 FROM documents GROUP BY 1),
    tot AS (SELECT sum(n_tokens) AS t FROM per),
    sc AS (SELECT source, n_docs, n_tokens,
                  CAST(n_tokens AS DOUBLE) / greatest((SELECT t FROM tot), 1)
                    AS p_raw
           FROM per),
    w AS (SELECT *, pow(p_raw, {MIX_ALPHA}) AS pw FROM sc),
    ws AS (SELECT sum(pw) AS s FROM w)
    SELECT source, n_docs, n_tokens,
           ROUND(p_raw, 6) AS p_raw,
           ROUND(pw / (SELECT s FROM ws), 6) AS p_temp,
           ROUND((pw / (SELECT s FROM ws)) / p_raw, 6) AS boost
    FROM w ORDER BY source
"""


# ----------------------------------------------- text cleaning

CLEAN_MIN_LINE_WORDS = 3


def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style text repair: control-char strip, short-line drop,
    whitespace collapse — the transform companion to corpus_curate's
    flags. Zero shuffles. See corpus.clean_text."""
    d = load(spark, sf_dir, "documents")
    return corpus.clean_text(d, min_line_words=CLEAN_MIN_LINE_WORDS)


EXTENSION_QUERIES["corpus_clean"] = corpus_clean


EXTENSION_ORACLES["corpus_clean"] = f"""
    WITH t AS (SELECT doc_id,
                      regexp_replace(text,
                          '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g')
                        AS nc,
                      text
               FROM documents),
    l AS (SELECT doc_id, text, string_split(nc, chr(10)) AS lines FROM t),
    k AS (SELECT doc_id, text, lines,
                 list_filter(lines, ln ->
                     len(list_filter(regexp_split_to_array(trim(ln),
                                                           '[ \\t]+'),
                                     w -> w <> '')) >= {CLEAN_MIN_LINE_WORDS})
                   AS kept
          FROM l),
    j AS (SELECT doc_id, text, lines, kept,
                 trim(regexp_replace(array_to_string(kept, chr(10)),
                                     '[ \\t]+', ' ', 'g')) AS clean_text
          FROM k)
    SELECT doc_id, clean_text,
           CAST(len(kept) AS INT) AS n_lines_kept,
           CAST(len(lines) - len(kept) AS INT) AS n_lines_dropped,
           CAST(length(text) AS INT) AS n_chars_before,
           CAST(length(clean_text) AS INT) AS n_chars_after
    FROM j ORDER BY doc_id
"""


# ----------------------------------------------- weighted sampling

SAMPLE_W_K = 200


def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (Efraimidis-Spirakis A-Res)
    with weight = n_chars — longer docs proportionally likelier.
    See corpus.sample_weighted."""
    d = load(spark, sf_dir, "documents")
    return corpus.sample_weighted(
        d, k=SAMPLE_W_K, weight_col=F.col("n_chars")
    )


EXTENSION_QUERIES["sample_weighted"] = sample_weighted


EXTENSION_ORACLES["sample_weighted"] = f"""
    WITH s AS (SELECT doc_id,
                      CAST(n_chars AS DOUBLE) AS weight,
                      CAST(((doc_id % 1048573) * 2654435761) % 1000000
                           AS DOUBLE) / 1000000.0 AS u
               FROM documents),
    key AS (SELECT doc_id, ROUND(weight, 6) AS weight, ROUND(u, 6) AS u,
                   ROUND(pow(u, 1.0 / weight), 12) AS key,
                   pow(u, 1.0 / weight) AS rawkey
            FROM s)
    SELECT doc_id, weight, u, key
    FROM key ORDER BY rawkey DESC, doc_id LIMIT {SAMPLE_W_K}
"""


# ---------------------------------------------------- BPE merge trainer

BPE_N_MERGES = 12


BPE_MAX_WORD_CHARS = 256  # trainer-side word cap; mirrored in the oracle


def corpus_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 12 BPE merge rules learned from the documents corpus
    (Sennrich subword tokenizer training) — see corpus.bpe_merges.
    The oracle macro-expands the SAME iteration as 12 nested CTE
    layers (pair-count -> LIMIT 1 argmax -> greedy run-parity
    rewrite), so the learned rule SEQUENCE is hash-verified, not just
    the final vocabulary."""
    d = load(spark, sf_dir, "documents")
    return corpus.bpe_merges(
        d, n_merges=BPE_N_MERGES, max_word_chars=BPE_MAX_WORD_CHARS
    )


EXTENSION_QUERIES["corpus_bpe_merges"] = corpus_bpe_merges


def _bpe_layer_sql(k: int) -> str:
    """One macro-expanded BPE round: count adjacent pairs of s{k},
    argmax into t{k}, greedy non-overlapping rewrite into s{k+1}
    (marks -> gaps-and-islands run index -> odd-parity merge -> drop
    consumed successors -> renumber)."""
    return f"""
    p{k} AS (SELECT sym AS l,
                    lead(sym) OVER (PARTITION BY word ORDER BY pos) AS r,
                    freq
             FROM s{k}),
    c{k} AS (SELECT l, r, sum(freq) AS cnt FROM p{k}
             WHERE r IS NOT NULL GROUP BY 1, 2),
    t{k} AS MATERIALIZED (SELECT l, r, cnt FROM c{k}
                           ORDER BY cnt DESC, l, r LIMIT 1),
    m{k} AS (SELECT word, freq, pos, sym,
                    CASE WHEN sym = (SELECT l FROM t{k})
                          AND lead(sym) OVER (PARTITION BY word
                                              ORDER BY pos)
                              = (SELECT r FROM t{k})
                         THEN 1 ELSE 0 END AS mk
             FROM s{k}),
    g{k} AS (SELECT *, pos - row_number() OVER (PARTITION BY word, mk
                                                ORDER BY pos) AS grp
             FROM m{k}),
    r{k} AS (SELECT *, CASE WHEN mk = 1
                            THEN row_number() OVER (PARTITION BY word, grp
                                                    ORDER BY pos)
                            ELSE 0 END AS runpos
             FROM g{k}),
    k{k} AS (SELECT word, freq, pos, sym,
                    CASE WHEN mk = 1 AND runpos % 2 = 1
                         THEN 1 ELSE 0 END AS do_merge
             FROM r{k}),
    d{k} AS (SELECT *, COALESCE(lag(do_merge) OVER (PARTITION BY word
                                                    ORDER BY pos), 0)
                         AS drop_me
             FROM k{k}),
    s{k + 1} AS MATERIALIZED (SELECT word, freq,
                        row_number() OVER (PARTITION BY word
                                           ORDER BY pos) AS pos,
                        CASE WHEN do_merge = 1
                             THEN sym || (SELECT r FROM t{k})
                             ELSE sym END AS sym
                 FROM d{k} WHERE drop_me = 0)"""


def _bpe_oracle_sql(n_merges: int) -> str:
    head = f"""
    wf AS (SELECT substring(word, 1, {BPE_MAX_WORD_CHARS}) AS word,
                  count(*) AS freq
           FROM (SELECT unnest({_TOKS}) AS word FROM documents)
           WHERE word <> '' GROUP BY 1),
    s0 AS MATERIALIZED (SELECT word, freq, i AS pos, syms[i] AS sym
           FROM (SELECT word, freq,
                        list_append(string_split(word, ''), '</w>') AS syms
                 FROM wf),
                unnest(range(1, len(syms) + 1)) AS t(i))"""
    layers = ",".join(_bpe_layer_sql(k) for k in range(n_merges))
    finals = " UNION ALL ".join(
        f"SELECT CAST({k + 1} AS BIGINT) AS rank, l AS left_sym, "
        f"r AS right_sym, CAST(cnt AS BIGINT) AS pair_count FROM t{k}"
        for k in range(n_merges)
    )
    return f"WITH {head},{layers}\n    {finals} ORDER BY rank"


EXTENSION_ORACLES["corpus_bpe_merges"] = _bpe_oracle_sql(BPE_N_MERGES)


INDEX_K_POSTINGS = 10


INDEX_MIN_DF = 2


def corpus_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized inverted index (df / cf / first-k postings per
    term) — the lexical-retrieval artifact. See
    corpus.inverted_index."""
    d = load(spark, sf_dir, "documents")
    return corpus.inverted_index(
        d, k_postings=INDEX_K_POSTINGS, min_df=INDEX_MIN_DF
    )


EXTENSION_QUERIES["corpus_index"] = corpus_index


EXTENSION_ORACLES["corpus_index"] = f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    post AS (SELECT DISTINCT doc_id, term FROM tok),
    st AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
                  array_to_string(list_slice(list_sort(list(doc_id)), 1,
                             {INDEX_K_POSTINGS}), ',') AS postings
           FROM post GROUP BY term),
    cf AS (SELECT term, CAST(count(*) AS BIGINT) AS cf
           FROM tok GROUP BY term)
    SELECT st.term, df, cf.cf, postings
    FROM st JOIN cf USING (term)
    WHERE df >= {INDEX_MIN_DF}
    ORDER BY st.term
"""


BPE_ENCODE_MERGES = 8  # prefix of the trainer's 12 (merge sequences


def corpus_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus vocabulary with self-learned BPE merges —
    the encoder half of the tokenizer pair. See corpus.bpe_encode."""
    d = load(spark, sf_dir, "documents")
    return corpus.bpe_encode(
        d, n_merges=BPE_ENCODE_MERGES, max_word_chars=BPE_MAX_WORD_CHARS
    )


EXTENSION_QUERIES["corpus_bpe_encode"] = corpus_bpe_encode


def _bpe_encode_oracle_sql(n_merges: int) -> str:
    head = f"""
    wf AS (SELECT substring(word, 1, {BPE_MAX_WORD_CHARS}) AS word,
                  count(*) AS freq
           FROM (SELECT unnest({_TOKS}) AS word FROM documents)
           WHERE word <> '' GROUP BY 1),
    s0 AS MATERIALIZED (SELECT word, freq, i AS pos, syms[i] AS sym
           FROM (SELECT word, freq,
                        list_append(string_split(word, ''), '</w>') AS syms
                 FROM wf),
                unnest(range(1, len(syms) + 1)) AS t(i))"""
    layers = ",".join(_bpe_layer_sql(k) for k in range(n_merges))
    return f"""WITH {head},{layers}
    SELECT word, CAST(freq AS BIGINT) AS freq,
           CAST(count(*) AS INT) AS n_syms,
           string_agg(sym, ' ' ORDER BY pos) AS encoded
    FROM s{n_merges} GROUP BY word, freq ORDER BY word"""


EXTENSION_ORACLES["corpus_bpe_encode"] = _bpe_encode_oracle_sql(
    BPE_ENCODE_MERGES
)


def corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-vs-valid language-distribution drift (smoothed KL + TV per
    category) over the deterministic hash split. See
    corpus.distribution_drift."""
    d = load(spark, sf_dir, "documents")
    return corpus.distribution_drift(d, category_col="lang")


EXTENSION_QUERIES["corpus_drift"] = corpus_drift


EXTENSION_ORACLES["corpus_drift"] = """
    WITH u AS (SELECT lang,
                      (doc_id % 1048573) * 2654435761 % 1000000 AS u
               FROM documents),
    s AS (SELECT lang,
                 CASE WHEN u < 900000 THEN 'train'
                      WHEN u < 950000 THEN 'valid'
                      ELSE 'test' END AS split
          FROM u),
    c AS (SELECT lang,
                 CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_a,
                 CAST(sum(CASE WHEN split = 'valid' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_b
          FROM s WHERE split IN ('train', 'valid') GROUP BY lang),
    t AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb, count(*) AS k FROM c)
    SELECT lang, n_a, n_b,
           ROUND((n_a + 1.0) / (ta + k), 6) AS p,
           ROUND((n_b + 1.0) / (tb + k), 6) AS q,
           ROUND(((n_a + 1.0) / (ta + k))
                 * ln(((n_a + 1.0) / (ta + k))
                      / ((n_b + 1.0) / (tb + k))), 6) AS kl_term,
           ROUND(0.5 * abs((n_a + 1.0) / (ta + k)
                           - (n_b + 1.0) / (tb + k)), 6) AS tv_term
    FROM c CROSS JOIN t ORDER BY lang
"""


def corpus_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law OLS fit over the top-k token frequencies.
    See corpus.zipf_fit."""
    d = load(spark, sf_dir, "documents")
    return corpus.zipf_fit(d)


EXTENSION_QUERIES["corpus_zipf"] = corpus_zipf


EXTENSION_ORACLES["corpus_zipf"] = f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS term FROM documents),
    tf AS (SELECT term, CAST(count(*) AS BIGINT) AS n
           FROM tok GROUP BY term),
    top AS (SELECT term, n FROM tf ORDER BY n DESC, term LIMIT {corpus.ZIPF_TOP_K}),
    pts AS (SELECT 'corpus' AS g,
                   ln(CAST(row_number() OVER (ORDER BY n DESC, term)
                           AS DOUBLE)) AS x,
                   ln(CAST(n AS DOUBLE)) AS y
            FROM top),
    {_ols_tail_sql("scope")}
"""


SEARCH_TERMS = ("spark", "join", "window")


def corpus_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive term retrieval over the corpus.
    See corpus.boolean_search."""
    from ksql_query_tutorial_spark.operators.corpus import boolean_search

    return boolean_search(
        load(spark, sf_dir, "documents"), terms=SEARCH_TERMS
    )


EXTENSION_QUERIES["corpus_search"] = corpus_search


EXTENSION_ORACLES["corpus_search"] = f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE len(list_intersect(list_distinct({_TOKS}),
                             {list(SEARCH_TERMS)})) = {len(SEARCH_TERMS)}
    ORDER BY doc_id
"""


def corpus_yield_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter yield curve over the hashed linear scorer.
    See corpus.quality_yield_curve."""
    from ksql_query_tutorial_spark.operators.corpus import (
        quality_yield_curve,
    )

    scored = EXTENSION_QUERIES["text_quality_score"](spark, sf_dir)
    return quality_yield_curve(scored)


EXTENSION_QUERIES["corpus_yield_curve"] = corpus_yield_curve


EXTENSION_ORACLES["corpus_yield_curve"] = f"""
    WITH scored AS ({EXTENSION_ORACLES["text_quality_score"]}),
    grid AS (SELECT * FROM (VALUES (-0.1), (-0.05), (0.0), (0.05), (0.1))
             AS t(threshold))
    SELECT threshold,
           CAST(sum(CASE WHEN quality_score >= threshold THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_kept,
           ROUND(CAST(sum(CASE WHEN quality_score >= threshold
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS doc_share,
           CAST(sum(CASE WHEN quality_score >= threshold
                         THEN n_distinct_tokens ELSE 0 END) AS BIGINT)
             AS tokens_kept,
           ROUND(CAST(sum(CASE WHEN quality_score >= threshold
                               THEN n_distinct_tokens ELSE 0 END) AS DOUBLE)
                 / CAST(sum(n_distinct_tokens) AS DOUBLE), 6)
             AS token_share
    FROM scored CROSS JOIN grid
    GROUP BY 1 ORDER BY 1
"""


def corpus_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit. See corpus.heaps_fit."""
    from ksql_query_tutorial_spark.operators.corpus import heaps_fit
    from ksql_query_tutorial_spark.tables import parquet_row_count

    n = parquet_row_count(f"{sf_dir}/documents.parquet")
    return heaps_fit(load(spark, sf_dir, "documents"), n_docs=n)


EXTENSION_QUERIES["corpus_heaps"] = corpus_heaps


EXTENSION_ORACLES["corpus_heaps"] = f"""
    WITH nd AS (SELECT greatest(count(*), 1) AS n FROM documents),
    fo AS (SELECT tok.term,
                  CAST(least(CAST(floor(min(tok.doc_id) * 10.0
                                        / (SELECT n FROM nd)) AS INT), 9)
                       AS INT) AS bin
           FROM (SELECT doc_id,
                        unnest(list_distinct({_TOKS})) AS term
                 FROM documents) tok
           GROUP BY tok.term),
    nv AS (SELECT bin, CAST(count(*) AS BIGINT) AS new_vocab
           FROM fo GROUP BY 1),
    tm AS (SELECT CAST(least(CAST(floor(doc_id * 10.0
                                        / (SELECT n FROM nd)) AS INT), 9)
                       AS INT) AS bin,
                  CAST(sum(len({_TOKS})) AS BIGINT) AS tokens
           FROM documents GROUP BY 1),
    cells AS (
        SELECT tm.bin,
               sum(tm.tokens) OVER (ORDER BY tm.bin
                                    ROWS UNBOUNDED PRECEDING) AS tok_cum,
               sum(COALESCE(nv.new_vocab, 0)) OVER (ORDER BY tm.bin
                                    ROWS UNBOUNDED PRECEDING) AS voc_cum
        FROM tm LEFT JOIN nv ON tm.bin = nv.bin),
    pts AS (SELECT 'corpus' AS g,
                   ln(CAST(tok_cum AS DOUBLE)) AS x,
                   ln(CAST(voc_cum AS DOUBLE)) AS y
            FROM cells WHERE tok_cum > 0 AND voc_cum > 0),
    {_ols_tail_sql("scope")}
"""


def corpus_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick bag-of-words signatures over documents.
    See corpus.feature_hash_signature."""
    from ksql_query_tutorial_spark.operators.corpus import (
        feature_hash_signature,
    )

    return feature_hash_signature(load(spark, sf_dir, "documents"))


EXTENSION_QUERIES["corpus_feature_hash"] = corpus_feature_hash


_FH_D = 256


_FH_HASH = _portable_hash_sql("tok")


EXTENSION_ORACLES["corpus_feature_hash"] = f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    tc AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt
           FROM tok WHERE tok <> '' GROUP BY 1, 2),
    hs AS (SELECT doc_id, cnt, {_FH_HASH} AS h FROM tc),
    slots AS (
        SELECT doc_id, h & {_FH_D - 1} AS bucket,
               SUM(CASE WHEN ((h >> 8) & 1) = 0 THEN cnt ELSE -cnt END)
                   AS val
        FROM hs GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(CASE WHEN val <> 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS nnz,
           CAST(sum(abs(val)) AS BIGINT) AS l1,
           CAST(sum(val * val) AS BIGINT) AS sum_sq,
           CAST(sum(bucket * val) AS BIGINT) AS checksum
    FROM slots GROUP BY 1 ORDER BY 1
"""


def corpus_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: characters per BPE-ish token
    and BPE tokens per whitespace word — the efficiency readout that
    decides whether a tokenizer (or a language's share of the mixture)
    is burning context budget. High fertility = more tokens per char =
    more compute per byte of text; tracked per language because
    fertility disparities are the classic multilingual-tokenizer
    failure. Rides the exact token signals of text_token_stats
    (operator composition).

    Scale design: one narrow codegen projection per doc (the token
    stats), one lang-keyed rollup with map-side partials over exact
    integer sums; output bounded by |langs|.
    """
    from ksql_query_tutorial_spark.operators import text

    d = load(spark, sf_dir, "documents")
    stats = text.with_token_stats(d).select(
        "lang", "n_tokens", "n_bpe_tokens", "n_chars_measured"
    )
    agg = stats.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars_measured").cast("long").alias("__chars"),
        F.sum("n_bpe_tokens").cast("long").alias("__bpe"),
        F.sum("n_tokens").cast("long").alias("__words"),
    )
    return agg.select(
        "lang",
        "n_docs",
        F.round(
            F.col("__chars").cast("double")
            / F.greatest(F.col("__bpe"), F.lit(1)).cast("double"),
            6,
        ).alias("chars_per_token"),
        F.round(
            F.col("__bpe").cast("double")
            / F.greatest(F.col("__words"), F.lit(1)).cast("double"),
            6,
        ).alias("tokens_per_word"),
    ).orderBy("lang")


EXTENSION_QUERIES["corpus_fertility"] = corpus_fertility


EXTENSION_ORACLES["corpus_fertility"] = f"""
    WITH s AS (SELECT lang,
                      CAST(len({_TOKS}) AS BIGINT) AS words,
                      CAST(len(regexp_extract_all(lower(text),
                           '[a-z0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS bpe,
                      CAST(length(text) AS BIGINT) AS chars
               FROM documents),
    a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                 sum(chars) AS c, sum(bpe) AS b, sum(words) AS w
          FROM s GROUP BY 1)
    SELECT lang, n_docs,
           ROUND(CAST(c AS DOUBLE) / greatest(b, 1), 6)
               AS chars_per_token,
           ROUND(CAST(b AS DOUBLE) / greatest(w, 1), 6)
               AS tokens_per_word
    FROM a ORDER BY lang
"""


LENGTH_DRIFT_BIN = 64  # chars per histogram bin


def corpus_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-half document-length distribution drift: bin doc lengths
    (chars, fixed-width bins), build the even-id and odd-id half
    histograms, and report the KS-style max CDF gap plus the total
    variation distance — the text-side twin of embedding_centroid_drift
    (run across snapshots by mapping the snapshot into the parity).
    A stable corpus scores ≈ 0 on both; ingestion drift (truncation
    bugs, a new source's length profile) moves them.

    Determinism design: histograms are exact integer counts on a
    bounded bin domain; the CDFs are cumulative sums over ordered
    bins (identical grouped folds in both engines); KS and TV are
    fixed-shape expressions, rounded 6.

    Scale design: one narrow projection + a (parity, bin)-keyed rollup
    with map-side partials; the CDF windows run over bounded bins.
    """
    d = load(spark, sf_dir, "documents")
    cells = (
        d.select(
            F.pmod(F.col("doc_id"), F.lit(2)).cast("int").alias("par"),
            F.floor(F.length("text") / F.lit(LENGTH_DRIFT_BIN))
            .cast("long")
            .alias("bin"),
        )
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("par") == 0, 1).otherwise(0))
            .cast("long").alias("c0"),
            F.sum(F.when(F.col("par") == 1, 1).otherwise(0))
            .cast("long").alias("c1"),
        )
    )
    tot = cells.agg(
        F.sum("c0").alias("t0"), F.sum("c1").alias("t1")
    )
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    staged = (
        cells.crossJoin(F.broadcast(tot))
        .withColumn(
            "__f0",
            F.sum("c0").over(w).cast("double") / F.col("t0").cast("double"),
        )
        .withColumn(
            "__f1",
            F.sum("c1").over(w).cast("double") / F.col("t1").cast("double"),
        )
    )
    return staged.agg(
        F.sum("c0").cast("long").alias("n_even"),
        F.sum("c1").cast("long").alias("n_odd"),
        F.round(F.max(F.abs(F.col("__f0") - F.col("__f1"))), 6).alias(
            "ks_gap"
        ),
        F.round(
            0.5
            * F.sum(
                F.abs(
                    F.col("c0").cast("double") / F.col("t0").cast("double")
                    - F.col("c1").cast("double") / F.col("t1").cast("double")
                )
            ),
            6,
        ).alias("tv_distance"),
    )


EXTENSION_QUERIES["corpus_length_drift"] = corpus_length_drift


EXTENSION_ORACLES["corpus_length_drift"] = f"""
    WITH cells AS (
        SELECT CAST(floor(length(text) / ({LENGTH_DRIFT_BIN} * 1.0)) AS BIGINT) AS bin,
               CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c0,
               CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c1
        FROM documents GROUP BY 1),
    tot AS (SELECT sum(c0) AS t0, sum(c1) AS t1 FROM cells),
    staged AS (
        SELECT c0, c1, t0, t1,
               sum(c0) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                   / CAST(t0 AS DOUBLE) AS f0,
               sum(c1) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                   / CAST(t1 AS DOUBLE) AS f1
        FROM cells CROSS JOIN tot)
    SELECT CAST(sum(c0) AS BIGINT) AS n_even,
           CAST(sum(c1) AS BIGINT) AS n_odd,
           ROUND(max(abs(f0 - f1)), 6) AS ks_gap,
           ROUND(0.5 * sum(abs(CAST(c0 AS DOUBLE) / t0
                               - CAST(c1 AS DOUBLE) / t1)), 6)
               AS tv_distance
    FROM staged
"""


# ------------------------------------------------ importance weights (r9)

def sample_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighting plan toward a uniform source mixture, with
    the Kish effective-sample-size ratio quantifying the variance cost.
    See corpus.sample_importance."""
    d = load(spark, sf_dir, "documents")
    return corpus.sample_importance(d)


EXTENSION_QUERIES["sample_importance"] = sample_importance


EXTENSION_ORACLES["sample_importance"] = f"""
    WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                        CAST(SUM(CAST(len({_TOKS}) AS BIGINT)) AS BIGINT)
                          AS n_tokens
                 FROM documents GROUP BY 1),
    tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS tok_total,
                   count(*) AS n_sources,
                   CAST(sum(n_docs) AS DOUBLE) AS doc_total
            FROM per),
    b AS (SELECT p.*,
                 CAST(p.n_tokens AS DOUBLE) / t.tok_total AS corpus_share,
                 1.0 / t.n_sources AS target_share,
                 (1.0 / t.n_sources)
                   / (CAST(p.n_tokens AS DOUBLE) / t.tok_total) AS weight,
                 t.doc_total
          FROM per p CROSS JOIN tot t),
    k AS (SELECT sum(CAST(n_docs AS DOUBLE) * weight) AS sw,
                 sum(CAST(n_docs AS DOUBLE) * weight * weight) AS sw2,
                 CAST(sum(n_docs) AS DOUBLE) AS ndt
          FROM b)
    SELECT source, n_docs, n_tokens,
           ROUND(corpus_share, 6) AS corpus_share,
           ROUND(target_share, 6) AS target_share,
           ROUND(weight, 6) AS weight,
           ROUND(CAST(n_docs AS DOUBLE) * weight, 6) AS expected_mass,
           ROUND(sw * sw / sw2 / ndt, 6) AS ess_ratio
    FROM b CROSS JOIN k ORDER BY source
"""


# ------------------------------------------------ Kneser-Ney (r9)

KN_DISCOUNT = 0.75
KN_MIN_COUNT = 3


def corpus_kn_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities from exact corpus
    counts (continuation-count smoothing — the KenLM scheme raw
    relative frequency lacks). See corpus.kn_bigram."""
    d = load(spark, sf_dir, "documents")
    return corpus.kn_bigram(d, discount=KN_DISCOUNT, min_count=KN_MIN_COUNT)


EXTENSION_QUERIES["corpus_kn_bigram"] = corpus_kn_bigram


EXTENSION_ORACLES["corpus_kn_bigram"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    bgl AS (SELECT CASE WHEN len(toks) >= 2 THEN
                     list_transform(range(1, len(toks)),
                                    i -> [toks[i], toks[i+1]])
                   ELSE [] END AS bs
            FROM t),
    pairs AS (SELECT unnest(bs) AS b FROM bgl),
    big AS (SELECT b[1] AS w1, b[2] AS w2,
                   CAST(count(*) AS BIGINT) AS c12
            FROM pairs GROUP BY 1, 2),
    lft AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
                   CAST(count(*) AS BIGINT) AS n1p_fw
            FROM big GROUP BY 1),
    cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1p_bw
             FROM big GROUP BY 1),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM big)
    SELECT b.w1, b.w2, c12,
           ROUND(greatest(CAST(c12 AS DOUBLE) - {KN_DISCOUNT}, 0.0)
                   / CAST(c1 AS DOUBLE)
                 + {KN_DISCOUNT} * CAST(n1p_fw AS DOUBLE)
                   / CAST(c1 AS DOUBLE)
                   * (CAST(n1p_bw AS DOUBLE) / CAST(n_types AS DOUBLE)),
                 6) AS p_kn
    FROM big b JOIN lft USING (w1) JOIN cont USING (w2) CROSS JOIN nt
    WHERE c12 >= {KN_MIN_COUNT}
    ORDER BY w1, w2
"""


# ------------------------------------------------ DSIR (r9)


_DSIR_D = 1024


_DSIR_HASH = _portable_hash_sql("tok")


def corpus_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-based pretraining-data selection: hashed-unigram DSIR
    importance log-weights toward the English slice.
    See corpus.dsir_importance."""
    return corpus.dsir_importance(load(spark, sf_dir, "documents"))


EXTENSION_QUERIES["corpus_dsir"] = corpus_dsir


EXTENSION_ORACLES["corpus_dsir"] = f"""
    WITH tok AS (SELECT doc_id, lang = 'en' AS tgt,
                        unnest({_TOKS}) AS tok
                 FROM documents),
    tc AS (SELECT doc_id, tgt, tok, CAST(count(*) AS BIGINT) AS cnt
           FROM tok WHERE tok <> '' GROUP BY 1, 2, 3),
    db AS (SELECT doc_id, tgt, {_DSIR_HASH} & {_DSIR_D - 1} AS bucket,
                  CAST(SUM(cnt) AS BIGINT) AS c
           FROM tc GROUP BY 1, 2, 3),
    dist AS (SELECT bucket,
                    CAST(SUM(CASE WHEN tgt THEN c ELSE 0 END)
                         AS BIGINT) AS c_tgt,
                    CAST(SUM(c) AS BIGINT) AS c_raw
             FROM db GROUP BY 1),
    tot AS (SELECT CAST(SUM(c_tgt) AS BIGINT) AS t_tgt,
                   CAST(SUM(c_raw) AS BIGINT) AS t_raw
            FROM dist),
    r AS (SELECT bucket,
                 ln(CAST(c_tgt + 1 AS DOUBLE))
                   - ln(CAST(t_tgt + {_DSIR_D} AS DOUBLE))
                   - ln(CAST(c_raw + 1 AS DOUBLE))
                   + ln(CAST(t_raw + {_DSIR_D} AS DOUBLE)) AS lr
          FROM dist CROSS JOIN tot),
    pd AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_toks,
                  SUM(CAST(c AS DOUBLE) * lr) AS lw
           FROM db JOIN r USING (bucket) GROUP BY 1)
    SELECT doc_id, n_toks,
           ROUND(lw, 6) AS logw,
           ROUND(lw / n_toks, 6) AS logw_per_tok,
           ROUND(lw, 6) > 0 AS selected
    FROM pd ORDER BY doc_id
"""
