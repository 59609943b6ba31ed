"""LLM-training-data pipeline operators over `documents` / `embeddings`
(query-registry adapters; implementations live in
``securities_pricing_data_pipeline_spark/llmdata/``), plus the as-of join
extension over events×bars."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from securities_pricing_data_pipeline_spark.llmdata.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash_near_dups,
)
from securities_pricing_data_pipeline_spark.llmdata.multimodal import (
    assets_from_documents,
    extract_features,
    frame_digests,
    resize_images,
    sample_frames,
)
from securities_pricing_data_pipeline_spark.llmdata.similarity import (
    brute_force_topk,
    brute_force_topk_np,
    embedding_near_dups,
    ivf_topk,
    lsh_topk,
    pq_adc_topk,
    pq_codes,
    random_planes,
    semantic_dedup_pairs,
)
from securities_pricing_data_pipeline_spark.llmdata.sampling import split_assign
from securities_pricing_data_pipeline_spark.llmdata.sketch import (
    cms_oracle_sql,
    hll_merge_oracle_sql,
    hll_oracle_sql,
)
from securities_pricing_data_pipeline_spark.llmdata.text import (
    BPE_SPLIT_RE,
    chunk_documents,
    fingerprint_md5,
    lang_id,
    fuzzy_name_match,
    normalize_text,
    pack_greedy,
    sentiment_score,
    SENTIMENT_LEXICON,
    token_count,
    token_count_bpe,
    unigram_logppl,
    pii_scrub,
    quality_score,
    repetition_stats,
    winnow_fingerprints,
)
from securities_pricing_data_pipeline_spark.operators.asof import asof_join_backward
from securities_pricing_data_pipeline_spark.queries.bars import BARS_SQL, bars_df, bars_silver
from securities_pricing_data_pipeline_spark.queries.helpers import (
    SessionSilverRegistry,
    load,
)


# ---- dedup silver artifacts -------------------------------------------------
# A real 100 TB dedup pipeline tokenizes the corpus and materializes
# MinHash signatures ONCE (a written silver table), then runs LSH pairing,
# clustering, audits, and evaluation against that artifact. In-session the
# same contract is a persisted DataFrame keyed by (application, sf_dir) —
# the exact precedent of queries.bars.bars_silver. Every dedup query below
# reads these instead of re-deriving the corpus per query. The registry
# evicts other-session keys on insert (see SessionSilverRegistry).
_DEDUP_SILVER: dict[tuple, DataFrame] = SessionSilverRegistry()


def _shingled_docs(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    """Shared word-n-gram shingling of the documents table (doc_id +
    shingles only — the text column is dropped before persisting)."""
    from pyspark import StorageLevel

    key = ("shingles", spark.sparkContext.applicationId, sf_dir, n)
    df = _DEDUP_SILVER.get(key)
    if df is None:
        docs = load(spark, sf_dir, "documents")
        df = shingles(docs, text_col="text", n=n).select("doc_id", "shingles").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        _DEDUP_SILVER[key] = df
    return df


def _portable_sigs(spark: SparkSession, sf_dir: str, num_hashes: int = 64) -> DataFrame:
    """Shared portable MinHash signatures over the shared shingles."""
    from pyspark import StorageLevel

    key = ("minhash", spark.sparkContext.applicationId, sf_dir, num_hashes)
    df = _DEDUP_SILVER.get(key)
    if df is None:
        df = minhash_signatures(
            _shingled_docs(spark, sf_dir), id_col="doc_id", num_hashes=num_hashes, portable=True
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _DEDUP_SILVER[key] = df
    return df


def _simhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared portable SimHash fingerprints over the shared shingles —
    both the near-dup pair query and its precision/recall eval read
    them, and the 64-bit-vote aggregate is the expensive half of the
    SimHash pass."""
    from pyspark import StorageLevel

    key = ("simhash", spark.sparkContext.applicationId, sf_dir)
    df = _DEDUP_SILVER.get(key)
    if df is None:
        from securities_pricing_data_pipeline_spark.llmdata.dedup import simhash

        df = simhash(
            load(spark, sf_dir, "documents"),
            portable=True,
            shingled=_shingled_docs(spark, sf_dir),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _DEDUP_SILVER[key] = df
    return df


def _lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared MinHash-LSH near-dup pair list (n=3, threshold 0.5,
    portable hashes over the shared signatures) — the materialized
    output of the pairing stage, reused by clustering, evaluation, and
    the source-overlap / cluster-size reports. At corpus scale this is
    the written pair table every downstream dedup consumer reads."""
    from pyspark import StorageLevel

    key = ("lsh_pairs", spark.sparkContext.applicationId, sf_dir)
    df = _DEDUP_SILVER.get(key)
    if df is None:
        docs = load(spark, sf_dir, "documents")
        df = minhash_lsh_pairs(
            docs, n=3, threshold=0.5, portable=True,
            signatures=_portable_sigs(spark, sf_dir),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _DEDUP_SILVER[key] = df
    return df


def _jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared exact n-gram Jaccard pair list (n=3, threshold 0.8) — the
    ground-truth artifact: reported by ``dedup_ngram_jaccard`` and read
    again as the truth set by ``dedup_minhash_eval``."""
    from pyspark import StorageLevel

    key = ("jaccard_pairs", spark.sparkContext.applicationId, sf_dir)
    df = _DEDUP_SILVER.get(key)
    if df is None:
        docs = load(spark, sf_dir, "documents")
        df = ngram_jaccard_pairs(
            docs, n=3, threshold=0.8, shingled=_shingled_docs(spark, sf_dir)
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _DEDUP_SILVER[key] = df
    return df


def _cc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared (doc_id, cluster_id) map: connected components over the
    shared pair list. Iterative label propagation re-runs from scratch
    per caller otherwise — the cluster map is the single most expensive
    dedup artifact, and every report downstream of clustering reads it."""
    from pyspark import StorageLevel

    from securities_pricing_data_pipeline_spark.llmdata.dedup import (
        connected_components_auto,
    )

    key = ("cc", spark.sparkContext.applicationId, sf_dir)
    df = _DEDUP_SILVER.get(key)
    if df is None:
        docs = load(spark, sf_dir, "documents")
        df = connected_components_auto(
            _lsh_pairs(spark, sf_dir), docs.select("doc_id"), id_col="doc_id"
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _DEDUP_SILVER[key] = df
    return df


def _bm25_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared (doc, term, tf) postings silver — the artifact a sparse
    retrieval stack writes once and every scorer reads. BM25 retrieval
    and PRF expansion (two stages of the same loop) previously EACH
    tokenized and localCheckpointed the corpus aggregate per call
    (ADVICE r9 #1); now the pin happens once per (session, corpus)."""
    from securities_pricing_data_pipeline_spark.llmdata.text import term_tf_postings

    key = ("postings", spark.sparkContext.applicationId, sf_dir)
    df = _DEDUP_SILVER.get(key)
    if df is None:
        df = term_tf_postings(load(spark, sf_dir, "documents"))
        _DEDUP_SILVER[key] = df
    return df


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return exact_dedup(docs, text_col="text", id_col="doc_id")


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _jaccard_pairs(spark, sf_dir)


def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset-duplicate pairs by max-containment ≥ 0.9 (llmdata.dedup.
    ngram_containment_pairs) — catches short-doc-quoted-in-long-doc
    duplication that the Jaccard report structurally misses; reuses the
    shared shingled silver, so the corpus tokenizes once per session."""
    from securities_pricing_data_pipeline_spark.llmdata.dedup import (
        ngram_containment_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    return ngram_containment_pairs(
        docs, n=3, threshold=0.9, shingled=_shingled_docs(spark, sf_dir)
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lsh_pairs(spark, sf_dir)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return simhash_near_dups(
        docs, max_hamming=3, portable=True, sigs=_simhash_sigs(spark, sf_dir)
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return embedding_near_dups(emb, threshold=0.4)


def _semantic_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared SemDeDup pair silver (same contract as _lsh_pairs): the
    clustered in-cluster prune is the expensive artifact, and both the
    pair report and the keep-list read it — build once per session."""
    from pyspark import StorageLevel

    key = ("sempairs", spark.sparkContext.applicationId, sf_dir)
    df = _DEDUP_SILVER.get(key)
    if df is None:
        emb = load(spark, sf_dir, "embeddings")
        df = semantic_dedup_pairs(emb, threshold=0.4).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        _DEDUP_SILVER[key] = df
    return df


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _semantic_pairs(spark, sf_dir)


def dedup_semantic_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup ending: semantic in-cluster pairs → connected components
    → one survivor (component-min id) per semantic-duplicate group.
    ``is_kept`` marks the rows a corpus-shrink pass would retain —
    singletons (no semantic dup) are their own component and always
    kept, matching the SemDeDup retention contract."""
    from securities_pricing_data_pipeline_spark.llmdata.dedup import (
        connected_components_auto,
    )

    emb = load(spark, sf_dir, "embeddings")
    pairs = _semantic_pairs(spark, sf_dir).select("id_a", "id_b")
    cc = connected_components_auto(pairs, emb.select("vec_id"), id_col="vec_id")
    return cc.select(
        "vec_id",
        F.col("cluster_id").alias("group_id"),
        (F.col("vec_id") == F.col("cluster_id")).alias("is_kept"),
    )


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return token_count(docs)


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return quality_score(docs)


def text_unigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return unigram_logppl(docs)


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return pii_scrub(docs)


def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return repetition_stats(docs)


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return fingerprint_md5(docs)


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return lang_id(docs)


def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for a 10-query broadcast side. The single-phase
    JVM broadcast plan is the right kernel HERE: with m=10 queries the
    HOF cosine pass is m·n ≈ 20k evals (sub-second), below the ~0.5s
    fixed cost (query collect + Python worker spin-up) of the two-phase
    numpy kernel — measured 0.6s vs 1.3s at sf0.1. The numpy kernel
    (bit-identical; brute_force_topk_np) takes over when the query side
    is large — see sim_knn_classify's 200-query eval (160.7s → 1.3s)."""
    return _bf_truth10_silver(spark, sf_dir)


def _bf_truth10_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared EXACT-truth frame (r15, guide §2.4): brute-force top-5
    cosine neighbors of the ten audit queries (vec_id < 10). ELEVEN
    query paths consume this identical frame — sim_bruteforce_topk
    itself, the seven recall audits (ivf / ivf_trained / sq8 /
    bin_hamming / nsw / hnsw / matryoshka's full-dim side), the RRF
    fusion's exact arm, the RBO agreement audit, and the nprobe sweep —
    and until r15 each recomputed the exact pass per call (r14 pinned it
    per QUERY, still one exact pass per caller). At 100 TB the exact
    corpus scan is the dominant cost of every audit; it now runs once
    per (session, sf), the same ground-truth-artifact policy as
    ``_jaccard_pairs``. Full output columns so every consumer's select
    stays unchanged."""
    key = ("bf_truth10", spark.sparkContext.applicationId, sf_dir)
    df = _DEDUP_SILVER.get(key)
    if df is None:
        from securities_pricing_data_pipeline_spark.llmdata.similarity import (
            brute_force_topk as _bf,
        )

        emb = load(spark, sf_dir, "embeddings")
        df = _bf(emb, emb.filter(F.col("vec_id") < 10), k=5).localCheckpoint(
            eager=True
        )
        _DEDUP_SILVER[key] = df
    return df


def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lsh_topk10_silver(spark, sf_dir)


def _ivf_topk10_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinned IVF retrieval over the ten audit queries (r15): the SAME
    (k=5, n_centroids=16, nprobe=4) retrieval is the sim_ivf_topk report
    AND the recall audit's approx side — one list build + scan per
    (session, sf), like the crossmodal/ivfpq retrieval silvers."""
    key = ("ivf_topk10", spark.sparkContext.applicationId, sf_dir)
    df = _DEDUP_SILVER.get(key)
    if df is None:
        emb = load(spark, sf_dir, "embeddings")
        df = ivf_topk(
            emb, emb.filter(F.col("vec_id") < 10), k=5, n_centroids=16, nprobe=4
        ).localCheckpoint(eager=True)
        _DEDUP_SILVER[key] = df
    return df


def _lsh_topk10_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinned LSH retrieval over the ten audit queries (r15): consumed
    identically by sim_lsh_topk, the RRF fusion's second arm, and the
    RBO agreement audit — one hyperplane-bucket scan per (session, sf)."""
    key = ("lsh_topk10", spark.sparkContext.applicationId, sf_dir)
    df = _DEDUP_SILVER.get(key)
    if df is None:
        emb = load(spark, sf_dir, "embeddings")
        df = lsh_topk(
            emb, emb.filter(F.col("vec_id") < 10), k=5
        ).localCheckpoint(eager=True)
        _DEDUP_SILVER[key] = df
    return df


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_topk10_silver(spark, sf_dir)


def sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 5-NN majority-vote classification over the labeled
    embedding corpus, reported as a confusion matrix (true_label,
    pred_label, n_vectors) — the standard embedding-quality eval (does
    nearest-neighbor structure recover the labels?) run before trusting a
    space for semantic dedup or retrieval. Majority vote over the 5 exact
    cosine neighbors; vote ties break to the smaller label id — both
    engines rank (votes DESC, label ASC) identically, and the underlying
    cosine ranks are already bit-equal on the shared integer grid (the
    sim_bruteforce_topk discipline).

    Plan (scale-safe, round-7 rewrite of the quadratic baseline): the
    eval side is a fixed deterministic 10% subset (``vec_id % 10 == 0``
    — the "small curated eval set" of a real embedding eval), broadcast
    against the corpus through ``brute_force_topk_np``: one BLAS-matmul
    float prefilter per corpus batch (lossless 1e-6 margin), exact JVM
    grid cosine on the ~m·k survivors only. Cost is one corpus scan per
    eval batch — linear in corpus size, never all-pairs — and the vote
    and confusion rollup are two bounded hash aggregates, |labels|²
    output rows. Replaces the 160.7s BroadcastNestedLoopJoin
    all-pairs + interpreted-HOF scorer flagged in round 6."""
    emb = load(spark, sf_dir, "embeddings")
    labels = emb.select("vec_id", "label")
    eval_q = emb.filter(F.col("vec_id") % 10 == 0)
    nn = brute_force_topk_np(emb, eval_q, k=5)
    votes = nn.join(
        F.broadcast(
            labels.select(
                F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel")
            )
        ),
        "neighbor_id",
    )
    cnt = votes.groupBy("query_id", "nlabel").agg(F.count("*").alias("v"))
    wv = Window.partitionBy("query_id").orderBy(F.desc("v"), F.asc("nlabel"))
    pred = (
        cnt.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("nlabel").alias("pred_label"))
    )
    return (
        pred.join(
            F.broadcast(labels.select(F.col("vec_id").alias("query_id"), "label")),
            "query_id",
        )
        .groupBy(F.col("label").alias("true_label"), "pred_label")
        .agg(F.count("*").alias("n_vectors"))
    )


def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 40-token windows every 20 tokens per document via the
    Spark 4 Python UDTF lateral join (see llmdata.text.chunk_documents)."""
    docs = load(spark, sf_dir, "documents")
    return chunk_documents(docs, width=40, stride=20)


def dedup_minhash_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-pipeline evaluation: score the MinHash-LSH candidate pairs
    against exact n-gram-Jaccard ground truth (threshold 0.8) — the
    precision/recall readout a curator checks before trusting an
    approximate dedup pass at corpus scale (where exact all-pairs is
    unaffordable; here the testdata is small enough to compute truth).
    Both pair sets come from the engine's own operators; the join is on
    the (id_a, id_b) canonical pair key. Counts are ints; the two ratios
    are single int÷int divisions — engine-stable."""
    cand = _lsh_pairs(spark, sf_dir).select("id_a", "id_b")
    truth = _jaccard_pairs(spark, sf_dir).select("id_a", "id_b")
    hit = cand.join(truth, ["id_a", "id_b"], "left_semi")
    n_cand = cand.agg(F.count("*").alias("n_candidates"))
    n_truth = truth.agg(F.count("*").alias("n_true_pairs"))
    n_hit = hit.agg(F.count("*").alias("n_hits"))
    return (
        n_cand.join(n_truth)
        .join(n_hit)
        .select(
            "n_candidates",
            "n_true_pairs",
            "n_hits",
            (F.col("n_hits").cast("double") / F.col("n_candidates")).alias("precision"),
            (F.col("n_hits").cast("double") / F.col("n_true_pairs")).alias("recall"),
        )
    )


def corpus_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix allocation: given fixed per-source weights and a total
    token budget, compute each source's requested allocation, what is
    actually available, the shortfall, and the sampling fraction a
    downstream deterministic-hash sampler should use. The arithmetic
    stays exact: token counts are integer sums, requested = floor of
    weight·budget in integer micro-units, and the published fraction is
    a single integer÷integer double division — so the plan is
    bit-identical across engines. One aggregate over documents, then
    arithmetic on a 3-row frame."""
    docs = load(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    per_source = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum(toks).alias("avail_tokens")
    )
    budget = 20_000  # total training tokens to draw
    weights = F.create_map(
        F.lit("src0"), F.lit(60), F.lit("src1"), F.lit(30), F.lit("src2"), F.lit(10)
    )
    w = F.coalesce(weights[F.col("source")], F.lit(0)).cast("long")
    requested = (F.lit(budget) * w / 100).cast("long")
    take = F.least(requested, F.col("avail_tokens"))
    return per_source.select(
        "source",
        "n_docs",
        "avail_tokens",
        w.cast("int").alias("weight_pct"),
        requested.alias("requested_tokens"),
        take.alias("planned_tokens"),
        (requested - take).alias("shortfall_tokens"),
        (take.cast("double") / F.col("avail_tokens")).alias("sample_fraction"),
    ).orderBy("source")


def sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval lists (exact brute-force
    cosine top-5 and hyperplane-LSH top-5): the standard way to merge
    rankings from heterogeneous retrievers. Scores are Σ 1/(60+rank)
    folded on an integer grid (round(1e12/(60+r)) as BIGINT) — rank is a
    small int, so both engines compute the identical correctly-rounded
    quotient and the sum is exact; the fused ordering can never diverge.
    Plan: both retrievers share the embeddings scan; fusion itself is one
    (query, neighbor) aggregate plus a per-query rank window. The result
    (n_queries×5 rows) is pinned as a per-session silver — the rerank
    (``sim_rerank_blend``) and diversification (``sim_mmr_diversify``)
    stages consume the SAME fused candidates, so the two-retriever
    pipeline runs once per session, not once per serving stage (the
    ``_DEDUP_SILVER`` discipline)."""
    key = ("fused", spark.sparkContext.applicationId, sf_dir)
    cached = _DEDUP_SILVER.get(key)
    if cached is not None:
        return cached
    bf = _bf_truth10_silver(spark, sf_dir).select("query_id", "neighbor_id", "rank")
    ls = _lsh_topk10_silver(spark, sf_dir).select("query_id", "neighbor_id", "rank")
    u = bf.unionByName(ls)
    units = F.round(F.lit(1e12) / (F.lit(60.0) + F.col("rank"))).cast("long")
    scored = u.groupBy("query_id", "neighbor_id").agg(
        F.sum(units).alias("rrf_units"),
        F.count("*").cast("int").alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_units"), "neighbor_id")
    out = (
        scored.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            (F.col("rrf_units").cast("double") / F.lit(1e12)).alias("rrf_score"),
            "n_lists",
            F.col("fused_rank").cast("int").alias("fused_rank"),
        )
        .localCheckpoint(eager=True)  # candidate-set-sized pin
    )
    _DEDUP_SILVER[key] = out
    return out


def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization compression pass over the embeddings table
    (see llmdata.similarity.pq_codes): 20-dim float vectors → 4 codeword
    ids + the exact grid-unit quantization error."""
    emb = load(spark, sf_dir, "embeddings")
    return pq_codes(emb, dim=20, n_sub=4, n_codes=16)


def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-5 (see llmdata.similarity.pq_adc_topk):
    every 50th vector is a query; each precomputes a 4x16 codeword
    distance table and the corpus is scored from its PQ codes alone —
    the compressed-index scan that makes billion-vector retrieval
    feasible (codes are n_sub bytes/vector; raw floats never shuffle)."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return pq_adc_topk(emb, queries, dim=20, n_sub=4, n_codes=16, k=5)


def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return token_count_bpe(docs)


def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return winnow_fingerprints(docs, k=8, w=4)


def text_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling: exact length quartiles + mean per source — the
    distribution snapshot a data curator reads before setting quality
    cutoffs. Exact percentile is a sort-based aggregate (Catalyst sorts
    within each group); at 100 TB swap to approx_percentile with a
    documented error budget — kept exact here for DuckDB value parity
    (quantile_cont uses the same linear interpolation)."""
    docs = load(spark, sf_dir, "documents")
    q = F.percentile(F.col("n_chars").cast("double"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            q[0].alias("p25_chars"),
            q[1].alias("median_chars"),
            q[2].alias("p75_chars"),
            F.avg(F.col("n_chars").cast("double")).alias("mean_chars"),
        )
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return extract_features(assets_from_documents(docs))


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return frame_digests(sample_frames(assets_from_documents(docs), n_frames=4))


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    resized = resize_images(assets_from_documents(docs), width=64, height=64)
    return resized.select(
        "asset_id",
        F.octet_length(F.col("content")).cast("int").alias("n_bytes"),
        F.md5(F.hex(F.col("content"))).alias("digest"),
        F.col("meta")["resized"].alias("resized"),
    )


def multimodal_resize_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL image path: synthesize a valid P6 PPM per document
    (flat color + geometry derived from doc_id, pixel bytes kept in the
    single-byte UTF-8 range so both engines can build the payload with
    chr/repeat), run the genuine decode → nearest-neighbor resample →
    re-encode pipeline, and value-check the OUTPUT pixels byte-for-byte:
    the oracle constructs the expected 16×16 P6 payload arithmetically
    and compares octet length + md5-of-hex. This certifies the codec and
    resampler themselves, not just the plumbing around them."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    w = (F.lit(8) + F.col("doc_id") % 16).cast("int")
    h = (F.lit(8) + F.col("doc_id") % 11).cast("int")
    r = (F.lit(32) + F.col("doc_id") % 96).cast("int")
    g = (F.lit(32) + (F.col("doc_id") * 7) % 96).cast("int")
    bl = (F.lit(32) + (F.col("doc_id") * 13) % 96).cast("int")
    header = F.format_string("P6\n%d %d\n255\n", w, h)
    body = F.repeat(F.concat(F.char(r), F.char(g), F.char(bl)), w * h)
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.concat(header, body), "UTF-8").alias("content"),
        F.create_map(F.lit("synth"), F.lit("flat")).alias("meta"),
    )
    resized = resize_images(assets, width=16, height=16)
    return resized.select(
        "asset_id",
        F.octet_length(F.col("content")).cast("int").alias("n_bytes"),
        F.md5(F.hex(F.col("content"))).alias("digest"),
        F.col("meta")["codec"].alias("codec"),
    )


def multimodal_png_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end PNG path, byte-exact: per document, build a flat-color
    PNG (same doc_id-derived geometry/color as multimodal_resize_pixels,
    but compressed through the real zlib container with CRCs), run the
    genuine PNG decode → nearest-neighbor resample → P6 re-encode
    pipeline, and value-check the OUTPUT pixels byte-for-byte — the
    oracle constructs the expected 16×16 P6 payload arithmetically. PNG
    is lossless, so unlike the JPEG cycle this certifies exact pixel
    recovery through DEFLATE + scanline filters, not just an error
    bound. Payload synthesis and decode both run inside Arrow-batched
    mapInPandas — no shuffle until the final projection."""
    import pandas as pd

    from pyspark.sql import types as T

    docs = load(spark, sf_dir, "documents").select("doc_id")

    def _mk(batches):
        import numpy as np

        from securities_pricing_data_pipeline_spark.llmdata.png import encode_png

        for pdf in batches:
            rows = {"asset_id": [], "media_type": [], "content": [], "meta": []}
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 + did % 16, 8 + did % 11
                r, g, b = (
                    32 + did % 96,
                    32 + (did * 7) % 96,
                    32 + (did * 13) % 96,
                )
                px = np.tile(
                    np.array([r, g, b], dtype=np.uint8)[None, None, :], (h, w, 1)
                )
                rows["asset_id"].append(did)
                rows["media_type"].append("image")
                rows["content"].append(encode_png(px))
                rows["meta"].append({"synth": "flat-png"})
            yield pd.DataFrame(rows)

    asset_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
        ]
    )
    assets = docs.mapInPandas(_mk, asset_schema)
    resized = resize_images(assets, width=16, height=16)
    return resized.select(
        "asset_id",
        F.octet_length(F.col("content")).cast("int").alias("n_bytes"),
        F.md5(F.hex(F.col("content"))).alias("digest"),
        F.col("meta")["codec"].alias("codec"),
    )


def multimodal_gif_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end GIF path, byte-exact: per document, build a 4-color
    diagonal-stripe GIF87a (geometry, palette, and pattern pure functions
    of doc_id) through the real LZW encoder, run the genuine GIF decode →
    nearest-neighbor resample → P6 re-encode pipeline, and value-check
    the OUTPUT pixels byte-for-byte — the oracle reconstructs the
    expected 16×16 P6 payload arithmetically (source pixel (j·h div 16,
    i·w div 16), stripe k = (sx+sy+did) mod 4, ASCII-range palette).
    GIF is lossless, so this certifies exact pixel recovery through
    variable-width LZW dictionary coding — the third compression class
    in the codec family after DEFLATE (PNG) and DCT+Huffman (JPEG).
    Synthesis and decode both run inside Arrow-batched mapInPandas; no
    shuffle until the final projection."""
    import pandas as pd

    from pyspark.sql import types as T

    docs = load(spark, sf_dir, "documents").select("doc_id")

    def _mk(batches):
        import numpy as np

        from securities_pricing_data_pipeline_spark.llmdata.gif import encode_gif

        for pdf in batches:
            rows = {"asset_id": [], "media_type": [], "content": [], "meta": []}
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 5 + did % 9, 4 + did % 7
                palette = [
                    (
                        32 + (did * (k + 1)) % 96,
                        32 + (did * (k + 3)) % 96,
                        32 + (did * (k + 7)) % 96,
                    )
                    for k in range(4)
                ]
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                idx = ((x + y + did) % 4).astype(np.uint8)
                rows["asset_id"].append(did)
                rows["media_type"].append("image")
                rows["content"].append(encode_gif(idx, palette))
                rows["meta"].append({"synth": "stripe-gif"})
            yield pd.DataFrame(rows)

    asset_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
        ]
    )
    assets = docs.mapInPandas(_mk, asset_schema)
    resized = resize_images(assets, width=16, height=16)
    return resized.select(
        "asset_id",
        F.octet_length(F.col("content")).cast("int").alias("n_bytes"),
        F.md5(F.hex(F.col("content"))).alias("digest"),
        F.col("meta")["codec"].alias("codec"),
    )


def audio_pcm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end audio path: per document, synthesize a deterministic
    PCM-16 mono WAV (sample i = ((doc_id·13 + i·7919) mod 65536) −
    32768, length 500 + doc_id mod 250 at 8 kHz), encode through the
    real RIFF writer, decode through the real RIFF parser, and fold the
    integer-exact features (llmdata.audio.audio_features): sample count,
    Σ sample² (int64-exact RMS numerator), and zero-crossing count. The
    oracle regenerates the identical sample stream with generate_series
    and recomputes all three aggregates arithmetically — certifying the
    codec roundtrip AND the feature fold, value-for-value. Everything
    runs inside Arrow-batched mapInPandas; no shuffle until the final
    narrow projection."""
    import pandas as pd

    from pyspark.sql import types as T

    from securities_pricing_data_pipeline_spark.llmdata.audio import (
        audio_features,
        encode_wav,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")

    def _mk(batches):
        import numpy as np

        for pdf in batches:
            rows = {"asset_id": [], "media_type": [], "content": [], "meta": []}
            for did in pdf["doc_id"]:
                did = int(did)
                n = 500 + did % 250
                i = np.arange(n, dtype=np.int64)
                s = ((did * 13 + i * 7919) % 65536 - 32768).astype(np.int16)
                rows["asset_id"].append(did)
                rows["media_type"].append("audio")
                rows["content"].append(encode_wav(s, sample_rate=8000))
                rows["meta"].append({"synth": "pcm16"})
            yield pd.DataFrame(rows)

    asset_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
        ]
    )
    assets = docs.mapInPandas(_mk, asset_schema)
    return audio_features(assets)


def video_mjpeg_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL video path: per selected document, render 4
    flat-color frames (colors pure functions of doc_id and frame index),
    JPEG-encode each at quality 100, pack them into a genuine MJPEG AVI
    container, then run the full extraction pipeline — RIFF walk →
    ``00dc`` frame chunks → baseline-JPEG decode → integer pixel-sum —
    inside one shuffle-free mapInPandas. ``in_bound`` asserts the
    decoded frame's exact pixel sum sits within the quality-100 error
    envelope of the source color (±4/channel); the oracle enumerates the
    expected (asset, frame) grid with geometry and expects every flag
    true, so a container-parse or frame-decode fault breaks the value
    hash. This replaces the byte-slice frame stand-in with a real
    container + real codec for the video modality."""
    import pandas as pd

    from pyspark.sql import types as T

    from securities_pricing_data_pipeline_spark.llmdata.jpeg import encode_jpeg
    from securities_pricing_data_pipeline_spark.llmdata.video import (
        decode_video_frames,
        encode_avi_mjpeg,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 10 == 0
    )

    def _mk(batches):
        import numpy as np

        for pdf in batches:
            rows = {"asset_id": [], "media_type": [], "content": [], "meta": []}
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 + did % 9, 8 + did % 7
                frames = []
                for idx in range(4):
                    rgb = [
                        16 + (did * 5 + idx * 29) % 224,
                        16 + (did * 11 + idx * 53) % 224,
                        16 + (did * 17 + idx * 71) % 224,
                    ]
                    px = np.tile(
                        np.array(rgb, dtype=np.uint8)[None, None, :], (h, w, 1)
                    )
                    frames.append(encode_jpeg(px, quality=100))
                rows["asset_id"].append(did)
                rows["media_type"].append("video")
                rows["content"].append(encode_avi_mjpeg(frames, w, h))
                rows["meta"].append({"synth": "mjpeg"})
            yield pd.DataFrame(rows)

    asset_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
        ]
    )
    assets = docs.mapInPandas(_mk, asset_schema)
    decoded = decode_video_frames(assets, n_frames=4)
    w = F.lit(8) + F.col("asset_id") % 9
    h = F.lit(8) + F.col("asset_id") % 7
    expected_sum = (
        w * h * (
            (F.lit(16) + (F.col("asset_id") * 5 + F.col("frame_idx") * 29) % 224)
            + (F.lit(16) + (F.col("asset_id") * 11 + F.col("frame_idx") * 53) % 224)
            + (F.lit(16) + (F.col("asset_id") * 17 + F.col("frame_idx") * 71) % 224)
        )
    )
    return decoded.select(
        "asset_id",
        "frame_idx",
        "width",
        "height",
        (
            (F.col("status") == "ok")
            & (F.abs(F.col("mean_units") - expected_sum) <= w * h * 3 * 4)
        ).alias("in_bound"),
    )


def asof_event_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event is aligned to the most recent bar of its
    symbol at-or-before a deterministic in-range event date."""
    ev = load(spark, sf_dir, "events")
    micros = F.expr("ts div 1000")
    offset = (F.dayofmonth(F.timestamp_micros(micros)) * 73 + F.col("user_id") * 7) % 2400
    left = ev.select(
        "event_id",
        F.concat(F.lit("P"), (F.col("user_id") % 200).cast("string")).alias("symbol"),
        F.date_add(F.lit("1995-01-01").cast("date"), offset.cast("int")).alias("event_date"),
    )
    b = bars_silver(spark, sf_dir).select("symbol", "trade_date", F.col("close").cast("double").alias("close"))
    joined = asof_join_backward(
        left, b, key=["symbol"], left_time="event_date", right_time="trade_date",
        value_cols=["close"],
    )
    return joined.filter(F.col("asof_time").isNotNull()).select(
        "event_id", "symbol", "event_date", F.col("asof_time").alias("bar_date"), "close"
    )


def _asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared left side for the as-of family: events mapped onto a
    deterministic in-range (symbol, event_date)."""
    ev = load(spark, sf_dir, "events")
    micros = F.expr("ts div 1000")
    offset = (F.dayofmonth(F.timestamp_micros(micros)) * 73 + F.col("user_id") * 7) % 2400
    return ev.select(
        "event_id",
        F.concat(F.lit("P"), (F.col("user_id") % 200).cast("string")).alias("symbol"),
        F.date_add(F.lit("1995-01-01").cast("date"), offset.cast("int")).alias("event_date"),
    )


def asof_event_bars_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each event aligned to the NEXT bar of its symbol
    at-or-after the event date (fill-forward's mirror, used for
    next-quote execution semantics)."""
    from securities_pricing_data_pipeline_spark.operators.asof import asof_join_forward

    left = _asof_events(spark, sf_dir)
    b = bars_silver(spark, sf_dir).select(
        "symbol", "trade_date", F.col("close").cast("double").alias("close")
    )
    joined = asof_join_forward(
        left, b, key=["symbol"], left_time="event_date", right_time="trade_date",
        value_cols=["close"],
    )
    return joined.filter(F.col("asof_time").isNotNull()).select(
        "event_id", "symbol", "event_date", F.col("asof_time").alias("bar_date"), "close"
    )


def asof_event_bars_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a 7-day staleness bound: stale matches null out
    but the event row survives (merge_asof tolerance semantics)."""
    from securities_pricing_data_pipeline_spark.operators.asof import (
        asof_join_backward_tolerance,
    )

    left = _asof_events(spark, sf_dir)
    b = bars_silver(spark, sf_dir).select(
        "symbol", "trade_date", F.col("close").cast("double").alias("close")
    )
    joined = asof_join_backward_tolerance(
        left, b, key=["symbol"], left_time="event_date", right_time="trade_date",
        value_cols=["close"], tolerance_days=7,
    )
    return joined.select(
        "event_id", "symbol", "event_date",
        F.col("asof_time").alias("bar_date"), "close",
    )


def asof_bucketed_quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of on the events table's native epoch-nanos axis,
    served by the TIME-BUCKETED plan (operators.asof.
    asof_join_backward_bucketed) — the hot-key skew escape hatch the
    round-6 verdict asked to prove out. Events split deterministically
    into a quote side (event_id % 4 == 0, price derived from user_id,
    deduped to one quote per (symbol, instant)) and an event side; each
    event takes the latest quote at-or-before its timestamp. The oracle
    is DuckDB's native ASOF JOIN, so this certifies both the carry
    semantics and the bucket-boundary carry-in path against an
    independent as-of implementation. 32 time buckets × 50 symbols at
    sf0.01 guarantees plenty of cross-bucket carries."""
    from securities_pricing_data_pipeline_spark.operators.asof import (
        asof_join_backward_bucketed,
    )

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.concat(F.lit("U"), (F.col("user_id") % 50).cast("string")).alias("symbol"),
        "ts",
        "user_id",
    )
    quotes = (
        ev.filter(F.col("event_id") % 4 == 0)
        .groupBy("symbol", "ts")
        .agg(F.max((F.col("user_id") * 31) % 1000).alias("price"))
    )
    left = ev.filter(F.col("event_id") % 4 != 0).select("event_id", "symbol", "ts")
    j = asof_join_backward_bucketed(
        left, quotes, ["symbol"], "ts", "ts", ["price"], n_buckets=32
    )
    return j.filter(F.col("asof_time").isNotNull()).select(
        "event_id", "symbol", "ts", F.col("asof_time").alias("quote_ts"), "price"
    )


def multimodal_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end JPEG certification: per selected document, synthesize a
    deterministic gradient image (dims and pixels pure functions of
    doc_id), run the full pure-numpy baseline JPEG pipeline — RGB→YCbCr →
    DCT → quantize (quality 100) → Huffman encode → parse → Huffman
    decode → IDCT → RGB — and assert the roundtrip bound: decoded dims
    equal source dims and max |pixel error| ≤ 4 (the quality-100 loss is
    only YCbCr round-off + DCT float noise). The oracle recomputes the
    expected dims arithmetically and expects roundtrip_ok for every
    asset, so ANY asset violating the codec bound breaks the value hash.
    Runs on the deterministic 10% doc subset; the work is an Arrow-batched
    mapInPandas with no shuffle at all — embarrassingly parallel, the
    right shape for a 100 TB media-validation sweep."""
    import pandas as pd

    from pyspark.sql import types as T

    docs = load(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 10 == 0
    )
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("width", T.LongType(), False),
            T.StructField("height", T.LongType(), False),
            T.StructField("roundtrip_ok", T.BooleanType(), False),
        ]
    )

    def _cycle(batches):
        import numpy as np

        from securities_pricing_data_pipeline_spark.llmdata.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        for pdf in batches:
            out = {"asset_id": [], "width": [], "height": [], "roundtrip_ok": []}
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 + did % 9, 8 + did % 7
                j, i, c = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(3), indexing="ij"
                )
                px = ((did * 7 + j * 16 + i * 3 + c * 5) % 256).astype(np.uint8)
                try:
                    dec = decode_jpeg(encode_jpeg(px, quality=100))
                    ok = bool(
                        dec.shape == (h, w, 3)
                        and int(np.abs(dec.astype(int) - px.astype(int)).max()) <= 4
                    )
                except (ValueError, NotImplementedError):
                    ok = False
                out["asset_id"].append(did)
                out["width"].append(w)
                out["height"].append(h)
                out["roundtrip_ok"].append(ok)
            yield pd.DataFrame(out)

    return docs.mapInPandas(_cycle, schema)


def asof_pairs_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs-trading spread via bars→bars as-of alignment: two sparse
    price series per pair (P3/P7, P11/P19) rarely print on the same
    calendar day, so leg B is aligned to each leg-A bar with a backward
    as-of join — the same ``operators.asof`` union-and-window operator the
    event family uses, here proving series-to-series generality. The
    oracle runs DuckDB's NATIVE ``ASOF LEFT JOIN``, pinning our
    formulation to an independent reference implementation of the
    semantics (backward, inclusive, unmatched-left preserved).

    Spread arithmetic stays on the decimal(18,4) grid (exact subtraction)
    and casts to double only on output. One shuffle on pair_id + a
    per-pair sort — no range-condition cross product."""
    from securities_pricing_data_pipeline_spark.operators.asof import asof_join_backward

    b = bars_df(spark, sf_dir, partkeys=[3, 7, 11, 19]).select(
        "symbol", "trade_date", "close"
    )
    pair_a = F.when(F.col("symbol") == "P3", 3).when(F.col("symbol") == "P11", 11)
    pair_b = F.when(F.col("symbol") == "P7", 3).when(F.col("symbol") == "P19", 11)
    leg_a = b.filter(F.col("symbol").isin("P3", "P11")).select(
        pair_a.alias("pair_id"), "trade_date", F.col("close").alias("close_a")
    )
    leg_b = b.filter(F.col("symbol").isin("P7", "P19")).select(
        pair_b.alias("pair_id"), "trade_date", F.col("close").alias("close_b")
    )
    joined = asof_join_backward(
        leg_a, leg_b, key=["pair_id"], left_time="trade_date",
        right_time="trade_date", value_cols=["close_b"],
    )
    return joined.select(
        "pair_id",
        "trade_date",
        F.col("close_a").cast("double").alias("close_a"),
        F.col("close_b").cast("double").alias("close_b"),
        F.col("asof_time").alias("b_date"),
        (F.col("close_a") - F.col("close_b")).cast("double").alias("spread"),
    )


def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dup pipeline ending: MinHash-LSH pairs → connected
    components → one canonical doc (the cluster-min id) per cluster.
    This is the step that actually shrinks a corpus: keep rows where
    ``is_canonical``."""
    cc = _cc_clusters(spark, sf_dir)
    return cc.select(
        "doc_id", "cluster_id", (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical")
    )


def dedup_cluster_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same pipeline as ``dedup_cluster_canonical`` but clustered with the
    large-star/small-star CC variant — O(log²) rounds regardless of
    component diameter, so the end-to-end near-dup job stays bounded even
    on adversarial chain-shaped duplicate graphs. Shares the canonical
    oracle: both CC implementations must reach the identical fixpoint."""
    from securities_pricing_data_pipeline_spark.llmdata.dedup import (
        connected_components_star,
    )

    docs = load(spark, sf_dir, "documents")
    cc = connected_components_star(
        _lsh_pairs(spark, sf_dir), docs.select("doc_id"), id_col="doc_id"
    )
    return cc.select(
        "doc_id", "cluster_id", (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical")
    )


#: audit cap — deliberately far below the production default (2000) so the
#: audit demonstrates what a cap trip looks like on real bucket-size skew.
_AUDIT_MAX_BUCKET = 16


def dedup_lsh_bucket_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Makes the LSH skew guard visible in RESULTS, not just logs
    (VERDICT r3 item 8): one row summarizing the MinHash band-bucket
    size distribution — how many multi-member buckets exist, the largest,
    how many the audit's deliberately-small ``max_bucket`` cap would
    drop, and how many candidate pairs survive. This is the audit a 100 TB dedup run checks
    BEFORE paying for pair enumeration: n_dropped_buckets > 0 means
    degenerate band hashes (boilerplate shingles, near-constant docs)
    that would each have materialized k(k-1)/2 pairs in one task.

    Buckets are keyed by the raw band signature slice (not its xxhash64
    compression) so the grouping is engine-portable and the DuckDB oracle
    reproduces it exactly.
    """
    sig = _portable_sigs(spark, sf_dir)
    bands, rpb = 16, 4
    band_cols = [
        F.struct(
            F.lit(i).alias("band"),
            F.concat_ws(
                ",",
                *[F.col("signature")[i * rpb + j].cast("string") for j in range(rpb)],
            ).alias("key"),
        )
        for i in range(bands)
    ]
    sizes = (
        sig.select(F.explode(F.array(*band_cols)).alias("bb"))
        .groupBy(F.col("bb.band").alias("band"), F.col("bb.key").alias("key"))
        .agg(F.count("*").alias("k"))
        .filter(F.col("k") > 1)
    )
    cap = _AUDIT_MAX_BUCKET
    return sizes.agg(
        F.count("*").alias("n_buckets_multi"),
        F.max("k").cast("int").alias("max_bucket_size"),
        F.coalesce(F.sum((F.col("k") > cap).cast("long")), F.lit(0)).alias(
            "n_dropped_buckets"
        ),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("k") <= cap, (F.col("k") * (F.col("k") - 1) / 2).cast("long")
                ).otherwise(F.lit(0))
            ),
            F.lit(0),
        ).alias("n_candidate_pairs"),
    )


def sim_ivf_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index-quality audit: recall@k of the IVF index against exact
    brute-force ground truth on the same query set — the number a
    retrieval pipeline checks before trusting an approximate index at
    corpus scale (where brute force is unaffordable; here the testdata
    is small enough to compute truth). One row: query count, k, hits,
    recall@k. Counts are ints; the ratio is one int÷int division —
    engine-stable."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    truth = _bf_truth10_silver(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )  # shared session truth silver (r15): one exact pass per session
    approx = _ivf_topk10_silver(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )  # shared with sim_ivf_topk (r15): one list build + scan per session
    hits = approx.join(truth, ["query_id", "neighbor_id"], "left_semi")
    t = truth.agg(
        F.count_distinct("query_id").alias("n_queries"), F.count("*").alias("n_true")
    )
    h = hits.agg(F.count("*").alias("n_hits"))
    return t.crossJoin(h).select(
        "n_queries",
        F.lit(5).alias("k"),
        "n_hits",
        (F.col("n_hits").cast("double") / F.col("n_true")).alias("recall_at_k"),
    )


def sim_pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization-quality audit for the PQ index: recall@5 of the ADC
    compressed scan (sim_pq_adc_topk) against EXACT squared-L2 ground
    truth on the same query set — the number that decides n_sub/n_codes
    before trusting a PQ index at corpus scale. Ground truth uses the
    same 1e-13 integer grid per element, so both rankings are exact-long
    comparisons and the hit count is engine-stable. The truth side is a
    broadcast small-query-side HOF pass (the JVM plan wins at this m —
    see sim_bruteforce_topk's crossover note); the ADC side never touches
    raw floats."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import _SCALE

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    d = F.zip_with(
        F.col("qv"),
        F.col("cv"),
        lambda x, y: F.round((x - y) * (x - y) * F.lit(_SCALE)).cast("long"),
    )
    dist = F.aggregate(d, F.lit(0).cast("long"), lambda acc, p: acc + p)
    w = Window.partitionBy("query_id").orderBy("dist_units", "neighbor_id")
    truth = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", dist.alias("dist_units"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)  # two consumers: one exact-L2 pass (r14)
    )
    approx = pq_adc_topk(emb, emb.filter(F.col("vec_id") % 50 == 0), k=5).select(
        "query_id", "neighbor_id"
    )
    hits = approx.join(truth, ["query_id", "neighbor_id"], "left_semi")
    t = truth.agg(
        F.count_distinct("query_id").alias("n_queries"), F.count("*").alias("n_true")
    )
    h = hits.agg(F.count("*").alias("n_hits"))
    return t.crossJoin(h).select(
        "n_queries",
        F.lit(5).alias("k"),
        "n_hits",
        (F.col("n_hits").cast("double") / F.col("n_true")).alias("recall_at_k"),
    )


def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Increment-vs-corpus near-dup detection (see
    llmdata.dedup.minhash_lsh_pairs_cross): a deterministic 20% hash
    slice of the documents plays the 'new batch', the remaining 80% the
    standing corpus index; output is the new docs' near-dup matches into
    the corpus — the rows a crawl pipeline drops before appending."""
    from securities_pricing_data_pipeline_spark.llmdata.dedup import (
        minhash_lsh_pairs_cross,
        portable_hash60,
    )

    sig = _portable_sigs(spark, sf_dir)
    is_new = (
        portable_hash60(F.concat(F.lit("inc:"), F.col("id").cast("string"))) % 5 == 0
    )
    return minhash_lsh_pairs_cross(
        sig.filter(is_new), sig.filter(~is_new), threshold=0.5
    )


def dedup_cluster_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-shrink readout: the distribution of near-dup cluster sizes
    (1 = unique doc) plus how many docs each size bucket removes
    (size − 1 non-canonical copies per cluster). The first number a
    curator checks after a dedup pass: total removable docs = Σ
    n_docs_removed."""
    cc = dedup_cluster_canonical(spark, sf_dir)
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters"),
        (F.count("*") * (F.col("cluster_size") - 1)).cast("long").alias("n_docs_removed"),
    )


def dedup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: near-dup pair counts by the
    (source, source) of their endpoints, unordered (source_a ≤ source_b).
    At corpus scale this is the report that shows WHICH feeds duplicate
    each other (e.g. a crawl re-ingesting a curated set); the doc→source
    dim broadcasts onto the id-only pair list."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    pairs = _lsh_pairs(spark, sf_dir).select("id_a", "id_b")
    sa = docs.select(F.col("doc_id").alias("id_a"), F.col("source").alias("src_a"))
    sb = docs.select(F.col("doc_id").alias("id_b"), F.col("source").alias("src_b"))
    tagged = pairs.join(F.broadcast(sa), "id_a").join(F.broadcast(sb), "id_b")
    return (
        tagged.select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_pairs"))
    )


def text_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style cross-document segment duplication stats (see
    llmdata.text.segment_dedup_stats): 10-token non-overlapping segments,
    per-doc duplicated fraction."""
    from securities_pricing_data_pipeline_spark.llmdata.text import segment_dedup_stats

    docs = load(spark, sf_dir, "documents")
    return segment_dedup_stats(docs, width=10)


def export_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle + shard assignment for training
    export (see llmdata.sampling.shard_plan): 8 shards, hash-derived
    within-shard order, no global sort anywhere."""
    from securities_pricing_data_pipeline_spark.llmdata.sampling import shard_plan

    docs = load(spark, sf_dir, "documents")
    return shard_plan(docs, n_shards=8)


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return normalize_text(docs)


def sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return split_assign(docs).groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


def sample_weighted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted-without-replacement sample of 200 documents,
    weight = n_chars (llmdata.sampling.weighted_sample — the
    corpus-mixing / temperature-sampling primitive)."""
    from securities_pricing_data_pipeline_spark.llmdata.sampling import weighted_sample

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "lang", "n_chars")
    return weighted_sample(docs, k=200, weight_col="n_chars")


def sketch_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch ALGEBRA: estimate the customer overlap between the 1996
    and 1997 order cohorts by inclusion-exclusion over mergeable register
    tables — est(A∩B) = est(A) + est(B) − est(A∪B), where the union
    estimate comes from a bucket-wise MAX of the two register sets (no
    raw re-scan; the defining property of the portable HLL in
    llmdata.sketch). The exact intersection (distinct-set semi-join) is
    emitted alongside so the estimator error is part of the checked
    result. Every register is integer-exact, so both engines produce the
    identical estimate bit-for-bit."""
    from securities_pricing_data_pipeline_spark.llmdata.sketch import (
        hll_grouped_registers,
        hll_merge_estimate,
    )

    o = load(spark, sf_dir, "orders")
    yr = F.year(F.col("o_orderdate").cast("date"))
    seg = o.filter(yr.isin(1996, 1997)).select(yr.alias("yr"), "o_custkey")
    # registers are <= 2*256 rows: checkpoint once so the per-year fold,
    # the union fold, and nothing else re-scans orders
    regs = hll_grouped_registers(seg, F.col("o_custkey"), ["yr"]).localCheckpoint(
        eager=True
    )
    per = hll_merge_estimate(regs, ["yr"])
    wide = per.agg(
        F.max(F.when(F.col("yr") == 1996, F.col("hll_estimate"))).alias("est_1996"),
        F.max(F.when(F.col("yr") == 1997, F.col("hll_estimate"))).alias("est_1997"),
    )
    uni = hll_merge_estimate(regs, []).select(F.col("hll_estimate").alias("est_union"))
    c96 = seg.filter(F.col("yr") == 1996).select("o_custkey").distinct()
    c97 = seg.filter(F.col("yr") == 1997).select("o_custkey").distinct()
    exact = c96.join(c97, "o_custkey", "left_semi").agg(
        F.count("*").alias("exact_intersection")
    )
    return (
        wide.crossJoin(uni)
        .crossJoin(exact)
        .select(
            "est_1996",
            "est_1997",
            "est_union",
            (F.col("est_1996") + F.col("est_1997") - F.col("est_union")).alias(
                "est_intersection"
            ),
            "exact_intersection",
        )
    )


def corpus_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-skew / corpus-drift monitor: per-(source, lang) smoothed
    shares in the train vs holdout hash split and the forward-KL
    contribution of each cell (llmdata.sampling.distribution_drift)."""
    from securities_pricing_data_pipeline_spark.llmdata.sampling import (
        distribution_drift,
    )

    docs = load(spark, sf_dir, "documents")
    return distribution_drift(docs, ["source", "lang"])


def text_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return pack_greedy(docs, budget_tokens=4096)


def text_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return sentiment_score(docs)


def strings_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return fuzzy_name_match(part, "p_name", max_distance=2)


def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding norm statistics via higher-order array
    expressions (``zip_with`` + ``aggregate`` fold — JVM-side, no UDF):
    self-dot on the shared 1e13 integer grid, summed exactly per label.
    The shape every vector-quality gate takes before indexing a corpus."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import norm_grid

    emb = load(spark, sf_dir, "embeddings")
    sq = norm_grid(F.col("embedding"))  # exact grid units as double
    return (
        emb.groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum(sq.cast("long")).alias("sum_sq_grid"),
            F.max(sq.cast("long")).alias("max_sq_grid"),
        )
        .select(
            "label",
            "n_vectors",
            "sum_sq_grid",
            "max_sq_grid",
            (F.col("sum_sq_grid").cast("double") / F.col("n_vectors")).alias("avg_sq_norm_grid"),
        )
    )


def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids, one row per (label, dimension) —
    the class-prototype readout every embedding-space monitor (drift,
    SemDeDup anchor audit, classifier sanity) starts from. Per-element
    values snap to the 1e7 integer grid (round() is away-from-zero in
    both engines), the per-(label, dim) sum is an exact int64, and the
    mean is the exact integer milli-quotient — no float accumulation
    anywhere. Plan: posexplode to (label, dim, unit) rows — dim×|emb|
    long rows, but the groupBy collapses them map-side, so the shuffle
    carries |labels|×dim partial sums."""
    emb = load(spark, sf_dir, "embeddings")
    d = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.round(F.col("v").cast("double") * 10000000).cast("long").alias("g"),
    )
    agg = d.groupBy("label", "dim").agg(
        F.count("*").alias("n_vectors"), F.sum("g").alias("sg")
    )
    return agg.select(
        "label",
        "dim",
        "n_vectors",
        (
            F.expr("(CAST(1000 AS BIGINT) * sg) DIV n_vectors").cast("double")
            / 10000000000.0
        ).alias("centroid_val"),
    )


def emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means over the embedding corpus (k=8, two unrolled Lloyd
    iterations, deterministic seeds = the 8 lowest vec_ids) — the
    clustering pass behind semantic dedup sharding, IVF list training,
    and corpus topic maps. Emits one row per surviving cluster with its
    population, how many vectors switched into it on the second
    iteration, and the exact within-cluster inertia.

    Exactness (why an iterative algorithm still value-matches DuckDB):
    every arithmetic step stays on an integer grid. Vector elements snap
    to the 1e7 grid (|v| ≤ 0.6 → |g| ≤ 6e6); squared distances are int64
    (≤ 64·(1.2e7)² ≈ 9.2e15); assignment is an exact (dist, cid)
    row_number argmin; the centroid update is the offset floored integer
    quotient (sg + n·2e7) DIV n − 2e7 — the +2e7·n shift keeps the
    numerator non-negative so Spark's truncating DIV and DuckDB's
    flooring // agree — and the final inertia is a decimal(38)/HUGEINT
    exact sum (per-pair distances reach ~1e15; an int64 corpus sum would
    overflow near 1e4 vectors) cast to double once.

    Plan: the grid point table is exploded once and reused across both
    iterations; centroids are ≤ k·dim = 512 rows, always broadcast — each
    iteration is one broadcast join + two hash aggregates, shuffling only
    (vec_id, cid, dist) triples. At 100 TB the same shape holds: the
    k×dim centroid frame is driver-sized no matter the corpus, iteration
    count is fixed, and nothing ever shuffles the raw vectors twice."""
    K = 8
    OFF = "CAST(20000000 AS BIGINT)"
    emb = load(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("dim"),
        F.round(F.col("v").cast("double") * 10000000).cast("long").alias("g"),
    )
    c0 = pts.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cid"), "dim", F.col("g").alias("c")
    )

    def assign(cent: DataFrame) -> DataFrame:
        d = pts.join(F.broadcast(cent), "dim")
        diff = F.col("g") - F.col("c")
        dist = d.groupBy("vec_id", "cid").agg(F.sum(diff * diff).alias("dist"))
        w = Window.partitionBy("vec_id").orderBy("dist", "cid")
        return (
            dist.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    a1 = assign(c0)
    c1 = (
        pts.join(a1.select("vec_id", "cid"), "vec_id")
        .groupBy("cid", "dim")
        .agg(F.count("*").alias("n"), F.sum("g").alias("sg"))
        .select(
            "cid", "dim", F.expr(f"(sg + n * {OFF}) DIV n - {OFF}").alias("c")
        )
    )
    a2 = assign(c1)
    j = a2.join(a1.select("vec_id", F.col("cid").alias("cid1")), "vec_id")
    return (
        j.groupBy("cid")
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum(F.when(F.col("cid1") != F.col("cid"), 1).otherwise(0)).alias(
                "n_moved_in"
            ),
            (
                F.sum(F.col("dist").cast("decimal(38,0)")).cast("double")
                / F.lit(1e14)
            ).alias("inertia"),
        )
    )


def sketch_hll_orderkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog distinct-orderkey estimate (p=8, 256
    registers) — the sketch itself, not just the estimate, is
    cross-engine reproducible."""
    from securities_pricing_data_pipeline_spark.llmdata.sketch import hll_estimate

    li = load(spark, sf_dir, "lineitem")
    return hll_estimate(li, F.col("l_orderkey"), p=8)


def sketch_hll_weekly_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY demo — the property that makes sketches the
    100 TB answer to distinct counts: per-(week, day) HLL register tables
    (≤256 rows each, persistable as a sketch table) re-aggregate to
    weekly distinct-customer estimates with a bucket-wise max — no
    raw-data re-scan. Emits one row per order-week with the merged
    register sum and estimate; bit-reproducible in DuckDB."""
    from securities_pricing_data_pipeline_spark.llmdata.sketch import (
        hll_grouped_registers,
        hll_merge_estimate,
    )

    o = load(spark, sf_dir, "orders").select(
        F.date_trunc("week", F.col("o_orderdate").cast("date"))
        .cast("date")
        .alias("week_start"),
        F.col("o_orderdate").cast("date").alias("day"),
        "o_custkey",
    )
    regs = hll_grouped_registers(o, F.col("o_custkey"), ["week_start", "day"], p=8)
    return hll_merge_estimate(regs, ["week_start"], p=8)


def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination over the corpus: docs 0–4 stand in as the
    eval set; every document reports how many of its distinct 3-gram
    shingles collide with the benchmark's shingle set."""
    from securities_pricing_data_pipeline_spark.llmdata.text import decontaminate

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 5)
    return decontaminate(docs, bench, n=3)


def sketch_bloom_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom membership: build the filter over orders' custkeys,
    probe every customer, report maybe/present/false-positive counts —
    the join-pruning sketch (ship the filter, skip the shuffle)."""
    from securities_pricing_data_pipeline_spark.llmdata.sketch import (
        bloom_probe_summary,
    )

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return bloom_probe_summary(
        orders, F.col("o_custkey"), cust, F.col("c_custkey"), k=3, m_bits=4096
    )


def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-100 tokens with occurrence and document
    frequency — the classic explode→aggregate wordcount at corpus scale."""
    from securities_pricing_data_pipeline_spark.llmdata.text import vocab_topk

    return vocab_topk(load(spark, sf_dir, "documents"), k=100)


def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinctive terms per document by rational-idf TF-IDF."""
    from securities_pricing_data_pipeline_spark.llmdata.text import tfidf_top_terms

    return tfidf_top_terms(load(spark, sf_dir, "documents"), k=3)


def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass C4-style quality-filter funnel over the corpus."""
    from securities_pricing_data_pipeline_spark.llmdata.text import filter_funnel

    return filter_funnel(load(spark, sf_dir, "documents"))


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-stratified deterministic sampling (keep 80% en / 50% de /
    10% other), summarized per stratum."""
    from securities_pricing_data_pipeline_spark.llmdata.sampling import (
        stratified_sample,
    )

    docs = load(spark, sf_dir, "documents")
    kept = stratified_sample(docs, "lang", {"en": 80, "de": 50}, default_pct=10)
    return (
        kept.groupBy("lang")
        .agg(F.count("*").alias("n_kept"), F.sum("n_chars").alias("kept_chars"))
        .orderBy("lang")
    )


def sketch_cms_partkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable count-min sketch heavy hitters: top-10 partkeys by
    lineitem frequency with their CMS estimates (d=4, w=256) — estimate ≥
    truth always; both the sketch cells and the estimates are bit-equal
    cross-engine."""
    from securities_pricing_data_pipeline_spark.llmdata.sketch import cms_estimate_topk

    li = load(spark, sf_dir, "lineitem")
    return cms_estimate_topk(li, F.col("l_partkey"), k=10, d=4, w=256)


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_cluster_canonical": dedup_cluster_canonical,
    "dedup_lsh_bucket_audit": dedup_lsh_bucket_audit,
    "text_segment_dedup": text_segment_dedup,
    "export_shard_plan": export_shard_plan,
    "dedup_incremental_minhash": dedup_incremental_minhash,
    "sim_ivf_recall_eval": sim_ivf_recall_eval,
    "dedup_cluster_size_hist": dedup_cluster_size_hist,
    "dedup_source_overlap": dedup_source_overlap,
    "dedup_cluster_star": dedup_cluster_star,
    "text_normalize": text_normalize,
    "sample_split": sample_split,
    "corpus_drift_kl": corpus_drift_kl,
    "sample_weighted_docs": sample_weighted_docs,
    "sketch_hll_intersection": sketch_hll_intersection,
    "text_pack_bins": text_pack_bins,
    "text_sentiment": text_sentiment,
    "strings_fuzzy_match": strings_fuzzy_match,
    "sketch_hll_orderkeys": sketch_hll_orderkeys,
    "sketch_hll_weekly_merge": sketch_hll_weekly_merge,
    "sketch_cms_partkeys": sketch_cms_partkeys,
    "sketch_bloom_custkeys": sketch_bloom_custkeys,
    "text_decontaminate": text_decontaminate,
    "text_vocab_topk": text_vocab_topk,
    "text_tfidf_topterms": text_tfidf_topterms,
    "corpus_filter_funnel": corpus_filter_funnel,
    "sample_stratified": sample_stratified,
    "emb_norm_stats": emb_norm_stats,
    "emb_label_centroids": emb_label_centroids,
    "emb_kmeans": emb_kmeans,
    "sim_knn_classify": sim_knn_classify,
    "emb_pq_codes": emb_pq_codes,
    "sim_pq_adc_topk": sim_pq_adc_topk,
    "sim_pq_adc_recall": sim_pq_adc_recall,
    "sim_rrf_fusion": sim_rrf_fusion,
    "corpus_mix_plan": corpus_mix_plan,
    "dedup_minhash_eval": dedup_minhash_eval,
    "text_chunk_windows": text_chunk_windows,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_ngram_containment": dedup_ngram_containment,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_semantic": dedup_semantic,
    "dedup_semantic_keep": dedup_semantic_keep,
    "text_token_count": text_token_count,
    "text_token_count_bpe": text_token_count_bpe,
    "text_winnow_fingerprint": text_winnow_fingerprint,
    "text_quality_score": text_quality_score,
    "text_unigram_logppl": text_unigram_logppl,
    "text_pii_scrub": text_pii_scrub,
    "text_repetition_stats": text_repetition_stats,
    "text_fingerprint": text_fingerprint,
    "text_lang_id": text_lang_id,
    "text_length_quantiles": text_length_quantiles,
    "sim_bruteforce_topk": sim_bruteforce_topk,
    "sim_lsh_topk": sim_lsh_topk,
    "sim_ivf_topk": sim_ivf_topk,
    "multimodal_features": multimodal_features,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_resize": multimodal_resize,
    "multimodal_resize_pixels": multimodal_resize_pixels,
    "asof_event_bars": asof_event_bars,
    "asof_bucketed_quotes": asof_bucketed_quotes,
    "multimodal_jpeg_roundtrip": multimodal_jpeg_roundtrip,
    "multimodal_png_pixels": multimodal_png_pixels,
    "audio_pcm_features": audio_pcm_features,
    "video_mjpeg_frames": video_mjpeg_frames,
    "asof_pairs_spread": asof_pairs_spread,
    "asof_event_bars_fwd": asof_event_bars_fwd,
    "asof_event_bars_tol": asof_event_bars_tol,
}

# integer-grid dot product (parity with llmdata/similarity.py: snap each
# elementwise product to 1e-13 units, fold as exact integers)
def _dot_sql(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(round(p[1] * p[2] * 1e13) AS BIGINT))) AS DOUBLE)"
    )


def _cos_expr(a: str, b: str) -> str:
    return f"({_dot_sql(a, b)}) / sqrt(({_dot_sql(a, a)}) * ({_dot_sql(b, b)}))"


# DuckDB twin of llmdata.dedup.portable_hash60 (md5 hex → 60-bit BIGINT)
def _phash_sql(x: str) -> str:
    return f"CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


# DuckDB twin of llmdata.dedup.shingles(): distinct word-3-gram shingles,
# whole doc as one shingle when shorter than 3 tokens
_SHINGLES_CTE = """
toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id, unnest(
    CASE WHEN len(t) >= 3
         THEN list_distinct([array_to_string(t[i+1:i+3], ' ') for i in range(len(t) - 2)])
         ELSE [array_to_string(t, ' ')] END) AS g
  FROM toks
)"""


def _minhash_oracle_sql(num_hashes: int = 64, bands: int = 16, threshold: float = 0.5) -> str:
    """Replicates minhash_lsh_pairs(portable=True) exactly: same hash
    family, same band → bucket candidate rule (bucket equality expressed
    as raw signature-slice equality), same estimated-Jaccard verify."""
    from securities_pricing_data_pipeline_spark.llmdata.dedup import _MERSENNE, minhash_params

    params = minhash_params(num_hashes)
    rpb = num_hashes // bands
    mins = ",\n         ".join(
        f"MIN((h * {a} + {b}) % {_MERSENNE}) AS m{j}" for j, (a, b) in enumerate(params)
    )
    band_eq = " OR ".join(
        "(" + " AND ".join(f"a.m{i * rpb + j} = b.m{i * rpb + j}" for j in range(rpb)) + ")"
        for i in range(bands)
    )
    agree = " + ".join(f"CASE WHEN a.m{j} = b.m{j} THEN 1 ELSE 0 END" for j in range(num_hashes))
    return f"""
WITH {_SHINGLES_CTE}, hs AS (
  SELECT doc_id, {_phash_sql('g')} % {_MERSENNE} AS h FROM sh
), sig AS (
  SELECT doc_id,
         {mins}
  FROM hs GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(({agree}) AS DOUBLE) / {float(num_hashes)} AS est_jaccard
FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({band_eq})
WHERE CAST(({agree}) AS DOUBLE) / {float(num_hashes)} >= {threshold}
"""


def _incremental_minhash_oracle_sql(
    num_hashes: int = 64, bands: int = 16, threshold: float = 0.5
) -> str:
    """Replicates dedup_incremental_minhash: same signature pipeline and
    band rule as _minhash_oracle_sql, but candidates only BETWEEN the
    20% 'new' hash slice and the 80% 'corpus' remainder."""
    from securities_pricing_data_pipeline_spark.llmdata.dedup import _MERSENNE, minhash_params

    params = minhash_params(num_hashes)
    rpb = num_hashes // bands
    mins = ",\n         ".join(
        f"MIN((h * {a} + {b}) % {_MERSENNE}) AS m{j}" for j, (a, b) in enumerate(params)
    )
    band_eq = " OR ".join(
        "(" + " AND ".join(f"a.m{i * rpb + j} = b.m{i * rpb + j}" for j in range(rpb)) + ")"
        for i in range(bands)
    )
    agree = " + ".join(f"CASE WHEN a.m{j} = b.m{j} THEN 1 ELSE 0 END" for j in range(num_hashes))
    inc_expr = "'inc:' || CAST(doc_id AS VARCHAR)"
    newpred = f"({_phash_sql(inc_expr)} % 5 = 0)"
    return f"""
WITH {_SHINGLES_CTE}, hs AS (
  SELECT doc_id, {_phash_sql('g')} % {_MERSENNE} AS h FROM sh
), sig AS (
  SELECT doc_id,
         {mins}
  FROM hs GROUP BY doc_id
), tagged AS (
  SELECT *, {newpred} AS is_new FROM sig
)
SELECT a.doc_id AS new_id, b.doc_id AS old_id,
       CAST(({agree}) AS DOUBLE) / {float(num_hashes)} AS est_jaccard
FROM tagged a JOIN tagged b ON a.is_new AND NOT b.is_new AND ({band_eq})
WHERE CAST(({agree}) AS DOUBLE) / {float(num_hashes)} >= {threshold}
"""


def _lsh_bucket_audit_oracle_sql(
    num_hashes: int = 64, bands: int = 16, cap: int = _AUDIT_MAX_BUCKET
) -> str:
    """DuckDB twin of ``dedup_lsh_bucket_audit``: same portable signature
    pipeline, buckets keyed by the raw band slice."""
    from securities_pricing_data_pipeline_spark.llmdata.dedup import _MERSENNE, minhash_params

    params = minhash_params(num_hashes)
    rpb = num_hashes // bands
    mins = ",\n         ".join(
        f"MIN((h * {a} + {b}) % {_MERSENNE}) AS m{j}" for j, (a, b) in enumerate(params)
    )
    band_rows = "\n  UNION ALL ".join(
        f"SELECT doc_id, {i} AS band, concat_ws(',', "
        + ", ".join(f"CAST(m{i * rpb + j} AS VARCHAR)" for j in range(rpb))
        + ") AS key FROM sig"
        for i in range(bands)
    )
    return f"""
WITH {_SHINGLES_CTE}, hs AS (
  SELECT doc_id, {_phash_sql('g')} % {_MERSENNE} AS h FROM sh
), sig AS (
  SELECT doc_id,
         {mins}
  FROM hs GROUP BY doc_id
), bandrows AS (
  {band_rows}
), sizes AS (
  SELECT band, key, COUNT(*) AS k FROM bandrows GROUP BY 1, 2 HAVING COUNT(*) > 1
)
SELECT COUNT(*) AS n_buckets_multi,
       CAST(MAX(k) AS INT) AS max_bucket_size,
       CAST(COALESCE(SUM(CASE WHEN k > {cap} THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_dropped_buckets,
       CAST(COALESCE(SUM(CASE WHEN k <= {cap} THEN k * (k - 1) // 2 ELSE 0 END), 0)
         AS BIGINT) AS n_candidate_pairs
FROM sizes
"""


def _simhash_oracle_sql(max_hamming: int = 3) -> str:
    """Replicates simhash_near_dups(portable=True): per-bit majority vote
    over 60-bit md5 shingle hashes, 4×16-bit pigeonhole blocks, exact
    Hamming verify."""
    votes = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}" for i in range(64)
    )
    sim = " + ".join(f"CASE WHEN v{i} > 0 THEN (CAST(1 AS BIGINT) << {i}) ELSE 0 END"
                     for i in range(64))
    block_eq = " OR ".join(
        f"((a.sim >> {16 * i}) & 65535) = ((b.sim >> {16 * i}) & 65535)" for i in range(4)
    )
    return f"""
WITH {_SHINGLES_CTE}, hs AS (
  SELECT doc_id, {_phash_sql('g')} AS h FROM sh
), votes AS (
  SELECT doc_id,
         {votes}
  FROM hs GROUP BY doc_id
), sig AS (
  SELECT doc_id, {sim} AS sim FROM votes
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({block_eq})
WHERE bit_count(xor(a.sim, b.sim)) <= {max_hamming}
"""


def _plane_sig_sql(vec: str, dim: int = 64, n_planes: int = 16, seed: int = 42) -> str:
    """n_planes must match the Spark-side operator's parameter."""
    """Signed-random-projection signature of a DOUBLE[] column — same
    fixed planes and integer-grid dot as llmdata.similarity._signature."""
    planes = random_planes(dim=dim, n_planes=n_planes, seed=seed)
    bits = " + ".join(
        f"CASE WHEN {_dot_sql(vec, '[' + ', '.join(repr(w) for w in plane) + ']')} >= 0 "
        f"THEN (CAST(1 AS BIGINT) << {i}) ELSE 0 END"
        for i, plane in enumerate(planes)
    )
    return f"({bits})"


def _emb_near_dup_oracle_sql(threshold: float = 0.4, n_planes: int = 32, bands: int = 4) -> str:
    rpb = n_planes // bands
    mask = (1 << rpb) - 1
    block_eq = " OR ".join(
        f"((a.sig >> {rpb * i}) & {mask}) = ((b.sig >> {rpb * i}) & {mask})" for i in range(bands)
    )
    return f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), sig AS (
  SELECT vec_id, vec, {_plane_sig_sql('vec', n_planes=n_planes)} AS sig FROM v
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_cos_expr('a.vec', 'b.vec')} AS cos_sim
FROM sig a JOIN sig b ON a.vec_id < b.vec_id AND ({block_eq})
WHERE {_cos_expr('a.vec', 'b.vec')} >= {threshold}
"""


def _lsh_topk_oracle_sql(k: int = 5, n_planes: int = 16, bands: int = 4) -> str:
    rpb = n_planes // bands
    mask = (1 << rpb) - 1
    block_eq = " OR ".join(
        f"((c.sig >> {rpb * i}) & {mask}) = ((q.sig >> {rpb * i}) & {mask})" for i in range(bands)
    )
    return f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), sig AS (
  SELECT vec_id, vec, {_plane_sig_sql('vec')} AS sig FROM v
), cand AS (
  SELECT q.vec_id AS query_id, q.vec AS qv, c.vec_id AS neighbor_id, c.vec AS cv
  FROM sig c JOIN sig q
    ON q.vec_id < 10 AND c.vec_id != q.vec_id AND ({block_eq})
), ranked AS (
  SELECT query_id, neighbor_id, {_cos_expr('qv', 'cv')} AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY {_cos_expr('qv', 'cv')} DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def _ivf_topk_oracle_sql(k: int = 5, n_centroids: int = 16, nprobe: int = 4) -> str:
    return f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), cent AS (
  SELECT vec_id AS centroid_id, vec AS cvec FROM v WHERE vec_id < {n_centroids}
), assigned AS (
  SELECT neighbor_id, c_vec, centroid_id FROM (
    SELECT v.vec_id AS neighbor_id, v.vec AS c_vec, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {_cos_expr('v.vec', 'cent.cvec')} DESC, cent.centroid_id) AS rn
    FROM v, cent
  ) WHERE rn = 1
), probes AS (
  SELECT query_id, q_vec, centroid_id FROM (
    SELECT v.vec_id AS query_id, v.vec AS q_vec, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {_cos_expr('v.vec', 'cent.cvec')} DESC, cent.centroid_id) AS rn
    FROM v, cent WHERE v.vec_id < 10
  ) WHERE rn <= {nprobe}
), ranked AS (
  SELECT p.query_id, a.neighbor_id, {_cos_expr('p.q_vec', 'a.c_vec')} AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY p.query_id
                            ORDER BY {_cos_expr('p.q_vec', 'a.c_vec')} DESC, a.neighbor_id) AS rank
  FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
  WHERE a.neighbor_id != p.query_id
)
SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def _semantic_dedup_oracle_sql(
    threshold: float = 0.4, n_centroids: int = 16, max_cluster: int = 2000
) -> str:
    """Mirror of semantic_dedup_pairs: anchor-centroid assignment (same
    tie-break as the Spark window), the enforced cluster-size cap, and
    the integer-grid cosine threshold."""
    return f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), cent AS (
  SELECT vec_id AS centroid_id, vec AS cvec FROM v WHERE vec_id < {n_centroids}
), assigned AS (
  SELECT id, centroid_id FROM (
    SELECT v.vec_id AS id, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {_cos_expr('v.vec', 'cent.cvec')} DESC, cent.centroid_id) AS rn
    FROM v, cent
  ) WHERE rn = 1
), sized AS (
  SELECT centroid_id FROM assigned
  GROUP BY 1 HAVING COUNT(*) BETWEEN 2 AND {max_cluster}
), pairs AS (
  SELECT a.centroid_id AS cluster_id, a.id AS id_a, b.id AS id_b
  FROM assigned a
  JOIN assigned b ON a.centroid_id = b.centroid_id AND a.id < b.id
  JOIN sized s ON a.centroid_id = s.centroid_id
)
SELECT p.cluster_id, p.id_a, p.id_b,
       {_cos_expr('va.vec', 'vb.vec')} AS cos_sim
FROM pairs p
JOIN v va ON p.id_a = va.vec_id
JOIN v vb ON p.id_b = vb.vec_id
WHERE {_cos_expr('va.vec', 'vb.vec')} >= {threshold}
"""


ORACLES = {
    # winnowing (k=8, w=4): hash every char 8-gram, min per 4-window at
    # window starts 1..max(n-4+1, 1) (truncated single window for short
    # docs — mirrors the Spark edge rule), distinct selected hashes
    "text_winnow_fingerprint": f"""
WITH t AS (
  SELECT doc_id, lower(trim(text)) AS txt FROM documents
), grams AS (
  SELECT doc_id, unnest(range(1, greatest(length(txt) - 8 + 1, 0) + 1)) AS i, txt
  FROM t WHERE length(txt) >= 8
), hs AS (
  SELECT doc_id, i, {_phash_sql("substr(txt, CAST(i AS INT), 8)")} AS h,
         COUNT(*) OVER (PARTITION BY doc_id) AS n
  FROM grams
), wins AS (
  SELECT doc_id, i,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m,
         n
  FROM hs
)
SELECT DISTINCT doc_id, m AS fp
FROM wins WHERE i <= greatest(n - 4 + 1, 1)
""",
    "text_unigram_logppl": """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
  FROM documents
), vocab AS (
  SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1
), tot AS (
  SELECT COUNT(*) AS n_total FROM toks
), nll AS (
  SELECT t.doc_id,
         CAST(-ln(CAST(v.cnt AS DOUBLE) / (SELECT n_total FROM tot))
              AS DECIMAL(38,12)) AS nll
  FROM toks t JOIN vocab v USING (tok)
)
SELECT doc_id, CAST(COUNT(*) AS INT) AS n_tokens,
       CAST(CAST(CAST(SUM(nll) AS DOUBLE) / COUNT(*) AS DECIMAL(20,9)) AS DOUBLE) AS avg_nll
FROM nll GROUP BY doc_id
""",
    "text_token_count_bpe": f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{BPE_SPLIT_RE.replace("'", "''")}')) AS INT)
         AS n_bpe_tokens
FROM documents
""",
    "multimodal_frame_sample": """
WITH a AS (
  SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS total
  FROM documents
), f AS (
  SELECT asset_id, hx, total, unnest([0, 1, 2, 3]) AS i FROM a
)
SELECT asset_id, CAST(i AS INT) AS frame_idx,
       CAST((total * (i + 1)) // 4 - (total * i) // 4 AS INT) AS n_bytes,
       md5(substr(hx, ((total * i) // 4) * 2 + 1,
                  ((total * (i + 1)) // 4 - (total * i) // 4) * 2)) AS frame_digest
FROM f
""",
    "multimodal_resize": """
SELECT doc_id AS asset_id,
       CAST(least(octet_length(encode(text)), 4096) AS INT) AS n_bytes,
       md5(substr(hex(encode(text)), 1, 4096 * 2)) AS digest,
       '64x64' AS resized
FROM documents
""",
    "multimodal_resize_pixels": """
WITH params AS (
  SELECT doc_id AS asset_id,
         CAST(32 + doc_id % 96 AS INT) AS r,
         CAST(32 + (doc_id * 7) % 96 AS INT) AS g,
         CAST(32 + (doc_id * 13) % 96 AS INT) AS b
  FROM documents
), expected AS (
  -- nearest-neighbor resize of a flat-color image is the same flat color,
  -- so the genuine decode->resample->encode output is constructible
  -- arithmetically: a 16x16 P6 with 256 repeats of the (r,g,b) pixel
  SELECT asset_id,
         'P6' || chr(10) || '16 16' || chr(10) || '255' || chr(10)
           || repeat(chr(r) || chr(g) || chr(b), 256) AS s
  FROM params
)
SELECT asset_id,
       CAST(octet_length(encode(s)) AS INT) AS n_bytes,
       md5(hex(encode(s))) AS digest,
       'ppm' AS codec
FROM expected
""",
    "asof_bucketed_quotes": """
WITH base AS (
  SELECT event_id, 'U' || CAST(user_id % 50 AS VARCHAR) AS symbol,
         epoch_ns(ts) AS tns, user_id
  FROM events
), q AS (
  SELECT symbol, tns, MAX((user_id * 31) % 1000) AS price
  FROM base WHERE event_id % 4 = 0 GROUP BY symbol, tns
), l AS (
  SELECT event_id, symbol, tns FROM base WHERE event_id % 4 <> 0
)
SELECT l.event_id, l.symbol, l.tns AS ts, q.tns AS quote_ts, q.price
FROM l ASOF JOIN q ON l.symbol = q.symbol AND l.tns >= q.tns
""",
    "multimodal_jpeg_roundtrip": """
-- the oracle pins geometry AND demands roundtrip_ok for every asset:
-- any document whose JPEG encode->decode cycle exceeds the quality-100
-- error bound flips the Spark-side flag and breaks the value hash
SELECT doc_id AS asset_id,
       CAST(8 + doc_id % 9 AS BIGINT) AS width,
       CAST(8 + doc_id % 7 AS BIGINT) AS height,
       TRUE AS roundtrip_ok
FROM documents
WHERE doc_id % 10 = 0
""",
    "multimodal_png_pixels": """
WITH params AS (
  SELECT doc_id AS asset_id,
         CAST(32 + doc_id % 96 AS INT) AS r,
         CAST(32 + (doc_id * 7) % 96 AS INT) AS g,
         CAST(32 + (doc_id * 13) % 96 AS INT) AS b
  FROM documents
), expected AS (
  -- PNG is lossless and nearest-neighbor resize of a flat color is the
  -- same flat color, so the decode->resample->re-encode output is
  -- constructible arithmetically, exactly as for the PPM twin
  SELECT asset_id,
         'P6' || chr(10) || '16 16' || chr(10) || '255' || chr(10)
           || repeat(chr(r) || chr(g) || chr(b), 256) AS s
  FROM params
)
SELECT asset_id,
       CAST(octet_length(encode(s)) AS INT) AS n_bytes,
       md5(hex(encode(s))) AS digest,
       'png' AS codec
FROM expected
""",
    "video_mjpeg_frames": """
-- the expected (asset, frame) grid with geometry; in_bound must hold
-- for every decoded frame or the value hash breaks
SELECT d.doc_id AS asset_id,
       t.i AS frame_idx,
       CAST(8 + d.doc_id % 9 AS BIGINT) AS width,
       CAST(8 + d.doc_id % 7 AS BIGINT) AS height,
       TRUE AS in_bound
FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
CROSS JOIN generate_series(0, 3) AS t(i)
""",
    "audio_pcm_features": """
WITH d AS (SELECT doc_id FROM documents),
s AS (
  -- fixed 0..749 grid cross-joined then length-filtered (DuckDB's
  -- generate_series takes no lateral column parameters)
  SELECT d.doc_id, t.i,
         ((d.doc_id * 13 + t.i * 7919) % 65536) - 32768 AS v
  FROM d CROSS JOIN generate_series(0, 749) AS t(i)
  WHERE t.i < 500 + d.doc_id % 250
), lagged AS (
  SELECT doc_id, i, v,
         lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS prev
  FROM s
)
SELECT doc_id AS asset_id,
       CAST(8000 AS BIGINT) AS sample_rate,
       COUNT(*) AS n_samples,
       CAST(SUM(v * v) AS BIGINT) AS sumsq_units,
       CAST(SUM(CASE WHEN prev IS NOT NULL AND ((v >= 0) <> (prev >= 0))
                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
       'wav' AS codec
FROM lagged
GROUP BY doc_id
""",
    "dedup_minhash_lsh": _minhash_oracle_sql(),
    "sketch_hll_orderkeys": hll_oracle_sql("lineitem", "l_orderkey", p=8),
    "sketch_hll_weekly_merge": hll_merge_oracle_sql(
        "orders",
        "o_custkey",
        fine_expr="CAST(o_orderdate AS DATE)",
        merge_expr="CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE)",
        merge_name="week_start",
        p=8,
    ),
    "sketch_cms_partkeys": cms_oracle_sql("lineitem", "l_partkey", k=10, d=4, w=256),
    "text_decontaminate": """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents
), grams AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) >= 3
                     THEN [array_to_string(t[i+1:i+3], ' ') for i in range(len(t) - 2)]
                     ELSE [array_to_string(t, ' ')] END) AS g
  FROM toks
), sh AS (
  SELECT DISTINCT doc_id, g FROM grams
), cnt AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY 1
), bench AS (
  SELECT DISTINCT g FROM sh WHERE doc_id < 5
), hits AS (
  SELECT s.doc_id, COUNT(*) AS n_contaminated
  FROM sh s JOIN bench USING (g) GROUP BY 1
)
SELECT c.doc_id,
       CAST(c.n_shingles AS INT) AS n_shingles,
       CAST(COALESCE(h.n_contaminated, 0) AS INT) AS n_contaminated,
       CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / c.n_shingles AS contaminated_frac
FROM cnt c LEFT JOIN hits h USING (doc_id)
""",
    "sim_pq_adc_topk": """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), ms AS (
  SELECT unnest([0, 1, 2, 3]) AS m
), sub AS (
  SELECT vec_id, m, vec[m*5+1 : m*5+5] AS sv FROM v, ms
), cb AS (
  SELECT vec_id AS cid, m, vec[m*5+1 : m*5+5] AS cvec FROM v, ms WHERE vec_id < 16
), dist AS (
  SELECT s.vec_id, s.m, c.cid,
         list_sum(list_transform(list_zip(s.sv, c.cvec),
           p -> CAST(round((p[1] - p[2]) * (p[1] - p[2]) * 1e13) AS BIGINT))) AS dist_units
  FROM sub s JOIN cb c ON s.m = c.m
), best AS (
  SELECT vec_id, m, cid FROM (
    SELECT vec_id, m, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist_units, cid) AS rn
    FROM dist) WHERE rn = 1
), adc AS (
  SELECT s.vec_id AS query_id, c.m, c.cid,
         list_sum(list_transform(list_zip(s.sv, c.cvec),
           p -> CAST(round((p[1] - p[2]) * (p[1] - p[2]) * 1e13) AS BIGINT))) AS units
  FROM sub s JOIN cb c ON s.m = c.m
  WHERE s.vec_id % 50 = 0
), scored AS (
  SELECT a.query_id, b.vec_id AS neighbor_id, SUM(a.units) AS total_units
  FROM best b JOIN adc a ON b.m = a.m AND b.cid = a.cid
  WHERE b.vec_id <> a.query_id
  GROUP BY 1, 2
), ranked AS (
  SELECT query_id, neighbor_id, total_units,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY total_units, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id,
       CAST(total_units AS DOUBLE) / 1e13 AS adc_dist,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
""",
    "emb_pq_codes": """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), ms AS (
  SELECT unnest([0, 1, 2, 3]) AS m
), sub AS (
  SELECT vec_id, m, vec[m*5+1 : m*5+5] AS sv FROM v, ms
), cb AS (
  SELECT vec_id AS cid, m, vec[m*5+1 : m*5+5] AS cvec FROM v, ms WHERE vec_id < 16
), dist AS (
  SELECT s.vec_id, s.m, c.cid,
         list_sum(list_transform(list_zip(s.sv, c.cvec),
           p -> CAST(round((p[1] - p[2]) * (p[1] - p[2]) * 1e13) AS BIGINT))) AS dist_units
  FROM sub s JOIN cb c ON s.m = c.m
), best AS (
  SELECT vec_id, m, cid, dist_units,
         ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist_units, cid) AS rn
  FROM dist
)
SELECT vec_id,
       string_agg(CAST(cid AS VARCHAR), '-' ORDER BY m) AS pq_code,
       CAST(SUM(dist_units) AS DOUBLE) / 1e13 AS qerr
FROM best WHERE rn = 1
GROUP BY vec_id
""",
    "emb_label_centroids": """
WITH d AS (
  SELECT label,
         generate_subscripts(embedding, 1) AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000000) AS BIGINT) AS g
  FROM embeddings
), agg AS (
  SELECT label, dim, COUNT(*) AS n_vectors, CAST(SUM(g) AS BIGINT) AS sg
  FROM d GROUP BY 1, 2
)
SELECT label, dim, n_vectors,
       CAST((CAST(1000 AS BIGINT) * sg) // n_vectors AS DOUBLE)
         / 10000000000.0 AS centroid_val
FROM agg
""",
    "emb_kmeans": """
WITH pts AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000000) AS BIGINT) AS g
  FROM embeddings
), c0 AS (
  SELECT vec_id AS cid, dim, g AS c FROM pts WHERE vec_id < 8
), d1 AS (
  SELECT p.vec_id, c.cid,
         CAST(SUM((p.g - c.c) * (p.g - c.c)) AS BIGINT) AS dist
  FROM pts p JOIN c0 c USING (dim) GROUP BY 1, 2
), a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d1) WHERE rn = 1
), c1 AS (
  SELECT a.cid, p.dim,
         (CAST(SUM(p.g) AS BIGINT) + COUNT(*) * CAST(20000000 AS BIGINT))
           // COUNT(*) - CAST(20000000 AS BIGINT) AS c
  FROM pts p JOIN a1 a USING (vec_id) GROUP BY 1, 2
), d2 AS (
  SELECT p.vec_id, c.cid,
         CAST(SUM((p.g - c.c) * (p.g - c.c)) AS BIGINT) AS dist
  FROM pts p JOIN c1 c USING (dim) GROUP BY 1, 2
), a2 AS (
  SELECT vec_id, cid, dist FROM (
    SELECT vec_id, cid, dist,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d2) WHERE rn = 1
)
SELECT a2.cid,
       COUNT(*) AS n_vectors,
       CAST(SUM(CASE WHEN a1.cid <> a2.cid THEN 1 ELSE 0 END) AS BIGINT)
         AS n_moved_in,
       CAST(SUM(a2.dist) AS DOUBLE) / 1e14 AS inertia
FROM a2 JOIN a1 USING (vec_id)
GROUP BY 1
""",
    "emb_norm_stats": """
WITH g AS (
  SELECT label,
         list_sum(list_transform(list_zip(embedding::DOUBLE[], embedding::DOUBLE[]),
                  p -> CAST(round(p[1] * p[2] * 1e13) AS BIGINT))) AS sq
  FROM embeddings
)
SELECT label, COUNT(*) AS n_vectors,
       CAST(SUM(sq) AS BIGINT) AS sum_sq_grid,
       CAST(MAX(sq) AS BIGINT) AS max_sq_grid,
       CAST(SUM(sq) AS DOUBLE) / COUNT(*) AS avg_sq_norm_grid
FROM g
GROUP BY label
""",
    "strings_fuzzy_match": r"""
WITH names AS (SELECT DISTINCT p_name AS name FROM part),
blocked AS (SELECT name, regexp_extract(name, '(\S+)$', 1) AS blk FROM names)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS INT) AS distance
FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= 2
""",
    "text_sentiment": r"""
WITH lex(word, polarity) AS (VALUES {lex_values}),
toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(
           trim(regexp_replace(lower(text), '[^\p{{L}}\p{{N}}\s]', ' ', 'g')),
           '\s+')) AS word
  FROM documents
),
scored AS (
  SELECT t.doc_id, l.polarity FROM toks t LEFT JOIN lex l ON t.word = l.word
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN polarity = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(SUM(CASE WHEN polarity = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
       CAST(SUM(COALESCE(polarity, 0)) AS BIGINT) AS net_sentiment
FROM scored
GROUP BY doc_id
""".format(
        lex_values=", ".join(f"('{w}', {p})" for w, p in SENTIMENT_LEXICON)
    ),
    "sketch_hll_intersection": """
WITH seg AS (
  SELECT year(CAST(o_orderdate AS DATE)) AS yr, o_custkey FROM orders
  WHERE year(CAST(o_orderdate AS DATE)) IN (1996, 1997)
), h AS (
  SELECT yr, CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
  FROM seg
), regs AS (
  SELECT yr, hv % 256 AS bucket,
         MAX(CASE WHEN (hv >> 8) = 0 THEN 53
                  ELSE 53 - length(bin(hv >> 8)) END) AS M
  FROM h GROUP BY 1, 2
), per AS (
  SELECT yr, COUNT(*) AS nb,
         CAST(SUM(CAST(1 AS BIGINT) << greatest(52 - M, 0)) AS BIGINT) AS s_seen
  FROM regs GROUP BY 1
), perest AS (
  SELECT yr, 2.1199665124534482e+20 / CAST(s_seen + (256 - nb) * (CAST(1 AS BIGINT) << 52) AS DOUBLE) AS est
  FROM per
), uregs AS (
  SELECT bucket, MAX(M) AS M FROM regs GROUP BY 1
), uni AS (
  SELECT COUNT(*) AS nb,
         CAST(SUM(CAST(1 AS BIGINT) << greatest(52 - M, 0)) AS BIGINT) AS s_seen
  FROM uregs
), uniest AS (
  SELECT 2.1199665124534482e+20 / CAST(s_seen + (256 - nb) * (CAST(1 AS BIGINT) << 52) AS DOUBLE) AS est_union
  FROM uni
), exact AS (
  SELECT COUNT(*) AS exact_intersection FROM (
    SELECT o_custkey FROM seg WHERE yr = 1996
    INTERSECT
    SELECT o_custkey FROM seg WHERE yr = 1997
  ) t
)
SELECT e96.est AS est_1996, e97.est AS est_1997, u.est_union,
       e96.est + e97.est - u.est_union AS est_intersection,
       exact.exact_intersection
FROM (SELECT est FROM perest WHERE yr = 1996) e96,
     (SELECT est FROM perest WHERE yr = 1997) e97,
     uniest u, exact
""",
    "sample_weighted_docs": """
WITH keyed AS (
  SELECT doc_id, source, lang, n_chars,
         ln((CAST(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
            / 1152921504606846976.0) / CAST(n_chars AS DOUBLE) AS wkey
  FROM documents
  WHERE n_chars > 0
)
SELECT doc_id, source, lang, n_chars
FROM keyed
ORDER BY wkey DESC, doc_id
LIMIT 200
""",
    "corpus_drift_kl": """
WITH tagged AS (
  SELECT source, lang,
         CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                   % 100 < 80
              THEN 'train' ELSE 'holdout' END AS grp
  FROM documents
), spine AS (
  SELECT DISTINCT source, lang FROM documents
), grps AS (
  SELECT 'train' AS grp UNION ALL SELECT 'holdout'
), cells AS (
  SELECT grp, source, lang, COUNT(*) AS cnt FROM tagged GROUP BY 1, 2, 3
), counts AS (
  SELECT g.grp, s.source, s.lang, COALESCE(c.cnt, 0) AS cnt
  FROM spine s CROSS JOIN grps g
  LEFT JOIN cells c ON c.grp = g.grp AND c.source = s.source AND c.lang = s.lang
), totals AS (
  SELECT grp, COUNT(*) AS tot FROM tagged GROUP BY 1
), nc AS (
  SELECT COUNT(*) AS n_cells FROM spine
), probs AS (
  SELECT grp, source, lang, cnt,
         CAST(cnt + 1 AS DOUBLE) / CAST(tot + n_cells AS DOUBLE) AS p
  FROM counts JOIN totals USING (grp) CROSS JOIN nc
)
SELECT t.source, t.lang,
       t.cnt AS n_train, h.cnt AS n_holdout,
       t.p AS p_train, h.p AS p_holdout,
       CAST(CAST(t.p * ln(t.p / h.p) AS DECIMAL(20,14)) AS DOUBLE) AS kl_term
FROM probs t JOIN probs h ON t.source = h.source AND t.lang = h.lang
WHERE t.grp = 'train' AND h.grp = 'holdout'
""",
    "sample_split": """
WITH b AS (
  SELECT n_chars,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100
           AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM b
GROUP BY 1
""",
    "text_pack_bins": r"""
WITH t AS (
  SELECT doc_id, source,
         CAST(length(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM t
)
SELECT doc_id, source, n_tokens,
       CAST(floor((cum_tokens - n_tokens) / 4096.0) AS BIGINT) AS bin_id,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c
""",
    "text_normalize": r"""
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(
           regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'),
           '\s+', ' ', 'g')) AS norm_text
  FROM documents
)
SELECT doc_id, norm_text,
       CAST(length(norm_text) AS INT) AS n_chars_norm,
       md5(norm_text) AS norm_digest
FROM n
""",
    # connected components as min-reachable-id: enumerate reachability from
    # every doc over the undirected pair graph (tiny at oracle scale), then
    # MIN per vertex — the same fixpoint the Spark label propagation reaches
    "dedup_cluster_canonical": f"""
WITH RECURSIVE pairs AS ({_minhash_oracle_sql()}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
)
SELECT id AS doc_id, MIN(r) AS cluster_id,
       (MIN(r) = id) AS is_canonical
FROM reach
GROUP BY id
""",
    "dedup_simhash": _simhash_oracle_sql(),
    "dedup_lsh_bucket_audit": _lsh_bucket_audit_oracle_sql(),
    "dedup_incremental_minhash": _incremental_minhash_oracle_sql(),
    # identical fixpoint contract: the star variant must reproduce the
    # canonical clustering bit-for-bit
    "dedup_cluster_star": f"""
WITH RECURSIVE pairs AS ({_minhash_oracle_sql()}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
)
SELECT id AS doc_id, MIN(r) AS cluster_id,
       (MIN(r) = id) AS is_canonical
FROM reach
GROUP BY id
""",
    "dedup_embedding_cosine": _emb_near_dup_oracle_sql(),
    "dedup_semantic": _semantic_dedup_oracle_sql(),
    "dedup_semantic_keep": f"""
WITH RECURSIVE pairs AS ({_semantic_dedup_oracle_sql()}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, r) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
)
SELECT id AS vec_id, MIN(r) AS group_id,
       (MIN(r) = id) AS is_kept
FROM reach
GROUP BY id
""",

    "sim_lsh_topk": _lsh_topk_oracle_sql(),
    "sim_ivf_topk": _ivf_topk_oracle_sql(),
    "dedup_exact": """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
""",
    "dedup_ngram_jaccard": """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents
), grams AS (
  SELECT doc_id, unnest([array_to_string(t[i+1:i+3], ' ') for i in range(len(t) - 2)]) AS g
  FROM toks
), sh AS (
  SELECT DISTINCT doc_id, g FROM grams
), cnt AS (
  SELECT doc_id, COUNT(*) AS c FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, CAST(i AS DOUBLE) / (ca.c + cb.c - i) AS jaccard
FROM inter
JOIN cnt ca ON id_a = ca.doc_id
JOIN cnt cb ON id_b = cb.doc_id
WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= 0.8
""",
    "dedup_ngram_containment": """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents
), grams AS (
  SELECT doc_id, unnest([array_to_string(t[i+1:i+3], ' ') for i in range(len(t) - 2)]) AS g
  FROM toks
), sh AS (
  SELECT DISTINCT doc_id, g FROM grams
), cnt AS (
  SELECT doc_id, COUNT(*) AS c FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       CAST(i AS DOUBLE) / least(ca.c, cb.c) AS containment,
       CAST(i AS DOUBLE) / (ca.c + cb.c - i) AS jaccard
FROM inter
JOIN cnt ca ON id_a = ca.doc_id
JOIN cnt cb ON id_b = cb.doc_id
WHERE CAST(i AS DOUBLE) / least(ca.c, cb.c) >= 0.9
""",
    "text_lang_id": """
WITH toks AS (
  SELECT doc_id, text, list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS t
  FROM documents
), hits AS (
  SELECT doc_id, text, 'en' AS lang,
         len(list_intersect(t, ['the','and','of','to','in','is','that','it','for','was'])) AS h FROM toks
  UNION ALL
  SELECT doc_id, text, 'es',
         len(list_intersect(t, ['el','la','de','que','y','en','los','del','se','las'])) FROM toks
  UNION ALL
  SELECT doc_id, text, 'de',
         len(list_intersect(t, ['der','die','und','das','von','zu','den','mit','ist','im'])) FROM toks
  UNION ALL
  SELECT doc_id, text, 'fr',
         len(list_intersect(t, ['le','la','de','et','les','des','en','du','une','est'])) FROM toks
), best AS (
  SELECT doc_id, text, lang, h,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h DESC, lang DESC) AS rn
  FROM hits
)
SELECT doc_id,
       CASE WHEN length(regexp_replace(text, '[^一-鿿]', '', 'g')) * 2 > length(text) THEN 'zh'
            WHEN h > 0 THEN lang
            ELSE 'und' END AS pred_lang
FROM best WHERE rn = 1
""",
    "sim_bruteforce_topk": f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10
), c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id, {_cos_expr('qv', 'cv')} AS cos_sim
  FROM c, q WHERE neighbor_id != query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
""",
    "sim_knn_classify": f"""
WITH c AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), ranked AS (
  SELECT q.vec_id AS query_id, n.label AS nlabel,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY {_cos_expr('q.v', 'n.v')} DESC, n.vec_id)
           AS rank
  FROM c q JOIN c n ON q.vec_id <> n.vec_id
  WHERE q.vec_id % 10 = 0
), cnt AS (
  SELECT query_id, nlabel, COUNT(*) AS v
  FROM ranked WHERE rank <= 5 GROUP BY 1, 2
), pred AS (
  SELECT query_id, nlabel AS pred_label FROM (
    SELECT query_id, nlabel,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY v DESC, nlabel) AS rn
    FROM cnt) WHERE rn = 1
)
SELECT e.label AS true_label, p.pred_label, COUNT(*) AS n_vectors
FROM pred p JOIN embeddings e ON p.query_id = e.vec_id
GROUP BY 1, 2
""",
    "multimodal_features": """
SELECT doc_id AS asset_id, 'image' AS media_type,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       md5(text) AS digest
FROM documents
""",
    "asof_pairs_spread": """
WITH fbars AS (
  SELECT 'P' || CAST(l_partkey AS VARCHAR) AS symbol,
         CAST(l_shipdate AS DATE) AS trade_date,
         CAST(arg_max(l_extendedprice, l_orderkey * 10 + l_linenumber) AS DECIMAL(18,4)) AS close
  FROM lineitem
  WHERE l_partkey IN (3, 7, 11, 19)
  GROUP BY 1, 2
), leg_a AS (
  SELECT CASE symbol WHEN 'P3' THEN 3 WHEN 'P11' THEN 11 END AS pair_id,
         trade_date, close AS close_a
  FROM fbars WHERE symbol IN ('P3', 'P11')
), leg_b AS (
  SELECT CASE symbol WHEN 'P7' THEN 3 WHEN 'P19' THEN 11 END AS pair_id,
         trade_date, close AS close_b
  FROM fbars WHERE symbol IN ('P7', 'P19')
)
SELECT a.pair_id, a.trade_date,
       CAST(a.close_a AS DOUBLE) AS close_a,
       CAST(b.close_b AS DOUBLE) AS close_b,
       b.trade_date AS b_date,
       CAST(a.close_a - b.close_b AS DOUBLE) AS spread
FROM leg_a a ASOF LEFT JOIN leg_b b
  ON a.pair_id = b.pair_id AND a.trade_date >= b.trade_date
""",
    "asof_event_bars": BARS_SQL
    + """
, ev AS (
  SELECT event_id,
         'P' || CAST(user_id % 200 AS VARCHAR) AS symbol,
         DATE '1995-01-01'
           + CAST((EXTRACT(DAY FROM ts) * 73 + user_id * 7) % 2400 AS INT) AS event_date
  FROM events
)
SELECT e.event_id, e.symbol, e.event_date, b.trade_date AS bar_date,
       CAST(b.close AS DOUBLE) AS close
FROM ev e ASOF JOIN bars b
  ON e.symbol = b.symbol AND e.event_date >= b.trade_date
""",
    "text_token_count": """
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens
FROM documents
""",
    "text_quality_score": """
SELECT doc_id,
       CAST(length(text) AS INT) AS n_chars,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
       CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS INT) AS n_punct,
       CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                            t -> lower(t) IN ('the','a','of','and','to','in','is'))) AS INT)
         AS n_stopwords
FROM documents
""",
    "text_fingerprint": """
SELECT doc_id, md5(lower(trim(text))) AS fingerprint FROM documents
""",
    "text_pii_scrub": """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b')) AS INT) AS n_phones,
       md5(regexp_replace(
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b', '<PHONE>', 'g')) AS redacted_digest
FROM documents
""",
    "text_repetition_stats": """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1])) AS bigram
  FROM toks
), bgc AS (
  SELECT doc_id, MAX(c) AS top_bigram_count
  FROM (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2)
  GROUP BY 1
), stats AS (
  SELECT doc_id, len(ts) AS n_tokens, len(list_distinct(ts)) AS n_distinct FROM toks
)
SELECT s.doc_id,
       CAST(s.n_tokens AS INT) AS n_tokens,
       1.0 - CAST(s.n_distinct AS DOUBLE) / s.n_tokens AS dup_unigram_frac,
       CAST(COALESCE(b.top_bigram_count, 0) AS INT) AS top_bigram_count,
       2.0 * COALESCE(b.top_bigram_count, 0) / s.n_tokens AS top_bigram_frac
FROM stats s LEFT JOIN bgc b USING (doc_id)
""",
    "text_length_quantiles": """
SELECT source,
       COUNT(*) AS n_docs,
       quantile_cont(CAST(n_chars AS DOUBLE), 0.25) AS p25_chars,
       quantile_cont(CAST(n_chars AS DOUBLE), 0.5)  AS median_chars,
       quantile_cont(CAST(n_chars AS DOUBLE), 0.75) AS p75_chars,
       AVG(CAST(n_chars AS DOUBLE)) AS mean_chars
FROM documents
GROUP BY source
""",
}

ORACLES.update(
    {
        "text_vocab_topk": r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
  FROM documents
)
SELECT token, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
FROM toks GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT 100
""",
        "text_tfidf_topterms": r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         t.tf * (CAST(10000 AS BIGINT) * (SELECT COUNT(*) FROM documents) // d.df)
           AS score_scaled
  FROM tf t JOIN dfreq d USING (term)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score_scaled DESC, term) AS rnk
  FROM scored
)
SELECT doc_id, term, CAST(tf AS INT) AS tf, CAST(df AS INT) AS df,
       score_scaled, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 3
""",
        "corpus_filter_funnel": r"""
WITH sig AS (
  SELECT len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens,
         length(regexp_replace(text, '\s', '', 'g')) AS n_nospace,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
         length(text) AS n_chars,
         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS n_stop
  FROM documents
)
SELECT COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN n_tokens < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_too_short,
       CAST(SUM(CASE WHEN n_nospace > 12 * n_tokens THEN 1 ELSE 0 END) AS BIGINT) AS n_long_words,
       CAST(SUM(CASE WHEN 2 * n_alpha < n_chars THEN 1 ELSE 0 END) AS BIGINT) AS n_low_alpha,
       CAST(SUM(CASE WHEN n_stop = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_no_stopword,
       CAST(SUM(CASE WHEN n_tokens >= 5 AND n_nospace <= 12 * n_tokens
                      AND 2 * n_alpha >= n_chars AND n_stop > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM sig
""",
        "sample_stratified": """
WITH b AS (
  SELECT lang, n_chars,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100
           AS bucket
  FROM documents
)
SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS kept_chars
FROM b
WHERE bucket < (CASE WHEN lang = 'en' THEN 80
                     WHEN lang = 'de' THEN 50
                     ELSE 10 END)
GROUP BY 1 ORDER BY 1
""",
    }
)

_ASOF_EV_SQL = """
, ev AS (
  SELECT event_id,
         'P' || CAST(user_id % 200 AS VARCHAR) AS symbol,
         DATE '1995-01-01'
           + CAST((EXTRACT(DAY FROM ts) * 73 + user_id * 7) % 2400 AS INT) AS event_date
  FROM events
)
"""

ORACLES.update(
    {
        "asof_event_bars_fwd": BARS_SQL
        + _ASOF_EV_SQL
        + """
SELECT e.event_id, e.symbol, e.event_date, b.trade_date AS bar_date,
       CAST(b.close AS DOUBLE) AS close
FROM ev e ASOF JOIN bars b
  ON e.symbol = b.symbol AND e.event_date <= b.trade_date
""",
        "asof_event_bars_tol": BARS_SQL
        + _ASOF_EV_SQL
        + """
SELECT e.event_id, e.symbol, e.event_date,
       CASE WHEN e.event_date - b.trade_date > 7 THEN NULL
            ELSE b.trade_date END AS bar_date,
       CASE WHEN e.event_date - b.trade_date > 7 THEN NULL
            ELSE CAST(b.close AS DOUBLE) END AS close
FROM ev e ASOF LEFT JOIN bars b
  ON e.symbol = b.symbol AND e.event_date >= b.trade_date
""",
    }
)

from securities_pricing_data_pipeline_spark.llmdata.sketch import bloom_oracle_sql  # noqa: E402

ORACLES["sketch_bloom_custkeys"] = bloom_oracle_sql(
    "orders", "o_custkey", "customer", "c_custkey", k=3, m_bits=4096
)


ORACLES["sim_rrf_fusion"] = f"""
WITH bf AS (SELECT * FROM ({ORACLES["sim_bruteforce_topk"]})),
lsh AS (SELECT * FROM ({_lsh_topk_oracle_sql()})),
u AS (
  SELECT query_id, neighbor_id, rank FROM bf
  UNION ALL
  SELECT query_id, neighbor_id, rank FROM lsh
), scored AS (
  SELECT query_id, neighbor_id,
         SUM(CAST(round(1e12 / (60.0 + rank)) AS BIGINT)) AS rrf_units,
         CAST(COUNT(*) AS INT) AS n_lists
  FROM u GROUP BY 1, 2
), fused AS (
  SELECT query_id, neighbor_id, rrf_units, n_lists,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY rrf_units DESC, neighbor_id) AS fused_rank
  FROM scored
)
SELECT query_id, neighbor_id,
       CAST(rrf_units AS DOUBLE) / 1e12 AS rrf_score,
       n_lists, CAST(fused_rank AS INT) AS fused_rank
FROM fused WHERE fused_rank <= 5
"""


ORACLES["sim_ivf_recall_eval"] = f"""
WITH bf AS (SELECT query_id, neighbor_id FROM ({ORACLES["sim_bruteforce_topk"]})),
iv AS (SELECT query_id, neighbor_id FROM ({ORACLES["sim_ivf_topk"]})),
t AS (
  SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
         COUNT(*) AS n_true
  FROM bf
), h AS (
  SELECT COUNT(*) AS n_hits
  FROM (SELECT query_id, neighbor_id FROM iv INTERSECT SELECT query_id, neighbor_id FROM bf)
)
SELECT t.n_queries, CAST(5 AS INT) AS k, CAST(h.n_hits AS BIGINT) AS n_hits,
       CAST(h.n_hits AS DOUBLE) / t.n_true AS recall_at_k
FROM t, h
"""

ORACLES["sim_pq_adc_recall"] = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), bf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_sum(list_transform(list_zip(q.vec, c.vec),
               p -> CAST(round((p[1] - p[2]) * (p[1] - p[2]) * 1e13) AS BIGINT))),
             c.vec_id) AS rank
    FROM v q JOIN v c ON q.vec_id <> c.vec_id
    WHERE q.vec_id % 50 = 0
  ) WHERE rank <= 5
), adc AS (
  SELECT query_id, neighbor_id FROM ({ORACLES["sim_pq_adc_topk"]})
), t AS (
  SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
         COUNT(*) AS n_true
  FROM bf
), h AS (
  SELECT COUNT(*) AS n_hits
  FROM (SELECT query_id, neighbor_id FROM adc INTERSECT SELECT query_id, neighbor_id FROM bf)
)
SELECT t.n_queries, CAST(5 AS INT) AS k, CAST(h.n_hits AS BIGINT) AS n_hits,
       CAST(h.n_hits AS DOUBLE) / t.n_true AS recall_at_k
FROM t, h
"""

ORACLES["text_chunk_windows"] = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), n AS (
  SELECT doc_id, t, len(t) AS n FROM toks
), chunks AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, CAST(ceil(greatest(n - 40, 0) / 20.0) AS BIGINT) + 1),
           i -> struct_pack(
             idx := i,
             txt := array_to_string(t[i*20+1 : least(i*20+40, n)], ' ')))) AS c
  FROM n
)
SELECT doc_id, CAST(c.idx AS INT) AS chunk_idx, c.txt AS chunk_text,
       CAST(len(string_split(c.txt, ' ')) AS INT) AS n_tokens
FROM chunks
"""


ORACLES["corpus_mix_plan"] = r"""
WITH per_source AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS avail_tokens
  FROM documents GROUP BY source
), weighted AS (
  SELECT *,
         CASE source WHEN 'src0' THEN 60 WHEN 'src1' THEN 30
                     WHEN 'src2' THEN 10 ELSE 0 END AS w
  FROM per_source
)
SELECT source, n_docs, avail_tokens,
       CAST(w AS INT) AS weight_pct,
       CAST(20000 * w // 100 AS BIGINT) AS requested_tokens,
       least(CAST(20000 * w // 100 AS BIGINT), avail_tokens) AS planned_tokens,
       CAST(20000 * w // 100 AS BIGINT)
         - least(CAST(20000 * w // 100 AS BIGINT), avail_tokens) AS shortfall_tokens,
       CAST(least(CAST(20000 * w // 100 AS BIGINT), avail_tokens) AS DOUBLE)
         / avail_tokens AS sample_fraction
FROM weighted ORDER BY source
"""


ORACLES["dedup_minhash_eval"] = f"""
WITH cand AS (SELECT id_a, id_b FROM ({ORACLES["dedup_minhash_lsh"]})),
truth AS (SELECT id_a, id_b FROM ({ORACLES["dedup_ngram_jaccard"]})),
hit AS (SELECT * FROM cand WHERE EXISTS (
  SELECT 1 FROM truth t WHERE t.id_a = cand.id_a AND t.id_b = cand.id_b))
SELECT (SELECT COUNT(*) FROM cand) AS n_candidates,
       (SELECT COUNT(*) FROM truth) AS n_true_pairs,
       (SELECT COUNT(*) FROM hit) AS n_hits,
       CAST((SELECT COUNT(*) FROM hit) AS DOUBLE)
         / (SELECT COUNT(*) FROM cand) AS precision,
       CAST((SELECT COUNT(*) FROM hit) AS DOUBLE)
         / (SELECT COUNT(*) FROM truth) AS recall
"""


ORACLES["text_segment_dedup"] = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents
), nn AS (
  SELECT doc_id, t, len(t) AS n FROM toks
), segs AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, greatest(CAST(ceil(n / 10.0) AS BIGINT), 1)),
           i -> array_to_string(t[i*10+1 : i*10+10], ' '))) AS seg
  FROM nn
), freq AS (
  SELECT seg, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY 1
)
SELECT s.doc_id,
       CAST(COUNT(*) AS INT) AS n_segments,
       CAST(SUM(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segments,
       CAST(SUM(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS dup_segment_frac
FROM segs s JOIN freq f USING (seg)
GROUP BY 1
"""

ORACLES["export_shard_plan"] = """
WITH h AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 8 AS INT) AS shard,
         CAST(('0x' || substr(md5('order:' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS ord
  FROM documents
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord, doc_id) - 1 AS BIGINT)
         AS pos
FROM h
"""


ORACLES["dedup_cluster_size_hist"] = f"""
WITH cc AS (SELECT * FROM ({ORACLES["dedup_cluster_canonical"]})),
sizes AS (SELECT cluster_id, COUNT(*) AS sz FROM cc GROUP BY 1)
SELECT sz AS cluster_size, COUNT(*) AS n_clusters,
       CAST(COUNT(*) * (sz - 1) AS BIGINT) AS n_docs_removed
FROM sizes GROUP BY sz
"""

ORACLES["dedup_source_overlap"] = f"""
WITH p AS (SELECT id_a, id_b FROM ({_minhash_oracle_sql()}))
SELECT least(d1.source, d2.source) AS source_a,
       greatest(d1.source, d2.source) AS source_b,
       COUNT(*) AS n_pairs
FROM p JOIN documents d1 ON p.id_a = d1.doc_id
       JOIN documents d2 ON p.id_b = d2.doc_id
GROUP BY 1, 2
"""


def text_bm25_topdocs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents by BM25 for the fixed query {spark, join, filter}
    — sparse retrieval over the corpus (see ``llmdata.text.bm25_topdocs``
    for the scaled-rational exactness discipline)."""
    from securities_pricing_data_pipeline_spark.llmdata.text import bm25_topdocs

    return bm25_topdocs(
        load(spark, sf_dir, "documents"), ["spark", "join", "filter"], k=10,
        term_tf=_bm25_postings(spark, sf_dir),
    )


def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-token pairs — the first BPE merge candidates a
    tokenizer trainer would score (``llmdata.text.bpe_pair_counts``)."""
    from securities_pricing_data_pipeline_spark.llmdata.text import bpe_pair_counts

    return bpe_pair_counts(load(spark, sf_dir, "documents"), k=20)


QUERIES["text_bm25_topdocs"] = text_bm25_topdocs
QUERIES["text_bpe_pair_counts"] = text_bpe_pair_counts

ORACLES["text_bm25_topdocs"] = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
  FROM documents
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1
), totals AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS t_tokens FROM dl
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN ('spark', 'join', 'filter') GROUP BY 1, 2
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT t.doc_id, l.dl,
         (10000 * o.n_docs // d.df)
           * (CAST(220000 AS HUGEINT) * t.tf * o.t_tokens
              // (CAST(10 AS HUGEINT) * t.tf * o.t_tokens
                  + CAST(3 AS HUGEINT) * o.t_tokens
                  + CAST(9 AS HUGEINT) * l.dl * o.n_docs)) AS term_score
  FROM tf t JOIN dfreq d USING (term) JOIN dl l USING (doc_id), totals o
), per_doc AS (
  SELECT doc_id, MIN(dl) AS dl,
         CAST(SUM(term_score) AS BIGINT) AS score_scaled
  FROM scored GROUP BY 1
)
SELECT doc_id, dl, score_scaled,
       CAST(row_number() OVER (ORDER BY score_scaled DESC, doc_id) AS INT) AS rnk
FROM per_doc ORDER BY score_scaled DESC, doc_id LIMIT 10
"""

ORACLES["text_bpe_pair_counts"] = r"""
WITH arrs AS (
  SELECT string_split_regex(lower(trim(text)), '\s+') AS arr FROM documents
), pr AS (
  SELECT unnest(list_transform(generate_series(1, len(arr) - 1),
                               i -> struct_pack(a := arr[i], b := arr[i + 1]))) AS p
  FROM arrs WHERE len(arr) >= 2
)
SELECT p.a AS a, p.b AS b, COUNT(*) AS n_pairs
FROM pr GROUP BY 1, 2 ORDER BY n_pairs DESC, a, b LIMIT 20
"""


def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY a fixed BPE merge table (``llmdata.text.BPE_MERGES``) to
    every document — the tokenizer-apply side that ``text_bpe_pair_counts``
    trains for, and the exact-count twin of ``text_token_count_bpe``'s
    regex heuristic. Emits per doc the exact post-merge token count,
    input chars, and the first word's encoding as a visible sample.

    Parity: the DuckDB oracle replays the SAME merge table through the
    SAME expression generator (``bpe_encode_expr``, dialect='duckdb') —
    greedy left-fold per merge pass in both engines, so equality is
    structural. Plan: one map-side projection, ZERO shuffles — the
    oracle gate compares rows order-insensitively, so no final sort
    (a trailing global ORDER BY on a corpus-sized projection is a full
    range-partition pass at 100 TB for nothing)."""
    from securities_pricing_data_pipeline_spark.llmdata.text import bpe_encode

    return bpe_encode(load(spark, sf_dir, "documents"))


QUERIES["text_bpe_encode"] = text_bpe_encode


def _bpe_encode_oracle() -> str:
    from securities_pricing_data_pipeline_spark.llmdata.text import bpe_encode_expr

    enc_w = bpe_encode_expr("w", dialect="duckdb")
    return rf"""
WITH w AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS words
  FROM documents
)
SELECT doc_id,
  CAST(len(words) AS BIGINT) AS n_words,
  CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT)
    AS n_input_chars,
  CAST(list_sum(list_transform(words,
       w -> len(string_split({enc_w}, ' ')))) AS BIGINT) AS n_bpe_tokens,
  (list_transform(words[1:1], w -> {enc_w}))[1] AS first_word_encoding
FROM w ORDER BY doc_id
"""


ORACLES["text_bpe_encode"] = _bpe_encode_oracle()


def emb_int8_quant_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization of the embedding column
    with per-label reconstruction-error accounting — the compression
    audit run before shipping an ANN index or a quantized training
    corpus (the same scalar-quantization model FAISS's SQ8 uses:
    q_i = round(127·x_i / max|x|), dequant x̂_i = q_i·max|x|/127).

    Exactness: vectors snap to the 1e6 integer grid first (the repo-wide
    embedding discipline), then BOTH the quantizer and the dequantizer
    are pure-integer round-half-away-from-zero rationals over positive
    operands — q_a = (254·|g_i| + m) DIV (2m), r_a = (2·q_a·m + 127) DIV
    254 — so every engine computes identical codes, identical
    reconstructions, and an exact int64 squared-error sum; the only
    float op is the final RMS division+sqrt on exact scalars.
    Zero vectors quantize to all-zero codes via the max(m, 1) guard
    instead of dividing by zero. Magnitudes: per-dim err ≤ m/254 ≈ 4e3
    grid units at unit-norm inputs, so the per-label SSE stays far under
    2^63 up to ~10^12 vectors; widen the sum to DECIMAL(38,0) past that.

    Scale shape: everything before the label rollup is per-row codegen
    expressions (transform/aggregate HOFs — no Python, no shuffle); the
    one shuffle carries (label, count, sse) partial aggregates. At
    100 TB this is the ideal embarrassing-parallel sweep."""
    emb = load(spark, sf_dir, "embeddings")
    g = emb.withColumn(
        "g",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 1000000.0) as bigint))"
        ),
    ).withColumn(
        "m", F.expr("greatest(array_max(transform(g, a -> abs(a))), 1L)")
    )
    errs = g.withColumn(
        "sse",
        F.expr(
            "aggregate(g, 0L, (acc, gi) -> acc + "
            " (gi - (case when gi < 0 then -1 else 1 end)"
            "       * ((2 * ((254 * abs(gi) + m) div (2 * m)) * m + 127) div 254))"
            " * (gi - (case when gi < 0 then -1 else 1 end)"
            "       * ((2 * ((254 * abs(gi) + m) div (2 * m)) * m + 127) div 254)))"
        ),
    )
    agg = errs.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.sum(F.size("embedding")).alias("total_dims"),
        F.sum("sse").alias("total_sse"),
    )
    return agg.select(
        "label",
        "n_vectors",
        "total_dims",
        "total_sse",
        F.sqrt(
            F.col("total_sse").cast("double") / F.col("total_dims").cast("double")
        ).alias("rms_err_grid"),
    )


QUERIES["emb_int8_quant_error"] = emb_int8_quant_error

ORACLES["emb_int8_quant_error"] = """
WITH g AS (
  SELECT label,
         len(embedding) AS dims,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS gv
  FROM embeddings
), m AS (
  SELECT label, dims, gv,
         greatest(list_max(list_transform(gv, a -> abs(a))), 1) AS mx
  FROM g
), sse AS (
  SELECT label, dims,
         list_sum(list_transform(gv, gi ->
           (gi - (CASE WHEN gi < 0 THEN -1 ELSE 1 END)
                 * ((2 * ((254 * abs(gi) + mx) // (2 * mx)) * mx + 127) // 254))
           * (gi - (CASE WHEN gi < 0 THEN -1 ELSE 1 END)
                 * ((2 * ((254 * abs(gi) + mx) // (2 * mx)) * mx + 127) // 254))
         )) AS sse
  FROM m
)
SELECT label,
       COUNT(*) AS n_vectors,
       CAST(SUM(dims) AS BIGINT) AS total_dims,
       CAST(SUM(sse) AS BIGINT) AS total_sse,
       sqrt(CAST(SUM(sse) AS DOUBLE) / CAST(SUM(dims) AS DOUBLE)) AS rms_err_grid
FROM sse GROUP BY 1
"""


QUERIES["multimodal_gif_pixels"] = multimodal_gif_pixels

ORACLES["multimodal_gif_pixels"] = """
WITH params AS (
  SELECT doc_id AS asset_id, doc_id AS did,
         CAST(5 + doc_id % 9 AS BIGINT) AS w,
         CAST(4 + doc_id % 7 AS BIGINT) AS h
  FROM documents
), grid AS (
  -- GIF is lossless: decode -> nearest resample -> P6 is constructible
  -- arithmetically from the stripe pattern at the resampled source px
  SELECT p.asset_id, p.did, j.j, i.i,
         ((i.i * p.w) // 16 + (j.j * p.h) // 16 + p.did) % 4 AS k
  FROM params p
  CROSS JOIN generate_series(0, 15) AS j(j)
  CROSS JOIN generate_series(0, 15) AS i(i)
), body AS (
  SELECT asset_id,
         string_agg(chr(CAST(32 + (did * (k + 1)) % 96 AS INT))
                    || chr(CAST(32 + (did * (k + 3)) % 96 AS INT))
                    || chr(CAST(32 + (did * (k + 7)) % 96 AS INT)),
                    '' ORDER BY j, i) AS s
  FROM grid GROUP BY asset_id
), payload AS (
  SELECT asset_id,
         'P6' || chr(10) || '16 16' || chr(10) || '255' || chr(10) || s AS s
  FROM body
)
SELECT asset_id,
       CAST(octet_length(encode(s)) AS INT) AS n_bytes,
       md5(hex(encode(s))) AS digest,
       'gif' AS codec
FROM payload
"""



def sim_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized retrieval (``llmdata.similarity.sq8_topk``):
    top-5 by asymmetric distance — full-precision query against the
    int8-dequantized corpus, the Faiss ``IndexScalarQuantizer`` shape.
    Completes the quantized-retrieval family next to PQ/ADC
    (codebook quantization) and IVF-PQ (coarse+fine): SQ8 is the
    no-codebook variant a pipeline reaches for first, because its codes
    need no training pass. Same 10-query set as sim_bruteforce_topk, so
    the recall audit (sim_sq8_recall) is a direct overlay."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import sq8_topk

    emb = load(spark, sf_dir, "embeddings")
    return sq8_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


QUERIES["sim_sq8_topk"] = sim_sq8_topk

# DuckDB twin of llmdata.similarity.sq8_topk: identical snap grid,
# identical integer quantize/dequantize rationals, identical int64 dot
# and norm sums; the single cos division is IEEE-identical.
ORACLES["sim_sq8_topk"] = """
WITH base AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS g
  FROM embeddings
), gm AS (
  SELECT vec_id, g,
         greatest(list_max(list_transform(g, a -> abs(a))), 1) AS m
  FROM base
), rec AS (
  SELECT vec_id, g,
         list_transform(g, gi -> (CASE WHEN gi < 0 THEN -1 ELSE 1 END)
             * ((2 * ((254 * abs(gi) + m) // (2 * m)) * m + 127) // 254)) AS r
  FROM gm
), c AS (
  SELECT vec_id AS neighbor_id, r,
         CAST(list_sum(list_transform(r, x -> x * x)) AS BIGINT) AS rn
  FROM rec
), q AS (
  SELECT vec_id AS query_id, g AS qg,
         CAST(list_sum(list_transform(g, x -> x * x)) AS BIGINT) AS qn
  FROM rec WHERE vec_id < 10
), scored AS (
  SELECT query_id, neighbor_id,
         CASE WHEN qn = 0 OR rn = 0 THEN 0.0
              ELSE CAST(CAST(list_sum(list_transform(list_zip(qg, r),
                       p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
                   / sqrt(CAST(qn AS DOUBLE) * CAST(rn AS DOUBLE)) END AS cos_sq8
  FROM c, q WHERE neighbor_id != query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_sq8,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sq8 DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sq8, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
"""


def sim_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the SQ8 quantized ranking against exact-cosine ground
    truth on the same 10-query set — the audit run before trusting SQ8
    codes at corpus scale (the PQ family's sim_pq_adc_recall, for the
    scalar quantizer). Counts are ints; the one ratio is an int÷int
    double division — engine-stable."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import sq8_topk

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    truth = _bf_truth10_silver(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )  # shared session truth silver (r15): one exact pass per session
    approx = sq8_topk(emb, q, k=5).select("query_id", "neighbor_id")
    hits = approx.join(truth, ["query_id", "neighbor_id"], "left_semi")
    t = truth.agg(
        F.count_distinct("query_id").alias("n_queries"),
        F.count("*").alias("n_true"),
    )
    h = hits.agg(F.count("*").alias("n_hits"))
    return t.join(h).select(
        "n_queries",
        F.lit(5).cast("int").alias("k"),
        F.col("n_hits").cast("long").alias("n_hits"),
        (F.col("n_hits").cast("double") / F.col("n_true")).alias("recall_at_k"),
    )


QUERIES["sim_sq8_recall"] = sim_sq8_recall

ORACLES["sim_sq8_recall"] = f"""
WITH bf AS (
  SELECT query_id, neighbor_id FROM ({ORACLES["sim_bruteforce_topk"]})
), sq AS (
  SELECT query_id, neighbor_id FROM ({ORACLES["sim_sq8_topk"]})
), t AS (
  SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
         COUNT(*) AS n_true
  FROM bf
), h AS (
  SELECT COUNT(*) AS n_hits
  FROM (SELECT query_id, neighbor_id FROM sq
        INTERSECT SELECT query_id, neighbor_id FROM bf)
)
SELECT t.n_queries, CAST(5 AS INT) AS k, CAST(h.n_hits AS BIGINT) AS n_hits,
       CAST(h.n_hits AS DOUBLE) / t.n_true AS recall_at_k
FROM t, h
"""


def emb_dim_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension-pair covariance and Pearson correlation of the
    embedding space (``llmdata.similarity.dim_covariance``) — the
    dimension-collapse/redundancy audit next to emb_norm_stats (norms)
    and emb_int8_quant_error (quantization): d(d+1)/2 rows of exact
    DECIMAL(38,0) moments with one double division each; in-row
    upper-triangle products, no self-join."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import (
        dim_covariance,
    )

    return dim_covariance(load(spark, sf_dir, "embeddings"))


QUERIES["emb_dim_covariance"] = emb_dim_covariance

ORACLES["emb_dim_covariance"] = """
WITH g AS (
  SELECT list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS g
  FROM embeddings
), pr AS (
  SELECT p.i AS i, p.j AS j, p.xy AS xy FROM (
    SELECT unnest(flatten(list_transform(generate_series(0, len(g) - 1), i ->
           list_transform(generate_series(i, len(g) - 1), j ->
           struct_pack(i := i, j := j, xy := g[i + 1] * g[j + 1]))))) AS p
    FROM g
  )
), pairs AS (
  SELECT i, j, COUNT(*) AS n, SUM(CAST(xy AS DECIMAL(38,0))) AS sxy
  FROM pr GROUP BY 1, 2
), mg AS (
  SELECT m.i AS i, m.x AS x FROM (
    SELECT unnest(list_transform(generate_series(0, len(g) - 1), i ->
           struct_pack(i := i, x := g[i + 1]))) AS m
    FROM g
  )
), marg AS (
  SELECT i, SUM(CAST(x AS DECIMAL(38,0))) AS sx,
         SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx
  FROM mg GROUP BY 1
)
SELECT CAST(p.i AS INT) AS i, CAST(p.j AS INT) AS j,
       CAST(p.n AS BIGINT) AS n_vectors,
       CAST(CAST(p.n AS DECIMAL(38,0)) * p.sxy - a.sx * b.sx AS DOUBLE)
         / CAST(CAST(p.n AS DECIMAL(38,0)) * CAST(p.n AS DECIMAL(38,0)) AS DOUBLE)
         / 1e12 AS cov,
       CASE WHEN CAST(CAST(p.n AS DECIMAL(38,0)) * a.sxx - a.sx * a.sx AS DOUBLE) <= 0
              OR CAST(CAST(p.n AS DECIMAL(38,0)) * b.sxx - b.sx * b.sx AS DOUBLE) <= 0
            THEN NULL
            ELSE CAST(CAST(p.n AS DECIMAL(38,0)) * p.sxy - a.sx * b.sx AS DOUBLE)
                 / sqrt(CAST(CAST(p.n AS DECIMAL(38,0)) * a.sxx - a.sx * a.sx AS DOUBLE)
                        * CAST(CAST(p.n AS DECIMAL(38,0)) * b.sxx - b.sx * b.sx AS DOUBLE))
       END AS corr
FROM pairs p JOIN marg a ON p.i = a.i JOIN marg b ON p.j = b.i
"""


def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component + explained-variance ratio of the embedding
    space via 3 unrolled power iterations over the exact covariance
    moments (``llmdata.similarity.pca_power_top``): corpus touched once,
    every iteration a d²-row matvec with floor-snapped integer carries —
    the PCA/whitening decision input, produced without any driver-side
    linear algebra. Oracle replays the identical rounds as a CTE chain."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import (
        pca_power_top,
    )

    return pca_power_top(load(spark, sf_dir, "embeddings"), iters=3)


QUERIES["emb_pca_power"] = emb_pca_power


def _pca_power_round_ctes(k: int) -> str:
    """DuckDB twins of pca_power_top's unrolled rounds: matvec with
    floor(C·v_units·1e3) 1e-12-unit sums, floored-square norm, floored
    1e-9-unit renormalized carry — op-for-op the Spark expressions."""
    parts = []
    prev = "v0"
    for r in range(1, k + 1):
        parts.append(f"""w{r} AS (
  SELECT s.i AS i,
         SUM(CAST(floor(s.cov * CAST(v.vu AS DOUBLE) * 1e3) AS BIGINT)) AS su
  FROM sym s JOIN {prev} v ON s.j = v.i GROUP BY 1
), n{r} AS (
  SELECT sqrt(CAST(SUM(CAST(floor((CAST(su AS DOUBLE) / 1e12)
                                  * (CAST(su AS DOUBLE) / 1e12) * 1e12) AS BIGINT))
                   AS DOUBLE) / 1e12) AS nrm
  FROM w{r}
), v{r} AS (
  SELECT i, CASE WHEN n{r}.nrm = 0 THEN CAST(0 AS BIGINT)
                 ELSE CAST(floor((CAST(su AS DOUBLE) / 1e12) / n{r}.nrm * 1e9) AS BIGINT)
            END AS vu
  FROM w{r}, n{r}
)""")
        prev = f"v{r}"
    return ",\n".join(parts)


ORACLES["emb_pca_power"] = f"""
WITH covf AS (
  SELECT i, j, cov FROM ({ORACLES["emb_dim_covariance"]})
), sym AS (
  SELECT i, j, cov FROM covf
  UNION ALL
  SELECT j AS i, i AS j, cov FROM covf WHERE i <> j
), v0 AS (
  SELECT DISTINCT i, CAST(125000000 AS BIGINT) AS vu FROM sym
),
{_pca_power_round_ctes(3)},
tr AS (
  SELECT CAST(SUM(CAST(floor(cov * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS trace
  FROM covf WHERE i = j
)
SELECT CAST(v.i AS INT) AS i,
       CAST(v.vu AS DOUBLE) / 1e9 AS loading,
       n3.nrm AS eigenvalue,
       CASE WHEN tr.trace <= 0 THEN NULL ELSE n3.nrm / tr.trace END AS explained_ratio
FROM v3 v, n3, tr
"""


def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking cross-document dedup stats
    (``llmdata.text.cdc_chunk_stats``, 8-gram boundary hash, ~64-char
    average chunks) — the offset-shift-robust twin of the fixed-window
    text_segment_dedup, completing the dedup family's chunking axis:
    fixed windows, winnowing fingerprints, substring anchor groups, and
    now content-defined chunks."""
    from securities_pricing_data_pipeline_spark.llmdata.text import cdc_chunk_stats

    return cdc_chunk_stats(load(spark, sf_dir, "documents"))


QUERIES["dedup_cdc_chunks"] = dedup_cdc_chunks

# DuckDB twin: identical 60-bit md5-prefix boundary hash, identical
# 1-based chunk slicing, identical digest-DF rollup.
ORACLES["dedup_cdc_chunks"] = """
WITH t AS (
  SELECT doc_id, text AS t FROM documents
), b AS (
  SELECT doc_id, t,
         CASE WHEN length(t) >= 9 THEN
           list_filter(generate_series(2, length(t) - 7),
             p -> CAST(('0x' || substr(md5(substr(t, p, 8)), 1, 15)) AS BIGINT)
                  % 64 = 0)
         ELSE [] END AS bnd
  FROM t
), s AS (
  SELECT doc_id, t, list_prepend(1, bnd) AS starts FROM b
), ch AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(starts)), i ->
           CASE WHEN i < len(starts)
                THEN substr(t, starts[i], starts[i + 1] - starts[i])
                ELSE substr(t, starts[i]) END)) AS chunk
  FROM s
), ex AS (
  SELECT doc_id AS id, md5(chunk) AS h FROM ch
), freq AS (
  SELECT h, COUNT(DISTINCT id) AS df FROM ex GROUP BY 1
), per AS (
  SELECT id, COUNT(*) AS n_chunks,
         SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS n_dup
  FROM ex JOIN freq USING (h) GROUP BY 1
)
SELECT id AS doc_id, CAST(n_chunks AS INT) AS n_chunks,
       CAST(n_dup AS BIGINT) AS n_dup_chunks,
       CAST(n_dup AS DOUBLE) / n_chunks AS dup_chunk_frac
FROM per
"""


def sim_bin_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit binary-signature retrieval
    (``llmdata.similarity.binary_hamming_topk``): sign bitmaps packed
    into 32-bit words, Hamming ranking, ties to the smaller id — the
    cheap-prefilter extreme of the quantization ladder, same 10-query
    set as the rest of the sim family."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import (
        binary_hamming_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    return binary_hamming_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


QUERIES["sim_bin_hamming_topk"] = sim_bin_hamming_topk

# DuckDB twin: identical grid sign test, identical 32-bit word packing
# (shifts <= 31, always positive), identical xor+bit_count Hamming fold.
_BIN_WORDS_SQL = """list_transform(generate_series(0, (len(g) + 31) // 32 - 1), w ->
           CAST(list_sum(list_transform(generate_series(w * 32, least(w * 32 + 31, len(g) - 1)), i ->
             CASE WHEN g[i + 1] > 0 THEN (CAST(1 AS BIGINT) << (i - w * 32))
                  ELSE CAST(0 AS BIGINT) END)) AS BIGINT))"""

ORACLES["sim_bin_hamming_topk"] = f"""
WITH base AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS g
  FROM embeddings
), sig AS (
  SELECT vec_id, {_BIN_WORDS_SQL} AS wds
  FROM base
), c AS (
  SELECT vec_id AS neighbor_id, wds AS cw FROM sig
), q AS (
  SELECT vec_id AS query_id, wds AS qw FROM sig WHERE vec_id < 10
), scored AS (
  SELECT query_id, neighbor_id,
         CAST(list_sum(list_transform(list_zip(qw, cw),
              p -> bit_count(xor(p[1], p[2])))) AS INT) AS hamming
  FROM c, q WHERE neighbor_id != query_id
), ranked AS (
  SELECT query_id, neighbor_id, hamming,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY hamming, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, hamming, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
"""


def sim_bin_hamming_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the 1-bit Hamming ranking against exact-cosine truth —
    what the 32× scan-compression costs in quality; read next to
    sim_sq8_recall (8-bit) and sim_pq_adc_recall (codebook) to pick the
    cheapest index that clears a recall bar."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import (
        binary_hamming_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    truth = _bf_truth10_silver(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )  # shared session truth silver (r15): one exact pass per session
    approx = binary_hamming_topk(emb, q, k=5).select("query_id", "neighbor_id")
    hits = approx.join(truth, ["query_id", "neighbor_id"], "left_semi")
    t = truth.agg(
        F.count_distinct("query_id").alias("n_queries"),
        F.count("*").alias("n_true"),
    )
    h = hits.agg(F.count("*").alias("n_hits"))
    return t.join(h).select(
        "n_queries",
        F.lit(5).cast("int").alias("k"),
        F.col("n_hits").cast("long").alias("n_hits"),
        (F.col("n_hits").cast("double") / F.col("n_true")).alias("recall_at_k"),
    )


QUERIES["sim_bin_hamming_recall"] = sim_bin_hamming_recall

ORACLES["sim_bin_hamming_recall"] = f"""
WITH bf AS (
  SELECT query_id, neighbor_id FROM ({ORACLES["sim_bruteforce_topk"]})
), bh AS (
  SELECT query_id, neighbor_id FROM ({ORACLES["sim_bin_hamming_topk"]})
), t AS (
  SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
         COUNT(*) AS n_true
  FROM bf
), h AS (
  SELECT COUNT(*) AS n_hits
  FROM (SELECT query_id, neighbor_id FROM bh
        INTERSECT SELECT query_id, neighbor_id FROM bf)
)
SELECT t.n_queries, CAST(5 AS INT) AS k, CAST(h.n_hits AS BIGINT) AS n_hits,
       CAST(h.n_hits AS DOUBLE) / t.n_true AS recall_at_k
FROM t, h
"""


def corpus_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift on document length between the
    train and holdout hash splits (``llmdata.sampling.ks_drift``) — the
    numeric-distribution twin of corpus_drift_kl's categorical-mix
    monitor, same stable md5 split. Exact integer ECDF cross-products in
    DECIMAL(38,0); one double division; argmax ties to the smallest
    length."""
    from securities_pricing_data_pipeline_spark.llmdata.sampling import ks_drift

    docs = load(spark, sf_dir, "documents")
    return ks_drift(docs, "n_chars")


QUERIES["corpus_drift_ks"] = corpus_drift_ks

ORACLES["corpus_drift_ks"] = """
WITH t AS (
  SELECT n_chars AS x,
         CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                   % 100 < 80
              THEN 1 ELSE 0 END AS is_tr
  FROM documents
), per_v AS (
  SELECT x, SUM(is_tr) AS ct, SUM(1 - is_tr) AS ch FROM t GROUP BY 1
), cum AS (
  SELECT x,
         SUM(ct) OVER (ORDER BY x) AS ca,
         SUM(ch) OVER (ORDER BY x) AS cb,
         SUM(ct) OVER () AS na,
         SUM(ch) OVER () AS nb,
         COUNT(*) OVER () AS nv
  FROM per_v
), scored AS (
  SELECT x, na, nb, nv,
         abs(CAST(ca AS DECIMAL(38,0)) * CAST(nb AS DECIMAL(38,0))
             - CAST(cb AS DECIMAL(38,0)) * CAST(na AS DECIMAL(38,0))) AS dnum
  FROM cum
)
SELECT CAST(na AS BIGINT) AS n_train,
       CAST(nb AS BIGINT) AS n_holdout,
       CAST(nv AS BIGINT) AS n_values,
       CAST(x AS BIGINT) AS ks_at,
       CAST(dnum AS DOUBLE)
         / CAST(CAST(na AS DECIMAL(38,0)) * CAST(nb AS DECIMAL(38,0)) AS DOUBLE) AS ks_stat
FROM scored ORDER BY dnum DESC, x LIMIT 1
"""


def dedup_simhash_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash candidate-quality eval: precision/recall of the Hamming≤3
    pigeonhole-LSH pairs against the same exact n-gram-Jaccard ground
    truth the MinHash eval scores against — closing the audit symmetry
    (every approximate dedup family ships with its measured quality,
    not just MinHash). Counts are ints; the two ratios are single
    int÷int double divisions — engine-stable."""
    # r15 (guide §2.4, VERDICT r14 item 8): the candidate pair frame
    # feeds TWO consumers (the hit semi-join and the n_candidates
    # total) — unpinned, the banded simhash pairing above the signature
    # silver replayed per consumer. One localCheckpoint = one pairing.
    cand = (
        dedup_simhash(spark, sf_dir)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    truth = _jaccard_pairs(spark, sf_dir).select("id_a", "id_b")
    hit = cand.join(truth, ["id_a", "id_b"], "left_semi")
    n_cand = cand.agg(F.count("*").alias("n_candidates"))
    n_truth = truth.agg(F.count("*").alias("n_true_pairs"))
    n_hit = hit.agg(F.count("*").alias("n_hits"))
    return (
        n_cand.join(n_truth)
        .join(n_hit)
        .select(
            "n_candidates",
            "n_true_pairs",
            "n_hits",
            (F.col("n_hits").cast("double") / F.col("n_candidates")).alias("precision"),
            (F.col("n_hits").cast("double") / F.col("n_true_pairs")).alias("recall"),
        )
    )


QUERIES["dedup_simhash_eval"] = dedup_simhash_eval

ORACLES["dedup_simhash_eval"] = f"""
WITH cand AS (SELECT id_a, id_b FROM ({ORACLES["dedup_simhash"]})),
truth AS (SELECT id_a, id_b FROM ({ORACLES["dedup_ngram_jaccard"]})),
hit AS (SELECT * FROM cand WHERE EXISTS (
  SELECT 1 FROM truth t WHERE t.id_a = cand.id_a AND t.id_b = cand.id_b))
SELECT (SELECT COUNT(*) FROM cand) AS n_candidates,
       (SELECT COUNT(*) FROM truth) AS n_true_pairs,
       (SELECT COUNT(*) FROM hit) AS n_hits,
       CAST((SELECT COUNT(*) FROM hit) AS DOUBLE)
         / (SELECT COUNT(*) FROM cand) AS precision,
       CAST((SELECT COUNT(*) FROM hit) AS DOUBLE)
         / (SELECT COUNT(*) FROM truth) AS recall
"""


def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-replica Poisson bootstrap of mean(l_quantity) over lineitem —
    the distributed uncertainty estimate for a corpus statistic in ONE
    scan (see ``llmdata.sampling.poisson_bootstrap_means`` for the
    deterministic Poisson(1) draw and the parity discipline)."""
    from securities_pricing_data_pipeline_spark.llmdata.sampling import (
        poisson_bootstrap_means,
    )

    li = load(spark, sf_dir, "lineitem")
    return poisson_bootstrap_means(
        li, "l_quantity", ["l_orderkey", "l_linenumber"], n_replicas=16
    )


QUERIES["sample_poisson_bootstrap"] = sample_poisson_bootstrap

ORACLES["sample_poisson_bootstrap"] = """
WITH keyed AS (
  SELECT l_quantity AS x,
         CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS k
  FROM lineitem
), grp AS (
  SELECT x, k, g.grp, md5(k || '-' || CAST(g.grp AS VARCHAR)) AS h
  FROM keyed, (SELECT unnest(generate_series(0, 1)) AS grp) g
), drawn AS (
  SELECT grp * 8 + w.wi AS replica, x,
         CAST(('0x' || substr(h, 1 + 4 * w.wi, 4)) AS BIGINT) AS u
  FROM grp, (SELECT unnest(generate_series(0, 7)) AS wi) w
), weighted AS (
  SELECT replica,
         CASE WHEN u < 24109 THEN 0 WHEN u < 48218 THEN 1 WHEN u < 60273 THEN 2
              WHEN u < 64291 THEN 3 WHEN u < 65296 THEN 4 WHEN u < 65497 THEN 5
              ELSE 6 END AS w,
         x
  FROM drawn
)
SELECT CAST(replica AS INT) AS replica,
       CAST(SUM(w) AS BIGINT) AS n_eff,
       CAST(SUM(w * CAST(x AS DECIMAL(38,6))) AS DOUBLE)
         / CAST(SUM(w) AS DOUBLE) AS mean_value
FROM weighted GROUP BY 1
"""


def sim_rerank_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieve -> rerank -> serve closer: rescore the RRF-fused candidate
    set (``sim_rrf_fusion``) with a deterministic cross-encoder-shaped
    linear blend of three features — the EXACT grid cosine between query
    and candidate (the expensive score the first-stage retrievers only
    approximated), the fused RRF score itself, and a document-length
    prior from the documents table (vec_id == doc_id in the testdata) —
    then re-rank per query. This is the standard second-stage shape: a
    cheap first stage nominates ~k candidates per query, the reranker
    spends its budget on candidates only, never the corpus.

    Parity discipline: every feature is a double derived from exact
    integers via the same expression in both engines (grid cosine =
    dotL/sqrt(naL*nbL); rrf_score = rrf_units/1e12; len_score =
    least(n_chars,1000)/1000), the blend weights 0.5/4.0/0.25 are exact
    binary fractions, and the three-term sum is left-associated
    identically in the Spark plan and the oracle SQL — so the blended
    doubles and the (blend DESC, neighbor_id) rerank order are
    bit-identical.

    Plan shape (100 TB posture): the fused candidate frame is tiny
    (n_queries x 5), so BOTH feature joins run as broadcast-hash probes
    on the big scans — ``embeddings`` is probed once for candidate
    vectors (query vectors are the usual collected-small side) and
    ``documents`` once for the length prior; no shuffle touches the
    corpus, and the final rank window partitions by query over <= 10
    rows per query."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import (
        cosine_with_norms,
        norm_grid,
    )

    emb = load(spark, sf_dir, "embeddings")
    docs = load(spark, sf_dir, "documents")
    fused = sim_rrf_fusion(spark, sf_dir).select(
        "query_id", "neighbor_id", "rrf_score", "fused_rank"
    )
    qv = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        norm_grid(F.col("embedding")).alias("q_norm"),
    )
    nv = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("n_vec"),
        norm_grid(F.col("embedding")).alias("n_norm"),
    )
    scored = (
        nv.join(F.broadcast(fused), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "rrf_score",
            "fused_rank",
            cosine_with_norms(
                F.col("q_vec"), F.col("n_vec"), F.col("q_norm"), F.col("n_norm")
            ).alias("cos_sim"),
        )
    )
    len_feat = docs.select(
        F.col("doc_id").alias("neighbor_id"),
        (F.least(F.col("n_chars"), F.lit(1000)).cast("double") / F.lit(1000.0)).alias(
            "len_score"
        ),
    )
    feat = len_feat.join(F.broadcast(scored), "neighbor_id")
    blend = (
        F.lit(0.5) * F.col("cos_sim")
        + F.lit(4.0) * F.col("rrf_score")
        + F.lit(0.25) * F.col("len_score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("blend_score"), "neighbor_id")
    return (
        feat.withColumn("blend_score", blend)
        .withColumn("rerank_rank", F.row_number().over(w).cast("int"))
        .select(
            "query_id",
            "neighbor_id",
            "cos_sim",
            "rrf_score",
            "len_score",
            "blend_score",
            "fused_rank",
            "rerank_rank",
        )
    )


QUERIES["sim_rerank_blend"] = sim_rerank_blend

ORACLES["sim_rerank_blend"] = f"""
WITH fused AS (SELECT * FROM ({ORACLES["sim_rrf_fusion"]})),
qv AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q
  FROM embeddings WHERE vec_id < 10
), nv AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS c FROM embeddings
), scored AS (
  SELECT f.query_id, f.neighbor_id, f.rrf_score, f.fused_rank,
         {_cos_expr('q', 'c')} AS cos_sim
  FROM fused f JOIN qv USING (query_id) JOIN nv USING (neighbor_id)
), feat AS (
  SELECT s.*, CAST(LEAST(d.n_chars, 1000) AS DOUBLE) / 1000.0 AS len_score
  FROM scored s JOIN documents d ON d.doc_id = s.neighbor_id
), b AS (
  SELECT *, 0.5 * cos_sim + 4.0 * rrf_score + 0.25 * len_score AS blend_score
  FROM feat
)
SELECT query_id, neighbor_id, cos_sim, rrf_score, len_score, blend_score,
       fused_rank,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY blend_score DESC, neighbor_id) AS INT)
         AS rerank_rank
FROM b
"""


def text_bigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM (Laplace-smoothed) perplexity proxy per document — see
    ``llmdata.text.bigram_logppl`` for the model, scale shape, and the
    decimal-snap parity contract it shares with ``text_unigram_logppl``."""
    from securities_pricing_data_pipeline_spark.llmdata.text import bigram_logppl

    return bigram_logppl(load(spark, sf_dir, "documents"))


QUERIES["text_bigram_logppl"] = text_bigram_logppl

ORACLES["text_bigram_logppl"] = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM documents
), toks AS (
  SELECT unnest(t) AS tok FROM t
), uni AS (
  SELECT tok, COUNT(*) AS cu FROM toks GROUP BY 1
), vv AS (
  SELECT COUNT(DISTINCT tok) AS v FROM toks
), bg AS (
  SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
           i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS p
    FROM t WHERE len(t) >= 2
  )
), big AS (
  SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY 1, 2
), nll AS (
  SELECT g.doc_id,
         CAST(-ln(CAST(b.cb + 1 AS DOUBLE)
                  / CAST(u.cu + (SELECT v FROM vv) AS DOUBLE))
              AS DECIMAL(38,12)) AS nll
  FROM bg g JOIN big b USING (w1, w2) JOIN uni u ON u.tok = g.w1
)
SELECT doc_id, CAST(COUNT(*) AS INT) AS n_bigrams,
       CAST(CAST(CAST(SUM(nll) AS DOUBLE) / COUNT(*) AS DECIMAL(20,9)) AS DOUBLE)
         AS avg_nll
FROM nll GROUP BY doc_id
"""


def text_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's perplexity-bucket selection (Wenzek et al. 2020 §4.3): score
    every document with the bigram-LM proxy (text_bigram_logppl), split
    the corpus into head / middle / tail TERTILES by perplexity, report
    each bucket's size and mean score/length — the table a curator reads
    before keeping head+middle and dropping tail.

    Buckets come from exact tertile THRESHOLDS, not a global ntile: the
    per-doc scores collapse to a (distinct score, count) frame first
    (scores live on a 1e-9 snap grid, so the distinct set is small), the
    two cut values ride one post-reduction cumulative window — cut_k =
    min{v : 3·cum(v) ≥ k·n} — and docs bucket by broadcast comparison.
    Threshold semantics (ties share a bucket) is also what CCNet does,
    and it keeps the full corpus out of any global sort at 100 TB.

    Parity: avg_nll values are 1e-9-grid doubles (bit-equal both
    engines), cuts are integer-arithmetic selections over them, bucket
    means re-snap to the 1e-9 grid after one exact DECIMAL(20,9) sum."""
    from securities_pricing_data_pipeline_spark.llmdata.text import bigram_logppl

    docs = load(spark, sf_dir, "documents")
    # the scored frame feeds the threshold spine AND the bucket tagging;
    # unpinned, the whole bigram-LM pipeline (two count aggregates + two
    # joins) replays per consumer — pin the 3-column doc-cardinality frame
    ppl = bigram_logppl(docs).localCheckpoint(eager=True)
    vals = ppl.groupBy("avg_nll").agg(F.count("*").alias("c"))
    w_cum = Window.orderBy("avg_nll").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = vals.select(
        "avg_nll",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    cuts = cum.agg(
        F.min(F.when(F.col("cum") * 3 >= F.col("n"), F.col("avg_nll"))).alias("c1"),
        F.min(F.when(F.col("cum") * 3 >= F.col("n") * 2, F.col("avg_nll"))).alias("c2"),
    )
    bucket = (
        F.when(F.col("avg_nll") <= F.col("c1"), F.lit("head"))
        .when(F.col("avg_nll") <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    tagged = ppl.crossJoin(F.broadcast(cuts)).select(
        "doc_id", "n_bigrams", "avg_nll", bucket.alias("bucket")
    )
    out = tagged.join(docs.select("doc_id", "n_chars"), "doc_id").groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bigrams").cast("long").alias("n_bigrams"),
        (
            F.sum(F.col("avg_nll").cast("decimal(20,9)")).cast("double")
            / F.count("*")
        )
        .cast("decimal(20,9)")
        .cast("double")
        .alias("mean_nll"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("mean_chars"),
    )
    return out.orderBy("bucket")


QUERIES["text_ppl_buckets"] = text_ppl_buckets

ORACLES["text_ppl_buckets"] = f"""
WITH ppl AS (
  SELECT * FROM ({ORACLES["text_bigram_logppl"]})
), vals AS (
  SELECT avg_nll, COUNT(*) AS c FROM ppl GROUP BY 1
), cum AS (
  SELECT avg_nll,
         SUM(c) OVER (ORDER BY avg_nll) AS cum,
         SUM(c) OVER () AS n
  FROM vals
), cuts AS (
  SELECT MIN(CASE WHEN cum * 3 >= n THEN avg_nll END) AS c1,
         MIN(CASE WHEN cum * 3 >= n * 2 THEN avg_nll END) AS c2
  FROM cum
), tagged AS (
  SELECT p.doc_id, p.n_bigrams, p.avg_nll,
         CASE WHEN p.avg_nll <= c.c1 THEN 'head'
              WHEN p.avg_nll <= c.c2 THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM ppl p, cuts c
)
SELECT t.bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(t.n_bigrams) AS BIGINT) AS n_bigrams,
       CAST(CAST(CAST(SUM(CAST(t.avg_nll AS DECIMAL(20,9))) AS DOUBLE) / COUNT(*)
            AS DECIMAL(20,9)) AS DOUBLE) AS mean_nll,
       CAST(SUM(d.n_chars) AS DOUBLE) / COUNT(*) AS mean_chars
FROM tagged t JOIN documents d USING (doc_id)
GROUP BY 1 ORDER BY 1
"""


def sim_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998) over the
    RRF-fused candidate set: greedily pick k=3 of each query's fused
    top-5 maximizing λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s) with λ=0.5 —
    the standard diversification pass between rerank and serve (don't
    show five near-copies of the best hit). The greedy recursion is not
    window-expressible, but k is a fixed small constant, so the three
    selection steps UNROLL into windows + joins — the same
    fixed-unroll discipline as the BPE merge passes and the Hilbert
    automaton.

    Parity: rel and pairwise sims are exact grid cosines; λ=0.5 is an
    exact binary fraction; every step score is ``0.5*rel - 0.5*maxsim``
    left-associated identically in both engines; ties break (score DESC,
    candidate id). Plan shape: candidates are n_queries×5 rows, so every
    join below is a broadcast-hash probe or a tiny per-query window —
    the corpus is touched exactly once (the candidate-vector fetch)."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import (
        cosine_with_norms,
        norm_grid,
    )

    emb = load(spark, sf_dir, "embeddings")
    fused = sim_rrf_fusion(spark, sf_dir).select("query_id", "neighbor_id")
    qv = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        norm_grid(F.col("embedding")).alias("q_norm"),
    )
    nv = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("vec"),
        norm_grid(F.col("embedding")).alias("nrm"),
    )
    cand = (
        nv.join(F.broadcast(fused.withColumnRenamed("neighbor_id", "cid")), "cid")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "cid",
            cosine_with_norms(
                F.col("q_vec"), F.col("vec"), F.col("q_norm"), F.col("nrm")
            ).alias("rel"),
            "vec",
            "nrm",
        )
    )
    # pin the candidate frame: it feeds the pair self-join (both sides)
    # and every selection step — unpinned, the dual-retriever fusion
    # lineage replayed per consumer (measured 10.5s vs ~2s; the frame is
    # n_queries x 5 rows, so the eager copy is O(candidates) cheap)
    cand = cand.localCheckpoint(eager=True)
    x, y = cand.alias("x"), cand.alias("y")
    pairs = x.join(
        y,
        (F.col("x.query_id") == F.col("y.query_id")) & (F.col("x.cid") != F.col("y.cid")),
    ).select(
        F.col("x.query_id").alias("query_id"),
        F.col("x.cid").alias("ci"),
        F.col("y.cid").alias("cj"),
        cosine_with_norms(
            F.col("x.vec"), F.col("y.vec"), F.col("x.nrm"), F.col("y.nrm")
        ).alias("sim"),
    ).localCheckpoint(eager=True)  # 25 rows/query; read by every step
    # Selection steps live in llmdata.similarity.mmr_select (shared with
    # the 100k-query scale probe); the broadcast hints, per-query window
    # discipline, and the k-crossover note are documented there.
    from securities_pricing_data_pipeline_spark.llmdata.similarity import mmr_select

    sel = mmr_select(cand.select("query_id", "cid", "rel"), pairs, k=3, lam=0.5)
    return sel.select(
        "query_id",
        F.col("cid").alias("neighbor_id"),
        F.col("rel").alias("cos_sim"),
        F.col("max_sim").alias("max_sim_selected"),
        F.col("score").alias("mmr_score"),
        "mmr_rank",
    )


QUERIES["sim_mmr_diversify"] = sim_mmr_diversify

ORACLES["sim_mmr_diversify"] = f"""
WITH fused AS (SELECT query_id, neighbor_id FROM ({ORACLES["sim_rrf_fusion"]})),
qv AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q
  FROM embeddings WHERE vec_id < 10
), nv AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS v FROM embeddings
), cand AS (
  SELECT f.query_id, f.neighbor_id AS cid, {_cos_expr('q', 'v')} AS rel, v
  FROM fused f
  JOIN qv ON qv.query_id = f.query_id
  JOIN nv ON nv.cid = f.neighbor_id
), pairs AS (
  SELECT x.query_id, x.cid AS ci, y.cid AS cj,
         {_cos_expr('x.v', 'y.v')} AS sim
  FROM cand x JOIN cand y
    ON x.query_id = y.query_id AND x.cid <> y.cid
), s1 AS (
  SELECT query_id, cid AS sel, rel FROM (
    SELECT query_id, cid, rel,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rel DESC, cid) AS rn
    FROM cand) WHERE rn = 1
), rem1 AS (
  SELECT c.query_id, c.cid, c.rel FROM cand c
  LEFT JOIN s1 ON s1.query_id = c.query_id AND s1.sel = c.cid
  WHERE s1.sel IS NULL
), ms1 AS (
  SELECT p.query_id, p.ci, MAX(p.sim) AS max_sim
  FROM pairs p JOIN s1 ON s1.query_id = p.query_id AND s1.sel = p.cj
  GROUP BY 1, 2
), s2 AS (
  SELECT query_id, cid AS sel, rel, max_sim, score FROM (
    SELECT r.query_id, r.cid, r.rel, m.max_sim,
           0.5 * r.rel - 0.5 * m.max_sim AS score,
           ROW_NUMBER() OVER (PARTITION BY r.query_id
                              ORDER BY 0.5 * r.rel - 0.5 * m.max_sim DESC, r.cid)
             AS rn
    FROM rem1 r JOIN ms1 m ON m.query_id = r.query_id AND m.ci = r.cid
  ) WHERE rn = 1
), sel2 AS (
  SELECT query_id, sel FROM s1 UNION ALL SELECT query_id, sel FROM s2
), rem2 AS (
  SELECT c.query_id, c.cid, c.rel FROM cand c
  LEFT JOIN sel2 ON sel2.query_id = c.query_id AND sel2.sel = c.cid
  WHERE sel2.sel IS NULL
), ms2 AS (
  SELECT p.query_id, p.ci, MAX(p.sim) AS max_sim
  FROM pairs p JOIN sel2 ON sel2.query_id = p.query_id AND sel2.sel = p.cj
  GROUP BY 1, 2
), s3 AS (
  SELECT query_id, cid AS sel, rel, max_sim, score FROM (
    SELECT r.query_id, r.cid, r.rel, m.max_sim,
           0.5 * r.rel - 0.5 * m.max_sim AS score,
           ROW_NUMBER() OVER (PARTITION BY r.query_id
                              ORDER BY 0.5 * r.rel - 0.5 * m.max_sim DESC, r.cid)
             AS rn
    FROM rem2 r JOIN ms2 m ON m.query_id = r.query_id AND m.ci = r.cid
  ) WHERE rn = 1
)
SELECT query_id, sel AS neighbor_id, rel AS cos_sim,
       CAST(0.0 AS DOUBLE) AS max_sim_selected,
       0.5 * rel - 0.5 * CAST(0.0 AS DOUBLE) AS mmr_score,
       CAST(1 AS INT) AS mmr_rank
FROM s1
UNION ALL
SELECT query_id, sel, rel, max_sim, score, CAST(2 AS INT) FROM s2
UNION ALL
SELECT query_id, sel, rel, max_sim, score, CAST(3 AS INT) FROM s3
"""


def text_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRF query expansion for the fixed seed {spark, join, filter}:
    top-5 expansion terms pooled from the BM25 top-10 feedback docs,
    ranked by exact integer idf·feedback-tf
    (``llmdata.text.prf_expansion_terms``). Completes the sparse
    retrieval loop: BM25 retrieve → PRF expand → (re-run with the wider
    query)."""
    from securities_pricing_data_pipeline_spark.llmdata.text import (
        prf_expansion_terms,
    )

    return prf_expansion_terms(
        load(spark, sf_dir, "documents"), ["spark", "join", "filter"],
        k_docs=10, k_terms=5, term_tf=_bm25_postings(spark, sf_dir),
    )


QUERIES["text_prf_expansion"] = text_prf_expansion

ORACLES["text_prf_expansion"] = rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
  FROM documents
), tt AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
), fb AS (
  SELECT doc_id FROM ({ORACLES["text_bm25_topdocs"]})
), fbtf AS (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS fb_tf, COUNT(*) AS n_fb_docs
  FROM tt JOIN fb USING (doc_id)
  WHERE term NOT IN ('spark', 'join', 'filter')
  GROUP BY 1
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tt
  WHERE term IN (SELECT term FROM fbtf) GROUP BY 1
), nd AS (
  SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tt
), scored AS (
  SELECT f.term, f.fb_tf, f.n_fb_docs, d.df,
         (10000 * (SELECT n_docs FROM nd)) // d.df AS idf_scaled
  FROM fbtf f JOIN dfreq d USING (term)
)
SELECT term, fb_tf, n_fb_docs, df, idf_scaled,
       CAST(idf_scaled * fb_tf AS BIGINT) AS expansion_score,
       CAST(row_number() OVER (ORDER BY idf_scaled * fb_tf DESC, term) AS INT)
         AS rnk
FROM scored ORDER BY expansion_score DESC, term LIMIT 5
"""


def sample_reservoir_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-20-docs-per-source deterministic reservoir (the held-out
    eval carve; ``llmdata.sampling.reservoir_per_stratum`` for the
    WindowGroupLimit scale shape and the hash-coin reproducibility
    contract)."""
    from securities_pricing_data_pipeline_spark.llmdata.sampling import (
        reservoir_per_stratum,
    )

    docs = load(spark, sf_dir, "documents")
    return reservoir_per_stratum(docs, "source", k=20).select(
        "source", "doc_id", "rsv_rank"
    )


QUERIES["sample_reservoir_stratified"] = sample_reservoir_stratified

ORACLES["sample_reservoir_stratified"] = """
SELECT source, doc_id, CAST(rn AS INT) AS rsv_rank FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY CAST(('0x' || substr(md5('rsv:' || CAST(doc_id AS VARCHAR)),
                                         1, 15)) AS BIGINT),
                    doc_id) AS rn
  FROM documents
) WHERE rn <= 20
"""


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated substring spans (Lee et al. 2022 suffix-group
    shape): maximal word runs whose every 8-gram occurs ≥2 times in the
    corpus — the spans an LLM training pipeline cuts before tokenizing
    (``llmdata.dedup.substring_duplicate_spans`` for the bucketed
    anchor-group plan that replaces a monolithic suffix array)."""
    from securities_pricing_data_pipeline_spark.llmdata.dedup import (
        substring_duplicate_spans,
    )

    docs = load(spark, sf_dir, "documents")
    return substring_duplicate_spans(docs, k=8, min_count=2)


QUERIES["dedup_substring_spans"] = dedup_substring_spans

ORACLES["dedup_substring_spans"] = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
  FROM documents
), anchors AS (
  SELECT doc_id, i AS pos, array_to_string(w[i+1:i+8], ' ') AS anchor
  FROM toks, UNNEST(range(len(w) - 8 + 1)) AS t(i)
  WHERE len(w) >= 8
), dup AS (
  SELECT anchor FROM anchors GROUP BY 1 HAVING COUNT(*) >= 2
), hits AS (
  SELECT doc_id, pos FROM anchors WHERE anchor IN (SELECT anchor FROM dup)
), runs AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS rid
  FROM hits
)
SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) - MIN(pos) + 8 AS BIGINT) AS span_len,
       COUNT(*) AS n_anchors
FROM runs GROUP BY doc_id, rid
ORDER BY doc_id, span_start
"""


def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn a 6-merge BPE table from the corpus (count → argmax → merge
    per round, Sennrich 2016; ``llmdata.text.bpe_train`` for the
    vocab-not-corpus scale argument). Closes the BPE loop next to
    ``text_bpe_pair_counts`` (one round's scoring) and ``text_bpe_encode``
    (applying a fixed table)."""
    from securities_pricing_data_pipeline_spark.llmdata.text import bpe_train

    return bpe_train(load(spark, sf_dir, "documents"), n_merges=6)


QUERIES["text_bpe_train"] = text_bpe_train

from securities_pricing_data_pipeline_spark.llmdata.text import (  # noqa: E402
    bpe_train_oracle_sql as _bpe_train_oracle_sql,
)

ORACLES["text_bpe_train"] = _bpe_train_oracle_sql(6)


def _image_phash_oracle_sql(max_hamming: int = 3) -> str:
    """Pixel-exact replay of dedup_image_phash: the synthetic gradient
    image is pure doc_id arithmetic, decode is lossless (P6) and
    resize_nearest is integer index math, so the oracle computes every
    sampled grayscale value DIRECTLY — v(gx,gy) = (base + 3gx + 5gy +
    7·gx·gy) mod 128 at gx=(j·w)//11, gy=(i·h)//6 — and rebuilds the
    60-bit dHash, the 16-bit pigeonhole blocks, and the Hamming verify
    without ever touching image bytes. Any off-by-one anywhere in the
    codec, resampler, or hash would break value parity."""
    terms = []
    for k in range(60):
        i, j = divmod(k, 10)

        def v(jj: int, i=i) -> str:
            gx = f"(({jj} * w) // 11)"
            gy = f"(({i} * h) // 6)"
            return f"(base + 3 * {gx} + 5 * {gy} + 7 * {gx} * {gy}) % 128"

        terms.append(
            f"CASE WHEN ({v(j)}) > ({v(j + 1)}) "
            f"THEN (CAST(1 AS BIGINT) << {k}) ELSE 0 END"
        )
    sig = " + ".join(terms)
    block_eq = " OR ".join(
        f"((a.sim >> {16 * i}) & 65535) = ((b.sim >> {16 * i}) & 65535)"
        for i in range(4)
    )
    return f"""
WITH params AS (
  SELECT doc_id, 12 + (doc_id % 50) % 7 AS w, 12 + (doc_id % 50) % 5 AS h,
         ((doc_id % 50) * 11 + doc_id // 50) % 128 AS base
  FROM documents
), sig AS (
  SELECT doc_id, {sig} AS sim FROM params
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({block_eq})
WHERE bit_count(xor(a.sim, b.sim)) <= {max_hamming}
ORDER BY id_a, id_b
"""


def dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup — the multimodal twin of
    ``dedup_simhash``: synthesize a REAL gradient P6 image per document
    (doc_id-derived geometry and gradient; groups of docs share
    parameters with small per-doc shifts, so genuine near-duplicate
    images exist), run the genuine decode → integer resample → 60-bit
    dHash (``llmdata.multimodal.image_dhash``), then find Hamming≤3
    near-dup pairs through the SAME 4×16-bit pigeonhole LSH machinery
    text SimHash uses (``llmdata.dedup.simhash_near_dups``) — bucketed
    candidate pairs with the enforced skew cap, never all-pairs."""
    from securities_pricing_data_pipeline_spark.llmdata.dedup import simhash_near_dups
    from securities_pricing_data_pipeline_spark.llmdata.multimodal import image_dhash

    docs = load(spark, sf_dir, "documents").select("doc_id")
    params = docs.select(
        "doc_id",
        (F.lit(12) + (F.col("doc_id") % 50) % 7).cast("int").alias("w"),
        (F.lit(12) + (F.col("doc_id") % 50) % 5).cast("int").alias("h"),
        (((F.col("doc_id") % 50) * 11 + F.expr("doc_id div 50")) % 128)
        .cast("int")
        .alias("base"),
    )
    header = F.format_string("P6\n%d %d\n255\n", F.col("w"), F.col("h"))
    body = F.expr(
        "array_join(transform(sequence(0, w * h - 1), i -> "
        "repeat(char((base + 3 * (i % w) + 5 * (i div w) "
        "+ 7 * (i % w) * (i div w)) % 128), 3)), '')"
    )
    assets = params.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.concat(header, body), "UTF-8").alias("content"),
    )
    # Pin the narrow (id, simhash) frame BEFORE pairing: simhash_near_dups
    # scans its sigs input three times (block-explode + two fingerprint
    # joins), and an unpinned frame would re-run the whole synth → decode
    # → resample → dHash codec chain per scan — the r10 driver-vs-local
    # bench gap attribution. One decode pass, then 16-byte rows.
    sigs = image_dhash(assets).localCheckpoint(eager=True)
    return simhash_near_dups(sigs, sigs=sigs, max_hamming=3).orderBy("id_a", "id_b")


QUERIES["dedup_image_phash"] = dedup_image_phash
ORACLES["dedup_image_phash"] = _image_phash_oracle_sql(3)


def dedup_audio_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual audio dedup — completes the modality triple next to
    ``dedup_simhash`` (text) and ``dedup_image_phash`` (image): per
    document, synthesize a deterministic PCM-16 WAV whose sample stream
    is pure doc_id arithmetic (5-doc parameter groups with small per-doc
    offsets, so genuine acoustic near-duplicates exist), run the REAL
    RIFF encode → decode → 60-bit energy-envelope dHash
    (``llmdata.audio.audio_dhash``), and pair Hamming≤3 fingerprints
    through the shared 4×16-bit pigeonhole LSH. The oracle regenerates
    the identical sample stream with generate_series and recomputes the
    frame energies, the hash, the blocks, and the verify — sample-exact,
    certifying the codec roundtrip inside the dedup loop."""
    import pandas as pd
    from pyspark.sql import types as T

    from securities_pricing_data_pipeline_spark.llmdata.audio import (
        audio_dhash,
        encode_wav,
    )
    from securities_pricing_data_pipeline_spark.llmdata.dedup import simhash_near_dups

    docs = load(spark, sf_dir, "documents").select("doc_id")
    md5g = F.md5(F.expr("CAST(doc_id div 5 AS STRING)"))
    params = docs.select(
        "doc_id",
        (
            F.conv(F.substring(md5g, 1, 3), 16, 10).cast("long") % 4096
            + (F.col("doc_id") % 5) * 3
        ).alias("b1"),
        (F.lit(1) + F.conv(F.substring(md5g, 4, 2), 16, 10).cast("long") % 64).alias(
            "s1"
        ),
        (F.lit(1) + F.conv(F.substring(md5g, 6, 2), 16, 10).cast("long") % 32).alias(
            "s2"
        ),
    )

    def _mk(batches):
        import numpy as np

        for pdf in batches:
            i = np.arange(61 * 32, dtype=np.int64)
            rows = {"asset_id": [], "content": []}
            for did, b1, s1, s2 in zip(
                pdf["doc_id"], pdf["b1"], pdf["s1"], pdf["s2"]
            ):
                s = (
                    (int(b1) + int(s1) * i + int(s2) * (i // 32) * i) % 4096 - 2048
                ).astype(np.int16)
                rows["asset_id"].append(int(did))
                rows["content"].append(encode_wav(s, sample_rate=8000))
            yield pd.DataFrame(rows)

    assets = params.mapInPandas(
        _mk,
        T.StructType(
            [
                T.StructField("asset_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), False),
            ]
        ),
    )
    # r10 verdict item #1: the driver bench clocked this query at 16.7s vs
    # 2.7s local. Root cause: simhash_near_dups scans `sigs` THREE times
    # (block-explode + two fingerprint joins) and the unpinned frame re-ran
    # the pure-Python RIFF encode→decode→dhash chain on every scan — a 3×
    # codec multiplier that compounds super-linearly under driver CPU
    # contention. Pinning the narrow (id, simhash) frame runs the decode
    # exactly once; the pairing then touches only 16-byte rows.
    sigs = audio_dhash(assets).localCheckpoint(eager=True)
    return simhash_near_dups(sigs, sigs=sigs, max_hamming=3).orderBy("id_a", "id_b")


QUERIES["dedup_audio_phash"] = dedup_audio_phash

ORACLES["dedup_audio_phash"] = """
WITH params AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id // 5 AS VARCHAR)), 1, 3)) AS BIGINT) % 4096
           + (doc_id % 5) * 3 AS b1,
         1 + CAST(('0x' || substr(md5(CAST(doc_id // 5 AS VARCHAR)), 4, 2)) AS BIGINT) % 64 AS s1,
         1 + CAST(('0x' || substr(md5(CAST(doc_id // 5 AS VARCHAR)), 6, 2)) AS BIGINT) % 32 AS s2
  FROM documents
), smp AS (
  SELECT doc_id, i // 32 AS f,
         ((b1 + s1 * i + s2 * (i // 32) * i) % 4096 - 2048) AS s
  FROM params, UNNEST(range(1952)) AS t(i)
), en AS (
  SELECT doc_id, f, SUM(s * s) AS e FROM smp GROUP BY 1, 2
), sig AS (
  SELECT a.doc_id,
         SUM(CASE WHEN a.e > b.e THEN (CAST(1 AS BIGINT) << a.f) ELSE 0 END) AS sim
  FROM en a JOIN en b ON a.doc_id = b.doc_id AND b.f = a.f + 1
  WHERE a.f < 60 GROUP BY 1
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
       ((a.sim >> 0) & 65535) = ((b.sim >> 0) & 65535)
    OR ((a.sim >> 16) & 65535) = ((b.sim >> 16) & 65535)
    OR ((a.sim >> 32) & 65535) = ((b.sim >> 32) & 65535)
    OR ((a.sim >> 48) & 65535) = ((b.sim >> 48) & 65535))
WHERE bit_count(xor(a.sim, b.sim)) <= 3
ORDER BY id_a, id_b
"""


def dedup_substring_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one substring-dedup cut plan (the apply side of
    ``dedup_substring_spans``): per document, the maximal word intervals
    to slice out so exactly one copy of every duplicated 8-gram run
    survives corpus-wide (``llmdata.dedup.substring_cut_plan``)."""
    from securities_pricing_data_pipeline_spark.llmdata.dedup import (
        substring_cut_plan,
    )

    return substring_cut_plan(load(spark, sf_dir, "documents"), k=8)


QUERIES["dedup_substring_cut"] = dedup_substring_cut

ORACLES["dedup_substring_cut"] = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
  FROM documents
), anchors AS (
  SELECT doc_id, i AS pos, array_to_string(w[i+1:i+8], ' ') AS anchor
  FROM toks, UNNEST(range(len(w) - 8 + 1)) AS t(i)
  WHERE len(w) >= 8
), marked AS (
  SELECT doc_id, pos,
         COUNT(*) OVER (PARTITION BY anchor) AS n_occ,
         MIN(doc_id * 1000000000 + pos) OVER (PARTITION BY anchor) AS first_occ
  FROM anchors
), redundant AS (
  SELECT doc_id, pos, pos + 8 AS e
  FROM marked
  WHERE n_occ >= 2 AND doc_id * 1000000000 + pos != first_occ
), islands AS (
  SELECT doc_id, pos, e,
         SUM(CASE WHEN prev_max IS NULL OR pos > prev_max THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM (
    SELECT doc_id, pos, e,
           MAX(e) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_max
    FROM redundant
  )
)
SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS cut_start,
       CAST(MAX(e) - MIN(pos) AS BIGINT) AS cut_len,
       COUNT(*) AS n_anchors
FROM islands GROUP BY doc_id, island
ORDER BY doc_id, cut_start
"""


def _ivfpq_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinned IVF-PQ retrieval frame (r15, VERDICT r14 item 5):
    ``sim_ivfpq_topk`` and ``sim_ivfpq_ndcg`` run the IDENTICAL
    retrieval (every-50th queries, k=5, dim=20, n_sub=4, n_codes=16,
    n_centroids=16, nprobe=4) and each rebuilt the coarse assignment +
    PQ codebook + code assignment + ADC scan per call — the two most
    expensive untouched queries of r14 (8.6 s / 10.0 s local). Same
    session-scoped index-artifact policy as the crossmodal/trained-IVF
    silvers; full output columns so both consumers read one frame. Twin
    test ``tests/test_llmdata.py::test_ivfpq_silver_matches_fresh_retrieval``
    pins it row-for-row to a fresh retrieval."""
    key = ("ivfpq_topk", spark.sparkContext.applicationId, sf_dir)
    df = _DEDUP_SILVER.get(key)
    if df is None:
        from securities_pricing_data_pipeline_spark.llmdata.similarity import (
            ivfpq_topk,
        )

        emb = load(spark, sf_dir, "embeddings")
        df = ivfpq_topk(
            emb, emb.filter(F.col("vec_id") % 50 == 0), k=5,
            dim=20, n_sub=4, n_codes=16, n_centroids=16, nprobe=4,
        ).localCheckpoint(eager=True)
        _DEDUP_SILVER[key] = df
    return df


def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-5 for every 50th vector as query — the composed
    serving index (coarse probe → ADC code scan,
    ``llmdata.similarity.ivfpq_topk``) next to its two single-stage
    parents ``sim_ivf_topk`` (probe + exact rerank) and
    ``sim_pq_adc_topk`` (whole-corpus code scan). The retrieval frame is
    the shared session silver (``_ivfpq_silver``) the nDCG audit also
    reads."""
    return _ivfpq_silver(spark, sf_dir)


QUERIES["sim_ivfpq_topk"] = sim_ivfpq_topk

ORACLES["sim_ivfpq_topk"] = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), ms AS (
  SELECT unnest([0, 1, 2, 3]) AS m
), sub AS (
  SELECT vec_id, m, vec[m*5+1 : m*5+5] AS sv FROM v, ms
), cb AS (
  SELECT vec_id AS cid, m, vec[m*5+1 : m*5+5] AS cvec FROM v, ms WHERE vec_id < 16
), dist AS (
  SELECT s.vec_id, s.m, c.cid,
         list_sum(list_transform(list_zip(s.sv, c.cvec),
           p -> CAST(round((p[1] - p[2]) * (p[1] - p[2]) * 1e13) AS BIGINT))) AS dist_units
  FROM sub s JOIN cb c ON s.m = c.m
), best AS (
  SELECT vec_id, m, cid FROM (
    SELECT vec_id, m, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist_units, cid) AS rn
    FROM dist) WHERE rn = 1
), cent AS (
  SELECT vec_id AS centroid_id, vec AS cvec FROM v WHERE vec_id < 16
), coarse AS (
  SELECT neighbor_id, centroid_id FROM (
    SELECT v.vec_id AS neighbor_id, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {_cos_expr('v.vec', 'cent.cvec')} DESC, cent.centroid_id) AS rn
    FROM v, cent
  ) WHERE rn = 1
), probes AS (
  SELECT query_id, centroid_id FROM (
    SELECT v.vec_id AS query_id, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {_cos_expr('v.vec', 'cent.cvec')} DESC, cent.centroid_id) AS rn
    FROM v, cent WHERE v.vec_id % 50 = 0
  ) WHERE rn <= 4
), adc AS (
  SELECT s.vec_id AS query_id, c.m, c.cid,
         list_sum(list_transform(list_zip(s.sv, c.cvec),
           p -> CAST(round((p[1] - p[2]) * (p[1] - p[2]) * 1e13) AS BIGINT))) AS units
  FROM sub s JOIN cb c ON s.m = c.m
  WHERE s.vec_id % 50 = 0
), scored AS (
  SELECT a.query_id, b.vec_id AS neighbor_id, SUM(a.units) AS total_units
  FROM best b
  JOIN coarse co ON b.vec_id = co.neighbor_id
  JOIN probes p ON co.centroid_id = p.centroid_id
  JOIN adc a ON b.m = a.m AND b.cid = a.cid AND a.query_id = p.query_id
  WHERE b.vec_id <> a.query_id
  GROUP BY 1, 2
), ranked AS (
  SELECT query_id, neighbor_id, total_units,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY total_units, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id,
       CAST(total_units AS DOUBLE) / 1e13 AS adc_dist,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
"""


def text_dsir_logratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance score per document with lang='en' as the target
    exemplar slice (``llmdata.text.dsir_logratio``) — the
    importance-resampling selection signal next to the perplexity
    quality filters."""
    from securities_pricing_data_pipeline_spark.llmdata.text import dsir_logratio

    docs = load(spark, sf_dir, "documents")
    return dsir_logratio(docs, F.col("lang") == "en", n_buckets=10_000)


QUERIES["text_dsir_logratio"] = text_dsir_logratio

ORACLES["text_dsir_logratio"] = r"""
WITH toks AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_target,
         CAST(('0x' || substr(md5(unnest(string_split_regex(lower(trim(text)), '\s+'))), 1, 8))
              AS BIGINT) % 10000 AS b
  FROM documents
), counts AS (
  SELECT b, COUNT(*) AS cr, SUM(is_target) AS ct FROM toks GROUP BY 1
), totals AS (
  SELECT COUNT(*) AS nr, SUM(is_target) AS nt FROM toks
), term AS (
  SELECT t.doc_id,
         CAST(ln(CAST(c.ct + 1 AS DOUBLE) / CAST(tt.nt + 10000 AS DOUBLE))
              - ln(CAST(c.cr + 1 AS DOUBLE) / CAST(tt.nr + 10000 AS DOUBLE))
              AS DECIMAL(38,12)) AS lr
  FROM toks t JOIN counts c USING (b) CROSS JOIN totals tt
)
SELECT doc_id, CAST(COUNT(*) AS INT) AS n_tokens,
       CAST(CAST(CAST(SUM(lr) AS DOUBLE) / COUNT(*) AS DECIMAL(20,9)) AS DOUBLE)
         AS avg_logratio
FROM term GROUP BY doc_id
"""


# constant IDCG@5 with graded gains 5..1, each term snapped to the same
# 1e-12 grid the per-position DCG terms use — the identical expression
# text runs in both engines, so the ratio is bit-stable
_IDCG5 = " + ".join(
    f"CAST(CAST({6 - i} AS DOUBLE) / log2(CAST({i + 1} AS DOUBLE)) AS DECIMAL(38,12))"
    for i in range(1, 6)
)


def sim_ivfpq_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded ranking-quality audit of IVF-PQ: nDCG@5 of
    ``sim_ivfpq_topk`` against exact-grid-cosine brute-force truth
    (gain = 6 − truth_rank for truth top-5 hits, 0 otherwise; the
    standard graded metric the recall@k audits can't express — recall
    treats rank 1 and rank 5 as equal). Per query: hit count, DCG@5
    (1e-12-snapped per-position terms, exact decimal sum), and nDCG
    (1e-9-snapped quotient against the constant IDCG@5). The audit the
    'rerank survivors on raw vectors' advice should be gated on."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import (
        brute_force_topk,
    )
    from securities_pricing_data_pipeline_spark.queries.helpers import dec

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    approx = _ivfpq_silver(spark, sf_dir)
    truth = brute_force_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id", F.col("rank").alias("truth_rank")
    )
    terms = (
        approx.join(F.broadcast(truth), ["query_id", "neighbor_id"], "left")
        .select(
            "query_id",
            F.coalesce(F.lit(6) - F.col("truth_rank"), F.lit(0)).alias("gain"),
            "rank",
        )
        .select(
            "query_id",
            "gain",
            dec(
                F.col("gain").cast("double")
                / F.log2((F.col("rank") + 1).cast("double")),
                12,
            ).alias("term"),
        )
    )
    return (
        terms.groupBy("query_id")
        .agg(
            F.sum((F.col("gain") > 0).cast("int")).cast("int").alias("n_hits"),
            F.sum("term").alias("dcg_dec"),
        )
        .select(
            "query_id",
            "n_hits",
            F.col("dcg_dec").cast("double").alias("dcg"),
            (
                F.col("dcg_dec").cast("double")
                / F.expr(_IDCG5).cast("double")
            )
            .cast("decimal(20,9)")
            .cast("double")
            .alias("ndcg"),
        )
    )


QUERIES["sim_ivfpq_ndcg"] = sim_ivfpq_ndcg

ORACLES["sim_ivfpq_ndcg"] = f"""
WITH approx AS (
  SELECT query_id, neighbor_id, rank FROM ({ORACLES["sim_ivfpq_topk"]})
), v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), truth AS (
  SELECT query_id, neighbor_id, rank AS truth_rank FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_cos_expr('q.vec', 'c.vec')} DESC, c.vec_id) AS rank
    FROM v q JOIN v c ON q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id
  ) WHERE rank <= 5
), terms AS (
  SELECT a.query_id,
         COALESCE(6 - t.truth_rank, 0) AS gain,
         CAST(CAST(COALESCE(6 - t.truth_rank, 0) AS DOUBLE)
              / log2(CAST(a.rank + 1 AS DOUBLE)) AS DECIMAL(38,12)) AS term
  FROM approx a LEFT JOIN truth t USING (query_id, neighbor_id)
)
SELECT query_id,
       CAST(SUM(CASE WHEN gain > 0 THEN 1 ELSE 0 END) AS INT) AS n_hits,
       CAST(SUM(term) AS DOUBLE) AS dcg,
       CAST(CAST(CAST(SUM(term) AS DOUBLE) / CAST(({_IDCG5}) AS DOUBLE)
            AS DECIMAL(20,9)) AS DOUBLE) AS ndcg
FROM terms GROUP BY query_id
"""


def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer table under the quasi-identifier
    set (nation, market segment, 500-unit balance band): groups with
    fewer than 5 members (``operators.quality.k_anonymity_violations``)
    — the privacy-governance gate a training-data release pipeline runs
    before exporting user-derived tables."""
    from securities_pricing_data_pipeline_spark.operators.quality import (
        k_anonymity_violations,
    )

    cust = load(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        # exact cents then truncating integer division — double→int CAST
        # rounds in DuckDB but truncates in Spark, so never band on a cast
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT) div 50000").alias("bal_band"),
    )
    return k_anonymity_violations(
        cust, ["c_nationkey", "c_mktsegment", "bal_band"], k=5
    )


QUERIES["dq_k_anonymity"] = dq_k_anonymity

ORACLES["dq_k_anonymity"] = """
SELECT c_nationkey, c_mktsegment,
       CAST(round(c_acctbal * 100) AS BIGINT) // 50000 AS bal_band,
       COUNT(*) AS k_count
FROM customer
GROUP BY 1, 2, 3 HAVING COUNT(*) < 5
ORDER BY 1, 2, 3
"""


def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ℓ-diversity audit of the customer table
    (``operators.quality.l_diversity_violations``): quasi-identifier
    groups (nation, 500-unit balance band) whose SENSITIVE attribute —
    the market segment — takes fewer than 3 distinct values. k-anonymity's
    required companion (a k-anonymous group still leaks when every member
    shares one segment); same exact-cents banding as dq_k_anonymity so
    the two audits read over the same grouping discipline."""
    from securities_pricing_data_pipeline_spark.operators.quality import (
        l_diversity_violations,
    )

    cust = load(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        # exact cents then truncating integer division (the dq_k_anonymity
        # rule: double→int CAST rounds in DuckDB but truncates in Spark)
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT) div 50000").alias("bal_band"),
    )
    return l_diversity_violations(
        cust, ["c_nationkey", "bal_band"], sensitive_col="c_mktsegment", l=3
    )


QUERIES["dq_l_diversity"] = dq_l_diversity

ORACLES["dq_l_diversity"] = """
SELECT c_nationkey,
       CAST(round(c_acctbal * 100) AS BIGINT) // 50000 AS bal_band,
       COUNT(*) AS k_count,
       COUNT(DISTINCT c_mktsegment) AS l_distinct
FROM customer
GROUP BY 1, 2 HAVING COUNT(DISTINCT c_mktsegment) < 3
ORDER BY 1, 2
"""


def _bpe_apply_ntoks_sql(n_merges: int) -> str:
    """Token count of one word encoded with the m1..mK merge CTEs
    (column-reference folds — the oracle retrains, then applies)."""
    s = "regexp_split_to_array(word, '')"
    for k in range(1, n_merges + 1):
        s = (
            f"string_split(list_reduce({s}, (acc, t) -> "
            f"CASE WHEN regexp_extract(acc, '[^ ]+$') = m{k}.a AND t = m{k}.b "
            f"THEN substr(acc, 1, length(acc) - length(m{k}.a)) || m{k}.a || m{k}.b "
            f"ELSE acc || ' ' || t END), ' ')"
        )
    return f"len({s})"


def text_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a 6-merge BPE table, apply it corpus-wide, report per-language
    tokenizer fertility (``llmdata.text.bpe_fertility_by_lang``)."""
    from securities_pricing_data_pipeline_spark.llmdata.text import (
        bpe_fertility_by_lang,
    )

    return bpe_fertility_by_lang(load(spark, sf_dir, "documents"), n_merges=6)


QUERIES["text_bpe_fertility"] = text_bpe_fertility

from securities_pricing_data_pipeline_spark.llmdata.text import (  # noqa: E402
    bpe_train_ctes as _bpe_train_ctes,
)

ORACLES["text_bpe_fertility"] = rf"""
{_bpe_train_ctes(6)}, words AS (
  SELECT lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
  FROM documents
), enc AS (
  SELECT lang, length(word) AS n_chars,
         {_bpe_apply_ntoks_sql(6)} AS n_toks
  FROM words, m1, m2, m3, m4, m5, m6
)
SELECT lang, COUNT(*) AS n_words,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(SUM(n_toks) AS BIGINT) AS n_bpe_tokens,
       CAST(CAST(CAST(SUM(n_toks) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
            AS DECIMAL(20,9)) AS DOUBLE) AS fertility
FROM enc GROUP BY lang
ORDER BY lang
"""


def asof_event_bars_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of (merge_asof direction='nearest'): each event aligned
    to the CLOSEST bar of its symbol in either direction, equidistant
    ties to the earlier bar (``operators.asof.asof_join_nearest`` — one
    exchange, two in-partition carries). Completes the as-of direction
    family next to backward / forward / tolerance / bucketed-skew."""
    from securities_pricing_data_pipeline_spark.operators.asof import asof_join_nearest

    left = _asof_events(spark, sf_dir)
    b = bars_silver(spark, sf_dir).select(
        "symbol", "trade_date", F.col("close").cast("double").alias("close")
    )
    joined = asof_join_nearest(
        left, b, key=["symbol"], left_time="event_date", right_time="trade_date",
        value_cols=["close"],
    )
    return joined.filter(F.col("asof_time").isNotNull()).select(
        "event_id", "symbol", "event_date", F.col("asof_time").alias("bar_date"), "close"
    )


QUERIES["asof_event_bars_nearest"] = asof_event_bars_nearest

ORACLES["asof_event_bars_nearest"] = BARS_SQL + """
, ev AS (
  SELECT event_id,
         'P' || CAST(user_id % 200 AS VARCHAR) AS symbol,
         DATE '1995-01-01'
           + CAST((EXTRACT(DAY FROM ts) * 73 + user_id * 7) % 2400 AS INT) AS event_date
  FROM events
), back AS (
  SELECT e.event_id, e.symbol, e.event_date,
         b.trade_date AS bd, CAST(b.close AS DOUBLE) AS bc
  FROM ev e ASOF LEFT JOIN bars b
    ON e.symbol = b.symbol AND e.event_date >= b.trade_date
), fwd AS (
  SELECT e.event_id, b.trade_date AS fd, CAST(b.close AS DOUBLE) AS fc
  FROM ev e ASOF LEFT JOIN bars b
    ON e.symbol = b.symbol AND e.event_date <= b.trade_date
), pick AS (
  SELECT k.event_id, k.symbol, k.event_date,
         CASE WHEN fd IS NULL OR (bd IS NOT NULL
                   AND k.event_date - bd <= fd - k.event_date)
              THEN bd ELSE fd END AS bar_date,
         CASE WHEN fd IS NULL OR (bd IS NOT NULL
                   AND k.event_date - bd <= fd - k.event_date)
              THEN bc ELSE fc END AS close
  FROM back k JOIN fwd USING (event_id)
)
SELECT event_id, symbol, event_date, bar_date, close
FROM pick WHERE bar_date IS NOT NULL
"""


def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit (Kusupati et al. 2022, MRL): recall@5
    of brute-force retrieval over the FIRST d dimensions (d = 8, 16, 64)
    against the full-dimension ground truth — the measurement behind
    'can we serve a cheaper prefix of this embedding'. MRL-trained
    embeddings degrade gracefully under prefix truncation; this audit is
    how a serving stack picks the cheapest d that holds recall (the
    d=64 row is the full dimension and must read recall 1.0 — a
    built-in sanity anchor).

    Exactness: every ranking is the exact 1e-13 grid cosine over the
    sliced arrays; recall is an exact-int quotient snapped at 1e-9.
    Scale: 3 small-query-side brute-force passes (the documented ANN
    baseline shape) — at corpus scale the truncated pass runs the SAME
    IVF/PQ index machinery, just over narrower vectors."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import (
        brute_force_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    full = _bf_truth10_silver(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )  # shared session truth silver (r15): 3 consumers here, one per dim
    out = None
    for d in (8, 16, 64):
        tr = emb.select(
            "vec_id", F.slice("embedding", 1, d).alias("embedding")
        )
        topd = brute_force_topk(tr, tr.filter(F.col("vec_id") < 10), k=5).select(
            "query_id", "neighbor_id"
        )
        row = (
            # broadcast hint: the pinned truth frame is a LogicalRDD with
            # unknown stats — unhinted, each per-dim join planned as an SMJ
            topd.join(F.broadcast(full), ["query_id", "neighbor_id"])
            .agg(F.count("*").alias("n_hits"))
            .crossJoin(
                F.broadcast(
                    full.agg(F.count("*").alias("n_truth"))
                )
            )
            .select(
                F.lit(d).cast("int").alias("dim"),
                "n_hits",
                "n_truth",
                (F.col("n_hits").cast("double") / F.col("n_truth").cast("double"))
                .cast("decimal(20,9)")
                .cast("double")
                .alias("recall_at_5"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("dim")


QUERIES["emb_matryoshka_recall"] = emb_matryoshka_recall


ORACLES["emb_matryoshka_recall"] = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), t20 AS (
  SELECT vec_id AS query_id, cid AS neighbor_id FROM (
    SELECT q.vec_id, c.vec_id AS cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY {_cos_expr('q.vec', 'c.vec')} DESC, c.vec_id) AS rnk
    FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
  ) WHERE rnk <= 5
), t8 AS (
  SELECT vec_id AS query_id, cid AS neighbor_id FROM (
    SELECT q.vec_id, c.vec_id AS cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY {_cos_expr('q.vec[1:8]', 'c.vec[1:8]')} DESC, c.vec_id) AS rnk
    FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
  ) WHERE rnk <= 5
), t16 AS (
  SELECT vec_id AS query_id, cid AS neighbor_id FROM (
    SELECT q.vec_id, c.vec_id AS cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY {_cos_expr('q.vec[1:16]', 'c.vec[1:16]')} DESC, c.vec_id) AS rnk
    FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
  ) WHERE rnk <= 5
), nt AS (SELECT COUNT(*) AS n_truth FROM t20)
SELECT CAST(8 AS INT) AS dim,
       (SELECT COUNT(*) FROM t8 JOIN t20 USING (query_id, neighbor_id)) AS n_hits,
       (SELECT n_truth FROM nt) AS n_truth,
       CAST(CAST(CAST((SELECT COUNT(*) FROM t8 JOIN t20 USING (query_id, neighbor_id)) AS DOUBLE)
            / CAST((SELECT n_truth FROM nt) AS DOUBLE) AS DECIMAL(20,9)) AS DOUBLE) AS recall_at_5
UNION ALL
SELECT CAST(16 AS INT),
       (SELECT COUNT(*) FROM t16 JOIN t20 USING (query_id, neighbor_id)),
       (SELECT n_truth FROM nt),
       CAST(CAST(CAST((SELECT COUNT(*) FROM t16 JOIN t20 USING (query_id, neighbor_id)) AS DOUBLE)
            / CAST((SELECT n_truth FROM nt) AS DOUBLE) AS DECIMAL(20,9)) AS DOUBLE)
UNION ALL
SELECT CAST(64 AS INT),
       (SELECT COUNT(*) FROM t20 JOIN t20 t USING (query_id, neighbor_id)),
       (SELECT n_truth FROM nt),
       CAST(CAST(CAST((SELECT COUNT(*) FROM t20 JOIN t20 t USING (query_id, neighbor_id)) AS DOUBLE)
            / CAST((SELECT n_truth FROM nt) AS DOUBLE) AS DECIMAL(20,9)) AS DOUBLE)
ORDER BY dim
"""


def sim_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-encoded IVF-PQ top-5 (Faiss ``by_residual=True`` default;
    ``llmdata.similarity.ivfpq_residual_topk``) — per probed list the
    query builds its own ADC table over q − c_list, and codes quantize
    x − c(x) rather than x."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import (
        ivfpq_residual_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    return ivfpq_residual_topk(
        emb, emb.filter(F.col("vec_id") % 50 == 0), k=5,
        dim=20, n_sub=4, n_codes=16, n_centroids=16, nprobe=4, cb_lo=16,
    )


QUERIES["sim_ivfpq_residual_topk"] = sim_ivfpq_residual_topk

ORACLES["sim_ivfpq_residual_topk"] = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), cent AS (
  SELECT vec_id AS centroid_id, vec AS cvec FROM v WHERE vec_id < 16
), coarse AS (
  SELECT id, centroid_id FROM (
    SELECT v.vec_id AS id, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {_cos_expr('v.vec', 'cent.cvec')} DESC, cent.centroid_id) AS rn
    FROM v, cent
  ) WHERE rn = 1
), resid AS (
  SELECT v.vec_id AS id, co.centroid_id,
         list_transform(list_zip(v.vec, ct.cvec), p -> p[1] - p[2]) AS rvec
  FROM v JOIN coarse co ON v.vec_id = co.id
         JOIN cent ct ON co.centroid_id = ct.centroid_id
), ms AS (
  SELECT unnest([0, 1, 2, 3]) AS m
), cb AS (
  SELECT id - 16 AS cid, m, rvec[m*5+1 : m*5+5] AS cvec
  FROM resid, ms WHERE id >= 16 AND id < 32
), sub AS (
  SELECT id, centroid_id, m, rvec[m*5+1 : m*5+5] AS sv FROM resid, ms
), dist AS (
  SELECT s.id, s.m, c.cid,
         list_sum(list_transform(list_zip(s.sv, c.cvec),
           p -> CAST(round((p[1] - p[2]) * (p[1] - p[2]) * 1e13) AS BIGINT))) AS dist_units
  FROM sub s JOIN cb c ON s.m = c.m
), best AS (
  SELECT id, m, cid FROM (
    SELECT id, m, cid,
           ROW_NUMBER() OVER (PARTITION BY id, m ORDER BY dist_units, cid) AS rn
    FROM dist) WHERE rn = 1
), probes AS (
  SELECT query_id, centroid_id,
         list_transform(list_zip(qv, cvec), p -> p[1] - p[2]) AS qrvec
  FROM (
    SELECT v.vec_id AS query_id, v.vec AS qv, cent.centroid_id, cent.cvec,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {_cos_expr('v.vec', 'cent.cvec')} DESC, cent.centroid_id) AS rn
    FROM v, cent WHERE v.vec_id % 50 = 0
  ) WHERE rn <= 4
), adc AS (
  SELECT p.query_id, p.centroid_id, c.m, c.cid,
         list_sum(list_transform(list_zip(p.qrvec[c.m*5+1 : c.m*5+5], c.cvec),
           p2 -> CAST(round((p2[1] - p2[2]) * (p2[1] - p2[2]) * 1e13) AS BIGINT))) AS units
  FROM probes p, cb c
), scored AS (
  SELECT a.query_id, b.id AS neighbor_id, SUM(a.units) AS total_units
  FROM best b
  JOIN resid r ON b.id = r.id
  JOIN adc a ON r.centroid_id = a.centroid_id AND b.m = a.m AND b.cid = a.cid
  WHERE b.id <> a.query_id
  GROUP BY 1, 2
), ranked AS (
  SELECT query_id, neighbor_id, total_units,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY total_units, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id,
       CAST(total_units AS DOUBLE) / 1e13 AS adc_dist,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
"""


def corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability index on document length between the train
    and holdout hash splits (``llmdata.sampling.psi_drift``) — completes
    the drift-monitor family: KL (categorical mix), KS (whole numeric
    distribution), PSI (the banded score-drift index model-risk teams
    read against the standard 0.1/0.25 thresholds). 50-char bands,
    Laplace-smoothed shares, decimal-snapped terms, exact decimal total
    → the stable/moderate/shifted verdict string is engine-stable."""
    from securities_pricing_data_pipeline_spark.llmdata.sampling import psi_drift

    return psi_drift(load(spark, sf_dir, "documents"), "n_chars", band_width=50)


QUERIES["corpus_drift_psi"] = corpus_drift_psi

ORACLES["corpus_drift_psi"] = """
WITH tagged AS (
  SELECT CAST(n_chars AS BIGINT) // 50 AS band,
         CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                   % 100 < 80
              THEN 'train' ELSE 'holdout' END AS grp
  FROM documents
), spine AS (
  SELECT DISTINCT band FROM tagged
), grps AS (
  SELECT 'train' AS grp UNION ALL SELECT 'holdout'
), cells AS (
  SELECT grp, band, COUNT(*) AS cnt FROM tagged GROUP BY 1, 2
), counts AS (
  SELECT g.grp, s.band, COALESCE(c.cnt, 0) AS cnt
  FROM spine s CROSS JOIN grps g
  LEFT JOIN cells c ON c.grp = g.grp AND c.band = s.band
), totals AS (
  SELECT grp, COUNT(*) AS tot FROM tagged GROUP BY 1
), nc AS (
  SELECT COUNT(*) AS n_cells FROM spine
), per AS (
  SELECT t.band, t.cnt AS n_train, h.cnt AS n_holdout,
         t.p AS p_train, h.p AS p_holdout,
         CAST((t.p - h.p) * ln(t.p / h.p) AS DECIMAL(20,14)) AS dec_term
  FROM (SELECT grp, band, cnt,
               CAST(cnt + 1 AS DOUBLE) / CAST(tot + n_cells AS DOUBLE) AS p
        FROM counts JOIN totals USING (grp) CROSS JOIN nc) t
  JOIN (SELECT grp, band, cnt,
               CAST(cnt + 1 AS DOUBLE) / CAST(tot + n_cells AS DOUBLE) AS p
        FROM counts JOIN totals USING (grp) CROSS JOIN nc) h
    ON t.band = h.band
  WHERE t.grp = 'train' AND h.grp = 'holdout'
), tot AS (
  SELECT CAST(SUM(dec_term) AS DOUBLE) AS psi_total FROM per
)
SELECT band, n_train, n_holdout, p_train, p_holdout,
       CAST(dec_term AS DOUBLE) AS psi_term, psi_total,
       CASE WHEN psi_total < 0.1 THEN 'stable'
            WHEN psi_total < 0.25 THEN 'moderate'
            ELSE 'shifted' END AS psi_level
FROM per, tot ORDER BY band
"""


def dq_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit of the customer table
    (``operators.quality.t_closeness_violations``) — the third rung of
    the privacy ladder after dq_k_anonymity and dq_l_diversity: QI
    groups (nation, market segment) whose ordered-EMD between their
    balance-band distribution and the global one exceeds t=0.05. The
    balance band shifts cents non-negative BEFORE the integer division
    (truncation == floor only ≥ 0 — the dq_k_anonymity banding rule,
    hardened). EMD numerators are exact DECIMAL(38,0) integer
    cross-products; one double division per group."""
    from securities_pricing_data_pipeline_spark.operators.quality import (
        t_closeness_violations,
    )

    cust = load(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.expr("CAST(round(c_acctbal * 100) + 100000 AS BIGINT) div 50000").alias(
            "bal_band"
        ),
    )
    return t_closeness_violations(
        cust, ["c_nationkey", "c_mktsegment"], "bal_band", t=0.05
    )


QUERIES["dq_t_closeness"] = dq_t_closeness

ORACLES["dq_t_closeness"] = """
WITH cust AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(round(c_acctbal * 100) + 100000 AS BIGINT) // 50000 AS bal_band
  FROM customer
), cells AS (
  SELECT c_nationkey, c_mktsegment, bal_band, COUNT(*) AS c
  FROM cust GROUP BY 1, 2, 3
), vals AS (
  SELECT DISTINCT bal_band FROM cells
), gmarg AS (
  SELECT bal_band, SUM(c) AS gc FROM cells GROUP BY 1
), grps AS (
  SELECT c_nationkey, c_mktsegment, SUM(c) AS n_g FROM cells GROUP BY 1, 2
), consts AS (
  SELECT (SELECT COUNT(*) FROM vals) AS m,
         (SELECT SUM(gc) FROM gmarg) AS n_total
), fullg AS (
  SELECT g.c_nationkey, g.c_mktsegment, v.bal_band, g.n_g,
         COALESCE(cl.c, 0) AS c, gl.gc
  FROM grps g
  CROSS JOIN vals v
  JOIN gmarg gl ON gl.bal_band = v.bal_band
  LEFT JOIN cells cl ON cl.c_nationkey = g.c_nationkey
                    AND cl.c_mktsegment = g.c_mktsegment
                    AND cl.bal_band = v.bal_band
), cum AS (
  SELECT c_nationkey, c_mktsegment, n_g,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey, c_mktsegment
                            ORDER BY bal_band) AS rn,
         SUM(c) OVER (PARTITION BY c_nationkey, c_mktsegment
                      ORDER BY bal_band) AS cum_c,
         SUM(gc) OVER (PARTITION BY c_nationkey, c_mktsegment
                       ORDER BY bal_band) AS cum_g
  FROM fullg
), per AS (
  SELECT c_nationkey, c_mktsegment, n_g,
         SUM(ABS(CAST(cum_c AS DECIMAL(38,0)) * k.n_total
                 - CAST(cum_g AS DECIMAL(38,0)) * n_g)) AS num
  FROM cum, consts k
  WHERE rn < k.m
  GROUP BY 1, 2, 3
)
SELECT c_nationkey, c_mktsegment,
       CAST(n_g AS BIGINT) AS k_count,
       CAST(num AS DOUBLE)
         / CAST(CAST(k.m - 1 AS DECIMAL(38,0)) * n_g * k.n_total AS DOUBLE) AS emd
FROM per, consts k
WHERE CAST(num AS DOUBLE)
        / CAST(CAST(k.m - 1 AS DECIMAL(38,0)) * n_g * k.n_total AS DOUBLE) > 0.05
ORDER BY 1, 2
"""


def _video_phash_oracle_sql(max_hamming: int = 3) -> str:
    """Frame-exact replay of dedup_video_phash: the synthetic gradient
    frames are pure (doc_id, frame) arithmetic and the frame payloads
    are LOSSLESS P6 inside the real AVI container, so the oracle
    computes every sampled grayscale value directly — v(gx,gy) =
    (base_f + ca·gx² + cb·gy² + cc·gx·gy) mod 128 (quadratic with
    GROUP-derived coefficients, so unrelated groups are genuinely
    different patterns — not shift-variants — and bit
    patterns stay diverse and no pigeonhole bucket degenerates) at
    gx=(j·w)//11,
    gy=(i·h)//6 with base_f = (g·11 + doc%5 + 13·f) mod 128 — rebuilds
    each frame's 60-bit dHash, pairs frames through the identical
    4×16-bit pigeonhole + Hamming verify, and rolls frame pairs up to
    video pairs by MIN Hamming. Any fault in the container walk, frame
    pick, codec, resampler, or hash breaks value parity."""
    terms = []
    for k in range(60):
        i, j = divmod(k, 10)

        def v(jj: int, i=i) -> str:
            gx = f"(({jj} * w) // 11)"
            gy = f"(({i} * h) // 6)"
            return (
                f"(base + ca * {gx} * {gx} + cb * {gy} * {gy} "
                f"+ cc * {gx} * {gy}) % 128"
            )

        terms.append(
            f"CASE WHEN ({v(j)}) > ({v(j + 1)}) "
            f"THEN (CAST(1 AS BIGINT) << {k}) ELSE 0 END"
        )
    sig = " + ".join(terms)
    block_eq = " OR ".join(
        f"((a.sim >> {16 * i}) & 65535) = ((b.sim >> {16 * i}) & 65535)"
        for i in range(4)
    )
    return f"""
WITH params AS (
  SELECT doc_id, f,
         12 + (doc_id // 5) % 7 AS w,
         12 + (doc_id // 5) % 5 AS h,
         1 + (doc_id // 5) % 13 AS ca,
         1 + (doc_id // 5) % 11 AS cb,
         1 + (doc_id // 5) % 7 AS cc,
         ((doc_id // 5) * 11 + doc_id % 5 + 13 * f) % 128 AS base
  FROM documents, UNNEST(range(4)) AS t(f)
), sig AS (
  SELECT doc_id, f, {sig} AS sim FROM params
), fp AS (
  SELECT a.doc_id AS va, b.doc_id AS vb,
         bit_count(xor(a.sim, b.sim)) AS ham
  FROM sig a JOIN sig b
    ON (a.doc_id * 8 + a.f) < (b.doc_id * 8 + b.f)
   AND a.doc_id <> b.doc_id
   AND ({block_eq})
  WHERE bit_count(xor(a.sim, b.sim)) <= {max_hamming}
)
SELECT va AS id_a, vb AS id_b,
       CAST(MIN(ham) AS INT) AS min_hamming,
       COUNT(*) AS n_frame_matches
FROM fp GROUP BY 1, 2 ORDER BY 1, 2
"""


def dedup_video_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual VIDEO dedup — the final rung of the perceptual family
    (text SimHash → image dHash → audio energy-dHash → video keyframe
    signature sets), the standard large-scale video-corpus dedup shape:
    two videos are near-duplicates when ANY pair of their sampled
    keyframes is within Hamming ≤ 3, reported with the pair's MIN
    Hamming and how many keyframe pairs matched.

    Per document: 4 gradient frames (5-doc parameter groups with small
    per-doc and per-frame shifts, so genuine near-duplicate videos
    exist), each a LOSSLESS P6 payload packed into a REAL AVI container
    (the honest-codec trade: video_mjpeg_frames certifies the lossy
    JPEG-in-AVI path under an error envelope; dedup needs exact oracle
    replay, so its frames use the lossless intra codec). The pipeline is
    fully real: RIFF/AVI walk → frame pick → decode → resize_nearest →
    dHash (``llmdata.video.video_frame_dhash``), then (video, frame)
    keys ride the SAME 4×16-bit pigeonhole LSH every other modality
    uses, and frame pairs roll up to video pairs by MIN Hamming. The
    signature frame is pinned before pairing (the dedup_audio_phash
    lesson: simhash_near_dups scans sigs 3×)."""
    import pandas as pd
    from pyspark.sql import types as T

    from securities_pricing_data_pipeline_spark.llmdata.dedup import simhash_near_dups
    from securities_pricing_data_pipeline_spark.llmdata.video import (
        encode_avi_mjpeg,
        video_frame_dhash,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")

    def _mk(batches):
        import numpy as np

        for pdf in batches:
            rows = {"asset_id": [], "content": []}
            for did in pdf["doc_id"]:
                did = int(did)
                g = did // 5
                w, h = 12 + g % 7, 12 + g % 5
                ca, cb, cc = 1 + g % 13, 1 + g % 11, 1 + g % 7
                jj, ii = np.meshgrid(
                    np.arange(w, dtype=np.int64), np.arange(h, dtype=np.int64)
                )
                frames = []
                for f in range(4):
                    base = (g * 11 + did % 5 + 13 * f) % 128
                    v = (
                        (base + ca * jj * jj + cb * ii * ii + cc * jj * ii)
                        % 128
                    ).astype(
                        np.uint8
                    )
                    px = np.repeat(v[:, :, None], 3, axis=2)
                    frames.append(
                        f"P6\n{w} {h}\n255\n".encode() + px.tobytes()
                    )
                rows["asset_id"].append(did)
                rows["content"].append(encode_avi_mjpeg(frames, w, h))
            yield pd.DataFrame(rows)

    assets = docs.mapInPandas(
        _mk,
        T.StructType(
            [
                T.StructField("asset_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), False),
            ]
        ),
    )
    # per-session frame-signature silver: the container walk + decode +
    # dHash runs ONCE per (app, sf) and serves every video consumer
    # (this query, dedup_video_keep) — the same index-artifact
    # discipline as _nsw_edge_silver; simhash_near_dups scans its sigs
    # input 3×, so the pin also prevents the audio-phash 3×-decode bug.
    # pack (video, frame) on the DENSE pick ordinal with stride
    # n_frames: pick_idx < n_frames by construction, so keys never alias
    # into a neighboring video id — packing on the ORIGINAL container
    # frame_idx (i·total//n_frames) would collide for any video with
    # more than n_frames·stride/n_frames frames (ADVICE r11). For these
    # 4-frame assets pick_idx == frame_idx, so the oracle's f∈0..3
    # replay is unchanged.
    _STRIDE = 4
    n_frames = 4
    # pick_idx < n_frames is what keeps packed keys alias-free, and the
    # unpack divisor must be the SAME constant as the pack stride —
    # derive both from _STRIDE so neither can drift alone (ADVICE r12)
    assert _STRIDE == n_frames, "pack stride must equal sampled frame count"
    key = ("video_fsigs", spark.sparkContext.applicationId, sf_dir)
    fsigs = _DEDUP_SILVER.get(key)
    if fsigs is None:
        fsigs = (
            video_frame_dhash(assets, n_frames=n_frames)
            .select(
                (F.col("id") * _STRIDE + F.col("pick_idx")).alias("id"),
                "simhash",
            )
            .localCheckpoint(eager=True)
        )
        _DEDUP_SILVER[key] = fsigs
    # r15 (guide §2.4): the keyframe PAIRING feeds two query paths —
    # this report and dedup_video_keep's clustering input — and ran per
    # call; now one banded pairing per (session, sf), the same shared
    # ground-truth-artifact policy as _lsh_pairs/_jaccard_pairs.
    pkey = ("video_pairs", spark.sparkContext.applicationId, sf_dir)
    pairs = _DEDUP_SILVER.get(pkey)
    if pairs is None:
        fpairs = simhash_near_dups(fsigs, sigs=fsigs, max_hamming=3)
        va = F.expr(f"id_a div {_STRIDE}")
        vb = F.expr(f"id_b div {_STRIDE}")
        pairs = (
            fpairs.filter(va != vb)
            .groupBy(va.alias("id_a"), vb.alias("id_b"))
            .agg(
                F.min("hamming").cast("int").alias("min_hamming"),
                F.count("*").alias("n_frame_matches"),
            )
            .orderBy("id_a", "id_b")
            .localCheckpoint(eager=True)
        )
        _DEDUP_SILVER[pkey] = pairs
    return pairs


QUERIES["dedup_video_phash"] = dedup_video_phash
ORACLES["dedup_video_phash"] = _video_phash_oracle_sql(3)


_CROSSMODAL_OFFSET = 10_000_000


def _crossmodal_queries(emb: DataFrame) -> DataFrame:
    """Image-side query set: every 50th vector pushed through the
    deterministic second-encoder projection, with ids offset so the two
    modalities never alias (and the paired text item stays retrievable —
    the self-exclusion in the retrieval kernels keys on the raw id)."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import (
        crossmodal_project,
    )

    return crossmodal_project(emb.filter(F.col("vec_id") % 50 == 0)).select(
        (F.col("vec_id") + F.lit(_CROSSMODAL_OFFSET)).alias("vec_id"), "embedding"
    )


def _crossmodal_ivf_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinned cross-modal IVF retrieval frame (r15, VERDICT r14 item 6):
    the three crossmodal queries run the IDENTICAL retrieval — ivf_topk
    over the every-50th projected query set at (k=5, n_centroids=16,
    nprobe=4) — and each rebuilt the ~27-job projection+probe+scan
    pipeline per call. Same session-scoped index-artifact policy as the
    trained-IVF centroid silver above: built once per (session, sf) with
    the FULL output columns (query_id, neighbor_id, cos_sim, rank), so
    the topk report, the recall audit's approx side, and the
    hard-negative miner all read one frame. Twin test
    ``tests/test_llmdata.py::test_crossmodal_ivf_silver_matches_fresh_retrieval``
    pins the silver row-for-row to a fresh retrieval."""
    key = ("crossmodal_ivf", spark.sparkContext.applicationId, sf_dir)
    df = _DEDUP_SILVER.get(key)
    if df is None:
        from securities_pricing_data_pipeline_spark.llmdata.similarity import ivf_topk

        emb = load(spark, sf_dir, "embeddings")
        df = ivf_topk(
            emb, _crossmodal_queries(emb), k=5, n_centroids=16, nprobe=4
        ).localCheckpoint(eager=True)
        _DEDUP_SILVER[key] = df
    return df


def sim_crossmodal_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-shaped cross-modal retrieval: image-side queries (the
    deterministic second-encoder projection of every 50th embedding,
    ``llmdata.similarity.crossmodal_project``) retrieve their text-side
    top-5 through the IVF index — the asymmetric-modality join a
    multimodal training pipeline runs to mine image↔caption pairs.
    Query ids are offset by 10M so the modalities never alias; the
    paired text item is findable (and usually found — the audit twin
    ``sim_crossmodal_recall`` measures it). Same plan contract as
    sim_ivf_topk: centroids broadcast, one corpus scan, cost ∝ probed
    lists; the retrieval frame itself is the shared session silver."""
    return _crossmodal_ivf_silver(spark, sf_dir)


QUERIES["sim_crossmodal_topk"] = sim_crossmodal_topk


def _crossmodal_q_cte(dim: int = 64, w: int = 4) -> str:
    """DuckDB twin of crossmodal_project over the every-50th query set."""
    return f"""
  SELECT vec_id + {_CROSSMODAL_OFFSET} AS vec_id,
         list_transform(range({dim}), i ->
           {w} * vec[i + 1] + vec[((i + 1) % {dim}) + 1]) AS vec
  FROM v WHERE vec_id % 50 = 0
"""


def _crossmodal_topk_oracle_sql(k: int = 5, n_centroids: int = 16, nprobe: int = 4) -> str:
    return f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), q AS (
{_crossmodal_q_cte()}
), cent AS (
  SELECT vec_id AS centroid_id, vec AS cvec FROM v WHERE vec_id < {n_centroids}
), assigned AS (
  SELECT neighbor_id, c_vec, centroid_id FROM (
    SELECT v.vec_id AS neighbor_id, v.vec AS c_vec, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {_cos_expr('v.vec', 'cent.cvec')} DESC, cent.centroid_id) AS rn
    FROM v, cent
  ) WHERE rn = 1
), probes AS (
  SELECT query_id, q_vec, centroid_id FROM (
    SELECT q.vec_id AS query_id, q.vec AS q_vec, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_cos_expr('q.vec', 'cent.cvec')} DESC, cent.centroid_id) AS rn
    FROM q, cent
  ) WHERE rn <= {nprobe}
), ranked AS (
  SELECT p.query_id, a.neighbor_id, {_cos_expr('p.q_vec', 'a.c_vec')} AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY p.query_id
                            ORDER BY {_cos_expr('p.q_vec', 'a.c_vec')} DESC, a.neighbor_id) AS rank
  FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
  WHERE a.neighbor_id != p.query_id
)
SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


ORACLES["sim_crossmodal_topk"] = _crossmodal_topk_oracle_sql()


def sim_crossmodal_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal retrieval audit, two numbers in one row: recall@5 of
    the IVF cross-modal scan against exact-cosine ground truth on the
    same image-side queries (the index-quality check), and the paired-
    item hit rate — the fraction of image queries whose OWN text item
    lands in the exact top-5 (the standard CLIP-style retrieval eval).
    Counts are ints; the two ratios are single int÷int divisions —
    engine-stable."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import (
        brute_force_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    q = _crossmodal_queries(emb)
    truth = brute_force_topk(emb, q, k=5).select(
        "query_id", "neighbor_id"
    ).localCheckpoint(eager=True)  # multiple consumers below: one compute (r14;
    # ADVICE r14 dropped a redundant second back-to-back checkpoint here)
    approx = _crossmodal_ivf_silver(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    hits = approx.join(truth, ["query_id", "neighbor_id"], "left_semi")
    t = truth.agg(
        F.count_distinct("query_id").alias("n_queries"), F.count("*").alias("n_true")
    )
    h = hits.agg(F.count("*").alias("n_hits"))
    p = truth.filter(
        F.col("neighbor_id") == F.col("query_id") - F.lit(_CROSSMODAL_OFFSET)
    ).agg(F.count("*").alias("n_paired_hits"))
    return (
        t.crossJoin(h)
        .crossJoin(p)
        .select(
            "n_queries",
            F.lit(5).alias("k"),
            "n_hits",
            (F.col("n_hits").cast("double") / F.col("n_true")).alias("recall_at_k"),
            "n_paired_hits",
            (F.col("n_paired_hits").cast("double") / F.col("n_queries")).alias(
                "paired_hit_rate"
            ),
        )
    )


QUERIES["sim_crossmodal_recall"] = sim_crossmodal_recall

ORACLES["sim_crossmodal_recall"] = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), q AS (
{_crossmodal_q_cte()}
), bf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_cos_expr('q.vec', 'v.vec')} DESC, v.vec_id) AS rank
    FROM q, v WHERE v.vec_id != q.vec_id
  ) WHERE rank <= 5
), iv AS (
  SELECT query_id, neighbor_id FROM ({_crossmodal_topk_oracle_sql()})
), t AS (
  SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
         COUNT(*) AS n_true
  FROM bf
), h AS (
  SELECT COUNT(*) AS n_hits
  FROM (SELECT query_id, neighbor_id FROM iv
        INTERSECT SELECT query_id, neighbor_id FROM bf)
), p AS (
  SELECT COUNT(*) AS n_paired_hits
  FROM bf WHERE neighbor_id = query_id - {_CROSSMODAL_OFFSET}
)
SELECT t.n_queries, CAST(5 AS INT) AS k,
       CAST(h.n_hits AS BIGINT) AS n_hits,
       CAST(h.n_hits AS DOUBLE) / t.n_true AS recall_at_k,
       CAST(p.n_paired_hits AS BIGINT) AS n_paired_hits,
       CAST(p.n_paired_hits AS DOUBLE) / t.n_queries AS paired_hit_rate
FROM t, h, p
"""


def _nsw_edge_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session NSW edge index over the embeddings — the graph-ANN
    index artifact (``llmdata.similarity.nsw_build_edges``), built once
    per (app, sf) and served to every NSW search, exactly the
    _portable_sigs / bars_silver discipline: a real deployment writes
    this as a silver table; pricing the build into every query would
    misstate the paradigm's serving cost (the build is the r10 lesson's
    3×-scan hazard writ large — ~500k candidate cosines at sf0.1).

    r12: the index is NARROW (src, dst) adjacency (~15 MB at sf0.1 vs
    ~500 MB when edges denormalized dvec/dnrm on) — the r11 driver
    bench evicted the fat variant to disk mid-session and recharged its
    full scan into every beam round (driver 11.0 s vs local 2.3 s for
    sim_nsw_topk); candidate vectors now come from the pinned
    :func:`_nsw_cvec_silver` instead."""
    from pyspark import StorageLevel

    from securities_pricing_data_pipeline_spark.llmdata.similarity import (
        nsw_build_edges,
    )

    key = ("nsw_edges", spark.sparkContext.applicationId, sf_dir)
    df = _DEDUP_SILVER.get(key)
    if df is None:
        df = _right_size_silver(
            nsw_build_edges(load(spark, sf_dir, "embeddings")).persist(
                StorageLevel.MEMORY_AND_DISK
            )
        )
        _DEDUP_SILVER[key] = df
    return df


from securities_pricing_data_pipeline_spark.queries.helpers import (  # noqa: E402
    right_size_silver as _right_size_silver,
)


def _nsw_cvec_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinned (id, vec, nrm) corpus-vector frame the NSW beam rounds
    fetch candidate vectors from — one corpus-sized cache serving every
    search, instead of either (a) re-reading the parquet per round or
    (b) carrying m=16 denormalized vector copies on the edges (the r11
    driver-bench eviction hazard; see :func:`_nsw_edge_silver`)."""
    from pyspark import StorageLevel

    from securities_pricing_data_pipeline_spark.llmdata.similarity import norm_grid

    key = ("nsw_cvec", spark.sparkContext.applicationId, sf_dir)
    df = _DEDUP_SILVER.get(key)
    if df is None:
        df = (
            load(spark, sf_dir, "embeddings")
            .select(
                F.col("vec_id").alias("id"),
                F.col("embedding").alias("vec"),
                norm_grid(F.col("embedding")).alias("nrm"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        df = _right_size_silver(df)
        _DEDUP_SILVER[key] = df
    return df


def sim_nsw_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-traversal ANN over the embeddings (NSW layer-0 beam search,
    ``llmdata.similarity.nsw_topk``) — certifies the third ANN paradigm
    next to IVF (lists) and PQ/SQ8/Hamming (quantization): LSH-built
    m=16 neighbor graph, 4 unrolled beam-16 expansions from 32 fixed
    entry points (recall@5 = 0.94 at sf0.01 / 0.80 at sf0.1 vs exact), exact grid cosine everywhere. The recall audit twin is
    ``sim_nsw_recall``."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import nsw_topk

    emb = load(spark, sf_dir, "embeddings")
    return nsw_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        k=5,
        edges=_nsw_edge_silver(spark, sf_dir),
        cvec=_nsw_cvec_silver(spark, sf_dir),
    )


QUERIES["sim_nsw_topk"] = sim_nsw_topk


def _nsw_topk_oracle_sql(
    k: int = 5,
    n_planes: int = 16,
    bands: int = 4,
    m_neighbors: int = 16,
    beam: int = 16,
    rounds: int = 4,
    n_entry: int = 32,
) -> str:
    """Unrolled DuckDB replay of nsw_topk: same planes/signatures/banded
    candidate pairs as the lsh family, per-node top-m symmetric edges,
    then ``rounds`` frontier CTEs — expansion ∪ frontier, per-query
    beam cut with identical (cos DESC, node ASC) ties."""
    rpb = n_planes // bands
    mask = (1 << rpb) - 1
    block_eq = " OR ".join(
        f"((a.sig >> {rpb * i}) & {mask}) = ((b.sig >> {rpb * i}) & {mask})"
        for i in range(bands)
    )
    parts = [f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), sig AS (
  SELECT vec_id, vec, {_plane_sig_sql('vec', n_planes=n_planes)} AS sig FROM v
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_cos_expr('a.vec', 'b.vec')} AS cos
  FROM sig a JOIN sig b ON a.vec_id < b.vec_id AND ({block_eq})
), sym AS (
  SELECT id_a AS src, id_b AS dst, cos FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst, cos FROM pairs
), edges AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
    FROM sym
  ) WHERE rn <= {m_neighbors}
), q AS (
  SELECT vec_id AS query_id, vec AS qv FROM v WHERE vec_id < 10
), f0 AS (
  SELECT query_id, node, cos FROM (
    SELECT q.query_id, e.vec_id AS node, {_cos_expr('q.qv', 'e.vec')} AS cos,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {_cos_expr('q.qv', 'e.vec')} DESC, e.vec_id) AS rn
    FROM q, v e WHERE e.vec_id < {n_entry} AND e.vec_id != q.query_id
  ) WHERE rn <= {beam}
)"""]
    for r in range(1, rounds + 1):
        prev = f"f{r - 1}"
        parts.append(f""", s{r} AS (
  SELECT f.query_id, ed.dst AS node, {_cos_expr('q.qv', 'nv.vec')} AS cos
  FROM {prev} f
  JOIN edges ed ON ed.src = f.node
  JOIN v nv ON nv.vec_id = ed.dst
  JOIN q ON q.query_id = f.query_id
  WHERE ed.dst != f.query_id
), f{r} AS (
  SELECT query_id, node, cos FROM (
    SELECT query_id, node, cos,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, node) AS rn
    FROM (
      SELECT query_id, node, MAX(cos) AS cos FROM (
        SELECT query_id, node, cos FROM {prev}
        UNION ALL
        SELECT query_id, node, cos FROM s{r}
      ) GROUP BY 1, 2
    )
  ) WHERE rn <= {beam}
)""")
    parts.append(f"""
SELECT query_id, node AS neighbor_id, cos AS cos_sim, CAST(rank AS INT) AS rank
FROM (
  SELECT query_id, node, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, node) AS rank
  FROM f{rounds}
) WHERE rank <= {k}
""")
    return "".join(parts)


ORACLES["sim_nsw_topk"] = _nsw_topk_oracle_sql()


def sim_nsw_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-ANN quality audit: recall@5 of the NSW beam search against
    exact brute-force cosine on the same queries — the paradigm-level
    recall ladder entry next to sim_ivf_recall_eval, sim_sq8_recall and
    sim_bin_hamming_recall. Counts are ints; one int÷int division."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import nsw_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    truth = _bf_truth10_silver(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )  # shared session truth silver (r15): one exact pass per session
    approx = nsw_topk(
        emb,
        queries,
        k=5,
        edges=_nsw_edge_silver(spark, sf_dir),
        cvec=_nsw_cvec_silver(spark, sf_dir),
    ).select("query_id", "neighbor_id")
    hits = approx.join(truth, ["query_id", "neighbor_id"], "left_semi")
    t = truth.agg(
        F.count_distinct("query_id").alias("n_queries"), F.count("*").alias("n_true")
    )
    h = hits.agg(F.count("*").alias("n_hits"))
    return t.crossJoin(h).select(
        "n_queries",
        F.lit(5).alias("k"),
        "n_hits",
        (F.col("n_hits").cast("double") / F.col("n_true")).alias("recall_at_k"),
    )


QUERIES["sim_nsw_recall"] = sim_nsw_recall

ORACLES["sim_nsw_recall"] = f"""
WITH bf AS (SELECT query_id, neighbor_id FROM ({ORACLES["sim_bruteforce_topk"]})),
nw AS (SELECT query_id, neighbor_id FROM ({_nsw_topk_oracle_sql()})),
t AS (
  SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
         COUNT(*) AS n_true
  FROM bf
), h AS (
  SELECT COUNT(*) AS n_hits
  FROM (SELECT query_id, neighbor_id FROM nw
        INTERSECT SELECT query_id, neighbor_id FROM bf)
)
SELECT t.n_queries, CAST(5 AS INT) AS k, CAST(h.n_hits AS BIGINT) AS n_hits,
       CAST(h.n_hits AS DOUBLE) / t.n_true AS recall_at_k
FROM t, h
"""


def dq_t_closeness_cat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical t-closeness audit
    (``operators.quality.t_closeness_violations_categorical``): the
    UNORDERED companion of dq_t_closeness — QI groups (nation, balance
    band — dq_l_diversity's exact grouping) whose total-variation
    distance between their market-segment distribution and the global
    one exceeds t=0.3. With a 0/1 ground distance the paper's EMD
    reduces to TVD = ½Σ|p−q|; numerators are exact DECIMAL(38,0)
    products, one double division per group."""
    from securities_pricing_data_pipeline_spark.operators.quality import (
        t_closeness_violations_categorical,
    )

    cust = load(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.expr("CAST(round(c_acctbal * 100) + 100000 AS BIGINT) div 50000").alias(
            "bal_band"
        ),
    )
    return t_closeness_violations_categorical(
        cust, ["c_nationkey", "bal_band"], "c_mktsegment", t=0.3
    )


QUERIES["dq_t_closeness_cat"] = dq_t_closeness_cat

ORACLES["dq_t_closeness_cat"] = """
WITH cust AS (
  SELECT c_nationkey,
         CAST(round(c_acctbal * 100) + 100000 AS BIGINT) // 50000 AS bal_band,
         c_mktsegment
  FROM customer
), cells AS (
  SELECT c_nationkey, bal_band, c_mktsegment, COUNT(*) AS c
  FROM cust GROUP BY 1, 2, 3
), vals AS (
  SELECT DISTINCT c_mktsegment FROM cells
), gm AS (
  SELECT c_mktsegment, SUM(c) AS gc FROM cells GROUP BY 1
), grps AS (
  SELECT c_nationkey, bal_band, SUM(c) AS n_g FROM cells GROUP BY 1, 2
), nt AS (
  SELECT SUM(gc) AS n_total FROM gm
), fullg AS (
  SELECT g.c_nationkey, g.bal_band, v.c_mktsegment, g.n_g,
         COALESCE(cl.c, 0) AS c, m.gc
  FROM grps g
  CROSS JOIN vals v
  JOIN gm m ON m.c_mktsegment = v.c_mktsegment
  LEFT JOIN cells cl ON cl.c_nationkey = g.c_nationkey
                    AND cl.bal_band = g.bal_band
                    AND cl.c_mktsegment = v.c_mktsegment
), per AS (
  SELECT c_nationkey, bal_band, n_g,
         CAST(SUM(ABS(CAST(c AS DECIMAL(38,0)) * nt.n_total
                      - CAST(gc AS DECIMAL(38,0)) * n_g)) AS DOUBLE)
           / CAST(2 * n_g * nt.n_total AS DOUBLE) AS tvd
  FROM fullg, nt GROUP BY 1, 2, 3, nt.n_total
)
SELECT c_nationkey, bal_band, CAST(n_g AS BIGINT) AS k_count, tvd
FROM per WHERE tvd > 0.3 ORDER BY 1, 2
"""


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-distribution fingerprint (``llmdata.text.zipf_fit``):
    vocabulary size, token count, hapax count/ratio, top-1 share, and
    the Zipf slope of ln(freq) on ln(rank) — the corpus-level drift
    signals a crawl-refresh pipeline monitors next to the per-document
    quality scores. Integer 1e6-grid ln values, DECIMAL(38,0) regression
    moments, one double division."""
    from securities_pricing_data_pipeline_spark.llmdata.text import zipf_fit

    return zipf_fit(load(spark, sf_dir, "documents"))


QUERIES["text_zipf_fit"] = text_zipf_fit

ORACLES["text_zipf_fit"] = r"""
WITH toks AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok FROM documents
), counts AS (
  SELECT tok, COUNT(*) AS freq FROM toks WHERE tok != '' GROUP BY 1
), ranked AS (
  SELECT freq,
         CAST(round(ln(CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, tok)
                            AS DOUBLE)) * 1e6) AS BIGINT) AS x,
         CAST(round(ln(CAST(freq AS DOUBLE)) * 1e6) AS BIGINT) AS y
  FROM counts
), agg AS (
  SELECT COUNT(*) AS vocab_size, SUM(freq) AS n_tokens,
         SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS hapax_count,
         MAX(freq) AS top_freq,
         SUM(CAST(x AS DECIMAL(38,0))) AS sx,
         SUM(CAST(y AS DECIMAL(38,0))) AS sy,
         SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
         SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx
  FROM ranked
)
SELECT CAST(vocab_size AS BIGINT) AS vocab_size,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(hapax_count AS BIGINT) AS hapax_count,
       CAST(hapax_count AS DOUBLE) / vocab_size AS hapax_ratio,
       CAST(top_freq AS DOUBLE) / n_tokens AS top1_share,
       CAST(CAST(vocab_size AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
         / CAST(CAST(vocab_size AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)
         AS zipf_slope
FROM agg
"""


def sample_neyman_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal allocation of a 1000-document eval budget across
    (source, lang) strata by document-length variability
    (``llmdata.sampling.neyman_allocation``) — the planning twin of
    sample_stratified/sample_reservoir_stratified: high-variance strata
    earn more samples. Exact integer radicand per stratum; one sqrt and
    two divisions; weights snapped to DECIMAL(24,6) before the
    cross-strata sum."""
    from securities_pricing_data_pipeline_spark.llmdata.sampling import (
        neyman_allocation,
    )

    return neyman_allocation(
        load(spark, sf_dir, "documents"), ["source", "lang"], "n_chars", n_total=1000
    )


QUERIES["sample_neyman_alloc"] = sample_neyman_alloc

ORACLES["sample_neyman_alloc"] = """
WITH g AS (
  SELECT source, lang, COUNT(*) AS n_rows,
         SUM(CAST(n_chars AS BIGINT)) AS sv,
         SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT)) AS svv
  FROM documents GROUP BY 1, 2
), w AS (
  SELECT source, lang, n_rows,
         sqrt(CAST(CAST(n_rows AS DECIMAL(38,0)) * svv
                   - CAST(sv AS DECIMAL(38,0)) * sv AS DOUBLE))
           / CAST(n_rows AS DOUBLE) AS std_pop,
         CAST(sqrt(CAST(CAST(n_rows AS DECIMAL(38,0)) * svv
                        - CAST(sv AS DECIMAL(38,0)) * sv AS DOUBLE))
              AS DECIMAL(24,6)) AS w_dec
  FROM g
), t AS (
  SELECT SUM(w_dec) AS w_sum FROM w
)
SELECT source, lang, n_rows, std_pop,
       CAST(w_dec AS DOUBLE) AS neyman_weight,
       CAST(w_dec AS DOUBLE) / CAST(w_sum AS DOUBLE) AS share,
       CAST(floor(1000.0 * (CAST(w_dec AS DOUBLE) / CAST(w_sum AS DOUBLE)))
            AS BIGINT) AS alloc_n
FROM w, t ORDER BY 1, 2
"""


def _ivf_trained_centroids(spark: SparkSession, sf_dir: str, k: int = 16) -> DataFrame:
    """Exact-grid-trained IVF centroids: ONE Lloyd update (the emb_kmeans
    integer discipline — 1e7 snap grid, L2 argmin assignment, offset
    floored-integer mean so Spark DIV and DuckDB // agree) over the
    k lowest-id seeds. The resulting integer centroids divide back to
    doubles identically in both engines, so the downstream cosine
    probe/list assignment stays bit-stable. Clusters that lose all
    members drop out (deterministically, both engines). NB: the float
    ``llmdata.similarity.kmeans_centroids`` is the production trainer —
    its avg() means are order-dependent, fine for a real index, wrong
    for a value-hash oracle; this exact twin exists so TRAINED lists can
    be certified."""
    OFF = "CAST(20000000 AS BIGINT)"
    emb = load(spark, sf_dir, "embeddings")
    pts = emb.select("vec_id", F.posexplode("embedding").alias("pos", "v")).select(
        "vec_id",
        (F.col("pos") + 1).alias("dim"),
        F.round(F.col("v").cast("double") * 10000000).cast("long").alias("g"),
    )
    c0 = pts.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), "dim", F.col("g").alias("c")
    )
    d = pts.join(F.broadcast(c0), "dim")
    diff = F.col("g") - F.col("c")
    dist = d.groupBy("vec_id", "cid").agg(F.sum(diff * diff).alias("dist"))
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    a1 = dist.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    c1 = (
        pts.join(a1.select("vec_id", "cid"), "vec_id")
        .groupBy("cid", "dim")
        .agg(F.count("*").alias("n"), F.sum("g").alias("sg"))
        .select("cid", "dim", F.expr(f"(sg + n * {OFF}) DIV n - {OFF}").alias("c"))
    )
    return (
        c1.groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
        .select(
            F.col("cid").alias("centroid_id"),
            F.expr("transform(dc, s -> cast(s.c as double) / 10000000.0)").alias(
                "cent_vec"
            ),
        )
        .withColumn(
            "cent_norm",
            F.expr(
                "cast(aggregate(zip_with(cent_vec, cent_vec, (x, y) -> "
                "cast(round(x * y * 1e13) as bigint)), 0L, (a, p) -> a + p) as double)"
            ),
        )
    )


def _ivf_trained_cent_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinned TRAINED-centroid frame (r14): the Lloyd update is an
    index-BUILD cost, not a serving cost — the same index-artifact
    policy every other trained/derived structure here follows (HNSW edge
    silvers, cvec, pinned signature silvers). Both trained-IVF queries
    previously re-ran the posexplode + assignment + mean pipeline and
    re-checkpointed it on EVERY call (~1.5-2 s per trial at sf0.1)."""
    key = ("ivf_trained_cent", spark.sparkContext.applicationId, sf_dir)
    df = _DEDUP_SILVER.get(key)
    if df is None:
        df = _ivf_trained_centroids(spark, sf_dir).localCheckpoint(eager=True)
        _DEDUP_SILVER[key] = df
    return df


def sim_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF retrieval over TRAINED inverted lists — one exact-grid Lloyd
    update of the 16 deterministic seeds (``_ivf_trained_centroids``)
    instead of the raw seeds sim_ivf_topk probes. Same ivf_topk plan
    contract (broadcast centroids, one corpus scan, cost ∝ probed
    lists); the quality DELTA is measured by sim_ivf_trained_recall —
    and on this corpus it is slightly negative (0.90 vs 0.92 at sf0.01,
    0.98 vs 1.00 at sf0.1): the raw seeds ARE corpus vectors, and one
    L2 Lloyd step moves them off the cosine-probed manifold. Exactly
    the decision the audit exists to inform."""
    return _ivf_trained_topk10_silver(spark, sf_dir)


def _ivf_trained_topk10_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinned TRAINED-centroid IVF retrieval over the ten audit queries
    (r15): the sim_ivf_trained_topk report and the trained arm of
    sim_ivf_trained_recall run the identical retrieval — one trained
    list build + scan per (session, sf)."""
    key = ("ivf_trained_topk10", spark.sparkContext.applicationId, sf_dir)
    df = _DEDUP_SILVER.get(key)
    if df is None:
        emb = load(spark, sf_dir, "embeddings")
        cent = _ivf_trained_cent_silver(spark, sf_dir)
        df = ivf_topk(
            emb, emb.filter(F.col("vec_id") < 10), k=5, nprobe=4, centroids=cent
        ).localCheckpoint(eager=True)
        _DEDUP_SILVER[key] = df
    return df


QUERIES["sim_ivf_trained_topk"] = sim_ivf_trained_topk


_IVF_TRAINED_CENT_CTE = """
pts AS (
  SELECT vec_id, d AS dim, CAST(round(vec[d] * 10000000) AS BIGINT) AS g
  FROM v, UNNEST(range(1, 65)) AS t(d)
), c0 AS (
  SELECT vec_id AS cid, dim, g AS c FROM pts WHERE vec_id < 16
), a1 AS (
  SELECT vec_id, cid FROM (
    SELECT p.vec_id, c0.cid,
           ROW_NUMBER() OVER (PARTITION BY p.vec_id
                              ORDER BY SUM((p.g - c0.c) * (p.g - c0.c)), c0.cid) AS rn
    FROM pts p JOIN c0 ON p.dim = c0.dim
    GROUP BY p.vec_id, c0.cid
  ) WHERE rn = 1
), c1 AS (
  SELECT cid, dim,
         (SUM(g) + COUNT(*) * CAST(20000000 AS BIGINT)) // COUNT(*)
           - CAST(20000000 AS BIGINT) AS c
  FROM pts JOIN a1 USING (vec_id)
  GROUP BY cid, dim
), cent AS (
  SELECT cid AS centroid_id,
         list_transform(array_agg(c ORDER BY dim), x -> CAST(x AS DOUBLE) / 10000000.0)
           AS cvec
  FROM c1 GROUP BY cid
)"""


def _ivf_trained_topk_oracle_sql(k: int = 5, nprobe: int = 4) -> str:
    return f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), {_IVF_TRAINED_CENT_CTE.strip()}
, assigned AS (
  SELECT neighbor_id, c_vec, centroid_id FROM (
    SELECT v.vec_id AS neighbor_id, v.vec AS c_vec, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {_cos_expr('v.vec', 'cent.cvec')} DESC, cent.centroid_id) AS rn
    FROM v, cent
  ) WHERE rn = 1
), probes AS (
  SELECT query_id, q_vec, centroid_id FROM (
    SELECT v.vec_id AS query_id, v.vec AS q_vec, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {_cos_expr('v.vec', 'cent.cvec')} DESC, cent.centroid_id) AS rn
    FROM v, cent WHERE v.vec_id < 10
  ) WHERE rn <= {nprobe}
), ranked AS (
  SELECT p.query_id, a.neighbor_id, {_cos_expr('p.q_vec', 'a.c_vec')} AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY p.query_id
                            ORDER BY {_cos_expr('p.q_vec', 'a.c_vec')} DESC, a.neighbor_id) AS rank
  FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
  WHERE a.neighbor_id != p.query_id
)
SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


ORACLES["sim_ivf_trained_topk"] = _ivf_trained_topk_oracle_sql()


def sim_ivf_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does training the lists help? Recall@5 of the TRAINED-centroid IVF
    vs the deterministic-seed IVF, both against exact brute-force truth
    on the same queries — the before/after number that justifies paying
    a Lloyd pass at index-build time. Counts int; two int÷int ratios."""
    truth = _bf_truth10_silver(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )  # shared session truth silver (r15)
    trained = _ivf_trained_topk10_silver(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )  # shared with sim_ivf_trained_topk (r15)
    plain = _ivf_topk10_silver(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )  # shared with sim_ivf_topk (r15)
    t = truth.agg(
        F.count_distinct("query_id").alias("n_queries"), F.count("*").alias("n_true")
    )
    ht = trained.join(truth, ["query_id", "neighbor_id"], "left_semi").agg(
        F.count("*").alias("n_hits_trained")
    )
    hp = plain.join(truth, ["query_id", "neighbor_id"], "left_semi").agg(
        F.count("*").alias("n_hits_plain")
    )
    return (
        t.crossJoin(ht)
        .crossJoin(hp)
        .select(
            "n_queries",
            F.lit(5).alias("k"),
            "n_hits_trained",
            (F.col("n_hits_trained").cast("double") / F.col("n_true")).alias(
                "recall_trained"
            ),
            "n_hits_plain",
            (F.col("n_hits_plain").cast("double") / F.col("n_true")).alias(
                "recall_plain"
            ),
        )
    )


QUERIES["sim_ivf_trained_recall"] = sim_ivf_trained_recall

ORACLES["sim_ivf_trained_recall"] = f"""
WITH bf AS (SELECT query_id, neighbor_id FROM ({ORACLES["sim_bruteforce_topk"]})),
tr AS (SELECT query_id, neighbor_id FROM ({_ivf_trained_topk_oracle_sql()})),
pl AS (SELECT query_id, neighbor_id FROM ({ORACLES["sim_ivf_topk"]})),
t AS (
  SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
         COUNT(*) AS n_true
  FROM bf
), ht AS (
  SELECT COUNT(*) AS n_hits_trained
  FROM (SELECT query_id, neighbor_id FROM tr
        INTERSECT SELECT query_id, neighbor_id FROM bf)
), hp AS (
  SELECT COUNT(*) AS n_hits_plain
  FROM (SELECT query_id, neighbor_id FROM pl
        INTERSECT SELECT query_id, neighbor_id FROM bf)
)
SELECT t.n_queries, CAST(5 AS INT) AS k,
       CAST(ht.n_hits_trained AS BIGINT) AS n_hits_trained,
       CAST(ht.n_hits_trained AS DOUBLE) / t.n_true AS recall_trained,
       CAST(hp.n_hits_plain AS BIGINT) AS n_hits_plain,
       CAST(hp.n_hits_plain AS DOUBLE) / t.n_true AS recall_plain
FROM t, ht, hp
"""


def text_heaps_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth over 10 crawl-order slices
    (``llmdata.text.heaps_growth``) — the growth-curve companion of
    text_zipf_fit: cumulative tokens vs cumulative vocabulary per slice
    with the fitted Heaps exponent β. Same 1e6 ln grid + DECIMAL(38,0)
    regression moments."""
    from securities_pricing_data_pipeline_spark.llmdata.text import heaps_growth

    return heaps_growth(load(spark, sf_dir, "documents"))


QUERIES["text_heaps_growth"] = text_heaps_growth

ORACLES["text_heaps_growth"] = r"""
WITH dec AS (
  SELECT doc_id, NTILE(10) OVER (ORDER BY doc_id) AS slice_id, text
  FROM documents
), toks AS (
  SELECT slice_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
  FROM dec
), tok2 AS (
  SELECT slice_id, tok FROM toks WHERE tok != ''
), per_slice AS (
  SELECT slice_id, COUNT(*) AS n_toks FROM tok2 GROUP BY 1
), nd AS (
  SELECT slice_id, COUNT(*) AS n_docs FROM dec GROUP BY 1
), nv AS (
  SELECT slice_id, COUNT(*) AS n_new
  FROM (SELECT tok, MIN(slice_id) AS slice_id FROM tok2 GROUP BY 1)
  GROUP BY 1
), grow AS (
  SELECT p.slice_id, nd.n_docs,
         SUM(p.n_toks) OVER (ORDER BY p.slice_id) AS tokens_cum,
         SUM(COALESCE(nv.n_new, 0)) OVER (ORDER BY p.slice_id) AS vocab_cum
  FROM per_slice p
  JOIN nd ON nd.slice_id = p.slice_id
  LEFT JOIN nv ON nv.slice_id = p.slice_id
), pts AS (
  SELECT slice_id, n_docs, tokens_cum, vocab_cum,
         CAST(round(ln(CAST(tokens_cum AS DOUBLE)) * 1e6) AS BIGINT) AS x,
         CAST(round(ln(CAST(vocab_cum AS DOUBLE)) * 1e6) AS BIGINT) AS y
  FROM grow
), reg AS (
  SELECT COUNT(*) AS np,
         SUM(CAST(x AS DECIMAL(38,0))) AS sx,
         SUM(CAST(y AS DECIMAL(38,0))) AS sy,
         SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
         SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx
  FROM pts
)
SELECT slice_id, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(tokens_cum AS BIGINT) AS tokens_cum,
       CAST(vocab_cum AS BIGINT) AS vocab_cum,
       CAST(CAST(np AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
         / CAST(CAST(np AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE) AS heaps_beta
FROM pts, reg ORDER BY slice_id
"""


def sim_rank_agreement_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap between the exact brute-force and LSH
    retrieval runs (``llmdata.similarity.rank_agreement_rbo``) — the
    top-weighted ranker-agreement audit that tells a serving team HOW
    the approximate ranking differs, not just how much recall it loses
    (sim_lsh's recall twin counts set hits; RBO weights the head). Per
    query plus the mean, normalized to 1.0 for identical rankings."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import (
        rank_agreement_rbo,
    )

    return rank_agreement_rbo(
        _bf_truth10_silver(spark, sf_dir),
        _lsh_topk10_silver(spark, sf_dir),
        k=5,
        p=0.9,
    )


QUERIES["sim_rank_agreement_rbo"] = sim_rank_agreement_rbo

ORACLES["sim_rank_agreement_rbo"] = f"""
WITH a AS (SELECT query_id, neighbor_id, rank AS rank_a
           FROM ({ORACLES["sim_bruteforce_topk"]})),
b AS (SELECT query_id, neighbor_id, rank AS rank_b
      FROM ({ORACLES["sim_lsh_topk"]})),
pairs AS (
  SELECT a.query_id,
         CASE GREATEST(a.rank_a, b.rank_b)
           WHEN 1 THEN CAST(0.203347 AS DECIMAL(20,10))
           WHEN 2 THEN CAST(0.103347 AS DECIMAL(20,10))
           WHEN 3 THEN CAST(0.058347 AS DECIMAL(20,10))
           WHEN 4 THEN CAST(0.031347 AS DECIMAL(20,10))
           WHEN 5 THEN CAST(0.013122 AS DECIMAL(20,10))
         END AS w
  FROM a JOIN b ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
), spine AS (
  SELECT DISTINCT query_id FROM a
), per_q AS (
  SELECT s.query_id,
         COALESCE(p.n_common, 0) AS n_common,
         CAST(COALESCE(p.rbo_dec, CAST(0 AS DECIMAL(20,10))) AS DOUBLE)
           / 0.40951 AS rbo
  FROM spine s
  LEFT JOIN (SELECT query_id, COUNT(*) AS n_common, SUM(w) AS rbo_dec
             FROM pairs GROUP BY 1) p
    ON p.query_id = s.query_id
), m AS (
  -- ROUND(…, 14) before the decimal cast, mirroring the Spark side:
  -- both engines then cast the same snapped double (DuckDB's bare
  -- double→decimal rounds half-even, Spark HALF_UP — ADVICE r11)
  SELECT CAST(SUM(CAST(ROUND(rbo, 14) AS DECIMAL(20,14))) AS DOUBLE)
           / COUNT(*) AS mean_rbo
  FROM per_q
)
SELECT query_id, CAST(n_common AS BIGINT) AS n_common, rbo, mean_rbo
FROM per_q, m ORDER BY query_id
"""


def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule bundle over the documents table
    (``llmdata.text.gopher_rules``): per-document pass/fail flags for
    each published rule plus the combined verdict — integer
    cross-multiplied thresholds, zero float ops. On this synthetic
    corpus the stopword rule (≥2 of the paper's fixed 8-word list)
    fails everywhere — the vocabulary only contains 'the' — so
    gopher_pass is all-false by construction; the per-rule flags (word
    count varies doc to doc) are the checked signal, and the rule
    constants stay the published ones rather than being tuned to make
    the synthetic data look clean."""
    from securities_pricing_data_pipeline_spark.llmdata.text import gopher_rules

    return gopher_rules(load(spark, sf_dir, "documents")).orderBy("doc_id")


QUERIES["text_gopher_rules"] = text_gopher_rules

ORACLES["text_gopher_rules"] = r"""
WITH t AS (
  SELECT doc_id,
         string_split_regex(trim(text), '\s+') AS toks,
         string_split(text, chr(10)) AS lines,
         (length(text) - length(replace(text, '#', '')))
           + (length(text) - length(replace(text, '...', ''))) // 3 AS nsym
  FROM documents
), m AS (
  SELECT doc_id,
         len(toks) AS nw,
         list_sum(list_transform(toks, w -> length(w))) AS sumlen,
         nsym,
         len(list_filter(toks, w -> regexp_matches(w, '[a-zA-Z]'))) AS nalpha,
         len(list_filter(['the','be','to','of','and','that','have','with'],
             s -> list_contains(list_transform(toks, w -> lower(w)), s))) AS stop,
         len(lines) AS nlines,
         len(list_filter(lines, l -> regexp_matches(ltrim(l), '^(\- |\* |•)'))) AS nbullet,
         len(list_filter(lines, l -> regexp_matches(rtrim(l), '\.\.\.$'))) AS nell
  FROM t
)
SELECT doc_id,
       CAST(nw AS INT) AS n_words,
       (nw >= 50 AND nw <= 100000) AS ok_word_count,
       (3 * nw <= sumlen AND sumlen <= 10 * nw) AS ok_mean_word_len,
       (10 * nsym <= nw) AS ok_symbol_ratio,
       (5 * nalpha >= 4 * nw) AS ok_alpha_words,
       (stop >= 2) AS ok_stopwords,
       (10 * nbullet <= 9 * nlines) AS ok_bullet_lines,
       (10 * nell <= 3 * nlines) AS ok_ellipsis_lines,
       ((nw >= 50 AND nw <= 100000) AND (3 * nw <= sumlen AND sumlen <= 10 * nw)
        AND (10 * nsym <= nw) AND (5 * nalpha >= 4 * nw) AND (stop >= 2)
        AND (10 * nbullet <= 9 * nlines) AND (10 * nell <= 3 * nlines)) AS gopher_pass
FROM m ORDER BY doc_id
"""


def corpus_mix_doremi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style exponentiated-gradient domain reweighting over the
    documents sources (``llmdata.sampling.doremi_mix``): per source, the
    token-weighted mean unigram NLL, its excess over the easiest source,
    and the renormalized exp(η·excess) mix weight — the data-pipeline
    half of data-mixture tuning, next to the static corpus_mix_plan."""
    from securities_pricing_data_pipeline_spark.llmdata.sampling import doremi_mix

    return doremi_mix(load(spark, sf_dir, "documents"), eta=1.0)


QUERIES["corpus_mix_doremi"] = corpus_mix_doremi

ORACLES["corpus_mix_doremi"] = r"""
WITH toks AS (
  SELECT source AS dom, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
  FROM documents
), vocab AS (
  SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1
), tot AS (
  SELECT COUNT(*) AS n_total FROM toks
), nll AS (
  SELECT t.dom,
         CAST(-ln(CAST(v.cnt AS DOUBLE) / (SELECT n_total FROM tot))
              AS DECIMAL(38,12)) AS nll
  FROM toks t JOIN vocab v USING (tok)
), dom AS (
  SELECT dom, COUNT(*) AS n_tokens,
         CAST(CAST(CAST(SUM(nll) AS DOUBLE) / COUNT(*) AS DECIMAL(20,9))
              AS DOUBLE) AS mean_nll
  FROM nll GROUP BY dom
), nd AS (
  SELECT source AS dom, COUNT(*) AS n_docs FROM documents GROUP BY 1
), mn AS (
  SELECT MIN(mean_nll) AS min_nll FROM dom
), terms AS (
  SELECT d.dom, nd.n_docs, d.n_tokens, d.mean_nll,
         d.mean_nll - mn.min_nll AS excess_nll,
         CAST(exp(1.0 * (d.mean_nll - mn.min_nll)) AS DECIMAL(20,12)) AS term
  FROM dom d JOIN nd USING (dom), mn
), z AS (
  SELECT SUM(term) AS z FROM terms
)
SELECT dom AS source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       mean_nll, excess_nll,
       CAST(term AS DOUBLE) / CAST(z.z AS DOUBLE) AS new_weight
FROM terms, z ORDER BY source
"""


def dedup_video_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTIONABLE ending of the video perceptual-dedup pipeline —
    what dedup_cluster_canonical is to MinHash text pairs: cluster the
    keyframe near-dup pairs (``dedup_video_phash``) into connected
    components and keep one canonical video (the cluster-min id) per
    component. A curator drops every row where ``is_kept`` is false;
    singleton videos keep themselves."""
    from securities_pricing_data_pipeline_spark.llmdata.dedup import (
        connected_components,
    )

    # connected_components re-joins the pair frame every min-label
    # round; the pair frame is the session video-pair silver (r15) —
    # already eagerly materialized, so each round reads the pinned RDD
    # (the r12 per-call localCheckpoint here became a redundant copy)
    pairs = dedup_video_phash(spark, sf_dir).select("id_a", "id_b")
    vertices = load(spark, sf_dir, "documents").select("doc_id")
    cc = connected_components(pairs, vertices, id_col="doc_id")
    return cc.select(
        F.col("doc_id").alias("video_id"),
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_kept"),
    ).orderBy("video_id")


QUERIES["dedup_video_keep"] = dedup_video_keep

ORACLES["dedup_video_keep"] = f"""
WITH RECURSIVE pairs AS ({_video_phash_oracle_sql(3)}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
)
SELECT id AS video_id, MIN(r) AS cluster_id,
       (MIN(r) = id) AS is_kept
FROM reach
GROUP BY id
ORDER BY video_id
"""


def text_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification over the documents table
    (``llmdata.text.langid_ngram``): hashed char-trigram multinomial
    Naive Bayes with per-language profiles trained on the corpus's own
    labels — the langid gate CCNet runs before its perplexity stages
    (Wenzek 2020 §3; fastText shape, Joulin 2016). Emits per document
    the predicted language, its exact-decimal log-score and the
    label-agreement flag consumed by ``text_langid_ngram_eval``. Distinct
    from ``text_lang_id`` (the stopword/CJK heuristic): this one is the
    TRAINED classifier."""
    from securities_pricing_data_pipeline_spark.llmdata.text import langid_ngram

    return langid_ngram(load(spark, sf_dir, "documents")).orderBy("doc_id")


QUERIES["text_langid_ngram"] = text_langid_ngram


def _langid_oracle_sql(n: int = 3, buckets: int = 256, src: str = "documents") -> str:
    """DuckDB replay of langid_ngram: same grams, same md5-based hash
    buckets, same Laplace profiles and 1e-12-grid ln sums, same
    (score DESC, lang ASC) argmax. ``src`` is any table expression with
    (doc_id, lang, text) — the skewed-eval oracle passes a derived
    subquery."""
    return f"""
WITH base AS (
  SELECT doc_id, lang, lower(trim(text)) AS t FROM {src}
), grams AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(substr(t, CAST(i AS INT) + 1, {n})), 1, 15))
              AS BIGINT) % {buckets} AS b
  FROM base, UNNEST(range(greatest(length(t) - {n - 1}, 0))) AS u(i)
), cnts AS (
  SELECT lang, b, COUNT(*) AS cnt FROM grams GROUP BY 1, 2
), tots AS (
  SELECT lang, COUNT(*) AS n_grams FROM grams GROUP BY 1
), langs AS (
  SELECT lang, COUNT(*) AS n_docs FROM base GROUP BY 1
), grid AS (
  SELECT l.lang, u.b FROM (SELECT DISTINCT lang FROM base) l,
       UNNEST(range({buckets})) AS u(b)
), profile AS (
  SELECT g.lang AS cand, g.b,
         CAST(ln(CAST(COALESCE(c.cnt, 0) + 1 AS DOUBLE)
                 / CAST(COALESCE(t.n_grams, 0) + {buckets} AS DOUBLE))
              AS DECIMAL(38,12)) AS logp
  FROM grid g
  LEFT JOIN cnts c ON c.lang = g.lang AND c.b = g.b
  LEFT JOIN tots t ON t.lang = g.lang
), priors AS (
  SELECT lang AS cand,
         CAST(ln(CAST(n_docs AS DOUBLE)
                 / CAST((SELECT SUM(n_docs) FROM langs) AS DOUBLE))
              AS DECIMAL(38,12)) AS logprior
  FROM langs
), contrib AS (
  SELECT g.doc_id, p.cand, SUM(p.logp) AS gram_score
  FROM grams g JOIN profile p ON p.b = g.b
  GROUP BY 1, 2
), scored AS (
  SELECT s.doc_id, s.lang, pr.cand,
         pr.logprior + COALESCE(c.gram_score, CAST(0 AS DECIMAL(38,12)))
           AS score
  FROM (SELECT doc_id, lang FROM base) s
  CROSS JOIN priors pr
  LEFT JOIN contrib c ON c.doc_id = s.doc_id AND c.cand = pr.cand
)
SELECT doc_id, lang, cand AS pred_lang,
       CAST(ROUND(score, 6) AS DOUBLE) AS log_score,
       (cand = lang) AS is_match
FROM (
  SELECT doc_id, lang, cand, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, cand) AS rn
  FROM scored
) WHERE rn = 1
ORDER BY doc_id
"""


ORACLES["text_langid_ngram"] = _langid_oracle_sql()


def text_langid_ngram_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Langid audit — the confusion matrix of ``text_langid_ngram`` against
    the table's own labels plus overall accuracy, the same
    classifier-vs-truth audit shape as dedup_simhash_eval and the
    recall ladder: per (label, predicted) pair the document count, each
    row carrying the corpus-level accuracy. On this synthetic corpus
    (labels are assigned independently of the token stream) accuracy
    hovers near the majority-class prior — the audit REPORTING that
    honestly is exactly its job; on a real multilingual corpus the same
    query reads precision per language."""
    # pin: pred feeds BOTH the confusion matrix and the accuracy scalar —
    # unpinned, the whole gram-explode + profile + contrib pipeline
    # replays once per consumer (r14, guide §2.4; doc-sized narrow rows)
    pred = text_langid_ngram(spark, sf_dir).localCheckpoint(eager=True)
    conf = pred.groupBy("lang", "pred_lang").agg(F.count("*").alias("n_docs"))
    acc = pred.agg(
        (
            F.sum(F.col("is_match").cast("long")).cast("double") / F.count("*")
        ).alias("accuracy")
    )
    return (
        conf.crossJoin(F.broadcast(acc))
        .select("lang", "pred_lang", "n_docs", "accuracy")
        .orderBy("lang", "pred_lang")
    )


QUERIES["text_langid_ngram_eval"] = text_langid_ngram_eval

ORACLES["text_langid_ngram_eval"] = f"""
WITH pred AS ({_langid_oracle_sql()}),
acc AS (
  SELECT CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS accuracy
  FROM pred
)
SELECT lang, pred_lang, COUNT(*) AS n_docs, (SELECT accuracy FROM acc) AS accuracy
FROM pred
GROUP BY lang, pred_lang
ORDER BY lang, pred_lang
"""


#: deterministic per-language marker vocabulary for the skewed langid
#: eval: letter pairs that cannot occur in the synthetic corpus text, so
#: the injected trigram mass is unambiguously language-specific
_LANGID_SKEW_LANGS = ["da", "fi", "nl", "no", "sv"]
_LANGID_SKEW_MARKS = {
    "da": "zq vq xq",
    "fi": "zs vs xs",
    "nl": "zw vw xw",
    "no": "zt vt xt",
    "sv": "zr vr xr",
}


def _langid_skewed_docs(docs: DataFrame) -> DataFrame:
    """Language-SKEWED derived view of the documents table (the
    ``crossmodal_project`` trick applied to text): each doc gets a
    deterministic label ``lang = LANGS[doc_id % 5]`` and its text gains
    that language's marker phrase repeated once per ~6 tokens — so the
    token stream now genuinely DEPENDS on the label, unlike the table's
    own synthetic ``lang`` column (label-independent text is why
    ``text_langid_ngram_eval`` honestly reports near-prior accuracy; it
    can never exercise the classifier's discrimination end-to-end,
    VERDICT r12 #6). Pure codegen projection — no shuffle, no Python."""
    idx = ((F.col("doc_id") % 5) + 1).cast("int")
    lang = F.element_at(F.array(*[F.lit(l) for l in _LANGID_SKEW_LANGS]), idx)
    mark = F.element_at(
        F.array(*[F.lit(" " + _LANGID_SKEW_MARKS[l]) for l in _LANGID_SKEW_LANGS]),
        idx,
    )
    reps = F.greatest(
        F.lit(1), F.expr("size(split(trim(text), '\\\\s+')) div 6")
    )
    return docs.select(
        "doc_id",
        lang.alias("lang"),
        F.concat(F.lower(F.trim(F.col("text"))), F.repeat(mark, reps)).alias(
            "text"
        ),
    )


def text_langid_skewed_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Langid DISCRIMINATION audit (VERDICT r12 #6): the same trained
    hashed-trigram NB classifier and confusion-matrix shape as
    ``text_langid_ngram_eval``, but over the language-skewed derived
    view (``_langid_skewed_docs``) whose token stream depends on the
    label — so accuracy is a meaningful end-to-end number at SF scale
    (measured ≥ 0.9; the unit test asserts it) instead of the honest
    near-prior reading the label-independent corpus forces. Together
    the two evals bracket the classifier: skewed ≈ its ceiling on
    separable data, raw ≈ its floor on unseparable data."""
    from securities_pricing_data_pipeline_spark.llmdata.text import langid_ngram

    pred = langid_ngram(
        _langid_skewed_docs(load(spark, sf_dir, "documents"))
    ).localCheckpoint(eager=True)  # two consumers, one compute (r14)
    conf = pred.groupBy("lang", "pred_lang").agg(F.count("*").alias("n_docs"))
    acc = pred.agg(
        (
            F.sum(F.col("is_match").cast("long")).cast("double") / F.count("*")
        ).alias("accuracy")
    )
    return (
        conf.crossJoin(F.broadcast(acc))
        .select("lang", "pred_lang", "n_docs", "accuracy")
        .orderBy("lang", "pred_lang")
    )


QUERIES["text_langid_skewed_eval"] = text_langid_skewed_eval

_LANGID_SKEW_SRC = (
    "(SELECT doc_id, (["
    + ",".join(f"'{l}'" for l in _LANGID_SKEW_LANGS)
    + "])[CAST(doc_id % 5 AS INT) + 1] AS lang, lower(trim(text)) || repeat((["
    + ",".join(f"' {_LANGID_SKEW_MARKS[l]}'" for l in _LANGID_SKEW_LANGS)
    + "])[CAST(doc_id % 5 AS INT) + 1], GREATEST(1, "
    "len(string_split_regex(trim(text), '\\s+')) // 6)) AS text "
    "FROM documents)"
)

ORACLES["text_langid_skewed_eval"] = f"""
WITH pred AS ({_langid_oracle_sql(src=_LANGID_SKEW_SRC)}),
acc AS (
  SELECT CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS accuracy
  FROM pred
)
SELECT lang, pred_lang, COUNT(*) AS n_docs, (SELECT accuracy FROM acc) AS accuracy
FROM pred
GROUP BY lang, pred_lang
ORDER BY lang, pred_lang
"""


def decontam_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic benchmark decontamination over the embeddings
    (``llmdata.similarity.semantic_decontam``): vectors with
    vec_id % 97 == 31 stand in as the held-out benchmark/eval items
    (the text_decontaminate convention, moved off the low-id range so
    the anchor-centroid set stays identical to dedup_semantic's);
    every remaining train vector within grid-cosine 0.4 of a benchmark
    item is flagged with its best match — the list a curator REMOVES
    before training. Bucketed through the shared SemDeDup centroid
    assignment, never all-pairs."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import (
        semantic_decontam,
    )

    emb = load(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 97 == 31)
    train = emb.filter(F.col("vec_id") % 97 != 31)
    return semantic_decontam(train, bench, threshold=0.25).orderBy("vec_id")


QUERIES["decontam_semantic"] = decontam_semantic

ORACLES["decontam_semantic"] = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), cent AS (
  SELECT vec_id AS centroid_id, vec AS cvec FROM v
  WHERE vec_id < 16 AND vec_id % 97 <> 31
), train AS (
  SELECT vec_id AS id, vec FROM v WHERE vec_id % 97 <> 31
), bench AS (
  SELECT vec_id AS bench_id, vec AS bvec FROM v WHERE vec_id % 97 = 31
), at AS (
  SELECT id, centroid_id, vec FROM (
    SELECT t.id, c.centroid_id, t.vec,
           ROW_NUMBER() OVER (PARTITION BY t.id
                              ORDER BY {_cos_expr('t.vec', 'c.cvec')} DESC,
                                       c.centroid_id) AS rn
    FROM train t, cent c
  ) WHERE rn = 1
), ab AS (
  SELECT bench_id, centroid_id, bvec FROM (
    SELECT b.bench_id, c.centroid_id, b.bvec,
           ROW_NUMBER() OVER (PARTITION BY b.bench_id
                              ORDER BY {_cos_expr('b.bvec', 'c.cvec')} DESC,
                                       c.centroid_id) AS rn
    FROM bench b, cent c
  ) WHERE rn = 1
), scored AS (
  SELECT t.id, b.bench_id, {_cos_expr('t.vec', 'b.bvec')} AS cos_sim
  FROM at t JOIN ab b ON t.centroid_id = b.centroid_id
  WHERE t.id <> b.bench_id AND {_cos_expr('t.vec', 'b.bvec')} >= 0.25
)
SELECT id AS vec_id, bench_id, cos_sim FROM (
  SELECT id, bench_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY id
                            ORDER BY cos_sim DESC, bench_id) AS rn
  FROM scored
) WHERE rn = 1
ORDER BY vec_id
"""


def _hnsw_top_edge_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinned UPPER-LAYER adjacency for HNSW — the same
    ``nsw_build_edges`` kernel over the hash-selected sparse subset
    (portable_hash60(id) ≡ 0 mod 8, ~|corpus|/8 nodes), plus the
    deterministic long-range shortcut ring (``shortcuts=True`` — the
    r13 navigability fix; see ``llmdata.similarity.shortcut_edges``);
    the second of the two index artifacts hierarchical search serves
    from (layer 0 uses :func:`_hnsw_l0_edge_silver`)."""
    from pyspark import StorageLevel

    from securities_pricing_data_pipeline_spark.llmdata.dedup import portable_hash60
    from securities_pricing_data_pipeline_spark.llmdata.similarity import (
        nsw_build_edges,
    )

    key = ("hnsw_top_edges", spark.sparkContext.applicationId, sf_dir)
    df = _DEDUP_SILVER.get(key)
    if df is None:
        emb = load(spark, sf_dir, "embeddings").filter(
            portable_hash60(F.col("vec_id").cast("string")) % 8 == 0
        )
        df = _right_size_silver(
            nsw_build_edges(emb, shortcuts=True).persist(
                StorageLevel.MEMORY_AND_DISK
            )
        )
        _DEDUP_SILVER[key] = df
    return df


def _hnsw_l0_edge_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinned LAYER-0 adjacency for HNSW: the shared LSH adjacency
    (``_nsw_edge_silver`` — reused, not rebuilt) unioned with the
    shortcut ring over the full corpus. Kept as a separate silver so
    ``sim_nsw_topk``'s graph (and oracle) stay byte-identical to r12
    while HNSW searches the navigable graph; the union itself is two
    cached narrow scans, so the only new build cost is the one-time
    rank-window over bare ids."""
    from pyspark import StorageLevel

    from securities_pricing_data_pipeline_spark.llmdata.similarity import (
        shortcut_edges,
    )

    key = ("hnsw_l0_edges", spark.sparkContext.applicationId, sf_dir)
    df = _DEDUP_SILVER.get(key)
    if df is None:
        df = (
            _nsw_edge_silver(spark, sf_dir)
            .unionByName(shortcut_edges(load(spark, sf_dir, "embeddings")))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # materializes now (count inside): search plans must see only the cache
        df = _right_size_silver(df)
        _DEDUP_SILVER[key] = df
    return df


def sim_hnsw_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical graph ANN over the embeddings
    (``llmdata.similarity.hnsw_topk``): the full HNSW shape — a sparse
    hashed upper layer greedy-descends to per-query layer-0 entry
    points, replacing nsw_topk's fixed low-id entries, over the
    NAVIGABLE graph (LSH adjacency ∪ deterministic exponential id-rank
    shortcut ring — the r13 fix; an LSH-only graph has no
    inter-cluster path, capping descent recall at 0.15 in the r12 50k
    probe; with the ring the same probe records 0.60 vs fixed entries'
    0.00, see probe_hnsw_entry). Two pinned index silvers (layer-0 =
    shared LSH adjacency ∪ shortcuts, upper-layer adjacency
    ~|corpus|/8 with its own ring); broadcast-only search plan; exact
    grid cosine. Audit twin: ``sim_hnsw_recall``."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import hnsw_topk

    emb = load(spark, sf_dir, "embeddings")
    return hnsw_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        k=5,
        edges=_hnsw_l0_edge_silver(spark, sf_dir),
        edges_top=_hnsw_top_edge_silver(spark, sf_dir),
        cvec=_nsw_cvec_silver(spark, sf_dir),
    )


QUERIES["sim_hnsw_topk"] = sim_hnsw_topk


def _hnsw_topk_oracle_sql(
    k: int = 5,
    n_planes: int = 16,
    bands: int = 4,
    m_neighbors: int = 16,
    layer_mod: int = 8,
    n_entry_top: int = 16,
    beam_top: int = 16,
    rounds_top: int = 2,
    beam: int = 16,
    rounds: int = 4,
) -> str:
    """Unrolled DuckDB replay of hnsw_topk: layer-0 AND upper-layer
    edge builds (banded pairs → per-node top-m, UNIONed with the
    deterministic exponential id-rank shortcut ring —
    ``llmdata.similarity.shortcut_edges``, the r13 navigability fix),
    rank-based upper-layer entries, ``rounds_top`` coarse beam CTEs,
    then ``rounds`` layer-0 CTEs seeded by the descent — identical
    (cos DESC, node ASC) cuts."""
    rpb = n_planes // bands
    mask = (1 << rpb) - 1
    block_eq = " OR ".join(
        f"((a.sig >> {rpb * i}) & {mask}) = ((b.sig >> {rpb * i}) & {mask})"
        for i in range(bands)
    )
    hash_mod = (
        "CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT)"
        f" % {layer_mod} = 0"
    )

    def edges_cte(name: str, src: str) -> str:
        return f"""pairs_{name} AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_cos_expr('a.vec', 'b.vec')} AS cos
  FROM {src} a JOIN {src} b ON a.vec_id < b.vec_id AND ({block_eq})
), sym_{name} AS (
  SELECT id_a AS src, id_b AS dst, cos FROM pairs_{name}
  UNION ALL
  SELECT id_b AS src, id_a AS dst, cos FROM pairs_{name}
), rk_{name} AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS r,
         COUNT(*) OVER () AS m
  FROM {src}
), sc0_{name} AS (
  SELECT a.vec_id AS src, b.vec_id AS dst
  FROM rk_{name} a
  CROSS JOIN range(0, 40) t(j)
  JOIN rk_{name} b
    ON (CAST(1 AS BIGINT) << t.j) < a.m
   AND b.r = (a.r + (CAST(1 AS BIGINT) << t.j)) % a.m
), edges_{name} AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
    FROM sym_{name}
  ) WHERE rn <= {m_neighbors}
  UNION ALL SELECT src, dst FROM sc0_{name}
  UNION ALL SELECT dst AS src, src AS dst FROM sc0_{name}
)"""

    def round_ctes(prev: str, name: str, edges: str, bw: int) -> str:
        return f""", s_{name} AS (
  SELECT f.query_id, ed.dst AS node, {_cos_expr('q.qv', 'nv.vec')} AS cos
  FROM {prev} f
  JOIN {edges} ed ON ed.src = f.node
  JOIN v nv ON nv.vec_id = ed.dst
  JOIN q ON q.query_id = f.query_id
  WHERE ed.dst != f.query_id
), {name} AS (
  SELECT query_id, node, cos FROM (
    SELECT query_id, node, cos,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, node) AS rn
    FROM (
      SELECT query_id, node, MAX(cos) AS cos FROM (
        SELECT query_id, node, cos FROM {prev}
        UNION ALL
        SELECT query_id, node, cos FROM s_{name}
      ) GROUP BY 1, 2
    )
  ) WHERE rn <= {bw}
)"""

    parts = [f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), sig AS (
  SELECT vec_id, vec, {_plane_sig_sql('vec', n_planes=n_planes)} AS sig FROM v
), mem AS (
  SELECT vec_id, vec, sig FROM sig WHERE {hash_mod}
), {edges_cte('l0', 'sig')}, {edges_cte('top', 'mem')}, q AS (
  SELECT vec_id AS query_id, vec AS qv FROM v WHERE vec_id < 10
), ent AS (
  SELECT vec_id, vec FROM (
    SELECT vec_id, vec, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM mem
  ) WHERE rn <= {n_entry_top}
), t0 AS (
  SELECT query_id, node, cos FROM (
    SELECT q.query_id, e.vec_id AS node, {_cos_expr('q.qv', 'e.vec')} AS cos,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {_cos_expr('q.qv', 'e.vec')} DESC, e.vec_id) AS rn
    FROM q, ent e WHERE e.vec_id != q.query_id
  ) WHERE rn <= {beam_top}
)"""]
    prev = "t0"
    for r in range(1, rounds_top + 1):
        parts.append(round_ctes(prev, f"t{r}", "edges_top", beam_top))
        prev = f"t{r}"
    for r in range(1, rounds + 1):
        parts.append(round_ctes(prev, f"g{r}", "edges_l0", beam))
        prev = f"g{r}"
    parts.append(f"""
SELECT query_id, node AS neighbor_id, cos AS cos_sim, CAST(rank AS INT) AS rank
FROM (
  SELECT query_id, node, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, node) AS rank
  FROM {prev}
) WHERE rank <= {k}
""")
    return "".join(parts)


ORACLES["sim_hnsw_topk"] = _hnsw_topk_oracle_sql()


def sim_hnsw_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical-ANN quality audit: recall@5 of HNSW greedy-descent
    beam search against exact brute-force cosine on the same queries,
    next to sim_nsw_recall (same LSH layer-0 edges and round count;
    descent + shortcut ring instead of fixed entries). Measured with
    the r13 navigable graph: 0.96 vs NSW's 0.94 at sf0.01, 0.84 vs
    0.80 at sf0.1 — descent now wins at the bench SFs too (r12's
    LSH-only graph had it LOSING 0.90/0.74, recorded honestly then;
    the 50k probe shows the gap widening decisively at 25× corpus:
    0.60 vs 0.00)."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import hnsw_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    truth = _bf_truth10_silver(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )  # shared session truth silver (r15): one exact pass per session
    approx = hnsw_topk(
        emb,
        queries,
        k=5,
        edges=_hnsw_l0_edge_silver(spark, sf_dir),
        edges_top=_hnsw_top_edge_silver(spark, sf_dir),
        cvec=_nsw_cvec_silver(spark, sf_dir),
    ).select("query_id", "neighbor_id")
    hits = approx.join(truth, ["query_id", "neighbor_id"], "left_semi")
    t = truth.agg(
        F.count_distinct("query_id").alias("n_queries"), F.count("*").alias("n_true")
    )
    h = hits.agg(F.count("*").alias("n_hits"))
    return t.crossJoin(h).select(
        "n_queries",
        F.lit(5).alias("k"),
        "n_hits",
        (F.col("n_hits").cast("double") / F.col("n_true")).alias("recall_at_k"),
    )


QUERIES["sim_hnsw_recall"] = sim_hnsw_recall

ORACLES["sim_hnsw_recall"] = f"""
WITH bf AS (SELECT query_id, neighbor_id FROM ({ORACLES["sim_bruteforce_topk"]})),
hw AS (SELECT query_id, neighbor_id FROM ({_hnsw_topk_oracle_sql()})),
t AS (
  SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
         COUNT(*) AS n_true
  FROM bf
), h AS (
  SELECT COUNT(*) AS n_hits
  FROM (SELECT query_id, neighbor_id FROM hw
        INTERSECT SELECT query_id, neighbor_id FROM bf)
)
SELECT t.n_queries, CAST(5 AS INT) AS k, CAST(h.n_hits AS BIGINT) AS n_hits,
       CAST(h.n_hits AS DOUBLE) / t.n_true AS recall_at_k
FROM t, h
"""


def sim_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF TUNING CURVE — recall@5 at nprobe ∈ {1, 2, 4, 8, 16} in one
    result: the table a retrieval team reads to pick its latency/recall
    operating point (every IVF deployment runs exactly this sweep before
    fixing nprobe). nprobe = n_centroids = 16 probes every list, so its
    recall is 1.0 BY CONSTRUCTION — a built-in exactness anchor that
    certifies the sweep itself (an anchor below 1.0 means the index or
    the audit is broken, not the parameter). Truth is pinned once and
    served to all five audits.

    r14 plan (guide §2.4 — remove repeated work outright): the probed
    lists are NESTED in nprobe, so ONE scored pass at nprobe=16 with the
    probe rank attached (``ivf_sweep_scored``) subsumes every level —
    per level the candidates are exactly the rows with probe_rn ≤
    nprobe, cut to top-k by the identical (cos DESC, id ASC) window.
    The r13 shape paid the full IVF pipeline (assignment + probe + list
    scan) PER LEVEL: 120 Exchanges / 10 ArrowEvalPython / 48 jobs
    measured; this shape runs one assignment (2 ArrowEvalPython) + one
    scoring join + one shared window over the level-exploded candidates.
    Equivalence is structural (nested lists + identical expressions) and
    oracle-gated: the DuckDB oracle still replays five independent IVF
    retrievals."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import (
        ivf_sweep_scored,
    )

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    truth = _bf_truth10_silver(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )  # shared session truth silver (r15): five audit consumers here
    n_true = truth.agg(F.count("*").alias("n_true"))
    levels = (1, 2, 4, 8, 16)
    scored = ivf_sweep_scored(emb, queries, n_centroids=16, nprobe_max=16)
    # each candidate fans out to every swept level that probes its list
    # (probe_rn <= nprobe); one window per (nprobe, query) then replays
    # the per-level top-k cut bit-identically
    cand = scored.select(
        "query_id",
        "neighbor_id",
        "cos_sim",
        F.explode(
            F.filter(
                F.array(*[F.lit(lv) for lv in levels]),
                lambda lv: lv >= F.col("probe_rn"),
            )
        ).alias("nprobe"),
    )
    w = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    hits = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .join(truth, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("nprobe")
        .agg(F.count("*").alias("n_hits"))
    )
    # literal level spine: a level with zero hits must still emit its row
    # (the r13 per-level 1-row aggregates could never be empty)
    spine = F.broadcast(
        emb.sparkSession.range(len(levels)).select(
            F.element_at(
                F.array(*[F.lit(lv) for lv in levels]), (F.col("id") + 1).cast("int")
            ).alias("nprobe")
        )
    )
    return (
        spine.join(hits, "nprobe", "left")
        .crossJoin(F.broadcast(n_true))
        .select(
            "nprobe",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.col("n_true")
            ).alias("recall_at_k"),
        )
        .orderBy("nprobe")
    )


QUERIES["sim_ivf_nprobe_sweep"] = sim_ivf_nprobe_sweep

ORACLES["sim_ivf_nprobe_sweep"] = f"""
WITH bf AS (SELECT query_id, neighbor_id FROM ({ORACLES["sim_bruteforce_topk"]})),
t AS (SELECT COUNT(*) AS n_true FROM bf),
{", ".join(
    f'''i{np_} AS (
  SELECT COUNT(*) AS n_hits FROM (
    SELECT query_id, neighbor_id FROM ({_ivf_topk_oracle_sql(nprobe=np_)})
    INTERSECT SELECT query_id, neighbor_id FROM bf
  )
)''' for np_ in (1, 2, 4, 8, 16)
)}
{" UNION ALL ".join(
    f'''SELECT {np_} AS nprobe, CAST(i{np_}.n_hits AS BIGINT) AS n_hits,
       CAST(i{np_}.n_hits AS DOUBLE) / t.n_true AS recall_at_k
FROM i{np_}, t''' for np_ in (1, 2, 4, 8, 16)
)}
ORDER BY nprobe
"""


def sim_crossmodal_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE MINING over the cross-modal space — the
    contrastive-training data op (CLIP/SigLIP-style encoders train on
    (anchor, positive, hard negative) triples, and the standard recipe
    mines negatives with the serving ANN index, e.g. Karpukhin 2020's
    BM25/ANN hard negatives for DPR): for every image-side query its
    paired text item is the POSITIVE (id = query − 10M, the
    sim_crossmodal pairing), and the hard negative is the best-ranked
    NON-positive item in the IVF top-5 — the most confusable wrong
    answer, which is exactly what the loss needs. Emits per query the
    triple plus both exact grid cosines and the margin
    (cos_pos − cos_neg); a NEGATIVE margin marks pairs the current
    embedding space gets wrong — the rows a curator inspects first.

    Plan: one IVF retrieval (broadcast centroids, nprobe-list scan — the
    sim_crossmodal_topk plan), a per-query window on the 5-row result,
    and one broadcast join of the small query side against the corpus
    for the positive cosine. Nothing corpus-quadratic; the mined triples
    are |queries| rows."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import (
        cosine_with_norms,
        norm_grid,
    )

    emb = load(spark, sf_dir, "embeddings")
    q = _crossmodal_queries(emb)
    retrieved = _crossmodal_ivf_silver(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    hard = (
        retrieved.filter(
            F.col("neighbor_id") != F.col("query_id") - _CROSSMODAL_OFFSET
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("neighbor_id").alias("hard_negative_id"),
            F.col("cos_sim").alias("cos_neg"),
        )
    )
    qv = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        norm_grid(F.col("embedding")).alias("qn"),
        (F.col("vec_id") - _CROSSMODAL_OFFSET).alias("positive_id"),
    )
    pv = emb.select(
        F.col("vec_id").alias("positive_id"),
        F.col("embedding").alias("pvec"),
        norm_grid(F.col("embedding")).alias("pnrm"),
    )
    pos = F.broadcast(qv).join(pv, "positive_id").select(
        "query_id",
        "positive_id",
        cosine_with_norms(
            F.col("qv"), F.col("pvec"), F.col("qn"), F.col("pnrm")
        ).alias("cos_pos"),
    )
    return (
        pos.join(hard, "query_id")
        .select(
            "query_id",
            "positive_id",
            "hard_negative_id",
            "cos_pos",
            "cos_neg",
            (F.col("cos_pos") - F.col("cos_neg")).alias("margin"),
        )
        .orderBy("query_id")
    )


QUERIES["sim_crossmodal_hard_negatives"] = sim_crossmodal_hard_negatives

ORACLES["sim_crossmodal_hard_negatives"] = f"""
WITH r AS (
  SELECT query_id, neighbor_id, cos_sim FROM ({_crossmodal_topk_oracle_sql()})
), h AS (
  SELECT query_id, neighbor_id AS hard_negative_id, cos_sim AS cos_neg FROM (
    SELECT query_id, neighbor_id, cos_sim,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM r WHERE neighbor_id <> query_id - {_CROSSMODAL_OFFSET}
  ) WHERE rn = 1
), vv AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), qq AS (
  SELECT vec_id AS query_id, vec_id - {_CROSSMODAL_OFFSET} AS positive_id, vec
  FROM (
  {_crossmodal_q_cte().replace('FROM v ', 'FROM vv ')}
  )
), pos AS (
  SELECT q.query_id, q.positive_id,
         {_cos_expr('q.vec', 'p.vec')} AS cos_pos
  FROM qq q JOIN vv p ON p.vec_id = q.positive_id
)
SELECT pos.query_id, pos.positive_id, h.hard_negative_id,
       pos.cos_pos, h.cos_neg, pos.cos_pos - h.cos_neg AS margin
FROM pos JOIN h ON h.query_id = pos.query_id
ORDER BY pos.query_id
"""


def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup TUNING CURVE — the near-dup companion of
    sim_ivf_nprobe_sweep: pair count and affected-document count at
    est-Jaccard thresholds 0.5 → 0.9 in one result, the table a curator
    reads to pick the dedup aggressiveness before a corpus-shrink pass
    (too low deletes paraphrases, too high leaves templates; every
    production dedup run sweeps this before committing). One pass: the
    pinned pair silver (threshold 0.5, the loosest row) is filtered
    upward — est_jaccard values are exact k/64 grid points, so the
    comparisons are engine-stable — and each threshold contributes a
    1-row aggregate; nothing re-pairs."""
    pairs = _lsh_pairs(spark, sf_dir)
    parts = []
    for t in (0.5, 0.6, 0.7, 0.8, 0.9):
        f = pairs.filter(F.col("est_jaccard") >= t)
        docs = f.select(F.col("id_a").alias("d")).unionByName(
            f.select(F.col("id_b").alias("d"))
        )
        parts.append(
            f.agg(F.count("*").alias("n_pairs"))
            .crossJoin(
                F.broadcast(
                    docs.agg(F.count_distinct("d").alias("n_docs_affected"))
                )
            )
            .select(
                F.lit(float(t)).alias("threshold"), "n_pairs", "n_docs_affected"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("threshold")


QUERIES["dedup_threshold_sweep"] = dedup_threshold_sweep

ORACLES["dedup_threshold_sweep"] = f"""
WITH p AS (SELECT id_a, id_b, est_jaccard FROM ({_minhash_oracle_sql()}))
{" UNION ALL ".join(
    f'''SELECT CAST({t} AS DOUBLE) AS threshold,
       (SELECT COUNT(*) FROM p WHERE est_jaccard >= {t}) AS n_pairs,
       (SELECT COUNT(DISTINCT d) FROM (
          SELECT id_a AS d FROM p WHERE est_jaccard >= {t}
          UNION ALL SELECT id_b FROM p WHERE est_jaccard >= {t}
        )) AS n_docs_affected'''
    for t in (0.5, 0.6, 0.7, 0.8, 0.9)
)}
ORDER BY threshold
"""


def emb_semantic_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic OUTLIER report — the prune-the-noise complement of
    SemDeDup's prune-the-duplicates (the same paper's other lever:
    points far from every cluster are OCR garbage, wrong-modality
    embeds, or adversarial junk — curators drop the tail): every vector
    takes the shared nearest-centroid assignment, its exact grid cosine
    TO ITS OWN centroid is its typicality score, and each cluster
    reports its 3 most-outlying members by (cos ASC, id ASC) — a
    rank-based cut, deterministic and threshold-free (a float quantile
    threshold would be engine-fragile; the per-cluster bottom-k is
    what a triage queue wants anyway). Plan: the two-phase assignment
    kernel + one broadcast centroid join + a per-cluster window on
    narrow rows."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import (
        cosine_with_norms,
        nearest_centroid,
        norm_grid,
    )

    emb = load(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cent_vec"),
        norm_grid(F.col("embedding")).alias("cent_norm"),
    )
    c = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vec"),
        norm_grid(F.col("embedding")).alias("norm"),
    )
    scored = (
        nearest_centroid(c, cents)
        .join(c, "id")
        .join(F.broadcast(cents), "centroid_id")
        .select(
            "centroid_id",
            F.col("id").alias("vec_id"),
            cosine_with_norms(
                F.col("vec"), F.col("cent_vec"), F.col("norm"), F.col("cent_norm")
            ).alias("cos_to_centroid"),
        )
    )
    w = Window.partitionBy("centroid_id").orderBy(
        F.asc("cos_to_centroid"), F.asc("vec_id")
    )
    return (
        scored.withColumn("outlier_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("outlier_rank") <= 3)
        .orderBy("centroid_id", "outlier_rank")
    )


QUERIES["emb_semantic_outliers"] = emb_semantic_outliers

ORACLES["emb_semantic_outliers"] = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), cent AS (
  SELECT vec_id AS centroid_id, vec AS cvec FROM v WHERE vec_id < 16
), assigned AS (
  SELECT id, centroid_id FROM (
    SELECT t.vec_id AS id, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY t.vec_id
                              ORDER BY {_cos_expr('t.vec', 'c.cvec')} DESC,
                                       c.centroid_id) AS rn
    FROM v t, cent c
  ) WHERE rn = 1
), scored AS (
  SELECT a.centroid_id, a.id AS vec_id,
         {_cos_expr('t.vec', 'c.cvec')} AS cos_to_centroid
  FROM assigned a
  JOIN v t ON t.vec_id = a.id
  JOIN cent c ON c.centroid_id = a.centroid_id
)
SELECT centroid_id, vec_id, cos_to_centroid, CAST(outlier_rank AS INT) AS outlier_rank
FROM (
  SELECT centroid_id, vec_id, cos_to_centroid,
         ROW_NUMBER() OVER (PARTITION BY centroid_id
                            ORDER BY cos_to_centroid ASC, vec_id) AS outlier_rank
  FROM scored
) WHERE outlier_rank <= 3
ORDER BY centroid_id, outlier_rank
"""


def sample_uncertainty_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACTIVE-LEARNING labeling queue — vote-margin uncertainty sampling
    (Lewis & Gale 1994; the selection every labeling team runs to spend
    annotation budget where the model is least sure): the unlabeled pool
    (vec_id % 7 == 3, disjoint from sim_knn_classify's eval slice) is
    classified by 5-NN majority vote against the LABELED remainder, and
    the 20 pool items with the smallest vote margin (top-1 votes minus
    runner-up votes; ties by vec_id) are emitted as the queue, each with
    its tentative label, runner-up, and margin.

    Exactness: neighbor ranks ride the shared integer-grid cosine;
    votes, margins and the queue cut are pure integer comparisons.
    Plan: the pool broadcasts through ``brute_force_topk_np`` (one
    corpus scan, BLAS prefilter + exact-grid rescore — linear, never
    all-pairs), then two bounded hash aggregates and one 20-row window;
    at 100 TB the kNN step swaps to the IVF index exactly as
    sim_crossmodal_hard_negatives does."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import (
        brute_force_topk_np,
    )

    emb = load(spark, sf_dir, "embeddings")
    pool = emb.filter(F.col("vec_id") % 7 == 3)
    train = emb.filter(F.col("vec_id") % 7 != 3)
    nn = brute_force_topk_np(train, pool, k=5)
    votes = (
        nn.join(
            F.broadcast(
                train.select(
                    F.col("vec_id").alias("neighbor_id"),
                    F.col("label").alias("nlabel"),
                )
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "nlabel")
        .agg(F.count("*").alias("v"))
    )
    wv = Window.partitionBy("query_id").orderBy(F.desc("v"), F.asc("nlabel"))
    ranked = votes.withColumn("rn", F.row_number().over(wv)).filter(
        F.col("rn") <= 2
    )
    per_q = ranked.groupBy("query_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("nlabel"))).alias("pred_label"),
        F.max(F.when(F.col("rn") == 2, F.col("nlabel"))).alias("runner_up_label"),
        (
            F.max(F.when(F.col("rn") == 1, F.col("v")))
            - F.coalesce(F.max(F.when(F.col("rn") == 2, F.col("v"))), F.lit(0))
        ).cast("long").alias("margin"),
    )
    wq = Window.orderBy(F.asc("margin"), F.asc("query_id"))
    return (
        per_q.withColumn("queue_rank", F.row_number().over(wq).cast("int"))
        .filter(F.col("queue_rank") <= 20)
        .select(
            F.col("query_id").alias("vec_id"),
            "pred_label",
            "runner_up_label",
            "margin",
            "queue_rank",
        )
        .orderBy("queue_rank")
    )


QUERIES["sample_uncertainty_margin"] = sample_uncertainty_margin

ORACLES["sample_uncertainty_margin"] = f"""
WITH c AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), ranked AS (
  SELECT q.vec_id AS query_id, n.label AS nlabel,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY {_cos_expr('q.v', 'n.v')} DESC, n.vec_id)
           AS rank
  FROM c q JOIN c n ON n.vec_id % 7 <> 3
  WHERE q.vec_id % 7 = 3
), cnt AS (
  SELECT query_id, nlabel, COUNT(*) AS v
  FROM ranked WHERE rank <= 5 GROUP BY 1, 2
), top2 AS (
  SELECT query_id, nlabel, v,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY v DESC, nlabel) AS rn
  FROM cnt
), per_q AS (
  SELECT query_id,
         MAX(CASE WHEN rn = 1 THEN nlabel END) AS pred_label,
         MAX(CASE WHEN rn = 2 THEN nlabel END) AS runner_up_label,
         CAST(MAX(CASE WHEN rn = 1 THEN v END)
              - COALESCE(MAX(CASE WHEN rn = 2 THEN v END), 0) AS BIGINT) AS margin
  FROM top2 WHERE rn <= 2 GROUP BY query_id
)
SELECT query_id AS vec_id, pred_label, runner_up_label, margin,
       CAST(queue_rank AS INT) AS queue_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY margin ASC, query_id) AS queue_rank
  FROM per_q
) WHERE queue_rank <= 20
ORDER BY queue_rank
"""


def dedup_lsh_scurve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH (b, r) DESIGN table — the S-curve every dedup team reads
    before fixing its banding (Leskovec/Rajaraman/Ullman, Mining of
    Massive Datasets §3.4.2): for the deployed 16-bands × 4-rows MinHash
    config, the analytic detection probability
    P(s) = 1 − (1 − s⁴)¹⁶ on a 0.05 similarity grid, joined with the
    OBSERVED banded-candidate mass per estimated-Jaccard bin (the
    threshold-0 candidate pass — every pair sharing a band, before any
    verify filter). Reading: the curve's knee sits at (1/16)^(1/4) ≈ 0.5
    — exactly the deployed verify threshold — and the empirical mass
    shows sub-knee pairs are rare in candidates, i.e. banding behaves as
    the theory predicts on THIS corpus. Companion to
    ``dedup_threshold_sweep`` (which prices the verify threshold
    downstream; this table designs the banding upstream).

    Exactness: the analytic curve is a fixed chain of IEEE double ops
    (squarings only, identical association in both engines); bins
    compare exact multiples of 5/16 (est·20 = matches·5/16); counts are
    ints. One banded pairing pass — never all-pairs."""
    from securities_pricing_data_pipeline_spark.llmdata.dedup import (
        minhash_lsh_pairs,
    )

    cand = minhash_lsh_pairs(
        load(spark, sf_dir, "documents"),
        n=3,
        threshold=0.0,
        portable=True,
        signatures=_portable_sigs(spark, sf_dir),
    )
    binned = (
        cand.select(
            F.least(
                F.floor(F.col("est_jaccard") * 20), F.lit(19).cast("long")
            ).cast("int").alias("k")
        )
        .groupBy("k")
        .agg(F.count("*").alias("n"))
    )
    grid = spark.range(1, 20).select(F.col("id").cast("int").alias("k"))
    s = F.col("k").cast("double") / F.lit(20.0)
    t = s * s
    s4 = t * t
    x = F.lit(1.0) - s4
    x2 = x * x
    x4 = x2 * x2
    x8 = x4 * x4
    x16 = x8 * x8
    return (
        grid.join(binned, "k", "left")
        .na.fill({"n": 0})
        .select(
            s.alias("s"),
            (F.lit(1.0) - x16).alias("p_detect"),
            F.col("n").cast("long").alias("n_candidate_pairs"),
        )
        .orderBy("s")
    )


QUERIES["dedup_lsh_scurve"] = dedup_lsh_scurve


def _lsh_scurve_oracle_sql() -> str:
    _s = "(CAST(g.k AS DOUBLE) / 20.0)"
    _t = f"({_s} * {_s})"
    _s4 = f"({_t} * {_t})"
    _x = f"(1.0 - {_s4})"
    _x2 = f"({_x} * {_x})"
    _x4 = f"({_x2} * {_x2})"
    _x8 = f"({_x4} * {_x4})"
    _x16 = f"({_x8} * {_x8})"
    return f"""
WITH cand AS ({_minhash_oracle_sql(threshold=0.0)}),
b AS (
  SELECT LEAST(CAST(FLOOR(est_jaccard * 20) AS INT), 19) AS k,
         COUNT(*) AS n
  FROM cand GROUP BY 1
), g AS (
  SELECT CAST(t.k AS INT) AS k FROM range(1, 20) t(k)
)
SELECT {_s} AS s,
       (1.0 - {_x16}) AS p_detect,
       CAST(COALESCE(b.n, 0) AS BIGINT) AS n_candidate_pairs
FROM g LEFT JOIN b ON b.k = g.k
ORDER BY s
"""


ORACLES["dedup_lsh_scurve"] = _lsh_scurve_oracle_sql()
