"""Property tests for the round-6 semantic operators: SemDeDup-style
clustering-then-pruning and CCNet-style unigram log-perplexity. Value
parity is pinned by the DuckDB oracles (dedup_semantic,
dedup_semantic_keep, text_unigram_logppl); these tests pin the
semantic CONTRACTS on constructed inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from securities_pricing_data_pipeline_spark.llmdata.similarity import (
    semantic_dedup_pairs,
)
from securities_pricing_data_pipeline_spark.llmdata.text import unigram_logppl


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_dedup_finds_in_cluster_duplicates_only(spark):
    # anchors: vec 0 points +x, vec 1 points +y (ids < n_centroids=2)
    # vec 10 ≈ vec 0's direction (same cluster, near-dup)
    # vec 11 ≈ vec 1's direction (other cluster)
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (10, [0.99, 0.01, 0.0]),
        (11, [0.01, 0.99, 0.0]),
    ]
    pairs = semantic_dedup_pairs(
        _emb(spark, rows), threshold=0.9, n_centroids=2
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 10) in got and (1, 11) in got
    # cross-cluster near-orthogonal pairs never surface
    assert all({a, b} in ({0, 10}, {1, 11}) for a, b in got)
    by_pair = {(r["id_a"], r["id_b"]): r for r in pairs}
    assert by_pair[(0, 10)]["cluster_id"] == 0
    assert by_pair[(1, 11)]["cluster_id"] == 1
    assert all(r["cos_sim"] >= 0.9 for r in pairs)


def test_semantic_dedup_cluster_cap_drops_oversized_clusters(spark):
    # every vector identical → one cluster of 5; cap of 4 must drop it
    rows = [(i, [1.0, 0.0]) for i in range(5)]
    out = semantic_dedup_pairs(
        _emb(spark, rows), threshold=0.5, n_centroids=1, max_cluster=4
    )
    assert out.count() == 0
    # raising the cap re-admits the cluster: C(5,2) identical pairs
    out2 = semantic_dedup_pairs(
        _emb(spark, rows), threshold=0.5, n_centroids=1, max_cluster=10
    )
    assert out2.count() == 10


def test_unigram_logppl_rare_tokens_score_higher(spark):
    # 'common' appears 12x corpus-wide, each rare token once: the doc of
    # rare tokens must carry a strictly higher mean NLL
    docs = spark.createDataFrame(
        [(1, "common common common common"), (2, "common common common common"),
         (3, "common common common common"), (4, "zyx wvu tsr qpo")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unigram_logppl(docs).collect()}
    assert out[4]["avg_nll"] > out[1]["avg_nll"]
    assert out[1]["avg_nll"] == out[2]["avg_nll"] == out[3]["avg_nll"]
    assert out[4]["n_tokens"] == 4


def test_unigram_logppl_uniform_corpus_is_flat(spark):
    # all tokens equally frequent → every doc scores ln(V) exactly
    docs = spark.createDataFrame(
        [(1, "aa bb"), (2, "cc dd")], "doc_id long, text string"
    )
    vals = [r["avg_nll"] for r in unigram_logppl(docs).collect()]
    import math

    assert all(abs(v - math.log(4.0)) < 1e-9 for v in vals)
