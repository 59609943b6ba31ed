"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All built from JVM-side string/array functions —
no Python in the per-row path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is")

# tiny per-language stopword profiles for the n-gram/stopword language
# heuristic (public-knowledge function-word lists)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del", "se", "las"),
    "de": ("der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "im"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "du", "une", "est"),
}


def _tokens(text_col: str = "text"):
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count per document."""
    return df.select(
        F.col(id_col), F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("int").alias("n_tokens")
    )


# GPT-2-style pre-tokenizer split, restricted to constructs shared by Java
# regex (Spark) and RE2 (DuckDB): contraction suffixes, space-prefixed
# letter/digit/symbol runs, whitespace runs. (The original's negative
# lookahead is RE2-incompatible and only affects trailing-space grouping.)
BPE_SPLIT_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def token_count_bpe(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BPE-ish token count: matches of the GPT-2 pre-tokenizer split
    pattern. One JVM-side regexp_count per row — the cheap proxy for
    'how many LLM tokens is this corpus' at 100 TB."""
    return df.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(BPE_SPLIT_RE)).cast("int").alias("n_bpe_tokens"),
    )


def unigram_logppl(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """CCNet-style perplexity-proxy quality score (Wenzek et al. 2020,
    arXiv:1911.00359): train a unigram LM on the corpus itself — one
    token-count aggregate — and score every document by its mean token
    negative log-likelihood. High avg_nll = rare-token-heavy text
    (gibberish, boilerplate markup, OCR noise); the standard cheap
    stand-in for a KenLM perplexity filter in web-corpus cleaning.

    Scale shape: the vocab aggregate is one shuffle of (token) rows
    whose Zipfian hot keys are exactly what map-side partial counts
    absorb; the score join keys on token and AQE broadcasts the vocab
    while it fits (cap it to top-K + OOV smoothing at web scale). Parity
    discipline: each token's −ln p is snapped to the 1e-12 decimal grid
    and summed exactly (order-independent), then the mean is snapped to
    1e-9 — ln is libm in both engines, the snap absorbs last-ULP spread
    (same contract as the K-M survival product)."""
    from securities_pricing_data_pipeline_spark.queries.helpers import dec

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    tot = toks.agg(F.count("*").alias("n_total"))
    nll = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            dec(
                -F.log(F.col("cnt").cast("double") / F.col("n_total").cast("double")),
                12,
            ).alias("nll"),
        )
    )
    return nll.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_tokens"),
        (F.sum("nll").cast("double") / F.count("*"))
        .cast("decimal(20,9)")
        .cast("double")
        .alias("avg_nll"),
    )


def bigram_logppl(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Bigram-LM perplexity proxy with add-one (Laplace) smoothing — the
    next rung above ``unigram_logppl`` on the KenLM-stand-in ladder
    (n-gram LM scoring is the classic web-corpus quality filter; Laplace
    keeps the estimator total and deterministic, no discounting
    hyperparameters). The LM is trained on the corpus itself; every
    document with >= 2 tokens is scored by its mean bigram negative
    log-likelihood: nll(w1 w2) = −ln((c(w1,w2)+1) / (c(w1)+V)).

    Scale shape: bigrams are built IN-ROW (``transform`` over the token
    array — no positional explode + self-join), so the only shuffles are
    the (w1,w2) and unigram count aggregates, both Zipf-hot-key shapes
    that map-side partial counts absorb; the score joins key on bigram /
    context token and AQE broadcasts the count tables while they fit
    (top-K vocab + OOV bucket at web scale). Parity: counts are exact
    ints, each −ln p is snapped to the 1e-12 decimal grid and summed
    order-independently, the mean snaps to 1e-9 (the unigram_logppl
    contract)."""
    from securities_pricing_data_pipeline_spark.queries.helpers import dec

    t = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    arr = df.select(F.col(id_col).alias("doc_id"), t.alias("t"))
    toks = arr.select(F.explode("t").alias("tok"))
    uni = toks.groupBy("tok").agg(F.count("*").alias("cu"))
    # |V| = the unigram table's row count — NOT a second count_distinct
    # pass over the exploded tokens (that re-ran the whole tokenize +
    # explode + a distinct shuffle; deriving it from `uni` makes the
    # vocab aggregate the only unigram-side scan)
    vv = uni.agg(F.count("*").alias("v"))
    # the bigram occurrence frame feeds BOTH the count aggregate and the
    # scoring join below — pin it (narrow (doc_id, w1, w2) rows) so the
    # parquet read + tokenize + in-row transform runs once, not twice
    bg = (
        arr.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr("transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i + 1] AS w2))")
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
        .localCheckpoint(eager=True)
    )
    big = bg.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    nll = (
        bg.join(big, ["w1", "w2"])
        .join(uni, bg.w1 == uni.tok)
        .crossJoin(F.broadcast(vv))
        .select(
            "doc_id",
            dec(
                -F.log(
                    (F.col("cb") + 1).cast("double")
                    / (F.col("cu") + F.col("v")).cast("double")
                ),
                12,
            ).alias("nll"),
        )
    )
    return nll.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_bigrams"),
        (F.sum("nll").cast("double") / F.count("*"))
        .cast("decimal(20,9)")
        .cast("double")
        .alias("avg_nll"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword quality signals per document."""
    toks = _tokens(text_col)
    n_punct = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[.,!?;:]", "")
    )
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN)))
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("int").alias("n_chars"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("int").alias("n_tokens"),
        n_punct.cast("int").alias("n_punct"),
        n_stop.cast("int").alias("n_stopwords"),
    )


def fingerprint_md5(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic content fingerprint: md5 of the normalized text.
    (md5 chosen over xxhash64 for cross-engine verifiability; at 100 TB the
    16-byte digest is also the dedup shuffle key — see llmdata.dedup.)"""
    return df.select(
        F.col(id_col), F.md5(F.lower(F.trim(F.col(text_col)))).alias("fingerprint")
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    hash every character k-gram, slide a w-wide window over the hash
    sequence, keep each window's minimum — the classic rolling-hash
    fingerprint for local similarity detection.

    Output: one (doc_id, fp) row per distinct selected hash. Docs shorter
    than k characters produce no rows. Entirely array expressions per doc
    (no shuffle before the final distinct); hashes use ``portable_hash60``
    so DuckDB replays the selection exactly. Winnowing guarantees any
    shared substring ≥ k+w−1 chars yields a shared fingerprint.
    """
    from securities_pricing_data_pipeline_spark.llmdata.dedup import portable_hash60

    txt = F.lower(F.trim(F.col(text_col)))
    n_grams = F.length(txt) - k + 1
    hashes = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: portable_hash60(F.substr(txt, i, F.lit(k))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    n_wins = F.size(hashes) - w + 1
    # one window min per position; a doc with fewer than w grams keeps a
    # single window over all of them (standard winnowing edge rule)
    wins = F.when(
        n_wins >= 1,
        F.transform(
            F.sequence(F.lit(1), n_wins),
            lambda j: F.array_min(F.slice(hashes, j, w)),
        ),
    ).otherwise(F.when(F.size(hashes) >= 1, F.array(F.array_min(hashes))).otherwise(
        F.array().cast("array<bigint>")
    ))
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(wins)).alias("fp"))
        .distinct()
    )


def lang_pred(text_col: str = "text") -> Column:
    """The :func:`lang_id` prediction as a bare COLUMN expression, so a
    single-pass pipeline (e.g. the streaming quality gate) can evaluate
    it alongside other per-row gates without a second scan or a join
    (r14, guide §2.4)."""
    toks = F.array_distinct(_tokens(text_col))
    cjk_chars = F.length(F.regexp_replace(F.col(text_col), r"[^一-鿿]", ""))
    scores = F.array(
        *[
            F.struct(
                F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in LANG_PROFILES.items()
        ]
    )
    best = F.array_max(scores)  # struct compare: hits first, then lang
    return F.when(cjk_chars * 2 > F.length(F.col(text_col)), F.lit("zh")).otherwise(
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID.

    CJK detection by Unicode block ratio; otherwise argmax of per-language
    stopword hit-rate over the profiles above. Entirely built-ins: one
    array intersection per language.
    """
    return df.select(F.col(id_col), lang_pred(text_col).alias("pred_lang"))


def normalize_text(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonicalize text ahead of exact dedup: lowercase, strip
    punctuation to spaces, collapse whitespace runs, trim. Pure JVM
    regexp expressions (whole-stage codegen) — the normalization that
    makes hash-groupBy dedup catch trivially-reformatted copies."""
    stripped = F.regexp_replace(F.lower(F.col(text_col)), r"[^\p{L}\p{N}\s]", " ")
    collapsed = F.trim(F.regexp_replace(stripped, r"\s+", " "))
    return df.select(
        F.col(id_col),
        collapsed.alias("norm_text"),
        F.length(collapsed).alias("n_chars_norm"),
        F.md5(collapsed).alias("norm_digest"),
    )


def pack_greedy(
    df: DataFrame,
    budget_tokens: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Greedy sequence packing: assign each document to a context-window
    bin by cumulative token count within its group (deterministic doc_id
    order). A doc starts in the bin where its running prefix ends, so bins
    fill to ~``budget_tokens`` (the standard streaming-packing contract;
    no bin-optimal shuffle, which would be non-deterministic and
    all-to-all). One window shuffle on the group key; at 100 TB the group
    (source/shard) key keeps partitions bounded."""
    from pyspark.sql import Window

    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    w = Window.partitionBy(group_col).orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    with_cum = df.select(
        F.col(id_col),
        F.col(group_col),
        toks.alias("n_tokens"),
        F.sum(toks).over(w).alias("cum_tokens"),
    )
    return with_cum.select(
        id_col,
        group_col,
        "n_tokens",
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(budget_tokens))
        .cast("long")
        .alias("bin_id"),
        "cum_tokens",
    )


# compact polarity lexicon (sentiment-lexicon aggregation pattern — the
# Spark sentiment pipelines of EDBT'16 scale this to full dictionaries;
# the operator shape is identical: tokenize → broadcast dictionary join →
# per-document aggregate)
SENTIMENT_LEXICON: list[tuple[str, int]] = [
    ("good", 1), ("great", 1), ("excellent", 1), ("positive", 1), ("gain", 1),
    ("up", 1), ("strong", 1), ("best", 1), ("win", 1), ("success", 1),
    ("bad", -1), ("poor", -1), ("terrible", -1), ("negative", -1), ("loss", -1),
    ("down", -1), ("weak", -1), ("worst", -1), ("fail", -1), ("risk", -1),
]


def sentiment_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Lexicon sentiment per document: lowercase/strip → explode tokens →
    broadcast-join the polarity dictionary → one aggregate keyed on doc.
    The dictionary join is the canonical tiny-dim broadcast (a full
    lexicon is a few MB — still broadcastable at any corpus scale); the
    explode never materializes cross-document state, so this pipelines
    inside one stage until the per-doc aggregate shuffle."""
    spark = df.sparkSession
    lex = spark.createDataFrame(SENTIMENT_LEXICON, "word string, polarity int")
    stripped = F.regexp_replace(F.lower(F.col(text_col)), r"[^\p{L}\p{N}\s]", " ")
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(stripped), r"\s+")).alias("word"),
    )
    scored = toks.join(F.broadcast(lex), "word", "left")
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("polarity") == 1, 1).otherwise(0)).cast("long").alias("n_pos"),
        F.sum(F.when(F.col("polarity") == -1, 1).otherwise(0)).cast("long").alias("n_neg"),
        F.sum(F.coalesce("polarity", F.lit(0))).cast("long").alias("net_sentiment"),
    )


def fuzzy_name_match(
    df: DataFrame,
    name_col: str,
    max_distance: int = 2,
) -> DataFrame:
    """Edit-distance similarity join over the DISTINCT values of a string
    column, blocked on the trailing token so candidate generation never
    goes quadratic in the table (the compressed-index string-join insight:
    match on the distinct-key dictionary — tiny — then map hits back to
    rows). Verification is JVM ``levenshtein``; the block key join is a
    plain hash equi-join."""
    names = df.select(F.col(name_col).alias("name")).distinct()
    blocked = names.withColumn("blk", F.regexp_extract("name", r"(\S+)$", 1))
    a = blocked.select(F.col("name").alias("name_a"), "blk")
    b = blocked.select(F.col("name").alias("name_b"), "blk")
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= max_distance)
        .select("name_a", "name_b", "distance")
    )


#: cross-dialect PII patterns — the common Java-regex ∩ RE2 subset so the
#: DuckDB oracle replays detection and redaction bit-for-bit
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Detect and redact the two highest-volume PII shapes (emails, NANP
    phone numbers) per document: match counts plus the md5 of the redacted
    text (the digest, not the text, is what a scrub-audit table carries —
    16 bytes per doc at 100 TB). All JVM regexp expressions, row-local, no
    shuffle; real corpora extend the pattern list, same plan shape."""
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(text_col), F.lit(EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(PHONE_RE),
        F.lit("<PHONE>"),
    )
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(EMAIL_RE), F.lit(0))).cast("int").alias("n_emails"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(PHONE_RE), F.lit(0))).cast("int").alias("n_phones"),
        F.md5(redacted).alias("redacted_digest"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1):
    duplicate-unigram fraction and the token share of the single most
    frequent word bigram — the standard filters for boilerplate/spam docs
    in a pretraining corpus.

    Entirely JVM array expressions, row-local: bigrams are the token array
    zipped against its own 1-shift; the max bigram frequency is the longest
    equal-run in the SORTED bigram array, found with one ``aggregate`` fold
    (O(n log n) per doc, no explode, no shuffle). At 100 TB this runs as a
    narrow map stage over documents.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(toks)
    dup_frac = F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n
    bigrams = F.zip_with(
        toks, F.slice(toks, 2, F.greatest(n - 1, F.lit(0))), lambda a, b: F.concat_ws(" ", a, b)
    )
    bigrams = F.slice(bigrams, 1, F.greatest(n - 1, F.lit(0)))
    srt = F.array_sort(bigrams)
    # longest run of equal adjacent elements in the sorted array == max freq
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )
    top_count = F.aggregate(
        srt,
        zero,
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best, F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    return df.select(
        F.col(id_col),
        n.cast("int").alias("n_tokens"),
        dup_frac.alias("dup_unigram_frac"),
        top_count.cast("int").alias("top_bigram_count"),
        (F.lit(2.0) * top_count / n).alias("top_bigram_frac"),
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/PaLM eval-hygiene op): for each
    training document, count word n-gram shingles that also appear in the
    benchmark corpus, and the contamination fraction. Docs with overlap
    get dropped or flagged before pretraining.

    Shape: the benchmark's DISTINCT shingle set is dim-sized (eval suites
    are tiny next to a corpus), so the overlap count is one explode + one
    broadcast semi-style join + one re-aggregate keyed on doc id — the
    training side shuffles only (id, shingle) pairs and only for shingles
    that could match (the broadcast join filters map-side). At 100 TB the
    explode dominates; no pair enumeration ever happens.
    """
    from securities_pricing_data_pipeline_spark.llmdata.dedup import shingles

    doc_sh = shingles(df, text_col=text_col, n=n).select(
        F.col(id_col), F.size("shingles").alias("n_shingles"), "shingles"
    )
    bench_sh = (
        shingles(benchmark, text_col=text_col, n=n)
        .select(F.explode("shingles").alias("sh"))
        .distinct()
    )
    exploded = doc_sh.select(F.col(id_col), "n_shingles", F.explode("shingles").alias("sh"))
    hits = (
        exploded.join(F.broadcast(bench_sh), "sh")
        .groupBy(id_col, "n_shingles")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        doc_sh.select(id_col, "n_shingles")
        .join(hits.select(id_col, "n_contaminated"), id_col, "left")
        .select(
            id_col,
            F.col("n_shingles").cast("int").alias("n_shingles"),
            F.coalesce("n_contaminated", F.lit(0)).cast("int").alias("n_contaminated"),
            (
                F.coalesce("n_contaminated", F.lit(0)).cast("double")
                / F.col("n_shingles")
            ).alias("contaminated_frac"),
        )
    )


def vocab_topk(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 100) -> DataFrame:
    """Corpus vocabulary head: top-k tokens by total occurrences, with
    document frequency. The canonical explode→aggregate: partial map-side
    combine collapses the token stream before the single shuffle on the
    token key; top-k compiles to TakeOrderedAndProject. DF uses
    count(DISTINCT doc) inside the same aggregate — at 100 TB swap for the
    HLL sketch in ``llmdata.sketch`` if exactness isn't required."""
    toks = df.select(F.col(id_col), F.explode(_tokens(text_col)).alias("token"))
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(k)
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Top-k distinctive terms per document by TF-IDF, with a RATIONAL idf
    (idf_scaled = 10^4·N DIV df) instead of log — bit-exact in integer
    arithmetic on any engine, same ranking monotonicity in df as log-idf.
    Bounds: idf_scaled ≤ 10^4·N ≈ 10^13 at N=10^9 docs; score = tf·idf
    stays under 2^63 for tf ≤ 10^5. Two shuffles: (doc,term) TF aggregate,
    then the per-doc rank window on doc — the term-DF aggregate reuses the
    TF result, and N is a 1-row broadcast."""
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.explode(_tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("n_corpus"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score_scaled",
            F.expr("tf * (CAST(10000 AS BIGINT) * n_corpus DIV df)"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score_scaled"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            id_col,
            "term",
            F.col("tf").cast("int").alias("tf"),
            F.col("df").cast("int").alias("df"),
            "score_scaled",
            F.col("rn").cast("int").alias("rnk"),
        )
    )


def filter_funnel(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4-style quality-filter funnel in ONE pass: per-rule reject counts
    plus the survivor count, all conditional aggregates over integer
    signals (no ratios — thresholds are cross-multiplied so every
    comparison is int-exact cross-engine). Rules (public C4/Gopher
    heuristics): <5 tokens; mean word length >12 chars; alphabetic
    characters <50%; zero English stopwords."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    n_chars_nospace = F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
    n_chars = F.length(F.col(text_col))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN)))
    too_short = n_tokens < 5
    long_words = n_chars_nospace > 12 * n_tokens
    low_alpha = 2 * n_alpha < n_chars
    no_stop = n_stop == 0
    kept = ~too_short & ~long_words & ~low_alpha & ~no_stop
    cnt = lambda c, name: F.sum(c.cast("long")).alias(name)  # noqa: E731
    return df.agg(
        F.count("*").alias("n_total"),
        cnt(too_short, "n_too_short"),
        cnt(long_words, "n_long_words"),
        cnt(low_alpha, "n_low_alpha"),
        cnt(no_stop, "n_no_stopword"),
        cnt(kept, "n_kept"),
    )


def chunk_documents(
    docs: DataFrame,
    width: int = 40,
    stride: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking (the RAG / context-window prep
    step): split each document into whitespace tokens and emit windows of
    ``width`` tokens every ``stride`` — the final window may be short, and
    a document shorter than one window yields exactly one chunk.

    Implemented as a Spark 4 Python UDTF applied via LATERAL join — this
    is the engine's demonstration of the table-function surface (one input
    row → many output rows with their own schema). The UDTF is
    Arrow-batched; it is still a Python-path operator, so the built-in
    alternative (``sequence`` + ``transform`` + ``posexplode`` — all
    JVM-side) is what the 100 TB hot path should use. The UDTF earns its
    place where chunking logic outgrows expressions (tokenizer libraries,
    sentence boundaries, layout-aware splits) — exactly the cases the
    lateral-join plumbing here is shaped for. Chunking itself is
    embarrassingly parallel: no shuffle at all, rows expand in place.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_text string, n_tokens int")
    class DocChunker:
        def eval(self, text: str):
            toks = (text or "").split()
            n = len(toks)
            extra = max(0, -(-(n - width) // stride)) if n > width else 0
            for i in range(extra + 1):
                seg = toks[i * stride : min(i * stride + width, n)]
                yield i, " ".join(seg), len(seg)

    spark = docs.sparkSession
    spark.udtf.register("doc_chunks", DocChunker)
    docs.select(id_col, text_col).createOrReplaceTempView("_chunk_input")
    return spark.sql(
        f"""
        SELECT i.{id_col}, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM _chunk_input i, LATERAL doc_chunks(i.{text_col}) c
        """
    )


def segment_dedup_stats(
    df: DataFrame,
    width: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document segment-level duplication stats — the CCNet/C4
    boilerplate-removal signal (CCNet dedups at the *paragraph/line*
    level before any doc-level pass; with no newline structure in the
    corpus, a segment is a fixed non-overlapping ``width``-token window,
    tail included).

    Per document: total segments, segments whose text also appears in at
    least one OTHER document, and the duplicated fraction — the score a
    curator thresholds to drop template-heavy documents.

    Dataflow (all JVM expressions): tokenize → ``sequence``/``transform``
    → one ``posexplode`` to (doc, segment) rows → md5 the segment so the
    document-frequency shuffle carries 32-byte digests, never segment
    text → groupBy digest for distinct-doc counts → hash-join back (both
    sides already partitioned by digest) → per-doc aggregate. Two
    digest-keyed shuffles total, independent of document size.
    """
    toks = _tokens(text_col)
    n = F.size(toks)
    nseg = F.ceil(n / F.lit(width)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), F.greatest(nseg - 1, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i * width + 1, width), " "),
    )
    ex = df.select(F.col(id_col).alias("id"), F.explode(segs).alias("seg")).select(
        "id", F.md5(F.col("seg")).alias("h")
    )
    freq = ex.groupBy("h").agg(F.count_distinct("id").alias("df"))
    per_doc = (
        ex.join(freq, "h")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum((F.col("df") > 1).cast("long")).alias("n_dup_segments"),
        )
    )
    return per_doc.select(
        F.col("id").alias(id_col),
        F.col("n_segments").cast("int").alias("n_segments"),
        F.col("n_dup_segments").cast("long").alias("n_dup_segments"),
        (F.col("n_dup_segments").cast("double") / F.col("n_segments").cast("double")).alias(
            "dup_segment_frac"
        ),
    )


def cdc_chunk_stats(
    df: DataFrame,
    gram: int = 8,
    divisor: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined-chunking dedup stats (the LBFS/rsync/FastCDC
    primitive, Muthitacharoen et al. 2001): a position starts a new
    chunk iff the ``gram``-char hash AT that position ≡ 0 mod
    ``divisor`` (average chunk ≈ ``divisor`` chars). Because boundaries
    are decided by local CONTENT, an insertion or deletion only
    re-chunks its neighborhood — the property fixed-width windows
    (:func:`segment_dedup_stats`) fundamentally lack, and the reason
    CDC is the storage-dedup / incremental-transfer standard. Output
    matches the segment twin: per doc, total chunks, chunks whose text
    appears in ≥ 1 OTHER doc, and the duplicated fraction.

    Dataflow: boundary predicate + chunk slicing are in-row HOFs (one
    md5 per char position — the honest expression-only cost; production
    swaps in a gear/rolling table inside the same per-row shape), then
    the segment-dedup plan verbatim: md5 digests → document-frequency
    shuffle → digest-keyed join back → per-doc aggregate. Two
    digest-keyed shuffles, independent of document size; boundary
    hashing is embarrassingly parallel map work."""
    h60 = (
        "cast(conv(substring(md5(cast(substring(t, p, {g}) as binary)), 1, 15),"
        " 16, 10) as bigint)"
    ).format(g=gram)
    bnd = (
        "case when length(t) >= {g1} then"
        " filter(sequence(2, length(t) - {gm1}), p -> {h} % {d} = 0)"
        " else array() end"
    ).format(g1=gram + 1, gm1=gram - 1, h=h60, d=divisor)
    chunks = (
        "transform(sequence(1, size(starts)), i ->"
        " case when i < size(starts)"
        " then substring(t, element_at(starts, i),"
        "      element_at(starts, i + 1) - element_at(starts, i))"
        " else substring(t, element_at(starts, i)) end)"
    )
    ex = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
        .withColumn("starts", F.expr(f"concat(array(1), {bnd})"))
        .select("id", F.explode(F.expr(chunks)).alias("chunk"))
        .select("id", F.md5(F.col("chunk")).alias("h"))
    )
    freq = ex.groupBy("h").agg(F.count_distinct("id").alias("df"))
    per_doc = (
        ex.join(freq, "h")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("df") > 1).cast("long")).alias("n_dup_chunks"),
        )
    )
    return per_doc.select(
        F.col("id").alias(id_col),
        F.col("n_chunks").cast("int").alias("n_chunks"),
        F.col("n_dup_chunks").cast("long").alias("n_dup_chunks"),
        (
            F.col("n_dup_chunks").cast("double") / F.col("n_chunks").cast("double")
        ).alias("dup_chunk_frac"),
    )


def term_tf_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The (doc, term, tf) postings aggregate every sparse-retrieval
    operator reads (BM25 lengths/totals/TF/DF, PRF feedback pooling) —
    tokenize once, count per (doc, term), materialize (localCheckpoint:
    multiple consumers per query re-derive the tokenize+explode branch
    otherwise). At 100 TB this is the written postings silver table;
    in-session the callers cache one instance per corpus (see
    ``queries.llmq._bm25_postings``) instead of re-pinning per call."""
    return (
        df.select(F.col(id_col), F.explode(_tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )


def bm25_topdocs(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    term_tf: DataFrame | None = None,
) -> DataFrame:
    """Top-k documents by BM25 (k1=1.2, b=0.75) for a fixed query term
    set — the canonical sparse-retrieval scorer next to ``tfidf_top_terms``
    (Robertson/Spärck Jones; the ATIRE/Lucene formulation with the same
    rational idf the TF-IDF query uses).

    Exactness: BM25's floats are replaced by scaled rationals so both
    engines rank and emit bit-identical values. With N docs, T total
    corpus tokens, per-doc length dl:

      idf_scaled    = 10^4·N DIV df                      (as in TF-IDF)
      tfnorm_scaled = 220000·tf·T DIV (10·tf·T + 3·T + 9·dl·N)
                      — exactly 10^4 · tf·(k1+1) / (tf + k1(1−b+b·dl/avgdl))
                        with avgdl = T/N cleared of denominators
      score_scaled  = Σ_query-terms idf_scaled · tfnorm_scaled

    All products run in DECIMAL(38,0) (10·tf·T passes 2^63 on a 100 TB
    corpus: T ~ 10^13) and the integer DIVs return exact longs; the sum
    is an exact integer — no float ops at all. tfnorm_scaled ≤ 22000 and
    idf_scaled ≤ 10^4·N keep the per-term product < 2^63 up to N ~ 10^9.

    Plan shape: the corpus is tokenized ONCE into a (doc, term, tf)
    aggregate that is materialized (localCheckpoint) because four
    consumers read it (document lengths, corpus totals, query-term TF,
    term DF) — without the pin Spark re-derives the branch and pays the
    tokenize+explode scan per consumer (the .explain showed 4 Generate
    nodes). Everything downstream is doc- or term-cardinality rows; N/T
    is a 1-row broadcast and the final rank is a single top-k sort.
    Pass ``term_tf`` (an already-materialized (doc, term, tf) postings
    frame, e.g. a per-session silver) to skip the tokenize+pin — the
    contract a written postings table would satisfy at corpus scale."""
    from pyspark.sql import Window

    if term_tf is None:
        term_tf = term_tf_postings(df, text_col=text_col, id_col=id_col)
    dl = term_tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    totals = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("t_tokens")
    )
    tf = term_tf.filter(F.col("term").isin(*query_terms))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    dec = "CAST({} AS DECIMAL(38,0))"
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .join(F.broadcast(totals))
        .withColumn(
            "idf_scaled", F.expr("10000 * n_docs div df").cast("long")
        )
        .withColumn(
            "tfnorm_scaled",
            F.expr(
                f"{dec.format('220000')} * tf * t_tokens div "
                f"({dec.format('10')} * tf * t_tokens + {dec.format('3')} * t_tokens "
                f"+ {dec.format('9')} * dl * n_docs)"
            ).cast("long"),
        )
        .withColumn("term_score", F.col("idf_scaled") * F.col("tfnorm_scaled"))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.first("dl").alias("dl"), F.sum("term_score").alias("score_scaled")
    )
    # distributed top-k (TakeOrderedAndProject) FIRST, then rank the k
    # survivors — a row_number over an unpartitioned window here would
    # drag the corpus-cardinality per_doc frame through one task
    top = per_doc.orderBy(F.desc("score_scaled"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.desc("score_scaled"), F.col(id_col))
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .select(id_col, "dl", "score_scaled", F.col("rnk").cast("int").alias("rnk"))
    )


def prf_expansion_terms(
    df: DataFrame,
    query_terms: list[str],
    k_docs: int = 10,
    k_terms: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    term_tf: DataFrame | None = None,
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio 1971 / RM1
    term selection): run the seed query through BM25, pool the terms of
    its top-``k_docs`` feedback documents, and rank candidate expansion
    terms by an integer idf·feedback-tf weight — the classic second
    retrieval pass that widens a sparse query with what its best hits
    talk about. Seed terms are excluded from the candidates.

    Exactness: feedback tf and corpus df are exact counts;
    idf_scaled = 10^4·N DIV df (the TF-IDF/BM25 convention) and
    expansion_score = idf_scaled·fb_tf are exact int64 (< 2^63 up to
    N ~ 10^14 with 10-doc feedback pools) — no float ops.

    Scale shape: the feedback pool is k_docs rows, so pooling is a
    broadcast semi-probe of the (doc, term, tf) aggregate; corpus df is
    computed ONLY for the candidate terms (vocab of k_docs documents)
    via a broadcast semi-join — never a full-vocab aggregate; N is a
    1-row broadcast; the final rank is a top-k over candidate-term
    cardinality rows. Pass ``term_tf`` to share one materialized
    postings frame with the BM25 pass instead of re-pinning the corpus
    aggregate here (both stages of the PRF loop read the same silver)."""
    if term_tf is None:
        term_tf = term_tf_postings(df, text_col=text_col, id_col=id_col)
    fb = bm25_topdocs(
        df, query_terms, k=k_docs, text_col=text_col, id_col=id_col, term_tf=term_tf
    )
    fb_tf = (
        term_tf.join(F.broadcast(fb.select(id_col)), id_col)
        .filter(~F.col("term").isin(*query_terms))
        .groupBy("term")
        .agg(F.sum("tf").alias("fb_tf"), F.count("*").alias("n_fb_docs"))
    )
    dfreq = (
        term_tf.join(F.broadcast(fb_tf.select("term")), "term", "left_semi")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    nd = term_tf.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    scored = (
        fb_tf.join(dfreq, "term")
        .crossJoin(F.broadcast(nd))
        .withColumn("idf_scaled", F.expr("10000 * n_docs div df").cast("long"))
        .withColumn("expansion_score", F.col("idf_scaled") * F.col("fb_tf"))
        .select("term", "fb_tf", "n_fb_docs", "df", "idf_scaled", "expansion_score")
    )
    from pyspark.sql import Window

    top = scored.orderBy(F.desc("expansion_score"), "term").limit(k_terms)
    w = Window.orderBy(F.desc("expansion_score"), "term")
    return top.withColumn("rnk", F.row_number().over(w).cast("int"))


def bpe_pair_counts(
    df: DataFrame, k: int = 20, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-k most frequent ADJACENT token pairs across the corpus — the
    candidate-scoring step of one BPE merge iteration (Sennrich 2016):
    the pair a tokenizer trainer would merge first is the argmax of
    exactly this count. Pure-integer counts, (count DESC, a, b) total
    order, so the ranking is bit-stable cross-engine.

    Plan shape: pairs are built INSIDE the row with one ``transform``
    over the token array (no self-join, no window over an exploded token
    stream — the position join a naive plan pays shuffles T rows twice);
    the only shuffle is the (a, b) count aggregate, which partially
    aggregates map-side. At 100 TB the pair-key space is vocabulary²
    -bounded, far below the token count, so the reduce side stays small."""
    d = df.select(F.col(id_col), _tokens(text_col).alias("toks")).filter(
        F.size("toks") >= 2
    )
    pairs = d.select(
        F.explode(
            F.expr(
                "transform(slice(toks, 1, size(toks) - 1),"
                " (t, i) -> struct(t AS a, toks[i + 1] AS b))"
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "a", "b")
        .limit(k)
    )


#: Fixed BPE merge table applied by ``bpe_encode_expr`` in PRIORITY ORDER
#: (earlier merges run to completion before later ones see the tokens —
#: the standard greedy-pass application of a trained merge list, Sennrich
#: 2016 §3). Kept deliberately small: each merge unrolls to one
#: deterministic fold pass, so the list length is the expression depth.
BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("th", "e"),
    ("e", "r"),
    ("a", "t"),
    ("o", "r"),
    ("a", "n"),
    ("s", "t"),
    ("r", "o"),
]


def _bpe_fold(toks_expr: str, x: str, y: str, dialect: str) -> str:
    """One greedy left-to-right merge pass (x, y) → xy over a token-array
    expression, as a string fold: tokens accumulate space-joined; when
    the accumulator's LAST token is ``x`` and the next element is ``y``,
    the tail is rewritten to the merged symbol in place. A left fold IS
    the single-pass greedy scan — after a merge the new symbol sits at
    the accumulator tail, so overlapping occurrences (e.g. (a, a) on
    "aaa") pair from the left exactly like a BPE tokenizer's scan.

    Spark folds from '' with an explicit empty-accumulator branch;
    DuckDB's list_reduce seeds from the first element — identical
    results because the merge branch is guarded on a non-empty
    accumulator (a word is never empty)."""
    m = x + y
    if dialect == "spark":
        return (
            f"aggregate({toks_expr}, CAST('' AS STRING), (acc, t) -> "
            f"CASE WHEN acc != '' AND substring_index(acc, ' ', -1) = '{x}' "
            f"AND t = '{y}' "
            f"THEN concat(substring(acc, 1, length(acc) - {len(x)}), '{m}') "
            f"WHEN acc = '' THEN t "
            f"ELSE concat(acc, ' ', t) END)"
        )
    return (
        f"list_reduce({toks_expr}, (acc, t) -> "
        f"CASE WHEN regexp_extract(acc, '[^ ]+$') = '{x}' AND t = '{y}' "
        f"THEN substr(acc, 1, length(acc) - {len(x)}) || '{m}' "
        f"ELSE acc || ' ' || t END)"
    )


def bpe_encode_expr(word_expr: str, dialect: str = "spark") -> str:
    """SQL expression (Spark or DuckDB dialect) encoding one word with
    the fixed ``BPE_MERGES`` table: split to characters, then apply each
    merge as a full greedy pass (re-splitting the space-joined
    accumulator between passes). Returns the space-joined BPE token
    string. Both dialects are generated from the same merge table by the
    same code path, so the oracle replays EXACTLY the engine's merges —
    the parity is structural, not coincidental.

    Scale: pure per-row expression work (no UDF, no shuffle); cost is
    O(|word| · |BPE_MERGES|) per word, constant-bounded by the fixed
    merge table."""
    for x, y in BPE_MERGES:
        # merge symbols are interpolated into SQL string literals in
        # BOTH dialects unescaped — a quote or space would silently
        # generate broken/diverging SQL, so reject it at build time
        if not (re.fullmatch(r"[a-z]+", x) and re.fullmatch(r"[a-z]+", y)):
            raise ValueError(f"BPE merge symbols must match [a-z]+: {(x, y)!r}")
    if dialect == "spark":
        toks = f"filter(split({word_expr}, ''), x -> x != '')"
    else:
        toks = f"regexp_split_to_array({word_expr}, '')"
    s = _bpe_fold(toks, *BPE_MERGES[0], dialect=dialect)
    for x, y in BPE_MERGES[1:]:
        resplit = f"split({s}, ' ')" if dialect == "spark" else f"string_split({s}, ' ')"
        s = _bpe_fold(resplit, x, y, dialect=dialect)
    return s


def bpe_encode(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Apply the fixed ``BPE_MERGES`` table to every whitespace token of
    every document — the APPLY side of BPE (``bpe_pair_counts`` is the
    trainer's scoring side): per document, the exact post-merge token
    count, input char count, and the first word's encoding as a visible
    sample. This is the exact-token-count twin of the regex-heuristic
    ``token_count_bpe`` estimator.

    Plan shape: one projection — tokenize, ``transform`` each word
    through the unrolled merge passes, fold the counts in-row. No
    Python, no shuffle, no explode; 100 TB of documents is a pure
    map-side scan."""
    enc_w = bpe_encode_expr("w", dialect="spark")
    return (
        df.select(F.col(id_col), _tokens(text_col).alias("words"))
        .select(
            F.col(id_col),
            F.size("words").cast("long").alias("n_words"),
            F.expr(
                "aggregate(words, 0L, (a, w) -> a + length(w))"
            ).alias("n_input_chars"),
            F.expr(
                f"aggregate(transform(words, w -> {enc_w}), 0L,"
                " (a, e) -> a + size(split(e, ' ')))"
            ).alias("n_bpe_tokens"),
            F.expr(f"transform(slice(words, 1, 1), w -> {enc_w})[0]").alias(
                "first_word_encoding"
            ),
        )
    )


def _merge_pass_col(toks, x: str, y: str):
    """One greedy left-to-right merge pass (x, y) → xy over a token-array
    COLUMN, built with the pyspark Column API (F.lit for the learned
    symbols — injection-proof regardless of what tokens the corpus
    contains, unlike the string-template ``_bpe_fold`` whose fixed table
    is regex-guarded instead). Same left-fold-is-the-greedy-scan
    argument as ``_bpe_fold``; returns the space-joined string."""
    m = x + y
    return F.aggregate(
        toks,
        F.lit(""),
        lambda acc, t: F.when(
            (acc != F.lit(""))
            & (F.substring_index(acc, " ", -1) == F.lit(x))
            & (t == F.lit(y)),
            F.concat(
                F.substring(acc, F.lit(1), F.length(acc) - F.lit(len(x))), F.lit(m)
            ),
        )
        .when(acc == F.lit(""), t)
        .otherwise(F.concat(acc, F.lit(" "), t)),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """TRAIN a BPE merge table (Sennrich 2016 learn_bpe): ``n_merges``
    rounds of count-adjacent-pairs → argmax → greedy-merge-everywhere,
    closing the loop that ``bpe_pair_counts`` (scores one round) and
    ``bpe_encode`` (applies a fixed table) left open. Returns the learned
    table: (merge_round, a, b, n_pairs), where n_pairs is the
    word-frequency-weighted corpus count that made (a, b) the argmax.

    Determinism: counts are exact integers and the argmax total order is
    (n DESC, a, b) — bit-stable cross-engine; the paired DuckDB oracle
    (``bpe_train_oracle_sql``) RE-RUNS the identical rounds as a CTE
    chain rather than trusting the engine's picks.

    Scale shape — the classic trick that makes BPE training corpus-size-
    independent: train on the WORD VOCABULARY with frequencies, not the
    token stream. One corpus-sized aggregate builds (word, freq); every
    round after that touches vocab-sized frames only (in-row pair
    explode weighted by freq → hash aggregate → 1-row argmax collect →
    in-row merge pass), each round's state localCheckpointed (vocab-sized
    pin, two consumers: pair agg + next state). The K driver-side
    collects are 1-row scalars — the merge table IS driver state, the
    same way the fixed BPE_MERGES table is."""
    vocab = (
        df.select(F.explode(_tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .select(
            "word",
            "freq",
            F.expr("filter(split(word, ''), x -> x != '')").alias("toks"),
        )
        .localCheckpoint(eager=True)
    )
    learned: list[tuple[int, str, str, int]] = []
    for rnd in range(1, n_merges + 1):
        best = (
            vocab.select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(slice(toks, 1, size(toks) - 1),"
                        " (t, i) -> struct(t AS a, toks[i + 1] AS b))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:  # every word fully merged — nothing left to learn
            break
        a, b, n = best[0].a, best[0].b, int(best[0].n)
        learned.append((rnd, a, b, n))
        # LAZY checkpoint: the next round's argmax is this frame's first
        # consumer and materializes it inside its own job — eager=True
        # here ran a separate materialization job per round, doubling
        # the scheduling cost of the whole loop (2 jobs/round → 1; the
        # r11→r12 mover investigation measured the loop scheduling-bound)
        vocab = vocab.withColumn(
            "toks", F.split(_merge_pass_col(F.col("toks"), a, b), " ")
        ).localCheckpoint(eager=False)
    return df.sparkSession.createDataFrame(
        learned, "merge_round int, a string, b string, n_pairs long"
    )


def bpe_train_ctes(n_merges: int = 6, table: str = "documents") -> str:
    """The WITH-body CTE chain replaying ``bpe_train``'s rounds — shared
    by the training oracle (``bpe_train_oracle_sql``) and the
    train→apply fertility-eval oracle, so both verify against the SAME
    recomputed merge table."""
    parts = [
        rf"""WITH t0 AS (
  SELECT word, COUNT(*) AS freq, regexp_split_to_array(word, '') AS toks
  FROM (
    SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
    FROM {table}
  ) GROUP BY 1
)"""
    ]
    for r in range(1, n_merges + 1):
        p = r - 1
        parts.append(
            f""", m{r} AS (
  SELECT a, b, n FROM (
    SELECT a, b, SUM(freq) AS n FROM (
      SELECT freq, toks[i] AS a, toks[i + 1] AS b
      FROM t{p}, UNNEST(range(1, len(toks))) AS u(i)
    ) GROUP BY 1, 2
  ) ORDER BY n DESC, a, b LIMIT 1
), t{r} AS (
  SELECT word, freq, string_split(list_reduce(toks, (acc, t) ->
    CASE WHEN regexp_extract(acc, '[^ ]+$') = m{r}.a AND t = m{r}.b
         THEN substr(acc, 1, length(acc) - length(m{r}.a)) || m{r}.a || m{r}.b
         ELSE acc || ' ' || t END), ' ') AS toks
  FROM t{p}, m{r}
)"""
        )
    return "".join(parts)


def bpe_train_oracle_sql(n_merges: int = 6, table: str = "documents") -> str:
    """DuckDB SQL replaying ``bpe_train`` exactly: the same vocab build,
    then ``n_merges`` CTE rounds of pair-count → (n DESC, a, b) argmax →
    column-reference merge fold (the learned pair enters the lambda as a
    cross-joined column, never interpolated text — the oracle recomputes
    the argmax, it does not trust the engine's picks)."""
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INT) AS merge_round, a, b, CAST(n AS BIGINT) AS n_pairs FROM m{r}"
        for r in range(1, n_merges + 1)
    )
    return bpe_train_ctes(n_merges, table) + "\n" + union + "\nORDER BY merge_round"


def dsir_logratio(
    df: DataFrame,
    target_pred,
    n_buckets: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance scoring (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169): score
    every document by Σ_tokens ln(p_target(b)/p_raw(b)) over HASHED
    token-feature buckets, where the target unigram model is fit on the
    rows satisfying ``target_pred`` (the high-quality exemplar slice)
    and the raw model on the whole corpus. High scores = documents whose
    feature profile looks like the target domain — the importance weight
    a resampling selection draws with. Add-one smoothing keeps both
    models total; hashing caps the model size at ``n_buckets`` no matter
    the vocabulary (the paper's trick that makes the estimator
    corpus-size-independent).

    Parity: bucket = md5-hash of the token mod n_buckets (exact in both
    engines); each per-token log-ratio is computed from exact-int-derived
    doubles and snapped to the 1e-12 decimal grid before the
    order-independent sum; the mean snaps to 1e-9 (the unigram_logppl
    contract).

    Scale shape: two count aggregates keyed by bucket (Zipf-hot keys →
    map-side partials absorb them; the reduce side is ≤ n_buckets rows,
    which then BROADCASTS to the scoring join), one corpus-sized
    tokenize pass, no Python anywhere."""
    from securities_pricing_data_pipeline_spark.queries.helpers import dec

    toks = df.select(
        F.col(id_col),
        target_pred.cast("int").alias("is_target"),
        F.explode(_tokens(text_col)).alias("tok"),
    ).select(
        id_col,
        "is_target",
        (F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long") % n_buckets)
        .alias("b"),
    )
    counts = toks.groupBy("b").agg(
        F.count("*").alias("cr"), F.sum("is_target").alias("ct")
    )
    totals = toks.agg(
        F.count("*").alias("nr"), F.sum("is_target").alias("nt")
    )
    term = (
        toks.join(F.broadcast(counts), "b")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            dec(
                F.log(
                    (F.col("ct") + 1).cast("double")
                    / (F.col("nt") + n_buckets).cast("double")
                )
                - F.log(
                    (F.col("cr") + 1).cast("double")
                    / (F.col("nr") + n_buckets).cast("double")
                ),
                12,
            ).alias("lr"),
        )
    )
    return term.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_tokens"),
        (F.sum("lr").cast("double") / F.count("*"))
        .cast("decimal(20,9)")
        .cast("double")
        .alias("avg_logratio"),
    )


def bpe_fertility_by_lang(
    df: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Close the BPE loop end-to-end — TRAIN a merge table on the corpus
    (``bpe_train``), APPLY it to every word, and EVALUATE tokenizer
    fertility (BPE tokens per word) per language: the standard tokenizer
    health metric — a vocabulary trained on mixed data tokenizes
    underrepresented languages into more, shorter pieces (fertility ↑),
    the readout multilingual-tokenizer papers report. Returns one row
    per language: word/char/token counts and fertility.

    The learned merges are driver state (the K 1-row argmax collects in
    ``bpe_train``); application is the injection-proof Column-API greedy
    fold per merge — no Python per row, no shuffle beyond the final
    language aggregate. The oracle RETRAINS the table in SQL
    (``bpe_train_ctes``) and applies it with column-reference folds, so
    train and apply are both value-verified against an independent
    replay."""
    merges = [
        (r.a, r.b) for r in bpe_train(df, n_merges, text_col, id_col).collect()
    ]
    words = _tokens(text_col)

    def encode_ntoks(w):
        toks = F.filter(F.split(w, ""), lambda x: x != F.lit(""))
        s = _merge_pass_col(toks, *merges[0])
        for m in merges[1:]:
            s = _merge_pass_col(F.split(s, F.lit(" ")), *m)
        return F.size(F.split(s, F.lit(" "))).cast("long")

    per_doc = df.select(
        F.col(lang_col).alias("lang"),
        F.size(words).cast("long").alias("n_words"),
        F.expr(
            "aggregate(split(lower(trim(" + text_col + ")), '\\\\s+'), 0L,"
            " (a, w) -> a + length(w))"
        ).alias("n_chars"),
        F.aggregate(
            F.transform(words, encode_ntoks), F.lit(0).cast("long"), lambda a, t: a + t
        ).alias("n_bpe_tokens"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.sum("n_words").alias("n_words"),
            F.sum("n_chars").alias("n_chars"),
            F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
        )
        .select(
            "lang",
            "n_words",
            "n_chars",
            "n_bpe_tokens",
            (F.col("n_bpe_tokens").cast("double") / F.col("n_words").cast("double"))
            .cast("decimal(20,9)")
            .cast("double")
            .alias("fertility"),
        )
        .orderBy("lang")
    )


def zipf_fit(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-row corpus-distribution fingerprint: vocabulary size, total
    token count, hapax-legomena count (tokens seen exactly once — the
    standard noisiness signal of a crawl slice), top-1 token share, and
    the ZIPF SLOPE — the least-squares slope of ln(freq) on ln(rank)
    over the frequency-ranked vocabulary (clean natural language sits
    near −1; boilerplate/template corpora flatten, OCR noise steepens).
    The corpus-level twin of the per-document quality scores: drift in
    any of these between crawl versions is the first sign the tokenizer
    or the source mix changed.

    Exactness: ln() is the one non-bit-identical op, so x = round(ln(rank)·1e6)
    and y = round(ln(freq)·1e6) snap to integer grid units (the
    embedding-grid discipline); Σx, Σy, Σxy, Σx² then accumulate in
    DECIMAL(38,0) (xy ≤ ~4e14 per term — int64 would overflow the sum at
    web-corpus vocab sizes) and the closed-form slope
    (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) performs ONE double division — the
    grid units cancel, so the slope is in natural ln/ln units.

    Plan: one token hash-aggregate collapses the scan to vocab-sized
    rows (Zipf-hot keys absorbed map-side); the rank window and the
    regression fold run strictly post-reduction on that frame."""
    from pyspark.sql import Window

    toks = df.select(
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count("*").alias("freq"))
    w = Window.orderBy(F.desc("freq"), F.asc("tok"))
    dec = "decimal(38,0)"
    ranked = counts.select(
        "freq", F.row_number().over(w).alias("rank")
    ).select(
        "freq",
        F.round(F.log(F.col("rank").cast("double")) * 1e6).cast("long").alias("x"),
        F.round(F.log(F.col("freq").cast("double")) * 1e6).cast("long").alias("y"),
    )
    agg = ranked.agg(
        F.count("*").alias("vocab_size"),
        F.sum("freq").alias("n_tokens"),
        F.sum((F.col("freq") == 1).cast("long")).alias("hapax_count"),
        F.max(F.col("freq")).alias("top_freq"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x").cast(dec) * F.col("y").cast(dec))).alias("sxy"),
        F.sum((F.col("x").cast(dec) * F.col("x").cast(dec))).alias("sxx"),
    )
    n = F.col("vocab_size").cast(dec)
    slope = (
        (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    return agg.select(
        F.col("vocab_size").cast("long").alias("vocab_size"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("hapax_count").cast("long").alias("hapax_count"),
        (F.col("hapax_count").cast("double") / F.col("vocab_size")).alias("hapax_ratio"),
        (F.col("top_freq").cast("double") / F.col("n_tokens")).alias("top1_share"),
        slope.alias("zipf_slope"),
    )


def heaps_growth(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10,
) -> DataFrame:
    """Heaps'-law vocabulary growth — the companion of :func:`zipf_fit`:
    split the corpus into ``buckets`` equal document slices in id order
    (the crawl-order proxy), and report, per slice, the cumulative token
    count and cumulative vocabulary (tokens whose FIRST occurrence falls
    in or before the slice), plus the fitted Heaps exponent β from the
    ln(vocab) ~ ln(tokens) regression over the growth points (English
    corpora sit near β≈0.5; a flat β says the crawl stopped finding new
    language — dedup/filter feedback a refresh pipeline reads).

    Exactness: counts are exact ints; the regression rides the same 1e6
    ln grid + DECIMAL(38,0) moments as zipf_fit, one double division.
    Plan: one token aggregate to (token, first_slice) — Zipf-hot tokens
    collapse map-side — then all growth math runs on a ``buckets``-row
    frame; the ntile window runs over document KEYS only (narrow rows),
    never token rows."""
    from pyspark.sql import Window

    # the ntile window is a global single-partition sort — run it over an
    # id-ONLY projection (8-byte rows) and join the slice assignment back,
    # so the full text column never funnels through one partition (ADVICE
    # r11: the previous plan projected text alongside the window)
    slices = df.select(F.col(id_col)).select(
        F.col(id_col),
        F.ntile(buckets).over(Window.orderBy(F.col(id_col))).alias("slice_id"),
    )
    dec = df.select(F.col(id_col), F.col(text_col)).join(slices, id_col)
    toks = dec.select(
        "slice_id",
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    per_slice = toks.groupBy("slice_id").agg(F.count("*").alias("n_toks"))
    n_docs = dec.groupBy("slice_id").agg(F.count("*").alias("n_docs"))
    new_vocab = (
        toks.groupBy("tok")
        .agg(F.min("slice_id").alias("slice_id"))
        .groupBy("slice_id")
        .agg(F.count("*").alias("n_new"))
    )
    w_cum = Window.orderBy("slice_id").rowsBetween(Window.unboundedPreceding, 0)
    grow = (
        per_slice.join(n_docs, "slice_id")
        .join(new_vocab, "slice_id", "left")
        .na.fill({"n_new": 0})
        .select(
            "slice_id",
            "n_docs",
            F.sum("n_toks").over(w_cum).alias("tokens_cum"),
            F.sum("n_new").over(w_cum).alias("vocab_cum"),
        )
        .select(
            "slice_id",
            "n_docs",
            "tokens_cum",
            "vocab_cum",
            F.round(F.log(F.col("tokens_cum").cast("double")) * 1e6)
            .cast("long")
            .alias("x"),
            F.round(F.log(F.col("vocab_cum").cast("double")) * 1e6)
            .cast("long")
            .alias("y"),
        )
    )
    dec38 = "decimal(38,0)"
    reg = grow.agg(
        F.count("*").alias("np"),
        F.sum(F.col("x").cast(dec38)).alias("sx"),
        F.sum(F.col("y").cast(dec38)).alias("sy"),
        F.sum(F.col("x").cast(dec38) * F.col("y").cast(dec38)).alias("sxy"),
        F.sum(F.col("x").cast(dec38) * F.col("x").cast(dec38)).alias("sxx"),
    )
    npc = F.col("np").cast(dec38)
    beta = (npc * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        npc * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    return (
        grow.crossJoin(F.broadcast(reg.select(beta.alias("heaps_beta"))))
        .select("slice_id", "n_docs", "tokens_cum", "vocab_cum", "heaps_beta")
        .orderBy("slice_id")
    )


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The Gopher document-quality rule bundle (Rae et al. 2021 §A1.1) —
    the standard pretraining filter stack, emitted as per-document
    booleans plus the combined verdict so a curator can see WHICH rule
    fires, not just that one did (the actionable form of
    text_quality_score's scalar):

      word count in [50, 100000]; mean word length in [3, 10]; symbol
      ('#' or '…' spelled '...')-to-word ratio ≤ 0.1; ≥ 80% of words
      contain an alphabetic character; ≥ 2 of 8 canonical English
      stopwords present; ≤ 90% of lines bullet-started; ≤ 30% of lines
      ellipsis-terminated.

    Exactness: every threshold is evaluated by INTEGER cross-
    multiplication (e.g. mean-word-length ∈ [3,10] ⇔ 3n ≤ Σlen ≤ 10n;
    symbol ratio ≤ 0.1 ⇔ 10·nsym ≤ nwords) — no division, no float,
    so the flags are trivially engine-identical. Ellipsis counting uses
    replace-subtraction in both engines (identical non-overlapping
    semantics). Pure narrow projection: no shuffle, scan-fused."""
    toks = f"split(trim({text_col}), '\\\\s+')"
    lines = f"split({text_col}, '\\n')"
    nw = f"size({toks})"
    sumlen = f"aggregate(transform({toks}, w -> length(w)), 0L, (a, x) -> a + x)"
    nsym = (
        f"(length({text_col}) - length(replace({text_col}, '#', '')))"
        f" + (length({text_col}) - length(replace({text_col}, '...', ''))) div 3"
    )
    nalpha = f"size(filter({toks}, w -> w rlike '[a-zA-Z]'))"
    stop = (
        f"size(filter(array('the','be','to','of','and','that','have','with'), "
        f"s -> array_contains(transform({toks}, w -> lower(w)), s)))"
    )
    nlines = f"size({lines})"
    nbullet = (
        f"size(filter({lines}, l -> ltrim(l) rlike '^(\\\\- |\\\\* |\\u2022)'))"
    )
    nell = f"size(filter({lines}, l -> rtrim(l) rlike '\\\\.\\\\.\\\\.$'))"
    flags = {
        "ok_word_count": f"{nw} >= 50 AND {nw} <= 100000",
        "ok_mean_word_len": f"3 * {nw} <= {sumlen} AND {sumlen} <= 10 * {nw}",
        "ok_symbol_ratio": f"10 * ({nsym}) <= {nw}",
        "ok_alpha_words": f"5 * {nalpha} >= 4 * {nw}",
        "ok_stopwords": f"{stop} >= 2",
        "ok_bullet_lines": f"10 * {nbullet} <= 9 * {nlines}",
        "ok_ellipsis_lines": f"10 * {nell} <= 3 * {nlines}",
    }
    # keep_cols: extra input columns carried through the projection, so
    # single-pass gate pipelines can stack verdicts without a join (r14)
    cols = [F.col(id_col), *[F.col(c) for c in keep_cols]]
    cols += [F.expr(nw).cast("int").alias("n_words")]
    cols += [F.expr(e).alias(k) for k, e in flags.items()]
    out = df.select(*cols)
    allok = None
    for k in flags:
        allok = F.col(k) if allok is None else (allok & F.col(k))
    return out.withColumn("gopher_pass", allok)


def langid_ngram(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n: int = 3,
    buckets: int = 256,
) -> DataFrame:
    """Hashed char-n-gram multinomial language classifier — the langid
    GATE every real pretraining pipeline runs before the quality stack
    (CCNet's first stage is fastText langid, Wenzek et al. 2020 §3;
    Joulin et al. 2016's fastText is itself a hashed-n-gram linear
    model). The quality operators here (Gopher rules, CCNet ppl, DSIR)
    assume monolingual input; this completes the filter funnel.

    Naive-Bayes shape: character ``n``-grams of the lowercased text are
    hashed into ``buckets`` buckets (``portable_hash60 % buckets`` — the
    oracle-replayable hash), per-language bucket profiles are trained on
    the corpus's own ``lang_col`` labels with Laplace smoothing
    P(b|L) = (cnt+1)/(total_L+buckets), and every document is scored per
    language by Σ ln P(b|L) over its gram occurrences plus the ln prior
    (doc-frequency); argmax wins, ties broken by language code ASC.
    Documents shorter than ``n`` chars score on the prior alone.

    Exactness: every ln snaps to the 1e-12 decimal grid before the
    per-(doc, lang) sum (order-independent DECIMAL(38,12) addition — the
    unigram_logppl contract), so the argmax compares exact decimals and
    both engines pick identical winners up to cross-engine libm-ln
    last-ULP spread (~1e-12/term — across-language score gaps are O(1),
    so flips are out of reach); the EMITTED score rounds the DECIMAL to
    scale 6 (engine-stable HALF_UP, ADVICE r12 — rounding the double
    instead re-introduced each engine's own double-round semantics on a
    value already carrying ~5e-12 of that spread over a 300-gram
    document, measured) and only then casts to double. Scale shape: one gram-count
    aggregate per (lang, bucket) — |langs|·buckets rows, broadcast — and
    the scoring join is gram-rows × |langs| NARROW rows into a map-side
    partial agg; the argmax window partitions by document. No
    corpus-sized shuffle carries text. Note: character semantics match
    because both engines substring by CODE POINT and hash the UTF-8
    bytes via md5."""
    from securities_pricing_data_pipeline_spark.llmdata.dedup import portable_hash60
    from securities_pricing_data_pipeline_spark.queries.helpers import dec

    from pyspark.sql import Window

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.lower(F.trim(F.col(text_col))).alias("t"),
    )
    grams = base.select(
        "doc_id",
        "lang",
        F.explode(
            F.when(
                F.char_length("t") >= n,
                F.expr(
                    f"transform(sequence(1, char_length(t) - {n - 1}),"
                    f" i -> substring(t, i, {n}))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    # r14 pin (guide §2.4): the hashed gram stream used to feed THREE
    # consumers (profile counts, per-language totals, per-doc scoring) —
    # each replaying the explode + md5 bucket hash over every character
    # n-gram (~10M md5s per replay at sf0.1). One compressed aggregate
    # (doc, lang, bucket, multiplicity) is pinned instead — ~8× smaller
    # than the raw gram rows — and every consumer folds from it: cnts by
    # re-aggregation, totals from cnts, and the per-doc score as
    # Σ k·logp (exact — logp is a decimal-grid value, k an exact long,
    # and the long-units product/sum below is overflow-safe: |logp| ≤
    # ln(buckets+max_grams) ≈ 20 → ≤ 2e13 units, × grams/doc ≤ 1e5 →
    # ≤ 2e18 < 2^63).
    doc_b = (
        grams.select(
            "doc_id", "lang", (portable_hash60(F.col("g")) % buckets).alias("b")
        )
        .groupBy("doc_id", "lang", "b")
        .agg(F.count("*").alias("k"))
        .localCheckpoint(eager=True)
    )
    cnts = doc_b.groupBy("lang", "b").agg(F.sum("k").alias("cnt"))
    tots = cnts.groupBy("lang").agg(F.sum("cnt").alias("n_grams"))
    langs = base.groupBy("lang").agg(F.count("*").alias("n_docs"))
    grid = langs.select("lang").crossJoin(
        df.sparkSession.range(buckets).select(F.col("id").alias("b"))
    )
    profile = (
        grid.join(cnts, ["lang", "b"], "left")
        .na.fill({"cnt": 0})
        .join(tots, "lang", "left")
        .na.fill({"n_grams": 0})
        .select(
            F.col("lang").alias("cand"),
            "b",
            dec(
                F.log(
                    (F.col("cnt") + 1).cast("double")
                    / (F.col("n_grams") + buckets).cast("double")
                ),
                12,
            ).alias("logp"),
        )
    )
    total = langs.agg(F.sum("n_docs").alias("n_all"))
    priors = langs.crossJoin(F.broadcast(total)).select(
        F.col("lang").alias("cand"),
        dec(
            F.log(F.col("n_docs").cast("double") / F.col("n_all").cast("double")), 12
        ).alias("logprior"),
    )
    # Σ over gram OCCURRENCES of logp == Σ over (doc, bucket) cells of
    # k·logp. Exactness chain: logp is integral in 1e-12 units (the dec()
    # snap), so units = logp·1e12 → long is exact (the ×1e12 product is
    # integral, so the intermediate decimal(38,6) holds it exactly);
    # k·units multiplies as decimal(19,0)² → decimal(38,0) (never
    # rounds); the sum stays ≤ ~23 digits even for a 1e9-gram document
    # (|logp| ≤ ~30 ⇒ units ≤ 3e13), so the (26,0) downcast is lossless
    # and the final /1e12 division lands back on decimal(38,12) — the
    # same type AND value as the r13 per-occurrence decimal sum.
    units = (F.col("logp") * F.lit(10**12).cast("decimal(13,0)")).cast("long")
    contrib = (
        doc_b.select("doc_id", "b", "k")
        .join(F.broadcast(profile.withColumn("u", units)), "b")
        .groupBy("doc_id", "cand")
        .agg(
            F.sum(
                F.col("k").cast("decimal(19,0)") * F.col("u").cast("decimal(19,0)")
            ).alias("su")
        )
        .select(
            "doc_id",
            "cand",
            (
                F.col("su").cast("decimal(26,0)")
                / F.lit(10**12).cast("decimal(13,0)")
            ).alias("gram_score"),
        )
    )
    spine = base.select("doc_id", "lang").crossJoin(F.broadcast(priors))
    scored = (
        spine.join(contrib, ["doc_id", "cand"], "left")
        .select(
            "doc_id",
            "lang",
            "cand",
            (
                F.col("logprior")
                + F.coalesce(F.col("gram_score"), F.lit(0).cast("decimal(38,12)"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cand"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "lang",
            F.col("cand").alias("pred_lang"),
            # round DECIMAL→DECIMAL at scale 6, THEN cast to double: the
            # raw 1e-12-grid sum visibly carries the ~5e-12 cross-engine
            # libm-ln spread, and rounding the DOUBLE re-introduced each
            # engine's own double-round semantics on top (ADVICE r12);
            # decimal HALF_UP is engine-stable, and the scale-6 result
            # (≤ 13 significant digits here) casts to double exactly
            F.round(F.col("score"), 6).cast("double").alias("log_score"),
            (F.col("cand") == F.col("lang")).alias("is_match"),
        )
    )
