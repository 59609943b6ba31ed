"""Deterministic sampling / splitting for training-data pipelines.

Random sampling is useless at 100 TB if it isn't reproducible across
re-runs and engines: ``rand()`` changes with partitioning and retries.
Everything here derives decisions from a content-stable hash of the row
key (md5 → 60-bit int, same family as ``dedup.portable_hash60``), so the
same row always lands in the same split/sample on any cluster layout —
and the DuckDB oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from securities_pricing_data_pipeline_spark.llmdata.dedup import portable_hash60


def hash_bucket(c, buckets: int = 100):
    """Stable bucket in [0, buckets) from the md5-derived 60-bit hash of
    the column's string form. Decoupled from Spark's internal ``hash``
    (seed- and type-dependent) on purpose."""
    return portable_hash60(c.cast("string")) % buckets


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Assign train/val/test by hash bucket — a narrow projection (no
    shuffle, no state): re-runs, backfills, and late-arriving rows all
    split identically. Percentages are exact over the bucket space, not
    the row count (the usual contract for hash splits)."""
    b = hash_bucket(F.col(id_col))
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def sample_fraction(df: DataFrame, id_col: str = "doc_id", pct: int = 10) -> DataFrame:
    """Keep a stable pct% sample: the filter is a pure expression, so it
    pushes into the scan and composes with partition pruning."""
    return df.filter(hash_bucket(F.col(id_col)) < pct)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, int],
    default_pct: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling: each stratum keeps its own pct
    of rows, decided by the stable hash bucket of the row id — the
    standard up/down-sampling move for balancing a training mix (e.g.
    keep 80% of English, 10% of everything else). Pure narrow filter:
    pushes into the scan, no shuffle, reproducible on any layout."""
    b = hash_bucket(F.col(id_col))
    rate = F.lit(default_pct)
    for key, pct in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == key, F.lit(pct)).otherwise(rate)
    return df.filter(b < rate)


def shard_plan(
    df: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic corpus shuffle + sharding for training-data export:
    every document gets a shard in [0, n_shards) and a position within
    the shard, both derived from independent keyed hashes of its id — a
    reproducible global permutation WITHOUT a global sort. Each shard's
    ordering is a within-partition sort after one hash shuffle
    (``repartition(shard)`` + local sort on a cluster writer), so shards
    build embarrassingly parallel at any corpus size; no stage ever sees
    a total order. Ties (hash collisions) break on the id, keeping the
    permutation a function of ids alone — stable across runs, engines,
    and partition layouts.
    """
    from pyspark.sql import Window

    shard = (portable_hash60(F.concat(F.lit("shard:"), F.col(id_col).cast("string"))) % n_shards).cast("int")
    order = portable_hash60(F.concat(F.lit("order:"), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy("ord", id_col)
    return (
        df.select(F.col(id_col), shard.alias("shard"), order.alias("ord"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .select(id_col, "shard", "pos")
    )


def distribution_drift(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str = "doc_id",
    train_pct: int = 80,
) -> DataFrame:
    """Train-vs-holdout categorical drift monitor: the standard pre-flight
    check that a hash split didn't skew the corpus mix (and, run between
    two corpus VERSIONS, the drift alarm for a refreshed crawl). Rows are
    assigned train/holdout by the same stable md5 bucket as
    :func:`split_assign`; each stratum cell gets its additive-smoothed
    share in both groups and its forward-KL contribution
    ``p_train · ln(p_train / p_holdout)`` — sum over cells = KL(train‖holdout),
    finite under Laplace (+1) smoothing even for cells absent on one side.

    Plan shape: ONE hash aggregate over the scan produces the (grp, cell)
    count frame; it is materialized once (``localCheckpoint`` — it's
    cell-cardinality-sized) and the spine, per-group totals, and cell
    count are all re-aggregated FROM it, so at 100 TB the cost is the
    single scan, not the drift math. (Deriving those from ``df`` directly
    reads the Spark plan tree's scan once PER DERIVATION — Catalyst does
    not share subplans across DataFrame reuse.)
    """
    grp = F.when(hash_bucket(F.col(id_col)) < train_pct, F.lit("train")).otherwise(
        F.lit("holdout")
    )
    tagged = df.select(*strata_cols, grp.alias("grp"))
    cells = (
        tagged.groupBy("grp", *strata_cols)
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    spine = cells.select(*strata_cols).distinct()
    grps = df.sparkSession.createDataFrame([("train",), ("holdout",)], "grp string")
    full = spine.crossJoin(F.broadcast(grps))
    counts = full.join(F.broadcast(cells), ["grp", *strata_cols], "left").na.fill({"cnt": 0})
    totals = cells.groupBy("grp").agg(F.sum("cnt").alias("tot"))
    ncells = spine.agg(F.count("*").alias("n_cells"))
    p = (F.col("cnt") + 1).cast("double") / (F.col("tot") + F.col("n_cells")).cast("double")
    probs = (
        counts.join(F.broadcast(totals), "grp")
        .crossJoin(F.broadcast(ncells))
        .select("grp", *strata_cols, "cnt", p.alias("p"))
    )
    tr = probs.filter(F.col("grp") == "train").select(
        *strata_cols, F.col("cnt").alias("n_train"), F.col("p").alias("p_train")
    )
    ho = probs.filter(F.col("grp") == "holdout").select(
        *strata_cols, F.col("cnt").alias("n_holdout"), F.col("p").alias("p_holdout")
    )
    # ln() is the one op here that is NOT bit-identical across engines
    # (libm last-ULP differences), so the KL term is snapped to a
    # decimal(20,14) grid — far coarser than the 1-ULP noise, far finer
    # than any drift signal anyone acts on.
    kl = (
        (F.col("p_train") * F.log(F.col("p_train") / F.col("p_holdout")))
        .cast("decimal(20,14)")
        .cast("double")
    )
    return tr.join(F.broadcast(ho), strata_cols).select(
        *strata_cols, "n_train", "n_holdout", "p_train", "p_holdout", kl.alias("kl_term")
    )


def ks_drift(
    df: DataFrame,
    value_col: str,
    id_col: str = "doc_id",
    train_pct: int = 80,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between the train and
    holdout hash-split slices on a NUMERIC column — the distributional
    twin of :func:`distribution_drift` (which monitors categorical mix):
    KL answers "did the category shares move", KS answers "did a numeric
    signal's whole distribution move" (doc length, quality score) — the
    standard drift alarm between corpus versions.

    Exactness: D = sup_x |F_a(x) − F_b(x)| evaluated at the observed ECDF
    step points, computed as integer cross-products — at each distinct
    value, |ca·n_b − cb·n_a| with exact cumulative counts, widened to
    DECIMAL(38,0) so the products stay exact past the int64 budget at
    100 TB row counts; the argmax row (ties to the smallest value) and
    the one final double division are engine-identical.

    Plan: ONE hash aggregate collapses the scan to value-cardinality
    rows; the cumulative ECDFs ride a single global-order window over
    that reduced frame (the pareto/global-window rule: windows only ever
    run post-reduction) and the argmax is a 1-row TakeOrdered.

    Value grid: integral columns are compared exactly (``cast('long')``
    is lossless there). Fractional columns are snapped to a fixed 1e-6
    grid — ``round(x * 1e6)`` as a long — NOT truncated, so distinct
    fractional values (quality scores, ratios) stay distinct; KS is
    invariant under monotone transforms, so the statistic on the grid
    equals the exact statistic up to grid resolution. For fractional
    inputs ``ks_at`` is reported in grid units (value × 1e6)."""
    from pyspark.sql import Window
    from pyspark.sql import types as T

    dtype = dict(df.dtypes).get(value_col, "")
    integral = dtype in ("tinyint", "smallint", "int", "bigint") or dtype.startswith(
        "decimal"
    ) and dtype.endswith(",0)")
    if integral:
        xcol = F.col(value_col).cast("long")
    else:
        xcol = F.round(F.col(value_col).cast("double") * F.lit(1000000.0)).cast("long")
    is_tr = (hash_bucket(F.col(id_col)) < train_pct).cast("int")
    t = df.select(xcol.alias("x"), is_tr.alias("is_tr"))
    per_v = t.groupBy("x").agg(
        F.sum("is_tr").alias("ct"),
        F.sum(F.lit(1) - F.col("is_tr")).alias("ch"),
    )
    w_cum = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = per_v.select(
        "x",
        F.sum("ct").over(w_cum).alias("ca"),
        F.sum("ch").over(w_cum).alias("cb"),
        F.sum("ct").over(w_all).alias("na"),
        F.sum("ch").over(w_all).alias("nb"),
        F.count("*").over(w_all).alias("nv"),
    )
    dec = "decimal(38,0)"
    dnum = F.abs(
        F.col("ca").cast(dec) * F.col("nb").cast(dec)
        - F.col("cb").cast(dec) * F.col("na").cast(dec)
    )
    best = (
        cum.select("x", "na", "nb", "nv", dnum.alias("dnum"))
        .orderBy(F.desc("dnum"), F.asc("x"))
        .limit(1)
    )
    return best.select(
        F.col("na").cast("long").alias("n_train"),
        F.col("nb").cast("long").alias("n_holdout"),
        F.col("nv").cast("long").alias("n_values"),
        F.col("x").alias("ks_at"),
        (
            F.col("dnum").cast("double")
            / (F.col("na").cast(dec) * F.col("nb").cast(dec)).cast("double")
        ).alias("ks_stat"),
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    id_col: str = "doc_id",
    train_pct: int = 80,
    band_width: int = 50,
) -> DataFrame:
    """Population-stability index between the train and holdout hash
    splits over fixed-width bands of a non-negative integral column —
    the third leg of the drift family (KL: categorical mix, KS: whole
    numeric distribution, PSI: the banded score-drift monitor model-risk
    teams act on, with the standard <0.1 stable / <0.25 moderate / ≥0.25
    shifted reading).

    PSI = Σ_bands (p_b − q_b)·ln(p_b / q_b) — symmetric KL. Banding uses
    truncating integer division on a NON-NEGATIVE integral column (the
    dq_k_anonymity rule: truncation and floor only agree ≥0, and Spark
    ``div`` truncates while DuckDB ``//`` floors). Shares ride
    :func:`distribution_drift`'s Laplace(+1) smoothing, so empty-on-one-
    side bands stay finite; each band's PSI term snaps to the same
    decimal(20,14) grid as the KL term (ln is the one non-bit-identical
    op), and the TOTAL is the exact decimal sum of the snapped terms —
    order-independent, so the stable/moderate/shifted verdict string is
    engine-stable.

    Plan: the banding is a narrow projection; everything after is
    distribution_drift's single hash aggregate + band-cardinality-sized
    frames, with the 1-row total broadcast back onto the band rows."""
    banded = df.select(
        F.expr(f"CAST({value_col} AS BIGINT) div {band_width}").alias("band"),
        F.col(id_col),
    )
    cells = distribution_drift(banded, ["band"], id_col=id_col, train_pct=train_pct)
    dec_term = (
        (F.col("p_train") - F.col("p_holdout"))
        * F.log(F.col("p_train") / F.col("p_holdout"))
    ).cast("decimal(20,14)")
    per = cells.select(
        "band",
        "n_train",
        "n_holdout",
        "p_train",
        "p_holdout",
        dec_term.alias("dec_term"),
    )
    tot = per.agg(F.sum("dec_term").cast("double").alias("psi_total"))
    level = (
        F.when(F.col("psi_total") < 0.1, F.lit("stable"))
        .when(F.col("psi_total") < 0.25, F.lit("moderate"))
        .otherwise(F.lit("shifted"))
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "band",
            "n_train",
            "n_holdout",
            "p_train",
            "p_holdout",
            F.col("dec_term").cast("double").alias("psi_term"),
            "psi_total",
            level.alias("psi_level"),
        )
        .orderBy("band")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via exponential keys
    (Efraimidis & Spirakis 2006): each row draws a deterministic uniform
    ``u`` from its id hash and ranks by ``ln(u)/w`` — the top-k of that
    key is exactly a weight-proportional sample without replacement. The
    temperature-sampling primitive for corpus mixing (w = tokens^T), in
    one pass with NO per-stratum state.

    Scale shape: the key is a narrow projection; top-k compiles to
    TakeOrderedAndProject (per-partition heaps, no global sort). The
    deterministic hash coin keeps re-runs, retries, and engines agreed
    on the SAME sample — rand() would give a different corpus per run.
    (ln() is libm, not exact-rounded; a boundary rank could flip between
    engines only if two keys collide within ~1 ulp — with hash-dense
    uniforms the gap is ~1/n, so the gate safely hash-compares the
    selected id set.)"""
    u = (
        (portable_hash60(F.concat(F.lit("ws:"), F.col(id_col).cast("string"))) + 1)
        .cast("double")
        / F.lit(1152921504606846976.0)  # 2^60 → u ∈ (0, 1]
    )
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__wkey", key)
        .orderBy(F.desc("__wkey"), id_col)
        .limit(k)
        .drop("__wkey")
    )


def reservoir_per_stratum(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic fixed-k "reservoir" per stratum: rank rows inside
    each stratum by a stable hash of the row id and keep the first k —
    the eval-set carve (exactly k held-out docs per source) that a
    classic random reservoir gives you, made reproducible across
    re-runs, retries, and engines by replacing the random coin with the
    hash (the split_assign/weighted_sample discipline).

    Scale shape: Spark compiles the rank-<= filter to WindowGroupLimit —
    each input partition keeps at most k rows per stratum BEFORE the
    exchange, so the shuffle carries O(partitions x strata x k) rows,
    not the corpus; there is no global sort and no driver state."""
    from pyspark.sql import Window

    h = portable_hash60(F.concat(F.lit("rsv:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h, id_col)
    return (
        df.withColumn("rsv_rank", F.row_number().over(w))
        .filter(F.col("rsv_rank") <= k)
        .withColumn("rsv_rank", F.col("rsv_rank").cast("int"))
    )


def poisson_bootstrap_means(
    df,
    value_col,
    id_cols: list[str],
    n_replicas: int = 16,
):
    """Poisson bootstrap (Chamandy et al., Google 2012; Owen & Eckles
    2012): the distributed bootstrap — instead of resampling n rows with
    replacement (impossible without a global pass), each (row, replica)
    draws an independent Poisson(1) weight, giving each replica the same
    multinomial-in-the-limit composition. One scan computes ALL replica
    means; the spread of the B means IS the sampling distribution of the
    estimator, no second pass, no driver-side data.

    Determinism/parity: the Poisson draw inverts the CDF on a 16-bit
    uniform carved out of a portable md5 digest — one digest of
    (id_cols…, replica-group) serves EIGHT replicas via disjoint 4-hex
    windows (md5 bits are independent, and hashing per (row, replica)
    was 8× the digests for no statistical gain — measured 14.3s → the
    digest is the whole cost at 600k×16 draws). Integer thresholds
    (24109/48218/60273/64291/65296/65497 per 2¹⁶ — the Poisson(1) CDF,
    tail collapsed to k=6) make both engines draw IDENTICAL weights;
    replica sums are exact decimal, and the one float op per replica is
    the final mean division.

    Scale shape: the explodes are map-side (⌈B/8⌉ digests then 8 windows
    per row, never shuffled wide); the aggregate carries B partial
    (Σw, Σw·x) states — the full bootstrap costs one fact-table scan
    regardless of B."""
    from pyspark.sql import functions as F

    n_groups = (n_replicas + 7) // 8
    sc = df.sparkSession.sparkContext
    keyed = df.select(
        F.col(value_col).cast("decimal(38,6)").alias("x"),
        F.concat_ws("-", *[F.col(c).cast("string") for c in id_cols]).alias("k"),
    )
    # the digest pass is pure per-row CPU: a 600k-row fact table scans as
    # ~3 parquet splits, serializing 1.2M md5 calls on 3 cores — spread
    # to full parallelism first (no-op at production split counts)
    if keyed.rdd.getNumPartitions() < max(2, sc.defaultParallelism // 2):
        keyed = keyed.repartition(sc.defaultParallelism)
    digested = keyed.select(
        "x",
        F.explode(F.sequence(F.lit(0), F.lit(n_groups - 1))).alias("grp"),
        "k",
    ).select(
        "x",
        "grp",
        F.md5(F.concat_ws("-", F.col("k"), F.col("grp").cast("string"))).alias("h"),
    )
    windows = digested.select(
        "x",
        "grp",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("wi"),
    ).withColumn("replica", F.col("grp") * 8 + F.col("wi")).filter(
        F.col("replica") < n_replicas
    )
    u = F.conv(F.expr("substring(h, 1 + 4 * wi, 4)"), 16, 10).cast("long")
    w = (
        F.when(u < 24109, 0)
        .when(u < 48218, 1)
        .when(u < 60273, 2)
        .when(u < 64291, 3)
        .when(u < 65296, 4)
        .when(u < 65497, 5)
        .otherwise(6)
    )
    agg = windows.select("replica", w.alias("w"), "x").groupBy("replica").agg(
        F.sum("w").alias("n_eff"),
        F.sum(F.col("w") * F.col("x")).alias("wsum"),
    )
    return agg.select(
        F.col("replica").cast("int").alias("replica"),
        F.col("n_eff").cast("long").alias("n_eff"),
        (F.col("wsum").cast("double") / F.col("n_eff").cast("double")).alias("mean_value"),
    )


def neyman_allocation(
    df: DataFrame,
    strata_cols: list[str],
    value_col: str,
    n_total: int = 1000,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation (Neyman 1934): the
    sample budget each stratum should receive to minimize the variance
    of the stratified mean of ``value_col`` — n_h ∝ N_h·S_h — the
    planning step BEFORE stratified_sample/stratified reservoir runs,
    and the standard answer to "how many documents per source should the
    eval set draw". Emits per stratum: size, the exact integer moments,
    the population std, the Neyman weight and share, and the integer
    allocation ``floor(n_total · w_h / Σw)`` (the deterministic floor
    allocation; the ≤|strata| leftover is the caller's largest-remainder
    choice).

    Exactness: for an integral value column, N_h·S_h = sqrt(N_h·Σv² −
    (Σv)²) EXACTLY — the radicand is an integer (DECIMAL(38,0)), so the
    only float ops are one sqrt per stratum (same double in, same double
    out in both engines) and the final divisions; the weight snaps to
    DECIMAL(24,6) before the cross-strata sum, so Σw is order-independent.
    Plan: ONE hash aggregate to |strata| rows; everything after is
    arithmetic on that reduced frame with the 1-row Σw broadcast."""
    dec = "decimal(38,0)"
    # per-row value and square snap to decimal BEFORE the sum (the
    # zipf_fit discipline): Spark's non-ANSI long sum wraps silently on
    # overflow while DuckDB sums in HUGEINT, so at web-corpus magnitudes
    # a long-sum here would be a silent engine-parity break
    g = df.groupBy(*strata_cols).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col(value_col).cast("long").cast(dec)).alias("sv"),
        F.sum(
            F.col(value_col).cast("long").cast(dec)
            * F.col(value_col).cast("long").cast(dec)
        ).alias("svv"),
    )
    radicand = (
        F.col("n_rows").cast(dec) * F.col("svv").cast(dec)
        - F.col("sv").cast(dec) * F.col("sv").cast(dec)
    )
    w = g.select(
        *strata_cols,
        "n_rows",
        (F.sqrt(radicand.cast("double")) / F.col("n_rows").cast("double")).alias(
            "std_pop"
        ),
        F.sqrt(radicand.cast("double")).cast("decimal(24,6)").alias("w_dec"),
    )
    tot = w.agg(F.sum("w_dec").alias("w_sum"))
    share = F.col("w_dec").cast("double") / F.col("w_sum").cast("double")
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            *strata_cols,
            "n_rows",
            "std_pop",
            F.col("w_dec").cast("double").alias("neyman_weight"),
            share.alias("share"),
            F.floor(F.lit(n_total).cast("double") * share).cast("long").alias(
                "alloc_n"
            ),
        )
        .orderBy(*strata_cols)
    )


def doremi_mix(
    df: DataFrame,
    strata_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    eta: float = 1.0,
) -> DataFrame:
    """One DoReMi-style exponentiated-gradient update of the domain mix
    (Xie et al. 2023, arXiv:2305.10429, Group-DRO step): score every
    domain by its token-weighted mean unigram NLL (the same
    corpus-trained LM as ``llmdata.text.unigram_logppl`` — the cheap
    proxy/reference loss gap), take each domain's EXCESS loss over the
    best domain, and reweight w'_d ∝ exp(η·excess_d) from a uniform
    baseline (which cancels in the normalization) — hard domains earn
    more sampling weight, the core curriculum move of data-mixture
    tuning. One update, not the full minimax loop: the iterative
    proxy-model training lives outside any SQL engine; the
    data-pipeline half — loss rollup, excess, EG step, renormalize — is
    exactly what belongs here.

    Parity: per-token −ln p snaps to the 1e-12 decimal grid (exact
    order-independent sums), the per-domain mean to 1e-9; exp() is libm
    like ln so each exp term snaps to 1e-12 decimals BEFORE the exact
    cross-domain normalization sum; the final share is one double
    division. Plan: one token aggregate + one broadcast vocab join
    (the unigram_logppl shape) + domain-cardinality frames."""
    from securities_pricing_data_pipeline_spark.queries.helpers import dec

    toks = df.select(
        F.col(strata_col).alias("dom"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    tot = toks.agg(F.count("*").alias("n_total"))
    nll = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(tot))
        .select(
            "dom",
            dec(
                -F.log(F.col("cnt").cast("double") / F.col("n_total").cast("double")),
                12,
            ).alias("nll"),
        )
    )
    dom = nll.groupBy("dom").agg(
        F.count("*").alias("n_tokens"),
        (F.sum("nll").cast("double") / F.count("*"))
        .cast("decimal(20,9)")
        .cast("double")
        .alias("mean_nll"),
    )
    ndocs = df.groupBy(F.col(strata_col).alias("dom")).agg(
        F.count("*").alias("n_docs")
    )
    mn = dom.agg(F.min("mean_nll").alias("min_nll"))
    terms = (
        dom.join(ndocs, "dom")
        .crossJoin(F.broadcast(mn))
        .select(
            "dom",
            "n_docs",
            "n_tokens",
            "mean_nll",
            (F.col("mean_nll") - F.col("min_nll")).alias("excess_nll"),
            F.exp(F.lit(eta) * (F.col("mean_nll") - F.col("min_nll")))
            .cast("decimal(20,12)")
            .alias("term"),
        )
    )
    norm = terms.agg(F.sum("term").alias("z"))
    return (
        terms.crossJoin(F.broadcast(norm))
        .select(
            F.col("dom").alias(strata_col),
            "n_docs",
            "n_tokens",
            "mean_nll",
            "excess_nll",
            (F.col("term").cast("double") / F.col("z").cast("double")).alias(
                "new_weight"
            ),
        )
        .orderBy(strata_col)
    )
