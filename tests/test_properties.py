"""Property-based tests (hypothesis) for the operators whose correctness
depends on subtle ordering/tie/boundary rules. Each example round-trips
through Spark, so example counts are kept small; the properties are the
point, not the volume.
"""

from __future__ import annotations

import datetime as dt
import sys

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from securities_pricing_data_pipeline_spark.operators.asof import asof_join_backward  # noqa: E402
from securities_pricing_data_pipeline_spark.operators.skew import salted_aggregate  # noqa: E402

_DATES = st.integers(min_value=0, max_value=60).map(
    lambda d: dt.date(2026, 1, 1) + dt.timedelta(days=d)
)
_SYMS = st.sampled_from(["A", "B", "C"])


@settings(max_examples=8, deadline=None)
@given(
    quotes=st.lists(st.tuples(_SYMS, _DATES, st.floats(1, 100)), min_size=1, max_size=12),
    events=st.lists(st.tuples(_SYMS, _DATES), min_size=1, max_size=12),
)
def test_asof_backward_matches_pandas_merge_asof(spark, quotes, events):
    # dedupe quote keys (asof semantics need one value per (sym, date))
    qmap = {(s, d): px for s, d, px in quotes}
    qrows = [(s, d, px) for (s, d), px in qmap.items()]
    erows = [(i, s, d) for i, (s, d) in enumerate(events)]
    qdf = spark.createDataFrame(qrows, "symbol string, qdate date, px double")
    edf = spark.createDataFrame(erows, "event_id long, symbol string, edate date")
    got = {
        r.event_id: (r.px, r.asof_time)
        for r in asof_join_backward(
            edf, qdf, key=["symbol"], left_time="edate", right_time="qdate"
        ).collect()
    }

    qpd = pd.DataFrame(qrows, columns=["symbol", "qdate", "px"]).sort_values("qdate")
    epd = pd.DataFrame(erows, columns=["event_id", "symbol", "edate"]).sort_values("edate")
    qpd["qdate"] = pd.to_datetime(qpd["qdate"])
    epd["edate"] = pd.to_datetime(epd["edate"])
    ref = pd.merge_asof(
        epd, qpd, left_on="edate", right_on="qdate", by="symbol", direction="backward"
    )
    for row in ref.itertuples():
        exp_px = None if pd.isna(row.px) else row.px
        exp_t = None if pd.isna(row.qdate) else row.qdate.date()
        assert got[row.event_id] == (exp_px, exp_t)


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(_SYMS, st.integers(-1000, 1000)), min_size=1, max_size=40
    ),
    n_salts=st.integers(min_value=1, max_value=5),
)
def test_salted_aggregate_equals_plain(spark, rows, n_salts):
    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        r.k: (r.s, r.n, r.mn, r.mx)
        for r in salted_aggregate(
            df,
            ["k"],
            {"s": ("v", "sum"), "n": ("v", "count"), "mn": ("v", "min"), "mx": ("v", "max")},
            n_salts=n_salts,
        ).collect()
    }
    exp: dict[str, list[int]] = {}
    for k, v in rows:
        exp.setdefault(k, []).append(v)
    assert got == {k: (sum(vs), len(vs), min(vs), max(vs)) for k, vs in exp.items()}


@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
def test_portable_hash_matches_duckdb(spark, texts):
    from pyspark.sql import functions as F

    from securities_pricing_data_pipeline_spark.llmdata.dedup import portable_hash60

    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = {r.s: r.h for r in df.select("s", portable_hash60(F.col("s")).alias("h")).collect()}
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"s": texts}))
    exp = dict(
        con.sql("SELECT s, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) FROM t").fetchall()
    )
    assert got == exp


@settings(max_examples=8, deadline=None)
@given(
    intervals=st.lists(
        st.tuples(_DATES, st.integers(0, 45), st.integers(1, 50)), min_size=1, max_size=15
    ),
    probes=st.lists(_DATES, min_size=1, max_size=10),
)
def test_range_join_matches_naive_theta_join(spark, intervals, probes):
    """The bucketed equi-rewrite must equal the naive BETWEEN join for any
    intervals (spans crossing 0, 1, or many month boundaries) and probes."""
    from securities_pricing_data_pipeline_spark.operators.range_join import date_range_join

    irows = [
        (i, start, start + dt.timedelta(days=span), qty)
        for i, (start, span, qty) in enumerate(intervals)
    ]
    idf = spark.createDataFrame(irows, "iv_id long, s date, e date, qty long")
    pdf_ = spark.createDataFrame([(d,) for d in set(probes)], "probe_date date")

    got = sorted(
        (r.probe_date, r.iv_id)
        for r in date_range_join(pdf_, idf, "probe_date", "s", "e").collect()
    )
    want = sorted(
        (r.probe_date, r.iv_id)
        for r in pdf_.join(idf, (F.col("probe_date") >= F.col("s")) & (F.col("probe_date") <= F.col("e"))).collect()
    )
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    bars=st.lists(
        st.tuples(_SYMS, _DATES, st.integers(1, 500), st.integers(1, 1000)),
        min_size=1,
        max_size=20,
    )
)
def test_rollup_grains_match_direct_aggregation(spark, bars):
    """Each GROUPING SETS grain must equal the equivalent standalone
    groupBy over the same frame (open/close picked by first/last day)."""
    rows = {}
    for s, d, px, vol in bars:  # one row per (symbol, day), like the silver
        rows[(s, d)] = (s, d, float(px), px + 1.0, px - 1.0, float(px * 2), vol)
    df = spark.createDataFrame(
        list(rows.values()),
        "symbol string, trade_date date, open double, high double, low double, close double, volume long",
    )
    cal = df.withColumns(
        {
            "week_start": F.date_trunc("week", "trade_date").cast("date"),
            "month_start": F.date_trunc("month", "trade_date").cast("date"),
        }
    )
    rolled = (
        cal.groupingSets(
            [["symbol", "week_start"], ["symbol", "month_start"]],
            "symbol", "week_start", "month_start",
        )
        .agg(
            F.min_by("open", "trade_date").alias("open"),
            F.max_by("close", "trade_date").alias("close"),
            F.sum("volume").alias("volume"),
            F.grouping("week_start").alias("_gw"),
        )
        .select(
            "symbol",
            F.when(F.col("_gw") == 0, "week").otherwise("month").alias("grain"),
            F.coalesce("week_start", "month_start").alias("period_start"),
            "open", "close", "volume",
        )
    )
    got = {(r.symbol, r.grain, r.period_start): (r.open, r.close, r.volume) for r in rolled.collect()}
    for grain, col in [("week", "week_start"), ("month", "month_start")]:
        direct = (
            cal.groupBy("symbol", col)
            .agg(
                F.min_by("open", "trade_date").alias("open"),
                F.max_by("close", "trade_date").alias("close"),
                F.sum("volume").alias("volume"),
            )
        )
        for r in direct.collect():
            assert got[(r.symbol, grain, r[col])] == (r.open, r.close, r.volume)


# ---------------------------------------------------------------------------
# Differential SQL fuzz: the SAME ANSI SQL text must agree between Spark SQL
# and DuckDB on the shared subset the oracle gate relies on (grouped
# aggregates, filters, integer sums, min/max, HAVING). Catches semantic
# deltas (null ordering, numeric typing, count semantics) OUTSIDE the
# curated query registry.
# ---------------------------------------------------------------------------

# the driver's lineitem carries 11 columns (no shipmode/shipinstruct/comment)
_GROUPS = st.sampled_from(["l_returnflag", "l_linestatus"])
_MEASURES = st.sampled_from(["l_quantity", "l_partkey", "l_linenumber"])
_PRICE = st.sampled_from(["l_extendedprice", "l_discount", "l_tax"])


@settings(max_examples=12, deadline=None)
@given(
    g=_GROUPS,
    m=_MEASURES,
    p=_PRICE,
    k=st.integers(min_value=1, max_value=50),
    having=st.integers(min_value=0, max_value=100),
)
def test_ansi_sql_subset_matches_duckdb(spark, g, m, p, k, having):
    from tools.check_oracle import duck_run, normalize

    sf = "/root/testdata/sf0.001"
    sql = f"""
        SELECT {g} AS grp,
               COUNT(*) AS n,
               CAST(SUM(CAST({m} AS BIGINT)) AS BIGINT) AS s,
               MIN({p}) AS mn,
               MAX({p}) AS mx
        FROM lineitem
        WHERE l_quantity <= {k}
        GROUP BY {g}
        HAVING COUNT(*) > {having}
    """
    spark.read.parquet(f"{sf}/lineitem.parquet").createOrReplaceTempView("lineitem")
    sdf = spark.sql(sql).toPandas()
    ddf = duck_run(sf, sql)
    scols, srows = normalize(sdf)
    dcols, drows = normalize(ddf)
    assert scols == dcols
    assert srows == drows


@settings(max_examples=10, deadline=None)
@given(
    g=_GROUPS,
    m=_MEASURES,
    k=st.integers(min_value=5, max_value=50),
    n=st.integers(min_value=1, max_value=25),
)
def test_ansi_topn_with_dates_matches_duckdb(spark, g, m, k, n):
    """Top-N + date bucketing on the same SQL text: LIMIT comparisons are
    only meaningful when the ordering is total, so the ORDER BY ends in
    the (unique) group/date pair — the same tie-break discipline every
    registry query follows."""
    from tools.check_oracle import duck_run, normalize

    sf = "/root/testdata/sf0.001"
    sql = f"""
        SELECT {g} AS grp,
               CAST(l_shipdate AS DATE) AS d,
               CAST(SUM(CAST({m} AS BIGINT)) AS BIGINT) AS s
        FROM lineitem
        WHERE l_quantity <= {k}
        GROUP BY 1, 2
        ORDER BY s DESC, grp, d
        LIMIT {n}
    """
    spark.read.parquet(f"{sf}/lineitem.parquet").createOrReplaceTempView("lineitem")
    sdf = spark.sql(sql).toPandas()
    ddf = duck_run(sf, sql)
    scols, srows = normalize(sdf)
    dcols, drows = normalize(ddf)
    assert scols == dcols
    assert srows == drows


@given(
    xs=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=60)
)
@settings(max_examples=200, deadline=None)
def test_cusum_closed_form_equals_page_hinkley_recursion(xs):
    """events_cusum_changepoint relies on the identity
    PH_t = M_t − min_{s≤t} M_s  ==  the textbook recursion
    PH_t = max(0, PH_{t−1} + r_t), for any integer residual series r
    (here r_t = n·x_t − T, which sums to 0 but the identity holds for
    ANY r). Locks the window formulation to the published detector."""
    n, total = len(xs), sum(xs)
    rs = [n * x - total for x in xs]
    # closed form: cumsum minus running min (cumsum prefix includes 0:
    # min over s<=t of M_s with M_0-before-start = 0 — matching the
    # recursion's PH_0 = 0 base case)
    m, runmin, closed = 0, 0, []
    for r in rs:
        m += r
        runmin = min(runmin, m)
        closed.append(m - runmin)
    # recursion
    ph, rec = 0, []
    for r in rs:
        ph = max(0, ph + r)
        rec.append(ph)
    assert closed == rec


@settings(max_examples=6, deadline=None)
@given(
    quotes=st.lists(st.tuples(_SYMS, _DATES, st.floats(1, 100)), min_size=1, max_size=12),
    events=st.lists(st.tuples(_SYMS, _DATES), min_size=1, max_size=12),
)
def test_asof_nearest_matches_pandas_merge_asof(spark, quotes, events):
    """asof_join_nearest == pandas merge_asof(direction='nearest') on
    random (symbol, date) data — including pandas' backward tie-break."""
    from securities_pricing_data_pipeline_spark.operators.asof import asof_join_nearest

    qmap = {(s, d): px for s, d, px in quotes}
    qrows = [(s, d, px) for (s, d), px in qmap.items()]
    erows = [(i, s, d) for i, (s, d) in enumerate(events)]
    qdf = spark.createDataFrame(qrows, "symbol string, qdate date, px double")
    edf = spark.createDataFrame(erows, "event_id long, symbol string, edate date")
    got = {
        r.event_id: (r.asof_time, r.px)
        for r in asof_join_nearest(
            edf, qdf, key=["symbol"], left_time="edate", right_time="qdate",
            value_cols=["px"],
        ).collect()
    }
    qp = pd.DataFrame(qrows, columns=["symbol", "qdate", "px"]).sort_values("qdate")
    ep = pd.DataFrame(erows, columns=["event_id", "symbol", "edate"]).sort_values(
        "edate"
    )
    qp["qdate"] = pd.to_datetime(qp["qdate"])  # merge_asof needs numeric/dt64
    ep["edate"] = pd.to_datetime(ep["edate"])
    ref = pd.merge_asof(
        ep, qp, left_on="edate", right_on="qdate", by="symbol", direction="nearest"
    )
    for _, row in ref.iterrows():
        want = (
            (None, None)
            if pd.isna(row["qdate"])
            else (row["qdate"].date(), row["px"])
        )
        assert got[row["event_id"]] == want, (row["event_id"], got[row["event_id"]], want)


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("ab"), min_size=1, max_size=12).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(min_value=2, max_value=4),
)
def test_substring_spans_match_bruteforce(spark, docs, k):
    """substring_duplicate_spans == a brute-force Python reference on
    random tiny-vocab corpora: positions whose k-gram occurs >= 2 times
    corpus-wide, merged into maximal runs."""
    from securities_pricing_data_pipeline_spark.llmdata.dedup import (
        substring_duplicate_spans,
    )

    rows = [(i, t) for i, t in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_len, r.n_anchors)
        for r in substring_duplicate_spans(sdf, k=k).collect()
    }
    # reference
    from collections import Counter

    grams: Counter = Counter()
    pos_by_doc: dict[int, list[int]] = {}
    for i, t in rows:
        w = t.split()
        for p in range(len(w) - k + 1):
            grams[" ".join(w[p : p + k])] += 1
    want = set()
    for i, t in rows:
        w = t.split()
        dup = [
            p for p in range(len(w) - k + 1) if grams[" ".join(w[p : p + k])] >= 2
        ]
        run: list[int] = []
        for p in dup + [None]:
            if run and (p is None or p != run[-1] + 1):
                want.add((i, run[0], run[-1] - run[0] + k, len(run)))
                run = []
            if p is not None:
                run.append(p)
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    rels=st.lists(st.floats(0, 1), min_size=2, max_size=5),
    sims=st.lists(st.floats(0, 1), min_size=25, max_size=25),
    k=st.integers(min_value=2, max_value=3),
)
def test_mmr_select_matches_python_greedy(spark, rels, sims, k):
    """mmr_select == the straight Python greedy on one query's candidate
    set with random rel/sim values (ties broken by cid, lam=0.5)."""
    from securities_pricing_data_pipeline_spark.llmdata.similarity import mmr_select

    c = len(rels)
    slim = spark.createDataFrame(
        [(0, i, float(rels[i])) for i in range(c)], "query_id long, cid long, rel double"
    ).localCheckpoint(eager=True)
    smap = {}
    idx = 0
    for i in range(c):
        for j in range(c):
            if i != j:
                smap[(i, j)] = float(sims[idx % len(sims)])
                idx += 1
    pairs = spark.createDataFrame(
        [(0, i, j, s) for (i, j), s in smap.items()],
        "query_id long, ci long, cj long, sim double",
    ).localCheckpoint(eager=True)
    k = min(k, c)
    got = {
        r.mmr_rank: r.cid
        for r in mmr_select(slim, pairs, k=k, lam=0.5).collect()
    }
    # python greedy
    sel: list[int] = []
    rest = set(range(c))
    first = max(rest, key=lambda i: (rels[i], -i))
    sel.append(first)
    rest.remove(first)
    for _ in range(k - 1):
        if not rest:
            break
        best = max(
            rest,
            key=lambda i: (0.5 * rels[i] - 0.5 * max(smap[(i, s)] for s in sel), -i),
        )
        sel.append(best)
        rest.remove(best)
    assert [got[r] for r in sorted(got)] == sel
