"""Multi-dimensional data-layout planning (Z-order clustering).

A 100 TB table queried by BOTH date and key cannot serve either predicate
well from a single-column sort: files are tight on the sort column and
span everything else. Interleaving the bits of the two dimensions (the
Morton / Z-order curve — the technique behind Delta ``OPTIMIZE ZORDER BY``
and Iceberg's sort-order transforms) gives every file a small bounding
box in BOTH dimensions, so min/max file statistics prune scans for either
predicate.

This module plans such a layout declaratively: assign every row a
Z-value (pure integer bit interleaving — JVM expressions, reproducible in
any engine), derive a target file id from its high bits, and report each
file's bounding box + row count. The plan output IS the skipping story: a
query on either dimension overlaps only files whose box intersects it.
Writing is then ``df.repartition(file_id).sortWithinPartitions(z)`` — one
hash shuffle, no global sort.

Production note: dimensions must be rank-normalized (quantile bucketed)
before interleaving when their domains are skewed or exceed ``bits``;
the callers here use naturally small integer domains.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    ints: result bit 2i is bit i of ``x``, bit 2i+1 is bit i of ``y``.
    A sum of 2·bits shift/mask terms — whole-stage-codegen friendly, no
    UDF, and bit-identical in any engine with 64-bit integer ops."""
    xm = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ym = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


# 4-state Hilbert-curve automaton, entry = digit*4 + next_state indexed by
# state*4 + xbit*2 + ybit. Derived from the classic iterative xy→d
# algorithm (Wikipedia "Hilbert curve", converted to a top-down state
# machine) and verified exhaustively against it in tests. The curve visits
# neighbours contiguously (no Z-order "seams"), so equal-size curve ranges
# have tighter bounding boxes — measured against Z-order in
# layout_skip_eval rather than asserted.
_HILBERT_ENTRIES = [1, 4, 14, 8, 0, 15, 5, 9, 10, 6, 12, 3, 11, 13, 7, 2]


def hilbert_value(x: Column, y: Column, bits: int = 8) -> Column:
    """Hilbert index of the low ``bits`` bits of two non-negative ints —
    pure JVM expressions: per bit level one 16-entry array lookup
    (``element_at`` on a literal array — each prior column referenced
    once, so the expression tree grows linearly, not exponentially) plus
    shift/mask arithmetic. No UDF, no join, bit-identical in any engine
    with 64-bit ints."""
    table = F.array(*[F.lit(e) for e in _HILBERT_ENTRIES])
    xm = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ym = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    state = F.lit(0).cast("long")
    d = F.lit(0).cast("long")
    for lvl in range(bits - 1, -1, -1):
        xb = F.shiftright(xm, lvl).bitwiseAND(F.lit(1))
        yb = F.shiftright(ym, lvl).bitwiseAND(F.lit(1))
        idx = state * F.lit(4) + xb * F.lit(2) + yb
        entry = F.element_at(table, (idx + F.lit(1)).cast("int"))
        d = d * F.lit(4) + F.shiftright(entry, 2)
        state = entry.bitwiseAND(F.lit(3))
    return d


def hilbert_sql_expr(x_expr: str, y_expr: str, bits: int = 8) -> str:
    """DuckDB twin of :func:`hilbert_value`: the same automaton unrolled
    as nested list-literal lookups (linear text growth — the state chain
    references each previous entry exactly once)."""
    tbl = "[" + ", ".join(str(e) for e in _HILBERT_ENTRIES) + "]"
    mask = (1 << bits) - 1
    xm = f"(({x_expr}) & {mask})"
    ym = f"(({y_expr}) & {mask})"
    state = "0"
    d = "0"
    for lvl in range(bits - 1, -1, -1):
        idx = f"(({state})*4 + (({xm} >> {lvl}) & 1)*2 + (({ym} >> {lvl}) & 1))"
        entry = f"({tbl}[{idx} + 1])"
        d = f"(({d})*4 + ({entry} >> 2))"
        state = f"({entry} & 3)"
    return d


def zorder_file_plan(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 16,
    file_shift: int = 22,
) -> DataFrame:
    """Layout plan: one row per target file — row count and the per-file
    bounding box over both source dimensions. ``file_shift`` controls
    granularity: file id = z >> file_shift, so each file covers a
    2^file_shift-cell square-ish tile of the curve.

    One hash aggregate on file id (map-side combines to one row per file
    per partition); the bounding boxes come free from the same pass.
    """
    zx = x.cast("long").alias("zx")
    zy = y.cast("long").alias("zy")
    rows = df.select(zx, zy).withColumn(
        "file_id", F.shiftright(z_value(F.col("zx"), F.col("zy"), bits), file_shift)
    )
    return rows.groupBy("file_id").agg(
        F.count("*").alias("n_rows"),
        F.min("zx").alias("x_min"),
        F.max("zx").alias("x_max"),
        F.min("zy").alias("y_min"),
        F.max("zy").alias("y_max"),
    )


def zorder_oracle_sql(
    table: str, x_expr: str, y_expr: str, bits: int = 16, file_shift: int = 22
) -> str:
    """DuckDB twin of :func:`zorder_file_plan` — the same interleave as a
    generated SQL expression."""
    terms = []
    mask = (1 << bits) - 1
    for i in range(bits):
        terms.append(f"((((xv & {mask}) >> {i}) & 1) << {2 * i})")
        terms.append(f"((((yv & {mask}) >> {i}) & 1) << {2 * i + 1})")
    z = " | ".join(terms)
    return f"""
WITH src AS (
  SELECT CAST({x_expr} AS BIGINT) AS xv, CAST({y_expr} AS BIGINT) AS yv FROM {table}
), zed AS (
  SELECT xv, yv, ({z}) >> {file_shift} AS file_id FROM src
)
SELECT file_id, COUNT(*) AS n_rows,
       MIN(xv) AS x_min, MAX(xv) AS x_max,
       MIN(yv) AS y_min, MAX(yv) AS y_max
FROM zed
GROUP BY file_id
"""


def hilbert_file_plan(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 8,
    file_shift: int = 11,
) -> DataFrame:
    """Hilbert-curve layout plan — same contract as
    :func:`zorder_file_plan` (one row per target file: count + bounding
    box over both RAW dimensions) but files tile the Hilbert curve, whose
    contiguous traversal avoids Z-order's long diagonal seams and gives
    tighter per-file boxes (the delta is measured in
    ``layout_skip_eval``). Dimensions are range-scaled to ``bits`` via
    integer division by the observed max (the rank-normalization step
    production layouts apply before any space-filling curve); assignment
    is the pure-expression automaton of :func:`hilbert_value` — one scan,
    one hash aggregate, no sort."""
    rows = df.select(x.cast("long").alias("zx"), y.cast("long").alias("zy"))
    maxes = rows.agg(F.max("zx").alias("xmax"), F.max("zy").alias("ymax"))
    n = 1 << bits
    scaled = rows.join(F.broadcast(maxes)).select(
        "zx",
        "zy",
        F.expr(f"(zx * {n}) div (xmax + 1)").alias("hx"),
        F.expr(f"(zy * {n}) div (ymax + 1)").alias("hy"),
    )
    rows2 = scaled.withColumn(
        "file_id", F.shiftright(hilbert_value(F.col("hx"), F.col("hy"), bits), file_shift)
    )
    return rows2.groupBy("file_id").agg(
        F.count("*").alias("n_rows"),
        F.min("zx").alias("x_min"),
        F.max("zx").alias("x_max"),
        F.min("zy").alias("y_min"),
        F.max("zy").alias("y_max"),
    )


def hilbert_oracle_sql(
    table: str, x_expr: str, y_expr: str, bits: int = 8, file_shift: int = 11
) -> str:
    """DuckDB twin of :func:`hilbert_file_plan`."""
    n = 1 << bits
    h = hilbert_sql_expr(f"(xv * {n}) // (xmax + 1)", f"(yv * {n}) // (ymax + 1)", bits)
    return f"""
WITH src AS (
  SELECT CAST({x_expr} AS BIGINT) AS xv, CAST({y_expr} AS BIGINT) AS yv FROM {table}
), mx AS (
  SELECT MAX(xv) AS xmax, MAX(yv) AS ymax FROM src
), zed AS (
  SELECT xv, yv, ({h}) >> {file_shift} AS file_id FROM src, mx
)
SELECT file_id, COUNT(*) AS n_rows,
       MIN(xv) AS x_min, MAX(xv) AS x_max,
       MIN(yv) AS y_min, MAX(yv) AS y_max
FROM zed
GROUP BY file_id
"""


def skip_eval_plan(
    df: DataFrame,
    x: Column,
    y: Column,
    date_probes: list[int],
    key_probes: list[int],
    bits: int = 16,
    file_shift: int = 18,
    x_tile: int = 128,
    n_y_tiles: int = 16,
) -> DataFrame:
    """Quantify what the Z-order layout actually buys: replay a probe
    workload (point predicates on EACH dimension) against the min/max
    file statistics of four candidate layouts — Z-order tiles, Hilbert
    tiles (range-scaled, see :func:`hilbert_file_plan`), an x-partitioned
    layout (``x // x_tile``, the classic date-partitioned table), and a
    y-partitioned layout — and report the average number of files a probe
    must touch plus the resulting skip percentage.

    This is the evaluation a table-layout service runs before committing
    an ``OPTIMIZE ZORDER`` rewrite: single-dimension layouts prune
    perfectly on their own dimension and not at all on the other; the
    space-filling curves prune BOTH to ~sqrt(n_files), with Hilbert's
    seam-free traversal typically edging out Z-order — the numbers in
    this report are that tradeoff, measured rather than asserted.

    Scale posture: one scan computes every layout's file id (pure integer
    expressions — no sort; a real rewrite would range-partition on the
    same ids); the box aggregate map-side combines to one row per
    (layout, file); boxes and the literal probe table are tiny broadcast
    frames, so everything after the first aggregate is driver-scale.
    """
    probes = df.sparkSession.createDataFrame(
        [("date", int(v)) for v in date_probes] + [("key", int(v)) for v in key_probes],
        "probe_dim string, v long",
    )
    rows = df.select(x.cast("long").alias("zx"), y.cast("long").alias("zy"))
    maxes = rows.agg(F.max("zx").alias("xmax"), F.max("zy").alias("ymax"))
    z = z_value(F.col("zx"), F.col("zy"), bits)
    h = hilbert_value(
        F.expr("(zx * 256) div (xmax + 1)"), F.expr("(zy * 256) div (ymax + 1)"), 8
    )
    # curve values are materialized BEFORE the generator: expressions
    # inside inline() run once per EMITTED row on the interpreted
    # Generate path (measured 17× slower for the hilbert tree); as plain
    # projected columns they run once per input row under codegen.
    with_curves = (
        rows.join(F.broadcast(maxes))
        .select(
            "zx",
            "zy",
            "ymax",
            F.shiftright(z, file_shift).alias("f_z"),
            F.shiftright(h, 11).alias("f_h"),
        )
    )
    assigned = with_curves.select(
        "zx",
        "zy",
        F.inline(
            F.array(
                F.struct(F.lit("zorder").alias("layout"), F.col("f_z").alias("file_id")),
                F.struct(F.lit("hilbert").alias("layout"), F.col("f_h").alias("file_id")),
                F.struct(
                    F.lit("date_sorted").alias("layout"),
                    F.expr(f"zx div {x_tile}").alias("file_id"),
                ),
                F.struct(
                    F.lit("key_sorted").alias("layout"),
                    F.expr(f"(zy * {n_y_tiles}) div (ymax + 1)").alias("file_id"),
                ),
            )
        ),
    )
    boxes = assigned.groupBy("layout", "file_id").agg(
        F.min("zx").alias("x_min"),
        F.max("zx").alias("x_max"),
        F.min("zy").alias("y_min"),
        F.max("zy").alias("y_max"),
    )
    nf = boxes.groupBy("layout").agg(F.count("*").alias("n_files"))
    touched = F.when(
        (
            (F.col("probe_dim") == "date")
            & F.col("v").between(F.col("x_min"), F.col("x_max"))
        )
        | (
            (F.col("probe_dim") == "key")
            & F.col("v").between(F.col("y_min"), F.col("y_max"))
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    per_probe = (
        boxes.crossJoin(F.broadcast(probes))
        .groupBy("layout", "probe_dim", "v")
        .agg(F.sum(touched).alias("files_touched"))
    )
    agg = per_probe.groupBy("layout", "probe_dim").agg(
        F.count("*").alias("n_probes"),
        F.sum("files_touched").alias("sum_touched"),
    )
    avg = F.col("sum_touched").cast("double") / F.col("n_probes")
    return (
        agg.join(F.broadcast(nf), "layout")
        .select(
            "layout",
            "probe_dim",
            "n_files",
            "n_probes",
            avg.alias("avg_files_touched"),
            (F.lit(1.0) - avg / F.col("n_files")).alias("skip_pct"),
        )
    )


def skip_eval_oracle_sql(
    table: str,
    x_expr: str,
    y_expr: str,
    date_probes: list[int],
    key_probes: list[int],
    bits: int = 16,
    file_shift: int = 18,
    x_tile: int = 128,
    n_y_tiles: int = 16,
) -> str:
    """DuckDB twin of :func:`skip_eval_plan` — identical integer tile
    math and double arithmetic order, so values hash-match exactly."""
    terms = []
    mask = (1 << bits) - 1
    for i in range(bits):
        terms.append(f"((((xv & {mask}) >> {i}) & 1) << {2 * i})")
        terms.append(f"((((yv & {mask}) >> {i}) & 1) << {2 * i + 1})")
    z = " | ".join(terms)
    dp = ", ".join(str(int(v)) for v in date_probes)
    kp = ", ".join(str(int(v)) for v in key_probes)
    h = hilbert_sql_expr("(xv * 256) // (xmax + 1)", "(yv * 256) // (ymax + 1)", 8)
    return f"""
WITH src AS (
  SELECT CAST({x_expr} AS BIGINT) AS xv, CAST({y_expr} AS BIGINT) AS yv FROM {table}
), mx AS (
  SELECT MAX(xv) AS xmax, MAX(yv) AS ymax FROM src
), assigned AS (
  SELECT 'zorder' AS layout, ({z}) >> {file_shift} AS file_id, xv, yv FROM src
  UNION ALL
  SELECT 'hilbert', ({h}) >> 11, xv, yv FROM src, mx
  UNION ALL
  SELECT 'date_sorted', xv // {x_tile}, xv, yv FROM src
  UNION ALL
  SELECT 'key_sorted', (yv * {n_y_tiles}) // (ymax + 1), xv, yv FROM src, mx
), boxes AS (
  SELECT layout, file_id,
         MIN(xv) AS x_min, MAX(xv) AS x_max,
         MIN(yv) AS y_min, MAX(yv) AS y_max
  FROM assigned GROUP BY 1, 2
), nf AS (
  SELECT layout, COUNT(*) AS n_files FROM boxes GROUP BY 1
), probes AS (
  SELECT 'date' AS probe_dim, unnest([{dp}]) AS v
  UNION ALL
  SELECT 'key', unnest([{kp}])
), per_probe AS (
  SELECT b.layout, p.probe_dim, p.v,
         SUM(CASE WHEN (p.probe_dim = 'date' AND p.v BETWEEN b.x_min AND b.x_max)
                    OR (p.probe_dim = 'key' AND p.v BETWEEN b.y_min AND b.y_max)
                  THEN 1 ELSE 0 END) AS files_touched
  FROM boxes b, probes p GROUP BY 1, 2, 3
)
SELECT a.layout, a.probe_dim, nf.n_files, a.n_probes,
       a.avg_files_touched,
       1.0 - a.avg_files_touched / nf.n_files AS skip_pct
FROM (
  SELECT layout, probe_dim, COUNT(*) AS n_probes,
         CAST(SUM(files_touched) AS DOUBLE) / COUNT(*) AS avg_files_touched
  FROM per_probe GROUP BY 1, 2
) a JOIN nf USING (layout)
"""
