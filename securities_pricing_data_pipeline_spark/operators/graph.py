"""Distributed graph analytics over DataFrame edge lists.

The engine already ships one iterative graph operator — connected
components for dedup clustering (``llmdata.dedup.connected_components``,
min-label propagation). This module adds PageRank-style power iteration,
the other workhorse for corpus/link analysis (seed-quality propagation a
la Common Crawl harmonic centrality, supplier/entity importance ranks).

Design (Spark-first, no GraphX/RDDs):
  * edges live in a DataFrame ``(src, dst)``; out-degrees are joined on
    once and the (edges ⋈ degree) frame is localCheckpoint-ed so the
    per-iteration plan stays flat (same escape hatch as
    ``connected_components`` — without it each iteration re-plans the
    whole upstream lineage);
  * each iteration is one shuffle: messages (rank/degree per edge) are
    decimal-snapped at scale 12 — exact, order-independent partial
    aggregation per the ``queries.helpers`` discipline, which is what
    makes a 5-iteration float fixpoint bit-reproducible across engines —
    then summed per destination and folded into
    ``teleport + damping·Σ``;
  * ranks stay a DataFrame of (node, rank) — never collected; the only
    driver-side scalar is N (node count), needed in the teleport term.

Scale: per iteration the shuffle carries (node, decimal) pairs — edge
count × 16 bytes — and the rank frame is node count rows. Supplier
co-supply edges are bounded per order (≤ lines²), so the edge list grows
linearly with the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from securities_pricing_data_pipeline_spark.queries.helpers import dec

#: decimal snap scale for per-edge contributions (rank ≤ 1, so grid units
#: ≤ 1e12 — exact long arithmetic inside the decimal sum in both engines)
CONTRIB_SCALE = 12

#: below this node count the (node, rank) / (node, deg) frames are
#: broadcast into the per-iteration edge join instead of shuffling the
#: edge list — 5M nodes × 16 B ≈ 80 MB, comfortably within executor
#: memory on any production profile. Above it, fall back to shuffle
#: joins (web-scale graphs).
BROADCAST_NODE_LIMIT = 5_000_000


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    symmetric: bool = False,
    materialized: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns (node, rank) for every node with at least one outgoing edge
    (on a symmetrized graph — e.g. co-occurrence — that is every node).
    Fixed ``iters`` rather than convergence-tested: the driver-side
    convergence check would add a count per iteration, and downstream
    consumers (top-k ranking) want deterministic cost. Dangling-node mass
    is not redistributed (nodes here always have out-edges).

    ``symmetric=True`` asserts every edge has its reverse (co-occurrence
    graphs): then every node with out-edges also receives messages, so
    the per-iteration left-join that re-attaches silent nodes is
    provably a no-op and is skipped — one fewer join per iteration,
    identical results on graphs that honor the contract.
    """
    # materialize the edge list exactly once — degrees, node count, and
    # every iteration all derive from this one frame, so nothing upstream
    # (often an expensive pair-generation self-join) is ever recomputed.
    # ``materialized=True`` = the caller already pinned it (a persisted
    # per-session silver): skip the per-call localCheckpoint copy — at
    # bench scale that copy alone is ~0.7s/run of pure re-write
    # (VERDICT r8 item 1's pagerank drift was exactly this, plus the
    # unpinned 2x-partition symmetrize union upstream).
    if not materialized:
        edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy(src).agg(F.count("*").alias("deg"))
    n_nodes = deg.count()
    # node-keyed frames are n_nodes rows of 16 bytes: when that is
    # dim-small (supplier/entity graphs), broadcast them into the edge
    # join so the edge list never shuffles after its one materialization
    # — each iteration is then map-side join + one message aggregation.
    small = n_nodes <= BROADCAST_NODE_LIMIT
    bcast = F.broadcast if small else (lambda df: df)
    if small:
        # deg is tiny: pin it once and join map-side per iteration
        deg = deg.localCheckpoint(eager=True)
        ed = edges.join(F.broadcast(deg), src)
    else:
        # web-scale node sets: one flat, materialized (src, dst, deg)
        # frame reused every iteration (shuffle joins thereafter)
        ed = edges.join(deg, src).localCheckpoint(eager=True)
    nodes = deg.select(F.col(src).alias("node"))
    teleport = (1.0 - damping) / n_nodes  # same literals as the oracle SQL

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for i in range(iters):
        if small and i > 0:
            # flatten the iterative lineage: ranks is n_nodes rows, so an
            # eager materialization per iteration is O(nodes) cheap and
            # keeps every iteration's job a single flat
            # scan(ed) ⋈ broadcast(ranks) → partial-agg plan instead of a
            # chain of nested broadcast exchanges.
            ranks = ranks.localCheckpoint(eager=True)
        msgs = ed.join(bcast(ranks), ed[src] == ranks.node).select(
            F.col(dst).alias("node"),
            dec(F.col("rank") / F.col("deg"), CONTRIB_SCALE).alias("c"),
        )
        recv = msgs.groupBy("node").agg(F.sum("c").cast("double").alias("s"))
        if symmetric:
            ranks = recv.select(
                "node",
                (F.lit(teleport) + F.lit(damping) * F.col("s")).alias("rank"),
            )
        else:
            ranks = nodes.join(recv, "node", "left").select(
                "node",
                (
                    F.lit(teleport) + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
    return ranks


def triangle_stats(
    und: DataFrame, src: str = "u", dst: str = "v", materialized: bool = False
) -> DataFrame:
    """Triangle count + global clustering over an UNDIRECTED canonical
    edge list (one row per edge, ``src < dst``, no duplicates).

    Edge-iterator formulation over DEGREE-ORDERED oriented edges: each
    edge points from its lower-(deg, id) endpoint to the higher, and
    each triangle {a,b,c} (a<b<c in that order) is counted exactly once
    at its lowest pair as |N⁺(a) ∩ N⁺(b)| — one ``array_intersect`` per
    edge over the two oriented out-neighborhoods, no wedge-row
    materialization. Degree ordering caps oriented out-degree at O(√m)
    (Schank–Wagner / Latapy), so intersect work totals O(m^1.5) and hub
    vertices become intersection SINKS, not sources — the property the
    10× scale probe pins on a deliberately hub-skewed graph. The
    adjacency join is a keyed equi-join AQE broadcasts while the
    node-sized adjacency table is small; the hot intersect stage is
    explicitly repartitioned so AQE's small-shuffle coalescing cannot
    serialize O(m^1.5) work onto a few tasks.

    Returns one row: (n_nodes, n_edges, n_triangles, n_triads,
    global_clustering). The input is materialized once
    (localCheckpoint) — every downstream frame derives from it.
    """
    spark = und.sparkSession
    und = und.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if not materialized:  # caller-pinned contract, see pagerank()
        und = und.localCheckpoint(eager=True)
    n_edges = und.agg(F.count("*").alias("n_edges"))
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    nodes_triads = deg.agg(
        F.count("*").alias("n_nodes"),
        F.sum(F.expr("(deg * (deg - 1)) div 2")).alias("n_triads"),
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("degu"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("degv"))
    u_first = (F.col("degu") < F.col("degv")) | (
        (F.col("degu") == F.col("degv")) & (F.col("u") < F.col("v"))
    )
    edges = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        # r14 pin (guide §2.4): edges feeds the adjacency aggregate AND
        # the intersect base; adj is joined twice — unpinned, the degree
        # joins replayed up to 6x inside one action (see
        # edge_triangle_support for the measured stage audit)
        .localCheckpoint(eager=True)
    )
    adj = (
        edges.groupBy("src")
        .agg(F.collect_list("dst").alias("nbrs"))
        .localCheckpoint(eager=True)
    )
    nparts = spark.sparkContext.defaultParallelism * 3
    tri = (
        edges.repartition(nparts)
        .join(
            adj.select(F.col("src").alias("jsrc"), F.col("nbrs").alias("src_nbrs")),
            F.col("src") == F.col("jsrc"),
        )
        .join(
            adj.select(F.col("src").alias("jdst"), F.col("nbrs").alias("dst_nbrs")),
            F.col("dst") == F.col("jdst"),
        )
        .select(F.size(F.array_intersect("src_nbrs", "dst_nbrs")).alias("c"))
        .agg(F.sum("c").alias("n_triangles"))
    )
    out = nodes_triads.crossJoin(F.broadcast(n_edges)).crossJoin(F.broadcast(tri))
    gcc = (F.lit(3.0) * F.col("n_triangles").cast("double")) / F.col(
        "n_triads"
    ).cast("double")
    return out.select(
        "n_nodes", "n_edges", "n_triangles", "n_triads", gcc.alias("global_clustering")
    )


def label_propagation(
    sym: DataFrame, rounds: int = 2, src: str = "u", dst: str = "v"
) -> DataFrame:
    """Deterministic synchronous majority label propagation (Raghavan
    2007's LPA) over a SYMMETRIC edge list — returns (node, label) after
    ``rounds`` iterations. Labels start as node ids; each round every
    node adopts the most frequent label among its neighbors, vote ties
    breaking to the smaller label id. The fixed round count, synchronous
    updates, and total tie order turn the classic order-sensitive
    heuristic into a bit-reproducible operator (the same determinization
    the SQL oracle unrolls).

    Scale shape: each round is one keyed equi-join of the edge list
    against the node-sized (node, label) frame plus a (node, label)
    hash-aggregate vote — shuffles carry id pairs only, one PageRank
    iteration's cost per round."""
    labels = None  # round 1 inlines init (neighbor label == neighbor id)
    for r in range(rounds):
        if labels is None:
            nbr = sym.select(F.col(src).alias("node"), F.col(dst).alias("nl"))
        else:
            nbr = sym.join(
                labels.select(F.col("node").alias(dst), F.col("label").alias("nl")),
                dst,
            ).select(F.col(src).alias("node"), "nl")
        cnt = nbr.groupBy("node", "nl").agg(F.count("*").alias("c"))
        w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("nl"))
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", F.col("nl").alias("label"))
        )
    return labels


def modularity(
    sym: DataFrame, labels: DataFrame, src: str = "u", dst: str = "v"
) -> DataFrame:
    """Newman modularity per community (Newman & Girvan 2004) over a
    SYMMETRIC unweighted edge list and a (node, label) assignment —
    the quality score that turns a community DETECTION (LPA) into a
    community EVALUATION: Q_c = l_c/m − (d_c/(2m))² where l_c is the
    intra-community undirected edge count, d_c the community's degree
    sum, m the total undirected edge count. Σ_c Q_c is the partition's
    modularity; per-community rows expose which communities carry it.

    Exactness (the assortativity moments discipline): l_c, d_c, m are
    exact int64 counts; the contribution is computed as the rational
    (4·m·l_c − d_c²) / (4·m²) with the numerator and denominator in
    DECIMAL(38,0) — exact beyond the int64 budget at 100 TB edge counts
    — and the single decimal→double division is the only float op, so
    both engines emit bit-identical contributions.

    Plan: intra-edge counting joins the node-sized label frame onto the
    canonical (u < v) half of the edge list twice (AQE broadcasts the
    label side when small); degree sums are one edge-list aggregate plus
    a label join; the 1-row m scalar broadcasts onto the community-sized
    result. Shuffles carry id pairs and (community, count) partials only
    — no adjacency arrays, no pair materialization."""
    und = sym.filter(F.col(src) < F.col(dst))
    # labels feeds THREE consumers (both intra-edge sides + the degree
    # rollup); unpinned, Catalyst replays the whole producing lineage
    # (e.g. 2 LPA rounds) per consumer — pin the node-sized frame once
    labels = labels.localCheckpoint(eager=True)
    lu = labels.select(F.col("node").alias(src), F.col("label").alias("cu"))
    lv = labels.select(F.col("node").alias(dst), F.col("label").alias("cv"))
    intra = (
        und.join(lu, src)
        .join(lv, dst)
        .filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.count("*").alias("intra_edges"))
    )
    deg = sym.groupBy(F.col(src).alias("node")).agg(F.count("*").alias("deg"))
    per_c = (
        labels.join(deg, "node")
        .groupBy(F.col("label").alias("community"))
        .agg(
            F.count("*").alias("n_members"),
            F.sum("deg").alias("degree_sum"),
        )
    )
    m_row = und.agg(F.count("*").alias("m_edges"))
    j = (
        per_c.join(intra, "community", "left")
        .na.fill({"intra_edges": 0})
        .crossJoin(F.broadcast(m_row))
    )
    dec = "decimal(38,0)"
    m = F.col("m_edges").cast(dec)
    d = F.col("degree_sum").cast(dec)
    num = F.lit(4).cast(dec) * m * F.col("intra_edges").cast(dec) - d * d
    den = F.lit(4).cast(dec) * m * m
    return j.select(
        "community",
        F.col("n_members").cast("long").alias("n_members"),
        F.col("intra_edges").cast("long").alias("intra_edges"),
        F.col("degree_sum").cast("long").alias("degree_sum"),
        (num.cast("double") / den.cast("double")).alias("q_contrib"),
    )


def edge_triangle_support(
    und: DataFrame, src: str = "u", dst: str = "v", materialized: bool = False
) -> DataFrame:
    """Per-edge triangle support — |N(a) ∩ N(b)| for every undirected
    canonical edge (a < b, no duplicates) — the quantity behind edge
    embeddedness, truss decomposition, and neighborhood-Jaccard link
    scoring.

    Same degree-ordered edge-iterator shape as ``triangle_stats``, but
    instead of summing intersection SIZES it ENUMERATES each triangle
    once (explode of the oriented-adjacency intersect) and attributes it
    to its three member edges in canonical (min, max) form; one hash
    aggregate then counts per edge. Degree ordering caps oriented
    out-degrees at O(√m), so enumeration work is O(m^1.5 + #triangles)
    and hub vertices never fan out — the explode emits exactly one row
    per (triangle, found-at-edge), i.e. #triangles rows total, and the
    attribution explodes all three member edges in that same single
    pass (3·#triangles narrow rows, no re-enumeration).

    Returns (u, v, support) for every input edge, zero-support edges
    included (left join back to the input list).
    """
    spark = und.sparkSession
    und = und.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if not materialized:  # caller-pinned contract, see pagerank()
        und = und.localCheckpoint(eager=True)
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("degu"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("degv"))
    u_first = (F.col("degu") < F.col("degv")) | (
        (F.col("degu") == F.col("degv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        # r14 pin (guide §2.4): ``oriented`` feeds BOTH the adjacency
        # aggregate and the enumeration base below; unpinned, each
        # consumer replays the two degree joins (and their two degree
        # aggregates each) — the r14 stage audit showed 8 replicated
        # degree map stages in one graph_edge_jaccard_parts action.
        # Edge-sized narrow rows, the same cost class as the pinned
        # input list itself.
        .localCheckpoint(eager=True)
    )
    adj = (
        oriented.groupBy("src")
        .agg(F.collect_list("dst").alias("nbrs"))
        # joined twice below (jsrc/jdst): pin one aggregate, not two
        .localCheckpoint(eager=True)
    )
    nparts = spark.sparkContext.defaultParallelism * 3
    # one row per triangle: (a=src, b=dst, w) with w in N+(a) ∩ N+(b)
    tris = (
        oriented.repartition(nparts)
        .join(
            adj.select(F.col("src").alias("jsrc"), F.col("nbrs").alias("src_nbrs")),
            F.col("src") == F.col("jsrc"),
        )
        .join(
            adj.select(F.col("src").alias("jdst"), F.col("nbrs").alias("dst_nbrs")),
            F.col("dst") == F.col("jdst"),
        )
        .select(
            F.col("src").alias("a"),
            F.col("dst").alias("b"),
            F.explode(F.array_intersect("src_nbrs", "dst_nbrs")).alias("w"),
        )
    )
    # one pass over the (uncached) triangle enumeration: a 3-way union of
    # projections would recompute the dominant join+explode once per
    # branch (~3x the enumeration CPU — measured 14.1s vs 5.2s at bench
    # scale); exploding an array of the three canonical (least, greatest)
    # edge structs attributes each triangle to its member edges in the
    # same scan that enumerated it.
    canon = lambda x, y: F.struct(  # noqa: E731
        F.least(x, y).alias("u"), F.greatest(x, y).alias("v")
    )
    attributions = tris.select(
        F.explode(
            F.array(
                canon(F.col("a"), F.col("b")),
                canon(F.col("a"), F.col("w")),
                canon(F.col("b"), F.col("w")),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    support = attributions.groupBy("u", "v").agg(F.count("*").alias("support"))
    return und.join(support, ["u", "v"], "left").select(
        "u", "v", F.coalesce(F.col("support"), F.lit(0)).alias("support")
    )


def kcore_peel(
    und: DataFrame,
    k: int,
    rounds: int = 3,
    src: str = "u",
    dst: str = "v",
    until_fixpoint: bool = False,
    materialized: bool = False,
) -> DataFrame:
    """k-core peeling over an undirected canonical edge list: each round
    drops every node whose CURRENT degree is < k, then drops edges
    touching a dropped node. Returns one row per round:
    (round, n_nodes, n_edges) AFTER that round's peel — the
    shrinking-core profile.

    Two modes:
      * fixed ``rounds`` (default) — deterministic cost and
        SQL-expressible (the oracle unrolls the same rounds as chained
        CTEs); may UNDER-peel a long removal cascade.
      * ``until_fixpoint=True`` — keeps peeling until a round removes no
        edges (the true k-core; peel-to-empty counts as converged) and
        appends a ``converged`` boolean column, true on the final stable
        row. The per-round edge count is already materialized for the
        profile, so the convergence test is free; termination is
        guaranteed (every non-final round removes ≥ 1 edge). ``rounds``
        is ignored in this mode.

    Scale shape: a round is one degree aggregate over the edge list plus
    two broadcastable semi-joins against the (node-sized) survivor set —
    the same per-iteration cost class as PageRank; no adjacency arrays,
    no wedges. The edge list is re-checkpointed per round so the lineage
    stays one round deep (the iterative-plan discipline pagerank/LPA
    use)."""
    edges = und.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if not materialized:  # caller-pinned contract, see pagerank()
        edges = edges.localCheckpoint(eager=True)
    out = []
    # count on the already-materialized checkpoint is cheap and lets a
    # no-op first round (input already a k-core) converge immediately
    prev_edges: int | None = edges.count() if until_fixpoint else None
    r = 0
    while True:
        r += 1
        deg = (
            edges.select(F.col("u").alias("node"))
            .unionAll(edges.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        edges = (
            edges.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        n_nodes = (
            edges.select(F.col("u").alias("node"))
            .unionAll(edges.select(F.col("v").alias("node")))
            .distinct()
            .count()
        )
        n_edges = edges.count()
        stable = n_edges == prev_edges or n_edges == 0
        out.append((r, n_nodes, n_edges, stable))
        prev_edges = n_edges
        if (until_fixpoint and stable) or (not until_fixpoint and r >= rounds):
            break
    spark = und.sparkSession
    if until_fixpoint:
        return spark.createDataFrame(
            out, "round int, n_nodes long, n_edges long, converged boolean"
        )
    return spark.createDataFrame(
        [t[:3] for t in out], "round int, n_nodes long, n_edges long"
    )


def personalized_pagerank(
    edges: DataFrame,
    seed: int,
    iters: int = 4,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    materialized: bool = False,
) -> DataFrame:
    """Personalized PageRank (random walk with restart to ONE seed node):
    rank_{t+1}(v) = (1−d)·[v = seed] + d·Σ_{u→v} rank_t(u)/deg(u) — the
    standard influence/recommendation scorer around an anchor entity
    ("which suppliers are closest to this one in the co-supply
    network"). Mass starts entirely on the seed, and the teleport term
    returns mass there every step, so ranks decay with graph distance
    from the seed instead of measuring global centrality.

    Same determinism discipline as ``pagerank``: fixed iteration count,
    per-edge contributions snapped to DECIMAL(38,12) before the
    order-independent sum, one float multiply-add per node per round —
    bit-reproducible against the unrolled SQL oracle. Same plan shape
    too: the edge list materializes once, each iteration is one keyed
    join + one message aggregate of narrow rows; the left join back to
    the node table keeps zero-inflow nodes alive (their rank is the
    bare teleport term, 0 for non-seeds — dropping them would silently
    shrink the result set).

    Broadcast is gated on ``BROADCAST_NODE_LIMIT`` exactly like
    ``pagerank`` — below it the (node, deg) / (node, rank) frames are
    broadcast into the per-iteration edge join; above it (web-scale node
    sets) the joins fall back to shuffle against a once-materialized
    (src, dst, deg) frame instead of OOMing the executors on an
    unconditional broadcast."""
    if not materialized:  # same caller-pinned contract as pagerank()
        edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy(src).agg(F.count("*").alias("deg"))
    n_nodes = deg.count()
    small = n_nodes <= BROADCAST_NODE_LIMIT
    bcast = F.broadcast if small else (lambda df: df)
    if small:
        deg = deg.localCheckpoint(eager=True)
        ed = edges.join(F.broadcast(deg), src)
    else:
        ed = edges.join(deg, src).localCheckpoint(eager=True)
    nodes = deg.select(F.col(src).alias("node"))
    seed_mass = F.when(F.col("node") == seed, F.lit(1.0)).otherwise(F.lit(0.0))
    ranks = nodes.select("node", seed_mass.alias("rank"))
    for i in range(iters):
        if i > 0:
            ranks = ranks.localCheckpoint(eager=True)  # flat lineage per round
        # r15 (guide §2.3 — move fewer bytes): PPR mass is EXACTLY zero
        # outside the seed's i-hop neighborhood (non-seed teleport is 0),
        # and a zero rank contributes dec(0.0/deg) = 0 exactly — dropping
        # those rows cannot change any decimal sum, and a node whose
        # ENTIRE inflow was zeros just leaves recv and re-enters through
        # coalesce(NULL → 0.0), the same 0.0 the dense sum produced.
        # Iteration 1 then scores deg(seed) edges instead of |E|; at
        # 100 TB the early iterations touch only the seed's neighborhood
        # instead of the whole graph (locality is the point of PPR).
        nz = ranks.filter(F.col("rank") != 0.0)
        msgs = ed.join(bcast(nz), ed[src] == nz.node).select(
            F.col(dst).alias("node"),
            dec(F.col("rank") / F.col("deg"), CONTRIB_SCALE).alias("c"),
        )
        recv = msgs.groupBy("node").agg(F.sum("c").cast("double").alias("s"))
        # restart mass computed in SQL decimal, NOT Python floats:
        # Python's 1.0 - 0.85 is 0.15000000000000002 while the oracle's
        # decimal subtraction is exactly 0.15 — a 2-ulp hash mismatch
        restart = F.expr(f"CAST(1.0 - {damping} AS DOUBLE)")
        # recv is node-sized (≤ the rank frame the loop already
        # broadcasts): make the re-attach join's strategy explicit
        # instead of leaving a LogicalRDD-stats guess to the planner.
        ranks = nodes.join(bcast(recv), "node", "left").select(
            "node",
            (
                F.when(F.col("node") == seed, restart).otherwise(F.lit(0.0))
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
    return ranks


def hits(
    edges: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
    materialized: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """HITS hubs-and-authorities (Kleinberg 1999) over a DIRECTED edge
    list — returns ``(hubs, authorities)`` as (node, h) / (node, a)
    frames after ``iters`` mutual-reinforcement rounds with L1
    normalization. On a bipartite src→dst graph (the intended subject —
    e.g. supplier→part coverage) hub mass concentrates on sources that
    cover well-covered sinks and vice versa; on a symmetric graph HITS
    degenerates to degree centrality, so feed it directed structure.

    Determinism (the pagerank discipline): contributions snap to the
    DECIMAL(38,12) grid before each order-independent sum; each L1
    normalizer is an exact decimal total; the per-node score is one
    exact-decimal÷exact-decimal double division — every float op is a
    single correctly-rounded IEEE op on bit-identical inputs, so the
    unrolled SQL oracle reproduces scores exactly.

    Scale shape: per round, two keyed equi-joins of the edge list
    against node-sized score frames and two hash aggregates — the
    PageRank iteration cost class; the 1-row normalizer joins broadcast.
    Score frames localCheckpoint per round (flat lineage, node-sized
    cost). ``materialized=True`` = caller already pinned ``edges``."""
    if iters < 1:
        # iters=0 would return (unnormalized initial hubs, None) — the
        # None authorities frame would crash the CALLER at use time;
        # fail here where the mistake is visible instead
        raise ValueError("hits() needs iters >= 1 (one mutual-reinforcement round)")
    if not materialized:
        edges = edges.localCheckpoint(eager=True)
        # r14 note: re-spreading the pinned list to session width for the
        # decimal contribution passes was tried and measured SLOWER
        # (6.4s vs 5.2s median at sf0.1 — the extra shuffle+checkpoint
        # costs more than the added parallelism buys); left as-is.
    h = (
        edges.select(F.col(src).alias("node"))
        .distinct()
        .select("node", F.lit(1.0).alias("h"))
    )
    a = None
    for i in range(iters):
        ar = (
            edges.join(h, edges[src] == h.node)
            .groupBy(dst)
            .agg(F.sum(dec(F.col("h"), CONTRIB_SCALE)).alias("ar"))
        )
        at = ar.agg(F.sum("ar").alias("ta"))
        # ``a`` IS pinned: it feeds two consumers (the hr aggregate and
        # the returned authority frame) — dropping this checkpoint was
        # measured SLOWER (7.9s vs 6.3s warm at sf0.1): each consumer
        # replays the edges⋈h join + aggregate lineage
        a = (
            ar.crossJoin(F.broadcast(at))
            .select(
                F.col(dst).alias("node"),
                (F.col("ar").cast("double") / F.col("ta").cast("double")).alias("a"),
            )
            .localCheckpoint(eager=True)
        )
        hr = (
            edges.join(a, edges[dst] == a.node)
            .groupBy(src)
            .agg(F.sum(dec(F.col("a"), CONTRIB_SCALE)).alias("hr"))
        )
        ht = hr.agg(F.sum("hr").alias("th"))
        h = (
            hr.crossJoin(F.broadcast(ht))
            .select(
                F.col(src).alias("node"),
                (F.col("hr").cast("double") / F.col("th").cast("double")).alias("h"),
            )
            .localCheckpoint(eager=True)
        )
    return h, a


def landmark_bfs(
    edges: DataFrame,
    seeds: list[int],
    max_depth: int = 4,
    src: str = "src",
    dst: str = "dst",
    materialized: bool = False,
) -> DataFrame:
    """Multi-source BFS hop distances from fixed LANDMARK nodes over a
    SYMMETRIC edge list — the landmark-distance sketch behind closeness
    estimation and landmark routing (Potamias et al., CIKM 2009): exact
    closeness needs one BFS per node, so large-graph practice picks a
    handful of landmarks and runs their BFS trees simultaneously.
    Returns (landmark, node, dist) for every node within ``max_depth``
    hops of a seed, dist = exact shortest-hop count (BFS level order
    guarantees minimality; the frontier is anti-joined against the
    visited set per landmark, so a node enters at its first — minimal —
    level only).

    Scale shape: all seeds expand in ONE frame (landmark is just a key
    column), so each round costs one frontier⋈edges join + one distinct
    + one anti-join regardless of landmark count — the PageRank
    iteration class. Frontier/visited frames localCheckpoint per round
    (cross-iteration lineage, the iterative-operator rule). Depth is
    bounded like the recursive-CTE reachability twin; co-occurrence
    graphs have tiny diameters, so small depths saturate."""
    spark = edges.sparkSession
    if not materialized:
        edges = edges.localCheckpoint(eager=True)
    dist = spark.createDataFrame(
        [(s, s, 0) for s in seeds], "landmark long, node long, dist int"
    ).localCheckpoint(eager=True)
    frontier = dist
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges[src])
            .select("landmark", edges[dst].alias("node"))
            .distinct()
            .join(dist.select("landmark", "node"), ["landmark", "node"], "left_anti")
            .withColumn("dist", F.lit(d).cast("int"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return dist.orderBy("landmark", "node")
