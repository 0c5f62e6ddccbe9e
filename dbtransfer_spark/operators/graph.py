"""Graph operators over relational edge sets (SURVEY.md §2.10 extensions).

Edges come from one dedup-aggregate over the fact table; every iteration
is an edge-keyed shuffle that EXTENDS the logical plan (the same
discipline as dedup.connected_components' label propagation and
kmeans_lloyd's rounds — state never round-trips through the driver).
Ranks are fixed-point integers so the DuckDB oracles replay exact
integer traces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbtransfer_spark.catalog import load_table
from dbtransfer_spark.operators.iterative import cut_lineage, free_local_checkpoint
from dbtransfer_spark.operators.shared_frames import (
    copurchase_edges,
    copurchase_pairs,
    part_supplier_edges,
)

QUERIES = {}
ORACLE = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


@register(
    "pagerank_bipartite",
    """
    WITH edges AS (
      SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
    ),
    sdeg AS (SELECT s, count(*) AS deg_s FROM edges GROUP BY s),
    pdeg AS (SELECT p, count(*) AS deg_p FROM edges GROUP BY p),
    ns AS (SELECT count(*) AS n_s FROM sdeg),
    r0 AS (
      SELECT s, CAST(1000000000000 AS BIGINT) // n_s AS r FROM sdeg, ns
    ),
    part_rank AS (
      SELECT e.p, CAST(sum(r0.r // sdeg.deg_s) AS BIGINT) AS pr
      FROM edges e JOIN r0 ON e.s = r0.s JOIN sdeg ON e.s = sdeg.s
      GROUP BY e.p
    ),
    r1 AS (
      SELECT e.s,
             CAST((CAST(150000000000 AS BIGINT) // n_s)
             + (85 * sum(part_rank.pr // pdeg.deg_p)) // 100
               AS BIGINT) AS rank_e12
      FROM edges e
      JOIN part_rank ON e.p = part_rank.p
      JOIN pdeg ON e.p = pdeg.p
      CROSS JOIN ns
      GROUP BY e.s, n_s
    )
    SELECT s AS s_suppkey, rank_e12 FROM r1
    ORDER BY rank_e12 DESC, s_suppkey
    """,
)
def pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One damped PageRank round over the part↔supplier bipartite graph
    (supplier rank → parts → back to suppliers, d=0.85) — the
    graph-centrality family beside connected components (dedup_clusters)
    and Lloyd iterations (kmeans): iterate by EXTENDING the plan, one
    edge-keyed shuffle per hop, never a driver round-trip.

    Numeric determinism the kmeans way: ranks are FIXED-POINT integers
    (1e12 scale) and every division is integer division, so shuffle
    order and engine rounding rules cannot move a digit — the oracle
    replays the exact integer trace.

    Scale: |edges| = distinct (part, supplier) pairs from one
    dedup-aggregate over the fact table; each hop is a partial-
    aggregated shuffle keyed on the receiving vertex; degrees join in
    via stats-gated broadcasts. More rounds = more of the same plan
    (O(diameter) like label propagation); state never touches the
    driver. The edge frame comes from the session-shared persisted
    cache (shared_frames.part_supplier_edges, r12): it feeds BOTH
    degree passes and BOTH rank hops, so without the persist the
    fact-table scan+distinct re-ran once per consumer — the sf1 sweep
    charged this query ~4 rebuilds of its dominant shuffle."""
    from dbtransfer_spark.queries import broadcast_if_small

    edges = part_supplier_edges(spark, sf_dir)
    sdeg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("deg_s"))
    pdeg = edges.groupBy("p").agg(F.count(F.lit(1)).alias("deg_p"))
    ns = sdeg.agg(F.count(F.lit(1)).alias("n_s"))
    r0 = sdeg.crossJoin(F.broadcast(ns)).select(
        "s", "deg_s", F.expr("CAST(1000000000000 AS BIGINT) div n_s").alias("r")
    )
    part_rank = (
        edges.join(broadcast_if_small(r0), "s")
        .groupBy("p")
        .agg(F.sum(F.expr("r div deg_s")).alias("pr"))
    )
    r1 = (
        edges.join(broadcast_if_small(part_rank), "p")
        .join(broadcast_if_small(pdeg), "p")
        .crossJoin(F.broadcast(ns))
        .groupBy("s", "n_s")
        .agg(F.sum(F.expr("pr div deg_p")).alias("acc"))
        .select(
            F.col("s").alias("s_suppkey"),
            (
                F.expr("CAST(150000000000 AS BIGINT) div n_s")
                + F.expr("(85 * acc) div 100")
            ).alias("rank_e12"),
        )
    )
    return r1.orderBy(F.desc("rank_e12"), "s_suppkey")


@register(
    "copurchase_triangles",
    """
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs
      ) GROUP BY node
    ), oriented AS (
      -- orient each edge from the lower-(degree, id) endpoint: every
      -- triangle is then counted exactly once, and out-degrees are
      -- O(sqrt(m))-bounded
      SELECT CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.u ELSE p.v END AS s,
             CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.v ELSE p.u END AS t
      FROM pairs p
      JOIN deg du ON du.node = p.u
      JOIN deg dv ON dv.node = p.v
    ), wedges AS (
      SELECT e1.s AS a, e1.t AS b, e2.t AS c
      FROM oriented e1 JOIN oriented e2 ON e1.t = e2.s
    )
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_edges,
           CAST(count(*) AS BIGINT) AS n_triangles
    FROM wedges w
    WHERE EXISTS (SELECT 1 FROM oriented o WHERE o.s = w.a AND o.t = w.c)
    """,
)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count over the part co-purchase graph (edge =
    two parts in the same order) — the clustering-structure probe
    behind recommendation/community features.

    Algorithm (the distributed-join classic): ORIENT every edge from
    its lower-(degree, id) endpoint, enumerate wedges by joining
    oriented edges on the middle vertex, close each wedge with a
    semi-join back to the oriented edge set. Orientation is the scale
    guarantee: out-degrees are O(√m)-bounded, so wedge volume is
    O(m^1.5) TOTAL regardless of hub skew — a popular part with a
    million co-purchases contributes almost no wedges because nearly
    all its edges point INTO it. Every join is an equi-join; degree is
    one partial-aggregated pass. (deg, id) tie-break makes the
    orientation — and the count — deterministic.

    The edge build dedups the per-order pair explosion immediately
    (DISTINCT before any graph work), so the only quadratic-ish step
    is per-order C(items,2), bounded by order size; pair generation is
    the session-shared co-purchase edge frame (r12 — one persisted
    build serves the whole graph/basket family; identical multiset to
    the old per-query _basket_pair_explode().distinct()). Degree
    decoration broadcasts deg for the orientation joins through the
    STATS GATE (r12 ADVICE — |V| is the part dimension, which still
    scales linearly with SF; an unconditional broadcast would OOM the
    driver at the 100-TB design point, so broadcast_if_small falls back
    to a shuffled join when deg outgrows the threshold). The query-local
    deg/oriented persists are released before returning: the result is
    a single row, so it is materialized eagerly and returned as a
    literal frame — never-unpersist lifetime is reserved for
    shared_frames-owned frames. The REAL plan shapes (shuffle-hash
    adjacency joins, stats-gated degree broadcasts) are therefore
    invisible to a plan audit of the public query; they are pinned
    instead by plan tests over ``_copurchase_triangles_plan``."""
    result, query_locals = _copurchase_triangles_plan(spark, sf_dir)
    try:
        # 1-row bounded collect: materialize while deg/oriented are hot,
        # then free both caches — the returned literal frame carries no
        # dependency on them
        rows = result.collect()
    finally:
        for f in query_locals:
            f.unpersist()
    return spark.createDataFrame(rows, result.schema)


def _copurchase_triangles_plan(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[DataFrame]]:
    """Lazy triangle-count plan plus the query-local persisted frames the
    caller must release once the result is materialized. Split from the
    public query so the physical shapes stay auditable."""
    from dbtransfer_spark.queries import broadcast_if_small
    pairs = copurchase_pairs(spark, sf_dir)
    deg = (
        pairs.selectExpr("u AS node")
        .unionAll(pairs.selectExpr("v AS node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        .persist()  # two broadcast builds + the n_nodes count
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        pairs.join(broadcast_if_small(du), "u")
        .join(broadcast_if_small(dv), "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
        .persist()  # wedge join uses it twice + the closing semi-join
    )
    # Close triangles by ADJACENCY INTERSECTION, not a wedge semi-join:
    # n_triangles = Σ_edges |N⁺(s) ∩ N⁺(t)| over the oriented graph —
    # the same once-per-triangle count (the orientation is acyclic; the
    # triangle's minimum vertex owns both out-edges), but the wedge set
    # is never MATERIALIZED or shuffled. The r8 sf1 profile showed the
    # semi-join shuffling 492M wedge rows on (a,c) for 76 s; here the
    # shuffle is two edge⋈adjacency equi-joins (|E| rows carrying
    # degree-bounded arrays) and the O(Σ d⁺(s)·d⁺(t)) intersection work
    # happens in-array inside the map stage. Same O(m^1.5) compute
    # bound via the orientation; ~1/20th the shuffle bytes.
    # r14: persist — adj feeds BOTH sides of the closing join and Spark
    # does not ReuseExchange across the two branches (verified on the
    # formatted plan: 0 ReusedExchange, the exchange + collect_list ran
    # twice). One build instead of two saves an exchange of the 12M-row
    # oriented frame plus a collect_list pass; storage is |V| rows whose
    # array payload sums to exactly |E| entries — the same memory class
    # as the (already persisted) oriented frame. Query-local: released
    # with deg/oriented after the 1-row result materializes.
    adj = (
        oriented.groupBy("s")
        .agg(F.sort_array(F.collect_list("t")).alias("nbrs"))
        .persist()
    )
    # SHUFFLE_HASH on the adjacency side (r12): the default SMJ sorts
    # the 12M-row edge frame twice just to attach degree-bounded arrays
    # — measured 15.6 s vs 6.7-7.4 s hashed at sf1. The build side is
    # the adjacency frame, whose per-partition size is m/P with
    # orientation-bounded rows per key (no hub can concentrate a
    # partition), so the hash map is the same memory class as the SMJ
    # sort buffer at any scale.
    per_edge = (
        oriented.join(
            adj.select(F.col("s").alias("u"), F.col("nbrs").alias("n_s")).hint(
                "shuffle_hash"
            ),
            F.col("s") == F.col("u"),
        )
        .join(
            adj.select(F.col("s").alias("w"), F.col("nbrs").alias("n_t")).hint(
                "shuffle_hash"
            ),
            F.col("t") == F.col("w"),
            "left",  # a sink vertex has no out-adjacency row
        )
        .select(
            F.when(
                F.col("n_t").isNull(), F.lit(0)
            )
            .otherwise(F.size(F.array_intersect("n_s", "n_t")))
            .alias("k")
        )
    )
    counts = per_edge.agg(F.sum("k").cast("bigint").alias("n_triangles"))
    n_nodes = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    n_edges = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    result = (
        n_nodes.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(counts))
        .select("n_nodes", "n_edges", "n_triangles")
    )
    return result, [deg, oriented, adj]


@register(
    "part_hierarchy_rollup",
    """
    WITH anc AS (
      SELECT p_partkey >> d AS ancestor,
             d AS depth,
             CAST(round(p_retailprice * 100) AS BIGINT) AS cents
      FROM part, UNNEST([0, 1, 2, 3, 4]) AS t(d)
      WHERE p_partkey >> d >= 1
    )
    SELECT CAST(ancestor AS BIGINT) AS ancestor,
           CAST(count(*) AS BIGINT) AS n_desc,
           CAST(sum(cents) AS BIGINT) AS subtree_cents,
           CAST(max(depth) AS BIGINT) AS max_depth
    FROM anc GROUP BY ancestor
    ORDER BY ancestor
    """,
)
def part_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtree rollup — the category-tree aggregation every
    catalog/BOM pipeline needs (total value and member count of each
    node's subtree, depth-capped). The hierarchy is the implicit binary
    tree parent(k) = k >> 1, so a node's ancestors within 4 levels are
    CLOSED-FORM (k >> d, d in 0..4): the rollup is a narrow 5x explode
    at the scan followed by ONE ancestor-keyed partial-aggregated
    shuffle — no iterative joins, no recursion, no driver loop. The
    same explode-ancestor-path pattern rolls up any hierarchy whose
    ancestor chain is materializable per row (path columns, closure
    tables); compare dedup_clusters for the iterative fixpoint shape
    Spark needs when it isn't.

    Scale: fanout is a constant 5x regardless of SF; the aggregate is
    map-side combined on ancestor (near-sequential BIGINT keys, no
    skew). The oracle replays the identical integer arithmetic."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            F.explode(F.array(*[F.lit(d) for d in range(5)])).alias("depth"),
            F.expr("p_partkey").alias("k"),
            F.expr("CAST(round(p_retailprice * 100) AS BIGINT)").alias("cents"),
        )
        .select(
            F.expr("shiftright(k, depth)").alias("ancestor"),
            "depth",
            "cents",
        )
        .filter(F.col("ancestor") >= 1)
        .groupBy("ancestor")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_desc"),
            F.sum("cents").cast("bigint").alias("subtree_cents"),
            F.max("depth").cast("bigint").alias("max_depth"),
        )
        .orderBy("ancestor")
    )


@register(
    "khop_reach",
    """
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    sym AS (
      SELECT u AS s, v AS t FROM pairs
      UNION ALL SELECT v AS s, u AS t FROM pairs
    ),
    seeds AS (SELECT DISTINCT s AS seed FROM sym ORDER BY seed LIMIT 20),
    h1 AS (
      SELECT DISTINCT seeds.seed, sym.t AS n
      FROM seeds JOIN sym ON sym.s = seeds.seed
    ),
    h2 AS (
      SELECT DISTINCT h1.seed, sym.t AS n
      FROM h1 JOIN sym ON sym.s = h1.n
    ),
    reach2 AS (
      SELECT seed, n FROM h1 UNION SELECT seed, n FROM h2
    )
    SELECT a.seed,
           CAST(a.n_hop1 AS BIGINT) AS n_hop1,
           CAST(b.n_reach2 AS BIGINT) AS n_reach2
    FROM (SELECT seed, count(*) AS n_hop1 FROM h1 GROUP BY seed) a
    JOIN (SELECT seed, count(*) AS n_reach2 FROM reach2
          WHERE n <> seed GROUP BY seed) b USING (seed)
    ORDER BY a.seed
    """,
)
def khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source k-hop reachability (k = 2) over the part
    co-purchase graph — the neighborhood-size probe behind influence
    estimation, recommendation candidate pools, and fraud-ring radius
    checks. For the 20 lowest-id parts: distinct neighbors at hop 1 and
    distinct nodes within <= 2 hops (seed excluded).

    Algorithm = frontier BFS over BASKETS, never over a materialized
    edge list (r10 trim of the 27 s sf1 entry — the old plan built,
    deduped, and symmetrized the ENTIRE O(Σ C(basket,2)) co-purchase
    edge set just to probe it from 20 seeds): an edge exists iff two
    parts share an order, so "neighbors of the frontier" is exactly
    "parts in the frontier's orders". Each hop is therefore (1) probe
    the (order, part) incidence frame with the broadcast frontier to
    collect the frontier's ORDERS — deduped per seed so a hub order
    expands once, (2) expand those orders back through the incidence
    frame, (3) (seed, node) DISTINCT. Graph work done: one basket
    shuffle, total; everything past it is broadcast-probe map stages.
    t = n self-hits in the hop-2 expansion are already in h1 ⊆ reach2,
    so the union-distinct is unchanged (the edge-list form's s ≠ t
    filter is not needed).

    Scale: the incidence frame is the scan, not a square of it; probe
    broadcasts are bounded by |seeds| × degree (frontier) and
    |seeds| × orders-per-part (frontier orders) — fixed-20 seeds keep
    both dimension-sized. Seeds are a fixed-size sort-limit
    (TakeOrdered, no global sort). More hops = repeat the probe pair,
    O(diameter) stages, state never on the driver (the same
    iterate-by-extending-the-plan discipline as pagerank_bipartite and
    dedup_clusters' label propagation)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # (order, part) incidence, restricted to edge-bearing orders (≥2
    # distinct parts — a single-part order contributes no edges, so a
    # part qualifies as a node iff it appears here). ONE basket shuffle.
    parts = (
        li.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps"))
        .filter(F.size("ps") >= 2)
        .select(F.col("l_orderkey").alias("ok"), F.explode("ps").alias("p"))
        .persist()  # seed pick + one probe/expand pair per hop
    )
    seeds = parts.select(F.col("p").alias("seed")).distinct().orderBy("seed").limit(20)
    seed_orders = (
        parts.join(F.broadcast(seeds), parts.p == F.col("seed"))
        .select("seed", "ok")
        .distinct()
    )
    h1 = (
        parts.join(F.broadcast(seed_orders), "ok")
        .filter(F.col("p") != F.col("seed"))
        .select("seed", F.col("p").alias("n"))
        .distinct()
        .persist()  # hop-2 probe + union + hop-1 count
    )
    frontier_orders = (
        parts.join(F.broadcast(h1), parts.p == h1.n)
        .select("seed", "ok")
        .distinct()
    )
    h2 = (
        parts.join(F.broadcast(frontier_orders), "ok")
        .select("seed", F.col("p").alias("n"))
        .distinct()
    )
    reach2 = h1.union(h2).distinct()
    n1 = h1.groupBy("seed").agg(F.count(F.lit(1)).cast("bigint").alias("n_hop1"))
    n2 = (
        reach2.filter(F.col("n") != F.col("seed"))
        .groupBy("seed")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_reach2"))
    )
    return n1.join(n2, "seed").orderBy("seed")


@register(
    "link_prediction_common_neighbors",
    """
    WITH pairs AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY u, v
    ), adj AS (
      SELECT u AS src, v AS dst, w FROM pairs
      UNION ALL SELECT v, u, w FROM pairs
    ), ranked AS (
      SELECT src, dst, w,
             row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS r_out,
             row_number() OVER (PARTITION BY dst ORDER BY w DESC, src) AS r_in
      FROM adj
    ), sparse AS (
      SELECT src, dst, w FROM ranked WHERE r_out <= 32 AND r_in <= 32
    ), cand AS (
      SELECT s1.src AS a, s2.src AS c,
             CAST(count(*) AS BIGINT) AS n_common,
             CAST(sum(least(s1.w, s2.w)) AS BIGINT) AS w_sum
      FROM sparse s1 JOIN sparse s2
        ON s1.dst = s2.dst AND s1.src < s2.src
      GROUP BY a, c
    )
    SELECT a, c, n_common, w_sum FROM cand
    WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.u = cand.a AND p.v = cand.c)
    ORDER BY n_common DESC, w_sum DESC, a, c
    LIMIT 50
    """,
)
def link_prediction_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction over the part co-purchase graph,
    preceded by RECIPROCAL top-k sparsification — each node keeps only
    its 32 strongest neighbors (by co-purchase count, id tie-break) and
    an edge survives only if it ranks in BOTH endpoints' top-32. That
    double cap is the scale guarantee the raw wedge join lacks: out- AND
    in-degree are ≤ 32 by construction, so candidate volume is a hard
    n·k² bound regardless of hub skew — the same trick recsys kNN-graph
    builds use before neighborhood scoring, where an unsparsified hub
    would contribute deg² wedges. Non-adjacent pairs sharing surviving
    neighbors are scored by common-neighbor count plus the
    min-weight-sum tiebreak, anti-joined against the edge set, top-50
    deterministic.

    Plan: the weighted edge frame is the session-shared co-purchase
    build (r12 — one persisted build serves the whole graph/basket
    family; its sum-of-multiplicities weight is byte-identical to the
    old per-query _basket_pair_explode().groupBy().count(), which in
    turn reproduced the r7 self-join's cx·cy multiplicity exactly).
    Then two row_number windows over the SAME edge frame (one shuffle
    each on src/dst). Wedges are generated JOIN-FREE (r14 guide §2.4):
    the r7-r13 sparse⋈sparse self-join planned the whole two-window
    sparsification subtree TWICE (once per join side — the broadcast
    build side defeats ReuseExchange) and re-shuffled both copies by
    the wedge center; instead, sparse is grouped by dst — the dst
    window just established exactly that hashpartitioning, so the
    collect_list aggregate needs NO new exchange — into a ≤32-entry
    (src, w) neighbor array, and the a<c ordered pairs explode IN-ARRAY
    (the item_cf_cosine2_topk lambda-pair trick), a per-row transform
    with the identical pair multiset and least-weight as the join
    (src is unique per dst group, so filter(y.s > x.s) enumerates each
    unordered pair exactly once). One shuffle on (a, c) aggregates the
    wedges, a left-anti probe drops adjacent pairs; the 50-row limit is
    a TakeOrdered, no global sort."""
    pairs = copurchase_edges(spark, sf_dir).select("u", "v", "w")
    adj = pairs.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "w"
    ).unionByName(pairs.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w"))
    w_out = Window.partitionBy("src").orderBy(F.desc("w"), "dst")
    w_in = Window.partitionBy("dst").orderBy(F.desc("w"), "src")
    sparse = (
        adj.withColumn("r_out", F.row_number().over(w_out))
        .withColumn("r_in", F.row_number().over(w_in))
        .filter((F.col("r_out") <= 32) & (F.col("r_in") <= 32))
        .select("src", "dst", "w")
    )
    by_dst = sparse.groupBy("dst").agg(
        F.collect_list(F.struct(F.col("src").alias("s"), F.col("w").alias("w"))).alias(
            "nb"
        )
    )
    cand = (
        by_dst.select(
            F.explode(
                F.expr(
                    "flatten(transform(nb, x -> transform("
                    "filter(nb, y -> y.s > x.s), "
                    "y -> struct(x.s AS a, y.s AS c, least(x.w, y.w) AS lw))))"
                )
            ).alias("pr")
        )
        .select("pr.a", "pr.c", "pr.lw")
        .groupBy("a", "c")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            F.sum("lw").cast("bigint").alias("w_sum"),
        )
    )
    non_adjacent = cand.join(
        pairs.select(F.col("u").alias("a"), F.col("v").alias("c")),
        ["a", "c"],
        "left_anti",
    )
    return non_adjacent.orderBy(
        F.desc("n_common"), F.desc("w_sum"), "a", "c"
    ).limit(50)


@register(
    "degree_assortativity",
    """
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs
      ) GROUP BY node
    ), stubs AS (
      -- both orientations: Newman's assortativity sums over directed stubs
      SELECT du.d AS x, dv.d AS y
      FROM pairs p JOIN deg du ON du.node = p.u JOIN deg dv ON dv.node = p.v
      UNION ALL
      SELECT dv.d, du.d
      FROM pairs p JOIN deg du ON du.node = p.u JOIN deg dv ON dv.node = p.v
    ), s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x*x) AS DOUBLE) AS sxx, CAST(sum(y*y) AS DOUBLE) AS syy,
             CAST(sum(x*y) AS DOUBLE) AS sxy
      FROM stubs
    )
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_edges,
           (n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))
             AS assortativity
    FROM s
    """,
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph — Newman's r, the
    hub-mixing statistic that predicts whether skew mitigation is even
    needed downstream (disassortative graphs concentrate wedge volume
    on hub-leaf joins; assortative ones spread it). Computed as Pearson
    over directed degree stubs (each undirected edge contributes both
    orientations): degrees are exact BIGINTs from one partial-aggregated
    pass, the five moment sums accumulate exactly, and only the final
    closed form drops to correctly-rounded doubles — the same
    bit-stable discipline as correlation_matrix/spearman_rank_corr.

    Plan (r10 trim of the 27 s sf1 entry): the pair build is the
    session-shared co-purchase edge frame (r12 — identical multiset to
    the old per-query explode + DISTINCT); degree decoration broadcasts
    deg through the STATS GATE (r12 ADVICE, same as copurchase_triangles
    — |V| is the part dimension, which scales with SF, so the broadcast
    must fall back to a shuffled join past the threshold); and the stub
    union is folded algebraically into ONE pass over decorated edges:
    each undirected edge contributes both orientations, so over stubs
    n = 2·m, sx = sy = Σ(dx+dy), sxx = syy = Σ(dx²+dy²),
    sxy = 2·Σ(dx·dy) — identical BIGINT sums (bit-identical doubles),
    half the aggregate input, zero union. The 1-row result is
    materialized eagerly so the query-local deg cache is released before
    returning (only shared_frames own never-unpersist frames); the real
    plan shapes are pinned by plan tests over
    ``_degree_assortativity_plan``, since the public query returns a
    literal frame."""
    result, query_locals = _degree_assortativity_plan(spark, sf_dir)
    try:
        rows = result.collect()  # 1-row bounded collect
    finally:
        for f in query_locals:
            f.unpersist()
    return spark.createDataFrame(rows, result.schema)


def _degree_assortativity_plan(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[DataFrame]]:
    """Lazy assortativity plan plus the query-local persisted frames the
    caller must release once the result is materialized."""
    from dbtransfer_spark.queries import broadcast_if_small

    pairs = copurchase_pairs(spark, sf_dir)
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionByName(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        .persist()
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("dx"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dy"))
    decorated = pairs.join(broadcast_if_small(du), "u").join(
        broadcast_if_small(dv), "v"
    )
    s = decorated.agg(
        (F.count(F.lit(1)) * 2).cast("double").alias("n"),
        F.sum(F.col("dx") + F.col("dy")).cast("double").alias("sx"),
        F.sum(F.col("dx") + F.col("dy")).cast("double").alias("sy"),
        F.sum(F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy"))
        .cast("double")
        .alias("syy"),
        (F.sum(F.col("dx") * F.col("dy")) * 2).cast("double").alias("sxy"),
    )
    n_nodes = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    n_edges = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    result = (
        n_nodes.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(s))
        .select(
            "n_nodes",
            "n_edges",
            (
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (
                    F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                    * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
                )
            ).alias("assortativity"),
        )
    )
    return result, [deg]


def _kcore_oracle() -> str:
    # MATERIALIZED: every CTE is referenced by multiple UNION branches /
    # scalar subqueries; DuckDB would otherwise re-evaluate the whole
    # peel chain per reference (measured: minutes at sf1, seconds with
    # materialization)
    head = """
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), deg0 AS MATERIALIZED (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs
      ) GROUP BY node
    ), kth AS (
      SELECT CAST(sum(d) // count(*) + 1 AS BIGINT) AS k FROM deg0
    )"""
    body = []
    prev_edges, prev_deg = "pairs", "deg0"
    for r in (1, 2, 3):
        body.append(f"""
    keep{r} AS MATERIALIZED (
      SELECT node FROM {prev_deg}, kth WHERE d >= k
    ), e{r} AS MATERIALIZED (
      SELECT u, v FROM {prev_edges}
      WHERE u IN (SELECT node FROM keep{r})
        AND v IN (SELECT node FROM keep{r})
    ), deg{r} AS MATERIALIZED (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM e{r} UNION ALL SELECT v FROM e{r}
      ) GROUP BY node
    )""")
        prev_edges, prev_deg = f"e{r}", f"deg{r}"
    selects = ["""
    SELECT 0 AS round, CAST((SELECT count(*) FROM deg0) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_edges,
           (SELECT k FROM kth) AS k"""]
    for r in (1, 2, 3):
        selects.append(f"""
    SELECT {r}, CAST((SELECT count(*) FROM deg{r}) AS BIGINT),
           CAST((SELECT count(*) FROM e{r}) AS BIGINT),
           (SELECT k FROM kth)""")
    return head + "," + ",".join(body) + " UNION ALL ".join(selects) + " ORDER BY round"


@register("kcore_peel_rounds", _kcore_oracle())
def kcore_peel_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three rounds of k-core peeling on the co-purchase graph at
    k = mean degree + 1 — the dense-core extraction that separates the
    structurally-connected catalog from long-tail attachments before
    community detection or embedding propagation. Each round drops
    below-threshold nodes and their incident edges, then re-derives
    degrees; the shrinking (nodes, edges) trace per round is the
    classic core-decomposition convergence diagnostic. The threshold is
    2m/n + 1 — exact integer arithmetic from two counts, scale-free
    (a fixed literal k would pin to one SF's density).

    Plan: iteration by plan extension (the kmeans/markov/pagerank
    discipline) — each round is two semi-joins (endpoint membership)
    and one partial-aggregated degree pass, all equi-keyed on node ids;
    survivors shrink monotonically so later rounds cost less. The base
    edge set is the session-shared persisted co-purchase frame (r12 —
    identical multiset to the old per-query explode + DISTINCT; owned
    by shared_frames, so this query must not unpersist it); each round's
    degree frame is persisted too, because BOTH the round's stats row
    and the next round's keep-set consume it. Each round's edge frame
    is localCheckpoint-ed, not just persisted: the round derivation
    references edges twice (the u/v degree union) and keep twice (the
    two semi-joins), so the LOGICAL plan grows ~6× per round — persist
    caches data but Catalyst still re-analyzes the full lineage every
    action, and the r10 profile measured round-3 analysis at 17 s on an
    EMPTY frame. Checkpointing pins the plan depth constant per round
    (executor-local, still distributed; the standard iterative-Spark
    lineage cut; via ``iterative.cut_lineage``, which upgrades to a
    RELIABLE executor-loss-surviving checkpoint when the
    ``spark.dbtransfer.checkpointDir`` conf is set — r11 VERDICT #5).
    Nothing round-trips the driver. True k-core runs
    peels to fixpoint — O(peel-depth) rounds of exactly this plan.

    Storage hygiene (r10 ADVICE, closed r11): each round's 1-row stats
    frame is eagerly checkpointed, so the lazily-unioned output never
    reaches back into superseded round state — which lets the loop
    free the previous round's edge checkpoint and unpersist its degree
    frame as soon as the next round is materialized. Peak executor
    storage is one round's frames, O(1) in peel depth, matching the
    fixpoint claim above; see ``iterative.free_local_checkpoint`` for
    the localCheckpoint executor-loss trade.

    r14 (r13 ADVICE): the ≤4-row output is materialized eagerly and the
    kth + per-round stats CHECKPOINTS are freed before returning — on
    the reliable path those were durable files that outlived the
    application (the one leak left after r13's superseded-round
    cleanup). Same public-API laziness caveat as copurchase_triangles /
    degree_assortativity: the query executes fully at call time (it
    effectively already did — every round's cut_lineage is eager) and
    returns a literal frame; the real iterative plan stays auditable
    through ``_kcore_peel_rounds_plan``, pinned by the plan test."""
    result, checkpoints = _kcore_peel_rounds_plan(spark, sf_dir)
    try:
        rows = result.collect()  # ≤4-row bounded collect
    finally:
        for f in checkpoints:
            free_local_checkpoint(f)
    return spark.createDataFrame(rows, result.schema)


def _kcore_peel_rounds_plan(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[DataFrame]]:
    """Lazy k-core stats plan plus the checkpointed 1-row frames (kth +
    per-round stats) the caller must free once the output is
    materialized — see ``kcore_peel_rounds`` for the full contract."""
    pairs = copurchase_pairs(spark, sf_dir)

    def degrees(edges: DataFrame) -> DataFrame:
        return (
            edges.select(F.col("u").alias("node"))
            .unionByName(edges.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        )

    deg0 = degrees(pairs).persist()
    # 1-row, eager: every round's keep-set and stats row reference k, so
    # it must survive deg0/pairs being released after round 1.
    kth = cut_lineage(
        deg0.agg(F.expr("CAST(sum(d) div count(*) + 1 AS BIGINT)").alias("k")),
        eager=True,
    )
    checkpoints = [kth]  # freed by the caller after materialization

    def stats(round_no: int, edges: DataFrame, deg: DataFrame) -> DataFrame:
        nn = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        ne = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
        return (
            nn.crossJoin(F.broadcast(ne))
            .crossJoin(F.broadcast(kth))
            .select(
                F.lit(round_no).cast("bigint").alias("round"),
                "n_nodes",
                "n_edges",
                "k",
            )
        )

    out = cut_lineage(stats(0, pairs, deg0), eager=True)
    checkpoints.append(out)
    edges, deg = pairs, deg0
    for r in (1, 2, 3):
        keep = deg.join(F.broadcast(kth), F.col("d") >= F.col("k")).select("node")
        new_edges = cut_lineage(
            edges.join(keep.select(F.col("node").alias("u")), "u", "left_semi")
            .join(keep.select(F.col("node").alias("v")), "v", "left_semi")
            .select("u", "v"),
            eager=True,  # cut lineage: see docstring
        )
        new_deg = degrees(new_edges).persist()  # stats row + next round's keep
        # eager 1-row checkpoint materializes new_deg and pins the stats
        # row, so the superseded round's storage can go right now
        round_stats = cut_lineage(stats(r, new_edges, new_deg), eager=True)
        checkpoints.append(round_stats)
        out = out.unionByName(round_stats)
        if r > 1:  # round-1 base is the shared frame — cache-owned
            free_local_checkpoint(edges)
        deg.unpersist()
        edges, deg = new_edges, new_deg
    # every stats row is an eager 1-row checkpoint — nothing in `out`
    # reaches back into the final round's state, so free it too (r12
    # ADVICE: no query-local cache outlives its query)
    free_local_checkpoint(edges)
    deg.unpersist()
    return out.orderBy("round"), checkpoints
