"""Distributed connected components: alternating large-star/small-star.

The label-propagation loop k2c used in round 1 converges in
O(graph diameter) rounds - fine for near-dup families (pairs/triples),
pathological for adversarial graphs (a 1M-node path = 1M rounds). The
alternating algorithm of Kiveris et al., "Connected Components in
MapReduce and Beyond" (SOCC'14), converges in O(log n) rounds on ANY
graph, with every round a plain join+groupBy plan - the web-scale CC
shape GraphX/GraphFrames use. No driver-side data beyond the O(1)
fixpoint check.

- large-star(u): connect every strictly-larger neighbor of u to
  m(u) = min(N(u) ∪ {u}).
- small-star(u): connect every strictly-smaller neighbor of u, and u
  itself, to m(u) = min(smaller-neighbors ∪ {u}).

At the fixpoint every node points directly at its component minimum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirected(e: DataFrame) -> DataFrame:
    return e.select("x", "y").union(
        e.select(F.col("y").alias("x"), F.col("x").alias("y"))
    )


def _large_star(e: DataFrame) -> DataFrame:
    und = _undirected(e)
    m = und.groupBy("x").agg(F.min("y").alias("mn"))
    m = m.select("x", F.least("mn", "x").alias("m"))
    # No distinct here: duplicate edges don't change small-star's
    # min-aggregates, and the round ends with one distinct anyway -
    # one less shuffle per round.
    return (
        und.filter(F.col("y") > F.col("x"))
        .join(m, "x")
        .select(F.col("y").alias("x"), F.col("m").alias("y"))
        .filter(F.col("x") != F.col("y"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    und = _undirected(e)
    smaller = und.filter(F.col("y") < F.col("x"))
    m = smaller.groupBy("x").agg(F.min("y").alias("m"))
    return (
        smaller.join(m, "x")
        .select(F.col("y").alias("x"), F.col("m").alias("y"))
        .union(m.select(F.col("x"), F.col("m").alias("y")))
        .filter(F.col("x") != F.col("y"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame, a: str = "doc_a", b: str = "doc_b",
    max_rounds: int = 40, n_partitions: int = 8,
) -> tuple[DataFrame, int]:
    """Component label (= min reachable node id) for every node of the
    undirected pair graph. Returns (labels, rounds_used); labels has
    columns (node, cluster_id).

    Each round is two fully distributed join+min-aggregate plans; the
    only driver-side step is the O(1) has-anything-changed check.
    """
    # Iterative DataFrame algorithms MUST truncate lineage each round:
    # every round references the previous edge set ~6 times (two star
    # transforms, each a union+join), so without truncation the logical
    # plan grows 6^rounds nodes and Catalyst analysis goes exponential.
    # localCheckpoint(eager) materializes the round and restarts the
    # plan from a leaf (on a cluster, a checkpoint dir does the same
    # with fault tolerance).
    #
    # Per-round configs, restored on exit: whole-stage codegen OFF
    # (every round has fresh expr-ids -> janino recompiles the same
    # join+agg pipeline each time, ~3x the round cost at small scale)
    # and the loop's own shuffle-partition count (a vanilla driver
    # session defaults to 200 -> hundreds of empty tasks per round).
    spark = pairs.sparkSession
    old_wscg = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_partitions))
    try:
        return _cc_loop(pairs, a, b, max_rounds, n_partitions)
    finally:
        spark.conf.set("spark.sql.codegen.wholeStage", old_wscg)
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)


def _cc_loop(
    pairs: DataFrame, a: str, b: str, max_rounds: int, n_partitions: int
) -> tuple[DataFrame, int]:
    edges = (
        pairs.select(F.col(a).alias("x"), F.col(b).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .repartition(n_partitions)
        .localCheckpoint(eager=True)
    )
    nodes = _undirected(edges).select(F.col("x").alias("node")).distinct()

    def _sig(e: DataFrame) -> tuple:
        # O(1)-driver convergence signature: the star transforms emit
        # distinct edge sets, so (count, bit_xor of xxhash64(x,y))
        # equality across rounds means set equality (2^-64 collision
        # odds; xor is order-insensitive and cannot overflow under
        # ANSI) - one tiny agg job instead of two exceptAll jobs.
        r = e.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(x, y))").alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    sig = _sig(edges)
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        new_edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        new_sig = _sig(new_edges)
        edges = new_edges
        if new_sig == sig:
            break
        sig = new_sig

    # Fixpoint edges are (node -> component min); roots have no
    # outgoing edge and label themselves.
    labels = (
        nodes.join(edges, nodes.node == edges.x, "left")
        .groupBy("node")
        .agg(F.min(F.coalesce("y", "node")).alias("cluster_id"))
    )
    return labels, rounds


# ---------------------------------------------------------------------------
# PageRank (fixed-iteration, integer-exact)
# ---------------------------------------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402

from cassandra_elasticsearch_sync_spark.catalog import load_table  # noqa: E402
from cassandra_elasticsearch_sync_spark.registry import register  # noqa: E402

_PR_SCALE = 1 << 40  # 2^40 fixed-point scale; see pipeline/parity notes
_PR_ROUNDS = 5


def _pagerank_oracle() -> str:
    """Unrolled 5-iteration PageRank in pure integer arithmetic.

    Every quantity is a scaled bigint (rank * 2^40) and every step is
    integer division / multiplication / sum - exact and
    order-independent in both engines, so the hash compare is safe
    despite PageRank being a float algorithm everywhere else.
    Dangling-node mass is dropped (the damping term keeps ranks
    positive), a documented variant choice applied identically on
    both sides.
    """
    head = f"""
WITH edges AS (
  SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
params AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT node, CAST({_PR_SCALE} // n AS BIGINT) AS r
       FROM nodes CROSS JOIN params)"""
    its = []
    for i in range(1, _PR_ROUNDS + 1):
        its.append(f""",
it{i} AS (
  SELECT nd.node,
         CAST((15 * ({_PR_SCALE} // p.n)
               + 85 * COALESCE(SUM(prev.r // d.outdeg), 0)) // 100
              AS BIGINT) AS r
  FROM nodes nd
  CROSS JOIN params p
  LEFT JOIN edges e ON e.dst = nd.node
  LEFT JOIN {'r0' if i == 1 else f'it{i - 1}'} prev ON prev.node = e.src
  LEFT JOIN deg d ON d.src = e.src
  GROUP BY nd.node, p.n
)""")
    tail = f"""
SELECT node, ROUND(CAST(r AS DOUBLE) / {float(_PR_SCALE)!r}, 6) AS pagerank
FROM it{_PR_ROUNDS}
"""
    return head + "".join(its) + tail


@register("k2f_nation_pagerank", "K2", _pagerank_oracle(),
          "PageRank (d=0.85, 5 synchronous iterations) over the "
          "nation-level trade graph (distinct customer-nation -> "
          "supplier-nation edges derived from the order/lineitem "
          "fact join). The iterative-graph-algorithm shape on a "
          "DataFrame engine: each round is join(edges, rank) -> "
          "integer per-edge contribution -> hash groupBy sum -> "
          "damped update; at 100 TB the edge list is the data-sized "
          "side and every round shuffles only on node keys (same "
          "plan family as the large-star/small-star CC above). "
          "Cross-engine exactness: ranks are 2^40-scaled bigints and "
          "every operation is integer mul/div/sum (order-independent, "
          "overflow-free: 85 * 2^40 << 2^63), so a float algorithm "
          "becomes hash-comparable; the unrolled-CTE oracle applies "
          "identical arithmetic. Unlike the CC loop, no per-round "
          "localCheckpoint is needed: rank is referenced once per "
          "round, so the plan grows linearly over a FIXED 5 rounds "
          "rather than exponentially to a data-dependent fixpoint.")
def k2f_nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .select(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .distinct()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    params = nodes.agg(F.count("*").alias("n"))

    rank = nodes.crossJoin(params).select(
        "node", F.expr(f"CAST({_PR_SCALE} div n AS BIGINT)").alias("r")
    )
    for _ in range(_PR_ROUNDS):
        contrib = (
            edges.join(rank, edges.src == rank.node)
            .join(deg, "src")
            .select(F.col("dst"), F.expr("r div outdeg").alias("contrib"))
        )
        summed = contrib.groupBy("dst").agg(F.sum("contrib").alias("s"))
        rank = (
            nodes.join(summed, nodes.node == summed.dst, "left")
            .crossJoin(params)
            .select(
                "node",
                F.expr(
                    f"CAST((15 * ({_PR_SCALE} div n) + 85 * COALESCE(s, 0))"
                    " div 100 AS BIGINT)"
                ).alias("r"),
            )
        )
    return rank.select(
        "node",
        F.round(F.col("r").cast("double") / float(_PR_SCALE), 6).alias("pagerank"),
    )


# ---------------------------------------------------------------------------
# K2g: triangle counting on the co-supply graph
# ---------------------------------------------------------------------------

_K2G_ORACLE = """
WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
e AS (
  SELECT DISTINCT a.s AS u, b.s AS v
  FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
),
nodes AS (SELECT COUNT(DISTINCT s) AS n_nodes FROM ps),
edges AS (SELECT COUNT(*) AS n_edges FROM e),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM e e1
  JOIN e e2 ON e1.v = e2.u
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT n_nodes, n_edges, n_triangles FROM nodes, edges, tri
"""


@register("k2g_triangle_count", "K2", _K2G_ORACLE,
          "Triangle count on the supplier co-supply graph (edge = two "
          "suppliers shipped the same part). Edges are oriented "
          "low-id -> high-id so each triangle {a<b<c} is counted "
          "exactly once by the wedge join (a-b)x(b-c) closed by "
          "(a-c) - the standard distributed formulation: two "
          "equi-joins on node keys, no enumeration of neighborhoods "
          "in driver memory. The graph-density screen for entity- "
          "resolution blocking. Production refinement at web scale: "
          "orient by (degree, id) instead of id so every wedge list "
          "is bounded by sqrt(|E|) even under power-law skew - same "
          "joins, different orientation predicate.")
def k2g_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")).distinct()
    a, b = ps.alias("a"), ps.alias("b")
    e = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .distinct()
    )
    nodes = ps.agg(F.countDistinct("s").alias("n_nodes"))
    edges = e.agg(F.count("*").alias("n_edges"))
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(e3, (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")))
        .agg(F.count("*").alias("n_triangles"))
    )
    return nodes.crossJoin(edges).crossJoin(tri)


# ---------------------------------------------------------------------------
# K2h: degree-oriented triangle counting (the adversarial-skew-proof form)
# ---------------------------------------------------------------------------

_K2H_ORACLE = """
WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
e AS (
  SELECT DISTINCT a.s AS u, b.s AS v
  FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
),
deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
  GROUP BY 1
),
o AS (
  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
              THEN e.u ELSE e.v END AS src,
         CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
              THEN e.v ELSE e.u END AS dst
  FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM o e1
  JOIN o e2 ON e1.dst = e2.src
  JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
od AS (SELECT MAX(c) AS max_outdeg
       FROM (SELECT src, COUNT(*) AS c FROM o GROUP BY 1))
SELECT n_triangles, max_outdeg FROM tri, od
"""


@register("k2h_triangle_degree_oriented", "K2", _K2H_ORACLE,
          "Degree-oriented triangle counting (Cohen / Suri-Vassilvitskii "
          "MR-style): orient each undirected edge from the lower-(degree, "
          "id) endpoint to the higher, then close wedges with the same "
          "two equi-joins as k2g. The orientation is acyclic and total, "
          "so every triangle is counted exactly once AND every wedge "
          "list is anchored at its lowest-degree corner - out-degrees "
          "are bounded by O(sqrt(|E|)) even on power-law graphs, which "
          "is what keeps the wedge join from exploding on a celebrity "
          "node at 100 TB (id-orientation, k2g, has no such bound: a "
          "low-id hub owns every wedge). max_outdeg is reported so the "
          "bound is visible in the output; the count is orientation- "
          "invariant and must equal k2g's. Degrees come from one "
          "groupBy over the symmetrized edge list; the two degree "
          "lookups are broadcast joins (|V| << |E|).")
def k2h_triangle_degree_oriented(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")).distinct()
    a, b = ps.alias("a"), ps.alias("b")
    e = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    lower = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = (
        e.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            F.when(lower, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )
    e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(e3, (F.col("e3.src") == F.col("e1.src")) & (F.col("e3.dst") == F.col("e2.dst")))
        .agg(F.count("*").alias("n_triangles"))
    )
    od = (
        o.groupBy("src").agg(F.count("*").alias("c"))
        .agg(F.max("c").alias("max_outdeg"))
    )
    return tri.crossJoin(od)


_BFS_DEPTH = 12

_K2I_ORACLE = f"""
WITH RECURSIVE
n AS (SELECT COUNT(*) AS m FROM supplier),
e AS (
  SELECT (s_suppkey - 1) AS src,
         ((2 * (s_suppkey - 1) + 1) % m) AS dst
  FROM supplier, n
  UNION ALL
  SELECT (s_suppkey - 1) AS src,
         ((3 * (s_suppkey - 1) + 2) % m) AS dst
  FROM supplier, n
),
bfs AS (
  SELECT CAST(0 AS BIGINT) AS node, 0 AS dist
  UNION
  SELECT e.dst AS node, b.dist + 1 AS dist
  FROM bfs b JOIN e ON e.src = b.node
  WHERE b.dist < {_BFS_DEPTH}
)
SELECT node, CAST(MIN(dist) AS INT) AS hops
FROM bfs GROUP BY node
"""


@register("k2i_bfs_shortest_hops", "K2+C1", _K2I_ORACLE,
          "Single-source BFS shortest-hop distances over a "
          "deterministic sparse functional graph (each supplier "
          "node v has out-edges to (2v+1) mod m and (3v+2) mod m - "
          "a doubling-map expander, so levels are nontrivial), "
          "capped at 12 hops on BOTH engines. The oracle is "
          "DuckDB's recursive CTE with UNION-dedup; the Spark side "
          "is the canonical distributed-BFS frontier loop: each "
          "round joins the frontier against the edge list, anti-"
          "joins out already-visited nodes, and min-reduces "
          "duplicate arrivals - every round is one hash equi-join "
          "+ one aggregate shuffled on the node key, and the "
          "frontier is localCheckpointed so the plan stays "
          "round-sized instead of compounding (the CC-loop "
          "lesson). At 100 TB the edge list is the data-sized "
          "side; visited/frontier are node-sized, and 'rounds = "
          "hop cap' bounds total work to depth x one-shuffle - "
          "the Pregel-on-DataFrames shape.")
def k2i_bfs_shortest_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_elasticsearch_sync_spark.catalog import load_table

    s = load_table(spark, sf_dir, "supplier")
    m = s.agg(F.count("*").alias("m"))
    v = F.col("s_suppkey") - 1
    base = s.crossJoin(F.broadcast(m))
    edges = (
        base.select(v.alias("src"), ((2 * v + 1) % F.col("m")).alias("dst"))
        .unionAll(
            base.select(v.alias("src"),
                        ((3 * v + 2) % F.col("m")).alias("dst")))
    ).localCheckpoint(eager=False)

    visited = spark.range(1).select(
        F.lit(0).cast("bigint").alias("node"), F.lit(0).alias("dist"))
    frontier = visited
    for _ in range(_BFS_DEPTH):
        arrivals = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"),
                    (F.col("dist") + 1).alias("dist"))
            .groupBy("node").agg(F.min("dist").alias("dist"))
        )
        frontier = (
            arrivals.join(visited.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        visited = visited.unionAll(frontier).localCheckpoint(eager=True)
    return visited.select("node", F.col("dist").cast("int").alias("hops"))
