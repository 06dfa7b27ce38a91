"""Graph analytics over DataFrames: PageRank power iteration.

Web-scale corpus curation ranks crawl sources by link authority
(CommonCrawl publishes exactly this as its domain-level ranking); the
same primitive ranks any derived graph. Here the graph is the
event-type transition graph: an edge (A -> B) for every consecutive
pair of events by the same user, weighted by frequency.

The engine's iterative-algorithm pattern (shared with
llmdata/cluster.py k-means and llmdata/dedup.py connected components):
a driver loop over pure DataFrame steps, ``localCheckpoint`` per
iteration to truncate lineage. Each iteration is one hash-join of the
rank vector against the normalized edge list plus one aggregation —
shuffle O(edges), state O(nodes), the exact shape GraphX/Pregel
executes underneath. At 100 TB the edge list is the big side and
stays partitioned by src across iterations; the rank vector is the
small side and broadcasts.

Correctness: a fixed 10-iteration damped (0.85) power iteration,
value-oracled against the identical recurrence unrolled as chained
CTEs in DuckDB — no "iterative ops can't be oracled" cop-out.
Edge ordering uses event_id (engine-identical) rather than raw ts,
whose ns-vs-us parquet precision differs between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from game_data_etl_pipeline_spark.catalog import load_table
from game_data_etl_pipeline_spark.registry import register

_ITERS = 10
_DAMPING = 0.85


def _pagerank_oracle(iters: int) -> str:
    head = """
        WITH seq AS (
            SELECT user_id, event_type,
                   LEAD(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS next_type
            FROM events
        ),
        edges AS (
            SELECT event_type AS src, next_type AS dst, COUNT(*) AS w
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY 1, 2
        ),
        outw AS (SELECT src, SUM(w) AS tot FROM edges GROUP BY src),
        norm AS (
            SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / o.tot AS p
            FROM edges e JOIN outw o ON e.src = o.src
        ),
        nodes AS (SELECT DISTINCT event_type AS node FROM events),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    step = """,
        r{i} AS (
            SELECT nd.node,
                   0.15 / (SELECT n FROM nn)
                   + 0.85 * COALESCE(SUM(r.rank * m.p), 0) AS rank
            FROM nodes nd
            LEFT JOIN norm m ON m.dst = nd.node
            LEFT JOIN r{prev} r ON r.node = m.src
            GROUP BY nd.node
        )"""
    body = "".join(step.format(i=i, prev=i - 1) for i in range(1, iters + 1))
    return (
        head
        + body
        + f"""
        SELECT node AS event_type, ROUND(rank, 6) AS pagerank
        FROM r{iters}"""
    )


@register(
    "op_graph_pagerank",
    tags=("graph", "iterative"),
    oracle=_pagerank_oracle(_ITERS),
)
def op_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (10 fixed power iterations) over the event-type
    transition graph; see module docstring for the scale shape."""
    events = load_table(spark, sf_dir, "events")

    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = events.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    edges = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("next_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("tot"))
    norm = edges.join(outw, "src").select(
        "src", "dst", (F.col("w").cast("double") / F.col("tot")).alias("p")
    )
    # the edge list is the big, loop-invariant side: cache it so each
    # iteration rejoins the same materialized partitions
    norm = norm.localCheckpoint()

    nodes = events.select(F.col("event_type").alias("node")).distinct().localCheckpoint()
    n = nodes.count()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))

    for _ in range(_ITERS):
        contrib = (
            norm.join(F.broadcast(ranks), norm.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("inbound"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit((1.0 - _DAMPING) / n)
                    + F.lit(_DAMPING) * F.coalesce(F.col("inbound"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )

    return ranks.select(
        F.col("node").alias("event_type"), F.round("rank", 6).alias("pagerank")
    )


@register(
    "op_graph_triangles",
    tags=("graph", "join"),
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LEAD(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS next_type
            FROM events
        ),
        und AS (
            SELECT DISTINCT
                   LEAST(event_type, next_type) AS a,
                   GREATEST(event_type, next_type) AS b
            FROM seq
            WHERE next_type IS NOT NULL AND event_type <> next_type
        )
        SELECT e1.a AS n1, e1.b AS n2, e2.b AS n3
        FROM und e1
        JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def op_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration over the undirected event-type co-transition
    graph: canonicalize every edge to (min, max), then two equi-joins
    pick ordered triples a<b<c whose three edges all exist — each
    triangle is emitted exactly once, no orientation double-count.

    This is the standard distributed triangle shape (node-order
    orientation halves the edge list and bounds join fan-out by the
    smaller-degree endpoint); at web scale the same two hash joins
    run over a degree-ordered edge list partitioned by join key.
    Here the node set is the event-type vocabulary, so the result is
    small — the op pins the JOIN PATTERN, which is what transfers.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull() & (F.col("event_type") != F.col("next_type")))
    und = seq.select(
        F.least("event_type", "next_type").alias("a"),
        F.greatest("event_type", "next_type").alias("b"),
    ).distinct()
    e1 = und.alias("e1")
    e2 = und.alias("e2")
    e3 = und.alias("e3")
    return (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
        .select(F.col("e1.a").alias("n1"), F.col("e1.b").alias("n2"), F.col("e2.b").alias("n3"))
    )


@register(
    "op_graph_bfs",
    tags=("graph", "iterative"),
    oracle="""
        WITH RECURSIVE seq AS (
            SELECT user_id, event_type,
                   LEAD(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS next_type
            FROM events
        ),
        edges AS (
            SELECT DISTINCT event_type AS src, next_type AS dst
            FROM seq WHERE next_type IS NOT NULL AND event_type <> next_type
        ),
        walk AS (
            SELECT 'signup' AS node, 0 AS hops
            UNION
            SELECT e.dst, w.hops + 1
            FROM walk w JOIN edges e ON e.src = w.node
            WHERE w.hops < 8
        ),
        dist AS (SELECT node, MIN(hops) AS hops FROM walk GROUP BY node)
        SELECT n.event_type, CAST(COALESCE(d.hops, -1) AS INT) AS hops
        FROM (SELECT DISTINCT event_type FROM events) n
        LEFT JOIN dist d ON d.node = n.event_type
    """,
)
def op_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS (hop distance from 'signup') over the directed
    event-type transition graph, as a driver loop of frontier
    expansions: each iteration joins the current distance set against
    the edge list, keeps newly reached nodes, and unions them in.
    Unreachable nodes surface as hops = -1, not silently dropped.

    The iteration count is bounded by the graph diameter and each
    step is one hash join + one min-aggregate — the Pregel BFS shape.
    The frontier (small side) broadcasts; the edge list is the
    loop-invariant big side, checkpointed once. Value-oracled against
    a DuckDB recursive CTE computing the identical fixpoint — the
    iterative-op-with-full-oracle pattern shared with
    op_graph_pagerank.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull() & (F.col("event_type") != F.col("next_type")))
    edges = (
        seq.select(F.col("event_type").alias("src"), F.col("next_type").alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = events.select(F.col("event_type").alias("node")).distinct()

    dist = spark.createDataFrame([("signup", 0)], "node string, hops int")
    frontier = dist
    for _ in range(8):
        reached = (
            edges.join(F.broadcast(frontier), edges.src == frontier.node)
            .select(F.col("dst").alias("node"), (F.col("hops") + 1).alias("hops"))
            .join(dist.select(F.col("node").alias("seen")), F.col("node") == F.col("seen"), "left_anti")
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
            .localCheckpoint()
        )
        if reached.isEmpty():
            break
        dist = dist.unionByName(reached).localCheckpoint()
        frontier = reached

    return nodes.join(dist, "node", "left").select(
        F.col("node").alias("event_type"),
        F.coalesce(F.col("hops"), F.lit(-1)).cast("int").alias("hops"),
    )


@register(
    "op_graph_triangle_counts",
    tags=("graph",),
    oracle="""
        WITH dl AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pp AS (
            SELECT a.l_partkey AS p1, b.l_partkey AS p2
            FROM dl a JOIN dl b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        edges AS (SELECT p1, p2 FROM pp GROUP BY p1, p2 HAVING COUNT(*) >= 2),
        deg AS (
            SELECT node, COUNT(*) AS deg FROM (
                SELECT p1 AS node FROM edges UNION ALL SELECT p2 FROM edges
            ) GROUP BY node
        ),
        o AS (
            SELECT CASE WHEN (d1.deg, e.p1) < (d2.deg, e.p2) THEN e.p1 ELSE e.p2 END AS s,
                   CASE WHEN (d1.deg, e.p1) < (d2.deg, e.p2) THEN e.p2 ELSE e.p1 END AS t
            FROM edges e
            JOIN deg d1 ON d1.node = e.p1
            JOIN deg d2 ON d2.node = e.p2
        ),
        tri AS (
            SELECT o1.s AS a, o1.t AS b, o2.t AS c
            FROM o o1
            JOIN o o2 ON o1.s = o2.s AND o1.t <> o2.t
            JOIN o o3 ON o3.s = o1.t AND o3.t = o2.t
        )
        SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        )
        GROUP BY node
    """,
)
def op_graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the co-purchase graph (parts are
    nodes; an edge joins two parts co-purchased in >= 2 distinct
    orders) — the clustering-coefficient primitive behind community
    detection and recommendation-graph quality checks. Distinct from
    op_graph_triangles (which enumerates triples on the tiny
    event-type graph via node-order orientation): this one runs on
    a graph whose node set GROWS with the data, counts per node,
    and orients by DEGREE — the variant that survives skew.

    Scale shape — the MapReduce triangle-counting trick (Suri &
    Vassilvitskii; Cohen): orient every edge from its LOWER
    (degree, id) endpoint to its higher one. Orientation makes the
    out-degree of every node O(sqrt(m)) regardless of raw degree
    skew — the celebrity node that would explode a naive wedge join
    into deg^2 candidates enumerates no wedges at all; wedges only
    fan out from low-degree sources. Each triangle a<b<c (in the
    (deg,id) total order) is then produced EXACTLY once as wedge
    (a->b, a->c) closed by the oriented edge (b->c) — no distinct,
    no /3 correction, integer-exact. Edges build via the
    q_copurchase_lift basket pattern (per-order distinct sorted part
    arrays, pair fan-out bounded by basket size — never a row-level
    self-join of lineitem) and the oriented edge list materializes
    once for its three join roles. The support>=2 filter keeps the
    graph sparse at every SF (2.3k/3.4k/3.6k edges measured); all
    values are integers so the DuckDB oracle matches bit-exactly.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    )
    baskets = li.groupBy("ok").agg(F.sort_array(F.collect_set("pk")).alias("ps"))
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("ps"),
                lambda x, i: F.transform(
                    F.slice(F.col("ps"), i + 2, F.size("ps")),
                    lambda y: F.struct(x.alias("p1"), y.alias("p2")),
                ),
            )
        )
    )
    edges = (
        baskets.select(pair.alias("pr"))
        .select("pr.p1", "pr.p2")
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .drop("c")
    )
    deg = (
        edges.select(F.col("p1").alias("node"))
        .unionAll(edges.select(F.col("p2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    d1, d2 = deg.alias("d1"), deg.alias("d2")
    e = edges.join(d1, F.col("p1") == F.col("d1.node")).join(
        d2, F.col("p2") == F.col("d2.node")
    )
    lt = F.struct(F.col("d1.deg"), F.col("p1")) < F.struct(F.col("d2.deg"), F.col("p2"))
    o = e.select(
        F.when(lt, F.col("p1")).otherwise(F.col("p2")).alias("s"),
        F.when(lt, F.col("p2")).otherwise(F.col("p1")).alias("t"),
    ).localCheckpoint()
    o1, o2, o3 = o.alias("o1"), o.alias("o2"), o.alias("o3")
    tri = (
        o1.join(
            o2,
            (F.col("o1.s") == F.col("o2.s")) & (F.col("o1.t") != F.col("o2.t")),
        )
        .join(
            o3,
            (F.col("o3.s") == F.col("o1.t")) & (F.col("o3.t") == F.col("o2.t")),
        )
        .select(
            F.col("o1.s").alias("a"), F.col("o1.t").alias("b"), F.col("o2.t").alias("c")
        )
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
