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
