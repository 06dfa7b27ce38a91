"""Behavioral / product analytics over the events stream.

The reference's analytics story ends at "query the SQLite tables"
(reference README.md:130-140); a game-telemetry pipeline's actual
read-side workload is behavioral: funnels, cohort retention, RFM
segmentation, path mining. Each op here is the Spark-native shape of
one of those, value-oracled against DuckDB.

Scale notes (100 TB of events): every op aggregates per user first —
the per-user intermediate is ~|users| rows, orders of magnitude
smaller than the event log — then analyzes the reduced table. All
shuffles are on user_id (one partitioning reused across stages; AQE
coalesces the tiny tails). Nothing here materializes per-event state
on the driver.

Event ordering uses event_id, the generator's arrival order, rather
than raw ts: parquet stores ts at ns which Spark truncates to us —
event_id is engine-identical and totally ordered, so sequential
semantics ("view AFTER signup") can't be flipped by a precision seam.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from game_data_etl_pipeline_spark.catalog import load_table
from game_data_etl_pipeline_spark.registry import register

_FUNNEL_STEPS = ("signup", "view", "click", "purchase")


@register(
    "op_funnel_steps",
    tags=("behavior", "agg"),
    oracle="""
        WITH s1 AS (
            SELECT user_id, MIN(event_id) AS eid FROM events
            WHERE event_type = 'signup' GROUP BY user_id
        ), s2 AS (
            SELECT e.user_id, MIN(e.event_id) AS eid FROM events e
            JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'view' AND e.event_id > s1.eid GROUP BY e.user_id
        ), s3 AS (
            SELECT e.user_id, MIN(e.event_id) AS eid FROM events e
            JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'click' AND e.event_id > s2.eid GROUP BY e.user_id
        ), s4 AS (
            SELECT e.user_id, MIN(e.event_id) AS eid FROM events e
            JOIN s3 ON e.user_id = s3.user_id
            WHERE e.event_type = 'purchase' AND e.event_id > s3.eid GROUP BY e.user_id
        ), steps AS (
            SELECT 1 AS step_idx, 'signup' AS step, COUNT(*) AS n_users FROM s1
            UNION ALL SELECT 2, 'view', COUNT(*) FROM s2
            UNION ALL SELECT 3, 'click', COUNT(*) FROM s3
            UNION ALL SELECT 4, 'purchase', COUNT(*) FROM s4
        )
        SELECT CAST(step_idx AS INT) AS step_idx, step,
               CAST(n_users AS BIGINT) AS n_users,
               ROUND(n_users * 100.0 / FIRST_VALUE(n_users) OVER (ORDER BY step_idx), 2) AS pct_of_first
        FROM steps
    """,
)
def op_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict sequential funnel (signup -> view -> click -> purchase):
    a user reaches step k only via an event of that type occurring
    AFTER their qualifying step-(k-1) event — the standard
    product-analytics funnel, not the weaker min-per-type ordering.

    Shape: four cascaded filtered aggregates. Stage k joins one
    event-type slice of the log against the previous stage's per-user
    row and takes min(event_id). Each stage's output is one row per
    surviving user, so at 100 TB the chain is 4 equi-joins whose right
    sides shrink monotonically (broadcastable after stage 1); the
    event log itself is scanned once per step with the type filter
    pushed to parquet.
    """
    events = load_table(spark, sf_dir, "events").select("user_id", "event_type", "event_id")

    def next_stage(prev: DataFrame, step: str) -> DataFrame:
        return (
            events.filter(F.col("event_type") == step)
            .join(prev.select("user_id", F.col("eid").alias("prev_eid")), "user_id")
            .filter(F.col("event_id") > F.col("prev_eid"))
            .groupBy("user_id")
            .agg(F.min("event_id").alias("eid"))
        )

    stages = [
        events.filter(F.col("event_type") == _FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("event_id").alias("eid"))
    ]
    for step in _FUNNEL_STEPS[1:]:
        stages.append(next_stage(stages[-1], step))

    counts = [
        s.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i + 1).alias("step_idx"), F.lit(name).alias("step"), "n_users"
        )
        for i, (name, s) in enumerate(zip(_FUNNEL_STEPS, stages))
    ]
    steps = reduce(DataFrame.unionByName, counts)
    w = Window.orderBy("step_idx").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return steps.withColumn(
        "pct_of_first", F.round(F.col("n_users") * 100.0 / F.first("n_users").over(w), 2)
    )


@register(
    "op_cohort_retention",
    tags=("behavior", "agg"),
    oracle="""
        WITH first_seen AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
        ), activity AS (
            SELECT DISTINCT f.user_id,
                   STRFTIME(date_trunc('week', f.first_day), '%Y-%m-%d') AS cohort_week,
                   CAST(date_diff('day', date_trunc('week', f.first_day),
                                  date_trunc('week', CAST(e.ts AS DATE))) / 7 AS INT) AS week_offset
            FROM events e JOIN first_seen f ON e.user_id = f.user_id
        ), cells AS (
            SELECT cohort_week, week_offset, COUNT(*) AS n_active
            FROM activity GROUP BY cohort_week, week_offset
        )
        SELECT cohort_week, week_offset, CAST(n_active AS BIGINT) AS n_active,
               ROUND(n_active * 100.0 / FIRST_VALUE(n_active) OVER (
                   PARTITION BY cohort_week ORDER BY week_offset), 2) AS retention_pct
        FROM cells
    """,
)
def op_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users are assigned to the week
    of their first event; each cell counts distinct cohort members
    active k weeks later, as a percentage of the cohort's size
    (offset 0 — every member is active in their own first week, so
    the base is exact, not a separate query).

    Shape: one min-aggregate per user, one join back to the log on
    user_id (same partitioning, no second shuffle under AQE reuse),
    distinct on (cohort, offset, user), then a count. The matrix
    itself is O(weeks^2) rows — driver-safe forever. Week boundaries
    are date-level (Monday-truncated in both engines), so the ns/us
    timestamp seam can't move a row across cells.
    """
    events = load_table(spark, sf_dir, "events")
    first_seen = events.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("first_day"))
    activity = (
        events.select("user_id", F.col("ts").cast("date").alias("day"))
        .join(first_seen, "user_id")
        .select(
            "user_id",
            F.date_format(F.date_trunc("week", "first_day"), "yyyy-MM-dd").alias("cohort_week"),
            (
                F.datediff(F.date_trunc("week", "day"), F.date_trunc("week", "first_day")) / 7
            ).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    cells = activity.groupBy("cohort_week", "week_offset").agg(F.count(F.lit(1)).alias("n_active"))
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cells.withColumn(
        "retention_pct", F.round(F.col("n_active") * 100.0 / F.first("n_active").over(w), 2)
    )


def rfm_per_user_and_cuts(spark: SparkSession, sf_dir: str):
    """op_rfm_scores' building blocks, exposed so the cross-engine
    cut-point pinning test (tests/test_invariants.py) exercises the
    exact production path: (per_user RFM table, 1-row df of the three
    4-element quintile cut arrays)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase")
    anchor = purchases.agg(F.max(F.col("ts").cast("date")).alias("now_day"))
    per_user = (
        purchases.groupBy("user_id")
        .agg(
            F.max(F.col("ts").cast("date")).alias("last_day"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("value"), 2).alias("monetary"),
        )
        .join(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff("now_day", "last_day").cast("int").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    qarr = F.array(*[F.lit(q / 5.0) for q in range(1, 5)])
    cuts = per_user.agg(
        F.percentile("recency_days", qarr).alias("r_cuts"),
        F.percentile("frequency", qarr).alias("f_cuts"),
        F.percentile("monetary", qarr).alias("m_cuts"),
    )
    return per_user, cuts


@register(
    "op_rfm_scores",
    tags=("behavior", "window"),
    oracle="""
        WITH anchor AS (SELECT MAX(CAST(ts AS DATE)) AS now_day FROM events),
        per_user AS (
            SELECT user_id,
                   date_diff('day', MAX(CAST(ts AS DATE)), (SELECT now_day FROM anchor)) AS recency_days,
                   COUNT(*) AS frequency,
                   ROUND(SUM(value), 2) AS monetary
            FROM events WHERE event_type = 'purchase' GROUP BY user_id
        ),
        cuts AS (
            SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS r_cuts,
                   quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS f_cuts,
                   quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS m_cuts
            FROM per_user
        )
        SELECT user_id, CAST(recency_days AS INT) AS recency_days,
               CAST(frequency AS BIGINT) AS frequency, monetary,
               CAST(5 - len(list_filter(r_cuts, c -> recency_days > c)) AS INT) AS r_score,
               CAST(len(list_filter(f_cuts, c -> frequency > c)) + 1 AS INT) AS f_score,
               CAST(len(list_filter(m_cuts, c -> monetary > c)) + 1 AS INT) AS m_score
        FROM per_user, cuts
    """,
)
def op_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-purchaser recency / frequency / monetary,
    each scored 1-5 by quintile cut points (5 = best: most recent,
    most frequent, highest spend). The recency anchor is the
    dataset's max event date — a deterministic, data-derived "now"
    instead of wall-clock.

    Scale shape: one aggregate reduces the three 4-element quintile
    boundary arrays (exact ``percentile`` here for oracle
    determinism; approx_percentile at 100 TB — cuts shift within
    sketch error, assignment is unchanged), which BROADCAST back and
    each user's score is a pure row expression — 1 + (number of cuts
    strictly below the value), mirrored (6 - bucket) for recency
    where lower is better. The earlier global ntile(5) windows
    single-partitioned the |users|-sized table (Spark plans one
    WindowExec task for an unpartitioned window); this is the
    op_corpus_quality_deciles broadcast-cut-points pattern instead —
    no single-partition Exchange anywhere in the plan. Boundary
    semantics differ from ntile deliberately: equal values always get
    equal scores (value-based buckets), where ntile splits ties
    arbitrarily at bucket edges.
    """
    per_user, cuts = rfm_per_user_and_cuts(spark, sf_dir)

    def bucket(value: str, cut_col: str):
        return F.size(F.filter(F.col(cut_col), lambda c: F.col(value) > c)) + 1

    return per_user.join(F.broadcast(cuts)).select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        (F.lit(6) - bucket("recency_days", "r_cuts")).cast("int").alias("r_score"),
        bucket("frequency", "f_cuts").cast("int").alias("f_score"),
        bucket("monetary", "m_cuts").cast("int").alias("m_score"),
    )


@register(
    "op_event_paths",
    tags=("behavior", "window"),
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS t2,
                   LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY event_id) AS t3
            FROM events
        )
        SELECT event_type || '>' || t2 || '>' || t3 AS path,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE t3 IS NOT NULL
        GROUP BY path
        ORDER BY n DESC, path
        LIMIT 20
    """,
)
def op_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the 20 most common 3-step event-type sequences
    (sliding window over each user's ordered stream via two LEADs —
    every consecutive triple counts, not just disjoint chunks).

    One shuffle to order per user, one aggregate, TakeOrderedAndProject
    for the top-k (no global sort). The path vocabulary is bounded by
    |event_types|^3, so the aggregate state is tiny no matter how
    large the log; ties are broken by path text for a deterministic
    top-20 cut.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = events.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    return (
        seq.select(F.concat_ws(">", "event_type", "t2", "t3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


@register(
    "op_agg_argmax",
    tags=("agg",),
    oracle="""
        WITH ranked AS (
            SELECT event_type, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id DESC) AS rn_top,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value ASC, event_id DESC) AS rn_bot
            FROM events
        )
        SELECT event_type,
               CAST(MAX(CASE WHEN rn_top = 1 THEN event_id END) AS BIGINT) AS top_event_id,
               ROUND(MAX(value), 2) AS top_value,
               CAST(MAX(CASE WHEN rn_bot = 1 THEN event_id END) AS BIGINT) AS bottom_event_id,
               ROUND(MIN(value), 2) AS bottom_value
        FROM ranked
        GROUP BY event_type
    """,
)
def op_agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax/argmin as single-pass aggregates (max_by / arg_max):
    "which event carried the highest value per type" without a window
    sort or a self-join — one hash aggregate, partial-aggregable, the
    O(1)-state shape that replaces the rank()=1 idiom at scale.

    Value ties are resolved toward the largest event_id for max and
    the largest event_id for min by maximizing/minimizing a composite
    ordering key — max_by/arg_max on a bare non-unique key is
    tie-arbitrary in both engines, same determinism discipline as the
    ntile ops.
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.max_by("event_id", F.struct(F.col("value"), F.col("event_id"))).alias("top_event_id"),
        F.round(F.max("value"), 2).alias("top_value"),
        F.min_by("event_id", F.struct(F.col("value"), (-F.col("event_id")).alias("neg")))
        .alias("bottom_event_id"),
        F.round(F.min("value"), 2).alias("bottom_value"),
    )


@register(
    "op_attribution_last_touch",
    tags=("behavior",),
    oracle="""
        WITH touches AS (
            SELECT user_id, ts, event_id FROM events
            WHERE event_type IN ('click', 'view')
        ),
        purchases AS (
            SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
        ),
        attributed AS (
            SELECT p.user_id, p.event_id AS purchase_id, t.event_id AS touch_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.event_id
                       ORDER BY t.ts DESC, t.event_id DESC
                   ) AS rn
            FROM purchases p JOIN touches t
              ON t.user_id = p.user_id
             AND t.ts <= p.ts
             AND t.ts >= p.ts - INTERVAL '72 hours'
        )
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_attributed,
               CAST(MIN(purchase_id) AS BIGINT) AS first_purchase_id
        FROM attributed WHERE rn = 1
        GROUP BY user_id
    """,
)
def op_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the latest
    click/view by the same user within a 72-hour lookback. The pair
    matching is the as-of-join shape (op_join_asof) expressed as a
    per-user equi-join + time-band residual + row_number — the join
    key is user_id, so the plan is a hash join plus one window, never
    a cross product.

    At 100 TB the lookback bound is what caps the pair fan-out: a
    user's touches within 72 h of a purchase, not their full history.
    For heavy users the banded-interval rewrite (op_join_range_binned:
    join on (user_id, time_bucket)) bounds it further; the aggregate
    output per user stays one row."""
    ev = load_table(spark, sf_dir, "events")
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_uid"), F.col("ts").alias("t_ts"), F.col("event_id").alias("touch_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("purchase_id")
    )
    pairs = purchases.join(
        touches,
        (F.col("t_uid") == F.col("user_id"))
        & (F.col("t_ts") <= F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 72 HOURS")),
    )
    w = Window.partitionBy("purchase_id").orderBy(F.col("t_ts").desc(), F.col("touch_id").desc())
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_attributed"),
            F.min("purchase_id").alias("first_purchase_id"),
        )
    )


@register(
    "op_time_to_convert",
    tags=("behavior",),
    oracle="""
        WITH first_click AS (
            SELECT user_id, MIN(ts) AS t0 FROM events
            WHERE event_type = 'click' GROUP BY user_id
        ),
        first_purchase AS (
            SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'purchase' GROUP BY user_id
        ),
        latency AS (
            SELECT c.user_id,
                   date_diff('second', c.t0, p.t1) AS secs
            FROM first_click c JOIN first_purchase p ON c.user_id = p.user_id
            WHERE p.t1 >= c.t0
        )
        SELECT CAST(FLOOR(secs / 86400.0) AS INT) AS days_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(MIN(secs) AS BIGINT) AS min_secs,
               CAST(MAX(secs) AS BIGINT) AS max_secs
        FROM latency GROUP BY 1
    """,
)
def op_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, latency from FIRST
    click to FIRST purchase (users who purchased before ever clicking
    are excluded — they didn't convert through this path), bucketed
    by whole days — the latency histogram that funnel counts
    (op_funnel_steps) don't show.

    Two per-user min-aggregates (map-side combinable) meet in one
    key-sized join; the histogram is a second tiny aggregate. Nothing
    scans events twice at 100 TB if the two firsts are computed in
    one pass (min(CASE WHEN ...)) — split here for clarity, fused in
    the corpus pipeline style when the scan dominates."""
    ev = load_table(spark, sf_dir, "events")
    first_click = ev.filter(F.col("event_type") == "click").groupBy("user_id").agg(
        F.min("ts").alias("t0")
    )
    first_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("p_uid"))
        .agg(F.min("ts").alias("t1"))
    )
    latency = (
        first_click.join(first_purchase, F.col("user_id") == F.col("p_uid"))
        .filter(F.col("t1") >= F.col("t0"))
        .select(
            "user_id",
            (F.unix_timestamp("t1") - F.unix_timestamp("t0")).alias("secs"),
        )
    )
    return latency.groupBy(
        F.floor(F.col("secs") / 86400.0).cast("int").alias("days_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("secs").alias("min_secs"),
        F.max("secs").alias("max_secs"),
    )


@register(
    "op_user_profile",
    tags=("behavior",),
    oracle="""
        WITH mix AS (
            SELECT user_id, event_type, COUNT(*) AS n
            FROM events GROUP BY user_id, event_type
        ),
        tot AS (
            SELECT user_id, SUM(n) AS total FROM mix GROUP BY user_id
        )
        SELECT m.user_id,
               CAST(ANY_VALUE(t.total) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_event_types,
               ROUND(-SUM((m.n * 1.0 / t.total) * LN(m.n * 1.0 / t.total)), 6) AS mix_entropy
        FROM mix m JOIN tot t ON m.user_id = t.user_id
        GROUP BY m.user_id
    """,
)
def op_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral profile with event-mix Shannon entropy:
    H = -Σ p·ln p over the user's event-type distribution — 0 for
    single-behavior users (bots retrying one action), ln(k) for a
    uniform mix; the one-number segmentation feature RFM scores
    (op_rfm_scores) don't capture.

    Two stacked aggregates over the same key (type counts, then the
    entropy fold) — both map-side combinable, the second input
    already key-sized. The per-key distribution entropy pattern is
    the same one corpus source auditing uses at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    mix = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w_tot = Window.partitionBy("user_id")
    p = F.col("n") / F.sum("n").over(w_tot)
    return (
        mix.select("user_id", "n", p.alias("p"))
        .groupBy("user_id")
        .agg(
            F.sum("n").alias("n_events"),
            F.count(F.lit(1)).alias("n_event_types"),
            F.round(-F.sum(F.col("p") * F.log(F.col("p"))), 6).alias("mix_entropy"),
        )
    )


@register(
    "op_agg_transitions",
    tags=("behavior", "agg"),
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        ),
        trans AS (
            SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT from_type, to_type, CAST(n AS BIGINT) AS n_transitions,
               ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY from_type), 6) AS p_transition
        FROM trans
    """,
)
def op_agg_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: (from_type → to_type) counts and row-normalized
    probabilities — the model behind next-action prediction,
    anomaly scoring, and funnel leak diagnosis (where op_event_paths
    enumerates top paths, this gives the full conditional
    distribution).

    One shuffle on user_id for the LEAD window, one hash aggregate to
    the O(types²) matrix; the normalizing window runs over that tiny
    matrix, not the event stream. Vocabulary-bounded state at any
    scale."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    w_norm = Window.partitionBy("from_type")
    return trans.select(
        "from_type", "to_type", "n_transitions",
        F.round(F.col("n_transitions") / F.sum("n_transitions").over(w_norm), 6).alias("p_transition"),
    )


@register(
    "op_interarrival_profile",
    tags=("behavior", "timeseries"),
    oracle="""
        WITH gaps AS (
            SELECT event_type,
                   epoch_us(CAST(ts AS TIMESTAMP))
                     - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts, event_id
                       ) AS gap_us
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
               ROUND(AVG(gap_us) / 1e6, 2) AS mean_gap_s,
               ROUND(quantile_cont(gap_us, 0.5) / 1e6, 2) AS p50_gap_s,
               ROUND(quantile_cont(gap_us, 0.95) / 1e6, 2) AS p95_gap_s,
               ROUND(quantile_cont(gap_us, 0.95) * 1.0 / quantile_cont(gap_us, 0.5), 4) AS burstiness
        FROM gaps
        WHERE gap_us IS NOT NULL
        GROUP BY event_type
    """,
)
def op_interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time profile per event type: the gap between a
    user's consecutive events of the same type, summarized as
    mean/median/p95 and a p95/p50 burstiness ratio — the operational
    fingerprint that separates steady telemetry from bursty human
    action, and the empirical basis for choosing session gaps and
    stream watermark delays (a watermark below the p95 inter-arrival
    drops real data).

    One shuffle on (user_id, event_type) for the LAG, one hash
    aggregate to O(types) rows; gaps compare in microseconds on both
    engines. At 100 TB swap the exact quantiles for
    approx_percentile — the window pass is unchanged."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gaps = events.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.avg("gap_us") / 1e6, 2).alias("mean_gap_s"),
        F.round(F.percentile("gap_us", 0.5) / 1e6, 2).alias("p50_gap_s"),
        F.round(F.percentile("gap_us", 0.95) / 1e6, 2).alias("p95_gap_s"),
        F.round(F.percentile("gap_us", 0.95) / F.percentile("gap_us", 0.5), 4).alias("burstiness"),
    )
