"""Data-quality operators: declarative expectations and entity
resolution.

The reference trusts its API payloads end to end (its only guards are
the envelope status check and empty-table skip, reference
etl/pipeline.py:118-131, :273-275). A pipeline feeding a warehouse —
or a training corpus — needs the ingest-side complement: rule-based
validation with auditable verdicts (the Delta Live Tables /
Great Expectations shape) and fuzzy matching to reconcile
near-duplicate entities.

Scale notes: expectations compile to ONE multi-aggregate scan (every
rule is a conditional sum — no per-rule pass, no driver loop), and
fuzzy matching is blocked — candidate pairs come from an equi-join on
a cheap blocking key, with the expensive edit-distance evaluated only
inside blocks. The unblocked form is a cross join; blocking is what
makes entity resolution exist at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from game_data_etl_pipeline_spark.catalog import load_table
from game_data_etl_pipeline_spark.registry import register

# (rule name, violation predicate SQL, max tolerated violation rate)
# — declarative, so the same table drives Spark AND the oracle.
_RULES = (
    ("shipdate_not_null", "l_shipdate IS NULL", 0.0),
    ("quantity_in_range", "l_quantity < 1 OR l_quantity > 50", 0.0),
    ("discount_at_most_8pct", "l_discount > 0.08", 0.05),
    ("extendedprice_positive", "l_extendedprice <= 0", 0.0),
    ("returnflag_in_domain", "l_returnflag NOT IN ('A', 'N', 'R')", 0.0),
)


@register(
    "op_expectations",
    tags=("quality", "agg"),
    oracle="""
        WITH checked AS (
            SELECT COUNT(*) AS n_checked,
                   {sums}
            FROM lineitem
        )
        {unions}
    """.format(
        sums=",\n                   ".join(
            f"SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS v{i}"
            for i, (_, pred, _) in enumerate(_RULES)
        ),
        unions="\n        UNION ALL ".join(
            f"""SELECT '{name}' AS rule, CAST(n_checked AS BIGINT) AS n_checked,
                   CAST(v{i} AS BIGINT) AS n_violations,
                   ROUND(v{i} * 1.0 / n_checked, 6) AS violation_rate,
                   v{i} * 1.0 / n_checked <= {tol} AS passed FROM checked"""
            for i, (name, _, tol) in enumerate(_RULES)
        ),
    ),
)
def op_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectations over lineitem: each rule is a
    violation predicate plus a tolerated rate; the output is one
    audit row per rule (checked / violations / rate / verdict).

    All rules evaluate in a SINGLE scan as conditional sums — adding
    a rule adds an aggregate expression, not a pass over 100 TB. The
    verdict row is the auditable unit a pipeline gates on (fail the
    run, or quarantine violating rows with the same predicates —
    op_quality_filter shows the row-level variant). The rule table is
    one Python literal driving both engines, so the op and its oracle
    can't drift.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_checked")] + [
        F.sum(F.when(F.expr(pred), 1).otherwise(0)).alias(f"v{i}")
        for i, (_, pred, _) in enumerate(_RULES)
    ]
    checked = lineitem.agg(*aggs)
    rows = [
        checked.select(
            F.lit(name).alias("rule"),
            F.col("n_checked").cast("bigint").alias("n_checked"),
            F.col(f"v{i}").cast("bigint").alias("n_violations"),
            F.round(F.col(f"v{i}") / F.col("n_checked"), 6).alias("violation_rate"),
            (F.col(f"v{i}") / F.col("n_checked") <= tol).alias("passed"),
        )
        for i, (name, _, tol) in enumerate(_RULES)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@register(
    "op_join_fuzzy_blocked",
    tags=("quality", "join"),
    oracle="""
        WITH names AS (
            SELECT DISTINCT p_name, string_split(p_name, ' ')[1] AS blk
            FROM part
        )
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
        FROM names a
        JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def op_join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching (entity resolution candidate pairs):
    distinct part names are blocked on their first token, and
    levenshtein distance is computed ONLY within blocks via an
    equi-join on the blocking key; pairs at edit distance <= 3
    surface as merge candidates.

    The plan is a hash join on the block key — never a cross join —
    so pair generation is O(sum of block-size^2), not O(n^2); the
    same bucket-then-verify discipline as the MinHash/IVF dedup
    family (llmdata/dedup.py), with edit distance as the verifier
    instead of Jaccard/cosine. Canonical a < b ordering emits each
    pair once. Dedup-to-vocabulary first matters: matching distinct
    NAMES (64 here) instead of rows (2000) shrinks the quadratic
    term by the duplication factor squared.
    """
    part = load_table(spark, sf_dir, "part")
    names = part.select(
        "p_name", F.split(F.col("p_name"), " ").getItem(0).alias("blk")
    ).distinct()
    a = names.alias("a")
    b = names.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.p_name") < F.col("b.p_name")))
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 3)
    )


@register(
    "op_privacy_kanon",
    tags=("quality", "privacy"),
    oracle="""
        WITH qi AS (
            SELECT c_mktsegment, c_nationkey,
                   CAST(FLOOR(c_acctbal / 2000) AS INT) AS bal_band,
                   COUNT(*) AS grp_n
            FROM customer
            GROUP BY 1, 2, 3
        )
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(COUNT(*) FILTER (WHERE grp_n < 5) AS BIGINT) AS n_risky_groups,
               CAST(COALESCE(SUM(grp_n) FILTER (WHERE grp_n < 5), 0) AS BIGINT) AS n_risky_rows,
               ROUND(COALESCE(SUM(grp_n) FILTER (WHERE grp_n < 5), 0) * 1.0 / SUM(grp_n), 4) AS suppression_rate
        FROM qi
        GROUP BY c_mktsegment
    """,
)
def op_privacy_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=5) over quasi-identifiers (market segment,
    nation, coarsened balance band): how many QI equivalence classes
    are small enough to re-identify a member, and what fraction of
    rows would suppression cost — the governance report that gates a
    dataset release, complementing op_text_redact's content-level
    scrubbing with record-level linkage risk.

    Two stacked hash aggregates (QI classes, then per-segment
    summary), both mergeable; the QI class count is bounded by the
    coarsening (the fix for a failing audit is coarser bands, which
    also shrinks the aggregate). Nothing driver-side at 100 TB."""
    customer = load_table(spark, sf_dir, "customer")
    qi = customer.groupBy(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 2000).cast("int").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("grp_n"))
    risky = F.col("grp_n") < 5
    return qi.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.count(F.when(risky, 1)).alias("n_risky_groups"),
        F.coalesce(F.sum(F.when(risky, F.col("grp_n"))), F.lit(0)).alias("n_risky_rows"),
        F.round(
            F.coalesce(F.sum(F.when(risky, F.col("grp_n"))), F.lit(0)) / F.sum("grp_n"), 4
        ).alias("suppression_rate"),
    )
