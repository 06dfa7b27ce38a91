"""Cross-cutting invariants the oracles can't express: determinism
under repartitioning, ordering guarantees, conservation laws.

These are the properties that make operators safe to run on a cluster
whose partitioning you don't control — SURVEY.md §5's property-based
tier.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from game_data_etl_pipeline_spark import registry
from game_data_etl_pipeline_spark.llmdata.corpus import PACK_BUDGET, _draw

SPECS = registry.all_specs()


def test_asof_never_pairs_future_clicks(spark, sf_dir):
    """Every as-of match must satisfy last_click_ts <= purchase_ts —
    the defining property of the join."""
    rows = SPECS["op_join_asof"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.last_click_ts is not None:
            assert r.last_click_ts <= r.purchase_ts, r


def test_salted_join_matches_unsalted(spark, sf_dir):
    """The salted join is an implementation technique: its result must
    be bit-identical to the plain broadcast join it replaces."""
    from game_data_etl_pipeline_spark.catalog import load_table
    from game_data_etl_pipeline_spark.operators.scale import _TYPE_WEIGHTS

    salted = {tuple(r) for r in SPECS["op_join_salted"].fn(spark, sf_dir).collect()}
    events = load_table(spark, sf_dir, "events")
    weights = spark.createDataFrame(_TYPE_WEIGHTS, "event_type string, weight double")
    plain = {
        tuple(r)
        for r in events.join(F.broadcast(weights), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value") * F.col("weight")), 2).alias("weighted_value"),
        )
        .collect()
    }
    assert salted == plain


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=50, unique=True))
def test_sampling_draw_is_partition_invariant(spark, doc_ids):
    """The content-hash draw must depend only on the row, never on the
    partition layout — repartitioning must not change any draw (this
    is exactly what rand(seed) violates)."""
    df = spark.createDataFrame([(i,) for i in doc_ids], "doc_id long")
    base = dict(df.select("doc_id", _draw("strat:").alias("d")).collect())
    shuffled = dict(df.repartition(7).select("doc_id", _draw("strat:").alias("d")).collect())
    assert base == shuffled


def test_split_is_exhaustive_and_disjoint(spark, sf_dir):
    """train + val must partition the corpus exactly."""
    rows = SPECS["op_split_train_val"].fn(spark, sf_dir).collect()
    by_split = {r.split: r.n_docs for r in rows}
    assert set(by_split) == {"train", "val"}
    assert sum(by_split.values()) == 500  # all docs at sf0.001, none dropped/duplicated


def test_pack_sequences_conserves_tokens(spark, sf_dir):
    """Packing must conserve tokens (every doc in exactly one pack) and
    produce contiguous pack ids per language."""
    from game_data_etl_pipeline_spark.catalog import load_table

    rows = SPECS["op_pack_sequences"].fn(spark, sf_dir).collect()
    packed_total = sum(r.pack_tokens for r in rows)
    docs = load_table(spark, sf_dir, "documents")
    true_total = docs.select(F.sum(F.size(F.split(F.col("text"), " ")))).first()[0]
    assert packed_total == true_total
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.pack_id)
    for lang, ids in by_lang.items():
        assert sorted(ids) == list(range(len(ids))), f"{lang}: non-contiguous packs {sorted(ids)}"
    # every pack is near the budget: a pack other than the last one per
    # lang can overshoot only by the straddling doc, never undershoot 0
    for r in rows:
        assert r.pack_tokens > 0


def test_dedup_clusters_are_consistent_components(spark, sf_dir):
    """Connected-components invariants: (a) both endpoints of every
    near-dup edge land in the same cluster; (b) each cluster's id is
    the minimum doc_id among its members (the keeper policy)."""
    from game_data_etl_pipeline_spark.registry import all_specs

    specs = all_specs()
    labels = {r.doc_id: r.cluster_id for r in specs["op_dedup_clusters"].fn(spark, sf_dir).collect()}
    # recover the edge set at the same threshold the operator uses
    pairs = [
        (r.doc_a, r.doc_b)
        for r in specs["op_dedup_ngram_jaccard"].fn(spark, sf_dir).collect()
        if r.jaccard >= 0.2
    ]
    for a, b in pairs:
        assert labels[a] == labels[b], f"edge ({a},{b}) split across clusters"
    members: dict[int, list[int]] = {}
    for doc, cl in labels.items():
        members.setdefault(cl, []).append(doc)
    for cl, docs in members.items():
        assert cl == min(docs), f"cluster {cl} is not the min of {sorted(docs)[:5]}..."


def test_pagerank_matches_numpy_power_iteration(spark, sf_dir):
    """op_graph_pagerank: the DataFrame loop must reproduce the same
    recurrence computed densely in numpy on the collected edge list —
    and ranks must behave like a (damped) distribution: positive,
    summing to ~1 when every node has out-edges."""
    import numpy as np

    from game_data_etl_pipeline_spark.catalog import load_table
    from game_data_etl_pipeline_spark.operators.graph import _DAMPING, _ITERS

    got = {
        r.event_type: r.pagerank
        for r in SPECS["op_graph_pagerank"].fn(spark, sf_dir).collect()
    }
    assert all(v > 0 for v in got.values())

    events = load_table(spark, sf_dir, "events")
    w = F.lead("event_type").over(
        __import__("pyspark.sql", fromlist=["Window"]).Window.partitionBy("user_id").orderBy("event_id")
    )
    seq = events.select("event_type", w.alias("next_type")).filter(F.col("next_type").isNotNull())
    edges = seq.groupBy("event_type", "next_type").count().collect()

    nodes = sorted(got)
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    m = np.zeros((n, n))
    for e in edges:
        m[idx[e.event_type], idx[e.next_type]] = e["count"]
    out = m.sum(axis=1, keepdims=True)
    p = np.divide(m, out, where=out > 0)
    r = np.full(n, 1.0 / n)
    for _ in range(_ITERS):
        r = (1 - _DAMPING) / n + _DAMPING * (r @ p)
    for name in nodes:
        assert abs(got[name] - r[idx[name]]) < 1e-6, (name, got[name], r[idx[name]])
    if (out > 0).all():
        assert abs(sum(got.values()) - 1.0) < 1e-3


def test_ewma_closed_form_matches_pandas_recursion(spark, sf_dir):
    """op_timeseries_ewma's direct recurrence must equal the textbook
    definition (pandas ewm adjust=False) to float noise — the loop
    form exists for cross-engine bit-stability and overflow-free
    long series, not as a different definition."""
    import pandas as pd

    out = SPECS["op_timeseries_ewma"].fn(spark, sf_dir).toPandas()
    for _, grp in out.groupby("user_id"):
        grp = grp.sort_values("day")
        ref = grp["daily_value"].ewm(alpha=0.3, adjust=False).mean()
        # ewma is rounded to 4dp on output; half-ulp there is 5e-5
        assert (grp["ewma"] - ref).abs().max() < 6e-5


def test_no_round_over_rank_ratios_in_oracles():
    """Registry convention (round-5): never ROUND(percent_rank/
    cume_dist, d) in an oracle — k/(n-1) can be an exactly-
    representable binary fraction whose scaled value is exactly .5,
    where Spark HALF_UP and DuckDB binary rounding split (first hit
    41/640 at sf0.1). The floor(x*10^d + 0.5)/10^d form is the
    sanctioned cut; this lint keeps the class from reappearing."""
    import re

    from game_data_etl_pipeline_spark import registry

    bad = []
    pat = re.compile(r"ROUND\s*\(\s*(percent_rank|cume_dist)", re.IGNORECASE)
    for name, spec in registry.all_specs().items():
        if spec.oracle and pat.search(spec.oracle):
            bad.append(name)
    assert not bad, f"ROUND over rank ratios (engine-splitting): {bad}"


def test_rfm_cut_points_bit_identical_across_engines(spark):
    """ADVICE r5: op_rfm_scores compares ``value > cut`` against cut
    points computed independently by Spark percentile() and DuckDB
    quantile_cont(); a differing lerp formulation could diverge by an
    ulp at interpolated/tied boundaries and split the strict
    comparison. Pin the equivalence empirically: both engines' cut
    arrays must be BIT-identical at every test sf (same q*(n-1)
    position arithmetic on the same doubles -> same interpolation
    inputs; this test is the tripwire if either engine changes its
    formulation)."""
    import pytest

    from tests.conftest import make_duck
    from game_data_etl_pipeline_spark.operators.behavior import rfm_per_user_and_cuts

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        _, cuts = rfm_per_user_and_cuts(spark, sf)
        srow = cuts.first()
        duck = make_duck(sf)
        drow = duck.execute(
            """
            WITH anchor AS (SELECT MAX(CAST(ts AS DATE)) AS now_day FROM events),
            per_user AS (
                SELECT user_id,
                       date_diff('day', MAX(CAST(ts AS DATE)), (SELECT now_day FROM anchor)) AS recency_days,
                       COUNT(*) AS frequency,
                       ROUND(SUM(value), 2) AS monetary
                FROM events WHERE event_type = 'purchase' GROUP BY user_id
            )
            SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS r_cuts,
                   quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS f_cuts,
                   quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS m_cuts
            FROM per_user
            """
        ).fetchone()
        duck.close()
        for arr, (s_vals, d_vals) in zip(
            ("r_cuts", "f_cuts", "m_cuts"), zip((srow[0], srow[1], srow[2]), drow)
        ):
            for i, (s, d) in enumerate(zip(s_vals, d_vals)):
                # bitwise, not approx: == on floats IS the assertion
                assert float(s) == float(d), (
                    f"{sf} {arr}[{i}]: spark={s!r} duckdb={d!r} "
                    f"(engines' quantile interpolation diverged)"
                )
            assert len(s_vals) == len(d_vals) == 4


def test_equidepth_cut_points_bit_identical_across_engines(spark):
    """op_agg_equidepth's integer-grid dodge (cents + floored cuts)
    collapses sub-integer ulp noise, but the floored arrays themselves
    must still agree across engines — pinned at every test sf."""
    from pyspark.sql import functions as F

    from tests.conftest import make_duck
    from game_data_etl_pipeline_spark.catalog import load_table

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        orders = load_table(spark, sf, "orders").select(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
        )
        qarr = F.array(*[F.lit(k / 10.0) for k in range(1, 10)])
        s_cuts = orders.agg(
            F.transform(F.percentile("cents", qarr), lambda x: F.floor(x).cast("bigint")).alias("cq")
        ).first()["cq"]
        duck = make_duck(sf)
        d_cuts = duck.execute(
            """
            SELECT list_transform(
                quantile_cont(CAST(ROUND(o_totalprice * 100) AS BIGINT),
                              [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
                x -> CAST(FLOOR(x) AS BIGINT)) FROM orders
            """
        ).fetchone()[0]
        duck.close()
        assert [int(x) for x in s_cuts] == [int(x) for x in d_cuts], (sf, s_cuts, d_cuts)


def test_no_inexact_power_in_oracles():
    """Registry convention (registry.py): avoid libm ``power()`` with
    non-integer or non-literal exponents in compared expressions —
    Java Math.pow and C libm may differ in the last ulp, and no
    output-rounding discipline fixes inputs that already differ.
    Integer-literal exponents are allowed (both engines' results agree
    to well under output rounding for the magnitudes in play, and the
    sites are sums over many rows rounded to <=5dp); everything else
    needs a per-site justification here:

    - op_agg_hll_transparent: POWER(2.0, -m_rank) — base-2 integer
      exponents are EXACT in IEEE 754 (the result is a representable
      power of two; no libm rounding happens at all).
    - op_sample_weighted: power(u, 1.0/n_chars) — the A-ES key is
      used ONLY for ordering (top-n by k); u is an md5-derived uniform
      whose inter-key gaps are ~1e-3, dwarfing any ulp divergence, and
      the final output never exposes k itself.
    """
    import re

    from game_data_etl_pipeline_spark import registry

    allowed = {"op_agg_hll_transparent", "op_sample_weighted"}
    int_literal = re.compile(r"^-?\d+(\.0*)?$")
    pat = re.compile(r"\bpow(?:er)?\s*\(", re.IGNORECASE)

    def last_top_level_arg(text: str, start: int) -> str | None:
        """text[start] is the '(' of a pow call; return its final
        top-level argument, or None if unbalanced (truncated)."""
        depth, args, cur = 0, [], []
        for ch in text[start:]:
            if ch == "(":
                depth += 1
                if depth > 1:
                    cur.append(ch)
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    args.append("".join(cur).strip())
                    return args[-1]
                cur.append(ch)
            elif ch == "," and depth == 1:
                args.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
        return None

    bad = []
    for name, spec in registry.all_specs().items():
        if not spec.oracle or name in allowed:
            continue
        for m in pat.finditer(spec.oracle):
            exp = last_top_level_arg(spec.oracle, m.end() - 1)
            if exp is None or not int_literal.match(exp):
                bad.append((name, exp))
    assert not bad, f"inexact power() in compared oracle expressions: {bad}"


def test_equidepth_buckets_partition_orders(spark, sf_dir):
    """The broadcast-cut-point equidepth histogram must (a) place every
    order in exactly one bucket (populations sum to the table count),
    (b) keep bucket value spans ordered and non-overlapping
    (hi_i <= lo_{i+1}), and (c) keep populations near-equal — each
    within 10% of n/10 plus the largest tie run, the slack value-based
    bucketing legitimately needs where ntile would split ties."""
    from pyspark.sql import functions as F

    from game_data_etl_pipeline_spark.catalog import load_table

    rows = sorted(
        SPECS["op_agg_equidepth"].fn(spark, sf_dir).collect(), key=lambda r: r.bucket
    )
    orders = load_table(spark, sf_dir, "orders")
    n_orders = orders.count()
    assert sum(r.n for r in rows) == n_orders
    assert [r.bucket for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo, f"bucket {a.bucket} span overlaps {b.bucket}"
    max_tie = (
        orders.groupBy("o_totalprice").count().agg(F.max("count")).first()[0]
    )
    target = n_orders / 10
    for r in rows:
        assert abs(r.n - target) <= 0.1 * target + max_tie, (
            f"bucket {r.bucket} population {r.n} vs target {target}"
        )


def test_widen_narrow_scan_only_widens_narrow_frames(spark):
    """widen_narrow_scan's contract: a narrower-than-cores frame gets
    round-robin widened to defaultParallelism; a frame already at or
    above it is returned UNTOUCHED (no exchange added — the property
    that makes the helper free at cluster scale)."""
    from game_data_etl_pipeline_spark.catalog import widen_narrow_scan

    target = spark.sparkContext.defaultParallelism
    narrow = spark.range(100).coalesce(1)
    assert widen_narrow_scan(narrow, spark).rdd.getNumPartitions() == target
    wide = spark.range(100).repartition(target)
    assert widen_narrow_scan(wide, spark) is wide
