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
