"""Shared one-row equality referees over keyed DataFrames.

The "bitmatch" discipline every frozen-structure replay gate uses:
two keyed value sets are IDENTICAL iff they are count-equal in both
directions, every key pair joins, and every value compares == (IEEE
equality on doubles, integer equality on bitmaps — no tolerance).
Implemented as count frames + ONE broadcast inner join (never a full
outer join, which cannot broadcast and would SortMergeJoin even
bounded frames). One body serves the ADC-score referees
(ann_index.serve_with_adc_referee) and the Bloom words-table referees
(dedup.words_bitmatch_audit), so a fix to the fold logic — the
NULL-sum coalesce, the two-directional count — reaches every gate
(round-11 review finding: the referee existed twice)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bitmatch_audit(
    frame_a: DataFrame,
    frame_b: DataFrame,
    keys: Sequence[str],
    value_col: str,
    out: str,
) -> DataFrame:
    """One-row boolean frame ``out``: the (keys -> value_col) sets of
    ``frame_a`` and ``frame_b`` are identical. Both sides empty folds
    to TRUE (vacuous equality); a NULL sum on an empty join coalesces
    to 0 so the fold never returns NULL.

    Key uniqueness is VERIFIED, not assumed: with a duplicated key on
    one side and an extra key on the other, n_a == n_b and
    n_joined == n_a can both hold while the sets differ (round-11
    advice — the current call sites feed groupBy-derived frames, but
    this is the single shared gate body, so the precondition is part
    of the fold: each side's row count must equal its distinct-key
    count, measured in the same bounded aggregate)."""
    a = frame_a.select(*keys, value_col)
    b = frame_b.select(*keys, F.col(value_col).alias("_b_val"))
    key_cols = [F.col(k) for k in keys]
    n_a = a.agg(
        F.count(F.lit(1)).alias("n_a"),
        F.count_distinct(*key_cols).alias("nk_a"),
    )
    n_b = b.agg(
        F.count(F.lit(1)).alias("n_b"),
        F.count_distinct(*key_cols).alias("nk_b"),
    )
    joined = a.join(F.broadcast(b), list(keys)).agg(
        F.count(F.lit(1)).alias("n_joined"),
        F.sum(
            F.when(F.col(value_col) == F.col("_b_val"), 1).otherwise(0)
        ).alias("n_eq"),
    )
    return (
        joined.join(F.broadcast(n_a))
        .join(F.broadcast(n_b))
        .select(
            (
                (F.col("n_a") == F.col("nk_a"))
                & (F.col("n_b") == F.col("nk_b"))
                & (F.col("n_a") == F.col("n_b"))
                & (F.col("n_joined") == F.col("n_a"))
                & (F.coalesce(F.col("n_eq"), F.lit(0)) == F.col("n_joined"))
            ).alias(out)
        )
    )
