"""Persistent ANN index: build-once / serve-many split of the IVF-PQ
path.

op_sim_pq_adc / op_sim_ivfpq (similarity.py) train their coarse
centroids and PQ codebooks INSIDE every query run — right for
demonstrating that the stages compose, wrong as the steady state: a
real 100 TB vector store builds its index once (an expensive, bounded,
offline job) and amortizes it over every subsequent query. This module
is that split, following op_join_bucketed's "pay it once in layout"
precedent (operators/scale.py):

- ``build_ann_index`` trains the k=8 coarse IVF centroids
  (``ivf_trained_centroids`` — distributed Lloyd over the full corpus)
  and the 16x16 PQ codebooks (``pq_train``), encodes EVERY corpus
  vector to (cent_id, codes), and persists three parquet artifacts
  under the gitignored ``spark-warehouse/ann_index`` dir:
  ``coarse/`` (k rows), ``codebooks/`` (m*ksub rows), and
  ``postings/`` PARTITIONED BY cent_id — the partition layout IS the
  inverted file: a query probing 2 of 8 cells touches only those
  directories, so at 100 TB the probes/k scan fraction is enforced by
  storage-level partition pruning, not just a join filter.
- ``op_sim_index_build`` is the registered, value-oracled build job
  (idempotent: a second call finds the artifact and reads it back).
- ``op_sim_ivfpq_serve`` is query time: read the three artifacts, run
  ONLY the serving stages (probe -> ADC -> shortlist -> exact rerank)
  plus the recall/pruning audit, via the ``ivfpq_serve_stages`` helper
  shared verbatim with op_sim_ivfpq. Its plan contains NO training
  stage — no Lloyd loop, no localCheckpoint scan, no driver numpy —
  pinned by tests/test_plans.py::test_ivfpq_serve_plan_contract
  (plan has no ExistingRDD operator and reads the ann_index path) and
  by the _BUILD_COUNT no-rebuild assertion in tests/test_llmdata.py.

Staleness & concurrency: the artifact dir is keyed by the embeddings
parquet's (size, mtime_ns) fingerprint plus the index format version,
so a regenerated fixture can never be served by a stale index. Builds
stage into a unique temp dir and atomically rename into place;
concurrent builders race benignly (the loser discards its staging dir
and reads the winner's — both trained deterministically, so the
artifacts are bit-identical anyway).

Reference scope note: the reference pipeline
(/root/reference/etl/pipeline.py) has no vector search at all; this
family is part of the brief's training-data-pipeline closure, designed
Spark-first.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from game_data_etl_pipeline_spark.catalog import load_table
from game_data_etl_pipeline_spark.llmdata.artifacts import (
    fingerprint_key,
    prune_stale_keys,
    publish_staging,
    staging_tree,
)
from game_data_etl_pipeline_spark.llmdata.similarity import (
    IVFPQ_PROBES,
    PQ_KSUB,
    PQ_M,
    ivf_assign,
    ivf_trained_centroids,
    ivfpq_adc_scored,
    ivfpq_serve_stages,
    pq_encode,
    pq_train,
)
from game_data_etl_pipeline_spark.registry import register

# v1 STABLE SINCE ROUND 8: the round-9 atomic-publish refactor moved
# key construction into artifacts.fingerprint_key, which reproduces the
# r8 inline format byte-for-byte (`<flattened sf_dir>_<size>_<mtime_ns>`,
# verified against the r8 tree's code in git), and the cent_id partition
# layout is unchanged — no layout byte moved, so no version bump (the
# lexical side's pmod re-key is what a bump looks like: LEX_INDEX_VERSION
# 1 -> 2 in lex_index.py).
INDEX_VERSION = 1

# test hook: op_sim_ivfpq_serve twice in one process must hit the
# persisted artifact, never retrain (tests/test_llmdata.py)
_BUILD_COUNT = 0


def _index_root() -> str:
    return os.environ.get(
        "SPARK_GRAFT_INDEX_DIR",
        str(Path(__file__).resolve().parents[2] / "spark-warehouse" / "ann_index"),
    )


def ann_index_dir(sf_dir: str) -> str:
    """Artifact dir for one fixture: keyed by the embeddings file's
    (size, mtime_ns) fingerprint so a regenerated fixture at the same
    path gets a FRESH index — the stale-index failure mode of
    path-only keying (pinned by
    tests/test_llmdata.py::test_index_fingerprint_staleness)."""
    key = fingerprint_key(sf_dir, "embeddings.parquet")
    return os.path.join(_index_root(), f"v{INDEX_VERSION}", key)


def build_ann_index(spark: SparkSession, sf_dir: str, *, force: bool = False) -> str:
    """Train + persist the IVF-PQ index for ``sf_dir``'s embeddings
    (idempotent; see module docstring). Returns the artifact dir.

    Cost shape: one distributed Lloyd over the full corpus (the
    deliberate full-data coarse training documented in
    op_sim_ivf_trained), one bounded driver-numpy codebook train
    (pq_train's 512-vector sample), one zero-shuffle argmax cell
    assignment, one bounded groupBy(vec_id) encode, and one shuffle
    on cent_id to lay the postings out as the inverted file. All paid
    ONCE per corpus snapshot."""
    global _BUILD_COUNT
    final = ann_index_dir(sf_dir)
    if os.path.isfile(os.path.join(final, "meta.json")) and not force:
        return final
    _BUILD_COUNT += 1
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    coarse = ivf_trained_centroids(spark, sf_dir)
    pq = pq_train(emb)
    cells = ivf_assign(emb, cents=coarse, form="argmax").select("vec_id", "cent_id")
    postings = pq_encode(emb, pq).join(cells, "vec_id")

    with staging_tree(final) as staging:
        coarse.coalesce(1).write.mode("overwrite").parquet(os.path.join(staging, "coarse"))
        pq.coalesce(1).write.mode("overwrite").parquet(os.path.join(staging, "codebooks"))
        (
            postings.repartition("cent_id")
            .write.mode("overwrite")
            .partitionBy("cent_id")
            .parquet(os.path.join(staging, "postings"))
        )
        with open(os.path.join(staging, "meta.json"), "w") as f:
            json.dump(
                {
                    "version": INDEX_VERSION,
                    "pq_m": PQ_M,
                    "pq_ksub": PQ_KSUB,
                    "source": sf_dir,
                },
                f,
            )
        # atomic publish (force renames the live tree aside, never rmtree
        # in place) + GC of superseded fingerprints for this fixture
        publish_staging(staging, final, marker="meta.json", force=force)
    prune_stale_keys(final, sf_dir)
    return final


def read_ann_index(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(coarse, codebooks, postings) for ``sf_dir``, building the
    artifact first if absent. The postings' cent_id comes back as a
    PARTITION column (directory-derived int) — cast to long so joins
    against the coarse centroid ids stay cast-free."""
    path = build_ann_index(spark, sf_dir)
    coarse = spark.read.parquet(os.path.join(path, "coarse"))
    books = spark.read.parquet(os.path.join(path, "codebooks"))
    postings = spark.read.parquet(os.path.join(path, "postings")).select(
        "vec_id", "codes", F.col("cent_id").cast("long").alias("cent_id")
    )
    return coarse, books, postings


def serve_with_adc_referee(
    emb: DataFrame,
    emb_surv: DataFrame,
    comp_postings: DataFrame,
    yardstick_postings: DataFrame,
    coarse: DataFrame,
    books: DataFrame,
    out_col: str = "adc_bitmatch_vs_main",
) -> tuple[DataFrame, DataFrame]:
    """The ONE survivor-serve + ADC-bit-equality-referee body every
    frozen-structure replay gate shares (op_sim_ivfpq_serve_compacted,
    op_stream_ann_serve / _compacted, op_sim_lifecycle_e2e —
    previously four near-identical scaffolds; the round-12 review's
    drift finding, the compact_ann_postings argument one level up):
    run the verbatim probe -> ADC -> shortlist -> exact-rerank chain
    over ``emb_surv``'s candidate world from ``comp_postings``, and
    referee every probed-cell ADC score from that store against the
    same chain over ``yardstick_postings`` — count-equal both
    directions, every (query_id, vec_id) joined, every score
    IEEE-bit-equal. Returns (served, one-row audit frame named
    ``out_col``); callers append their extra audit literals and
    crossJoin. ``emb`` supplies the query slot (vec_id < 4), and the
    query-slot exclusion is applied to BOTH postings frames HERE —
    symmetrically, so a caller passing either frame filtered or
    unfiltered gets the same referee (the round-12 review's
    asymmetric-contract finding); tombstone/survivor filters compose
    by pre-filtering the frames."""
    from game_data_etl_pipeline_spark.llmdata.audits import bitmatch_audit

    comp_cands = comp_postings.filter(F.col("vec_id") >= 4)
    yard_cands = yardstick_postings.filter(F.col("vec_id") >= 4)
    served = ivfpq_serve_stages(emb_surv, comp_cands, coarse, books)
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    adc_served = ivfpq_adc_scored(
        queries, comp_cands, coarse, books, probes=IVFPQ_PROBES
    )
    adc_yard = ivfpq_adc_scored(
        queries, yard_cands, coarse, books, probes=IVFPQ_PROBES
    )
    audit = bitmatch_audit(
        adc_served, adc_yard, ["query_id", "vec_id"], "adc_sqdist", out_col
    )
    return served, audit


@register(
    "op_sim_index_build",
    tags=("llm", "similarity", "index"),
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_indexed,
               CAST(16 AS BIGINT) AS pq_m,
               CAST(16 AS BIGINT) AS pq_ksub,
               TRUE AS full_coverage,
               TRUE AS fixed_cell_bound,
               TRUE AS codebook_complete
        FROM embeddings
    """,
)
def op_sim_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The offline index-build job as a registered, value-oracled
    query: ensure the IVF-PQ artifact exists (building it if absent),
    then AUDIT the persisted files themselves — the output is computed
    from what was written to disk, not from the in-memory frames that
    produced it, so a row that went missing in the write would fail
    the oracle.

    - ``n_indexed``: postings rows, hash-compared against the corpus
      count (every vector must be indexed).
    - ``full_coverage``: postings cover every vec_id exactly once and
      every code array is exactly PQ_M long.
    - ``fixed_cell_bound``: 0 < #non-empty cells <= k=8 — the
      partition count of the inverted file is bounded by the trained
      k, independent of corpus size.
    - ``codebook_complete``: exactly PQ_M * PQ_KSUB codebook rows,
      PQ_M distinct subspaces, codes spanning [0, PQ_KSUB).

    Training determinism (seeded Lloyd, vec_id-sorted sample,
    lowest-code tie-breaks) makes rebuilds bit-identical, so the
    audit is stable across SFs and rounds."""
    from game_data_etl_pipeline_spark.llmdata.cluster import K

    coarse, books, postings = read_ann_index(spark, sf_dir)
    n_emb = (
        load_table(spark, sf_dir, "embeddings")
        .agg(F.count(F.lit(1)).alias("n_emb"))
    )
    pstats = postings.agg(
        F.count(F.lit(1)).alias("n_indexed"),
        F.countDistinct("vec_id").alias("n_distinct"),
        F.countDistinct("cent_id").alias("n_cells"),
        F.min(F.size("codes")).alias("min_m"),
        F.max(F.size("codes")).alias("max_m"),
    )
    bstats = books.agg(
        F.count(F.lit(1)).alias("n_book_rows"),
        F.countDistinct("sub_id").alias("n_subs"),
        F.min("code").alias("min_code"),
        F.max("code").alias("max_code"),
    )
    return (
        pstats.join(F.broadcast(n_emb))
        .join(F.broadcast(bstats))
        .select(
            "n_indexed",
            F.lit(PQ_M).cast("long").alias("pq_m"),
            F.lit(PQ_KSUB).cast("long").alias("pq_ksub"),
            (
                (F.col("n_indexed") == F.col("n_emb"))
                & (F.col("n_distinct") == F.col("n_emb"))
                & (F.col("min_m") == PQ_M)
                & (F.col("max_m") == PQ_M)
            ).alias("full_coverage"),
            ((F.col("n_cells") > 0) & (F.col("n_cells") <= F.lit(K))).alias(
                "fixed_cell_bound"
            ),
            (
                (F.col("n_book_rows") == PQ_M * PQ_KSUB)
                & (F.col("n_subs") == PQ_M)
                & (F.col("min_code") == 0)
                & (F.col("max_code") == PQ_KSUB - 1)
            ).alias("codebook_complete"),
        )
    )


@register(
    "op_sim_ivfpq_serve",
    tags=("llm", "similarity", "index"),
    oracle="""
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
            FROM embeddings WHERE vec_id < 4
        ),
        c AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce
            FROM embeddings WHERE vec_id >= 4
        )
        SELECT query_id,
               CAST(COUNT(*) FILTER (WHERE list_distance(ce, qe) <= 25.0) AS BIGINT)
                   AS n_exact_within_bound,
               TRUE AS pruned_scan,
               TRUE AS recall_floor_met
        FROM q, c
        GROUP BY query_id
    """,
)
def op_sim_ivfpq_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time IVF-PQ against the PERSISTED index — what a serving
    tier actually runs per query batch, with zero training cost:
    probe the top-2 coarse cells per query, ADC-score only postings
    whose cell id matches a probed cell, exact-rerank the shortlist
    (``ivfpq_serve_stages``, the stage chain shared verbatim with
    op_sim_ivfpq so the two ops cannot drift).

    vs op_sim_ivfpq, whose 5.3 s sf0.1 median was dominated by the
    in-query coarse Lloyd + codebook train: this op reads 3 parquet
    artifacts instead (8 + 256 + n rows) — measured 0.6-0.9 s warm at
    sf0.1, ~7x under the train-inline form, and the gap grows with
    corpus size since training amortizes while serving stays bounded.
    Same oracle and audits as op_sim_ivfpq: within-bound counts
    hash-compare against DuckDB; ``pruned_scan`` asserts strictly
    fewer postings scored than exist; ``recall_floor_met`` asserts
    the final top-10 recalls >= 40% of the exact top-10 (the audits'
    exact scan exists to VERIFY, not to serve).

    The fixture's queries (vec_id < 4) are corpus members, so the
    index — which covers the whole corpus, queries included — is
    filtered to vec_id >= 4 at serve time; an external query set
    would skip the filter."""
    coarse, books, postings = read_ann_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return ivfpq_serve_stages(emb, postings.filter(F.col("vec_id") >= 4), coarse, books)


def ensure_upsert_tree(spark: SparkSession, sf_dir: str) -> str:
    """Build (idempotently) the upsert demo tree: base postings
    (vec_id < floor(0.8 * max)) seeded from the main artifact, then
    the delta encoded against the PERSISTED trained structure — no
    Lloyd, no pq_train, O(delta) only — appended partition-aligned.
    The WHOLE tree (base seed + delta append + marker) is built in a
    staging dir and atomically renamed into place: the r8 in-place
    form let two concurrent sessions interleave overwrite/append on
    the same directory, and a crash between the append and the marker
    left stale delta files a rerun under dynamic
    partitionOverwriteMode would double-count. The published tree has
    exactly TWO segments per non-empty cell (one per write) — the
    segment shape op_sim_index_compact merges."""
    demo = os.path.join(
        _index_root(),
        f"upsert_v{INDEX_VERSION}",
        fingerprint_key(sf_dir, "embeddings.parquet"),
    )
    if os.path.isfile(os.path.join(demo, "upsert_done.json")):
        return demo
    main_path = build_ann_index(spark, sf_dir)
    coarse = spark.read.parquet(os.path.join(main_path, "coarse"))
    books = spark.read.parquet(os.path.join(main_path, "codebooks"))
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    split = emb.agg(
        F.expr("max(vec_id) * 4 div 5").cast("long").alias("split")
    ).localCheckpoint(eager=True)
    with staging_tree(demo) as staging:
        main_postings = spark.read.parquet(os.path.join(main_path, "postings")).select(
            "vec_id", "codes", F.col("cent_id").cast("long").alias("cent_id")
        )
        base = main_postings.join(F.broadcast(split)).filter(
            F.col("vec_id") < F.col("split")
        )
        (
            base.drop("split")
            .repartition("cent_id")
            .write.mode("overwrite")
            .partitionBy("cent_id")
            .parquet(os.path.join(staging, "postings"))
        )
        delta = (
            emb.join(F.broadcast(split))
            .filter(F.col("vec_id") >= F.col("split"))
            .select("vec_id", "embedding")
        )
        delta_cells = ivf_assign(delta, cents=coarse, form="argmax").select(
            "vec_id", "cent_id"
        )
        delta_post = pq_encode(delta, books).join(delta_cells, "vec_id")
        (
            delta_post.repartition("cent_id")
            .write.mode("append")
            .partitionBy("cent_id")
            .parquet(os.path.join(staging, "postings"))
        )
        with open(os.path.join(staging, "upsert_done.json"), "w") as f:
            json.dump({"version": INDEX_VERSION}, f)
        publish_staging(staging, demo, marker="upsert_done.json")
    prune_stale_keys(demo, sf_dir)
    return demo


@register(
    "op_sim_index_upsert",
    tags=("llm", "similarity", "index"),
    oracle="""
        WITH b AS (
            SELECT (MAX(vec_id) * 4) // 5 AS split FROM embeddings
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(COUNT(*) FILTER (WHERE vec_id < split) AS BIGINT) AS n_base,
               CAST(COUNT(*) FILTER (WHERE vec_id >= split) AS BIGINT) AS n_delta,
               TRUE AS full_coverage_after_upsert,
               TRUE AS encode_consistent,
               TRUE AS no_retraining
        FROM embeddings, b
    """,
)
def op_sim_index_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL index maintenance — the freshness half of the
    build/serve split: when a delta batch of vectors arrives, a real
    100 TB index does NOT retrain; it encodes the delta against the
    EXISTING trained structure (coarse centroids + codebooks are
    read-only artifacts) and appends postings — O(delta) work,
    partition-aligned appends into the cent_id layout, zero touch of
    the base postings. Retraining per delta would be O(corpus) and
    would silently re-key every existing posting (cells move), i.e.
    a full rebuild wearing an upsert's name.

    Demo shape on the fixture: base = vec_id < floor(0.8 * max),
    delta = the rest. The trained structure comes from the MAIN
    persisted artifact (build_ann_index, idempotent); a scratch
    postings tree under upsert_v{N}/ is seeded with the base
    partition-aligned, then the delta is encoded via the PERSISTED
    codebooks/centroids and appended (parquet append into the
    partitionBy(cent_id) layout). Idempotent per artifact
    fingerprint: a second run audits the existing tree.

    Audited on the PERSISTED post-upsert tree:
    - ``full_coverage_after_upsert``: base+delta postings cover every
      corpus vec_id exactly once;
    - ``encode_consistent``: every appended row's (cent_id, codes)
      is bit-identical to the build-time encode of the same vector —
      the persisted-artifact encode path reproduces the training-time
      path exactly (joins postings-vs-main on vec_id);
    - ``no_retraining``: the codebook artifact on disk is row-for-row
      unchanged after the upsert (count + per-row equi-join against
      its pre-upsert localCheckpoint copy)."""
    main_path = build_ann_index(spark, sf_dir)
    # snapshot the codebook BEFORE the upsert runs, for no_retraining
    books_before = spark.read.parquet(
        os.path.join(main_path, "codebooks")
    ).localCheckpoint(eager=True)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    split = emb.agg(
        F.expr("max(vec_id) * 4 div 5").cast("long").alias("split")
    ).localCheckpoint(eager=True)
    demo = ensure_upsert_tree(spark, sf_dir)

    after = spark.read.parquet(os.path.join(demo, "postings")).select(
        "vec_id", "codes", F.col("cent_id").cast("long").alias("cent_id")
    )
    main_postings = spark.read.parquet(os.path.join(main_path, "postings")).select(
        "vec_id",
        F.col("codes").alias("m_codes"),
        F.col("cent_id").cast("long").alias("m_cent_id"),
    )
    books_after = spark.read.parquet(os.path.join(main_path, "codebooks"))
    cov = (
        after.join(F.broadcast(split))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.countDistinct("vec_id").alias("n_distinct"),
            F.sum(F.when(F.col("vec_id") < F.col("split"), 1).otherwise(0)).alias(
                "n_base"
            ),
            F.sum(F.when(F.col("vec_id") >= F.col("split"), 1).otherwise(0)).alias(
                "n_delta"
            ),
        )
    )
    n_emb = emb.agg(F.count(F.lit(1)).alias("n_emb"))
    consistent = (
        after.join(main_postings, "vec_id")
        .agg(
            F.count(F.lit(1)).alias("n_joined"),
            F.sum(
                F.when(
                    (F.col("cent_id") == F.col("m_cent_id"))
                    & (F.col("codes") == F.col("m_codes")),
                    1,
                ).otherwise(0)
            ).alias("n_identical"),
        )
    )
    book_stable = (
        books_after.join(
            F.broadcast(books_before.withColumnRenamed("ce", "ce_before")),
            ["sub_id", "code"],
        )
        .agg(
            F.count(F.lit(1)).alias("n_book"),
            F.sum(
                F.when(F.col("ce") == F.col("ce_before"), 1).otherwise(0)
            ).alias("n_book_same"),
        )
    )
    return (
        cov.join(F.broadcast(n_emb))
        .join(F.broadcast(consistent))
        .join(F.broadcast(book_stable))
        .select(
            "n_total",
            "n_base",
            "n_delta",
            (
                (F.col("n_total") == F.col("n_emb"))
                & (F.col("n_distinct") == F.col("n_emb"))
            ).alias("full_coverage_after_upsert"),
            (
                (F.col("n_joined") == F.col("n_total"))
                & (F.col("n_identical") == F.col("n_total"))
            ).alias("encode_consistent"),
            (
                (F.col("n_book") == PQ_M * PQ_KSUB)
                & (F.col("n_book_same") == F.col("n_book"))
            ).alias("no_retraining"),
        )
    )

# deterministic tombstone predicate for the compaction demo: ~6% of
# vectors (pmod keeps the expression total; vec_id is nonnegative so
# DuckDB's % replays it exactly)
TOMB_MOD, TOMB_RESIDUE = 17, 3

# Id-LIST tombstone fixture (round-11 verdict task 3): a real purge —
# a GDPR request, a takedown set — arrives as an explicit id list, not
# a residue predicate, so the compactors take a tombstone DataFrame
# and this literal list is the driver-verified instance. Ids are
# chosen inside the smallest fixture's id range (0..499), outside the
# query slot (>= 4), and straddling the upsert split (4/5 * max = 399
# at sf0.01), so both the base segment and the delta segment lose
# rows. DuckDB replays the same list as NOT IN.
TOMB_IDS = (7, 23, 118, 233, 301, 404, 441, 468, 490, 497)
TOMB_IDS_SQL = f"({', '.join(map(str, TOMB_IDS))})"


def check_tomb_meta(path: str, marker: str) -> None:
    """Serving-time purge-list handshake for the compacted trees: a
    tree compacted with a DIFFERENT id list than the session constant
    would serve under referees and oracles derived from the NEW list
    — the stale-artifact class check_bloom_meta closes for Bloom
    geometry. Raises loudly on mismatch or a missing marker.

    Two marker shapes (round-13 verdict task 3 consolidated the
    streamed gates' duplicate ``stream_compact_done.json`` into the
    purge LEDGER, so the handshake and the deletion evidence are ONE
    artifact): the e2e lineage markers record the raw list under
    ``tomb_ids``; the ledger records ``purge.kind == id_list`` plus a
    digest, compared through the same ``purge_ids_digest`` derivation
    the writer used, so the two sides cannot drift. A predicate-kind
    ledger (the residue unit fixture) fails the id-list handshake by
    construction."""
    mpath = os.path.join(path, marker)
    with open(mpath) as f:
        meta = json.load(f)
    if "purge" in meta:  # the consolidated purge-LEDGER shape
        purge = meta["purge"]
        ok = purge.get("kind") == "id_list" and purge.get(
            "digest"
        ) == purge_ids_digest(TOMB_IDS)
        recorded = purge.get("ids", purge.get("predicate"))
    else:  # the e2e lineage marker shape (raw id list)
        ok = list(meta.get("tomb_ids", [])) == list(TOMB_IDS)
        recorded = meta.get("tomb_ids")
    if not ok:
        raise ValueError(
            f"compacted tree {path} was compacted with tomb_ids="
            f"{recorded} but this session's TOMB_IDS is "
            f"{list(TOMB_IDS)} — the end state no longer matches the "
            f"code; rebuild the lineage"
        )


def tomb_ids_current(path: str, marker: str) -> bool:
    """Cache-validity test for the e2e lineage builders: True iff the
    persisted tree's recorded purge list matches the session TOMB_IDS.
    A stale list is a CACHE MISS — the builder displaces the old tree
    through the trash-grace window and rebuilds, so editing TOMB_IDS
    self-heals instead of serving a lineage compacted with the old
    list (the _geometry_current discipline applied to the purge
    fixture)."""
    import time as _time

    try:
        check_tomb_meta(path, marker)
        return True
    except (OSError, json.JSONDecodeError, ValueError):
        trash = f"{path}.trash.tomb{os.getpid()}_{int(_time.time() * 1000)}"
        try:
            os.rename(path, trash)
            os.utime(trash, None)  # grace clock starts at displacement
        except OSError:
            pass  # a concurrent builder already displaced it
        return False


def tombstone_ids_df(spark: SparkSession, id_col: str) -> DataFrame:
    """The TOMB_IDS purge list as a one-column DataFrame (``id_col``:
    doc_id / vec_id) — the shape a real deletion request has. Bounded
    by construction (a purge list, not a corpus), so compactors
    broadcast it into an anti-join: survivors never shuffle. Built as
    a JVM-side literal explode, not createDataFrame — a Python local
    table lands as Scan ExistingRDD and would trip the serve plans'
    no-ExistingRDD training-frame contracts."""
    return spark.range(1).select(
        F.explode(
            F.array(*[F.lit(i).cast("long") for i in TOMB_IDS])
        ).alias(id_col)
    )


# The purge AUDIT LEDGER (round-12 verdict task 5): compactions
# delete user data; a real GDPR/takedown workflow needs persisted
# EVIDENCE of what was purged — which ids (or predicate), and the
# count arithmetic — written in the SAME transaction as the compact,
# so a compacted tree without its evidence cannot exist. The name is
# underscore-prefixed because for the ANN family it lives INSIDE the
# postings directory and Spark's parquet listing must skip it.
PURGE_LEDGER = "_purge_ledger.json"


def purge_ids_digest(ids) -> str:
    """Canonical digest of an id-list purge request — the writer
    (compactor ledger) and the checkers (lifecycle gates) derive it
    through this one function so they cannot drift."""
    import hashlib

    return hashlib.sha256(
        ",".join(str(i) for i in sorted(int(i) for i in ids)).encode()
    ).hexdigest()


def write_purge_ledger(
    dest: str,
    *,
    n_before: int,
    n_after: int,
    purge_ids=None,
    predicate: str | None = None,
) -> None:
    """Persist the compaction's purge evidence next to its output —
    called by the shared compactors BEFORE the caller's atomic
    publish, so the ledger rides the same staging transaction as the
    survivors (a crash between the rewrite and the ledger publishes
    NOTHING — pinned by the torn-write pytest). Deterministic and
    timestamp-free: a republished identical compaction produces an
    identical ledger, so tree digests stay stable."""
    if purge_ids is not None:
        ids = sorted(int(i) for i in purge_ids)
        purge = {"kind": "id_list", "ids": ids, "digest": purge_ids_digest(ids)}
    else:
        import hashlib

        purge = {
            "kind": "predicate",
            "predicate": predicate,
            "digest": hashlib.sha256(str(predicate).encode()).hexdigest(),
        }
    with open(os.path.join(dest, PURGE_LEDGER), "w") as f:
        json.dump(
            {
                "version": 1,
                "purge": purge,
                "n_before": int(n_before),
                "n_after": int(n_after),
                "n_purged": int(n_before) - int(n_after),
            },
            f,
        )


def purge_ledger_current(tree: str, ledger_dir: str) -> bool:
    """Cache-validity test for the compacted-tree builders: True iff
    ``ledger_dir`` holds the purge ledger. A ledger-less compacted
    tree (it predates the purge-ledger artifact, or torn external
    cleanup removed the evidence) is a CACHE MISS — ``tree`` is
    displaced through the trash-grace window and rebuilt, the
    tomb_ids_current discipline applied to the deletion evidence."""
    import time as _time

    if os.path.isfile(os.path.join(ledger_dir, PURGE_LEDGER)):
        return True
    trash = f"{tree}.trash.ledger{os.getpid()}_{int(_time.time() * 1000)}"
    try:
        os.rename(tree, trash)
        os.utime(trash, None)  # grace clock starts at displacement
    except OSError:
        pass  # a concurrent builder already displaced it
    return False


def read_purge_ledger(dest: str) -> dict:
    """Load a compacted tree's purge evidence; a MISSING ledger is a
    loud error, not a default — a compaction that deleted rows without
    recording what it deleted is exactly the failure mode the artifact
    exists to rule out."""
    path = os.path.join(dest, PURGE_LEDGER)
    if not os.path.isfile(path):
        raise ValueError(
            f"compacted tree {dest} has no purge ledger ({PURGE_LEDGER}) — "
            f"the compaction's deletion evidence is missing; rebuild the tree"
        )
    with open(path) as f:
        return json.load(f)


def purge_ledger_referee(
    spark: SparkSession, ledger_dir: str, before: DataFrame, after: DataFrame,
    id_col: str,
) -> DataFrame:
    """One-row BOOLEAN audit frame (`purge_ledger_consistent`) holding
    a compaction's persisted purge LEDGER to the purge actually
    MEASURED on the persisted trees — the op_lex_lifecycle_e2e /
    op_sim_lifecycle_e2e referee discipline factored out so the
    STREAMED compact-serve gates carry the identical check (round-13
    verdict task 2: the streamed rows wrote the ledger via the shared
    compactors but never read it back). True iff ALL of:

    - the ledger records an id-LIST purge whose digest is the session
      TOMB_IDS digest (one ``purge_ids_digest`` derivation on both
      the writer and this checker, so they cannot drift), with
      internally consistent arithmetic (n_purged == n_before −
      n_after);
    - the recorded n_before / n_after equal the row counts of the
      PERSISTED source and compacted trees (``before`` / ``after`` —
      posting rows, read back from disk, not a plan);
    - the purge-list hits counted in the source (broadcast left-semi
      on ``id_col`` — map-side, the list is bounded by construction)
      equal the ledger's n_purged, i.e. the evidence attests to
      exactly the rows that disappeared.

    A MISSING ledger raises loudly in ``read_purge_ledger``; a
    tampered one serves False into the driver's value hash against
    the oracle's TRUE literal."""
    led = read_purge_ledger(ledger_dir)
    led_ok = (
        led["purge"].get("kind") == "id_list"
        and led["purge"].get("digest") == purge_ids_digest(TOMB_IDS)
        and led["n_purged"] == led["n_before"] - led["n_after"]
    )
    b_stats = before.join(
        F.broadcast(tombstone_ids_df(spark, id_col)), id_col, "left_semi"
    ).agg(F.count(F.lit(1)).alias("n_purge_hits")).crossJoin(
        before.agg(F.count(F.lit(1)).alias("n_before"))
    )
    a_stats = after.agg(F.count(F.lit(1)).alias("n_after"))
    return b_stats.crossJoin(F.broadcast(a_stats)).select(
        (
            F.lit(bool(led_ok))
            & (F.col("n_before") == F.lit(int(led["n_before"])))
            & (F.col("n_after") == F.lit(int(led["n_after"])))
            & (F.col("n_purge_hits") == F.lit(int(led["n_purged"])))
        ).alias("purge_ledger_consistent")
    )


def compact_ann_postings(
    spark: SparkSession,
    src_postings: str,
    dest_postings: str,
    tombstones: DataFrame | None = None,
) -> None:
    """The ONE ANN delete+compact algebra: read the postings at
    ``src_postings``, drop tombstoned vectors, and rewrite ONE segment
    per cell under ``dest_postings`` — bytes moved, never re-encoded,
    the input tree untouched. ``tombstones`` is a (vec_id) DataFrame
    — the id-list shape a real purge has — broadcast into a left-anti
    join (survivors stream map-side, no shuffle beyond the per-cell
    repartition the rewrite needs anyway); ``None`` keeps the
    deterministic pmod(vec_id, TOMB_MOD) == TOMB_RESIDUE residue
    fixture. Shared by ensure_compact_tree (offline upsert tree),
    op_stream_ann_serve_compacted (streamed store), and the e2e
    lifecycle lineage, so offline, streamed, and composed compaction
    cannot drift."""
    from pyspark.sql import Observation

    src = spark.read.parquet(src_postings).select("vec_id", "codes", "cent_id")
    # n_before measured by an observe() metric ON THE SAME SCAN that
    # feeds the rewrite (r15, guide §1.2: the old shape re-scanned the
    # whole source tree a second time just to count it) — the ledger
    # still attests to exactly the rows the compaction read
    obs_before = Observation("compact_ann_n_before")
    src_counted = src.observe(obs_before, F.count(F.lit(1)).alias("n"))
    if tombstones is None:
        survivors = src_counted.filter(
            F.pmod(F.col("vec_id"), F.lit(TOMB_MOD)) != TOMB_RESIDUE
        )
    else:
        survivors = src_counted.join(
            F.broadcast(tombstones.select("vec_id")), "vec_id", "left_anti"
        )
    (
        survivors.repartition("cent_id")
        .write.mode("overwrite")
        .partitionBy("cent_id")
        .parquet(dest_postings)
    )
    # purge evidence, in the same output tree (and therefore the same
    # staging transaction when the caller stages): n_after is counted
    # from the PERSISTED survivors — the ledger attests to what was
    # actually written, not to a plan
    write_purge_ledger(
        dest_postings,
        n_before=obs_before.get["n"],
        n_after=spark.read.parquet(dest_postings).count(),
        purge_ids=(
            None
            if tombstones is None
            else [r[0] for r in tombstones.select("vec_id").distinct().collect()]
        ),
        predicate=(
            f"pmod(vec_id, {TOMB_MOD}) == {TOMB_RESIDUE}"
            if tombstones is None
            else None
        ),
    )


def _count_parquet_files(postings_dir: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(postings_dir):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def ensure_compact_tree(spark: SparkSession, sf_dir: str) -> str:
    """Build (idempotently) the compacted tree: the upsert demo tree's
    2-segments-per-cell postings with the pmod(vec_id, TOMB_MOD) ==
    TOMB_RESIDUE tombstones dropped, rewritten ONE segment per cell
    into a fresh staged tree (atomic publish + superseded-key GC) —
    the input tree is never mutated, so a crash mid-compaction leaves
    the old index serving. Shared by op_sim_index_compact (which
    audits the rewrite) and op_sim_ivfpq_serve_compacted (which
    SERVES from it under a value-level oracle)."""
    demo = ensure_upsert_tree(spark, sf_dir)
    comp = os.path.join(
        _index_root(),
        f"compact_v{INDEX_VERSION}",
        fingerprint_key(sf_dir, "embeddings.parquet"),
    )
    if os.path.isfile(
        os.path.join(comp, "compact_done.json")
    ) and purge_ledger_current(comp, os.path.join(comp, "postings")):
        return comp
    with staging_tree(comp) as staging:
        compact_ann_postings(
            spark, os.path.join(demo, "postings"), os.path.join(staging, "postings")
        )
        with open(os.path.join(staging, "compact_done.json"), "w") as f:
            json.dump({"version": INDEX_VERSION, "tomb_mod": TOMB_MOD}, f)
        publish_staging(staging, comp, marker="compact_done.json")
    prune_stale_keys(comp, sf_dir)
    return comp


@register(
    "op_sim_index_compact",
    tags=("llm", "similarity", "index"),
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_before,
               CAST(COUNT(*) FILTER (WHERE vec_id % 17 = 3) AS BIGINT) AS n_tombstoned,
               CAST(COUNT(*) FILTER (WHERE vec_id % 17 != 3) AS BIGINT) AS n_after,
               TRUE AS tombstones_dropped,
               TRUE AS survivors_identical,
               TRUE AS segments_merged
        FROM embeddings
    """,
)
def op_sim_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETES + COMPACTION — the index-lifecycle step after
    build/upsert/stream-append: real vector stores tombstone deleted
    vectors and periodically merge small append segments (the
    Milvus/FAISS segment-merge op_stream_index_ingest's docstring
    gestures at; Lucene's forceMerge is the lexical twin). Input is
    the upsert demo tree, which by construction holds TWO parquet
    segments per non-empty cell (base write + delta append); the
    tombstone set is the deterministic pmod(vec_id,17)==3 slice (~6%).
    Compaction reads the postings once, drops tombstoned rows, and
    rewrites ONE segment per cell into a fresh staged tree (atomic
    publish + superseded-key GC, the build_ann_index discipline) —
    never mutating the input tree, so a crash mid-compaction leaves
    the old index serving.

    Audited on the PERSISTED trees (counts hash-compare vs DuckDB):
    - ``n_before`` / ``n_tombstoned`` / ``n_after``: postings rows in
      the input tree, rows matching the tombstone predicate, rows
      surviving — the input tree covers every corpus vector exactly
      once (op_sim_index_upsert's full_coverage), so DuckDB replays
      all three from the embeddings table.
    - ``tombstones_dropped``: zero tombstoned ids remain in the
      compacted tree and its row count is exactly n_before -
      n_tombstoned.
    - ``survivors_identical``: every surviving (vec_id, codes,
      cent_id) is bit-identical across the trees — compaction moved
      bytes, never re-encoded (the serve-equality pytest additionally
      pins bit-equal ADC serving, tests/test_llmdata.py).
    - ``segments_merged``: the compacted tree holds strictly fewer
      parquet files than the input (measured 2 segments/cell -> 1) —
      filesystem metadata, measured in the driver and emitted as a
      literal.

    At 100 TB compaction is the same plan per cell-range: partition
    pruning scopes the read to the cells being compacted, survivors
    stream through one shuffle-free rewrite per cell, and the atomic
    rename swaps readers to the merged segments."""
    demo = ensure_upsert_tree(spark, sf_dir)
    comp = ensure_compact_tree(spark, sf_dir)
    tomb = F.pmod(F.col("vec_id"), F.lit(TOMB_MOD)) == TOMB_RESIDUE

    before = spark.read.parquet(os.path.join(demo, "postings")).select(
        "vec_id", "codes", F.col("cent_id").cast("long").alias("cent_id")
    )
    after = spark.read.parquet(os.path.join(comp, "postings")).select(
        "vec_id",
        F.col("codes").alias("a_codes"),
        F.col("cent_id").cast("long").alias("a_cent_id"),
    )
    files_before = _count_parquet_files(os.path.join(demo, "postings"))
    files_after = _count_parquet_files(os.path.join(comp, "postings"))
    bstats = before.agg(
        F.count(F.lit(1)).alias("n_before"),
        F.sum(F.when(tomb, 1).otherwise(0)).alias("n_tombstoned"),
    )
    astats = after.agg(
        F.count(F.lit(1)).alias("n_after_actual"),
        F.sum(F.when(tomb, 1).otherwise(0)).alias("n_tomb_left"),
    )
    ident = after.join(before, "vec_id").agg(
        F.count(F.lit(1)).alias("n_joined"),
        F.sum(
            F.when(
                (F.col("a_codes") == F.col("codes"))
                & (F.col("a_cent_id") == F.col("cent_id")),
                1,
            ).otherwise(0)
        ).alias("n_same"),
    )
    return (
        bstats.join(F.broadcast(astats))
        .join(F.broadcast(ident))
        .select(
            "n_before",
            "n_tombstoned",
            (F.col("n_before") - F.col("n_tombstoned")).alias("n_after"),
            (
                (F.col("n_tomb_left") == 0)
                & (F.col("n_after_actual") == F.col("n_before") - F.col("n_tombstoned"))
            ).alias("tombstones_dropped"),
            (
                (F.col("n_joined") == F.col("n_after_actual"))
                & (F.col("n_same") == F.col("n_after_actual"))
            ).alias("survivors_identical"),
            F.lit(0 < files_after < files_before).alias("segments_merged"),
        )
    )


@register(
    "op_sim_ivfpq_serve_compacted",
    tags=("llm", "similarity", "index"),
    # op_sim_ivfpq_serve's oracle RE-DERIVED over the surviving corpus
    # (embeddings WHERE vec_id % 17 != 3): after deletes + compaction
    # the index must serve the survivor world, per-query values and all
    # — the value-level delete gate the lexical twin
    # (op_lex_index_delete_compact) set the standard for.
    oracle="""
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
            FROM embeddings WHERE vec_id < 4
        ),
        c AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce
            FROM embeddings WHERE vec_id >= 4 AND vec_id % 17 != 3
        )
        SELECT query_id,
               CAST(COUNT(*) FILTER (WHERE list_distance(ce, qe) <= 25.0) AS BIGINT)
                   AS n_exact_within_bound,
               TRUE AS pruned_scan,
               TRUE AS recall_floor_met,
               TRUE AS adc_bitmatch_vs_main
        FROM q, c
        GROUP BY query_id
    """,
)
def op_sim_ivfpq_serve_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SERVING FROM THE COMPACTED TREE — the value-level delete gate
    for the ANN side (round-9 verdict: op_sim_index_compact's oracle
    is counts + audit booleans where op_lex_index_delete_compact
    achieves survivor-recomputed bit-equality; this op closes that
    asymmetry as far as ANN semantics allow): run the full serve
    chain (probe -> ADC -> shortlist -> exact rerank, the verbatim
    ``ivfpq_serve_stages``) against the post-delete compacted
    postings, under op_sim_ivfpq_serve's oracle re-derived over
    ``embeddings WHERE vec_id % 17 != 3`` — per-query VALUES the
    driver hash-compares, not global counts.

    The trained structure (coarse centroids + codebooks) is FROZEN
    across delete/compact — deletes never retrain — so the compacted
    tree's ADC scores are exactly replayable from the ORIGINAL index:
    ``adc_bitmatch_vs_main`` recomputes every probed-cell ADC score
    twice, once from the compacted tree's codes and once from the
    main build artifact's codes restricted to survivors, and asserts
    the two score sets are BIT-IDENTICAL pair-for-pair (same count,
    every (query_id, vec_id) joined, every adc_sqdist == — IEEE
    equality, no tolerance). DuckDB cannot replay trained codebooks,
    so this bit-equality referee runs in-query (the
    q_retrieval_pipeline_served cross-path-audit discipline) while
    the oracle hashes what SQL can replay: the per-query survivor
    exact-neighborhood counts, plus the shared pruning/recall audits.
    A deleted corpus member (vec 3 is tombstoned) may still arrive
    as a QUERY — queries are external vectors; only the candidate
    world shrinks.

    At 100 TB this is the query path the morning after a GDPR purge
    ran overnight: same frozen router, same codebooks, strictly
    smaller postings — and this gate is what proves the purge did
    not perturb a single surviving score."""
    comp = ensure_compact_tree(spark, sf_dir)
    coarse, books, main_postings = read_ann_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    tomb = F.pmod(F.col("vec_id"), F.lit(TOMB_MOD)) == TOMB_RESIDUE
    comp_postings = spark.read.parquet(os.path.join(comp, "postings")).select(
        "vec_id", "codes", F.col("cent_id").cast("long").alias("cent_id")
    )
    # the survivor world: candidates / rerank / exact-audit corpus all
    # exclude tombstoned ids; the query slot (vec_id < 4) stays intact.
    # Referee yardstick: the main build artifact restricted to
    # survivors — the shared serve_with_adc_referee body.
    served, audit = serve_with_adc_referee(
        emb,
        emb.filter((F.col("vec_id") < 4) | ~tomb),
        comp_postings,
        main_postings.filter(~tomb),
        coarse,
        books,
    )
    return served.crossJoin(F.broadcast(audit))


def ensure_ann_e2e_tree(spark: SparkSession, sf_dir: str) -> str:
    """Build (idempotently) the COMPOSED-lifecycle end state for the
    ANN family: one lineage walked build -> delta upsert (the
    ensure_upsert_tree end state: full coverage, two segments per
    cell) -> id-LIST tombstone (TOMB_IDS, the purge-request shape) ->
    compact through the shared ``compact_ann_postings`` algebra into
    ONE segment per cell. Staged + atomically published + superseded
    keys pruned; the upsert tree stays live throughout."""
    demo = ensure_upsert_tree(spark, sf_dir)
    e2e = os.path.join(
        _index_root(),
        f"e2e_v{INDEX_VERSION}",
        fingerprint_key(sf_dir, "embeddings.parquet"),
    )
    if (
        os.path.isfile(os.path.join(e2e, "e2e_done.json"))
        and tomb_ids_current(e2e, "e2e_done.json")
        and purge_ledger_current(e2e, os.path.join(e2e, "postings"))
    ):
        return e2e
    with staging_tree(e2e) as staging:
        compact_ann_postings(
            spark,
            os.path.join(demo, "postings"),
            os.path.join(staging, "postings"),
            tombstones=tombstone_ids_df(spark, "vec_id"),
        )
        with open(os.path.join(staging, "e2e_done.json"), "w") as f:
            json.dump({"version": INDEX_VERSION, "tomb_ids": list(TOMB_IDS)}, f)
        publish_staging(staging, e2e, marker="e2e_done.json")
    prune_stale_keys(e2e, sf_dir)
    check_tomb_meta(e2e, "e2e_done.json")  # post-publish invariant
    return e2e


@register(
    "op_sim_lifecycle_e2e",
    tags=("llm", "similarity", "index"),
    # op_sim_ivfpq_serve's oracle re-derived over the NET corpus of the
    # composed lifecycle — every corpus vector upserted, the TOMB_IDS
    # purge list removed — plus the three audit literals. The id list
    # in the SQL is generated from the same TOMB_IDS constant the
    # compactor anti-joins, so the two sides cannot drift.
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
            FROM embeddings WHERE vec_id < 4
        ),
        c AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce
            FROM embeddings
            WHERE vec_id >= 4 AND vec_id NOT IN {TOMB_IDS_SQL}
        )
        SELECT query_id,
               CAST(COUNT(*) FILTER (WHERE list_distance(ce, qe) <= 25.0) AS BIGINT)
                   AS n_exact_within_bound,
               TRUE AS pruned_scan,
               TRUE AS recall_floor_met,
               TRUE AS adc_bitmatch_vs_fresh_encode,
               TRUE AS tombstones_enforced,
               TRUE AS purge_ledger_consistent,
               TRUE AS segments_merged
        FROM q, c
        GROUP BY query_id
    """,
)
def op_sim_lifecycle_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE FULL LIFECYCLE COMPOSED ON ONE LINEAGE — round-11 verdict
    task 2: every transition (build->upsert, upsert->compact,
    stream->serve) was gated in isolation; this op walks ONE tree
    through build -> delta upsert -> id-list tombstone -> compact ->
    serve and holds the END STATE to a fresh encode of the net
    corpus. It also closes task 3's delete-shape gap: the tombstones
    here are an explicit id LIST (TOMB_IDS — the GDPR-purge /
    takedown-set shape), anti-joined by the shared
    ``compact_ann_postings`` algebra, not the residue predicate the
    per-transition gates use.

    Gate: the verbatim probe -> ADC -> shortlist -> exact-rerank
    chain (``ivfpq_serve_stages``) serves from the e2e tree under
    op_sim_ivfpq_serve's oracle re-derived over ``embeddings WHERE
    vec_id NOT IN TOMB_IDS`` — per-query VALUES the driver
    hash-compares. Three referees ride along:

    - ``adc_bitmatch_vs_fresh_encode``: every probed-cell ADC score
      from the e2e tree is IEEE-bit-equal, pair-for-pair with count
      equality both directions, to the score of the SAME survivor
      RE-ENCODED FROM ITS RAW EMBEDDING through the frozen trained
      structure (pq_encode + ivf_assign against the persisted
      codebooks/centroids) — "end state == fresh build over net
      survivors" stated as strongly as ANN semantics allow (a true
      from-scratch build would retrain the router on the survivor
      corpus; deletes must NOT retrain, so the frozen-structure
      fresh encode IS the correct rebuild yardstick). This is
      stronger than the per-transition gates' referee, which compares
      codes COPIED from the same artifact; here the yardstick never
      touches the lineage's bytes.
    - ``tombstones_enforced``: zero TOMB_IDS rows remain in the e2e
      postings AND the survivor count is exactly the upsert tree's
      count minus the purge hits (both sides measured on the
      persisted trees).
    - ``purge_ledger_consistent``: the compaction's persisted purge
      LEDGER (written by the shared compactor inside the same staging
      transaction — the GDPR evidence artifact) records the session
      TOMB_IDS digest and count arithmetic that reproduces the
      tree-measured before/after exactly; a missing ledger fails
      loudly in ``read_purge_ledger``.
    - ``segments_merged``: the e2e tree holds strictly fewer parquet
      files than the 2-segments-per-cell upsert tree.

    At 100 TB this is the whole index lifecycle as it actually runs:
    builds amortize, deltas append O(delta), purges arrive as id
    lists and anti-join map-side (the list broadcasts — it is a
    request, not a corpus), the nightly merge rewrites survivors
    per-cell shuffle-free, and the morning's queries are provably
    the queries a fresh index would serve."""
    demo = ensure_upsert_tree(spark, sf_dir)
    e2e = ensure_ann_e2e_tree(spark, sf_dir)
    main_path = build_ann_index(spark, sf_dir)
    coarse = spark.read.parquet(os.path.join(main_path, "coarse"))
    books = spark.read.parquet(os.path.join(main_path, "codebooks"))
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    tomb_df = tombstone_ids_df(spark, "vec_id")

    e2e_postings = spark.read.parquet(os.path.join(e2e, "postings")).select(
        "vec_id", "codes", F.col("cent_id").cast("long").alias("cent_id")
    )
    # the net-survivor world: candidates/rerank/exact-audit exclude the
    # purged ids; the query slot (vec_id < 4) stays external. Referee
    # yardstick: a FRESH ENCODE of the survivors from raw embeddings
    # through the frozen trained structure — the
    # end-state-equals-rebuild yardstick, computed without touching
    # the lineage's bytes — via the shared serve_with_adc_referee body.
    not_purged = ~F.col("vec_id").isin(*TOMB_IDS)
    surv_emb = emb.filter((F.col("vec_id") >= 4) & not_purged)
    fresh_post = pq_encode(surv_emb, books).join(
        ivf_assign(surv_emb, cents=coarse, form="argmax").select(
            "vec_id", "cent_id"
        ),
        "vec_id",
    )
    served, eqa = serve_with_adc_referee(
        emb,
        emb.filter((F.col("vec_id") < 4) | not_purged),
        e2e_postings,
        fresh_post,
        coarse,
        books,
        out_col="adc_bitmatch_vs_fresh_encode",
    )

    # referee 2: the purge actually happened, measured on the persisted
    # trees (zero purged rows left; survivor count == before - hits)
    before = spark.read.parquet(os.path.join(demo, "postings")).select("vec_id")
    after = e2e_postings.select("vec_id")
    b_stats = before.join(F.broadcast(tomb_df), "vec_id", "left_semi").agg(
        F.count(F.lit(1)).alias("n_purge_hits")
    ).crossJoin(before.agg(F.count(F.lit(1)).alias("n_before")))
    a_stats = after.agg(
        F.count(F.lit(1)).alias("n_after"),
        F.sum(F.when(F.col("vec_id").isin(*TOMB_IDS), 1).otherwise(0)).alias(
            "n_tomb_left"
        ),
    )
    # referee 4 rides the same stats frame: the compaction's persisted
    # PURGE LEDGER (the GDPR evidence artifact, round-12 verdict task
    # 5) must attest to exactly this purge — the recorded id-list
    # digest is the session TOMB_IDS digest, and the recorded counts
    # reproduce the before/after arithmetic measured on the trees
    led = read_purge_ledger(os.path.join(e2e, "postings"))
    led_ok = (
        led["purge"].get("kind") == "id_list"
        and led["purge"].get("digest") == purge_ids_digest(TOMB_IDS)
        and led["n_purged"] == led["n_before"] - led["n_after"]
    )
    enforced = b_stats.crossJoin(F.broadcast(a_stats)).select(
        (
            (F.coalesce(F.col("n_tomb_left"), F.lit(0)) == 0)
            & (F.col("n_after") == F.col("n_before") - F.col("n_purge_hits"))
        ).alias("tombstones_enforced"),
        (
            F.lit(bool(led_ok))
            & (F.col("n_before") == F.lit(int(led["n_before"])))
            & (F.col("n_after") == F.lit(int(led["n_after"])))
            & (F.col("n_purge_hits") == F.lit(int(led["n_purged"])))
        ).alias("purge_ledger_consistent"),
    )

    files_before = _count_parquet_files(os.path.join(demo, "postings"))
    files_after = _count_parquet_files(os.path.join(e2e, "postings"))
    audit = (
        eqa.crossJoin(F.broadcast(enforced))
        .withColumn("segments_merged", F.lit(0 < files_after < files_before))
    )
    return served.crossJoin(F.broadcast(audit))


# --- size-tiered segment-merge POLICY (round-15) ---------------------

# The merge policy's knob: merge the K smallest segments per pass —
# the size-tiered idiom (Cassandra/RocksDB STCS, Lucene's
# TieredMergePolicy) a 100 TB index actually runs, where full-tree
# compaction (op_sim_index_compact) is the special case K = all.
MERGE_POLICY_K = 2

# completion marker + manifest names for the policy demo trees
MERGE_MANIFEST = "_merge_manifest.json"


def pick_size_tiered(seg_rows: dict[int, int], k: int = MERGE_POLICY_K) -> list[int]:
    """The POLICY, isolated and pure: given {segment id -> row count},
    pick the K segments to merge — smallest first, segment id as the
    deterministic tiebreak. Everything else in this family is
    mechanism (rewrite + copy + evidence); this function is the part
    a production store would swap out (size-tiered today, leveled or
    time-windowed tomorrow) — unit-tested directly in
    tests/test_llmdata.py::test_pick_size_tiered."""
    return [s for s, _n in sorted(seg_rows.items(), key=lambda kv: (kv[1], kv[0]))[:k]]


def _merge_seg_expr() -> F.Column:
    """Deterministic 4-segment assignment for the policy demo tree:
    vec_id ranges sized ~50/25/15/10% (bounds are integer arithmetic
    on max(vec_id), joined in broadcast as ``b0/b1/b2``), so the
    size-tiered policy has a real size gradient to act on and DuckDB
    replays the same CASE bit-for-bit."""
    return (
        F.when(F.col("vec_id") < F.col("b0"), F.lit(0))
        .when(F.col("vec_id") < F.col("b1"), F.lit(1))
        .when(F.col("vec_id") < F.col("b2"), F.lit(2))
        .otherwise(F.lit(3))
        .cast("int")
    )


def _merge_bounds(emb: DataFrame) -> DataFrame:
    """The three integer segment bounds off max(vec_id) — one 1-row
    frame, broadcast into the per-row CASE (the ensure_upsert_tree
    split discipline)."""
    return emb.agg(
        F.expr("max(vec_id) div 2").cast("long").alias("b0"),
        F.expr("max(vec_id) * 3 div 4").cast("long").alias("b1"),
        F.expr("max(vec_id) * 9 div 10").cast("long").alias("b2"),
    ).localCheckpoint(eager=True)


# the same bounds/CASE as SQL, shared by the oracle so the two sides
# cannot drift (the BM25_CTES f-string-composition convention)
MERGE_SEG_CTES = """
        WITH b AS (
            SELECT MAX(vec_id) // 2 AS b0,
                   MAX(vec_id) * 3 // 4 AS b1,
                   MAX(vec_id) * 9 // 10 AS b2
            FROM embeddings
        ),
        seg AS (
            SELECT vec_id,
                   CASE WHEN vec_id < b0 THEN 0
                        WHEN vec_id < b1 THEN 1
                        WHEN vec_id < b2 THEN 2
                        ELSE 3 END AS seg
            FROM embeddings, b
        )"""


def ensure_merge_base_tree(spark: SparkSession, sf_dir: str) -> str:
    """Build (idempotently) the merge-policy demo INPUT tree: the main
    artifact's postings re-laid-out as FOUR explicit segments
    (partitionBy(seg, cent_id); seg = the deterministic ~50/25/15/10%
    vec_id ranges) — the multi-generation segment pile a streaming
    ingest leaves behind, with segment identity row-visible so the
    policy, the referees, and the DuckDB oracle all read the same
    fact. One file per (seg, cell): the repartition matches the
    partitionBy, so file counts are the segment counts."""
    base = os.path.join(
        _index_root(),
        f"mergebase_v{INDEX_VERSION}",
        fingerprint_key(sf_dir, "embeddings.parquet"),
    )
    if os.path.isfile(os.path.join(base, "merge_base_done.json")):
        return base
    main_path = build_ann_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    bounds = _merge_bounds(emb)
    postings = spark.read.parquet(os.path.join(main_path, "postings")).select(
        "vec_id", "codes", F.col("cent_id").cast("long").alias("cent_id")
    )
    with staging_tree(base) as staging:
        (
            postings.join(F.broadcast(bounds))
            .withColumn("seg", _merge_seg_expr())
            .drop("b0", "b1", "b2")
            .repartition("seg", "cent_id")
            .write.mode("overwrite")
            .partitionBy("seg", "cent_id")
            .parquet(os.path.join(staging, "postings"))
        )
        with open(os.path.join(staging, "merge_base_done.json"), "w") as f:
            json.dump({"version": INDEX_VERSION, "n_segments": 4}, f)
        publish_staging(staging, base, marker="merge_base_done.json")
    prune_stale_keys(base, sf_dir)
    return base


def _seg_dir_digests(postings_dir: str, segs) -> dict[str, str]:
    """{relative path -> sha256} for every parquet file under the
    given seg=N subtrees — the byte-identity evidence for UNTOUCHED
    segments (bounded: demo trees hold one file per (seg, cell); a
    100 TB store compares manifest etags, same contract)."""
    import hashlib

    out: dict[str, str] = {}
    for seg in segs:
        seg_root = os.path.join(postings_dir, f"seg={seg}")
        for root, _dirs, files in os.walk(seg_root):
            for fname in sorted(files):
                if not fname.endswith(".parquet"):
                    continue
                p = os.path.join(root, fname)
                h = hashlib.sha256()
                with open(p, "rb") as f:
                    for chunk in iter(lambda: f.read(1 << 20), b""):
                        h.update(chunk)
                out[os.path.relpath(p, postings_dir)] = h.hexdigest()
    return out


def ensure_merge_policy_tree(spark: SparkSession, sf_dir: str) -> str:
    """Apply the size-tiered policy ONCE to the 4-segment base tree
    (idempotent): pick the MERGE_POLICY_K smallest segments by
    persisted row count, rewrite exactly those into ONE new segment
    (seg id = max + 1, one file per cell), and carry every untouched
    segment over BYTE-FOR-BYTE (os-level file copy — at 100 TB a
    metadata move / hardlink, never a data rewrite: the whole point
    of a policy is that merge cost tracks the SMALL segments, not the
    tree). The merge MANIFEST (segment row counts, picked set, row
    arithmetic, untouched-file digests) is written in the same
    staging transaction — the purge-ledger evidence discipline for a
    merge that deletes nothing but must prove it moved (and only
    moved) what the policy chose."""
    base = ensure_merge_base_tree(spark, sf_dir)
    dest = os.path.join(
        _index_root(),
        f"mergepolicy_v{INDEX_VERSION}",
        fingerprint_key(sf_dir, "embeddings.parquet"),
    )
    if os.path.isfile(os.path.join(dest, "merge_done.json")) and os.path.isfile(
        os.path.join(dest, "postings", MERGE_MANIFEST)
    ):
        return dest
    src_postings = os.path.join(base, "postings")
    src = spark.read.parquet(src_postings).select(
        "vec_id", "codes", "cent_id", F.col("seg").cast("int").alias("seg")
    )
    seg_rows = {
        int(r["seg"]): int(r["n"])
        for r in src.groupBy("seg").agg(F.count(F.lit(1)).alias("n")).collect()
    }  # bounded collect: one row per segment (4 here), never data
    picked = pick_size_tiered(seg_rows, MERGE_POLICY_K)
    untouched = sorted(s for s in seg_rows if s not in picked)
    new_seg = max(seg_rows) + 1
    import shutil as _sh

    with staging_tree(dest) as staging:
        stage_post = os.path.join(staging, "postings")
        (
            src.filter(F.col("seg").isin(*[int(s) for s in picked]))
            .withColumn("seg", F.lit(int(new_seg)).cast("int"))
            .repartition("cent_id")
            .write.mode("overwrite")
            .partitionBy("seg", "cent_id")
            .parquet(stage_post)
        )
        # untouched segments: byte-for-byte carry-over, never re-read
        # through Spark (a rewrite would re-encode row groups and
        # break the byte-identity contract)
        for seg in untouched:
            _sh.copytree(
                os.path.join(src_postings, f"seg={seg}"),
                os.path.join(stage_post, f"seg={seg}"),
            )
        n_after = spark.read.parquet(stage_post).count()
        with open(os.path.join(stage_post, MERGE_MANIFEST), "w") as f:
            json.dump(
                {
                    "version": 1,
                    "policy": "size_tiered",
                    "k": MERGE_POLICY_K,
                    "seg_rows": {str(s): n for s, n in sorted(seg_rows.items())},
                    "picked": [int(s) for s in picked],
                    "new_seg": int(new_seg),
                    "n_before": int(sum(seg_rows.values())),
                    "n_merged_rows": int(sum(seg_rows[s] for s in picked)),
                    "n_after": int(n_after),
                    "untouched_digests": _seg_dir_digests(src_postings, untouched),
                },
                f,
            )
        with open(os.path.join(staging, "merge_done.json"), "w") as f:
            json.dump({"version": INDEX_VERSION}, f)
        publish_staging(staging, dest, marker="merge_done.json")
    prune_stale_keys(dest, sf_dir)
    return dest


@register(
    "op_sim_index_merge_policy",
    tags=("llm", "similarity", "index"),
    # counts replay from the embeddings table through the shared seg
    # CTE (the base tree covers every corpus vector exactly once, the
    # op_sim_index_upsert coverage precedent); the demo's size
    # gradient makes segments {3, 2} the K=2 smallest, so the oracle's
    # seg IN (2, 3) filter IS the policy check at value level — a
    # policy that picked any other pair hash-mismatches n_merged_rows.
    oracle=MERGE_SEG_CTES
    + """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_before,
               CAST(COUNT(*) FILTER (WHERE seg IN (2, 3)) AS BIGINT) AS n_merged_rows,
               CAST(COUNT(*) AS BIGINT) AS n_after,
               CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_segments_before,
               CAST(COUNT(DISTINCT seg) - 1 AS BIGINT) AS n_segments_after,
               TRUE AS picked_smallest_k,
               TRUE AS rows_conserved,
               TRUE AS merged_rows_identical,
               TRUE AS untouched_segments_byte_identical,
               TRUE AS manifest_consistent,
               TRUE AS files_reduced
        FROM seg
    """,
)
def op_sim_index_merge_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIZE-TIERED SEGMENT-MERGE POLICY — the LSM maintenance idiom a
    100 TB index actually runs (r14 verdict task 5): the lifecycle's
    compaction verbs (op_sim_index_compact, the e2e lineages) always
    rewrite the FULL tree; a production store (RocksDB/Cassandra STCS,
    Lucene TieredMergePolicy, Milvus segment merge) instead picks the
    K smallest segments each pass, merges ONLY those, and never
    touches the rest — merge cost tracks the small segments while the
    big, cold ones age in place. Mechanism reuses the family's
    established parts: explicit segment identity in the layout
    (partitionBy(seg, cent_id)), a staged atomic publish, and a
    manifest written in the same transaction as the merge (the
    purge-ledger evidence shape, for a verb that must prove it moved
    — and only moved — what the policy chose).

    Input: the 4-segment base tree (deterministic ~50/25/15/10%
    vec_id ranges of the main artifact's postings — row-visible seg,
    so policy, referees, and the DuckDB oracle all read one fact).
    ``pick_size_tiered`` (pure, unit-tested) picks K=2 by (rows ASC,
    seg ASC) -> {3, 2}; the merge rewrites those into segment 4, one
    file per cell, and carries segments 0/1 over byte-for-byte.

    Value-hashed vs DuckDB: n_before / n_merged_rows / n_after /
    n_segments_before / n_segments_after, all measured on the
    PERSISTED trees and replayed by the oracle through the shared
    MERGE_SEG_CTES — n_merged_rows pins WHICH segments the policy
    picked, not just how many rows moved. Audit booleans (TRUE
    literals in the oracle, computed here for real):

    - ``picked_smallest_k``: re-derives the pick from the persisted
      per-segment counts and compares to the manifest's record;
    - ``rows_conserved``: a merge deletes nothing — per-vec_id
      equi-join between the trees, every row accounted for;
    - ``merged_rows_identical``: every row of the new segment is
      bit-identical (codes, cent_id) to its source row — bytes moved,
      never re-encoded (the survivors_identical discipline);
    - ``untouched_segments_byte_identical``: sha256 of every parquet
      file in segments 0/1 equals the manifest's recorded source
      digests AND the sets of relative paths match — the carry-over
      copied files, it did not rewrite them;
    - ``manifest_consistent``: the manifest's arithmetic holds
      (n_before = sum of seg_rows, n_merged = sum of picked,
      n_after = n_before) and matches the measured counts;
    - ``files_reduced``: the merged tree holds strictly fewer parquet
      files than the base (K cell-files collapse into one per cell).

    At 100 TB each pass is the same bounded plan: partition pruning
    scopes the read to the K picked segments, survivors stream
    through one per-cell rewrite, untouched segments are metadata
    moves, and the atomic rename swaps readers to the merged tree."""
    base = ensure_merge_base_tree(spark, sf_dir)
    merged = ensure_merge_policy_tree(spark, sf_dir)
    man = json.load(open(os.path.join(merged, "postings", MERGE_MANIFEST)))

    before = spark.read.parquet(os.path.join(base, "postings")).select(
        "vec_id", "codes", "cent_id", F.col("seg").cast("int").alias("seg")
    )
    after = spark.read.parquet(os.path.join(merged, "postings")).select(
        F.col("vec_id").alias("a_vec_id"),
        F.col("codes").alias("a_codes"),
        F.col("cent_id").alias("a_cent_id"),
        F.col("seg").cast("int").alias("a_seg"),
    )
    seg_rows = {
        int(r["seg"]): int(r["n"])
        for r in before.groupBy("seg").agg(F.count(F.lit(1)).alias("n")).collect()
    }  # bounded: one row per segment
    picked = pick_size_tiered(seg_rows, MERGE_POLICY_K)
    untouched = sorted(s for s in seg_rows if s not in picked)
    new_seg = max(seg_rows) + 1

    # driver-side referees (filesystem facts -> literals)
    dig_now = _seg_dir_digests(os.path.join(base, "postings"), untouched)
    dig_merged_tree = _seg_dir_digests(os.path.join(merged, "postings"), untouched)
    untouched_ok = (
        dig_now == man["untouched_digests"] == dig_merged_tree and len(dig_now) > 0
    )
    files_before = _count_parquet_files(os.path.join(base, "postings"))
    files_after = _count_parquet_files(os.path.join(merged, "postings"))
    manifest_ok = (
        man["policy"] == "size_tiered"
        and man["k"] == MERGE_POLICY_K
        and man["picked"] == [int(s) for s in picked]
        and man["new_seg"] == new_seg
        and {int(k): v for k, v in man["seg_rows"].items()} == seg_rows
        and man["n_before"] == sum(seg_rows.values())
        and man["n_merged_rows"] == sum(seg_rows[s] for s in picked)
        and man["n_after"] == man["n_before"]
    )

    # measured-count referees on the persisted trees
    bstats = before.agg(
        F.count(F.lit(1)).alias("n_before"),
        F.sum(
            F.when(F.col("seg").isin(*[int(s) for s in picked]), 1).otherwise(0)
        ).alias("n_merged_rows"),
        F.countDistinct("seg").alias("n_segments_before"),
    )
    astats = after.agg(
        F.count(F.lit(1)).alias("n_after_actual"),
        F.countDistinct("a_seg").alias("n_segments_after"),
        F.sum(F.when(F.col("a_seg") == new_seg, 1).otherwise(0)).alias("n_new_seg"),
    )
    # per-row accounting: every base row survives with identical
    # payload; picked rows land in the new segment, untouched rows
    # keep their segment
    ident = before.join(after, F.col("vec_id") == F.col("a_vec_id")).agg(
        F.count(F.lit(1)).alias("n_joined"),
        F.sum(
            F.when(
                (F.col("a_codes") == F.col("codes"))
                & (F.col("a_cent_id") == F.col("cent_id"))
                & (
                    F.col("a_seg")
                    == F.when(
                        F.col("seg").isin(*[int(s) for s in picked]),
                        F.lit(new_seg),
                    ).otherwise(F.col("seg"))
                ),
                1,
            ).otherwise(0)
        ).alias("n_accounted"),
    )
    return (
        bstats.join(F.broadcast(astats))
        .join(F.broadcast(ident))
        .select(
            "n_before",
            "n_merged_rows",
            F.col("n_after_actual").alias("n_after"),
            "n_segments_before",
            "n_segments_after",
            F.lit(picked == man["picked"]).alias("picked_smallest_k"),
            (
                (F.col("n_joined") == F.col("n_before"))
                & (F.col("n_after_actual") == F.col("n_before"))
            ).alias("rows_conserved"),
            (
                (F.col("n_accounted") == F.col("n_joined"))
                & (F.col("n_new_seg") == F.col("n_merged_rows"))
            ).alias("merged_rows_identical"),
            F.lit(bool(untouched_ok)).alias("untouched_segments_byte_identical"),
            F.lit(bool(manifest_ok)).alias("manifest_consistent"),
            F.lit(0 < files_after < files_before).alias("files_reduced"),
        )
    )


@register(
    "op_sim_ivfpq_serve_merged",
    tags=("llm", "similarity", "index"),
    # op_sim_ivfpq_serve's oracle UNCHANGED over the FULL corpus: a
    # merge deletes nothing, so serving from the merged tree must
    # reproduce the main serve path value-for-value (contrast
    # op_sim_ivfpq_serve_compacted, whose oracle re-derives over the
    # survivor world) — plus the ADC bit-equality referee literal.
    oracle="""
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
            FROM embeddings WHERE vec_id < 4
        ),
        c AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce
            FROM embeddings WHERE vec_id >= 4
        )
        SELECT query_id,
               CAST(COUNT(*) FILTER (WHERE list_distance(ce, qe) <= 25.0) AS BIGINT)
                   AS n_exact_within_bound,
               TRUE AS pruned_scan,
               TRUE AS recall_floor_met,
               TRUE AS adc_bitmatch_vs_base
        FROM q, c
        GROUP BY query_id
    """,
)
def op_sim_ivfpq_serve_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SERVING FROM THE POLICY-MERGED TREE — the value-level gate that
    makes the size-tiered pass (op_sim_index_merge_policy) invisible
    by construction, the op_sim_ivfpq_serve_compacted discipline with
    the OPPOSITE corpus contract: compaction serves the SURVIVOR
    world (its oracle re-derives over the non-tombstoned corpus); a
    merge deletes nothing, so this op serves under the main
    op_sim_ivfpq_serve oracle VERBATIM — same per-query values, full
    corpus — and any row the merge lost or re-encoded flips the value
    hash, not just an audit boolean.

    ``adc_bitmatch_vs_base`` (the shared serve_with_adc_referee body)
    additionally recomputes every probed-cell ADC score twice — once
    from the merged tree's codes, once from the 4-segment base tree's
    — and asserts the score sets are BIT-IDENTICAL pair-for-pair:
    the frozen trained structure replays exactly across the segment
    re-layout, the same morning-after guarantee the compacted gate
    gives for purges, here for maintenance merges.

    At 100 TB this is why a store can run its merge policy
    continuously under live traffic: readers atomically swap to the
    merged tree and observe not one changed score."""
    base = ensure_merge_base_tree(spark, sf_dir)
    merged = ensure_merge_policy_tree(spark, sf_dir)
    main_path = build_ann_index(spark, sf_dir)
    coarse = spark.read.parquet(os.path.join(main_path, "coarse"))
    books = spark.read.parquet(os.path.join(main_path, "codebooks"))
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    merged_p = spark.read.parquet(os.path.join(merged, "postings")).select(
        "vec_id", "codes", F.col("cent_id").cast("long").alias("cent_id")
    )
    base_p = spark.read.parquet(os.path.join(base, "postings")).select(
        "vec_id", "codes", F.col("cent_id").cast("long").alias("cent_id")
    )
    served, audit = serve_with_adc_referee(
        emb, emb, merged_p, base_p, coarse, books, out_col="adc_bitmatch_vs_base"
    )
    return served.crossJoin(F.broadcast(audit))
