"""Corpus-construction operators: the sampling / splitting / filtering
/ packing steps between "crawled documents" and "training batches".

Determinism rule: every sampling decision derives from
``md5(salt || doc_id)`` — a pure function of the row, identical in
Spark and DuckDB, independent of partitioning, task retries, and
cluster size. ``rand(seed)`` is none of those things: its value
depends on partition layout, so a node failure or a repartition
changes the sample. Content-hash sampling is the only reproducible
kind at 100 TB.

The first 8 md5 hex chars are a uniform draw on [0, 2^32); comparing
against ``hex(frac * 2^32)`` keeps a ``frac`` fraction. String
comparison on fixed-width lowercase hex is numeric comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from game_data_etl_pipeline_spark.catalog import load_table
from game_data_etl_pipeline_spark.registry import register

# per-language keep fractions (corpus rebalancing: downsample the
# over-represented head, keep the tail) and their 2^32-scaled hex
# thresholds (= frac * 2^32 in lowercase hex, 8 digits)
LANG_FRACTIONS = {
    "en": ("33333333", 0.2),
    "de": ("ffffffff", 1.0),
    "zh": ("ffffffff", 1.0),
    "fr": ("80000000", 0.5),
    "es": ("80000000", 0.5),
}

TRAIN_THRESHOLD = "cccccccc"  # 0.8 * 2^32 — 80/20 train/val
PACK_BUDGET = 2048  # tokens per packed training sequence


def _draw(salt: str) -> Column:
    """Deterministic uniform draw per doc: first 8 hex chars of
    md5(salt || doc_id)."""
    return F.substring(F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))), 1, 8)


def _duck_draw(salt: str) -> str:
    return f"substr(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 8)"


@register(
    "op_sample_stratified",
    tags=("llm", "corpus"),
    oracle=f"""
        SELECT lang, COUNT(*) AS n_kept
        FROM documents
        WHERE {_duck_draw('strat:')} < CASE lang
            {" ".join(f"WHEN '{lang}' THEN '{hx}'" for lang, (hx, _) in LANG_FRACTIONS.items())}
            ELSE '00000000' END
        GROUP BY lang
    """,
)
def op_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus rebalancing: per-language keep fractions via
    content-hash draws (en 20%, fr/es 50%, de/zh 100%). One scan, no
    shuffle until the audit count — the filter itself is a pure
    per-row predicate, reproducible across any cluster shape."""
    docs = load_table(spark, sf_dir, "documents")
    threshold = F.lit("00000000")
    for lang, (hx, _) in LANG_FRACTIONS.items():
        threshold = F.when(F.col("lang") == lang, F.lit(hx)).otherwise(threshold)
    kept = docs.filter(_draw("strat:") < threshold)
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


@register(
    "op_split_train_val",
    tags=("llm", "corpus"),
    oracle=f"""
        SELECT CASE WHEN {_duck_draw('split:')} < '{TRAIN_THRESHOLD}'
                    THEN 'train' ELSE 'val' END AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY 1
    """,
)
def op_split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/20 train/val split. The split of a document
    never changes when the corpus grows — holdout contamination from
    re-sampling is the classic large-pipeline bug this avoids."""
    docs = load_table(spark, sf_dir, "documents")
    split = F.when(_draw("split:") < TRAIN_THRESHOLD, "train").otherwise("val")
    return docs.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "op_quality_filter",
    tags=("llm", "corpus"),
    oracle="""
        WITH scored AS (
            SELECT doc_id, lang, n_chars,
                   len(string_split(text, ' ')) AS n_tokens,
                   len(list_distinct(string_split(text, ' '))) * 1.0
                       / len(string_split(text, ' ')) AS ttr
            FROM documents
        )
        SELECT doc_id, lang,
               CAST(n_tokens AS INT) AS n_tokens,
               CASE WHEN n_tokens >= 20 AND n_chars >= 100 AND ttr >= 0.3
                    THEN 'keep' ELSE 'drop' END AS verdict
        FROM scored
    """,
)
def op_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-training quality gate: minimum length (tokens and chars) and
    lexical diversity (type-token ratio). Emits the verdict instead of
    silently dropping, so the filter is auditable — at scale you
    ALWAYS want the drop reasons queryable."""
    docs = load_table(spark, sf_dir, "documents")
    terms = F.split(F.col("text"), " ")
    n_tokens = F.size(terms)
    ttr = F.size(F.array_distinct(terms)) / n_tokens
    verdict = F.when(
        (n_tokens >= 20) & (F.col("n_chars") >= 100) & (ttr >= 0.3), "keep"
    ).otherwise("drop")
    return docs.select("doc_id", "lang", n_tokens.alias("n_tokens"), verdict.alias("verdict"))


@register(
    "op_text_redact",
    tags=("llm", "corpus"),
    oracle=r"""
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(text, '[0-9]+', '<NUM>', 'g'),
                   '(<NUM> ){2,}<NUM>', '<NUMSEQ>', 'g') AS redacted_head
        FROM (SELECT doc_id, substr(text, 1, 200) AS text FROM documents)
    """,
)
def op_text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrubbing pass: numeric tokens → <NUM>, runs of them → <NUMSEQ>
    (the shape of PII/boilerplate redaction — swap patterns for email/
    phone/SSN in production). Pure regexp_replace: JVM-side, streamed,
    no Python."""
    docs = load_table(spark, sf_dir, "documents")
    head = F.substring("text", 1, 200)
    nums = F.regexp_replace(head, r"[0-9]+", "<NUM>")
    runs = F.regexp_replace(nums, r"(<NUM> ){2,}<NUM>", "<NUMSEQ>")
    return docs.select("doc_id", runs.alias("redacted_head"))


@register(
    "op_pack_sequences",
    tags=("llm", "corpus"),
    oracle=f"""
        WITH sized AS (
            SELECT doc_id, lang,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ),
        packed AS (
            SELECT doc_id, lang, n_tokens,
                   CAST(floor((SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - 1) / {PACK_BUDGET}) AS INT) AS pack_id
            FROM sized
        )
        SELECT lang, pack_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
        FROM packed
        GROUP BY lang, pack_id
    """,
)
def op_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents (per language, deterministic
    doc_id order) to fixed token-budget packs via running-sum bucketing
    — the batch-construction step before training. One shuffle on the
    partition key; the running sum is a window, not a driver loop."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sized = docs.select("doc_id", "lang", n_tokens.alias("n_tokens"))
    packed = sized.withColumn(
        "pack_id", F.floor((F.sum("n_tokens").over(w) - 1) / PACK_BUDGET).cast("int")
    )
    return packed.groupBy("lang", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
    )


@register(
    "op_contamination_check",
    tags=("llm", "corpus"),
    oracle="""
        WITH bench AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id % 100 < 2),
        corpus AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id % 100 >= 2),
        bsh AS (
            SELECT DISTINCT doc_id, UNNEST(list_transform(range(len(t) - 4),
                   i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] || ' ' || t[i+5])) AS s
            FROM bench
        ),
        csh AS (
            SELECT DISTINCT UNNEST(list_transform(range(len(t) - 4),
                   i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] || ' ' || t[i+5])) AS s
            FROM corpus
        )
        SELECT b.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN c.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
               ROUND(SUM(CASE WHEN c.s IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS contamination
        FROM bsh b LEFT JOIN csh c ON b.s = c.s
        GROUP BY b.doc_id
    """,
)
def op_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: for each held-out eval doc
    (doc_id % 100 < 2), the fraction of its distinct 5-gram shingles
    that appear anywhere in the training corpus (the other docs).

    This is the standard n-gram-overlap decontamination pass run
    before training. Scale shape: the corpus side collapses to a
    DISTINCT shingle set (hashes at 100 TB), the benchmark side is
    tiny — the join is benchmark-shingle x corpus-shingle-set equi-
    join, never doc x doc; contamination aggregates per eval doc."""
    docs = load_table(spark, sf_dir, "documents")
    terms = F.split(F.col("text"), " ")
    shingles = F.transform(
        F.sequence(F.lit(0), F.size(terms) - 5),
        lambda i: F.concat_ws(" ", F.slice(terms, i + 1, 5)),
    )
    bench = (
        docs.filter(F.col("doc_id") % 100 < 2)
        .select("doc_id", F.explode(shingles).alias("s"))
        .dropDuplicates(["doc_id", "s"])
    )
    corpus_shingles = (
        docs.filter(F.col("doc_id") % 100 >= 2)
        .select(F.explode(shingles).alias("cs"))
        .distinct()
    )
    hit = F.col("cs").isNotNull()
    return (
        bench.join(corpus_shingles, F.col("s") == F.col("cs"), "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(hit, 1).otherwise(0)).alias("n_contaminated"),
            F.round(
                F.sum(F.when(hit, 1).otherwise(0)) / F.count(F.lit(1)), 6
            ).alias("contamination"),
        )
    )


@register(
    "op_corpus_source_stats",
    tags=("llm", "corpus"),
    oracle="""
        SELECT source,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT md5(text)) AS n_unique,
               ROUND(1.0 - COUNT(DISTINCT md5(text)) * 1.0 / COUNT(*), 6) AS dup_rate,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               ROUND(AVG(n_chars), 4) AS avg_chars
        FROM documents
        GROUP BY source
    """,
)
def op_corpus_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health report: volume, exact-dup rate
    (via content hash, never comparing text bodies), language spread,
    mean length — the triage table that decides which crawl sources
    are worth keeping. One shuffle on the source key."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
        F.round(1.0 - F.countDistinct(F.md5("text")) / F.count(F.lit(1)), 6).alias("dup_rate"),
        F.countDistinct("lang").alias("n_langs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@register(
    "op_embedding_normalize",
    tags=("llm", "similarity"),
    oracle="""
        WITH normed AS (
            SELECT vec_id, label,
                   CAST(embedding AS DOUBLE[]) AS e,
                   sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS l2
            FROM embeddings
        )
        SELECT vec_id, label,
               ROUND(l2, 6) AS l2_norm,
               array_to_string(list_transform(e, x -> CAST(FLOOR(127 * x / l2) AS BIGINT)), ',') AS q8
        FROM normed
    """,
)
def op_embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize + int8-quantize every embedding — the storage/
    bandwidth prep step before ANN indexing (4x smaller vectors, and
    normalized vectors turn cosine into a plain dot product).

    Pure JVM higher-order expressions (transform/aggregate), one
    narrow pass, no shuffle, no UDF. FLOOR (not round) for the
    quantizer: floor is identical across engines while half-way
    rounding is not. Output scalarized (comma-joined) for value
    hashing."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    l2 = F.sqrt(F.aggregate(F.transform(e, lambda x: x * x), F.lit(0.0), lambda a, v: a + v))
    q8 = F.concat_ws(
        ",",
        F.transform(e, lambda x: F.floor(F.lit(127) * x / F.col("l2")).cast("bigint")),
    )
    return (
        emb.withColumn("l2", l2)
        .select("vec_id", "label", F.round("l2", 6).alias("l2_norm"), q8.alias("q8"))
    )


@register(
    "q_corpus_pipeline",
    tags=("llm", "corpus"),
    headline=True,
    oracle=f"""
        WITH dedup AS (
            SELECT doc_id, text, lang, n_chars
            FROM (
                SELECT doc_id, text, lang, n_chars,
                       ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                FROM documents
            ) WHERE rn = 1
        ),
        quality AS (
            SELECT doc_id, text, lang FROM dedup
            WHERE len(string_split(text, ' ')) >= 20
              AND n_chars >= 100
              AND len(list_distinct(string_split(text, ' '))) * 1.0
                  / len(string_split(text, ' ')) >= 0.3
        ),
        sampled AS (
            SELECT doc_id, text, lang FROM quality
            WHERE {_duck_draw('strat:')} < CASE lang
                {" ".join(f"WHEN '{lang}' THEN '{hx}'" for lang, (hx, _) in LANG_FRACTIONS.items())}
                ELSE '00000000' END
        )
        SELECT lang,
               CASE WHEN {_duck_draw('split:')} < '{TRAIN_THRESHOLD}'
                    THEN 'train' ELSE 'val' END AS split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        FROM sampled
        GROUP BY 1, 2
    """,
)
def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship corpus-construction pipeline: exact dedup -> quality
    gate -> per-language stratified downsample -> deterministic
    train/val split -> per-(lang, split) doc and token budget. One
    composed DataFrame chaining the stages the standalone ops pin
    individually — proving the stages compose without materialization
    barriers.

    Plan shape at 100 TB: the only wide stages are the dedup window
    (one shuffle on md5(text) — could swap to groupBy-min for the
    pure-dedup case) and the final tiny aggregation; quality, sampling
    and split are all narrow row-local predicates on content hashes,
    so they fuse into the scan and drop most rows BEFORE the shuffle
    the dedup needs.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    dedup = (
        docs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    terms = F.split(F.col("text"), " ")
    n_tokens = F.size(terms)
    ttr = F.size(F.array_distinct(terms)) / n_tokens
    quality = dedup.filter(
        (n_tokens >= 20) & (F.col("n_chars") >= 100) & (ttr >= 0.3)
    )
    thr = F.lit("00000000")
    for lang, (hx, _) in LANG_FRACTIONS.items():
        thr = F.when(F.col("lang") == lang, hx).otherwise(thr)
    sampled = quality.filter(_draw("strat:") < thr)
    split = F.when(_draw("split:") < TRAIN_THRESHOLD, "train").otherwise("val")
    return sampled.groupBy("lang", split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens).cast("bigint").alias("total_tokens"),
    )


MIX_ALPHA = 0.5  # temperature exponent: alpha<1 flattens the source mix


@register(
    "op_corpus_temperature_mix",
    tags=("llm", "corpus"),
    oracle=f"""
        WITH counts AS (
            SELECT source, CAST(COUNT(*) AS DOUBLE) AS n FROM documents GROUP BY source
        ),
        tot AS (SELECT SUM(n) AS total FROM counts),
        weighted AS (
            SELECT source, n, sqrt(n / total) / (n / total) AS ratio
            FROM counts, tot
        ),
        keepfrac AS (
            SELECT source, n, ratio / (SELECT MAX(ratio) FROM weighted) AS f
            FROM weighted
        ),
        thresholds AS (
            SELECT source, n,
                   lpad(lower(to_hex(CAST(floor(f * 4294967296) AS BIGINT))), 8, '0') AS thr
            FROM keepfrac
        )
        SELECT d.source,
               CAST(t.n AS BIGINT) AS n_source,
               t.thr AS keep_threshold,
               CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM documents d
        JOIN thresholds t ON d.source = t.source
        WHERE {_duck_draw('mix:')} < t.thr
        GROUP BY d.source, t.n, t.thr
    """,
)
def op_corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (the multilingual-training
    reweighting recipe): target mixture q_s ∝ p_s^alpha with
    alpha=0.5, realized by pure subsampling — per-source keep
    fraction f_s ∝ q_s/p_s, normalized so the most-upweighted source
    keeps everything (no upsampling, no duplicated docs).

    Dataflow: one tiny per-source aggregate → keep-fraction dim
    (broadcast back, never a shuffle of documents) → per-row
    content-hash draw against the source's threshold. Thresholds are
    materialized as 8-hex-digit strings with an explicit floor()
    (Spark's double→bigint cast truncates, DuckDB's rounds — the
    floor pins one semantic in both engines), and emitted in the
    output so the mixture decision is auditable. Reproducibility
    follows from the corpus module's hash-draw rule: a doc's fate
    never depends on partitioning or cluster shape.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).cast("double").alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    weighted = counts.crossJoin(F.broadcast(total)).select(
        "source",
        "n",
        # p^MIX_ALPHA realized as sqrt(p): sqrt is IEEE-correctly-
        # rounded in BOTH engines where libm pow(x, 0.5) is not
        # (registry power() rule; lint: test_no_inexact_power_in_oracles).
        # Changing MIX_ALPHA off 0.5 requires re-deriving both sides.
        (F.sqrt(F.col("n") / F.col("total")) / (F.col("n") / F.col("total"))).alias("ratio"),
    )
    max_ratio = weighted.agg(F.max("ratio").alias("max_ratio"))
    thresholds = weighted.crossJoin(F.broadcast(max_ratio)).select(
        "source",
        "n",
        F.lpad(
            F.lower(F.hex(F.floor((F.col("ratio") / F.col("max_ratio")) * F.lit(4294967296.0)).cast("bigint"))),
            8,
            "0",
        ).alias("thr"),
    )
    return (
        docs.join(F.broadcast(thresholds), "source")
        .filter(_draw("mix:") < F.col("thr"))
        .groupBy("source", "n", "thr")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .select(
            "source",
            F.col("n").cast("bigint").alias("n_source"),
            F.col("thr").alias("keep_threshold"),
            F.col("n_kept").cast("bigint"),
        )
    )


@register(
    "op_sample_weighted",
    tags=("corpus", "sample"),
    oracle="""
        WITH draws AS (
            SELECT doc_id, lang, n_chars,
                   (CAST(CONCAT('0x', substr(md5('ws1' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
                       / 4294967296.0 AS u
            FROM documents WHERE n_chars > 0
        ),
        keyed AS (
            SELECT doc_id, lang, n_chars,
                   power(u, 1.0 / n_chars) AS k
            FROM draws
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY k DESC, doc_id) AS rank
            FROM keyed
        )
        SELECT lang, CAST(rank AS INT) AS rank, doc_id,
               CAST(n_chars AS BIGINT) AS n_chars, ROUND(k, 6) AS sample_key
        FROM ranked WHERE rank <= 10
    """,
)
def op_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis):
    each doc draws u ~ Uniform(0,1) and is ranked by key = u^(1/w)
    with w = n_chars; the top-k per language is an exact weighted
    sample — longer documents proportionally likelier, no rejection
    loop, no sequential pass.

    The draw is the registry's deterministic-hash discipline
    (md5(salt || doc_id) → first 8 hex chars → uniform, +0.5 offset
    so u is never exactly 0 for the log/pow), NOT rand(seed): the
    sample is a pure function of the row, reproducible across any
    cluster shape or partition count, and therefore fully
    value-oracled — including the per-language rank order. One
    narrow pass to key, one per-group top-k (TakeOrdered shape, no
    global sort); the E-S key also supports distributed streaming
    merges (keep each partition's top-k, merge keys) at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit("ws1"), F.col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    keyed = docs.select(
        "doc_id", "lang", "n_chars", F.pow(u, 1.0 / F.col("n_chars")).alias("k")
    )
    w = Window.partitionBy("lang").orderBy(F.col("k").desc(), "doc_id")
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("lang", F.col("rank").cast("int"), "doc_id", "n_chars", F.round("k", 6).alias("sample_key"))
    )


@register(
    "op_corpus_domain_cap",
    tags=("llm", "corpus"),
    oracle="""
        WITH ranked AS (
            SELECT source, doc_id, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY source ORDER BY n_chars DESC, doc_id
                   ) AS rank
            FROM documents
        )
        SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 15
    """,
)
def op_corpus_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (Common-Crawl-style domain capping):
    keep at most 15 docs per source, preferring the longest, with a
    deterministic doc_id tie-break.

    Web corpora are Zipf-distributed over domains; without a cap a
    handful of hosts dominate training data. The plan is one shuffle
    on source + a streaming row_number per key. A pathological
    mega-domain concentrates on one task; the mitigation at 100 TB is
    a two-phase cap (pre-cap each map partition to 15 per source
    before the shuffle — the final top-15 is a subset of every
    partial top-15, so partial TakeOrdered per partition is lossless
    and bounds shuffle volume by 15 x sources x partitions)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        docs.select("source", "doc_id", "n_chars")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 15)
        .select("source", "doc_id", "n_chars", F.col("rank").cast("int"))
    )


@register(
    "op_corpus_shard_shuffle",
    tags=("llm", "corpus"),
    oracle="""
        WITH keyed AS (
            SELECT doc_id,
                   md5('shard:' || CAST(doc_id AS VARCHAR)) AS k
            FROM documents
        )
        SELECT CAST(CONCAT('0x', substr(k, 1, 1)) AS INT) AS shard_id,
               doc_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY substr(k, 1, 1) ORDER BY k, doc_id
               ) AS INT) AS pos
        FROM keyed
    """,
)
def op_corpus_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding for training-data
    serving: order docs by md5('shard:' || doc_id) and split into 16
    shards on the first hex nibble. Every epoch reader sees the same
    pseudo-random order regardless of cluster shape, task retries, or
    partition count — the property rand(seed) does NOT have.

    At 100 TB this is the write-side layout op: repartition by
    shard_id, sortWithinPartitions(key), one file per shard; training
    jobs then read shards sequentially with zero further shuffling.
    Here the shard assignment + intra-shard position are the oracled
    output (pos via one window per shard)."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))).alias("k"),
    )
    nib = F.substring("k", 1, 1)
    w = Window.partitionBy(nib).orderBy("k", "doc_id")
    return keyed.select(
        F.conv(nib, 16, 10).cast("int").alias("shard_id"),
        "doc_id",
        F.row_number().over(w).cast("int").alias("pos"),
    )


@register(
    "op_anonymize_ids",
    tags=("llm", "corpus"),
    oracle="""
        SELECT substr(md5('pepper1:' || CAST(user_id AS VARCHAR)), 1, 16) AS pseudo_id,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_source_ids,
               ROUND(SUM(value), 2) AS total_value
        FROM events
        GROUP BY 1
    """,
)
def op_anonymize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed pseudonymization: replace user_id with a peppered-hash
    pseudonym (first 16 hex of md5(pepper || id)) that is consistent
    across rows — joins and group-bys still work on the pseudonym —
    while the raw id never leaves the projection. n_source_ids == 1
    per pseudonym is the collision audit, checked by the oracle.

    Pure per-row expression (no shuffle until the audit group-by), so
    it composes with any downstream op at 100 TB. In production the
    pepper comes from a secret store and rotates per release; a
    truncated hash trades collision probability (16 hex = 64 bits)
    for storage."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.substring(
                F.md5(F.concat(F.lit("pepper1:"), F.col("user_id").cast("string"))), 1, 16
            ).alias("pseudo_id"),
            "user_id",
            "value",
        )
        .groupBy("pseudo_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_source_ids"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "op_length_filter_quantile",
    tags=("llm", "corpus"),
    oracle="""
        WITH bounds AS (
            SELECT quantile_cont(n_chars, 0.05) AS lo,
                   quantile_cont(n_chars, 0.95) AS hi
            FROM documents
        )
        SELECT lang,
               COUNT(*) AS n_kept,
               CAST(MIN(n_chars) AS BIGINT) AS min_chars,
               CAST(MAX(n_chars) AS BIGINT) AS max_chars,
               ROUND(ANY_VALUE(lo), 2) AS p05,
               ROUND(ANY_VALUE(hi), 2) AS p95
        FROM documents, bounds
        WHERE n_chars >= lo AND n_chars <= hi
        GROUP BY lang
    """,
)
def op_length_filter_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-band length filter: drop documents outside the global
    [p05, p95] of n_chars (too short = boilerplate/fragments, too
    long = concatenation junk), report survivors per language.

    The exact percentiles are ONE tiny aggregate (2 doubles) that
    broadcasts into the filter — a classic scalar-subquery-as-
    broadcast plan, no second shuffle of the data. At 100 TB swap
    percentile() for approx_percentile: the bound computation becomes
    a mergeable sketch with the same downstream plan."""
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.expr("percentile(n_chars, 0.05)").alias("lo"),
        F.expr("percentile(n_chars, 0.95)").alias("hi"),
    )
    return (
        docs.join(F.broadcast(bounds), F.lit(True))
        .filter((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.round(F.first("lo"), 2).alias("p05"),
            F.round(F.first("hi"), 2).alias("p95"),
        )
    )


@register(
    "q_corpus_pipeline_v2",
    tags=("llm", "corpus"),
    headline=True,
    oracle="""
        WITH capped AS (
            SELECT doc_id, text, lang, source, n_chars FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY source ORDER BY n_chars DESC, doc_id
                ) AS rnk
                FROM documents
            ) WHERE rnk <= 20
        ),
        bounds AS (
            SELECT quantile_cont(n_chars, 0.05) AS lo,
                   quantile_cont(n_chars, 0.95) AS hi
            FROM capped
        ),
        banded AS (
            SELECT doc_id, text, lang FROM capped, bounds
            WHERE n_chars >= lo AND n_chars <= hi
        ),
        dedup AS (
            SELECT doc_id, text, lang FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY md5(LOWER(TRIM(text))) ORDER BY doc_id
                ) AS rn FROM banded
            ) WHERE rn = 1
        )
        SELECT CAST(CONCAT('0x', substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 1)) AS INT) % 8 AS shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        FROM dedup
        GROUP BY 1
    """,
)
def q_corpus_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-3 composed curation pipeline: per-source domain cap ->
    global [p05,p95] length band -> normalized-text exact dedup ->
    deterministic 8-way shard assignment -> per-shard doc/lang/token
    budget. Chains the stages op_corpus_domain_cap,
    op_length_filter_quantile, op_dedup_normalized and
    op_corpus_shard_shuffle pin individually, as ONE lazy DataFrame.

    Shuffle ledger at 100 TB: cap window (shuffle on source), dedup
    window (shuffle on normalized hash), final shard aggregate — the
    length band is a broadcast scalar and the shard id a pure row
    expression, so 3 wide stages total and every one is keyed on
    something high-cardinality (no skew funnel)."""
    docs = load_table(spark, sf_dir, "documents")
    w_cap = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    capped = (
        docs.withColumn("rnk", F.row_number().over(w_cap))
        .filter(F.col("rnk") <= 20)
        .drop("rnk")
    )
    bounds = capped.agg(
        F.expr("percentile(n_chars, 0.05)").alias("lo"),
        F.expr("percentile(n_chars, 0.95)").alias("hi"),
    )
    banded = capped.join(F.broadcast(bounds), F.lit(True)).filter(
        (F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi"))
    )
    w_dedup = Window.partitionBy(F.md5(F.lower(F.trim("text")))).orderBy("doc_id")
    dedup = (
        banded.withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
    )
    shard = (
        F.conv(F.substring(F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))), 1, 1), 16, 10)
        .cast("int") % 8
    )
    return dedup.groupBy(shard.alias("shard_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias("total_tokens"),
    )


@register(
    "op_corpus_dup_rate_by_source",
    tags=("llm", "corpus", "dedup"),
    oracle="""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,
               ROUND(1.0 - COUNT(DISTINCT md5(text)) * 1.0 / COUNT(*), 6) AS dup_rate
        FROM documents
        GROUP BY source
    """,
)
def op_corpus_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication dashboard: how much of each source is
    exact-duplicate content (1 - distinct/total) — the first number a
    corpus audit reports, and the signal that decides which sources
    earn the expensive fuzzy-dedup pass.

    Hashes shuffle, text bodies never do: md5 reduces each doc to 16
    bytes before the distinct-count aggregate (partial distinct maps
    per partition, merged once). Linear scan + O(sources) output at
    any scale."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5("text")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(h).alias("n_unique_texts"),
        F.round(F.lit(1.0) - F.countDistinct(h) / F.count(F.lit(1)), 6).alias("dup_rate"),
    )


@register(
    "op_corpus_interleave",
    tags=("llm", "corpus"),
    oracle="""
        WITH seq AS (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
            FROM documents
        ),
        src AS (
            SELECT source AS s, DENSE_RANK() OVER (ORDER BY source) - 1 AS src_idx,
                   COUNT(*) OVER () AS n_src
            FROM (SELECT DISTINCT source FROM documents)
        )
        SELECT CAST((rn - 1) * n_src + src_idx AS BIGINT) AS position,
               doc_id, source
        FROM seq JOIN src ON source = s
    """,
)
def op_corpus_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic round-robin source interleave: the training-order
    construction that prevents a data loader from seeing one source in
    a long homogeneous block (the complement of op_corpus_shard_shuffle's
    hash scatter — interleave gives GUARANTEED alternation, shuffle
    gives statistical mixing).

    The position is ARITHMETIC, not a global row_number: round-robin
    slot (rn-1)*n_sources + src_idx, with the tiny source index
    broadcast back. Sparse where a source runs dry, but a total order
    a writer can range-partition on — no single-partition Exchange
    anywhere in the plan, which is what makes this form survive 100 TB
    where a global row_number serializes."""
    docs = load_table(spark, sf_dir, "documents")
    w_src = Window.partitionBy("source").orderBy("doc_id")
    srcs = docs.select("source").distinct()
    src_idx = srcs.select(
        F.col("source").alias("s"),
        (F.dense_rank().over(Window.orderBy("source")) - 1).alias("src_idx"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_src"),
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w_src))
        .join(F.broadcast(src_idx), F.col("source") == F.col("s"))
        .select(
            ((F.col("rn") - 1) * F.col("n_src") + F.col("src_idx")).alias("position"),
            "doc_id",
            "source",
        )
    )


@register(
    "q_curation_pipeline_v3",
    tags=("llm", "corpus"),
    headline=True,
    oracle="""
        WITH cents AS (
            SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS ce
            FROM embeddings WHERE vec_id % 50 = 0
        ),
        assigned AS (
            SELECT vec_id, embedding, cent_id FROM (
                SELECT e.vec_id, e.embedding, c.cent_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.ce) DESC, c.cent_id
                       ) AS rn
                FROM embeddings e, cents c
            ) WHERE rn = 1
        ),
        dropped AS (
            SELECT DISTINCT b.vec_id
            FROM assigned a JOIN assigned b
              ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.3
        ),
        toks AS (
            SELECT doc_id, string_split(text, ' ') AS terms FROM documents
        ),
        spans AS (
            SELECT doc_id,
                   UNNEST(list_transform(range(0, GREATEST(len(terms) - 14, 0), 5),
                          i -> array_to_string(terms[i+1:i+15], ' '))) AS span
            FROM toks
        ),
        flagged AS (
            SELECT doc_id,
                   MIN(doc_id) OVER (PARTITION BY span)
                     != MAX(doc_id) OVER (PARTITION BY span) AS is_dup
            FROM spans
        ),
        frac AS (
            SELECT doc_id,
                   COUNT(*) FILTER (WHERE is_dup) * 1.0 / COUNT(*) AS dup_frac
            FROM flagged
            GROUP BY doc_id
        ),
        curated AS (
            SELECT t.doc_id, len(t.terms) AS n_tokens
            FROM toks t
            LEFT JOIN frac f ON t.doc_id = f.doc_id
            WHERE t.doc_id NOT IN (SELECT vec_id FROM dropped)
              AND COALESCE(f.dup_frac, 0) <= 0.2
              AND len(t.terms) BETWEEN 30 AND 2000
        )
        SELECT d.lang, d.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(c.n_tokens) AS BIGINT) AS total_tokens
        FROM curated c JOIN documents d ON c.doc_id = d.doc_id
        GROUP BY d.lang, d.source
    """,
)
def q_curation_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 composed curation pipeline — the semantic generation of
    the v1/v2 chains: SemDeDup keep-list over embeddings (greedy
    min-id within IVF cells, the op_dedup_semantic_keeplist stage) →
    exact-substring duplication gate (windowed xxhash64 fingerprints,
    the op_dedup_substring_spans stage, dup-span fraction ≤ 0.2) →
    token-count band [30, 2000] → per-(lang, source) curated-corpus
    manifest. One lazy DataFrame end to end.

    Shuffle ledger at 100 TB: IVF assignment window (vec_id), ONE
    cell-id exchange into the blocked-BLAS SemDeDup stage
    (``semdedup_canon`` — replaced the cell SMJ self-join, which
    shuffled the vectors twice and paid an interpreted per-pair dot;
    see its docstring for the measured trade-off), anti join of the
    keep-list (doc_id), ONE span-fingerprint window (fp — min/max
    doc_id per fp replaces the earlier countDistinct aggregate +
    rejoin, which shuffled the span stream twice and computed the
    explode twice), per-doc frac aggregate (doc_id), final manifest
    aggregate (lang, source) — every key high-cardinality except the
    manifest's, which is O(langs × sources). Embedding vectors cross
    to Arrow once per cell; span text never shuffles (digests and
    cell ids do)."""
    curated = curated_docs(spark, sf_dir)
    return curated.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


def curated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The v3 curation chain up to the per-doc survivor set
    (doc_id, lang, source, n_tokens) — shared by q_curation_pipeline_v3
    (manifest aggregate) and q_curation_pipeline_v4 (greedy packing)."""
    from game_data_etl_pipeline_spark.llmdata.dedup import semdedup_canon
    from game_data_etl_pipeline_spark.llmdata.similarity import ivf_assign

    docs = load_table(spark, sf_dir, "documents")
    assigned = ivf_assign(load_table(spark, sf_dir, "embeddings"), form="argmax")
    # one row per dropped vector, already unique — no distinct needed
    dropped = semdedup_canon(assigned).select(F.col("vec_id").alias("doc_id"))
    terms = F.split(F.col("text"), " ")
    spans_arr = F.when(F.size(terms) < 15, F.array()).otherwise(
        F.expr(
            "transform(sequence(0, size(split(text, ' ')) - 15, 5),"
            " i -> xxhash64(array_join(slice(split(text, ' '), i + 1, 15), ' ')))"
        )
    )
    spans = docs.select("doc_id", F.explode(spans_arr).alias("fp"))
    w_fp = Window.partitionBy("fp")
    flagged = spans.select(
        "doc_id",
        (F.min("doc_id").over(w_fp) != F.max("doc_id").over(w_fp)).alias("is_dup"),
    )
    frac = flagged.groupBy("doc_id").agg(
        (F.count(F.when(F.col("is_dup"), 1)) / F.count(F.lit(1))).alias("dup_frac")
    )
    return (
        docs.select("doc_id", "lang", "source", F.size(terms).alias("n_tokens"))
        .join(dropped, "doc_id", "left_anti")
        .join(frac, "doc_id", "left")
        .filter(
            (F.coalesce(F.col("dup_frac"), F.lit(0.0)) <= 0.2)
            & F.col("n_tokens").between(30, 2000)
        )
    )


@register(
    "op_corpus_quality_deciles",
    tags=("llm", "corpus", "quality"),
    oracle="""
        WITH scored AS (
            SELECT doc_id,
                   len(list_distinct(string_split(text, ' '))) * 1.0
                       / len(string_split(text, ' ')) AS score
            FROM documents
        ),
        cuts AS (
            SELECT quantile_cont(score, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
            FROM scored
        )
        SELECT CAST(len(list_filter(qs, c -> score > c)) + 1 AS INT) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(MIN(score), 6) AS min_score,
               ROUND(MAX(score), 6) AS max_score
        FROM scored, cuts
        GROUP BY 1
    """,
)
def op_corpus_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide quality decile assignment WITHOUT a global sort —
    the FineWeb-style 'keep the top X% by quality' gate. The naive
    percent_rank window single-partitions the whole corpus; instead
    pass one reduces to NINE exact decile cut points (one aggregate),
    which broadcast back, and each doc's decile is 1 + (number of cuts
    below its score) — a pure row expression over the broadcast array.

    Score here is the type-token ratio (lexical diversity, one of
    op_text_quality's signals); any mergeable per-doc score drops in.
    At 100 TB swap the exact percentile for approx_percentile in pass
    one (cuts shift within sketch error; assignment stays a row
    expression) — the same two-pass broadcast shape as
    op_agg_winsorize."""
    docs = load_table(spark, sf_dir, "documents")
    terms = F.split(F.col("text"), " ")
    scored = docs.select(
        "doc_id", (F.size(F.array_distinct(terms)) / F.size(terms)).alias("score")
    )
    cuts = scored.agg(
        F.percentile("score", F.array(*[F.lit(q / 10.0) for q in range(1, 10)])).alias("qs")
    )
    decile = (
        F.size(F.filter(F.col("qs"), lambda c: F.col("score") > c)) + 1
    ).cast("int")
    return (
        scored.join(F.broadcast(cuts))
        .groupBy(decile.alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.min("score"), 6).alias("min_score"),
            F.round(F.max("score"), 6).alias("max_score"),
        )
    )


@register(
    "op_pack_greedy",
    tags=("llm", "corpus"),
    oracle=f"""
        WITH RECURSIVE sized AS (
            SELECT doc_id, lang, len(string_split(text, ' ')) AS n,
                   ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS r
            FROM documents
        ),
        walk AS (
            SELECT lang, r, doc_id, n, 0 AS pack_id, n AS fill
            FROM sized WHERE r = 1
            UNION ALL
            SELECT s.lang, s.r, s.doc_id, s.n,
                   CASE WHEN w.fill + s.n <= {PACK_BUDGET}
                        THEN w.pack_id ELSE w.pack_id + 1 END,
                   CASE WHEN w.fill + s.n <= {PACK_BUDGET}
                        THEN w.fill + s.n ELSE s.n END
            FROM walk w JOIN sized s ON s.lang = w.lang AND s.r = w.r + 1
        )
        SELECT doc_id, lang, CAST(pack_id AS INT) AS pack_id,
               CAST(fill AS BIGINT) AS fill_after
        FROM walk
    """,
)
def op_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE greedy sequence packing — the semantics op_pack_sequences
    deliberately approximates: a document NEVER straddles two packs.
    Walk each language's documents in doc_id order; if the current
    pack can't fit the next document, close it and open a new one
    (an oversized single document gets a pack to itself). This is the
    packing real training-batch construction does — the cumsum
    bucketing of op_pack_sequences splits a document across pack
    boundaries, which is fine for budget ACCOUNTING but not for
    building attention-masked training sequences.

    The recurrence is sequential by construction (pack state depends
    on every prior document in the shard), so the Spark side is one
    applyInPandas per shard — an integer loop over the shard's
    (doc_id, n_tokens) pairs, Arrow-batched, never the text bodies —
    and the DuckDB oracle replays the IDENTICAL integer recurrence as
    a recursive CTE (the op_timeseries_ewma pattern: same sequential
    arithmetic on both engines; all-integer state, so no float
    discipline needed at all). Shards here are languages; at 100 TB
    the shard key becomes (lang, file/bucket id) so each group stays
    bounded and packing parallelism scales with the corpus — packing
    is only ever meaningful WITHIN a shard anyway, because training
    shards are shuffled units."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", "lang", F.size(F.split(F.col("text"), " ")).alias("n")
    )
    return sized.groupBy("lang").applyInPandas(
        _greedy_pack_fn(PACK_BUDGET), "doc_id long, lang string, pack_id int, fill_after long"
    )


def _greedy_pack_fn(budget: int):
    """Per-shard first-fit packing loop over (doc_id, lang, n) rows —
    shared by op_pack_greedy and q_curation_pipeline_v4."""
    import pandas as pd

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids, fills = [], []
        pack, fill = -1, 0
        for n in pdf["n"]:
            if pack < 0 or fill + n > budget:
                pack += 1
                fill = int(n)
            else:
                fill += int(n)
            pack_ids.append(pack)
            fills.append(fill)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "pack_id": pack_ids,
                "fill_after": fills,
            }
        )

    return _pack


@register(
    "q_curation_pipeline_v4",
    tags=("llm", "corpus"),
    oracle=f"""
        WITH RECURSIVE cents AS (
            SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS ce
            FROM embeddings WHERE vec_id % 50 = 0
        ),
        assigned AS (
            SELECT vec_id, embedding, cent_id FROM (
                SELECT e.vec_id, e.embedding, c.cent_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.ce) DESC, c.cent_id
                       ) AS rn
                FROM embeddings e, cents c
            ) WHERE rn = 1
        ),
        dropped AS (
            SELECT DISTINCT b.vec_id
            FROM assigned a JOIN assigned b
              ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.3
        ),
        toks AS (
            SELECT doc_id, string_split(text, ' ') AS terms FROM documents
        ),
        spans AS (
            SELECT doc_id,
                   UNNEST(list_transform(range(0, GREATEST(len(terms) - 14, 0), 5),
                          i -> array_to_string(terms[i+1:i+15], ' '))) AS span
            FROM toks
        ),
        flagged AS (
            SELECT doc_id,
                   MIN(doc_id) OVER (PARTITION BY span)
                     != MAX(doc_id) OVER (PARTITION BY span) AS is_dup
            FROM spans
        ),
        frac AS (
            SELECT doc_id,
                   COUNT(*) FILTER (WHERE is_dup) * 1.0 / COUNT(*) AS dup_frac
            FROM flagged
            GROUP BY doc_id
        ),
        curated AS (
            SELECT t.doc_id, d.lang, len(t.terms) AS n
            FROM toks t
            JOIN documents d ON t.doc_id = d.doc_id
            LEFT JOIN frac f ON t.doc_id = f.doc_id
            WHERE t.doc_id NOT IN (SELECT vec_id FROM dropped)
              AND COALESCE(f.dup_frac, 0) <= 0.2
              AND len(t.terms) BETWEEN 30 AND 2000
        ),
        seq AS (
            SELECT doc_id, lang, n,
                   ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS r
            FROM curated
        ),
        walk AS (
            SELECT lang, r, doc_id, n, 0 AS pack_id, n AS fill
            FROM seq WHERE r = 1
            UNION ALL
            SELECT s.lang, s.r, s.doc_id, s.n,
                   CASE WHEN w.fill + s.n <= {PACK_BUDGET}
                        THEN w.pack_id ELSE w.pack_id + 1 END,
                   CASE WHEN w.fill + s.n <= {PACK_BUDGET}
                        THEN w.fill + s.n ELSE s.n END
            FROM walk w JOIN seq s ON s.lang = w.lang AND s.r = w.r + 1
        )
        SELECT lang, CAST(pack_id AS INT) AS pack_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS pack_tokens
        FROM walk
        GROUP BY lang, pack_id
    """,
)
def q_curation_pipeline_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation chain run to its training-batch ENDPOINT: v3's
    survivor set (SemDeDup keep-list → substring-span gate → token
    band) flows straight into TRUE greedy sequence packing
    (op_pack_greedy's first-fit recurrence, shared code) and the
    output is the pack manifest — (lang, pack_id, n_docs,
    pack_tokens), the unit a training job actually consumes. v1-v3
    end at corpus ACCOUNTING; v4 ends at batches.

    Composition cost over v3 is one extra exchange: the curated
    per-doc rows (three int/string columns, no text) shuffle once on
    the shard key into the grouped Arrow packing stage. Everything
    upstream keeps v3's shuffle ledger verbatim (see
    q_curation_pipeline_v3's docstring); the DuckDB oracle appends
    the packing recursive CTE to v3's chain, so the whole composed
    pipeline — semantic dedup through pack assignment — is
    value-oracled end to end."""
    packed = curated_docs(spark, sf_dir).select(
        "doc_id", "lang", F.col("n_tokens").alias("n")
    ).groupBy("lang").applyInPandas(
        _greedy_pack_fn(PACK_BUDGET),
        "doc_id long, lang string, pack_id int, fill_after long",
    )
    return packed.groupBy("lang", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("fill_after").cast("bigint").alias("pack_tokens"),
    )


@register(
    "op_corpus_shard_manifest",
    tags=("llm", "corpus"),
    oracle="""
        WITH keyed AS (
            SELECT doc_id,
                   strlen(text) AS nbytes,
                   md5('shard:' || CAST(doc_id AS VARCHAR)) AS k,
                   CAST(CONCAT('0x', substr(
                       md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15
                   )) AS BIGINT) AS digest
            FROM documents
        )
        SELECT CAST(CONCAT('0x', substr(k, 1, 1)) AS INT) AS shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(nbytes) AS BIGINT) AS total_bytes,
               bit_xor(digest) AS checksum_xor,
               CAST(SUM(digest % 1000000007) % 1000000007 AS BIGINT) AS checksum_sum
        FROM keyed
        GROUP BY 1
    """,
)
def op_corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-publishing integrity manifest: for each of
    op_corpus_shard_shuffle's 16 deterministic shards, the row count,
    total payload bytes, and TWO order-independent content checksums
    (bit-XOR fold and mod-prime sum of per-row md5 digests) — the
    artifact a 100 TB dataset release ships next to its shards so any
    consumer (or the writer itself, re-reading after publish) can
    verify every shard without trusting the transport.

    Order-independence is the load-bearing property: a distributed
    writer materializes each shard's rows in a nondeterministic
    order (task scheduling, retries, AQE coalescing), so a streaming
    hash of the file would be layout-dependent — XOR and modular sum
    are commutative-associative reductions, bit-identical however
    the rows land, and verifiable as a map-side-combinable aggregate
    (one shuffle of 16×4 partial states per verification pass, no
    re-sort). The digest is the first 15 md5 hex digits (< 2^60, so
    the BIGINT mod-sum cannot overflow below ~2^63-2^60 rows/shard);
    keying it on doc_id || ':' || text makes both content AND id
    assignment tamper-evident. Spark's conv(hex,16,10) and DuckDB's
    0x-prefix cast were probe-verified to agree bit-exactly, as were
    bit_xor and the mod-prime sum.
    """
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))), 1, 1
            ),
            16,
            10,
        )
        .cast("int")
        .alias("shard_id"),
        F.octet_length("text").alias("nbytes"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("digest"),
    )
    return keyed.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nbytes").alias("total_bytes"),
        F.expr("bit_xor(digest)").alias("checksum_xor"),
        (F.sum(F.col("digest") % 1000000007) % 1000000007).alias("checksum_sum"),
    )


def shard_manifest(spark: SparkSession, sf_dir: str, n_shards: int) -> DataFrame:
    """op_corpus_shard_manifest generalized to ANY shard count: the
    shard key becomes (first 8 md5 hex digits as BIGINT) % n_shards —
    uniform for arbitrary n where the single-nibble form only divides
    by 16 — while the order-independent checksum aggregate is shared
    unchanged. A publisher re-sharding a release (16-way archive ->
    32-way serving layout, say) recomputes the manifest with one
    parameter; nothing about the verification story depends on the
    count. op_corpus_shard_manifest keeps its original first-nibble
    key (its n=16 special case) for round-over-round row continuity."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % n_shards
        )
        .cast("int")
        .alias("shard_id"),
        F.octet_length("text").alias("nbytes"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("digest"),
    )
    return keyed.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nbytes").alias("total_bytes"),
        F.expr("bit_xor(digest)").alias("checksum_xor"),
        (F.sum(F.col("digest") % 1000000007) % 1000000007).alias("checksum_sum"),
    )


@register(
    "op_corpus_shard_manifest_32",
    tags=("llm", "corpus"),
    oracle="""
        WITH keyed AS (
            SELECT doc_id,
                   strlen(text) AS nbytes,
                   CAST(CAST(CONCAT('0x', substr(
                       md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8
                   )) AS BIGINT) % 32 AS INT) AS shard_id,
                   CAST(CONCAT('0x', substr(
                       md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15
                   )) AS BIGINT) AS digest
            FROM documents
        )
        SELECT shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(nbytes) AS BIGINT) AS total_bytes,
               bit_xor(digest) AS checksum_xor,
               CAST(SUM(digest % 1000000007) % 1000000007 AS BIGINT) AS checksum_sum
        FROM keyed
        GROUP BY 1
    """,
)
def op_corpus_shard_manifest_32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The publish-integrity manifest at a SECOND shard count (32-way
    via ``shard_manifest``): proves the manifest machinery is
    count-parametric, not a 16-way one-off — the re-sharding case a
    release pipeline hits when its serving layout diverges from its
    archive layout. Checksum semantics, the order-independence
    guarantee, and the mod-2^60-digest overflow headroom are all
    inherited unchanged; tests/test_llmdata.py additionally pins that
    BOTH counts' manifests are bit-stable under AQE partition
    coalescing toggled on/off (the remaining layout axis a
    distributed writer cannot control)."""
    return shard_manifest(spark, sf_dir, 32)
