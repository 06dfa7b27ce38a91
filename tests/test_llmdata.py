"""Quality assertions for the rows-only LLM-data operators.

The driver can only check that rows-only ops run; these tests pin the
semantics that make them *useful*: the approximate paths (MinHash-LSH,
SimHash, random-projection LSH, HLL) must agree with their exact
counterparts on the fixture corpus. Everything here is deterministic
(fixed seeds, fixed fixture), so the bounds are tight, not flaky.

Ground truth established by probe (sf0.001): documents 8/12 and 0/50
are near-duplicates (exact 3-gram Jaccard 0.974 and 0.952); there are
no exact duplicates (500 distinct md5 over 500 docs).
"""

from __future__ import annotations

from game_data_etl_pipeline_spark import registry

SPECS = registry.all_specs()

# (doc_a, doc_b) pairs with exact 3-gram Jaccard >= 0.9 at sf0.001,
# computed independently with DuckDB (see module docstring).
NEAR_DUP_PAIRS = [(8, 12), (0, 50)]


def test_minhash_finds_known_near_dups(spark, sf_dir):
    """MinHash-LSH candidate set must contain every high-Jaccard pair —
    recall on true near-dups is the whole point of the filter."""
    from game_data_etl_pipeline_spark.llmdata.dedup import minhash_candidate_pairs

    rows = minhash_candidate_pairs(spark, sf_dir).collect()
    candidates = {(r.doc_a, r.doc_b) for r in rows}
    for pair in NEAR_DUP_PAIRS:
        assert pair in candidates, f"near-dup pair {pair} missed by MinHash-LSH"


def test_minhash_agrees_with_exact_jaccard(spark, sf_dir):
    """Candidates' approx Jaccard must track exact Jaccard: the known
    near-dup pairs score high, and the candidate list stays small
    (it's a filter, not a cross join)."""
    from game_data_etl_pipeline_spark.llmdata.dedup import minhash_candidate_pairs

    rows = minhash_candidate_pairs(spark, sf_dir).collect()
    by_pair = {(r.doc_a, r.doc_b): r.approx_jaccard for r in rows}
    for pair in NEAR_DUP_PAIRS:
        assert by_pair[pair] >= 0.8, f"{pair}: approx jaccard {by_pair[pair]} too low"
    # 200-doc window -> 19900 possible pairs; the filter must prune hard
    assert len(rows) < 200


def test_minhash_audit_is_green(spark, sf_dir):
    """The registered self-validating form: all truth pairs caught,
    candidate set pruned — the booleans the driver oracle pins."""
    rows = SPECS["op_dedup_minhash"].fn(spark, sf_dir).collect()
    assert len(rows) == 1
    assert rows[0].all_true_pairs_caught
    assert rows[0].candidates_pruned
    assert rows[0].n_true_pairs >= 1


def test_simhash_near_dups_have_close_signatures(spark, sf_dir):
    """Near-duplicate docs must land within Hamming distance 3 on the
    16-bit signature (random pairs average ~4.6 on this corpus; the
    known near-dups measure 0 and 3)."""
    sig = {r.doc_id: r.simhash16 for r in SPECS["op_dedup_simhash"].fn(spark, sf_dir).collect()}
    assert len(sig) == 500  # one signature per doc
    for a, b in NEAR_DUP_PAIRS:
        ham = bin(sig[a] ^ sig[b]).count("1")
        assert ham <= 3, f"simhash({a},{b}) hamming {ham}"


def test_lsh_ann_recall_vs_exact(spark, sf_dir, duck):
    """Random-projection LSH top-5 for query vec_id=1 must recall >= 3
    of the exact Euclidean top-5 (measured: 5/5 with seed 42)."""
    from game_data_etl_pipeline_spark.llmdata.similarity import lsh_topk

    approx = [r.neighbor_id for r in lsh_topk(spark, sf_dir).collect()]
    exact = [
        r[0]
        for r in duck.execute(
            """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) qe FROM embeddings WHERE vec_id = 1)
            SELECT vec_id FROM embeddings, q WHERE vec_id != 1
            ORDER BY list_distance(CAST(embedding AS DOUBLE[]), qe) LIMIT 5
            """
        ).fetchall()
    ]
    assert len(set(approx) & set(exact)) >= 3


def test_approx_distinct_within_tolerance(spark, sf_dir, duck):
    """HLL approx_count_distinct must be within 10% of the exact count
    per group (2x the configured rsd=0.05 — rsd is a standard
    deviation, not a hard bound)."""
    rows = SPECS["op_agg_approx_distinct"].fn(spark, sf_dir).collect()
    exact = dict(
        duck.execute(
            "SELECT l_returnflag, COUNT(DISTINCT l_orderkey) FROM lineitem GROUP BY 1"
        ).fetchall()
    )
    for r in rows:
        true = exact[r.l_returnflag]
        assert r.exact_orders == true
        assert r.within_tol, f"{r.l_returnflag}: HLL estimate drifted >10% from exact {true}"


def test_dot_pandas_matches_jvm_expression(spark, sf_dir):
    """The Arrow/numpy dot kernel must agree with the higher-order
    aggregate expression it can replace (float64 both paths)."""
    from pyspark.sql import functions as F

    from game_data_etl_pipeline_spark.catalog import load_table
    from game_data_etl_pipeline_spark.llmdata.similarity import dot_expr, dot_pandas

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    pair = emb.alias("a").crossJoin(emb.alias("b")).select(
        F.round(dot_expr(F.col("a.embedding"), F.col("b.embedding")), 6).alias("jvm"),
        F.round(dot_pandas()(F.col("a.embedding"), F.col("b.embedding")), 6).alias("py"),
    )
    assert pair.filter(F.col("jvm") != F.col("py")).count() == 0


def test_kmeans_converges_and_partitions_corpus(spark, sf_dir):
    """Lloyd iterations must (a) assign every vector exactly once per
    iteration, and (b) never decrease mean similarity-to-centroid
    (inertia's cosine dual is monotone non-decreasing up to float
    noise) — the convergence property that makes the loop terminate."""
    from pyspark.sql import functions as F

    from game_data_etl_pipeline_spark.llmdata.cluster import kmeans_iterations

    sims = []
    for _, assigned in kmeans_iterations(spark, sf_dir):
        n, mean_sim = assigned.agg(
            F.count(F.lit(1)), F.avg("sim_to_centroid")
        ).first()
        assert n == 500  # every vector assigned exactly once
        sims.append(mean_sim)
    for prev, cur in zip(sims, sims[1:]):
        assert cur >= prev - 1e-9, f"mean similarity regressed: {sims}"


def test_ivf_matches_exact_topk_on_probed_cell(spark, sf_dir):
    """IVF results must be a subset of the full exact ranking ordered
    consistently: every returned neighbor's cosine must be <= the
    previous rank's (correct per-cell ordering)."""
    rows = SPECS["op_sim_ivf"].fn(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r.cosine)
    assert set(by_q) == {1, 2, 3}
    for q, cosines in by_q.items():
        assert cosines == sorted(cosines, reverse=True), f"query {q} ordering broken"


def test_quantize_error_bounded_by_half_step(spark, sf_dir):
    """Int8 min/max quantization: every reconstruction error is at most
    scale/2 = (max-min)/510 per component, so the per-vector MEAN
    must respect the same bound."""
    rows = SPECS["op_embedding_quantize"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        half_step = (r.q_max - r.q_min) / 510.0
        assert r.mean_abs_err <= half_step + 1e-9, (r.vec_id, r.mean_abs_err, half_step)


def test_rerank_recall_at_least_single_probe(spark, sf_dir):
    """Multi-probe (top-2 cells) candidate generation is a superset of
    single-probe IVF, so rerank's top-3 agreement with exact top-3
    must be >= op_sim_ivf's for the same queries."""
    exact = SPECS["op_sim_cosine_topk"].fn(spark, sf_dir).collect()
    truth = {q: set() for q in (1, 2, 3)}
    for r in exact:
        if r.query_id in truth and r.rank <= 3:
            truth[r.query_id].add(r.neighbor_id)

    def hits(name):
        got = {}
        for r in SPECS[name].fn(spark, sf_dir).collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(len(got.get(q, set()) & truth[q]) for q in truth)

    assert hits("op_sim_rerank") >= hits("op_sim_ivf")


def test_countmin_never_undercounts(spark, sf_dir):
    """The count-min estimate is a min over hashed cell sums, each of
    which includes every occurrence of the term — overcount >= 0
    always, and estimates are exact when no collision lands in all
    four rows."""
    rows = SPECS["op_agg_countmin"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.overcount >= 0, (r.term, r.exact_n, r.cm_est)


def test_containment_catches_asymmetric_overlap(spark, sf_dir):
    """Containment pairs must include the known near-dup pairs in BOTH
    directions (symmetric near-dups are mutually contained)."""
    rows = SPECS["op_dedup_containment"].fn(spark, sf_dir).collect()
    pairs = {(r.doc_a, r.doc_b) for r in rows}
    for a, b in NEAR_DUP_PAIRS:
        assert (a, b) in pairs and (b, a) in pairs, (a, b, sorted(pairs)[:10])


def test_knn_graph_invariants(spark, sf_dir):
    from game_data_etl_pipeline_spark.llmdata.similarity import op_sim_knn_graph

    df = op_sim_knn_graph(spark, sf_dir).cache()
    import pyspark.sql.functions as F

    per_src = df.groupBy("vec_id").agg(F.count("*").alias("n"), F.max("rank").alias("mr"))
    assert per_src.filter("n > 3").count() == 0
    assert df.filter("vec_id = neighbor_id").count() == 0
    assert df.filter("cosine > 1.0001 OR cosine < -1.0001").count() == 0
    df.unpersist()


def test_semantic_keeplist_invariants(spark, sf_dir):
    from game_data_etl_pipeline_spark.llmdata.dedup import op_dedup_semantic_keeplist

    df = op_dedup_semantic_keeplist(spark, sf_dir).cache()
    # canonical precedes the doc it replaces; kept docs are their own canonical
    assert df.filter("canonical_id > vec_id").count() == 0
    assert df.filter("kept AND canonical_id != vec_id").count() == 0
    assert df.filter("NOT kept AND canonical_id = vec_id").count() == 0
    df.unpersist()


def test_substring_spans_invariants(spark, sf_dir):
    from game_data_etl_pipeline_spark.llmdata.dedup import op_dedup_substring_spans

    df = op_dedup_substring_spans(spark, sf_dir).cache()
    assert df.filter("n_dup_spans > n_spans").count() == 0
    assert df.filter("dup_span_frac < 0 OR dup_span_frac > 1").count() == 0
    df.unpersist()


def test_line_dedup_removes_corpus_frequent_sentences(spark, tmp_path):
    """The fixture corpus has no verbatim cross-doc sentences (parity
    validates reassembly md5 over all docs); this pins the removal
    path itself on a corpus where a boilerplate sentence repeats."""
    import pyspark.sql.functions as F
    from game_data_etl_pipeline_spark.llmdata.text import op_text_line_dedup

    banner = "subscribe to our newsletter for updates"
    rows = [
        (0, f"unique alpha sentence one. {banner}. tail alpha.", "en", "s", 1),
        (1, f"{banner}. unique beta sentence two.", "en", "s", 1),
        (2, "only original content here. nothing shared at all.", "en", "s", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars int")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in op_text_line_dedup(spark, str(tmp_path)).collect()}
    assert out[0]["n_removed"] == 1 and out[0]["n_kept"] == 2
    assert out[1]["n_removed"] == 1 and out[1]["n_kept"] == 1
    assert out[2]["n_removed"] == 0 and out[2]["n_kept"] == 2
    # doc 1's cleaned text is exactly its unique sentence
    import hashlib
    assert out[1]["cleaned_md5"] == hashlib.md5(b"unique beta sentence two").hexdigest()


def test_pca_power_iteration_audit(spark, sf_dir):
    from game_data_etl_pipeline_spark.llmdata.cluster import op_embedding_pca

    row = op_embedding_pca(spark, sf_dir).first()
    assert row["lambda_monotone"] is True
    assert row["lambda_positive"] is True
    assert row["n_dims"] > 0 and row["n_vectors"] > 0


def test_ivf_trained_fixed_k(spark, sf_dir):
    """The production IVF path: k-means-trained centroids feed
    ivf_assign's ``cents`` contract, capping the assignment at n×k
    for CONSTANT k (the default vec_id%50 set grows k with n — an
    oracle-determinism device, not the scale path; see the
    ivf_assign docstring and SCALE.md §quadratic problems)."""
    import pyspark.sql.functions as F
    from game_data_etl_pipeline_spark.catalog import load_table
    from game_data_etl_pipeline_spark.llmdata.cluster import K
    from game_data_etl_pipeline_spark.llmdata.similarity import (
        ivf_assign,
        ivf_trained_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = ivf_trained_centroids(spark, sf_dir)
    # fixed-k contract is an UPPER bound independent of corpus size:
    # _update drops clusters that went empty during a Lloyd step, so a
    # new fixture may legitimately train fewer than K non-empty cells
    # (ADVICE r5 — asserting == K coupled the test to one fixture)
    assert 0 < cents.count() <= K
    assigned = ivf_assign(emb, cents=cents)
    stats = assigned.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("vec_id").alias("n_vecs"),
        F.countDistinct("cent_id").alias("n_cells"),
    ).first()
    n_emb = emb.count()
    # exactly one cell per vector, every cell id from the trained set
    assert stats["n"] == n_emb and stats["n_vecs"] == n_emb
    assert stats["n_cells"] <= K
    ids = {r["cent_id"] for r in assigned.select("cent_id").distinct().collect()}
    assert ids <= set(range(K))


def test_sim_ivf_trained_audit_booleans(spark, sf_dir):
    """op_sim_ivf_trained's audit row must be all-true on the real
    trained assignment (the oracle asserts the same literals; this
    pins it without the driver)."""
    from game_data_etl_pipeline_spark.llmdata.similarity import op_sim_ivf_trained

    row = op_sim_ivf_trained(spark, sf_dir).first()
    assert row["n_vectors"] > 0
    assert row["full_assignment"] is True
    assert row["fixed_k_bound"] is True
    assert row["assignment_is_argmax"] is True


def test_gram_striping_is_result_invariant(spark, sf_dir):
    """The blocked-BLAS cell stages compute their Gram matrices in
    memory-capped stripes; the default cap only splits cells past
    ~2.8k vectors, which no fixture reaches — so this forces a tiny
    cap (one-column/one-row stripes on every fixture cell) and pins
    that the output is IDENTICAL to the unstriped run for BOTH
    consumers. Guards the stripe index arithmetic (the global column
    offset in the row<col mask, the per-stripe self-exclusion), which
    single-stripe runs never exercise."""
    from game_data_etl_pipeline_spark.llmdata import similarity as sim
    from game_data_etl_pipeline_spark.catalog import load_table
    from game_data_etl_pipeline_spark.llmdata.dedup import semdedup_canon
    from game_data_etl_pipeline_spark.llmdata.similarity import ivf_assign

    assigned = ivf_assign(load_table(spark, sf_dir, "embeddings"))

    wide = {tuple(r) for r in semdedup_canon(assigned).collect()}
    narrow = {tuple(r) for r in semdedup_canon(assigned, stripe_bytes=8).collect()}
    assert wide and wide == narrow

    knn = sim.op_sim_knn_graph
    base = {tuple(r) for r in knn(spark, sf_dir).collect()}
    old = sim._GRAM_STRIPE_BYTES
    sim._GRAM_STRIPE_BYTES = 8
    try:
        striped = {tuple(r) for r in knn(spark, sf_dir).collect()}
    finally:
        sim._GRAM_STRIPE_BYTES = old
    assert base and base == striped


def test_ivf_assign_forms_agree(spark, sf_dir):
    """ivf_assign's two physical forms (rank window vs per-row array
    argmax) are interchangeable per consumer ON THE PROMISE that they
    assign identically — same nearest centroid, same min-cent_id
    tie-break. Pin it: any drift (e.g. a comparator change in the
    argmax struct) would silently re-bucket every cell-based op."""
    from game_data_etl_pipeline_spark.catalog import load_table
    from game_data_etl_pipeline_spark.llmdata.similarity import ivf_assign

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    w = {(r["vec_id"], r["cent_id"]) for r in ivf_assign(emb, form="window").select("vec_id", "cent_id").collect()}
    a = {(r["vec_id"], r["cent_id"]) for r in ivf_assign(emb, form="argmax").select("vec_id", "cent_id").collect()}
    assert w and w == a


def test_knn_graph_zero_vector_ranks_last(spark, tmp_path):
    """Zero-norm embeddings have undefined cosine. Contract (the JVM
    NULLS-LAST semantics the blocked-BLAS stage must preserve): a
    zero vector's neighbor rows carry NULL cosine and pick the
    lowest neighbor ids; a zero vector never outranks any real
    cosine (even negative ones) in other vectors' lists; and the
    IVF assignment itself must not raise ANSI DIVIDE_BY_ZERO
    (try_divide -> NULL cs -> deterministic min-cent_id bucket)."""
    import duckdb

    sf = str(tmp_path)
    duckdb.sql(f"""
        COPY (
          SELECT * FROM (VALUES
            (0::BIGINT, [1.0, 0.0, 0.0]::FLOAT[], 1),
            (1::BIGINT, [0.9, 0.1, 0.0]::FLOAT[], 1),
            (2::BIGINT, [0.0, 1.0, 0.0]::FLOAT[], 2),
            (3::BIGINT, [0.0, 0.0, 0.0]::FLOAT[], 3),
            (4::BIGINT, [-1.0, 0.2, 0.0]::FLOAT[], 2)
          ) t(vec_id, embedding, label)
        ) TO '{sf}/embeddings.parquet' (FORMAT PARQUET)
    """)
    rows = SPECS["op_sim_knn_graph"].fn(spark, sf).collect()
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, []).append(r)
    # the zero vector's own list: NULL cosines, lowest neighbor ids
    zero_rows = sorted(by_vec[3], key=lambda r: r.rank)
    assert [r.neighbor_id for r in zero_rows] == [0, 1, 2]
    assert all(r.cosine is None for r in zero_rows)
    # the zero vector never outranks a real cosine: vec 4's true
    # neighbors include two NEGATIVE cosines, which must all beat it
    for vid in (0, 1, 2, 4):
        assert all(r.cosine is not None for r in by_vec[vid]), by_vec[vid]
        assert 3 not in {r.neighbor_id for r in by_vec[vid]}


def test_ivf_assign_rejects_unknown_form(spark, sf_dir):
    """A typo'd form must raise, not silently fall through to the
    window shape (that would defeat the per-consumer measured choice)."""
    import pytest as _pytest

    from game_data_etl_pipeline_spark.catalog import load_table
    from game_data_etl_pipeline_spark.llmdata.similarity import ivf_assign

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    with _pytest.raises(ValueError, match="window.*argmax|argmax.*window"):
        ivf_assign(emb, form="argmx")


def test_ivf_assign_forms_agree_on_empty_centroids(spark, sf_dir):
    """Degenerate EMPTY centroid set: the window form's broadcast join
    yields zero rows; the argmax form must agree (not emit every row
    with a NULL cent_id)."""
    import pyspark.sql.functions as F

    from game_data_etl_pipeline_spark.catalog import load_table
    from game_data_etl_pipeline_spark.llmdata.similarity import ivf_assign, norm_expr

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    none = (
        emb.filter(F.col("vec_id") < 0)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("ce"),
            norm_expr(F.col("embedding")).alias("cnorm"),
        )
    )
    assert ivf_assign(emb, cents=none, form="window").count() == 0
    assert ivf_assign(emb, cents=none, form="argmax").count() == 0


def test_bpe_training_is_deterministic_and_merges_frequent_pairs():
    """Same word-count table -> bit-identical merge list (the property
    that makes the broadcast closure reproducible across executors and
    rounds), and the most frequent word collapses to ONE token."""
    from game_data_etl_pipeline_spark.llmdata.text import _bpe_encode_word, _train_bpe

    wc = [("the", 100), ("there", 30), ("then", 20), ("cat", 5), ("dog", 1)]
    m1 = _train_bpe(wc, n_merges=64)
    m2 = _train_bpe(list(wc), n_merges=64)
    assert m1 == m2 and len(m1) > 0
    ranks = {p: i for i, p in enumerate(m1)}
    assert _bpe_encode_word("the", ranks) == ["the</w>"]
    # an unseen word still encodes (falls back toward characters) and
    # its symbols concatenate losslessly
    syms = _bpe_encode_word("zebra", ranks)
    assert "".join(syms) == "zebra</w>"


def test_bpe_roundtrip_and_band_hold_on_fixture(spark, sf_dir):
    """Every fixture document must detokenize bit-exactly and land in
    the token band — the booleans the oracle asserts TRUE, checked
    here with a hard failure message listing offenders."""
    out = SPECS["op_text_bpe_tokens"].fn(spark, sf_dir)
    bad = out.filter(~(out.roundtrip_ok & out.token_band_ok)).collect()
    assert bad == [], f"BPE audit failed for: {[r.doc_id for r in bad][:5]}"


def test_bpe_compresses_below_char_count(spark, sf_dir):
    """A trained tokenizer must beat character-level tokenization on
    the corpus it was trained on: total BPE tokens < total chars."""
    import pyspark.sql.functions as F

    from game_data_etl_pipeline_spark.catalog import load_table
    from game_data_etl_pipeline_spark.llmdata.text import _bpe_encode_word, _train_bpe

    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "w")
        .limit(512)
        .collect()
    )
    ranks = {p: i for i, p in enumerate(_train_bpe([(r.w, r.n) for r in wc], 256))}
    sample = docs.select("text").limit(50).collect()
    n_toks = sum(
        len(_bpe_encode_word(w, ranks)) for r in sample for w in r.text.split(" ")
    )
    n_chars = sum(len(r.text) for r in sample)
    assert n_toks < n_chars


def test_pq_codes_are_valid_and_deterministic(spark, sf_dir):
    """Every encoded vector gets exactly PQ_M codes, each within
    [0, PQ_KSUB); two independent train+encode runs produce identical
    code tables (deterministic seeds + deterministic tie-breaks)."""
    import pyspark.sql.functions as F

    from game_data_etl_pipeline_spark.catalog import load_table
    from game_data_etl_pipeline_spark.llmdata.similarity import (
        PQ_KSUB,
        PQ_M,
        pq_codebooks,
        pq_encode,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    codes1 = pq_encode(emb, pq_codebooks(spark, sf_dir)).collect()
    assert all(len(r.codes) == PQ_M for r in codes1)
    assert all(0 <= c < PQ_KSUB for r in codes1 for c in r.codes)
    assert len(codes1) == emb.count()
    codes2 = pq_encode(emb, pq_codebooks(spark, sf_dir)).collect()
    assert {r.vec_id: r.codes for r in codes1} == {r.vec_id: r.codes for r in codes2}


def test_pq_adc_recall_floor_holds(spark, sf_dir):
    """The registered query's audit booleans must hold on the fixture
    (the oracle asserts them TRUE; this gives the hard local failure
    with the offending queries listed)."""
    out = SPECS["op_sim_pq_adc"].fn(spark, sf_dir)
    bad = out.filter(~out.recall_floor_met).collect()
    assert bad == [], f"PQ recall floor failed for queries: {[r.query_id for r in bad]}"


def test_pq_adc_separates_synthetic_clusters(spark):
    """ADC must preserve coarse geometry: on a synthetic set with two
    well-separated clusters (A near the origin, B offset by +10 in
    every dim), every vector\'s PQ code array matches its own
    cluster\'s codes far more than the other\'s — i.e. quantization
    error stays small against the cluster gap."""
    import pyspark.sql.functions as F

    from game_data_etl_pipeline_spark.llmdata.similarity import (
        PQ_KSUB,
        PQ_M,
        pq_encode,
        pq_train,
    )

    # 32 vectors per cluster, 64 dims, deterministic jitter; ids
    # interleave clusters so the vec_id < PQ_KSUB seeds see both
    rows = []
    for i in range(64):
        cluster = i % 2
        base = 10.0 * cluster
        vec = [base + ((i * 31 + d * 7) % 13) / 13.0 for d in range(64)]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = pq_train(emb)
    codes = {r.vec_id: tuple(r.codes) for r in pq_encode(emb, cents).collect()}
    assert all(len(c) == PQ_M for c in codes.values())
    assert all(0 <= x < PQ_KSUB for c in codes.values() for x in c)
    # per subspace, the code sets used by the two clusters are disjoint:
    # a 10-unit offset dwarfs the <1-unit jitter, so no sub-centroid can
    # serve both clusters
    for s in range(PQ_M):
        a = {codes[i][s] for i in range(64) if i % 2 == 0}
        b = {codes[i][s] for i in range(64) if i % 2 == 1}
        assert not (a & b), f"subspace {s}: clusters share codes {a & b}"


def test_ivfpq_audits_hold(spark, sf_dir):
    """The composed IVF-PQ query's audit booleans must hold on the
    fixture: every query scanned strictly fewer candidates than exist
    (the pruning contract) AND cleared the recall floor."""
    out = SPECS["op_sim_ivfpq"].fn(spark, sf_dir)
    bad = out.filter(~(out.pruned_scan & out.recall_floor_met)).collect()
    assert bad == [], f"IVF-PQ audit failed for queries: {[r.query_id for r in bad]}"


def test_pack_greedy_invariants(spark, sf_dir):
    """First-fit packing contract: no pack exceeds the budget unless it
    holds a single oversized document; pack ids are contiguous from 0
    per language; fill_after really is the running pack fill."""
    import pyspark.sql.functions as F

    from game_data_etl_pipeline_spark.llmdata.corpus import PACK_BUDGET

    out = SPECS["op_pack_greedy"].fn(spark, sf_dir).collect()
    by_pack: dict[tuple[str, int], list] = {}
    for r in sorted(out, key=lambda r: (r.lang, r.doc_id)):
        by_pack.setdefault((r.lang, r.pack_id), []).append(r)
    # docs in the documents table are whitespace-tokenized; recompute
    # sizes independently to check fills
    docs = {
        r.doc_id: r.n
        for r in SPECS["op_pack_greedy"]
        .fn(spark, sf_dir)
        .sparkSession.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    for (lang, pack), rows in by_pack.items():
        total = sum(docs[r.doc_id] for r in rows)
        assert total <= PACK_BUDGET or len(rows) == 1, (lang, pack, total)
        running = 0
        for r in rows:
            running += docs[r.doc_id]
            assert r.fill_after == running, (lang, pack, r.doc_id)
    for lang in {k[0] for k in by_pack}:
        ids = sorted(p for (la, p) in by_pack if la == lang)
        assert ids == list(range(len(ids))), (lang, ids)


def test_nb_classifier_beats_chance(spark, sf_dir):
    """The trained source classifier's audit booleans must hold on the
    fixture (the oracle asserts them TRUE): train accuracy clears both
    the absolute floor and the 1/n_classes chance rate."""
    out = SPECS["op_text_nb_source_classifier"].fn(spark, sf_dir)
    bad = out.filter(~(out.accuracy_floor_met & out.above_chance)).collect()
    assert bad == [], f"NB audit failed for sources: {[r.source for r in bad][:5]}"


def test_mmr_greedy_invariants(spark, sf_dir):
    """MMR's greedy chain: 5 distinct picks ranked 1..5, and from
    rank 2 onward the selected score is monotone non-increasing —
    for a fixed candidate maxsim can only grow as the selected set
    grows, so step i+1's winner cannot beat step i's (a violation
    means the loop compared against the wrong selected set). Rank 1
    is excluded: its score carries no diversity penalty, and with
    NEGATIVE cosines in play rank 2's penalized score can lawfully
    exceed it (observed on the fixture: 0.16725 < 0.16925)."""
    rows = SPECS["op_sim_mmr"].fn(spark, sf_dir).orderBy("sel_rank").collect()
    assert [r.sel_rank for r in rows] == [1, 2, 3, 4, 5]
    assert len({r.doc_id for r in rows}) == 5
    scores = [r.mmr for r in rows[1:]]
    assert all(scores[i] >= scores[i + 1] for i in range(len(scores) - 1)), scores


def test_shard_manifest_layout_invariant(spark, sf_dir):
    """The manifest's whole point is that its checksums do not depend
    on how a distributed writer lands the rows: recompute the same
    aggregate from a deliberately different layout (repartition(7) on
    a different key, i.e. different partition count AND intra-
    partition order than the scan) and every per-shard row must be
    bit-identical."""
    from game_data_etl_pipeline_spark.catalog import load_table
    from game_data_etl_pipeline_spark.llmdata.corpus import op_corpus_shard_manifest

    base = {r.shard_id: r for r in op_corpus_shard_manifest(spark, sf_dir).collect()}
    assert len(base) == 16

    docs = load_table(spark, sf_dir, "documents").repartition(7, "source")
    docs.createOrReplaceTempView("___manifest_relaid")
    relaid = spark.sql("""
        WITH keyed AS (
            SELECT conv(substr(md5(concat('shard:', CAST(doc_id AS STRING))), 1, 1), 16, 10) AS sid,
                   octet_length(text) AS nbytes,
                   CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':', text)), 1, 15), 16, 10) AS BIGINT) AS digest
            FROM ___manifest_relaid
        )
        SELECT CAST(sid AS INT) AS shard_id, COUNT(*) AS n_docs,
               SUM(nbytes) AS total_bytes, bit_xor(digest) AS checksum_xor,
               SUM(digest % 1000000007) % 1000000007 AS checksum_sum
        FROM keyed GROUP BY 1
    """).collect()
    assert len(relaid) == 16
    for r in relaid:
        b = base[r.shard_id]
        assert (r.n_docs, r.total_bytes, r.checksum_xor, r.checksum_sum) == (
            b.n_docs, b.total_bytes, b.checksum_xor, b.checksum_sum
        ), r.shard_id


def test_pq_train_rejects_undersized_sample(spark):
    """A training frame with fewer than PQ_KSUB vectors must fail with
    the actionable ValueError, not an IndexError from out-of-range
    centroid seeds (round-7 advice)."""
    import pytest

    from game_data_etl_pipeline_spark.llmdata.similarity import PQ_DSUB, PQ_KSUB, PQ_M, pq_train

    dims = PQ_M * PQ_DSUB
    tiny = spark.createDataFrame(
        [(i, [float(i)] * dims) for i in range(PQ_KSUB - 1)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="PQ training sample"):
        pq_train(tiny)


def test_shard_manifest_aqe_coalesce_invariant(spark, sf_dir):
    """The one layout axis test_shard_manifest_layout_invariant does
    not cover: AQE's runtime partition coalescing rewrites the
    post-shuffle partitioning underneath the aggregate — the manifest
    rows (both shard counts) must be bit-identical with it on and
    off, or the 'recompute anywhere, match always' publish-integrity
    claim fails on any cluster that flips the flag."""
    from game_data_etl_pipeline_spark.llmdata.corpus import (
        op_corpus_shard_manifest,
        shard_manifest,
    )

    key = "spark.sql.adaptive.coalescePartitions.enabled"
    orig = spark.conf.get(key)

    def _rows(fn):
        return {r.shard_id: (r.n_docs, r.total_bytes, r.checksum_xor, r.checksum_sum)
                for r in fn().collect()}

    try:
        spark.conf.set(key, "true")
        m16_on = _rows(lambda: op_corpus_shard_manifest(spark, sf_dir))
        m32_on = _rows(lambda: shard_manifest(spark, sf_dir, 32))
        spark.conf.set(key, "false")
        m16_off = _rows(lambda: op_corpus_shard_manifest(spark, sf_dir))
        m32_off = _rows(lambda: shard_manifest(spark, sf_dir, 32))
    finally:
        spark.conf.set(key, orig)
    assert m16_on == m16_off and len(m16_on) == 16
    assert m32_on == m32_off and len(m32_on) == 32
    # 16-way (nibble) and 32-way (mod) keys partition the SAME corpus:
    # global invariants agree even though the assignments differ
    assert sum(v[0] for v in m16_on.values()) == sum(v[0] for v in m32_on.values())
    assert sum(v[1] for v in m16_on.values()) == sum(v[1] for v in m32_on.values())


def test_ivfpq_serve_matches_train_inline(spark, sf_dir):
    """The persisted-index serve path and the train-inline op share
    ivfpq_serve_stages AND deterministic training, so their outputs
    must be row-for-row identical — the consistency guarantee that
    makes the build/serve split safe to adopt (an index that answers
    differently from the inline pipeline is a silent correctness
    regression, not an optimization)."""
    inline = {
        tuple(r) for r in SPECS["op_sim_ivfpq"].fn(spark, sf_dir).collect()
    }
    served = {
        tuple(r) for r in SPECS["op_sim_ivfpq_serve"].fn(spark, sf_dir).collect()
    }
    assert inline == served


def test_filtered_ann_respects_predicate(spark, sf_dir):
    """Every filtered-ANN result must satisfy the metadata predicate
    (lang='de') and carry a dense 1..5 rank per query — the filter
    pushed into the index scan must be airtight, not probabilistic."""
    from game_data_etl_pipeline_spark.catalog import load_table
    from game_data_etl_pipeline_spark.llmdata.retrieval import (
        FILTERED_PROBES,
        _filtered_ann_topk,
    )

    topk, _ = _filtered_ann_topk(spark, sf_dir, probes=FILTERED_PROBES, k=5)
    rows = topk.collect()
    de = {
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .filter("lang = 'de'")
        .select("doc_id")
        .collect()
    }
    by_q = {}
    for r in rows:
        assert r.neighbor_id in de, f"non-de doc {r.neighbor_id} returned"
        by_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == [1, 2, 3, 4, 5], (q, ranks)


def test_retrieval_eval_cosine_anchor_is_perfect(spark, sf_dir):
    """The 'cosine' system IS the label generator, so its metrics must
    be exactly 1.0 — the built-in sanity anchor that catches any drift
    in the integer-DCG table, the label grading, or the rank joins."""
    rows = {r.system: r for r in SPECS["op_retrieval_eval_metrics"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"bm25", "cosine", "rrf"}
    c = rows["cosine"]
    assert (c.ndcg10, c.mrr10, c.recall10) == (1.0, 1.0, 1.0)
    # rrf fuses 10 label docs with 10 bm25 docs: it must always beat
    # or match bm25 on recall of the semantic labels
    assert rows["rrf"].recall10 >= rows["bm25"].recall10


def test_lex_upsert_serve_matches_full_rebuild(spark, sf_dir):
    """Serve-after-upsert must equal a full index rebuild ROW FOR ROW:
    the lexical upsert merges only additive integers (tf/dl per new
    doc, df/n_docs/tot_dl as sums over disjoint doc sets), so the
    upserted tree and the rebuilt tree are value-identical and the
    shared serve path must not be able to tell them apart."""
    upserted = {
        tuple(r) for r in SPECS["op_lex_index_upsert"].fn(spark, sf_dir).collect()
    }
    rebuilt = {
        tuple(r) for r in SPECS["op_text_bm25_serve"].fn(spark, sf_dir).collect()
    }
    assert upserted == rebuilt
    assert len(upserted) > 0


def test_compact_serve_equality_and_fewer_segments(spark, sf_dir):
    """Compaction must be invisible to serving: ADC serving from the
    compacted tree must be bit-identical to serving from the input
    tree minus the tombstoned rows, and the compacted tree must hold
    strictly fewer parquet segments (2 per cell -> 1)."""
    import os as _os

    from game_data_etl_pipeline_spark.catalog import load_table
    from game_data_etl_pipeline_spark.llmdata.ann_index import (
        INDEX_VERSION,
        TOMB_MOD,
        TOMB_RESIDUE,
        _count_parquet_files,
        _index_root,
        ensure_upsert_tree,
        fingerprint_key,
        read_ann_index,
    )
    from pyspark.sql import functions as F

    # run the registered op once: builds both trees, all audits true
    row = SPECS["op_sim_index_compact"].fn(spark, sf_dir).collect()[0]
    assert row.tombstones_dropped and row.survivors_identical and row.segments_merged
    assert row.n_after == row.n_before - row.n_tombstoned

    demo = ensure_upsert_tree(spark, sf_dir)
    comp = _os.path.join(
        _index_root(),
        f"compact_v{INDEX_VERSION}",
        fingerprint_key(sf_dir, "embeddings.parquet"),
    )
    coarse, books, _ = read_ann_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    tomb = F.pmod(F.col("vec_id"), F.lit(TOMB_MOD)) == TOMB_RESIDUE
    from game_data_etl_pipeline_spark.llmdata.similarity import ivfpq_serve_stages

    def _serve(tree: str, drop_tomb: bool) -> set:
        posts = spark.read.parquet(_os.path.join(tree, "postings")).select(
            "vec_id", "codes", F.col("cent_id").cast("long").alias("cent_id")
        )
        if drop_tomb:
            posts = posts.filter(~tomb)
        return {
            tuple(r)
            for r in ivfpq_serve_stages(
                emb, posts.filter(F.col("vec_id") >= 4), coarse, books
            ).collect()
        }

    assert _serve(comp, drop_tomb=False) == _serve(demo, drop_tomb=True)
    assert 0 < _count_parquet_files(
        _os.path.join(comp, "postings")
    ) < _count_parquet_files(_os.path.join(demo, "postings"))


def test_index_fingerprint_staleness(spark, sf_dir, tmp_path, monkeypatch):
    """The (size, mtime_ns) fingerprint is load-bearing for
    correctness: a regenerated fixture at the SAME path must get a
    FRESH index dir (a stale index silently serving old rows would
    pass every plan contract), and the superseded key must be
    GC-pruned after the rebuild."""
    import os as _os
    import shutil as _shutil

    from game_data_etl_pipeline_spark.llmdata import lex_index as lx
    from game_data_etl_pipeline_spark.llmdata.ann_index import ann_index_dir

    fixture = tmp_path / "fixture"
    fixture.mkdir()
    _shutil.copy(_os.path.join(sf_dir, "documents.parquet"), fixture / "documents.parquet")
    _shutil.copy(_os.path.join(sf_dir, "embeddings.parquet"), fixture / "embeddings.parquet")
    monkeypatch.setenv("SPARK_GRAFT_LEX_INDEX_DIR", str(tmp_path / "lexroot"))

    first = lx.build_lex_index(spark, str(fixture))
    assert _os.path.isfile(_os.path.join(first, "meta.json"))
    served_before = {
        tuple(r) for r in lx.bm25_from_index(spark, first).collect()
    }

    # "regenerate" the fixture: same bytes, new mtime -> new fingerprint
    _os.utime(fixture / "documents.parquet", ns=(1_000_000_000, 1_000_000_000))
    second = lx.build_lex_index(spark, str(fixture))
    assert second != first, "mtime change must re-key the artifact"
    assert _os.path.isfile(_os.path.join(second, "meta.json"))
    # GC: the superseded key for the same fixture path is pruned
    assert not _os.path.exists(first), "stale artifact must be GC-pruned"
    # identical bytes -> the fresh index serves identical values
    served_after = {
        tuple(r) for r in lx.bm25_from_index(spark, second).collect()
    }
    assert served_after == served_before

    # the ANN side shares fingerprint_key: same re-key behavior
    ann_first = ann_index_dir(str(fixture))
    _os.utime(fixture / "embeddings.parquet", ns=(2_000_000_000, 2_000_000_000))
    assert ann_index_dir(str(fixture)) != ann_first


def test_publish_staging_loser_discards_and_trusts_winner(tmp_path):
    """Two concurrent builders: the loser's rename fails (target
    exists), it must discard its staging tree and trust the winner's
    marker instead of raising — and force=True must swap atomically
    (old tree renamed aside, never rmtree'd in place)."""
    import json as _json
    import os as _os

    from game_data_etl_pipeline_spark.llmdata.artifacts import (
        make_staging,
        publish_staging,
        prune_stale_keys,
    )

    final = str(tmp_path / "v1" / "root_tmp_fix_100_200")

    def _build(content: str) -> str:
        staging = make_staging(final)
        with open(_os.path.join(staging, "meta.json"), "w") as f:
            _json.dump({"who": content}, f)
        return staging

    s1 = _build("winner")
    publish_staging(s1, final, marker="meta.json")
    assert _json.load(open(_os.path.join(final, "meta.json")))["who"] == "winner"

    s2 = _build("loser")
    publish_staging(s2, final, marker="meta.json")  # must not raise
    assert not _os.path.exists(s2), "loser staging must be discarded"
    assert _json.load(open(_os.path.join(final, "meta.json")))["who"] == "winner"

    # age the LIVE tree far past the grace window before forcing: the
    # rename-aside preserves mtime, so without the displacement-time
    # re-stamp the very next prune pass would reap the trash of any
    # old artifact — the reader window the grace exists to protect
    # opens at DISPLACEMENT time, not at build time
    _os.utime(final, (1_000_000_000, 1_000_000_000))
    s3 = _build("forced")
    publish_staging(s3, final, marker="meta.json", force=True)
    assert _json.load(open(_os.path.join(final, "meta.json")))["who"] == "forced"
    # the displaced tree is renamed aside, NOT deleted: readers that
    # resolved the old path keep their snapshot until the grace expires
    trash_dirs = [
        d for d in _os.listdir(tmp_path / "v1") if ".trash." in d
    ]
    assert len(trash_dirs) == 1
    assert _json.load(
        open(_os.path.join(tmp_path / "v1", trash_dirs[0], "meta.json"))
    )["who"] == "winner"

    # GC: a sibling key for the same fixture path is DISPLACED (renamed
    # aside to a .trash.* name — never rmtree'd in-pass, a reader
    # mid-scan on the just-superseded fingerprint keeps its snapshot
    # through the same grace window force-rebuild trash gets; round-10
    # advice); other fixtures' keys — even ones whose flattened path
    # EXTENDS this one (/root/tmp/fix/sub, /root/tmp/fix_v2) — staging
    # dirs, and fresh trash trees are untouched
    other_key = str(tmp_path / "v1" / "root_tmp_fix_111_222")
    foreign = str(tmp_path / "v1" / "root_other_fix_1_2")
    ext_subdir = str(tmp_path / "v1" / "root_tmp_fix_sub_1_2")
    ext_suffix = str(tmp_path / "v1" / "root_tmp_fix_v2_1_2")
    for d in (other_key, foreign, ext_subdir, ext_suffix):
        _os.makedirs(d)
    prune_stale_keys(final, "/root/tmp/fix")
    assert not _os.path.exists(other_key)
    superseded_trash = [
        d
        for d in _os.listdir(tmp_path / "v1")
        if d.startswith("root_tmp_fix_111_222.trash.")
    ]
    assert len(superseded_trash) == 1, "superseded live key must be displaced, not deleted"
    # a later pass reaps it once aged past the grace
    sup_path = _os.path.join(tmp_path / "v1", superseded_trash[0])
    _os.utime(sup_path, (1_000_000_000, 1_000_000_000))
    prune_stale_keys(final, "/root/tmp/fix")
    assert not _os.path.exists(sup_path), "aged displaced key must be reaped"
    assert _os.path.exists(foreign)
    assert _os.path.exists(ext_subdir), "extension-path key must survive"
    assert _os.path.exists(ext_suffix), "extension-path key must survive"
    assert _os.path.exists(final)
    trash_path = _os.path.join(tmp_path / "v1", trash_dirs[0])
    assert _os.path.exists(trash_path), "fresh trash survives the grace window"
    # age the trash past the grace: the next prune pass reaps it
    _os.utime(trash_path, (1_000_000_000, 1_000_000_000))
    prune_stale_keys(final, "/root/tmp/fix")
    assert not _os.path.exists(trash_path), "aged trash must be reaped"


def test_batch_pipeline_query0_matches_single(spark, sf_dir):
    """Batch query 0 uses the single-query pipeline's exact query
    vector and term set, so its 5 MMR picks (with full provenance)
    must be IDENTICAL to q_retrieval_pipeline's output — the batch
    generalization cannot perturb any per-query result. Every batch
    query must emit exactly K_OUT dense-ranked picks."""
    from game_data_etl_pipeline_spark.llmdata.retrieval import (
        BATCH_QUERY_TERMS,
        K_OUT,
    )

    batch = SPECS["q_retrieval_pipeline_batch"].fn(spark, sf_dir).collect()
    single = SPECS["q_retrieval_pipeline"].fn(spark, sf_dir).collect()
    b0 = {
        (r.sel_rank, r.doc_id, r.lex_rank, r.sem_rank, r.rrf, r.mmr)
        for r in batch
        if r.query_id == 0
    }
    s = {
        (r.sel_rank, r.doc_id, r.lex_rank, r.sem_rank, r.rrf, r.mmr) for r in single
    }
    assert b0 == s
    by_q = {}
    for r in batch:
        by_q.setdefault(r.query_id, []).append(r.sel_rank)
    assert set(by_q) == set(BATCH_QUERY_TERMS)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, K_OUT + 1)), (q, ranks)


def test_batch_served_row_identical(spark, sf_dir):
    """The served batch pipeline (lexical side from the persisted
    inverted index) must be ROW-IDENTICAL to the corpus-scan batch —
    not rank-equivalent, identical: the index parts are the same
    integers and the scoring tail is shared code, so any divergence
    is a build/serve consistency bug."""
    served = {
        tuple(r)
        for r in SPECS["q_retrieval_pipeline_batch_served"].fn(spark, sf_dir).collect()
    }
    inline = {
        tuple(r)
        for r in SPECS["q_retrieval_pipeline_batch"].fn(spark, sf_dir).collect()
    }
    assert served == inline


def test_lex_delete_compact_semantics(spark, sf_dir):
    """The compacted lexical index must (a) contain no tombstoned doc,
    (b) still rank every surviving query-term hit, and (c) have
    actually RE-DERIVED its corpus stats: deleting ~6% of docs shifts
    n_docs/tot_dl/df, so surviving docs' BM25 must differ from the
    full-corpus serve (a compactor that dropped rows but kept stale
    stats would pass (a) and (b) and fail this)."""
    from game_data_etl_pipeline_spark.llmdata.ann_index import TOMB_MOD, TOMB_RESIDUE

    compacted = {
        r.doc_id: (r.bm25, r.n_terms_hit)
        for r in SPECS["op_lex_index_delete_compact"].fn(spark, sf_dir).collect()
    }
    full = {
        r.doc_id: (r.bm25, r.n_terms_hit)
        for r in SPECS["op_text_bm25_serve"].fn(spark, sf_dir).collect()
    }
    assert compacted, "no survivors scored"
    for doc_id in compacted:
        assert doc_id % TOMB_MOD != TOMB_RESIDUE, f"tombstoned doc {doc_id} served"
    surviving_full = {d for d in full if d % TOMB_MOD != TOMB_RESIDUE}
    assert set(compacted) == surviving_full
    # same docs, same n_terms_hit, but shifted scores (IDF re-derived)
    assert all(compacted[d][1] == full[d][1] for d in compacted)
    assert any(compacted[d][0] != full[d][0] for d in compacted), (
        "stats not re-derived: scores identical to the full corpus"
    )


def test_stream_lex_ingest_matches_offline_build(spark, sf_dir):
    """The streaming tokenize path must be indistinguishable from the
    offline build: all audit booleans true, posting count equal to
    the offline index's."""
    import os as _os

    row = SPECS["op_stream_lex_ingest"].fn(spark, sf_dir).collect()[0]
    assert row.full_coverage and row.postings_consistent and row.buckets_bounded
    from game_data_etl_pipeline_spark.llmdata.lex_index import build_lex_index

    main = spark.read.parquet(
        _os.path.join(build_lex_index(spark, sf_dir), "postings")
    ).count()
    assert row.n_postings == main


def test_decontaminate_catches_cross_split_near_dups(spark, sf_dir):
    """The planted near-duplicate pairs straddle the benchmark split
    (12 and 0 land in doc_id%3==0, their twins 8 and 50 in training),
    so decontamination MUST flag docs 8 and 50 — recall on true
    contamination is the op's whole purpose — and must never emit a
    benchmark doc or a hit count below 1."""
    rows = SPECS["op_corpus_decontaminate"].fn(spark, sf_dir).collect()
    flagged = {r.doc_id: r for r in rows}
    for training_twin in (8, 50):
        assert training_twin in flagged, f"contaminated doc {training_twin} missed"
        assert flagged[training_twin].n_bench_docs >= 1
    for r in rows:
        assert r.doc_id % 3 != 0, f"benchmark doc {r.doc_id} in training output"
        assert r.n_hit_shingles >= 1


def test_cold_start_index_lifecycle(spark, sf_dir, tmp_path, monkeypatch):
    """The WHOLE index lifecycle must work from an EMPTY warehouse in
    one process — the state a fresh driver machine is in: both roots
    pointed at empty temp dirs, then build -> serve -> upsert ->
    compact on both modalities plus the streamed ingest, every op
    still matching its DuckDB oracle. Catches any hidden dependency
    on pre-existing artifacts (a serve op that only works because a
    previous round left its tree behind)."""
    import duckdb

    from tests.conftest import make_duck
    from tests.oracle import compare

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "ann"))
    monkeypatch.setenv("SPARK_GRAFT_LEX_INDEX_DIR", str(tmp_path / "lex"))
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR_BLOOM", str(tmp_path / "bloom"))
    con = make_duck(sf_dir)
    try:
        for name in (
            "op_sim_index_build",
            "op_sim_ivfpq_serve",
            "op_sim_index_upsert",
            "op_sim_index_compact",
            "op_text_bm25_serve",
            "op_lex_index_upsert",
            "op_lex_index_delete_compact",
            "op_stream_lex_ingest",
            "op_corpus_decontaminate_bloom_served",
            "op_bloom_saturation_audit",
            "op_bloom_index_upsert",
            "op_stream_ann_serve_compacted",
            "op_sim_lifecycle_e2e",
            "op_lex_lifecycle_e2e",
            "op_bloom_registry_screen",
            "op_bloom_registry_refresh",
            "op_bloom_registry_retire",
        ):
            sdf = SPECS[name].fn(spark, sf_dir)
            problems = compare(sdf, con.execute(SPECS[name].oracle).df(), name)
            assert not problems, (name, problems)
    finally:
        con.close()


def test_bloom_registry_attribution_and_isolation(spark, sf_dir, tmp_path, monkeypatch):
    """The benchmark-keyed filter registry must (a) hold family
    artifacts immutable across registrations — suite_a's persisted
    bytes are captured AFTER its own registration published and
    BEFORE suite_b registers, and must be IDENTICAL afterwards (a
    registry where registering one suite rewrites another's filter
    corrupts that suite's audit trail) — and (b) attribute exactly
    the exact screen's flagged docs: the union of per-family ledger
    rows covers the same doc set op_corpus_decontaminate flags, no
    more, no less (the union filter is exact by monotonicity and the
    per-family rescreen kills false positives)."""
    import hashlib as _hashlib
    import os as _os

    from game_data_etl_pipeline_spark.llmdata import dedup as dd

    def _tree_digest(d):
        h = _hashlib.sha256()
        for root, _dirs, files in sorted(_os.walk(d)):
            for fn in sorted(files):
                with open(_os.path.join(root, fn), "rb") as f:
                    h.update(fn.encode() + f.read())
        return h.hexdigest()

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR_BLOOM", str(tmp_path / "bloom"))
    # (a) register suite_a ALONE, snapshot its published bytes, then
    # let suite_b register into the live tree — the between-the-two-
    # registrations baseline the round-12 review demanded
    path = dd.ensure_bloom_registry(
        spark, sf_dir, families=dd.BLOOM_FAMILIES[:1]
    )
    a_dir = _os.path.join(path, "families", "suite_a")
    before = _tree_digest(a_dir)
    assert dd.ensure_bloom_registry(spark, sf_dir) == path
    assert _tree_digest(a_dir) == before, (
        "suite_b's registration mutated suite_a's artifact"
    )
    # idempotent re-ensure: no family rewrites either
    assert dd.ensure_bloom_registry(spark, sf_dir) == path
    assert _tree_digest(a_dir) == before

    # (b) attribution covers exactly the exact screen's flagged docs
    reg_rows = SPECS["op_bloom_registry_screen"].fn(spark, sf_dir).collect()
    exact_rows = SPECS["op_corpus_decontaminate"].fn(spark, sf_dir).collect()
    assert {r.doc_id for r in reg_rows} == {r.doc_id for r in exact_rows}
    assert all(r.union_equals_full and r.upsert_isolated for r in reg_rows)
    # per-family distinct-hit counts can overlap across families, but
    # each family's count is bounded by the exact screen's total
    exact_hits = {r.doc_id: r.n_hit_shingles for r in exact_rows}
    for r in reg_rows:
        assert 1 <= r.n_hit_shingles <= exact_hits[r.doc_id]


def test_bloom_registry_refresh_semantics(spark, sf_dir, tmp_path, monkeypatch):
    """A family refresh must (a) leave every OTHER family's bytes
    untouched — suite_a's digest is captured between the stale
    registration and the refresh — (b) strictly grow the union here
    (the stale half-snapshot is a strict subset of the full slice, so
    every pre-refresh word must be a bit-subset of its post-refresh
    word and the popcount strictly rises), and (c) land the union
    word-for-word on the full-benchmark filter (re-fold exactness)."""
    import hashlib as _hashlib
    import os as _os

    from pyspark.sql import functions as F

    from game_data_etl_pipeline_spark.catalog import load_table
    from game_data_etl_pipeline_spark.llmdata import dedup as dd
    from game_data_etl_pipeline_spark.llmdata.artifacts import fingerprint_key

    def _tree_digest(d):
        h = _hashlib.sha256()
        for root, _dirs, files in sorted(_os.walk(d)):
            for fn in sorted(files):
                with open(_os.path.join(root, fn), "rb") as f:
                    h.update(fn.encode() + f.read())
        return h.hexdigest()

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR_BLOOM", str(tmp_path / "bloom"))
    final = _os.path.join(
        dd._bloom_root(),
        f"refresh_v{dd.BLOOM_INDEX_VERSION}",
        fingerprint_key(sf_dir, "documents.parquet"),
    )
    dd._register_bloom_family(spark, sf_dir, final, "suite_a", 0, mod=6)
    dd._register_bloom_family(spark, sf_dir, final, "suite_b", 3, mod=12)
    a_dir = _os.path.join(final, "families", "suite_a")
    before = _tree_digest(a_dir)
    stale_union = {
        r.widx: r.bits
        for r in spark.read.parquet(_os.path.join(final, "union_words")).collect()
    }
    dd.refresh_bloom_family(spark, sf_dir, final, "suite_b", 3, mod=6)
    assert _tree_digest(a_dir) == before, "refresh mutated the other family"
    now_union = {
        r.widx: r.bits
        for r in spark.read.parquet(_os.path.join(final, "union_words")).collect()
    }
    # (b) strict monotone growth for this half->full demo
    for widx, bits in stale_union.items():
        assert bits & now_union.get(widx, 0) == bits, "refresh lost a set bit"
    n_prev = sum(bin(b & (2**64 - 1)).count("1") for b in stale_union.values())
    n_now = sum(bin(b & (2**64 - 1)).count("1") for b in now_union.values())
    assert n_prev < n_now, "refresh did not change the filter"
    # (c) re-fold exactness: union == the single full-benchmark filter
    rebuilt = dd.bloom_words(
        dd._shingles(
            load_table(spark, sf_dir, "documents").filter(
                F.pmod(F.col("doc_id"), F.lit(3)) == 0
            )
        )
        .select("g")
        .distinct()
    )
    row = dd.words_bitmatch_audit(
        spark.read.parquet(_os.path.join(final, "union_words")), rebuilt, "eq"
    ).collect()[0]
    assert row.eq, "re-folded union diverged from the full-benchmark filter"


def test_register_predicate_mismatch_self_heals(spark, sf_dir, tmp_path, monkeypatch):
    """Registration's cache test must compare the recorded slice
    predicate, not just the family name (round-12 advice): editing a
    family's snapshot definition and re-ensuring must rebuild THAT
    family via the refresh path — marker re-records the new predicate,
    the family words re-fold from the new snapshot — instead of
    silently serving the stale artifact and failing later in the
    union_equals_full referee."""
    import json as _json
    import os as _os

    from game_data_etl_pipeline_spark.llmdata import dedup as dd
    from game_data_etl_pipeline_spark.llmdata.artifacts import fingerprint_key

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR_BLOOM", str(tmp_path / "bloom"))
    final = _os.path.join(
        dd._bloom_root(),
        f"registry_v{dd.BLOOM_INDEX_VERSION}",
        fingerprint_key(sf_dir, "documents.parquet"),
    )
    dd._register_bloom_family(spark, sf_dir, final, "suite_a", 0, mod=6)
    marker = _os.path.join(final, "registry_done.json")
    with open(marker) as f:
        assert _json.load(f)["families"]["suite_a"] == "doc_id % 6 == 0"

    # same (fam, predicate): pure cache hit, no republish
    mtime = _os.path.getmtime(marker)
    dd._register_bloom_family(spark, sf_dir, final, "suite_a", 0, mod=6)
    assert _os.path.getmtime(marker) == mtime

    # same fam, DIFFERENT predicate: cache miss -> refresh rebuilds the
    # family from the new snapshot and re-records the predicate
    dd._register_bloom_family(spark, sf_dir, final, "suite_a", 3, mod=12)
    with open(marker) as f:
        assert _json.load(f)["families"]["suite_a"] == "doc_id % 12 == 3"
    from pyspark.sql import functions as F

    from game_data_etl_pipeline_spark.catalog import load_table

    fresh = dd.bloom_words(
        dd._shingles(
            load_table(spark, sf_dir, "documents").filter(
                F.pmod(F.col("doc_id"), F.lit(12)) == 3
            )
        )
        .select("g")
        .distinct()
    )
    row = dd.words_bitmatch_audit(
        spark.read.parquet(_os.path.join(final, "families", "suite_a", "words")),
        fresh,
        "eq",
    ).collect()[0]
    assert row.eq, "predicate-mismatch rebuild did not land on the new snapshot"


def test_bloom_registry_retire_semantics(spark, sf_dir, tmp_path, monkeypatch):
    """Retirement must (a) leave every SURVIVING family's bytes
    untouched — suite_a's digest is captured between registration and
    the retirement — (b) drop every attribution to the retired family
    from the screen's ledger while keeping the survivor's rows
    identical, (c) strictly shrink the union (suite_b's bits cleared;
    the post-retire union bit-subsets the preserved pre-retire union
    word for word), (d) refuse to retire the LAST family (an all-zero
    union flags nothing and looks healthy), and (e) be idempotent —
    re-retiring an absent family is a no-op, no republish."""
    import hashlib as _hashlib
    import json as _json
    import os as _os

    import pytest

    from game_data_etl_pipeline_spark.llmdata import dedup as dd
    from game_data_etl_pipeline_spark.llmdata.artifacts import fingerprint_key

    def _tree_digest(d):
        h = _hashlib.sha256()
        for root, _dirs, files in sorted(_os.walk(d)):
            for fn in sorted(files):
                with open(_os.path.join(root, fn), "rb") as f:
                    h.update(fn.encode() + f.read())
        return h.hexdigest()

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR_BLOOM", str(tmp_path / "bloom"))
    final = _os.path.join(
        dd._bloom_root(),
        f"retire_v{dd.BLOOM_INDEX_VERSION}",
        fingerprint_key(sf_dir, "documents.parquet"),
    )
    for fam, residue in dd.BLOOM_FAMILIES:
        dd._register_bloom_family(spark, sf_dir, final, fam, residue)
    a_dir = _os.path.join(final, "families", "suite_a")
    before = _tree_digest(a_dir)
    # the two-family screen's ledger, as the pre-retire baseline
    pre_rows = dd._registry_screen_frames(
        spark, sf_dir, final, "eq", "iso"
    )[1].collect()
    prev_union = {
        r.widx: r.bits
        for r in spark.read.parquet(_os.path.join(final, "union_words")).collect()
    }

    dd.retire_bloom_family(spark, sf_dir, final, "suite_b")
    assert _tree_digest(a_dir) == before, "retire mutated the surviving family"
    with open(_os.path.join(final, "registry_done.json")) as f:
        assert list(_json.load(f)["families"]) == ["suite_a"]
    assert not _os.path.isdir(_os.path.join(final, "families", "suite_b"))

    # (b) ledger: suite_b attributions gone, suite_a rows identical
    post_rows = SPECS["op_bloom_registry_retire"].fn(spark, sf_dir).collect()
    key = lambda r: (r.doc_id, r.benchmark_id, r.n_hit_shingles, r.n_bench_docs)
    assert {key(r) for r in post_rows} == {
        key(r) for r in pre_rows if r.benchmark_id == "suite_a"
    }
    assert all(
        r.union_equals_survivors
        and r.survivor_family_untouched
        and r.retire_shrunk_filter
        for r in post_rows
    )

    # (c) bit-subset + strict shrink, word for word
    now_union = {
        r.widx: r.bits
        for r in spark.read.parquet(_os.path.join(final, "union_words")).collect()
    }
    saved_prev = {
        r.widx: r.bits
        for r in spark.read.parquet(
            _os.path.join(final, "union_prev_words")
        ).collect()
    }
    assert saved_prev == prev_union, "preserved pre-retire union drifted"
    for widx, bits in now_union.items():
        assert bits & prev_union.get(widx, 0) == bits, "retire SET a bit"
    n_prev = sum(bin(b & (2**64 - 1)).count("1") for b in prev_union.values())
    n_now = sum(bin(b & (2**64 - 1)).count("1") for b in now_union.values())
    assert n_now < n_prev, "retire did not shrink the filter"

    # (e) idempotent no-op on an absent family
    mtime = _os.path.getmtime(_os.path.join(final, "registry_done.json"))
    dd.retire_bloom_family(spark, sf_dir, final, "suite_b")
    assert _os.path.getmtime(_os.path.join(final, "registry_done.json")) == mtime

    # (d) the last family is not retirable
    with pytest.raises(ValueError, match="EMPTY registry"):
        dd.retire_bloom_family(spark, sf_dir, final, "suite_a")


def test_purge_ledger_evidence_and_torn_write(spark, sf_dir, tmp_path, monkeypatch):
    """The purge AUDIT LEDGER (round-12 verdict task 5): every
    compaction must leave persisted evidence of what it deleted,
    written in the SAME staging transaction as the survivors. Pins:
    (a) torn write — a compaction whose ledger write fails publishes
    NOTHING (no marker, no partial tree; the staging discipline);
    (b) the ledger's contents — the id-list digest is the session
    TOMB_IDS digest and n_purged reproduces the before-after count
    arithmetic measured on the persisted trees; (c) a published tree
    whose ledger is later removed is a cache MISS (displaced and
    rebuilt) at build time and a LOUD read_purge_ledger error at
    serve time."""
    import json as _json
    import os as _os

    import pytest

    from game_data_etl_pipeline_spark.llmdata import ann_index as ai
    from game_data_etl_pipeline_spark.llmdata.artifacts import fingerprint_key

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "ann"))
    monkeypatch.setenv("SPARK_GRAFT_LEX_INDEX_DIR", str(tmp_path / "lex"))

    e2e = _os.path.join(
        ai._index_root(),
        f"e2e_v{ai.INDEX_VERSION}",
        fingerprint_key(sf_dir, "embeddings.parquet"),
    )
    # (a) torn write: the ledger write raises after the survivor
    # rewrite — the staging context must discard everything
    with pytest.MonkeyPatch.context() as mp:
        def _boom(*a, **k):
            raise RuntimeError("torn ledger write")

        mp.setattr(ai, "write_purge_ledger", _boom)
        with pytest.raises(RuntimeError, match="torn ledger write"):
            ai.ensure_ann_e2e_tree(spark, sf_dir)
    assert not _os.path.isdir(e2e), "torn compaction published a tree"

    # (b) the real build writes the evidence
    assert ai.ensure_ann_e2e_tree(spark, sf_dir) == e2e
    led = ai.read_purge_ledger(_os.path.join(e2e, "postings"))
    assert led["purge"]["kind"] == "id_list"
    assert led["purge"]["ids"] == sorted(ai.TOMB_IDS)
    assert led["purge"]["digest"] == ai.purge_ids_digest(ai.TOMB_IDS)
    demo = ai.ensure_upsert_tree(spark, sf_dir)
    n_before = spark.read.parquet(_os.path.join(demo, "postings")).count()
    n_after = spark.read.parquet(_os.path.join(e2e, "postings")).count()
    assert led["n_before"] == n_before
    assert led["n_after"] == n_after
    assert led["n_purged"] == n_before - n_after > 0

    # (c) evidence removed later: loud at read, cache miss at build
    _os.remove(_os.path.join(e2e, "postings", ai.PURGE_LEDGER))
    with pytest.raises(ValueError, match="purge ledger"):
        ai.read_purge_ledger(_os.path.join(e2e, "postings"))
    assert not ai.purge_ledger_current(e2e, _os.path.join(e2e, "postings"))
    assert not _os.path.isdir(e2e), "ledger-less tree must be displaced"
    rebuilt = ai.ensure_ann_e2e_tree(spark, sf_dir)
    led2 = ai.read_purge_ledger(_os.path.join(rebuilt, "postings"))
    assert led2 == led, "rebuild must reproduce the identical ledger"

    # the lexical compactor writes the same artifact at its tree root
    from game_data_etl_pipeline_spark.llmdata import lex_index as li

    lex_e2e = li.ensure_lex_e2e_tree(spark, sf_dir)
    lled = ai.read_purge_ledger(lex_e2e)
    assert lled["purge"]["digest"] == ai.purge_ids_digest(ai.TOMB_IDS)
    assert lled["n_purged"] == lled["n_before"] - lled["n_after"] > 0


def test_lifecycle_e2e_end_state_equals_rebuild(spark, sf_dir):
    """Round-11 verdict task 2+3: the composed lifecycle lineage
    (build -> delta upsert -> id-LIST tombstone -> compact) must land
    on EXACTLY the artifacts a from-scratch build over the net
    survivor corpus would produce — row for row, both families. The
    lex side re-derives every expected integer (postings/df/stats)
    from the survivor documents; the ANN side re-encodes every
    survivor from its raw embedding through the frozen trained
    structure. Tombstones here are the TOMB_IDS id list (the purge
    shape), not the residue predicate."""
    import os as _os

    from pyspark.sql import functions as F

    from game_data_etl_pipeline_spark.catalog import load_table
    from game_data_etl_pipeline_spark.llmdata.ann_index import (
        TOMB_IDS,
        build_ann_index,
        ensure_ann_e2e_tree,
    )
    from game_data_etl_pipeline_spark.llmdata.lex_index import ensure_lex_e2e_tree
    from game_data_etl_pipeline_spark.llmdata.similarity import ivf_assign, pq_encode
    from tests.conftest import expected_lex_index

    # ---- lexical: e2e artifacts == from-scratch integers over survivors
    lex_e2e = ensure_lex_e2e_tree(spark, sf_dir)
    surv_docs = load_table(spark, sf_dir, "documents").filter(
        ~F.col("doc_id").isin(*TOMB_IDS)
    )
    want_post, want_df, want_n_docs, want_tot_dl = expected_lex_index(surv_docs)
    got_post = {
        (r.term, r.doc_id, r.dl, r.tf)
        for r in spark.read.parquet(_os.path.join(lex_e2e, "postings")).collect()
    }
    assert got_post == want_post
    assert all(d not in TOMB_IDS for (_, d, _, _) in got_post)
    got_df = {
        (r.term, r.df)
        for r in spark.read.parquet(_os.path.join(lex_e2e, "df")).collect()
    }
    assert got_df == want_df
    srow = spark.read.parquet(_os.path.join(lex_e2e, "stats")).collect()[0]
    assert srow.n_docs == want_n_docs
    assert (srow.tot_dl or 0) == want_tot_dl

    # ---- ANN: e2e postings == fresh encode of survivors through the
    # frozen trained structure (raw embeddings, not copied codes)
    ann_e2e = ensure_ann_e2e_tree(spark, sf_dir)
    main = build_ann_index(spark, sf_dir)
    books = spark.read.parquet(_os.path.join(main, "codebooks"))
    coarse = spark.read.parquet(_os.path.join(main, "coarse"))
    surv_emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).filter(~F.col("vec_id").isin(*TOMB_IDS))
    fresh = pq_encode(surv_emb, books).join(
        ivf_assign(surv_emb, cents=coarse, form="argmax").select("vec_id", "cent_id"),
        "vec_id",
    )
    want_ann = {
        (r.vec_id, tuple(r.codes), r.cent_id) for r in fresh.collect()
    }
    got_ann = {
        (r.vec_id, tuple(r.codes), int(r.cent_id))
        for r in spark.read.parquet(_os.path.join(ann_e2e, "postings")).collect()
    }
    assert got_ann == want_ann
    assert all(v not in TOMB_IDS for (v, _, _) in got_ann)


def test_tomb_meta_handshake(tmp_path):
    """The e2e lineage trees' purge-list handshake (the round-12
    review's stale-artifact finding): a tree compacted with a
    DIFFERENT id list than the session TOMB_IDS must fail
    check_tomb_meta loudly, and the builders' tomb_ids_current must
    treat it as a cache MISS — displacing the stale tree through the
    trash-grace window so editing TOMB_IDS self-heals (the
    check_bloom_meta / _geometry_current discipline applied to the
    purge fixture)."""
    import json as _json
    import os as _os

    import pytest

    from game_data_etl_pipeline_spark.llmdata.ann_index import (
        TOMB_IDS,
        check_tomb_meta,
        tomb_ids_current,
    )

    good = tmp_path / "e2e_good"
    _os.makedirs(good)
    with open(good / "e2e_done.json", "w") as f:
        _json.dump({"version": 1, "tomb_ids": list(TOMB_IDS)}, f)
    check_tomb_meta(str(good), "e2e_done.json")  # must not raise
    assert tomb_ids_current(str(good), "e2e_done.json")
    assert _os.path.isdir(good)  # a current tree is never displaced

    stale = tmp_path / "e2e_stale"
    _os.makedirs(stale)
    with open(stale / "e2e_done.json", "w") as f:
        _json.dump({"version": 1, "tomb_ids": [1, 2, 3]}, f)
    with pytest.raises(ValueError, match="tomb_ids"):
        check_tomb_meta(str(stale), "e2e_done.json")
    assert not tomb_ids_current(str(stale), "e2e_done.json")
    assert not _os.path.isdir(stale), "stale tree must be displaced"
    displaced = [d for d in _os.listdir(tmp_path) if ".trash.tomb" in d]
    assert len(displaced) == 1


def test_bloom_saturation_guard_fails_loudly(spark, sf_dir):
    """The build-time saturation guard (round-10 verdict task 3): a
    filter whose benchmark outgrows its geometry must FAIL the build,
    not publish a quietly over-removing screen. A deliberately
    undersized 256-bit geometry over the fixture's benchmark shingles
    saturates far past BLOOM_FILL_MAX and must raise; the production
    2^22-bit geometry over the same shingles must pass with a sane
    positive fill."""
    import pytest

    from game_data_etl_pipeline_spark.catalog import load_table
    from game_data_etl_pipeline_spark.llmdata.dedup import (
        BLOOM_FILL_MAX,
        _shingles,
        assert_bloom_fill,
        bloom_words,
    )
    from pyspark.sql import functions as F

    bench = load_table(spark, sf_dir, "documents").filter(
        F.pmod(F.col("doc_id"), F.lit(3)) == 0
    )
    grams = _shingles(bench).select("g").distinct().localCheckpoint()
    tiny = bloom_words(grams, bits=256)
    with pytest.raises(ValueError, match="saturated"):
        assert_bloom_fill(tiny, bits=256, what="undersized demo filter")
    fill = assert_bloom_fill(bloom_words(grams), what="production-geometry filter")
    assert 0 < fill <= BLOOM_FILL_MAX


def test_bloom_upsert_tree_idempotent_and_build_count(spark, sf_dir, tmp_path, monkeypatch):
    """ensure_bloom_upsert_tree must be build-once: a second call in
    the same process returns the published tree without rewriting it
    (marker mtime unchanged), and the full-filter artifact it is
    refereed against is not rebuilt either (the _BLOOM_BUILD_COUNT
    discipline)."""
    import os as _os

    from game_data_etl_pipeline_spark.llmdata import dedup as dd

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR_BLOOM", str(tmp_path / "bloom"))
    p1 = dd.ensure_bloom_upsert_tree(spark, sf_dir)
    marker = _os.path.join(p1, "upsert_done.json")
    m1 = _os.path.getmtime(marker)
    p2 = dd.ensure_bloom_upsert_tree(spark, sf_dir)
    assert p1 == p2 and _os.path.getmtime(marker) == m1
    dd.build_bloom_index(spark, sf_dir)
    before = dd._BLOOM_BUILD_COUNT
    SPECS["op_bloom_index_upsert"].fn(spark, sf_dir).collect()
    assert dd._BLOOM_BUILD_COUNT == before, "upsert op rebuilt the full filter"


# (property-based tests live in test_llmdata_properties.py, guarded by
# pytest.importorskip so a missing hypothesis cannot fail this module's
# collection — round-11 advice)


def test_bloom_meta_geometry_handshake(tmp_path):
    """check_bloom_meta must refuse to serve a filter persisted at a
    different geometry: probing across bits/seeds lands positions on
    the wrong words and silently yields false NEGATIVES — the serve
    paths validate the artifact's recorded geometry before probing,
    so raising BLOOM_BITS invalidates stale artifacts loudly."""
    import json as _json
    import os as _os

    import pytest

    from game_data_etl_pipeline_spark.llmdata.dedup import (
        BLOOM_BITS,
        BLOOM_SEEDS,
        check_bloom_meta,
    )

    good = tmp_path / "good"
    _os.makedirs(good)
    with open(good / "meta.json", "w") as f:
        _json.dump({"bits": BLOOM_BITS, "seeds": list(BLOOM_SEEDS)}, f)
    check_bloom_meta(str(good))  # must not raise

    stale = tmp_path / "stale"
    _os.makedirs(stale)
    with open(stale / "meta.json", "w") as f:
        _json.dump({"bits": BLOOM_BITS // 2, "seeds": list(BLOOM_SEEDS)}, f)
    with pytest.raises(ValueError, match="geometries|rebuild"):
        check_bloom_meta(str(stale))

    unmarked = tmp_path / "unmarked"
    _os.makedirs(unmarked)
    with pytest.raises(ValueError, match="marker"):
        check_bloom_meta(str(unmarked))


def test_staging_tree_cleans_up_on_failure(tmp_path):
    """staging_tree must remove the staging dir when the build body
    raises — GC skips in-flight staging_* dirs, so an unprotected
    builder failure would leak one partial tree per retry."""
    import os as _os

    import pytest

    from game_data_etl_pipeline_spark.llmdata.artifacts import staging_tree

    final = str(tmp_path / "v1" / "root_tmp_fix_1_2")
    with pytest.raises(RuntimeError):
        with staging_tree(final) as staging:
            with open(_os.path.join(staging, "partial.parquet"), "w") as f:
                f.write("x")
            raise RuntimeError("simulated mid-build failure")
    leftovers = [d for d in _os.listdir(tmp_path / "v1") if d.startswith("staging_")]
    assert leftovers == [], f"staging tree leaked: {leftovers}"


def test_bloom_build_self_heals_stale_geometry(spark, sf_dir, tmp_path, monkeypatch):
    """A persisted filter whose recorded geometry mismatches the
    session constants is a CACHE MISS, not a permanent failure:
    build_bloom_index must displace the stale tree (rename-aside
    through the trash-grace window) and rebuild at the current
    geometry, so raising BLOOM_BITS self-heals instead of wedging
    every serve op until a human deletes the artifact."""
    import json as _json
    import os as _os

    from game_data_etl_pipeline_spark.llmdata import dedup as dd

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR_BLOOM", str(tmp_path / "bloom"))
    stale = dd.bloom_index_dir(sf_dir)
    _os.makedirs(stale)
    with open(_os.path.join(stale, "meta.json"), "w") as f:
        _json.dump({"version": 1, "bits": 64, "seeds": [1, 2, 3]}, f)

    rebuilt = dd.build_bloom_index(spark, sf_dir)
    assert rebuilt == stale  # same key, fresh tree
    with open(_os.path.join(rebuilt, "meta.json")) as f:
        meta = _json.load(f)
    assert meta["bits"] == dd.BLOOM_BITS
    assert list(meta["seeds"]) == list(dd.BLOOM_SEEDS)
    dd.check_bloom_meta(rebuilt)  # the serve-time invariant now holds
    version_dir = _os.path.dirname(rebuilt)
    displaced = [d for d in _os.listdir(version_dir) if ".trash.geom" in d]
    assert len(displaced) == 1, "stale-geometry tree must be displaced, not deleted"


def test_bloom_registry_lifecycle_e2e_semantics(spark, sf_dir, tmp_path, monkeypatch):
    """The composed register -> refresh -> register -> retire lineage
    (op_bloom_registry_lifecycle_e2e) must leave NO residue of its
    history: (a) the end-state tree is row-for-row what a from-scratch
    two-family ``ensure_bloom_registry`` publishes — union words
    bit-identical, per-family pair sets identical, marker families
    identical; (b) suite_a's bytes survive all four verbs untouched
    (digest captured after its registration); (c) the preserved
    pre-retire union strictly exceeds the end union (suite_c was
    really folded in and really cleared); (d) a PARTIAL lineage tree —
    the crash-after-refresh state, whose step-by-step resume would
    DOWNGRADE suite_b back to the stale half snapshot — is displaced
    and rebuilt, never resumed; (e) the completed lineage early-returns
    without republish."""
    import hashlib as _hashlib
    import json as _json
    import os as _os

    from game_data_etl_pipeline_spark.llmdata import dedup as dd
    from game_data_etl_pipeline_spark.llmdata.artifacts import fingerprint_key

    def _tree_digest(d):
        h = _hashlib.sha256()
        for root, _dirs, files in sorted(_os.walk(d)):
            for fn in sorted(files):
                with open(_os.path.join(root, fn), "rb") as f:
                    h.update(fn.encode() + f.read())
        return h.hexdigest()

    def _words(path):
        return {r.widx: r.bits for r in spark.read.parquet(path).collect()}

    def _pairs(path):
        return {(r.b_id, r.g) for r in spark.read.parquet(path).collect()}

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR_BLOOM", str(tmp_path / "bloom"))
    final = _os.path.join(
        dd._bloom_root(),
        f"lifecycle_v{dd.BLOOM_INDEX_VERSION}",
        fingerprint_key(sf_dir, "documents.parquet"),
    )

    # (b) prelude: register suite_a alone so its digest brackets the
    # WHOLE rest of the lineage (ensure_* resumes idempotently from
    # this one-family state — registration is its own no-op)
    dd._register_bloom_family(spark, sf_dir, final, "suite_a", 0, mod=6)
    a_digest = _tree_digest(_os.path.join(final, "families", "suite_a"))

    assert dd.ensure_bloom_lifecycle_demo(spark, sf_dir) == final
    assert (
        _tree_digest(_os.path.join(final, "families", "suite_a")) == a_digest
    ), "a later lifecycle verb mutated suite_a's artifact"

    # (a) end state == from-scratch two-family registry, row for row
    scratch = dd.ensure_bloom_registry(spark, sf_dir)
    assert _words(_os.path.join(final, "union_words")) == _words(
        _os.path.join(scratch, "union_words")
    ), "composed end-state union differs from a from-scratch build"
    with open(_os.path.join(final, "registry_done.json")) as f:
        end_fams = _json.load(f)["families"]
    with open(_os.path.join(scratch, "registry_done.json")) as f:
        assert end_fams == _json.load(f)["families"]
    for fam in end_fams:
        assert _pairs(_os.path.join(final, "families", fam, "pairs")) == _pairs(
            _os.path.join(scratch, "families", fam, "pairs")
        ), f"{fam} pair set differs from a from-scratch registration"
    assert not _os.path.isdir(_os.path.join(final, "families", "suite_c"))

    # (c) strict shrink: suite_c contributed bits the end state cleared
    n_prev = dd.bloom_fill_ratio(
        spark.read.parquet(_os.path.join(final, "union_prev_words"))
    )
    n_now = dd.bloom_fill_ratio(
        spark.read.parquet(_os.path.join(final, "union_words"))
    )
    assert n_now < n_prev, "the retired suite_c cleared no union bit"

    # (e) completed lineage early-returns without republish
    mtime = _os.path.getmtime(_os.path.join(final, "registry_done.json"))
    assert dd.ensure_bloom_lifecycle_demo(spark, sf_dir) == final
    assert _os.path.getmtime(_os.path.join(final, "registry_done.json")) == mtime

    # (d) the crash-after-refresh partial state displaces and rebuilds:
    # fabricate it in a FRESH root (marker families match the end state
    # but the preserved union sits BELOW the live one — the direction
    # test is what tells the states apart)
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR_BLOOM", str(tmp_path / "bloom2"))
    final2 = _os.path.join(
        dd._bloom_root(),
        f"lifecycle_v{dd.BLOOM_INDEX_VERSION}",
        fingerprint_key(sf_dir, "documents.parquet"),
    )
    dd._register_bloom_family(spark, sf_dir, final2, "suite_a", 0, mod=6)
    dd._register_bloom_family(spark, sf_dir, final2, "suite_b", 3, mod=12)
    dd.refresh_bloom_family(spark, sf_dir, final2, "suite_b", 3, mod=6)
    partial_union = _words(_os.path.join(final2, "union_prev_words"))
    assert dd.ensure_bloom_lifecycle_demo(spark, sf_dir) == final2
    rebuilt_prev = _words(_os.path.join(final2, "union_prev_words"))
    assert rebuilt_prev != partial_union, "partial lineage was resumed, not rebuilt"
    with open(_os.path.join(final2, "registry_done.json")) as f:
        assert _json.load(f)["families"]["suite_b"] == "doc_id % 6 == 3", (
            "rebuild downgraded suite_b to the stale snapshot"
        )
    n_prev2 = dd.bloom_fill_ratio(
        spark.read.parquet(_os.path.join(final2, "union_prev_words"))
    )
    n_now2 = dd.bloom_fill_ratio(
        spark.read.parquet(_os.path.join(final2, "union_words"))
    )
    assert n_now2 < n_prev2
    displaced = [
        d
        for d in _os.listdir(_os.path.dirname(final2))
        if ".trash.deadend" in d
    ]
    assert len(displaced) == 1, "partial tree must be displaced, not deleted"


def test_pick_size_tiered():
    """The merge POLICY in isolation: K smallest by row count,
    segment id as the deterministic tiebreak."""
    from game_data_etl_pipeline_spark.llmdata.ann_index import pick_size_tiered

    assert pick_size_tiered({0: 100, 1: 50, 2: 30, 3: 20}, 2) == [3, 2]
    # tie on size -> lower segment id first
    assert pick_size_tiered({0: 10, 1: 10, 2: 99}, 2) == [0, 1]
    assert pick_size_tiered({5: 7}, 2) == [5]


def test_merge_policy_untouched_immutable_and_serve_identical(spark, sf_dir):
    """The size-tiered pass must (a) leave every untouched segment's
    parquet files byte-identical between the base and merged trees,
    (b) reduce the file count, and (c) be invisible to serving: ADC
    serving from the merged tree is bit-identical to serving from the
    4-segment base (a merge moves bytes, deletes nothing, re-encodes
    nothing)."""
    import os as _os

    from game_data_etl_pipeline_spark.catalog import load_table
    from game_data_etl_pipeline_spark.llmdata.ann_index import (
        _count_parquet_files,
        _seg_dir_digests,
        ensure_merge_base_tree,
        ensure_merge_policy_tree,
        read_ann_index,
    )
    from game_data_etl_pipeline_spark.llmdata.similarity import ivfpq_serve_stages
    from pyspark.sql import functions as F

    # run the registered op once: builds both trees, all audits true
    row = SPECS["op_sim_index_merge_policy"].fn(spark, sf_dir).collect()[0]
    assert row.picked_smallest_k and row.rows_conserved
    assert row.merged_rows_identical and row.manifest_consistent
    assert row.untouched_segments_byte_identical and row.files_reduced
    assert row.n_after == row.n_before
    assert row.n_segments_after == row.n_segments_before - 1

    base = ensure_merge_base_tree(spark, sf_dir)
    merged = ensure_merge_policy_tree(spark, sf_dir)
    # (a) untouched segments byte-identical, (b) fewer files
    assert _seg_dir_digests(
        _os.path.join(base, "postings"), (0, 1)
    ) == _seg_dir_digests(_os.path.join(merged, "postings"), (0, 1))
    assert 0 < _count_parquet_files(
        _os.path.join(merged, "postings")
    ) < _count_parquet_files(_os.path.join(base, "postings"))

    # (c) serving equality, bit-for-bit
    coarse, books, _ = read_ann_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def _serve(tree: str) -> set:
        posts = spark.read.parquet(_os.path.join(tree, "postings")).select(
            "vec_id", "codes", F.col("cent_id").cast("long").alias("cent_id")
        )
        return {
            tuple(r)
            for r in ivfpq_serve_stages(
                emb, posts.filter(F.col("vec_id") >= 4), coarse, books
            ).collect()
        }

    served_base, served_merged = _serve(base), _serve(merged)
    assert len(served_base) > 0
    assert served_base == served_merged
