"""Oracle checks replicating the driver's compare: every queries() entry
with an oracle_sql() twin must match DuckDB on row count, column names,
and order-insensitive values (at sf0.001 for CI speed; the driver runs
sf0.01 — the suite is scale-free)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("KGMWCP_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return round(value, 4)
    if isinstance(value, bool):
        return bool(value)
    try:
        import decimal

        if isinstance(value, decimal.Decimal):
            return round(float(value), 4)
    except ImportError:  # pragma: no cover
        pass
    return value


def _rowset(rows, colnames):
    return sorted(
        tuple(_normalize(v) for v in row) for row in rows
    ), list(colnames)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def _duck_on(sf: str, tables=("documents",)):
    """DuckDB connection with the given parquet datasets as views —
    for tests that build their own fixture dirs."""
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM '{sf}/{t}.parquet/*.parquet'")
    return con


def _assert_oracle_parity(spark, con, names, sf):
    """The driver's compare (rows + columns + order-insensitive values)
    for a subset of entries against a custom fixture dir."""
    for name in names:
        df = QUERIES[name](spark, sf)
        spark_set, _ = _rowset([tuple(r) for r in df.collect()], df.columns)
        res = con.execute(ORACLES[name])
        duck_set, _ = _rowset(res.fetchall(), [d[0] for d in res.description])
        assert spark_set == duck_set, name


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in df.collect()]
    spark_set, spark_cols = _rowset(spark_rows, df.columns)

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_set, duck_cols = _rowset(res.fetchall(), duck_cols)

    assert [c.lower() for c in spark_cols] == [c.lower() for c in duck_cols], (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_set) == len(duck_set), (
        f"{name}: row count {len(spark_set)} vs {len(duck_set)}"
    )
    assert spark_set == duck_set, f"{name}: value mismatch"


def test_rows_only_queries_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"subj", "pred", "obj"}


def test_dedup_cluster_checkpoint_parity(spark):
    """Lineage truncation (localCheckpoint every N rounds) must not change
    the fixpoint: interval-2 checkpointing == the default path."""
    from kgmwcp.ops.dedup import q_dedup_cluster

    base = sorted(tuple(r) for r in
                  q_dedup_cluster(spark, SF_DIR).collect())
    ckpt = sorted(tuple(r) for r in
                  q_dedup_cluster(spark, SF_DIR, checkpoint_every=2).collect())
    assert base == ckpt
    assert len(base) > 0


def test_hot_key_caps_bound_degenerate_fixtures(spark, tmp_path):
    """One span/shingle shared by EVERY doc (the license-header scenario):
    the minsig self-join must drop the over-cap sig bucket instead of
    going quadratic, and the per-fingerprint id list must stay bounded at
    _SPAN_IDS_CAP while n_docs stays exact.  Oracle parity holds on the
    same degenerate fixture."""
    from kgmwcp.ops import dedup as dd

    n_docs = dd._SIG_CAP + 36  # 100 > both caps
    text = "alpha beta gamma delta epsilon zeta eta theta iota"
    rows = [(i, text, "en", "s", len(text)) for i in range(1, n_docs + 1)]
    # plus one small near-dup pair under the cap that must survive
    pair_text = "unique pair shingle words one two three four five six"
    rows += [(9001, pair_text, "en", "s", len(pair_text)),
             (9002, pair_text, "en", "s", len(pair_text))]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    spans = dd.q_dedup_substring_spans(spark, sf).collect()
    big = [r for r in spans if r["n_docs"] == n_docs]
    assert big, "shared span not found"
    for r in big:
        assert len(r["doc_ids"].split(",")) == dd._SPAN_IDS_CAP

    jac = dd.q_dedup_ngram_jaccard(spark, sf).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in jac}
    # the 100-doc identical block's sig bucket (> _SIG_CAP) is dropped:
    # no pair from it survives; the small under-cap pair does
    assert all(a > 9000 for a, _ in pairs), "over-cap bucket leaked pairs"
    assert (9001, 9002) in pairs

    _assert_oracle_parity(
        spark, _duck_on(sf),
        ("dedup_ngram_jaccard", "dedup_substring_spans"), sf)


def test_pii_scrub_and_decontaminate_planted(spark, tmp_path):
    """Planted-case semantics: PII scrub replaces emails/IPs with typed
    tokens and counts them; decontamination flags the doc sharing an
    8-token span with the benchmark slice (doc_id % 50 == 0) and not
    the clean doc.  Oracle parity on the same planted fixture."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (50, f"benchmark doc: {shared} plus trailing words here", "en", "s", 1),
        (1, f"training doc leaks {shared} verbatim in the middle", "en", "s", 1),
        (2, "contact bob@example.com or 10.0.0.1 and carol@test.org now",
         "en", "s", 1),
        (3, "completely clean text with enough words to form spans maybe",
         "en", "s", 1),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    scrub = {r["doc_id"]: r for r in QUERIES["text_pii_scrub"](spark, sf).collect()}
    assert scrub[2]["n_emails"] == 2 and scrub[2]["n_ips"] == 1
    assert scrub[2]["clean_text"] == \
        "contact <EMAIL> or <IP> and <EMAIL> now"
    assert scrub[3]["n_emails"] == 0 and scrub[3]["n_ips"] == 0

    decon = {r["doc_id"]: r
             for r in QUERIES["corpus_decontaminate"](spark, sf).collect()}
    assert 50 not in decon  # benchmark slice excluded from training rows
    assert decon[1]["contaminated"] and decon[1]["n_hits"] == 1
    assert not decon[3]["contaminated"] and decon[3]["n_hits"] == 0

    _assert_oracle_parity(
        spark, _duck_on(sf),
        ("text_pii_scrub", "corpus_decontaminate",
         "corpus_sample_stratified"), sf)


def test_cluster_convergence_flag(spark):
    """A chain graph longer than the iteration budget must be reported as
    NOT converged (one-hop min propagation needs ~diameter rounds); with
    enough budget the same graph converges to a single cluster."""
    from kgmwcp.ops.dedup import propagate_min_labels

    n = 24
    docs = spark.createDataFrame([(i,) for i in range(1, n + 1)],
                                 "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "doc_a long, doc_b long")

    short = propagate_min_labels(docs, pairs, checkpoint_every=0, max_iters=3)
    info = short.kgmwcp_convergence
    assert info["converged"] is False and info["iterations"] == 3
    short.unpersist()

    full = propagate_min_labels(docs, pairs, checkpoint_every=4, max_iters=64)
    info = full.kgmwcp_convergence
    assert info["converged"] is True
    labels = {r["doc_id"]: r["cluster_id"] for r in full.collect()}
    assert set(labels.values()) == {1}
    full.unpersist()


def test_cluster_pointer_jumping_is_log_diameter(spark):
    """A 300-node chain needs ~299 one-hop rounds; with pointer jumping
    engaging after round 4, reachable distance roughly doubles per
    round, so the fixpoint lands well inside a 14-round budget — the
    O(log d) shape a 100 TB pathological component requires."""
    from kgmwcp.ops.dedup import propagate_min_labels

    n = 300
    docs = spark.createDataFrame([(i,) for i in range(1, n + 1)],
                                 "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "doc_a long, doc_b long")
    labels = propagate_min_labels(docs, pairs, checkpoint_every=6,
                                  max_iters=14)
    info = labels.kgmwcp_convergence
    assert info["converged"] is True, info
    assert {r["cluster_id"] for r in labels.collect()} == {1}
    labels.unpersist()


def test_ivf_quantizer_reuse(spark):
    """train_ivf once -> two searches reuse the persisted centroid table:
    same results as the fused form, and the second search's plan reads the
    quantizer from cache (InMemoryTableScan) instead of re-training."""
    from kgmwcp.ops import similarity as sim

    emb = sim._emb(spark, SF_DIR)
    cent = sim.train_ivf(emb)
    try:
        fused = sorted(tuple(r) for r in sim.q_ann_ivf(spark, SF_DIR).collect())
        reused = sorted(tuple(r) for r in
                        sim.ivf_search(emb, cent, 0).collect())
        assert fused == reused
        second = sim.ivf_search(emb, cent, 1)
        assert second.count() > 0
        plan = second._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan, "second search re-trained the quantizer"
    finally:
        cent.unpersist()


def test_ann_recall_on_clustered_fixture(spark, tmp_path):
    """The approximate paths at a REALISTIC operating point: on planted
    near-dup clusters (pairwise cos ~0.978) the same code paths that
    score 0.3/0.0 recall on the driver's near-random vectors must reach
    recall@10 >= 0.8 — and stay oracle-green (DuckDB computes the same
    approximation on the same fixture)."""
    from kgmwcp import fixtures

    sf = str(tmp_path)
    spark.createDataFrame(
        fixtures.clustered_embeddings_rows(),
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.parquet(f"{sf}/embeddings.parquet")

    recalls = {r["method"]: float(r["recall"])
               for r in QUERIES["ann_recall_eval"](spark, sf).collect()}
    assert recalls["ivf"] >= 0.8, recalls
    assert recalls["lsh"] >= 0.8, recalls

    _assert_oracle_parity(
        spark, _duck_on(sf, tables=("embeddings",)),
        ("ann_topk_bruteforce", "ann_ivf", "ann_lsh_bucketed",
         "ann_recall_eval"), sf)


def test_curate_reuses_precomputed_labels(spark):
    """Production shape: cluster labels computed once and passed in give
    identical curation results to the fused (oracle) form."""
    from kgmwcp.ops.dedup import q_curate_corpus, q_dedup_cluster

    labels = q_dedup_cluster(spark, SF_DIR)
    labels.persist()
    try:
        fused = sorted(tuple(r) for r in
                       q_curate_corpus(spark, SF_DIR).collect())
        reused = sorted(tuple(r) for r in
                        q_curate_corpus(spark, SF_DIR, labels=labels).collect())
        assert fused == reused and len(fused) > 0
    finally:
        labels.unpersist()


def test_ws_class_agrees_on_vertical_tab(spark, tmp_path):
    """Java \\s includes \\x0B, RE2's does not — the explicit whitespace
    class must make both engines tokenize identically on such text
    (code-review finding)."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, "a\x0bb c word word word word word word", "en", "s", 36),
         (2, "plain text with enough words to pass here", "en", "s", 41)],
        "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    _assert_oracle_parity(
        spark, _duck_on(sf),
        ("text_quality", "text_token_count", "doc_fingerprint",
         "dedup_substring_spans", "text_gopher_quality", "text_entropy"),
        sf)


def test_pagerank_star_graph(spark):
    """Generic pagerank() sanity on a symmetric star: mass conserved
    (no dangling nodes), the hub outranks every leaf, leaves tie."""
    from kgmwcp.ops.graph import pagerank

    leaves = [f"l{i}" for i in range(1, 5)]
    edges = [("c", l) for l in leaves] + [(l, "c") for l in leaves]
    edf = spark.createDataFrame(edges, "src string, dst string")
    ranks = {r["node"]: r["rank"] for r in pagerank(edf).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    leaf_ranks = {ranks[l] for l in leaves}
    assert len(leaf_ranks) == 1  # symmetric leaves tie exactly
    assert ranks["c"] > max(leaf_ranks)


def test_pagerank_dangling_node_keeps_teleport(spark):
    """A node with in-edges but no out-edges (dangling) leaks its mass;
    every node still gets at least the teleport floor and the op stays
    well-defined (both engines compute the same leak)."""
    from kgmwcp.ops.graph import pagerank

    edf = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string")  # c dangling
    ranks = {r["node"]: r["rank"] for r in pagerank(edf).collect()}
    assert set(ranks) == {"a", "b", "c"}
    floor = (1 - 0.85) / 3
    assert all(v >= floor - 1e-12 for v in ranks.values())
    assert ranks["c"] > ranks["a"]  # receiver beats pure source


def test_boilerplate_frac_planted(spark, tmp_path):
    """Two template copies -> every 8-token segment duplicated (frac 1.0);
    a unique doc -> 0.0; a short doc (<8 tokens) -> zero segments, 0.0.
    Oracle parity on the same fixture."""
    template = " ".join(f"w{i}" for i in range(16))          # 2 segments
    unique = " ".join(f"u{i}" for i in range(16))
    rows = [(1, template, "en", "s", 1), (2, template, "en", "s", 1),
            (3, unique, "en", "s", 1), (4, "too short here", "en", "s", 1)]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    out = {r["doc_id"]: r
           for r in QUERIES["text_boilerplate_frac"](spark, sf).collect()}
    assert out[1]["n_segs"] == 2 and out[1]["boilerplate_frac"] == 1.0
    assert out[2]["boilerplate_frac"] == 1.0
    assert out[3]["n_segs"] == 2 and out[3]["boilerplate_frac"] == 0.0
    assert out[4]["n_segs"] == 0 and out[4]["boilerplate_frac"] == 0.0

    _assert_oracle_parity(spark, _duck_on(sf), ("text_boilerplate_frac",), sf)


def test_chunking_boundaries(spark, tmp_path):
    """Window arithmetic at the edges: 64 tokens -> one chunk; 65 -> two
    (the second keeps the 16-token overlap + the 1 new token); short docs
    get one ragged chunk; the md5 is over the exact joined token slice."""
    import hashlib

    t64 = " ".join(f"a{i}" for i in range(64))
    t65 = " ".join(f"b{i}" for i in range(65))
    t10 = " ".join(f"c{i}" for i in range(10))
    rows = [(1, t64, "en", "s", 1), (2, t65, "en", "s", 1),
            (3, t10, "en", "s", 1)]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    by_doc = {}
    for r in QUERIES["text_chunking"](spark, sf).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_chunk_tokens"] == 64
    two = sorted(by_doc[2], key=lambda r: r["chunk_idx"])
    assert [(r["start_tok"], r["n_chunk_tokens"]) for r in two] == \
        [(1, 64), (49, 17)]
    expected = hashlib.md5(
        " ".join(f"b{i}" for i in range(48, 65)).encode()).hexdigest()
    assert two[1]["chunk_md5"] == expected
    assert len(by_doc[3]) == 1 and by_doc[3][0]["n_chunk_tokens"] == 10

    _assert_oracle_parity(
        spark, _duck_on(sf),
        ("text_chunking", "corpus_mixture_weights"), sf)


def test_incremental_dedup_delta_vs_corpus_only(spark, tmp_path):
    """Delta docs (doc_id % 4 == 0) are checked against the standing
    corpus only: a delta↔corpus near-dup is flagged with its ref; two
    identical delta docs do NOT flag each other; unique delta docs pass.
    Oracle parity on the same fixture."""
    shared = "the quick brown fox jumps over the lazy dog again today"
    delta_only = "delta twins share this exact sentence of filler words here"
    rows = [
        (4, shared, "en", "s", 1),                # delta, dup of corpus 5
        (5, shared, "en", "s", 1),                # corpus
        (8, delta_only, "en", "s", 1),            # delta twin 1
        (12, delta_only, "en", "s", 1),           # delta twin 2
        (16, "completely unrelated unique content nothing matches this",
         "en", "s", 1),                           # delta, clean
        (3, "corpus background doc with its own words", "en", "s", 1),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    out = {r["doc_new"]: r
           for r in QUERIES["dedup_incremental"](spark, sf).collect()}
    assert set(out) == {4, 8, 12, 16}
    assert out[4]["is_near_dup"] and out[4]["ref_doc"] == 5
    assert not out[8]["is_near_dup"] and out[8]["ref_doc"] is None
    assert not out[12]["is_near_dup"]
    assert not out[16]["is_near_dup"]

    _assert_oracle_parity(spark, _duck_on(sf), ("dedup_incremental",), sf)


def test_sessionize_gap_boundary(spark, tmp_path):
    """29-min gap continues the session; 31-min gap opens a new one;
    users partition independently.  Oracle parity on the same fixture."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, t0, 7, "click", 1.0, "{}"),
        (2, t0 + 29 * m, 7, "click", 2.0, "{}"),      # same session
        (3, t0 + 29 * m + 31 * m, 7, "buy", 3.0, "{}"),  # new session
        (4, t0, 8, "click", 5.0, "{}"),               # other user
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")

    out = {(r["user_id"], r["session_seq"]): r
           for r in QUERIES["events_sessionize"](spark, sf).collect()}
    assert set(out) == {(7, 1), (7, 2), (8, 1)}
    assert out[(7, 1)]["n_events"] == 2 and out[(7, 1)]["total_value"] == 3.0
    assert out[(7, 2)]["n_events"] == 1
    assert out[(7, 1)]["session_end"] == "2024-01-01 00:29:00"

    _assert_oracle_parity(spark, _duck_on(sf, tables=("events",)),
                          ("events_sessionize",), sf)


def test_funnel_ordering_is_strict(spark, tmp_path):
    """A click BEFORE signup doesn't count; strictly-after chaining per
    stage; users without signup never enter the funnel.  Oracle parity."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: full funnel in order
        (1, t0, 1, "signup", 0.0, "{}"),
        (2, t0 + m, 1, "click", 0.0, "{}"),
        (3, t0 + 2 * m, 1, "purchase", 0.0, "{}"),
        # user 2: click precedes signup -> stage 1 only
        (4, t0, 2, "click", 0.0, "{}"),
        (5, t0 + m, 2, "signup", 0.0, "{}"),
        # user 3: purchase before click -> stops at click stage
        (6, t0, 3, "signup", 0.0, "{}"),
        (7, t0 + 2 * m, 3, "click", 0.0, "{}"),
        (8, t0 + m, 3, "purchase", 0.0, "{}"),
        # user 4: never signs up -> absent
        (9, t0, 4, "click", 0.0, "{}"),
        (10, t0 + m, 4, "purchase", 0.0, "{}"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")

    out = {r["stage"]: r for r in QUERIES["events_funnel"](spark, sf).collect()}
    assert out["1_signup"]["n_users"] == 3
    assert out["2_click"]["n_users"] == 2      # users 1 and 3
    assert out["3_purchase"]["n_users"] == 1   # user 1 only
    assert out["3_purchase"]["conv_rate"] == round(1 / 3, 4)

    _assert_oracle_parity(spark, _duck_on(sf, tables=("events",)),
                          ("events_funnel",), sf)


def test_chunking_invariants_across_all_lengths(spark, tmp_path):
    """Window-arithmetic invariants for EVERY token count 1..200 in one
    Spark job: chunks start at 1 and stride 48, every chunk holds 1..64
    tokens, consecutive chunks overlap, and the union of chunk spans
    covers [1..n] with no gap — the guarantee training-sequence prep
    actually needs."""
    rows = [(n, " ".join(f"t{i}" for i in range(n)), "en", "s", 1)
            for n in range(1, 201)]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    by_doc = {}
    for r in QUERIES["text_chunking"](spark, sf).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(range(1, 201))
    for n, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        spans = [(r["start_tok"], r["start_tok"] + r["n_chunk_tokens"] - 1)
                 for r in chunks]
        assert spans[0][0] == 1
        assert all(1 <= r["n_chunk_tokens"] <= 64 for r in chunks), n
        assert all(b[0] - a[0] == 48 for a, b in zip(spans, spans[1:])), n
        # no gap: each next chunk starts inside or adjacent to the prior
        assert all(b[0] <= a[1] + 1 for a, b in zip(spans, spans[1:])), n
        assert spans[-1][1] == n, n


def test_pack_sequences_invariants(spark):
    """Concat-then-chunk packing: every sequence except each bucket's
    ragged tail holds exactly _SEQ_LEN tokens, and per-bucket token mass
    is conserved (sum of block occupancy == sum of doc token counts)."""
    from kgmwcp.ops.textops import _SEQ_LEN, q_text_token_count

    rows = QUERIES["corpus_pack_sequences"](spark, SF_DIR).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    totals = {}
    for b, seqs in by_bucket.items():
        seqs.sort(key=lambda r: r["seq_id"])
        assert [r["seq_id"] for r in seqs] == list(range(len(seqs)))  # dense
        assert all(r["n_tokens"] == _SEQ_LEN for r in seqs[:-1]), b
        assert 1 <= seqs[-1]["n_tokens"] <= _SEQ_LEN, b
        totals[b] = sum(r["n_tokens"] for r in seqs)
    # mass conservation vs the independent token counter
    from kgmwcp.ops.textops import _PACK_BUCKETS
    expected = {}
    for r in q_text_token_count(spark, SF_DIR).collect():
        if r["n_tokens"] > 0:
            b = r["doc_id"] % _PACK_BUCKETS
            expected[b] = expected.get(b, 0) + r["n_tokens"]
    assert totals == expected


def test_quantize_zero_vector_excluded_and_values_pinned(spark, tmp_path):
    """An all-zero vector has no quantization scale (0/0 would NaN->127
    garbage and diverge Spark-NaN vs DuckDB-NULL) — it is filtered out;
    a normal vector's int8 codes follow floor(x/scale + 0.5) exactly.
    Oracle parity on the same fixture."""
    rows = [
        (1, [1.0, -0.5, 0.25], 0),
        (2, [0.0, 0.0, 0.0], 0),   # excluded: scale == 0
        (3, [], 0),                # excluded: empty
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{sf}/embeddings.parquet")

    out = {r["vec_id"]: r
           for r in QUERIES["embedding_quantize"](spark, sf).collect()}
    assert set(out) == {1}
    r = out[1]
    # scale = 1/127; q = [127, floor(-63.5+0.5)=-63, floor(31.75+0.5)=32]
    assert (r["q_sum"], r["q_l1"]) == (96, 222)
    assert r["n_dims"] == 3

    _assert_oracle_parity(spark, _duck_on(sf, tables=("embeddings",)),
                          ("embedding_quantize",), sf)


def test_kmv_sketch_estimates_large_vocab(spark, tmp_path):
    """The driver corpus vocabulary is tiny (k_found < K exact path); a
    2000-token vocabulary exercises the real (K-1)/kth_min estimator —
    the estimate must differ from exact yet land within the ~1/sqrt(K)
    error regime, and stay oracle-parity (the estimate itself is
    deterministic, not just the exact count)."""
    vocab = " ".join(f"word{i}" for i in range(2000))
    rows = [(1, vocab, "big", "s", 1),
            (2, "tiny vocab here", "small", "s", 1)]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    out = {r["lang"]: r
           for r in QUERIES["sketch_distinct_kmv"](spark, sf).collect()}
    big = out["big"]
    assert big["exact_distinct"] == 2000
    assert big["kmv_estimate"] != 2000.0          # estimator branch ran
    assert abs(big["rel_error"]) < 0.30            # ~2.4/sqrt(64)
    assert out["small"]["kmv_estimate"] == 3.0     # exact path
    assert out["small"]["rel_error"] == 0.0

    _assert_oracle_parity(spark, _duck_on(sf), ("sketch_distinct_kmv",), sf)


def test_refang_iocs_planted(spark, tmp_path):
    """Defang conventions recovered: hxxps URL and bracket-dot domains
    refang to canonical forms; plain text yields nothing; per-doc dedup.
    Oracle parity on the planted fixture (and trivially on the driver
    corpus, which contains no defanged IOCs)."""
    rows = [
        (1, "c2 at hxxps://evil[.]example[.]com/gate.php and evil[.]example[.]com "
            "plus EVIL[.]example[.]com again", "en", "s", 1),
        (2, "perfectly clean text with no indicators at all", "en", "s", 1),
        (3, "see hxxp://bad[.]example[.]org/x, then stop.", "en", "s", 1),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    out = {(r["doc_id"], r["defanged"]): r
           for r in QUERIES["text_refang_iocs"](spark, sf).collect()}
    url = out[(1, "hxxps://evil[.]example[.]com/gate.php")]
    assert url["ioc"] == "https://evil.example.com/gate.php"
    assert url["kind"] == "url"
    dom = out[(1, "evil[.]example[.]com")]
    assert dom["ioc"] == "evil.example.com" and dom["kind"] == "domain"
    # trailing sentence punctuation trimmed before refanging
    tail = out[(3, "hxxp://bad[.]example[.]org/x")]
    assert tail["ioc"] == "http://bad.example.org/x"
    assert len(out) == 3                     # lowercased + deduped
    assert not any(d == 2 for d, _ in out)

    _assert_oracle_parity(spark, _duck_on(sf), ("text_refang_iocs",), sf)


def test_upsert_and_khop_semantics_planted(spark, tmp_path):
    """Upsert actions: entity only in the standing half -> unchanged,
    only in the new wave -> insert, in both -> update (counts add,
    first_seen keeps the min).  k-hop: a token co-mentioned with the
    seed lands at hop 2 via the connecting doc at hop 1; an isolated
    token is absent.  Oracle parity on the same fixture."""
    rows = [
        # doc 10 is the "wave" (doc_id % 10 == 0); 1..4 are standing
        (1, "merge appears here", "en", "s", 1),            # standing: merge
        (2, "join and merge together", "en", "s", 1),       # standing: join+merge
        (3, "stream only lives in standing", "en", "s", 1), # standing: stream
        (10, "merge plus window in the wave", "en", "s", 1),# wave: merge+window
        (4, "hash lives alone in this doc", "en", "s", 1),  # isolated token
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    up = {r["token"]: r for r in QUERIES["kg_nodes_upsert"](spark, sf).collect()}
    assert up["stream"]["action"] == "unchanged" and up["stream"]["n_docs"] == 1
    assert up["window"]["action"] == "insert" and up["window"]["first_doc"] == 10
    assert up["merge"]["action"] == "update"
    assert up["merge"]["n_docs"] == 3 and up["merge"]["first_doc"] == 1

    hops = {r["node"]: r["hop"]
            for r in QUERIES["kg_khop_neighborhood"](spark, sf).collect()}
    assert hops["t:merge"] == 0
    assert hops["d:1"] == 1 and hops["d:2"] == 1 and hops["d:10"] == 1
    assert hops["t:join"] == 2 and hops["t:window"] == 2
    assert "t:hash" not in hops and "d:4" not in hops

    _assert_oracle_parity(
        spark, _duck_on(sf),
        ("kg_nodes_upsert", "kg_khop_neighborhood"), sf)
