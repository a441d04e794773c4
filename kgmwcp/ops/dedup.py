"""Deduplication operators over the ``documents`` table — exact, MinHash-LSH,
SimHash, n-gram Jaccard.  Engine-portable hashing (md5) keeps every variant
DuckDB-oracle-checkable: Spark's murmur ``hash()`` would diverge from the
oracle, md5 hex strings are identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["QUERIES", "ORACLES"]


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# explicit whitespace class (see ops/textops.py WS_RE: Java \s and RE2
# \s disagree on \x0B — twins must tokenize identically)
_WS_RE = r"[ \t\n\x0B\f\r]+"


# -- exact dedup (hash-groupBy) ------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return (
        docs.withColumn("content_md5", F.md5(F.encode(F.col("text"), "utf-8")))
        .groupBy("content_md5")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


SQL_DEDUP_EXACT = """
SELECT md5(text) AS content_md5,
       min(doc_id) AS canonical_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


# -- shingles helper -------------------------------------------------------------

# word 3-gram shingles: one vectorized Arrow pass emitting the per-doc
# DISTINCT shingle set (r7, guide §4.2 — same shape as _span_fps).  The
# former posexplode + window-lead form shuffled every token on doc_id
# and its consumers all followed with a dropDuplicates exchange; the
# python set makes within-doc dedup free and leaves zero exchanges.
# (The interpreted HOF transform/filter alternative stays off the table:
# measured ~20x slower than either — CLAUDE.md.)
def _distinct_shingles(docs):
    import pyarrow as pa

    out_schema = pa.schema([
        pa.field("doc_id", pa.int64()),
        pa.field("shingle", pa.string()),
    ])

    def mapper(batches):
        import re

        ws = re.compile(_WS_RE)
        for batch in batches:
            out_ids: list = []
            out_sh: list = []
            for did, text in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("text").to_pylist()):
                if not text:
                    continue
                toks = [t for t in ws.split(text.lower()) if t]
                n = len(toks) - 2
                if n <= 0:
                    continue
                sh = {f"{toks[i]} {toks[i + 1]} {toks[i + 2]}"
                      for i in range(n)}
                out_ids.extend([did] * len(sh))
                out_sh.extend(sh)
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_ids, type=pa.int64()),
                 pa.array(out_sh, type=pa.string())],
                schema=out_schema)

    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id", "text")
        .repartition(n_parts, "doc_id")
        .mapInArrow(mapper, schema="doc_id long, shingle string")
    )

_SQL_SHINGLES_CTE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS t
  FROM documents
), shingled AS (
  SELECT doc_id,
         CASE WHEN len(t) < 3 THEN []
              ELSE list_transform(generate_series(1, len(t) - 2),
                                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         END AS shingles
  FROM toks
)
"""


# -- MinHash + LSH banding -------------------------------------------------------
# Production-grade signature: 128 min-hashes / 16 bands x 8 rows (the
# standard near-dup operating point).  One md5 per shingle gives a 60-bit
# base integer b; hash i is the affine permutation (A_i * b + B_i) mod P
# with P = 2^31 - 1 (Mersenne prime) — A_i*b <= (P-1)^2 < 2^63, so the
# arithmetic is exact int64 on BOTH engines (md5 + integer math is the
# portable subset; Spark hash()/xxhash64 are not reproducible in DuckDB).
# A hot-band cap (window count <= _BAND_CAP) drops degenerate bands (e.g.
# a million identical docs sharing one band key) before the self-join —
# without it one hot band makes the candidate join quadratic at 100 TB.

_MINHASH_P = 2147483647
_N_HASHES = 128
_N_BANDS = 16
_ROWS_PER_BAND = _N_HASHES // _N_BANDS
_BAND_CAP = 64


def _affine_coeffs() -> list[tuple[int, int]]:
    import random

    rng = random.Random(1234567)
    return [
        (rng.randrange(1, _MINHASH_P), rng.randrange(0, _MINHASH_P))
        for _ in range(_N_HASHES)
    ]


_COEFFS = _affine_coeffs()


# bound on shingles per numpy block inside the band mapper: the affine
# matrix is (_N_HASHES x block) int64, so 256k shingles cap the working
# set at ~256 MB regardless of how long individual documents get
_SIG_BLOCK_SHINGLES = 1 << 18


def _minhash_bands(docs):
    """(doc_id, band_key) LSH band table — the reusable signature index
    (the thing a production corpus persists between daily delta runs).

    r7 optimization (guide §4.2): the whole tokenize → shingle → md5 →
    128 affine min-hashes → band-key chain runs in ONE vectorized Arrow
    pass.  The previous Column form paid two structural costs that
    measured 4-6 s warm at sf0.1 (~0.5 s of it the shingle explode):
    a posexplode + window-lead shuffle on doc_id (~50x row blow-up
    just to reach the neighbor tokens), then a 128-column min-aggregate
    whose operator exceeds spark.sql.codegen.maxFields (100) — the
    HashAggregate pair evaluates 2x128 interpreted expressions per
    shingle row (the CLAUDE.md codegen-size lesson, same fix as the
    embedding-LSH UDF: numpy does the identical exact int64 arithmetic).
    Now the only exchange is a deterministic doc_id repartition for
    mapper parallelism and the Python stage ships (doc_id, text) once,
    emitting 16 tiny band rows per doc.  Bit-parity: ASCII tokenization
    (the explicit [ \\t\\n\\x0B\\f\\r]+ class splits identically in Java,
    RE2, and Python re), md5 is md5, and (A*b + C) % P stays exact in
    int64 (A*b < 2^62) — verified hash-identical vs the DuckDB oracle at
    sf0.001/0.01/0.1."""
    import pyarrow as pa

    a_list = [a for a, _ in _COEFFS]
    c_list = [c for _, c in _COEFFS]
    out_schema = pa.schema([
        pa.field("doc_id", pa.int64()),
        pa.field("band_key", pa.string()),
    ])

    def mapper(batches):
        import hashlib
        import re

        import numpy as np

        ws = re.compile(_WS_RE)
        A = np.array(a_list, dtype=np.int64)[:, None]
        C = np.array(c_list, dtype=np.int64)[:, None]
        md5 = hashlib.md5

        def flush(doc_ids, bs_parts, lens):
            ball = np.concatenate(bs_parts)
            offsets = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            mins = np.minimum.reduceat(
                (A * ball[None, :] + C) % _MINHASH_P, offsets, axis=1)
            out_ids, out_keys = [], []
            for col, did in enumerate(doc_ids):
                mh = mins[:, col]
                for j in range(_N_BANDS):
                    base = j * _ROWS_PER_BAND
                    out_ids.append(did)
                    out_keys.append(
                        f"{j}-" + "-".join(
                            str(mh[base + k]) for k in range(_ROWS_PER_BAND)))
            return pa.RecordBatch.from_arrays(
                [pa.array(out_ids, type=pa.int64()),
                 pa.array(out_keys, type=pa.string())],
                schema=out_schema)

        for batch in batches:
            doc_ids, bs_parts, lens, pending = [], [], [], 0
            for did, text in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("text").to_pylist()):
                if not text:
                    continue
                toks = [t for t in ws.split(text.lower()) if t]
                n = len(toks) - 2
                if n <= 0:
                    continue
                bs = np.fromiter(
                    (int(md5(f"{toks[i]} {toks[i + 1]} {toks[i + 2]}"
                             .encode()).hexdigest()[:15], 16) % _MINHASH_P
                     for i in range(n)),
                    dtype=np.int64, count=n)
                doc_ids.append(did)
                bs_parts.append(bs)
                lens.append(n)
                pending += n
                if pending >= _SIG_BLOCK_SHINGLES:
                    yield flush(doc_ids, bs_parts, lens)
                    doc_ids, bs_parts, lens, pending = [], [], [], 0
            if doc_ids:
                yield flush(doc_ids, bs_parts, lens)

    # deterministic hash repartition for mapper parallelism (never rand —
    # guide §2.5); scale-adaptive via defaultParallelism, and a no-op
    # data-wise: the old window form shuffled the same bytes as tokens
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id", "text")
        .repartition(n_parts, "doc_id")
        .mapInArrow(mapper, schema="doc_id long, band_key string")
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    # persist the (tiny: 16 rows/doc) bands table: without it the
    # self-join's two aliases re-run the whole shingle+md5+128-agg
    # pipeline once each (measured: warm 5.2 s -> 1.0 s, cold 16.6 ->
    # 13.6 s at sf0.1)
    from pyspark.storagelevel import StorageLevel

    bands = _minhash_bands(docs).persist(StorageLevel.MEMORY_AND_DISK)
    # window-count cap + self-join measured FASTER than
    # groupBy+collect_list+double-explode (3.3s vs 4.3s at sf0.1,
    # local[32] warm): the join reuses the window's band_key exchange,
    # while the array variant pays list materialization + a row blowup
    # without removing a shuffle.
    w = Window.partitionBy("band_key")
    bands = (
        bands.withColumn("bc", F.count(F.lit(1)).over(w))
        .filter(F.col("bc") <= _BAND_CAP)
        .drop("bc")
    )
    pairs = (
        bands.alias("a")
        .join(bands.alias("b"), "band_key")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return pairs


def q_dedup_lsh_precision(spark, sf_dir):
    """LSH candidate VERIFICATION — the measure-don't-guess stage of the
    near-dup pipeline: every minhash-LSH candidate pair gets its EXACT
    shingle-set Jaccard computed by joining the pair back to the
    (distinct) shingle table, plus a confirmed-at-0.5 verdict.  This is
    how a production dedup decides what to actually drop (LSH candidates
    are probabilistic; the drop list must not be).  Scale shape: the
    exact computation is bounded by |candidates|·shingles-per-doc — it
    touches ONLY candidate pairs, never all pairs; the common-shingle
    count is an equijoin on (doc, shingle), and every ratio is exact
    integers divided once."""
    docs = _docs(spark, sf_dir)
    cands = q_dedup_minhash_lsh(spark, sf_dir)
    sh = _distinct_shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        cands.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_sh").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_sh").alias("nb"))
    out = (
        cands.join(common, ["doc_a", "doc_b"], "left_outer")
        .withColumn("n_common", F.coalesce("n_common", F.lit(0)))
        .join(na, "doc_a").join(nb, "doc_b")
    )
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return out.select(
        "doc_a", "doc_b", "n_common",
        F.round(jac, 4).alias("exact_jaccard"),
        (jac >= 0.5).alias("confirmed"),
    )


def _sql_dedup_lsh_precision() -> str:
    return _sql_bands_prefix() + f"""
, bands AS (
  SELECT doc_id, band_key FROM (
    SELECT doc_id, band_key,
           count(*) OVER (PARTITION BY band_key) AS bc
    FROM bands_raw
  ) WHERE bc <= {_BAND_CAP}
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (band_key)
  WHERE a.doc_id < b.doc_id
),
sh AS (SELECT DISTINCT doc_id, shingle FROM exploded),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
com AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cands c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b, coalesce(com.n_common, 0) AS n_common,
       round(coalesce(com.n_common, 0) * 1.0
             / (na.n_sh + nb.n_sh - coalesce(com.n_common, 0)), 4)
         AS exact_jaccard,
       coalesce(com.n_common, 0) * 1.0
         / (na.n_sh + nb.n_sh - coalesce(com.n_common, 0)) >= 0.5
         AS confirmed
FROM cands c
LEFT OUTER JOIN com ON c.doc_a = com.doc_a AND c.doc_b = com.doc_b
JOIN sizes na ON c.doc_a = na.doc_id
JOIN sizes nb ON c.doc_b = nb.doc_id
"""


def _sql_bands_prefix() -> str:
    """Shared CTE chain: documents → shingles → minhash sig → bands_raw."""
    mins = ",\n         ".join(
        f"min(({a} * b + {c}) % {_MINHASH_P}) AS mh_{i}"
        for i, (a, c) in enumerate(_COEFFS)
    )
    keys = ", ".join(
        "'{j}-' || ".format(j=j)
        + " || '-' || ".join(
            f"CAST(mh_{j * _ROWS_PER_BAND + k} AS VARCHAR)"
            for k in range(_ROWS_PER_BAND)
        )
        for j in range(_N_BANDS)
    )
    return _SQL_SHINGLES_CTE + f"""
, exploded AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM shingled
), based AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {_MINHASH_P} AS b
  FROM exploded
), sig AS (
  SELECT doc_id,
         {mins}
  FROM based GROUP BY doc_id
), bands_raw AS (
  SELECT doc_id, unnest([{keys}]) AS band_key FROM sig
)"""


def _sql_dedup_minhash_lsh() -> str:
    return _sql_bands_prefix() + f"""
, bands AS (
  SELECT doc_id, band_key FROM (
    SELECT doc_id, band_key,
           count(*) OVER (PARTITION BY band_key) AS bc
    FROM bands_raw
  ) WHERE bc <= {_BAND_CAP}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b USING (band_key)
WHERE a.doc_id < b.doc_id
"""


SQL_DEDUP_MINHASH_LSH = _sql_dedup_minhash_lsh()


# -- incremental (delta-vs-corpus) near-dup detection -------------------------
# The production daily-ingest shape: a small delta batch is checked against
# the standing corpus WITHOUT re-pairing the corpus with itself.  The
# corpus band index is the persistable artifact (production loads it from
# storage and only computes bands for the delta); here both sides derive
# from one shared band pass split on doc_id % 4 so the DuckDB oracle can
# restate it.  Scale bounds: the hot-band cap on the INDEX side caps
# fan-out per delta band row at _BAND_CAP, so one delta doc generates at
# most _N_BANDS * _BAND_CAP candidate rows regardless of corpus size, and
# the join shuffles only on band_key (no corpus self-join anywhere).

def q_dedup_incremental(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    docs = _docs(spark, sf_dir)
    bands = _minhash_bands(docs).persist(StorageLevel.MEMORY_AND_DISK)
    corpus_b = bands.filter(F.col("doc_id") % 4 != 0)
    w = Window.partitionBy("band_key")
    corpus_b = (
        corpus_b.withColumn("bc", F.count(F.lit(1)).over(w))
        .filter(F.col("bc") <= _BAND_CAP)
        .drop("bc")
    )
    delta_b = bands.filter(F.col("doc_id") % 4 == 0)
    cand = (
        delta_b.alias("d")
        .join(corpus_b.alias("c"), "band_key")
        .select(
            F.col("d.doc_id").alias("doc_new"),
            F.col("c.doc_id").alias("doc_ref"),
        )
        .dropDuplicates(["doc_new", "doc_ref"])
    )
    g = cand.groupBy("doc_new").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.min("doc_ref").alias("ref_doc"),
    )
    delta_docs = docs.filter(F.col("doc_id") % 4 == 0).select(
        F.col("doc_id").alias("doc_new")
    )
    return delta_docs.join(g, "doc_new", "left").select(
        "doc_new",
        F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
        "ref_doc",
        (F.coalesce("n_candidates", F.lit(0)) > 0).alias("is_near_dup"),
    )


def _sql_dedup_incremental() -> str:
    return _sql_bands_prefix() + f"""
, corpus_bands AS (
  SELECT doc_id, band_key FROM (
    SELECT doc_id, band_key,
           count(*) OVER (PARTITION BY band_key) AS bc
    FROM bands_raw WHERE doc_id % 4 <> 0
  ) WHERE bc <= {_BAND_CAP}
), delta_bands AS (
  SELECT doc_id, band_key FROM bands_raw WHERE doc_id % 4 = 0
), cand AS (
  SELECT DISTINCT d.doc_id AS doc_new, c.doc_id AS doc_ref
  FROM delta_bands d JOIN corpus_bands c USING (band_key)
), g AS (
  SELECT doc_new, count(*) AS n_candidates, min(doc_ref) AS ref_doc
  FROM cand GROUP BY doc_new
)
SELECT dd.doc_id AS doc_new,
       coalesce(g.n_candidates, 0) AS n_candidates,
       g.ref_doc AS ref_doc,
       coalesce(g.n_candidates, 0) > 0 AS is_near_dup
FROM (SELECT doc_id FROM documents WHERE doc_id % 4 = 0) dd
LEFT JOIN g ON g.doc_new = dd.doc_id
"""


SQL_DEDUP_INCREMENTAL = _sql_dedup_incremental()


# -- near-dup clustering (connected components over LSH pairs) -----------------
# Training-data dedup keeps ONE representative per near-dup *cluster*, not
# per pair: the banded-LSH pairs are edges of a similarity graph whose
# connected components are the clusters.  Spark side: iterative min-label
# propagation — labels only ever decrease, so convergence is detected by
# the exact decimal sum of labels going stable (one cheap agg action per
# round, no row-wise compare join).  Iteration count is bounded by
# component diameter; the hot-band cap keeps components shallow.  At
# 100 TB each round is one shuffle join on doc_id + one groupBy; every
# ``checkpoint_every`` rounds the labels lineage is truncated with
# localCheckpoint so the plan tree stays bounded at real diameters
# (each persisted round otherwise stacks a new join on the previous
# plan).  Oracle: DuckDB recursive CTE over the same pairs.

_CLUSTER_MAX_ITERS = 32


def _free_labels(labels) -> None:
    """Release a finished round's stored labels.  ``unpersist()`` frees
    cache-manager entries but is a NO-OP for localCheckpointed frames
    (their blocks live outside the cache manager), so for those we reach
    the LogicalRDD's backing RDD and unpersist it directly; best-effort —
    on any internal-API mismatch the ContextCleaner reclaims the blocks
    once the reference drops."""
    labels.unpersist()
    try:
        plan = labels._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass


def propagate_min_labels(docs, pairs, checkpoint_every: int = 8,
                         max_iters: int = _CLUSTER_MAX_ITERS,
                         jump_after: int = 4):
    """Min-label propagation over an undirected pair graph.  Returns a
    (doc_id, cluster_id) DataFrame with a ``kgmwcp_convergence`` attribute
    ``{"converged": bool, "iterations": int}`` — at ``max_iters`` the loop
    would otherwise exit SILENTLY without a fixpoint, and the caller
    deserves to know the labels are provisional.  Non-convergence is also
    logged at WARN.

    Rounds start as plain one-hop edge relaxations (neighbor min); from
    round ``jump_after`` on, each relaxation is followed by a POINTER
    JUMP (label := label-of-label — every cluster_id is itself a doc_id,
    so labels double as representative pointers), after which reachable
    distance roughly doubles per round: O(log diameter) rounds instead
    of O(diameter).  Adaptive because of a measured trade: the LSH
    band caps keep real components shallow (fixpoint in 2-3 rounds) and
    there the jump's extra self-join only costs (A/B at sf0.1: one-hop
    2.7-3.8 s vs always-jump 6.6 s), while a chain-shaped component that
    band caps failed to shorten would need ~diameter one-hop rounds —
    at 100 TB the difference between ~40 shuffle rounds and ~2000
    (pinned by the 300-chain test).  The fixpoint itself (min doc_id per
    connected component) is algorithm-independent, so the recursive-CTE
    oracle and the checkpoint-parity test are unaffected."""
    from pyspark.storagelevel import StorageLevel

    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = docs.select("doc_id", F.col("doc_id").alias("cluster_id"))
    labels = labels.persist(StorageLevel.MEMORY_AND_DISK)
    # Fixpoint detector: labels only ever DECREASE (min is monotone), so
    # the checksum changes iff some label changed.  Numeric ids sum
    # exactly; string ids (the KG's node keys) sum their xxhash64 —
    # Spark-side only, never oracle-facing (CLAUDE.md: Spark hashes are
    # not DuckDB-portable), with a ~2^-64 collision-sum risk of stopping
    # one round early (a hash-sum that coincidentally matches across a
    # real change) — negligible against the cost of an exact per-round
    # changed-count join.
    from pyspark.sql.types import NumericType

    if isinstance(labels.schema["cluster_id"].dataType, NumericType):
        chk = F.col("cluster_id").cast("decimal(38,0)")
    else:
        chk = F.xxhash64("cluster_id").cast("decimal(38,0)")
    label_sum = F.sum(chk).alias("s")
    prev = labels.agg(label_sum).collect()[0]["s"]
    converged = False
    iterations = 0
    for i in range(max_iters):
        neighbor_min = (
            edges.join(labels, F.col("src") == F.col("doc_id"))
            .select(F.col("dst").alias("doc_id"), "cluster_id")
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("neighbor_min"))
        )
        relaxed = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.least(
                F.col("cluster_id"),
                F.coalesce("neighbor_min", F.col("cluster_id")),
            ).alias("cluster_id"),
        )
        jumped_relaxed = None
        if i >= jump_after:
            # pointer jump: follow the representative's own label one
            # step.  `relaxed` appears on BOTH sides of the jump join, so
            # (a) persist it for the round — otherwise the neighbor-min
            # shuffle executes twice — and (b) the plan would DOUBLE per
            # jump round (2^k subtrees between checkpoints), so jump
            # rounds always truncate lineage below (review finding).
            relaxed = relaxed.persist(StorageLevel.MEMORY_AND_DISK)
            jumped_relaxed = relaxed
            reps = relaxed.select(
                F.col("doc_id").alias("rep_id"),
                F.col("cluster_id").alias("rep_label"),
            )
            new_labels = (
                relaxed.join(reps, relaxed["cluster_id"] == reps["rep_id"],
                             "left")
                .select(
                    "doc_id",
                    F.least(
                        F.col("cluster_id"),
                        F.coalesce("rep_label", F.col("cluster_id")),
                    ).alias("cluster_id"),
                )
            )
        else:
            new_labels = relaxed
        force_truncate = jumped_relaxed is not None
        if force_truncate or (
                checkpoint_every and (i + 1) % checkpoint_every == 0):
            # LAZY localCheckpoint (r7): the checksum collect right below
            # is what materializes the blocks, so the round costs ONE job
            # instead of two (eager checkpoint job + agg job) — lineage
            # truncation is identical once materialized
            new_labels = new_labels.localCheckpoint(eager=False)
        else:
            new_labels = new_labels.persist(StorageLevel.MEMORY_AND_DISK)
        cur = new_labels.agg(label_sum).collect()[0]["s"]
        if jumped_relaxed is not None:
            jumped_relaxed.unpersist()
        _free_labels(labels)
        labels = new_labels
        iterations = i + 1
        if cur == prev:
            converged = True
            break
        prev = cur
    edges.unpersist()
    if not converged:
        import logging

        logging.getLogger("kgmwcp.dedup").warning(
            "min-label propagation hit max_iters=%d without converging; "
            "cluster labels are provisional (graph diameter > budget)",
            max_iters,
        )
    labels.kgmwcp_convergence = {"converged": converged,
                                 "iterations": iterations}
    return labels


def q_dedup_cluster(spark, sf_dir, checkpoint_every: int = 8):
    docs = _docs(spark, sf_dir).select("doc_id")
    pairs = q_dedup_minhash_lsh(spark, sf_dir)
    return propagate_min_labels(docs, pairs, checkpoint_every=checkpoint_every)


def _sql_dedup_cluster() -> str:
    # the full pairs pipeline re-declared as CTEs under WITH RECURSIVE,
    # then min-reachable-id per doc via the recursive closure
    pairs_sql = SQL_DEDUP_MINHASH_LSH
    head, _, final_select = pairs_sql.rpartition(")\nSELECT DISTINCT")
    assert head and final_select, "unexpected minhash SQL shape"
    ctes = head.replace("WITH toks AS", "WITH RECURSIVE toks AS", 1) + ")"
    return ctes + f"""
, pairs AS (
SELECT DISTINCT{final_select}
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
), reach(doc_id, root) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.root
  FROM reach r JOIN edges e ON e.src = r.doc_id
)
SELECT doc_id, min(root) AS cluster_id
FROM reach GROUP BY doc_id
"""


SQL_DEDUP_CLUSTER = _sql_dedup_cluster()


# -- substring-level exact dedup --------------------------------------------------
# Doc-level dedup misses boilerplate REPEATED ACROSS different documents
# (licenses, headers, templated spans) — the exact-substring technique:
# every 8-token window is fingerprinted (md5); a fingerprint seen in >= 2
# distinct docs is a duplicated span.  One explode + one groupBy on the
# high-cardinality fingerprint (map-side combine removes within-doc
# repeats first via the (doc_id, fp) dedupe).  At 100 TB the explode is
# ~n_tokens rows/doc and the aggregate is skew-free (md5 keys).

_SPAN_TOKENS = 8
# A license header present in millions of docs would otherwise produce ONE
# fingerprint row carrying a multi-million-entry sorted id array — a
# straggler reducer and an executor OOM at 100 TB.  n_docs stays EXACT
# (the count aggregates fully); only the example-id list is bounded: a
# per-fp window ranks ids (string order, matching the displayed sort) and
# the collect gathers <= _SPAN_IDS_CAP of them, so no unbounded buffer
# ever materializes.
_SPAN_IDS_CAP = 16


def _span_fps(docs):
    """Distinct (doc_id, fp) 8-token-window fingerprints per document —
    shared by substring-span dedup and benchmark decontamination.

    r7 optimization (guide §4.2, same shape as _minhash_bands): the
    posexplode + 7-lead window (a doc_id shuffle of every token) + md5
    Column + dropDuplicates (a second shuffle on (doc_id, fp)) collapse
    into one vectorized Arrow pass that emits the per-doc DISTINCT
    fingerprints directly (a python set — within-doc dedup needs no
    exchange at all).  Tokenization/md5 parity as in _minhash_bands;
    verified hash-identical vs the DuckDB oracle at sf0.001/0.01/0.1."""
    import pyarrow as pa

    out_schema = pa.schema([
        pa.field("doc_id", pa.int64()),
        pa.field("fp", pa.string()),
    ])

    def mapper(batches):
        import hashlib
        import re

        ws = re.compile(_WS_RE)
        md5 = hashlib.md5
        k = _SPAN_TOKENS
        for batch in batches:
            out_ids: list = []
            out_fps: list = []
            for did, text in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("text").to_pylist()):
                if not text:
                    continue
                toks = [t for t in ws.split(text.lower()) if t]
                n = len(toks) - k + 1
                if n <= 0:
                    continue
                fps = {md5(" ".join(toks[i:i + k]).encode()).hexdigest()
                       for i in range(n)}
                out_ids.extend([did] * len(fps))
                out_fps.extend(fps)
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_ids, type=pa.int64()),
                 pa.array(out_fps, type=pa.string())],
                schema=out_schema)

    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id", "text")
        .repartition(n_parts, "doc_id")
        .mapInArrow(mapper, schema="doc_id long, fp string")
    )


def q_dedup_substring_spans(spark, sf_dir):
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    spans = _span_fps(docs).select(
        "fp", F.col("doc_id").cast("string").alias("sid"))
    wfp = Window.partitionBy("fp").orderBy("sid")
    ranked = spans.withColumn("rn", F.row_number().over(wfp))
    return (
        ranked.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # collect_list skips NULLs, so only the first K ranked ids
            # accumulate; sorted because rank order == string order
            F.array_join(F.array_sort(F.collect_list(
                F.when(F.col("rn") <= _SPAN_IDS_CAP, F.col("sid")))),
                ",").alias("doc_ids"),
        )
        .filter(F.col("n_docs") >= 2)
    )


SQL_DEDUP_SUBSTRING_SPANS = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS t
  FROM documents
), exploded_spans AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) < {w} THEN []
              ELSE list_transform(generate_series(1, len(t) - {w} + 1),
                                  i -> array_to_string(t[i:i+{w}-1], ' '))
         END) AS s
  FROM toks
), spans AS (
  SELECT DISTINCT doc_id, md5(s) AS fp FROM exploded_spans
), ranked AS (
  SELECT fp, CAST(doc_id AS VARCHAR) AS sid,
         row_number() OVER (PARTITION BY fp ORDER BY CAST(doc_id AS VARCHAR)) AS rn
  FROM spans
)
SELECT fp, count(*) AS n_docs,
       array_to_string(list_sort(list(sid) FILTER (WHERE rn <= {k})), ',') AS doc_ids
FROM ranked GROUP BY fp HAVING count(*) >= 2
""".format(w=_SPAN_TOKENS, k=_SPAN_IDS_CAP)


# -- benchmark decontamination ----------------------------------------------------
# The eval-set-leakage pass an LLM corpus runs before training
# (n-gram-overlap decontamination): any training doc sharing an 8-token
# span fingerprint with a benchmark document is flagged.  The benchmark
# here is the deterministic ``doc_id % 50 == 0`` slice of the same table
# (a stand-in eval set; production passes a separate benchmark table
# through the same ``bench_docs`` parameter).  Scale shape: the
# benchmark fingerprint set is tiny relative to the corpus -> broadcast
# to the corpus-side join; the corpus side never self-joins and the
# flag aggregation is a skew-free groupBy on doc_id.

def q_corpus_decontaminate(spark, sf_dir, bench_docs=None):
    docs = _docs(spark, sf_dir)
    fps = _span_fps(docs)
    if bench_docs is not None:
        bench = _span_fps(bench_docs).select("fp").distinct()
        train_fps = fps
        train_ids = docs.select("doc_id")
    else:
        bench = fps.filter(F.col("doc_id") % 50 == 0).select("fp").distinct()
        train_fps = fps.filter(F.col("doc_id") % 50 != 0)
        train_ids = docs.filter(F.col("doc_id") % 50 != 0).select("doc_id")
    hits = (
        train_fps.join(F.broadcast(bench), "fp")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    n_hits = F.coalesce("n_hits", F.lit(0))
    return (
        train_ids.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            n_hits.alias("n_hits"),
            (n_hits > 0).alias("contaminated"),
        )
    )


SQL_CORPUS_DECONTAMINATE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS t
  FROM documents
), exploded_spans AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) < {w} THEN []
              ELSE list_transform(generate_series(1, len(t) - {w} + 1),
                                  i -> array_to_string(t[i:i+{w}-1], ' '))
         END) AS s
  FROM toks
), spans AS (
  SELECT DISTINCT doc_id, md5(s) AS fp FROM exploded_spans
), bench AS (
  SELECT DISTINCT fp FROM spans WHERE doc_id % 50 = 0
), hits AS (
  SELECT doc_id, count(*) AS n_hits
  FROM spans JOIN bench USING (fp)
  WHERE doc_id % 50 <> 0
  GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(h.n_hits, 0) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 50 <> 0
""".format(w=_SPAN_TOKENS)


# -- corpus curation (the end-to-end training-data pass) --------------------------
# What an LLM-data pipeline actually runs before training: quality gate
# (length/token/punct thresholds) + language gate (n-gram lang id) +
# near-dup collapse (minhash-LSH connected components) keeping ONE
# representative per cluster — highest token count, doc_id tie-break.
# Shuffle profile at 100 TB: the cluster labels join (doc_id, high
# cardinality) + one window over cluster_id (bounded partitions — the
# hot-band cap bounds cluster sizes).  Oracle: same recursive-CTE
# clusters + window in DuckDB.

def q_curate_corpus(spark, sf_dir, labels=None):
    """``labels`` accepts a precomputed (doc_id, cluster_id) DataFrame —
    a production pipeline computes cluster labels ONCE per corpus
    version and feeds every downstream curation/query from it instead of
    re-running the minhash+propagation pipeline per call (same
    persist-the-expensive-artifact rule as similarity.train_ivf); the
    default recomputes them, which is the oracle-twin shape."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    # the ONE whitespace-tokenizer literal (ops/textops.py) — re-typing
    # the escaped SQL string here is how the Spark/DuckDB token counts
    # silently diverge (CLAUDE.md backslash rule)
    from kgmwcp.ops.textops import _ws_tokens

    toks = _ws_tokens()
    n_tokens = F.size(toks)
    punct = F.regexp_count(F.col("text"), F.lit(r"[^A-Za-z0-9 \t\n\x0B\f\r]"))
    passes_quality = (
        (F.length("text") >= 40) & (n_tokens >= 8)
        & (punct / F.greatest(F.length("text"), F.lit(1)) < 0.2)
    )
    lang_scores = {
        lang: F.regexp_count(F.lower("text"), F.lit(rx))
        for lang, rx in _CURATE_LANG_MARKERS.items()
    }
    best = F.greatest(*lang_scores.values())
    lang_guess = F.lit("und")
    for lang in reversed(list(_CURATE_LANG_MARKERS)):
        lang_guess = F.when(
            (lang_scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(lang_guess)
    scored = docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        passes_quality.alias("passes_quality"),
        lang_guess.alias("lang_guess"),
    )
    if labels is None:
        labels = q_dedup_cluster(spark, sf_dir)
    kept = (
        scored.join(labels, "doc_id")
        .filter(F.col("passes_quality") & (F.col("lang_guess") != "und"))
    )
    w = Window.partitionBy("cluster_id")
    ranked = (
        kept.withColumn(
            "rn",
            F.row_number().over(
                w.orderBy(F.col("n_tokens").desc(), F.col("doc_id").asc())),
        )
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .select("doc_id", "cluster_id", "lang_guess", "n_tokens",
                "cluster_size")
    )


_CURATE_LANG_MARKERS = {
    "en": r"\b(the|and|of|to|is)\b",
    "es": r"\b(el|la|de|que|los)\b",
    "de": r"\b(der|die|und|das|ist)\b",
    "fr": r"\b(le|la|les|des|est)\b",
}


def _sql_curate_corpus() -> str:
    base = SQL_DEDUP_CLUSTER
    marker = "SELECT doc_id, min(root) AS cluster_id\nFROM reach GROUP BY doc_id"
    assert marker in base, "unexpected cluster SQL shape"
    ctes = base.replace(marker, "").rstrip()
    return ctes + r"""
, labels AS (
  SELECT doc_id, min(root) AS cluster_id FROM reach GROUP BY doc_id
), scored AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'), x -> x <> ''))
           AS n_tokens,
         (length(text) >= 40
          AND len(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'), x -> x <> '')) >= 8
          AND len(regexp_extract_all(text, '[^A-Za-z0-9 \t\n\x0B\f\r]'))
              / greatest(length(text), 1) < 0.2) AS passes_quality,
         CASE
           WHEN score_en = best AND best > 0 THEN 'en'
           WHEN score_es = best AND best > 0 THEN 'es'
           WHEN score_de = best AND best > 0 THEN 'de'
           WHEN score_fr = best AND best > 0 THEN 'fr'
           ELSE 'und'
         END AS lang_guess
  FROM (
    SELECT *, greatest(score_en, score_es, score_de, score_fr) AS best
    FROM (
      SELECT doc_id, text,
             length(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b')) AS score_en,
             length(regexp_extract_all(lower(text), '\b(el|la|de|que|los)\b')) AS score_es,
             length(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')) AS score_de,
             length(regexp_extract_all(lower(text), '\b(le|la|les|des|est)\b')) AS score_fr
      FROM documents
    )
  )
), kept AS (
  SELECT s.doc_id, s.n_tokens, s.lang_guess, l.cluster_id
  FROM scored s JOIN labels l USING (doc_id)
  WHERE s.passes_quality AND s.lang_guess <> 'und'
)
SELECT doc_id, cluster_id, lang_guess, n_tokens, cluster_size
FROM (
  SELECT doc_id, cluster_id, lang_guess, n_tokens,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_tokens DESC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS cluster_size
  FROM kept
) WHERE rn = 1
"""


SQL_CURATE_CORPUS = _sql_curate_corpus()


# -- SimHash ----------------------------------------------------------------------
# 60-bit simhash over tokens; bit b set when the +1/-1 vote over token-hash
# bit b is positive.  Token hash = first 15 hex digits of md5 = 60 bits —
# the widest prefix that parses into a SIGNED int64 on both engines (16 hex
# digits overflow BIGINT when the top bit is set; Spark's conv→cast would
# null out and DuckDB would error).  2^60 hash space fixes the round-1
# 16-bit version's heavy collisions at web scale.

_SIMHASH_BITS = 60


def q_dedup_simhash(spark, sf_dir):
    """r7 (guide §4.2, same template as _minhash_bands): the simhash is a
    purely per-document reduction, so the explode + 60-vote aggregate
    (a token-row shuffle feeding a 60-expression HashAggregate pair plus
    a 60-branch bit-reassembly projection) collapses into one vectorized
    Arrow pass — popcounts per bit via numpy, exact integer votes,
    identical simhash values (verified vs the DuckDB oracle at
    sf0.001/0.01/0.1)."""
    import pyarrow as pa

    docs = _docs(spark, sf_dir)
    out_schema = pa.schema([
        pa.field("doc_id", pa.int64()),
        pa.field("simhash", pa.int64()),
    ])

    def mapper(batches):
        import hashlib
        import re

        import numpy as np

        ws = re.compile(_WS_RE)
        md5 = hashlib.md5
        shifts = np.arange(_SIMHASH_BITS, dtype=np.int64)[:, None]
        weights = (np.int64(1) << shifts[:, 0])
        for batch in batches:
            doc_ids, h_parts, lens = [], [], []
            for did, text in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("text").to_pylist()):
                if not text:
                    continue
                toks = [t for t in ws.split(text.lower()) if t]
                if not toks:
                    continue
                hs = np.fromiter(
                    (int(md5(t.encode()).hexdigest()[:15], 16)
                     for t in toks),
                    dtype=np.int64, count=len(toks))
                doc_ids.append(did)
                h_parts.append(hs)
                lens.append(len(toks))
            if not doc_ids:
                yield pa.RecordBatch.from_arrays(
                    [pa.array([], type=pa.int64()),
                     pa.array([], type=pa.int64())], schema=out_schema)
                continue
            hall = np.concatenate(h_parts)
            bits = (hall[None, :] >> shifts) & 1          # (60, total)
            offsets = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            ones = np.add.reduceat(bits, offsets, axis=1)  # (60, ndocs)
            n = np.array(lens, dtype=np.int64)[None, :]
            votes = 2 * ones - n                           # +1/-1 vote sums
            sim = ((votes > 0).astype(np.int64)
                   * weights[:, None]).sum(axis=0)
            yield pa.RecordBatch.from_arrays(
                [pa.array(doc_ids, type=pa.int64()),
                 pa.array(sim, type=pa.int64())], schema=out_schema)

    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id", "text")
        .repartition(n_parts, "doc_id")
        .mapInArrow(mapper, schema="doc_id long, simhash long")
    )


SQL_DEDUP_SIMHASH = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
                x -> x <> '')) AS token
  FROM documents
), hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(token), 1, 15))::BIGINT AS h
  FROM toks
), voted AS (
  SELECT doc_id,
         {votes}
  FROM hashed GROUP BY doc_id
)
SELECT doc_id, ({bits})::BIGINT AS simhash FROM voted
""".format(
    votes=",\n         ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(_SIMHASH_BITS)
    ),
    bits=" + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(_SIMHASH_BITS)
    ),
)


# -- n-gram Jaccard on LSH candidates ------------------------------------------------

# Hot-bucket cap for the minsig blocking join, mirroring _BAND_CAP: a
# boilerplate shingle that happens to be the min-md5 shingle of a million
# docs (license headers — exactly what dedup_substring_spans exists to
# find) would make that one `sig` bucket quadratic in the self-join.
# Buckets larger than the cap are dropped before the join — the same
# recall-for-boundedness trade the LSH band cap makes.
_SIG_CAP = 64


def q_dedup_ngram_jaccard(spark, sf_dir):
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    # NOT persisted, unlike the LSH bands table: A/B-measured at sf0.1
    # (interleaved rounds) the recompute-per-alias form wins 1.5-2.7 s
    # vs 2.3-3.1 s persisted — the shingle pipeline is one codegen'd
    # pass that Catalyst recomputes in parallel subtrees, while persist
    # adds a materialization barrier + store cost.  LSH persists because
    # its recomputed pipeline carries 128 min-aggs per row; this one is
    # a single md5-min.  At 100 TB revisit: 4 scans of the corpus vs one
    # spill-backed materialization flips with corpus width.
    exploded = _distinct_shingles(docs)
    sizes = exploded.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    # candidates: pairs sharing the min-md5 shingle (1-band minhash blocking)
    minsig = exploded.groupBy("doc_id").agg(
        F.min(F.md5(F.encode("shingle", "utf-8"))).alias("sig")
    )
    wsig = Window.partitionBy("sig")
    minsig = (
        minsig.withColumn("sc", F.count(F.lit(1)).over(wsig))
        .filter(F.col("sc") <= _SIG_CAP)
        .drop("sc")
    )
    cand = (
        minsig.alias("a").join(minsig.alias("b"), "sig")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    inter = (
        cand.join(exploded.alias("ea"), F.col("doc_a") == F.col("ea.doc_id"))
        .join(
            exploded.alias("eb"),
            (F.col("doc_b") == F.col("eb.doc_id"))
            & (F.col("ea.shingle") == F.col("eb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sized = (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a", "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )
    return sized.filter(F.col("jaccard") >= 0.5)


SQL_DEDUP_NGRAM_JACCARD = (_SQL_SHINGLES_CTE + """
, dedup_sh AS (
  SELECT doc_id, list_distinct(shingles) AS shingles FROM shingled
), exploded AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM dedup_sh
), sizes AS (
  SELECT doc_id, len(shingles) AS n_sh FROM dedup_sh
), minsig_raw AS (
  SELECT doc_id, min(md5(shingle)) AS sig FROM exploded GROUP BY doc_id
), minsig AS (
  SELECT doc_id, sig FROM (
    SELECT doc_id, sig, count(*) OVER (PARTITION BY sig) AS sc
    FROM minsig_raw
  ) WHERE sc <= {cap}
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM minsig a JOIN minsig b USING (sig)
  WHERE a.doc_id < b.doc_id
), inter AS (
  SELECT doc_a, doc_b, count(*) AS n_inter
  FROM cand
  JOIN exploded ea ON doc_a = ea.doc_id
  JOIN exploded eb ON doc_b = eb.doc_id AND ea.shingle = eb.shingle
  GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b,
       round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.5
""").format(cap=_SIG_CAP)


# -- per-doc boilerplate fraction (segment-level dedup rollup) ----------------
# The curation-side inverse of dedup_substring_spans: instead of emitting
# span→docs rows, roll up per document "what fraction of MY content is
# duplicated elsewhere" (the CCNet/RefinedWeb paragraph-dedup signal, over
# fixed 8-token segments because the driver corpus is single-line word
# streams with no newline paragraphs).  Scale shape: one explode (stride ==
# window, so each token appears in exactly one segment — corpus token count,
# not 8x), one md5-keyed groupBy (skew-free key space; a hot boilerplate
# segment is a single key whose count-distinct is computed with map-side
# partial aggregation, not a join fanout), one join back + per-doc agg.

def q_text_boilerplate_frac(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), _WS_RE), lambda x: x != "").alias("toks"),
    )
    seg = (
        toks.select(
            "doc_id",
            "toks",
            F.explode(
                F.when(
                    F.size("toks") >= 8,
                    F.sequence(F.lit(1), F.size("toks") - 7, F.lit(8)),
                ).otherwise(F.array())
            ).alias("start"),
        )
        .select(
            "doc_id",
            F.md5(
                F.encode(
                    F.array_join(F.slice("toks", F.col("start"), 8), " "), "utf-8"
                )
            ).alias("ph"),
        )
    )
    counts = seg.groupBy("ph").agg(F.countDistinct("doc_id").alias("nd"))
    per_doc = (
        seg.join(counts, "ph")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias("n_dup_segs"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_segs", F.lit(0)).alias("n_segs"),
            F.coalesce("n_dup_segs", F.lit(0)).alias("n_dup_segs"),
            F.round(
                F.coalesce("n_dup_segs", F.lit(0))
                / F.greatest(F.coalesce("n_segs", F.lit(0)), F.lit(1)),
                4,
            ).alias("boilerplate_frac"),
        )
    )


SQL_TEXT_BOILERPLATE_FRAC = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'),
                     x -> x <> '') AS toks
  FROM documents
),
seg AS (
  SELECT doc_id, md5(array_to_string(toks[start : start + 7], ' ')) AS ph
  FROM (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - 7, 8)) AS start
        FROM toks WHERE len(toks) >= 8)
),
counts AS (SELECT ph, count(DISTINCT doc_id) AS nd FROM seg GROUP BY ph),
per_doc AS (
  SELECT doc_id, count(*) AS n_segs,
         sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_segs
  FROM seg JOIN counts USING (ph) GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(n_segs, 0) AS n_segs,
       coalesce(n_dup_segs, 0) AS n_dup_segs,
       round(coalesce(n_dup_segs, 0)::DOUBLE
             / greatest(coalesce(n_segs, 0), 1), 4) AS boilerplate_frac
FROM documents d LEFT JOIN per_doc USING (doc_id)
"""


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_incremental": q_dedup_incremental,
    "text_boilerplate_frac": q_text_boilerplate_frac,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_lsh_precision": q_dedup_lsh_precision,
    "dedup_simhash": q_dedup_simhash,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_cluster": q_dedup_cluster,
    "curate_corpus": q_curate_corpus,
    "dedup_substring_spans": q_dedup_substring_spans,
    "corpus_decontaminate": q_corpus_decontaminate,
}

ORACLES = {
    "dedup_incremental": SQL_DEDUP_INCREMENTAL,
    "text_boilerplate_frac": SQL_TEXT_BOILERPLATE_FRAC,
    "dedup_cluster": SQL_DEDUP_CLUSTER,
    "curate_corpus": SQL_CURATE_CORPUS,
    "dedup_substring_spans": SQL_DEDUP_SUBSTRING_SPANS,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_minhash_lsh": SQL_DEDUP_MINHASH_LSH,
    "dedup_lsh_precision": _sql_dedup_lsh_precision(),
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "dedup_ngram_jaccard": SQL_DEDUP_NGRAM_JACCARD,
    "corpus_decontaminate": SQL_CORPUS_DECONTAMINATE,
}
