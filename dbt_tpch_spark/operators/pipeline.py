"""End-to-end training-data cleaning pipeline: quality filter + near-dup
removal composed from the individual operators — the shape a pretraining
data pipeline runs nightly at 100 TB (filter first to shrink, then dedup,
keep the lowest doc_id of each near-dup cluster).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_tpch_spark.plans import model
from dbt_tpch_spark.functions import rnd
from dbt_tpch_spark.models.oracle import oracle, rnd_sql

MIN_TOKENS = 30
MIN_QUALITY = 0.5


@model("docs_clean_corpus", layer="operators", materialization="view")
def docs_clean_corpus(ctx):
    """Documents that (a) pass the quality gate and (b) survive near-dup
    removal (for each verified MinHash-LSH pair, the higher doc_id drops).

    Composition is plain model refs — Catalyst fuses the whole pipeline
    into one plan; the anti-join is the standard dedup-keep-canonical step.
    """
    stats = ctx.ref("doc_text_stats")
    dups = ctx.ref("dedup_minhash_lsh").select(F.col("doc_b").alias("doc_id")).distinct()
    return (
        stats.filter(
            (F.col("n_tokens") >= MIN_TOKENS)
            & (F.col("quality_score") >= MIN_QUALITY)
        )
        .join(dups, "doc_id", "left_anti")
        .select(
            "doc_id",
            "lang",
            "source",
            "n_tokens",
            "quality_score",
        )
    )


oracle(
    "docs_clean_corpus",
    ("doc_text_stats", "dedup_minhash_lsh"),
    f"""SELECT
    s.doc_id,
    s.lang,
    s.source,
    s.n_tokens,
    s.quality_score
FROM doc_text_stats s
WHERE s.n_tokens >= {MIN_TOKENS}
  AND s.quality_score >= {MIN_QUALITY}
  AND NOT EXISTS (SELECT 1 FROM dedup_minhash_lsh d WHERE d.doc_b = s.doc_id)""",
)


@model("docs_training_manifest", layer="operators", materialization="view")
def docs_training_manifest(ctx):
    """The full pretraining-data pipeline as ONE declarative plan:

        quality gate -> near-dup removal (docs_clean_corpus)
        -> stratified language rebalancing (sample-by-hash)
        -> context-window chunking -> shard assignment
        -> sequence packing -> per-(shard, seq) manifest row

    Each stage is a model ref, so Catalyst fuses the whole thing; the
    output is the manifest a trainer consumes (sequence id, token count,
    chunk/doc lineage counts). The packing cumsum keys on the cleaned +
    sampled chunk stream, so sequences are dense over exactly the
    surviving data — this is what `write.partitionBy(shard_id)` would
    materialize at 100 TB.
    """
    from pyspark.sql import Window

    from dbt_tpch_spark.operators.sampling import (
        SEQ_CAPACITY,
        _shard_expr_spark,
    )

    kept = ctx.ref("docs_clean_corpus").select("doc_id")
    sampled = ctx.ref("docs_sample_stratified").select("doc_id")
    chunks = (
        ctx.ref("doc_chunks")
        .join(kept, "doc_id")
        .join(sampled, "doc_id")
        .withColumn("shard_id", _shard_expr_spark())
    )
    w = (
        Window.partitionBy("shard_id")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_chunk_tokens").over(w).cast("long")
    with_seq = chunks.withColumn(
        "seq_id", ((cum - F.col("n_chunk_tokens")) / SEQ_CAPACITY).cast("long")
    )
    return with_seq.groupBy("shard_id", "seq_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("n_chunk_tokens").cast("long").alias("seq_tokens"),
        F.min("doc_id").alias("first_doc_id"),
        F.max("doc_id").alias("last_doc_id"),
    )


def _manifest_oracle() -> str:
    from dbt_tpch_spark.operators.sampling import (
        SEQ_CAPACITY,
        _SHARD_EXPR_DUCK,
    )

    return f"""WITH survivors AS (
    SELECT c.doc_id, c.chunk_idx, c.n_chunk_tokens
    FROM doc_chunks c
    JOIN docs_clean_corpus k ON c.doc_id = k.doc_id
    JOIN docs_sample_stratified s ON c.doc_id = s.doc_id
),
sharded AS (
    SELECT *, {_SHARD_EXPR_DUCK} AS shard_id FROM survivors
),
offs AS (
    SELECT *,
        CAST(SUM(n_chunk_tokens) OVER (
            PARTITION BY shard_id ORDER BY doc_id, chunk_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS BIGINT) - n_chunk_tokens AS start_off
    FROM sharded
)
SELECT
    shard_id,
    CAST(start_off // {SEQ_CAPACITY} AS BIGINT) AS seq_id,
    COUNT(*) AS n_chunks,
    COUNT(DISTINCT doc_id) AS n_docs,
    CAST(SUM(n_chunk_tokens) AS BIGINT) AS seq_tokens,
    MIN(doc_id) AS first_doc_id,
    MAX(doc_id) AS last_doc_id
FROM offs
GROUP BY 1, 2"""


oracle(
    "docs_training_manifest",
    ("doc_chunks", "docs_clean_corpus", "docs_sample_stratified"),
    _manifest_oracle(),
)


@model("docs_dataset_card", layer="operators", materialization="view")
def docs_dataset_card(ctx):
    """The corpus datasheet: ONE row of headline statistics a training
    run records next to its manifest — volume, language/source spread,
    exact- and near-duplication burden. Composition, not recomputation:
    duplication numbers ride the already-materialized detector models
    (``ctx.ref`` DAG edges), so the card costs three tiny aggregations
    plus one corpus scan.

    Scale: every input to the final cross-join is a <=1-row aggregate;
    the only corpus-sized work is the base profile scan and whatever the
    referenced detectors already did."""
    d = ctx.source("documents")
    core = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        rnd(F.sum("n_chars") / F.count(F.lit(1)), 2).alias("avg_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )
    ex = ctx.ref("dedup_exact").agg(
        F.count(F.lit(1)).cast("long").alias("exact_dup_groups"),
        F.coalesce(F.sum(F.col("dup_count") - 1), F.lit(0))
        .cast("long")
        .alias("exact_excess_docs"),
    )
    # ONE consumption of the pair model: explode both endpoints, count
    # rows/2 for pairs and distinct ids for touched docs — referencing the
    # LSH model twice would run its whole pipeline twice
    near = (
        ctx.ref("dedup_minhash_lsh")
        .select(
            F.explode(F.array(F.col("doc_a"), F.col("doc_b"))).alias("doc_id")
        )
        .agg(
            (F.count(F.lit(1)) / 2).cast("long").alias("near_dup_pairs"),
            F.countDistinct("doc_id").cast("long").alias("near_dup_docs"),
        )
    )
    return (
        core.crossJoin(F.broadcast(ex))
        .crossJoin(F.broadcast(near))
        .select(
            "n_docs",
            "total_chars",
            "avg_chars",
            "n_langs",
            "n_sources",
            "exact_dup_groups",
            "exact_excess_docs",
            "near_dup_pairs",
            "near_dup_docs",
            rnd(F.col("exact_excess_docs") / F.col("n_docs"), 6).alias(
                "exact_dup_rate"
            ),
            rnd(F.col("near_dup_docs") / F.col("n_docs"), 6).alias(
                "near_dup_rate"
            ),
        )
    )


oracle(
    "docs_dataset_card",
    ("documents", "dedup_exact", "dedup_minhash_lsh"),
    f"""WITH core AS (
    SELECT
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        {rnd_sql('SUM(n_chars) / COUNT(*)', 2)} AS avg_chars,
        CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM documents
),
ex AS (
    SELECT
        CAST(COUNT(*) AS BIGINT) AS exact_dup_groups,
        CAST(COALESCE(SUM(dup_count - 1), 0) AS BIGINT) AS exact_excess_docs
    FROM dedup_exact
),
np AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS near_dup_pairs FROM dedup_minhash_lsh
),
nd AS (
    SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS near_dup_docs FROM (
        SELECT doc_a AS doc_id FROM dedup_minhash_lsh
        UNION ALL
        SELECT doc_b AS doc_id FROM dedup_minhash_lsh
    )
)
SELECT
    core.n_docs,
    core.total_chars,
    core.avg_chars,
    core.n_langs,
    core.n_sources,
    ex.exact_dup_groups,
    ex.exact_excess_docs,
    np.near_dup_pairs,
    nd.near_dup_docs,
    {rnd_sql('CAST(ex.exact_excess_docs AS DOUBLE) / core.n_docs', 6)} AS exact_dup_rate,
    {rnd_sql('CAST(nd.near_dup_docs AS DOUBLE) / core.n_docs', 6)} AS near_dup_rate
FROM core CROSS JOIN ex CROSS JOIN np CROSS JOIN nd""",
)


@model("docs_pipeline_funnel", layer="operators", materialization="view")
def docs_pipeline_funnel(ctx):
    """Stage-by-stage survival funnel of the cleaning pipeline — the
    observability row a 100 TB data-curation run publishes after every
    build: raw corpus → quality gate → exact dedup (keep the lowest
    doc_id among quality-passing members of each content-hash group) →
    near-dup removal (MinHash doc_b drops, the docs_clean_corpus rule).
    One row per stage with docs surviving, docs removed at that stage,
    and the share of the raw corpus still alive.

    Scale shape: one corpus hash projection + one content-hash aggregate
    + broadcast-able drop list; the funnel itself is a 4-row stack over
    scalar counts."""
    from dbt_tpch_spark.operators.dedup import norm_text_col

    d = ctx.source("documents").select(
        "doc_id", F.md5(norm_text_col()).alias("content_hash")
    )
    stats = ctx.ref("doc_text_stats")
    q = stats.filter(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("quality_score") >= MIN_QUALITY)
    ).select("doc_id")
    qh = d.join(q, "doc_id")
    canon = qh.groupBy("content_hash").agg(F.min("doc_id").alias("keep_id"))
    e = (
        qh.join(canon, "content_hash")
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id")
    )
    drops = (
        ctx.ref("dedup_minhash_lsh")
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    f = e.join(drops, "doc_id", "left_anti")
    n0 = d.agg(F.count(F.lit(1)).cast("long").alias("n0"))
    n1 = q.agg(F.count(F.lit(1)).cast("long").alias("n1"))
    n2 = e.agg(F.count(F.lit(1)).cast("long").alias("n2"))
    n3 = f.agg(F.count(F.lit(1)).cast("long").alias("n3"))
    row = n0.crossJoin(n1).crossJoin(n2).crossJoin(n3)
    funnel = row.selectExpr(
        "n0",
        """stack(4,
            CAST(0 AS BIGINT), 'raw',            n0, CAST(0 AS BIGINT),
            CAST(1 AS BIGINT), 'quality_filter', n1, n0 - n1,
            CAST(2 AS BIGINT), 'exact_dedup',    n2, n1 - n2,
            CAST(3 AS BIGINT), 'near_dedup',     n3, n2 - n3
        ) AS (stage_order, stage, n_docs, n_removed)""",
    )
    return funnel.select(
        "stage_order",
        "stage",
        "n_docs",
        "n_removed",
        rnd(F.col("n_docs").cast("double") / F.col("n0"), 6).alias(
            "pct_of_raw"
        ),
    )


def _funnel_oracle() -> str:
    from dbt_tpch_spark.operators.dedup import _NORM_TEXT_DUCK

    return f"""WITH q AS (
    SELECT doc_id FROM doc_text_stats
    WHERE n_tokens >= {MIN_TOKENS} AND quality_score >= {MIN_QUALITY}
),
dh AS (
    SELECT doc_id, md5({_NORM_TEXT_DUCK}) AS content_hash FROM documents
),
qh AS (SELECT dh.doc_id, dh.content_hash FROM dh JOIN q USING (doc_id)),
e AS (
    SELECT doc_id FROM (
        SELECT doc_id,
               MIN(doc_id) OVER (PARTITION BY content_hash) AS keep_id
        FROM qh
    ) WHERE doc_id = keep_id
),
f AS (
    SELECT doc_id FROM e
    WHERE NOT EXISTS (
        SELECT 1 FROM dedup_minhash_lsh m WHERE m.doc_b = e.doc_id
    )
),
c AS (
    SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n0,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM q) AS n1,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n2,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM f) AS n3
)
SELECT CAST(0 AS BIGINT) AS stage_order, 'raw' AS stage, n0 AS n_docs,
       CAST(0 AS BIGINT) AS n_removed,
       {rnd_sql('CAST(n0 AS DOUBLE) / n0', 6)} AS pct_of_raw
FROM c
UNION ALL
SELECT CAST(1 AS BIGINT), 'quality_filter', n1, n0 - n1,
       {rnd_sql('CAST(n1 AS DOUBLE) / n0', 6)}
FROM c
UNION ALL
SELECT CAST(2 AS BIGINT), 'exact_dedup', n2, n1 - n2,
       {rnd_sql('CAST(n2 AS DOUBLE) / n0', 6)}
FROM c
UNION ALL
SELECT CAST(3 AS BIGINT), 'near_dedup', n3, n2 - n3,
       {rnd_sql('CAST(n3 AS DOUBLE) / n0', 6)}
FROM c"""


oracle(
    "docs_pipeline_funnel",
    ("documents", "doc_text_stats", "dedup_minhash_lsh"),
    _funnel_oracle(),
)


# --------------------------------------------------------------------------
# transactional table format: CDC audit as an oracle-checked query
# --------------------------------------------------------------------------


@model("txn_snapshot_diff", layer="operators", materialization="view")
def txn_snapshot_diff(ctx):
    """Change-data audit of a deterministic TxnTable build: CREATE a
    keyed table from a fixed slice of ``orders``, MERGE an overlapping
    upsert batch, copy-on-write DELETE a key class, then report
    ``snapshot_diff`` row counts for each transition — the table-format
    CDC machinery (dbt_tpch_spark/tableformat.py) exercised end-to-end
    against a pure-SQL oracle that derives the same insert/update/delete
    counts from the raw source (so a misclassification anywhere in the
    log replay, file diffing, or row classification breaks the hash).

    Build (all key sets are modulo classes of the dense o_orderkey):
      v0 CREATE  keys with k%10 in 0..4
      v1 MERGE   keys with k%10 in 3..6, o_totalprice shifted +1
                 (3,4 update in place; 5,6 insert)
      v2 DELETE  WHERE k%10 = 0

    Scale shape: snapshot_diff reads only files that differ between the
    snapshots (shared files cancel by log reference); the query output is
    two rows of counts."""
    import shutil
    import tempfile

    from dbt_tpch_spark.tableformat import TxnTable

    o = ctx.source("orders").select("o_orderkey", "o_custkey", "o_totalprice")
    base = o.filter(F.col("o_orderkey") % 10 < 5)
    upsert = o.filter(
        (F.col("o_orderkey") % 10 >= 3) & (F.col("o_orderkey") % 10 <= 6)
    ).withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1.0))
    path = tempfile.mkdtemp(prefix="txn_snapshot_diff_")
    try:
        t = TxnTable.create(ctx.spark, f"{path}/t", base, ["o_orderkey"])
        t.merge(upsert)  # v1
        t.delete_where("o_orderkey % 10 = 0")  # v2
        d1 = t.snapshot_diff(0, 1)
        d2 = t.snapshot_diff(1, 2)
    finally:
        shutil.rmtree(path, ignore_errors=True)
    rows = [
        (0, 1, d1["rows_inserted"], d1["rows_deleted"], d1["rows_updated"]),
        (1, 2, d2["rows_inserted"], d2["rows_deleted"], d2["rows_updated"]),
    ]
    return ctx.spark.createDataFrame(
        rows,
        "v_from long, v_to long, rows_inserted long, rows_deleted long,"
        " rows_updated long",
    )


oracle(
    "txn_snapshot_diff",
    ("orders",),
    """SELECT
    CAST(0 AS BIGINT) AS v_from,
    CAST(1 AS BIGINT) AS v_to,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
      WHERE o_orderkey % 10 IN (5, 6)) AS rows_inserted,
    CAST(0 AS BIGINT) AS rows_deleted,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
      WHERE o_orderkey % 10 IN (3, 4)) AS rows_updated
UNION ALL
SELECT
    CAST(1 AS BIGINT),
    CAST(2 AS BIGINT),
    CAST(0 AS BIGINT),
    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
      WHERE o_orderkey % 10 = 0),
    CAST(0 AS BIGINT)""",
)
