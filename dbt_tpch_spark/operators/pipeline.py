"""End-to-end training-data cleaning pipeline: quality filter + near-dup
removal composed from the individual operators — the shape a pretraining
data pipeline runs nightly at 100 TB (filter first to shrink, then dedup,
keep the lowest doc_id of each near-dup cluster).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_tpch_spark.plans import model
from dbt_tpch_spark.models.oracle import oracle

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
