"""The 10x scale probe's synthetic corpus must be a FAITHFUL scale-up:
exact row multiplication, FK consistency inside each replica, dup
structure preserved within a replica and NOT planted across replicas.
If the replicator silently broke any of these, the measured scaling
exponents (SCALE_PROBE_r{N}.json, PLANS.md) would measure a different
workload than the one they claim to.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import scale_probe


@pytest.fixture(scope="module")
def corpus(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scale2x"))
    scale_probe.build_scaled_corpus(spark, sf_dir, out, replicas=2, n_files=4)
    return out


def test_row_counts_multiply_exactly(spark, sf_dir, corpus):
    for table in scale_probe._KEYED:
        n_src = spark.read.parquet(f"{sf_dir}/{table}.parquet").count()
        n_out = spark.read.parquet(f"{corpus}/{table}.parquet").count()
        assert n_out == 2 * n_src, table
    for table in scale_probe._DIMS:
        n_src = spark.read.parquet(f"{sf_dir}/{table}.parquet").count()
        n_out = spark.read.parquet(f"{corpus}/{table}.parquet").count()
        assert n_out == n_src, table


def test_fk_consistency_survives_the_shift(spark, corpus):
    """Replica k's lineitem must reference replica k's orders/parts —
    zero dangling keys, exactly like a corpus that actually grew."""
    li = spark.read.parquet(f"{corpus}/lineitem.parquet")
    orders = spark.read.parquet(f"{corpus}/orders.parquet")
    part = spark.read.parquet(f"{corpus}/part.parquet")
    dangling_o = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "left_anti"
    ).count()
    dangling_p = li.join(
        part, li.l_partkey == part.p_partkey, "left_anti"
    ).count()
    assert dangling_o == 0 and dangling_p == 0
    cust = spark.read.parquet(f"{corpus}/customer.parquet")
    dangling_c = orders.join(
        cust, orders.o_custkey == cust.c_custkey, "left_anti"
    ).count()
    assert dangling_c == 0


def test_no_key_collisions_across_replicas(spark, corpus):
    docs = spark.read.parquet(f"{corpus}/documents.parquet")
    assert docs.select("doc_id").distinct().count() == docs.count()
    ev = spark.read.parquet(f"{corpus}/events.parquet")
    assert ev.select("event_id").distinct().count() == ev.count()


def test_document_dup_structure_is_per_replica(spark, sf_dir, corpus):
    """The token rename is injective, so exact-dup groups replicate
    per replica and texts NEVER collide across replicas: the corpus-wide
    text-group-size histogram is the source histogram doubled."""
    docs = spark.read.parquet(f"{corpus}/documents.parquet")
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src_groups = sorted(
        r["n"]
        for r in src.groupBy("text").agg(F.count("*").alias("n")).collect()
    )
    all_groups = sorted(
        r["n"]
        for r in docs.groupBy("text").agg(F.count("*").alias("n")).collect()
    )
    assert all_groups == sorted(src_groups * 2)
    assert (
        docs.select("text").distinct().count()
        == 2 * src.select("text").distinct().count()
    )


def test_embedding_transform_is_orthogonal(spark, sf_dir, corpus):
    """Within-replica geometry must be exact: every replica vector keeps
    its source norm (sign flips + rotation are orthogonal maps), and
    replica 0 is bit-identical to the source."""
    offs = scale_probe._offsets(spark, sf_dir)
    src = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = spark.read.parquet(f"{corpus}/embeddings.parquet")
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    src_norms = {
        r["vec_id"]: r["n"]
        for r in src.select("vec_id", norm.alias("n")).collect()
    }
    out_rows = out.select("vec_id", norm.alias("n")).collect()
    assert len(out_rows) == 2 * len(src_norms)
    for r in out_rows:
        base = r["vec_id"] % offs["vec"]
        assert base in src_norms, r["vec_id"]
        assert math.isclose(r["n"], src_norms[base], rel_tol=1e-6), r["vec_id"]
    # replica 0 untouched (identity transform): element-wise equality
    joined = out.filter(F.col("vec_id") < offs["vec"]).alias("o").join(
        src.alias("s"), F.col("o.vec_id") == F.col("s.vec_id")
    )
    diff = joined.filter(
        F.col("o.embedding").cast("string")
        != F.col("s.embedding").cast("string")
    ).count()
    assert diff == 0


def test_replicas_are_not_cross_near_dups(spark, sf_dir, corpus):
    """The probe's workload honesty hinges on replicas NOT being near-dups
    of each other: a vector and its own replica-1 copy must land well
    below the 0.5 cosine dedup threshold on average (orthogonal remap),
    and a doc's 3-gram shingles must be disjoint from its copy's."""
    offs = scale_probe._offsets(spark, sf_dir)
    out = spark.read.parquet(f"{corpus}/embeddings.parquet")
    r0 = out.filter(F.col("vec_id") < offs["vec"]).select(
        F.col("vec_id").alias("base"), F.col("embedding").alias("a")
    )
    r1 = out.filter(F.col("vec_id") >= offs["vec"]).select(
        (F.col("vec_id") % offs["vec"]).alias("base"),
        F.col("embedding").alias("b"),
    )
    dot = F.aggregate(
        F.zip_with("a", "b", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            "a", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    nb = F.sqrt(
        F.aggregate(
            "b", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    stats = (
        r0.join(r1, "base")
        .select((dot / (na * nb)).alias("cos"))
        .agg(
            F.avg(F.abs(F.col("cos"))).alias("mean_abs"),
            F.max(F.col("cos")).alias("mx"),
        )
        .first()
    )
    # decorrelated: mean |cos| far below the 0.5 dedup threshold
    assert stats["mean_abs"] < 0.25, stats
    docs = spark.read.parquet(f"{corpus}/documents.parquet")
    d0 = docs.filter(F.col("doc_id") < offs["doc"]).select(
        F.col("doc_id").alias("base"), F.col("text").alias("ta")
    )
    d1 = docs.filter(F.col("doc_id") >= offs["doc"]).select(
        (F.col("doc_id") % offs["doc"]).alias("base"),
        F.col("text").alias("tb"),
    )
    # token suffixes differ, so even the WORD sets are disjoint
    overlap = (
        d0.join(d1, "base")
        .select(
            F.size(
                F.array_intersect(
                    F.split("ta", r"\s+"), F.split("tb", r"\s+")
                )
            ).alias("n")
        )
        .agg(F.max("n"))
        .first()[0]
    )
    assert overlap == 0


def test_replica_cap_fails_loudly(spark, sf_dir, tmp_path):
    """The decorrelation map cycles to the identity at k=64 — replica 64
    would silently plant cross-replica dups, so the builder must refuse."""
    import pytest

    with pytest.raises(ValueError, match="64"):
        scale_probe.build_scaled_corpus(
            spark, sf_dir, str(tmp_path / "x"), replicas=65
        )


# --------------------------------------------------------------------------
# recall leg (round 11): the planted fixtures must hit their similarity
# tiers EXACTLY, or the measured recall numbers grade a different workload
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def recall_corpus(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("recall1x"))
    planted = scale_probe.plant_recall_fixtures(spark, sf_dir, out)
    return out, planted


def test_planted_embedding_pairs_hit_target_cosines(spark, recall_corpus):
    import numpy as np

    out, planted = recall_corpus
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{out}/embeddings.parquet")
        .filter(F.col("vec_id") >= scale_probe.RECALL_ID_BASE)
        .collect()
    }
    n_pairs = 0
    for tier, pairs in planted["cosine"].items():
        target = float(tier)
        for a, b in pairs:
            va, vb = emb[a], emb[b]
            cos = va.dot(vb) / (
                np.linalg.norm(va) * np.linalg.norm(vb)
            )
            # float32 storage rounds the exact construction
            assert abs(cos - target) < 5e-4, (tier, a, b, cos)
            n_pairs += 1
    assert n_pairs == len(scale_probe.RECALL_COSINE_TIERS) * (
        scale_probe.RECALL_PAIRS_PER_TIER
    )


def test_planted_document_pairs_hit_target_jaccards(spark, recall_corpus):
    out, planted = recall_corpus
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{out}/documents.parquet")
        .filter(F.col("doc_id") >= scale_probe.RECALL_ID_BASE)
        .collect()
    }

    def shingles(text):
        toks = text.lower().split()
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    for tier, pairs in planted["jaccard"].items():
        target = float(tier)
        for a, b in pairs:
            sa, sb = shingles(docs[a]), shingles(docs[b])
            jac = len(sa & sb) / len(sa | sb)
            assert abs(jac - target) < 1e-6, (tier, a, b, jac)


def test_planted_ids_are_disjoint_from_corpus(spark, sf_dir, recall_corpus):
    out, planted = recall_corpus
    base_max_vec = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .agg(F.max("vec_id"))
        .first()[0]
    )
    base_max_doc = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .agg(F.max("doc_id"))
        .first()[0]
    )
    assert scale_probe.RECALL_ID_BASE > max(base_max_vec, base_max_doc)
    # and the non-planted tables are shared, not copied
    import os

    assert os.path.islink(f"{out}/orders.parquet")


def test_measured_recall_meets_floor_on_planted_corpus(spark, recall_corpus):
    """End-to-end: both LSH dedup heads must find >= RECALL_FLOOR of the
    planted pairs in every tier, and the exact-duplicate Jaccard tier must
    be found in full (identical signatures collide at any band width)."""
    out, planted = recall_corpus
    measured = scale_probe.measure_recall(spark, out, planted)
    for q, tiers in measured.items():
        for tier, r in tiers.items():
            assert r >= scale_probe.RECALL_FLOOR, (q, tier, r)
    assert measured["dedup_minhash_lsh"]["1.0"] == 1.0
