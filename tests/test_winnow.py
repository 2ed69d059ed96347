"""Property test for the winnowing guarantee (Schleimer et al. 2003): any
two documents sharing a token run of length >= WINNOW_K + WINNOW_W - 1 must
share at least one fingerprint. This is the property that makes
docs_winnow_dups a sound substring-dup detector — the oracle parity sweep
checks cross-engine agreement, this checks the algorithm itself."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from dbt_tpch_spark.operators.winnow import WINNOW_K, WINNOW_W, _with_fps_spark

GUARANTEE_LEN = WINNOW_K + WINNOW_W - 1

token = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
prefix = st.lists(token, min_size=0, max_size=12)
shared_run = st.lists(token, min_size=GUARANTEE_LEN, max_size=GUARANTEE_LEN + 4)


def _fps(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = _with_fps_spark(df).select("doc_id", "fps").collect()
    return {r["doc_id"]: set(r["fps"]) for r in rows}


@settings(max_examples=6, deadline=None)
@given(prefix, prefix, shared_run)
def test_shared_run_shares_a_fingerprint(spark, pre_a, pre_b, run):
    doc_a = " ".join(pre_a + run)
    doc_b = " ".join(pre_b + run)
    fps = _fps(spark, [doc_a, doc_b])
    assert fps[0] & fps[1], (doc_a, doc_b, fps)


@settings(max_examples=4, deadline=None)
@given(shared_run)
def test_identical_docs_have_identical_fingerprints(spark, run):
    text = " ".join(run)
    fps = _fps(spark, [text, text])
    assert fps[0] == fps[1] and fps[0]
