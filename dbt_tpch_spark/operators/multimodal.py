"""Multimodal column plumbing: treat opaque binary payloads as first-class
columns and run decode / feature-extraction through ``mapInPandas`` (Arrow
batches) — the pattern a 100 TB image/audio/video pipeline uses.

The corpus ships no binary table, so the payload is the utf-8 encoding of
``documents.text`` (a stand-in blob). Real decoders (PIL/librosa/av) are not
installed in this environment, so the decode stage is STUBBED behind an
import-try: the Spark-side plumbing — schema, Arrow batch iteration,
partitioning — is real and tested; the pixel math is a deterministic fake
derived from the payload's md5 (which is exactly what the oracle SQL
recomputes; swapping in a real decoder only changes `_decode_batch`).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F

from dbt_tpch_spark.plans import model
from dbt_tpch_spark.models.oracle import oracle

RESULT_SCHEMA = (
    "doc_id long, byte_len long, content_md5 string, "
    "width long, height long, channels long, decode_status string"
)


def _real_decoder_available() -> bool:
    try:  # pragma: no cover - decoders intentionally absent here
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-Arrow-batch 'decode': byte stats + md5-derived fake dimensions.

    A real deployment replaces the fake block with PIL/av decode of
    ``payload`` — the surrounding plumbing (schema, batching) is unchanged.
    """
    if _real_decoder_available():  # pragma: no cover
        raise NotImplementedError("real image decode not wired in this environment")
    payloads = batch["payload"]
    md5s = [hashlib.md5(p).hexdigest() for p in payloads]
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "byte_len": [len(p) for p in payloads],
            "content_md5": md5s,
            "width": [int(h[:4], 16) % 4096 for h in md5s],
            "height": [int(h[4:8], 16) % 4096 for h in md5s],
            "channels": 3,
            "decode_status": "stub_decoder",
        }
    )


def decode_binary_metadata(df):
    """mapInPandas decode over (doc_id, payload) — Arrow-batched, runs on
    executors, scales with partition count."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _decode_batch(batch)

    return df.mapInPandas(gen, schema=RESULT_SCHEMA)


@model("multimodal_metadata", layer="operators", materialization="view")
def multimodal_metadata(ctx):
    """Binary-payload metadata extraction via the Arrow/pandas path."""
    d = ctx.source("documents")
    payload = d.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    ).repartition(8, "doc_id")
    return decode_binary_metadata(payload)


def _nib(k: int) -> str:
    return f"(instr('0123456789abcdef', substr(h, {k + 1}, 1)) - 1)"


def _hex4(start: int) -> str:
    # int(h[start:start+4], 16) as portable SQL
    terms = " + ".join(
        f"{_nib(start + i)} * {16 ** (3 - i)}" for i in range(4)
    )
    return f"({terms})"


oracle(
    "multimodal_metadata",
    ("documents",),
    f"""WITH hashed AS (
    SELECT
        doc_id,
        octet_length(encode(text)) AS byte_len,
        md5(text) AS h
    FROM documents
)
SELECT
    doc_id,
    CAST(byte_len AS BIGINT) AS byte_len,
    h AS content_md5,
    CAST({_hex4(0)} % 4096 AS BIGINT) AS width,
    CAST({_hex4(4)} % 4096 AS BIGINT) AS height,
    CAST(3 AS BIGINT) AS channels,
    'stub_decoder' AS decode_status
FROM hashed""",
)
