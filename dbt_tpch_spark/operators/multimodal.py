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


# --------------------------------------------------------------------------
# feature extraction + resize planning (Arrow-batched, stub model)
# --------------------------------------------------------------------------

FEAT_DIM = 8
FEATURES_SCHEMA = (
    "doc_id long, "
    + ", ".join(f"f{i} double" for i in range(FEAT_DIM))
    + ", resize_width long, resize_height long"
)
RESIZE_BOX = 512


def _features_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Stub 'embedding model': FEAT_DIM floats from md5 nibble windows of
    the payload, plus an aspect-preserving resize plan for the fake
    dimensions. A real deployment swaps the md5 block for a model forward
    pass over the decoded tensor; schema and batching are unchanged."""
    if _real_decoder_available():  # pragma: no cover
        raise NotImplementedError("real feature extractor not wired here")
    md5s = [hashlib.md5(p).hexdigest() for p in batch["payload"]]
    out = {"doc_id": batch["doc_id"]}
    for i in range(FEAT_DIM):
        out[f"f{i}"] = [
            int(int(h[4 * i : 4 * i + 4], 16) / 65535.0 * 1e6 + 0.5) / 1e6
            for h in md5s
        ]
    widths = [int(h[:4], 16) % 4096 for h in md5s]
    heights = [int(h[4:8], 16) % 4096 for h in md5s]
    out["resize_width"] = [
        min(w, max(1, (w * RESIZE_BOX) // max(w, h))) if max(w, h) > RESIZE_BOX else w
        for w, h in zip(widths, heights)
    ]
    out["resize_height"] = [
        min(h, max(1, (h * RESIZE_BOX) // max(w, h))) if max(w, h) > RESIZE_BOX else h
        for w, h in zip(widths, heights)
    ]
    return pd.DataFrame(out)


@model("multimodal_features", layer="operators", materialization="view")
def multimodal_features(ctx):
    """Feature-extract + resize-plan over binary payloads (mapInPandas)."""
    d = ctx.source("documents")
    payload = d.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    ).repartition(8, "doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _features_batch(batch)

    return payload.mapInPandas(gen, schema=FEATURES_SCHEMA)


def _feat_sql(i: int) -> str:
    # int(h[4i:4i+4], 16) / 65535 rounded to 6 via the repo floor convention
    terms = " + ".join(
        f"{_nib(4 * i + j)} * {16 ** (3 - j)}" for j in range(4)
    )
    return f"(FLOOR(({terms}) / 65535.0 * 1000000.0 + 0.5) / 1000000.0)"


oracle(
    "multimodal_features",
    ("documents",),
    f"""WITH hashed AS (
    SELECT doc_id, md5(text) AS h FROM documents
),
dims AS (
    SELECT *,
        CAST({_hex4(0)} % 4096 AS BIGINT) AS w,
        CAST({_hex4(4)} % 4096 AS BIGINT) AS h2
    FROM hashed
)
SELECT
    doc_id,
    {', '.join(f'{_feat_sql(i)} AS f{i}' for i in range(FEAT_DIM))},
    CASE WHEN greatest(w, h2) > {RESIZE_BOX}
         THEN least(w, greatest(1, (w * {RESIZE_BOX}) // greatest(w, h2)))
         ELSE w END AS resize_width,
    CASE WHEN greatest(w, h2) > {RESIZE_BOX}
         THEN least(h2, greatest(1, (h2 * {RESIZE_BOX}) // greatest(w, h2)))
         ELSE h2 END AS resize_height
FROM dims""",
)


# --------------------------------------------------------------------------
# frame sampling (one input row -> many output rows through Arrow)
# --------------------------------------------------------------------------

FRAME_LEN = 16
FRAME_STRIDE = 256
FRAMES_SCHEMA = "doc_id long, frame_idx long, frame_md5 string"


def _frames_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Stub 'video frame sampler': every FRAME_STRIDE bytes, hash a
    FRAME_LEN-byte window (stand-in for decode+keyframe extraction). The
    batch shape this exercises — one input row exploding to a variable
    number of output rows inside mapInPandas — is the real contract a
    frame-sampling UDF must satisfy."""
    if _real_decoder_available():  # pragma: no cover
        raise NotImplementedError("real frame decode not wired here")
    doc_ids, idxs, hashes = [], [], []
    for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
        n = len(payload)
        for k, off in enumerate(range(0, n - FRAME_LEN + 1, FRAME_STRIDE)):
            doc_ids.append(doc_id)
            idxs.append(k)
            hashes.append(hashlib.md5(payload[off : off + FRAME_LEN]).hexdigest())
    return pd.DataFrame({"doc_id": doc_ids, "frame_idx": idxs, "frame_md5": hashes})


@model("multimodal_frame_sample", layer="operators", materialization="view")
def multimodal_frame_sample(ctx):
    """Deterministic frame sampling over binary payloads (mapInPandas,
    row-exploding batch shape)."""
    d = ctx.source("documents")
    payload = d.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    ).repartition(8, "doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _frames_batch(batch)

    return payload.mapInPandas(gen, schema=FRAMES_SCHEMA)


oracle(
    "multimodal_frame_sample",
    ("documents",),
    f"""WITH frames AS (
    SELECT
        doc_id,
        text,
        UNNEST(range(0, length(text) - {FRAME_LEN} + 1, {FRAME_STRIDE})) AS off
    FROM documents
    WHERE length(text) >= {FRAME_LEN}
)
SELECT
    doc_id,
    CAST(off // {FRAME_STRIDE} AS BIGINT) AS frame_idx,
    md5(substr(text, CAST(off + 1 AS INT), {FRAME_LEN})) AS frame_md5
FROM frames""",
)
