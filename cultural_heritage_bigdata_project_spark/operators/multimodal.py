"""Multimodal column support: opaque binary payloads + typed metadata.

The reference's multimodal stage downloads images and runs CLIP on the
driver (extracting_embeddings.py:279-413 — row loop, JVM→Python per
record). Our engine treats media as ``binary`` columns with struct
metadata and runs decode/feature steps as Arrow-batched
``mapInPandas`` so the expensive Python work is per-batch, model/codec
init is per-executor, and the exchange is columnar.

The actual codec is STUBBED (no image/audio libs in this container):
``decode_meta_batches`` computes deterministic fake metadata from the
payload bytes, and ``clip_like_embedder`` raises unless given a real
model fn — but the Spark-side plumbing (schema, batching, partition
behavior) is real and tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_META_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, channels int, status string"
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Model an opaque media payload: utf-8 bytes of the text column
    (deterministic stand-in for real image bytes) + media-type tag."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def decode_meta_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas stub decoder: metadata from payload bytes.

    Real deployment: replace the body with PIL/ffmpeg decode; the
    signature, schema and batching stay identical. Deterministic fake:
    width/height/channels derived from byte length so oracles can
    reproduce it.

    Status contract mirrors the reference's extractor row statuses
    (extracting_embeddings.py:337-348): ``OK`` on success, ``NO_IMAGE``
    when the payload is absent/empty (the reference's missing-URL
    path), ``FAILED`` when the decode itself raises (here the stub
    "decode" is a strict UTF-8 parse, so undecodable bytes fail exactly
    like corrupt image bytes under PIL) — failed rows keep ``n_bytes``
    (known before decode) and NULL decode-derived metadata, and the
    pipeline CONTINUES: one bad object never kills the batch.
    """
    for pdf in batches:
        rows = {
            "doc_id": pdf["doc_id"],
            "n_bytes": [],
            "width": [],
            "height": [],
            "channels": [],
            "status": [],
        }
        for payload in pdf["payload"]:
            if payload is None or len(payload) == 0:
                rows["n_bytes"].append(0 if payload is not None else None)
                rows["width"].append(None)
                rows["height"].append(None)
                rows["channels"].append(None)
                rows["status"].append("NO_IMAGE")
                continue
            n = len(payload)
            try:
                bytes(payload).decode("utf-8")  # the stub "decode"
            except (UnicodeDecodeError, ValueError):
                rows["n_bytes"].append(n)
                rows["width"].append(None)
                rows["height"].append(None)
                rows["channels"].append(None)
                rows["status"].append("FAILED")
                continue
            rows["n_bytes"].append(n)
            rows["width"].append(n % 997)
            rows["height"].append(n % 991)
            rows["channels"].append(3)
            rows["status"].append("OK")
        yield pd.DataFrame(
            {
                "doc_id": rows["doc_id"],
                "n_bytes": pd.array(rows["n_bytes"], dtype="Int32"),
                "width": pd.array(rows["width"], dtype="Int32"),
                "height": pd.array(rows["height"], dtype="Int32"),
                "channels": pd.array(rows["channels"], dtype="Int32"),
                "status": rows["status"],
            }
        )


def decode_metadata(df_with_payload: DataFrame) -> DataFrame:
    """Distributed 'decode': binary in, typed metadata out, via
    Arrow-batched mapInPandas (per-batch Python, no per-row serde)."""
    return df_with_payload.mapInPandas(decode_meta_batches, DECODE_META_SCHEMA)


def hash_projection_embedder(dim: int = 64) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Deterministic text embedder (M1 test stand-in): projects token
    hashes onto ``dim`` buckets (signed feature hashing), L2-normalized.
    Loads no model; the real CLIP path plugs in with the same
    mapInPandas shape.

    Token hash = first 8 md5 hex chars (NOT Python ``hash()``, which is
    process-salted): any md5-capable engine re-derives the identical
    embedding — DuckDB replays it as
    ``('0x'||substr(md5(tok),1,8))::BIGINT`` with bucket ``h % dim`` and
    sign ``(h >> 16) & 1`` — which is what lets the catalog query be
    hash-checked end-to-end. Tokenization is a plain single-space split
    (keeping empty tokens), matching SQL ``string_split(text, ' ')``
    exactly. Bucket sums are small integers, so normalization divides
    bit-identical doubles on every engine.
    """
    import hashlib

    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, tuple[int, float]] = {}

        def tok_hash(tok: str) -> tuple[int, float]:
            hit = cache.get(tok)
            if hit is None:
                h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16)
                hit = (h % dim, 1.0 if (h >> 16) & 1 else -1.0)
                cache[tok] = hit
            return hit

        for pdf in batches:
            vecs = []
            for text in pdf["text"]:
                v = np.zeros(dim, dtype=np.float64)
                for tok in str(text).split(" "):
                    b, s = tok_hash(tok)
                    v[b] += s
                norm = np.linalg.norm(v)
                vecs.append((v / norm if norm else v).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": vecs})

    return fn


def clip_like_embedder(*_args, **_kwargs):
    """Real-model embedding stage — NOT AVAILABLE in this container
    (no torch/CLIP). Deployment wires the model through the same
    mapInPandas contract as ``hash_projection_embedder``."""
    raise NotImplementedError(
        "CLIP-style embedding requires torch/transformers; use "
        "hash_projection_embedder for deterministic tests or inject a "
        "model fn in deployment."
    )


RESIZE_SCHEMA = (
    "doc_id long, out_w int, out_h int, scale double, payload binary, status string"
)


def resize_fit_batches(target_w: int, target_h: int):
    """mapInPandas stub resizer: aspect-preserving fit-within-box.

    The DIMENSION arithmetic (letterbox fit: scale = min(tw/w, th/h),
    floor to >=1 px) is real and tested; the pixel resample is stubbed
    (payload passes through truncated to the implied byte budget —
    deterministic, so tests can pin it). Real deployment swaps the two
    marked lines for PIL/libvips; schema and batching stay identical.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            w = (n % 997 + 1).astype("int64")  # fake decode, as decode_meta
            h = (n % 991 + 1).astype("int64")
            scale = pd.concat([target_w / w, target_h / h], axis=1).min(axis=1).clip(upper=1.0)
            out_w = (w * scale).astype("int64").clip(lower=1)
            out_h = (h * scale).astype("int64").clip(lower=1)
            budget = (out_w * out_h).clip(upper=n)  # stub: byte budget
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": out_w.astype("int32"),
                    "out_h": out_h.astype("int32"),
                    "scale": scale.astype("float64"),
                    "payload": [
                        p[:b] for p, b in zip(pdf["payload"], budget)
                    ],  # stub resample
                    "status": "OK",
                }
            )

    return fn


def resize_fit(df_with_payload: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Distributed aspect-preserving resize (stub codec, real plumbing):
    binary in → binary out through one Arrow batch per partition."""
    return df_with_payload.mapInPandas(
        resize_fit_batches(target_w, target_h), RESIZE_SCHEMA
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, ts_ms long, frame binary"
_FRAME_BYTES = 64  # stub codec: fixed-size fake frames
_FRAME_MS = 40  # 25 fps


def frame_sample_batches(every: int):
    """mapInPandas stub frame sampler: one INPUT video row explodes to
    N OUTPUT frame rows (the 1→N batch-shape change that makes video
    ops different from scalar decode — mapInPandas handles it natively,
    no explode of a materialized array column, so a 2-hour video never
    exists as one giant row).

    Stub codec: the payload is treated as consecutive 64-byte frames at
    25 fps; every ``every``-th frame is emitted with its timestamp.
    Real deployment replaces the slicing with an ffmpeg/pyav iterator —
    same signature, same schema, same bounded memory.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for rid, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) // _FRAME_BYTES
                for i in range(0, n_frames, every):
                    ids.append(rid)
                    idxs.append(i)
                    tss.append(i * _FRAME_MS)
                    frames.append(payload[i * _FRAME_BYTES : (i + 1) * _FRAME_BYTES])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return fn


def frame_sample(df_with_payload: DataFrame, every: int = 5) -> DataFrame:
    """Distributed video frame sampling (stub codec, real 1→N
    mapInPandas plumbing)."""
    if every < 1:
        raise ValueError("every must be >= 1")
    return df_with_payload.mapInPandas(frame_sample_batches(every), FRAME_SCHEMA)
