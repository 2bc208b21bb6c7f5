"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched pandas UDFs (``mapInPandas``).

The image/audio decode libraries are not in this container, so the decode
step is STUBBED (``decode_image`` raises ``NotImplementedError``; a
deterministic fake stands in for tests/bench). Everything Spark-side —
schema, batch iteration, partitioning, UDF signatures — is real: swapping
the fake for PIL/torchaudio is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_FEATURE_SCHEMA = "doc_id long, n_bytes long, checksum string, head_byte long"
FAKE_IMAGE_SCHEMA = ("doc_id long, width long, height long, n_channels long, "
                     "n_frames long")


def with_binary_payload(df: DataFrame, text_col: str = "text",
                        payload_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (stand-in for image/audio
    bytes) + its media-type metadata."""
    return df.withColumn(payload_col, F.encode(F.col(text_col), "UTF-8")) \
             .withColumn("media_type", F.lit("application/octet-stream"))


def extract_binary_features(df: DataFrame, id_col: str = "doc_id",
                            payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads — the
    pattern every real decode step follows (bytes in, metadata out)."""
    cols = df.select(id_col, payload_col)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "n_bytes": payloads.map(len).astype("int64"),
                "checksum": payloads.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "head_byte": payloads.map(
                    lambda b: b[0] if len(b) else -1).astype("int64"),
            })

    return cols.mapInPandas(op, schema=BINARY_FEATURE_SCHEMA)


def decode_image(payload: bytes):
    """Real image decode — requires PIL/opencv, absent in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; use fake_decode_images for the "
        "pipeline plumbing"
    )


def fake_decode_images(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """Deterministic stand-in decode: derives plausible (width, height,
    channels, frames) from the payload bytes. Exercises the full
    mapInPandas pipeline shape of a real decoder."""
    cols = df.select(id_col, payload_col)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf[payload_col].map(
                lambda b: hashlib.md5(bytes(b)).digest())
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "width": digests.map(lambda d: 64 + d[0] % 192).astype("int64"),
                "height": digests.map(lambda d: 64 + d[1] % 192).astype("int64"),
                "n_channels": digests.map(lambda d: 1 + d[2] % 3).astype("int64"),
                "n_frames": digests.map(lambda d: 1 + d[3] % 16).astype("int64"),
            })

    return cols.mapInPandas(op, schema=FAKE_IMAGE_SCHEMA)


FRAME_SAMPLE_SCHEMA = ("doc_id long, frame_idx long, n_frames long, "
                       "frame_checksum string")


def fake_sample_frames(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload",
                       max_frames: int = 4) -> DataFrame:
    """Video-style frame sampling: ONE input row fans out to ≤
    ``max_frames`` evenly-strided frame rows — the row-multiplying
    mapInPandas shape every real frame sampler has (decode replaced by
    the deterministic fake: n_frames from the payload digest, per-frame
    checksum of payload + frame index).

    At scale this shape matters more than the decode: the output is
    k× the input row count, so it must stream through Arrow batches —
    never collect, never explode a driver-built list."""
    cols = df.select(id_col, payload_col)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_n, out_ck = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                n_frames = 1 + hashlib.md5(b).digest()[3] % 16
                stride = (n_frames + max_frames - 1) // max_frames
                for idx in range(0, n_frames, stride):
                    out_id.append(doc_id)
                    out_idx.append(idx)
                    out_n.append(n_frames)
                    out_ck.append(hashlib.md5(
                        b + b"#" + str(idx).encode()).hexdigest())
            yield pd.DataFrame({
                "doc_id": out_id, "frame_idx": out_idx,
                "n_frames": out_n, "frame_checksum": out_ck,
            })

    return cols.mapInPandas(op, schema=FRAME_SAMPLE_SCHEMA)
