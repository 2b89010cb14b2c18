"""Multimodal columns — binary payloads with typed metadata (SURVEY §2.10).

Images/audio/video travel as opaque `binary` columns + a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` stages. The image/audio codec libraries are NOT present in
this environment, so the decode kernels are STUBBED: `mode='fake'`
produces a deterministic hash-derived feature vector (real Spark-side
plumbing — schema, batching, partitioning — with a fake kernel);
`mode='real'` raises NotImplementedError naming the missing dependency.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 32


def attach_blob_metadata(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata: byte length, crc32, magic-byte sniff."""
    magic = F.hex(F.substring(F.col(binary_col), 1, 4))
    return (
        df.withColumn("byte_len", F.length(F.col(binary_col)))
        .withColumn("crc32", F.crc32(F.col(binary_col)))
        .withColumn(
            "sniffed_type",
            F.when(magic.startswith("89504E47"), "image/png")
            .when(magic.startswith("FFD8FF"), "image/jpeg")
            .when(magic.startswith("52494646"), "audio/wav")
            .otherwise("application/octet-stream"),
        )
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real image/audio encoder: bytes ->
    unit-norm float vector derived from a keyed blake2b stream."""
    out = np.empty(dim, dtype=np.float64)
    for i in range(dim):
        d = hashlib.blake2b(payload, digest_size=8, salt=i.to_bytes(8, "little")).digest()
        out[i] = int.from_bytes(d, "little") / 2**64 - 0.5
    norm = float(np.linalg.norm(out)) or 1.0
    return [float(x) for x in out / norm]


def extract_features(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "blob_id",
    mode: str = "fake",
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """(id, features array<double>) via mapInPandas — the batch shape a
    real encoder would use (one Arrow batch in, one out; no shuffle)."""
    if mode == "real":
        raise NotImplementedError(
            "real decode requires an image/audio codec library (e.g. Pillow/"
            "torchvision/librosa), not installed in this environment; "
            "use mode='fake' for plumbing tests"
        )
    if mode != "fake":
        raise ValueError(f"unknown mode {mode!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [
                        _fake_features(bytes(p), dim) for p in pdf[binary_col]
                    ],
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.mapInPandas(run, f"{id_col} {id_type}, features array<double>")


def frame_sample(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "blob_id",
    every_n: int = 10,
    mode: str = "fake",
) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled frame index.

    Fake kernel derives a frame count from payload length (1 frame / 1 KiB)
    and emits (id, frame_idx, frame_features)."""
    if mode == "real":
        raise NotImplementedError(
            "real frame decode requires a video codec library (e.g. PyAV), "
            "not installed in this environment"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for bid, payload in zip(pdf[id_col], pdf[binary_col]):
                payload = bytes(payload)
                n_frames = max(1, len(payload) // 1024)
                for fi in range(0, n_frames, every_n):
                    ids.append(bid)
                    idxs.append(fi)
                    feats.append(_fake_features(payload + fi.to_bytes(4, "little")))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_features": feats})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.mapInPandas(
        run, f"{id_col} {id_type}, frame_idx int, frame_features array<double>"
    )


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    binary_col: str = "payload",
    id_col: str = "blob_id",
    mode: str = "fake",
) -> DataFrame:
    """Image-resize plumbing: (id, payload, out_width, out_height) via
    mapInPandas — one Arrow batch in, one out, no shuffle, the exact
    shape a Pillow/torchvision kernel drops into.

    The fake kernel is deterministic AND size-faithful: it re-derives a
    payload of exactly ``width * height`` bytes by cycling an md5 stream
    seeded with the original payload's digest + the target dims, so
    downstream stages (feature extraction, storage sizing) observe the
    byte-volume change a real resize produces. ``mode='real'`` raises,
    naming the missing codec dependency."""
    if width <= 0 or height <= 0:
        raise ValueError(f"target dims must be positive, got {width}x{height}")
    if mode == "real":
        raise NotImplementedError(
            "real image resize requires a codec library (e.g. Pillow), "
            "not installed in this environment; use mode='fake' for "
            "plumbing tests"
        )
    if mode != "fake":
        raise ValueError(f"unknown mode {mode!r}")
    n_out = width * height

    def _resized(payload: bytes) -> bytes:
        out = bytearray()
        seed = hashlib.md5(
            payload + width.to_bytes(4, "little") + height.to_bytes(4, "little")
        ).digest()
        block = seed
        while len(out) < n_out:
            block = hashlib.md5(block).digest()
            out.extend(block)
        return bytes(out[:n_out])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    binary_col: [_resized(bytes(p)) for p in pdf[binary_col]],
                    "out_width": width,
                    "out_height": height,
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.mapInPandas(
        run,
        f"{id_col} {id_type}, {binary_col} binary, "
        "out_width int, out_height int",
    )


def documents_as_blobs(documents: DataFrame) -> DataFrame:
    """Fixture adapter: text bytes as the binary payload (tests/harness)."""
    return documents.select(
        F.col("doc_id").alias("blob_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.col("source"),
    )
