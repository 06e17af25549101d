"""Multimodal column handling: images/audio/video as opaque binary columns
with typed metadata.

Convention: a modality column is a struct
  {content: binary, meta: struct<mime: string, width: int, height: int, …>}
carried through relational ops untouched; decode/feature steps run as
Arrow-batched ``mapInPandas`` over partitions so bytes never pass through
Python row-by-row.

The actual codecs (PIL/torchaudio/ffmpeg) are NOT in this container —
``decode_image``'s real path raises NotImplementedError behind the
``stub=False`` flag; the default stub derives deterministic pseudo-features
from the raw bytes (length, mean, first-moment), keeping schema, batching,
partitioning, and downstream plumbing fully real and testable.

Scale notes: binary payloads dominate row size — repartition by size
budget, not row count (``maxRecordsPerBatch`` low for Arrow transfers);
feature extraction is embarrassingly parallel (mapInPandas, no shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "id long, n_bytes long, byte_mean double, byte_std double, feat array<float>"
)


def attach_binary(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a binary modality column (here: utf-8 bytes of a text column —
    the test corpus has no real images; the pipeline is payload-agnostic)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col(text_col)).alias("n_chars"),
        ).alias("meta"),
    )


def _stub_features(buf: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic pseudo-embedding from raw bytes (stand-in for a real
    image/audio encoder)."""
    a = np.frombuffer(buf, dtype=np.uint8).astype(np.float64)
    if a.size == 0:
        return np.zeros(dim, dtype=np.float32)
    chunks = np.array_split(a, dim)
    return np.array([c.mean() if c.size else 0.0 for c in chunks], dtype=np.float32)


def decode_and_featurize(df: DataFrame, stub: bool = True) -> DataFrame:
    """mapInPandas decode + feature-extraction stage.

    ``stub=False`` is the real-codec path — explicitly unimplemented in
    this container (no PIL/ffmpeg); everything around it (Arrow batches,
    schema, partition parallelism) is the production shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not stub:
                raise NotImplementedError(
                    "real image/audio decode requires PIL/torchaudio — not in container"
                )
            content = pdf["content"]
            n_bytes = content.map(len)
            feats = content.map(_stub_features)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "byte_mean": content.map(
                        lambda b: float(np.frombuffer(b, dtype=np.uint8).mean()) if b else 0.0
                    ),
                    "byte_std": content.map(
                        lambda b: float(np.frombuffer(b, dtype=np.uint8).std()) if b else 0.0
                    ),
                    "feat": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = "id long, width int, height int, content binary"


def resize_images(
    df: DataFrame, width: int = 64, height: int = 64, stub: bool = True
) -> DataFrame:
    """mapInPandas image-resize stage over {id, content, meta} rows.

    ``stub=False`` is the real-codec path (PIL) — unimplemented in this
    container. The stub emits a deterministic byte-resample of the payload
    to exactly width*height bytes (nearest-index gather), so output size,
    schema and Arrow batch shape match what a real resampler produces."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not stub:
                raise NotImplementedError("real image resize requires PIL — not in container")

            def resample(buf: bytes) -> bytes:
                a = np.frombuffer(buf, dtype=np.uint8)
                if a.size == 0:
                    return bytes(target)
                idx = (np.arange(target) * a.size) // target
                return a[idx].tobytes()

            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "width": np.full(len(pdf), width, dtype=np.int32),
                    "height": np.full(len(pdf), height, dtype=np.int32),
                    "content": pdf["content"].map(resample),
                }
            )

    return df.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = "id long, frame_idx int, frame binary"


def sample_frames(
    df: DataFrame, n_frames: int = 4, frame_bytes: int = 256, stub: bool = True
) -> DataFrame:
    """mapInPandas video frame-sampling stage: one output row per sampled
    frame (row explosion happens INSIDE the Arrow batch, not via a Python
    UDF per row).

    ``stub=False`` is the real path (ffmpeg/pyav) — unimplemented here. The
    stub treats the payload as a concatenation of equal 'frames' and takes
    n_frames evenly-spaced slices, preserving the real operator's fan-out
    shape (id multiplicity, frame ordering, bounded frame size)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not stub:
                raise NotImplementedError("real frame sampling requires ffmpeg — not in container")
            ids, idxs, frames = [], [], []
            for i, buf in zip(pdf["id"], pdf["content"]):
                a = np.frombuffer(buf, dtype=np.uint8)
                for k in range(n_frames):
                    start = (k * max(a.size - frame_bytes, 0)) // max(n_frames - 1, 1)
                    ids.append(i)
                    idxs.append(k)
                    frames.append(a[start : start + frame_bytes].tobytes())
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return df.mapInPandas(run, FRAME_SCHEMA)
