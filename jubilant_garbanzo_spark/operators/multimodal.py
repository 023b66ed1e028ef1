"""Multimodal (binary) column plumbing (SURVEY §2b).

Image/audio/video payloads are opaque ``binary`` columns plus typed
metadata. The Spark-side mechanics here are real and tested — schema,
Arrow batch shape, ``mapInPandas`` partition flow; only the decoder
kernel is faked (this container has no image/audio libs): the fake is
deterministic arithmetic on the bytes, and the seam where PIL/ffmpeg
would plug in is a clearly-marked ``NotImplementedError`` gate.

Scale notes: binary payloads ride in the same parquet row groups as
their metadata; decode/feature-extract runs as Arrow-batched
``mapInPandas`` (one Python worker per partition, zero per-row
overhead), and partition sizing must account for payload width —
``spark.sql.files.maxPartitionBytes`` is the knob that keeps a batch
of decoded frames inside executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata schema produced by the decode stage.
DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

REAL_DECODERS_AVAILABLE = False  # flipped when PIL/ffmpeg exist


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image/video header parse.

    Mirrors the SQL in queries/llm.py::multimodal_decode's oracle —
    change both together.
    """
    n = len(payload)
    return (n % 64 + 1, n % 48 + 1, n % 8 + 1)


def decode_metadata(payloads: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """Extract per-payload metadata via Arrow-batched ``mapInPandas``.

    A real deployment swaps ``_fake_decode`` for PIL/ffmpeg behind the
    ``REAL_DECODERS_AVAILABLE`` gate; the Spark plumbing is identical.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if REAL_DECODERS_AVAILABLE:  # pragma: no cover
            raise NotImplementedError(
                "real decoders (PIL/ffmpeg) are not installed in this "
                "container; _fake_decode is the deterministic stand-in"
            )
        for pdf in batches:
            meta = pdf[bin_col].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[bin_col].map(len).astype("int32"),
                    "width": meta.map(lambda m: m[0]).astype("int32"),
                    "height": meta.map(lambda m: m[1]).astype("int32"),
                    "n_frames": meta.map(lambda m: m[2]).astype("int32"),
                }
            )

    return payloads.select(
        F.col(id_col), F.col(bin_col)
    ).mapInPandas(decode_batches, DECODE_SCHEMA)


def frame_sample(decoded: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame-sampling plumbing: explode synthetic frame indexes and
    keep every n-th — the shape of video-frame extraction, minus the
    actual pixels."""
    return decoded.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    ).filter(F.col("frame_idx") % every_nth == 0)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resample: nearest-neighbor
    over the raw byte stream to exactly width*height output bytes."""
    n, target = len(payload), width * height
    if n == 0:
        return b""
    return bytes(payload[(i * n) // target] for i in range(target))


def resize_payload(
    payloads: DataFrame,
    width: int = 8,
    height: int = 6,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Resize plumbing via Arrow-batched ``mapInPandas``: every
    non-empty payload becomes exactly ``width*height`` bytes (the
    real kernel — PIL ``Image.resize`` — swaps in behind the
    ``REAL_DECODERS_AVAILABLE`` gate with this exact signature)."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if REAL_DECODERS_AVAILABLE:  # pragma: no cover
            raise NotImplementedError("real resize kernel (PIL) not installed")
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": width,
                    "height": height,
                    "payload": pdf[bin_col].map(
                        lambda b: _fake_resize(b, width, height)
                    ),
                }
            )

    return payloads.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        resize_batches, RESIZE_SCHEMA
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(
    payloads: DataFrame,
    dim: int = 16,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Feature extraction plumbing: per-payload ``dim``-bucket byte
    histogram, L1-normalized — the deterministic stand-in for an
    embedding model forward pass (same mapInPandas batch shape and
    ``array<double>`` output a real encoder would produce)."""
    import numpy as np

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if REAL_DECODERS_AVAILABLE:  # pragma: no cover
            raise NotImplementedError("real feature encoder not installed")
        for pdf in batches:

            def hist(b: bytes) -> list[float]:
                if not b:
                    return [0.0] * dim
                counts = np.bincount(
                    np.frombuffer(b, dtype=np.uint8) // (256 // dim),
                    minlength=dim,
                )[:dim]
                return (counts / counts.sum()).round(6).tolist()

            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "features": pdf[bin_col].map(hist)}
            )

    return payloads.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        feat_batches, FEATURE_SCHEMA
    )
