"""Multimodal (binary) column plumbing (SURVEY §2b).

Image/audio/video payloads are opaque ``binary`` columns plus typed
metadata. The Spark-side mechanics here are real and tested — schema,
Arrow batch shape, ``mapInPandas`` partition flow. Each decode/resize
operator has two kernels: the default ``fake`` (deterministic
arithmetic on the bytes, mirrored by the DuckDB oracles) and ``real``
(Pillow), which activates automatically when Pillow is importable —
``REAL_DECODERS_AVAILABLE`` is a try-import probe, so installing
Pillow flips the gate and un-skips the real-kernel tests with no code
change. This container ships without image/audio libs, so the fake
kernels carry the correctness evidence.

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

try:  # auto-probe: flips to True the moment Pillow appears in the env
    import PIL.Image  # noqa: F401  # pragma: no cover

    REAL_DECODERS_AVAILABLE = True
except ImportError:
    REAL_DECODERS_AVAILABLE = False


def _fake_decode(payload: bytes) -> tuple[int, int, int] | None:
    """Deterministic stand-in for an image/video header parse.

    Mirrors the SQL in queries/llm.py::multimodal_decode's oracle —
    change both together. ``None`` payloads (fetch-failure rows) decode
    to ``None`` metadata, matching the oracle's NULL propagation
    through ``octet_length(encode(NULL))`` (round-12 NULL-payload
    audit: ``len(None)`` crashed the Arrow batch and failed the task).
    """
    if payload is None:
        return None
    n = len(payload)
    return (n % 64 + 1, n % 48 + 1, n % 8 + 1)


def _real_decode(
    payload: bytes,
) -> tuple[int, int, int] | None:  # pragma: no cover
    """Real header parse via Pillow (worker-side import so the kernel
    works under any executor deployment, not just local mode).

    Empty payloads return the ``(0, 0, 0)`` sentinel instead of letting
    ``PIL.Image.open`` raise inside the executor and fail the whole
    task — mirrors the fake kernel's total-function contract, including
    the ``None``-payload ⇒ ``None``-metadata fetch-failure rule (ADVICE
    r12: without it a None payload yielded (0,0,0) under kernel='real',
    contradicting both the fake kernel and the oracle's NULL
    propagation). The None check precedes the Pillow import so the
    shared contract stays unit-testable in Pillow-less containers."""
    if payload is None:
        return None

    import io

    import PIL.Image

    if not payload:
        return (0, 0, 0)
    with PIL.Image.open(io.BytesIO(payload)) as img:
        return (img.width, img.height, int(getattr(img, "n_frames", 1)))


def _ship_by_value(fn):
    """Rebind a module-level kernel as a DYNAMIC function so cloudpickle
    serializes it by value instead of by module reference — executors
    never need this package importable (the serialization contract in
    streaming/stateful.py). The kernels keep their module-level
    definitions for direct unit testing; the clone shares the same code
    object, and every kernel here touches only builtins plus imports it
    performs inside its own body, so empty globals suffice."""
    import types

    return types.FunctionType(
        fn.__code__,
        {"__builtins__": __builtins__},
        fn.__name__,
        fn.__defaults__,
        fn.__closure__,
    )


def _require_real(kernel: str) -> None:
    if kernel == "real" and not REAL_DECODERS_AVAILABLE:
        raise NotImplementedError(
            "kernel='real' needs Pillow, which is not installed in this "
            "container; the deterministic fake kernel is the default"
        )
    if kernel not in ("fake", "real"):
        raise ValueError(f"kernel must be 'fake' or 'real', got {kernel!r}")


def decode_metadata(
    payloads: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    kernel: str = "fake",
) -> DataFrame:
    """Extract per-payload metadata via Arrow-batched ``mapInPandas``.

    ``kernel='fake'`` (default) is the deterministic, oracle-mirrored
    stand-in; ``kernel='real'`` decodes actual image bytes with Pillow
    and activates automatically once Pillow is installed
    (``REAL_DECODERS_AVAILABLE`` is a try-import probe, not a constant).
    """
    _require_real(kernel)
    decode = _ship_by_value(_real_decode if kernel == "real" else _fake_decode)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf[bin_col].map(decode)
            # nullable Int32 (capital I): a None payload's metadata is
            # NULL, and numpy int32 cannot carry it (round-12 audit)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[bin_col]
                    .map(lambda b: len(b) if b is not None else None)
                    .astype("Int32"),
                    "width": meta.map(
                        lambda m: m[0] if m is not None else None
                    ).astype("Int32"),
                    "height": meta.map(
                        lambda m: m[1] if m is not None else None
                    ).astype("Int32"),
                    "n_frames": meta.map(
                        lambda m: m[2] if m is not None else None
                    ).astype("Int32"),
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


def _fake_resize(payload: bytes, width: int, height: int) -> bytes | None:
    """Deterministic stand-in for an image resample: nearest-neighbor
    over the raw byte stream to exactly width*height output bytes.
    ``None`` payloads resize to ``None`` (round-12 NULL-payload
    audit) — a fetch-failure row has nothing to resample."""
    if payload is None:
        return None
    n, target = len(payload), width * height
    if n == 0:
        return b""
    return bytes(payload[(i * n) // target] for i in range(target))


def _real_resize(
    payload: bytes, width: int, height: int
) -> bytes | None:  # pragma: no cover
    """Real resample via Pillow: decode, grayscale, nearest-neighbor
    resize, raw bytes out — exactly ``width*height`` bytes, matching
    the fake kernel's output contract (including ``b""`` for empty
    payloads, which PIL would otherwise raise on inside the executor,
    and ``None`` for None payloads — the shared fetch-failure contract,
    ADVICE r12; checked before the Pillow import so it stays
    unit-testable in Pillow-less containers)."""
    if payload is None:
        return None

    import io

    import PIL.Image

    if not payload:
        return b""
    with PIL.Image.open(io.BytesIO(payload)) as img:
        return img.convert("L").resize((width, height)).tobytes()


def resize_payload(
    payloads: DataFrame,
    width: int = 8,
    height: int = 6,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    kernel: str = "fake",
) -> DataFrame:
    """Resize plumbing via Arrow-batched ``mapInPandas``: every
    non-empty payload becomes exactly ``width*height`` bytes.
    ``kernel='real'`` (auto-enabled when Pillow is installed) decodes
    and resamples actual images with the same output contract."""
    _require_real(kernel)
    resize = _ship_by_value(_real_resize if kernel == "real" else _fake_resize)

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": width,
                    "height": height,
                    "payload": pdf[bin_col].map(
                        lambda b: resize(b, width, height)
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
    ``array<double>`` output a real encoder would produce). Unlike the
    decode/resize kernels there is no ``kernel='real'`` here: a real
    encoder needs model weights, not just an image library.

    Weights are the RAW IEEE division count/total — a single int/int
    division is bit-identical on numpy, Spark, and DuckDB, which makes
    the query hash-oracle-able; rounding here would instead pit
    numpy's half-even against SQL half-away at decimal ties."""
    import numpy as np

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:

            def hist(b: bytes) -> list[float]:
                if not b:
                    return [0.0] * dim
                counts = np.bincount(
                    np.frombuffer(b, dtype=np.uint8) // (256 // dim),
                    minlength=dim,
                )[:dim]
                return (counts / counts.sum()).tolist()

            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "features": pdf[bin_col].map(hist)}
            )

    return payloads.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        feat_batches, FEATURE_SCHEMA
    )


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dhash", T.StringType()),
    ]
)

#: dHash grid: 9 columns × 8 rows of resampled bytes → 8 horizontal
#: gradient bits per row = a 64-bit fingerprint (Krawetz's "difference
#: hash", the standard perceptual-hash geometry — public literature).
DHASH_W = 9
DHASH_H = 8


def _dhash_kernel(payload: bytes, width: int = DHASH_W, height: int = DHASH_H):
    """64-char '0'/'1' dHash over the deterministic fake-resize grid
    (the same nearest-neighbor byte resample as ``_fake_resize``,
    inlined so the kernel ships by value with no module globals): bit
    (r, c) = 1 iff grid[r][c] > grid[r][c+1]. Empty payloads → None.

    A ``kernel='real'`` twin would decode + grayscale-resample with
    Pillow first (the ``_real_resize`` contract) and compare pixels —
    the gradient-bit stage is identical, which is the point: the
    Spark-side plumbing and the banded join are real either way.
    """
    if payload is None:
        return None
    n = len(payload)
    if n == 0:
        return None
    target = width * height
    g = bytes(payload[(i * n) // target] for i in range(target))
    return "".join(
        "1" if g[r * width + c] > g[r * width + c + 1] else "0"
        for r in range(height)
        for c in range(width - 1)
    )


def dhash_fingerprints(
    payloads: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """``(doc_id, dhash)`` via Arrow-batched ``mapInPandas`` — the
    perceptual-hash build stage of image dedup. Deterministic (pure
    byte arithmetic), so the DuckDB oracle re-derives every bit from
    ``hex(encode(text))``. Empty payloads yield NULL fingerprints (no
    image ⇒ no hash); callers filter them before the banded join."""
    dhash = _ship_by_value(_dhash_kernel)

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "dhash": pdf[bin_col].map(dhash),
                }
            )

    return payloads.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        hash_batches, DHASH_SCHEMA
    )


def dhash_tiered_dedup(
    payloads: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    bands: int = 4,
    band_bits: int = 16,
    hamming_max: int = 20,
) -> tuple[DataFrame, DataFrame]:
    """The PRODUCTION tier order for r-way-duplicated image corpora
    (VERDICT r11 #7): collapse EXACT-dhash groups first, then run the
    banded Hamming join over DISTINCT hashes only.

    On a corpus where each image recurs r times (crawl mirrors, CDN
    copies), the flat banded join pays r² colliding band rows per
    duplicated image and its DISTINCT collapses r²-sized candidate
    lists — measured quadratic at x30 (BASELINE.md replica-corpus
    adjudication). Collapsing first makes the join input the distinct-
    hash table (grows with CONTENT, not copies), so candidate mass per
    distinct hash stays flat at any duplication factor; exact
    duplicates never enter a join at all (a groupBy is all they need).

    Returns ``(groups, near_pairs)``:

    - ``groups``: one row per distinct hash — ``(dhash, rep_id,
      n_members)`` with the min-id member as representative (the
      keeper; a member list join reconstructs within-group pairs when
      a consumer genuinely wants the quadratic expansion);
    - ``near_pairs``: ``(rep_a, rep_b, hamming)`` between DISTINCT
      hashes within the Hamming radius, via the same banded equi-join
      geometry as ``multimodal_phash_dedup``.

    Recall bound (ADVICE r12): the ``bands``-way equi-join GUARANTEES a
    candidate only when the differing bits leave at least one band
    untouched — i.e. exact recall holds for Hamming distance ≤
    ``bands - 1`` (3 at the defaults). Pairs at distance
    ``bands..hamming_max`` are found iff their differing bits cluster
    into ≤ ``bands - 1`` bands — standard LSH behavior, identical to
    the flat ``multimodal_phash_dedup`` path (the equivalence test
    proves parity with that path, not exhaustive recall at the radius).
    Callers needing exact recall at radius ``r`` must pass
    ``bands >= r + 1``.
    """
    fps = dhash_fingerprints(payloads, id_col, bin_col).filter(
        F.col("dhash").isNotNull()
    )
    groups = fps.groupBy("dhash").agg(
        F.min(id_col).alias("rep_id"),
        F.count("*").cast("bigint").alias("n_members"),
    )
    reps = groups.select("dhash", "rep_id")
    band_keys = reps.select(
        "rep_id",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{b}_"),
                        F.substring("dhash", 1 + band_bits * b, band_bits),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    )
    cand = (
        band_keys.alias("x")
        .join(band_keys.alias("y"), "band")
        .filter(F.col("x.rep_id") < F.col("y.rep_id"))
        .select(
            F.col("x.rep_id").alias("rep_a"), F.col("y.rep_id").alias("rep_b")
        )
        .distinct()
    )
    a = reps.select(F.col("rep_id").alias("rep_a"), F.col("dhash").alias("ha"))
    b = reps.select(F.col("rep_id").alias("rep_b"), F.col("dhash").alias("hb"))
    from jubilant_garbanzo_spark.operators.dedup import (
        hamming_distance_bitstrings,
    )

    near = (
        cand.join(a, "rep_a")
        .join(b, "rep_b")
        .select(
            "rep_a",
            "rep_b",
            hamming_distance_bitstrings(F.col("ha"), F.col("hb"))
            .cast("bigint")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= hamming_max)
    )
    return groups, near


#: Audio VAD frame width (bytes per frame of the fake 8-bit PCM view)
#: and the short-time-energy activity threshold. Calibrated to the
#: utf-8 fixture payloads so both active and inactive frames genuinely
#: occur (space-heavy frames carry more energy around the 128 center).
VAD_FRAME = 16
VAD_THRESH = 40_000

VAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_active", T.LongType()),
        T.StructField("n_segments", T.LongType()),
        T.StructField("longest_run", T.LongType()),
        T.StructField("total_energy", T.LongType()),
    ]
)


def audio_vad_summary(
    payloads: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Voice-activity-detection plumbing over an opaque audio column:
    treat the payload as 8-bit PCM samples, compute the short-time
    energy of each VAD_FRAME-byte frame (sum of squared deviations
    from the 128 midpoint — exact integers), mark frames with energy
    >= VAD_THRESH active, and summarize the activity segments
    (gaps-and-islands over consecutive active frames) per payload.
    This is the energy-gate VAD every speech-data pipeline runs before
    transcription/segmentation (Rabiner & Sambur 1975); a real
    deployment swaps the energy rule for a model score — the Arrow
    batch shape, integer framing, and segment summary are identical.

    The trailing sub-frame remainder is dropped on both engines
    (n_frames = octet_length // VAD_FRAME); empty/short payloads
    yield an all-zero row rather than disappearing."""
    import numpy as np

    frame, thresh = VAD_FRAME, VAD_THRESH

    def vad_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(payload) if payload is not None else b""
                nf = len(b) // frame
                if nf == 0:
                    out.append((int(doc_id), 0, 0, 0, 0, 0))
                    continue
                arr = np.frombuffer(
                    b[: nf * frame], dtype=np.uint8
                ).astype(np.int64)
                e = ((arr - 128) ** 2).reshape(nf, frame).sum(axis=1)
                act = e >= thresh
                n_seg = int(act[0]) + int(((~act[:-1]) & act[1:]).sum())
                longest = run = 0
                for a in act:
                    run = run + 1 if a else 0
                    longest = max(longest, run)
                out.append(
                    (
                        int(doc_id),
                        int(nf),
                        int(act.sum()),
                        n_seg,
                        longest,
                        int(e.sum()),
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in VAD_SCHEMA])

    return payloads.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        vad_batches, VAD_SCHEMA
    )
