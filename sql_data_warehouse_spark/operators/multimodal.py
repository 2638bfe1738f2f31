"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media is carried as an opaque ``binary`` payload column plus typed
metadata — the storage/shuffle/UDF plumbing is identical whatever the
codec. Decode and feature extraction run as Arrow-batched
``mapInPandas`` transforms (one Python worker per partition, columnar
batch transfer — the only sane shape for Python-side media work at
100 TB; row-at-a-time UDFs are 10-100× slower).

The actual codec step is STUBBED: this container has no image/audio
libraries, so ``decode_real`` raises ``NotImplementedError`` and the
pipeline uses :func:`fake_decode_batch` — a deterministic pure-bytes
"decoder" with the same signature, schema, and batch shape a real
Pillow/ffmpeg decoder would have. Swap ``_DECODER`` when the libs
exist; nothing else changes.

Scale notes:

- Payloads stay opaque through every shuffle; only extracted features
  (fixed-size, small) flow into downstream joins/aggregations. Never
  groupBy/join on a binary payload column.
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds decoder
  memory: batch_bytes ≈ records × payload size. For multi-MB media,
  set it to O(100).
- Frame sampling explodes rows; do it AFTER any filter on metadata so
  the decode only touches surviving rows (Catalyst pushes the filter
  below mapInPandas only if you wrote it before — order matters in
  the code, unlike with pure relational ops).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ----------------------------------------------------------- media schema

MEDIA_META_FIELDS = [
    T.StructField("media_type", T.StringType()),  # image | audio | video
    T.StructField("codec", T.StringType()),
    T.StructField("duration_ms", T.LongType()),  # audio/video; 0 for image
]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        *MEDIA_META_FIELDS,
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)

_CODECS = {"image": "png", "audio": "opus", "video": "av1"}


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Deterministic media fixture: payload = utf-8 text bytes, media
    type round-robins by doc_id. Pure Column expressions (JVM-side) so
    the fixture itself costs no Python time."""
    mt = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    codec_map = F.create_map(
        *[F.lit(x) for kv in _CODECS.items() for x in kv]
    )
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        mt.alias("media_type"),
        codec_map[mt].alias("codec"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(0))
        .otherwise((F.col("doc_id") * 37) % 30000)
        .cast("long")
        .alias("duration_ms"),
    )


# ------------------------------------------------------------- decoders

def decode_real(payload: bytes, media_type: str, codec: str):
    """Real codec hook (Pillow / soundfile / PyAV). Not available in
    this container — the pipeline is wired to :func:`fake_decode_batch`
    until the libs exist."""
    raise NotImplementedError(
        "media codecs not installed; using deterministic fake decoder"
    )


def fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in with a real decoder's interface: reads
    every payload byte (so the I/O cost profile is honest), derives
    stable pseudo-dimensions from the byte length."""
    payloads = pdf["payload"]
    n_bytes = payloads.map(len)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "media_type": pdf["media_type"],
            "n_bytes": n_bytes.astype("int64"),
            "checksum": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
            "width": (n_bytes % 640).astype("int64"),
            "height": ((n_bytes * 7) % 480).astype("int64"),
        }
    )


def decode_media(media: DataFrame) -> DataFrame:
    """payload → decoded metadata/features via Arrow-batched
    mapInPandas. Column pruning still applies upstream (Spark prunes
    the scan to the columns the UDF schema needs).

    The batch body mirrors :func:`fake_decode_batch` but is inlined:
    worker-side functions must be self-contained closures (cloudpickle
    serializes nested functions by value) because executors import the
    entry module by path and cannot resolve this package by name."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            if len(pdf):
                n_bytes = pdf["payload"].map(len)
                yield _pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "media_type": pdf["media_type"],
                        "n_bytes": n_bytes.astype("int64"),
                        "checksum": pdf["payload"].map(
                            lambda b: _hashlib.md5(b).hexdigest()
                        ),
                        "width": (n_bytes % 640).astype("int64"),
                        "height": ((n_bytes * 7) % 480).astype("int64"),
                    }
                )

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def sample_frames(media: DataFrame, fps_cap: int = 8) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (~1 frame/sec, capped). Real impl would seek+decode keyframes;
    the stub emits deterministic per-frame checksums with the same
    row-explosion shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: see decode_media pickling note.
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_checksum": []}
            for doc_id, payload, dur in zip(
                pdf["doc_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n_frames = min(max(int(dur) // 1000, 1), fps_cap)
                for i in range(n_frames):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_checksum"].append(
                        _hashlib.md5(payload + i.to_bytes(4, "big")).hexdigest()
                    )
            if rows["doc_id"]:
                yield _pd.DataFrame(rows)

    return media.filter(F.col("media_type") == "video").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize stub: passes payloads through and records the
    target box. A real impl swaps the identity for Pillow's
    ``thumbnail`` inside the same batch loop."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("resized_to", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "payload": pdf["payload"],
                        "resized_to": max_side,
                    }
                )

    return media.filter(F.col("media_type") == "image").mapInPandas(
        run, schema=out_schema
    )


def embed_media(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction: payload bytes → ``dim``-float embedding in
    [-1, 1], as an Arrow-batched ``mapInPandas`` — the multimodal
    retrieval shape (CLIP-style encoder) with the model STUBBED to a
    deterministic md5-byte projection (container has no torch/vision
    libs; swap the closure body for a real encoder and nothing else
    changes: schema, batching, and the downstream ANN join are
    model-agnostic).

    Each output value is ``(byte_i − 127.5) / 127.5`` over the md5
    digest bytes of the payload, so the DuckDB oracle can replay the
    exact floats arithmetically and hash-gate the whole Python path.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained closure: see decode_media pickling note.
        import hashlib

        import pandas as pd  # noqa: F811 (worker-side import)

        for pdf in batches:
            embs = []
            for payload in pdf["payload"]:
                hx = hashlib.md5(bytes(payload)).hexdigest()
                embs.append([
                    (float(16 * int(hx[2 * i], 16) + int(hx[2 * i + 1], 16))
                     - 127.5) / 127.5
                    for i in range(16)
                ])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "emb": embs})

    return media.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, emb array<double>"
    )
