"""Multimodal column plumbing for training-data pipelines.

Images / audio / video are carried as opaque ``binary`` columns with a
typed metadata struct. The Spark-side plumbing — schema, partition-size
control, Arrow batch shape, UDF signatures — is real and tested; the
actual media decode is STUBBED (``NotImplementedError``) because media
libraries are not available in this environment. A deterministic fake
decoder (``fake_image_features``) exercises the full pipeline shape in
tests and benchmarks.

Scale notes: media rows are large and skew-prone, so the operators take
an explicit ``target_rows_per_batch`` (Arrow batch sizing via
``spark.sql.execution.arrow.maxRecordsPerBatch`` is global; we re-chunk
inside the iterator instead) and never collect payloads to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("payload_sha256", T.StringType(), False),
    ]
)


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an encoded image payload to an HxWxC uint8 array.

    STUB: requires an image codec (PIL / cv2), not present in this
    environment. The surrounding pipeline (batching, schema, hashing)
    is real; swap this single function on a real cluster.
    """
    raise NotImplementedError(
        "image decode requires PIL/cv2; wire a codec here on a real cluster"
    )


def fake_image_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in feature extractor, replicable in pure SQL:
    feature j = (first 8 hex chars of the payload's sha256 stream at
    offset 8j, as an integer, keeping the top 20 bits) / 2^20 — every
    value is a 20-bit dyadic rational, exactly representable in float32,
    so gates can compare exact integers instead of rounded floats. The
    hex stream extends by chaining sha256 for dim > 8."""
    h = hashlib.sha256(payload).hexdigest()
    while len(h) < 8 * dim:
        h += hashlib.sha256(h[-64:].encode()).hexdigest()
    vals = [
        (int(h[8 * j : 8 * j + 8], 16) >> 12) / 1048576.0
        for j in range(dim)
    ]
    return np.asarray(vals, dtype=np.float32)


def fake_image_features_batch(payloads, dim: int = 16) -> list:
    """Batched form of :func:`fake_image_features` — the ``decoder``
    contract for :func:`extract_features` takes the whole Arrow batch so
    a real codec is forced to be batched (per-row decode loops don't
    survive contact with real media volumes)."""
    return [fake_image_features(p, dim) for p in payloads]


def extract_features(
    media: DataFrame,
    dim: int = 16,
    target_rows_per_batch: int = 256,
    decoder=fake_image_features_batch,
) -> DataFrame:
    """media rows -> (media_id, feature, payload_sha256) via mapInPandas.

    ``decoder(payloads, dim) -> list[np.ndarray]`` receives the whole
    re-chunked batch (never a single row): pass a real batched
    decode+featurize function on a cluster with media libraries.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for s in range(0, len(pdf), target_rows_per_batch):
                chunk = pdf.iloc[s : s + target_rows_per_batch]
                feats = decoder(list(chunk["payload"]), dim)
                shas = [
                    hashlib.sha256(p).hexdigest() for p in chunk["payload"]
                ]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].to_numpy(),
                        "feature": feats,
                        "payload_sha256": shas,
                    }
                )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    target_rows_per_batch: int = 64,
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled timestamp
    (media_id, ts_ms, frame binary). Frame extraction itself is stubbed —
    emits empty frames deterministically sized by duration so partition
    math and downstream joins are testable."""

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("ts_ms", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ts = [], []
            for mid, dur in zip(pdf["media_id"], pdf["duration_ms"]):
                n = max(int(dur or 0) // every_ms, 0)
                ids.extend([mid] * n)
                ts.extend(range(0, n * every_ms, every_ms))
            yield pd.DataFrame(
                {
                    "media_id": np.asarray(ids, dtype=np.int64),
                    "ts_ms": np.asarray(ts, dtype=np.int32),
                    "frame": [None] * len(ids),
                }
            )

    return media.select("media_id", "duration_ms").mapInPandas(
        run, schema=schema
    )


def synthetic_media(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/bench. The payload is the
    ASCII bytes of ``sha256("{seed}:{id}")`` hex repeated 4x — arbitrary
    enough to exercise binary plumbing, yet reproducible in pure SQL
    (``repeat(sha256(seed || ':' || id), 4)``) so the correctness gate
    can oracle the whole pipeline including payload_sha256."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            rows = {
                "media_id": ids,
                "kind": ["image" if i % 3 else "video" for i in ids.tolist()],
                "mime": ["image/png" if i % 3 else "video/mp4" for i in ids.tolist()],
                "width": [64 + (i % 8) * 32 for i in ids.tolist()],
                "height": [64 + (i % 5) * 32 for i in ids.tolist()],
                "duration_ms": [0 if i % 3 else 3000 + (i % 7) * 1000 for i in ids.tolist()],
                "payload": [
                    (hashlib.sha256(f"{seed}:{i}".encode()).hexdigest() * 4).encode()
                    for i in ids.tolist()
                ],
            }
            yield pd.DataFrame(rows)

    return spark.range(n_rows).mapInPandas(gen, schema=MEDIA_SCHEMA)
