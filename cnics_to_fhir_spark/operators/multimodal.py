"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, partition sizing, Arrow batch shape, UDF
signatures) is real and tested. The actual codec work is stubbed — this
container has no image/audio libraries — behind ``decode_image_stub``:
deterministic fake features with the exact mapInPandas contract a real
decoder (PIL/torchvision/ffmpeg) would use, and a clearly marked
``NotImplementedError`` path for real decoding.

Scale notes: binary payloads dominate row size, so the operators (a) never
shuffle payload bytes — features are extracted in a narrow mapInPandas pass
directly over the scan, then the payload is dropped before any wide
operation; (b) cap Arrow batch memory with
``spark.sql.execution.arrow.maxRecordsPerBatch`` rather than row counts.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_METADATA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|jpeg|wav|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 8


def payload_fingerprint(payload: Column) -> Column:
    """Content address of the raw bytes — exact-dedup key for media."""
    return F.sha2(payload, 256)


def payload_size(payload: Column) -> Column:
    return F.octet_length(payload)


def decode_image_stub(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    real_decode: bool = False,
) -> DataFrame:
    """mapInPandas feature extraction with the real operator's contract:
    input batches carry (id, payload bytes); output batches carry
    (id, n_bytes, feature array<float>). The stub derives FEATURE_DIM
    deterministic pseudo-features from byte content (length + 8-byte strides)
    so downstream similarity/dedup pipelines are exercisable end-to-end.

    ``real_decode=True`` marks where PIL/libvips decoding would go.
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        if real_decode:
            raise NotImplementedError(
                "real image decode requires PIL/torchvision — not in this "
                "container; the stub path exercises the full Spark plumbing"
            )
        for pdf in batches:
            feats, sizes = [], []
            for raw in pdf[payload_col]:
                b = np.frombuffer(raw or b"", dtype=np.uint8)
                sizes.append(len(b))
                if len(b) == 0:
                    feats.append([0.0] * FEATURE_DIM)
                    continue
                # deterministic fake features: mean byte value per stride
                chunks = np.array_split(b, FEATURE_DIM)
                feats.append([float(c.mean()) if len(c) else 0.0 for c in chunks])
            yield pd.DataFrame(
                {"id": pdf[id_col].astype("int64"), "n_bytes": sizes, "feature": feats}
            )

    return df.select(id_col, payload_col).mapInPandas(extract, schema=out_schema)


def resize_image_stub(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    target_w: int = 32,
    target_h: int = 32,
    real_decode: bool = False,
) -> DataFrame:
    """Binary-in → binary-out resize contract: output rows carry a NEW
    payload plus its dimensions — the geometry of a real thumbnailer. The
    stub 'resizes' by deterministic byte subsampling to w*h bytes (pad with
    zeros when shorter); a real implementation decodes, resizes, re-encodes
    inside the same batch loop."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    n_out = target_w * target_h

    def resize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        if real_decode:
            raise NotImplementedError(
                "real resize requires an image codec — not in this container"
            )
        for pdf in batches:
            outs = []
            for raw in pdf[payload_col]:
                b = np.frombuffer(raw or b"", dtype=np.uint8)
                if len(b) >= n_out:
                    idx = np.linspace(0, len(b) - 1, n_out).astype(np.int64)
                    outs.append(b[idx].tobytes())
                else:
                    outs.append(b.tobytes() + b"\x00" * (n_out - len(b)))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "payload": outs,
                    "width": target_w,
                    "height": target_h,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(resize, schema=out_schema)


def frame_sample_stub(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 64,
) -> DataFrame:
    """Video-frame-sampling contract: one output row PER SAMPLE (explode
    shape). The stub samples every Nth byte as a stand-in for every Nth
    frame — the row-multiplying mapInPandas geometry is what matters."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("sample_index", T.IntegerType()),
            T.StructField("sample_value", T.IntegerType()),
        ]
    )

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, vals = [], [], []
            for rid, raw in zip(pdf[id_col], pdf[payload_col]):
                raw = raw or b""
                for j, off in enumerate(range(0, len(raw), every_n_bytes)):
                    ids.append(int(rid))
                    idxs.append(j)
                    vals.append(raw[off])
            yield pd.DataFrame({"id": ids, "sample_index": idxs, "sample_value": vals})

    return df.select(id_col, payload_col).mapInPandas(sample, schema=out_schema)
