"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages.  The actual codec work needs image/audio libs
not present in this container, so the decode kernels are STUBS: a
clearly-marked ``NotImplementedError`` path plus a deterministic fake
used by tests — the Spark-side plumbing (schema, batch shape, UDF
signatures, partitioning) is real.
"""

from __future__ import annotations

import struct as _struct

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

_MAGIC = b"XYZF"  # deterministic fake "codec" header


def fake_media_bytes(seed: int) -> bytes:
    """Deterministic fake media payload: 16-byte header (magic, w, h)
    + seed-derived body.  Stands in for a real JPEG/PNG/WAV."""
    w = 64 + (seed * 37) % 512
    h = 64 + (seed * 101) % 512
    body = (seed.to_bytes(8, "little", signed=True) * 8)[: 32 + seed % 64]
    return _MAGIC + _struct.pack("<II", w, h) + body


def attach_fake_media(
    df: DataFrame, id_col: str = "doc_id", out_col: str = "media"
) -> DataFrame:
    """Add a deterministic binary media column derived from the id
    (test harness for the decode pipeline)."""

    def gen(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                fake_media_bytes(int(i)) for i in pdf[id_col]
            ]
            yield pdf

    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.BinaryType())]
    )
    return df.mapInPandas(gen, schema=schema)


def extract_media_meta(
    df: DataFrame, media_col: str = "media", out_col: str = "meta"
) -> DataFrame:
    """Parse the typed metadata struct out of the binary payload.

    Real pipelines parse codec headers here (cheap, no full decode);
    the fake codec stores (width, height) in its header the same way.
    """

    def parse(batches):
        for pdf in batches:
            metas = []
            for payload in pdf[media_col]:
                b = bytes(payload) if payload is not None else b""
                if len(b) >= 12 and b[:4] == _MAGIC:
                    w, h = _struct.unpack("<II", b[4:12])
                    metas.append(
                        {
                            "format": "xyzf",
                            "width": int(w),
                            "height": int(h),
                            "n_bytes": len(b),
                        }
                    )
                else:
                    metas.append(
                        {
                            "format": None,
                            "width": None,
                            "height": None,
                            "n_bytes": len(b),
                        }
                    )
            out = pdf.copy()
            out[out_col] = metas
            yield out

    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, MEDIA_META_TYPE)]
    )
    return df.mapInPandas(parse, schema=schema)


def decode_image(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Decode binary images to pixel arrays.

    STUB: requires an imaging library (PIL / opencv) not available in
    this container.  The mapInPandas plumbing below is the real shape;
    the kernel raises until a codec is installed.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "decode_image needs an imaging library (PIL); not available "
            "in this environment — use extract_media_meta for header-only "
            "processing, or install pillow on the cluster"
        ) from exc

    def decode(batches):  # pragma: no cover - needs PIL
        import io

        import numpy as np
        import PIL.Image

        for pdf in batches:
            pixels = []
            for payload in pdf[media_col]:
                img = PIL.Image.open(io.BytesIO(payload))
                pixels.append(np.asarray(img).ravel().tolist())
            out = pdf[[c for c in pdf.columns if c != media_col]].copy()
            out["pixels"] = pixels
            yield out

    fields = [f for f in df.schema.fields if f.name != media_col]
    schema = T.StructType(
        fields + [T.StructField("pixels", T.ArrayType(T.IntegerType()))]
    )
    return df.mapInPandas(decode, schema=schema)


def frame_sample(
    df: DataFrame,
    media_col: str = "media",
    *,
    every_n_bytes: int = 16,
    frame_col: str = "frame_offset",
) -> DataFrame:
    """"Frame sampling" over the opaque payload: emit one row per
    sampled offset (the video-frame-sampling plumbing — one input row
    fans out to many frame rows, schema-stable).

    The byte-offset stand-in becomes real frame indices once a codec
    is present; the fan-out/partitioning shape is what matters here.
    """

    def sample(batches):
        for pdf in batches:
            rows = {c: [] for c in pdf.columns}
            rows[frame_col] = []
            for _, row in pdf.iterrows():
                payload = row[media_col]
                n = len(bytes(payload)) if payload is not None else 0
                for off in range(0, max(n - 12, 0), every_n_bytes):
                    for c in pdf.columns:
                        rows[c].append(row[c])
                    rows[frame_col].append(off)
            yield pd.DataFrame(rows)

    schema = T.StructType(
        df.schema.fields + [T.StructField(frame_col, T.LongType())]
    )
    return df.mapInPandas(sample, schema=schema)
