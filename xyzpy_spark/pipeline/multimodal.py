"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages.  Two decode tiers:

- ``decode_media``: a REAL, dependency-free decoder for WAV
  (RIFF/PCM16 chunk walk) and PPM (P6 header + raw pixels) — parses
  actual bytes and computes stats from the decoded samples/pixels.
  The reference's analog is arbitrary per-record python over any
  value (reference gen/combo_runner.py:77-139); this is its
  binary-column counterpart.
- ``decode_image``: JPEG/PNG and friends need an imaging library not
  present in this container, so that kernel stays a clearly-marked
  ``NotImplementedError`` stub with real mapInPandas plumbing.

``fake_wav_bytes`` / ``fake_ppm_bytes`` emit VALID files whose content
is a closed-form function of the seed, so decoded stats have an exact
SQL oracle while the decoder still does real byte-level parsing.
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


MEDIA_DECODED_TYPE = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_values", T.LongType()),
        T.StructField("mean_value", T.DoubleType()),
    ]
)

_NULL_DECODED = {
    "format": None,
    "width": None,
    "height": None,
    "sample_rate": None,
    "channels": None,
    "n_values": None,
    "mean_value": None,
}


def fake_wav_bytes(seed: int) -> bytes:
    """A VALID RIFF/WAVE PCM16 file derived from ``seed``.

    Real enough for any WAV parser (RIFF header, ``fmt `` and ``data``
    chunks, little-endian int16 frames); closed-form enough for a SQL
    oracle: ``sample[i] = (seed*31 + i*7) % 2003 - 1001``.
    """
    seed = int(seed)
    sr = 8000 + (seed % 5) * 1000
    ch = 1 + seed % 2
    n_vals = (32 + seed % 17) * ch
    data = b"".join(
        _struct.pack("<h", (seed * 31 + i * 7) % 2003 - 1001)
        for i in range(n_vals)
    )
    block_align = ch * 2
    fmt = _struct.pack("<HHIIHH", 1, ch, sr, sr * block_align, block_align, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + _struct.pack("<I", 16) + fmt
        + b"data" + _struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + _struct.pack("<I", len(chunks)) + chunks


def fake_ppm_bytes(seed: int) -> bytes:
    """A VALID binary PPM (P6) image derived from ``seed``:
    ``pixel[k] = (seed*17 + k*11) % 256``."""
    seed = int(seed)
    w = 4 + seed % 9
    h = 3 + seed % 7
    body = bytes((seed * 17 + k * 11) % 256 for k in range(3 * w * h))
    return f"P6\n{w} {h}\n255\n".encode() + body


def attach_sample_media(
    df: DataFrame, id_col: str = "doc_id", out_col: str = "media"
) -> DataFrame:
    """Attach deterministic REAL media files (even ids → WAV, odd →
    PPM) keyed off the id column — the decode-pipeline test harness."""

    def gen(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                fake_wav_bytes(int(i)) if int(i) % 2 == 0
                else fake_ppm_bytes(int(i))
                for i in pdf[id_col]
            ]
            yield pdf

    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.BinaryType())]
    )
    return df.mapInPandas(gen, schema=schema)


def _parse_wav(b: bytes) -> dict | None:
    """Walk RIFF chunks; decode PCM16 frames; stats from the samples."""
    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, fmt_body, data_body = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos: pos + 4]
        size = _struct.unpack("<I", b[pos + 4: pos + 8])[0]
        body = b[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt_body = body
        elif cid == b"data":
            data_body = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_body is None or data_body is None or len(fmt_body) < 16:
        return None
    audio_fmt, ch, sr, _, _, bits = _struct.unpack("<HHIIHH", fmt_body[:16])
    if audio_fmt != 1 or bits != 16:
        return None  # only uncompressed PCM16 here
    samples = np.frombuffer(data_body[: len(data_body) // 2 * 2], dtype="<i2")
    n = samples.size
    return {
        "format": "wav",
        "width": None,
        "height": None,
        "sample_rate": int(sr),
        "channels": int(ch),
        "n_values": n,
        "mean_value": int(samples.sum(dtype="int64")) / n if n else None,
    }


def _parse_ppm(b: bytes) -> dict | None:
    """Parse the P6 ASCII header (whitespace/comment tolerant) + raw
    RGB bytes; stats from the pixels."""
    import numpy as np

    if b[:2] != b"P6":
        return None
    idx, vals = 2, []
    while len(vals) < 3 and idx < len(b):
        if b[idx: idx + 1].isspace():
            idx += 1
        elif b[idx: idx + 1] == b"#":
            while idx < len(b) and b[idx] != 0x0A:
                idx += 1
        else:
            start = idx
            while idx < len(b) and not b[idx: idx + 1].isspace():
                idx += 1
            try:
                vals.append(int(b[start:idx]))
            except ValueError:
                return None
    if len(vals) < 3:
        return None
    idx += 1  # the single whitespace byte after maxval
    w, h, maxval = vals
    if maxval > 255:
        # 16-bit P6: two bytes per sample, big-endian per the spec
        pixels = np.frombuffer(
            b[idx: idx + 6 * w * h], dtype=">u2"
        ).astype(np.uint16)
    else:
        pixels = np.frombuffer(b[idx: idx + 3 * w * h], dtype=np.uint8)
    n = pixels.size
    return {
        "format": "ppm",
        "width": int(w),
        "height": int(h),
        "sample_rate": None,
        "channels": None,
        "n_values": n,
        "mean_value": int(pixels.sum(dtype="int64")) / n if n else None,
    }


def decode_media(
    df: DataFrame, media_col: str = "media", out_col: str = "decoded"
) -> DataFrame:
    """REAL dependency-free decode of WAV (RIFF/PCM16) and PPM (P6)
    payloads via Arrow-batched ``mapInPandas``.

    Every record's bytes are actually parsed (chunk walk / header
    scan) and the stats computed from the decoded samples or pixels —
    unknown formats yield a null struct, never an error, so one bad
    file can't kill a 100-TB scan.
    """

    def decode(batches):
        for pdf in batches:
            out_rows = []
            for payload in pdf[media_col]:
                b = bytes(payload) if payload is not None else b""
                parsed = _parse_wav(b) or _parse_ppm(b)
                out_rows.append(parsed if parsed else dict(_NULL_DECODED))
            out = pdf.copy()
            out[out_col] = out_rows
            yield out

    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, MEDIA_DECODED_TYPE)]
    )
    return df.mapInPandas(decode, schema=schema)


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
    if frame_col in df.columns:
        raise ValueError(
            f"frame_col {frame_col!r} already exists in the input — "
            "pass a different name"
        )

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
