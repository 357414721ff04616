"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Convention: a modality column is ``binary`` payload + a metadata struct
(``mime``, dimensions, duration) riding beside it.  Heavy per-item work
(decode, feature extraction, resize, frame sampling) runs as Arrow-batched
Pandas UDFs / ``mapInPandas`` so payload bytes never round-trip through
row-at-a-time Python.

The image/audio codec libraries are not available in this container, so
the *decode* steps are stubbed: they raise ``NotImplementedError`` unless
``fake=True`` selects a deterministic byte-derived fake (clearly marked).
Everything Spark-side — schemas, batch shapes, UDF signatures,
partitioning — is real and tested; :func:`byte_histogram` and
:func:`byte_entropy` are fully real feature extractors (pure
numpy-over-Arrow), usable as cheap corpus-quality signals at scale.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "IMAGE_META_SCHEMA",
    "with_image_meta",
    "byte_histogram",
    "byte_entropy",
    "parse_image_header",
    "make_image_header",
    "AUDIO_META_SCHEMA",
    "parse_audio_header",
    "make_audio_header",
    "audio_meta",
    "with_audio_meta",
    "image_dims",
    "decode_image",
    "resize_images",
    "sample_frames",
]

IMAGE_META_SCHEMA = (
    "mime STRING, width INT, height INT, n_bytes BIGINT"
)


def with_image_meta(
    df: DataFrame, bin_col: str, *,
    mime: str = "application/octet-stream", probe: bool = False,
) -> DataFrame:
    """Attach the typed metadata struct next to a binary column.
    ``n_bytes`` is computed JVM-side.  With ``probe=False`` width /
    height are NULL (unknown before decode); ``probe=True`` fills them
    — and the mime, for recognized formats — from the header bytes via
    the codec-free :func:`image_dims` probe (PNG/GIF/BMP/JPEG;
    unrecognized payloads keep the caller's ``mime`` and NULL dims)."""
    if not probe:
        return df.withColumn(
            f"{bin_col}_meta",
            F.struct(
                F.lit(mime).alias("mime"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.length(F.col(bin_col)).cast("bigint").alias("n_bytes"),
            ),
        )
    # collision-free temp name: a user column named `_{bin_col}_dims`
    # would otherwise be silently overwritten and dropped
    tmp = f"_{bin_col}_dims"
    while tmp in df.columns:
        tmp += "_x"
    d = F.col(tmp)
    # probe once into a temp column so the Arrow UDF runs a single
    # time per row, not once per referenced field
    return (df.withColumn(tmp, image_dims(F.col(bin_col)))
            .withColumn(
                f"{bin_col}_meta",
                F.struct(
                    F.when(d["format"].isNotNull(),
                           F.concat(F.lit("image/"), d["format"]))
                    .otherwise(F.lit(mime)).alias("mime"),
                    d["width"].alias("width"),
                    d["height"].alias("height"),
                    F.length(F.col(bin_col)).cast("bigint")
                    .alias("n_bytes"),
                ))
            .drop(tmp))


# The pandas_udf decorators validate types against the active session, so
# they are created lazily inside the public builders — importing this
# module must not require a SparkSession.

def _byte_hist16():
    @pandas_udf("array<double>")
    def hist16(payload: pd.Series) -> pd.Series:
        out = []
        for b in payload:
            if b is None or len(b) == 0:
                out.append([0.0] * 16)
                continue
            arr = np.frombuffer(b, dtype=np.uint8)
            h = np.bincount(arr >> 4, minlength=16).astype(float)
            out.append(list(h / h.sum()))
        return pd.Series(out)
    return hist16


def byte_histogram(bin_col) -> Column:
    """Normalized 16-bin histogram of the payload's high nibbles — a real
    Arrow-batched feature extractor (numpy over the whole batch, no
    per-row Python object churn)."""
    c = bin_col if isinstance(bin_col, Column) else F.col(bin_col)
    return _byte_hist16()(c)


def _byte_entropy_udf():
    @pandas_udf("double")
    def entropy(payload: pd.Series) -> pd.Series:
        out = []
        for b in payload:
            if b is None or len(b) == 0:
                out.append(0.0)
                continue
            arr = np.frombuffer(b, dtype=np.uint8)
            p = np.bincount(arr, minlength=256) / len(arr)
            p = p[p > 0]
            out.append(float(-(p * np.log2(p)).sum()))
        return pd.Series(out)
    return entropy


def byte_entropy(bin_col) -> Column:
    """Shannon entropy (bits/byte) of the payload — compressed/encrypted
    media sits near 8, text near 4-5; a useful triage signal."""
    c = bin_col if isinstance(bin_col, Column) else F.col(bin_col)
    return _byte_entropy_udf()(c)


def parse_image_header(b) -> tuple[str, int, int] | None:
    """Pure-stdlib image header probe: ``(format, width, height)`` for
    PNG / GIF / BMP / JPEG payloads, ``None`` for anything else (or a
    truncated header).  No codec library involved — these are fixed
    struct layouts from the public format specs (PNG IHDR, GIF logical
    screen descriptor, BMP BITMAPINFOHEADER, JPEG SOFn marker scan) —
    so dimension *metadata* works in codec-less environments; pixel
    decode stays behind the PIL gate (:func:`decode_image`)."""
    import struct

    if b is None:
        return None
    b = bytes(b)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return ("gif", w, h)
    if b[:2] == b"BM" and len(b) >= 26:
        # 'BM' alone is weak (any text starting "BMW..." matches):
        # require zeroed reserved words and a known BITMAPINFOHEADER
        # size before trusting the dimensions
        hdr = struct.unpack("<I", b[14:18])[0]
        w, h = struct.unpack("<ii", b[18:26])
        if (b[6:10] == b"\x00\x00\x00\x00"
                and hdr in (40, 52, 56, 64, 108, 124)
                and w > 0 and h != 0):
            return ("bmp", w, abs(h))  # negative height = top-down
        return None
    if b[:2] == b"\xff\xd8":
        # JPEG: walk the marker segments to the first SOFn frame header
        i = 2
        while i + 3 < len(b):
            if b[i] != 0xFF:
                return None  # broken marker stream
            m = b[i + 1]
            if m == 0xFF:  # fill byte
                i += 1
                continue
            if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:  # bare markers
                i += 2
                continue
            if i + 4 > len(b):
                return None
            seg = struct.unpack(">H", b[i + 2:i + 4])[0]
            if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
                if i + 9 > len(b):
                    return None
                h, w = struct.unpack(">HH", b[i + 5:i + 9])
                return ("jpeg", w, h)
            i += 2 + seg
        return None
    return None


def make_image_header(fmt: str, width: int, height: int) -> bytes:
    """Deterministic minimal header bytes for ``fmt`` with the given
    dimensions — a fixture builder for testing the header probe without
    codec libraries (the payload after the header is NOT a decodable
    image)."""
    import struct

    if fmt == "png":
        return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
                + struct.pack(">II", width, height) + b"\x08\x02\0\0\0")
    if fmt == "gif":
        return b"GIF89a" + struct.pack("<HH", width, height) + b"\0\0\0"
    if fmt == "bmp":
        # 14-byte file header ("BM", size, reserved, data offset) +
        # the first 12 bytes of BITMAPINFOHEADER (size=40, w, h)
        return (b"BM" + struct.pack("<IHHI", 26, 0, 0, 54)
                + struct.pack("<Iii", 40, width, height))
    if fmt == "jpeg":
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\0" + b"\0" * 9
        sof0 = (b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
                + struct.pack(">HH", height, width) + b"\x03"
                + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01")
        return b"\xff\xd8" + app0 + sof0
    raise ValueError(f"make_image_header: unknown format {fmt!r}")


def _image_dims_udf():
    @pandas_udf("struct<format: string, width: int, height: int>")
    def dims(payload: pd.Series) -> pd.DataFrame:
        fmts, ws, hs = [], [], []
        for b in payload:
            p = parse_image_header(b)
            fmts.append(p[0] if p else None)
            ws.append(p[1] if p else None)
            hs.append(p[2] if p else None)
        return pd.DataFrame({"format": fmts, "width": ws, "height": hs})
    return dims


def image_dims(bin_col) -> Column:
    """``struct(format, width, height)`` probed from the payload's
    header bytes (PNG/GIF/BMP/JPEG; NULLs for anything else) — an
    Arrow-batched, codec-free upgrade over the decode gate for
    dimension statistics at corpus scale."""
    c = bin_col if isinstance(bin_col, Column) else F.col(bin_col)
    return _image_dims_udf()(c)


def decode_image(
    df: DataFrame,
    bin_col: str = "data",
    *,
    fake: bool = False,
) -> DataFrame:
    """Decode image payloads to (width, height, mean_pixel) via
    ``mapInPandas`` (one Arrow batch of payloads per task — the real
    batch shape a PIL/libjpeg decode would use).

    No codec libs in this container: ``fake=True`` derives deterministic
    dimensions from the payload bytes (FAKE decode, marked); otherwise
    raises ``NotImplementedError``.
    """
    try:  # pragma: no cover - codec libs absent in this environment
        import PIL.Image  # noqa: F401
        have_pil = True
    except ImportError:
        have_pil = False

    if not have_pil and not fake:
        raise NotImplementedError(
            "Image decode requires a codec library (PIL) not present in "
            "this environment; pass fake=True for the deterministic test "
            "fake."
        )

    schema = df.schema.simpleString()[7:-1] + \
        ", width INT, height INT, mean_pixel DOUBLE"

    def _decode(batches):
        for pdf in batches:
            ws, hs, ms = [], [], []
            for b in pdf[bin_col]:
                if b is None or len(b) < 2:
                    ws.append(None), hs.append(None), ms.append(None)
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                # FAKE decode: dimensions derived from leading bytes,
                # "pixels" are the raw payload bytes
                w = int(arr[0]) % 64 + 1
                h = int(arr[1]) % 64 + 1
                ws.append(w), hs.append(h)
                ms.append(float(arr.mean()))
            out = pdf.copy()
            out["width"], out["height"], out["mean_pixel"] = ws, hs, ms
            yield out

    return df.mapInPandas(_decode, schema=schema)


def resize_images(
    df: DataFrame, bin_col: str = "data", *, size: tuple[int, int] = (32, 32),
    fake: bool = False,
) -> DataFrame:
    """Resize payloads (stub: needs a codec).  The fake path re-emits a
    truncated/padded payload of exactly ``size[0]*size[1]`` bytes so
    downstream batch-shape contracts are exercised for real."""
    if not fake:
        raise NotImplementedError(
            "resize requires a codec library; pass fake=True for the "
            "deterministic byte-level fake."
        )
    n = size[0] * size[1]
    schema = df.schema.simpleString()[7:-1]

    def _resize(batches):
        for pdf in batches:
            out = pdf.copy()
            out[bin_col] = [
                (None if b is None else
                 (bytes(b) * (n // max(len(b), 1) + 1))[:n])
                for b in pdf[bin_col]
            ]
            yield out

    return df.mapInPandas(_resize, schema=schema)


def sample_frames(
    df: DataFrame, bin_col: str = "data", *, n_frames: int = 4,
    fake: bool = False,
) -> DataFrame:
    """Sample ``n_frames`` evenly-spaced 'frames' from a video payload —
    one output row per (item, frame), the explode shape a real ffmpeg
    sampler would produce.  Fake path: frames are byte slices."""
    if not fake:
        raise NotImplementedError(
            "frame sampling requires a codec library; pass fake=True for "
            "the deterministic byte-level fake."
        )
    schema = df.schema.simpleString()[7:-1] + \
        ", frame_idx INT, frame BINARY"

    def _sample(batches):
        # columnar explode: build the replicated passthrough columns with
        # one numpy repeat per column instead of per-row dict appends
        # (iterrows over an Arrow batch is the row-at-a-time trap)
        import numpy as np

        for pdf in batches:
            payloads = pdf[bin_col].to_numpy(dtype=object)
            keep = np.array(
                [b is not None and len(b) > 0 for b in payloads], dtype=bool)
            if not keep.any():
                continue
            kept = pdf.loc[keep]
            pl = payloads[keep]
            out = {c: np.repeat(kept[c].to_numpy(dtype=object), n_frames)
                   for c in pdf.columns}
            out["frame_idx"] = np.tile(
                np.arange(n_frames, dtype=np.int32), len(pl))
            frames = np.empty(len(pl) * n_frames, dtype=object)
            pos = 0
            for b in pl:
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    lo = min(i * step, len(b) - 1)
                    frames[pos] = bytes(b[lo:lo + step])
                    pos += 1
            out["frame"] = frames
            yield pd.DataFrame(out)

    return df.mapInPandas(_sample, schema=schema)


AUDIO_META_SCHEMA = ("mime STRING, sample_rate INT, channels INT, "
                     "bits INT, n_samples BIGINT, n_bytes BIGINT")


def parse_audio_header(b) -> tuple[str, int, int, int, int] | None:
    """Pure-stdlib audio header probe: ``(format, sample_rate,
    channels, bits, n_samples)`` for WAV (RIFF/WAVE, PCM ``fmt ``
    chunk walk) and FLAC (STREAMINFO metadata block) payloads, ``None``
    otherwise — the audio sibling of :func:`parse_image_header`: the
    layouts are fixed public structs (RIFF spec; FLAC format §
    METADATA_BLOCK_STREAMINFO), so duration/rate METADATA works in
    codec-less environments while sample decode stays honestly gated.
    """
    import struct

    if b is None:
        return None
    b = bytes(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        # The walk is bounded by the RIFF size field, so trailing
        # payload bytes past the declared container (a common pattern
        # in probe inputs) are never misread as chunks.
        riff_end = min(len(b), 8 + struct.unpack("<I", b[4:8])[0])
        i, rate, ch, bits, align, data = 12, None, None, None, None, None
        while i + 8 <= riff_end:
            cid = b[i:i + 4]
            size = struct.unpack("<I", b[i + 4:i + 8])[0]
            if cid == b"fmt " and size >= 16 and i + 24 <= len(b):
                ch, rate = struct.unpack("<HI", b[i + 10:i + 16])
                align, bits = struct.unpack("<HH", b[i + 20:i + 24])
            elif cid == b"data":
                data = size
                if rate is not None:
                    break  # fmt seen: nothing meaningful follows data
            i += 8 + size + (size & 1)  # chunks are word-aligned
        if rate and ch and align and data is not None:
            return ("wav", rate, ch, bits, data // align)
        return None
    if b[:4] == b"fLaC" and len(b) >= 8:
        btype = b[4] & 0x7F
        blen = int.from_bytes(b[5:8], "big")
        if btype != 0 or blen < 34 or len(b) < 8 + 34:
            return None
        packed = struct.unpack(">Q", b[18:26])[0]
        rate = packed >> 44
        ch = ((packed >> 41) & 0x7) + 1
        bits = ((packed >> 36) & 0x1F) + 1
        n = packed & ((1 << 36) - 1)
        if rate == 0:
            return None
        return ("flac", rate, ch, bits, n)
    return None


def make_audio_header(fmt: str, sample_rate: int, channels: int,
                      n_samples: int, bits: int = 16) -> bytes:
    """Deterministic minimal header bytes for ``fmt`` ('wav'/'flac')
    with the given stream parameters — the fixture builder for testing
    the probe without codec libraries (no actual samples follow)."""
    import struct

    if fmt == "wav":
        align = channels * bits // 8
        data = n_samples * align
        return (b"RIFF" + struct.pack("<I", 36 + data) + b"WAVE"
                + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels,
                                        sample_rate,
                                        sample_rate * align, align, bits)
                + b"data" + struct.pack("<I", data))
    if fmt == "flac":
        if not (1 <= channels <= 8 and 1 <= bits <= 32
                and sample_rate < (1 << 20) and n_samples < (1 << 36)):
            raise ValueError("flac header field out of range")
        packed = ((sample_rate << 44) | ((channels - 1) << 41)
                  | ((bits - 1) << 36) | n_samples)
        return (b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
                + struct.pack(">HH", 4096, 4096)  # min/max blocksize
                + b"\x00" * 6                     # min/max framesize
                + struct.pack(">Q", packed)
                + b"\x00" * 16)                   # md5 of samples
    raise ValueError(f"make_audio_header: unknown format {fmt!r}")


def _audio_meta_udf():
    @pandas_udf("struct<format: string, sample_rate: int, channels: int,"
                " bits: int, n_samples: bigint>")
    def meta(payload: pd.Series) -> pd.DataFrame:
        rows = []
        for b in payload:
            p = parse_audio_header(b)
            rows.append(
                {"format": None, "sample_rate": None, "channels": None,
                 "bits": None, "n_samples": None} if p is None else
                {"format": p[0], "sample_rate": p[1], "channels": p[2],
                 "bits": p[3], "n_samples": p[4]})
        return pd.DataFrame(rows)
    return meta


def audio_meta(bin_col) -> Column:
    """Arrow-batched audio header probe column (see
    :func:`parse_audio_header`)."""
    c = bin_col if isinstance(bin_col, Column) else F.col(bin_col)
    return _audio_meta_udf()(c)


def with_audio_meta(
    df: DataFrame, bin_col: str, *,
    mime: str = "application/octet-stream", probe: bool = False,
) -> DataFrame:
    """Attach the typed audio metadata struct next to a binary column —
    the audio twin of :func:`with_image_meta`.  ``probe=True`` fills
    rate/channels/bits/sample-count (and the mime for recognized
    formats) from the WAV/FLAC header structs; otherwise they ride as
    NULL until a real decode."""
    if not probe:
        return df.withColumn(
            f"{bin_col}_meta",
            F.struct(
                F.lit(mime).alias("mime"),
                F.lit(None).cast("int").alias("sample_rate"),
                F.lit(None).cast("int").alias("channels"),
                F.lit(None).cast("int").alias("bits"),
                F.lit(None).cast("bigint").alias("n_samples"),
                F.length(F.col(bin_col)).cast("bigint").alias("n_bytes"),
            ))
    tmp = f"_{bin_col}_audio"
    while tmp in df.columns:  # never clobber a caller's column
        tmp += "_x"
    d = F.col(tmp)
    return (df.withColumn(tmp, audio_meta(F.col(bin_col)))
            .withColumn(
                f"{bin_col}_meta",
                F.struct(
                    F.when(d["format"].isNotNull(),
                           F.concat(F.lit("audio/"), d["format"]))
                    .otherwise(F.lit(mime)).alias("mime"),
                    d["sample_rate"].alias("sample_rate"),
                    d["channels"].alias("channels"),
                    d["bits"].alias("bits"),
                    d["n_samples"].alias("n_samples"),
                    F.length(F.col(bin_col)).cast("bigint")
                    .alias("n_bytes"),
                ))
            .drop(tmp))
