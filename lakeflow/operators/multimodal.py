"""Multimodal columns (SURVEY §2.12): image/audio/video payloads are
opaque ``binary`` columns with a typed metadata struct alongside.

The Spark-side plumbing here is real and tested — schema, Arrow-batched
``mapInPandas``, partition sizing. The media decode itself runs for
real when a PIL-class library is importable (:func:`has_real_decode`,
detected at module import so the closure ships the same branch to
executors); without one — as in this sandbox, which ships no media
libraries — ``fake=False`` raises ``NotImplementedError`` and
``fake=True`` substitutes a deterministic synthetic extractor so the
distributed pipeline shape is exercised end-to-end either way. True
video containers additionally need an ffmpeg-class decoder and always
raise here.

Design notes for 100 TB of media:
- payloads never become shuffle keys or join keys; all grouping happens
  on metadata/ids,
- feature extraction is ``mapInPandas`` (Arrow batches, vectorized per
  partition, zero shuffles),
- ``spark.sql.files.maxPartitionBytes`` bounds per-task memory since
  binary columns dominate row size.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decode path when a PIL-class library is present (prod)
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # this sandbox ships no media libraries
    _PILImage = None


def has_real_decode() -> bool:
    """True when a real image decoder (PIL) was importable — the
    decode/resize/frame operators then run their real branch for
    ``fake=False`` instead of raising. Detection happens on the
    EXECUTORS too (the import is module-level, shipped with the
    function closure), so a cluster must install the library on every
    node or pin ``fake=True``. Even without PIL, PNG payloads decode
    for real through the stdlib baseline (:func:`png_decode_rgb`)."""
    return _PILImage is not None


# ---------------------------------------------------------------------------
# Pure-Python PNG baseline decoder (stdlib zlib only).
#
# Exists so the REAL decode branch is exercisable in environments that
# ship no media library (r6 verdict task #4): PNG is an honest format —
# zlib-compressed scanlines with five per-row predictor filters — and
# decoding it needs nothing beyond the stdlib. The baseline handles the
# overwhelmingly common shape (8-bit depth, gray/gray+alpha/RGB/RGBA,
# non-interlaced); anything else still raises and PIL remains the prod
# path. Per-pixel unfiltering is Python-loop sequential BY SPEC (each
# byte's predictor reads the just-decoded left/up bytes), so this is a
# correctness baseline, not the throughput path — at scale install PIL
# on the executors.


def png_decode_rgb(b: bytes) -> tuple[int, int, list[bytes]]:
    """Decode a PNG payload to (width, height, rgb_rows) where each row
    is ``3*width`` bytes of R,G,B. Grayscale/alpha inputs expand to RGB
    (alpha dropped — metadata extraction wants pixels, not compositing).
    Raises ValueError on a non-PNG and NotImplementedError on shapes
    outside the baseline (bit depth != 8, interlaced, palette)."""
    import struct
    import zlib

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    ihdr = None
    idat = bytearray()
    i = 8
    while i + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[i : i + 4])
        typ = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + ln]
        if typ == b"IHDR":
            try:
                ihdr = struct.unpack(">IIBBBBB", data)
            except struct.error as e:
                # truncated header: surface as the same ValueError the
                # consumers already translate, not an opaque
                # struct.error from one bad row killing the whole job
                raise ValueError("corrupt PNG payload (truncated IHDR)") from e
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        i += 12 + ln  # length + type + data + crc
    if ihdr is None:
        raise ValueError("PNG without IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    # 3 (palette) is a VALID color type — it falls through to the
    # baseline-scope NotImplementedError below, not the corrupt error
    if ctype not in (0, 2, 3, 4, 6):
        raise ValueError(f"corrupt PNG payload (invalid color type {ctype})")
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 or ctype == 3:
        raise NotImplementedError(
            f"PNG shape outside the stdlib baseline (depth={depth}, "
            f"color_type={ctype}, interlace={interlace}); install PIL"
        )
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError("corrupt PNG payload (bad IDAT stream)") from e
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has the wrong size")
    rows: list[bytes] = []
    prev = bytearray(stride)
    pos = 0
    for _ in range(h):
        f = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if f == 1:  # Sub: predictor = left
            for x in range(channels, stride):
                line[x] = (line[x] + line[x - channels]) & 0xFF
        elif f == 2:  # Up: predictor = above
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:  # Average of left and above
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth predictor
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                c = prev[x - channels] if x >= channels else 0
                up = prev[x]
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                line[x] = (line[x] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"invalid PNG filter type {f}")
        prev = line
        # expand to RGB (drop alpha; replicate gray)
        if channels == 3:
            rows.append(bytes(line))
        elif channels == 1:
            rows.append(bytes(v for px in line for v in (px, px, px)))
        elif channels == 2:
            rows.append(
                bytes(v for x in range(0, stride, 2) for v in (line[x],) * 3)
            )
        else:  # RGBA
            rows.append(
                bytes(
                    v
                    for x in range(0, stride, 4)
                    for v in (line[x], line[x + 1], line[x + 2])
                )
            )
    return w, h, rows


def _rgb_luma(r: int, g: int, b: int) -> int:
    """ITU-R 601-2 integer luminance — the same L = (299R + 587G +
    114B) / 1000 rule PIL's ``convert('L')`` uses, truncating."""
    return (299 * r + 587 * g + 114 * b) // 1000


def _nearest_grid(n_src: int, n_dst: int) -> list[int]:
    """Nearest-neighbor source index per destination cell (the
    deterministic affine rule src = floor((dst + 0.5) * n_src / n_dst),
    computed in exact integers)."""
    return [min(n_src - 1, (2 * d + 1) * n_src // (2 * n_dst)) for d in range(n_dst)]


def _png_thumb_rgb(
    b: bytes, tw: int, th: int
) -> tuple[int, int, list[tuple[int, int, int]]]:
    """(width, height, tw*th RGB pixel tuples) — decode + deterministic
    nearest-neighbor thumbnail, the baseline's stand-in for PIL's
    resample (documented: NEAREST, exact-integer grid, so results are
    engine- and platform-independent)."""
    w, h, rows = png_decode_rgb(b)
    xs = _nearest_grid(w, tw)
    ys = _nearest_grid(h, th)
    px = []
    for y in ys:
        row = rows[y]
        for x in xs:
            px.append((row[3 * x], row[3 * x + 1], row[3 * x + 2]))
    return w, h, px

META_SCHEMA = (
    "id long, n_bytes long, content_md5 string, media_type string"
)
FEATURE_SCHEMA = "id long, feature array<double>, width int, height int"
RESIZE_SCHEMA = "id long, width int, height int, resized binary"
FRAME_SCHEMA = "id long, frame_idx int, frame_ts_ms long, frame binary"


def with_binary_payload(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Wrap a content column as the canonical multimodal layout:
    (id, payload binary, media_type). In production the payload comes
    off the lake as raw bytes (spark.read.format('binaryFile') or a
    bytes column in parquet); here text bytes stand in."""
    return df.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(content_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
    )


def extract_metadata(df: DataFrame) -> DataFrame:
    """Metadata extraction over binary payloads — pure JVM built-ins
    (``md5`` and ``octet_length`` both accept binary), so 100 TB of
    media never crosses the Arrow boundary just to be sized and hashed.
    Python enters only where a real decoder is needed
    (``decode_features``)."""
    return df.select(
        F.col("id").cast("long").alias("id"),
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        "media_type",
    )


def decode_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Media decode + feature extraction through Arrow-batched
    ``mapInPandas``. With ``fake=False`` the REAL branch runs when PIL
    is importable (:func:`has_real_decode`): true width/height plus a
    deterministic 4-dim feature (mean R/G/B of an 8x8 thumbnail + mean
    gray, each in [0,1]). Without PIL, PNG payloads still decode FOR
    REAL through the stdlib baseline (:func:`png_decode_rgb`; the
    thumbnail is deterministic nearest-neighbor instead of PIL's
    resample); non-PNG payloads then raise ``NotImplementedError``.
    ``fake=True`` substitutes a deterministic md5-derived extractor
    through the identical plumbing so schema/batching/partitioning
    stay exercised everywhere."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, widths, heights = [], [], []
            for b in pdf["payload"]:
                if fake:
                    digest = hashlib.md5(bytes(b)).digest()
                    feats.append([d / 255.0 for d in digest[:4]])
                    widths.append(digest[4] + 1)
                    heights.append(digest[5] + 1)
                else:
                    if _PILImage is not None:
                        with _PILImage.open(io.BytesIO(bytes(b))) as im:
                            w, h = im.size
                            px = list(
                                im.convert("RGB").resize((8, 8)).getdata()
                            )
                    else:
                        try:
                            w, h, px = _png_thumb_rgb(bytes(b), 8, 8)
                        except ValueError as e:
                            raise NotImplementedError(
                                f"cannot decode payload ({e}) and no "
                                "PIL-class library is installed on the "
                                "executors; run with fake=True for the "
                                "deterministic stub"
                            ) from None
                    n = 255.0 * len(px)
                    mr = sum(p[0] for p in px) / n
                    mg = sum(p[1] for p in px) / n
                    mb = sum(p[2] for p in px) / n
                    feats.append([mr, mg, mb, (mr + mg + mb) / 3.0])
                    widths.append(w)
                    heights.append(h)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "feature": feats,
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)


def resize_images(
    df: DataFrame, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Image resize over binary payloads. The real branch emits the
    row-major grayscale bitmap of the resized image — exactly
    ``width*height`` bytes — via PIL when present; without PIL, PNG
    payloads resize FOR REAL through the stdlib baseline
    (:func:`png_decode_rgb` + deterministic nearest-neighbor grid +
    the same ITU-R 601-2 luminance rule PIL's ``convert('L')`` uses),
    and non-PNG payloads raise. ``fake=True`` emits a deterministic
    pseudo-bitmap of the same size derived from the payload md5, so
    the 1:1 mapInPandas plumbing (schema, Arrow batching, output size
    ∝ target dims not input size) is exercised even where no decoder
    ships. At scale the win is that resize happens WHERE the bytes are
    scanned — payloads never shuffle; output partitions shrink to
    thumbnail size."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf["payload"]:
                if fake:
                    digest = hashlib.md5(bytes(b)).digest()
                    # deterministic pseudo-bitmap: digest tiled to w*h
                    n = width * height
                    out.append((digest * (n // 16 + 1))[:n])
                elif _PILImage is not None:
                    # real branch: grayscale bitmap, width*height bytes
                    # (row-major L mode) — same output contract as the
                    # stub, so downstream schema/size math is identical
                    with _PILImage.open(io.BytesIO(bytes(b))) as im:
                        out.append(
                            im.convert("L").resize((width, height)).tobytes()
                        )
                else:
                    try:
                        _, _, px = _png_thumb_rgb(bytes(b), width, height)
                    except ValueError as e:
                        raise NotImplementedError(
                            f"cannot decode payload ({e}) and no "
                            "PIL-class library is installed on the "
                            "executors; run with fake=True for the "
                            "deterministic stub"
                        ) from None
                    out.append(bytes(_rgb_luma(r, g, bl) for r, g, bl in px))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "resized": out,
                }
            )

    return df.mapInPandas(fn, RESIZE_SCHEMA)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 8, fake: bool = False
) -> DataFrame:
    """Video frame sampling: one input row fans out to N frame rows —
    the 1:N mapInPandas shape (output batches are NOT row-aligned with
    input batches, which is exactly what mapInPandas allows and a
    pandas_udf does not). Real branch (PIL present, ``fake=False``):
    multi-frame formats PIL can open (animated GIF/WebP/TIFF) are
    stepped at ``every_ms`` using each frame's declared duration, up to
    ``max_frames``, emitting 16x16 grayscale frame thumbnails; without
    PIL, a PNG payload yields its single frame through the stdlib
    baseline; true video containers still need an ffmpeg-class decoder
    and raise. ``fake=True`` derives a deterministic frame count
    (1..max_frames from the payload md5) and per-frame bytes so
    partitioning/row-expansion is exercised everywhere. At scale:
    frames inherit the scan's partitioning, no shuffle; a downstream
    repartition only if frame-level grouping follows."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for i, b in zip(pdf["id"], pdf["payload"]):
                if not fake and _PILImage is None:
                    try:
                        _, _, px = _png_thumb_rgb(bytes(b), 16, 16)
                    except ValueError as e:
                        raise NotImplementedError(
                            f"cannot decode payload ({e}) and no "
                            "PIL-class library (or ffmpeg-class one for "
                            "true video) is installed on the executors; "
                            "run with fake=True for the deterministic stub"
                        ) from None
                    ids.append(i)
                    idxs.append(0)
                    tss.append(0)
                    frames.append(bytes(_rgb_luma(r, g, bl) for r, g, bl in px))
                    continue
                if not fake:
                    with _PILImage.open(io.BytesIO(bytes(b))) as im:
                        n_avail = int(getattr(im, "n_frames", 1))
                        # per-frame duration in ms (animated formats
                        # declare it; default 1 frame/sec otherwise)
                        dur = int(im.info.get("duration", 1000) or 1000)
                        step = max(1, every_ms // dur)
                        for j, fi in enumerate(range(0, n_avail, step)):
                            if j >= max_frames:
                                break
                            im.seek(fi)
                            ids.append(i)
                            idxs.append(j)
                            tss.append(fi * dur)
                            frames.append(
                                im.convert("L").resize((16, 16)).tobytes()
                            )
                    continue
                # fake bytes derive from the HEX digest (not raw bytes)
                # so a SQL oracle with only md5(VARCHAR) reproduces the
                # frame content exactly (q_multimodal_frames)
                hexd = hashlib.md5(bytes(b)).hexdigest()
                n_frames = int(hexd[:2], 16) % max_frames + 1
                for j in range(n_frames):
                    ids.append(i)
                    idxs.append(j)
                    tss.append(j * every_ms)
                    frames.append(hashlib.md5(f"{hexd}:{j}".encode()).digest())
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "frame": frames,
                }
            )

    return df.mapInPandas(fn, FRAME_SCHEMA)


DIMS_SCHEMA = "id long, format string, width long, height long"

_PNG_SIG_HEX = "89504E470D0A1A0A"


def _u8(payload_col: str, pos: int):
    return F.conv(
        F.hex(F.expr(f"substring({payload_col}, {pos}, 1)")), 16, 10
    ).cast("long")


def _be32(payload_col: str, pos: int):
    return F.conv(
        F.hex(F.expr(f"substring({payload_col}, {pos}, 4)")), 16, 10
    ).cast("long")


def image_dims(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL image metadata without any media library: PNG and GIF store
    their dimensions at fixed header offsets, so width/height parse as
    PURE JVM built-ins — binary substring + hex + conv, whole-stage
    codegen, 100 TB of images never cross the Arrow boundary to be
    sized. PNG: IHDR width/height are 4-byte big-endian at offsets
    17/21 (after the 8-byte signature + 4-byte length + "IHDR"). GIF:
    the logical screen descriptor holds 2-byte little-endian
    width/height at offsets 7/9. Unknown/JPEG payloads get null dims
    here — JPEG needs a variable-offset marker scan, which is
    :func:`jpeg_dims` (Arrow-batched Python, also library-free).
    Returns (id, format, width, height)."""
    sig8 = F.hex(F.expr(f"substring({payload_col}, 1, 8)"))
    sig3 = F.hex(F.expr(f"substring({payload_col}, 1, 3)"))
    sig2 = F.hex(F.expr(f"substring({payload_col}, 1, 2)"))
    png = sig8 == _PNG_SIG_HEX
    gif = sig3 == "474946"
    jpg = sig2 == "FFD8"

    def le16(pos: int):
        return _u8(payload_col, pos) + _u8(payload_col, pos + 1) * 256

    fmt = (
        F.when(png, F.lit("png"))
        .when(gif, F.lit("gif"))
        .when(jpg, F.lit("jpeg"))
        .otherwise(F.lit("unknown"))
    )
    width = F.when(png, _be32(payload_col, 17)).when(gif, le16(7))
    height = F.when(png, _be32(payload_col, 21)).when(gif, le16(9))
    return df.select(
        F.col("id").cast("long").alias("id"),
        fmt.alias("format"),
        width.cast("long").alias("width"),
        height.cast("long").alias("height"),
    )


def jpeg_dims(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JPEG dimensions via a real marker scan — no image library
    involved (the JFIF container is just length-prefixed segments):
    walk 0xFF-marker segments until a start-of-frame (SOF0/1/2/...)
    whose body carries height then width as 2-byte big-endian at
    offsets 3/5. Arrow-batched ``mapInPandas`` because the offsets are
    data-dependent (not expressible as fixed-position built-ins);
    malformed payloads yield null dims, never an exception. Returns
    (id, format, width, height)."""
    import struct

    sof = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
           0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}

    def parse(b: bytes):
        if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
            return None
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                return None
            # the spec allows any number of 0xFF fill bytes before the
            # marker byte — skip them rather than mis-stride
            while i + 1 < len(b) and b[i + 1] == 0xFF:
                i += 1
            if i + 4 > len(b):
                return None
            marker = b[i + 1]
            if marker in sof:
                if i + 9 > len(b):
                    return None
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return (w, h)
            if marker == 0xD9:  # EOI: stream over, no SOF found
                return None
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers have no length field
                continue
            (seg_len,) = struct.unpack(">H", b[i + 2 : i + 4])
            i += 2 + seg_len
        return None

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, fmts = [], [], []
            for b in pdf[payload_col]:
                dims = parse(bytes(b)) if b is not None else None
                fmts.append("jpeg" if b is not None and bytes(b)[:2] == b"\xff\xd8" else "unknown")
                ws.append(dims[0] if dims else None)
                hs.append(dims[1] if dims else None)
            yield pd.DataFrame(
                {"id": pdf["id"], "format": fmts, "width": ws, "height": hs}
            )

    return df.mapInPandas(fn, DIMS_SCHEMA)


WAV_SCHEMA = "id long, format string, n_channels long, sample_rate long, bits_per_sample long"
MP4_SCHEMA = "id long, format string, duration_ms long"


def _le16(payload_col: str, pos: int):
    return _u8(payload_col, pos) + _u8(payload_col, pos + 1) * 256


def _le32(payload_col: str, pos: int):
    return (
        _u8(payload_col, pos)
        + _u8(payload_col, pos + 1) * 256
        + _u8(payload_col, pos + 2) * 65536
        + _u8(payload_col, pos + 3) * 16777216
    )


def wav_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Audio metadata without an audio library: the canonical WAV
    layout (every mainstream encoder) puts the ``fmt `` chunk right
    after the 12-byte RIFF/WAVE header, so channels (LE16 @23), sample
    rate (LE32 @25) and bits/sample (LE16 @35) parse as pure JVM
    built-ins — codegen, zero Python, payloads never shuffled.
    Non-canonical chunk orders (rare: LIST-before-fmt) fall out as
    nulls here; a box-scanning Python variant would cover them the way
    :func:`jpeg_dims` covers JPEG. Returns
    (id, format, n_channels, sample_rate, bits_per_sample)."""
    riff = F.hex(F.expr(f"substring({payload_col}, 1, 4)")) == "52494646"
    wave = F.hex(F.expr(f"substring({payload_col}, 9, 4)")) == "57415645"
    fmt_ = F.hex(F.expr(f"substring({payload_col}, 13, 4)")) == "666D7420"
    is_wav = riff & wave
    canonical = is_wav & fmt_
    return df.select(
        F.col("id").cast("long").alias("id"),
        F.when(is_wav, F.lit("wav")).otherwise(F.lit("unknown")).alias("format"),
        F.when(canonical, _le16(payload_col, 23)).cast("long").alias("n_channels"),
        F.when(canonical, _le32(payload_col, 25)).cast("long").alias("sample_rate"),
        F.when(canonical, _le16(payload_col, 35)).cast("long").alias("bits_per_sample"),
    )


def mp4_duration(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Video container metadata without ffmpeg: MP4/ISO-BMFF is a tree
    of length-prefixed boxes, so duration = mvhd.duration/mvhd.timescale
    comes from a real box walk (top level → moov → mvhd, version 0 or
    1) — data-dependent offsets, hence Arrow-batched ``mapInPandas``
    like :func:`jpeg_dims`; still zero external libraries. Malformed or
    non-MP4 payloads yield null duration. Returns
    (id, format, duration_ms)."""
    import struct

    def boxes(b: bytes, start: int, end: int):
        i = start
        while i + 8 <= end:
            (size,) = struct.unpack(">I", b[i : i + 4])
            typ = b[i + 4 : i + 8]
            if size == 1:  # 64-bit largesize
                if i + 16 > end:
                    return
                (size,) = struct.unpack(">Q", b[i + 8 : i + 16])
            if size < 8 or i + size > end:
                return
            yield typ, i + 8, i + size
            i += size

    def parse(b: bytes):
        is_mp4 = len(b) >= 12 and b[4:8] == b"ftyp"
        if not is_mp4:
            return None, False
        for typ, s, e in boxes(b, 0, len(b)):
            if typ != b"moov":
                continue
            for t2, s2, e2 in boxes(b, s, e):
                if t2 != b"mvhd" or s2 + 4 > e2:
                    continue
                version = b[s2]
                # after version(1)+flags(3): v0 has 4-byte creation +
                # modification then II (ts, dur); v1 has 8-byte ones
                # then I ts + Q dur
                if version == 0 and s2 + 20 <= e2:
                    ts, dur = struct.unpack(">II", b[s2 + 12 : s2 + 20])
                elif version == 1 and s2 + 32 <= e2:
                    ts, dur = struct.unpack(">IQ", b[s2 + 20 : s2 + 32])
                else:
                    continue
                if ts:
                    return dur * 1000 // ts, True
        return None, True

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            durs, fmts = [], []
            for b in pdf[payload_col]:
                d, is_mp4 = parse(bytes(b)) if b is not None else (None, False)
                durs.append(d)
                fmts.append("mp4" if is_mp4 else "unknown")
            yield pd.DataFrame(
                {"id": pdf["id"], "format": fmts, "duration_ms": durs}
            )

    return df.mapInPandas(fn, MP4_SCHEMA)
