"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference routes ~40 content types to type-specific filters (perfect-
hash extension detector /root/reference/utils/phash/phash.c via
pc_archive.c:108-110; packJPG for images, wavpack for audio — dispatch at
/root/reference/pcompress.c:205-401). This module is that router for a
Spark table: media rides as an opaque ``binary`` column with typed
metadata; decode/feature steps are Arrow-batched ``mapInPandas`` UDFs.

Three REAL decoders ship in-tree, mirroring the reference's dependency-free
filters: a numpy P5/P6 PNM parser
(/root/reference/filters/packpnm/packpnm.c), a canonical RIFF/WAVE PCM-16
parser (the reference routes WAV members to its bundled wavpack filter,
/root/reference/pcompress.c:205-401), and a full PNG raster decoder
(stdlib-zlib inflate + scanline unfiltering, CRC-checked chunk walk).
Payloads that decode get a real pixel/amplitude-histogram feature; JPEG
gets a real header parse (SOI/SOF marker walk -> dims/components) and MP4
video a real ISO-BMFF box walk (ftyp/moov/mvhd/tkhd -> dims + duration);
their raster/sample tiers (no entropy decoder or codec in this container)
fall back to a deterministic content-addressed stub behind
``decode_stub=True``, or raise NotImplementedError when decode_stub=False.
All Spark-side plumbing — schema, batching, partitioning, UDF signatures —
is real and identical for both paths.

``payload_sha_like`` is a true CONTENT hash (kernels.hash_bytes_rows —
FNV-1a over every byte + splitmix avalanche), usable as an exact-dup key.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..kernels import hash_bytes_rows, splitmix64, trim_after

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),      # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),     # opaque bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_sha_like", T.LongType(), False),
        T.StructField("decoded", T.BooleanType(), False),
        # header_decoded: the payload's container header parsed in-tree
        # (PNM/WAV/PNG fully decode; JPEG parses SOI/SOF markers, MP4
        # walks ftyp/moov/tkhd boxes — their rasters/samples stay stubbed,
        # no entropy decoder or codec in this container)
        T.StructField("header_decoded", T.BooleanType(), False),
        T.StructField("hdr_width", T.IntegerType(), True),
        T.StructField("hdr_height", T.IntegerType(), True),
        # IJG quality estimated from the luminance DQT (JPEG rows only)
        T.StructField("jpeg_quality", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FEATURE_DIM = 32


# ---------------------------------------------------------------------------
# real decoder: PNM (P5 grayscale / P6 RGB, 8-bit) — numpy, no dependencies
# ---------------------------------------------------------------------------

def decode_pnm(payload: bytes | None) -> np.ndarray | None:
    """Raster bytes of a binary PNM payload (see parse_pnm); None if not
    valid PNM."""
    parsed = parse_pnm(payload)
    return None if parsed is None else parsed[0]


def parse_pnm(payload: bytes | None) -> tuple[np.ndarray, int, int] | None:
    """Parse a binary PNM payload (P5 gray / P6 RGB, maxval <= 255) into
    (uint8 raster bytes, width, height); None if the payload is not valid
    PNM. Mirrors the reference's in-tree PNM parser
    (/root/reference/filters/packpnm/packpnm.c) in scope: header tokens may
    be separated by whitespace and '#' comments; raster follows the single
    whitespace byte after maxval."""
    if not payload or payload[:2] not in (b"P5", b"P6"):
        return None
    channels = 1 if payload[:2] == b"P5" else 3
    pos, tokens = 2, []
    n = len(payload)
    while len(tokens) < 3 and pos < n:
        c = payload[pos]
        if c in b" \t\r\n":
            pos += 1
        elif c == ord("#"):
            while pos < n and payload[pos] != ord("\n"):
                pos += 1
        else:
            start = pos
            while pos < n and payload[pos] not in b" \t\r\n":
                pos += 1
            tokens.append(payload[start:pos])
    if len(tokens) < 3 or pos >= n:
        return None
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if w <= 0 or h <= 0 or not (0 < maxval <= 255):
        return None
    pos += 1  # the single whitespace byte after maxval
    need = w * h * channels
    if n - pos < need:
        return None
    return np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos), w, h


def decode_jpeg_header(payload: bytes | None) -> tuple[int, int, int] | None:
    """Parse a JPEG payload's header markers into (width, height,
    n_components); None if the payload is not JPEG or carries no SOF
    before scan data.

    Real marker walk, dependency-free: verify SOI (FFD8), then skip
    length-prefixed segments until a start-of-frame marker (SOF0 baseline /
    SOF1 extended / SOF2 progressive — FFC0/C1/C2) and read its
    precision/height/width/components fields; stop at SOS (FFDA) or EOF.
    This is the header tier of the reference's JPEG routing (members
    detected as JPEG are handed to the packJPG filter,
    /root/reference/pcompress.c:205-401,
    /root/reference/archive/pjpg_helper.cpp) — the raster itself stays
    behind the declared decode stub (no entropy decoder in-tree)."""
    if not payload or len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        return None
    pos, n = 2, len(payload)
    while pos + 3 < n:
        if payload[pos] != 0xFF:
            return None  # marker desync — not a well-formed JPEG stream
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers carry no length
            continue
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no SOF seen
            return None
        seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        if seg_len < 2 or pos + 2 + seg_len > n:
            return None
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            if seg_len < 8:
                return None
            h = int.from_bytes(payload[pos + 5 : pos + 7], "big")
            w = int.from_bytes(payload[pos + 7 : pos + 9], "big")
            ncomp = payload[pos + 9]
            if w <= 0 or h <= 0 or ncomp not in (1, 3, 4):
                return None
            return w, h, ncomp
        pos += 2 + seg_len
    return None


# ITU-T T.81 Annex K.1 standard luminance quantization table (natural
# order) — the public reference table libjpeg scales by quality; the base
# for both DQT serialization (make_jpeg_header) and quality estimation.
_STD_LUMA_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_STD_LUMA_SUM = int(_STD_LUMA_QT.sum())  # 3688


def jpeg_quality_estimate(payload: bytes | None) -> int | None:
    """Estimate the IJG quality setting from a JPEG's luminance DQT table
    — the quantization-quality feature of the header tier (the reference's
    packJPG filter reads the same tables before re-coding,
    /root/reference/archive/pjpg_helper.cpp). None if the payload is not
    JPEG or carries no table-0 DQT before scan data.

    Deterministic integer estimator (the DuckDB twin reproduces it from
    the same bytes): S = sum of the 64 table-0 coefficients,
    scale_pct = round(100*S / S_std) in integer arithmetic, then the IJG
    inverse — q = (200 - scale_pct) // 2 when scale_pct <= 100 else
    round(5000 / scale_pct) — clamped to [1, 100]. Sum-ratio estimation
    is coefficient-order-independent, so zigzag vs natural DQT layout
    does not matter. 16-bit (Pq=1) tables are summed from their BE pairs.
    """
    if not payload or len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        return None
    pos, n = 2, len(payload)
    while pos + 3 < n:
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no DQT seen
            return None
        seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        if seg_len < 2 or pos + 2 + seg_len > n:
            return None
        if marker == 0xDB:  # DQT — may hold several tables back to back
            q, end = pos + 4, pos + 2 + seg_len
            while q < end:
                pq, tq = payload[q] >> 4, payload[q] & 0x0F
                width = 128 if pq == 1 else 64
                if q + 1 + width > end:
                    break
                if tq == 0:
                    raw = payload[q + 1 : q + 1 + width]
                    if pq == 1:
                        s = sum(
                            int.from_bytes(raw[i : i + 2], "big")
                            for i in range(0, 128, 2)
                        )
                    else:
                        s = sum(raw)
                    if s <= 64:
                        # all-ones table: the q=100 fixed point (clipping
                        # floors every coefficient at 1)
                        return 100
                    scale = (100 * s + _STD_LUMA_SUM // 2) // _STD_LUMA_SUM
                    if scale <= 0:
                        return 100
                    if scale <= 100:
                        est = (200 - scale) // 2
                    else:
                        est = (10000 + scale) // (2 * scale)
                    return max(1, min(100, est))
                q += 1 + width
        pos += 2 + seg_len
    return None


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png_header(payload: bytes | None) -> tuple[int, int, int] | None:
    """Parse a PNG payload's IHDR into (width, height, n_channels); None if
    the payload is not PNG or malformed.

    Real container parse, dependency-free: verify the 8-byte signature,
    require the first chunk to be the mandatory 13-byte IHDR (PNG spec
    orders it first), and read width/height (big-endian u32), bit depth,
    and color type. Like decode_jpeg_header this is the header tier of the
    reference's type-routed dispatch (/root/reference/pcompress.c:205-401);
    the raster stays behind the declared stub (no zlib-inflate + unfilter
    pipeline in-tree)."""
    if not payload or len(payload) < 33 or payload[:8] != _PNG_SIG:
        return None
    if payload[8:12] != b"\x00\x00\x00\x0d" or payload[12:16] != b"IHDR":
        return None
    w = int.from_bytes(payload[16:20], "big")
    h = int.from_bytes(payload[20:24], "big")
    bit_depth = payload[24]
    color_type = payload[25]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if w <= 0 or h <= 0 or channels is None or bit_depth not in (1, 2, 4, 8, 16):
        return None
    return w, h, channels


def decode_mp4_header(payload: bytes | None) -> tuple[int, int, int] | None:
    """Parse an ISO-BMFF (MP4) payload's box tree into (width, height,
    duration_ms); None if the payload is not MP4 or carries no video track
    header before the data boxes.

    Real box walk, dependency-free: verify the first box is 'ftyp', then
    scan top-level boxes for 'moov' and walk its children — 'mvhd' gives
    (timescale, duration) -> duration_ms, 'trak'/'tkhd' gives the track's
    16.16 fixed-point width/height (version 0 and 1 layouts both handled).
    This is the header tier of the reference's type-routed dispatch
    (/root/reference/pcompress.c:205-401): the sample data itself stays
    behind the declared decode stub (no codec in-tree)."""
    if not payload or len(payload) < 16 or payload[4:8] != b"ftyp":
        return None
    n = len(payload)

    def boxes(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            size = int.from_bytes(payload[pos:pos + 4], "big")
            btype = payload[pos + 4:pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize
                if pos + 16 > hi:
                    return
                size = int.from_bytes(payload[pos + 8:pos + 16], "big")
                body = pos + 16
            elif size == 0:  # box extends to end of enclosing space
                size = hi - pos
            if size < body - pos or pos + size > hi:
                return
            yield btype, body, pos + size
            pos += size

    duration_ms = None
    dims = None
    for btype, body, end in boxes(0, n):
        if btype != b"moov":
            continue
        for ctype, cbody, cend in boxes(body, end):
            if ctype == b"mvhd" and cend - cbody >= 20:
                ver = payload[cbody]
                if ver == 1:
                    # a version-1 box shorter than its v1 layout is
                    # malformed — reading it at v0 offsets would return
                    # garbage halves of the 64-bit timestamps as duration
                    if cend - cbody < 32:
                        continue
                    scale = int.from_bytes(payload[cbody + 20:cbody + 24], "big")
                    dur = int.from_bytes(payload[cbody + 24:cbody + 32], "big")
                else:
                    scale = int.from_bytes(payload[cbody + 12:cbody + 16], "big")
                    dur = int.from_bytes(payload[cbody + 16:cbody + 20], "big")
                if scale > 0:
                    duration_ms = dur * 1000 // scale
            elif ctype == b"trak":
                for ttype, tbody, tend in boxes(cbody, cend):
                    if ttype != b"tkhd":
                        continue
                    if tend - tbody < 1:  # header-only box at payload end
                        continue
                    ver = payload[tbody]
                    off = 88 if ver == 1 else 76  # width offset in payload
                    if tend - tbody >= off + 8:
                        w = int.from_bytes(payload[tbody + off:tbody + off + 2], "big")
                        h = int.from_bytes(payload[tbody + off + 4:tbody + off + 6], "big")
                        if w > 0 and h > 0:
                            dims = (w, h)
        break
    if dims is None:
        return None
    return dims[0], dims[1], duration_ms if duration_ms is not None else 0


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor, vectorized over channel lanes (int arrays):
    pick left/up/up-left, whichever is closest to a + b - c."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(payload: bytes | None) -> tuple[np.ndarray, int, int] | None:
    """REAL full PNG raster decode, dependency-free (stdlib zlib): chunk
    walk with CRC verification, IDAT concat + inflate, and scanline
    UNFILTERING (all five filter types: none/sub/up/average/paeth) ->
    (uint8 raster bytes, width, height); None when the payload is not PNG
    or is outside the supported subset (8-bit depth, color types
    0/2/4/6, non-interlaced — palette and Adam7 stay at the header tier).

    This is the image analog of decode_wav/parse_pnm: the strict subset a
    dependency-free in-tree parser can own (reference type-routed filter
    dispatch, /root/reference/pcompress.c:205-401). Per-payload work runs
    inside the Arrow-batched mapInPandas — parallelism comes from Spark
    partitioning across payloads, and the sub/avg/paeth inner loops are
    O(height x width) numpy lane operations."""
    import zlib

    hdr = decode_png_header(payload)
    if hdr is None:
        return None
    w, h, channels = hdr
    bit_depth, color_type = payload[24], payload[25]
    comp, filt, interlace = payload[26], payload[27], payload[28]
    if (bit_depth != 8 or color_type == 3 or comp != 0 or filt != 0
            or interlace != 0):
        return None
    pos, n = 8, len(payload)
    idat: list[bytes] = []
    while pos + 8 <= n:
        length = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        end = pos + 8 + length
        if end + 4 > n:
            return None
        data = payload[pos + 8 : end]
        if zlib.crc32(typ + data) & 0xFFFFFFFF != int.from_bytes(
            payload[end : end + 4], "big"
        ):
            return None
        if typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos = end + 4
    if not idat:
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * channels
    if len(raw) != h * (stride + 1):
        return None
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    bpp = channels  # bytes per pixel at 8-bit depth
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = rows[y, 0]
        line = rows[y, 1:].astype(np.int64)
        if ft == 0:
            cur = line
        elif ft == 1:  # sub: per-lane prefix sum mod 256
            cur = (np.cumsum(line.reshape(w, bpp), axis=0) & 0xFF).reshape(stride)
        elif ft == 2:  # up
            cur = (line + prev) & 0xFF
        elif ft == 3:  # average — sequential in x, vectorized over lanes
            lanes, pv = line.reshape(w, bpp), prev.reshape(w, bpp)
            acc = np.empty_like(lanes)
            left = np.zeros(bpp, dtype=np.int64)
            for x in range(w):
                acc[x] = (lanes[x] + ((left + pv[x]) >> 1)) & 0xFF
                left = acc[x]
            cur = acc.reshape(stride)
        elif ft == 4:  # paeth — sequential in x, vectorized over lanes
            lanes, pv = line.reshape(w, bpp), prev.reshape(w, bpp)
            acc = np.empty_like(lanes)
            left = np.zeros(bpp, dtype=np.int64)
            upleft = np.zeros(bpp, dtype=np.int64)
            for x in range(w):
                acc[x] = (lanes[x] + _paeth(left, pv[x], upleft)) & 0xFF
                left, upleft = acc[x], pv[x].astype(np.int64)
            cur = acc.reshape(stride)
        else:
            return None
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(-1), w, h


_WAV_HEADER_LEN = 44  # canonical PCM header: RIFF + fmt(16) + data chunks


def decode_wav(payload: bytes | None) -> np.ndarray | None:
    """Parse a canonical RIFF/WAVE payload (PCM format 1, mono, 16-bit,
    the fixed 44-byte header layout) into an int16 sample array; None if
    the payload is not canonical WAV. Scope mirrors decode_pnm: the strict
    in-tree subset a dependency-free parser can own (the reference's WAV
    handling likewise only packs plain PCM — wavpack filter dispatch at
    /root/reference/pcompress.c:205-401)."""
    if not payload or len(payload) < _WAV_HEADER_LEN:
        return None
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    if payload[12:16] != b"fmt " or payload[16:20] != b"\x10\x00\x00\x00":
        return None
    fmt = int.from_bytes(payload[20:22], "little")
    channels = int.from_bytes(payload[22:24], "little")
    bits = int.from_bytes(payload[34:36], "little")
    if fmt != 1 or channels != 1 or bits != 16 or payload[36:40] != b"data":
        return None
    data_len = int.from_bytes(payload[40:44], "little")
    if data_len % 2 or len(payload) - _WAV_HEADER_LEN < data_len:
        return None
    return np.frombuffer(payload, dtype="<i2", count=data_len // 2,
                         offset=_WAV_HEADER_LEN)


def amplitude_histogram(samples: np.ndarray, bins: int = FEATURE_DIM) -> np.ndarray:
    """Normalized histogram of the unsigned high byte of each 16-bit
    sample — the audio analog of raster_histogram (same bin geometry, so
    the SQL oracle shares the bin expression)."""
    hi = ((samples.astype(np.int32) + 32768) >> 8).astype(np.uint8)
    return raster_histogram(hi, bins)


def raster_histogram(raster: np.ndarray, bins: int = FEATURE_DIM) -> np.ndarray:
    """Normalized ``bins``-bin histogram of raster bytes (float32) — the
    deterministic image feature. bins must divide 256."""
    shift = (256 // bins).bit_length() - 1   # e.g. 32 bins -> >> 3
    counts = np.bincount(raster >> shift, minlength=bins)[:bins]
    return (counts / max(len(raster), 1)).astype(np.float32)


def _fake_feature(content_hash: np.uint64) -> np.ndarray:
    """Deterministic content-addressed pseudo-feature (the stub decode for
    kinds whose codecs aren't available): seeded by the FULL content hash."""
    seed = np.uint64((int(content_hash) * 2654435761) % (1 << 64))
    h = splitmix64(np.arange(FEATURE_DIM, dtype=np.uint64) + seed)
    return (h.astype(np.float64) / 2**64).astype(np.float32)


def extract_features(
    media: DataFrame,
    decode_stub: bool = True,
    size_bucket_partitions: int | None = None,
) -> DataFrame:
    """media table -> feature rows via mapInPandas (Arrow batches carry the
    binary payload; partitioning is preserved — map-only, no shuffle).

    Routing (the D6 type dispatch): payloads that parse as PNM, canonical
    WAV, or supported PNG (8-bit non-interlaced, zlib inflate + unfilter)
    decode for real (pixel-byte / amplitude histogram, ``decoded=True``,
    header dims populated); JPEG and MP4 payloads — and PNGs outside the
    supported subset — get a REAL header parse (``header_decoded=True``,
    dims populated) with the raster/samples behind the stub; anything else
    uses the content-addressed stub when decode_stub=True or raises
    NotImplementedError otherwise (a real entropy decoder / codec would
    plug in where decode_jpeg_header / decode_mp4_header return).

    ``size_bucket_partitions``: when set, repartitionByRange on payload
    size first, so Arrow batches stay near-uniform in bytes
    (hash_bytes_rows pads each batch to its longest payload — one huge
    payload in a mixed batch pads every lane to its width). Off by default:
    it turns the map-only stage into range-shuffle + map, which only pays
    off when payload sizes are heavy-tailed.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpeg_baseline import decode_baseline

        for pdf in batches:
            payloads = list(pdf["payload"])
            hashes = hash_bytes_rows(payloads)
            feats, decoded, hdr_dec = [], [], []
            hdr_w, hdr_h, jq = [], [], []
            for p, h in zip(payloads, hashes):
                pnm = parse_pnm(p)
                samples = None if pnm is not None else decode_wav(p)
                png = None
                hdr = None
                quality = None
                if pnm is None and samples is None:
                    png = decode_png(p)
                    if png is None:
                        # REAL baseline JPEG decode (jpeg_baseline: DHT
                        # Huffman entropy decode + dequant + exact 8x8
                        # IDCT) — grayscale baseline payloads join the
                        # fully-decoded tier; anything it refuses
                        # (progressive, color, header-only fixtures)
                        # falls through to the header tier below
                        png = decode_baseline(p)
                        if png is not None:
                            quality = jpeg_quality_estimate(p)
                    if png is None:
                        hdr = decode_jpeg_header(p)
                        if hdr is not None:
                            quality = jpeg_quality_estimate(p)
                        if hdr is None:
                            hdr = decode_png_header(p)
                        if hdr is None:
                            hdr = decode_mp4_header(p)
                if pnm is not None or png is not None:
                    raster, w, hh = pnm if pnm is not None else png
                    feats.append(raster_histogram(raster))
                    decoded.append(True)
                    hdr_dec.append(True)
                    hdr_w.append(w)
                    hdr_h.append(hh)
                    jq.append(quality)
                elif samples is not None:
                    feats.append(amplitude_histogram(samples))
                    decoded.append(True)
                    hdr_dec.append(True)
                    hdr_w.append(None)
                    hdr_h.append(None)
                    jq.append(quality)
                elif hdr is not None and decode_stub:
                    # header tier (JPEG SOF / PNG IHDR): real dims, raster
                    # behind the stub — still honors the decode_stub gate
                    w, hh, _ncomp = hdr
                    feats.append(_fake_feature(h))
                    decoded.append(False)
                    hdr_dec.append(True)
                    hdr_w.append(w)
                    hdr_h.append(hh)
                    jq.append(quality)
                elif decode_stub:
                    feats.append(_fake_feature(h))
                    decoded.append(False)
                    hdr_dec.append(False)
                    hdr_w.append(None)
                    hdr_h.append(None)
                    jq.append(quality)
                else:
                    raise NotImplementedError(
                        "no in-tree decoder for this payload (PNM, canonical "
                        "WAV, and JPEG/PNG headers are the bundled parsers; "
                        "pillow/ffmpeg are not available in this container) "
                        "— run with decode_stub=True"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "payload_sha_like": hashes.view(np.int64),
                    "decoded": np.asarray(decoded, dtype=bool),
                    "header_decoded": np.asarray(hdr_dec, dtype=bool),
                    "hdr_width": pd.array(hdr_w, dtype="Int32"),
                    "hdr_height": pd.array(hdr_h, dtype="Int32"),
                    "jpeg_quality": pd.array(jq, dtype="Int32"),
                    "feature": feats,
                }
            )

    src = media.select("media_id", "kind", "payload")
    if size_bucket_partitions:
        from pyspark.sql import functions as F

        src = src.repartitionByRange(
            size_bucket_partitions, F.length("payload")
        )
    return src.mapInPandas(trim_after(_extract), schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# deterministic fixtures (no external data; oracle reads the same parquet)
# ---------------------------------------------------------------------------

def make_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Serialize int16 mono samples as a canonical 44-byte-header WAV."""
    import struct

    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def make_jpeg_header(w: int, h: int, entropy: bytes,
                     progressive: bool = False, quality: int = 75) -> bytes:
    """Serialize a structurally-valid JPEG prefix: SOI + APP0/JFIF (the
    canonical 18-byte segment) + DQT (the Annex K luminance table scaled
    to ``quality`` by the IJG rule: scale = 5000/q for q < 50 else
    200 - 2q; coef = clamp((base*scale + 50)/100, 1, 255)) + SOF0 (or
    SOF2) with the given dimensions, followed by SOS and fake entropy
    bytes + EOI. The header markers are real and parse with any JPEG
    header reader; the entropy data is not a decodable scan (this fixture
    exercises the header tier only). The DQT coefficients are serialized
    in natural order — the sum-ratio quality estimator is
    order-independent, so zigzag fidelity buys nothing here."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(
        [1, 1, 0, 0, 1, 0, 1, 0, 0]
    )
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    coefs = np.clip((_STD_LUMA_QT * scale + 50) // 100, 1, 255).astype(np.uint8)
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + coefs.tobytes()
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    # len=11: 8 fixed + 3 per component (1 component, precision 8)
    sof = sof_marker + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    sos = b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0, 0, 63, 0])
    return b"\xff\xd8" + app0 + dqt + sof + sos + entropy + b"\xff\xd9"


def make_mp4(w: int, h: int, duration_ms: int, entropy: bytes) -> bytes:
    """Serialize a structurally-valid MP4 prefix: ftyp + moov(mvhd + one
    trak/tkhd carrying 16.16 width/height, timescale 1000 so mvhd duration
    IS milliseconds) + mdat with fake sample bytes. The box tree is real
    and parses with any ISO-BMFF reader (fixed layout: tkhd width int16 at
    byte 228, height at 232 — the oracle reads those offsets directly);
    the mdat payload is not decodable media (header-tier fixture only)."""
    import struct

    ftyp = struct.pack(">I", 20) + b"ftypisom" + struct.pack(">I", 0x200) + b"isom"
    mvhd = (struct.pack(">I", 108) + b"mvhd"
            + struct.pack(">BBHIIIII", 0, 0, 0, 0, 0, 1000, duration_ms, 0x10000)
            + struct.pack(">H", 0x100) + bytes(10)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + bytes(24) + struct.pack(">I", 2))
    tkhd = (struct.pack(">I", 92) + b"tkhd"
            + struct.pack(">BBHIIIII", 0, 0, 7, 0, 0, 1, 0, duration_ms)
            + bytes(8) + struct.pack(">HHHH", 0, 0, 0, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16))
    trak = struct.pack(">I", 100) + b"trak" + tkhd
    moov = struct.pack(">I", 216) + b"moov" + mvhd + trak
    mdat = struct.pack(">I", 8 + len(entropy)) + b"mdat" + entropy
    return ftyp + moov + mdat


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def make_png(w: int, h: int, idat: bytes) -> bytes:
    """Serialize a PNG container with the real 8-byte signature and a
    CRC-valid IHDR (8-bit grayscale) around fake (non-zlib) IDAT bytes —
    exercises the header tier only; any PNG header reader parses it, and
    decode_png correctly refuses the undecodable IDAT."""
    import struct

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", idat)
            + _png_chunk(b"IEND", b""))


def make_png_raster(w: int, h: int, raster: np.ndarray) -> bytes:
    """Serialize a REAL decodable 8-bit grayscale PNG: scanlines are
    filtered (type cycling 0..4 by row, exercising every unfilter path in
    decode_png), deflate-compressed into IDAT, all chunks CRC-valid."""
    import struct
    import zlib

    arr = np.asarray(raster, dtype=np.uint8).reshape(h, w)
    lines: list[bytes] = []
    prev = np.zeros(w, dtype=np.int64)
    for y in range(h):
        cur = arr[y].astype(np.int64)
        left = np.concatenate(([0], cur[:-1]))
        ft = y % 5
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = (cur - left) & 0xFF
        elif ft == 2:
            enc = (cur - prev) & 0xFF
        elif ft == 3:
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        else:
            upleft = np.concatenate(([0], prev[:-1]))
            enc = (cur - _paeth(left, prev, upleft)) & 0xFF
        lines.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", idat)
            + _png_chunk(b"IEND", b""))


def generate_media_pdf(n: int = 64, seed: int = 42) -> pd.DataFrame:
    """Deterministic fake media table: image payloads are VALID binary PGM
    (P5) files with the canonical header 'P5\\n{w} {h}\\n255\\n'; audio
    payloads are VALID canonical WAV (PCM-16 mono); jpeg payloads carry
    REAL SOI/APP0/SOF0 markers (header-parseable dimensions) over fake
    entropy data; png payloads are FULLY decodable PNGs (real deflate +
    cycling scanline filters) whose raster follows the splitmix rule
    documented at the generation site; video payloads carry a REAL
    ISO-BMFF box tree (ftyp/moov/mvhd/trak/tkhd — header-parseable dims +
    duration) over fake mdat sample bytes (raster/codec tier stays the
    declared stub)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    kinds = ["image", "audio", "video", "jpeg", "png", "jpeg_full"]
    rows = []
    for i in range(n):
        kind = kinds[i % len(kinds)]
        if kind == "image":
            w = int(rng.integers(16, 64))
            h = int(rng.integers(16, 64))
            raster = rng.integers(0, 256, size=w * h, dtype=np.uint8)
            payload = f"P5\n{w} {h}\n255\n".encode("ascii") + raster.tobytes()
            rows.append((i, kind, "image/x-portable-graymap", payload, w, h, None))
        elif kind == "audio":
            ns = int(rng.integers(64, 1024))
            samples = rng.integers(-32768, 32768, size=ns).astype("<i2")
            payload = make_wav(samples)
            rows.append((i, kind, "audio/wav", payload,
                         None, None, int(ns * 1000 / 8000)))
        elif kind == "jpeg":
            w = int(rng.integers(32, 4096))
            h = int(rng.integers(32, 4096))
            ent = bytes(rng.integers(1, 255, size=int(rng.integers(64, 1024)),
                                     dtype=np.uint8))
            # varying IJG quality so the DQT-derived estimate is a real
            # per-row feature, not a constant
            payload = make_jpeg_header(w, h, ent,
                                       quality=int(rng.integers(30, 96)))
            rows.append((i, kind, "image/jpeg", payload, w, h, None))
        elif kind == "jpeg_full":
            # REAL decodable baseline JPEG (jpeg_baseline.encode_baseline:
            # DCT + quality-scaled quantization + canonical Huffman). The
            # raster is 8x8-BLOCK-CONSTANT with block j's level following
            # the documented splitmix rule v[j] = splitmix64(
            # media_id * 2^24 + j) & 0xFF — a constant block carries only
            # a DC coefficient, so the decode roundtrip has the closed
            # form v' = clamp(floor(floor(8(v-128)/q00 + .5 + 2^-20) *
            # q00 / 8 + 128.5 + 2^-20)) and the DuckDB oracle recomputes
            # the expected histogram from (media_id, dims, q00-from-DQT)
            # alone — while the engine must run the full entropy decode +
            # IDCT to reproduce it
            from .jpeg_baseline import encode_baseline

            nbx = int(rng.integers(2, 6))
            nby = int(rng.integers(2, 6))
            w, h = nbx * 8, nby * 8
            base = np.uint64(i) * np.uint64(1 << 24)
            bv = (
                splitmix64(np.arange(nbx * nby, dtype=np.uint64) + base)
                & np.uint64(0xFF)
            ).astype(np.uint8).reshape(nby, nbx)
            raster = np.repeat(np.repeat(bv, 8, axis=0), 8, axis=1)
            payload = encode_baseline(raster, int(rng.integers(30, 96)))
            rows.append((i, kind, "image/jpeg", payload, w, h, None))
        elif kind == "png":
            # REAL decodable PNG: the raster is derived from media_id by
            # the documented splitmix rule raster[j] = splitmix64(
            # media_id * 2^24 + j) & 0xFF, so the DuckDB oracle can
            # recompute the expected histogram from (media_id, w, h) alone
            # while the engine must invert real deflate + scanline
            # filtering to reproduce it
            w = int(rng.integers(8, 32))
            h = int(rng.integers(8, 32))
            base = np.uint64(i) * np.uint64(1 << 24)
            raster = (
                splitmix64(np.arange(w * h, dtype=np.uint64) + base)
                & np.uint64(0xFF)
            ).astype(np.uint8)
            payload = make_png_raster(w, h, raster)
            rows.append((i, kind, "image/png", payload, w, h, None))
        else:  # video: REAL ISO-BMFF box tree (ftyp/moov/mvhd/trak/tkhd),
            # header-parseable dims + duration; mdat bytes are fake samples
            w = int(rng.integers(160, 4096))
            h = int(rng.integers(120, 2160))
            dur = int(rng.integers(1000, 60000))
            ent = bytes(rng.integers(0, 256,
                                     size=int(rng.integers(64, 2048)),
                                     dtype=np.uint8))
            payload = make_mp4(w, h, dur, ent)
            rows.append((i, kind, "video/mp4", payload, w, h, dur))
    return pd.DataFrame(
        rows,
        columns=["media_id", "kind", "mime", "payload", "width", "height",
                 "duration_ms"],
    )


def media_fixture_path(n: int = 64, seed: int = 42) -> str:
    """Write (once) the deterministic media fixture as parquet under the
    repo .cache and return the file path — the single source both the Spark
    query and the DuckDB oracle read."""
    from ..sources.tables import CACHE_DIR

    # v8: adds the jpeg_full kind — REAL decodable baseline JPEGs
    # (entropy decode + IDCT tier, closed-form oracle rule)
    out_dir = os.path.join(CACHE_DIR, f"media_v8_n{n}_s{seed}")
    path = os.path.join(out_dir, "media.parquet")
    if not os.path.exists(path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(out_dir, exist_ok=True)
        pdf = generate_media_pdf(n, seed)
        schema = pa.schema([
            ("media_id", pa.int64()), ("kind", pa.string()),
            ("mime", pa.string()), ("payload", pa.binary()),
            ("width", pa.int32()), ("height", pa.int32()),
            ("duration_ms", pa.int64()),
        ])
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(pdf, schema=schema), tmp)
        os.replace(tmp, path)
    return path


def load_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    return spark.read.parquet(media_fixture_path(n, seed))


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (in-memory variant)."""
    pdf = generate_media_pdf(n, seed)
    rows = [tuple(None if pd.isna(v) else v for v in r)
            for r in pdf.itertuples(index=False)]
    rows = [
        (int(r[0]), r[1], r[2], r[3],
         None if r[4] is None else int(r[4]),
         None if r[5] is None else int(r[5]),
         None if r[6] is None else int(r[6]))
        for r in rows
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
