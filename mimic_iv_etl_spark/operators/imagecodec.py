"""Pure-stdlib image codecs: PNG (8-bit gray/RGB/RGBA) and BMP (24-bit).

De-stubs the media pipeline's decode step (VERDICT r04 item 8): the runtime
ships no image libraries, but PNG is zlib + byte filters and BMP is a plain
header + pixel array — both fully decodable with ``zlib``/``struct``/numpy
alone, all public formats (PNG: RFC 2083; BMP: the Windows DIB layout).

This is a CORRECTNESS reference codec, not a throughput path: the scanline
un-filtering is a per-row Python loop (Sub/Paeth are sequential in x by
definition). Production deployments plug a native codec callable into
:func:`mimic_iv_etl_spark.operators.multimodal.decode_media`; the Spark-side
plumbing (mapInPandas, Arrow batch bounds, schema) is identical either way.
Scale shape is unchanged: decode cost is per-row CPU inside an Arrow batch,
embarrassingly parallel across partitions.

Supported PNG subset: bit depth 8, color types 0 (gray), 2 (RGB), 4
(gray+alpha), 6 (RGBA), no interlace. Anything else raises ``ValueError``
loudly — silent wrong pixels are worse than an error.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0 rows, one zlib IDAT) for uint8 arrays of
    shape (h, w) gray, (h, w, 3) RGB, or (h, w, 4) RGBA. Deterministic —
    fixture generators rely on byte-stable output."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 9)) + chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG → uint8 array (h, w, channels). Subset per module docstring."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), tag = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        expect = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != expect:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or color_type not in _CHANNELS or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color_type={color_type} "
                    f"interlace={interlace}); codec handles 8-bit non-interlaced "
                    "gray/RGB/±alpha only")
            c = _CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1).astype(np.int32)
        if ftype == 0:
            pass
        elif ftype == 2:  # Up — whole-row vectorized
            row = row + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth — sequential in x
            for x in range(stride):
                a = row[x - c] if x >= c else 0
                b = int(prev[x])
                if ftype == 1:
                    row[x] += a
                elif ftype == 3:
                    row[x] += (a + b) // 2
                else:
                    cc = int(prev[x - c]) if x >= c else 0
                    row[x] += _paeth(int(a), b, cc)
                row[x] &= 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        prev = out[y] = (row & 0xFF).astype(np.uint8)
    return out.reshape(h, w, c)


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → uint8 array (h, w, 3) in RGB order."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP: bad signature")
    pixel_off = struct.unpack("<I", data[10:14])[0]
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    compression = struct.unpack("<I", data[30:34])[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP (bpp={bpp} compression={compression}); codec "
            "handles 24-bit uncompressed only")
    flipped = h > 0  # positive height = bottom-up row order
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    if len(data) < pixel_off + stride * h:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(
        data, np.uint8, stride * h, pixel_off).reshape(h, stride)
    px = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return (px[::-1] if flipped else px).copy()


def decode_image(data: bytes) -> np.ndarray:
    """Sniff PNG/BMP by magic and decode to uint8 (h, w, channels)."""
    if data is None or len(data) < 2:
        raise ValueError("empty media content")
    if data[:8] == PNG_SIG:
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    raise ValueError("unrecognized image format (PNG and 24-bit BMP supported)")


def image_decoder(content: bytes) -> list[float]:
    """Real decode + feature-extract for :func:`decode_media`: 8 floats
    ``[width, height, channels, mean, std, min, max, gradient_energy]``
    computed over the DECODED pixels (gradient_energy = mean |horizontal
    difference|, a first-order texture statistic). Deterministic; raises
    ``ValueError`` on undecodable bytes — a corrupt object in a media column
    should fail the row's batch loudly, not fabricate features."""
    px = decode_image(content).astype(np.float64)
    grad = float(np.abs(np.diff(px, axis=1)).mean()) if px.shape[1] > 1 else 0.0
    return [
        float(px.shape[1]),
        float(px.shape[0]),
        float(px.shape[2]),
        float(px.mean()),
        float(px.std()),
        float(px.min()),
        float(px.max()),
        grad,
    ]
