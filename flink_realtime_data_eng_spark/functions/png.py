"""Minimal, real PNG codec — pure stdlib (zlib + struct), no PIL.

Upgrades one branch of the multimodal decode stub to a GENUINE codec
path: 8-bit grayscale, non-interlaced PNG encode/decode, implementing
the actual file format (signature, chunk framing + CRC32, IHDR/IDAT/
IEND, zlib-compressed scanlines, all five scanline filter types on
decode). Color/interlaced images and other formats stay stubbed —
documented, not hidden.

Scope is deliberate: the point at 100 TB is the PLUMBING (binary
columns + Arrow-batched mapInPandas decode); this module proves the
decode slot holds a real decoder, not only the deterministic fake.
Swapping in PIL widens format coverage without touching the operator.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_gray(rows: list[bytes], filter_type: int = 0) -> bytes:
    """Encode 8-bit grayscale rows (equal length) as a real PNG.

    ``filter_type`` applies one scanline filter to every row (0=None,
    1=Sub, 2=Up) — used by tests to exercise the decoder's un-filtering;
    production encode keeps 0.
    """
    if not rows:
        raise ValueError("need at least one row")
    width, height = len(rows[0]), len(rows)
    if any(len(r) != width for r in rows):
        raise ValueError("ragged rows")
    if filter_type not in (0, 1, 2):
        raise ValueError(f"unsupported encode filter {filter_type}")
    raw = bytearray()
    prev = bytes(width)
    for r in rows:
        raw.append(filter_type)
        if filter_type == 0:
            raw += r
        elif filter_type == 1:  # Sub: delta vs left neighbor
            raw += bytes((r[i] - (r[i - 1] if i else 0)) & 0xFF
                         for i in range(width))
        else:                   # Up: delta vs row above
            raw += bytes((r[i] - prev[i]) & 0xFF for i in range(width))
        prev = r
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_gray(payload: bytes) -> list[bytes]:
    """Decode an 8-bit grayscale non-interlaced PNG into pixel rows.

    Real decoding: chunk walk with CRC verification, zlib inflate,
    scanline un-filtering for all five PNG filter types (bpp=1).
    Raises ValueError on anything outside the supported profile —
    loud, never a silently wrong image.
    """
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, width, height, idat = 8, None, None, bytearray()
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if (depth, color, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG profile (need 8-bit grayscale, "
                    f"non-interlaced); got depth={depth} color={color} "
                    f"interlace={interlace}")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (width + 1) * height:
        raise ValueError("IDAT size mismatch")
    rows: list[bytes] = []
    prev = bytes(width)
    for y in range(height):
        line = raw[y * (width + 1):(y + 1) * (width + 1)]
        ftype, data = line[0], line[1:]
        out = bytearray(width)
        for i in range(width):
            left = out[i - 1] if i else 0
            up = prev[i]
            ul = prev[i - 1] if i else 0
            x = data[i]
            if ftype == 0:
                v = x
            elif ftype == 1:
                v = x + left
            elif ftype == 2:
                v = x + up
            elif ftype == 3:
                v = x + (left + up) // 2
            elif ftype == 4:
                v = x + _paeth(left, up, ul)
            else:
                raise ValueError(f"bad filter type {ftype}")
            out[i] = v & 0xFF
        rows.append(bytes(out))
        prev = bytes(out)
    return rows
