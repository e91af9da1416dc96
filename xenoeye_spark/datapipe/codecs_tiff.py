"""Pure-numpy baseline TIFF decoder (and a minimal test encoder) —
uncompressed (Compression=1) 8-bit grayscale/RGB, both byte orders
('II' little / 'MM' big), strip layout with any RowsPerStrip. Public
spec: TIFF 6.0 (Adobe). Like BMP/PPM this is a header walk over raw
sample bytes — the IFD (tag directory) is the only structure.

LZW/PackBits/JPEG-in-TIFF compression, tiles, and bit depths != 8
raise NotImplementedError (the honest boundary); planar configuration
2 decodes (r11 — strips are plane-major per TIFF 6.0 §"Planar
Configuration", so the concatenated strip bytes are spp contiguous
HxW planes, one transpose from chunky); extra channels (alpha) are
dropped to the HxWx3 contract.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I"}


def _read_ifd(data: bytes, endian: str) -> dict[int, list[int]]:
    (off,) = struct.unpack_from(endian + "I", data, 4)
    (n,) = struct.unpack_from(endian + "H", data, off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(endian + "HHI", data, base)
        if typ not in _TYPE_FMT:
            continue                      # rationals etc.: not needed
        size = _TYPE_SIZE[typ] * cnt
        if size <= 4:
            vals = struct.unpack_from(
                endian + _TYPE_FMT[typ] * cnt, data, base + 8
            )
        else:
            (voff,) = struct.unpack_from(endian + "I", data, base + 8)
            vals = struct.unpack_from(
                endian + _TYPE_FMT[typ] * cnt, data, voff
            )
        tags[tag] = list(vals)
    return tags


def decode_tiff(data: bytes) -> np.ndarray:
    """Decode an uncompressed 8-bit TIFF to (H, W, 3) uint8 RGB."""
    if data[:2] == b"II":
        endian = "<"
    elif data[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("not a TIFF (no II/MM order mark)")
    (magic,) = struct.unpack_from(endian + "H", data, 2)
    if magic != 42:
        raise ValueError("not a TIFF (magic != 42)")
    tags = _read_ifd(data, endian)
    w = tags[_TAG_WIDTH][0]
    h = tags[_TAG_HEIGHT][0]
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    if comp != 1:
        raise NotImplementedError(
            f"compressed TIFF (Compression={comp}) needs codec logic "
            "beyond raw strips"
        )
    planar = tags.get(_TAG_PLANAR, [1])[0]
    if planar not in (1, 2):
        raise ValueError(f"bad PlanarConfiguration {planar}")
    spp = tags.get(_TAG_SPP, [1])[0]
    bits = tags.get(_TAG_BITS, [8])
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"{bits}-bit TIFF")
    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags.get(
        _TAG_STRIP_COUNTS, [w * h * spp]
    )
    raw = b"".join(
        data[o:o + c] for o, c in zip(offsets, counts)
    )
    if len(raw) < w * h * spp:
        raise ValueError(
            f"truncated TIFF strips: {len(raw)} < {w * h * spp}"
        )
    if planar == 2 and spp > 1:
        # strips are stored plane after plane (TIFF 6.0), so the
        # concatenated bytes are spp contiguous HxW planes
        px = np.transpose(
            np.frombuffer(raw, dtype=np.uint8, count=w * h * spp)
            .reshape(spp, h, w),
            (1, 2, 0),
        )
    else:
        px = np.frombuffer(
            raw, dtype=np.uint8, count=w * h * spp
        ).reshape(h, w, spp)
    if spp == 1:
        g = px[:, :, 0]
        photometric = tags.get(_TAG_PHOTOMETRIC, [1])[0]
        if photometric == 0:              # WhiteIsZero: invert
            g = 255 - g
        return np.stack([g, g, g], axis=2)
    return px[:, :, :3].copy()            # drop alpha channels


def encode_tiff(
    img: np.ndarray, endian: str = "<", rows_per_strip: int | None = None,
    planar: int = 1,
) -> bytes:
    """Minimal uncompressed TIFF writer (tests only): 8-bit gray
    (H, W) or RGB (H, W, 3), strip-per-``rows_per_strip`` (default:
    one strip), either byte order; ``planar=2`` (r11) writes
    plane-major strips (each plane split on the same rows_per_strip,
    planes back to back) so the planar decode path round-trips."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w = img.shape
        spp = 1
    else:
        h, w, spp = img.shape
    if planar not in (1, 2):
        raise ValueError(f"planar must be 1 or 2, got {planar}")
    rps = rows_per_strip or h
    if planar == 2 and spp > 1:
        planes = np.transpose(img, (2, 0, 1))      # (spp, h, w)
        strips = [
            planes[p, y:y + rps].tobytes()
            for p in range(spp) for y in range(0, h, rps)
        ]
    else:
        planar = 1
        strips = [
            img[y:y + rps].tobytes() for y in range(0, h, rps)
        ]

    entries = []        # (tag, type, count, value_or_bytes)
    hdr = (b"II" if endian == "<" else b"MM") + struct.pack(
        endian + "HI", 42, 8
    )
    # layout: header(8) | IFD | out-of-line values | strip data
    def ifd_bytes(n):
        return 2 + 12 * n + 4

    tag_list = [
        (_TAG_WIDTH, 3, [w]),
        (_TAG_HEIGHT, 3, [h]),
        (_TAG_BITS, 3, [8] * spp),
        (_TAG_COMPRESSION, 3, [1]),
        (_TAG_PHOTOMETRIC, 3, [2 if spp == 3 else 1]),
        (_TAG_STRIP_OFFSETS, 4, None),    # filled below
        (_TAG_SPP, 3, [spp]),
        (_TAG_ROWS_PER_STRIP, 3, [rps]),
        (_TAG_STRIP_COUNTS, 4, [len(s) for s in strips]),
        (_TAG_PLANAR, 3, [planar]),
    ]
    n = len(tag_list)
    extra = bytearray()
    extra_base = 8 + ifd_bytes(n)

    def place(typ, vals):
        size = _TYPE_SIZE[typ] * len(vals)
        packed = struct.pack(endian + _TYPE_FMT[typ] * len(vals), *vals)
        if size <= 4:
            return packed + b"\x00" * (4 - size)
        off = extra_base + len(extra)
        extra.extend(packed)
        return struct.pack(endian + "I", off)

    # strip data goes after the extra block; compute offsets in two
    # passes (extra grows as we place multi-value tags)
    # first pass: place everything except offsets to learn extra size
    tmp_extra_len = 0
    for tag, typ, vals in tag_list:
        if vals is None:
            vals = [0] * len(strips)
        size = _TYPE_SIZE[typ] * len(vals)
        if size > 4:
            tmp_extra_len += size
    data_base = extra_base + tmp_extra_len
    offs = []
    pos = data_base
    for s in strips:
        offs.append(pos)
        pos += len(s)

    ifd = struct.pack(endian + "H", n)
    for tag, typ, vals in tag_list:
        if tag == _TAG_STRIP_OFFSETS:
            vals = offs
        ifd += struct.pack(endian + "HHI", tag, typ, len(vals))
        ifd += place(typ, vals)
    ifd += struct.pack(endian + "I", 0)   # next-IFD pointer
    assert len(extra) == tmp_extra_len
    return hdr + ifd + bytes(extra) + b"".join(strips)
