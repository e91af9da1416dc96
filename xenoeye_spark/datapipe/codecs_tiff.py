"""Pure-numpy baseline TIFF decoder (and a minimal test encoder) —
uncompressed (Compression=1) 8-bit grayscale/RGB, both byte orders
('II' little / 'MM' big), strip layout with any RowsPerStrip. Public
spec: TIFF 6.0 (Adobe). Like BMP/PPM this is a header walk over raw
sample bytes — the IFD (tag directory) is the only structure.

Compression: none (1), PackBits (32773 — the §9 RLE) and LZW (5 —
the §13 MSB-first variable-width code stream with the mandated
"early change"), each decompressed strip-by-strip; the horizontal
differencing predictor (tag 317 = 2) that LZW commonly pairs with
undoes as a per-row per-channel cumulative sum (all r11; JPEG-in-TIFF
and tiles still raise — the honest boundary). Planar configuration 2
decodes (r11 — strips are plane-major per TIFF 6.0 §"Planar
Configuration", so the concatenated strip bytes are spp contiguous
HxW planes, one transpose from chunky); bit depths != 8 raise;
extra channels (alpha) are dropped to the HxWx3 contract.
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

_TAG_PREDICTOR = 317

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I"}


def _unpackbits(src: bytes, expected: int) -> bytes:
    """TIFF §9 PackBits: n in 0..127 copies n+1 literals, n in
    129..255 repeats the next byte 257-n times, 128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(src) and len(out) < expected:
        n = src[i]
        i += 1
        if n < 128:
            out += src[i:i + n + 1]
            i += n + 1
        elif n > 128:
            out += src[i:i + 1] * (257 - n)
            i += 1
    if len(out) < expected:
        raise ValueError("truncated PackBits strip")
    return bytes(out[:expected])


def _unlzw(src: bytes, expected: int) -> bytes:
    """TIFF §13 LZW: MSB-first variable-width codes, Clear=256,
    EOI=257, first entry 258, code width grows at 511/1023/2047 one
    code EARLY (the spec-mandated 'early change')."""
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    buf = nbits = 0
    i = 0

    def reset():
        nonlocal table, width, prev
        table = [bytes([b]) for b in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while len(out) < expected:
        while nbits < width:
            if i >= len(src):
                raise ValueError("truncated LZW strip")
            buf = (buf << 8) | src[i]
            nbits += 8
            i += 1
        nbits -= width
        code = (buf >> nbits) & ((1 << width) - 1)
        buf &= (1 << nbits) - 1
        if code == 256:                           # Clear
            reset()
            continue
        if code == 257:                           # EOI
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW code")
        out += entry
        prev = entry
        # early change, decoder side: the decoder's table lags the
        # encoder's by ONE entry (the encoder adds an entry per
        # emitted code; the decoder adds one per code RECEIVED after
        # the first), so it widens at 2^w - 2 where the encoder
        # widens at 2^w - 1 (libtiff's convention)
        if len(table) + 2 >= (1 << width) and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError("truncated LZW strip")
    return bytes(out[:expected])


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
    if comp not in (1, 5, 32773):
        raise NotImplementedError(
            f"compressed TIFF (Compression={comp}) needs codec logic "
            "beyond raw/PackBits/LZW strips"
        )
    predictor = tags.get(_TAG_PREDICTOR, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
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
    if comp == 1:
        raw = b"".join(
            data[o:o + c] for o, c in zip(offsets, counts)
        )
    else:
        # strips decompress independently; each covers rows_per_strip
        # rows (the last one fewer) of one plane (planar) or of the
        # whole chunky image
        rps = tags.get(_TAG_ROWS_PER_STRIP, [h])[0]
        if rps <= 0:
            raise ValueError(f"bad RowsPerStrip {rps}")
        per_plane = -(-h // rps)
        n_expect = per_plane * (spp if planar == 2 and spp > 1 else 1)
        if len(offsets) != n_expect:
            # corrupt StripOffsets would otherwise drive `rows` <= 0
            # below and yield silently-empty decompressed pieces
            raise ValueError(
                f"corrupt TIFF: {len(offsets)} strips, expected "
                f"{n_expect} (RowsPerStrip={rps}, h={h}, planar={planar})"
            )
        row_bytes = w * (1 if planar == 2 and spp > 1 else spp)
        pieces = []
        un = _unlzw if comp == 5 else _unpackbits
        for si, (o, c) in enumerate(zip(offsets, counts)):
            rows = min(rps, h - (si % per_plane) * rps)
            pieces.append(un(data[o:o + c], rows * row_bytes))
        raw = b"".join(pieces)
    if predictor == 2:
        # horizontal differencing: undo with a per-row per-channel
        # cumulative sum mod 256
        ch = 1 if planar == 2 and spp > 1 else spp
        arr = np.frombuffer(
            raw, dtype=np.uint8, count=(len(raw) // (w * ch)) * w * ch
        ).reshape(-1, w, ch)
        raw = (
            np.cumsum(arr.astype(np.int64), axis=1) % 256
        ).astype(np.uint8).tobytes()
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


def _packbits(src: bytes) -> bytes:
    """PackBits compressor (tests only): replicate runs >= 2, literal
    blocks up to 128 bytes, never the 128 no-op."""
    out = bytearray()
    i = 0
    while i < len(src):
        j = i
        while j + 1 < len(src) and src[j + 1] == src[i] and j - i < 126:
            j += 1
        if j > i:
            out.append(257 - (j - i + 1))
            out.append(src[i])
            i = j + 1
            continue
        k = i
        while (k < len(src) and k - i < 128
               and not (k + 2 < len(src)
                        and src[k] == src[k + 1] == src[k + 2])):
            k += 1
        out.append(k - i - 1)
        out += src[i:k]
        i = k
    return bytes(out)


def _lzw(src: bytes) -> bytes:
    """TIFF LZW compressor (tests only): Clear first, one table entry
    per emitted code, width grows at 2^w - 1 (early change), Clear
    again before the table could overflow, EOI last."""
    out = bytearray()
    buf = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((buf >> nbits) & 0xFF)
            buf &= (1 << nbits) - 1

    def fresh() -> dict[bytes, int]:
        return {bytes([b]): b for b in range(256)}

    table = fresh()
    next_code, width = 258, 9
    put(256, width)                               # Clear
    w = b""
    for bv in src:
        wc = w + bytes([bv])
        if wc in table:
            w = wc
            continue
        put(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1                            # early change
        if next_code == 4093:
            put(256, width)                       # Clear before overflow
            table = fresh()
            next_code, width = 258, 9
        w = bytes([bv])
    if w:
        put(table[w], width)
    put(257, width)                               # EOI
    if nbits:
        put(0, 8 - nbits)                         # pad to a byte
    return bytes(out)


def encode_tiff(
    img: np.ndarray, endian: str = "<", rows_per_strip: int | None = None,
    planar: int = 1, compression: int = 1, predictor: int = 1,
) -> bytes:
    """Minimal TIFF writer (tests only): 8-bit gray (H, W) or RGB
    (H, W, 3), strip-per-``rows_per_strip`` (default: one strip),
    either byte order; ``planar=2`` (r11) writes plane-major strips
    (each plane split on the same rows_per_strip, planes back to
    back); ``compression`` 1/5/32773 (none/LZW/PackBits, r11) applied
    per strip, with ``predictor=2`` horizontal differencing before
    the compressor — so every decode path round-trips."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w = img.shape
        spp = 1
    else:
        h, w, spp = img.shape
    if planar not in (1, 2):
        raise ValueError(f"planar must be 1 or 2, got {planar}")
    if compression not in (1, 5, 32773):
        raise ValueError(f"compression must be 1/5/32773: {compression}")
    if predictor not in (1, 2):
        raise ValueError(f"predictor must be 1 or 2: {predictor}")
    rps = rows_per_strip or h

    def prep(a: np.ndarray, ch: int) -> bytes:
        a = a.reshape(a.shape[0], w, ch).astype(np.int64)
        if predictor == 2:
            d = a.copy()
            d[:, 1:, :] = (a[:, 1:, :] - a[:, :-1, :]) % 256
            a = d
        b = a.astype(np.uint8).tobytes()
        if compression == 5:
            return _lzw(b)
        if compression == 32773:
            return _packbits(b)
        return b

    if planar == 2 and spp > 1:
        planes = np.transpose(img, (2, 0, 1))      # (spp, h, w)
        strips = [
            prep(planes[p, y:y + rps], 1)
            for p in range(spp) for y in range(0, h, rps)
        ]
    else:
        planar = 1
        strips = [
            prep(img[y:y + rps], spp) for y in range(0, h, rps)
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
        (_TAG_COMPRESSION, 3, [compression]),
        (_TAG_PHOTOMETRIC, 3, [2 if spp == 3 else 1]),
        (_TAG_STRIP_OFFSETS, 4, None),    # filled below
        (_TAG_SPP, 3, [spp]),
        (_TAG_ROWS_PER_STRIP, 3, [rps]),
        (_TAG_STRIP_COUNTS, 4, [len(s) for s in strips]),
        (_TAG_PLANAR, 3, [planar]),
    ]
    if predictor == 2:
        tag_list.append((_TAG_PREDICTOR, 3, [2]))
    tag_list.sort()                     # TIFF requires ascending tags
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
