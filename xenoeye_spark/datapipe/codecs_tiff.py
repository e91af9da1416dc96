"""Pure-numpy baseline TIFF decoder (and a minimal test encoder) —
uncompressed (Compression=1) 8-bit grayscale/RGB, both byte orders
('II' little / 'MM' big), strip layout with any RowsPerStrip. Public
spec: TIFF 6.0 (Adobe). Like BMP/PPM this is a header walk over raw
sample bytes — the IFD (tag directory) is the only structure.

Compression: none (1), PackBits (32773 — the §9 RLE), LZW (5 —
the §13 MSB-first variable-width code stream with the mandated
"early change") and Adobe Deflate (8 / legacy 32946 — one zlib
stream per segment, r12), each decompressed strip-by-strip; the
horizontal differencing predictor (tag 317 = 2) that LZW/Deflate
commonly pair with undoes as a per-row per-channel cumulative sum
(all r11). New in r12: the TILE layout (§15 — padded TileWidth x
TileLength grid, raster order, one grid per plane when planar) for
all of the above, new-style JPEG-in-TIFF (Compression=7, TIFF 6.0
Supplement 2 / Technote 2): each strip/tile is an independent JPEG
stream decoded by ``codecs_jpeg``, with the shared-tables JPEGTables
(347) merge — 16-bit samples (either byte order, predictor
differencing per 16-bit sample per §14), stripped to the high byte
for the HxWx3 uint8 contract — and BILEVEL scans (BitsPerSample=1):
raw packed bits, T.4 Modified Huffman 1-D fax (Compression=2) and
T.6 Group 4 2-D fax (4) via ``codecs_ccitt``, the formats scanned
documents actually ship in.
Planar configuration 2 decodes (r11 — strips are plane-major per
TIFF 6.0 §"Planar Configuration", so the concatenated strip bytes
are spp contiguous HxW planes, one transpose from chunky); bit
depths != 8 and old-style JPEG (Compression=6) raise; extra
channels (alpha) are dropped to the HxWx3 contract.
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
_TAG_TILE_WIDTH = 322
_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325
_TAG_JPEG_TABLES = 347

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 7: "B"}


def _undeflate(src: bytes, expected: int) -> bytes:
    """Adobe Deflate (Compression=8; 32946 is the older ZIP code):
    each strip/tile is one zlib stream."""
    import zlib
    try:
        out = zlib.decompress(src)
    except zlib.error as e:
        raise ValueError(f"corrupt Deflate strip: {e}") from None
    if len(out) < expected:
        raise ValueError("truncated Deflate strip")
    return out[:expected]


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
    """Decode a 1-, 8- or 16-bit TIFF to (H, W, 3) uint8 RGB — strip
    or tile layout, Compression 1/2/4/5/32773/8/32946/7 (raw / MH fax
    / G4 fax / LZW / PackBits / Deflate / new-style JPEG per the TIFF
    6.0 Supplement 2 + Technote 2 JPEGTables scheme), chunky or
    planar, either byte order; 16-bit samples strip to the high
    byte, bilevel scans map through the fax polarity."""
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
    if comp == 6:
        raise NotImplementedError(
            "old-style JPEG-in-TIFF (Compression=6, the withdrawn "
            "TIFF 6.0 §22 scheme) — only new-style (7) is supported"
        )
    if comp not in (1, 2, 3, 4, 5, 32773, 7, 8, 32946):
        raise NotImplementedError(
            f"compressed TIFF (Compression={comp}) needs codec logic "
            "beyond raw/PackBits/LZW/Deflate/JPEG/CCITT"
        )
    predictor = tags.get(_TAG_PREDICTOR, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    planar = tags.get(_TAG_PLANAR, [1])[0]
    if planar not in (1, 2):
        raise ValueError(f"bad PlanarConfiguration {planar}")
    spp = tags.get(_TAG_SPP, [1])[0]
    bits = tags.get(_TAG_BITS, [8])
    photometric = tags.get(_TAG_PHOTOMETRIC, [1])[0]
    if all(b == 1 for b in bits) and spp == 1:
        # r12: bilevel — raw packed bits, MH fax (2) or G4 fax (4)
        return _decode_tiff_bilevel(data, tags, w, h, comp, photometric)
    if comp in (2, 3, 4):
        raise NotImplementedError(
            f"CCITT TIFF (Compression={comp}) requires BitsPerSample=1"
        )
    if all(b == 8 for b in bits):
        bps = 1
    elif all(b == 16 for b in bits):
        bps = 2                  # r12: 16-bit samples, high-byte strip
    else:
        raise NotImplementedError(f"{bits}-bit TIFF")
    if comp == 7:
        if bps != 1:
            raise NotImplementedError("16-bit JPEG-in-TIFF")
        return _decode_tiff_jpeg(data, tags, endian, w, h, spp,
                                 planar, photometric)
    if _TAG_TILE_OFFSETS in tags:
        px = _decode_tiff_tiles(data, tags, w, h, spp, planar, comp,
                                predictor, bps, endian)
        if spp == 1:
            g = px[:, :, 0]
            if photometric == 0:          # WhiteIsZero: invert
                g = 255 - g
            return np.stack([g, g, g], axis=2)
        return px[:, :, :3].copy()
    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags.get(
        _TAG_STRIP_COUNTS, [w * h * spp * bps]
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
        row_bytes = w * (1 if planar == 2 and spp > 1 else spp) * bps
        pieces = []
        un = (_unlzw if comp == 5 else _undeflate
              if comp in (8, 32946) else _unpackbits)
        for si, (o, c) in enumerate(zip(offsets, counts)):
            rows = min(rps, h - (si % per_plane) * rps)
            pieces.append(un(data[o:o + c], rows * row_bytes))
        raw = b"".join(pieces)
    sdt = np.uint8 if bps == 1 else np.dtype(endian + "u2")
    if predictor == 2:
        # horizontal differencing: undo with a per-row per-channel
        # cumulative sum mod 2^bits (per 16-bit SAMPLE, not per byte,
        # when bps == 2 — TIFF 6.0 §14)
        ch = 1 if planar == 2 and spp > 1 else spp
        nsamp = (len(raw) // (w * ch * bps)) * w * ch
        arr = np.frombuffer(raw, dtype=sdt, count=nsamp).reshape(
            -1, w, ch)
        raw = (
            np.cumsum(arr.astype(np.int64), axis=1) % (1 << (8 * bps))
        ).astype(sdt).tobytes()
    if bps == 2:                  # high-byte strip to the 8-bit contract
        raw = (np.frombuffer(raw, dtype=sdt, count=len(raw) // 2)
               .astype(np.uint16) >> 8).astype(np.uint8).tobytes()
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


def _decode_tiff_bilevel(
    data: bytes, tags: dict[int, list[int]], w: int, h: int,
    comp: int, photometric: int,
) -> np.ndarray:
    """Bilevel (BitsPerSample=1) strips: raw MSB-first packed bits
    (Compression=1, or 5/8/32773 decompressed first), T.4 Modified
    Huffman 1-D fax (2) or T.6 Group 4 2-D fax (4) via
    ``codecs_ccitt`` (r12). Each strip decodes independently (G4's
    reference line restarts all-white per strip, per TIFF 6.0).
    Photometric 0 (WhiteIsZero — the fax default) maps pixel value
    0 -> 255; photometric 1 inverts."""
    from xenoeye_spark.datapipe.codecs_ccitt import decode_g4, decode_mh

    if comp == 3:
        raise NotImplementedError(
            "CCITT Group 3 with EOLs (Compression=3) — only the "
            "TIFF-native MH (2) and G4 (4) framings are supported"
        )
    if _TAG_TILE_OFFSETS in tags:
        raise NotImplementedError("tiled bilevel TIFF")
    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags.get(_TAG_STRIP_COUNTS, [len(data) - offsets[0]])
    rps = tags.get(_TAG_ROWS_PER_STRIP, [h])[0]
    if rps <= 0:
        raise ValueError(f"bad RowsPerStrip {rps}")
    if len(offsets) != -(-h // rps):
        raise ValueError(
            f"corrupt TIFF: {len(offsets)} bilevel strips, expected "
            f"{-(-h // rps)}"
        )
    rb = (w + 7) // 8
    rows_out = []
    for si, (o, c) in enumerate(zip(offsets, counts)):
        rows = min(rps, h - si * rps)
        seg = data[o:o + c]
        if comp == 2:
            rows_out.append(decode_mh(seg, w, rows))
            continue
        if comp == 4:
            rows_out.append(decode_g4(seg, w, rows))
            continue
        if comp == 5:
            seg = _unlzw(seg, rows * rb)
        elif comp in (8, 32946):
            seg = _undeflate(seg, rows * rb)
        elif comp == 32773:
            seg = _unpackbits(seg, rows * rb)
        elif len(seg) < rows * rb:
            raise ValueError("truncated bilevel TIFF strip")
        packed = np.frombuffer(seg, dtype=np.uint8, count=rows * rb)
        bits_arr = np.unpackbits(packed.reshape(rows, rb), axis=1)[:, :w]
        rows_out.append(bits_arr)
    v = np.concatenate(rows_out, axis=0)
    g = ((1 - v) * 255 if photometric == 0 else v * 255).astype(np.uint8)
    return np.stack([g, g, g], axis=2)


def _decode_tiff_tiles(
    data: bytes, tags: dict[int, list[int]], w: int, h: int, spp: int,
    planar: int, comp: int, predictor: int, bps: int = 1,
    endian: str = "<",
) -> np.ndarray:
    """Tile layout (TIFF 6.0 §15): the image is a grid of
    TileWidth x TileLength tiles, ALWAYS padded to full tile size
    (unlike strips), raster-ordered left-to-right top-to-bottom, one
    full grid per plane when PlanarConfiguration=2. Each tile
    decompresses independently; the horizontal predictor runs per
    tile row. Returns the cropped (h, w, spp) chunky array."""
    tw = tags[_TAG_TILE_WIDTH][0]
    tl = tags[_TAG_TILE_LENGTH][0]
    if tw <= 0 or tl <= 0:
        raise ValueError(f"bad tile dims {tw}x{tl}")
    ta, td = -(-w // tw), -(-h // tl)
    nplanes = spp if planar == 2 and spp > 1 else 1
    ch = 1 if nplanes > 1 else spp
    per_plane = ta * td
    offsets = tags[_TAG_TILE_OFFSETS]
    counts = tags.get(_TAG_TILE_COUNTS,
                      [tw * tl * ch * bps] * len(offsets))
    if len(offsets) != per_plane * nplanes:
        raise ValueError(
            f"corrupt TIFF: {len(offsets)} tiles, expected "
            f"{per_plane * nplanes} ({ta}x{td} grid x {nplanes} planes)"
        )
    need = tw * tl * ch * bps
    sdt = np.uint8 if bps == 1 else np.dtype(endian + "u2")
    un = (_unlzw if comp == 5 else _undeflate
          if comp in (8, 32946) else _unpackbits)
    canvas = np.zeros((nplanes, td * tl, ta * tw, ch), dtype=np.uint8)
    for ti, (o, c) in enumerate(zip(offsets, counts)):
        plane, idx = divmod(ti, per_plane)
        ty, tx = divmod(idx, ta)
        if comp == 1:
            raw = data[o:o + c]
            if len(raw) < need:
                raise ValueError("truncated TIFF tile")
        else:
            raw = un(data[o:o + c], need)
        arr = np.frombuffer(raw, dtype=sdt, count=need // bps).reshape(
            tl, tw, ch
        )
        if predictor == 2:
            arr = (
                np.cumsum(arr.astype(np.int64), axis=1)
                % (1 << (8 * bps))
            ).astype(sdt)
        if bps == 2:              # high-byte strip per sample
            arr = (arr.astype(np.uint16) >> 8).astype(np.uint8)
        canvas[plane, ty * tl:(ty + 1) * tl,
               tx * tw:(tx + 1) * tw] = arr
    cropped = canvas[:, :h, :w, :]
    if nplanes > 1:
        return np.transpose(cropped[:, :, :, 0], (1, 2, 0))
    return cropped[0]


def _merge_jpeg_tables(seg: bytes, tables: bytes | None) -> bytes:
    """TIFF Technote 2: the JPEGTables tag holds an abbreviated
    tables-only JPEG stream (SOI .. EOI); each strip/tile stream gets
    those segments logically inserted after its own SOI."""
    if tables is None:
        return seg
    if tables[:2] != b"\xff\xd8" or tables[-2:] != b"\xff\xd9":
        raise ValueError("corrupt JPEGTables (no SOI/EOI bracket)")
    if seg[:2] != b"\xff\xd8":
        raise ValueError("corrupt JPEG tile/strip (no SOI)")
    return seg[:2] + tables[2:-2] + seg[2:]


def _decode_tiff_jpeg(
    data: bytes, tags: dict[int, list[int]], endian: str, w: int,
    h: int, spp: int, planar: int, photometric: int,
) -> np.ndarray:
    """New-style JPEG-in-TIFF (Compression=7, TIFF 6.0 Supplement 2 /
    Technote 2): every strip or tile is an independent JPEG stream —
    interchange format, or abbreviated with the shared tables carried
    once in the JPEGTables (347) tag. Decodes each segment with the
    in-house baseline/progressive decoder and assembles the RGB
    canvas; YCbCr->RGB happens inside the JPEG decode (the normal
    Photometric=6 case), so no second conversion here."""
    from xenoeye_spark.datapipe.codecs_jpeg import decode_jpeg

    if planar == 2 and spp > 1:
        raise NotImplementedError(
            "planar (PlanarConfiguration=2) JPEG-in-TIFF"
        )
    traw = tags.get(_TAG_JPEG_TABLES)
    tables = bytes(traw) if traw else None
    tiled = _TAG_TILE_OFFSETS in tags
    if tiled:
        tw, tl = tags[_TAG_TILE_WIDTH][0], tags[_TAG_TILE_LENGTH][0]
        if tw <= 0 or tl <= 0:
            raise ValueError(f"bad tile dims {tw}x{tl}")
        offsets = tags[_TAG_TILE_OFFSETS]
        counts = tags[_TAG_TILE_COUNTS]
        ta, td = -(-w // tw), -(-h // tl)
        if len(offsets) != ta * td:
            raise ValueError(
                f"corrupt TIFF: {len(offsets)} JPEG tiles, expected "
                f"{ta * td}"
            )
        origins = [(divmod(i, ta)[0] * tl, divmod(i, ta)[1] * tw)
                   for i in range(len(offsets))]
        spans = [(tl, tw)] * len(offsets)
        canvas = np.zeros((td * tl, ta * tw, 3), dtype=np.uint8)
    else:
        offsets = tags[_TAG_STRIP_OFFSETS]
        counts = tags[_TAG_STRIP_COUNTS]
        rps = tags.get(_TAG_ROWS_PER_STRIP, [h])[0]
        if rps <= 0:
            raise ValueError(f"bad RowsPerStrip {rps}")
        if len(offsets) != -(-h // rps):
            raise ValueError(
                f"corrupt TIFF: {len(offsets)} JPEG strips, expected "
                f"{-(-h // rps)}"
            )
        origins = [(i * rps, 0) for i in range(len(offsets))]
        spans = [(min(rps, h - i * rps), w) for i in range(len(offsets))]
        canvas = np.zeros((h, w, 3), dtype=np.uint8)
    for (o, c), (oy, ox), (sh, sw) in zip(
        zip(offsets, counts), origins, spans
    ):
        rgb = decode_jpeg(_merge_jpeg_tables(data[o:o + c], tables))
        if rgb.shape[0] < sh or rgb.shape[1] < sw:
            raise ValueError(
                f"JPEG segment {rgb.shape[:2]} smaller than its "
                f"{sh}x{sw} region"
            )
        canvas[oy:oy + sh, ox:ox + sw] = rgb[:sh, :sw]
    out = canvas[:h, :w]
    if spp == 1 and photometric == 0:     # WhiteIsZero gray JPEG
        out = 255 - out
    return out.copy()


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


def _split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a full JPEG interchange stream into (tables stream,
    abbreviated stream) per TIFF Technote 2: DQT/DHT segments move to
    a SOI..EOI tables-only stream; everything else (SOF, SOS, entropy
    data) stays. Tests-only, like the encoders."""
    assert stream[:2] == b"\xff\xd8"
    tables = bytearray(b"\xff\xd8")
    abbrev = bytearray(b"\xff\xd8")
    i = 2
    while i + 1 < len(stream):
        marker = stream[i + 1]
        if marker == 0xDA:                    # SOS: rest is entropy
            abbrev += stream[i:]
            break
        seg_len = struct.unpack(">H", stream[i + 2:i + 4])[0]
        chunk = stream[i:i + 2 + seg_len]
        (tables if marker in (0xDB, 0xC4) else abbrev).extend(chunk)
        i += 2 + seg_len
    tables += b"\xff\xd9"
    return bytes(tables), bytes(abbrev)


def encode_tiff(
    img: np.ndarray, endian: str = "<", rows_per_strip: int | None = None,
    planar: int = 1, compression: int = 1, predictor: int = 1,
    tile: tuple[int, int] | None = None, jpeg_tables: bool = False,
    bits: int = 8,
) -> bytes:
    """Minimal TIFF writer (tests only): 8-bit gray (H, W) or RGB
    (H, W, 3), strip-per-``rows_per_strip`` (default: one strip) or
    tiled via ``tile=(tile_width, tile_length)`` (r12 — tiles padded
    to full size per TIFF 6.0 §15), either byte order; ``planar=2``
    (r11) writes plane-major strips/tiles; ``compression`` 1/5/32773/8
    (none/LZW/PackBits/Deflate, r11-r12) applied per segment with ``predictor=2``
    horizontal differencing, or 7 (r12 — new-style JPEG, one
    interchange stream per segment, chunky only; ``jpeg_tables=True``
    moves the shared DQT/DHT into the JPEGTables tag and writes
    abbreviated streams) — so every decode path round-trips."""
    if bits not in (1, 8, 16):
        raise ValueError(f"bits must be 1, 8 or 16: {bits}")
    if bits == 16 and compression == 7:
        raise ValueError("JPEG-in-TIFF writer is 8-bit only")
    if compression in (2, 4) and bits != 1:
        raise ValueError("CCITT fax compression is bilevel-only")
    if bits == 1 and (compression not in (1, 2, 4) or tile is not None
                      or planar == 2):
        raise ValueError(
            "bilevel writer: compression 1/2/4, strips, chunky only")
    img = np.asarray(img, dtype=np.uint8 if bits == 8 else np.uint16)
    if img.ndim == 2:
        h, w = img.shape
        spp = 1
    else:
        h, w, spp = img.shape
    if planar not in (1, 2):
        raise ValueError(f"planar must be 1 or 2, got {planar}")
    if compression not in (1, 2, 4, 5, 32773, 7, 8):
        raise ValueError(
            f"compression must be 1/2/4/5/32773/7/8: {compression}")
    if predictor not in (1, 2):
        raise ValueError(f"predictor must be 1 or 2: {predictor}")
    if compression == 7 and (planar == 2 and spp > 1):
        raise ValueError("JPEG-in-TIFF writer is chunky-only")
    rps = rows_per_strip or h

    def prep(a: np.ndarray, ch: int) -> bytes:
        if bits == 1:
            from xenoeye_spark.datapipe.codecs_ccitt import (
                encode_g4, encode_mh,
            )
            a2 = a.reshape(a.shape[0], -1)
            if compression == 2:
                return encode_mh(a2)
            if compression == 4:
                return encode_g4(a2)
            return np.packbits(a2, axis=1).tobytes()
        if compression == 7:
            from xenoeye_spark.datapipe.codecs_jpeg import (
                encode_jpeg_gray, encode_jpeg_rgb,
            )
            a = a.reshape(a.shape[0], -1, ch)
            if ch == 3:
                return encode_jpeg_rgb(a)
            return encode_jpeg_gray(
                a[:, :, 0].astype(np.float64), quant=np.full(64, 16)
            )
        a = a.reshape(a.shape[0], -1, ch).astype(np.int64)
        if predictor == 2:
            d = a.copy()
            d[:, 1:, :] = (a[:, 1:, :] - a[:, :-1, :]) % (1 << bits)
            a = d
        b = a.astype(np.uint8 if bits == 8
                     else np.dtype(endian + "u2")).tobytes()
        if compression == 5:
            return _lzw(b)
        if compression == 32773:
            return _packbits(b)
        if compression == 8:
            import zlib
            return zlib.compress(b)
        return b

    if tile is not None:
        tw, tl = tile
        ta, td = -(-w // tw), -(-h // tl)
        pad = np.zeros(
            (td * tl, ta * tw) + (() if img.ndim == 2 else (spp,)),
            dtype=img.dtype,
        )
        pad[:h, :w] = img
        if planar == 2 and spp > 1:
            planes = np.transpose(pad.reshape(td * tl, ta * tw, spp),
                                  (2, 0, 1))
            strips = [
                prep(planes[p, ty * tl:(ty + 1) * tl,
                            tx * tw:(tx + 1) * tw], 1)
                for p in range(spp)
                for ty in range(td) for tx in range(ta)
            ]
        else:
            planar = 1
            pad3 = pad.reshape(td * tl, ta * tw, spp)
            strips = [
                prep(pad3[ty * tl:(ty + 1) * tl,
                          tx * tw:(tx + 1) * tw], spp)
                for ty in range(td) for tx in range(ta)
            ]
    elif planar == 2 and spp > 1:
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

    tables: bytes | None = None
    if compression == 7 and jpeg_tables:
        split = [_split_jpeg_tables(s) for s in strips]
        tables = split[0][0]
        assert all(t == tables for t, _ in split), "tables must agree"
        strips = [a for _, a in split]

    hdr = (b"II" if endian == "<" else b"MM") + struct.pack(
        endian + "HI", 42, 8
    )
    # layout: header(8) | IFD | out-of-line values | strip data
    def ifd_bytes(n):
        return 2 + 12 * n + 4

    off_tag = _TAG_TILE_OFFSETS if tile is not None else _TAG_STRIP_OFFSETS
    tag_list = [
        (_TAG_WIDTH, 3, [w]),
        (_TAG_HEIGHT, 3, [h]),
        (_TAG_BITS, 3, [bits] * spp),
        (_TAG_COMPRESSION, 3, [compression]),
        (_TAG_PHOTOMETRIC, 3,
         [0 if bits == 1 else
          6 if compression == 7 and spp == 3 else 2 if spp == 3 else 1]),
        (off_tag, 4, None),               # filled below
        (_TAG_SPP, 3, [spp]),
        (_TAG_PLANAR, 3, [planar]),
    ]
    if tile is not None:
        tag_list += [
            (_TAG_TILE_WIDTH, 3, [tile[0]]),
            (_TAG_TILE_LENGTH, 3, [tile[1]]),
            (_TAG_TILE_COUNTS, 4, [len(s) for s in strips]),
        ]
    else:
        tag_list += [
            (_TAG_ROWS_PER_STRIP, 3, [rps]),
            (_TAG_STRIP_COUNTS, 4, [len(s) for s in strips]),
        ]
    if tables is not None:
        tag_list.append((_TAG_JPEG_TABLES, 7, list(tables)))
    if predictor == 2 and compression != 7:
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
        if tag == off_tag:
            vals = offs
        ifd += struct.pack(endian + "HHI", tag, typ, len(vals))
        ifd += place(typ, vals)
    ifd += struct.pack(endian + "I", 0)   # next-IFD pointer
    assert len(extra) == tmp_extra_len
    return hdr + ifd + bytes(extra) + b"".join(strips)
