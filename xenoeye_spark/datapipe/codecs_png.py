"""Pure-python+numpy PNG codec — decoder (and a minimal test encoder)
for non-interlaced 8-bit PNG, public spec RFC 2083 / W3C PNG. The
DEFLATE layer is the stdlib ``zlib`` (present in every CPython), so
unlike JPEG there is no entropy coder to hand-roll: PNG decode is
chunk walk -> inflate -> per-scanline unfilter.

Scope (decoder): every §11.2.2-legal (bit depth x color type)
combination (r12) — depths 1/2/4 for gray and palette, 8 for all
color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
6 (RGBA), 16 for the non-palette types; filters 0-4 (None/Sub/Up/
Average/Paeth; byte-level at every depth, filter delta =
ceil(depth*spp/8) bytes per §9); alpha is dropped (the multimodal
contract is HxWx3); 16-bit samples strip to the high byte, sub-8-bit
gray scales exactly to 0..255; BOTH interlace methods — none and
Adam7 (r11: the seven fixed sub-grids each unfilter as their own
mini-image, empty passes carry no bytes, and the deinterlace is a
numpy strided scatter). Illegal combos raise ValueError.

Scope (encoder, tests only): gray/RGB/RGBA/palette writers with a
caller-chosen per-scanline filter type and optional Adam7 interlace,
so tests exercise each unfilter path and the deinterlace scatter
against a python twin rather than only filter-0 round-trips.

Unfilter cost: None/Up vectorize across the row; Sub/Average/Paeth
carry a sequential dependency along x and run as a per-byte loop over
that scanline only — bounded by the image's own byte count, inside the
same Arrow batch as the other decoders.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# samples per pixel by color type
_SPP = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# Adam7 pass grid: (x_start, y_start, x_step, y_step) — W3C PNG §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _unfilter(raw: bytes, offset: int, h: int, row_bytes: int, bpp: int):
    """Unfilter one (sub-)image of ``h`` scanlines x ``row_bytes``
    filtered BYTES starting at ``offset`` in the inflated stream;
    returns ((h, row_bytes) uint8, bytes consumed). PNG filters are
    byte-level at every depth (W3C PNG §9): ``bpp`` is the filter
    delta — ceil(depth*spp/8), min 1 — so 16-bit rows filter against
    the byte two samples back and sub-8-bit rows against the previous
    packed byte. The per-pass images of an Adam7 stream are filtered
    EXACTLY like a standalone image (each pass restarts with a zero
    prior scanline), so interlaced decode is seven calls of this + a
    strided scatter."""
    stride = row_bytes
    need = h * (stride + 1)
    if offset + need > len(raw):
        raise ValueError("IDAT size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        base = offset + y * (stride + 1)
        ft = raw[base]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=base + 1
        ).astype(np.int64)
        if ft == 0:
            cur = line
        elif ft == 2:                             # Up
            cur = (line + prev) & 0xFF
        elif ft in (1, 3, 4):                     # Sub / Average / Paeth
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                if ft == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif ft == 3:
                    cur[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    cur[x] = (line[x] + _paeth(a, int(prev[x]), c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out, need


def _row_bytes(w: int, spp: int, depth: int) -> int:
    return (w * spp * depth + 7) // 8


def _samples(rows: np.ndarray, w: int, spp: int, depth: int) -> np.ndarray:
    """(h, row_bytes) unfiltered bytes -> (h, w, spp) uint8 samples.
    16-bit samples take the HIGH byte (big-endian network order —
    libpng's classic strip-16, exact for v*257-coded values);
    sub-8-bit samples unpack MSB-first (§7.2) at index precision —
    gray scale-up to 0..255 happens at the color-type stage."""
    h = rows.shape[0]
    if depth == 8:
        return rows.reshape(h, w, spp)
    if depth == 16:
        return rows.reshape(h, w * spp, 2)[:, :, 0].reshape(h, w, spp)
    bits = np.unpackbits(rows, axis=1)
    vals = bits.reshape(h, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    packed = (vals * weights).sum(axis=2).astype(np.uint8)
    return packed[:, :w].reshape(h, w, spp)


_VALID_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                 4: (8, 16), 6: (8, 16)}


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG (interlace none or Adam7; bit depth 1/2/4/8/16
    per the §11.2.2 legal combinations) to (H, W, 3) uint8 RGB (gray
    replicated and scaled to 0..255, palette resolved, alpha dropped,
    16-bit stripped to the high byte)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    i = 8
    ihdr = None
    idat = bytearray()
    plte: bytes | None = None
    while i + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[i:i + 8])
        chunk = data[i + 8:i + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if interlace not in (0, 1):
                raise ValueError(f"bad interlace method {interlace}")
            if ctype not in _SPP:
                raise ValueError(f"bad color type {ctype}")
            if depth not in _VALID_DEPTHS[ctype]:
                raise ValueError(
                    f"illegal depth {depth} for color type {ctype}"
                )
            if comp or filt:
                raise ValueError("bad compression/filter method")
            ihdr = (w, h, ctype, depth, interlace)
        elif typ == b"PLTE":
            plte = chunk
        elif typ == b"IDAT":
            idat.extend(chunk)
        elif typ == b"IEND":
            break
        i += 12 + ln
    if ihdr is None:
        raise ValueError("no IHDR")
    w, h, ctype, depth, interlace = ihdr
    spp = _SPP[ctype]
    bpp = max(1, spp * depth // 8)
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        out, consumed = _unfilter(raw, 0, h, _row_bytes(w, spp, depth),
                                  bpp)
        if consumed != len(raw):
            raise ValueError("IDAT size mismatch")
        px = _samples(out, w, spp, depth)
    else:                                         # Adam7
        px = np.zeros((h, w, spp), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue                          # empty pass: no bytes
            sub, consumed = _unfilter(
                raw, off, ph, _row_bytes(pw, spp, depth), bpp
            )
            off += consumed
            px[y0::dy, x0::dx] = _samples(sub, pw, spp, depth)
        if off != len(raw):
            raise ValueError("IDAT size mismatch")
    if ctype == 0:
        g = px[:, :, 0]
        if depth < 8:                 # 0..2^d-1 -> 0..255 (exact)
            g = (g.astype(np.int64) * (255 // ((1 << depth) - 1))
                 ).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    if ctype == 2:
        return px.copy()
    if ctype == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = px[:, :, 0]
        if idx.size and int(idx.max()) >= len(pal):
            raise ValueError(
                f"palette index {int(idx.max())} out of range "
                f"(PLTE has {len(pal)} entries)"
            )
        return pal[idx]
    if ctype == 4:
        g = px[:, :, 0]
        return np.stack([g, g, g], axis=2)
    return px[:, :, :3].copy()                    # 6: RGBA -> RGB


# ---------------------------------------------------------------------------
# minimal encoder (tests only)
# ---------------------------------------------------------------------------

def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))


def _pack(px: np.ndarray, spp: int, depth: int) -> np.ndarray:
    """(h, w, spp) samples (uint8, or uint16 when depth=16) ->
    (h, row_bytes) packed scanline bytes; inverse of _samples."""
    h, w = px.shape[0], px.shape[1]
    if depth == 8:
        return px.reshape(h, w * spp).astype(np.uint8)
    if depth == 16:
        return (px.astype(">u2").reshape(h, w * spp)
                .view(np.uint8).reshape(h, w * spp * 2))
    flat = px.reshape(h, w).astype(np.uint8)
    shifts = np.arange(depth - 1, -1, -1)
    bits = ((flat[:, :, None] >> shifts) & 1).reshape(h, w * depth)
    pad = (-bits.shape[1]) % 8
    if pad:
        bits = np.concatenate(
            [bits, np.zeros((h, pad), dtype=np.uint8)], axis=1
        )
    return np.packbits(bits, axis=1)


def _filter_pass(rows: np.ndarray, bpp: int, filter_type: int) -> bytes:
    """Filter one (sub-)image's (h, row_bytes) scanline bytes with ONE
    filter type on every scanline (filter delta ``bpp`` bytes); the
    exact inverse of _unfilter on that pass."""
    h, stride = rows.shape
    flat = rows.astype(np.int64)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        raw.append(filter_type)
        if filter_type == 0:
            f = cur
        elif filter_type == 2:
            f = (cur - prev) & 0xFF
        else:
            f = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                if filter_type == 1:
                    f[x] = (cur[x] - a) & 0xFF
                elif filter_type == 3:
                    f[x] = (cur[x] - ((a + prev[x]) >> 1)) & 0xFF
                elif filter_type == 4:
                    c = prev[x - bpp] if x >= bpp else 0
                    f[x] = (cur[x] - _paeth(a, int(prev[x]), c)) & 0xFF
                else:
                    raise ValueError(f"bad filter {filter_type}")
        raw.extend(f.astype(np.uint8).tobytes())
        prev = cur
    return bytes(raw)


def encode_png(
    img: np.ndarray,
    ctype: int = 2,
    filter_type: int = 0,
    palette: np.ndarray | None = None,
    interlace: bool = False,
    depth: int = 8,
) -> bytes:
    """Minimal PNG writer (tests only): ONE filter type applied to
    every scanline so each unfilter path can be exercised
    deliberately; ``interlace=True`` writes the Adam7 pass layout
    (r11) so the deinterlace scatter round-trips; ``depth`` (r12)
    accepts the §11.2.2 legal combinations — 1/2/4 for gray and
    palette indices, 16 (uint16 input, big-endian) for gray/RGB/
    gray+alpha/RGBA. ``img``: (H, W) for gray/palette indices,
    (H, W, 3) RGB, (H, W, 4) RGBA."""
    img = np.asarray(img, dtype=np.uint16 if depth == 16 else np.uint8)
    if depth not in _VALID_DEPTHS[ctype]:
        raise ValueError(f"illegal depth {depth} for color type {ctype}")
    if ctype in (0, 3):
        h, w = img.shape
        px = img.reshape(h, w, 1)
    else:
        h, w, _ = img.shape
        px = img
    spp = _SPP[ctype]
    assert px.shape[2] == spp, (px.shape, ctype)
    bpp = max(1, spp * depth // 8)
    if interlace:
        raw = b"".join(
            _filter_pass(_pack(px[y0::dy, x0::dx], spp, depth), bpp,
                         filter_type)
            for x0, y0, dx, dy in _ADAM7
            if px[y0::dy, x0::dx].size
        )
    else:
        raw = _filter_pass(_pack(px, spp, depth), bpp, filter_type)
    out = _SIG
    out += _chunk(b"IHDR", struct.pack(
        ">IIBBBBB", w, h, depth, ctype, 0, 0, 1 if interlace else 0))
    if ctype == 3:
        if palette is None:
            raise ValueError("palette ctype needs a palette")
        out += _chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += _chunk(b"IEND", b"")
    return out
