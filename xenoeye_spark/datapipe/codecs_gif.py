"""Pure-python GIF decoder (and minimal test encoders) — GIF87a/89a,
public spec (W3C GIF89a specification): logical screen descriptor,
global/local color tables, graphic-control/comment/application
extensions (skipped), image descriptors, and the variable-width LZW
image data. Interlaced images are de-interlaced (the spec's 8/8/4/2
row passes).

Two test encoders anchor the decoder from independent directions:

- ``encode_gif_uncompressed`` emits each pixel as its own literal LZW
  code with a Clear before the table can grow — correct by
  construction (no dictionary logic at all), so a decode mismatch
  indicts the decoder, not the encoder;
- ``encode_gif`` is a real greedy-dictionary LZW encoder, whose output
  exercises code-width growth and dictionary hits.

Animated GIFs: ``decode_gif`` returns the FIRST frame (the multimodal
contract is one HxWx3 raster); ``gif_frames`` yields every frame's
raster for the video-ish path.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np


def _color_table(data: bytes, pos: int, flags: int) -> tuple[np.ndarray | None, int]:
    if flags & 0x80:
        n = 2 << (flags & 7)
        tbl = np.frombuffer(
            data, dtype=np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3).copy()
        return tbl, pos + 3 * n
    return None, pos


def _subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        ln = data[pos]
        pos += 1
        if ln == 0:
            return bytes(out), pos
        out.extend(data[pos:pos + ln])
        pos += ln


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-flavored LZW: variable code width starting at
    min_code_size + 1, Clear resets the table, widths grow at 2^w
    (cap 12). Stops after n_pixels or the End code."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    bitpos = 0
    total_bits = len(data) * 8

    def read_code(width: int) -> int | None:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return None
        byte0 = bitpos >> 3
        # LSB-first packing: gather up to 3 bytes
        chunk = int.from_bytes(data[byte0:byte0 + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return code

    def reset():
        return (
            {i: (i,) for i in range(clear)},
            min_code_size + 1,
            clear + 2,
        )

    table, width, nxt = reset()
    prev: tuple[int, ...] | None = None
    while n_out < n_pixels:
        code = read_code(width)
        if code is None:
            raise ValueError("truncated LZW stream")
        if code == clear:
            table, width, nxt = reset()
            prev = None
            continue
        if code == end:
            break
        if code in table:
            entry = table[code]
        elif code == nxt and prev is not None:
            entry = prev + (prev[0],)        # the KwKwK case
        else:
            raise ValueError(f"bad LZW code {code}")
        take = min(len(entry), n_pixels - n_out)
        out[n_out:n_out + take] = entry[:take]
        n_out += take
        if prev is not None and nxt < 4096:
            table[nxt] = prev + (entry[0],)
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        raise ValueError(
            f"LZW stream ended at {n_out}/{n_pixels} pixels"
        )
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray, h: int, w: int) -> np.ndarray:
    out = np.empty((h, w), dtype=np.uint8)
    rows = idx.reshape(h, w)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def gif_frames(data: bytes) -> Iterator[np.ndarray]:
    """Yield each image frame as (H, W, 3) uint8 RGB (frame-local
    size; no compositing — each frame's own raster)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    gct, pos = _color_table(data, 13, flags)
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:                       # trailer
            return
        if b == 0x21:                       # extension: label + subblocks
            pos += 2
            _, pos = _subblocks(data, pos)
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block {b:#x}")
        _x, _y, w, h, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        lct, pos = _color_table(data, pos, iflags)
        table = lct if lct is not None else gct
        if table is None:
            raise ValueError("GIF image without a color table")
        min_code = data[pos]
        pos += 1
        lzw, pos = _subblocks(data, pos)
        idx = _lzw_decode(lzw, min_code, w * h)
        if iflags & 0x40:
            grid = _deinterlace(idx, h, w)
        else:
            grid = idx.reshape(h, w)
        yield table[grid]


def decode_gif(data: bytes) -> np.ndarray:
    """First frame as (H, W, 3) uint8 RGB."""
    for frame in gif_frames(data):
        return frame
    raise ValueError("GIF contains no image frames")


# ---------------------------------------------------------------------------
# minimal encoders (tests only)
# ---------------------------------------------------------------------------

class _LzwWriter:
    def __init__(self, min_code_size: int):
        self.min = min_code_size
        self.out = bytearray()
        self.buf = 0
        self.n = 0
        self.width = min_code_size + 1

    def put(self, code: int) -> None:
        self.buf |= code << self.n
        self.n += self.width
        while self.n >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.n -= 8

    def finish(self) -> bytes:
        if self.n:
            self.out.append(self.buf & 0xFF)
        return bytes(self.out)


def _wrap_gif(
    idx: np.ndarray, palette: np.ndarray, min_code: int, lzw: bytes
) -> bytes:
    h, w = idx.shape
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[:n] = palette
    out = b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out += bytes([min_code])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return out


def encode_gif_uncompressed(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """Literal-codes-only GIF: every pixel its own code, a Clear before
    the dictionary could assign a code past the current width —
    correct by construction (the 'uncompressed GIF' trick)."""
    min_code = max(2, (len(palette) - 1).bit_length())
    clear = 1 << min_code
    wtr = _LzwWriter(min_code)
    wtr.put(clear)
    budget = (1 << wtr.width) - clear - 3   # codes before width change
    for px in idx.reshape(-1):
        if budget == 0:
            wtr.put(clear)
            budget = (1 << wtr.width) - clear - 3
        wtr.put(int(px))
        budget -= 1
    wtr.put(clear + 1)                      # End
    return _wrap_gif(idx, palette, min_code, wtr.finish())


def encode_gif(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """Real greedy-dictionary LZW GIF encoder (exercises width growth
    and dictionary hits in the decoder)."""
    min_code = max(2, (len(palette) - 1).bit_length())
    clear = 1 << min_code
    end = clear + 1
    wtr = _LzwWriter(min_code)
    wtr.put(clear)
    table: dict[tuple[int, ...], int] = {
        (i,): i for i in range(1 << min_code)
    }
    nxt = clear + 2
    seq: tuple[int, ...] = ()
    for px in idx.reshape(-1):
        cand = seq + (int(px),)
        if cand in table:
            seq = cand
            continue
        wtr.put(table[seq])
        if nxt < 4096:
            table[cand] = nxt
            nxt += 1
            # grow one code late: the decoder widens after it ALLOCATES
            # code (1<<width)-1, i.e. when reading the next one
            if nxt > (1 << wtr.width) and wtr.width < 12:
                wtr.width += 1
        else:
            wtr.put(clear)
            table = {(i,): i for i in range(1 << min_code)}
            nxt = clear + 2
            wtr.width = min_code + 1
        seq = (int(px),)
    if seq:
        wtr.put(table[seq])
    wtr.put(end)
    return _wrap_gif(idx, palette, min_code, wtr.finish())
