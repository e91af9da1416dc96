"""Pure-numpy decoders (and test encoders) for UNCOMPRESSED media
containers — PPM/PGM (netpbm), BMP (24-bit uncompressed), WAV (PCM
8/16-bit). These make one real decode path through the multimodal
operators without any codec library: the formats are plain headers over
raw sample arrays, so a numpy frombuffer + reshape IS the decoder.

Format references are the public specs: netpbm's pbm/pgm/ppm man pages,
the Windows BITMAPFILEHEADER/BITMAPINFOHEADER layout, and the RIFF/WAVE
chunk structure. Compressed codecs (JPEG/PNG/H.264/MP3) stay honestly
stubbed in ``multimodal.py`` — this container has no codec libs, and a
hand-rolled entropy decoder is not this repo's job.

Encoders exist so tests and gate queries can PLANT byte patterns whose
decoded statistics have a closed form a SQL oracle re-derives — the
encode->decode round-trip is asserted bit-for-bit in test_multimodal.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# netpbm: P5 (grayscale) / P6 (RGB), binary variants, maxval <= 255
# ---------------------------------------------------------------------------

def _pnm_header_tokens(data: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Parse ``n_tokens`` whitespace-separated numeric header tokens
    after the magic, skipping '#' comments; returns (tokens, offset of
    the raster = one whitespace byte past the last token)."""
    toks: list[int] = []
    i = 2  # past the 2-byte magic
    cur = b""
    while i < len(data) and len(toks) < n_tokens:
        ch = data[i:i + 1]
        if ch == b"#":
            # '#' delimits an in-progress token exactly like whitespace
            # (netpbm allows a comment anywhere whitespace may appear);
            # without the flush, '255#c\n' would leave b'255' pending
            # and keep scanning RASTER bytes as header characters
            if cur:
                toks.append(int(cur))
                cur = b""
            while i < len(data) and data[i:i + 1] not in (b"\n", b"\r"):
                i += 1
        elif ch.isspace():
            if cur:
                toks.append(int(cur))
                cur = b""
        elif ch.isdigit():
            cur += ch
        else:
            raise ValueError(f"bad PNM header byte {ch!r} at {i}")
        i += 1
    if len(toks) < n_tokens:
        raise ValueError("truncated PNM header")
    return toks, i


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 (RGB) / P5 (grayscale) binary netpbm -> (H, W, 3) uint8
    (grayscale replicated across channels, the convention the feature
    kernels expect). maxval must be <= 255 (16-bit rasters raise)."""
    magic = data[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PGM/PPM: magic {magic!r}")
    (w, h, maxval), off = _pnm_header_tokens(data, 3)
    if not (0 < maxval <= 255):
        raise ValueError(f"unsupported PNM maxval {maxval}")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    if len(data) - off < need:
        raise ValueError("truncated PNM raster")
    if len(data) - off > need:
        # the spec allows exactly ONE whitespace byte after maxval; a
        # text-mode writer's CRLF (or trailing junk) would otherwise
        # shift every pixel silently — raster bytes may legitimately
        # start with 0x0A, so greedy whitespace-skipping cannot
        # disambiguate and the only safe rule is exact length
        raise ValueError(
            f"PNM raster has {len(data) - off - need} trailing "
            "byte(s) (CRLF after maxval?) — refusing a shifted decode"
        )
    raster = np.frombuffer(data, dtype=np.uint8, count=need, offset=off)
    img = raster.reshape(h, w, ch)
    if ch == 1:
        img = np.repeat(img, 3, axis=2)
    return img


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary P6."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_ppm wants (H, W, 3)")
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


# ---------------------------------------------------------------------------
# BMP: 24-bit uncompressed (BI_RGB), BITMAPINFOHEADER
# ---------------------------------------------------------------------------

def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (H, W, 3) uint8 RGB. Handles the
    4-byte row padding, bottom-up (positive height) and top-down
    (negative height) rasters; anything but biBitCount=24 /
    biCompression=0 raises."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h_signed = struct.unpack_from("<Iii", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    planes, bpp = struct.unpack_from("<HH", data, 26)
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP: {bpp}bpp compression={comp}")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    need = stride * h
    if len(data) - pix_off < need:
        raise ValueError("truncated BMP raster")
    raw = np.frombuffer(data, dtype=np.uint8, count=need, offset=pix_off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:          # bottom-up: last stored row is the top
        rows = rows[::-1]
    return rows[..., ::-1].copy()   # BGR -> RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit bottom-up BMP with row padding."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_bmp wants (H, W, 3)")
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), dtype=np.uint8)
    raster[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR
    pix = raster.tobytes()
    file_hdr = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + pix


# ---------------------------------------------------------------------------
# WAV: RIFF/WAVE, PCM 8-bit unsigned / 16-bit signed
# ---------------------------------------------------------------------------

def _ulaw_expand(codes: np.ndarray) -> np.ndarray:
    """mu-law code bytes -> 16-bit linear (ITU-T G.711 expansion)."""
    u = (~codes.astype(np.int64)) & 0xFF
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag)


def _alaw_expand(codes: np.ndarray) -> np.ndarray:
    """A-law code bytes -> 16-bit linear (ITU-T G.711 expansion)."""
    a = codes.astype(np.int64) ^ 0x55
    sign = (a & 0x80) != 0
    exp = (a >> 4) & 7
    mant = a & 0x0F
    mag = np.where(
        exp == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << np.maximum(exp - 1, 0),
    )
    # A-law polarity: the (xor-ed) sign bit SET means positive —
    # opposite of mu-law; pinned code-for-code against audioop
    return np.where(sign, mag, -mag)



def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> ((n_samples, n_channels) int32 array, sample_rate).
    8-bit samples are recentred to signed (x - 128); 16-bit read as
    little-endian int16. Walks the chunk list properly (extra chunks
    like LIST/fact are skipped), so real-world files decode too."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, fmt, payload = 12, None, None
    while i + 8 <= len(data):
        cid = data[i:i + 4]
        size = struct.unpack_from("<I", data, i + 4)[0]
        if i + 8 + size > len(data):
            # a silently-short frombuffer would decode fewer samples
            # than declared — fail like the PNM/BMP truncation guards
            raise ValueError(
                f"truncated WAV chunk {cid!r}: declares {size} bytes, "
                f"{len(data) - i - 8} remain"
            )
        body = data[i + 8:i + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            payload = body
        i += 8 + size + (size & 1)   # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt not in (1, 6, 7):
        raise ValueError(f"unsupported WAV format code {audio_fmt}")
    if n_ch == 0:
        raise ValueError("unsupported WAV channel count 0")
    if audio_fmt in (6, 7):
        # G.711 companded telephony audio (public; ITU-T G.711): 8-bit
        # codes expand to 16-bit linear. Vectorized table-free
        # expansion, validated code-for-code against stdlib audioop in
        # test_multimodal.
        if bits != 8:
            raise ValueError(
                f"G.711 WAV must be 8-bit, got {bits}"
            )
        codes = np.frombuffer(payload, dtype=np.uint8)
        samples = (
            _alaw_expand(codes) if audio_fmt == 6 else _ulaw_expand(codes)
        ).astype(np.int32)
    elif bits == 16:
        if len(payload) % 2:
            # same rule as the chunk-size guard above: never decode
            # fewer samples than the payload holds without saying so
            raise ValueError(
                "WAV data chunk has an odd byte count for 16-bit PCM"
            )
        samples = np.frombuffer(payload, dtype="<i2").astype(np.int32)
    elif bits == 8:
        samples = np.frombuffer(payload, dtype=np.uint8).astype(np.int32) - 128
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    if samples.size % n_ch:
        raise ValueError(
            f"WAV data chunk holds a partial frame: {samples.size} "
            f"samples over {n_ch} channels"
        )
    return samples.reshape(-1, n_ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n, ch) int16-range array -> PCM16 WAV."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    s = s.astype("<i2")
    n_ch = s.shape[1]
    payload = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
    out += b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(payload)) + payload
    return out


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def sniff_format(data: bytes) -> str | None:
    """Container/codec sniff by magic:
    'ppm' | 'pgm' | 'bmp' | 'wav' | 'jpeg' | 'png' | 'gif' |
    'tiff' | None."""
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"P5":
        return "pgm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


def decode_image(data: bytes) -> np.ndarray:
    """Decode any supported image to (H, W, 3) uint8 — the raw
    containers here, BASELINE + PROGRESSIVE (r11) JPEG via the
    pure-numpy entropy decoder in ``codecs_jpeg``, 8-bit PNG
    (interlace none or Adam7, r11) via stdlib-zlib inflate + unfilter
    in ``codecs_png``, GIF via the hand-rolled LZW in ``codecs_gif``,
    and uncompressed TIFF (chunky or planar, r11) in ``codecs_tiff``;
    raises NotImplementedError for the rest (H.264/VP9, arithmetic
    JPEG), the honest boundary."""
    kind = sniff_format(data)
    if kind in ("ppm", "pgm"):
        return decode_ppm(data)
    if kind == "bmp":
        return decode_bmp(data)
    if kind == "jpeg":
        from xenoeye_spark.datapipe.codecs_jpeg import decode_jpeg

        return decode_jpeg(data)
    if kind == "png":
        from xenoeye_spark.datapipe.codecs_png import decode_png

        return decode_png(data)
    if kind == "gif":
        from xenoeye_spark.datapipe.codecs_gif import decode_gif

        return decode_gif(data)
    if kind == "tiff":
        from xenoeye_spark.datapipe.codecs_tiff import decode_tiff

        return decode_tiff(data)
    raise NotImplementedError(
        "unrecognized image format (video codecs need libs not present "
        "in this environment); supported: PPM/PGM/BMP raw containers + "
        "baseline/progressive JPEG (codecs_jpeg) + 8-bit PNG "
        "(codecs_png) + GIF (codecs_gif) + uncompressed TIFF "
        "(codecs_tiff)"
    )
