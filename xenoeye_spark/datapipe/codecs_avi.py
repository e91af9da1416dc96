"""Minimal AVI (RIFF) container walk for MJPEG video — the one video
codec this repo can decode for real, because every frame is a baseline
JPEG handled by ``codecs_jpeg``. Public spec: the RIFF/AVI container
layout (msdn 'AVI RIFF File Reference') — chunks are (fourcc, size,
payload) with word alignment; video frames live in the 'movi' LIST as
'NNdc' (compressed) / 'NNdb' (uncompressed DIB) chunks.

Decoder: ``avi_frames`` yields the raw frame payloads in stream order
(stream 00 only — the minimal single-video-stream form the test
encoder writes and real MJPEG-from-camera files follow). Feature
extraction stays in ``multimodal.sample_frames``, which decodes each
sampled frame via the JPEG decoder.

Encoder (tests only): ``encode_avi_mjpeg`` wraps a list of JPEG byte
strings into a minimal RIFF AVI with an avih header and a movi LIST.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

_RIFF = b"RIFF"
_LIST = b"LIST"


def avi_frames(data: bytes, stream: int = 0) -> Iterator[bytes]:
    """Yield the video-frame payloads of AVI stream ``stream`` in file
    order. Raises ValueError on non-AVI input."""
    if data[:4] != _RIFF or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' header missing)")
    want = (f"{stream:02d}dc".encode(), f"{stream:02d}db".encode())

    def walk(buf: bytes, pos: int, end: int) -> Iterator[bytes]:
        while pos + 8 <= end:
            fourcc = buf[pos:pos + 4]
            size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
            body_start = pos + 8
            if fourcc in (_RIFF, _LIST):
                # list form: 4-byte list type then sub-chunks
                yield from walk(buf, body_start + 4, body_start + size)
            elif fourcc in want:
                yield buf[body_start:body_start + size]
            pos = body_start + size + (size & 1)    # word alignment

    yield from walk(data, 0, len(data))


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Minimal single-stream MJPEG AVI writer (tests only)."""

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(list_type: bytes, payload: bytes) -> bytes:
        return chunk(_LIST, list_type + payload)

    avih = struct.pack(
        "<12I",
        1_000_000 // fps,      # microseconds per frame
        0, 0, 0x10,            # max bytes/sec, padding, flags (HASINDEX off)
        len(frames), 0, 1, 0,  # total frames, initial, streams, sugg buf
        width, height, 0, 0,
    ) + b"\x00" * 8            # dwReserved[4] tail of the 56-byte header
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(frames),
        0, 0xFFFFFFFF, 0, 0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh)
                                   + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return _RIFF + struct.pack("<I", len(body)) + body
