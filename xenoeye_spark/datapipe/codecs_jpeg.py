"""Pure-numpy JPEG codec — decoder (and a minimal test encoder) for
8-bit JPEG/JFIF, public spec ITU-T T.81.

Scope (decoder): the BASELINE process — SOI/APPn/COM/DQT/SOF0/DHT/
DRI/SOS/EOI markers, 1- or 3-component frames, sampling factors
4:4:4 / 4:2:2 / 4:2:0, byte stuffing and restart markers, 8-bit
quantization tables (16-bit accepted), JFIF full-range BT.601
YCbCr -> RGB — AND the PROGRESSIVE process (SOF2, r11): coefficients
accumulate across scans in zigzag space and the IDCT runs once at
EOI; all four scan kinds decode (DC first/refine, AC first/refine
per T.81 G.1.2 — spectral selection bands, successive-approximation
point transforms, EOB runs, refinement correction bits), interleaved
DC scans walk MCUs while non-interleaved scans walk the component's
OWN ceil-block grid — AND 12-bit precision (r12) under SOF1 extended
sequential / SOF2 (level shift 2048, samples scaled to the uint8
contract before the depth-agnostic color math; 16-bit DQT entries).
Arithmetic coding and hierarchical/lossless processes raise
NotImplementedError — loudly, like every other honest boundary in
this repo.

Scope (encoder, tests only): grayscale or 4:4:4 color, the T.81
Annex K example Huffman tables (public), caller-supplied or flat
quantization. It exists so tests can round-trip real entropy-coded
data and PLANT analytically-known streams: a DC-only block decodes to
a flat 8x8 of round(DC * Q[0] / 8) + 128 — an anchor computed by hand,
independent of both halves of this module.

Everything is numpy over one in-memory byte string — the Spark side
(multimodal.decode_and_featurize) calls this per row inside an Arrow
batch, exactly like the PPM/BMP path.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i of the scan -> (row, col) in the 8x8 block
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II basis; IDCT(X) = C.T @ X @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


class _HuffTable:
    """Canonical Huffman table from the DHT (BITS, HUFFVAL) form —
    decode via the T.81 F.16 sequential-compare (MINCODE/MAXCODE)."""

    def __init__(self, bits: list[int], values: bytes):
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1
        # encoder side: value -> (code, length)
        self.enc: dict[int, tuple[int, int]] = {}
        code, k = 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.enc[values[k]] = (code, ln)
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment, consuming
    0x00 stuffing after 0xFF and stopping at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None:
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos] if self.pos < len(self.data) else None
            if b is None:
                self.marker = 0xD9
                continue
            if b == 0xFF:
                nxt = (self.data[self.pos + 1]
                       if self.pos + 1 < len(self.data) else 0xD9)
                if nxt == 0x00:
                    self.pos += 2
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
                self.marker = nxt        # restart or EOI: stop here
                continue
            self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        out = (self.bitbuf >> self.nbits) & ((1 << n) - 1)
        self.bitbuf &= (1 << self.nbits) - 1
        return out

    def huff(self, tbl: _HuffTable) -> int:
        code = self.bits(1)
        for ln in range(1, 17):
            if tbl.maxcode[ln] >= code >= tbl.mincode[ln]:
                return tbl.values[tbl.valptr[ln] + code - tbl.mincode[ln]]
            code = (code << 1) | self.bits(1)
        raise ValueError("invalid Huffman code in entropy stream")

    def restart(self) -> None:
        """Consume an RSTn marker and realign to a byte boundary."""
        if self.marker is None:
            # flush residual bits, then expect the marker in the stream
            self.bitbuf, self.nbits = 0, 0
            if (self.pos + 1 < len(self.data)
                    and self.data[self.pos] == 0xFF
                    and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
                self.pos += 2
                return
            raise ValueError("expected restart marker")
        if not (0xD0 <= self.marker <= 0xD7):
            raise ValueError(f"expected RSTn, got {self.marker:#x}")
        # skip the 2 marker bytes in the underlying stream
        i = self.data.index(bytes([0xFF, self.marker]), self.pos)
        self.pos = i + 2
        self.bitbuf, self.nbits, self.marker = 0, 0, None


def _extend(v: int, t: int) -> int:
    """T.81 F.12 EXTEND: map the t raw bits to the signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to HxWx3 uint8 RGB (grayscale frames are
    replicated to 3 channels, matching the PPM path's contract)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0
    coef: list[np.ndarray] | None = None         # progressive state
    geom: tuple | None = None
    i = 2
    while i + 1 < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xFF:                       # fill byte (B.1.1.2)
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
        seg = data[i + 4:i + 2 + seg_len]
        if marker == 0xDB:                       # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq:
                    tbl = np.frombuffer(
                        seg[j:j + 128], dtype=">u2").astype(np.int64)
                    j += 128
                else:
                    tbl = np.frombuffer(
                        seg[j:j + 64], dtype=np.uint8).astype(np.int64)
                    j += 64
                qt[tq] = tbl
        elif marker == 0xC4:                     # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1:j + 17])
                n = sum(bits)
                if len(bits) < 16 or j + 17 + n > len(seg):
                    raise ValueError("truncated DHT segment")
                huff[(tc, th)] = _HuffTable(bits, seg[j + 17:j + 17 + n])
                j += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):
            # SOF0 baseline / SOF1 extended sequential (r12: the
            # 12-bit-capable Huffman process — scan structure is
            # identical to baseline) / SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec not in (8, 12):
                raise NotImplementedError(f"{prec}-bit JPEG")
            if prec == 12 and marker == 0xC0:
                raise ValueError("baseline SOF0 must be 8-bit (B.2.2)")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "prec": prec,
                     "prog": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG process (SOF marker {marker:#x})"
            )
        elif marker == 0xDD:                     # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                     # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cs] = (tables >> 4, tables & 15)
            if frame.get("prog"):
                if coef is None:
                    coef, geom = _prog_init(frame)
                ss, se, ahal = seg[1 + 2 * ns:4 + 2 * ns]
                rd = _BitReader(data, i + 2 + seg_len)
                _progressive_scan(
                    rd, frame, scan, ss, se, ahal >> 4, ahal & 15,
                    huff, restart_interval, coef, geom,
                )
                # resume the marker walk at the next true marker (the
                # reader may sit before residual pad bits / RSTn bytes)
                j = rd.pos
                while j + 1 < len(data):
                    if data[j] == 0xFF:
                        nb = data[j + 1]
                        if nb == 0xFF:        # fill byte (legal pad
                            j += 1            # before any marker) —
                            continue          # stay on the run's tail
                        if nb != 0x00 and not 0xD0 <= nb <= 0xD7:
                            break
                    j += 1
                # no further marker (truncated stream, possibly on a
                # trailing lone 0xFF): fall out of the loop so the
                # accumulated coefficients still reconstruct coarsely
                i = j if j + 1 < len(data) else len(data)
                continue
            # baseline supports ns < frame components only via multiple
            # SOS scans; _decode_scan is single-interleaved-scan only —
            # refuse loudly rather than KeyError on the missing id
            missing = [c["id"] for c in frame["comps"] if c["id"] not in scan]
            if missing:
                raise NotImplementedError(
                    "multi-scan (non-interleaved) baseline JPEG: scan "
                    f"lacks component ids {missing}"
                )
            return _decode_scan(
                data, i + 2 + seg_len, frame, scan, qt, huff,
                restart_interval,
            )
        i += 2 + seg_len
    if frame is not None and frame.get("prog") and coef is not None:
        return _prog_finish(frame, coef, geom, qt)
    raise ValueError("no SOS marker found")


def _prog_init(frame):
    """Progressive state: per-component zigzag coefficient arrays on
    the MCU-padded block grid, plus the shared geometry tuple."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    coef = [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
        for c in comps
    ]
    return coef, (hmax, vmax, mcux, mcuy)


def _ac_first(rd, blk, ss, se, al, ac_tbl, eobrun):
    """One block of an AC first scan (Ah=0): T.81 G.1.2.2 — EOB runs,
    ZRL, point-transformed coefficients."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = rd.huff(ac_tbl)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16                           # ZRL
                continue
            eobrun = (1 << r) - 1                 # this block included
            if r:
                eobrun += rd.bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC index overflow")
        blk[k] = _extend(rd.bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine(rd, blk, ss, se, al, ac_tbl, eobrun):
    """One block of an AC refinement scan (Ah=Al+1): T.81 G.1.2.3 —
    each history-nonzero coefficient walked past consumes one
    correction bit; runs count only history-zero positions; EOB runs
    still consume the remaining correction bits of covered blocks."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(k):
        if rd.bits(1) and (int(blk[k]) & p1) == 0:
            blk[k] += p1 if blk[k] > 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rd.huff(ac_tbl)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r != 15:                       # EOBn
                    eobrun = 1 << r
                    if r:
                        eobrun += rd.bits(r)
                    break
            else:
                if s != 1:
                    raise ValueError("bad refinement magnitude")
                newval = p1 if rd.bits(1) else m1
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("AC refine overflow")
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:                            # finish this block
            if blk[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_scan(rd, frame, scan, ss, se, ah, al, huff, ri,
                      coef, geom):
    """Drain one progressive SOS into the coefficient state."""
    comps = frame["comps"]
    hmax, vmax, mcux, mcuy = geom
    idxs = [ci for ci, c in enumerate(comps) if c["id"] in scan]
    if not idxs:
        raise ValueError("scan references unknown component ids")
    if ss == 0 and se != 0:
        raise ValueError("progressive scan mixes DC and AC")
    # corrupt-header gate (T.81 B.2.3 ranges) — raise the same
    # ValueError class the other corrupt-input paths use instead of
    # letting numpy/dict lookups surface IndexError/KeyError
    if se > 63 or ss > se or ah > 13 or al > 13:
        raise ValueError(
            "corrupt progressive scan header "
            f"(Ss={ss} Se={se} Ah={ah} Al={al} out of range)"
        )
    for _ci in idxs:
        _td, _ta = scan[comps[_ci]["id"]]
        if ss == 0 and ah == 0 and (0, _td) not in huff:
            raise ValueError(
                "corrupt progressive scan header: DC huffman table "
                f"{_td} not defined"
            )
        if ss > 0 and (1, _ta) not in huff:
            raise ValueError(
                "corrupt progressive scan header: AC huffman table "
                f"{_ta} not defined"
            )
    if ss == 0 and len(idxs) > 1:
        # interleaved DC scan over MCUs
        pred = {ci: 0 for ci in idxs}
        cnt = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if ri and cnt == ri:
                    rd.restart()
                    pred = {ci: 0 for ci in idxs}
                    cnt = 0
                for ci in idxs:
                    c = comps[ci]
                    td = scan[c["id"]][0]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = coef[ci][my * c["v"] + by,
                                           mx * c["h"] + bx]
                            if ah == 0:
                                t = rd.huff(huff[(0, td)])
                                pred[ci] += _extend(rd.bits(t), t)
                                blk[0] = pred[ci] << al
                            elif rd.bits(1):
                                blk[0] |= (1 << al)
                cnt += 1
        return
    if len(idxs) > 1:
        raise ValueError("progressive AC scan with multiple components")
    ci = idxs[0]
    c = comps[ci]
    # non-interleaved scans walk the component's OWN ceil-block grid,
    # not the MCU-padded one (T.81 A.2.2)
    cw = -(-(frame["w"] * c["h"]) // (8 * hmax))
    ch = -(-(frame["h"] * c["v"]) // (8 * vmax))
    td, ta = scan[c["id"]]
    pred = 0
    eobrun = 0
    cnt = 0
    for byi in range(ch):
        for bxi in range(cw):
            if ri and cnt == ri:
                rd.restart()
                pred, eobrun, cnt = 0, 0, 0
            blk = coef[ci][byi, bxi]
            if ss == 0:                           # DC, single component
                if ah == 0:
                    t = rd.huff(huff[(0, td)])
                    pred += _extend(rd.bits(t), t)
                    blk[0] = pred << al
                elif rd.bits(1):
                    blk[0] |= (1 << al)
            elif ah == 0:
                eobrun = _ac_first(
                    rd, blk, ss, se, al, huff[(1, ta)], eobrun)
            else:
                eobrun = _ac_refine(
                    rd, blk, ss, se, al, huff[(1, ta)], eobrun)
            cnt += 1


def _shift(frame) -> float:
    """Level shift 2^(P-1) (F.1.1.3): 128 at 8-bit, 2048 at 12."""
    return float(1 << (frame.get("prec", 8) - 1))


def _scale(frame) -> float:
    """Down-conversion to the uint8 contract: 12-bit samples scale
    by 16 BEFORE the shared 128-centered chroma math in _finish, so
    color conversion and clipping stay depth-agnostic."""
    return float(1 << (frame.get("prec", 8) - 8))


def _prog_finish(frame, coef, geom, qt):
    """Dequantize + IDCT the accumulated coefficients once, at EOI."""
    comps = frame["comps"]
    hmax, vmax, mcux, mcuy = geom
    planes = []
    for ci, c in enumerate(comps):
        q = qt[c["tq"]]
        bh, bw = coef[ci].shape[:2]
        plane = np.zeros((bh * 8, bw * 8))
        for by in range(bh):
            for bx in range(bw):
                blk = np.zeros(64)
                blk[_ZIGZAG] = coef[ci][by, bx] * q
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                    _idct2(blk.reshape(8, 8)) + _shift(frame)
                ) / _scale(frame)
        planes.append(plane)
    return _finish(frame, comps, planes, hmax, vmax)


def _finish(frame, comps, planes, hmax, vmax):
    """Crop, chroma-upsample and color-convert decoded planes — shared
    by the baseline scan decoder and the progressive reconstruction."""
    h, w = frame["h"], frame["w"]
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        # replicate-upsample subsampled chroma to full resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        g = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)))
    rd = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count == restart_interval:
                rd.restart()
                pred = [0] * len(comps)
                mcu_count = 0
            for ci, c in enumerate(comps):
                td, ta = scan[c["id"]]
                dc_tbl, ac_tbl = huff[(0, td)], huff[(1, ta)]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = rd.huff(dc_tbl)
                        diff = _extend(rd.bits(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = rd.huff(ac_tbl)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16       # ZRL
                                    continue
                                break             # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(rd.bits(s), s)
                            k += 1
                        blk = np.zeros(64)
                        blk[_ZIGZAG] = zz * q
                        px = (_idct2(blk.reshape(8, 8))
                              + _shift(frame)) / _scale(frame)
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    return _finish(frame, comps, planes, hmax, vmax)


# ---------------------------------------------------------------------------
# minimal baseline encoder (tests only)
# ---------------------------------------------------------------------------

# T.81 Annex K.3 example Huffman tables (public spec data)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = bytes(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)       # byte stuffing
                self.buf, self.n = 0, 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)                    # pad with 1-bits (spec)


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg_gray(img: np.ndarray, quant: np.ndarray | None = None,
                     restart_interval: int = 0,
                     precision: int = 8) -> bytes:
    """Minimal grayscale encoder (tests only): pads to 8x8 blocks by
    edge replication, FDCT + quantize + Annex-K Huffman. Baseline
    SOF0 at 8-bit; ``precision=12`` (r12) writes SOF1 extended
    sequential with a 2048 level shift (16-bit DQT when any step
    exceeds 255) — input samples 0..4095."""
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12: {precision}")
    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape
    if quant is None:
        quant = np.full(64, 16 if precision == 8 else 256,
                        dtype=np.int64)
    quant = np.asarray(quant, dtype=np.int64).reshape(64)
    by, bx = -(-h // 8), -(-w // 8)
    padded = np.pad(img, ((0, by * 8 - h), (0, bx * 8 - w)), mode="edge")

    dc_t = _HuffTable(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_t = _HuffTable(_AC_LUM_BITS, _AC_LUM_VALS)
    wtr = _BitWriter()
    segs: list[bytes] = []
    pred = 0
    mcu = 0
    rst = 0
    for yb in range(by):
        for xb in range(bx):
            if restart_interval and mcu == restart_interval:
                wtr.flush()
                segs.append(bytes(wtr.out))
                segs.append(bytes([0xFF, 0xD0 + (rst & 7)]))
                rst += 1
                mcu = 0
                pred = 0
                wtr = _BitWriter()
            blk = (padded[yb * 8:yb * 8 + 8, xb * 8:xb * 8 + 8]
                   - float(1 << (precision - 1)))
            coef = _fdct2(blk)
            zz = np.round(coef.reshape(64)[_ZIGZAG] / quant).astype(int)
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            t = _csize(diff)
            code, ln = dc_t.enc[t]
            wtr.write(code, ln)
            if t:
                wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            last_nz = max(np.nonzero(zz[1:])[0] + 1) if np.any(zz[1:]) else 0
            k = 1
            while k <= last_nz:
                run = 0
                while zz[k] == 0:
                    run += 1
                    k += 1
                while run > 15:
                    code, ln = ac_t.enc[0xF0]
                    wtr.write(code, ln)
                    run -= 16
                v = int(zz[k])
                s = _csize(v)
                code, ln = ac_t.enc[(run << 4) | s]
                wtr.write(code, ln)
                wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
                k += 1
            if last_nz < 63:
                code, ln = ac_t.enc[0x00]       # EOB
                wtr.write(code, ln)
            mcu += 1
    wtr.flush()
    segs.append(bytes(wtr.out))
    entropy = b"".join(segs)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = b"\xff\xd8"
    if quant.max() > 255:
        out += seg(0xDB, bytes([0x10]) + b"".join(
            struct.pack(">H", int(x)) for x in quant))
    else:
        out += seg(0xDB, bytes([0]) + bytes(int(x) for x in quant))
    out += seg(0xC0 if precision == 8 else 0xC1,
               struct.pack(">BHHB", precision, h, w, 1)
               + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + _DC_LUM_VALS)
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_LUM_BITS) + _AC_LUM_VALS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += entropy
    out += b"\xff\xd9"
    return out


def _encode_block(wtr, blk, quant, pred, dc_t, ac_t) -> int:
    """FDCT + quantize + Huffman one 8x8 block; returns the new DC
    predictor."""
    coef = _fdct2(blk - 128.0)
    zz = np.round(coef.reshape(64)[_ZIGZAG] / quant).astype(int)
    diff = int(zz[0]) - pred
    t = _csize(diff)
    code, ln = dc_t.enc[t]
    wtr.write(code, ln)
    if t:
        wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    last_nz = max(np.nonzero(zz[1:])[0] + 1) if np.any(zz[1:]) else 0
    k = 1
    while k <= last_nz:
        run = 0
        while zz[k] == 0:
            run += 1
            k += 1
        while run > 15:
            c2, l2 = ac_t.enc[0xF0]
            wtr.write(c2, l2)
            run -= 16
        v = int(zz[k])
        s = _csize(v)
        c2, l2 = ac_t.enc[(run << 4) | s]
        wtr.write(c2, l2)
        wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
        k += 1
    if last_nz < 63:
        c2, l2 = ac_t.enc[0x00]
        wtr.write(c2, l2)
    return int(zz[0])


def encode_jpeg_rgb(img: np.ndarray, subsample: bool = False,
                    quant: np.ndarray | None = None) -> bytes:
    """Minimal baseline COLOR encoder (tests only): JFIF YCbCr, 4:4:4
    (``subsample=False``) or 4:2:0 (2x2-mean chroma), the Annex-K
    luminance Huffman tables for every component (legal: table ids are
    per-scan bindings)."""
    img = np.asarray(img, dtype=np.float64)
    h, w, _ = img.shape
    if quant is None:
        quant = np.full(64, 8, dtype=np.int64)
    quant = np.asarray(quant, dtype=np.int64).reshape(64)
    r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    hs, vs = (2, 2) if subsample else (1, 1)
    mcux, mcuy = -(-w // (8 * hs)), -(-h // (8 * vs))

    def pad_to(p, ph, pw):
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                      mode="edge")

    y_p = pad_to(y, mcuy * vs * 8, mcux * hs * 8)
    if subsample:
        cbp = pad_to(cb, mcuy * vs * 8, mcux * hs * 8)
        crp = pad_to(cr, mcuy * vs * 8, mcux * hs * 8)
        cb_s = cbp.reshape(cbp.shape[0] // 2, 2,
                           cbp.shape[1] // 2, 2).mean(axis=(1, 3))
        cr_s = crp.reshape(crp.shape[0] // 2, 2,
                           crp.shape[1] // 2, 2).mean(axis=(1, 3))
    else:
        cb_s = pad_to(cb, mcuy * 8, mcux * 8)
        cr_s = pad_to(cr, mcuy * 8, mcux * 8)

    dc_t = _HuffTable(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_t = _HuffTable(_AC_LUM_BITS, _AC_LUM_VALS)
    wtr = _BitWriter()
    preds = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(vs):
                for bx in range(hs):
                    y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                    preds[0] = _encode_block(
                        wtr, y_p[y0:y0 + 8, x0:x0 + 8], quant,
                        preds[0], dc_t, ac_t)
            preds[1] = _encode_block(
                wtr, cb_s[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8],
                quant, preds[1], dc_t, ac_t)
            preds[2] = _encode_block(
                wtr, cr_s[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8],
                quant, preds[2], dc_t, ac_t)
    wtr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    hv_y = (hs << 4) | vs
    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + bytes(int(x) for x in quant))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, hv_y, 0, 2, 0x11, 0, 3, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + _DC_LUM_VALS)
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_LUM_BITS) + _AC_LUM_VALS)
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    out += bytes(wtr.out)
    out += b"\xff\xd9"
    return out


# ---------------------------------------------------------------------------
# minimal progressive encoder (tests only)
# ---------------------------------------------------------------------------

# Progressive AC scans need EOBn (r, 0) codes the Annex K baseline
# table lacks. A flat canonical table — every symbol at length 8 —
# over the full (run 0-15, size 0-10) grid covers EOBn, ZRL, the
# first-pass magnitudes and the size-1 refinement codes; 176 symbols
# fit length 8 (max 256), so the canonical form is valid and trivially
# correct by construction.
_AC_PROG_VALS = bytes((r << 4) | s for r in range(16) for s in range(11))
_AC_PROG_BITS = [0] * 7 + [len(_AC_PROG_VALS)] + [0] * 8


def _pt(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al with truncation toward zero
    (T.81 G.1.2.1 — DC uses the arithmetic shift instead)."""
    return -((-v) >> al) if v < 0 else v >> al


def encode_jpeg_progressive(
    img: np.ndarray,
    quant: np.ndarray | None = None,
    successive: bool = True,
) -> bytes:
    """Minimal PROGRESSIVE encoder (tests only): grayscale (H, W) or
    4:4:4 color (H, W, 3), SOF2 + a fixed scan script. With
    ``successive=True`` the script uses one bit of successive
    approximation (DC Al=1 + refine, AC bands 1-5 / 6-63 at Al=1 +
    refines) so every decoder scan kind — DC first/refine, AC
    first/refine, EOB runs with correction bits — is exercised;
    ``successive=False`` emits spectral selection only (Ah=Al=0).
    The refinement encoder streams per T.81 G.1.2.3: runs count only
    history-zero positions, correction bits buffer until the next
    emitted code, and empty blocks accumulate cross-block EOB runs
    carrying their buffered bits."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    if quant is None:
        quant = np.full(64, 16 if gray else 8, dtype=np.int64)
    quant = np.asarray(quant, dtype=np.int64).reshape(64)
    if gray:
        planes = [img]
        ids = [1]
    else:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        ids = [1, 2, 3]
    h, w = planes[0].shape
    by, bx = -(-h // 8), -(-w // 8)
    zz = []
    for p in planes:
        padded = np.pad(
            p, ((0, by * 8 - h), (0, bx * 8 - w)), mode="edge"
        )
        arr = np.zeros((by, bx, 64), dtype=np.int64)
        for yb in range(by):
            for xb in range(bx):
                cf = _fdct2(
                    padded[yb * 8:yb * 8 + 8, xb * 8:xb * 8 + 8] - 128.0
                )
                arr[yb, xb] = np.round(
                    cf.reshape(64)[_ZIGZAG] / quant
                ).astype(np.int64)
        zz.append(arr)

    dc_t = _HuffTable(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_t = _HuffTable(_AC_PROG_BITS, _AC_PROG_VALS)

    def sos(comp_ids, ss, se, ah, al, entropy):
        hdr = bytes([len(comp_ids)])
        for cid in comp_ids:
            hdr += bytes([cid, 0x00])
        hdr += bytes([ss, se, (ah << 4) | al])
        return (struct.pack(">BBH", 0xFF, 0xDA, len(hdr) + 2)
                + hdr + entropy)

    def dc_first(al):
        wtr = _BitWriter()
        pred = [0] * len(planes)
        for yb in range(by):
            for xb in range(bx):
                for ci in range(len(planes)):
                    v = int(zz[ci][yb, xb, 0]) >> al
                    diff = v - pred[ci]
                    pred[ci] = v
                    t = _csize(diff)
                    code, ln = dc_t.enc[t]
                    wtr.write(code, ln)
                    if t:
                        wtr.write(
                            diff if diff >= 0 else diff + (1 << t) - 1, t)
        wtr.flush()
        return sos(ids, 0, 0, 0, al, bytes(wtr.out))

    def dc_refine(al):
        wtr = _BitWriter()
        for yb in range(by):
            for xb in range(bx):
                for ci in range(len(planes)):
                    wtr.write((int(zz[ci][yb, xb, 0]) >> al) & 1, 1)
        wtr.flush()
        return sos(ids, 0, 0, al + 1, al, bytes(wtr.out))

    def ac_first(ci, ss, se, al):
        wtr = _BitWriter()
        pending = 0

        def flush_eob():
            nonlocal pending
            if pending:
                rb = pending.bit_length() - 1
                code, ln = ac_t.enc[rb << 4]
                wtr.write(code, ln)
                if rb:
                    wtr.write(pending - (1 << rb), rb)
                pending = 0

        for yb in range(by):
            for xb in range(bx):
                band = [_pt(int(zz[ci][yb, xb, k]), al)
                        for k in range(ss, se + 1)]
                nz = [i for i, v in enumerate(band) if v]
                if not nz:
                    pending += 1
                    if pending == 32767:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                for i in range(nz[-1] + 1):
                    v = band[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_t.enc[0xF0]
                        wtr.write(code, ln)
                        run -= 16
                    s = _csize(v)
                    code, ln = ac_t.enc[(run << 4) | s]
                    wtr.write(code, ln)
                    wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if nz[-1] < len(band) - 1:
                    pending = 1
        flush_eob()
        wtr.flush()
        return sos([ids[ci]], ss, se, 0, al, bytes(wtr.out))

    def ac_refine(ci, ss, se, al):
        wtr = _BitWriter()
        pending = 0
        pend_bits: list[int] = []

        def flush_eob():
            nonlocal pending, pend_bits
            if pending:
                rb = pending.bit_length() - 1
                code, ln = ac_t.enc[rb << 4]
                wtr.write(code, ln)
                if rb:
                    wtr.write(pending - (1 << rb), rb)
                for bbit in pend_bits:
                    wtr.write(bbit, 1)
                pending, pend_bits = 0, []

        for yb in range(by):
            for xb in range(bx):
                events: list[tuple[int, list[int]]] = []
                r = 0
                corr: list[int] = []
                for k in range(ss, se + 1):
                    v = int(zz[ci][yb, xb, k])
                    a = abs(v) >> al
                    if a >= 2:                    # history-nonzero
                        corr.append(a & 1)
                    elif a == 1:                  # newly significant
                        events.append(
                            (((r << 4) | 1),
                             [1 if v > 0 else 0] + corr))
                        corr, r = [], 0
                    else:
                        r += 1
                        if r == 16:
                            events.append((0xF0, corr))
                            corr, r = [], 0
                if events:
                    flush_eob()
                    for sym, bits in events:
                        code, ln = ac_t.enc[sym]
                        wtr.write(code, ln)
                        for bbit in bits:
                            wtr.write(bbit, 1)
                    if r or corr:
                        pending, pend_bits = 1, corr
                else:
                    pending += 1
                    pend_bits += corr
                    if pending == 32767:
                        flush_eob()
        flush_eob()
        wtr.flush()
        return sos([ids[ci]], ss, se, al + 1, al, bytes(wtr.out))

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + bytes(int(x) for x in quant))
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for cid in ids:
        sof += bytes([cid, 0x11, 0])
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + _DC_LUM_VALS)
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_PROG_BITS) + _AC_PROG_VALS)
    if successive:
        out += dc_first(1)
        for ci in range(len(planes)):
            out += ac_first(ci, 1, 5, 1)
        for ci in range(len(planes)):
            out += ac_first(ci, 6, 63, 1)
        out += dc_refine(0)
        for ci in range(len(planes)):
            out += ac_refine(ci, 1, 5, 0)
        for ci in range(len(planes)):
            out += ac_refine(ci, 6, 63, 0)
    else:
        out += dc_first(0)
        for ci in range(len(planes)):
            out += ac_first(ci, 1, 5, 0)
        for ci in range(len(planes)):
            out += ac_first(ci, 6, 63, 0)
    out += b"\xff\xd9"
    return out
