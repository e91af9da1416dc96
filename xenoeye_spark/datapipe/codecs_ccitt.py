"""Pure-python CCITT fax codecs — Modified Huffman 1-D (ITU-T T.4,
TIFF Compression=2) and Group 4 2-D (ITU-T T.6, TIFF Compression=4)
— decoder plus a minimal test encoder, for the bilevel scans that
dominate scanned-document corpora. Public specs: ITU-T T.4/T.6 (the
run-length and mode code tables below are the published Table 2/3/4
and T.6 §4.2 data, reproduced in every fax implementation).

Representation: a decoded page is an (H, W) uint8 array of {0, 1}
PIXEL VALUES in fax polarity — 0 = white, 1 = black (the caller maps
polarity via the TIFF PhotometricInterpretation tag). Lines are
coded as alternating white/black runs starting white (a line that
starts black begins with a zero-length white run).

T.6 (G4) codes every line 2-D against the previous (reference) line
— pass / vertical(-3..3) / horizontal modes over "changing element"
positions — with an imaginary all-white line above the first. T.4 MH
codes every line independently as run lengths: makeup codes (64-step
multiples, extended to 2560) followed by a terminating code (0..63);
TIFF Compression=2 byte-aligns each row and uses no EOLs.

Decode cost is O(coded bits) per strip with a dict-based prefix
decoder (max code length 13/14 bits) — bounded by the image's own
bytes, inside the same Arrow batch as the other decoders.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# T.4 run-length code tables: {run_length: bitstring}
# ---------------------------------------------------------------------------

WHITE_CODES = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011",
    14: "110100", 15: "110101", 16: "101010", 17: "101011",
    18: "0100111", 19: "0001100", 20: "0001000", 21: "0010111",
    22: "0000011", 23: "0000100", 24: "0101000", 25: "0101011",
    26: "0010011", 27: "0100100", 28: "0011000", 29: "00000010",
    30: "00000011", 31: "00011010", 32: "00011011", 33: "00010010",
    34: "00010011", 35: "00010100", 36: "00010101", 37: "00010110",
    38: "00010111", 39: "00101000", 40: "00101001", 41: "00101010",
    42: "00101011", 43: "00101100", 44: "00101101", 45: "00000100",
    46: "00000101", 47: "00001010", 48: "00001011", 49: "01010010",
    50: "01010011", 51: "01010100", 52: "01010101", 53: "00100100",
    54: "00100101", 55: "01011000", 56: "01011001", 57: "01011010",
    58: "01011011", 59: "01001010", 60: "01001011", 61: "00110010",
    62: "00110011", 63: "00110100",
    # makeup
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100",
    512: "01100101", 576: "01101000", 640: "01100111",
    704: "011001100", 768: "011001101", 832: "011010010",
    896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010",
    1664: "011000", 1728: "010011011",
}

BLACK_CODES = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
    # makeup
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101",
    1152: "0000001110110", 1216: "0000001110111",
    1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101",
    1536: "0000001011010", 1600: "0000001011011",
    1664: "0000001100100", 1728: "0000001100101",
}

# T.4 Table 4 extended makeups (colour-independent, 1792..2560)
EXT_CODES = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# T.6 §4.2 two-dimensional mode codes
_MODE_V0 = "1"
_MODE_VR = {1: "011", 2: "000011", 3: "0000011"}
_MODE_VL = {1: "010", 2: "000010", 3: "0000010"}
_MODE_H = "001"
_MODE_P = "0001"


def _decode_map(*tables: dict[int, str]) -> dict[str, int]:
    out: dict[str, int] = {}
    for t in tables:
        for run, code in t.items():
            assert code not in out, f"duplicate code {code}"
            out[code] = run
    return out

_WHITE_DEC = _decode_map(WHITE_CODES, EXT_CODES)
_BLACK_DEC = _decode_map(BLACK_CODES, EXT_CODES)


class _Bits:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0                      # bit position

    def read(self, n: int = 1) -> int:
        out = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("truncated CCITT stream")
            out = (out << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out

    def peek_str(self, n: int) -> str:
        save = self.pos
        bits = []
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                break
            bits.append(str((self.data[byte] >> (7 - (self.pos & 7))) & 1))
            self.pos += 1
        self.pos = save
        return "".join(bits)

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self) -> bool:
        return self.pos >= 8 * len(self.data)


def _read_run(bits: _Bits, white: bool) -> int:
    """One complete run length: zero or more makeup codes (>= 64)
    then a terminating code (0..63), per T.4 §4.1."""
    table = _WHITE_DEC if white else _BLACK_DEC
    total = 0
    while True:
        code = ""
        for _ in range(14):
            code += str(bits.read(1))
            if code in table:
                break
        else:
            raise ValueError(
                f"bad {'white' if white else 'black'} run code {code!r}"
            )
        run = table[code]
        total += run
        if run < 64:
            return total


def _line_from_runs(runs: list[int], w: int) -> np.ndarray:
    line = np.zeros(w, dtype=np.uint8)
    pos = 0
    color = 0
    for r in runs:
        if color:
            line[pos:pos + r] = 1
        pos += r
        color ^= 1
    if pos != w:
        raise ValueError(f"CCITT row totals {pos} pixels, expected {w}")
    return line


def decode_mh(data: bytes, w: int, h: int) -> np.ndarray:
    """T.4 Modified Huffman 1-D (TIFF Compression=2): each row its own
    alternating white/black run sequence starting white, byte-aligned
    (TIFF 6.0 §10)."""
    bits = _Bits(data)
    out = np.zeros((h, w), dtype=np.uint8)
    for y in range(h):
        runs = []
        total = 0
        white = True
        while total < w:
            r = _read_run(bits, white)
            runs.append(r)
            total += r
            white = not white
        out[y] = _line_from_runs(runs, w)
        bits.align()
    return out


def _transitions(line: np.ndarray) -> list[int]:
    """Changing-element positions (pixel index where color differs from
    the previous pixel; line starts imaginarily white), terminated by
    two sentinels at w."""
    w = len(line)
    d = np.flatnonzero(np.diff(np.concatenate([[0], line])) != 0)
    return list(d) + [w, w]


def decode_g4(data: bytes, w: int, h: int) -> np.ndarray:
    """T.6 Group 4 2-D decode (TIFF Compression=4): pass / vertical /
    horizontal modes against the reference line, imaginary all-white
    first reference, no EOLs (EOFB, if present, is simply never
    reached — we stop after h lines)."""
    bits = _Bits(data)
    out = np.zeros((h, w), dtype=np.uint8)
    ref = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        trans = _transitions(ref)
        line = np.zeros(w, dtype=np.uint8)
        a0 = -1
        color = 0
        while a0 < w:
            # b1: first changing element on ref > a0 with opposite
            # colour to a0's colour. With trans alternating
            # white->black (even idx) / black->white (odd idx), the
            # white coding colour wants an even-index transition.
            want = 0 if color == 0 else 1
            b1 = w
            b2 = w
            for ti, t in enumerate(trans):
                if t > a0 and (ti & 1) == want and t <= w:
                    b1 = t
                    b2 = trans[ti + 1] if ti + 1 < len(trans) else w
                    break
            look = bits.peek_str(7)
            if look.startswith(_MODE_V0):
                bits.read(1)
                a1 = b1
                off = 0
            elif look.startswith(_MODE_VR[1]):
                bits.read(3); a1 = b1 + 1; off = 0
            elif look.startswith(_MODE_VL[1]):
                bits.read(3); a1 = b1 - 1; off = 0
            elif look.startswith(_MODE_H):
                bits.read(3)
                start = max(a0, 0)
                r1 = _read_run(bits, color == 0)
                r2 = _read_run(bits, color != 0)
                a1 = start + r1
                a2 = a1 + r2
                if a2 > w or a1 > w:
                    raise ValueError("G4 horizontal runs overflow row")
                if color == 0:
                    line[a1:a2] = 1
                else:
                    line[start:a1] = 1
                a0 = a2
                continue
            elif look.startswith(_MODE_P):
                bits.read(4)
                if color:
                    line[max(a0, 0):b2] = 1
                a0 = b2
                continue
            elif look.startswith(_MODE_VR[2]):
                bits.read(6); a1 = b1 + 2; off = 0
            elif look.startswith(_MODE_VL[2]):
                bits.read(6); a1 = b1 - 2; off = 0
            elif look.startswith(_MODE_VR[3]):
                bits.read(7); a1 = b1 + 3; off = 0
            elif look.startswith(_MODE_VL[3]):
                bits.read(7); a1 = b1 - 3; off = 0
            else:
                raise ValueError(
                    f"bad G4 mode code at bit {bits.pos}: {look!r}"
                )
            del off
            if a1 < 0 or a1 > w:
                raise ValueError("G4 vertical lands outside the row")
            if color:
                line[max(a0, 0):a1] = 1
            a0 = a1
            color ^= 1
        out[y] = line
        ref = line
    return out


# ---------------------------------------------------------------------------
# minimal encoders (tests only)
# ---------------------------------------------------------------------------

class _BitsW:
    def __init__(self):
        self.bits: list[str] = []

    def put(self, code: str) -> None:
        self.bits.append(code)

    def align(self) -> None:
        n = sum(len(b) for b in self.bits) & 7
        if n:
            self.bits.append("0" * (8 - n))

    def tobytes(self) -> bytes:
        s = "".join(self.bits)
        s += "0" * ((-len(s)) % 8)
        return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


def _put_run(wtr: _BitsW, run: int, white: bool) -> None:
    table = WHITE_CODES if white else BLACK_CODES
    while run >= 2624:                    # 2560 makeup + max terminator
        wtr.put(EXT_CODES[2560])
        run -= 2560
    if run >= 64:
        mk = (run // 64) * 64
        if mk > 1728:
            wtr.put(EXT_CODES[mk])
        else:
            wtr.put(table[mk])
        run -= mk
    wtr.put(table[run])


def _row_runs(line: np.ndarray) -> list[int]:
    runs = []
    pos = 0
    color = 0
    for t in _transitions(line)[:-2] + [len(line)]:
        runs.append(t - pos)
        pos = t
        color ^= 1
    if not runs or len(runs) == 1 and runs[0] == len(line):
        return [len(line)] if line[0] == 0 else [0, len(line)]
    return runs


def encode_mh(img: np.ndarray) -> bytes:
    """T.4 MH 1-D writer (tests only), TIFF Compression=2 framing:
    rows independent, byte-aligned, no EOLs."""
    img = np.asarray(img, dtype=np.uint8)
    wtr = _BitsW()
    for y in range(img.shape[0]):
        runs = _row_runs(img[y])
        white = True
        for r in runs:
            _put_run(wtr, r, white)
            white = not white
        wtr.align()
    return wtr.tobytes()


def encode_g4(img: np.ndarray) -> bytes:
    """T.6 G4 writer (tests only): the standard greedy mode choice —
    pass when b2 < a1, vertical when |a1-b1| <= 3, horizontal
    otherwise. No EOFB (TIFF readers don't need it)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    wtr = _BitsW()
    ref = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        line = img[y]
        ctr = _transitions(line)
        a0 = -1
        color = 0
        while a0 < w:
            a1 = next((t for t in ctr if t > a0), w) if a0 >= 0 else (
                ctr[0] if ctr else w)
            if a1 > w:
                a1 = w
            rtr = _transitions(ref)
            want = 0 if color == 0 else 1
            b1 = w
            b2 = w
            for ti, t in enumerate(rtr):
                if t > a0 and (ti & 1) == want and t <= w:
                    b1 = t
                    b2 = rtr[ti + 1] if ti + 1 < len(rtr) else w
                    break
            if b2 < a1:
                wtr.put(_MODE_P)
                a0 = b2
                continue
            d = a1 - b1
            if -3 <= d <= 3:
                if d == 0:
                    wtr.put(_MODE_V0)
                elif d > 0:
                    wtr.put(_MODE_VR[d])
                else:
                    wtr.put(_MODE_VL[-d])
                a0 = a1
                color ^= 1
                continue
            a2 = next((t for t in ctr if t > a1), w)
            if a2 > w:
                a2 = w
            start = max(a0, 0)
            wtr.put(_MODE_H)
            _put_run(wtr, a1 - start, color == 0)
            _put_run(wtr, a2 - a1, color != 0)
            a0 = a2
        ref = line
    return wtr.tobytes()
