"""Flow-packet decoder printout — parity with the reference's ``xesflow``
sFlow debug tool (EXTRA.md:527-569), extended to NetFlow v5/v9/IPFIX.

Usage:
    python scripts/xesflow.py FILE [--hex] [--format auto|sflow|netflow]

FILE holds one export datagram (raw bytes, or a hex string with --hex).
Each decoded flow row prints as ``field=value`` pairs — the manual
verification loop for decoder work, like the reference's tools.
"""

from __future__ import annotations

import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xenoeye_spark.sources.netflow import TemplateStore, parse_packet  # noqa: E402
from xenoeye_spark.sources.sflow import parse_sflow  # noqa: E402


def fmt_val(v):
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return v


def main(argv: list[str]) -> int:
    # accept BOTH '--format X' and '--format=X' (the usage line
    # advertises the space form; it used to fall through silently and
    # the value became a bogus positional file argument)
    args: list[str] = []
    opts: set[str] = set()
    fmt = "auto"
    it = iter(argv[1:])
    for a in it:
        if a == "--format":
            fmt = next(it, fmt)
        elif a.startswith("--format="):
            fmt = a.split("=", 1)[1]
        elif a.startswith("--"):
            opts.add(a)
        else:
            args.append(a)
    if fmt not in ("auto", "sflow", "netflow"):
        print(f"unknown --format {fmt!r}", file=sys.stderr)
        return 2
    if not args:
        print(__doc__)
        return 2
    with open(args[0], "rb") as fh:
        data = fh.read()
    if "--hex" in opts:
        data = bytes.fromhex(data.decode().strip())

    rows = []
    if fmt in ("auto", "sflow"):
        # sFlow v5 datagrams start with version 5 as a 4-byte word;
        # NetFlow v5 starts with version 5 as a 2-byte word — disambiguate
        # by the full 32-bit value (sFlow: 0x00000005 means bytes 0-1 are 0)
        if len(data) >= 4 and struct.unpack_from(">I", data, 0)[0] == 5:
            rows = parse_sflow(data)
    if not rows and fmt in ("auto", "netflow"):
        rows = parse_packet(data, TemplateStore())
    if not rows:
        print("no flow rows decoded", file=sys.stderr)
        return 1
    for i, row in enumerate(rows):
        kv = " ".join(
            f"{k}={fmt_val(v)}" for k, v in sorted(row.items()) if v is not None
        )
        print(f"[{i}] {kv}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
