"""Geo/AS lookup checker — parity with the reference's ``xegeoq`` tool
(EXTRA.md:278-292): query the GeoIP/ASN dimension for one or more
addresses and print every attribute, without standing up Spark.

Usage:
    python scripts/xegeoq.py GEO_CSV IP [IP...]

GEO_CSV: header line ``cidr,<attr>,<attr>,...`` then one row per prefix —
the same table the engine broadcasts for LPM joins (enrich/geoip.py).
Both IPv4 and IPv6 prefixes/addresses are supported.
"""

from __future__ import annotations

import csv
import ipaddress
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xenoeye_spark.enrich.geoip import GeoDB  # noqa: E402

import numpy as np  # noqa: E402


def load_csv(path: str) -> tuple[GeoDB, list[str]]:
    with open(path, newline="") as fh:
        reader = csv.DictReader(fh)
        attrs = [c for c in reader.fieldnames if c != "cidr"]
        rows = [(r["cidr"], {a: r[a] for a in attrs}) for r in reader]
    return GeoDB(rows), attrs


def main(argv: list[str]) -> int:
    if len(argv) < 3:
        print(__doc__)
        return 2
    db, attrs = load_csv(argv[1])
    for ip_s in argv[2:]:
        addr = ipaddress.ip_address(ip_s)
        vals = {}
        for a in attrs:
            if addr.version == 4:
                vals[a] = db.lookup_np(np.array([int(addr)]), a, "?")[0]
            else:
                vals[a] = db.lookup6_py(addr.packed, a, "?")
        print(ip_s, " ".join(f"{a}={vals[a]}" for a in attrs))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
