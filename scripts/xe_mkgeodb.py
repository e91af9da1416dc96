"""xemkgeodb parity — build the collector's geodb directory from public
GeoIP / AS CSV databases.

Reference: xemkgeodb.c (usage EXTRA.md:41-54, 199-212). The reference
compiles CSVs into binary tries (geo4.db/as4.db...); this engine's
``load_geodb_dir`` consumes CSVs directly, so the tool's job here is
format conversion, not a bespoke binary format:

  * ipapi geolocation CSVs (``ip_version,start_ip,end_ip,continent,...``,
    xemkgeodb.c:32) — ranges are decomposed into minimal CIDR subnets
    exactly like the reference's split loop (xemkgeodb.c:113-185), via
    ``ipaddress.summarize_address_range``;
  * RKN / MaxMind-style pairs: a Locations file
    (``geoname_id,locale_code,...``, xemkgeodb.c:35) followed by Blocks
    files (``network,geoname_id,...``, xemkgeodb.c:40) — the order
    matters, Locations first, like the reference (EXTRA.md:52);
  * AS databases: RKN (``network,autonomous_system_number,
    autonomous_system_organization``, xemkgeodb.c:45) or the headerless
    sapics range form (``start_ip,end_ip,asn[,name]``, EXTRA.md:199).

Usage: xe_mkgeodb.py -o OUTDIR -t {geo,as} [-v] FILE...
Writes geo4.csv/geo6.csv or as4.csv/as6.csv into OUTDIR (the names
``load_geodb_dir`` routes to the right trie).
"""

from __future__ import annotations

import argparse
import csv
import ipaddress
import os
import sys

GEO_COLS = ["continent", "country_code", "country", "state", "city",
            "zip", "lat", "long"]
AS_COLS = ["asn", "asd"]

IPAPI_SIGN = ["ip_version", "start_ip", "end_ip", "continent",
              "country_code", "country", "state", "city", "zip"]
RKN_LOC_SIGN = ["geoname_id", "locale_code", "continent_code"]
RKN_DATA_SIGN = ["network", "geoname_id"]
AS_RKN_SIGN = ["network", "autonomous_system_number"]


def _ranges_to_cidrs(start: str, end: str):
    try:
        a = ipaddress.ip_address(start.strip())
        b = ipaddress.ip_address(end.strip())
    except ValueError:
        return []
    if a.version != b.version or int(b) < int(a):
        return []
    return ipaddress.summarize_address_range(a, b)


def _detect(header: list[str]) -> str:
    h = [c.strip().lower() for c in header]
    if h[: len(IPAPI_SIGN)] == IPAPI_SIGN:
        return "ipapi"
    if h[: len(RKN_LOC_SIGN)] == RKN_LOC_SIGN:
        return "rkn_loc"
    if h[: len(AS_RKN_SIGN)] == AS_RKN_SIGN:
        return "as_rkn"
    if h[: len(RKN_DATA_SIGN)] == RKN_DATA_SIGN:
        return "rkn_data"
    # headerless sapics asn form: start,end,asn[,name]
    try:
        ipaddress.ip_address(header[0].strip())
        ipaddress.ip_address(header[1].strip())
        return "as_range_headerless"
    except (ValueError, IndexError):
        raise SystemExit(f"unrecognized CSV header: {header[:6]}")


def convert(files: list[str], kind: str, out_dir: str,
            verbose: bool = False) -> dict[str, int]:
    os.makedirs(out_dir, exist_ok=True)
    rows4: list[list] = []
    rows6: list[list] = []
    locations: dict[str, dict] = {}
    counts = {"rows": 0, "skipped": 0}

    def emit(net, attrs):
        (rows4 if net.version == 4 else rows6).append([str(net)] + attrs)
        counts["rows"] += 1

    for path in files:
        with open(path, newline="", encoding="utf-8", errors="replace") as fh:
            rd = csv.reader(fh)
            first = next(rd, None)
            if first is None:
                continue
            fmt = _detect(first)
            if verbose:
                print(f"{path}: {fmt}", file=sys.stderr)
            if fmt == "as_range_headerless":
                fh.seek(0)
                rd = csv.reader(fh)
            if fmt == "ipapi":
                if kind != "geo":
                    raise SystemExit(f"{path}: geo CSV given with -t as")
                for rec in rd:
                    if len(rec) < 13:
                        counts["skipped"] += 1
                        continue
                    (_, start, end, cont, cc, country, state, city, zipc,
                     _tz, lat, lon, _acc) = rec[:13]
                    attrs = [cont, cc, country, state, city, zipc, lat, lon]
                    for net in _ranges_to_cidrs(start, end):
                        emit(net, attrs)
            elif fmt == "rkn_loc":
                if kind != "geo":
                    raise SystemExit(f"{path}: geo CSV given with -t as")
                # geoname_id,locale_code,continent_code,continent_name,
                # country_iso_code,country_name,sub1_iso,sub1_name,...,city
                for rec in rd:
                    if len(rec) < 11:
                        counts["skipped"] += 1
                        continue
                    locations[rec[0]] = {
                        "continent": rec[2].lower(),
                        "country_code": rec[4].lower(),
                        "country": rec[5],
                        "state": rec[7],
                        "city": rec[10],
                    }
            elif fmt == "rkn_data":
                if kind != "geo":
                    raise SystemExit(f"{path}: geo CSV given with -t as")
                if not locations:
                    raise SystemExit(
                        f"{path}: Blocks file before Locations — the "
                        "Locations CSV must come first (EXTRA.md:52)"
                    )
                for rec in rd:
                    if len(rec) < 9:
                        counts["skipped"] += 1
                        continue
                    loc = locations.get(rec[1], {})
                    try:
                        net = ipaddress.ip_network(rec[0].strip(),
                                                   strict=False)
                    except ValueError:
                        counts["skipped"] += 1
                        continue
                    emit(net, [
                        loc.get("continent", ""), loc.get("country_code", ""),
                        loc.get("country", ""), loc.get("state", ""),
                        loc.get("city", ""), rec[6], rec[7], rec[8],
                    ])
            elif fmt == "as_rkn":
                if kind != "as":
                    raise SystemExit(f"{path}: AS CSV given with -t geo")
                for rec in rd:
                    if len(rec) < 3:
                        counts["skipped"] += 1
                        continue
                    try:
                        net = ipaddress.ip_network(rec[0].strip(),
                                                   strict=False)
                    except ValueError:
                        counts["skipped"] += 1
                        continue
                    emit(net, [rec[1], rec[2]])
            elif fmt == "as_range_headerless":
                if kind != "as":
                    raise SystemExit(f"{path}: AS CSV given with -t geo")
                for rec in rd:
                    if len(rec) < 3:
                        counts["skipped"] += 1
                        continue
                    name = rec[3] if len(rec) > 3 else ""
                    for net in _ranges_to_cidrs(rec[0], rec[1]):
                        emit(net, [rec[2], name])

    hdr = ["cidr"] + (GEO_COLS if kind == "geo" else AS_COLS)
    for suffix, rows in (("4", rows4), ("6", rows6)):
        if not rows:
            continue
        name = f"{kind}{suffix}.csv"
        with open(os.path.join(out_dir, name), "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(hdr)
            w.writerows(rows)
        if verbose:
            print(f"wrote {name}: {len(rows)} prefixes", file=sys.stderr)
    return counts


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="xe_mkgeodb")
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("-t", "--type", choices=["geo", "as"], default="geo")
    ap.add_argument("-v", "--verbose", action="store_true")
    ap.add_argument("files", nargs="+")
    args = ap.parse_args(argv)
    counts = convert(args.files, args.type, args.out, args.verbose)
    if args.verbose:
        print(f"{counts['rows']} prefixes, {counts['skipped']} skipped",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
