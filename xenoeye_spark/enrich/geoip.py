"""GeoIP / ASN enrichment — longest-prefix-match attribute lookup.

Reference: geoip.c — mmap'd bitwise tries (geo4.db/as4.db) queried per flow
by the ``country(src host)`` / ``asn(dst host)`` function family
(filter.c:753-834, monit-objects.c:750-825); misses yield '?'
(monit-objects.c:766-769).

Spark-first design: the DB is a broadcast-sized dimension (GeoIP2-like DBs
are a few hundred MB worst case). Lookup is a vectorized Arrow pandas UDF:
for each distinct prefix length (<=33, usually ~15), mask the whole numpy
array of addresses and probe a dict — O(plens) vectorized passes per batch,
no shuffle, no per-row Python. The SQL-native alternative (explode +
broadcast join + max_by(plen)) costs a shuffle on the fact table; the UDF
path wins at scale and keeps the fact-table pipeline shuffle-free.
"""

from __future__ import annotations

import ipaddress

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

GEO_ATTRS = ["continent", "country_code", "country", "state", "city", "zip", "lat", "long"]
AS_ATTRS = ["asn", "asd"]


class GeoDB:
    """In-memory LPM table: rows of (cidr, attrs...)."""

    def __init__(self, rows: list[tuple[str, dict]]):
        # v4: plen -> {masked_net_int: attr_row_index}
        self.by_plen: dict[int, dict[int, int]] = {}
        # v6: plen -> {masked_prefix_bytes16: attr_row_index}
        self.by_plen6: dict[int, dict[bytes, int]] = {}
        self.attrs: list[dict] = []
        for cidr, attrs in rows:
            net = ipaddress.ip_network(cidr, strict=False)
            idx = len(self.attrs)
            self.attrs.append(attrs)
            if net.version == 4:
                self.by_plen.setdefault(net.prefixlen, {})[
                    int(net.network_address)
                ] = idx
            else:
                self.by_plen6.setdefault(net.prefixlen, {})[
                    net.network_address.packed
                ] = idx
        self.plens_desc = sorted(self.by_plen, reverse=True)
        self.plens6_desc = sorted(self.by_plen6, reverse=True)

    def lookup_np(self, ips: np.ndarray, attr: str, miss):
        """Vectorized LPM: returns object array of attr values ('?'/0 miss)."""
        out = np.full(len(ips), None, dtype=object)
        unresolved = np.ones(len(ips), dtype=bool)
        ips = ips.astype(np.int64)
        for plen in self.plens_desc:
            if not unresolved.any():
                break
            shift = 32 - plen
            masked = (ips >> shift) << shift if shift else ips
            table = self.by_plen[plen]
            # dict probe via pandas map (hash join against the dict)
            hits = pd.Series(masked[unresolved]).map(table)
            hit_mask = hits.notna().to_numpy()
            if hit_mask.any():
                idxs = np.flatnonzero(unresolved)[hit_mask]
                for i, ai in zip(idxs, hits.dropna().astype(int).to_numpy()):
                    out[i] = self.attrs[ai].get(attr, miss)
                unresolved[idxs] = False
        out[[v is None for v in out]] = miss
        return out

    def lookup6_py(self, addr: bytes, attr: str, miss):
        """LPM over packed 16-byte IPv6 addresses (scalar; batched below).
        int128 masking via Python big ints."""
        if addr is None or len(addr) != 16:
            return miss
        v = int.from_bytes(addr, "big")
        for plen in self.plens6_desc:
            shift = 128 - plen
            masked = ((v >> shift) << shift).to_bytes(16, "big")
            idx = self.by_plen6[plen].get(masked)
            if idx is not None:
                return self.attrs[idx].get(attr, miss)
        return miss

    def lookup_expr6(self, func: str, ip6_col: Column) -> Column:
        """IPv6 variant of lookup_expr over BinaryType(16)."""
        miss: object = 0 if func == "asn" else "?"
        ret_type = T.LongType() if func == "asn" else T.StringType()
        db = self

        @F.pandas_udf(ret_type)
        def lookup6(ips: pd.Series) -> pd.Series:
            return pd.Series([
                db.lookup6_py(bytes(a) if a is not None else None, func, miss)
                for a in ips
            ])

        return lookup6(ip6_col)

    def lookup_expr(self, func: str, ip_col: Column) -> Column:
        """Column for ``func(ip)`` — e.g. country/asn/asd — as an
        Arrow-batched pandas UDF over this (broadcast) DB."""
        miss: object = 0 if func == "asn" else "?"
        ret_type = T.LongType() if func == "asn" else T.StringType()
        db = self

        @F.pandas_udf(ret_type)
        def lookup(ips: pd.Series) -> pd.Series:
            arr = ips.fillna(-1).to_numpy()
            vals = db.lookup_np(arr, func, miss)
            null_mask = ips.isna().to_numpy()
            if null_mask.any():
                vals[null_mask] = miss
            return pd.Series(vals)

        return lookup(ip_col.cast("long"))

    def as_filter_geo_fn(self):
        """Adapter for FilterContext.geo_fn."""
        def geo_fn(func: str, ip_col: Column) -> Column:
            return self.lookup_expr(func, ip_col)
        return geo_fn

    @classmethod
    def from_df(cls, df) -> "GeoDB":
        """Build from a DataFrame with a ``cidr`` column + attr columns
        (the FIXTURES.md geoip/asndb table shapes)."""
        cols = [c for c in df.columns if c != "cidr"]
        rows = [
            (r["cidr"], {c: r[c] for c in cols})
            for r in df.collect()
        ]
        return cls(rows)


def load_geodb_dir(dir_path: str):
    """Load a geodb directory of CSVs (header ``cidr,<attr>,...``) into
    (geo_db, as_db). The reference ships binary tries (geo4.db/as4.db)
    built offline by xemkgeodb from public CSV data (EXTRA.md:41-54);
    this engine consumes the CSV form directly — same attrs, same LPM
    semantics, no bespoke binary format. Geo and AS stay SEPARATE tries
    exactly like the reference (geoip.c:62-88 vs 91-181): an AS /8 must
    not be shadowed by a more-specific geo-only /16. Files named
    ``as*.csv`` feed the AS db; every other csv feeds the geo db.
    Returns (geo_db | None, as_db | None)."""
    import csv
    import os

    if not os.path.isdir(dir_path):
        return None, None
    geo_rows: dict[str, dict] = {}
    as_rows: dict[str, dict] = {}
    for fname in sorted(os.listdir(dir_path)):
        if not fname.endswith(".csv"):
            continue
        target = as_rows if fname.startswith("as") else geo_rows
        with open(os.path.join(dir_path, fname), newline="") as fh:
            for r in csv.DictReader(fh):
                cidr = r.pop("cidr", None)
                if cidr:
                    target.setdefault(cidr, {}).update(r)
    geo = GeoDB(list(geo_rows.items())) if geo_rows else None
    asdb = GeoDB(list(as_rows.items())) if as_rows else None
    return geo, asdb


def make_geo_fn(geo_db: "GeoDB | None", as_db: "GeoDB | None"):
    """FilterContext.geo_fn dispatching asn/asd to the AS trie and the
    geography functions to the geo trie (filter.c:753-834)."""

    def geo_fn(func: str, ip_col: Column) -> Column:
        db = as_db if func in ("asn", "asd") else geo_db
        if db is None:
            raise ValueError(f"no geodb loaded for function {func!r}")
        return db.lookup_expr(func, ip_col)

    return geo_fn
