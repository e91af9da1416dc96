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
            # asn is NUMERIC in lookup_expr's declared LongType: a CSV
            # loader hands every attr over as a string, and a mixed
            # str/int object Series blows up in the Arrow conversion on
            # the first hit — normalize at build time
            if "asn" in attrs:
                try:
                    attrs = {**attrs, "asn": int(attrs["asn"])}
                except (TypeError, ValueError):
                    pass
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
        # columnar attribute store: attr name -> object ndarray aligned
        # with self.attrs, so the hit path gathers via np.take instead of
        # per-row dict.get (built lazily per queried attr)
        self._attr_cols: dict[str, np.ndarray] = {}
        # v6 prefix tables as (hi, lo) uint64 pandas frames per plen, for
        # vectorized merge probes over fixed-width byte views
        self._v6_tables: dict[int, pd.DataFrame] = {}
        for plen, table in self.by_plen6.items():
            keys = np.frombuffer(
                b"".join(table.keys()), dtype=">u8"
            ).reshape(-1, 2)
            self._v6_tables[plen] = pd.DataFrame(
                {
                    "_hi": keys[:, 0].astype(np.uint64),
                    "_lo": keys[:, 1].astype(np.uint64),
                    "_idx": np.fromiter(
                        table.values(), dtype=np.int64, count=len(table)
                    ),
                }
            )

    def _attr_col(self, attr: str) -> np.ndarray:
        col = self._attr_cols.get(attr)
        if col is None:
            col = np.array(
                [a.get(attr) for a in self.attrs], dtype=object
            )
            self._attr_cols[attr] = col
        return col

    def lookup_np(self, ips: np.ndarray, attr: str, miss):
        """Vectorized LPM: returns object array of attr values ('?'/0 miss).
        The hit path is columnar end-to-end: dict probe via pandas map
        (hash join), then one fancy-index gather from the per-attr column
        — no per-row Python even when every address hits."""
        out = np.full(len(ips), None, dtype=object)
        unresolved = np.ones(len(ips), dtype=bool)
        ips = ips.astype(np.int64)
        attr_col = self._attr_col(attr)
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
                ai = hits.dropna().to_numpy(dtype=np.int64)
                out[idxs] = attr_col[ai]
                unresolved[idxs] = False
        out[pd.isna(out)] = miss
        return out

    def lookup6_py(self, addr: bytes, attr: str, miss):
        """LPM over one packed 16-byte IPv6 address (scalar twin of
        lookup6_np, kept for tests/spot checks). int128 masking via
        Python big ints."""
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

    def lookup6_np(self, addrs: list, attr: str, miss):
        """Vectorized v6 LPM over a batch of 16-byte addresses: the batch
        becomes an (N, 2) big-endian uint64 view (fixed-width bytes, no
        per-row int conversion); each prefix length masks hi/lo with two
        shifts and probes via a pandas merge against the per-plen
        (hi, lo, idx) table — all C-side."""
        n = len(addrs)
        out = np.full(n, None, dtype=object)
        ok = np.fromiter(
            (a is not None and len(a) == 16 for a in addrs), dtype=bool,
            count=n,
        )
        if not ok.any():
            out[:] = miss
            return out
        packed = b"".join(bytes(a) for a, k in zip(addrs, ok) if k)
        hilo = np.frombuffer(packed, dtype=">u8").reshape(-1, 2)
        hi = hilo[:, 0].astype(np.uint64)
        lo = hilo[:, 1].astype(np.uint64)
        rows = np.flatnonzero(ok)  # position in `out` for each hi/lo row
        attr_col = self._attr_col(attr)
        unresolved = np.ones(len(rows), dtype=bool)
        for plen in self.plens6_desc:
            if not unresolved.any():
                break
            if plen <= 64:
                s = np.uint64(64 - plen)
                hi_m = (hi >> s) << s if plen < 64 else hi
                lo_m = np.zeros_like(lo)
            else:
                s = np.uint64(128 - plen)
                hi_m = hi
                lo_m = (lo >> s) << s if plen < 128 else lo
            probe = pd.DataFrame(
                {
                    "_hi": hi_m[unresolved],
                    "_lo": lo_m[unresolved],
                    "_pos": np.flatnonzero(unresolved),
                }
            )
            m = probe.merge(self._v6_tables[plen], on=["_hi", "_lo"], how="inner")
            if len(m):
                pos = m["_pos"].to_numpy()
                out[rows[pos]] = attr_col[m["_idx"].to_numpy()]
                unresolved[pos] = False
        out[pd.isna(out)] = miss
        return out

    def lookup_expr6(self, func: str, ip6_col: Column) -> Column:
        """IPv6 variant of lookup_expr over BinaryType(16)."""
        miss: object = 0 if func == "asn" else "?"
        ret_type = T.LongType() if func == "asn" else T.StringType()
        db = self

        @F.pandas_udf(ret_type)
        def lookup6(ips: pd.Series) -> pd.Series:
            return pd.Series(db.lookup6_np(ips.tolist(), func, miss))

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
        def geo_fn(func: str, ip_col: Column, v6: bool = False) -> Column:
            if v6:
                return self.lookup_expr6(func, ip_col)
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
    not be shadowed by a more-specific geo-only /16. The AS db is fed by
    exactly ``as.csv`` / ``as4.csv`` / ``as6.csv`` (the xemkgeodb input
    names, EXTRA.md:41-54) — NOT every ``as*`` file, so e.g.
    ``asia.csv`` correctly lands in the geo db. Returns
    (geo_db | None, as_db | None)."""
    import csv
    import os
    import re

    if not os.path.isdir(dir_path):
        return None, None
    geo_rows: dict[str, dict] = {}
    as_rows: dict[str, dict] = {}
    as_name = re.compile(r"^as[46]?\.csv$")
    for fname in sorted(os.listdir(dir_path)):
        if not fname.endswith(".csv"):
            continue
        target = as_rows if as_name.match(fname) else geo_rows
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

    def geo_fn(func: str, ip_col: Column, v6: bool = False) -> Column:
        db = as_db if func in ("asn", "asd") else geo_db
        if db is None:
            raise ValueError(f"no geodb loaded for function {func!r}")
        if v6:
            return db.lookup_expr6(func, ip_col)
        return db.lookup_expr(func, ip_col)

    return geo_fn
