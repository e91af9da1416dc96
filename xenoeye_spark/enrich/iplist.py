"""Named IP lists — membership of an address in a CIDR set.

Reference: iplist.c — per-list bitwise tries built from one-CIDR-per-line
files (iplist.c:218-297), looked up per flow (iplist.c:160-216). Filters
reference lists by name: ``dst net bogon``.

Spark-first design (no UDF, no shuffle): membership is
    OR over distinct prefix lengths L: (ip >> (32-L)) IN {nets with len L}
Each IN-set compiles to a codegen hash-set probe; with the handful of
distinct prefix lengths real lists have, the whole predicate stays inside
WholeStageCodegen. For very large lists (millions of prefixes) use
``match_expr_bucketed`` (broadcast-join form) instead.
"""

from __future__ import annotations

import ipaddress
from collections import defaultdict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class IpList:
    def __init__(self, name: str, cidrs: list[str]):
        self.name = name
        self.v4: dict[int, set[int]] = defaultdict(set)   # plen -> masked nets
        self.v6: dict[int, set[bytes]] = defaultdict(set)  # plen -> packed prefixes
        for c in cidrs:
            c = c.strip()
            if not c or c.startswith("#"):
                continue
            net = ipaddress.ip_network(c, strict=False)
            if net.version == 4:
                self.v4[net.prefixlen].add(int(net.network_address))
            else:
                self.v6[net.prefixlen].add(net.network_address.packed)

    @classmethod
    def from_file(cls, name: str, path: str) -> "IpList":
        with open(path) as fh:
            return cls(name, fh.readlines())

    def match_expr(self, ip_col: Column) -> Column:
        """IPv4 membership as a pure Column predicate."""
        conds: list[Column] = []
        c = ip_col.cast("long")
        for plen in sorted(self.v4, reverse=True):
            nets = self.v4[plen]
            if plen == 0:
                conds.append(F.lit(True))
                continue
            shift = 32 - plen
            shifted = F.shiftrightunsigned(c, shift) if shift else c
            vals = [n >> shift for n in nets]
            conds.append(
                shifted.isin(vals) if len(vals) > 1 else (shifted == F.lit(vals[0]))
            )
        if not conds:
            return F.lit(False)
        out = conds[0]
        for cond in conds[1:]:
            out = out | cond
        return ip_col.isNotNull() & out

    def match_expr6(self, ip6_col: Column) -> Column:
        """IPv6 membership over BinaryType(16), bit-granular like the
        reference's trie (iplist.c:160-216): whole bytes compare via
        substring equality; a non-byte-aligned tail compares the
        remaining high bits of the next byte (extracted with
        conv(hex(...)) and shifted) — e.g. fe80::/10 matches febf::1.
        Pure Column expressions, no UDF.

        Compile-bounded like the v4 path: prefixes group per
        (plen, partial-byte value) into ONE binary IN-set over the
        whole-byte substring, so a 50k-prefix list compiles to at most
        a few dozen hash-set probes, not a 50k-term boolean tree
        (round-3 verdict #3). For multi-million-prefix lists use
        ``match_bucketed6``."""
        name = _colname(ip6_col)
        conds: list[Column] = []
        for plen in sorted(self.v6, reverse=True):
            if plen == 0:
                conds.append(F.lit(True))  # ::/0
                continue
            full, rem = divmod(plen, 8)
            # partial-byte value (None when byte-aligned) -> whole-byte
            # prefixes sharing it; each group is one IN-set probe
            groups: dict[int | None, set[bytes]] = defaultdict(set)
            for p in self.v6[plen]:
                v = (p[full] >> (8 - rem)) if rem else None
                groups[v].add(p[:full])
            for v, fulls in groups.items():
                sub: list[Column] = []
                if full:
                    col = F.expr(f"substring({name}, 1, {full})")
                    vals = sorted(fulls)
                    sub.append(
                        col.isin(vals) if len(vals) > 1
                        else col == F.lit(vals[0])
                    )
                if rem:
                    nxt = F.expr(
                        f"conv(hex(substring({name}, {full + 1}, 1)), 16, 10)"
                    ).cast("int")
                    sub.append(
                        F.shiftrightunsigned(nxt, 8 - rem) == F.lit(v)
                    )
                c = sub[0]
                for s in sub[1:]:
                    c = c & s
                conds.append(c)
        if not conds:
            return F.lit(False)
        out = conds[0]
        for cond in conds[1:]:
            out = out | cond
        return ip6_col.isNotNull() & out

    def to_df(self, spark) -> DataFrame:
        """(plen, net) rows for the broadcast-join path."""
        rows = [
            (self.name, plen, net)
            for plen, nets in self.v4.items()
            for net in nets
        ]
        return spark.createDataFrame(rows, "list_name string, plen int, net long")

    def to_df6(self, spark) -> DataFrame:
        """(plen, net_hi, net_lo) rows for ``match_bucketed6``: the packed
        16-byte prefix split into two big-endian int64 halves (signed
        two's-complement, matching conv(hex, 16, -10) on the probe side —
        the geoip hi/lo merge representation, geoip.py lookup6_np)."""
        rows = [
            (self.name, plen, _signed64(int.from_bytes(p[:8], "big")),
             _signed64(int.from_bytes(p[8:], "big")))
            for plen, nets in self.v6.items()
            for p in nets
        ]
        return spark.createDataFrame(
            rows, "list_name string, plen int, net_hi long, net_lo long"
        )


def _colname(col: Column) -> str:
    # single definition lives in the DSL compiler (_col_sql); a pyspark
    # upgrade changing Column.__repr__ then breaks exactly one place
    from xenoeye_spark.dsl.compiler import _col_sql

    return _col_sql(col)


def _signed64(x: int) -> int:
    """Unsigned 64-bit value -> two's-complement signed int64."""
    return x - (1 << 64) if x >= (1 << 63) else x


def match_bucketed(
    flows: DataFrame,
    ip_col: str,
    lists_df: DataFrame,
    out_col: str = "in_list",
) -> DataFrame:
    """Broadcast-join membership for very large lists: appends boolean
    ``out_col`` (same contract as ``match_expr``, just materialized via
    joins instead of an IN-list Column). Use only when IN-list
    compilation is impractical (>~100k prefixes).

    ``lists_df``: (plen int, net long) — one row per prefix. Shape: only
    a NARROW (row_id, plen, masked_addr) projection is exploded over the
    distinct prefix lengths and broadcast-semi-joined; hit row-ids are
    deduped (a distinct on one long — not the full wide row) and joined
    back. The fact table shuffles once on the long row-id; the wide
    columns are never replicated across the plen explosion.

    Row ids come from ``monotonically_increasing_id``; the tagged frame
    is PERSISTED (memory-and-disk) before branching, because the probe
    branch and the join-back branch would otherwise re-evaluate the
    lineage independently — and any upstream shuffle makes within-
    partition row order (hence the generated ids) nondeterministic
    between evaluations, silently misassigning membership.
    """
    from pyspark import StorageLevel

    plens = sorted({r[0] for r in lists_df.select("plen").distinct().collect()})
    dim = lists_df.select(
        "plen", F.col("net").alias("net_masked")
    ).distinct()
    tagged = flows.withColumn(
        "_rid", F.monotonically_increasing_id()
    ).persist(StorageLevel.MEMORY_AND_DISK)
    probes = (
        tagged.select("_rid", F.col(ip_col).cast("long").alias("_ip"))
        .withColumn("plen", F.explode(F.array(*[F.lit(p) for p in plens])))
        .withColumn(
            "net_masked",
            F.when(F.col("plen") == 0, F.lit(0)).otherwise(
                F.expr(
                    "shiftleft(shiftrightunsigned(_ip, 32 - plen), "
                    "32 - plen)"
                )
            ),
        )
    )
    hits = (
        probes.join(F.broadcast(dim), on=["plen", "net_masked"],
                    how="left_semi")
        .select("_rid")
        .distinct()
        .withColumn(out_col, F.lit(True))
    )
    out = (
        tagged.join(hits, on="_rid", how="left")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit(False)))
        .drop("_rid")
    )
    # the persist is load-bearing (row-id determinism) but it is the
    # CALLER's to release: a daemon invoking this per micro-batch would
    # otherwise leak one cached frame per call until LRU thrashing.
    # After materializing the result, call result._xe_cached.unpersist().
    out._xe_cached = tagged
    return out


def match_bucketed6(
    flows: DataFrame,
    ip6_col: str,
    lists_df: DataFrame,
    out_col: str = "in_list",
) -> DataFrame:
    """IPv6 twin of ``match_bucketed`` for multi-million-prefix lists:
    appends boolean ``out_col`` via a broadcast semi-join instead of an
    IN-set Column. ``lists_df``: (plen int, net_hi long, net_lo long) —
    ``IpList.to_df6``'s shape.

    The 16-byte address splits into two big-endian int64 halves with
    ``conv(hex(substring), 16, -10)`` (signed, matching the dim side);
    each distinct plen masks hi/lo with two shifts, CASE-guarded at the
    64/0/128 boundaries because Java shifts are mod-64. Same persisted
    row-id discipline as the v4 path (see ``match_bucketed``); addresses
    that are null or not 16 bytes match nothing, like ``match_expr6``'s
    isNotNull guard."""
    from pyspark import StorageLevel

    plens = sorted({r[0] for r in lists_df.select("plen").distinct().collect()})
    dim = lists_df.select("plen", "net_hi", "net_lo").distinct()
    tagged = flows.withColumn(
        "_rid", F.monotonically_increasing_id()
    ).persist(StorageLevel.MEMORY_AND_DISK)
    probes = (
        tagged.select("_rid", F.col(ip6_col).alias("_ip6"))
        .filter(F.length("_ip6") == 16)
        .withColumn(
            "_hi",
            F.expr("cast(conv(hex(substring(_ip6, 1, 8)), 16, -10) as bigint)"),
        )
        .withColumn(
            "_lo",
            F.expr("cast(conv(hex(substring(_ip6, 9, 8)), 16, -10) as bigint)"),
        )
        .withColumn("plen", F.explode(F.array(*[F.lit(p) for p in plens])))
        .withColumn(
            "net_hi",
            F.expr(
                "CASE WHEN plen = 0 THEN 0L "
                "WHEN plen < 64 THEN shiftleft(shiftrightunsigned(_hi, "
                "64 - plen), 64 - plen) ELSE _hi END"
            ),
        )
        .withColumn(
            "net_lo",
            F.expr(
                "CASE WHEN plen <= 64 THEN 0L "
                "WHEN plen < 128 THEN shiftleft(shiftrightunsigned(_lo, "
                "128 - plen), 128 - plen) ELSE _lo END"
            ),
        )
    )
    hits = (
        probes.join(F.broadcast(dim), on=["plen", "net_hi", "net_lo"],
                    how="left_semi")
        .select("_rid")
        .distinct()
        .withColumn(out_col, F.lit(True))
    )
    out = (
        tagged.join(hits, on="_rid", how="left")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit(False)))
        .drop("_rid")
    )
    # see match_bucketed: the caller releases the load-bearing persist
    out._xe_cached = tagged
    return out


def load_iplists_dir(dir_path: str) -> dict:
    """Load every file in an iplists directory as a named list — list
    name = file name, one CIDR per line, '#' comments and blank lines
    allowed, v4+v6 mixed (iplist.c:299-322, default dir xenoeye.c:44).
    Returns {name: IpList} ready for FilterContext(iplists=...)."""
    import os

    out = {}
    if not os.path.isdir(dir_path):
        return out
    for fname in sorted(os.listdir(dir_path)):
        path = os.path.join(dir_path, fname)
        if os.path.isfile(path):
            out[fname] = IpList.from_file(fname, path)
    return out
