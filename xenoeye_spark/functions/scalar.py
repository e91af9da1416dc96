"""Scalar functions usable in filters and group-by keys.

Reference semantics (all per-flow, pure):
  - div/div_r/div_l : integer division family, xdiv() in filter.h:396-418
  - min             : min of two int fields (monit-objects.c:703-717)
  - tfstr           : TCP flags byte -> "PSH+ACK" text (utils.c:22-26,
                      table utils-data.inc: names joined high-bit->low-bit)
  - portstr         : port -> "https (443)" (utils.c:28-37)
  - ppstr           : port pair -> "http(80) -> 443" (utils.c:39-77)

All are implemented as pure Column expressions (JVM-side, codegen-friendly) —
no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _long(c: Column) -> Column:
    return c.cast("long")


def xdiv(a: Column, b: Column) -> Column:
    """Integer a/b with divide-by-zero -> 0 (filter.h:396-418).

    Reference operands are unsigned; values here are assumed >= 0, so
    floor() matches C truncation.
    """
    a, b = _long(a), _long(b)
    return F.when((b.isNull()) | (b == 0), F.lit(0)).otherwise(
        F.floor(a / b)
    ).cast("long")


def div_r(a: Column, b: Column, k: int) -> Column:
    """Division rounded down to a multiple of k: (a/b)/k*k in integer math
    (filter.h:414-417)."""
    q = xdiv(a, b)
    if k > 1:
        return (F.floor(q / F.lit(k)) * F.lit(k)).cast("long")
    return q


def div_l(a: Column, b: Column, k: int) -> Column:
    """Division rounded down to the nearest power of k (filter.h:407-413).

    The reference computes pow(k, (int)(log(q)/log(k))) in floating point;
    we compute the mathematically-exact power chain (a when-ladder over the
    <=64 powers of k that fit in int64), which avoids libm rounding
    surprises like log10(1000) -> 2.999... The ladder stays inside
    whole-stage codegen.
    """
    if k < 2:
        raise ValueError("div_l requires k >= 2")
    q = xdiv(a, b)
    powers = []
    p = 1
    while p <= (1 << 62) // k:
        p *= k
        powers.append(p)
    # descending when-ladder: first match emits the largest power <= q
    expr = F.when(q <= 0, F.lit(0))
    for pw in reversed(powers):
        expr = expr.when(q >= pw, F.lit(pw))
    return expr.otherwise(F.lit(1)).cast("long")


def min2(a: Column, b: Column) -> Column:
    """min of two int fields, typically ports (monit-objects.c:703-717)."""
    return F.least(_long(a), _long(b))


# TCP flag names, high bit -> low bit (utils-data.inc ordering:
# e.g. 0b00000011 -> "SYN+FIN").
_TCP_FLAGS = [
    (0x80, "CWR"), (0x40, "ECE"), (0x20, "URG"), (0x10, "ACK"),
    (0x08, "PSH"), (0x04, "RST"), (0x02, "SYN"), (0x01, "FIN"),
]


def tfstr(flags: Column) -> Column:
    """TCP flags byte -> '+'-joined names, high bit first; 0 -> ''."""
    f = _long(flags).bitwiseAND(F.lit(0xFF))
    parts = [
        F.when(f.bitwiseAND(F.lit(bit)) != 0, F.lit(name)).otherwise(F.lit(None))
        for bit, name in _TCP_FLAGS
    ]
    return F.concat_ws("+", *parts)


# Deterministic embedded service-name table. The reference generates its
# 65536-entry ports_db from the build host's /etc/services
# (extra/gen-utils-data); we embed a fixed curated subset so results do not
# depend on the host — a documented divergence.
SERVICE_NAMES: dict[int, str] = {
    20: "ftp-data", 21: "ftp", 22: "ssh", 23: "telnet", 25: "smtp",
    53: "domain", 67: "bootps", 68: "bootpc", 69: "tftp", 80: "http",
    110: "pop3", 119: "nntp", 123: "ntp", 135: "epmap", 137: "netbios-ns",
    138: "netbios-dgm", 139: "netbios-ssn", 143: "imap2", 161: "snmp",
    162: "snmp-trap", 179: "bgp", 194: "ircd", 389: "ldap", 443: "https",
    445: "microsoft-ds", 465: "submissions", 514: "syslog", 515: "printer",
    587: "submission", 636: "ldaps", 873: "rsync", 993: "imaps",
    995: "pop3s", 1080: "socks", 1194: "openvpn", 1433: "ms-sql-s",
    1521: "oracle", 1723: "pptp", 1812: "radius", 1813: "radius-acct",
    2049: "nfs", 3128: "squid", 3306: "mysql", 3389: "ms-wbt-server",
    4500: "ipsec-nat-t", 5060: "sip", 5061: "sips", 5222: "xmpp-client",
    5353: "mdns", 5432: "postgresql", 5900: "vnc", 6379: "redis",
    8080: "http-alt", 8443: "https-alt", 9090: "websm", 11211: "memcached",
    27017: "mongodb",
}


def _svc_name(port: Column) -> Column:
    """Service-name lookup as a literal map expression (broadcast-free,
    constant-folded by Catalyst)."""
    pairs = []
    for p, name in SERVICE_NAMES.items():
        pairs.append(F.lit(p))
        pairs.append(F.lit(name))
    m = F.create_map(*pairs)
    return m[_long(port).cast("int")]


def portstr(port: Column) -> Column:
    """port -> 'https (443)' when known, else '443' (utils.c:28-37;
    note the space before the paren, unlike ppstr)."""
    p = _long(port)
    name = _svc_name(p)
    return F.when(name.isNotNull(), F.concat(name, F.lit(" ("), p.cast("string"), F.lit(")"))) \
            .otherwise(p.cast("string"))


def ppstr(p1: Column, p2: Column) -> Column:
    """Port pair -> directional label (utils.c:39-77):
       both known          : 's1(p1) -> s2(p2)'
       p1 == p2            : 'p1 -> p2'
       p1 < p2 : none known: 'p1 ->' ; only s2: 'p1 -> s2(p2)' ; only s1: 's1(p1) ->'
       p1 > p2 : none known: '-> p2' ; only s2: '-> s2(p2)'   ; only s1: 's1(p1) -> p2'
    """
    p1, p2 = _long(p1), _long(p2)
    s1, s2 = _svc_name(p1), _svc_name(p2)
    lbl1 = F.concat(s1, F.lit("("), p1.cast("string"), F.lit(")"))
    lbl2 = F.concat(s2, F.lit("("), p2.cast("string"), F.lit(")"))
    n1, n2 = p1.cast("string"), p2.cast("string")
    return (
        F.when(s1.isNotNull() & s2.isNotNull(), F.concat(lbl1, F.lit(" -> "), lbl2))
        .when(p1 == p2, F.concat(n1, F.lit(" -> "), n2))
        .when((p1 < p2) & s1.isNull() & s2.isNull(), F.concat(n1, F.lit(" ->")))
        .when((p1 < p2) & s1.isNull(), F.concat(n1, F.lit(" -> "), lbl2))
        .when((p1 < p2), F.concat(lbl1, F.lit(" ->")))
        .when(s1.isNull() & s2.isNull(), F.concat(F.lit("-> "), n2))
        .when(s1.isNull(), F.concat(F.lit("-> "), lbl2))
        .otherwise(F.concat(lbl1, F.lit(" -> "), n2))
    )


def ip4_to_str(ip: Column) -> Column:
    """uint32 -> dotted-quad string, pure expression."""
    ip = _long(ip)
    return F.concat_ws(
        ".",
        (ip / 16777216).cast("long").cast("string"),
        (ip / 65536).cast("long").bitwiseAND(F.lit(255)).cast("string"),
        (ip / 256).cast("long").bitwiseAND(F.lit(255)).cast("string"),
        ip.bitwiseAND(F.lit(255)).cast("string"),
    )


def str_to_ip4(s: str) -> int:
    """Python-side dotted-quad -> uint32 (for literals in compiled filters)."""
    parts = s.split(".")
    if len(parts) != 4:
        raise ValueError(f"bad IPv4 {s!r}")
    v = 0
    for p in parts:
        b = int(p)
        if not 0 <= b <= 255:
            raise ValueError(f"bad IPv4 {s!r}")
        v = (v << 8) | b
    return v
