"""Property-based DSL test: random filter expressions evaluated by the
compiled Spark Column must match a direct Python evaluation of the same
AST over the same rows.

The Python oracle interprets the parsed AST with the reference's
semantics: value-list OR folding, src/dst BOTH expansion (filter.c:328-356),
presence semantics for address predicates (filter.c:318-337), missing int
fields read as 0."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from xenoeye_spark.catalog import FILTER_FIELDS
from xenoeye_spark.dsl.compiler import FilterContext, compile_filter
from xenoeye_spark.dsl.lexer import parse_range, parse_int
from xenoeye_spark.dsl.parser import And, Not, Or, Pred, parse_filter
from xenoeye_spark.functions.scalar import str_to_ip4

INT_FIELDS = ["port", "proto", "tos", "as", "vlan"]
N_ROWS = 300


def _gen_rows(rng):
    rows = []
    for i in range(N_ROWS):
        rows.append((
            # addresses clustered so prefixes match often; occasional nulls
            None if rng.random() < 0.1 else (0x0A000000 + rng.randrange(0, 1 << 12)),
            None if rng.random() < 0.1 else (0x0A000000 + rng.randrange(0, 1 << 12)),
            rng.choice([0, 22, 53, 80, 443, 8080, rng.randrange(0, 65536)]),
            rng.choice([0, 22, 53, 80, 443, 8080, rng.randrange(0, 65536)]),
            rng.choice([1, 6, 17]),
            rng.randrange(0, 8),
            rng.randrange(0, 8),
            rng.choice([0, 100, 64512]),
            rng.choice([0, 100, 64512]),
            rng.choice([0, 10, 20]),
            rng.choice([0, 10, 20]),
        ))
    return rows


SCHEMA = ("ip4_src_addr long, ip4_dst_addr long, l4_src_port long, "
          "l4_dst_port long, protocol long, src_tos long, dst_tos long, "
          "src_as long, dst_as long, src_vlan long, dst_vlan long")
COLS = [c.split()[0] for c in SCHEMA.split(", ")]


def _gen_expr(rng, depth=0):
    roll = rng.random()
    if depth >= 3 or roll < 0.5:
        # leaf predicate
        dirn = rng.choice(["", "src ", "dst "])
        if rng.random() < 0.35:
            # address predicate
            plen = rng.choice([8, 12, 16, 20, 24, 32])
            base = 0x0A000000 + rng.randrange(0, 1 << 12)
            mask = ((1 << plen) - 1) << (32 - plen)
            net = base & mask
            a = f"{net >> 24 & 255}.{net >> 16 & 255}.{net >> 8 & 255}.{net & 255}"
            val = a if plen == 32 else f"{a}/{plen}"
            kw = "host" if plen == 32 else "net"
            return f"{dirn}{kw} {val}"
        field = rng.choice(INT_FIELDS)
        vals = []
        for _ in range(rng.randrange(1, 3)):
            if rng.random() < 0.3:
                lo = rng.randrange(0, 1000)
                vals.append(f"{lo}-{lo + rng.randrange(1, 2000)}")
            else:
                vals.append(str(rng.choice([0, 6, 17, 22, 53, 80, 443, 100])))
        return f"{dirn}{field} {' or '.join(vals)}"
    if roll < 0.65:
        return f"not ({_gen_expr(rng, depth + 1)})"
    op = rng.choice(["and", "or"])
    return f"({_gen_expr(rng, depth + 1)}) {op} ({_gen_expr(rng, depth + 1)})"


# ---------------------------------------------------------------- oracle

def _match_int(v, values):
    v = 0 if v is None else v
    for s in values:
        r = parse_range(s)
        if r is not None:
            if r[0] <= v <= r[1]:
                return True
        else:
            if v == parse_int(s):
                return True
    return False


def _match_addr(v, values):
    if v is None:
        return False
    for s in values:
        if "/" in s:
            a, p = s.split("/")
            plen = int(p)
        else:
            a, plen = s, 32
        addr = str_to_ip4(a)
        shift = 32 - plen
        if plen == 0 or (v >> shift) == (addr >> shift):
            return True
    return False


def _eval_pred(row, p: Pred):
    ff = FILTER_FIELDS[p.field]
    cols = {"src": [ff.src], "dst": [ff.dst]}.get(p.direction, None)
    if cols is None:
        cols = [ff.src] if ff.src == ff.dst else [ff.src, ff.dst]
    fn = _match_addr if ff.kind in ("addr4",) else _match_int
    return any(fn(row[c], p.values) for c in cols)


def _eval_ast(row, ast):
    if isinstance(ast, Or):
        return any(_eval_ast(row, x) for x in ast.items)
    if isinstance(ast, And):
        return all(_eval_ast(row, x) for x in ast.items)
    if isinstance(ast, Not):
        return not _eval_ast(row, ast.item)
    if isinstance(ast, Pred):
        return _eval_pred(row, ast)
    raise AssertionError(f"unhandled node {ast!r}")


@pytest.mark.parametrize("seed", range(6))
def test_random_filters_match_python_oracle(spark, seed):
    rng = random.Random(seed)
    rows = _gen_rows(rng)
    df = spark.createDataFrame(rows, SCHEMA).cache()
    dicts = [dict(zip(COLS, r)) for r in rows]
    try:
        for _ in range(12):
            expr = _gen_expr(rng)
            ast = parse_filter(expr)
            expected = sum(1 for d in dicts if _eval_ast(d, ast))
            got = df.filter(compile_filter(expr, FilterContext())).count()
            assert got == expected, f"filter {expr!r}: spark {got} != oracle {expected}"
    finally:
        df.unpersist()
