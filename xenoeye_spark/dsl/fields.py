"""parse_field: the reference's field-spec strings -> FieldSpec.

Examples (filter-parser.c:393-485, CONFIG.md:348-375):
    "src host"                  -> key column ip4_src_addr
    "octets desc"               -> aggregable SUM(in_bytes*1), sort desc
    "bits"                      -> aggregable SUM(in_bytes*8)
    "div(octets,packets) asc"   -> aggregable computed post-agg
    "country(src host)"         -> key via geoip function
    "min(src port, dst port)"   -> key function
SQL-safe output names replace non-alnum chars with '_'
(filter-parser.c:305-346), e.g. ``country(src host)`` -> ``country_src_host_``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from xenoeye_spark.catalog import AGGR_FIELDS, sql_safe_name
from xenoeye_spark.dsl import lexer as lx
from xenoeye_spark.dsl.compiler import FilterContext, resolve_func_column
from xenoeye_spark.dsl.parser import FuncPred, ParseError, BOTH, FUNC_NAMES


@dataclass
class FieldSpec:
    raw: str                 # original spec text (minus sort suffix)
    sql_name: str            # SQL-safe output column name
    is_aggr: bool            # True -> SUM target (the only aggregate, §2.6)
    desc: bool               # sort direction (None = unsorted key)
    has_order: bool          # did the user write asc/desc
    _column_fn: object       # Callable[[FilterContext], Column]

    def column(self, ctx: FilterContext | None = None) -> Column:
        if ctx is None:
            ctx = FilterContext()
        return self._column_fn(ctx)

    def sort_col(self, c: Column | None = None) -> Column:
        col = c if c is not None else F.col(self.sql_name)
        return col.desc() if self.desc else col.asc()


def parse_field(text: str) -> FieldSpec:
    toks = [t for t in lx.tokenize(text) if t.kind != lx.EOF]
    if not toks:
        raise ParseError("empty field spec")

    desc = False
    has_order = False
    if toks and toks[-1].kind == lx.WORD and toks[-1].text.lower() in ("asc", "desc"):
        has_order = True
        desc = toks[-1].text.lower() == "desc"
        toks = toks[:-1]
    if not toks:
        raise ParseError(f"field spec {text!r} has only a sort order")

    words = [t.text.lower() for t in toks]
    raw = " ".join(w for w in words)

    # function form: name ( args ) — reuse the filter parser's func grammar
    if words[0] in FUNC_NAMES and len(toks) > 1 and toks[1].kind == lx.LPAREN:
        args: list[tuple[str, str]] = []
        i = 2
        while i < len(toks) and toks[i].kind != lx.RPAREN:
            if toks[i].kind == lx.COMMA:
                i += 1  # arg separator (filter-parser-funcs.c comma grammar)
                continue
            w = toks[i].text.lower()
            if w in ("src", "dst") and i + 1 < len(toks) and toks[i + 1].kind == lx.WORD:
                args.append((w, toks[i + 1].text.lower()))
                i += 2
            elif toks[i].kind == lx.WORD:
                args.append((BOTH, w))
                i += 1
            else:
                raise ParseError(f"bad arg in {text!r}")
        fname = words[0]
        fp = FuncPred(func=fname, args=args)
        # ALL function fields are per-flow KEY fields — even div(octets,
        # packets) computes per flow and lands in the group-by key
        # (monit_object_func_div writes into the key buffer,
        # monit-objects.c:679-701; only filter-ag.def aliases set aggr=1,
        # filter-parser.c:352-368).
        is_aggr = False
        spec_txt = text.strip()
        if has_order:
            spec_txt = spec_txt.rsplit(None, 1)[0]

        def col_fn(ctx: FilterContext, fp=fp):
            c, _ = resolve_func_column(ctx, fp)
            return c

        import re as _re

        return FieldSpec(
            raw=spec_txt,
            # whitespace-normalize before naming: 'div(octets, packets)'
            # and 'div(octets,packets)' mean the same field and must
            # yield the SAME output column (the spaced form previously
            # produced 'div_octets__packets_')
            sql_name=sql_safe_name(_re.sub(r"\s+", "", spec_txt)),
            is_aggr=is_aggr,
            desc=desc,
            has_order=has_order,
            _column_fn=col_fn,
        )

    # aggregable alias: octets/bits/packets/... (filter-ag.def)
    if len(words) == 1 and words[0] in AGGR_FIELDS:
        src, scale = AGGR_FIELDS[words[0]]

        def col_fn(ctx: FilterContext, src=src, scale=scale):
            c = F.coalesce(ctx.col(src).cast("long"), F.lit(0))
            return c * F.lit(scale) if scale != 1 else c

        return FieldSpec(
            raw=words[0],
            sql_name=words[0],
            is_aggr=True,
            desc=desc,
            has_order=has_order,
            _column_fn=col_fn,
        )

    # [src|dst] field — plain key column
    direction = BOTH
    fwords = words
    if words[0] in ("src", "dst"):
        direction = words[0]
        fwords = words[1:]
    if len(fwords) != 1:
        raise ParseError(f"cannot parse field spec {text!r}")
    fieldname = fwords[0]

    def col_fn(ctx: FilterContext, fieldname=fieldname, direction=direction):
        ff = ctx.fields.get(fieldname)
        if ff is None:
            # raw column name escape hatch (generic tables)
            return ctx.col(fieldname)
        return ctx.col(ff.dst if direction == "dst" else ff.src)

    spec_txt = " ".join(([direction] if direction != BOTH else []) + [fieldname])
    return FieldSpec(
        raw=spec_txt,
        sql_name=sql_safe_name(spec_txt.replace(" ", "_")),
        is_aggr=False,
        desc=desc,
        has_order=has_order,
        _column_fn=col_fn,
    )
