"""Filter DSL tests: lexer, parser, and compiled-Column semantics.

Golden expression from the reference's only unit test
(/root/reference/tests/test_filters.c:14):
  "Src host 1.2.3.4 and (PORT 12345 or 54321) or dst host 4.3.2.1
   and div(octets, packets) 0-100"
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xenoeye_spark.dsl.lexer import tokenize, parse_range, parse_int
from xenoeye_spark.dsl.parser import parse_filter, Or, And, Not, Pred, FuncPred
from xenoeye_spark.dsl.compiler import FilterContext, compile_filter
from xenoeye_spark.functions.scalar import str_to_ip4


def flows_df(spark):
    rows = [
        # (src_ip, dst_ip, sport, dport, proto, octets, pkts, tcp_flags)
        ("1.2.3.4", "9.9.9.9", 12345, 80, 6, 1000, 10, 0x12),
        ("1.2.3.4", "9.9.9.9", 999, 54321, 6, 1000, 10, 0x10),
        ("5.5.5.5", "4.3.2.1", 1, 2, 17, 50, 1, 0),      # div=50 -> matches 0-100
        ("5.5.5.5", "4.3.2.1", 1, 2, 17, 5000, 1, 0),    # div=5000 -> no
        ("8.8.8.8", "7.7.7.7", 53, 53, 17, 100, 2, 0),   # nothing matches
        (None, "4.3.2.1", 3, 4, 1, 10, 1, 0),            # null src, dst matches, div=10
    ]
    df = spark.createDataFrame(
        [
            (str_to_ip4(s) if s else None, str_to_ip4(d), sp, dp, pr, o, p, tf)
            for s, d, sp, dp, pr, o, p, tf in rows
        ],
        "ip4_src_addr long, ip4_dst_addr long, l4_src_port long, l4_dst_port long, "
        "protocol long, in_bytes long, in_pkts long, tcp_flags long",
    )
    return df


def test_lexer_basics():
    toks = tokenize("src host 1.2.3.4 and (port 80 or 443)")
    assert [t.text for t in toks[:-1]] == [
        "src", "host", "1.2.3.4", "and", "(", "port", "80", "or", "443", ")",
    ]
    assert parse_range("80-443") == (80, 443)
    assert parse_range("0x10-0x20") == (16, 32)
    assert parse_int("0x1F") == 31
    assert parse_int("010") == 8  # octal like strtol(,0)


def test_parser_value_list_folding():
    ast = parse_filter("port 12345 or 54321")
    assert isinstance(ast, Pred)
    assert ast.values == ["12345", "54321"]

    ast2 = parse_filter("port 80 or proto 6")
    assert isinstance(ast2, Or)
    assert isinstance(ast2.items[0], Pred) and ast2.items[0].field == "port"
    assert isinstance(ast2.items[1], Pred) and ast2.items[1].field == "proto"


def test_parser_precedence_and_parens():
    # AND binds tighter than OR (filter-parser.c:191-223)
    ast = parse_filter("proto 6 and port 80 or proto 17")
    assert isinstance(ast, Or)
    assert isinstance(ast.items[0], And)

    ast2 = parse_filter("proto 6 and (port 80 or proto 17)")
    assert isinstance(ast2, And)
    assert isinstance(ast2.items[1], Or)


def test_parser_reference_golden_expression():
    ast = parse_filter(
        "Src host 1.2.3.4 and (PORT 12345 or 54321) "
        "or dst host 4.3.2.1 and div(octets, packets) 0-100"
    )
    assert isinstance(ast, Or)
    left, right = ast.items
    assert isinstance(left, And)
    assert isinstance(left.items[0], Pred) and left.items[0].direction == "src"
    assert isinstance(left.items[1], Pred) and left.items[1].values == ["12345", "54321"]
    assert isinstance(right, And)
    assert isinstance(right.items[1], FuncPred)
    assert right.items[1].func == "div"
    assert right.items[1].values == ["0-100"]


def test_compile_reference_golden_expression(spark):
    df = flows_df(spark)
    cond = compile_filter(
        "Src host 1.2.3.4 and (PORT 12345 or 54321) "
        "or dst host 4.3.2.1 and div(octets, packets) 0-100"
    )
    got = df.filter(cond).count()
    # rows 0 (src+port12345), 1 (port 54321 dst side), 2 (dst 4.3.2.1 div 50),
    # 5 (dst 4.3.2.1, div 10)
    assert got == 4


def test_compile_net_prefix(spark):
    df = flows_df(spark)
    assert df.filter(compile_filter("src net 1.2.3.0/24")).count() == 2
    assert df.filter(compile_filter("net 4.0.0.0/8")).count() == 3
    assert df.filter(compile_filter("dst net 4.3.2.1/32")).count() == 3


def test_compile_direction_both_is_or(spark):
    df = flows_df(spark)
    # "port 53" with no direction matches src OR dst (filter.c:328-356)
    assert df.filter(compile_filter("port 53")).count() == 1
    assert df.filter(compile_filter("src port 12345")).count() == 1
    assert df.filter(compile_filter("dst port 12345")).count() == 0


def test_compile_not_with_missing_addr(spark):
    df = flows_df(spark)
    # presence: row with NULL src fails "src host" even under NOT -> NOT yields True
    n_not = df.filter(compile_filter("not src host 1.2.3.4")).count()
    assert n_not == 4  # 6 rows - 2 matching; null-src row PASSES the NOT


def test_compile_ranges_and_hex(spark):
    df = flows_df(spark)
    assert df.filter(compile_filter("proto 6 or 17")).count() == 5
    assert df.filter(compile_filter("src port 1-100")).count() == 4
    assert df.filter(compile_filter("tcp-flags 0x10-0x20")).count() == 2


def test_empty_filter_matches_all(spark):
    df = flows_df(spark)
    assert df.filter(compile_filter("")).count() == df.count()


def test_unknown_field_raises():
    with pytest.raises(Exception):
        parse_filter("bogusfield 42")


def test_parse_field_function_forms():
    """Field specs from the reference docs must parse: comma-separated
    function args with and without spaces, src/dst arg prefixes, sort
    suffixes (parse_field, filter-parser.c:393-485)."""
    from xenoeye_spark.dsl.fields import parse_field

    f = parse_field("div(octets,packets) desc")          # SURVEY §2.4 example
    assert f.desc and f.has_order and not f.is_aggr
    assert f.sql_name == "div_octets_packets_"
    for spec in ["div(octets, packets) asc", "ppstr(src port, dst port)",
                 "div_r(octets,packets,100)", "min(src port,dst port)",
                 "country(src host)", "tfstr(tcp-flags)"]:
        parse_field(spec)  # must not raise
    assert parse_field("octets desc").is_aggr
    assert parse_field("src host").is_aggr is False
