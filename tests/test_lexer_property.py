"""Hypothesis property tests for the pure-Python parsing layers —
no Spark session, so these run in milliseconds and explore corners the
fixed-seed tests cannot (the lexer crash class fixed in round 4 came
exactly from here: int(x, 0) vs strtol on leading zeros)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from xenoeye_spark.dsl.lexer import parse_int, parse_range


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="0123456789xXabcdefABCDEF-", max_size=12))
def test_parse_int_never_raises(s):
    """Any input either parses to an int or returns None — never an
    exception escaping into compile_filter."""
    v = parse_int(s)
    assert v is None or isinstance(v, int)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="0123456789-", max_size=14))
def test_parse_range_never_raises_and_orders(s):
    r = parse_range(s)
    if r is not None:
        a, b = r
        assert isinstance(a, int) and isinstance(b, int)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_parse_int_strtol_parity(n):
    """decimal / 0x-hex / leading-zero-octal all read like strtol(_,0)."""
    assert parse_int(str(n)) == n
    assert parse_int(hex(n)) == n
    assert parse_int("0" + oct(n)[2:]) == n   # 0-prefixed octal
