"""Filter DSL: the reference's BPF-like boolean language, compiled to
pyspark Columns instead of RPN bytecode (Catalyst is our VM).

Reference grammar (filter-parser.c:107-255):
    expression := term (OR term)*
    term       := factor (AND factor)*
    factor     := [NOT] (rule | '(' expression ')')
    rule       := function | [src|dst] field value (OR value)*
"""

from xenoeye_spark.dsl.lexer import tokenize, Token
from xenoeye_spark.dsl.parser import parse_filter
from xenoeye_spark.dsl.compiler import compile_filter, FilterContext
from xenoeye_spark.dsl.fields import parse_field, FieldSpec

__all__ = [
    "tokenize",
    "Token",
    "parse_filter",
    "compile_filter",
    "FilterContext",
    "parse_field",
    "FieldSpec",
]
