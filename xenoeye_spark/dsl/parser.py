"""Recursive-descent parser for the filter DSL -> small AST.

Grammar parity with the reference (filter-parser.c):
    expression := term (OR term)*          # :208-223
    term       := factor (AND factor)*     # :191-206  (AND binds tighter)
    factor     := [NOT] (rule | '(' expression ')')   # :158-189
    rule       := function-pred | [src|dst] field value-list  # :107-156
    value-list := value (OR value)*        # :46-86 — OR folds values into
                                           # ONE predicate when the next
                                           # token is a value, not a field
An empty filter matches all flows (filter.c:967-971).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from xenoeye_spark.dsl import lexer as lx
from xenoeye_spark.dsl.lexer import COMMA, EOF, LPAREN, RPAREN, STRING, WORD, Token

# directions (filter.h:104-107)
SRC, DST, BOTH = "src", "dst", "both"

# functions usable as predicates / key fields (filter.c:907-958 dispatch)
FUNC_NAMES = {
    "div", "div_r", "div_l", "min", "mfreq",
    "continent", "country_code", "country", "state", "city", "zip", "lat", "long",
    "asn", "asd", "tfstr", "portstr", "ppstr",
}

KEYWORDS = {"and", "or", "not", "src", "dst"}


@dataclass
class Pred:
    """field-vs-value-list predicate; values are raw token texts."""
    field: str
    direction: str
    values: list[str] = dc_field(default_factory=list)
    quoted: list[bool] = dc_field(default_factory=list)  # per-value: was it 'quoted'


@dataclass
class FuncPred:
    """function(args...) compared against a value list."""
    func: str
    args: list[tuple[str, str]]  # (direction, field-or-aggr-name)
    values: list[str] = dc_field(default_factory=list)
    quoted: list[bool] = dc_field(default_factory=list)


@dataclass
class Not:
    item: object


@dataclass
class And:
    items: list


@dataclass
class Or:
    items: list


class ParseError(ValueError):
    pass


class _P:
    def __init__(self, tokens: list[Token], known_fields: set[str]):
        self.toks = tokens
        self.i = 0
        self.known_fields = known_fields

    def peek(self, ahead: int = 0) -> Token:
        j = min(self.i + ahead, len(self.toks) - 1)
        return self.toks[j]

    def next(self) -> Token:
        t = self.toks[self.i]
        if t.kind != EOF:
            self.i += 1
        return t

    def kw(self, t: Token) -> str | None:
        if t.kind == WORD:
            low = t.text.lower()
            if low in KEYWORDS:
                return low
        return None

    # expression := term (OR term)*
    def expression(self):
        items = [self.term()]
        while self.kw(self.peek()) == "or":
            self.next()
            items.append(self.term())
        return items[0] if len(items) == 1 else Or(items)

    # term := factor (AND factor)*
    def term(self):
        items = [self.factor()]
        while self.kw(self.peek()) == "and":
            self.next()
            items.append(self.factor())
        return items[0] if len(items) == 1 else And(items)

    # factor := [NOT] (rule | '(' expression ')')
    def factor(self):
        if self.kw(self.peek()) == "not":
            self.next()
            return Not(self.factor())
        if self.peek().kind == LPAREN:
            self.next()
            e = self.expression()
            if self.peek().kind != RPAREN:
                raise ParseError(f"expected ')' at pos {self.peek().pos}")
            self.next()
            return e
        return self.rule()

    # rule := function | [src|dst] field value-list
    def rule(self):
        t = self.peek()
        if t.kind != WORD:
            raise ParseError(f"expected field at pos {t.pos}, got {t.text!r}")
        low = t.text.lower()
        direction = BOTH
        if low in ("src", "dst"):
            direction = low
            self.next()
            t = self.peek()
            if t.kind != WORD:
                raise ParseError(f"expected field after {direction} at pos {t.pos}")
            low = t.text.lower()

        if low in FUNC_NAMES and self.peek(1).kind == LPAREN:
            return self.func_rule(direction)

        if low not in self.known_fields:
            raise ParseError(f"unknown field {t.text!r} at pos {t.pos}")
        self.next()
        p = Pred(field=low, direction=direction)
        self.values_into(p)
        if not p.values:
            raise ParseError(f"field {low!r} needs at least one value (pos {t.pos})")
        return p

    def func_rule(self, direction: str):
        if direction != BOTH:
            # each function ARGUMENT carries its own src/dst prefix; an
            # outer prefix was parsed and then silently discarded —
            # reject it so 'src min(port, port) 443' doesn't quietly
            # evaluate both directions
            raise ParseError(
                f"{direction!r} prefix is not valid before a function "
                "predicate — prefix the argument fields instead"
            )
        fname = self.next().text.lower()
        if self.next().kind != LPAREN:
            raise ParseError(f"expected '(' after {fname}")
        args: list[tuple[str, str]] = []
        while True:
            t = self.peek()
            if t.kind == RPAREN:
                self.next()
                break
            if t.kind == COMMA:
                self.next()
                continue
            if t.kind != WORD:
                raise ParseError(f"bad function arg at pos {t.pos}")
            low = t.text.lower()
            if low in ("src", "dst"):
                self.next()
                t2 = self.next()
                if t2.kind != WORD:
                    raise ParseError(f"expected field after {low} in {fname}()")
                args.append((low, t2.text.lower()))
            else:
                self.next()
                # allow integer literal args (div_r/div_l k arg)
                args.append((BOTH, low))
        p = FuncPred(func=fname, args=args)
        self.values_into(p)
        return p

    def values_into(self, p) -> None:
        """Parse ``value (OR value)*`` — fold while the token after OR looks
        like a value rather than the start of a new rule
        (filter-parser.c:46-86)."""
        first = True
        while True:
            t = self.peek()
            if t.kind == STRING:
                p.values.append(t.text)
                p.quoted.append(True)
                self.next()
            elif t.kind == WORD and self.is_value_word(t.text):
                p.values.append(t.text)
                p.quoted.append(False)
                self.next()
            else:
                if first:
                    return  # no value (function predicates may be bare? keep strict upstream)
                raise ParseError(f"expected value at pos {t.pos}, got {t.text!r}")
            first = False
            if self.kw(self.peek()) == "or" and self.is_value_token(self.peek(1)):
                self.next()  # consume OR, continue folding
            else:
                return

    def is_value_word(self, text: str) -> bool:
        low = text.lower()
        if low in KEYWORDS or low in self.known_fields or low in FUNC_NAMES:
            return False
        return True

    def is_value_token(self, t: Token) -> bool:
        if t.kind == STRING:
            return True
        return t.kind == WORD and self.is_value_word(t.text)


def parse_filter(text: str, known_fields: set[str] | None = None):
    """Parse a filter string; returns AST or None for an empty filter
    (empty matches all, filter.c:967-971)."""
    if known_fields is None:
        from xenoeye_spark.catalog import FILTER_FIELDS

        known_fields = set(FILTER_FIELDS)
    toks = lx.tokenize(text)
    if toks[0].kind == EOF:
        return None
    p = _P(toks, known_fields)
    ast = p.expression()
    if p.peek().kind != EOF:
        t = p.peek()
        raise ParseError(f"trailing input at pos {t.pos}: {t.text!r}")
    return ast
