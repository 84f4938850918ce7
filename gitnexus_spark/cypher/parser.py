"""Lexer + recursive-descent parser for the Cypher subset.

Grammar (case-insensitive keywords)::

    query     := reading+ RETURN [DISTINCT] item (',' item)*
                 [ORDER BY oitem (',' oitem)*] [SKIP INT] [LIMIT INT]
    reading   := [OPTIONAL] MATCH pattern (',' pattern)* [WHERE expr]
               | WITH [DISTINCT] item (',' item)* [WHERE expr]
               | UNWIND '[' literal (',' literal)* ']' AS IDENT
    pattern   := [IDENT '='] [SHORTESTPATH '('] node (rel node)* [')']
    node      := '(' [IDENT] [':' IDENT] [props] ')'
    props     := '{' IDENT ':' literal (',' IDENT ':' literal)* '}'
    rel       := '-' '[' [IDENT] [':' IDENT] ['*' INT '..' INT] ']' '->'
               | '<-' '[' ... ']' '-'
    item      := (AGGFN '(' [DISTINCT] arg ')' | arg) [AS IDENT]
    arg       := IDENT ['.' IDENT] | LENGTH '(' IDENT ')' | '*'
    expr      := or_expr;  the usual precedence NOT > comparison > AND > OR
    primary   := prop | literal | '(' expr ')' | EXISTS '(' pattern ')'

The reference validates generated Cypher with regexes and rewrites
unbounded queries (query-optimization.ts:412-422); here malformed input
raises ``CypherSyntaxError`` with position info instead.
"""

from __future__ import annotations

import re

from .ast import (AGG_FNS, BoolOp, Cmp, ExistsPat, InList, IsNull, Lit,
                  MatchClause, NodePat, Not, OrderItem, PathLen, Pattern,
                  Prop, Query, RelPat, ReturnItem, StrPred, UnwindClause,
                  VarRef, WithClause)


class CypherSyntaxError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""\s+
      | (?P<num>\d+\.\d+|\d+)
      | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
      | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<op><>|<=|>=|\.\.|->|<-|[()\[\]{}:,.\-<>=*])
    """,
    re.X,
)

_KEYWORDS = {
    "match", "where", "return", "distinct", "order", "by", "skip", "limit",
    "as", "and", "or", "not", "contains", "starts", "ends", "with", "is",
    "null", "true", "false", "exists", "asc", "desc", "optional", "in",
    "unwind",
}


def _tokenize(text: str) -> list[tuple[str, object, int]]:
    """-> [(kind, value, pos)]; kinds: num str name kw op eof."""
    out = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise CypherSyntaxError(f"unexpected character {text[pos]!r} at {pos}")
        if m.lastgroup == "num":
            v = m.group()
            out.append(("num", float(v) if "." in v else int(v), pos))
        elif m.lastgroup == "str":
            raw = m.group()[1:-1]
            out.append(("str", re.sub(r"\\(.)", r"\1", raw), pos))
        elif m.lastgroup == "name":
            w = m.group()
            kind = "kw" if w.lower() in _KEYWORDS else "name"
            out.append((kind, w, pos))
        elif m.lastgroup == "op":
            out.append(("op", m.group(), pos))
        pos = m.end()
    out.append(("eof", None, pos))
    return out


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = _tokenize(text)
        self.i = 0

    # -- token helpers ----------------------------------------------------
    def peek(self, k: int = 0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def error(self, msg: str):
        kind, val, pos = self.peek()
        raise CypherSyntaxError(f"{msg} (got {kind} {val!r} at {pos})")

    def at_kw(self, word: str) -> bool:
        kind, val, _ = self.peek()
        return kind == "kw" and val.lower() == word

    def eat_kw(self, word: str):
        if not self.at_kw(word):
            self.error(f"expected {word.upper()}")
        self.next()

    def at_op(self, op: str) -> bool:
        kind, val, _ = self.peek()
        return kind == "op" and val == op

    def eat_op(self, op: str):
        if not self.at_op(op):
            self.error(f"expected {op!r}")
        self.next()

    def ident(self, allow_kw: bool = False) -> str:
        """allow_kw admits keyword tokens — needed for labels and
        relationship types that collide with keywords (the graph's own
        CONTAINS edge type vs the CONTAINS operator)."""
        kind, val, _ = self.peek()
        if kind != "name" and not (allow_kw and kind == "kw"):
            self.error("expected identifier")
        self.next()
        return val

    # -- grammar ----------------------------------------------------------
    def parse_query(self) -> Query:
        clauses: list = []
        while True:
            if self.at_kw("optional"):
                self.next()
                self.eat_kw("match")
                clauses.append(self.match_clause(optional=True))
            elif self.at_kw("match"):
                self.next()
                clauses.append(self.match_clause(optional=False))
            elif self.at_kw("with"):
                self.next()
                clauses.append(self.with_clause())
            elif self.at_kw("unwind"):
                self.next()
                values = self.list_lit()
                self.eat_kw("as")
                clauses.append(UnwindClause(values, self.ident()))
            else:
                break
        if not clauses:
            self.error("expected MATCH")
        self.eat_kw("return")
        distinct = False
        if self.at_kw("distinct"):
            self.next()
            distinct = True
        items = [self.return_item()]
        while self.at_op(","):
            self.next()
            items.append(self.return_item())
        order_by: list[OrderItem] = []
        if self.at_kw("order"):
            self.next()
            self.eat_kw("by")
            order_by.append(self.order_item())
            while self.at_op(","):
                self.next()
                order_by.append(self.order_item())
        skip = limit = None
        if self.at_kw("skip"):
            self.next()
            skip = self.int_lit()
        if self.at_kw("limit"):
            self.next()
            limit = self.int_lit()
        if self.peek()[0] != "eof":
            self.error("unexpected trailing input")
        return Query(clauses, distinct, items, order_by, skip, limit)

    def match_clause(self, optional: bool) -> MatchClause:
        patterns = [self.pattern()]
        while self.at_op(","):
            self.next()
            patterns.append(self.pattern())
        where = None
        if self.at_kw("where"):
            self.next()
            where = self.expr()
        return MatchClause(patterns, where, optional)

    def with_clause(self) -> WithClause:
        distinct = False
        if self.at_kw("distinct"):
            self.next()
            distinct = True
        items = [self.return_item()]
        while self.at_op(","):
            self.next()
            items.append(self.return_item())
        where = None
        if self.at_kw("where"):
            self.next()
            where = self.expr()
        return WithClause(items, where, distinct)

    def int_lit(self) -> int:
        kind, val, _ = self.peek()
        if kind != "num" or not isinstance(val, int):
            self.error("expected integer")
        self.next()
        return val

    def pattern(self) -> Pattern:
        path_var = None
        shortest = False
        if self.peek()[0] == "name" and self.peek(1)[:2] == ("op", "="):
            path_var = self.ident()
            self.next()  # '='
        kind, val, _ = self.peek()
        if kind == "name" and val.lower() == "shortestpath" \
                and self.peek(1)[:2] == ("op", "("):
            self.next()
            self.eat_op("(")
            shortest = True
        elif path_var is not None:
            self.error("path variables are only supported with shortestPath")
        elems: list = [self.node_pat()]
        while self.at_op("-") or self.at_op("<-"):
            elems.append(self.rel_pat())
            elems.append(self.node_pat())
        if shortest:
            self.eat_op(")")
            if len(elems) != 3 or elems[1].min_hops is None:
                raise CypherSyntaxError(
                    "shortestPath takes a single variable-length "
                    "relationship: (a)-[:T*1..n]->(b)")
        return Pattern(elems, path_var, shortest)

    def node_pat(self) -> NodePat:
        self.eat_op("(")
        var = label = None
        props: dict[str, object] = {}
        if self.peek()[0] == "name":
            var = self.ident()
        if self.at_op(":"):
            self.next()
            label = self.ident(allow_kw=True)
        if self.at_op("{"):
            props = self.prop_map()
        self.eat_op(")")
        return NodePat(var, label, props)

    def prop_map(self) -> dict[str, object]:
        self.eat_op("{")
        props: dict[str, object] = {}
        while True:
            key = self.ident()
            self.eat_op(":")
            props[key] = self.literal().value
            if self.at_op(","):
                self.next()
                continue
            break
        self.eat_op("}")
        return props

    def rel_pat(self) -> RelPat:
        if self.at_op("<-"):
            self.next()
            direction = "in"
        else:
            self.eat_op("-")
            direction = "out"
        var = rtype = None
        min_h = max_h = None
        if self.at_op("["):
            self.next()
            if self.peek()[0] == "name" and not self.at_op(":"):
                var = self.ident()
            if self.at_op(":"):
                self.next()
                rtype = self.ident(allow_kw=True)
            if self.at_op("*"):
                self.next()
                min_h = self.int_lit()
                self.eat_op("..")
                max_h = self.int_lit()
                if min_h < 1 or max_h < min_h:
                    raise CypherSyntaxError(
                        f"bad hop range *{min_h}..{max_h} (need 1 <= min <= max)")
            if self.at_op("{"):
                raise CypherSyntaxError(
                    "relationship property maps are not supported "
                    "(edges carry only `type` in this graph model)")
            self.eat_op("]")
        if direction == "out":
            self.eat_op("->")
        else:
            self.eat_op("-")
        return RelPat(rtype, direction, var, min_h, max_h)

    # -- RETURN items ------------------------------------------------------
    def return_item(self) -> ReturnItem:
        kind, val, _ = self.peek()
        agg = None
        agg_distinct = False
        if kind == "name" and val.lower() in AGG_FNS \
                and self.peek(1)[:2] == ("op", "("):
            agg = val.lower()
            self.next()
            self.eat_op("(")
            if self.at_kw("distinct"):
                self.next()
                agg_distinct = True
            if self.at_op("*"):
                self.next()
                expr: object = Lit(1)      # COUNT(*) marker
                if agg != "count":
                    raise CypherSyntaxError(f"{agg.upper()}(*) is not valid")
            else:
                expr = self.value_ref()
            self.eat_op(")")
        else:
            expr = self.value_ref()
        alias = None
        if self.at_kw("as"):
            self.next()
            alias = self.ident()
        return ReturnItem(expr, agg, agg_distinct, alias)

    def value_ref(self):
        """IDENT['.'IDENT] | length(IDENT) | literal."""
        kind, val, _ = self.peek()
        if kind == "name":
            if val.lower() == "length" and self.peek(1)[:2] == ("op", "("):
                self.next()
                self.eat_op("(")
                inner = PathLen(self.ident())
                self.eat_op(")")
                return inner
            var = self.ident()
            if self.at_op("."):
                self.next()
                return Prop(var, self.ident())
            return VarRef(var)
        return self.literal()

    def literal(self) -> Lit:
        kind, val, _ = self.peek()
        if kind in ("num", "str"):
            self.next()
            return Lit(val)
        if self.at_kw("true"):
            self.next()
            return Lit(True)
        if self.at_kw("false"):
            self.next()
            return Lit(False)
        if self.at_kw("null"):
            self.next()
            return Lit(None)
        self.error("expected literal")

    def list_lit(self) -> list:
        self.eat_op("[")
        vals = [self.literal().value]
        while self.at_op(","):
            self.next()
            vals.append(self.literal().value)
        self.eat_op("]")
        return vals

    def order_item(self) -> OrderItem:
        expr = self.value_ref()
        asc = True
        if self.at_kw("asc"):
            self.next()
        elif self.at_kw("desc"):
            self.next()
            asc = False
        return OrderItem(expr, asc)

    # -- WHERE expressions -------------------------------------------------
    def expr(self):
        return self.or_expr()

    def or_expr(self):
        left = self.and_expr()
        ops = [left]
        while self.at_kw("or"):
            self.next()
            ops.append(self.and_expr())
        return ops[0] if len(ops) == 1 else BoolOp("or", ops)

    def and_expr(self):
        left = self.not_expr()
        ops = [left]
        while self.at_kw("and"):
            self.next()
            ops.append(self.not_expr())
        return ops[0] if len(ops) == 1 else BoolOp("and", ops)

    def not_expr(self):
        if self.at_kw("not"):
            self.next()
            inner = self.not_expr()
            if isinstance(inner, ExistsPat):
                inner.negated = not inner.negated
                return inner
            return Not(inner)
        return self.comparison()

    def comparison(self):
        if self.at_kw("exists"):
            self.next()
            self.eat_op("(")
            pat = self.pattern()
            self.eat_op(")")
            return ExistsPat(pat)
        if self.at_op("("):
            self.next()
            inner = self.expr()
            self.eat_op(")")
            return inner
        left = self.value_ref()
        kind, val, _ = self.peek()
        if kind == "op" and val in ("=", "<>", "<", "<=", ">", ">="):
            self.next()
            return Cmp(val, left, self.value_ref())
        if self.at_kw("not") and self.peek(1)[0] == "kw" \
                and self.peek(1)[1].lower() == "in":
            self.next()
            self.next()
            return InList(left, self.list_lit(), negated=True)
        if self.at_kw("in"):
            self.next()
            return InList(left, self.list_lit())
        if self.at_kw("contains"):
            self.next()
            return StrPred("contains", left, self.value_ref())
        if self.at_kw("starts"):
            self.next()
            self.eat_kw("with")
            return StrPred("starts", left, self.value_ref())
        if self.at_kw("ends"):
            self.next()
            self.eat_kw("with")
            return StrPred("ends", left, self.value_ref())
        if self.at_kw("is"):
            self.next()
            negated = False
            if self.at_kw("not"):
                self.next()
                negated = True
            self.eat_kw("null")
            return IsNull(left, negated)
        self.error("expected comparison operator")


def parse(text: str) -> Query:
    return _Parser(text).parse_query()
