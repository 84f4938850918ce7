"""AST node types for the Cypher subset.

Shapes mirror what the reference's generator emits and its validator
accepts (src/ai/cypher-generator.ts:36-104, 255-300): single-MATCH
queries over node/relationship patterns with optional property maps,
variable-length relationships ``*m..n``, WHERE boolean expressions
(comparisons, CONTAINS / STARTS WITH / ENDS WITH, IS [NOT] NULL,
EXISTS((a)-[:T]->(b))), and RETURN lists with Cypher's implicit
grouping, DISTINCT, ORDER BY, SKIP and LIMIT.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class NodePat:
    var: str | None
    label: str | None = None
    props: dict[str, object] = field(default_factory=dict)


@dataclass
class RelPat:
    rtype: str | None          # None = any type
    direction: str             # 'out' = ->, 'in' = <-
    var: str | None = None
    min_hops: int | None = None  # None,None = plain single hop
    max_hops: int | None = None


@dataclass
class Pattern:
    """Alternating [NodePat, RelPat, NodePat, ...] (odd length >= 1).
    path_var/shortest support ``p = shortestPath((a)-[:T*1..n]->(b))``:
    one row per reachable (a, b) pair at the MINIMUM hop count, exposed
    to RETURN via ``length(p)``."""
    elements: list
    path_var: str | None = None
    shortest: bool = False


# --- WHERE expressions ----------------------------------------------------

@dataclass
class Lit:
    value: object


@dataclass
class Prop:
    var: str
    key: str


@dataclass
class VarRef:
    var: str


@dataclass
class PathLen:
    """length(p) over a shortestPath path variable."""
    var: str


@dataclass
class Cmp:
    op: str                    # = <> < <= > >=
    left: object
    right: object


@dataclass
class StrPred:
    op: str                    # contains | starts | ends
    left: object
    right: object


@dataclass
class InList:
    """expr IN [lit, ...]"""
    left: object
    values: list
    negated: bool = False


@dataclass
class IsNull:
    expr: object
    negated: bool = False


@dataclass
class ExistsPat:
    pattern: Pattern
    negated: bool = False


@dataclass
class BoolOp:
    op: str                    # and | or
    operands: list


@dataclass
class Not:
    operand: object


# --- RETURN ---------------------------------------------------------------

AGG_FNS = ("count", "collect", "sum", "avg", "min", "max")


@dataclass
class ReturnItem:
    expr: object               # Prop | VarRef | Lit | '*' (count star marker)
    agg: str | None = None     # one of AGG_FNS
    agg_distinct: bool = False
    alias: str | None = None


@dataclass
class OrderItem:
    expr: object               # Prop | VarRef | str (output-column alias)
    asc: bool = True


# --- reading clauses ------------------------------------------------------

@dataclass
class MatchClause:
    """MATCH / OPTIONAL MATCH with its own (Cypher-scoped) WHERE."""
    patterns: list             # list[Pattern]
    where: object | None = None
    optional: bool = False


@dataclass
class WithClause:
    """WITH projection boundary; WHERE after it is Cypher's HAVING."""
    items: list                # list[ReturnItem]
    where: object | None = None
    distinct: bool = False


@dataclass
class UnwindClause:
    """UNWIND [lit, ...] AS alias — one row per list element."""
    values: list
    alias: str


@dataclass
class Query:
    clauses: list              # list[MatchClause | WithClause]
    distinct: bool
    items: list                # list[ReturnItem]
    order_by: list             # list[OrderItem]
    skip: int | None
    limit: int | None
