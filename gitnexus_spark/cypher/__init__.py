"""Cypher-subset front-end over the two-table graph model.

The reference's user-facing query surface is Cypher executed by Kuzu
(src/ai/cypher-generator.ts:36-104 is its own catalogue of the query
shapes it emits; src/core/graph/query-engine regex-parses a similar
subset). This package is the Spark-native replacement: a small lexer /
recursive-descent parser producing an AST, and a compiler that lowers
the AST onto the (nodes, edges) DataFrames as Catalyst-visible joins,
filters and aggregates — no interpreter in the data path, so every
compiled query gets predicate pushdown, broadcast planning and AQE for
free.
"""

from .compiler import compile_query, cypher_query
from .parser import parse

__all__ = ["parse", "compile_query", "cypher_query"]
