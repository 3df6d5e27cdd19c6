"""Cypher-subset → DataFrame-plan translator (SURVEY.md §2.11).

The reference's ``SimpleQueryParser`` (``graph.py:950-1111``) regex-parses
exactly this grammar and *executes while parsing* against its in-memory
indexes; here the same grammar compiles to a Catalyst plan over the
(nodes, edges) DataFrames — parse and execution are properly separated,
and the optimizer plans the joins.

Supported (reference grammar + any-type variable-length extension):
    MATCH (n:Label {prop: value})                       RETURN …
    MATCH (a:L1 {…})-[:TYPE]->(b:L2 {…})                RETURN …
    MATCH (a…)-[:TYPE*min..max]->(b…)                   RETURN …
    MATCH (a…)-[*min..max]->(b…)                        RETURN …
    WHERE var.prop OP value        (OP ∈ = <> < > <= >=, AND-combined)
    RETURN var | var.prop [, …]    (var → its id column)

Output columns are named ``var`` → `var_id`, ``var.prop`` → `var_prop`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NODE = r"\(\s*(\w+)\s*(?::\s*(\w+))?\s*(?:\{([^}]*)\})?\s*\)"
_EDGE = r"-\s*\[\s*(?::\s*(\w+))?\s*(?:\*\s*(\d+)\s*\.\.\s*(\d+))?\s*\]\s*->"
_MATCH_RE = re.compile(rf"MATCH\s+{_NODE}(?:\s*{_EDGE}\s*{_NODE})?", re.IGNORECASE)
_WHERE_RE = re.compile(r"WHERE\s+(.+?)(?:\s+RETURN\s+|$)", re.IGNORECASE | re.DOTALL)
_COND_RE = re.compile(r"(\w+)\.(\w+)\s*(<=|>=|<>|=|<|>)\s*('[^']*'|-?[\d.]+)")
_RETURN_RE = re.compile(r"RETURN\s+(.+)$", re.IGNORECASE | re.DOTALL)


@dataclass
class _NodePat:
    var: str
    label: str | None
    props: dict[str, object] = field(default_factory=dict)


def _parse_props(raw: str | None) -> dict[str, object]:
    if not raw:
        return {}
    out: dict[str, object] = {}
    for part in raw.split(","):
        k, v = part.split(":", 1)
        v = v.strip()
        if v.startswith("'") or v.startswith('"'):
            out[k.strip()] = v.strip("'\"")
        else:
            out[k.strip()] = float(v) if "." in v else int(v)
    return out


def _parse_value(v: str):
    if v.startswith("'"):
        return v.strip("'")
    return float(v) if "." in v else int(v)


_OPS = {
    "=": lambda c, v: c == v,
    "<>": lambda c, v: c != v,
    "<": lambda c, v: c < v,
    ">": lambda c, v: c > v,
    "<=": lambda c, v: c <= v,
    ">=": lambda c, v: c >= v,
}


def _node_df(nodes: DataFrame, pat: _NodePat) -> DataFrame:
    """Nodes matching the pattern, columns prefixed `{var}_`."""
    df = nodes
    if pat.label:
        df = df.filter(F.array_contains(F.col("labels"), pat.label))
    for k, v in pat.props.items():
        df = df.filter(F.col(k).isNotNull() & (F.col(k) == F.lit(v)))
    return df.select(*[F.col(c).alias(f"{pat.var}_{c}") for c in df.columns])


def cypher(nodes: DataFrame, edges: DataFrame, query: str) -> DataFrame:
    """Compile and run a Cypher-subset query against the graph view."""
    m = _MATCH_RE.search(query)
    if not m:
        raise ValueError(f"unparseable MATCH clause in {query!r}")
    g = m.groups()
    left = _NodePat(g[0], g[1], _parse_props(g[2]))
    edge_type, lo, hi = g[3], g[4], g[5]
    right = _NodePat(g[6], g[7], _parse_props(g[8])) if g[6] else None

    if right is None:
        bound = _node_df(nodes, left)
    else:
        e = edges if edge_type is None else edges.filter(F.col("type") == edge_type)
        pairs = e.select(F.col("src").alias("__src"), F.col("dst").alias("__dst")).distinct()
        if lo is not None:
            lo_i, hi_i = int(lo), int(hi or lo)
            reach = None
            frontier = pairs.select(
                F.col("__src").alias("__start"), F.col("__dst").alias("__end")
            ).withColumn("__path", F.array("__start", "__end"))
            for depth in range(1, hi_i + 1):
                if depth > 1:
                    frontier = (
                        frontier.join(pairs, frontier["__end"] == pairs["__src"])
                        .filter(~F.array_contains(F.col("__path"), F.col("__dst")))
                        .select(
                            "__start",
                            F.col("__dst").alias("__end"),
                            F.concat(F.col("__path"), F.array(F.col("__dst"))).alias("__path"),
                        )
                    )
                    frontier = frontier.localCheckpoint(eager=False)
                if depth >= lo_i:
                    step = frontier.select("__start", "__end").distinct()
                    reach = step if reach is None else reach.unionByName(step).distinct()
            hops = reach
        else:
            hops = pairs.select(F.col("__src").alias("__start"), F.col("__dst").alias("__end"))
        bound = (
            _node_df(nodes, left)
            .join(hops, F.col(f"{left.var}_id") == F.col("__start"))
            .join(_node_df(nodes, right), F.col("__end") == F.col(f"{right.var}_id"))
            .drop("__start", "__end")
        )

    w = _WHERE_RE.search(query)
    if w:
        conds = _COND_RE.findall(w.group(1))
        if not conds:
            raise ValueError(f"unparseable WHERE clause in {query!r}")
        for var, prop, op, raw in conds:
            c = F.col(f"{var}_{prop}")
            bound = bound.filter(c.isNotNull() & _OPS[op](c, F.lit(_parse_value(raw))))

    r = _RETURN_RE.search(query)
    if not r:
        raise ValueError(f"missing RETURN clause in {query!r}")
    out_cols = []
    for item in r.group(1).split(","):
        item = item.strip()
        if "." in item:
            var, prop = item.split(".", 1)
            out_cols.append(F.col(f"{var}_{prop}").alias(f"{var}_{prop}"))
        else:
            out_cols.append(F.col(f"{item}_id").alias(f"{item}_id"))
    return bound.select(*out_cols).distinct()
