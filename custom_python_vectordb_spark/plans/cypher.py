"""Cypher-subset → DataFrame-plan translator (SURVEY.md §2.11).

The reference's ``SimpleQueryParser`` (``graph.py:950-1111``) regex-parses
a single-edge grammar and *executes while parsing* against its in-memory
indexes; here a strictly larger grammar compiles to a Catalyst plan over
the (nodes, edges) DataFrames — parse and execution are properly
separated, and the optimizer plans the joins.

Supported (reference grammar + round-2 extensions):
    MATCH (n:Label {prop: value})                        RETURN …
    MATCH (a…)-[:TYPE]->(b…)-[:TYPE2]->(c…)- …           chains, any length
    MATCH (a…)<-[:TYPE]-(b…)                             reverse edges
    MATCH (a…)-[:TYPE]-(b…)                              undirected edges
    MATCH (a…)-[:TYPE*min..max]->(b…)                    var-length (simple paths)
    MATCH … MATCH …                                      conjunctive patterns
    OPTIONAL MATCH (boundvar)-[:TYPE]->(new…)            left-join semantics
    … OPTIONAL MATCH … MATCH …                           clauses compose in
        order: later inner MATCHes join on shared vars; NULL bindings from
        an earlier OPTIONAL clause survive joins on OTHER variables and
        (correctly) fail joins on the optional variable itself
    [MATCH | OPTIONAL MATCH] … WHERE …                   per-clause WHERE
    WHERE var.prop OP value        (OP ∈ = <> < > <= >=, AND-combined)
    RETURN var | var.prop | count(var) | count(*) [, …]
           [ORDER BY var[.prop] [ASC|DESC], …] [LIMIT n]

Aggregate RETURN uses Cypher's implicit grouping (non-aggregate items are
the group keys, named as below; counts are `count_{var}` / `count_all`)
over the translator's SET semantics — identical variable bindings dedup,
so a count over parallel edges counts distinct bindings, not
relationships.

Clause order is (MATCH WHERE?)+ → RETURN.  Output columns are named
``var`` → `var_id`, ``var.prop`` → `var_prop`.  RETURN dedups (the
oracle convention is SELECT DISTINCT); ORDER BY/LIMIT apply after dedup,
and a LIMIT query must order by a unique key for determinism (registry
contract).  Each clause's variables must be distinct within the clause;
a later clause reusing a variable joins on that variable's node id
(inner for MATCH, left for OPTIONAL MATCH).

WHERE placement semantics: a condition on a variable introduced by an
OPTIONAL MATCH filters that clause BEFORE the left join (Cypher's
pattern-predicate semantics — non-qualifying rows become NULL, left rows
survive); every other condition filters the rows bound so far (for inner
MATCH chains the two are equivalent, so this matches Cypher for the
whole supported grammar except bound-var predicates inside an OPTIONAL
clause, which Cypher also nulls but we filter — documented subset).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NODE_RE = re.compile(r"\(\s*(\w+)\s*(?::\s*(\w+))?\s*(?:\{([^}]*)\})?\s*\)")
_EDGE_RE = re.compile(
    r"(<-|-)\s*\[\s*(?::\s*(\w+))?\s*(?:\*\s*(\d+)\s*\.\.\s*(\d+))?\s*\]\s*(->|-)"
)
_MATCH_RE = re.compile(r"(OPTIONAL\s+)?MATCH\s+", re.IGNORECASE)
_WHERE_AT_RE = re.compile(
    r"\s*WHERE\s+(.+?)(?=\s+RETURN\s+|\s+OPTIONAL\s+|\s+MATCH\s+|\s*$)",
    re.IGNORECASE | re.DOTALL,
)
_COND_RE = re.compile(r"(\w+)\.(\w+)\s*(<=|>=|<>|=|<|>)\s*('[^']*'|-?[\d.]+)")
_RETURN_RE = re.compile(
    r"RETURN\s+(.+?)(?:\s+ORDER\s+BY\s+(.+?))?(?:\s+LIMIT\s+(\d+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ORDER_ITEM_RE = re.compile(r"^(\w+)(?:\.(\w+))?(?:\s+(ASC|DESC))?$", re.IGNORECASE)
_AGG_ITEM_RE = re.compile(r"^count\s*\(\s*(\*|\w+)\s*\)$", re.IGNORECASE)


@dataclass
class _NodePat:
    var: str
    label: str | None
    props: dict[str, object] = field(default_factory=dict)


@dataclass
class _EdgePat:
    type: str | None
    lo: int | None
    hi: int | None
    reverse: bool  # True for <-[…]- (pattern read right-to-left)
    undirected: bool = False  # -[…]- matches the edge in either direction


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


def _ws(s: str, pos: int) -> int:
    while pos < len(s) and s[pos].isspace():
        pos += 1
    return pos


def _parse_pattern(s: str, pos: int) -> tuple[list[_NodePat], list[_EdgePat], int]:
    """Parse node (edge node)* starting at `pos`; returns (nodes, edges, end)."""
    m = _NODE_RE.match(s, _ws(s, pos))
    if not m:
        raise ValueError(f"expected node pattern at …{s[pos:pos + 40]!r}")
    nodes = [_NodePat(m.group(1), m.group(2), _parse_props(m.group(3)))]
    edges: list[_EdgePat] = []
    pos = m.end()
    while True:
        em = _EDGE_RE.match(s, _ws(s, pos))
        if not em:
            return nodes, edges, pos
        head, etype, lo, hi, tail = em.groups()
        if head == "<-" and tail == "-":
            reverse, undirected = True, False
        elif head == "-" and tail == "->":
            reverse, undirected = False, False
        elif head == "-" and tail == "-":
            reverse, undirected = False, True
        else:
            raise ValueError(f"double-headed edge pattern <-…-> not supported in {s!r}")
        nm = _NODE_RE.match(s, _ws(s, em.end()))
        if not nm:
            raise ValueError(f"dangling edge pattern at …{s[em.start():em.end() + 40]!r}")
        edges.append(
            _EdgePat(etype, int(lo) if lo else None, int(hi) if hi else None, reverse, undirected)
        )
        nodes.append(_NodePat(nm.group(1), nm.group(2), _parse_props(nm.group(3))))
        pos = nm.end()


def _node_df(nodes: DataFrame, pat: _NodePat) -> DataFrame:
    """Nodes matching the pattern, columns prefixed `{var}_`."""
    df = nodes
    if pat.label:
        df = df.filter(F.array_contains(F.col("labels"), pat.label))
    for k, v in pat.props.items():
        df = df.filter(F.col(k).isNotNull() & (F.col(k) == F.lit(v)))
    return df.select(*[F.col(c).alias(f"{pat.var}_{c}") for c in df.columns])


def _edge_hops(edges: DataFrame, ep: _EdgePat) -> DataFrame:
    """Distinct (__start, __end) pairs this edge pattern can bind.

    Var-length = simple paths of length lo..hi (cycle check on the path),
    the reference's traversal semantics; lineage is truncated per hop."""
    e = edges if ep.type is None else edges.filter(F.col("type") == ep.type)
    if ep.undirected:
        pairs = (
            e.select(F.col("src").alias("__start"), F.col("dst").alias("__end"))
            .unionByName(e.select(F.col("dst").alias("__start"), F.col("src").alias("__end")))
            .distinct()
        )
    else:
        s, d = ("dst", "src") if ep.reverse else ("src", "dst")
        pairs = e.select(F.col(s).alias("__start"), F.col(d).alias("__end")).distinct()
    if ep.lo is None:
        return pairs
    reach: DataFrame | None = None
    frontier = pairs.withColumn("__path", F.array("__start", "__end"))
    step = pairs.select(F.col("__start").alias("__s2"), F.col("__end").alias("__e2"))
    for depth in range(1, ep.hi + 1):
        if depth > 1:
            frontier = (
                frontier.join(step, frontier["__end"] == step["__s2"])
                .filter(~F.array_contains(F.col("__path"), F.col("__e2")))
                .select(
                    "__start",
                    F.col("__e2").alias("__end"),
                    F.concat(F.col("__path"), F.array(F.col("__e2"))).alias("__path"),
                )
            )
            frontier = frontier.localCheckpoint(eager=False)
        if depth >= ep.lo:
            got = frontier.select("__start", "__end").distinct()
            reach = got if reach is None else reach.unionByName(got).distinct()
    assert reach is not None
    return reach


def _chain_df(nodes: DataFrame, edges: DataFrame, npats: list[_NodePat], epats: list[_EdgePat]) -> DataFrame:
    """One MATCH clause compiled to a join chain; columns `{var}_*`."""
    seen = {npats[0].var}
    bound = _node_df(nodes, npats[0])
    for i, ep in enumerate(epats):
        nxt = npats[i + 1]
        if nxt.var in seen:
            raise ValueError(f"variable {nxt.var!r} repeated within one MATCH clause")
        seen.add(nxt.var)
        bound = (
            bound.join(_edge_hops(edges, ep), F.col(f"{npats[i].var}_id") == F.col("__start"))
            .join(_node_df(nodes, nxt), F.col("__end") == F.col(f"{nxt.var}_id"))
            .drop("__start", "__end")
        )
    return bound


def cypher(nodes: DataFrame, edges: DataFrame, query: str) -> DataFrame:
    """Compile and run a Cypher-subset query against the graph view."""
    starts = list(_MATCH_RE.finditer(query))
    if not starts:
        raise ValueError(f"unparseable MATCH clause in {query!r}")

    bound: DataFrame | None = None
    bound_vars: set[str] = set()
    for m in starts:
        optional = bool(m.group(1))
        npats, epats, pos = _parse_pattern(query, m.end())
        clause = _chain_df(nodes, edges, npats, epats)
        clause_vars = [p.var for p in npats]

        # per-clause WHERE: conditions on variables this clause introduces
        # filter the clause pattern itself (pre-join — Cypher's OPTIONAL
        # MATCH predicate semantics); everything else filters post-join.
        pre: list[tuple[str, str, str, str]] = []
        post: list[tuple[str, str, str, str]] = []
        wm = _WHERE_AT_RE.match(query, pos)
        if wm:
            conds = _COND_RE.findall(wm.group(1))
            if not conds:
                raise ValueError(f"unparseable WHERE clause in {query!r}")
            for cond in conds:
                var = cond[0]
                new_here = var in clause_vars and var not in bound_vars
                (pre if optional and new_here else post).append(cond)
        for var, prop, op, raw in pre:
            c = F.col(f"{var}_{prop}")
            clause = clause.filter(c.isNotNull() & _OPS[op](c, F.lit(_parse_value(raw))))

        if bound is None:
            if optional:
                raise ValueError("first clause cannot be OPTIONAL MATCH")
            bound, bound_vars = clause, set(clause_vars)
        else:
            shared = [v for v in clause_vars if v in bound_vars]
            new = [v for v in clause_vars if v not in bound_vars]
            if not shared:
                raise ValueError(f"MATCH clause {m.group(0)!r}… shares no variable with earlier clauses")
            keys = [f"{v}_id" for v in shared]
            keep = keys + [c for c in clause.columns if c.split("_", 1)[0] in new]
            bound = bound.join(clause.select(*keep), on=keys, how="left" if optional else "inner")
            bound_vars |= set(new)

        for var, prop, op, raw in post:
            c = F.col(f"{var}_{prop}")
            bound = bound.filter(c.isNotNull() & _OPS[op](c, F.lit(_parse_value(raw))))

    r = _RETURN_RE.search(query)
    if not r:
        raise ValueError(f"missing RETURN clause in {query!r}")
    items = [i.strip() for i in r.group(1).split(",")]
    agg_matches = [_AGG_ITEM_RE.match(i) for i in items]
    if any(agg_matches):
        # aggregate RETURN: Cypher's implicit grouping — non-aggregate
        # items are the group keys, count() counts MATCHED rows (each
        # relationship binding is a distinct match, so no dedup first)
        keys: list[str] = []
        aggs: list[Column] = []
        for item, m in zip(items, agg_matches):
            if m:
                target = m.group(1)
                if target == "*":
                    aggs.append(F.count(F.lit(1)).alias("count_all"))
                else:
                    aggs.append(F.count(F.col(f"{target}_id")).alias(f"count_{target}"))
            elif "." in item:
                var, prop = item.split(".", 1)
                keys.append(f"{var}_{prop}")
            else:
                keys.append(f"{item}_id")
        out = (
            bound.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
            if keys
            else bound.agg(*aggs)
        )
    else:
        out_cols: list[Column] = []
        for item in items:
            if "." in item:
                var, prop = item.split(".", 1)
                out_cols.append(F.col(f"{var}_{prop}").alias(f"{var}_{prop}"))
            else:
                out_cols.append(F.col(f"{item}_id").alias(f"{item}_id"))
        out = bound.select(*out_cols).distinct()

    if r.group(2):
        order: list[Column] = []
        for item in r.group(2).split(","):
            om = _ORDER_ITEM_RE.match(item.strip())
            if not om:
                raise ValueError(f"unparseable ORDER BY item {item!r}")
            var, prop, direction = om.groups()
            c = F.col(f"{var}_{prop}" if prop else f"{var}_id")
            order.append(c.desc() if direction and direction.upper() == "DESC" else c.asc())
        out = out.orderBy(*order)
    if r.group(3):
        out = out.limit(int(r.group(3)))
    return out
