"""Catalyst logical-plan TopN→index-scan rule (VERDICT r7 #10 / r8 #4 /
r9 "what's missing" #2).

The reference registers its TopN rewrite inside the engine's optimizer
(`db.config.optimizer_extensions`, hnsw_optimize_scan.cpp:255-258), so
it fires on ANY SQL. Spark's equivalent injection point
(``spark.sql.extensions``) takes a JVM rule class — but our index scan
is a Python physical operator (mapInPandas over graph partitions), and
a JVM Catalyst rule cannot call back into Python kernels. So this
module makes the same move one level down the stack than the old regex
front-end and one level up from a JVM rule: it pattern-matches the
REAL Catalyst ANALYZED plan (via py4j), after the actual parser and
analyzer have resolved aliases, casts, star-expansion, view inlining
and scoping — regex never sees any of that — and is installed as a
``SparkSession.sql`` hook (``install_sql_extension``), so *plain*
``spark.sql("SELECT … ORDER BY array_distance(vec, …) LIMIT k")`` uses
the index with no VssPlanner-specific call site.

Matched shape (mirroring hnsw_optimize_scan.cpp:29-141 — the
reference's matcher is equally literal: single ascending order key,
constant query vector, plain scan):

    GlobalLimit(k)
      LocalLimit(k)
        [Project]                      -- ORDER BY on unselected expr
          Sort([dist_fn(vec_col, CONST) ASC], global)
            [Project]*  [Filter]*      -- lineage-checked passthroughs
              SubqueryAlias(registered table)
                View | relation

Everything else falls through to normal execution — narrowness is the
design, exactly as in the reference. Filters between Sort and the
relation reproduce the reference's filter pull-up: only scan-pushable
conjunctions are accepted, applied ABOVE the index scan (may
under-return; hnsw_optimize_scan.cpp:161-191).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from duckdb_vss_spark.plans.rewrite import _METRIC_FOR_FN, pushable_where

__all__ = ["PlanTopK", "match_topk_plan", "install_sql_extension", "uninstall_sql_extension"]

# SubqueryAlias children that prove the alias names a base table/view,
# not a derived subquery wearing the same name.
_RELATION_CLASSES = frozenset(
    {
        "View",
        "LogicalRelation",
        "UnresolvedCatalogRelation",
        "HiveTableRelation",
        "DataSourceV2Relation",
        "LocalRelation",
    }
)


def _cls(p) -> str:
    return p.getClass().getSimpleName()


def _seq(s) -> list:
    return [s.apply(i) for i in range(s.size())]


def _child(p):
    return p.children().apply(0)


@dataclass
class PlanTopK:
    """A plan-level match: table/vec/metric/vector/k plus the original
    projection (as SQL strings, re-evaluated over the aliased hits —
    the reference recomputes the distance in the surviving projection
    too, SURVEY §3-B.4) and any pull-up filters (qualified SQL)."""

    table: str
    vec_col: str
    fn: str
    metric: str
    query_vec: list[float]
    k: int
    project_exprs: list[str] | None
    filters: list[str] = field(default_factory=list)
    # DataFrame-API builds put a Project ABOVE the limit
    # (.limit(k).select(...)); its exprs apply AFTER project_exprs
    outer_exprs: list[str] | None = None


def _strip_casts(s: str) -> str:
    """``CAST(x AS T)`` → ``x`` (innermost-first), drop backticks and
    table qualifiers — normalization for the pushable-predicate gate
    only (the filter applied to the hits keeps the original SQL). The
    type pattern stops at the cast's own closing paren (word chars plus
    ONE optional precision group like DECIMAL(12,2)) — a paren-greedy
    class would eat the enclosing expression's parens."""
    s = s.replace("`", "")
    while True:
        new = re.sub(
            r"CAST\(([^()]*) AS [A-Za-z0-9_<> ]+(?:\([0-9, ]*\))?\)",
            r"\1",
            s,
            flags=re.IGNORECASE,
        )
        if new == s:
            break
        s = new
    return re.sub(r"\b[A-Za-z_][A-Za-z0-9_]*\.", "", s)


def _split_conjuncts(s: str) -> list[str] | None:
    """Split on AND at paren depth 0; None if any OR at depth 0 (the
    pull-up gate rejects disjunctions outright)."""
    parts: list[str] = []
    depth = 0
    buf: list[str] = []
    tokens = re.split(r"(\(|\)|\bAND\b|\bOR\b)", s, flags=re.IGNORECASE)
    for t in tokens:
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0 and t.strip().upper() == "AND":
            parts.append("".join(buf))
            buf = []
            continue
        elif depth == 0 and t.strip().upper() == "OR":
            return None
        buf.append(t)
    parts.append("".join(buf))
    return parts


def _unwrap(s: str) -> str:
    """Strip balanced wrapping parens: ``((a = 1))`` → ``a = 1``."""
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        for i, ch in enumerate(s):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i != len(s) - 1:
                    return s  # parens don't wrap the whole string
        s = s[1:-1].strip()
    return s


def _pushable_cond(cond_sql: str) -> bool:
    """The plan-level twin of rewrite.pushable_where: Catalyst's
    ``condition().sql()`` wraps every node in parens and inserts CASTs
    (``(a.x <= CAST(2 AS BIGINT))``), which the text gate never sees
    from user SQL — normalize (strip casts/backticks/qualifiers, split
    conjuncts paren-aware, unwrap each) and run the same per-conjunct
    gate."""
    s = _strip_casts(cond_sql)
    parts = _split_conjuncts(_unwrap(s))
    if parts is None:
        return False
    return all(pushable_where(_unwrap(p)) for p in parts)


def _eval_vector(spark: SparkSession, expr) -> list[float] | None:
    """Evaluate a foldable array expression to a float list — one
    zero-row-scan driver query over the expression's own SQL, which
    sidesteps py4j round-trips through Catalyst internal array/decimal
    representations."""
    try:
        raw = getattr(spark, "_vss_sql_original", None) or spark.sql
        row = raw(f"SELECT CAST({expr.sql()} AS ARRAY<DOUBLE>) AS v").first()
        vec = row[0]
        if vec is None:
            return None
        return [float(x) for x in vec]
    except Exception:  # noqa: BLE001 — any surprise → no rewrite
        return None


def _child_expr(e):
    return e.children().apply(0)


def _dist_call(key):
    """(fn_name, [arg expressions]) when ``key`` is a rewritable
    distance expression: a registered distance UDF call, or
    ``1.0 − array_cosine_similarity(a, b)`` — the reference's
    ExpressionRewriter (hnsw_optimize_expr.cpp:22-97) realized at plan
    level, since the hook never text-rewrites parseable Spark SQL.
    (None, None) otherwise."""
    c = _cls(key)
    if c == "Subtract":
        ch = _seq(key.children())
        left = ch[0] if len(ch) == 2 else None
        while left is not None and _cls(left) == "Cast":  # analyzer wraps
            left = _child_expr(left)                       # 1.0 to double
        if (
            left is not None
            and _cls(left) == "Literal"
            and _cls(ch[1]) == "PythonUDF"
        ):
            try:
                one = float(str(left.sql()).rstrip("BDbd"))
            except ValueError:
                return None, None
            if one == 1.0 and str(ch[1].name()) == "array_cosine_similarity":
                return "array_cosine_distance", _seq(ch[1].children())
        return None, None
    if c == "PythonUDF" and str(key.name()) in _METRIC_FOR_FN:
        return str(key.name()), _seq(key.children())
    return None, None


def _alias_target(node, expr_id: int):
    """Find the Project below ``node`` defining alias ``expr_id``;
    return (alias child expression, node below that Project). A Filter
    encountered BEFORE the defining Project aborts the match (return
    None): its predicate would be silently dropped by the rewrite —
    WHERE clauses sit below the projection in every shape we route, so
    this only fires on exotic plans, where falling through is the
    conservative answer."""
    while _cls(node) == "Project":
        for e in _seq(node.projectList()):
            if _cls(e) == "Alias" and e.exprId().id() == expr_id:
                return e.child(), _child(node)
        node = _child(node)
    return None, None


def _descend_to_relation(node, attr_id: int, attr_name: str):
    """Walk Project/Filter nodes down to the first SubqueryAlias,
    lineage-checking the vector attribute (a Project may pass it
    through or alias-rename another plain column to it; a COMPUTED
    expression under its exprId aborts the match). Returns
    (table_name, final_attr_name, filter_sqls) or (None, None, [])."""
    filters: list[str] = []
    while True:
        c = _cls(node)
        if c == "Filter":
            filters.append(node.condition().sql())
            node = _child(node)
        elif c == "Project":
            nxt_id, nxt_name = None, None
            for e in _seq(node.projectList()):
                ec = _cls(e)
                if ec == "AttributeReference" and e.exprId().id() == attr_id:
                    nxt_id, nxt_name = attr_id, e.name()
                    break
                if ec == "Alias" and e.exprId().id() == attr_id:
                    ch = e.child()
                    if _cls(ch) != "AttributeReference":
                        return None, None, []  # computed vector column
                    nxt_id, nxt_name = ch.exprId().id(), ch.name()
                    break
            if nxt_id is None:
                return None, None, []
            attr_id, attr_name = nxt_id, nxt_name
            node = _child(node)
        elif c == "SubqueryAlias":
            if _cls(_child(node)) not in _RELATION_CLASSES:
                return None, None, []
            return str(node.alias()), attr_name, filters
        else:
            return None, None, []


def match_topk_plan(
    spark: SparkSession, jplan, registered: set[tuple[str, str]]
) -> PlanTopK | None:
    """Match the analyzed plan against the TopN-over-indexed-table
    shape; None on any deviation (the conservative default)."""
    try:
        p = jplan
        # DataFrame builds commonly project ABOVE the limit
        # (.limit(k).select("id")); projecting k rows commutes with
        # taking them, so accept one plain Project at the root
        outer_project = None
        if _cls(p) == "Project":
            outer_project = p
            p = _child(p)
        if _cls(p) != "GlobalLimit":
            return None
        k = int(p.limitExpr().eval(None))
        p = _child(p)
        if _cls(p) != "LocalLimit":
            return None
        p = _child(p)
        top_project = None
        if _cls(p) == "Project":
            top_project = p
            p = _child(p)
        if _cls(p) != "Sort":
            return None
        # SORT BY (global=false) is a per-partition sort — rewriting it
        # to a global top-k would CHANGE semantics; require ORDER BY
        try:
            if not getattr(p, "global")():
                return None
        except Exception:  # noqa: BLE001 — accessor unavailable → abort
            return None
        order = p.order()
        if order.size() != 1:
            return None
        so = order.apply(0)
        if so.direction().toString() != "Ascending":
            return None
        key = so.child()
        below = _child(p)
        if top_project is None and _cls(below) == "Project":
            top_project = below
        if _cls(key) == "AttributeReference":
            key, below = _alias_target(below, key.exprId().id())
            if key is None:
                return None
        fn, args = _dist_call(key)
        if fn is None or len(args) != 2:
            return None
        vec, qlit = args
        if _cls(vec) != "AttributeReference":
            if _cls(qlit) == "AttributeReference" and vec.foldable():
                vec, qlit = qlit, vec  # dist(CONST, col) — symmetric kernels
            else:
                return None
        if not qlit.foldable():
            return None
        table, vname, filters = _descend_to_relation(
            below, vec.exprId().id(), vec.name()
        )
        if table is None:
            return None
        if (table.lower(), vname.lower()) not in registered:
            return None
        for f in filters:
            if not _pushable_cond(f):
                return None
        qvec = _eval_vector(spark, qlit)
        if qvec is None:
            return None
        proj = None
        if top_project is not None:
            # an alias of the SAME distance expression reuses the hits'
            # already-computed `dist` column instead of re-evaluating
            # the SQL-registered UDF: the scan's distance is the JVM
            # sequential fold the oracle parity is pinned to, while the
            # registered pandas UDF sums via einsum — last-ulp apart
            proj = []
            for e in _seq(top_project.projectList()):
                is_dist_alias = False
                try:
                    is_dist_alias = _cls(e) == "Alias" and e.child().semanticEquals(key)
                except Exception:  # noqa: BLE001
                    pass
                proj.append(
                    f"`dist` AS `{e.name()}`" if is_dist_alias else e.sql()
                )
        outer = None
        if outer_project is not None:
            # rendered over the ALREADY-projected hits, where the inner
            # projection's output names (incl. any dist alias) exist
            outer = [e.sql() for e in _seq(outer_project.projectList())]
        return PlanTopK(
            table=table,
            vec_col=vname,
            fn=fn,
            metric=_METRIC_FOR_FN[fn],
            query_vec=qvec,
            k=k,
            project_exprs=proj,
            filters=filters,
            outer_exprs=outer,
        )
    except Exception:  # noqa: BLE001 — unknown plan/py4j surface → no rewrite
        return None


def install_sql_extension(planner) -> None:
    """Hook ``spark.sql`` so EVERY statement runs through the planner
    (plan-level TopN match first, regex forms as fallback, untouched
    execution otherwise). Idempotent; ``uninstall_sql_extension``
    restores the original binding."""
    spark = planner.spark
    if getattr(spark, "_vss_sql_original", None) is not None:
        return
    raw = spark.sql

    def vss_sql(query: str, *a, **kw) -> DataFrame:
        if a or kw:  # parameterized forms pass through untouched
            return raw(query, *a, **kw)
        # Spark dialect is authoritative on the hooked session: if the
        # statement parses+analyzes natively, its Spark semantics stand
        # (``<=>`` is null-safe equality here, NOT cosine distance, and
        # operator glyphs inside string literals are data) — only the
        # plan-level TopN rule may then reroute it, never a text
        # rewrite. The DuckDB-dialect front-end (operator aliases,
        # ``[..]::FLOAT[n]`` literals, k-ary min_by, lateral top-k)
        # runs ONLY for statements Spark cannot parse/analyze at all,
        # which is exactly the reference-SQL surface. One carve-out
        # (r13): SET/RESET of the reference's hnsw_* settings — Spark
        # parses SET natively and would silently set a meaningless
        # bare conf key instead of the spark.vss.* gate the engine
        # reads, so those two names route to the planner first.
        if planner._SET_CONF.match(query) or planner._RESET_CONF.match(query):
            return planner.sql(query)
        try:
            df = raw(query)
        except Exception:  # noqa: BLE001 — fall to the reference dialect
            return planner.sql(query)
        routed = planner.rewrite_plan(df)
        if routed is not None:
            return routed
        planner.last_plan = "SEQ_SCAN"
        return df

    spark._vss_sql_original = raw
    spark.sql = vss_sql


def uninstall_sql_extension(spark: SparkSession) -> None:
    raw = getattr(spark, "_vss_sql_original", None)
    if raw is not None:
        spark.sql = raw
        spark._vss_sql_original = None
