"""Plan-rewrite layer: the reference's optimizer rules, Spark-first.

The reference registers four optimizer extensions that pattern-match
exact logical-plan shapes and swap in index operations
(src/include/hnsw/hnsw.hpp:15-19):

  - TopN(ORDER BY dist LIMIT k) -> hnsw_index_scan
    (src/hnsw/hnsw_optimize_scan.cpp:23-259)
  - 1.0 - array_cosine_similarity -> array_cosine_distance
    (src/hnsw/hnsw_optimize_expr.cpp:22-97)
  - min_by / lateral-join forms (hnsw_optimize_topk.cpp, _join.cpp)
    -> covered by the operators/ APIs in this package

Catalyst supplies the general optimizations the reference delegates to
DuckDB core (constant folding, pushdown, pruning), but it cannot know
about our external index artifacts — and Python cannot inject JVM
Catalyst rules. So the Spark-first equivalent is the same move the
reference makes, one level up: a *narrow, conservative* SQL front-end
that recognizes exactly the rewritable statement shapes and routes them
to the indexed operators, falling back to ``spark.sql`` untouched for
everything else. The reference's own matchers are equally literal (they
require a constant query vector, a plain seq_scan, a single ascending
order key — hnsw_optimize_scan.cpp:39-84); narrowness *is* the design.

Also translates the reference's operator aliases ``<->`` ``<=>`` ``<#>``
(hnsw_index.cpp:636-643) into function calls so reference SQL runs
unchanged on Spark, which has no such operators.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "rewrite_operators", "canonicalize_cosine", "match_topk",
    "pushable_where", "VssPlanner", "UnroutableIndexError",
]


class UnroutableIndexError(Exception):
    """A registered index cannot serve this statement (e.g. the routed
    table lacks the manifest's id column). Dedicated type so the
    planner's seq-scan fallback catches exactly this — a broad
    ``except LookupError`` would also swallow KeyError/IndexError from
    genuine bugs inside the routing path (ADVICE r12)."""


# -- operator aliases -> function names (hnsw_index.cpp:636-643) -----------

_OPERATOR_FNS = {"<->": "array_distance", "<=>": "array_cosine_distance", "<#>": "array_negative_inner_product"}

# one operand: a (possibly qualified) identifier, a bracket array literal
# with an optional ::cast, or a function call without nested parens.
_OPERAND = r"""
    (?:
        \[[^\]]*\](?:::[A-Za-z0-9_\[\]()]+)?      # [1,2,3]::FLOAT[3]
      | [A-Za-z_][A-Za-z0-9_.]*\([^()]*\)         # f(...)
      | [A-Za-z_][A-Za-z0-9_.]*                   # col / tbl.col
    )
"""


def rewrite_operators(sql: str) -> str:
    """``a <-> b`` -> ``array_distance(a, b)`` (and ``<=>``/``<#>``).

    DuckDB parses these as binary operators; Spark SQL has no operator
    extension point, so the front-end rewrites them textually before
    parsing. Bracket array literals become typed ``array(...)`` calls.
    """
    out = sql
    for op, fn in _OPERATOR_FNS.items():
        pat = re.compile(
            rf"({_OPERAND})\s*{re.escape(op)}\s*({_OPERAND})", re.VERBOSE
        )
        while True:
            new = pat.sub(rf"{fn}(\1, \2)", out)
            if new == out:
                break
            out = new
    # [1,2,3]::FLOAT[3] -> cast(array(1,2,3) as array<float>)
    out = re.sub(
        r"\[([^\]]*)\]::FLOAT\[\d+\]",
        r"cast(array(\1) as array<float>)",
        out,
        flags=re.IGNORECASE,
    )
    return out


# -- expression canonicalization (hnsw_optimize_expr.cpp) ------------------

_COS_SQL = re.compile(
    r"1(?:\.0+)?\s*-\s*array_cosine_similarity\s*\(", re.IGNORECASE
)

# SQL contexts in which a following ``1.0 - f(...)`` is a standalone
# expression (so the subtraction really binds to the literal 1.0):
# start-of-text, an opening paren/comma/bracket, a comparison operator,
# or an expression-introducing keyword. Anything else — an identifier,
# a digit (``21.0``), a closing paren, or an arithmetic operator
# (``val - 1.0 - f(...)`` parses as ``(val - 1.0) - f(...)``) — means
# the literal belongs to an enclosing expression and must not fuse.
_COS_KEYWORDS = frozenset(
    "select where when then else on and or not having by as in distinct return".split()
)


def canonicalize_cosine(sql: str) -> str:
    """``1.0 - array_cosine_similarity(...)`` -> ``array_cosine_distance(...)``.

    Mirrors the reference's ExpressionRewriter rule, which requires the
    literal ``1.0`` to be the left operand of the subtraction itself
    (hnsw_optimize_expr.cpp:53 — it matches on the *parsed* tree, so
    ``val - 1.0 - sim`` or ``21.0 - sim`` never fuse). Textual here, so
    the left context is checked explicitly before rewriting.
    """
    out = []
    pos = 0
    for m in _COS_SQL.finditer(sql):
        before = sql[pos : m.start()]
        prefix = ("".join(out) + before).rstrip()
        ok = not prefix or prefix[-1] in "(,=<>["
        if not ok:
            tail = re.search(r"([A-Za-z_][A-Za-z0-9_]*)$", prefix)
            ok = bool(tail) and tail.group(1).lower() in _COS_KEYWORDS
        out.append(before)
        out.append("array_cosine_distance(" if ok else m.group(0))
        pos = m.end()
    out.append(sql[pos:])
    return "".join(out)


def _replace_call(sql: str, name: str, render) -> str:
    """Replace every balanced ``name(...)`` call via ``render(inner)``."""
    pat = re.compile(rf"\b{name}\s*\(", re.IGNORECASE)
    out: list[str] = []
    pos = 0
    while True:
        m = pat.search(sql, pos)
        if not m:
            out.append(sql[pos:])
            return "".join(out)
        i = m.end()
        depth = 1
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        if depth:  # unbalanced — leave the tail untouched
            out.append(sql[pos:])
            return "".join(out)
        out.append(sql[pos : m.start()])
        out.append(render(sql[m.end() : i - 1]))
        pos = i


def _render_list_agg(inner: str) -> str:
    """DuckDB ``list(x [ORDER BY k, ...])`` -> an ordered Spark
    collect: sort the (keys, value) structs, project the value back.
    Without ORDER BY: plain collect_list (DuckDB's insertion order is
    not guaranteed reproducible here — the reference's own tests only
    pin the ordered form outside tie-coincidence deviations)."""
    m = re.search(r"\s+ORDER\s+BY\s+", inner, re.IGNORECASE)
    if not m:
        return f"collect_list({inner})"
    expr = inner[: m.start()].strip()
    keys = ", ".join(
        k.strip() for k in VssPlanner._split_top_level(inner[m.end() :])
    )
    return (
        f"transform(array_sort(collect_list(struct({keys}, {expr} AS __lv))), "
        "s -> s.__lv)"
    )


def translate_duckdb_functions(sql: str) -> str:
    """DuckDB function forms the reference's tests use -> Spark
    equivalents: ``len`` -> ``size`` (arrays), ``list_sum`` -> a
    higher-order aggregate, ``list(x ORDER BY k)`` -> an ordered
    collect, ``random()`` -> ``rand()``, ``setseed(x)`` -> a no-op
    (Spark's PRNG is per-expression-seeded; the replayed scripts'
    assertions are PRNG-independent — counts and cross-path label
    consistency). Textual like rewrite_operators — parse-level
    translations, zero UDFs."""
    out = re.sub(r"\blen\s*\(", "size(", sql, flags=re.IGNORECASE)
    out = re.sub(r"\brandom\s*\(\s*\)", "rand()", out, flags=re.IGNORECASE)
    out = _replace_call(out, "setseed", lambda inner: "1")
    # DuckDB allows an unordered window; Spark's ranking fns demand an
    # ORDER BY — a constant preserves the any-order semantics
    out = re.sub(
        r"\bover\s*\(\s*\)", "OVER (ORDER BY 1)", out, flags=re.IGNORECASE
    )
    out = _replace_call(out, "list", _render_list_agg)
    prev = None
    while prev != out:  # nested list_sum(list_sum(...)) resolves inward
        prev = out
        out = _replace_call(
            out,
            "list_sum",
            lambda inner: (
                f"aggregate({inner}, CAST(0.0 AS DOUBLE), "
                "(acc, x) -> acc + CAST(x AS DOUBLE))"
            ),
        )
    return out


# -- TopN -> index scan (hnsw_optimize_scan.cpp) ---------------------------

_METRIC_FOR_FN = {
    "array_distance": "l2sq",
    "array_distance_sq": "l2sq",
    "array_cosine_distance": "cosine",
    "array_negative_inner_product": "ip",
}

_TOPK_SQL = re.compile(
    r"""^\s*
    SELECT\s+(?P<cols>.+?)\s+
    FROM\s+(?P<table>[A-Za-z_][A-Za-z0-9_.]*)\s+
    (?:WHERE\s+(?P<where>.+?)\s+)?
    ORDER\s+BY\s+
        (?P<fn>array_distance|array_distance_sq|array_cosine_distance|array_negative_inner_product)
        \s*\(\s*(?P<vcol>(?:[A-Za-z_][A-Za-z0-9_]*\.)?[A-Za-z_][A-Za-z0-9_]*)\s*,\s*(?P<qvec>.+?)\s*\)
        (?:\s+ASC)?\s+
    LIMIT\s+(?P<k>\d+)\s*;?\s*$""",
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)

_ARRAY_LIT = re.compile(
    r"^(?:cast\s*\(\s*)?array\s*\(\s*(?P<vals>[-+0-9eE.,\s]+)\)\s*(?:as\s+array<\s*(?:float|double)\s*>\s*\))?$",
    re.IGNORECASE,
)

# -- pushable-predicate gate for the WHERE route ---------------------------
#
# The reference only pulls up filters DuckDB already pushed into the scan
# as table_filters — simple column-vs-constant shapes; any residual
# LogicalFilter BLOCKS the TopN→index rewrite entirely, preserving exact
# filter-first semantics (hnsw_optimize_scan.cpp:58-84). Mirror that: the
# index post-filter route accepts only conjunctions of the shapes below;
# anything else (OR, LIKE, expressions, subqueries) falls back to
# SEQ_SCAN instead of silently under-returning.

_IDENT = r"[A-Za-z_][A-Za-z0-9_.]*"
_CONST = r"(?:'[^']*'|-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?|TRUE|FALSE|(?:DATE|TIMESTAMP)\s+'[^']*')"
_CMP = r"(?:=|==|!=|<>|<=|>=|<|>)"
_SIMPLE_PRED = re.compile(
    rf"""^\s*(?:
        {_IDENT}\s*{_CMP}\s*{_CONST}
      | {_CONST}\s*{_CMP}\s*{_IDENT}
      | {_IDENT}\s+IS\s+(?:NOT\s+)?NULL
      | {_IDENT}\s+(?:NOT\s+)?IN\s*\(\s*{_CONST}(?:\s*,\s*{_CONST})*\s*\)
    )\s*$""",
    re.IGNORECASE | re.VERBOSE,
)
_BETWEEN_LHS = re.compile(rf"^\s*{_IDENT}\s+(?:NOT\s+)?BETWEEN\s+{_CONST}\s*$", re.IGNORECASE)
_CONST_ONLY = re.compile(rf"^\s*{_CONST}\s*$", re.IGNORECASE)


_ARRAY_CALL = re.compile(r"\barray\s*\(", re.IGNORECASE)
_FLOAT_CAST_TAIL = re.compile(r"\s*::\s*FLOAT\s*\[\s*\d*\s*\]", re.IGNORECASE)


def _rewrite_array_call_casts(text: str) -> str:
    """``array(...)::FLOAT[n]`` -> ``cast(array(...) as array<float>)``
    with BALANCED paren matching (ADVICE r14: the old ``[^()]*`` regex
    skipped nested calls like ``array(cast(i as float))::FLOAT[3]``).
    Parens inside string literals are not tracked — no reference DML
    form puts parens in strings; an unbalanced tail is left verbatim
    for Spark's parser to report."""
    out: list[str] = []
    i = 0
    while True:
        m = _ARRAY_CALL.search(text, i)
        if m is None:
            out.append(text[i:])
            return "".join(out)
        depth, j = 1, m.end()
        while j < len(text) and depth:
            if text[j] == "(":
                depth += 1
            elif text[j] == ")":
                depth -= 1
            j += 1
        if depth:  # unbalanced — leave the rest untouched
            out.append(text[i:])
            return "".join(out)
        tail = _FLOAT_CAST_TAIL.match(text, j)
        if tail:
            out.append(text[i : m.start()])
            out.append(f"cast({text[m.start():j]} as array<float>)")
            i = tail.end()
        else:
            # keep scanning INSIDE the call: an inner array()::FLOAT[n]
            # must still translate
            out.append(text[i : m.end()])
            i = m.end()


def pushable_where(where: str) -> bool:
    """True iff ``where`` is a conjunction of scan-pushable filters:
    column-vs-constant comparison, IS [NOT] NULL, [NOT] IN(consts),
    [NOT] BETWEEN consts. These are exactly the predicates a parquet
    scan would accept as pushed filters, so applying them ABOVE the
    index scan (filter pull-up, may under-return) matches the
    reference's documented behavior; everything else blocks the
    rewrite."""
    s = re.sub(r"'(?:[^']|'')*'", "'S'", where)  # neutralize string literals
    if re.search(r"\bOR\b|\bLIKE\b|\bCASE\b|\bSELECT\b|\bNOT\s*\(|\|\|", s, re.IGNORECASE):
        return False
    parts = re.split(r"\bAND\b", s, flags=re.IGNORECASE)
    i = 0
    while i < len(parts):
        p = parts[i]
        if _BETWEEN_LHS.match(p):
            # BETWEEN's own AND was split off — the next part must be
            # the upper-bound constant
            if i + 1 >= len(parts) or not _CONST_ONLY.match(parts[i + 1]):
                return False
            i += 2
            continue
        if not _SIMPLE_PRED.match(p):
            return False
        i += 1
    return True

# the alias-ordered projection form every reference plan test uses:
#   SELECT [...,] dist_fn(vec, CONST) AS x [, ...] FROM t ORDER BY x LIMIT k
# (hnsw_result.test:16-26, hnsw_metrics.test:22-38, hnsw_projection.test)
_QVEC_PAT = r"(?:cast\s*\(\s*array\s*\([^()]*\)\s+as\s+array<\s*(?:float|double)\s*>\s*\)|array\s*\([^()]*\))"
_TOPK_ALIAS_SQL = re.compile(
    rf"""^\s*
    SELECT\s+(?P<pre>.*?)
        (?P<fn>array_distance|array_distance_sq|array_cosine_distance|array_negative_inner_product)
        \s*\(\s*(?P<vcol>(?:[A-Za-z_][A-Za-z0-9_]*\.)?[A-Za-z_][A-Za-z0-9_]*)\s*,\s*(?P<qvec>{_QVEC_PAT})\s*\)
        \s+AS\s+(?P<alias>[A-Za-z_][A-Za-z0-9_]*)
        (?P<post>.*?)\s+
    FROM\s+(?P<table>[A-Za-z_][A-Za-z0-9_.]*)\s+
    (?:WHERE\s+(?P<where>.+?)\s+)?
    ORDER\s+BY\s+(?P=alias)(?:\s+ASC)?\s+
    LIMIT\s+(?P<k>\d+)\s*;?\s*$""",
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)


@dataclass
class TopKMatch:
    """A rewritable ``SELECT ... FROM t [WHERE pred] ORDER BY
    dist_fn(col, CONST) LIMIT k``. A WHERE clause routes to the index
    with the reference's filter pull-up semantics: search k first,
    filter after, may under-return (hnsw_optimize_scan.cpp:161-191)."""

    cols: str
    table: str
    fn: str
    metric: str
    vec_col: str
    query_vec: list[float]
    k: int
    where: str | None = None


def match_topk(sql: str) -> TopKMatch | None:
    """Recognize the reference's entry-point-B statement shape, after
    operator/cosine canonicalization. Conservative on purpose: a single
    table, a constant query vector, one ascending order key — the same
    requirements as hnsw_optimize_scan.cpp:39-84 (which relies on core
    constant folding having produced a VALUE_CONSTANT; here the literal
    is in the text). Matches both order forms: ORDER BY dist_fn(...)
    directly, and the aliased projection ``dist_fn(...) AS x ... ORDER
    BY x`` that the reference's own tests use. Returns None on any
    deviation."""
    canon = canonicalize_cosine(rewrite_operators(sql))
    m = _TOPK_SQL.match(canon)
    cols = None
    if m:
        cols = m["cols"].strip()
    else:
        m = _TOPK_ALIAS_SQL.match(canon)
        if not m:
            return None
        # the select list's fn call is served by the scan's dist column
        cols = f"{m['pre']}dist AS {m['alias']}{m['post']}".strip()
    lit = _ARRAY_LIT.match(m["qvec"].strip())
    if not lit:
        return None
    try:
        qv = [float(x) for x in lit["vals"].split(",")]
    except ValueError:
        return None
    fn = m["fn"].lower()
    # qualified ref (t.vec): must name the scanned table, then binds to
    # the bare column — any other qualifier is not this table's scan
    vcol = m["vcol"]
    if "." in vcol:
        qual, vcol = vcol.rsplit(".", 1)
        if qual.lower() != m["table"].rsplit(".", 1)[-1].lower():
            return None
    where = m["where"].strip() if m["where"] else None
    if where is not None and not pushable_where(where):
        # residual (non-pushable) filter blocks the rewrite entirely —
        # exact filter-first semantics via SEQ_SCAN, like the reference
        return None
    return TopKMatch(
        cols=cols,
        table=m["table"],
        fn=fn,
        metric=_METRIC_FOR_FN[fn],
        vec_col=vcol,
        query_vec=qv,
        k=int(m["k"]),
        where=where,
    )


# -- k-ary min_by -> ordered list over index scan (hnsw_optimize_topk.cpp) -

_MINBY_SQL = re.compile(
    r"""^\s*
    SELECT\s+(?P<agg>min_by|max_by)\s*\(\s*
        (?P<val>[A-Za-z_][A-Za-z0-9_]*)\s*,\s*
        (?P<fn>array_distance|array_distance_sq|array_cosine_distance|array_negative_inner_product
         |array_cosine_similarity|array_inner_product)
        \s*\(\s*(?P<vcol>[A-Za-z_][A-Za-z0-9_]*)\s*,\s*(?P<qvec>.+?)\s*\)\s*,\s*
        (?P<k>\d+)\s*\)
        (?:\s+AS\s+(?P<alias>[A-Za-z_][A-Za-z0-9_]*))?\s+
    FROM\s+(?P<table>[A-Za-z_][A-Za-z0-9_.]*)\s*;?\s*$""",
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)

# max_by pairs with *similarity* scores (keep the k largest), exactly
# like the reference's macros choose max_by for cosine/ip scoring
# (hnsw_index_macros.cpp:24-29); min_by pairs with distances.
_SIM_METRIC_FOR_FN = {
    "array_cosine_similarity": "cosine",
    "array_inner_product": "ip",
}


@dataclass
class MinByMatch:
    """``SELECT min_by(col, dist_fn(vec, CONST), k) FROM t`` (or
    ``max_by(col, sim_fn(vec, CONST), k)``) — the k-ary aggregate form
    (hnsw_optimize_topk.cpp:64-219). k must satisfy 0 < k < 2048 like
    the reference (:162-165)."""

    value_col: str
    table: str
    fn: str
    metric: str
    vec_col: str
    query_vec: list[float]
    k: int
    alias: str
    descending: bool = False  # True for max_by (rank by score DESC)


def match_minby(sql: str) -> MinByMatch | None:
    m = _MINBY_SQL.match(canonicalize_cosine(rewrite_operators(sql)))
    if not m:
        return None
    k = int(m["k"])
    if not 0 < k < 2048:  # hnsw_optimize_topk.cpp:162-165
        return None
    lit = _ARRAY_LIT.match(m["qvec"].strip())
    if not lit:
        return None
    fn = m["fn"].lower()
    descending = m["agg"].lower() == "max_by"
    metric = (_SIM_METRIC_FOR_FN if descending else _METRIC_FOR_FN).get(fn)
    if metric is None:  # min_by over a similarity (or max_by over a
        return None     # distance) is not a top-k-nearest shape
    return MinByMatch(
        value_col=m["val"],
        table=m["table"],
        fn=fn,
        metric=metric,
        vec_col=m["vcol"],
        query_vec=[float(x) for x in lit["vals"].split(",")],
        k=k,
        alias=m["alias"] or m["agg"].lower(),
        descending=descending,
    )


_MINBY_FNS = (
    "array_distance|array_distance_sq|array_cosine_distance"
    "|array_negative_inner_product|array_cosine_similarity|array_inner_product"
)


def match_minby_nested(sql: str):
    """A k-ary min_by/max_by call NESTED inside a larger single-table
    aggregate select (``SELECT list_sum(flatten(min_by(vec, dist, 3)))
    BETWEEN 44 AND 50 FROM t1`` — hnsw_topk.test:21): the reference's
    rule matches the AGGREGATE FUNCTION node wherever it sits
    (hnsw_optimize_topk.cpp:64-219), while the regex fast path above
    only catches the bare statement form. Returns
    ``(MinByMatch, select_list, call_start, call_end)`` — the caller
    computes the ordered list and re-evaluates the select list with
    the call replaced by it — or None."""
    s = canonicalize_cosine(rewrite_operators(sql))
    m = re.match(
        r"^\s*SELECT\s+(.+?)\s+FROM\s+([A-Za-z_][\w.]*)\s*;?\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        return None
    select_list, table = m.group(1), m.group(2)
    call = re.search(r"\b(min_by|max_by)\s*\(", select_list, re.IGNORECASE)
    if not call:
        return None
    i = call.end()
    depth = 1
    while i < len(select_list) and depth:
        if select_list[i] == "(":
            depth += 1
        elif select_list[i] == ")":
            depth -= 1
        i += 1
    if depth:
        return None
    args = VssPlanner._split_top_level(select_list[call.end() : i - 1])
    if len(args) != 3:
        return None  # 2-ary min_by is native Spark — leave it alone
    val, fncall, kst = (a.strip() for a in args)
    if not re.fullmatch(r"[A-Za-z_]\w*", val) or not kst.isdigit():
        return None
    k = int(kst)
    if not 0 < k < 2048:
        return None
    fm = re.fullmatch(
        rf"({_MINBY_FNS})\s*\((.*)\)", fncall, re.IGNORECASE | re.DOTALL
    )
    if not fm:
        return None
    two = VssPlanner._split_top_level(fm.group(2))
    if len(two) != 2:
        return None
    vcol, qvec = two[0].strip(), two[1].strip()
    if not re.fullmatch(r"[A-Za-z_]\w*", vcol):
        return None
    lit = _ARRAY_LIT.match(qvec)
    if not lit:
        return None
    fn = fm.group(1).lower()
    descending = call.group(1).lower() == "max_by"
    metric = (_SIM_METRIC_FOR_FN if descending else _METRIC_FOR_FN).get(fn)
    if metric is None:
        return None
    mb = MinByMatch(
        value_col=val,
        table=table,
        fn=fn,
        metric=metric,
        vec_col=vcol,
        query_vec=[float(x) for x in lit["vals"].split(",")],
        k=k,
        alias="__vss_x",
        descending=descending,
    )
    return mb, select_list, call.start(), i


# -- lateral top-k join -> index join (hnsw_optimize_join.cpp) -------------

_LATERAL_SQL = re.compile(
    r"""^\s*
    SELECT\s+(?P<cols>.+?)\s+
    FROM\s+(?P<outer>[A-Za-z_][A-Za-z0-9_.]*)
        (?:\s+(?:AS\s+)?(?P<oalias>[A-Za-z_][A-Za-z0-9_]*))?\s*,\s*
    LATERAL\s*\(\s*
        SELECT\s+(?P<icols>.+?)\s+
        FROM\s+(?P<inner>[A-Za-z_][A-Za-z0-9_.]*)
        (?:\s+(?:AS\s+)?(?!ORDER\b|LIMIT\b|WHERE\b|GROUP\b)(?P<ialias>[A-Za-z_][A-Za-z0-9_]*))?\s+
        ORDER\s+BY\s+(?P<okey>.+?)(?:\s+ASC)?\s+
        LIMIT\s+(?P<k>\d+)\s*
    \)\s*(?:AS\s+)?(?P<lalias>[A-Za-z_][A-Za-z0-9_]*)?\s*;?\s*$""",
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)

# a qualified-argument distance call: fn(a.qcol, b.icol) either order
_LATERAL_CALL = re.compile(
    r"""^(?P<fn>array_distance|array_distance_sq|array_cosine_distance
         |array_negative_inner_product)
    \s*\(\s*
    (?P<q1>[A-Za-z_][A-Za-z0-9_]*)\.(?P<qcol>[A-Za-z_][A-Za-z0-9_]*)\s*,\s*
    (?P<q2>[A-Za-z_][A-Za-z0-9_]*)\.(?P<icol>[A-Za-z_][A-Za-z0-9_]*)\s*\)$""",
    re.IGNORECASE | re.VERBOSE,
)


@dataclass
class LateralMatch:
    """``SELECT ... FROM q AS a, LATERAL (SELECT ... FROM t AS b ORDER BY
    dist_fn(a.v, b.v) LIMIT k)`` — entry point C (hnsw_optimize_join.cpp:
    351-432). k bound 0 < k < 2048 like the reference (:459-463)."""

    cols: str
    outer: str
    outer_alias: str
    inner: str
    inner_alias: str
    fn: str
    metric: str
    query_col: str
    item_col: str
    k: int
    inner_cols: str = "*"  # the lateral subquery's select list (r14)


def _resolve_lateral_parts(
    cols: str,
    outer: str,
    oalias: str | None,
    inner: str,
    ialias: str | None,
    icols: str,
    okey: str,
    k: int,
) -> LateralMatch | None:
    """Shared resolution behind the anchored matcher and the r14
    extraction rewrite: aliases default to the table names, and the
    ORDER BY key is either the qualified distance call itself or an
    alias naming a distance-call item in the subquery's select list."""
    if not 0 < k < 2048:
        return None
    oa = (oalias or outer).lower()
    ia = (ialias or inner).lower()
    icols = icols.strip()
    okey = okey.strip()
    call = _LATERAL_CALL.match(okey)
    if call is None and re.fullmatch(r"[A-Za-z_]\w*", okey):
        # ORDER BY <alias> where the alias names a distance-call item
        # in the subquery's own select list (hnsw_lateral_join.test:29)
        for item in VssPlanner._split_top_level(icols):
            am = re.fullmatch(
                r"(.+?)\s+AS\s+" + re.escape(okey),
                item.strip(),
                re.IGNORECASE | re.DOTALL,
            )
            if am:
                call = _LATERAL_CALL.match(am.group(1).strip())
                if call:
                    break
    if call is None:
        return None
    # the correlated arg must come from the outer alias, the other from
    # the inner alias (either argument order, hnsw_index.cpp:632-662)
    q1, q2 = call["q1"].lower(), call["q2"].lower()
    if (q1, q2) == (oa, ia):
        qcol, icol = call["qcol"], call["icol"]
    elif (q1, q2) == (ia, oa):
        qcol, icol = call["icol"], call["qcol"]
    else:
        return None
    fn = call["fn"].lower()
    return LateralMatch(
        cols=cols.strip(),
        outer=outer,
        outer_alias=oalias or outer,
        inner=inner,
        inner_alias=ialias or inner,
        fn=fn,
        metric=_METRIC_FOR_FN[fn],
        query_col=qcol,
        item_col=icol,
        k=k,
        inner_cols=icols,
    )


def match_lateral(sql: str) -> LateralMatch | None:
    m = _LATERAL_SQL.match(canonicalize_cosine(rewrite_operators(sql)))
    if not m:
        return None
    return _resolve_lateral_parts(
        m["cols"], m["outer"], m["oalias"], m["inner"], m["ialias"],
        m["icols"], m["okey"], int(m["k"]),
    )


_LATERAL_REGION = re.compile(
    r"FROM\s+(?P<outer>[A-Za-z_]\w*)"
    r"(?:\s+(?:AS\s+)?(?!LATERAL\b)(?P<oalias>[A-Za-z_]\w*))?"
    r"\s*,\s*LATERAL\s*\(",
    re.IGNORECASE,
)

_LATERAL_SUB = re.compile(
    r"^\s*SELECT\s+(?P<icols>.+?)\s+"
    r"FROM\s+(?P<inner>[A-Za-z_]\w*)"
    r"(?:\s+(?:AS\s+)?(?!ORDER\b)(?P<ialias>[A-Za-z_]\w*))?\s+"
    r"ORDER\s+BY\s+(?P<okey>.+?)(?:\s+ASC)?\s+LIMIT\s+(?P<k>\d+)\s*$",
    re.IGNORECASE | re.DOTALL,
)

_LATERAL_TAIL_KEYWORDS = re.compile(
    r"\s*(?:AS\s+)?(?!GROUP\b|ORDER\b|WHERE\b|HAVING\b|LIMIT\b|UNION\b)"
    r"([A-Za-z_]\w*)",
    re.IGNORECASE,
)


def match_lateral_region(sql: str):
    """A ``FROM t[, alias], LATERAL (...)`` region ANYWHERE in the
    statement (r14 — the reference's slow suite wraps laterals in
    enclosing aggregates and GROUP BYs). Returns
    ``(LateralMatch, region_start, region_end)`` over the
    operator-rewritten text, or None. The caller materializes the
    lateral to a view and splices the view name into the region."""
    s = canonicalize_cosine(rewrite_operators(sql))
    if _LATERAL_SQL.match(s):
        return None  # the anchored matcher owns the simple form
    m = _LATERAL_REGION.search(s)
    if not m:
        return None
    i = m.end()
    depth = 1
    while i < len(s) and depth:
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
        i += 1
    if depth:
        return None
    sub = s[m.end() : i - 1]
    msub = _LATERAL_SUB.match(sub)
    if not msub:
        return None
    end = i
    tail = _LATERAL_TAIL_KEYWORDS.match(s, i)
    if tail:
        end = tail.end()  # consume the lateral's result alias
    ml = _resolve_lateral_parts(
        "*", m["outer"], m["oalias"], msub["inner"], msub["ialias"],
        msub["icols"], msub["okey"], int(msub["k"]),
    )
    if ml is None:
        return None
    return ml, m.start(), end, s


class VssPlanner:
    """SQL front-end with the index-aware rewrites installed.

    >>> planner = VssPlanner(spark)
    >>> planner.register_index("items", "vec", hnsw_index)
    >>> df = planner.sql("SELECT id FROM items ORDER BY vec <-> [1,2,3]::FLOAT[3] LIMIT 5")
    >>> planner.last_plan
    'HNSW_INDEX_SCAN'

    ``last_plan`` is the EXPLAIN-parity hook: the reference's tests
    assert ``HNSW_INDEX_SCAN`` appears in EXPLAIN output
    (hnsw_basic.test:19-22); ours assert the same marker here.
    """

    def __init__(self, spark: SparkSession, catalog: str | None = None):
        self.spark = spark
        self._indexes: dict[tuple[str, str], object] = {}
        self._named: dict[str, dict] = {}  # SQL-DDL-created indexes by name
        self._tables: dict[str, dict] = {}  # DML-able path tables by name
        self._ddl_dir: str | None = None
        # pragma_database_size(): external-root walk cache,
        # root path -> (root st_mtime_ns, total bytes)
        self._ext_size_cache: dict[str, tuple[int, int]] = {}
        # SELECT setseed(x): the DuckDB-compatible connection PRNG the
        # seeded random() stream draws from (None = unseeded; random()
        # keeps Spark's nondeterministic rand() translation)
        self._rand_conn = None
        self.last_plan: str = ""
        # ``catalog``: a DIRECTORY that makes the SQL-DDL surface
        # durable, the reference's index-persistence behavior
        # (hnsw_experimental_persistence.test: indexes survive a
        # database restart). CREATE INDEX artifacts build under it and
        # the name registry rides <catalog>/catalog.json (atomic
        # write); a new VssPlanner over the same catalog reloads every
        # artifact (load_any_index) and re-registers the routes. No
        # catalog (default) = session-scoped registry in a temp dir,
        # the in-memory-database behavior.
        self.last_plan_detail: str | None = None
        # PRAGMA disable_optimizer / enable_optimizer (the reference's
        # hnsw_rewrite.test toggles its rules off to pin both forms):
        # off = no cosine canonicalization, no TopN/min_by/index
        # routing; operator-alias translation stays (it is PARSING, not
        # optimization — Spark cannot parse <-> at all)
        self._optimizer_enabled = True
        self._catalog = catalog
        if catalog is not None:
            import os as _os

            _os.makedirs(catalog, exist_ok=True)
            self._ddl_dir = catalog
            self._load_catalog()
        # the unpatched parse/execute path: install_sql_extension
        # (plans/catalyst.py) rebinds spark.sql to THIS planner, so all
        # internal parsing must bypass the hook or recurse forever
        self._raw_sql = getattr(spark, "_vss_sql_original", None) or spark.sql
        # the plan-level matcher re-renders expressions via .sql()
        # (plans/catalyst.py): Spark truncates >25-field expression
        # trees ("... N more fields"), which silently corrupts a
        # 64-dim array literal into unparseable text — raise the cap
        # so rendering is lossless at any embedding width.
        # Documented session-wide side effect (ADVICE r10): the cap is
        # only ever RAISED — a user-set larger value is left alone —
        # and its sole observable consequence is longer plan/debug
        # strings (it changes no query result).
        try:
            cur = int(spark.conf.get("spark.sql.debug.maxToStringFields", "25"))
        except (TypeError, ValueError):
            cur = 25
        if cur < 100000:
            spark.conf.set("spark.sql.debug.maxToStringFields", "100000")
        from duckdb_vss_spark.functions.distance import register_sql_functions

        register_sql_functions(spark)

    def register_index(self, table: str, vec_col: str, index) -> None:
        """A column may carry several indexes with different metrics
        (hnsw_metrics.test: ip + cosine + l2sq side by side); the
        matcher picks the one whose metric fits the query's distance
        function."""
        self._indexes.setdefault((table.lower(), vec_col.lower()), []).append(index)

    def register_table(self, name: str, path: str) -> None:
        """Register a parquet directory as a DML-able SQL table (r14):
        SELECTs resolve it as a temp view over the path, and
        ``INSERT INTO`` / ``DELETE FROM`` statements route through the
        sink surface (sources/sinks.py) with bound-index propagation —
        the table side of the reference's CRUD tests
        (hnsw_crud.test:10-30, hnsw_insert.test:18-67). ``CREATE
        TABLE`` statements through :meth:`sql` self-register under the
        planner's managed directory."""
        import os as _os

        self._tables[name.lower()] = {"name": name, "path": _os.path.abspath(path)}
        self._refresh_table(name)
        self._save_catalog()

    def _refresh_table(self, name: str) -> None:
        """Re-resolve the view after DML: a temp view holds the
        analyzed plan's file listing, which a sink's atomic dir swap
        (delete_where) or append (insert_into) invalidates. The hidden
        __rowid column stays out of the SQL-visible view (SELECT *
        shows exactly the declared columns, like the reference's
        rowid)."""
        rec = self._tables[name.lower()]
        try:
            self.spark.catalog.refreshByPath(rec["path"])
        except Exception:  # noqa: BLE001 — cache refresh is best-effort
            pass
        df = self.spark.read.parquet(rec["path"])
        if rec.get("auto_rowid"):
            df = df.drop("__rowid")
        df.createOrReplaceTempView(rec["name"])

    def _seeded_random_rewrite(self, text: str) -> str:
        """After ``SELECT setseed(x)``, each textual ``random()`` in a
        generator statement is one DuckDB expression instance: it
        draws its local seed from the connection engine left-to-right
        (DuckDB's function-local-state init order, pinned empirically
        against the duckdb oracle) and becomes a deterministic
        ``vss_duck_random(seed, ordinal)`` call — Arrow-batched
        jump-ahead, partition-independent, no driver loop
        (functions/duckrandom.py). Only the reference scripts'
        generator shape is supported — a single ``range(a, b) AS
        t(col)`` source whose column supplies the row ordinal
        (hnsw_lateral_join_group.test:16); anything else raises loud
        rather than silently emitting a diverging nondeterministic
        stream."""
        if self._rand_conn is None or not self._RANDOM_CALL.search(text):
            return text
        srcs = self._RANGE_SRC.findall(text)
        if len(srcs) != 1:
            raise ValueError(
                "seeded random() is supported only over a single "
                "'FROM range(a, b) AS t(col)' source (the reference "
                f"scripts' generator shape); statement has {len(srcs)} "
                f"such sources: {text[:80]!r}"
            )
        start, _end, col = srcs[0]
        clause = re.search(
            r"\b(WHERE|JOIN|GROUP\s+BY|HAVING|QUALIFY|LIMIT|ORDER\s+BY)\b",
            text,
            re.IGNORECASE,
        )
        if clause:
            # a filter/join/limit/sort between the generator and the
            # projection changes WHICH rows draw from the stream (or
            # the draw order) — the ordinal mapping below would
            # silently diverge from DuckDB's scan-order draws
            # (review r15)
            raise ValueError(
                "seeded random() supports only an unfiltered projection "
                f"over the range source; found {clause.group(1)!r}: "
                f"{text[:80]!r}"
            )
        from duckdb_vss_spark.functions.duckrandom import (
            ensure_duck_random_udf,
        )

        fname = ensure_duck_random_udf(self.spark)

        def repl(_m) -> str:
            seed = self._rand_conn.next_u32()
            return f"{fname}({seed}, {col} - ({start}))"

        return self._RANDOM_CALL.sub(repl, text)

    def _drop_table_entry(self, rec: dict) -> None:
        """Unregister a path table and delete its managed data (shared
        by DROP TABLE and CREATE OR REPLACE TABLE). Caller persists
        the catalog afterwards.

        Dependent indexes go WITH the table, like DuckDB's implicit
        cascade (review r15: leaving them in ``_named``/``_indexes``
        would silently route KNN queries on a recreated table through
        an index built over the OLD data): SQL-DDL-created artifacts
        are deleted; programmatically-registered indexes are only
        unregistered — the user owns those artifacts."""
        import os as _os
        import shutil as _shutil

        from duckdb_vss_spark.sources import sinks

        tname = rec["name"].lower()
        self._tables.pop(tname, None)
        sinks.unbind_indexes(rec["path"])
        doomed = [
            n for n, r in self._named.items()
            if r["table"].lower() == tname
        ]
        if doomed:
            from duckdb_vss_spark.index import drop_index

            for n in doomed:
                irec = self._named.pop(n)
                try:
                    drop_index(irec["index"].path)
                except Exception:  # noqa: BLE001 — artifact already gone
                    pass
        for key in [k for k in self._indexes if k[0] == tname]:
            self._indexes.pop(key, None)
        try:
            self.spark.catalog.dropTempView(rec["name"])
        except Exception:  # noqa: BLE001 — view already gone
            pass
        # only delete data the planner created; a user-registered
        # path is unregistered, never removed
        if self._ddl_dir and rec["path"].startswith(
            _os.path.abspath(self._ddl_dir)
        ):
            _shutil.rmtree(rec["path"], ignore_errors=True)

    def _table_frame(self, table: str) -> DataFrame:
        """The FULL frame behind a table name — for a path-registered
        table the parquet scan (including the hidden __rowid an index
        may be keyed on), else the session view."""
        rec = self._tables.get(table.lower())
        if rec is not None:
            return self.spark.read.parquet(rec["path"])
        return self.spark.table(table)

    def _index_for(self, match: TopKMatch):
        # metric must agree and dims must match the literal, like the
        # matcher's index checks (hnsw_optimize_scan.cpp:103-141)
        for idx in self._indexes.get((match.table.lower(), match.vec_col.lower()), []):
            if idx.metric == match.metric and idx.dims == len(match.query_vec):
                return idx
        return None

    def _marker(self, idx) -> str:
        return (
            type(idx).__name__.replace("Hnsw", "HNSW_")
            .replace("Ivf", "IVF_")
            .replace("Pq", "PQ_")
            .replace("Bq", "BQ_")
            .replace("Sq", "SQ_")
            .replace("Index", "INDEX_SCAN")
        )

    def _set_marker(self, idx) -> str:
        """Record the plan marker plus the serving index's DDL name
        (``last_plan_detail``) — the reference's EXPLAIN output carries
        the index name (hnsw_metrics.test asserts
        ``HNSW_INDEX_SCAN.*my_ip_idx``)."""
        m = self._marker(idx)
        self.last_plan = m
        nm = next(
            (n for n, r in self._named.items() if r["index"] is idx), None
        )
        self.last_plan_detail = f"{m}({nm})" if nm else m
        return m

    def _index_hits(
        self, idx, table: str, query_vec, k: int,
        where: str | None = None, vec_col: str | None = None,
    ) -> DataFrame:
        """Run the index scan; k ordered rows with a ``dist`` column.
        ``where`` applies ABOVE the scan (filter pull-up — may return
        fewer than k rows, matching hnsw_optimize_scan.cpp:161-191).

        Any registered index family routes here (r12): HNSW
        late-materializes payload columns itself; IVF holds full rows
        in its lists. The quantized artifacts (PQ/IVFADC/IVFSQ/BQ)
        over-fetch their DEFAULT shortlist as approximate-order ids
        only, and the EXACT metric is recomputed on the broadcast
        id-join against the routed base table (r13, VERDICT r12 #2):
        the routed table IS the source the query's distance call reads,
        so the rescore needs no manifest source resolution — ADC-only
        ~0.74-recall results are unreachable via SQL regardless of
        whether the build-time fingerprint still validates. The
        shortlist sizes are the direct API's default signatures
        (10·k for PQ/IVFADC/IVFSQ, the calibrated fraction for BQ), so
        routed results ≡ ``knn_search`` with default rerank."""
        base = self._table_frame(table)
        hidden_rowid = (
            "__rowid" in base.columns
            and (self._tables.get(table.lower()) or {}).get("auto_rowid")
        )
        kind = type(idx).__name__
        if kind == "IvfIndex":
            return idx.knn_search(query_vec, k, post_filter=where)
        if kind == "HnswIndex":
            out = idx.knn_search(
                base, query_vec, k, post_filter=where,
                ef_search=getattr(idx, "_sql_ef_search", None),
            )
            return out.drop("__rowid") if hidden_rowid else out
        # quantized families: approximate shortlist ids -> exact rescore
        id_col = idx.manifest["id_col"]
        vcol = vec_col or idx.manifest["vec_col"]
        if id_col not in base.columns or vcol not in base.columns:
            raise UnroutableIndexError(
                f"table {table!r} lacks the index's id/vector columns "
                f"({id_col!r}, {vcol!r}) — not routable"
            )
        if kind == "BqIndex":
            take = idx.default_rescore(int(k))
            short = idx.knn_search(query_vec, take, rescore=0)
        elif kind == "IvfSqIndex":
            short = idx.knn_search(query_vec, max(10 * int(k), int(k)))
        else:  # PqIndex / IvfPqIndex
            short = idx.knn_search(query_vec, max(10 * int(k), int(k)), rerank=0)
        from duckdb_vss_spark.functions.distance import distance_for_metric

        dist_fn = distance_for_metric(idx.metric)
        q = [float(x) for x in query_vec]
        out = (
            base.join(F.broadcast(short.select(id_col)), id_col)
            .withColumn("dist", dist_fn(F.col(vcol), q))
            .orderBy(F.col("dist").asc_nulls_last(), F.col(id_col))
            .limit(int(k))
        )
        if where is not None:
            out = out.where(F.expr(where))
        return out.drop("__rowid") if hidden_rowid else out

    # -- SQL DDL surface (r13): the reference's index statements --------
    # CREATE INDEX n ON t USING HNSW (col) [WITH (...)], DROP INDEX n,
    # PRAGMA hnsw_compact_index('n'), pragma_hnsw_index_info() — the
    # statements every reference test file opens with (hnsw_basic.test:16,
    # hnsw_options.test, hnsw_index_pragmas.cpp). Spark has no rowids, so
    # the indexed table must carry an integral id column (WITH (id='col')
    # overrides the inference) — the one documented deviation.

    _CREATE_IDX = re.compile(
        r"^\s*CREATE\s+INDEX\s+(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_]\w*)\s+ON\s+"
        r"([A-Za-z_][\w.]*)\s+USING\s+(HNSW|IVF|PQ|IVFPQ|IVFADC|IVFSQ|BQ)"
        r"\s*\(\s*([A-Za-z_]\w*)\s*\)\s*"
        r"(?:WITH\s*\((.*)\))?\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )
    _DROP_IDX = re.compile(
        r"^\s*DROP\s+INDEX\s+(IF\s+EXISTS\s+)?([A-Za-z_]\w*)\s*;?\s*$",
        re.IGNORECASE,
    )
    _PRAGMA_COMPACT = re.compile(
        r"^\s*PRAGMA\s+hnsw_compact_index\s*\(\s*'([^']+)'\s*\)\s*;?\s*$",
        re.IGNORECASE,
    )
    _INFO_FN = re.compile(r"\bpragma_hnsw_index_info\s*\(\s*\)", re.IGNORECASE)
    _DBSIZE_FN = re.compile(r"\bpragma_database_size\s*\(\s*\)", re.IGNORECASE)
    _INT_OPTS = {"m": 2, "m0": 2, "ef_construction": 1, "ef_search": 1}

    def _empty_result(self) -> DataFrame:
        return self.spark.createDataFrame([], "result string")

    def _storage_roots(self) -> list[str]:
        """The directories whose on-disk bytes ARE this planner's
        database: the managed dir (declared/CTAS tables, DDL-created
        index artifacts, catalog.json) plus any user-registered table
        paths and API-registered index artifacts living outside it.
        Nested roots dedupe so nothing double-counts."""
        import os as _os

        roots: list[str] = []
        if self._ddl_dir:
            roots.append(_os.path.abspath(self._ddl_dir))
        for rec in self._tables.values():
            roots.append(_os.path.abspath(rec["path"]))
        for rec in self._named.values():
            roots.append(_os.path.abspath(rec["index"].path))
        roots = sorted(set(roots))
        out: list[str] = []
        for r in roots:
            if not any(r == p or r.startswith(p + _os.sep) for p in out):
                out.append(r)
        return out

    def _database_size_row(self) -> tuple:
        """One ``pragma_database_size()`` row (DuckDB's 9-column
        schema: storage/pragma_database_size). The storage unit is a
        DuckDB-sized 256 KiB block over the planner's real parquet
        footprint — total==used and free==0 because parquet dirs hold
        no preallocated free list, and wal_size is 0 because every
        commit here is an atomic rename, not a WAL. What the
        reclaim-storage test actually pins — DROP INDEX releases the
        artifact's blocks, repeated create/drop does not leak — holds
        against these semantics exactly
        (hnsw_reclaim_storage.test_slow:20-96).

        User-registered EXTERNAL table roots (outside the managed DDL
        dir and not an index artifact) can be multi-GB read-only
        datasets; their walked size is cached keyed on the root dir's
        mtime_ns (ADVICE r14 — no per-query re-walk of static data).
        Every mutation this engine performs goes through managed paths
        (appends/swaps bump the root's mtime), so the cache only goes
        stale on out-of-band edits deeper than the root — acceptable
        for a size pragma. Managed + artifact roots are always walked
        fresh: the reclaim test pins their live DROP-INDEX behavior."""
        import os as _os

        fresh_roots = set()
        if self._ddl_dir:
            fresh_roots.add(_os.path.abspath(self._ddl_dir))
        for rec in self._named.values():
            fresh_roots.add(_os.path.abspath(rec["index"].path))

        def walk_bytes(root: str) -> int:
            b = 0
            for dirpath, _dirs, files in _os.walk(root):
                for fn in files:
                    try:
                        b += _os.path.getsize(_os.path.join(dirpath, fn))
                    except OSError:  # racing a concurrent swap
                        pass
            return b

        total = 0
        for root in self._storage_roots():
            managed = any(
                root == p or root.startswith(p + _os.sep) for p in fresh_roots
            )
            if managed:
                total += walk_bytes(root)
                continue
            try:
                key = _os.stat(root).st_mtime_ns
            except OSError:
                continue
            hit = self._ext_size_cache.get(root)
            if hit is None or hit[0] != key:
                hit = (key, walk_bytes(root))
                self._ext_size_cache[root] = hit
            total += hit[1]
        block = 262144  # DuckDB's default block size
        blocks = -(-total // block)
        name = (
            _os.path.basename(_os.path.abspath(self._catalog))
            if self._catalog
            else "memory"
        )
        for unit in ("bytes", "KiB", "MiB", "GiB", "TiB"):
            if total < 1024 or unit == "TiB":
                human = (
                    f"{total} bytes"
                    if unit == "bytes"
                    else f"{total:.1f} {unit}"
                )
                break
            total /= 1024.0
        return (name, human, block, blocks, blocks, 0, "0 bytes", "0 bytes", "-1")

    def _catalog_file(self):
        import os as _os

        return None if self._catalog is None else _os.path.join(
            self._catalog, "catalog.json"
        )

    def _load_catalog(self) -> None:
        import json as _json
        import os as _os

        f = self._catalog_file()
        if not f or not _os.path.exists(f):
            return
        from duckdb_vss_spark.index import load_any_index

        with open(f) as fh:
            data = _json.load(fh)
        # r14 layout: {"tables": {...}, "indexes": {...}}; a pre-r14
        # catalog is a flat index map
        if "tables" in data or "indexes" in data:
            tables, entries = data.get("tables", {}), data.get("indexes", {})
        else:
            tables, entries = {}, data
        for name, trec in tables.items():
            # r14 layout: {"path": ..., "dims": {...}}; earliest-r14
            # snapshots stored a bare path string
            path = trec["path"] if isinstance(trec, dict) else trec
            dims = trec.get("dims", {}) if isinstance(trec, dict) else {}
            rowid = bool(trec.get("auto_rowid")) if isinstance(trec, dict) else False
            if not _os.path.isdir(path):
                continue  # table dir gone — drop the dangling entry
            self._tables[name.lower()] = {
                "name": name, "path": path, "dims": dims,
                "auto_rowid": rowid,
            }
            self._refresh_table(name)
        from duckdb_vss_spark.index.manifest import PendingDmlError

        for name, rec in entries.items():
            try:
                idx = load_any_index(self.spark, rec["path"])
            except PendingDmlError:
                # the process died between a table DML and this index's
                # update (r14 intent journal) — replay the journaled
                # intent and load clean: the engine's analogue of the
                # reference's WAL playback on restart
                # (hnsw_insert_wal.test)
                from duckdb_vss_spark.sources.sinks import resolve_pending_dml

                resolve_pending_dml(self.spark, rec["path"])
                idx = load_any_index(self.spark, rec["path"])
            except (OSError, ValueError):
                continue  # artifact dir gone — drop the dangling entry
            if rec.get("ef_search"):
                idx._sql_ef_search = int(rec["ef_search"])
            self.register_index(rec["table"], rec["vec_col"], idx)
            self._named[name] = {
                "index": idx,
                "table": rec["table"],
                "vec_col": rec["vec_col"],
                "ef_search": rec.get("ef_search"),
            }
            # restore the DML hook: indexes on path-registered tables
            # keep receiving insert/delete propagation after a restart
            t = rec["table"].lower()
            if t in self._tables:
                from duckdb_vss_spark.sources import sinks

                sinks.bind_index(self._tables[t]["path"], idx)

    def _save_catalog(self) -> None:
        f = self._catalog_file()
        if not f:
            return
        import json as _json
        import os as _os

        entries = {
            "tables": {
                rec["name"]: {
                    "path": rec["path"],
                    "dims": rec.get("dims") or {},
                    "auto_rowid": bool(rec.get("auto_rowid")),
                }
                for rec in self._tables.values()
            },
            "indexes": {
                name: {
                    "path": rec["index"].path,
                    "table": rec["table"],
                    "vec_col": rec["vec_col"],
                    "ef_search": rec.get("ef_search"),
                }
                for name, rec in self._named.items()
            },
        }
        tmp = f + ".tmp"
        with open(tmp, "w") as fh:
            _json.dump(entries, fh, indent=1)
        _os.replace(tmp, f)

    @staticmethod
    def _split_top_level(text: str, sep: str = ",") -> list[str]:
        """Split ``text`` on ``sep`` at paren/bracket depth 0, honoring
        single-quoted strings with doubled-quote escapes — the
        tokenizer behind the WITH(...) option clause and the CREATE
        TABLE column list (VERDICT r13 #7: the greedy-regex split
        mis-parsed quoted values containing ``)`` or ``,``)."""
        parts: list[str] = []
        cur: list[str] = []
        depth = 0
        in_q = False
        i, n = 0, len(text)
        while i < n:
            ch = text[i]
            if in_q:
                cur.append(ch)
                if ch == "'":
                    if i + 1 < n and text[i + 1] == "'":  # '' escape
                        cur.append("'")
                        i += 1
                    else:
                        in_q = False
            elif ch == "'":
                in_q = True
                cur.append(ch)
            elif ch in "([":
                depth += 1
                cur.append(ch)
            elif ch in ")]":
                depth -= 1
                cur.append(ch)
            elif ch == sep and depth == 0:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
            i += 1
        parts.append("".join(cur))
        return parts

    @staticmethod
    def _parse_with_options(raw: str | None) -> dict:
        """key = value pairs; values are 'quoted' strings (doubled
        quotes escape, parens/commas inside quotes survive — tokenized,
        not regex-split) or numbers. Integer options validate with the
        reference's Binder-error wording (hnsw_options.test /
        hnsw_index_plan.cpp:33-80)."""
        opts: dict = {}
        if not raw:
            return opts
        for part in VssPlanner._split_top_level(raw):
            if not part.strip():
                continue
            k, eq, v = part.partition("=")
            key, val = k.strip().lower(), v.strip()
            if not key or not eq or not val:
                raise ValueError(
                    f"malformed WITH option {part.strip()!r}: expected key = value"
                )
            if len(val) >= 2 and val.startswith("'") and val.endswith("'"):
                opts[key] = val[1:-1].replace("''", "'")
            else:
                opts[key] = val
        for key, floor in VssPlanner._INT_OPTS.items():
            if key in opts:
                label = {"m": "M", "m0": "M0"}.get(key, key)
                try:
                    opts[key] = int(opts[key])
                except (TypeError, ValueError):
                    raise ValueError(
                        f"HNSW index '{label}' must be an integer"
                    ) from None
                if opts[key] < floor:
                    raise ValueError(
                        f"HNSW index '{label}' must be at least {floor}"
                    )
        return opts

    def _infer_id_col(self, df: DataFrame, opts: dict) -> str:
        want = opts.get("id") or opts.get("id_col")
        if want:
            if want not in df.columns:
                raise ValueError(f"id column {want!r} not in table")
            return want
        ints = [
            f.name
            for f in df.schema.fields
            if f.dataType.simpleString() in ("tinyint", "smallint", "int", "bigint")
        ]
        for c in ints:  # exact 'id', then any *id column, then first integral
            if c.lower() == "id":
                return c
        for c in ints:
            if c.lower().endswith("id"):
                return c
        if ints:
            return ints[0]
        raise ValueError(
            "CREATE INDEX ... USING HNSW needs an integral id column on the "
            "table (Spark has no rowids — the reference indexes rowids, "
            "hnsw_index.cpp): add one or pass WITH (id = '<col>')"
        )

    _SET_CONF = re.compile(
        r"^\s*SET\s+(hnsw_ef_search|hnsw_enable_experimental_persistence)"
        r"\s*=\s*('[^']*'|\S+?)\s*;?\s*$",
        re.IGNORECASE,
    )
    _RESET_CONF = re.compile(
        r"^\s*RESET\s+(hnsw_ef_search|hnsw_enable_experimental_persistence)"
        r"\s*;?\s*$",
        re.IGNORECASE,
    )

    _CHECKPOINT = re.compile(r"^\s*(?:FORCE\s+)?CHECKPOINT\s*;?\s*$", re.IGNORECASE)
    # SELECT setseed(x) — DuckDB's PRNG reseed as its own statement
    # (hnsw_lateral_join_group.test:4); the seeded random() stream is
    # reproduced bit-exactly (functions/duckrandom.py)
    _SETSEED_STMT = re.compile(
        r"^\s*SELECT\s+setseed\s*\(\s*(-?(?:\d+\.?\d*|\.\d+))\s*\)\s*;?\s*$",
        re.IGNORECASE,
    )
    _RANDOM_CALL = re.compile(r"\brandom\s*\(\s*\)", re.IGNORECASE)
    _RANGE_SRC = re.compile(
        r"\brange\s*\(\s*(-?\d+)\s*,\s*(-?\d+)\s*\)\s*"
        r"(?:as\s+)?[A-Za-z_]\w*\s*\(\s*([A-Za-z_]\w*)\s*\)",
        re.IGNORECASE,
    )

    # -- SQL DML surface (r14, VERDICT r13 #1): the reference's CRUD
    # statements — CREATE TABLE / INSERT INTO / DELETE FROM / DROP
    # TABLE (hnsw_crud.test:10-30, hnsw_insert.test:12-52) — run
    # verbatim through the planner over path-registered parquet
    # tables, driving the sink surface and therefore the bound-index
    # DML hooks (insert_into -> add_batch, delete_where ->
    # delete_batch). Statements naming an UNregistered table fall
    # through to raw Spark (catalog tables keep native semantics).
    _CREATE_TBL = re.compile(
        r"^\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?"
        r"([A-Za-z_]\w*)\s*"
        r"\((.*)\)\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )
    # CREATE TABLE t AS SELECT ... (hnsw_reclaim_storage.test_slow:8):
    # the select runs through the planner's OWN sql() — operator
    # aliases, DuckDB fn translation, and the pragma table functions
    # (pragma_database_size()) all resolve — and the result lands as a
    # path-registered table under the managed directory, so later
    # CREATE INDEX / DML statements see it like a declared table.
    # the query may be a bare SELECT, a parenthesized (SELECT ...), a
    # WITH ... SELECT CTE, or DuckDB's FROM-first form (``AS FROM t
    # [WHERE ...]`` — rewritten to SELECT *). ADVICE r14: the
    # statement shape (CREATE [OR REPLACE] TABLE ... AS <anything>)
    # matches here so NO DuckDB-valid CTAS can silently fall through
    # to a raw Spark catalog table — an unsupported body raises.
    _CTAS_STMT = re.compile(
        r"^\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?"
        r"([A-Za-z_]\w*)\s+AS\s+(.+)$",
        re.IGNORECASE | re.DOTALL,
    )
    _DROP_TBL = re.compile(
        r"^\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([A-Za-z_]\w*)\s*;?\s*$",
        re.IGNORECASE,
    )
    _INSERT_STMT = re.compile(
        r"^\s*INSERT\s+INTO\s+([A-Za-z_]\w*)\s*(?:\(([^()]*)\)\s*)?"
        r"(VALUES\b.*|SELECT\b.*?)\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )
    _DELETE_STMT = re.compile(
        r"^\s*DELETE\s+FROM\s+([A-Za-z_]\w*)(?:\s+WHERE\s+(.+?))?\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )
    _UPDATE_STMT = re.compile(
        r"^\s*UPDATE\s+([A-Za-z_]\w*)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+?))?\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )

    # DuckDB type names -> Spark SQL type names for CREATE TABLE
    _DUCK_TYPE_MAP = {
        "integer": "int", "int": "int", "int4": "int", "signed": "int",
        "bigint": "bigint", "int8": "bigint", "long": "bigint",
        "hugeint": "bigint", "smallint": "smallint", "int2": "smallint",
        "tinyint": "tinyint", "int1": "tinyint",
        "varchar": "string", "text": "string", "string": "string",
        "bpchar": "string", "char": "string",
        "float": "float", "float4": "float", "real": "float",
        "double": "double", "float8": "double",
        "boolean": "boolean", "bool": "boolean", "logical": "boolean",
        "date": "date", "timestamp": "timestamp", "datetime": "timestamp",
        "blob": "binary", "bytea": "binary", "binary": "binary",
    }

    @classmethod
    def _duck_type_to_spark(cls, t: str) -> str:
        t = t.strip()
        m = re.match(r"^(.*?)\s*\[\s*\d*\s*\]$", t)  # FLOAT[3] / FLOAT[]
        if m:
            return f"array<{cls._duck_type_to_spark(m.group(1))}>"
        tl = t.lower()
        if tl.startswith(("decimal", "numeric")):
            return re.sub(r"^numeric", "decimal", tl)
        if tl.startswith("varchar"):  # VARCHAR(n)
            return "string"
        return cls._DUCK_TYPE_MAP.get(tl, tl)

    @staticmethod
    def _translate_dml_exprs(text: str) -> str:
        """DuckDB literal forms the reference's DML statements use ->
        Spark SQL: ``array_value(...)`` / ``array[...]`` / bare
        ``[...]`` list literals become ``array(...)``; operator aliases
        and ``[..]::FLOAT[n]`` casts via rewrite_operators."""
        out = re.sub(r"\barray_value\s*\(", "array(", text, flags=re.IGNORECASE)
        # array(...)::FLOAT[n] — the call form of the bracket-literal
        # cast (hnsw_reclaim_storage.test_slow:8 ``array_value(i, i,
        # i)::FLOAT[3]``); rewrite_operators only handles the bracket
        # spelling. Balanced-paren scan (ADVICE r14): nested calls
        # like ``array(cast(i as float), ...)::FLOAT[3]`` translate
        # too — the old ``[^()]*`` regex left them behind. Parens
        # inside string literals are not tracked (none of the
        # reference's DML forms put parens in strings).
        out = _rewrite_array_call_casts(out)
        out = re.sub(r"\barray\s*\[([^\[\]]*)\]", r"array(\1)", out, flags=re.IGNORECASE)
        # bare list literal (not an index/slice: no identifier or ]
        # before; not a typed cast: no :: after — rewrite_operators
        # translates those with their type)
        out = re.sub(r"(?<![\w\]])\[([^\[\]]*)\](?!\s*::)", r"array(\1)", out)
        return translate_duckdb_functions(rewrite_operators(out))

    def _coerce_array_literals(self, text: str, schema) -> str:
        """``col = array(...)`` (either operand order, =/==/!=/<>) ->
        cast the literal to the column's exact array type. Spark has
        no implicit coercion between array element types (an
        array<float> column never compares to a decimal-literal
        array), while the reference host coerces; the planner holds
        the table schema, so it inserts the cast the verbatim
        statement couldn't carry (hnsw_crud.test:26 ``WHERE vec =
        array[1.0, 2.0, 3.0]``)."""
        types = {
            f.name.lower(): f.dataType.simpleString()
            for f in schema.fields
            if f.dataType.simpleString().startswith("array<")
        }
        for col, typ in types.items():
            text = re.sub(
                rf"(\b{re.escape(col)}\s*(?:==|=|!=|<>)\s*)(array\s*\([^()]*\))",
                rf"\1CAST(\2 AS {typ})",
                text,
                flags=re.IGNORECASE,
            )
            text = re.sub(
                rf"(array\s*\([^()]*\))(\s*(?:==|=|!=|<>)\s*{re.escape(col)}\b)",
                rf"CAST(\1 AS {typ})\2",
                text,
                flags=re.IGNORECASE,
            )
        return text

    def _try_dml(self, sql: str) -> DataFrame | None:
        """CREATE/DROP TABLE + INSERT/DELETE over path-registered
        tables. Returns None when the statement is not DML or names an
        unregistered table (raw Spark handles those)."""
        from duckdb_vss_spark.sources import sinks

        m = self._CTAS_STMT.match(sql)
        if m:
            or_replace, if_not_exists, name, select = m.groups()
            if or_replace and if_not_exists:
                raise ValueError(
                    "CREATE OR REPLACE TABLE cannot carry IF NOT EXISTS"
                )
            select = select.rstrip("; \n\t").strip()
            if re.match(r"^FROM\b", select, re.IGNORECASE):
                # DuckDB FROM-first CTAS: bare FROM means SELECT *
                if re.search(r"\bSELECT\b", select, re.IGNORECASE):
                    raise ValueError(
                        "FROM-first CTAS with a trailing SELECT clause is "
                        f"not supported: {select[:80]!r} — write the "
                        "SELECT-first form"
                    )
                select = "SELECT * " + select
            elif not re.match(
                r"^(?:SELECT|WITH|\(\s*SELECT)\b", select, re.IGNORECASE
            ):
                # loud, not a silent fall-through to a raw Spark
                # catalog table with divergent semantics (ADVICE r14)
                raise ValueError(
                    f"unsupported CTAS body: {select[:80]!r} — expected "
                    "SELECT / WITH / (SELECT / FROM-first"
                )
            replacing = None
            if name.lower() in self._tables:
                if if_not_exists:
                    self.last_plan = "CREATE_TABLE_AS"
                    return self._empty_result()
                if not or_replace:
                    raise ValueError(f"table {name!r} already exists")
                replacing = self._tables[name.lower()]
            # full planner power for the select: DuckDB literal forms
            # first (array_value / call-casts), then sql() for operator
            # aliases, fn translation, and the pragma table functions
            df = self.sql(
                self._translate_dml_exprs(
                    self._seeded_random_rewrite(select.rstrip("; \n\t"))
                )
            )
            integral = {"tinyint", "smallint", "int", "bigint"}
            auto_rowid = not any(
                f.dataType.simpleString() in integral for f in df.schema.fields
            )
            if auto_rowid:
                from pyspark.sql import functions as _F

                df = df.withColumn(
                    "__rowid", _F.monotonically_increasing_id()
                )
            if self._ddl_dir is None:
                import tempfile

                self._ddl_dir = tempfile.mkdtemp(prefix="vss_sql_indexes_")
            import os as _os

            path = _os.path.join(self._ddl_dir, "tables", name)
            if replacing is not None:
                # MATERIALIZE the replacement before touching the old
                # table (review r15): DuckDB keeps the old table when a
                # replace fails, and CREATE OR REPLACE TABLE t AS
                # SELECT ... FROM t must read the OLD t — so the select
                # executes into a sibling dir while the old view and
                # files are still live, and only a finished write
                # displaces them
                import shutil as _shutil

                tmp = path + ".__replace__"
                _shutil.rmtree(tmp, ignore_errors=True)  # crashed prior
                df.write.mode("overwrite").parquet(tmp)
                self._drop_table_entry(replacing)
                _shutil.rmtree(path, ignore_errors=True)
                _os.makedirs(_os.path.dirname(path), exist_ok=True)
                _os.rename(tmp, path)
            else:
                df.write.mode("overwrite").parquet(path)
            self._tables[name.lower()] = {
                "name": name, "path": _os.path.abspath(path),
                "dims": {}, "auto_rowid": auto_rowid,
            }
            self._refresh_table(name)
            self._save_catalog()
            self.last_plan = "CREATE_TABLE_AS"
            return self._empty_result()
        m = self._CREATE_TBL.match(sql)
        if m:
            or_replace, if_not_exists, name, colspec = m.groups()
            if or_replace and if_not_exists:
                raise ValueError(
                    "CREATE OR REPLACE TABLE cannot carry IF NOT EXISTS"
                )
            replacing = None
            if name.lower() in self._tables:
                if if_not_exists:
                    self.last_plan = "CREATE_TABLE"
                    return self._empty_result()
                if not or_replace:
                    raise ValueError(f"table {name!r} already exists")
                # dropped only after the column spec VALIDATES (review
                # r15: DuckDB keeps the old table when a replace fails)
                replacing = self._tables[name.lower()]
            fields = []
            # declared array lengths (FLOAT[3]) survive here even though
            # Spark array types are unsized — CREATE INDEX over an
            # EMPTY table needs them (the reference's
            # hnsw_insert_wal.test creates the index before any row)
            col_dims: dict[str, int] = {}
            for part in self._split_top_level(colspec):
                part = part.strip()
                if not part:
                    continue
                mm = re.match(r"^([A-Za-z_]\w*)\s+(.+?)\s*$", part, re.DOTALL)
                if not mm or mm.group(1).upper() in (
                    "PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT",
                ):
                    raise ValueError(
                        f"unsupported CREATE TABLE element {part!r} "
                        "(column constraints beyond NOT NULL/PRIMARY "
                        "KEY/UNIQUE are out of scope)"
                    )
                cname, ctype = mm.group(1), mm.group(2)
                while True:  # strip trailing single-column constraints
                    stripped = re.sub(
                        r"\s+(NOT\s+NULL|PRIMARY\s+KEY|UNIQUE)\s*$",
                        "",
                        ctype,
                        flags=re.IGNORECASE,
                    )
                    if stripped == ctype:
                        break
                    ctype = stripped
                dm = re.match(r"^[A-Za-z_0-9]+\s*\[\s*(\d+)\s*\]$", ctype.strip())
                if dm:
                    col_dims[cname] = int(dm.group(1))
                fields.append(f"{cname} {self._duck_type_to_spark(ctype)}")
            if not fields:
                raise ValueError("CREATE TABLE needs at least one column")
            # rowid emulation (r14): the reference indexes rowids, so its
            # test tables declare NO id column (hnsw_basic.test:10). A
            # table without an integral column gets a hidden __rowid
            # (assigned on INSERT, excluded from the SELECT view) that
            # CREATE INDEX's id inference picks up — reference scripts
            # run with zero modification.
            auto_rowid = not any(
                f.split(" ", 1)[1] in ("tinyint", "smallint", "int", "bigint")
                for f in fields
            )
            if auto_rowid:
                fields.append("__rowid bigint")
            # schema parsing happens eagerly here — any bad column type
            # raises BEFORE the old table is dropped (review r15)
            empty = self.spark.createDataFrame([], ", ".join(fields))
            if replacing is not None:
                self._drop_table_entry(replacing)
            if self._ddl_dir is None:
                import tempfile

                self._ddl_dir = tempfile.mkdtemp(prefix="vss_sql_indexes_")
            import os as _os

            path = _os.path.join(self._ddl_dir, "tables", name)
            (
                empty
                .repartition(1)
                .write.mode("overwrite")
                .parquet(path)
            )
            self._tables[name.lower()] = {
                "name": name, "path": _os.path.abspath(path),
                "dims": col_dims, "auto_rowid": auto_rowid,
            }
            self._refresh_table(name)
            self._save_catalog()
            self.last_plan = "CREATE_TABLE"
            return self._empty_result()
        m = self._DROP_TBL.match(sql)
        if m:
            if_exists, name = m.groups()
            rec = self._tables.get(name.lower())
            if rec is None:
                if if_exists:
                    self.last_plan = "DROP_TABLE"
                    return self._empty_result()
                return None  # unregistered: raw Spark semantics
            self._drop_table_entry(rec)
            self._save_catalog()
            self.last_plan = "DROP_TABLE"
            return self._empty_result()
        m = self._INSERT_STMT.match(sql)
        if m:
            tname, collist, rest = m.groups()
            rec = self._tables.get(tname.lower())
            if rec is None:
                return None
            target = self.spark.read.parquet(rec["path"])
            # seeded random() resolves BEFORE the generic translation
            # maps random() -> rand()
            rest = self._seeded_random_rewrite(rest)
            rest = self._translate_dml_exprs(rest).strip().rstrip(";").strip()
            cols = (
                [c.strip() for c in collist.split(",")]
                if collist
                else [c for c in target.columns if c != "__rowid"]
            )
            have = {f.name.lower() for f in target.schema.fields}
            missing = [c for c in cols if c.lower() not in have]
            if missing:
                raise ValueError(
                    f"INSERT column(s) {missing} not in table {tname!r}"
                )
            if re.match(r"^VALUES\b", rest, re.IGNORECASE):
                batch = self._raw_sql(
                    f"SELECT * FROM ({rest}) AS __vss_ins({', '.join(cols)})"
                )
            else:
                batch = self._raw_sql(rest)
                if len(batch.columns) != len(cols):
                    raise ValueError(
                        f"INSERT has {len(cols)} target column(s) but the "
                        f"query produces {len(batch.columns)}"
                    )
                batch = batch.toDF(*cols)
            by_name = {c.lower(): c for c in batch.columns}
            aligned = batch.select(
                *[
                    F.col(by_name[f.name.lower()]).cast(f.dataType).alias(f.name)
                    if f.name.lower() in by_name
                    else F.lit(None).cast(f.dataType).alias(f.name)
                    for f in target.schema.fields
                ]
            )
            if rec.get("auto_rowid"):
                # assign fresh rowids past the current max — UNIQUE ids
                # are the whole contract (the reference's rowids).
                # VALUES batches (a bounded literal) keep DENSE
                # sequential ids via a single-partition window; a
                # SELECT-shaped INSERT (the reference's own bulk idiom,
                # hnsw_basic.test:13) assigns DISTRIBUTEDLY —
                # monotonically_increasing_id() is unique per row
                # (partition_id << 33 | offset), no shuffle, no
                # single-task funnel (VERDICT r14 #2; ids are sparse
                # across partitions, which the contract permits)
                base_max = target.agg(F.max("__rowid")).first()[0] or 0
                if re.match(r"^VALUES\b", rest, re.IGNORECASE):
                    from pyspark.sql import Window as _W

                    new_id = F.lit(int(base_max)) + F.row_number().over(
                        _W.orderBy(F.monotonically_increasing_id())
                    )
                else:
                    new_id = (
                        F.lit(int(base_max) + 1)
                        + F.monotonically_increasing_id()
                    )
                aligned = aligned.withColumn(
                    "__rowid", new_id.cast("long")
                )
            sinks.insert_into(aligned, rec["path"])
            self._refresh_table(rec["name"])
            self.last_plan = "INSERT"
            return self._empty_result()
        m = self._DELETE_STMT.match(sql)
        if m:
            tname, pred = m.groups()
            rec = self._tables.get(tname.lower())
            if rec is None:
                return None
            if pred:
                text = self._translate_dml_exprs(pred).strip().rstrip(";").strip()
                text = self._coerce_array_literals(
                    text, self.spark.read.parquet(rec["path"]).schema
                )
                predicate = F.expr(text)
            else:
                predicate = F.lit(True)
            n = sinks.delete_where(self.spark, rec["path"], predicate)
            self._refresh_table(rec["name"])
            self.last_plan = "DELETE"
            return self.spark.createDataFrame([(int(n),)], "Count bigint")
        m = self._UPDATE_STMT.match(sql)
        if m:
            tname, set_clause, pred = m.groups()
            rec = self._tables.get(tname.lower())
            if rec is None:
                return None
            schema = self.spark.read.parquet(rec["path"]).schema
            assignments: dict = {}
            for part in self._split_top_level(set_clause):
                if not part.strip():
                    continue
                k, eq, v = part.partition("=")
                if not eq or not k.strip() or not v.strip():
                    raise ValueError(
                        f"malformed SET assignment {part.strip()!r}"
                    )
                expr = self._translate_dml_exprs(v.strip())
                assignments[k.strip()] = F.expr(expr)
            if pred:
                text = self._translate_dml_exprs(pred).strip().rstrip(";").strip()
                text = self._coerce_array_literals(text, schema)
                predicate = F.expr(text)
            else:
                predicate = F.lit(True)
            n = sinks.update_where(
                self.spark, rec["path"], assignments, predicate
            )
            self._refresh_table(rec["name"])
            self.last_plan = "UPDATE"
            return self.spark.createDataFrame([(int(n),)], "Count bigint")
        return None

    _PRAGMA_OPTIMIZER = re.compile(
        r"^\s*PRAGMA\s+(disable|enable)_optimizer\s*;?\s*$", re.IGNORECASE
    )

    # the reference's table-macro forms (hnsw_index_macros.cpp /
    # hnsw_join_macro.test): FROM vss_join(l, r, lcol, rcol, k) and the
    # correlated FROM l, vss_match(r, lcol, rcol, k). Macros expand
    # regardless of the optimizer toggle (they are macros, not rules).
    _VSS_JOIN_SQL = re.compile(
        r"^\s*SELECT\s+(?P<cols>.+?)\s+FROM\s+vss_join\s*\(\s*"
        r"(?P<left>[A-Za-z_]\w*)\s*,\s*(?P<right>[A-Za-z_]\w*)\s*,\s*"
        r"(?P<lcol>[A-Za-z_]\w*)\s*,\s*(?P<rcol>[A-Za-z_]\w*)\s*,\s*"
        r"(?P<k>\d+)\s*\)\s*(?:AS\s+(?P<alias>[A-Za-z_]\w*))?\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )
    _VSS_MATCH_SQL = re.compile(
        r"^\s*SELECT\s+(?P<cols>.+?)\s+FROM\s+(?P<left>[A-Za-z_]\w*)\s*,\s*"
        r"vss_match\s*\(\s*(?P<right>[A-Za-z_]\w*)\s*,\s*"
        r"(?P<lcol>[A-Za-z_]\w*)\s*,\s*(?P<rcol>[A-Za-z_]\w*)\s*,\s*"
        r"(?P<k>\d+)\s*\)\s*(?:AS\s+(?P<alias>[A-Za-z_]\w*))?\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )

    def _try_macro(self, sql: str) -> DataFrame | None:
        from duckdb_vss_spark.operators.join import vss_join, vss_match

        m = self._VSS_JOIN_SQL.match(sql)
        if m:
            res = vss_join(
                self.spark.table(m["left"]), self.spark.table(m["right"]),
                m["lcol"], m["rcol"], int(m["k"]),
            )
            res.createOrReplaceTempView("__vss_macro__")
            self.last_plan = "VSS_JOIN"
            return self._raw_sql(
                translate_duckdb_functions(
                    f"SELECT {m['cols']} FROM __vss_macro__"
                )
            )
        m = self._VSS_MATCH_SQL.match(sql)
        if m:
            res = vss_match(
                self.spark.table(m["left"]), self.spark.table(m["right"]),
                m["lcol"], m["rcol"], int(m["k"]),
            )
            res.createOrReplaceTempView("__vss_macro__")
            self.last_plan = "VSS_MATCH"
            return self._raw_sql(
                translate_duckdb_functions(
                    f"SELECT {m['cols']} FROM __vss_macro__"
                )
            )
        return None

    def _try_ddl(self, sql: str) -> DataFrame | None:
        m = self._PRAGMA_OPTIMIZER.match(sql)
        if m:
            self._optimizer_enabled = m.group(1).lower() == "enable"
            self.last_plan = (
                "ENABLE_OPTIMIZER" if self._optimizer_enabled else "DISABLE_OPTIMIZER"
            )
            return self._empty_result()
        m = self._SETSEED_STMT.match(sql)
        if m:
            from duckdb_vss_spark.functions.duckrandom import (
                DuckRandomConnection,
            )

            self._rand_conn = DuckRandomConnection(float(m.group(1)))
            self.last_plan = "SETSEED"
            return self._empty_result()
        if self._CHECKPOINT.match(sql):
            # the reference's CHECKPOINT flushes the WAL so the index
            # survives restart (hnsw_crud.test:20). This engine's
            # artifacts and catalog commit durably at every write
            # (atomic manifest/catalog.json replace), so the statement
            # is accepted as a no-op for script compatibility.
            self.last_plan = "CHECKPOINT"
            return self._empty_result()
        m = self._SET_CONF.match(sql)
        if m:
            # the reference's session settings (README.md / settings
            # registration in hnsw_index.cpp): SET hnsw_ef_search = N and
            # SET hnsw_enable_experimental_persistence = bool translate to
            # this engine's spark.vss.* session confs (session.py)
            from duckdb_vss_spark.session import (
                CONF_EF_SEARCH,
                CONF_ENABLE_PERSISTENCE,
            )

            key, val = m.group(1).lower(), m.group(2).strip("'")
            if key == "hnsw_ef_search":
                try:
                    ival = int(val)
                except ValueError:
                    raise ValueError(
                        "'hnsw_ef_search' must be an integer"
                    ) from None
                if ival < 1:
                    raise ValueError("'hnsw_ef_search' must be at least 1")
                self.spark.conf.set(CONF_EF_SEARCH, str(ival))
            else:
                self.spark.conf.set(
                    CONF_ENABLE_PERSISTENCE,
                    "true" if val.lower() in ("true", "1", "yes") else "false",
                )
            self.last_plan = "SET"
            return self._empty_result()
        m = self._RESET_CONF.match(sql)
        if m:
            from duckdb_vss_spark.session import (
                CONF_EF_SEARCH,
                CONF_ENABLE_PERSISTENCE,
            )

            conf = (
                CONF_EF_SEARCH
                if m.group(1).lower() == "hnsw_ef_search"
                else CONF_ENABLE_PERSISTENCE
            )
            try:
                self.spark.conf.unset(conf)
            except Exception:  # noqa: BLE001 — already unset
                pass
            self.last_plan = "RESET"
            return self._empty_result()
        m = self._CREATE_IDX.match(sql)
        if m:
            if_not_exists, name, table, family, vec_col, raw_opts = m.groups()
            family = family.upper()
            if family == "IVFADC":
                family = "IVFPQ"  # the reference literature name, aliased
            if name in self._named:
                if if_not_exists:
                    self.last_plan = f"CREATE_{family}_INDEX"
                    return self._empty_result()
                raise ValueError(f"an index with the name {name!r} already exists")
            opts = self._parse_with_options(raw_opts)
            allowed = {"metric", "id", "id_col", "ef_search"} | {
                "HNSW": {"m", "m0", "ef_construction"},
                "IVF": {"nlist", "default_nprobe"},
                "PQ": {"m", "ksub"},
                "IVFPQ": {"m", "nlist", "ksub", "default_nprobe"},
                "IVFSQ": {"nlist", "default_nprobe"},
                "BQ": {"scoring", "target_recall"},
            }[family]
            unknown = sorted(set(opts) - allowed)
            if unknown:
                # the reference's Binder wording
                # (hnsw_index_plan.cpp:78: "Unknown option for HNSW
                # index: '%s'"), generalized per family
                raise ValueError(
                    f"Unknown option for {family} index: '{unknown[0]}'"
                )
            df = self._table_frame(table)  # includes a hidden __rowid
            id_col = self._infer_id_col(df, opts)
            if self._ddl_dir is None:
                import tempfile

                self._ddl_dir = tempfile.mkdtemp(prefix="vss_sql_indexes_")
            import os as _os

            path = _os.path.join(self._ddl_dir, name)
            kwargs = {k: opts[k] for k in ("metric",) if k in opts}
            if family == "HNSW":
                from duckdb_vss_spark.index import create_hnsw_index as _create

                for k in ("m", "m0", "ef_construction"):
                    if k in opts:
                        kwargs[k] = opts[k]
                # a CREATE TABLE-declared FLOAT[n] length lets the index
                # build over an EMPTY table (hnsw_insert_wal.test:26-28)
                declared = (self._tables.get(table.lower()) or {}).get(
                    "dims", {}
                ).get(vec_col)
                if declared:
                    kwargs["dims"] = int(declared)
            elif family == "IVF":
                from duckdb_vss_spark.index.ivf import create_ivf_index as _create

                for k in ("nlist", "default_nprobe"):
                    if k in opts:
                        kwargs[k] = int(opts[k])
            elif family == "PQ":
                from duckdb_vss_spark.index.pq import create_pq_index as _create

                if "m" in opts:
                    kwargs["m"] = opts["m"]
                if "ksub" in opts:
                    kwargs["ksub"] = int(opts["ksub"])
            elif family == "IVFPQ":
                from duckdb_vss_spark.index.ivfpq import (
                    create_ivfpq_index as _create,
                )

                if "m" in opts:
                    kwargs["m"] = opts["m"]
                for k in ("nlist", "ksub", "default_nprobe"):
                    if k in opts:
                        kwargs[k] = int(opts[k])
            elif family == "IVFSQ":
                from duckdb_vss_spark.index.ivfsq import (
                    create_ivfsq_index as _create,
                )

                for k in ("nlist", "default_nprobe"):
                    if k in opts:
                        kwargs[k] = int(opts[k])
            else:  # BQ
                from duckdb_vss_spark.index.bq import create_bq_index as _create

                if "scoring" in opts:
                    kwargs["scoring"] = opts["scoring"]
                if "target_recall" in opts:
                    kwargs["target_recall"] = float(opts["target_recall"])
            idx = _create(
                self.spark, df, vec_col, id_col, path,
                name=name, overwrite=True, **kwargs,
            )
            if opts.get("ef_search"):
                # WITH (ef_search = N): the reference persists the search
                # width on the index; the routed HNSW scan honors it
                idx._sql_ef_search = int(opts["ef_search"])
            self.register_index(table, vec_col, idx)
            self._named[name] = {
                "index": idx,
                "table": table,
                "vec_col": vec_col,
                "ef_search": opts.get("ef_search"),
            }
            trec = self._tables.get(table.lower())
            if trec is not None:
                # an index created on a DML-able table receives table
                # DML through the sink hooks — the reference's
                # in-engine index maintenance (hnsw_index.cpp:391-500)
                from duckdb_vss_spark.sources import sinks

                sinks.bind_index(trec["path"], idx)
            self._save_catalog()
            self.last_plan = f"CREATE_{family}_INDEX"
            return self._empty_result()
        m = self._DROP_IDX.match(sql)
        if m:
            if_exists, name = m.groups()
            rec = self._named.pop(name, None)
            if rec is None:
                if if_exists:
                    self.last_plan = "DROP_INDEX"
                    return self._empty_result()
                raise ValueError(f"index {name!r} does not exist")
            from duckdb_vss_spark.index import drop_index

            key = (rec["table"].lower(), rec["vec_col"].lower())
            lst = self._indexes.get(key, [])
            self._indexes[key] = [i for i in lst if i is not rec["index"]]
            trec = self._tables.get(rec["table"].lower())
            if trec is not None:
                from duckdb_vss_spark.sources import sinks

                sinks.unbind_index(trec["path"], rec["index"])
            drop_index(rec["index"].path)
            self._save_catalog()
            self.last_plan = "DROP_INDEX"
            return self._empty_result()
        m = self._PRAGMA_COMPACT.match(sql)
        if m:
            name = m.group(1)
            rec = self._named.get(name)
            if rec is None:
                raise ValueError(f"index {name!r} does not exist")
            ix = rec["index"]
            if type(ix).__name__ == "HnswIndex":
                # compact() REBUILDS and returns a fresh handle — rebind
                # it everywhere or the planner keeps serving the stale
                # manifest (old shard list, stale tombstone counts).
                # _table_frame: the rebuild needs the hidden __rowid
                # the index is keyed on, which the view hides
                new_ix = ix.compact(self._table_frame(rec["table"]))
            else:  # quantized families: self-contained, mutate in place
                new_ix = ix.compact()
            if new_ix is not ix:
                if hasattr(ix, "_sql_ef_search"):
                    new_ix._sql_ef_search = ix._sql_ef_search
                key = (rec["table"].lower(), rec["vec_col"].lower())
                self._indexes[key] = [
                    new_ix if i is ix else i for i in self._indexes.get(key, [])
                ]
                trec = self._tables.get(rec["table"].lower())
                if trec is not None:
                    from duckdb_vss_spark.sources import sinks

                    sinks.unbind_index(trec["path"], ix)
                    sinks.bind_index(trec["path"], new_ix)
                rec["index"] = new_ix
            self._save_catalog()
            self.last_plan = "COMPACT_INDEX"
            return self._empty_result()
        # the pragma table functions compose into arbitrary SELECTs; a
        # CREATE TABLE ... AS wrapping one must land in the CTAS
        # handler (which re-enters sql() for the select) so the result
        # becomes a planner table, not a raw-Spark catalog table
        is_create = re.match(r"^\s*CREATE\b", sql, re.IGNORECASE) is not None
        if self._DBSIZE_FN.search(sql) and not is_create:
            df = self.spark.createDataFrame(
                [self._database_size_row()],
                "database_name string, database_size string, "
                "block_size bigint, total_blocks bigint, "
                "used_blocks bigint, free_blocks bigint, "
                "wal_size string, memory_usage string, "
                "memory_limit string",
            )
            df.createOrReplaceTempView("__db_size__")
            self.last_plan = "DATABASE_SIZE"
            return self._raw_sql(self._DBSIZE_FN.sub("__db_size__", sql))
        if self._INFO_FN.search(sql) and not is_create:
            from functools import reduce

            from duckdb_vss_spark.index.artifact import index_info

            infos = [
                index_info(self.spark, rec["index"].path)
                for rec in self._named.values()
                # the reference pragma reports HNSW indexes; quantized
                # artifacts expose their stats via their own info()
                if type(rec["index"]).__name__ == "HnswIndex"
            ]
            if infos:
                info = reduce(lambda a, b: a.unionByName(b), infos)
            else:
                # empty registry: an empty frame with the 11-col schema
                from duckdb_vss_spark.index.artifact import _INFO_SCHEMA

                info = self.spark.createDataFrame([], _INFO_SCHEMA)
            info.createOrReplaceTempView("__hnsw_info__")
            self.last_plan = "INDEX_INFO"
            return self._raw_sql(self._INFO_FN.sub("__hnsw_info__", sql))
        return None

    def sql(self, sql: str) -> DataFrame:
        self.last_plan_detail = None
        ddl = self._try_ddl(sql)
        if ddl is not None:
            return ddl
        dml = self._try_dml(sql)
        if dml is not None:
            return dml
        macro = self._try_macro(sql)
        if macro is not None:
            return macro
        if self._rand_conn is not None and self._RANDOM_CALL.search(sql):
            # after SELECT setseed(x), a bare-SELECT random() must not
            # fall through to nondeterministic rand() (review r15) —
            # rewrite to the deterministic stream, or raise loudly on
            # shapes whose draw order the ordinal mapping can't pin
            sql = self._seeded_random_rewrite(sql)
        if not self._optimizer_enabled:
            # PRAGMA disable_optimizer: execute UN-rewritten. Operator
            # aliases / DuckDB fn names still translate (parsing —
            # Spark cannot parse them at all), laterals still route to
            # the BRUTE path (Spark cannot run correlated laterals
            # natively), but cosine canonicalization and every index
            # route are off, the reference's disable_optimizer scope.
            ml = match_lateral(sql)
            if ml is not None:
                self.last_plan = "SEQ_SCAN"
                return self._run_lateral_brute(ml)
            self.last_plan = "SEQ_SCAN"
            return self._raw_sql(
                translate_duckdb_functions(rewrite_operators(sql))
            )
        match = match_topk(sql)
        idx = self._index_for(match) if match else None
        if match and idx is not None:
            try:
                self._set_marker(idx)
                hits = self._index_hits(
                    idx, match.table, match.query_vec, match.k,
                    match.where, vec_col=match.vec_col,
                )
                # reproject to the requested select list; the distance column
                # is recomputed by the projection like the reference (§3-B.4)
                hits.createOrReplaceTempView("__vss_topk__")
                cols = match.cols
                if cols == "*":
                    return hits.drop("dist")
                try:
                    return self._raw_sql(f"SELECT {cols} FROM __vss_topk__")
                except Exception:
                    # a select list the temp-view reprojection cannot
                    # resolve (e.g. table-qualified refs, "items.id")
                    # must not break a statement that runs fine
                    # un-indexed — seq-scan it (review r13)
                    self.last_plan = "SEQ_SCAN"
                    return self._raw_sql(
                        canonicalize_cosine(rewrite_operators(sql))
                    )
            except UnroutableIndexError:
                # a registered index that cannot serve this statement
                # (routed table lacks the manifest's id column) must not
                # break a previously-valid statement — seq-scan it
                self.last_plan = "SEQ_SCAN"
                return self._raw_sql(canonicalize_cosine(rewrite_operators(sql)))

        mb = match_minby(sql)
        if mb is not None:
            return self._run_minby(mb)

        nested = match_minby_nested(sql)
        if nested is not None:
            mb2, select_list, a, b = nested
            lst = self._run_minby(mb2)  # one row, column __vss_x
            lst.createOrReplaceTempView("__vss_minby_outer__")
            new_select = select_list[:a] + "__vss_x" + select_list[b:]
            return self._raw_sql(
                translate_duckdb_functions(
                    f"SELECT {new_select} FROM __vss_minby_outer__"
                )
            )

        ml = match_lateral(sql)
        if ml is not None:
            # Spark cannot run this SQL natively at all — correlated
            # outer references are unsupported outside WHERE/HAVING
            # (UNSUPPORTED_SUBQUERY_EXPRESSION_CATEGORY.CORRELATED_
            # REFERENCE) — so BOTH paths are ours: index join when
            # registered, crossjoin+window top-k otherwise (the exact
            # plan shape the reference pattern-matches on,
            # hnsw_optimize_join.cpp:351-415).
            idx = self._index_for_join(ml)
            if idx is not None:
                return self._run_lateral_indexed(ml, idx)
            return self._run_lateral_brute(ml)

        region = match_lateral_region(sql)
        if region is not None:
            # a lateral INSIDE a larger statement (enclosing aggregate
            # / GROUP BY / subquery — the reference's slow suite)
            return self._run_lateral_extract(region)

        # no regex form matched: parse through the REAL Catalyst
        # analyzer and pattern-match the analyzed plan — the engine-level
        # TopN rule (plans/catalyst.py) that makes alias scoping, casts,
        # star expansion and view inlining the analyzer's problem, not a
        # regex's. SEQ_SCAN fallback executes the parsed plan untouched.
        self.last_plan = "SEQ_SCAN"
        df = self._raw_sql(
            translate_duckdb_functions(
                canonicalize_cosine(rewrite_operators(sql))
            )
        )
        routed = self.rewrite_plan(df)
        return routed if routed is not None else df

    def rewrite_plan(self, df: DataFrame) -> DataFrame | None:
        """Catalyst-plan-level TopN -> index scan (the reference's
        optimizer-extension shape, hnsw_optimize_scan.cpp:255-258, see
        plans/catalyst.py). Returns the rewritten DataFrame or None;
        filters pull up above the scan, the original projection is
        re-evaluated over the aliased hits (distance recomputed in the
        surviving projection, SURVEY §3-B.4)."""
        from duckdb_vss_spark.plans.catalyst import match_topk_plan

        m = match_topk_plan(
            self.spark, df._jdf.queryExecution().analyzed(), set(self._indexes)
        )
        if m is None:
            return None
        idx = self._index_for(
            TopKMatch("*", m.table, m.fn, m.metric, m.vec_col, m.query_vec, m.k)
        )
        if idx is None:
            return None
        # The matched filters/projections are Catalyst ``.sql()``
        # renderings, which Spark does NOT guarantee round-trippable;
        # since install_sql_extension hooks EVERY spark.sql call, an
        # unparseable rendering must fall back to the unrewritten plan
        # instead of failing a previously-valid statement (ADVICE r10).
        prev_plan = self.last_plan
        try:
            self._set_marker(idx)
            hits = self._index_hits(
                idx, m.table, m.query_vec, m.k, vec_col=m.vec_col
            ).alias(m.table)
            for f in m.filters:
                hits = hits.where(F.expr(f))
            if m.project_exprs:
                hits = hits.selectExpr(*m.project_exprs).alias(m.table)
            elif m.outer_exprs is None:
                # select-star: reproduce the ORIGINAL output column order
                # (the index scan's internal order differs)
                return hits.select(*df.columns)
            else:
                hits = hits.drop("dist").alias(m.table)
            if m.outer_exprs is not None:
                # DataFrame-API .limit(k).select(...) — applied above the
                # k rows, exactly where the original plan had it
                hits = hits.selectExpr(*m.outer_exprs)
            return hits
        except Exception:  # noqa: BLE001 — non-round-trippable rendering
            self.last_plan = prev_plan
            return None

    def optimize(self, df: DataFrame) -> DataFrame:
        """PUBLIC DataFrame-API route into the index rules (VERDICT r10
        #3 — the reference's optimizer extension fires on every plan,
        hnsw_optimize_scan.cpp:255-258; a Python planner can't inject a
        JVM rule, so the DataFrame form gets this explicit entry point
        next to the hooked-SQL one):

        >>> df = spark.table("items").orderBy(
        ...     F.expr("array_distance(vec, array(1.0,2.0,3.0))")).limit(5)
        >>> fast = planner.optimize(df)
        >>> planner.last_plan
        'HNSW_INDEX_SCAN'

        Matches the same Catalyst analyzed-plan TopN shape as the
        spark.sql hook (plans/catalyst.py) — the plan must bottom out
        at a REGISTERED table name (``spark.table("name")``), ascending
        single-key distance sort, constant query vector, foldable k.
        Returns the index-routed DataFrame on a match, else ``df``
        UNCHANGED (never raises on a non-matching plan); ``last_plan``
        carries the EXPLAIN-parity marker."""
        self.last_plan = "SEQ_SCAN"
        routed = self.rewrite_plan(df)
        return routed if routed is not None else df

    # -- min_by (k-ary aggregate; Spark's builtin is 2-ary, so BOTH paths
    #    are ours: index scan when available, sort-slice idiom otherwise) --

    def _run_minby(self, mb: MinByMatch) -> DataFrame:
        idx = self._index_for(
            TopKMatch("", mb.table, mb.fn, mb.metric, mb.vec_col, mb.query_vec, mb.k)
        )
        from duckdb_vss_spark.functions import distance as D

        score_fn = getattr(D, mb.fn)
        base = self.spark.table(mb.table)
        if idx is not None:
            # the index scan ranks by the metric's *distance* ascending,
            # which is exactly similarity descending for cosine/ip — so
            # min_by and max_by share the same indexed top-k
            try:
                self._set_marker(idx)
                hits = self._index_hits(
                    idx, mb.table, mb.query_vec, mb.k, vec_col=mb.vec_col
                )
            except UnroutableIndexError:
                # unroutable index (routed table lacks the manifest's id
                # column — r12 review): seq-scan like the top-k path does
                idx = None
        if idx is None:
            self.last_plan = "SEQ_SCAN"
            # ties break by the value column (deterministic in both paths
            # when value is the row id; the reference's own tests only
            # tolerance-assert tied sets, SURVEY §5)
            score = score_fn(F.col(mb.vec_col), mb.query_vec)
            hits = (
                base.where(F.col(mb.vec_col).isNotNull())
                .withColumn("dist", -score if mb.descending else score)
                .orderBy(F.col("dist").asc_nulls_last(), F.col(mb.value_col))
                .limit(mb.k)
            )
        # ordered list(value ORDER BY dist) over the k rows — the rewrite
        # target of hnsw_optimize_topk.cpp:175-184
        return hits.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("dist"), F.col(mb.value_col)))),
                lambda s: s[mb.value_col],
            ).alias(mb.alias)
        )

    # -- lateral top-k join -> index join ---------------------------------

    def _index_for_join(self, ml: LateralMatch | None):
        if ml is None:
            return None
        # prefer the graph index (the batched multi-query scan is HNSW's
        # ExecuteMultiScan shape); fall back to IVF's list-routed join.
        # ONLY these two families are lateral-capable here (r12 review):
        # the quantized artifacts' knn_join signatures differ and their
        # hits carry no inner payload columns, so a registered PQ/BQ
        # index must route laterals to the brute path, not crash.
        fallback = None
        for idx in self._indexes.get((ml.inner.lower(), ml.item_col.lower()), []):
            if idx.metric != ml.metric:
                continue
            kind = type(idx).__name__
            if kind == "HnswIndex":
                return idx
            if kind == "IvfIndex":
                fallback = fallback or idx
        return fallback

    @staticmethod
    def _lateral_rename_map(outer_cols, inner_cols) -> dict[str, str]:
        """Inner columns clashing with outer ones surface as
        ``item_<c>`` in the joined frame (the brute knn_join's
        _dedup_names convention, applied uniformly on both paths)."""
        oset = set(outer_cols)
        return {c: f"item_{c}" for c in inner_cols if c in oset}

    def _lateral_inner_exprs(
        self, ml: LateralMatch, inner_cols, ren: dict[str, str] | None = None
    ) -> list[str]:
        """Expand the lateral subquery's select list into expressions
        over the joined (outer + inner + dist) frame: ``*`` = the inner
        table's columns (DuckDB's lateral-star scope), alias qualifiers
        resolve through the collision renames, and the ORDER BY
        distance call maps to the computed ``dist`` column."""
        ren = ren or {}
        qual_call = re.compile(
            rf"\b{ml.fn}\s*\(\s*(?:"
            rf"{re.escape(ml.outer_alias)}\.{re.escape(ml.query_col)}\s*,\s*"
            rf"{re.escape(ml.inner_alias)}\.{re.escape(ml.item_col)}"
            rf"|{re.escape(ml.inner_alias)}\.{re.escape(ml.item_col)}\s*,\s*"
            rf"{re.escape(ml.outer_alias)}\.{re.escape(ml.query_col)}"
            rf")\s*\)",
            re.IGNORECASE,
        )
        bare_call = re.compile(
            rf"\b{ml.fn}\s*\(\s*(?:"
            rf"{re.escape(ml.query_col)}\s*,\s*{re.escape(ml.item_col)}"
            rf"|{re.escape(ml.item_col)}\s*,\s*{re.escape(ml.query_col)}"
            rf")\s*\)",
            re.IGNORECASE,
        )
        exprs: list[str] = []
        for item in self._split_top_level(ml.inner_cols):
            t = item.strip()
            if not t:
                continue
            if t == "*":
                exprs.extend(f"`{ren.get(c, c)}`" for c in inner_cols)
                continue
            t = qual_call.sub("dist", t)
            t = re.sub(
                rf"\b{re.escape(ml.inner_alias)}\.([A-Za-z_]\w*)",
                lambda mm: ren.get(mm.group(1), mm.group(1)),
                t,
                flags=re.IGNORECASE,
            )
            t = re.sub(
                rf"\b{re.escape(ml.outer_alias)}\.", "", t, flags=re.IGNORECASE
            )
            exprs.append(bare_call.sub("dist", t))
        return exprs

    def _project_lateral(
        self,
        ml: LateralMatch,
        out: DataFrame,
        outer_cols,
        inner_cols,
        ren: dict[str, str] | None = None,
    ) -> DataFrame:
        """The statement's output projection over the joined frame.
        ``SELECT *`` means outer.* then the SUBQUERY's select list (the
        reference's lateral scoping, hnsw_lateral_join.test:19-31);
        explicit select lists keep the engine's documented convenience
        of resolving any joined column (incl. ``dist``)."""
        if ml.cols == "*":
            exprs = [f"`{c}`" for c in outer_cols] + self._lateral_inner_exprs(
                ml, inner_cols, ren
            )
            return out.selectExpr(*exprs)
        # the outer select list may reference the SUBQUERY's own
        # aliases (hnsw_lateral_join_group.test:22 ``SELECT queries.id
        # as id, nbr`` over ``items.id as nbr``) — resolve them through
        # the inner list the same way the * expansion does (r15)
        amap: dict[str, str] = {}
        for e in self._lateral_inner_exprs(ml, inner_cols, ren):
            mm = re.match(
                r"^(.*\S)\s+AS\s+`?([A-Za-z_]\w*)`?\s*$",
                e,
                re.IGNORECASE | re.DOTALL,
            )
            if mm:
                amap[mm.group(2).lower()] = mm.group(1)
        def _sub_q(pattern: str, repl: str, text: str) -> str:
            # substitute only OUTSIDE single-quoted SQL literals
            # (review r15: a 'nbr=' literal must not have its alias
            # token rewritten) — split keeps the quoted spans at odd
            # indices, '' is the SQL escape for a literal quote
            parts = re.split(r"('(?:[^']|'')*')", text)
            return "".join(
                p if i % 2 else re.sub(pattern, repl, p, flags=re.IGNORECASE)
                for i, p in enumerate(parts)
            )

        exprs = []
        for c in self._split_top_level(ml.cols):
            t = c.strip()
            if not t:
                continue
            # strip table qualifiers token-wise (the joined frame is
            # unqualified) — NOT a blind split('.'), which mangled any
            # dotted reference inside a call like abs(queries.id)
            # (review r15)
            t = _sub_q(r"(?<![\w.`'])[A-Za-z_]\w*\.(?=[A-Za-z_])", "", t)
            for al, rexpr in amap.items():
                if t.lower() == al:
                    t = f"{rexpr} AS {al}"
                    break
                t = _sub_q(
                    rf"(?<![\w.`]){re.escape(al)}(?![\w(`])",
                    f"({rexpr})",
                    t,
                )
            exprs.append(t)
        return out.selectExpr(*exprs)

    def _run_lateral_brute(self, ml: LateralMatch) -> DataFrame:
        """No index: run the lateral intent through the brute-force
        crossjoin + window row_number ≤ k operator."""
        from duckdb_vss_spark.operators import knn_join

        self.last_plan = "SEQ_SCAN"
        outer = self.spark.table(ml.outer)
        inner = self.spark.table(ml.inner)
        ren = self._lateral_rename_map(outer.columns, inner.columns)
        inner_r = inner
        for c, n in ren.items():
            inner_r = inner_r.withColumnRenamed(c, n)
        qid = "__vss_qid__"
        q = outer.withColumn(qid, F.monotonically_increasing_id())
        joined = knn_join(
            q.select(qid, ml.query_col),
            inner_r,
            ml.query_col,
            ren.get(ml.item_col, ml.item_col),
            ml.k,
            metric=ml.metric,
        )
        out = joined.join(q.drop(ml.query_col), qid).drop(qid, "rn")
        return self._project_lateral(ml, out, outer.columns, inner.columns, ren)

    def _run_lateral_indexed(self, ml: LateralMatch, idx) -> DataFrame:
        """Rewrite to the batched index join (PhysicalHNSWIndexJoin's job,
        hnsw_optimize_join.cpp:33-170). Narrow: outputs every outer
        column (original names), every inner column, and ``dist`` —
        callers project from that, mirroring how the reference installs a
        new top projection (:572-689). NULL outer rows keep their k
        NULL-dist matches, the reference's lateral semantics (and the
        brute path's), so swapping an index in never changes the row
        set (hnsw_lateral_join.test's label comparisons)."""
        self.last_plan = self._marker(idx).replace("SCAN", "JOIN")
        outer = self.spark.table(ml.outer)
        # the FULL inner frame: an auto-rowid index is keyed on the
        # hidden __rowid the SQL view hides
        inner = self._table_frame(ml.inner)
        inner_cols = [c for c in inner.columns if c != "__rowid"]
        ren = self._lateral_rename_map(outer.columns, inner_cols)
        qid = "__vss_qid__"
        qv = "__vss_qvec__"  # a same-named query/item vec column would
        # be ambiguous inside the index join (queries.embedding vs
        # items.embedding in the reference's slow suite)
        q = outer.withColumn(qid, F.monotonically_increasing_id())
        qsel = q.select(qid, F.col(ml.query_col).alias(qv))
        if type(idx).__name__ == "IvfIndex":
            # IVF joins against its own inverted lists (same rows as the
            # registered table); route every query to its probed lists
            joined = idx.knn_join(qsel, qv, ml.k, qid)
        else:
            joined = idx.knn_join(
                qsel, inner, qv, ml.k, qid, keep_null_queries=True,
            )
        # the index join late-materializes with the ORIGINAL inner
        # names; apply the collision renames before rejoining the
        # FULL outer row (the join emits only the qid)
        for c, n in ren.items():
            if c in joined.columns:
                joined = joined.withColumnRenamed(c, n)
        out = joined.join(q, qid).drop(qid, "rn", "__rowid")
        return self._project_lateral(ml, out, outer.columns, inner_cols, ren)

    def _run_lateral_extract(self, region) -> DataFrame:
        """The general lateral rewrite (r14): materialize the
        ``FROM t, LATERAL (...)`` region to a view (outer.* + the
        subquery's select list, exactly DuckDB's lateral scoping) and
        re-run the ENCLOSING statement — aggregates, GROUP BYs and
        outer subqueries around a lateral parse as plain SQL over the
        view (the reference's slow suite shapes)."""
        ml, a, b, s = region
        idx = self._index_for_join(ml)
        view = (
            self._run_lateral_indexed(ml, idx)
            if idx is not None
            else self._run_lateral_brute(ml)
        )
        view.createOrReplaceTempView("__vss_lateral_x__")
        new_sql = s[:a] + " FROM __vss_lateral_x__ " + s[b:]
        ren = self._lateral_rename_map(
            self.spark.table(ml.outer).columns,
            [c for c in self._table_frame(ml.inner).columns if c != "__rowid"],
        )
        for al in {ml.outer_alias, ml.outer}:
            new_sql = re.sub(
                rf"\b{re.escape(al)}\.", "", new_sql, flags=re.IGNORECASE
            )
        for al in {ml.inner_alias, ml.inner}:
            new_sql = re.sub(
                rf"\b{re.escape(al)}\.([A-Za-z_]\w*)",
                lambda mm: ren.get(mm.group(1), mm.group(1)),
                new_sql,
                flags=re.IGNORECASE,
            )
        return self._raw_sql(translate_duckdb_functions(new_sql))
