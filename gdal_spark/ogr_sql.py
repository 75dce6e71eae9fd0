"""OGR SQL dialect on Spark: ExecuteSQL semantics with OGR's quirks.

The reference's SQL path (SURVEY.md §3a): swq parser (ogr/swq_parser.y)
-> swq_select IR -> OGRGenSQLResultsLayer executor
(ogr/ogrsf_frmts/generic/ogr_gensql.cpp). On Spark the pipeline IS
Catalyst; this module implements only the semantic deltas:

  * OGR null propagation: ANY operator except IS NULL / IN with a
    NULL operand yields NULL — INCLUDING AND/OR/NOT
    (ogr/swq_op_general.cpp SWQGeneralEvaluator null loop ~345-375),
    so `TRUE OR NULL` is NULL in OGR but TRUE in SQL/Spark. Compiled
    as: when(any operand null, null).otherwise(op).
  * JOIN takes exactly the FIRST matching secondary feature in FID
    order, 1:1 never 1:N (ogr_gensql.cpp:1515-1546).
  * Summary queries: aggregates without GROUP BY collapse to one row
    (SWQM_SUMMARY_RECORD, ogr_swq.h:320); OGR SQL has no GROUP BY.
  * SELECT DISTINCT col is a distinct-list query mode
    (SWQM_DISTINCT_LIST).
  * LIKE is case-SENSITIVE (matching Spark); ILIKE case-insensitive.
  * SUBSTR(s, start[, len]) with negative start counting from the end
    (ogr_sql_dialect.rst:166-169) — Spark substring already matches.
  * Special fields FID, OGR_GEOM_AREA, OGR_GEOMETRY, OGR_GEOM_WKT
    (ogr/ogrfeaturequery.cpp:37-38) resolve to engine columns.
  * LIMIT n OFFSET m (swq_parser.y:1129,1137).

`execute(spark, sql, layers, dialect=...)`:
  dialect="SQLITE" — the reference's escape hatch to a full SQL
  engine (gcore/gdaldataset.cpp:7418): register layers as temp views
  and hand the text to spark.sql() unchanged.
  dialect="OGRSQL" — parse the supported grammar and build the
  DataFrame plan with the deltas above.

Grammar subset (recursive descent; the reference grammar is
swq_parser.y:826-1140): single-table SELECT with optional JOINs on
equality, WHERE, ORDER BY, LIMIT/OFFSET, DISTINCT, summary
aggregates MIN/MAX/AVG/SUM/COUNT(*|[DISTINCT] col),
STDDEV_POP/STDDEV_SAMP. UNION ALL of selects.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

AGG_FUNCS = {"MIN", "MAX", "AVG", "SUM", "COUNT", "STDDEV_POP", "STDDEV_SAMP"}

# ---------------------------------------------------------------------------
# tokenizer

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>\d+\.\d*|\.\d+|\d+)
      | (?P<str>'(?:[^']|'')*')
      | (?P<id>"[^"]+"|[A-Za-z_][A-Za-z_0-9.]*)
      | (?P<op><>|<=|>=|!=|\|\||[(),*=<>+\-/%])
    )""",
    re.VERBOSE,
)


def tokenize(sql: str) -> list[str]:
    out = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            if sql[pos:].strip() == "":
                break
            raise ValueError(f"OGR SQL: cannot tokenize at {sql[pos:pos+20]!r}")
        out.append(m.group(0).strip())
        pos = m.end()
    return out


# ---------------------------------------------------------------------------
# expression AST


@dataclass
class Node:
    op: str  # 'col' | 'lit' | 'func' | binary/unary operator name
    args: list = field(default_factory=list)
    value: object = None


class Parser:
    """Recursive-descent parser for the swq expression + select
    grammar subset (reference: ogr/swq_parser.y)."""

    def __init__(self, tokens: list[str]) -> None:
        self.toks = tokens
        self.i = 0

    def peek(self, k: int = 0) -> str | None:
        return self.toks[self.i + k] if self.i + k < len(self.toks) else None

    def peek_u(self, k: int = 0) -> str | None:
        t = self.peek(k)
        return t.upper() if t is not None else None

    def next(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, word: str) -> None:
        t = self.next()
        if t.upper() != word.upper():
            raise ValueError(f"OGR SQL: expected {word}, got {t}")

    def accept(self, word: str) -> bool:
        if self.peek_u() == word.upper():
            self.i += 1
            return True
        return False

    # -- expressions (precedence: OR < AND < NOT < cmp < add < mul) --

    def expr(self) -> Node:
        n = self.and_expr()
        while self.accept("OR"):
            n = Node("OR", [n, self.and_expr()])
        return n

    def and_expr(self) -> Node:
        n = self.not_expr()
        while self.accept("AND"):
            n = Node("AND", [n, self.not_expr()])
        return n

    def not_expr(self) -> Node:
        if self.accept("NOT"):
            return Node("NOT", [self.not_expr()])
        return self.cmp_expr()

    def cmp_expr(self) -> Node:
        n = self.add_expr()
        t = self.peek_u()
        if t in ("=", "<>", "!=", "<", "<=", ">", ">="):
            op = self.next()
            return Node("CMP", [n, self.add_expr()], value="<>" if op == "!=" else op)
        if t == "IS":
            self.next()
            neg = self.accept("NOT")
            self.expect("NULL")
            node = Node("ISNULL", [n])
            return Node("NOT", [node]) if neg else node
        neg = False
        if t == "NOT":
            # NOT LIKE / NOT IN / NOT BETWEEN
            self.next()
            neg = True
            t = self.peek_u()
        if t in ("LIKE", "ILIKE"):
            self.next()
            node = Node(t, [n, self.add_expr()])
            if self.accept("ESCAPE"):
                node.args.append(self.add_expr())
            return Node("NOT", [node]) if neg else node
        if t == "IN":
            self.next()
            self.expect("(")
            items = [self.expr()]
            while self.accept(","):
                items.append(self.expr())
            self.expect(")")
            node = Node("IN", [n, *items])
            return Node("NOT", [node]) if neg else node
        if t == "BETWEEN":
            self.next()
            lo = self.add_expr()
            self.expect("AND")
            hi = self.add_expr()
            node = Node("BETWEEN", [n, lo, hi])
            return Node("NOT", [node]) if neg else node
        if neg:
            raise ValueError("OGR SQL: dangling NOT")
        return n

    def add_expr(self) -> Node:
        n = self.mul_expr()
        while self.peek() in ("+", "-") or self.peek_u() == "||":
            op = self.next()
            n = Node("CONCAT" if op == "||" else op, [n, self.mul_expr()])
        return n

    def mul_expr(self) -> Node:
        n = self.unary_expr()
        while self.peek() in ("*", "/", "%"):
            op = self.next()
            n = Node(op, [n, self.unary_expr()])
        return n

    def unary_expr(self) -> Node:
        if self.peek() == "-":
            self.next()
            return Node("NEG", [self.unary_expr()])
        return self.primary()

    def primary(self) -> Node:
        t = self.peek()
        if t is None:
            raise ValueError("OGR SQL: unexpected end")
        if t == "(":
            self.next()
            n = self.expr()
            self.expect(")")
            return n
        if re.match(r"^\d|^\.", t):
            self.next()
            return Node("lit", value=float(t) if ("." in t) else int(t))
        if t.startswith("'"):
            self.next()
            return Node("lit", value=t[1:-1].replace("''", "'"))
        up = t.upper()
        if up == "NULL":
            self.next()
            return Node("lit", value=None)
        if up == "CAST":
            self.next()
            self.expect("(")
            inner = self.expr()
            self.expect("AS")
            typ = self.next().upper()
            # swallow width/precision: character(n), numeric(w,p)
            if self.accept("("):
                while self.peek() != ")":
                    self.next()
                self.expect(")")
            self.expect(")")
            return Node("CAST", [inner], value=typ)
        # function call or column
        if self.peek(1) == "(":
            name = self.next().upper()
            self.expect("(")
            args: list[Node] = []
            distinct = False
            if name == "COUNT" and self.accept("*"):
                pass
            else:
                if self.accept("DISTINCT"):
                    distinct = True
                if self.peek() != ")":
                    args.append(self.expr())
                    while self.accept(","):
                        args.append(self.expr())
            self.expect(")")
            return Node("func", args, value=(name, distinct))
        name = self.next()
        if name.startswith('"'):
            name = name[1:-1]
        return Node("col", value=name)


# ---------------------------------------------------------------------------
# compile AST -> Column with OGR null semantics

SPECIAL_FIELDS = {
    # special field -> engine column (ogr/ogrfeaturequery.cpp:37-38)
    "FID": "_id",
    "OGR_GEOM_WKT": "wkt",
}


def _null_any(cols: list[Column]) -> Column:
    cond = cols[0].isNull()
    for c in cols[1:]:
        cond = cond | c.isNull()
    return cond


def _ogr_wrap(result: Column, operands: list[Column]) -> Column:
    """OGR's evaluator: any NULL operand -> NULL result, for EVERY
    operator except IS NULL and IN (swq_op_general.cpp ~345-375)."""
    return F.when(_null_any(operands), F.lit(None)).otherwise(result)


def compile_expr(node: Node, df: DataFrame) -> Column:
    if node.op == "lit":
        return F.lit(node.value)
    if node.op == "col":
        name = node.value
        mapped = SPECIAL_FIELDS.get(name.upper(), name)
        if name.upper() == "OGR_GEOM_AREA":
            # exact planar geometry area (ogrfeaturequery.cpp:37
            # special field; shoelace exterior-minus-holes like
            # OGRGeometry::get_Area — NOT the envelope area)
            from gdal_spark.operators.st_funcs import st_area

            return st_area(F.col("wkt"))
        if name.upper() == "OGR_GEOMETRY":
            # flat geometry type name usable in WHERE
            # (ogrfeaturequery.cpp:37; e.g. OGR_GEOMETRY = 'POLYGON')
            return F.regexp_extract(F.col("wkt"), r"^\s*([A-Za-z]+)", 1)
        if name.upper() == "OGR_STYLE":
            # style strings have no representation in the span model;
            # every feature reports the no-style state (NULL), matching
            # a styleless OGR layer
            return F.lit(None).cast("string")
        return df[mapped] if mapped in df.columns else F.col(mapped)
    if node.op in ("AND", "OR"):
        a, b = (compile_expr(x, df) for x in node.args)
        raw = (a & b) if node.op == "AND" else (a | b)
        return _ogr_wrap(raw, [a, b])
    if node.op == "NOT":
        a = compile_expr(node.args[0], df)
        return _ogr_wrap(~a, [a])
    if node.op == "CMP":
        a, b = (compile_expr(x, df) for x in node.args)
        return {"=": a == b, "<>": a != b, "<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[node.value]
    if node.op == "ISNULL":
        return compile_expr(node.args[0], df).isNull()
    if node.op in ("LIKE", "ILIKE"):
        a, b = (compile_expr(x, df) for x in node.args[:2])
        if len(node.args) == 3:
            # ESCAPE clause via SQL text (Column API has no escape arg)
            esc = compile_expr(node.args[2], df)
            kw = "ILIKE" if node.op == "ILIKE" else "LIKE"
            return _ogr_wrap(F.expr(f"{_sql_of(a)} {kw} {_sql_of(b)} ESCAPE {_sql_of(esc)}"), [a, b])
        # Column.like/ilike require a literal python string pattern
        pat = node.args[1]
        if pat.op == "lit" and isinstance(pat.value, str):
            return a.like(pat.value) if node.op == "LIKE" else a.ilike(pat.value)
        kw = "ILIKE" if node.op == "ILIKE" else "LIKE"
        return _ogr_wrap(F.expr(f"{_sql_of(a)} {kw} {_sql_of(b)}"), [a, b])
    if node.op == "IN":
        a = compile_expr(node.args[0], df)
        return a.isin(*[compile_expr(x, df) for x in node.args[1:]])
    if node.op == "BETWEEN":
        a, lo, hi = (compile_expr(x, df) for x in node.args)
        return _ogr_wrap((a >= lo) & (a <= hi), [a, lo, hi])
    if node.op in ("+", "-", "*", "/", "%"):
        a, b = (compile_expr(x, df) for x in node.args)
        raw = {"+": a + b, "-": a - b, "*": a * b, "/": a / b, "%": a % b}[node.op]
        return raw  # SQL arithmetic already null-propagates
    if node.op == "NEG":
        return -compile_expr(node.args[0], df)
    if node.op == "CONCAT":
        a, b = (compile_expr(x, df) for x in node.args)
        return _ogr_wrap(F.concat(a.cast("string"), b.cast("string")), [a, b])
    if node.op == "CAST":
        inner = compile_expr(node.args[0], df)
        typ = {
            "CHARACTER": "string", "INTEGER": "int", "BIGINT": "bigint", "SMALLINT": "smallint",
            "FLOAT": "double", "NUMERIC": "double", "TIMESTAMP": "timestamp", "DATE": "date",
            "TIME": "string", "BOOLEAN": "boolean",
        }.get(node.value, "string")
        return inner.cast(typ)
    if node.op == "func":
        name, distinct = node.value
        args = [compile_expr(x, df) for x in node.args]
        if name in AGG_FUNCS:
            raise ValueError("aggregate in scalar context")
        if name == "SUBSTR" or name == "SUBSTRING":
            # OGR: 1-based; negative start counts from the end
            # (ogr_sql_dialect.rst:166-169). Spark substring matches.
            length = args[2] if len(args) > 2 else F.lit(2147483647)
            return _ogr_wrap(F.expr(f"substring({_sql_of(args[0])}, {_sql_of(args[1])}, {_sql_of(length)})"), args)
        if name == "CONCAT":
            return _ogr_wrap(F.concat(*[a.cast("string") for a in args]), args)
        if name == "HSTORE_GET_VALUE":
            # ogr/swq_op_general.cpp SWQ_HSTORE_GET_VALUE: 'k=>v,...'
            m = F.str_to_map(F.regexp_replace(args[0], "=>", ":"), F.lit(","), F.lit(":"))
            return F.element_at(m, args[1])
        raise ValueError(f"OGR SQL: unsupported function {name}")
    raise ValueError(f"OGR SQL: cannot compile {node.op}")


def _sql_of(col: Column) -> str:
    # render a Column back to SQL text for the few expr() escapes
    return col._jc.toString()  # noqa: SLF001


def _is_agg(node: Node) -> bool:
    return node.op == "func" and node.value[0] in AGG_FUNCS


def _compile_agg(node: Node, df: DataFrame) -> Column:
    name, distinct = node.value
    if name == "COUNT" and not node.args:
        return F.count(F.lit(1))
    arg = compile_expr(node.args[0], df)
    if name == "COUNT":
        return F.countDistinct(arg) if distinct else F.count(arg)
    fn = {"MIN": F.min, "MAX": F.max, "AVG": F.avg, "SUM": F.sum,
          "STDDEV_POP": F.stddev_pop, "STDDEV_SAMP": F.stddev_samp}[name]
    return fn(arg)


def _default_name(node: Node, idx: int) -> str:
    if node.op == "col":
        return node.value.split(".")[-1]
    if node.op == "func":
        base = node.value[0]
        inner = node.args[0].value if node.args and node.args[0].op == "col" else "*"
        return f"{base}_{inner}".lower()
    return f"field_{idx + 1}"


# ---------------------------------------------------------------------------
# SELECT executor


def compile_where(expr_text: str, df: DataFrame) -> Column:
    """Compile a bare OGR WHERE expression (SetAttributeFilter,
    ogrlayer.cpp:752) to a Column with OGR null semantics — the -where
    entry point for vector_translate."""
    node = Parser(tokenize(expr_text)).expr()
    return compile_expr(node, df)


def execute(
    spark: SparkSession,
    sql: str,
    layers: dict[str, DataFrame],
    dialect: str = "OGRSQL",
) -> DataFrame:
    """ExecuteSQL (gcore/gdaldataset.cpp:7401) over DataFrames."""
    if dialect.upper() == "SQLITE":
        # reference behavior: full SQL engine over the layers
        # (ogrsqliteexecutesql.cpp) == Spark SQL over temp views
        for name, df in layers.items():
            df.createOrReplaceTempView(name)
        return spark.sql(sql)

    selects = _split_union_all(tokenize(sql))
    out = None
    for toks in selects:
        df = _execute_one(Parser(toks), layers)
        out = df if out is None else out.unionAll(df)
    return out


def _split_union_all(toks: list[str]) -> list[list[str]]:
    parts: list[list[str]] = [[]]
    depth = 0
    i = 0
    while i < len(toks):
        t = toks[i]
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        if depth == 0 and t.upper() == "UNION" and i + 1 < len(toks) and toks[i + 1].upper() == "ALL":
            parts.append([])
            i += 2
            continue
        parts[-1].append(t)
        i += 1
    return parts


def _execute_one(p: Parser, layers: dict[str, DataFrame]) -> DataFrame:
    p.expect("SELECT")
    distinct = p.accept("DISTINCT")

    # select list (parse AFTER from-binding? OGR binds by table; we
    # parse nodes now, compile after the FROM is known)
    items: list[tuple[Node | str, str | None]] = []
    while True:
        if p.peek() == "*":
            p.next()
            items.append(("*", None))
        else:
            node = p.expr()
            alias = None
            if p.accept("AS"):
                alias = p.next().strip('"')
            elif p.peek_u() not in (None, "FROM", ",") and re.match(r"^[A-Za-z_\"]", p.peek() or ""):
                alias = p.next().strip('"')
            items.append((node, alias))
        if not p.accept(","):
            break

    p.expect("FROM")
    base_name = p.next().strip('"')
    if p.peek_u() not in (None, "JOIN", "LEFT", "WHERE", "ORDER", "LIMIT", "OFFSET"):
        p.next()  # table alias (ignored; single-table subset)
    df = layers[base_name]

    # JOINs: first-match semantics (ogr_gensql.cpp:1515-1546)
    while p.peek_u() in ("JOIN", "LEFT"):
        left_outer = p.accept("LEFT")
        p.expect("JOIN")
        sec_name = p.next().strip('"')
        p.expect("ON")
        a = p.next()  # tbl.col or col
        p.expect("=")
        b = p.next()
        lcol, rcol = _join_cols(a, b, base_name, sec_name)
        sec = layers[sec_name]
        w = Window.partitionBy(rcol).orderBy(sec.columns[0])
        first = sec.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
        # name collisions: secondary fields take a table prefix
        # (OGR result layers expose them as "secondary.field"); the
        # equal join key is dropped outright
        for c in first.columns:
            if c == rcol and c in df.columns:
                continue
            if c in df.columns:
                first = first.withColumnRenamed(c, f"{sec_name}_{c}")
        how = "left" if left_outer else "inner"
        joined = df.join(F.broadcast(first), df[lcol] == first[rcol], how)
        df = joined.drop(first[rcol]) if rcol in df.columns or rcol != lcol else joined

    where = p.expr() if p.accept("WHERE") else None

    order_by: list[tuple[Node, bool]] = []
    if p.accept("ORDER"):
        p.expect("BY")
        while True:
            n = p.expr()
            asc = True
            if p.accept("DESC"):
                asc = False
            else:
                p.accept("ASC")
            order_by.append((n, asc))
            if not p.accept(","):
                break

    limit = offset = None
    if p.accept("LIMIT"):
        limit = int(p.next())
    if p.accept("OFFSET"):
        offset = int(p.next())

    if where is not None:
        df = df.filter(compile_expr(where, df))

    is_summary = any(isinstance(n, Node) and _is_agg(n) for n, _ in items)
    if is_summary:
        # SWQM_SUMMARY_RECORD: one row; NULL fields skipped by the
        # aggregates themselves (Spark aggregates skip nulls too,
        # matching ogr_gensql.cpp:1007 IsFieldSetAndNotNull)
        aggs = []
        for idx, (n, alias) in enumerate(items):
            if not isinstance(n, Node) or not _is_agg(n):
                raise ValueError("OGR SQL: mixed scalar/aggregate select")
            aggs.append(_compile_agg(n, df).alias(alias or _default_name(n, idx)))
        df = df.agg(*aggs)
    else:
        cols = []
        for idx, (n, alias) in enumerate(items):
            if n == "*":
                cols.append(F.col("*"))
            else:
                cols.append(compile_expr(n, df).alias(alias or _default_name(n, idx)))
        df = df.select(*cols)
        if distinct:
            df = df.distinct()

    if order_by:
        df = df.orderBy(
            *[(compile_expr(n, df).asc() if asc else compile_expr(n, df).desc()) for n, asc in order_by]
        )
    if offset:
        df = df.offset(offset)
    if limit is not None:
        df = df.limit(limit)
    return df


def _join_cols(a: str, b: str, base: str, sec: str) -> tuple[str, str]:
    def split(t: str) -> tuple[str | None, str]:
        return (t.split(".", 1)[0], t.split(".", 1)[1]) if "." in t else (None, t)

    ta, ca = split(a)
    tb, cb = split(b)
    if ta == sec or tb == base:
        return cb, ca
    return ca, cb
