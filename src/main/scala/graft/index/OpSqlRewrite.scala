package graft.index

/**
 * Reference-dialect operator rewrite for SQL text — the last mile of
 * pgvecto.rs SQL compatibility (every reference query spells search as
 * `ORDER BY val <-> '[...]'` / `val <<->> sphere(...)`:
 * tests/sqllogictest/vector.slt:1-40, pushdown_plan.slt,
 * src/sql/finalize.sql:408-574). Spark's grammar has no user-defined
 * operators, so [[GraftSqlParser]] runs this token-level rewrite over
 * every statement BEFORE delegating:
 *
 *   `a <-> b`   -> `graft_op_l2(a, b)`        l2sq (bvector: hamming)
 *   `a <#> b`   -> `graft_op_dot(a, b)`       negative dot
 *   `a <=> b`   -> `graft_op_cos(a, b)`       cosine distance
 *   `a <~> b`   -> `graft_op_jaccard(a, b)`   bvector jaccard
 *   `v <<->> s` -> `graft_sphere_l2(v, s)`    sphere predicates
 *   `v <<#>> s` / `v <<=>> s` / `v <<~>> s`   (dot / cos / jaccard)
 *   `x::vector` -> `parse_vector(x)`          (and ::svector /
 *   ::bvector / ::vecf16 via their parsers — the literal-cast spelling)
 *
 * The functions are [[graft.functions.OpDist]] /
 * [[graft.functions.SphereIn]] — type-dispatching RuntimeReplaceables,
 * so by optimization time the plan carries the exact kernel shapes the
 * ANN pushdown arms match: reference queries run verbatim AND push
 * down. `<=>` (Spark's null-safe equality) keeps its Spark meaning on
 * non-vector operands via the dispatch fallback.
 *
 * The rewrite is a real tokenizer, not a regex: operator tokens inside
 * string literals, quoted identifiers, or comments are never touched.
 * Operand capture takes the adjacent primary expression — an identifier
 * chain (`t.val`), a literal, a function call, or a parenthesized /
 * bracketed group — which covers every reference spelling; an operator
 * whose operand can't be delimited throws a clear error (the delegate
 * parser could only produce an opaque one: no Spark grammar accepts
 * these tokens), except `<=>`, which is left for Spark to parse.
 */
object OpSqlRewrite {
  // token kinds
  private final val WS = 0      // whitespace + comments
  private final val STR = 1     // '...' or "..." literal
  private final val IDENT = 2   // identifier, `quoted`, or a spliced call
  private final val NUM = 3
  private final val OP = 4      // one of the 8 graft operators
  private final val SYM = 5     // anything else (single char, or ::)

  private case class Tok(kind: Int, text: String)

  /** Longest-match graft operators, tried in order at each '<'. */
  private val Ops: Seq[(String, String)] = Seq(
    "<<->>" -> "graft_sphere_l2",
    "<<#>>" -> "graft_sphere_dot",
    "<<=>>" -> "graft_sphere_cos",
    "<<~>>" -> "graft_sphere_jaccard",
    "<->" -> "graft_op_l2",
    "<#>" -> "graft_op_dot",
    "<=>" -> "graft_op_cos",
    "<~>" -> "graft_op_jaccard")

  // each target dispatches the full CAST MATRIX by operand type
  // (graft.functions.CastDispatch): string literals parse, vector
  // operands convert, numeric arrays take the real[]->vector implicit
  private val CastFns: Map[String, String => String] = Map(
    "vector" -> (p => s"graft_cast_vector($p)"),
    "svector" -> (p => s"graft_cast_svector($p)"),
    "bvector" -> (p => s"graft_cast_bvector($p)"),
    "vecf16" -> (p => s"graft_cast_vecf16($p)"))

  /** Keywords that must not be absorbed as a call name when a
    * parenthesized group is captured backward (`WHERE (a+b) <-> q`) or
    * taken as a bare operand. NULL/TRUE/FALSE are deliberately absent:
    * they are literal primaries (`SELECT NULL::vector <-> ...` is a
    * null.slt spelling and must capture). */
  private val Keywords: Set[String] = Set(
    "select", "from", "where", "and", "or", "not", "on", "join", "inner",
    "left", "right", "full", "cross", "outer", "group", "order", "by",
    "having", "limit", "union", "all", "distinct", "as", "when", "then",
    "else", "end", "case", "in", "like", "rlike", "ilike", "between",
    "is", "values", "over", "partition", "range",
    "rows", "exists", "any", "some", "interval", "escape", "div")

  /** PG array-typed casts (`::real[]`, the slt INSERT spelling) →
    * Spark element types. */
  private val PgArrayElems: Map[String, String] = Map(
    "real" -> "FLOAT", "float4" -> "FLOAT",
    "float8" -> "DOUBLE", "double" -> "DOUBLE",
    "int" -> "INT", "int4" -> "INT", "integer" -> "INT",
    "int8" -> "BIGINT", "bigint" -> "BIGINT",
    "int2" -> "SMALLINT", "smallint" -> "SMALLINT",
    "text" -> "STRING", "varchar" -> "STRING",
    "numeric" -> "DECIMAL(38, 18)")

  /** PG SCALAR type names Spark's own `::` cast grammar lacks
    * (`RANDOM()::numeric`, bvector.slt) → Spark types. Names Spark
    * already accepts (int, bigint, float, string, …) are left for the
    * delegate. */
  private val PgScalarTypes: Map[String, String] = Map(
    "numeric" -> "DECIMAL(38, 18)",
    "real" -> "FLOAT", "float4" -> "FLOAT", "float8" -> "DOUBLE",
    "int2" -> "SMALLINT", "int4" -> "INT", "int8" -> "BIGINT")

  /** Fast path: statements without any operator/cast spelling skip the
    * tokenizer entirely. The four 3-char cores cover the sphere forms
    * too (`<<->>` contains `<->`, etc.); `ARRAY[` catches the PG array
    * constructor the slt INSERTs use. */
  def apply(sql: String): String =
    if (sql == null || !(sql.contains("<->") || sql.contains("<#>") ||
        sql.contains("<=>") || sql.contains("<~>") || sql.contains("::") ||
        (sql.contains("[") && (sql.contains(":") ||
          sql.toLowerCase.contains("array")))))
      sql
    else rewrite(sql)

  private def rewrite(sql: String): String = {
    var toks = lex(sql)
    toks = rewriteArrayCtor(toks)
    toks = rewriteCasts(toks)
    toks = rewriteSlices(toks)
    toks = rewriteOps(toks)
    toks.iterator.map(_.text).mkString
  }

  /** The reference's COLUMN TYPE spellings in CREATE/REPLACE TABLE text
    * (`val vector(3)`, every slt file's setup) -> the Spark storage
    * types ([[graft.types.VectorTypes]]). Token-level — string
    * literals/comments untouched; applied by [[GraftSqlParser]] only to
    * table-DDL statements, so a function named `vector` elsewhere is
    * never touched. The DIMS are dropped: dimensions here are enforced
    * by the kernels and index builds, not the column type (documented
    * divergence — the reference's typmod check happens at INSERT). */
  private val TableTypeMap: Map[String, String] = Map(
    "vector" -> "ARRAY<FLOAT>",
    "vecf16" -> "ARRAY<FLOAT>",
    "svector" -> "STRUCT<dims: INT, indexes: ARRAY<INT>, values: ARRAY<FLOAT>>",
    "bvector" -> "STRUCT<dims: INT, words: ARRAY<BIGINT>>")

  def tableTypes(sql: String): String = {
    if (sql == null || !TableTypeMap.keysIterator.exists(sql.toLowerCase.contains))
      return sql
    var toks = lex(sql)
    var i = 0
    while (i < toks.length) {
      // NOT after '::' — a `'[...]'::vector(3)` cast inside a CTAS body
      // belongs to rewriteCasts (which swallows the dims); flipping the
      // TYPE of the cast here would strip the graft cast semantics.
      // NOT after a bare `AS` either — `CAST(x AS vector(3))` rewritten
      // to a plain array cast would silently NULL the column; left
      // alone it fails loudly (unsupported datatype — spell the cast
      // `::vector`, the reference's own slt spelling). A column cannot
      // be NAMED bare `as` (reserved; the backquoted spelling lexes
      // with its quotes), so column definitions never hit this guard.
      if (toks(i).kind == IDENT &&
          TableTypeMap.contains(toks(i).text.toLowerCase) && {
            val p = prevIdx(toks, i)
            !(p >= 0 && ((toks(p).kind == SYM && toks(p).text == "::") ||
              (toks(p).kind == IDENT &&
                toks(p).text.equalsIgnoreCase("as"))))
          }) {
        val open = nextIdx(toks, i)
        if (open < toks.length && toks(open).kind == SYM &&
            toks(open).text == "(") {
          val num = nextIdx(toks, open)
          val cls = if (num < toks.length) nextIdx(toks, num) else -1
          if (num < toks.length && toks(num).kind == NUM &&
              cls < toks.length && toks(cls).kind == SYM &&
              toks(cls).text == ")") {
            toks = toks.take(i) ++
              Vector(Tok(IDENT, TableTypeMap(toks(i).text.toLowerCase))) ++
              toks.drop(cls + 1)
          }
        }
      }
      i += 1
    }
    toks.iterator.map(_.text).mkString
  }

  /** The reference's stat VIEW spelling — `FROM pg_vector_index_stat`
    * (finalize.sql:807, queried bare by tests/sealing/check.slt). Here
    * the listing is a table FUNCTION resolved fresh per analysis, so a
    * bare identifier (next token not `(`) gains the call parens.
    * Token-level: string literals and comments are never touched; an
    * already-called `pg_vector_index_stat()` passes through, and so do
    * DOT-adjacent spellings (round-17 advice): a table-qualified column
    * reference `pg_vector_index_stat.indexname` must stay an identifier
    * chain, and a schema-qualified `public.pg_vector_index_stat` gains
    * nothing from parens Spark cannot resolve on a qualified function
    * name. For the qualifier to RESOLVE, the FROM/JOIN-position rewrite
    * self-aliases (`pg_vector_index_stat() AS pg_vector_index_stat`) —
    * Spark does not name a TVF relation after its function — unless the
    * user supplied their own alias (next token a non-clause
    * identifier, or AS). */
  def statView(sql: String): String = {
    if (sql == null || !sql.toLowerCase.contains("pg_vector_index_stat"))
      return sql
    // clause keywords that can follow a FROM item — NOT user aliases
    val clause = Set("where", "group", "order", "limit", "having", "union",
      "except", "intersect", "join", "inner", "left", "right", "full",
      "cross", "natural", "on", "using", "qualify", "window")
    var toks = lex(sql)
    var i = 0
    while (i < toks.length) {
      if (toks(i).kind == IDENT &&
          toks(i).text.equalsIgnoreCase("pg_vector_index_stat")) {
        val nxt = nextIdx(toks, i)
        def dotAt(j: Int) = j >= 0 && j < toks.length &&
          toks(j).kind == SYM && toks(j).text == "."
        val prv = { var j = i - 1; while (j >= 0 && toks(j).kind == WS) j -= 1; j }
        if (!(nxt < toks.length && toks(nxt).kind == SYM &&
            toks(nxt).text == "(") && !dotAt(nxt) && !dotAt(prv)) {
          val fromPos = prv >= 0 && toks(prv).kind == IDENT &&
            (toks(prv).text.equalsIgnoreCase("from") ||
              toks(prv).text.equalsIgnoreCase("join"))
          val userAlias = nxt < toks.length && toks(nxt).kind == IDENT &&
            (toks(nxt).text.equalsIgnoreCase("as") ||
              !clause.contains(toks(nxt).text.toLowerCase))
          val rewritten =
            if (fromPos && !userAlias)
              toks(i).text + "() AS " + toks(i).text
            else toks(i).text + "()"
          toks = toks.updated(i, Tok(IDENT, rewritten))
        }
      }
      i += 1
    }
    toks.iterator.map(_.text).mkString
  }

  // ---------------------------------------------------------- lexer
  private def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    val n = s.length
    var i = 0
    def run(from: Int, p: Char => Boolean): Int = {
      var j = from; while (j < n && p(s.charAt(j))) j += 1; j
    }
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) {
        val j = run(i, _.isWhitespace); out += Tok(WS, s.substring(i, j)); i = j
      } else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        var j = i; while (j < n && s.charAt(j) != '\n') j += 1
        out += Tok(WS, s.substring(i, j)); i = j
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        val e = s.indexOf("*/", i + 2)
        val j = if (e < 0) n else e + 2
        out += Tok(WS, s.substring(i, j)); i = j
      } else if (c == '\'' || c == '"') {
        // Spark string literal: backslash escapes + doubled-quote escape
        var j = i + 1
        var done = false
        while (j < n && !done) {
          val cj = s.charAt(j)
          if (cj == '\\' && j + 1 < n) j += 2
          else if (cj == c) {
            if (j + 1 < n && s.charAt(j + 1) == c) j += 2 else { done = true; j += 1 }
          } else j += 1
        }
        out += Tok(STR, s.substring(i, j)); i = j
      } else if (c == '`') {
        var j = i + 1
        var done = false
        while (j < n && !done) {
          if (s.charAt(j) == '`') {
            if (j + 1 < n && s.charAt(j + 1) == '`') j += 2 else { done = true; j += 1 }
          } else j += 1
        }
        out += Tok(IDENT, s.substring(i, j)); i = j
      } else if (c.isLetter || c == '_') {
        val j = run(i, ch => ch.isLetterOrDigit || ch == '_')
        out += Tok(IDENT, s.substring(i, j)); i = j
      } else if (c.isDigit || (c == '.' && i + 1 < n && s.charAt(i + 1).isDigit)) {
        var j = run(i, ch => ch.isDigit || ch == '.')
        if (j < n && (s.charAt(j) == 'e' || s.charAt(j) == 'E')) {
          var k = j + 1
          if (k < n && (s.charAt(k) == '+' || s.charAt(k) == '-')) k += 1
          val k2 = run(k, _.isDigit)
          if (k2 > k) j = k2
        }
        // type-suffix letters (1L, 2.5D, 3BD, 4S, 5Y)
        j = run(j, _.isLetter)
        out += Tok(NUM, s.substring(i, j)); i = j
      } else if (c == '<') {
        Ops.find { case (op, _) => s.regionMatches(i, op, 0, op.length) } match {
          case Some((op, _)) => out += Tok(OP, op); i += op.length
          case None => out += Tok(SYM, c.toString); i += 1
        }
      } else if (c == ':' && i + 1 < n && s.charAt(i + 1) == ':') {
        out += Tok(SYM, "::"); i += 2
      } else {
        out += Tok(SYM, c.toString); i += 1
      }
    }
    out.result()
  }

  // --------------------------------------------- operand delimiting
  private def prevIdx(toks: Vector[Tok], from: Int): Int = {
    var j = from - 1; while (j >= 0 && toks(j).kind == WS) j -= 1; j
  }
  private def nextIdx(toks: Vector[Tok], from: Int): Int = {
    var j = from + 1; while (j < toks.length && toks(j).kind == WS) j += 1; j
  }
  private def isOpen(t: Tok) = t.kind == SYM && (t.text == "(" || t.text == "[")
  private def isClose(t: Tok) = t.kind == SYM && (t.text == ")" || t.text == "]")

  /** Start index of the primary expression ending AT `end` (inclusive).
    * -1 when no primary can be delimited. */
  private def backPrimary(toks: Vector[Tok], end: Int): Int = {
    var start = end
    toks(end) match {
      case Tok(STR | NUM, _) => // single token primary
      case Tok(IDENT, t) =>
        if (Keywords.contains(t.toLowerCase)) return -1
      case t if isClose(t) =>
        var depth = 0
        var j = end
        while (j >= 0) {
          if (isClose(toks(j))) depth += 1
          else if (isOpen(toks(j))) { depth -= 1; if (depth == 0) { start = j; j = -1 } }
          if (j >= 0) j -= 1
        }
        if (depth != 0) return -1
        // function call / array index: absorb a preceding identifier
        val p = prevIdx(toks, start)
        if (p >= 0 && toks(p).kind == IDENT &&
            !Keywords.contains(toks(p).text.toLowerCase)) start = p
      case _ => return -1
    }
    // qualified chains: a.b.c / fn(x).f
    var done = false
    while (!done) {
      val dot = prevIdx(toks, start)
      if (dot >= 0 && toks(dot).kind == SYM && toks(dot).text == ".") {
        val id = prevIdx(toks, dot)
        if (id >= 0 && toks(id).kind == IDENT) start = id else done = true
      } else done = true
    }
    start
  }

  /** End index (inclusive) of the primary starting AT `start`;
    * -1 when no primary can be delimited. */
  private def fwdPrimary(toks: Vector[Tok], start0: Int): Int = {
    if (start0 >= toks.length) return -1
    var start = start0
    // unary sign before a numeric literal
    if (toks(start).kind == SYM &&
        (toks(start).text == "-" || toks(start).text == "+")) {
      val nx = nextIdx(toks, start)
      if (nx < toks.length && toks(nx).kind == NUM) start = nx else return -1
    }
    var end = start
    toks(start) match {
      case Tok(STR | NUM, _) => // literal
      case Tok(IDENT, t) =>
        if (Keywords.contains(t.toLowerCase)) return -1
        // fall through to the extension loop
      case t if isOpen(t) =>
        var depth = 0
        var j = start
        var stop = false
        while (j < toks.length && !stop) {
          if (isOpen(toks(j))) depth += 1
          else if (isClose(toks(j))) { depth -= 1; if (depth == 0) { end = j; stop = true } }
          j += 1
        }
        if (!stop) return -1
      case _ => return -1
    }
    // extensions: call args, member access, indexing
    var done = false
    while (!done) {
      val nx = nextIdx(toks, end)
      if (nx < toks.length && isOpen(toks(nx)) &&
          (toks(end).kind == IDENT || isClose(toks(end)))) {
        var depth = 0
        var j = nx
        var stop = false
        while (j < toks.length && !stop) {
          if (isOpen(toks(j))) depth += 1
          else if (isClose(toks(j))) { depth -= 1; if (depth == 0) { end = j; stop = true } }
          j += 1
        }
        if (!stop) return -1
      } else if (nx < toks.length && toks(nx).kind == SYM && toks(nx).text == "." &&
          (toks(end).kind == IDENT || isClose(toks(end)))) {
        val id = nextIdx(toks, nx)
        if (id < toks.length && toks(id).kind == IDENT) end = id else done = true
      } else done = true
    }
    end
  }

  private def text(toks: Vector[Tok], from: Int, to: Int): String =
    toks.slice(from, to + 1).iterator.map(_.text).mkString.trim

  // ------------------------------------------------------- rewrites
  /** The PG `ARRAY[a, b, c]` constructor (the slt INSERT spelling) ->
    * Spark's `array(a, b, c)`: the `ARRAY` ident's bracket group flips
    * to parens; inner constructors handled by iteration order (the
    * outermost match re-lexes nothing — brackets are single tokens).
    * A QUALIFIED access (`t.array[0]` — a column named array) keeps
    * Spark's element-subscript meaning; a BARE `array[...]` follows the
    * PG reading (PG itself parses it as the constructor keyword). */
  private def rewriteArrayCtor(toks0: Vector[Tok]): Vector[Tok] = {
    var toks = toks0
    var i = 0
    while (i < toks.length) {
      if (toks(i).kind == IDENT && toks(i).text.equalsIgnoreCase("array") && {
            val p = prevIdx(toks, i)
            !(p >= 0 && toks(p).kind == SYM && toks(p).text == ".")
          }) {
        val open = nextIdx(toks, i)
        if (open < toks.length && toks(open).kind == SYM &&
            toks(open).text == "[") {
          var depth = 0
          var close = -1
          var j = open
          while (j < toks.length && close < 0) {
            if (isOpen(toks(j))) depth += 1
            else if (isClose(toks(j))) { depth -= 1; if (depth == 0) close = j }
            j += 1
          }
          if (close > 0) {
            toks = toks.updated(open, Tok(SYM, "("))
              .updated(close, Tok(SYM, ")"))
          }
        }
      }
      i += 1
    }
    toks
  }

  /** `primary::vector` (and the other three type names) -> parser call.
    * Iterates until no vector casts remain (left-to-right). Dims
    * suffixes (`::vector(3)`, cos.slt) are accepted and swallowed —
    * dimensions are enforced by the kernels and index builds here, not
    * the cast (documented divergence). PG array-typed casts
    * (`::real[]`) become Spark array casts. */
  /** A PG typmod group `( NUM [, NUM] )` right after a cast type name:
    * Some((comma-joined args, close-paren index)), None when absent or
    * not the typmod shape. */
  private def precSuffix(toks: Vector[Tok], tyIdx: Int): Option[(String, Int)] = {
    val open = nextIdx(toks, tyIdx)
    if (open < toks.length && toks(open).kind == SYM &&
        toks(open).text == "(") {
      val a = nextIdx(toks, open)
      if (a < toks.length && toks(a).kind == NUM) {
        val after = nextIdx(toks, a)
        if (after < toks.length && toks(after).kind == SYM &&
            toks(after).text == ")")
          Some((toks(a).text, after))
        else if (after < toks.length && toks(after).kind == SYM &&
            toks(after).text == ",") {
          val b = nextIdx(toks, after)
          val cls = if (b < toks.length) nextIdx(toks, b) else toks.length
          if (b < toks.length && toks(b).kind == NUM &&
              cls < toks.length && toks(cls).kind == SYM &&
              toks(cls).text == ")")
            Some((s"${toks(a).text},${toks(b).text}", cls))
          else None
        } else None
      } else None
    } else None
  }

  private def rewriteCasts(toks0: Vector[Tok]): Vector[Tok] = {
    var toks = toks0
    var again = true
    while (again) {
      again = false
      var i = 0
      while (i < toks.length && !again) {
        if (toks(i).kind == SYM && toks(i).text == "::") {
          val tyIdx = nextIdx(toks, i)
          if (tyIdx < toks.length && toks(tyIdx).kind == IDENT) {
            val tyName = toks(tyIdx).text.toLowerCase
            // optional (dims) suffix after a vector type name
            def dimsEnd: Int = {
              val open = nextIdx(toks, tyIdx)
              if (open < toks.length && toks(open).kind == SYM &&
                  toks(open).text == "(") {
                val num = nextIdx(toks, open)
                val cls = if (num < toks.length) nextIdx(toks, num) else -1
                if (num < toks.length && toks(num).kind == NUM &&
                    cls < toks.length && toks(cls).kind == SYM &&
                    toks(cls).text == ")") cls
                else tyIdx
              } else tyIdx
            }
            // `::real[]`-family: the PG array cast
            def arrayBracketEnd: Int = {
              val open = nextIdx(toks, tyIdx)
              if (open < toks.length && toks(open).kind == SYM &&
                  toks(open).text == "[") {
                val cls = nextIdx(toks, open)
                if (cls < toks.length && toks(cls).kind == SYM &&
                    toks(cls).text == "]") cls
                else -1
              } else -1
            }
            CastFns.get(tyName) match {
              case Some(wrap) =>
                val p = prevIdx(toks, i)
                if (p < 0) throw new IllegalArgumentException(
                  s"cannot delimit the operand of ::${toks(tyIdx).text}")
                val start = backPrimary(toks, p)
                if (start < 0) throw new IllegalArgumentException(
                  s"cannot delimit the operand of ::${toks(tyIdx).text}")
                val call = wrap(text(toks, start, p))
                toks = toks.take(start) ++ Vector(Tok(IDENT, call)) ++
                  toks.drop(dimsEnd + 1)
                again = true
              case None if PgArrayElems.contains(tyName) &&
                  arrayBracketEnd > 0 =>
                val cls = arrayBracketEnd
                val p = prevIdx(toks, i)
                val start = if (p < 0) -1 else backPrimary(toks, p)
                if (start < 0) throw new IllegalArgumentException(
                  s"cannot delimit the operand of ::${toks(tyIdx).text}[]")
                val call = s"CAST(${text(toks, start, p)} AS " +
                  s"ARRAY<${PgArrayElems(tyName)}>)"
                toks = toks.take(start) ++ Vector(Tok(IDENT, call)) ++
                  toks.drop(cls + 1)
                again = true
              case None if PgScalarTypes.contains(tyName) &&
                  arrayBracketEnd < 0 =>
                val p = prevIdx(toks, i)
                val start = if (p < 0) -1 else backPrimary(toks, p)
                if (start < 0) throw new IllegalArgumentException(
                  s"cannot delimit the operand of ::${toks(tyIdx).text}")
                // PG typmod suffix: `::numeric(10,2)` maps onto
                // DECIMAL(p[,s]); other scalar names with a precision
                // group error clearly instead of leaving the `(10,2)`
                // dangling after the spliced CAST (a confusing delegate
                // parse error otherwise)
                val (target, end) = precSuffix(toks, tyIdx) match {
                  case Some((args, cls)) if tyName == "numeric" =>
                    (s"DECIMAL($args)", cls)
                  case Some((args, _)) =>
                    throw new IllegalArgumentException(
                      s"precision arguments unsupported for " +
                        s"::${toks(tyIdx).text}($args)")
                  case None => (PgScalarTypes(tyName), tyIdx)
                }
                val call = s"CAST(${text(toks, start, p)} AS $target)"
                toks = toks.take(start) ++ Vector(Tok(IDENT, call)) ++
                  toks.drop(end + 1)
                again = true
              case _ => ()
            }
          }
        }
        i += 1
      }
    }
    toks
  }

  /** `primary[lo:hi]` subscript slices (the reference's slice fetch,
    * *_subscript.slt: lo 0-based inclusive, hi exclusive, either bound
    * optional) -> `graft_slice(primary, lo[, hi])`. A `[...]` group
    * WITHOUT a top-level ':' is Spark's own element subscript and stays
    * untouched. Iterates left-to-right so a later operator can take the
    * spliced call as its operand. */
  private def rewriteSlices(toks0: Vector[Tok]): Vector[Tok] = {
    var toks = toks0
    var again = true
    while (again) {
      again = false
      var i = 0
      while (i < toks.length && !again) {
        if (toks(i).kind == SYM && toks(i).text == "[") {
          // balanced group + the top-level ':' inside it
          var depth = 0
          var close = -1
          var colon = -1
          var j = i
          while (j < toks.length && close < 0) {
            if (isOpen(toks(j))) depth += 1
            else if (isClose(toks(j))) { depth -= 1; if (depth == 0) close = j }
            else if (depth == 1 && toks(j).kind == SYM && toks(j).text == ":")
              colon = j
            j += 1
          }
          val p = prevIdx(toks, i)
          val isSubscript = close > 0 && colon > 0 && p >= 0 &&
            (toks(p).kind == IDENT || toks(p).kind == STR || isClose(toks(p)))
          if (isSubscript) {
            val start = backPrimary(toks, p)
            if (start >= 0) {
              val prim = text(toks, start, p)
              val loTxt = text(toks, i + 1, colon - 1)
              val hiTxt = text(toks, colon + 1, close - 1)
              val lo = if (loTxt.isEmpty) "0" else loTxt
              val call =
                if (hiTxt.isEmpty) s"graft_slice($prim, $lo)"
                else s"graft_slice($prim, $lo, $hiTxt)"
              toks = toks.take(start) ++ Vector(Tok(IDENT, call)) ++
                toks.drop(close + 1)
              again = true
            }
          }
        }
        i += 1
      }
    }
    toks
  }

  /** Operator tokens -> dispatch-function calls, left-to-right. */
  private def rewriteOps(toks0: Vector[Tok]): Vector[Tok] = {
    var toks = toks0
    var i = 0
    while (i < toks.length) {
      if (toks(i).kind == OP) {
        val fn = Ops.find(_._1 == toks(i).text).get._2
        val lEnd = prevIdx(toks, i)
        val lStart = if (lEnd < 0) -1 else backPrimary(toks, lEnd)
        val rStart = nextIdx(toks, i)
        val rEnd = if (rStart >= toks.length) -1 else fwdPrimary(toks, rStart)
        if (lStart < 0 || rEnd < 0) {
          if (toks(i).text == "<=>") { i += 1 } // Spark's null-safe equality
          else throw new IllegalArgumentException(
            s"cannot delimit the operands of ${toks(i).text} near: " +
              text(toks, math.max(0, i - 4), math.min(toks.length - 1, i + 4)))
        } else {
          val call = s"$fn(${text(toks, lStart, lEnd)}, ${text(toks, rStart, rEnd)})"
          toks = toks.take(lStart) ++ Vector(Tok(IDENT, call)) ++ toks.drop(rEnd + 1)
          i = lStart // the spliced call can be a later operator's left operand
        }
      } else i += 1
    }
    toks
  }
}
