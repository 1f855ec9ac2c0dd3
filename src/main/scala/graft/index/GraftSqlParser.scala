package graft.index

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.execution.command.{ExplainCommand, LeafRunnableCommand}
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/**
 * Parser-injected native index DDL — the reference drives its entire
 * index lifecycle as parsed SQL statements (CREATE INDEX ... USING
 * vectors, src/index/am.rs:135-244; finalize.sql:714; every slt file),
 * and the Spark-native analog of a DDL statement is a parsed
 * `RunnableCommand`: planned at parse time, EXECUTED exactly once per
 * execution. This replaces the analysis-time side effects of the
 * `SELECT create_vector_index(...)` spelling (which constant-folds in
 * the FunctionRegistry builder, so an EXPLAIN alone triggers a build
 * and re-analysis re-runs it) — those registrations stay for
 * compatibility, but statements are the idiomatic surface:
 *
 * {{{
 * CREATE VECTOR INDEX [IF NOT EXISTS] name ON '/path/t.parquet'
 *   USING vectors (id_col, vec_col vector_l2_ops)
 *   WITH (m = 12, ef_construction = 300)
 * VACUUM VECTOR INDEX name
 * DROP VECTOR INDEX [IF EXISTS] name
 * EXPLAIN <any of the above>     -- plans, never builds
 * }}}
 *
 * The statement shape mirrors Postgres `CREATE INDEX ... USING am (col
 * opclass) WITH (reloptions)`, carrying the id column a path-based
 * catalog needs where the reference reads the heap TID. `USING` takes
 * the [[IndexOptions.accessMethod]] spellings (`vectors`, `hnsw`,
 * `ivfflat`), the opclass defaults to `vector_l2_ops`, and `WITH`
 * reloptions accept both pgvector and native keys ([[SqlDdl.create]]
 * dispatch). Injected via [[graft.plans.GraftExtensions]]
 * (`spark.sql.extensions`); unrecognized statements delegate verbatim,
 * so the parser is a pure extension of the Spark surface.
 */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  /** The wrapped Spark parser — for claimed statements that rebuild a
    * statement text and must re-parse it WITHOUT re-claiming (the
    * vector-literal INSERT rewrite: a rebuilt statement whose remaining
    * bare `[...]`/`{...}` literals target non-vector columns would
    * otherwise re-fire the claim forever). */
  private[graft] def delegateParser: ParserInterface = delegate
  // reference-dialect operators (`<->` `<#>` `<=>` `<~>`, sphere forms,
  // `::vector` casts) rewrite to the registered dispatch functions
  // BEFORE statement recognition — reference slt queries run verbatim
  // and, being RuntimeReplaceable-resolved to the native kernel shapes,
  // hit the existing ANN pushdown arms (see OpSqlRewrite)
  override def parsePlan(sqlText: String): LogicalPlan = {
    // reference GUC spellings (`SET vectors.ivf_nprobe=…`, and with
    // pgvector compatibility on, `SET ivfflat.probes=…`) land on the
    // native spark.graft.* confs — the compatibility.rs name swap;
    // vector COLUMN TYPES in table DDL (`val vector(3)`) land on the
    // Spark storage types (gated to CREATE/REPLACE TABLE statements so
    // a function or column named `vector` is never touched elsewhere)
    val typed =
      if (GraftSqlParser.TableDdlGate.matcher(sqlText).matches())
        OpSqlRewrite.tableTypes(sqlText)
      else sqlText
    val rewritten =
      OpSqlRewrite(Gucs.rewriteSet(OpSqlRewrite.statView(typed)))
    GraftSqlParser.parseVectorDdl(rewritten)
      .getOrElse(delegate.parsePlan(rewritten))
  }
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(OpSqlRewrite(sqlText))
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  private val Ident = "[A-Za-z_][A-Za-z0-9_]*"

  // table-DDL statements whose column types may carry the reference's
  // vector(n)/vecf16(n)/svector(n)/bvector(n) spellings
  private[index] val TableDdlGate = java.util.regex.Pattern.compile(
    """(?is)\s*(?:CREATE|REPLACE)\s+(?:OR\s+REPLACE\s+)?""" +
      """(?:GLOBAL\s+|LOCAL\s+|TEMPORARY\s+|TEMP\s+|EXTERNAL\s+)*TABLE\b.*""")

  // `SET search_path TO pg_temp, vectors;` — every reference slt file's
  // prologue. PG schema namespacing has no analog here (functions are
  // session-registered, indexes path-cataloged), so the statement is a
  // recognized NO-OP rather than a delegate parse error
  // (out_of_search_path.slt's namespacing semantics stay out of scope,
  // documented in SURVEY §2.0).
  private val SearchPathRe =
    """(?is)\s*SET\s+search_path\s*(?:=|\s+TO\s+)[^;]*;?\s*""".r

  // PG transaction-block statements (tests/transaction/test.sql):
  // claimed only as STANDALONE statements — Spark has no bare
  // BEGIN/COMMIT/ABORT/ROLLBACK, and a SQL-scripting compound block
  // ("BEGIN <body> END") arrives as one text that these whole-string
  // patterns never match. `END` (PG's COMMIT synonym) is deliberately
  // unclaimed — it is the scripting terminator's spelling.
  private val TxnBeginRe =
    """(?is)\s*BEGIN(?:\s+(?:TRANSACTION|WORK))?\s*;?\s*""".r
  private val TxnCommitRe =
    """(?is)\s*COMMIT(?:\s+(?:TRANSACTION|WORK))?\s*;?\s*""".r
  private val TxnAbortRe =
    """(?is)\s*(?:ABORT|ROLLBACK)(?:\s+(?:TRANSACTION|WORK))?\s*;?\s*""".r

  // PG `SHOW <guc>` (compact_var.slt's read statements) — claimed only
  // for the reference GUC spellings (Gucs.isGucName), so Spark's own
  // SHOW TABLES/DATABASES/... always delegate
  private val ShowGucRe =
    """(?is)\s*SHOW\s+([A-Za-z_][A-Za-z0-9_.]*)\s*;?\s*""".r

  // CREATE VECTOR INDEX [IF NOT EXISTS] name ON <target> USING am
  //   (idCol, vecCol [opclass]) [WITH (k = v, ...)] [WHERE pred]
  // <target> = '<parquet path>' | catalog table (ident, optionally
  // db-qualified — resolved to the table's parquet location at RUN
  // time, the Postgres CREATE INDEX ... ON table shape)
  private val CreateRe =
    ("""(?is)\s*CREATE\s+VECTOR\s+INDEX\s+(?:(IF\s+NOT\s+EXISTS)\s+)?""" +
      s"($Ident)" + """\s+ON\s+(?:'([^']+)'|(""" + s"$Ident(?:\\.$Ident)*" +
      """))\s+USING\s+""" + s"($Ident)" +
      """\s*\(\s*""" + s"($Ident)" + """\s*,\s*""" + s"($Ident)" +
      """(?:\s+""" + s"($Ident)" + """)?\s*\)""" +
      // WITH body: quoted strings or any non-quote non-paren char — a
      // ')' or ',' INSIDE quotes never terminates the group
      """(?:\s+WITH\s*\(((?:'[^']*'|[^)'])*)\))?""" +
      """(?:\s+WHERE\s+(.+?))?\s*;?\s*""").r

  private val DropRe =
    ("""(?is)\s*DROP\s+VECTOR\s+INDEX\s+(?:(IF\s+EXISTS)\s+)?""" +
      s"($Ident)" + """\s*;?\s*""").r

  // ALTER VECTOR INDEX name SET (k = v, ...) — the index_edit.slt
  // surface (alter_vector_index) as a statement; same quote-aware
  // option body as CREATE's WITH
  private val AlterRe =
    ("""(?is)\s*ALTER\s+VECTOR\s+INDEX\s+""" + s"($Ident)" +
      """\s+SET\s*\(((?:'[^']*'|[^)'])*)\)\s*;?\s*""").r

  // ALTER VECTOR INDEX name RESET (k, ...) — the Postgres ALTER INDEX
  // RESET pair: remove the options so their defaults apply again
  private val AlterResetRe =
    ("""(?is)\s*ALTER\s+VECTOR\s+INDEX\s+""" + s"($Ident)" +
      """\s+RESET\s*\(\s*""" + s"($Ident(?:\\s*,\\s*$Ident)*)" +
      """\s*\)\s*;?\s*""").r

  private val VacuumRe =
    ("""(?is)\s*VACUUM\s+VECTOR\s+INDEX\s+""" + s"($Ident)" +
      """\s*;?\s*""").r

  // ---- the reference's NATIVE Postgres spellings (round 13: every slt
  // file drives the lifecycle as plain CREATE INDEX / DROP INDEX /
  // REINDEX INDEX / VACUUM — a pgvecto.rs user ports these verbatim) ----

  // CREATE INDEX [CONCURRENTLY] [IF NOT EXISTS] [name] ON [ONLY] <target>
  //   USING <am> ( <col> [[schema.]opclass] )
  //   [WITH (reloptions — incl. options = "TOML" | $$TOML$$ | 'TOML')]
  //   [WHERE pred]
  // The WITH body admits $$-quoted multi-line TOML spans; claimed only
  // for the vector access methods / the two-ident (col opclass) column
  // shape — Spark's own DSv2 CREATE INDEX grammar never parses those,
  // and non-vector single-column forms delegate untouched.
  private val CreatePgRe =
    ("""(?is)\s*CREATE\s+INDEX\s+(?:CONCURRENTLY\s+)?""" +
      """(?:(IF\s+NOT\s+EXISTS)\s+)?""" +
      s"(?:($Ident)\\s+)?" +
      """ON\s+(?:ONLY\s+)?(?:'([^']+)'|(""" + s"$Ident(?:\\.$Ident)*" +
      """))\s+USING\s+""" + s"($Ident)" +
      """\s*\(\s*""" + s"($Ident)" +
      """(?:\s+(?:""" + s"$Ident" + """\.)?(""" + s"$Ident" + """))?\s*\)""" +
      """(?:\s+WITH\s*\(((?:\$\$.*?\$\$|"[^"]*"|'[^']*'|[^)"'])*)\))?""" +
      """(?:\s+WHERE\s+(.+?))?\s*;?\s*""").r

  // DROP INDEX [CONCURRENTLY] [IF EXISTS] name[, name ...]
  // (never matches Spark's own `DROP INDEX ident ON table` — the ON
  // clause fails the full-match)
  private val DropIndexRe =
    ("""(?is)\s*DROP\s+INDEX\s+(?:CONCURRENTLY\s+)?""" +
      """(?:(IF\s+EXISTS)\s+)?""" +
      s"($Ident(?:\\s*,\\s*$Ident)*)" + """\s*;?\s*""").r

  // REINDEX INDEX [CONCURRENTLY] name (reindex.slt) — blocking and
  // CONCURRENTLY collapse: builds here never block readers
  private val ReindexIndexRe =
    ("""(?is)\s*REINDEX\s+INDEX\s+(?:CONCURRENTLY\s+)?""" + s"($Ident)" +
      """\s*;?\s*""").r

  // REINDEX TABLE [CONCURRENTLY] <table> (update.slt): rebuild every
  // recipe-complete vector index on the table — the VACUUM FULL sweep
  // scoped to one source
  private val ReindexTableRe =
    ("""(?is)\s*REINDEX\s+TABLE\s+(?:CONCURRENTLY\s+)?""" +
      s"(?:'([^']+)'|($Ident(?:\\.$Ident)*))" + """\s*;?\s*""").r

  // VACUUM [FULL] [<table>] (index_vacuum.slt: `VACUUM FULL;`):
  // FULL rebuilds every SQL-recipe vector index (scoped to the table's
  // resolved location when given); plain VACUUM is a no-op success —
  // Postgres plain vacuum never rebuilds indexes, and tombstone
  // visibility here is versioned, not dead-tuple-based.
  private val VacuumTableRe =
    ("""(?is)\s*VACUUM(?:\s+(FULL))?(?:\s+(?:FREEZE|VERBOSE|ANALYZE))*""" +
      """(?:\s+(?:'([^']+)'|(""" +
      s"$Ident(?:\\.$Ident)*" + """)))?\s*;?\s*""").r

  private val ExplainRe =
    """(?is)\s*EXPLAIN(?:\s+(EXTENDED|CODEGEN|COST|FORMATTED))?\s+(.*)""".r

  // ---- row DML (update.slt): UPDATE / DELETE over catalog tables,
  // plain parquet paths, or segment-store paths (SqlDml semantics);
  // INSERT ... VALUES claimed ONLY when a bare vector text literal
  // appears (the slt spelling) — everything else delegates ----
  private val UpdateDmlRe =
    ("""(?is)\s*UPDATE\s+(?:'([^']+)'|(""" + s"$Ident(?:\\.$Ident)*" +
      """))\s+SET\s+(.+?)\s*;?\s*""").r
  private val DeleteDmlRe =
    ("""(?is)\s*DELETE\s+FROM\s+(?:'([^']+)'|(""" +
      s"$Ident(?:\\.$Ident)*" +
      """))(?:\s+WHERE\s+(.+?))?\s*;?\s*""").r
  private val InsertValuesRe =
    ("""(?is)\s*INSERT\s+INTO\s+(""" + s"$Ident(?:\\.$Ident)*" +
      """)\s*(?:\(\s*([^()]*?)\s*\)\s*)?VALUES\s*(.+?)\s*;?\s*""").r

  // ---- PG partitioned-table DDL (partition.slt): parent → native
  // PARTITIONED BY parquet table; children → driver-registered partial
  // scopes over the parent (PgPartitions); the multi-name DROP TABLE
  // list form (Spark's own takes one name) ----
  private val CreatePartByRe =
    ("""(?is)\s*CREATE\s+TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(""" +
      s"$Ident(?:\\.$Ident)*" + """)\s*\((.*)\)\s*PARTITION\s+BY\s+(""" +
      s"$Ident" + """)\s*\(\s*(""" + s"$Ident" + """)\s*\)\s*;?\s*""").r
  private val CreatePartOfRe =
    ("""(?is)\s*CREATE\s+TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(""" +
      s"$Ident" + """)\s+PARTITION\s+OF\s+(""" + s"$Ident(?:\\.$Ident)*" +
      """)\s+FOR\s+VALUES\s+IN\s*\(([^)]*)\)\s*;?\s*""").r
  private val DropTablesRe =
    ("""(?is)\s*DROP\s+TABLE\s+(?:(IF\s+EXISTS)\s+)?(""" +
      s"$Ident(?:\\.$Ident)*(?:\\s*,\\s*$Ident(?:\\.$Ident)*)*" +
      """)\s*;?\s*""").r

  /** `WITH (m = 12, ef_construction = 300)` body → the `k=v,k=v` string
    * [[SqlDdl.parseOpts]] takes. Values may be bare words/numbers or
    * single-quoted strings; pairs split on commas OUTSIDE quotes. A
    * comma inside a value is rejected with a clear error — the recipe's
    * flat k=v serialization (replayed by vacuum through the same
    * parser) cannot carry it, and no reloption takes one. */
  private def withOpts(body: String): String = {
    val s = Option(body).getOrElse("").trim
    if (s.isEmpty) return ""
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQ = false
    s.foreach {
      case '\'' => inQ = !inQ; cur += '\''
      case ',' if !inQ => parts += cur.toString; cur.clear()
      case c => cur += c
    }
    parts += cur.toString
    parts.map { kv =>
      kv.split("=", 2) match {
        case Array(k, v0) =>
          val v = v0.trim.stripPrefix("'").stripSuffix("'")
          if (v.contains(",")) throw new IllegalArgumentException(
            s"option values may not contain ',': ${k.trim} = $v")
          s"${k.trim}=$v"
        case _ => throw new IllegalArgumentException(
          s"malformed WITH option '$kv' (expected key = value)")
      }
    }.mkString(",")
  }

  /** A PG `WITH (...)` reloption body → (key -> raw unquoted value):
    * top-level commas split outside '…', "…" and $$…$$ spans; values
    * strip one layer of whichever quoting they carry. The reference
    * spells its TOML options as `options = "[indexing.hnsw]"` or a
    * dollar-quoted multi-line block (ivf.slt). */
  private[index] def pgWithPairs(body: String): Map[String, String] = {
    val s = Option(body).getOrElse("").trim
    if (s.isEmpty) return Map.empty
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0; var inS = false; var inD = false; var inDollar = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inDollar) {
        if (c == '$' && i + 1 < s.length && s.charAt(i + 1) == '$') {
          inDollar = false; cur.append("$$"); i += 2
        } else { cur.append(c); i += 1 }
      } else if (inS) { if (c == '\'') inS = false; cur.append(c); i += 1 }
      else if (inD) { if (c == '"') inD = false; cur.append(c); i += 1 }
      else c match {
        case '\'' => inS = true; cur.append(c); i += 1
        case '"' => inD = true; cur.append(c); i += 1
        case '$' if i + 1 < s.length && s.charAt(i + 1) == '$' =>
          inDollar = true; cur.append("$$"); i += 2
        case ',' => parts += cur.toString; cur.clear(); i += 1
        case _ => cur.append(c); i += 1
      }
    }
    parts += cur.toString
    parts.filter(_.trim.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v0) =>
          val v = v0.trim
          val unq =
            if (v.startsWith("$$") && v.endsWith("$$") && v.length >= 4)
              v.substring(2, v.length - 2)
            else if (v.length >= 2 &&
                ((v.head == '\'' && v.last == '\'') ||
                  (v.head == '"' && v.last == '"')))
              v.substring(1, v.length - 1)
            else v
          k.trim.toLowerCase -> unq
        case _ => throw new IllegalArgumentException(
          s"malformed WITH option '$kv' (expected key = value)")
      }
    }.toMap
  }

  /** Try the vector-DDL grammar; None → not ours, delegate. Statement
    * recognition is all that happens at parse time — the catalog work
    * lives in the commands' run(), the execute-once contract. */
  private[index] def parseVectorDdl(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case CreateRe(ifNot, name, path, table, am, idCol, vecCol, opclass,
          opts, where) =>
        Some(CreateVectorIndexCommand(name,
          Option(path).getOrElse(table), idCol, vecCol, am,
          Option(opclass).getOrElse("vector_l2_ops"),
          withOpts(opts), ifNotExists = ifNot != null,
          sourceIsTable = path == null,
          // control chars → spaces: a multi-line WHERE must survive the
          // single-line recipe serialization the manifest stores (plain
          // runs of spaces are preserved — they could sit inside string
          // literals)
          where = Option(where)
            .map(_.replaceAll("[\\u0000-\\u001f]+", " ").trim)
            .getOrElse("")))
      case DropRe(ifExists, name) =>
        Some(DropVectorIndexCommand(name, ifExists = ifExists != null))
      case VacuumRe(name) =>
        Some(VacuumVectorIndexCommand(name))
      case AlterRe(name, opts) =>
        Some(AlterVectorIndexCommand(name, withOpts(opts)))
      case AlterResetRe(name, keys) =>
        Some(AlterResetVectorIndexCommand(name,
          keys.split(",").map(_.trim).toSeq))
      // the reference's native PG spellings — claimed only for the
      // vector AMs or the (col opclass) two-ident column shape (which
      // Spark's own DSv2 CREATE INDEX grammar never parses); other
      // CREATE INDEX statements delegate untouched
      case CreatePgRe(ifNot, name, path, table, am, col, opclass, withBody,
          where)
          // claim the vector AMs unconditionally; the bare two-ident
          // (col opclass) shape only for the vector opclass families —
          // CREATE INDEX ... USING btree (c text_ops) delegates instead
          // of failing at run() with 'access method does not exist'
          if Set("vectors", "hnsw", "ivfflat")(am.toLowerCase) ||
            (opclass != null && opclass.toLowerCase.matches(
              "(vector|svector|bvector|vecf16)_[a-z0-9_]+")) =>
        Some(CreatePgIndexCommand(Option(name),
          Option(path).getOrElse(table), sourceIsTable = path == null,
          am = am, col = col, opclassOpt = Option(opclass),
          withBody = Option(withBody).getOrElse(""),
          where = Option(where)
            .map(_.replaceAll("[\\u0000-\\u001f]+", " ").trim)
            .getOrElse(""),
          ifNotExists = ifNot != null))
      case DropIndexRe(ifExists, names) =>
        Some(DropPgIndexCommand(
          names.split(",").map(_.trim).toSeq, ifExists = ifExists != null))
      case ReindexIndexRe(name) =>
        Some(ReindexIndexCommand(name))
      case ReindexTableRe(path, table) =>
        Some(VacuumTableCommand(full = true,
          Option(path).orElse(Option(table)), isPath = path != null))
      case VacuumTableRe(full, path, table) =>
        Some(VacuumTableCommand(full != null,
          Option(path).orElse(Option(table)), isPath = path != null))
      case UpdateDmlRe(path, table, setBlob) =>
        Some(UpdateDmlCommand(Option(path).getOrElse(table),
          isPath = path != null, setBlob))
      case DeleteDmlRe(path, table, where) =>
        Some(DeleteDmlCommand(Option(path).getOrElse(table),
          isPath = path != null, Option(where)))
      case InsertValuesRe(table, cols, vals)
          if SqlDml.hasBareVectorLiteral(vals) =>
        Some(InsertVectorValuesCommand(table,
          Option(cols).map(_.split(",").map(_.trim
            .stripPrefix("\"").stripSuffix("\"")
            .stripPrefix("`").stripSuffix("`")).toSeq),
          vals))
      case CreatePartByRe(ifNot, name, cols, kind, pcol) =>
        Some(CreatePartitionedTableCommand(ifNot != null, name, cols,
          kind, pcol))
      case CreatePartOfRe(ifNot, name, parent, vals) =>
        Some(CreatePartitionOfCommand(ifNot != null, name, parent, vals))
      case DropTablesRe(ifEx, names0) =>
        // list form always ours; single names only when they are
        // registered partition children — Spark's own DROP TABLE keeps
        // every other single-name statement
        val names = names0.split(",").map(_.trim).toSeq
        if (names.length > 1 ||
            PgPartitions.resolveParseTime(names.head).isDefined)
          Some(DropTablesCommand(ifEx != null, names))
        else None
      case SearchPathRe() =>
        Some(SetSearchPathCommand())
      case TxnBeginRe() => Some(TxnCommand("begin"))
      case TxnCommitRe() => Some(TxnCommand("commit"))
      case TxnAbortRe() => Some(TxnCommand("abort"))
      case ShowGucRe(key) if Gucs.isGucName(key) =>
        Some(ShowGucCommand(key))
      case ExplainRe(mode, inner) =>
        // EXPLAIN <vector ddl>: plan the command, wrap it — the
        // RunnableCommand body never runs under ExplainCommand
        parseVectorDdl(inner).map(cmd => ExplainCommand(cmd,
          ExplainMode.fromString(
            Option(mode).map(_.toLowerCase).getOrElse("simple"))))
      case _ => None
    }

  /** Is the vector-DDL grammar live on this session's parser? */
  def installed(spark: SparkSession): Boolean =
    spark.sessionState.sqlParser.isInstanceOf[GraftSqlParser]

  /** The shared DROP body (DROP VECTOR INDEX and the PG DROP INDEX
    * spelling): retire the planner claim by NAME, drop the artifact,
    * lift any shadow this registration held over same-source
    * survivors. */
  private[index] def dropOne(spark: SparkSession, name: String,
      ifExists: Boolean): String = {
    val m = IndexCatalog.load(spark, name)
    if (m.isEmpty && !ifExists)
      throw new IllegalArgumentException(s"no such index: $name")
    m.foreach { man =>
      // drop the planner's view of the index too — by NAME identity:
      // a (metric, conjuncts) match would deregister a surviving
      // same-metric index whose registration replaced this one's, and
      // partial entries would need the source alive to re-canonicalize
      graft.plans.AnnPushdown.unregisterNamed(man.source, name)
      IndexCatalog.drop(spark, name)
      // ...and surviving same-source indexes whose claims THIS index's
      // registration had replaced come back (register keys on
      // (metric, conjuncts), so the newest same-metric create shadows
      // older ones — the shadow must lift when it drops)
      SqlDdl.reregisterSource(spark, man.source, excluding = name)
    }
    if (m.isDefined) "ok" else "skipped"
  }
}

private[index] trait VectorIndexCommand extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("result", StringType, nullable = false)())
}

/** CREATE VECTOR INDEX: idempotent ensure semantics via
  * [[SqlDdl.create]] (an existing non-stale artifact with the same
  * params is a no-op — the reference's re-CREATE behavior); IF NOT
  * EXISTS short-circuits on ANY committed manifest of that name. A
  * WHERE clause builds a PARTIAL index over the matching rows and
  * registers it predicate-scoped (the Postgres partial-index shape).
  *
  * `sourceIsTable` = the `ON db.table` spelling (every reference slt
  * drives CREATE INDEX at a TABLE — finalize.sql:714): the identifier
  * resolves through the SESSION CATALOG to the table's parquet
  * location at RUN time (execute-once, like the build itself — an
  * EXPLAIN resolves nothing), and the manifest records the RESOLVED
  * path, so vacuum/search replay needs no catalog. Non-parquet
  * providers and views error clearly — the artifact reads the files
  * directly and a transactional/managed format's files are not a
  * stable snapshot of the table. */
case class CreateVectorIndexCommand(name: String, source: String,
    idCol: String, vecCol: String, am: String, opclass: String,
    options: String, ifNotExists: Boolean,
    where: String = "", sourceIsTable: Boolean = false)
    extends VectorIndexCommand {
  override def run(spark: SparkSession): Seq[Row] =
    if (ifNotExists && IndexCatalog.load(spark, name).isDefined) {
      // the planner registry is driver-LOCAL: a fresh JVM's
      // IF NOT EXISTS over a persisted index must still register.
      // (No table resolution here — the manifest already records the
      // resolved path, and the committed artifact must stay usable
      // even if the catalog entry was since dropped.)
      SqlDdl.registerFromRecipe(spark, name)
      Seq(Row("exists"))
    } else Seq(Row(SqlDdl.create(spark, name,
      if (sourceIsTable)
        CreateVectorIndexCommand.resolveTableLocation(spark, source)
      else source,
      idCol, vecCol, am, opclass, options, where)))
}

object CreateVectorIndexCommand {
  /** Session-catalog table → its parquet location path. Views carry no
    * files; non-parquet sources (ORC, JDBC, Delta, hive-serde) are
    * refused rather than mis-read — the index artifact scans the
    * location's files directly, which is only the table's content for
    * plain parquet layouts. */
  private[index] def resolveTableLocation(spark: SparkSession,
      table: String): String = {
    // the grammar accepts any ident(.ident)* chain; the session catalog
    // resolves at most db.table — a leading session-catalog qualifier
    // (spark_catalog.db.t) is stripped, anything deeper errors clearly
    // instead of surfacing a raw parse exception (round-12 review)
    val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(table)
    val trimmed =
      if (parts.length == 3 &&
          parts.head.equalsIgnoreCase("spark_catalog")) parts.tail
      else parts
    if (trimmed.length > 2)
      throw new IllegalArgumentException(
        s"cannot resolve $table — CREATE VECTOR INDEX ON accepts " +
          "<table> or <db>.<table> in the session catalog (or a quoted " +
          "parquet path)")
    val id = trimmed match {
      case Seq(t) => org.apache.spark.sql.catalyst.TableIdentifier(t)
      case Seq(db, t) => org.apache.spark.sql.catalyst.TableIdentifier(t, Some(db))
    }
    val meta = spark.sessionState.catalog.getTableMetadata(id)
    if (meta.tableType == org.apache.spark.sql.catalyst.catalog.CatalogTableType.VIEW)
      throw new IllegalArgumentException(
        s"cannot index view $table — CREATE VECTOR INDEX needs a parquet table")
    // file:///x → /x: the catalog and registry compare plain local
    // paths (a triple-slash URI would never match a scan's root path);
    // non-file schemes keep their full URI spelling
    val loc = meta.location
    val path =
      if (loc.getScheme == null || loc.getScheme == "file") loc.getPath
      else loc.toString
    val provider = meta.provider.getOrElse("hive")
    // non-parquet providers index ONLY through the snapshot SPI: a
    // configured TableSnapshotResolver that OWNS the location supplies
    // the committed file list + version (builds scan exactly that
    // snapshot — see TableSnapshotResolver); without one, refuse rather
    // than mis-read the raw dir
    if (!provider.equalsIgnoreCase("parquet") &&
        TableSnapshotResolver.snapshotOf(spark, path).isEmpty)
      throw new IllegalArgumentException(
        s"cannot index table $table with provider '$provider' — " +
          "CREATE VECTOR INDEX reads the table's files directly and " +
          "supports only parquet sources (point ON at a parquet path, " +
          "re-register the data as a parquet table, or configure " +
          s"${TableSnapshotResolver.ConfKey} with a snapshot resolver " +
          "for this provider)")
    path
  }
}

/** VACUUM VECTOR INDEX: [[SqlDdl.vacuum]] — rebuild from the current
  * source, reclaiming deleted rows, serving readers throughout. */
case class VacuumVectorIndexCommand(name: String) extends VectorIndexCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    SqlTxn.refuseInTxn(spark, "VACUUM")
    Seq(Row(SqlDdl.vacuum(spark, name)))
  }
}

/** ALTER VECTOR INDEX ... SET (k = v, ...): live-alter search-time
  * options through [[IndexCatalog.alterAll]] — ONE commit, every pair
  * validated against the Alterable rules first (unknown keys and
  * invalid values error, the index_edit.slt contract; structural build
  * params stay rebuild-only). */
case class AlterVectorIndexCommand(name: String,
    options: String) extends VectorIndexCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val kvs = SqlDdl.parseOpts(options)
    if (kvs.isEmpty)
      throw new IllegalArgumentException("ALTER ... SET requires options")
    // sql_* keys are the internal vacuum-replay recipe written in one
    // commit by SqlDdl — a user ALTER of (say) sql_where would desync
    // the recorded recipe from the built artifact and the next VACUUM
    // would silently rebuild under the altered scope while the planner
    // registration still claims the old predicate (round-11 advice).
    // Re-scoping goes through CREATE (which reindexes on a changed
    // WHERE), never ALTER.
    kvs.keys.find(_.startsWith("sql_")).foreach(k =>
      throw new IllegalArgumentException(
        s"option not alterable: $k (recipe keys are owned by " +
          "CREATE/VACUUM VECTOR INDEX — re-CREATE to change the recipe)"))
    IndexCatalog.alterAll(spark, name, kvs)
    Seq(Row("ok"))
  }
}

/** ALTER VECTOR INDEX ... RESET (k, ...): remove alterable options in
  * ONE commit so their defaults apply again ([[IndexCatalog.resetAll]]
  * — the Postgres ALTER INDEX RESET pair to SET). Unknown keys error
  * (index_edit.slt contract); the sql_* recipe keys are CREATE-owned,
  * same guard as SET. */
case class AlterResetVectorIndexCommand(name: String,
    keys: Seq[String]) extends VectorIndexCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    keys.find(_.startsWith("sql_")).foreach(k =>
      throw new IllegalArgumentException(
        s"option not alterable: $k (recipe keys are owned by " +
          "CREATE/VACUUM VECTOR INDEX)"))
    IndexCatalog.resetAll(spark, name, keys)
    Seq(Row("ok"))
  }
}

/** DROP VECTOR INDEX: [[IndexCatalog.drop]] (waits for in-flight builds
  * under the DDL lock). Without IF EXISTS a missing index errors, the
  * Postgres DROP INDEX contract. */
case class DropVectorIndexCommand(name: String, ifExists: Boolean)
    extends VectorIndexCommand {
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(GraftSqlParser.dropOne(spark, name, ifExists)))
}

/** The reference's native `CREATE INDEX ... USING vectors (col opclass)
  * WITH (options = "<TOML>")` spelling (src/index/am.rs:135-244; every
  * sqllogictest file), plus the pgvector-compatibility
  * `USING hnsw/ivfflat (col ops) WITH (m=…, lists=…)` forms
  * (compact_stmt.slt) — all mapped onto [[SqlDdl.create]]:
  *
  *  - `USING hnsw` / `USING ivfflat` exist only while
  *    `vectors.pgvector_compatibility` is on (compatibility.rs:9-11 —
  *    the utility-hook swap is skipped otherwise and PG then reports
  *    the AM unknown); the swap maps them to the native AM with the
  *    `[indexing.*]` selection, so opclass errors cite "vectors", the
  *    reference's own message shape.
  *  - An ANONYMOUS create generates the PG name `<table>_<col>_idx`,
  *    uniquified with a numeric suffix unless an existing index of that
  *    name carries the IDENTICAL recipe (then create is the idempotent
  *    ensure — re-running an slt file doesn't accrete indexes).
  *  - The reference indexes heap TIDs; a path-based catalog needs an id
  *    COLUMN: `WITH (id_col = '…')` wins, else a column named `id`,
  *    else the first atomic-typed non-vector column of the schema —
  *    resolved at RUN time, documented divergence (SURVEY §2.0).
  */
case class CreatePgIndexCommand(nameOpt: Option[String], source: String,
    sourceIsTable: Boolean, am: String, col: String,
    opclassOpt: Option[String], withBody: String, where: String,
    ifNotExists: Boolean) extends VectorIndexCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val amLc = am.toLowerCase
    if ((amLc == "hnsw" || amLc == "ivfflat") && !Gucs.pgvectorCompat(spark))
      throw new IllegalArgumentException(
        s"""access method "$amLc" does not exist""")
    if (!Set("vectors", "hnsw", "ivfflat")(amLc))
      throw new IllegalArgumentException(
        s"""access method "$am" does not exist""")
    val pairs = GraftSqlParser.pgWithPairs(withBody)
    val idColOpt = pairs.get("id_col")
    val rel = pairs - "id_col"
    val (amEff, reloptStr) = amLc match {
      case "vectors" =>
        val bad = rel.keySet - "options"
        require(bad.isEmpty, s"unknown reloption `${bad.toSeq.sorted.head}` " +
          "for access method vectors (expected options [, id_col])")
        ("vectors",
          IndexToml.toReloptions(IndexToml.parse(rel.getOrElse("options", ""))))
      case "hnsw" =>
        val bad = rel.keySet -- Set("m", "ef_construction")
        require(bad.isEmpty, s"unknown reloption `${bad.toSeq.sorted.head}` " +
          "for access method hnsw (expected m, ef_construction [, id_col])")
        ("vectors", (Seq("indexing" -> "hnsw") ++ rel.toSeq.sortBy(_._1))
          .map { case (k, v) => s"$k=$v" }.mkString(","))
      case "ivfflat" =>
        val bad = rel.keySet - "lists"
        require(bad.isEmpty, s"unknown reloption `${bad.toSeq.sorted.head}` " +
          "for access method ivfflat (expected lists [, id_col])")
        ("vectors", (Seq("indexing" -> "ivf") ++ rel.toSeq.sortBy(_._1))
          .map { case (k, v) => s"$k=$v" }.mkString(","))
    }
    val opclass = opclassOpt.getOrElse("vector_l2_ops")
    IndexOptions.opclass(opclass, amEff) // errors cite the post-swap AM
    // a registered PG partition child indexes the PARENT's location
    // scoped by its value set — the Postgres semantics of indexing one
    // partition, served by the existing partial-index machinery
    val partChild =
      if (sourceIsTable) PgPartitions.resolve(spark, source) else None
    val resolved = partChild match {
      case Some(c) =>
        CreateVectorIndexCommand.resolveTableLocation(spark, c.parent)
      case None if sourceIsTable =>
        CreateVectorIndexCommand.resolveTableLocation(spark, source)
      case None => source
    }
    val whereEff = partChild match {
      case Some(c) if where.trim.isEmpty => PgPartitions.whereSql(c)
      case Some(c) => s"(${where.trim}) AND ${PgPartitions.whereSql(c)}"
      case None => where
    }
    val idCol = idColOpt.getOrElse(
      CreatePgIndexCommand.resolveIdColumn(spark, resolved, col))
    val recipeOf = (n: String) => IndexCatalog.load(spark, n).map(m =>
      (m.source, m.params.getOrElse("sql_cols", ""),
        m.params.getOrElse("sql_am", ""), m.params.getOrElse("sql_opclass", ""),
        m.params.getOrElse("sql_options", ""),
        m.params.getOrElse("sql_where", "")))
    val target = (resolved, s"$idCol,$col", amEff, opclass, reloptStr,
      whereEff.trim)
    val name = nameOpt.getOrElse {
      val base = {
        val last =
          if (sourceIsTable) source.split("\\.").last
          else source.split("/").last.replaceAll("\\.[A-Za-z0-9]+$", "")
        (last.replaceAll("[^A-Za-z0-9_]", "_") + s"_${col}_idx")
          .replaceAll("^_+", "")
      }
      // PG-style uniquification: the bare name, then base1, base2, …;
      // an existing name with the IDENTICAL recipe is reused (create is
      // then the idempotent ensure)
      (Iterator(base) ++ Iterator.from(1).map(i => s"$base$i"))
        .take(1000)
        .find(n => recipeOf(n).forall(_ == target))
        .getOrElse(throw new IllegalStateException(
          s"could not generate a free index name from $base"))
    }
    if (ifNotExists && IndexCatalog.load(spark, name).isDefined) {
      SqlDdl.registerFromRecipe(spark, name)
      Seq(Row("exists"))
    } else Seq(Row(SqlDdl.create(spark, name, resolved, idCol, col, amEff,
      opclass, reloptStr, whereEff)))
  }
}

object CreatePgIndexCommand {
  /** The heap-TID analog: prefer a column literally named `id`, else
    * the FIRST integral-typed column that is not the vector column.
    * Auto-picks are INTEGRAL only — graph builds key on
    * col(id).cast("long"), where a double would silently truncate and a
    * string would null out. A PRESENT-but-wrong-typed `id` column errors
    * actionably rather than silently keying the index on some other
    * column (review finding); an explicit `WITH (id_col = …)` remains
    * the user's informed choice for any column the target kind accepts.
    * Metadata-only (one schema read). */
  private[index] def resolveIdColumn(spark: SparkSession, path: String,
      vecCol: String): String = {
    import org.apache.spark.sql.types.{IntegerType, LongType, ShortType}
    val schema = graft.ParquetCache.read(spark, path).schema
    val idTypes = Set[org.apache.spark.sql.types.DataType](IntegerType,
      LongType, ShortType)
    def ok(f: org.apache.spark.sql.types.StructField): Boolean =
      f.name != vecCol && idTypes.contains(f.dataType)
    schema.fields.find(_.name == "id") match {
      case Some(f) if ok(f) => f.name
      case Some(f) => throw new IllegalArgumentException(
        s"column `id` of $path has type ${f.dataType.catalogString} — " +
          "index ids must be integral (a cast to long would corrupt " +
          "them); spell the id column explicitly: WITH (id_col = '<column>')")
      case None => schema.fields.find(ok).map(_.name)
        .getOrElse(throw new IllegalArgumentException(
          s"cannot infer an id column for $path (no `id` column and no " +
            "integral-typed non-vector column) — spell it explicitly: " +
            "WITH (id_col = '<column>')"))
    }
  }
}

/** PG `DROP INDEX [IF EXISTS] name[, …]` — per-name, the
  * DROP VECTOR INDEX semantics (planner claim retired, shadowed
  * survivors re-registered). */
case class DropPgIndexCommand(names: Seq[String], ifExists: Boolean)
    extends VectorIndexCommand {
  override def run(spark: SparkSession): Seq[Row] =
    names.map(n => Row(GraftSqlParser.dropOne(spark, n, ifExists)))
}

/** PG `REINDEX INDEX [CONCURRENTLY] name` (reindex.slt) — the recipe
  * replay rebuild, identical to VACUUM VECTOR INDEX: a fresh generation
  * dir committed by one atomic pointer flip, readers served throughout
  * (blocking REINDEX and CONCURRENTLY collapse — builds here never
  * blocked readers in the first place). */
case class ReindexIndexCommand(name: String) extends VectorIndexCommand {
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(SqlDdl.vacuum(spark, name)))
}

/** PG `SET search_path TO ...` — recognized no-op (every slt file's
  * prologue; schema namespacing has no analog in a session-registered,
  * path-cataloged engine). */
case class SetSearchPathCommand() extends VectorIndexCommand {
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row("ok (search_path is a no-op here)"))
}

/** PG transaction-block statements (BEGIN / COMMIT / ABORT|ROLLBACK):
  * the session-scoped DDL journal behind tests/transaction/test.sql —
  * `BEGIN; CREATE INDEX ...; ABORT;` retracts the created index
  * ([[SqlTxn]]; scope and divergences documented there and in
  * CONFORMANCE's table). Mismatched COMMIT/ABORT and nested BEGIN
  * return PG's warning text instead of erroring, PG's own behavior. */
case class TxnCommand(kind: String) extends VectorIndexCommand {
  override def run(spark: SparkSession): Seq[Row] = Seq(Row(kind match {
    case "begin" => SqlTxn.begin(spark)
    case "commit" => SqlTxn.commit(spark)
    case _ => SqlTxn.abort(spark)
  }))
}

/** PG `SHOW <guc>` (compact_var.slt): one row, one column named after
  * the parameter (the PG shape), value in the PG spelling
  * ([[Gucs.showValue]] — bools print on/off). */
case class ShowGucCommand(key: String)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference(key, StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Gucs.showValue(spark, key)))
}

/** PG `VACUUM [FULL] [table]` (index_vacuum.slt): FULL rebuilds every
  * vector index carrying a complete SQL recipe — scoped to the table's
  * resolved location when one is named. Plain VACUUM is a no-op
  * success: Postgres plain vacuum never rebuilds indexes, and row
  * visibility here is versioned (tombstones), not dead-tuple-based.
  * Scala-created indexes (no recipe) are skipped and reported — their
  * vacuum path is the typed Scala API (IncrMaint.vacuum / reindex). */
case class VacuumTableCommand(full: Boolean, target: Option[String],
    isPath: Boolean) extends VectorIndexCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    SqlTxn.refuseInTxn(spark, "VACUUM")
    if (!full) return Seq(Row("ok (plain VACUUM reclaims nothing here — " +
      "visibility is versioned; use VACUUM FULL to rebuild indexes)"))
    val scope = target.map(t =>
      if (isPath) t
      else CreateVectorIndexCommand.resolveTableLocation(spark, t))
    val all = Option(new java.io.File(IndexCatalog.root(spark)).listFiles())
      .getOrElse(Array.empty)
      .filter(d => d.isDirectory &&
        new java.io.File(d, "MANIFEST.bin").isFile)
      .map(_.getName).sorted
      .flatMap(n => IndexCatalog.load(spark, n).map(n -> _))
      .filter { case (_, m) => scope.forall(_ == m.source) }
    val (withRecipe, without) = all.partition { case (_, m) =>
      Seq("sql_cols", "sql_am", "sql_opclass").forall(m.params.contains)
    }
    withRecipe.foreach { case (n, _) => SqlDdl.vacuum(spark, n) }
    val skipped =
      if (without.isEmpty) ""
      else s"; skipped ${without.length} without a SQL recipe"
    Seq(Row(s"ok (${withRecipe.length} reindexed$skipped)"))
  }
}
