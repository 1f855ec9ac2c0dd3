package graft.index

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.OpDispatch
import graft.operators.Segments

/**
 * SQL `UPDATE` / `DELETE` / vector-literal `INSERT ... VALUES`
 * statements — the reference's row-lifecycle surface (update.slt:14
 * `UPDATE t SET val = ...`, :29 `DELETE FROM t WHERE ...`; the bare
 * `INSERT INTO t (val) VALUES ('[0.6,0.6,0.6]')` spelling every index
 * slt file uses). Postgres executes these against heap tuples; the
 * Spark-native analogs are:
 *
 *  - **Segment-store targets** (a quoted path whose dir carries the
 *    [[Segments]] VERSION pointer): UPDATE decomposes into the
 *    versioned DELETE + INSERT the engine's row lifecycle is built on
 *    (q_update_scan semantics) — matched rows are re-appended with the
 *    new values and the append's shadow tombstone hides the old
 *    versions; DELETE writes an id tombstone set. Only touched rows
 *    move — the 100 TB path: no table rewrite, incremental indexes see
 *    the change through their version filters.
 *  - **Catalog tables / plain parquet paths**: copy-on-write — the new
 *    table content (CASE WHEN on the predicate for UPDATE, the keep
 *    filter for DELETE) is materialized to a staging dir by a
 *    distributed write, then swapped in (INSERT OVERWRITE for tables,
 *    atomic-ish dir rename for paths). This is the correct general
 *    fallback without a transactional format: Postgres itself writes a
 *    new version of every updated tuple, and Delta's copy-on-write is
 *    the same shape at file granularity. Tables that need cheap
 *    updates at scale should live in a segment store.
 *
 * Predicate and assignment expressions parse through the session
 * parser, so the reference dialect (`val = '[0.1,0.1,0.1]'`,
 * `ORDER BY val <-> ...` subqueries) works inside them verbatim.
 * UPDATE matches rows where the predicate is TRUE (NULL keeps the old
 * value); DELETE removes rows where it is TRUE (NULL rows survive) —
 * the PG three-valued semantics.
 */
object SqlDml {

  // ---------------------------------------------------------------- text
  private def isIdentChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** Scan `s` outside quotes/backticks, tracking paren/bracket depth;
    * `f(i, depth)` is called at each unquoted position — return true to
    * stop and yield that index. */
  private def scan(s: String)(f: (Int, Int) => Boolean): Int = {
    var i = 0; var depth = 0
    var inQ = false; var inD = false; var inB = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else if (inD) { if (c == '"') inD = false }
      else if (inB) { if (c == '`') inB = false }
      else c match {
        case '\'' => inQ = true
        case '"' => inD = true
        case '`' => inB = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case _ => if (f(i, depth)) return i
      }
      i += 1
    }
    -1
  }

  /** First depth-0 word-bounded occurrence of `word` (case-insensitive)
    * outside quotes, or -1. */
  private[graft] def topLevelWord(s: String, word: String): Int =
    scan(s) { (i, depth) =>
      depth == 0 &&
        s.regionMatches(true, i, word, 0, word.length) &&
        (i == 0 || !isIdentChar(s.charAt(i - 1))) &&
        (i + word.length >= s.length || !isIdentChar(s.charAt(i + word.length)))
    }

  /** Split at depth-0 commas outside quotes. */
  private[graft] def splitTopLevelCommas(s: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var idx = 0
    while (idx >= 0) {
      val rest = s.substring(start)
      idx = scan(rest)((i, depth) => depth == 0 && rest.charAt(i) == ',')
      if (idx >= 0) { parts += rest.substring(0, idx); start += idx + 1 }
      else parts += rest
    }
    parts.toSeq
  }

  /** The SET blob of an UPDATE → (assignments, optional WHERE text):
    * split at the first depth-0 WHERE keyword (a WHERE inside a
    * parenthesized subquery never splits). */
  private[graft] def splitSetWhere(blob: String): (String, Option[String]) = {
    val i = topLevelWord(blob, "where")
    if (i < 0) (blob.trim, None)
    else (blob.substring(0, i).trim, Some(blob.substring(i + 5).trim))
  }

  /** `col = expr, col2 = expr2` → pairs; the assignment's `=` is the
    * first depth-0 one in each comma part. */
  private[graft] def parseAssignments(setPart: String): Seq[(String, String)] =
    splitTopLevelCommas(setPart).map { a =>
      val eq = scan(a)((i, depth) => depth == 0 && a.charAt(i) == '=')
      if (eq <= 0) throw new IllegalArgumentException(
        s"malformed SET assignment '${a.trim}' (expected column = expression)")
      val colRaw = a.substring(0, eq).trim
      val col = colRaw.stripPrefix("\"").stripSuffix("\"")
        .stripPrefix("`").stripSuffix("`")
      if (col.isEmpty) throw new IllegalArgumentException(
        s"malformed SET assignment '${a.trim}' (empty column name)")
      (col, a.substring(eq + 1).trim)
    }

  /** Is the trimmed cell one bare single-quoted string literal spanning
    * the whole cell ('' escapes respected)? */
  private[graft] def isBareStringLiteral(cell: String): Boolean = {
    val c = cell.trim
    if (c.length < 2 || c.charAt(0) != '\'') return false
    var i = 1
    while (i < c.length) {
      if (c.charAt(i) == '\'') {
        if (i + 1 < c.length && c.charAt(i + 1) == '\'') i += 2
        else return i == c.length - 1
      } else i += 1
    }
    false
  }

  private def literalBody(cell: String): String = {
    val c = cell.trim
    c.substring(1, c.length - 1).replace("''", "'").trim
  }

  /** Does a VALUES blob carry at least one bare string literal in the
    * reference's vector text shape (`'[...]'` dense/bvector,
    * `'{i:v}/d'` sparse)? Gates the INSERT claim — statements without
    * one delegate verbatim. */
  private[graft] def hasBareVectorLiteral(valuesBlob: String): Boolean =
    splitTuples(valuesBlob).exists(t => splitTopLevelCommas(t).exists { cell =>
      isBareStringLiteral(cell) && {
        val b = literalBody(cell)
        b.startsWith("[") || b.startsWith("{")
      }
    })

  /** `(a, b), (c, d)` → Seq("a, b", "c, d"). */
  private[graft] def splitTuples(valuesBlob: String): Seq[String] =
    splitTopLevelCommas(valuesBlob).map { t =>
      val s = t.trim
      if (!(s.startsWith("(") && s.endsWith(")")))
        throw new IllegalArgumentException(
          s"malformed VALUES tuple '$s' (expected parenthesized row)")
      s.substring(1, s.length - 1)
    }

  // ------------------------------------------------------------- typing
  /** Target column type → the `::`-cast dispatch function covering the
    * full conversion matrix (strings parse, vector kinds convert,
    * numeric arrays take the real[]→vector implicit). */
  private def familyCastFn(t: DataType): Option[String] =
    OpDispatch.family(t).map {
      case "dense" => "graft_cast_vector"
      case "f16" => "graft_cast_vecf16"
      case "svec" => "graft_cast_svector"
      case "bvec" => "graft_cast_bvector"
    }

  private def quote(n: String): String = "`" + n.replace("`", "``") + "`"

  /** The assignment value as a Column typed for its target field: same
    * type passes through; vector-typed targets convert through the
    * cast-dispatch function (so `SET val = '[1,2,3]'` parses like the
    * reference's implicit cast); anything else takes a plain cast. */
  private def valueColumn(df: DataFrame, f: StructField, txt: String): Column = {
    val raw = expr(txt)
    val vt = df.select(raw.as("_v")).schema.head.dataType
    if (vt.catalogString == f.dataType.catalogString) raw
    else familyCastFn(f.dataType) match {
      case Some(fn) => expr(s"$fn($txt)")
      case None => raw.cast(f.dataType)
    }
  }

  private def resolveField(df: DataFrame, name: String): StructField =
    df.schema.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(
        s"""column "$name" does not exist"""))

  /** TRUE-matching condition (PG semantics: NULL never matches). */
  private def matchCond(whereOpt: Option[String]): Column =
    whereOpt.map(w => coalesce(expr(w), lit(false))).getOrElse(lit(true))

  /** Full-row projection applying the assignments where `cond` holds. */
  private def updated(df: DataFrame, assigns: Seq[(String, String)],
      cond: Column): DataFrame = {
    val amap = assigns.map { case (n, t) =>
      resolveField(df, n).name -> t
    }.toMap
    val cols = df.schema.fields.map { f =>
      amap.get(f.name) match {
        case Some(txt) =>
          when(cond, valueColumn(df, f, txt))
            .otherwise(col(quote(f.name))).as(f.name)
        case None => col(quote(f.name))
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  // ---------------------------------------------------------- targets
  private def isSegmentStore(path: String): Boolean =
    new File(path, "VERSION").isFile

  /** Id column of a segment store (resolveIdColumn's policy on the base
    * generation's schema): case-insensitive `id` if integral — a
    * present-but-wrong-typed id ERRORS actionably rather than silently
    * tombstoning by an unrelated integral column — else the first
    * integral non-`_ver` column. */
  private def segIdCol(spark: SparkSession, dir: String): String = {
    val s = Segments.state(dir)
    val schema = graft.ParquetCache.read(spark, s"$dir/base-${s.gen}").schema
    val idTypes = Set[DataType](IntegerType, LongType, ShortType)
    schema.fields.find(_.name.equalsIgnoreCase("id")) match {
      case Some(f) if idTypes.contains(f.dataType) => f.name
      case Some(f) => throw new IllegalArgumentException(
        s"column `${f.name}` of segment store $dir has type " +
          s"${f.dataType.catalogString} — DML tombstones rows by an " +
          "integral id; store the key as an integral `id` column")
      case None => schema.fields.find(f => f.name != "_ver" &&
          idTypes.contains(f.dataType)).map(_.name)
        .getOrElse(throw new IllegalArgumentException(
          s"cannot infer an id column for segment store $dir (no `id` " +
            "column and no integral non-_ver column)"))
    }
  }

  private def rm(f: File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
    f.delete()
  }

  /** Table metadata guard: temp views and catalog views are not
    * updatable here. Returns nothing — errors are the output. */
  private def checkUpdatableTable(spark: SparkSession, table: String): Unit = {
    val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(table)
    val trimmed =
      if (parts.length == 3 && parts.head.equalsIgnoreCase("spark_catalog"))
        parts.tail
      else parts
    if (trimmed.length > 2) throw new IllegalArgumentException(
      s"cannot resolve $table — UPDATE/DELETE accept <table> or " +
        "<db>.<table> in the session catalog (or a quoted path)")
    val cat = spark.sessionState.catalog
    val id = trimmed match {
      case Seq(t) => org.apache.spark.sql.catalyst.TableIdentifier(t)
      case Seq(db, t) =>
        org.apache.spark.sql.catalyst.TableIdentifier(t, Some(db))
    }
    if (cat.isTempView(trimmed) ||
        cat.getTableMetadata(id).tableType ==
          org.apache.spark.sql.catalyst.catalog.CatalogTableType.VIEW)
      throw new IllegalArgumentException(
        s"""cannot UPDATE/DELETE view "$table" — target a table or a""" +
          " segment-store path")
  }

  // -------------------------------------------------------- execution
  /** One staged materialization: evaluate `out` exactly once into a tmp
    * dir and hand back the re-read frame (nondeterministic SET exprs —
    * update.slt's `random()` — must not be re-drawn between the store's
    * write passes). Caller must [[rm]] the returned dir. */
  private def stage(spark: SparkSession, out: DataFrame): (DataFrame, File) = {
    val dir = Files.createTempDirectory("graft_dml_").toFile
    val rows = new File(dir, "rows").getAbsolutePath
    out.write.parquet(rows)
    (graft.ParquetCache.read(spark, rows), dir)
  }

  /** Is every expression of `cond` deterministic once resolved against
    * `df`? Parsed predicate text is unresolved — determinism is only
    * knowable after analysis. */
  private def condDeterministic(df: DataFrame, cond: Column): Boolean =
    df.select(cond.as("_m")).queryExecution.analyzed.expressions
      .forall(_.deterministic)

  /** A column name free in `df` (case-insensitive) for the match flag. */
  private def freshCol(df: DataFrame, base: String): String =
    Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
      .find(n => !df.columns.exists(_.equalsIgnoreCase(n))).get

  /** `df` extended with a TRUE-match flag column — staged to disk first
    * when the predicate is nondeterministic, so the reported row count
    * and the rewritten content see ONE draw (the segment arm's
    * staging-once discipline, applied to the COW predicate). Returns
    * (frame, flag column, tmp dir to clean). */
  private def matchedFrame(spark: SparkSession, df: DataFrame,
      cond: Column): (DataFrame, String, Option[File]) = {
    val flag = freshCol(df, "_graft_matched")
    val flagged = df.withColumn(flag, cond)
    if (condDeterministic(df, cond)) (flagged, flag, None)
    else { val (s, t) = stage(spark, flagged); (s, flag, Some(t)) }
  }

  /** Path-COW crash recovery: a crash between [[swapIn]]'s two moves
    * leaves the data stranded in `<path>.graft-cow-old` with NO dir at
    * the target — restore it before touching the path. */
  private def recoverCow(target: String): Unit = {
    val oldDir = new File(target + ".graft-cow-old")
    if (oldDir.isDirectory && !new File(target).exists())
      Files.move(oldDir.toPath, new File(target).toPath)
  }

  def update(spark: SparkSession, target: String, isPath: Boolean,
      setBlob: String): String = {
    val (setPart, whereOpt) = splitSetWhere(setBlob)
    val assigns = parseAssignments(setPart)
    if (isPath) recoverCow(target)
    if (isPath && isSegmentStore(target)) {
      // scale path: only matched rows move. The MATCHED ORIGINALS are
      // staged once (one evaluation of the predicate — nondeterministic
      // exprs must not re-draw), then the update is the explicit
      // DELETE + INSERT decomposition: tombstone the OLD ids, append
      // the new rows at a younger version. The explicit delete matters
      // when an assignment REASSIGNS the id column — the append's
      // shadow tombstone only covers the NEW ids, and relying on it
      // alone would leave the old row visible.
      val idCol = segIdCol(spark, target)
      val visible = Segments.read(spark, target, idCol).drop("_ver")
      val matched = visible.filter(matchCond(whereOpt))
      val (staged, tmp) = stage(spark, matched)
      try {
        val n = staged.count()
        if (n > 0) {
          // assignments evaluated exactly once too (append runs several
          // passes over its input; a nondeterministic SET must not
          // re-draw between the delta write and the shadow tombstone)
          val (stagedNew, tmp2) = stage(spark,
            updated(staged, assigns, lit(true)))
          try {
            Segments.delete(spark, target,
              staged.select(col(quote(idCol))), idCol)
            Segments.append(spark, target, stagedNew, idCol)
          } finally rm(tmp2)
        }
        s"ok ($n rows updated)"
      } finally rm(tmp)
    } else {
      // copy-on-write rewrite (see the object doc): staged distributed
      // write, then swap; the match flag is staged once when the
      // predicate is nondeterministic
      val df = if (isPath) graft.ParquetCache.read(spark, target)
        else { checkUpdatableTable(spark, target); spark.table(target) }
      val (frame, flag, tmpOpt) = matchedFrame(spark, df, matchCond(whereOpt))
      try {
        val n = frame.filter(col(quote(flag))).count()
        val out = updated(frame, assigns, col(quote(flag))).drop(flag)
        swapIn(spark, target, isPath, df, out)
        s"ok ($n rows updated)"
      } finally tmpOpt.foreach(rm)
    }
  }

  def delete(spark: SparkSession, target: String, isPath: Boolean,
      whereOpt: Option[String]): String = {
    if (isPath) recoverCow(target)
    if (isPath && isSegmentStore(target)) {
      val idCol = segIdCol(spark, target)
      val visible = Segments.read(spark, target, idCol)
      val (staged, tmp) = stage(spark,
        visible.filter(matchCond(whereOpt)).select(col(quote(idCol))))
      try {
        val n = staged.count()
        if (n > 0) Segments.delete(spark, target, staged, idCol)
        s"ok ($n rows deleted)"
      } finally rm(tmp)
    } else {
      val df = if (isPath) graft.ParquetCache.read(spark, target)
        else { checkUpdatableTable(spark, target); spark.table(target) }
      val (frame, flag, tmpOpt) = matchedFrame(spark, df, matchCond(whereOpt))
      try {
        val n = frame.filter(col(quote(flag))).count()
        swapIn(spark, target, isPath, df,
          frame.filter(!col(quote(flag))).drop(flag))
        s"ok ($n rows deleted)"
      } finally tmpOpt.foreach(rm)
    }
  }

  /** Hive partition columns of a path-read frame (discovered layout) —
    * the COW rewrite must re-write WITH them or the swapped-in dir
    * silently loses its layout (data-equivalent, but partition pruning
    * is gone — a scale regression, not a correctness one). */
  private def pathPartitionCols(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.partitionSchema.fieldNames.toSeq
          case _ => Seq.empty[String]
        }
    }.getOrElse(Seq.empty)

  /** Replace the target's content with `out`: INSERT OVERWRITE for
    * catalog tables (Spark's own staged truncate-and-write; the table
    * definition carries its partitioning), dir rename for paths. The
    * path swap is two moves, not one atomic op: new content is written
    * fully before either move, so a crash never leaves a half-written
    * table, but a crash BETWEEN the moves leaves no dir at the target
    * with the old data intact in `<path>.graft-cow-old` — the next DML
    * statement on that path restores it ([[recoverCow]]). Discovered
    * Hive partition columns are preserved. */
  private def swapIn(spark: SparkSession, target: String, isPath: Boolean,
      src: DataFrame, out: DataFrame): Unit = {
    if (isPath) {
      val tmpDir = new File(target + ".graft-cow-tmp")
      val oldDir = new File(target + ".graft-cow-old")
      rm(tmpDir); rm(oldDir)
      val pcols = pathPartitionCols(src)
      out.write.partitionBy(pcols: _*).parquet(tmpDir.getAbsolutePath)
      Files.move(new File(target).toPath, oldDir.toPath)
      Files.move(tmpDir.toPath, new File(target).toPath)
      rm(oldDir)
    } else {
      // dynamic partition overwrite only replaces partitions PRESENT in
      // the new content — a DELETE that empties a partition would
      // silently resurrect its old files. Pin static around the swap.
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prior = spark.conf.getOption(key)
      spark.conf.set(key, "static")
      try {
        val (staged, tmp) = stage(spark, out)
        try staged.write.mode("overwrite").insertInto(target)
        finally rm(tmp)
      } finally prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** Vector-literal INSERT: rebuild the statement with each bare string
    * literal destined for a vector-typed column wrapped in the family's
    * cast-dispatch function, then parse the rebuilt text through the
    * DELEGATE parser — the claim's job is done, and a bare `[...]` or
    * `{...}` literal that targets a NON-vector column (JSON/array-shaped
    * text into a string) survives the rebuild verbatim, so re-parsing
    * through GraftSqlParser would re-claim the identical statement and
    * recurse forever. Non-vector cells and columns pass through
    * untouched. */
  def insertValues(spark: SparkSession, table: String,
      colList: Option[Seq[String]], valuesBlob: String): String = {
    val df = spark.table(table)
    val targets: Seq[StructField] = colList match {
      case Some(names) => names.map(resolveField(df, _))
      case None => df.schema.fields.toSeq
    }
    val tuples = splitTuples(valuesBlob)
    val rebuilt = tuples.map { t =>
      val cells = splitTopLevelCommas(t)
      if (cells.length != targets.length)
        throw new IllegalArgumentException(
          s"INSERT has ${cells.length} expressions but ${targets.length} " +
            "target columns")
      cells.zip(targets).map { case (cell, f) =>
        familyCastFn(f.dataType) match {
          case Some(fn) if isBareStringLiteral(cell) && {
            val b = literalBody(cell)
            b.startsWith("[") || b.startsWith("{")
          } => s"$fn(${cell.trim})"
          case _ => cell.trim
        }
      }.mkString("(", ", ", ")")
    }.mkString(", ")
    val colSql = colList.map(_.map(quote).mkString(" (", ", ", ")"))
      .getOrElse("")
    val stmt = s"INSERT INTO $table$colSql VALUES $rebuilt"
    val parser = spark.sessionState.sqlParser match {
      case g: GraftSqlParser => g.delegateParser
      case p => p
    }
    org.apache.spark.sql.graftshim.Shims.ofRows(spark, parser.parsePlan(stmt))
      .collect()
    s"ok (${tuples.length} rows)"
  }
}

/** `UPDATE <table|'path'> SET col = expr[, ...] [WHERE pred]`. */
case class UpdateDmlCommand(target: String, isPath: Boolean,
    setBlob: String) extends VectorIndexCommand {
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(SqlDml.update(spark, target, isPath, setBlob)))
}

/** `DELETE FROM <table|'path'> [WHERE pred]`. */
case class DeleteDmlCommand(target: String, isPath: Boolean,
    whereOpt: Option[String]) extends VectorIndexCommand {
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(SqlDml.delete(spark, target, isPath, whereOpt)))
}

/** `INSERT INTO t [(cols)] VALUES (...)` with at least one bare vector
  * text literal (the slt spelling) — claimed only then; every other
  * INSERT delegates verbatim. */
case class InsertVectorValuesCommand(table: String,
    colList: Option[Seq[String]], valuesBlob: String)
    extends VectorIndexCommand {
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(SqlDml.insertValues(spark, table, colList, valuesBlob)))
}
