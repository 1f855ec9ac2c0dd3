package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.index.SqlDml
import graft.operators.Segments

/** SQL UPDATE / DELETE / vector-literal INSERT statements (SqlDml):
  * text-scanner laws, the copy-on-write path arm, and the segment-store
  * arm (tombstone delete, shadow-append update). The catalog-table COW
  * arm and the INSERT cast wrapping run in SltConformanceSpec's
  * update.slt lifecycle. */
class SqlDmlSpec extends SparkSpec {

  test("scanner: SET/WHERE split ignores subquery WHEREs and quoted text") {
    val (set1, w1) = SqlDml.splitSetWhere(
      "a = (SELECT x FROM t WHERE y = 1), b = 'where' WHERE c = 2")
    assert(set1 === "a = (SELECT x FROM t WHERE y = 1), b = 'where'")
    assert(w1 === Some("c = 2"))
    val (set2, w2) = SqlDml.splitSetWhere("a = 1")
    assert(set2 === "a = 1" && w2.isEmpty)
    // assignments: first top-level '=' splits; commas inside parens and
    // strings never split
    val as = SqlDml.parseAssignments(
      "a = array(1, 2), b = 'x,y', c = (SELECT max(v) FROM t WHERE k = 1)")
    assert(as === Seq("a" -> "array(1, 2)", "b" -> "'x,y'",
      "c" -> "(SELECT max(v) FROM t WHERE k = 1)"))
    intercept[IllegalArgumentException] {
      SqlDml.parseAssignments("no_equals_here")
    }
  }

  test("scanner: bare string literals and the INSERT claim guard") {
    assert(SqlDml.isBareStringLiteral("'[1,2,3]'"))
    assert(SqlDml.isBareStringLiteral(" '{0:1}/3' "))
    assert(SqlDml.isBareStringLiteral("'it''s quoted'"))
    assert(!SqlDml.isBareStringLiteral("f('[1]')"))
    assert(!SqlDml.isBareStringLiteral("'a' || 'b'"))
    assert(SqlDml.hasBareVectorLiteral("(1, '[0.1,0.2]'), (2, '[0.3,0.4]')"))
    assert(SqlDml.hasBareVectorLiteral("('{0:1}/4')"))
    assert(!SqlDml.hasBareVectorLiteral("(1, 'plain text'), (2, NULL)"))
    assert(!SqlDml.hasBareVectorLiteral("(1, 2.5)"))
  }

  test("plain parquet path: UPDATE and DELETE rewrite copy-on-write") {
    val dir = Files.createTempDirectory("graft_dmlspec_").toFile
    val p = new File(dir, "t").getAbsolutePath
    import spark.implicits._
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")
      .write.parquet(p)
    assert(spark.sql(s"UPDATE '$p' SET v = v + 1 WHERE id >= 2")
      .head().getString(0) === "ok (2 rows updated)")
    assert(spark.read.parquet(p).orderBy("id").as[(Long, Double)]
      .collect().toSeq === Seq((1L, 10.0), (2L, 21.0), (3L, 31.0)))
    assert(spark.sql(s"DELETE FROM '$p' WHERE v > 25")
      .head().getString(0) === "ok (1 rows deleted)")
    assert(spark.read.parquet(p).orderBy("id").as[(Long, Double)]
      .collect().toSeq === Seq((1L, 10.0), (2L, 21.0)))
    // a NULL predicate row survives DELETE and keeps its value on
    // UPDATE (PG three-valued semantics)
    val p2 = new File(dir, "t2").getAbsolutePath
    Seq((1L, Some(5.0)), (2L, None)).toDF("id", "v").write.parquet(p2)
    assert(spark.sql(s"DELETE FROM '$p2' WHERE v < 100")
      .head().getString(0) === "ok (1 rows deleted)")
    assert(spark.read.parquet(p2).select("id").as[Long].collect().toSeq ===
      Seq(2L))
  }

  test("segment-store path: DELETE tombstones, UPDATE shadow-appends") {
    val dir = Files.createTempDirectory("graft_dmlspec_seg_").toFile
    val store = new File(dir, "store").getAbsolutePath
    import spark.implicits._
    val base = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 1f)))
      .toDF("id", "vec")
    Segments.init(spark, store, base, "id")
    assert(spark.sql(s"DELETE FROM '$store' WHERE id = 3")
      .head().getString(0) === "ok (1 rows deleted)")
    // only a tombstone moved: base dir untouched, visible set shrinks
    assert(Segments.read(spark, store, "id").count() === 2L)
    assert(spark.sql(
      s"UPDATE '$store' SET vec = array(CAST(9 AS FLOAT), CAST(9 AS FLOAT)) WHERE id = 2")
      .head().getString(0) === "ok (1 rows updated)")
    val vis = Segments.read(spark, store, "id")
      .select("id", "vec").as[(Long, Seq[Float])].collect().toMap
    assert(vis.keySet === Set(1L, 2L))
    assert(vis(2L) === Seq(9f, 9f))
    // the old version is hidden, not rewritten: base-0 still holds 3 rows
    assert(spark.read.parquet(s"$store/base-0").count() === 3L)
    // ID REASSIGNMENT: the explicit delete+append decomposition must
    // tombstone the OLD id — the append's shadow tombstone only covers
    // the new one, and without the delete the old row stays visible
    assert(spark.sql(s"UPDATE '$store' SET id = 42 WHERE id = 1")
      .head().getString(0) === "ok (1 rows updated)")
    val ids = Segments.read(spark, store, "id")
      .select("id").as[Long].collect().toSet
    assert(ids === Set(2L, 42L), s"old id must be hidden, got $ids")
  }

  test("path COW preserves discovered Hive partition layout") {
    val dir = Files.createTempDirectory("graft_dmlspec_part_").toFile
    val p = new File(dir, "t").getAbsolutePath
    import spark.implicits._
    Seq((1L, 10.0, 1), (2L, 20.0, 1), (3L, 30.0, 2))
      .toDF("id", "v", "part").write.partitionBy("part").parquet(p)
    assert(spark.sql(s"UPDATE '$p' SET v = v + 1 WHERE id = 2")
      .head().getString(0) === "ok (1 rows updated)")
    // the partition dirs survive the rewrite (pruning stays possible)
    assert(new File(p, "part=1").isDirectory && new File(p, "part=2").isDirectory)
    val rows = spark.read.parquet(p).orderBy("id")
      .select("id", "v", "part").as[(Long, Double, Int)].collect().toSeq
    assert(rows === Seq((1L, 10.0, 1), (2L, 21.0, 1), (3L, 30.0, 2)))
  }

  test("EXPLAIN UPDATE/DELETE plans the command, writes nothing") {
    val dir = Files.createTempDirectory("graft_dmlspec_ex_").toFile
    val p = new File(dir, "t").getAbsolutePath
    import spark.implicits._
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v").write.parquet(p)
    val before = spark.read.parquet(p).as[(Long, Double)].collect().toSet
    val plan = spark.sql(s"EXPLAIN UPDATE '$p' SET v = 99 WHERE id = 1")
      .head().getString(0)
    assert(plan.contains("UpdateDmlCommand"), plan)
    val plan2 = spark.sql(s"EXPLAIN DELETE FROM '$p' WHERE id = 1")
      .head().getString(0)
    assert(plan2.contains("DeleteDmlCommand"), plan2)
    assert(spark.read.parquet(p).as[(Long, Double)].collect().toSet === before)
  }

  test("vector-literal SET values and typed-column INSERTs parse by family") {
    spark.sql("DROP TABLE IF EXISTS dmlspec_vec")
    SqlDmlSpec.rmWarehouse(spark, "dmlspec_vec")
    // dense storage column: a bare string literal assignment goes
    // through the family cast (the PG implicit-cast shape)
    spark.sql("CREATE TABLE dmlspec_vec (id BIGINT, val vector(3))")
    spark.sql("INSERT INTO dmlspec_vec VALUES (1, array(1.0f, 2.0f, 3.0f))")
    assert(spark.sql("UPDATE dmlspec_vec SET val = '[9,8,7]' WHERE id = 1")
      .head().getString(0) === "ok (1 rows updated)")
    assert(spark.table("dmlspec_vec").head().getSeq[Float](1) ===
      Seq(9f, 8f, 7f))
    // WHERE-less DELETE empties the table (PG semantics)
    assert(spark.sql("DELETE FROM dmlspec_vec").head().getString(0) ===
      "ok (1 rows deleted)")
    assert(spark.table("dmlspec_vec").count() === 0L)
    spark.sql("DROP TABLE dmlspec_vec")
    // svector struct column: the INSERT claim wraps the sparse literal
    // in graft_cast_svector
    spark.sql("DROP TABLE IF EXISTS dmlspec_sv")
    SqlDmlSpec.rmWarehouse(spark, "dmlspec_sv")
    spark.sql("CREATE TABLE dmlspec_sv (id BIGINT, val svector(3))")
    assert(spark.sql("INSERT INTO dmlspec_sv VALUES (1, '{1:5}/3')")
      .head().getString(0).startsWith("ok"))
    assert(spark.sql("SELECT svec_to_dense(val) FROM dmlspec_sv")
      .head().getSeq[Float](0) === Seq(0f, 5f, 0f))
    spark.sql("DROP TABLE dmlspec_sv")
  }

  test("claimed INSERT with bracket-shaped TEXT cells terminates") {
    // the claim fires on any bare '[...]'/'{...}' string literal, but
    // only cells whose TARGET column is vector-typed get wrapped — a
    // JSON/array-shaped literal into a STRING column survives the
    // rebuild verbatim, and re-parsing through GraftSqlParser would
    // re-claim the identical statement forever (ADVICE round 15). The
    // rebuilt text must go through the delegate parser.
    spark.sql("DROP TABLE IF EXISTS dmlspec_json")
    SqlDmlSpec.rmWarehouse(spark, "dmlspec_json")
    spark.sql("CREATE TABLE dmlspec_json (id BIGINT, s STRING)")
    // zero cells wrapped: previously an infinite parse loop
    spark.sql("""INSERT INTO dmlspec_json VALUES (1, '{"a": 1}')""")
    spark.sql("INSERT INTO dmlspec_json (id, s) VALUES (2, '[note]')")
    assert(spark.table("dmlspec_json").orderBy("id")
      .collect().map(_.getString(1)).toSeq === Seq("""{"a": 1}""", "[note]"))
    spark.sql("DROP TABLE dmlspec_json")
    // mixed: the vector cell wraps, the string cell stays bare — must
    // still terminate and keep the string verbatim
    spark.sql("DROP TABLE IF EXISTS dmlspec_mixed")
    SqlDmlSpec.rmWarehouse(spark, "dmlspec_mixed")
    spark.sql("CREATE TABLE dmlspec_mixed (id BIGINT, val vector(2), s STRING)")
    assert(spark.sql(
      "INSERT INTO dmlspec_mixed VALUES (1, '[1,2]', '[tag]')")
      .head().getString(0).startsWith("ok"))
    val r = spark.table("dmlspec_mixed").head()
    assert(r.getSeq[Float](1) === Seq(1f, 2f) && r.getString(2) === "[tag]")
    spark.sql("DROP TABLE dmlspec_mixed")
  }

  test("table COW pins static partition overwrite for the swap") {
    // under dynamic partition overwrite, INSERT OVERWRITE only replaces
    // partitions PRESENT in the new content — a DELETE that empties a
    // partition would resurrect its old files
    spark.sql("DROP TABLE IF EXISTS dmlspec_dyn")
    SqlDmlSpec.rmWarehouse(spark, "dmlspec_dyn")
    spark.sql(
      "CREATE TABLE dmlspec_dyn (id BIGINT, v DOUBLE) PARTITIONED BY (part INT)")
    spark.sql("INSERT INTO dmlspec_dyn VALUES (1, 1.0, 1), (2, 2.0, 2)")
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try {
      assert(spark.sql("DELETE FROM dmlspec_dyn WHERE part = 2")
        .head().getString(0) === "ok (1 rows deleted)")
      assert(spark.table("dmlspec_dyn").select("id")
        .collect().map(_.getLong(0)).toSeq === Seq(1L),
        "emptied partition must not resurrect")
      // the session's own conf choice is restored after the swap
      assert(spark.conf.get(key) === "dynamic")
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    spark.sql("DROP TABLE dmlspec_dyn")
  }

  test("path COW: a crash between the two swap moves is recovered") {
    val dir = Files.createTempDirectory("graft_dmlspec_crash_").toFile
    val p = new File(dir, "t").getAbsolutePath
    import spark.implicits._
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v").write.parquet(p)
    // simulate the crash window: target moved aside, second move never ran
    Files.move(new File(p).toPath, new File(p + ".graft-cow-old").toPath)
    assert(!new File(p).exists())
    assert(spark.sql(s"DELETE FROM '$p' WHERE id = 2")
      .head().getString(0) === "ok (1 rows deleted)")
    assert(spark.read.parquet(p).select("id").as[Long].collect().toSeq ===
      Seq(1L))
    assert(!new File(p + ".graft-cow-old").exists())
  }

  test("COW nondeterministic predicate: one draw for count AND content") {
    val dir = Files.createTempDirectory("graft_dmlspec_rand_").toFile
    val p = new File(dir, "t").getAbsolutePath
    import spark.implicits._
    (1L to 200L).map(i => (i, 0.0)).toDF("id", "v").write.parquet(p)
    // rand() is nondeterministic even seeded — without the staged match
    // flag, the count job and the rewrite job draw independently and the
    // reported count disagrees with the rows actually changed
    val msg = spark.sql(s"UPDATE '$p' SET v = -1.0 WHERE rand(7) < 0.5")
      .head().getString(0)
    val n = msg.stripPrefix("ok (").stripSuffix(" rows updated)").toLong
    val changed = spark.read.parquet(p).filter(col("v") === -1.0).count()
    assert(changed === n, s"reported $n but changed $changed")
    assert(n > 0 && n < 200, s"degenerate draw n=$n")
  }

  test("segment store with non-integral id errors actionably") {
    val dir = Files.createTempDirectory("graft_dmlspec_badid_").toFile
    val store = new File(dir, "store").getAbsolutePath
    import spark.implicits._
    Segments.init(spark, store,
      Seq(("a", 1.0), ("b", 2.0)).toDF("id", "v"), "id")
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"DELETE FROM '$store' WHERE v = 1.0").collect()
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("plain INSERT statements delegate (claim guard)") {
    spark.sql("DROP TABLE IF EXISTS dmlspec_plain")
    SqlDmlSpec.rmWarehouse(spark, "dmlspec_plain")
    spark.sql("CREATE TABLE dmlspec_plain (id BIGINT, s STRING)")
    // no vector literal -> delegates to Spark's own INSERT
    spark.sql("INSERT INTO dmlspec_plain VALUES (1, 'plain text')")
    assert(spark.table("dmlspec_plain").count() === 1L)
    spark.sql("DROP TABLE dmlspec_plain")
  }
}

object SqlDmlSpec {
  /** Managed-table debris from a crashed prior run (warehouse dir
    * without a catalog entry) blocks CREATE TABLE. */
  def rmWarehouse(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    def rm(f: File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(new File(wh, table))
  }
}
