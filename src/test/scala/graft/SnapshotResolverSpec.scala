package graft

import java.io.File
import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.SparkSession

import graft.index.{IndexCatalog, TableSnapshotResolver}

/** A stand-in for a Delta/Iceberg snapshot resolver: owns ONE location
  * and serves whatever file list + version the spec staged — the shape
  * a provider-equipped cluster would implement over DeltaLog.snapshot.
  * Must be a top-level zero-arg class (reflection-instantiated from the
  * conf). */
class FakeSnapshotResolver extends TableSnapshotResolver {
  override def resolve(spark: SparkSession, location: String)
      : Option[TableSnapshotResolver.Snapshot] =
    if (location == FakeSnapshotResolver.location)
      Some(TableSnapshotResolver.Snapshot(
        FakeSnapshotResolver.files, FakeSnapshotResolver.version))
    else None
}

object FakeSnapshotResolver {
  @volatile var location: String = ""
  @volatile var files: Seq[String] = Nil
  @volatile var version: String = "v0"
}

/** The transactional-provider SPI seam (round 15): builds scan exactly
  * the resolver's snapshot file list (never the raw dir — it holds
  * stale/uncommitted files), the snapshot version joins the recipe so a
  * new commit forces REINDEX, and non-parquet catalog tables resolve
  * through the seam instead of erroring when a resolver owns them. */
class SnapshotResolverSpec extends SparkSpec {

  /** A "transactional" table dir: two parquet files side by side, only
    * one of which belongs to the committed snapshot. */
  private def stageTable(): (String, String, String) = {
    val dir = Files.createTempDirectory("graft_snapspec_").toFile
    val tableDir = new File(dir, "t"); tableDir.mkdirs()
    import spark.implicits._
    def onePartFile(ids: Range, stage: String): String = {
      val st = new File(dir, stage).getAbsolutePath
      ids.map(i => (i.toLong, Seq(i.toFloat, (i % 7).toFloat)))
        .toDF("id", "vec").coalesce(1).write.parquet(st)
      val part = new File(st).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).get
      val dst = new File(tableDir, s"$stage.parquet")
      Files.copy(part.toPath, dst.toPath, StandardCopyOption.REPLACE_EXISTING)
      dst.getAbsolutePath
    }
    val f1 = onePartFile(0 until 100, "f1")
    val f2 = onePartFile(100 until 200, "f2")
    (tableDir.getAbsolutePath, f1, f2)
  }

  test("builds scan the snapshot file list; a new commit forces REINDEX") {
    val (table, f1, f2) = stageTable()
    val name = "snapspec_idx"
    IndexCatalog.drop(spark, name)
    FakeSnapshotResolver.location = table
    FakeSnapshotResolver.files = Seq(f1)
    FakeSnapshotResolver.version = "v1"
    spark.conf.set(TableSnapshotResolver.ConfKey,
      classOf[FakeSnapshotResolver].getName)
    try {
      assert(spark.sql(s"""CREATE VECTOR INDEX $name ON '$table'
          USING vectors (id, vec vector_l2_ops)
          WITH (indexing = ivf, nlist = 2)""").head().getString(0) === "ok")
      val m1 = IndexCatalog.load(spark, name).get
      assert(m1.params.get("sql_snapshot").contains("v1"),
        "the snapshot version must join the recorded recipe")
      // the artifact holds ONLY the committed snapshot's rows — the raw
      // dir's second file (stale/uncommitted) must not leak in
      val rows1 = spark.read.parquet(IndexCatalog.dataDir(spark, name))
      assert(rows1.count() === 100L)
      assert(rows1.agg(org.apache.spark.sql.functions.max("id"))
        .head().getLong(0) < 100L)
      // idempotent re-CREATE at the same version: no rebuild
      assert(spark.sql(s"""CREATE VECTOR INDEX $name ON '$table'
          USING vectors (id, vec vector_l2_ops)
          WITH (indexing = ivf, nlist = 2)""").head().getString(0) === "ok")
      assert(IndexCatalog.load(spark, name).get.params.get("data_dir")
        === m1.params.get("data_dir"), "same snapshot must not rebuild")
      // a new commit: the version drift forces REINDEX and the rebuilt
      // artifact scans the NEW snapshot's files
      FakeSnapshotResolver.files = Seq(f1, f2)
      FakeSnapshotResolver.version = "v2"
      assert(spark.sql(s"""CREATE VECTOR INDEX $name ON '$table'
          USING vectors (id, vec vector_l2_ops)
          WITH (indexing = ivf, nlist = 2)""").head().getString(0) === "ok")
      val m2 = IndexCatalog.load(spark, name).get
      assert(m2.params.get("sql_snapshot").contains("v2"))
      assert(m2.params.get("data_dir") !== m1.params.get("data_dir"),
        "a new snapshot version must rebuild into a fresh generation")
      assert(spark.read.parquet(IndexCatalog.dataDir(spark, name))
        .count() === 200L)
      // VACUUM replays the recipe over the CURRENT snapshot and
      // refreshes the recorded version
      FakeSnapshotResolver.files = Seq(f2)
      FakeSnapshotResolver.version = "v3"
      assert(spark.sql(s"VACUUM VECTOR INDEX $name")
        .head().getString(0) === "ok")
      val m3 = IndexCatalog.load(spark, name).get
      assert(m3.params.get("sql_snapshot").contains("v3"))
      assert(spark.read.parquet(IndexCatalog.dataDir(spark, name))
        .count() === 100L)
      spark.sql(s"DROP VECTOR INDEX $name")
    } finally {
      spark.conf.unset(TableSnapshotResolver.ConfKey)
      FakeSnapshotResolver.location = ""
    }
  }

  test("non-parquet catalog tables resolve through the seam or refuse " +
      "with the conf pointer") {
    val (table, f1, _) = stageTable()
    spark.sql("DROP TABLE IF EXISTS snapspec_csv")
    // a non-parquet provider over the same location (never read through
    // the table itself — only its catalog metadata matters here)
    spark.sql(s"CREATE TABLE snapspec_csv (c STRING) USING csv LOCATION '$table'")
    val name = "snapspec_csv_idx"
    IndexCatalog.drop(spark, name)
    try {
      // unequipped: the refusal names the provider AND the SPI conf
      val e = intercept[Exception] {
        spark.sql(s"""CREATE VECTOR INDEX $name ON snapspec_csv
            USING vectors (id, vec vector_l2_ops)
            WITH (indexing = ivf, nlist = 2)""").collect()
      }
      assert(e.getMessage.contains("csv") &&
        e.getMessage.contains(TableSnapshotResolver.ConfKey), e.getMessage)
      // equipped and OWNED: the location resolves and the build scans
      // the snapshot
      FakeSnapshotResolver.location = table
      FakeSnapshotResolver.files = Seq(f1)
      FakeSnapshotResolver.version = "v1"
      spark.conf.set(TableSnapshotResolver.ConfKey,
        classOf[FakeSnapshotResolver].getName)
      try {
        assert(spark.sql(s"""CREATE VECTOR INDEX $name ON snapspec_csv
            USING vectors (id, vec vector_l2_ops)
            WITH (indexing = ivf, nlist = 2)""").head().getString(0) === "ok")
        val m = IndexCatalog.load(spark, name).get
        assert(m.source === table)
        assert(m.params.get("sql_snapshot").contains("v1"))
        assert(spark.read.parquet(IndexCatalog.dataDir(spark, name))
          .count() === 100L)
        spark.sql(s"DROP VECTOR INDEX $name")
      } finally {
        spark.conf.unset(TableSnapshotResolver.ConfKey)
        FakeSnapshotResolver.location = ""
      }
    } finally spark.sql("DROP TABLE IF EXISTS snapspec_csv")
  }
}
