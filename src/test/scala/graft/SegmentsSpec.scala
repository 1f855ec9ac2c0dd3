package graft

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Segments

/** Segment lifecycle: init/append/delete/read snapshot semantics,
  * compaction equivalence (tests/sealing analog), manifest crash rule. */
class SegmentsSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft_seg_test").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  private def snapshot(dir: String): Set[(Long, Int, Long)] =
    Segments.read(spark, dir, "id")
      .select(col("id"), col("v"), col("_ver"))
      .as[(Long, Int, Long)].collect().toSet

  test("append shadows older versions; delete hides; compact preserves") {
    val dir = freshDir()
    val base = Seq((1L, 10), (2L, 20), (3L, 30), (4L, 40)).toDF("id", "v")
    Segments.init(spark, dir, base, "id")
    assert(snapshot(dir) == Set((1L, 10, 0L), (2L, 20, 0L), (3L, 30, 0L), (4L, 40, 0L)))

    // reinsert id 2 with a new value (shadow), insert new id 5
    Segments.append(spark, dir, Seq((2L, 21), (5L, 50)).toDF("id", "v"), "id")
    assert(snapshot(dir) == Set((1L, 10, 0L), (2L, 21, 1L), (3L, 30, 0L),
      (4L, 40, 0L), (5L, 50, 1L)))

    // delete ids 3 and 5 (hides both base and delta rows)
    Segments.delete(spark, dir, Seq(3L, 5L).toDF("id"), "id")
    assert(snapshot(dir) == Set((1L, 10, 0L), (2L, 21, 1L), (4L, 40, 0L)))

    // reinsert a deleted id: visible again at the higher version
    Segments.append(spark, dir, Seq((3L, 31)).toDF("id", "v"), "id")
    assert(snapshot(dir) == Set((1L, 10, 0L), (2L, 21, 1L), (4L, 40, 0L), (3L, 31, 3L)))

    // compaction folds to a fresh sealed generation with equal content
    val before = snapshot(dir).map { case (i, v, _) => (i, v) }
    Segments.compact(spark, dir, "id")
    assert(Segments.state(dir).gen == 1)
    assert(snapshot(dir).map { case (i, v, _) => (i, v) } == before)
    // growing segments and tombstones were folded away
    val names = new File(dir).listFiles().map(_.getName).toSet
    assert(!names.exists(_.startsWith("delta-")))
    assert(!names.exists(_.startsWith("tombs-")))
  }

  test("timer/count sealing policy (sealing_secs analog): due folds, " +
      "not-due leaves the pile, visible rows never change") {
    val dir = freshDir()
    Segments.init(spark, dir, Seq((1L, 10), (2L, 20)).toDF("id", "v"), "id")
    Segments.append(spark, dir, Seq((3L, 30)).toDF("id", "v"), "id")
    Segments.append(spark, dir, Seq((4L, 40)).toDF("id", "v"), "id")
    val visible = snapshot(dir).map { case (i, v, _) => (i, v) }
    def deltaCount = new File(dir).listFiles()
      .count(_.getName.startsWith("delta-"))
    assert(deltaCount == 2)
    // neither threshold met: nothing fires, pile untouched
    spark.conf.set("spark.graft.segments.sealingSecs", "3600")
    spark.conf.set("spark.graft.segments.maxDeltas", "64")
    try {
      assert(!Segments.sealIfDue(spark, dir, "id"))
      assert(deltaCount == 2)
      // count threshold met: fold fires, rows identical, pile gone
      spark.conf.set("spark.graft.segments.maxDeltas", "2")
      assert(Segments.sealIfDue(spark, dir, "id"))
      assert(deltaCount == 0)
      assert(snapshot(dir).map { case (i, v, _) => (i, v) } == visible)
      // age threshold: a fresh delta with sealingSecs=0 is due at once
      // (the trickle-stream case — ONE old small delta must still seal)
      Segments.append(spark, dir, Seq((5L, 50)).toDF("id", "v"), "id")
      spark.conf.set("spark.graft.segments.maxDeltas", "64")
      spark.conf.set("spark.graft.segments.sealingSecs", "0")
      assert(Segments.sealIfDue(spark, dir, "id"))
      assert(deltaCount == 0)
      assert(snapshot(dir).map { case (i, v, _) => (i, v) } ==
        visible + ((5L, 50)))
      // empty pile: never due
      assert(!Segments.sealIfDue(spark, dir, "id"))
    } finally {
      spark.conf.unset("spark.graft.segments.sealingSecs")
      spark.conf.unset("spark.graft.segments.maxDeltas")
    }
  }

  test("append past the growing cap auto-seals into multiple bounded deltas") {
    val dir = freshDir()
    spark.conf.set("spark.graft.segments.maxGrowingRows", "100")
    try {
      Segments.init(spark, dir,
        (0L until 50L).map(i => (i, 0)).toDF("id", "v"), "id")
      // 500 rows, cap 100 -> 5 sealed deltas; ids 0..49 shadow the base
      val last = Segments.append(spark, dir,
        (0L until 500L).map(i => (i, 1)).toDF("id", "v"), "id")
      assert(last == 5L)
      val deltas = new File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("delta-"))
        .map(_.getName).sorted
      assert(deltas.length == 5, deltas.mkString(","))
      // every delta respects the cap (hash split is ~even; allow 2x slack)
      deltas.foreach { d =>
        val n = spark.read.parquet(s"$dir/$d").count()
        assert(n > 0 && n <= 200, s"$d has $n rows")
      }
      // snapshot: every id visible exactly once, at the appended value
      val snap = Segments.read(spark, dir, "id")
        .select(col("id"), col("v")).as[(Long, Int)].collect()
      assert(snap.length == 500)
      assert(snap.forall(_._2 == 1), "a shadowed base row survived")
      // shadow tombstones hide base versions but not the new chunk's own
      val tombs = new File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("tombs-"))
      assert(tombs.length == 5)
      // a follow-up small append continues the sequence normally
      Segments.append(spark, dir, Seq((900L, 2)).toDF("id", "v"), "id")
      assert(Segments.state(dir).seq == 6L)
      assert(Segments.read(spark, dir, "id").count() == 501L)
    } finally spark.conf.unset("spark.graft.segments.maxGrowingRows")
  }

  test("uncommitted generation directory is ignored (crash rule)") {
    val dir = freshDir()
    Segments.init(spark, dir, Seq((1L, 10)).toDF("id", "v"), "id")
    // simulate a crash mid-compaction: data dir written, pointer not moved
    Seq((99L, 99)).toDF("id", "v").withColumn("_ver", lit(0L))
      .write.parquet(s"$dir/base-1")
    assert(Segments.state(dir).gen == 0)
    assert(snapshot(dir) == Set((1L, 10, 0L)))
    // a later successful compaction supersedes the orphan
    Segments.compact(spark, dir, "id")
    assert(snapshot(dir).map { case (i, v, _) => (i, v) } == Set((1L, 10)))
  }
}
