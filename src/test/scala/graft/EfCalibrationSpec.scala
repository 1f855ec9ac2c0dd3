package graft

import org.apache.spark.sql.functions._
import graft.operators.Hnsw
import graft.index.IndexCatalog

/** Beam-breadth calibration (round 17, ef_cal=efcal2): the 768-dim
  * smoke measured recall@10 = 0.50 at the fixed ef=100 default on
  * near-uniform high-dim clouds (distance concentration), recovering
  * monotonically along the ef ladder; calibration measures the needed
  * breadth at build and serves it as the UNSET default — explicit
  * efSearch/confs bypass, and easy corpora calibrate to <= 100 so their
  * served breadth is unchanged. */
class EfCalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("easy corpus calibrates to <= 100: served default unchanged") {
    val name = "efcalspec_easy"
    IndexCatalog.drop(spark, name)
    val src = s"$sf0001/embeddings.parquet"
    val dir = Hnsw.ensure(spark, name,
      spark.read.parquet(src).select(col("vec_id"), col("embedding")),
      src, "vec_id", "embedding", "l2", parts = 1)
    val m = IndexCatalog.load(spark, name).get
    assert(m.params.get("ef_cal").contains(Hnsw.EfCalGen))
    val hint = m.params("ef_hint").toInt
    assert(Hnsw.EfLadder.contains(hint), s"hint $hint not on the ladder")
    assert(hint <= 100,
      s"the 500-row clustered fixture must calibrate easy, got $hint")
    assert(Hnsw.resolveEf(dir, Hnsw.AutoEf) == 100,
      "served default must stay the 100 floor on easy corpora")
    IndexCatalog.drop(spark, name)
  }

  test("tie-heavy payloads don't blow up (distance recall, not id recall)") {
    // 200 rows of ONLY 4 distinct binarized-style vectors: id-set
    // recall can never agree under such ties (the efcal1 lesson — a
    // bvec fixture calibrated to the ladder max on pure ties); the
    // distance statistic must stay at the ladder floor
    val name = "efcalspec_ties"
    IndexCatalog.drop(spark, name)
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_efcal_ties").toString
    spark.range(200).select(col("id").as("vec_id"),
      array((0 until 8).map(j =>
        when(col("id") % 4 === j % 4, 1f).otherwise(0f)): _*)
        .as("embedding"))
      .write.mode("overwrite").parquet(srcDir)
    Hnsw.ensure(spark, name,
      spark.read.parquet(srcDir), srcDir, "vec_id", "embedding", "l2",
      parts = 1)
    val hint = IndexCatalog.load(spark, name).get.params("ef_hint").toInt
    assert(hint == Hnsw.EfLadder.head,
      s"pure ties must calibrate to the ladder floor, got $hint")
    IndexCatalog.drop(spark, name)
  }

  test("resolution: explicit wins, AUTO consults the hint, reset recalibrates") {
    val name = "efcalspec_resolve"
    IndexCatalog.drop(spark, name)
    val src = s"$sf0001/embeddings.parquet"
    val dir = Hnsw.ensure(spark, name,
      spark.read.parquet(src).select(col("vec_id"), col("embedding")),
      src, "vec_id", "embedding", "l2", parts = 1)
    assert(Hnsw.resolveEf(dir, 250) == 250, "explicit ef must bypass")
    // the ef_hint is a live-alterable option (the probe_hint surface)
    IndexCatalog.alter(spark, name, "ef_hint", "777")
    assert(Hnsw.resolveEf(dir, Hnsw.AutoEf) == 777)
    assert(Hnsw.resolveEf(dir, 250) == 250)
    // RESET drops ef_cal too, so the NEXT ensure recalibrates instead
    // of serving a hint-less calibrated claim
    IndexCatalog.resetAll(spark, name, Seq("ef_hint"))
    assert(Hnsw.resolveEf(dir, Hnsw.AutoEf) == 100)
    assert(!IndexCatalog.load(spark, name).get.params.contains("ef_cal"))
    Hnsw.ensure(spark, name,
      spark.read.parquet(src).select(col("vec_id"), col("embedding")),
      src, "vec_id", "embedding", "l2", parts = 1)
    val m2 = IndexCatalog.load(spark, name).get
    assert(m2.params.get("ef_cal").contains(Hnsw.EfCalGen) &&
      m2.params.contains("ef_hint"),
      "the post-reset ensure must recalibrate")
    // an artifact with NO adjacent manifest resolves to the floor
    assert(Hnsw.resolveEf("/tmp/graft_nonexistent_artifact/data",
      Hnsw.AutoEf) == 100)
    IndexCatalog.drop(spark, name)
  }
}
