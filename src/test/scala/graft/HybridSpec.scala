package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{HybridSearch, IvfIndex, Segments}

/** Full mutable-store lifecycle: sealed IVF + growing deltas + deletes,
  * then seal (compaction) + reindex — search stays correct at each step
  * (the optimizing-thread contract, tests/sealing analog). */
class HybridSpec extends SparkSpec {
  import spark.implicits._

  test("hybrid search across append/delete/seal/reindex") {
    val segDir = Files.createTempDirectory("graft_hybrid_seg").toString
    val ivfDir = Files.createTempDirectory("graft_hybrid_ivf").toString
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q: Array[Float] = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray

    Segments.init(spark, segDir, emb, "vec_id")
    val model = IvfIndex.build(emb, "embedding", "l2", 8, ivfDir)

    def topIds(k: Int): Seq[Long] =
      HybridSearch.topkL2(spark, segDir, ivfDir, model, "vec_id", "embedding",
        q, k, nprobe = model.nlist)
        .select("vec_id").as[Long].collect().toSeq

    // appended rows equal to q dominate immediately (growing-scan path)
    val dups = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).crossJoin(Seq(9000L, 9001L, 9002L).toDF("vec_id"))
      .select(col("vec_id"), col("embedding"))
    Segments.append(spark, segDir, dups, "vec_id")
    assert(topIds(4) == Seq(0L, 9000L, 9001L, 9002L))

    // delete one delta row and the original: both vanish from top-k
    Segments.delete(spark, segDir,
      Seq(9001L, 0L).toDF("vec_id"), "vec_id")
    assert(topIds(2) == Seq(9000L, 9002L))

    // seal: compact, rebuild the index over the sealed generation
    Segments.compact(spark, segDir, "vec_id")
    val sealedRows = Segments.read(spark, segDir, "vec_id")
      .select(col("vec_id"), col("embedding"))
    val model2 = IvfIndex.build(sealedRows, "embedding", "l2", 8, ivfDir)
    def topIds2(k: Int): Seq[Long] =
      HybridSearch.topkL2(spark, segDir, ivfDir, model2, "vec_id", "embedding",
        q, k, nprobe = model2.nlist)
        .select("vec_id").as[Long].collect().toSeq
    assert(topIds2(2) == Seq(9000L, 9002L))

    // and the sealed store matches a brute-force over its own contents
    val brute = sealedRows
      .select(col("vec_id"), graft.functions.l2sq(col("embedding"),
        typedLit(q)).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSeq
    assert(topIds2(10) == brute)
  }
}
