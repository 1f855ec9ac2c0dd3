package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Scale plumbing the 100 TB deployment leans on: bucketed co-located
  * joins (no Exchange in the join plan) and salted skew joins (same
  * results, spread hot keys). */
class ScaleTechniquesSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle") {
    // warehouse dir is a static conf; use the session default and clean up
    spark.sql("DROP TABLE IF EXISTS emb_bucketed_a")
    spark.sql("DROP TABLE IF EXISTS emb_bucketed_b")
    try {
      val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      emb.write.bucketBy(4, "vec_id").sortBy("vec_id")
        .mode("overwrite").saveAsTable("emb_bucketed_a")
      emb.select(col("vec_id"), col("label").as("label_b"))
        .write.bucketBy(4, "vec_id").sortBy("vec_id")
        .mode("overwrite").saveAsTable("emb_bucketed_b")

      val joined = spark.table("emb_bucketed_a")
        .join(spark.table("emb_bucketed_b"), "vec_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == emb.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS emb_bucketed_a")
      spark.sql("DROP TABLE IF EXISTS emb_bucketed_b")
    }
  }

  test("salted join equals the plain join and spreads a hot key") {
    // heavily skewed left: 90% of rows share one key
    val left = spark.range(0, 2000)
      .select((when(col("id") % 10 =!= 0, lit(7)).otherwise(col("id") % 5))
        .as("k"), col("id").as("payload"))
    val right = Seq((0L, "a"), (1L, "b"), (2L, "c"), (7L, "hot"))
      .toDF("k", "v")
    val plain = left.join(right, "k")
      .select("k", "payload", "v").as[(Long, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(left, right, "k", salt = 8)
      .select("k", "payload", "v").as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == 7L) == 1800)
  }

  test("balanced spatial fleets: an oversized k-means cell splits " +
      "(round 15)") {
    import graft.operators.Hnsw
    import graft.index.IndexCatalog
    // 3 well-separated tight clusters sized 1200/400/400 at parts=3:
    // k-means puts one center per cluster (separation dominates SSE),
    // so the big cell is 1200 > 1.5x target(667) and must split into 2
    // sub-graphs -- 4 files total; a BALANCED layout keeps files ==
    // parts (the byte-identity-to-centroid3 contract is the
    // over.isEmpty path)
    val dims = 8
    val rnd = new scala.util.Random(7)
    val centers = Array(
      Array.tabulate(dims)(j => if (j == 0) 10f else 0f),
      Array.tabulate(dims)(j => if (j == 1) 10f else 0f),
      Array.tabulate(dims)(j => if (j == 2) 10f else 0f))
    val sizes = Seq(1200, 400, 400)
    val rows = sizes.zipWithIndex.flatMap { case (n, c) =>
      (0 until n).map { i =>
        (c * 10000L + i,
          centers(c).map(_ + 0.05f * rnd.nextGaussian().toFloat).toSeq)
      }
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_balspec_").toFile
    val src = new java.io.File(dir, "t").getAbsolutePath
    rows.toDF("id", "vec").write.parquet(src)
    val name = "balspec_fleet"
    IndexCatalog.drop(spark, name)
    val dataDir = Hnsw.ensure(spark, name,
      spark.read.parquet(src), src, "id", "vec", "l2", parts = 3,
      m = 8, efConstruction = 50)
    val files = Option(new java.io.File(dataDir).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.matches("graph-\\d+\\.bin")).sortBy(_.getName)
    assert(files.length === 4,
      s"oversized cell must split: ${files.map(_.getName).toSeq}")
    // no graph holds more than ~1.5x target rows (file size tracks rows)
    val maxB = files.map(_.length()).max
    val sumB = files.map(_.length()).sum
    assert(maxB.toDouble / sumB < 0.45,
      s"split failed to bound the largest graph: ${files.map(_.length()).toSeq}")
    // exact mode is the provable brute force over ALL graphs -- the
    // split must not change what exact search returns
    val q = centers(0).map(_ + 0.01f)
    val got = Hnsw.searchIndex(spark, dataDir, "id", q, 5, exact = true)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = rows.map { case (id, v) =>
      var s = 0.0
      var j = 0
      while (j < dims) { val d = v(j) - q(j); s += d * d; j += 1 }
      (id, s)
    }.sortBy(r => (r._2, r._1)).take(5)
    assert(got.map(_._1).toSet === brute.map(_._1).toSet,
      s"exact search drifted: $got vs $brute")
    // routed search probes sub-graphs through their own routing
    // entries: the nearest cluster's members are reachable at g=2
    val routed = Hnsw.searchIndex(spark, dataDir, "id", q, 5,
      probeGraphs = 2).collect().map(_.getLong(0)).toSet
    assert(routed === brute.map(_._1).toSet,
      s"routed search lost split-cell members: $routed")
    IndexCatalog.drop(spark, name)
  }

}
