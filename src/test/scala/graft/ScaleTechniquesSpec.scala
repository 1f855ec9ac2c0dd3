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
}
