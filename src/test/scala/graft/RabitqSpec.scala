package graft

import org.apache.spark.sql.functions._
import graft.operators.Rabitq

/** RaBitQ-style quantizer: rotation orthogonality, exactness at full
  * window, estimator recall under windowed rerank. */
class RabitqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val q: Array[Float] =
    emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
  private lazy val model = Rabitq.train(emb, "embedding")
  private lazy val coded = emb.select(col("vec_id"), col("embedding"),
    Rabitq.encode(col("embedding"), model).as("code")).cache()

  private def flatTopk(k: Int): Seq[Long] =
    emb.select(col("vec_id"),
        graft.functions.l2sq(col("embedding"), typedLit(q)).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(k)
      .select(col("vec_id")).as[Long].collect().toSeq

  test("random rotation is orthogonal (preserves norms)") {
    val dims = model.dims
    val v = Array.tabulate(dims)(i => (i % 7 - 3).toFloat)
    val rv = model.rotate(v.zip(model.centroid).map { case (x, c) => x + c })
    val n1 = math.sqrt(v.map(x => x.toDouble * x).sum)
    val n2 = math.sqrt(rv.map(x => x * x).sum)
    assert(math.abs(n1 - n2) < 1e-4, s"$n1 vs $n2")
  }

  test("full-window rerank is exact") {
    val got = Rabitq.search(coded, "vec_id", "embedding", "code", q, 50,
      model, window = 0).select("vec_id").as[Long].collect().toSeq
    assert(got == flatTopk(50))
  }

  test("windowed rerank recall@50 >= 0.8 from 1-bit codes") {
    val got = Rabitq.search(coded, "vec_id", "embedding", "code", q, 50,
      model, window = 8).select("vec_id").as[Long].collect().toSet
    val truth = flatTopk(50).toSet
    val recall = (got & truth).size.toDouble / truth.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("error-bound rerank returns the exact top-k without a tuned window") {
    val got = Rabitq.searchBounded(coded, "vec_id", "embedding", "code",
      q, 50, model).select("vec_id").as[Long].collect().toSeq
    assert(got == flatTopk(50))
  }
}
