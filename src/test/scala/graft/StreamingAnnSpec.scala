package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Hnsw

/** Continuous ANN: a stream of query vectors answered per micro-batch
  * against the resident HNSW artifact (foreachBatch + searchIndexBatch —
  * the index loads once per executor via GraphCache, so steady-state
  * micro-batches do no artifact I/O). Results must be identical to the
  * batch entry point on the same queries. */
class StreamingAnnSpec extends SparkSpec {
  import spark.implicits._

  test("streamed query batches match batch searchIndexBatch exactly") {
    val path = graft.queries.AnnQueries.hnsw(spark, sf0001, parts = 1)
    val queries = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter($"vec_id" < 6)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toSeq

    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Array[Float])]
    val sink = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    val q = source.toDS().toDF("qid", "qv").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val qs = batch.select($"qid", $"qv").as[(Long, Array[Float])]
          .collect().toSeq
        if (qs.nonEmpty) {
          val res = Hnsw.searchIndexBatch(batch.sparkSession, path, "vec_id",
            qs, k = 10, exact = true)
          sink.synchronized {
            sink ++= res.select($"qid", $"vec_id", $"dist")
              .as[(Long, Long, Double)].collect()
          }
        }
        ()
      }.start()
    try {
      source.addData(queries.take(3): _*)
      q.processAllAvailable()
      source.addData(queries.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()

    val want = Hnsw.searchIndexBatch(spark, path, "vec_id", queries,
        k = 10, exact = true)
      .select($"qid", $"vec_id", $"dist").as[(Long, Long, Double)]
      .collect().toSet
    val got = sink.toSet
    assert(got == want,
      s"streamed ANN diverged: got ${got.size} rows want ${want.size}")
  }
}
