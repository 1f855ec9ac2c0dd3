package graft.operators

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.ml.feature.{HashingTF, IDF, IDFModel, Normalizer, RegexTokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Batch text embedding — the engine-side analog of the reference's
 * `text2vec_openai` (finalize.sql:581-593, crates/embedding/src/openai.rs).
 * The reference calls a remote embedding API per batch; here the
 * embedding runs IN the engine as an MLlib pipeline (tokenize →
 * HashingTF → IDF → L2 normalize), which is the shape a 100 TB pipeline
 * needs: a fitted (small) model broadcast to executors, one distributed
 * pass, no per-row service calls.
 *
 * A remote-model variant would swap the transform step for a
 * mapPartitions batch-HTTP client with the same output contract
 * (doc_id, vector(dims), unit norm) — out of scope in this offline
 * environment.
 */
object Embed {

  case class Model(dims: Int, idf: IDFModel)

  private val cache = new ConcurrentHashMap[String, Model]()

  private def tokenize(dims: Int) = {
    val tok = new RegexTokenizer().setInputCol("text").setOutputCol("toks")
      .setPattern("\\s+")
    val tf = new HashingTF().setInputCol("toks").setOutputCol("tf")
      .setNumFeatures(dims)
    (tok, tf)
  }

  /** Fit the IDF stats over a corpus (the one "training" pass). */
  def fit(docs: DataFrame, textCol: String, dims: Int): Model = {
    val (tok, tf) = tokenize(dims)
    val tfDf = tf.transform(tok.transform(docs.withColumnRenamed(textCol, "text")))
    Model(dims, new IDF().setInputCol("tf").setOutputCol("emb").fit(tfDf))
  }

  /** Fit-once per (cache key), e.g. a data dir. */
  def fitCached(key: String, docs: => DataFrame, textCol: String, dims: Int): Model =
    cache.computeIfAbsent(key, _ => fit(docs, textCol, dims))

  /** Embed a document table: (idCol, textCol) -> (idCol, embedding
    * array<float> with unit L2 norm). */
  def transform(model: Model, docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val (tok, tf) = tokenize(model.dims)
    val tfDf = tf.transform(tok.transform(docs.withColumnRenamed(textCol, "text")))
    val norm = new Normalizer().setInputCol("emb").setOutputCol("unit").setP(2.0)
    norm.transform(model.idf.transform(tfDf))
      .select(col(idCol),
        vector_to_array(col("unit"), "float32").as("embedding"))
  }
}
