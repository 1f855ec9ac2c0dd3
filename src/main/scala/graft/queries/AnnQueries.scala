package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.{Hnsw, IvfIndex, SparseSearch, Sq8}

/**
 * ANN search paths (SURVEY §2.6): IVF (partition-pruned index table),
 * HNSW (per-partition graphs), SQ8 quantized two-stage rerank, and the
 * sparse inverted-index top-k.
 *
 * Exactness contract mirrors the reference's test corpus (BASELINE §3):
 * ANN queries assert "returns exactly k rows" (rows-only oracle omitted);
 * recall@k vs the flat oracle is measured in AnnSpec. The sparse
 * inverted-index search is EXACT and ships a full DuckDB oracle.
 */
object AnnQueries {
  import Tables.t

  private val lock = new Object
  private val ivfCache = scala.collection.mutable.Map.empty[String, IvfIndex.Model]
  private val sq8Cache = scala.collection.mutable.Map.empty[String, (Array[Float], Array[Float])]

  private def ivfPath(dir: String, metric: String) =
    s"${sys.props("java.io.tmpdir")}/graft_ivf_${dir.replaceAll("[^a-zA-Z0-9]", "_")}_$metric"

  /** Build-or-reuse the IVF index artifact for a testdata dir. */
  def ivfModel(s: SparkSession, dir: String, metric: String): IvfIndex.Model =
    lock.synchronized {
      ivfCache.getOrElseUpdate(dir + metric, {
        val e = t(s, dir, "embeddings")
        IvfIndex.build(e, "embedding", metric, nlist = 16, ivfPath(dir, metric))
      })
    }

  private def qvec(s: SparkSession, dir: String): Array[Float] =
    t(s, dir, "embeddings").filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray

  private def sparsify(c: org.apache.spark.sql.Column) =
    transform(c, x => when(abs(x) > lit(0.15), x).otherwise(lit(0.0f)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // IVF: centroid ranking -> partition pruning -> exact rerank
    "q_ivf_topk_l2" -> ((s, d) => {
      val m = ivfModel(s, d, "l2")
      IvfIndex.search(s, ivfPath(d, "l2"), m, "vec_id", "embedding",
        qvec(s, d), k = 100, nprobe = 10)
    }),
    "q_ivf_topk_cos" -> ((s, d) => {
      val m = ivfModel(s, d, "cos")
      IvfIndex.search(s, ivfPath(d, "cos"), m, "vec_id", "embedding",
        qvec(s, d), k = 100, nprobe = 10)
    }),

    // HNSW: per-partition graphs, global ordered merge
    "q_hnsw_topk_l2" -> ((s, d) => {
      Hnsw.topk(t(s, d, "embeddings").repartition(4), "vec_id", "embedding",
        "l2", qvec(s, d), k = 100)
    }),

    // SQ8: coarse code scan -> rerank window -> exact top-k
    "q_sq8_topk_l2" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val (mins, widths) = lock.synchronized {
        sq8Cache.getOrElseUpdate(d, Sq8.train(e, "embedding"))
      }
      val encoded = e.withColumn("codes", Sq8.encode(col("embedding"), mins, widths))
      Sq8.search(encoded, "vec_id", "embedding", "codes", qvec(s, d),
        k = 100, mins, widths)
    }),

    // Sparse inverted index: EXACT, full oracle
    "q_sparse_topk" -> ((s, d) => {
      val docs = t(s, d, "embeddings")
        .select(col("vec_id"), svecFromDense(sparsify(col("embedding"))).as("sv"))
      val postings = SparseSearch.buildPostings(docs, "vec_id", "sv")
      val qTerms = docs.filter(col("vec_id") === 0)
        .select(col("sv.indexes"), col("sv.values")).head()
      val terms = qTerms.getSeq[Int](0).zip(qTerms.getSeq[Float](1))
      SparseSearch.search(postings, "vec_id", terms, k = 50)
    })
  )

  private val spD = "list_transform(d.embedding, x -> CASE WHEN abs(x) > CAST(0.15 AS DOUBLE) THEN x ELSE CAST(0 AS FLOAT) END)"
  private val spQ = "list_transform(q.embedding, x -> CASE WHEN abs(x) > CAST(0.15 AS DOUBLE) THEN x ELSE CAST(0 AS FLOAT) END)"

  val oracles: Map[String, String] = Map(
    "q_sparse_topk" ->
      s"""SELECT d.vec_id AS vec_id,
          list_aggregate(list_transform(list_zip($spD, $spQ), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') AS score
          FROM embeddings d CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
          WHERE len(list_filter(list_zip($spD, $spQ), p -> p[1] <> 0 AND p[2] <> 0)) > 0
          ORDER BY score DESC, vec_id LIMIT 50"""
  )
}
