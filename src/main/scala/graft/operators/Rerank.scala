package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Candidate re-fetch for two-stage quantized search (the reranker-heap
 * analog, crates/quantization/src/reranker/flat.rs): the coarse stage
 * ranks ids over the (small) code column only; this fetches the raw
 * vectors for just those ids with an IN predicate that reaches the
 * parquet scan — on id-sorted/bucketed data that's row-group pruning,
 * not a second full read.
 */
object Rerank {
  /** indexed: full table (id, vec, codes...); candidates: (id, ...).
    * The driver-side collect here is LOAD-BEARINGLY bounded: callers pass
    * at most k·window candidate ids (≤ a few hundred) — never feed an
    * unbounded frame through this. */
  def fetchByIds(indexed: DataFrame, idCol: String, vecCol: String,
      candidates: DataFrame): DataFrame = {
    val ids = candidates.select(col(idCol)).collect().map(_.get(0)).toIndexedSeq
    indexed.filter(col(idCol).isin(ids: _*)).select(col(idCol), col(vecCol))
  }
}
