package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation utilities for hot join keys (the classic salting
 * pattern; AQE's skew-join split handles sort-merge cases at runtime,
 * salting covers the planned-shape cases AQE can't touch, e.g. hot
 * posting-list tokens or hot dedup buckets joined against a large side).
 *
 * `saltedJoin` splits each hot left key across `salt` sub-keys and
 * replicates the (smaller) right side once per sub-key: the hot key's
 * rows spread over `salt` tasks instead of one straggler, and the join
 * result is exactly the plain join's.
 */
object Skew {

  /** Inner-join `left` and `right` on `key`, spreading each left key
    * over `salt` partitions. `right` is replicated `salt`× — use when
    * right is the smaller side but too big (or too skew-prone) to
    * broadcast whole. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(salt)))
    val saltedRight = right
      .withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }
}
