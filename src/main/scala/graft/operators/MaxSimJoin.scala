package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/**
 * Table-valued MaxSim (late-interaction) retrieval JOIN — ColBERT-style
 * scoring where BOTH sides are multi-vector tables: query documents are
 * groups of `positions` token vectors, corpus documents groups of member
 * vectors, and score(qdoc, gid) = Σ_i max_j dot(q_i, d_j). The scalar
 * batch form (q_maxsim_ivf) bounds a driver collect at ≤ 4·k; this is
 * the no-driver-round-trip shape a training-corpus retrieval pass needs:
 * the query side stays a distributed table end to end.
 *
 * Reference anchor: the dot-product opclass the scalar MaxSim queries
 * build on (vector_dot_ops, finalize.sql:745-803); the PLAID-style
 * candidate generation mirrors q_maxsim_ivf (per-position IVF probes,
 * then exact rescoring of the bounded candidate set).
 *
 * Determinism contract (the q_maxsim_topk convention): per-position
 * maxes are order-insensitive; the final score is a FIXED left-assoc
 * sum m0+m1+...+m{P-1} mirrored exactly by the oracle's CASE chain —
 * never a variadic/aggregated sum.
 *
 * Scale shape: candidates come from ONE [[KnnJoin.join]] pass (codegen
 * probe-list assign → list_id equi-join → per-token window), gid dedup
 * is one shuffle on (qdoc, gid), and the rescore is two key-joins
 * (members on gid, query tokens on qdoc) into a single hash aggregate —
 * map-side partial maxes, no collect, no per-pair materialization
 * beyond the aggregate input.
 */
object MaxSimJoin {

  private def posMaxes(positions: Int) =
    (0 until positions).map(i =>
      max(when(col("qpos") === i, col("dotv"))).as(s"m$i"))

  /** Σ-of-maxes + per-qdoc top-k over (qdoc, gid, qpos, dotv) pair rows.
    * The sum is the fixed left-assoc chain (reduceLeft == the oracle's
    * m0 + m1 + ... CASE chain). A query doc that supplies FEWER than
    * `positions` token vectors (e.g. a null/non-finite token dropped by
    * the callers' finiteness filter) has a NULL per-position max, so its
    * left-assoc sum is NULL: those (qdoc, gid) rows are dropped — a
    * partial query doc never emits NULL-scored rows (the driver compare
    * is NULL-fragile, and a NULL score ranked after real ones is
    * silently wrong output). */
  private def scorePairs(pairs: DataFrame, positions: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mx = posMaxes(positions)
    val score = (0 until positions).map(i => col(s"m$i")).reduceLeft(_ + _)
    val w = Window.partitionBy(col("qdoc")).orderBy(col("score").desc, col("gid"))
    pairs
      .groupBy(col("qdoc"), col("gid")).agg(mx.head, mx.tail: _*)
      .select(col("qdoc"), col("gid"), score.as("score"))
      .filter(col("score").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  private def dotv(dv: org.apache.spark.sql.Column,
      qv: org.apache.spark.sql.Column) = -negdot(dv, qv)

  /** EXACT MaxSim join: every (query doc, corpus group) pair scored with
    * the full Σ-of-maxes kernel — the provable brute force and the
    * oracle contract of [[join]] (the nprobe=nlist analog: candidate
    * generation is skipped entirely because per-position top-k candidate
    * sets are NOT provably complete for a sum-of-maxes objective — a
    * group can win on the sum without any single position ranking it).
    * The query-token side broadcasts (exact mode is the gate/oracle
    * twin; the serving path is [[join]]). Returns (qdoc, gid, score, rn),
    * rn 1..k per qdoc, (score desc, gid)-tie-broken. */
  def joinExact(spark: SparkSession, queries: DataFrame, qdocCol: String,
      qposCol: String, qvecCol: String, positions: Int, corpus: DataFrame,
      gidCol: String, vecCol: String, k: Int): DataFrame = {
    val qs = queries
      .filter(col(qvecCol).isNotNull && vectorIsFinite(col(qvecCol)))
      .select(col(qdocCol).cast("long").as("qdoc"),
        col(qposCol).cast("int").as("qpos"), col(qvecCol).as("qv"))
    val members = corpus
      .filter(col(vecCol).isNotNull && vectorIsFinite(col(vecCol)))
      .select(col(gidCol).cast("long").as("gid"), col(vecCol).as("dv"))
    scorePairs(
      members.crossJoin(broadcast(qs))
        .select(col("qdoc"), col("gid"), col("qpos"),
          dotv(col("dv"), col("qv")).as("dotv")),
      positions, k)
  }

  /** Approximate (PLAID-style) MaxSim join over an IVF artifact:
    * per-position candidates from one [[KnnJoin.join]] pass (top
    * `kPerPos` per query token at `nprobe`), gids deduped per query doc,
    * then the bounded candidate set exactly rescored with the
    * Σ-of-maxes kernel. `corpus` supplies the (gidCol, idCol, vecCol)
    * member rows the artifact at `path` indexes — candidate hits outside
    * it (e.g. the query tokens themselves, when the artifact indexes
    * everything) drop out of the inner gid join. Approximate: recall vs
    * [[joinExact]] measured in RECALL.json/KnnJoinSpec; rows-only gate.
    * qdoc and qpos must be non-negative with qpos < positions. */
  def join(spark: SparkSession, queries: DataFrame, qdocCol: String,
      qposCol: String, qvecCol: String, positions: Int, path: String,
      model: IvfIndex.Model, corpus: DataFrame, gidCol: String,
      idCol: String, vecCol: String, k: Int, kPerPos: Int,
      nprobe: Int): DataFrame = {
    val qs = tokenQueries(queries, qdocCol, qposCol, qvecCol)
    val cand = KnnJoin.join(spark, tokens(qs, positions), "__mq", "qv",
      path, model, idCol, vecCol, k = kPerPos, nprobe = nprobe)
    rescore(cand, qs, positions, corpus, gidCol, idCol, vecCol, k)
  }

  /** Approximate MaxSim join over an HNSW-KIND artifact (round 11): the
    * same shape as [[join]] with the per-position candidate pass served
    * by [[Hnsw.knnJoin]] graph beams instead of IVF probes — a
    * graph-indexed corpus serves ColBERT retrieval without a parallel
    * IVF build. `probeGraphs` routes via the spatial sidecar
    * ([[Hnsw.AutoProbe]]-aware; exactness is never claimed — recall vs
    * [[joinExact]] in RECALL.json/KnnJoinSpec, rows-only gate). The
    * artifact's BUILD metric ranks candidates (for cos artifacts pass
    * caller-normalized token vectors, the knnJoin convention); the
    * rescore is always the exact Σ-of-maxes dot kernel. */
  def joinHnsw(spark: SparkSession, queries: DataFrame, qdocCol: String,
      qposCol: String, qvecCol: String, positions: Int, path: String,
      idCol: String, corpus: DataFrame, gidCol: String, vecCol: String,
      k: Int, kPerPos: Int, efSearch: Int = 100,
      probeGraphs: Int = 0): DataFrame = {
    val qs = tokenQueries(queries, qdocCol, qposCol, qvecCol)
    val cand = Hnsw.knnJoin(spark, path, idCol, tokens(qs, positions),
      "__mq", "qv", k = kPerPos, efSearch = efSearch,
      probeGraphs = probeGraphs)
    rescore(cand, qs, positions, corpus, gidCol, idCol, vecCol, k)
  }

  private def tokenQueries(queries: DataFrame, qdocCol: String,
      qposCol: String, qvecCol: String): DataFrame =
    queries
      .filter(col(qvecCol).isNotNull && vectorIsFinite(col(qvecCol)))
      .select(col(qdocCol).cast("long").as("qdoc"),
        col(qposCol).cast("int").as("qpos"), col(qvecCol).as("qv"))

  /** One unique token id per query row so the KNN joins' qid contract
    * holds; integral div recovers the doc. */
  private def tokens(qs: DataFrame, positions: Int): DataFrame =
    qs.select((col("qdoc") * positions + col("qpos")).as("__mq"), col("qv"))

  /** The shared bounded rescore: (qdoc, gid) dedup of the candidate
    * hits (hits outside `corpus` — e.g. indexed query tokens — drop via
    * the inner gid join), two key-joins into ONE hash aggregate with
    * map-side partial maxes, fixed-order Σ-of-maxes, per-qdoc window. */
  private def rescore(cand: DataFrame, qs: DataFrame, positions: Int,
      corpus: DataFrame, gidCol: String, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val idToGid = corpus.select(col(idCol),
      col(gidCol).cast("long").as("gid"))
    val candPairs = cand.join(idToGid, idCol)
      .select(org.apache.spark.sql.functions.expr(s"qid div $positions")
        .as("qdoc"), col("gid"))
      .distinct()
    val members = corpus
      .filter(col(vecCol).isNotNull && vectorIsFinite(col(vecCol)))
      .select(col(gidCol).cast("long").as("gid"), col(vecCol).as("dv"))
    scorePairs(
      candPairs.join(members, "gid").join(qs, "qdoc")
        .select(col("qdoc"), col("gid"), col("qpos"),
          dotv(col("dv"), col("qv")).as("dotv")),
      positions, k)
  }
}
