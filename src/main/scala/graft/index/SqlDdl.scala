package graft.index

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** SQL-text index DDL — the reference's CREATE INDEX surface
  * (`CREATE ACCESS METHOD vectors` finalize.sql:714; ambuild
  * src/index/am.rs:135-244; every slt file drives index creation as SQL)
  * exposed as spark.sql functions on the admin-UDF precedent
  * ([[graft.functions]] registerAll: literal args constant-fold, so the
  * catalog work runs driver-side exactly once per execution):
  *
  * {{{
  * SELECT create_vector_index('idx', '/data/t.parquet', 'id', 'vec',
  *                            'hnsw', 'vector_l2_ops', 'm=12,ef_construction=300')
  * SELECT vacuum_vector_index('idx')
  * }}}
  *
  * `method` is the access-method spelling ([[IndexOptions.accessMethod]]:
  * the native `vectors` AM plus the pgvector-compatibility `hnsw` /
  * `ivfflat`); `opclass` the full opclass matrix
  * ([[IndexOptions.opclass]]); `options` the comma-separated reloptions
  * in either spelling (`lists` ≡ `nlist`), plus the native extensions
  * `parts` (graph-fleet width) and — under the `vectors` AM — `indexing`
  * (`hnsw` | `ivf`, the reference's `[indexing.*]` TOML section, default
  * hnsw). Creation is idempotent ensure semantics: an existing
  * non-stale artifact with the same params is a no-op, the reference's
  * re-CREATE behavior under the catalog.
  *
  * The SQL path records `sql_cols` / `sql_am` / `sql_opclass` manifest
  * params so [[vacuum]] can reconstruct the build from the name alone
  * (the reference's VACUUM knows its table from the pg catalog; a
  * path-based catalog must remember the columns itself). Those params
  * are informational — searches never read them, and ensure-built
  * artifacts are otherwise manifest-identical.
  */
object SqlDdl {

  /** Parse "k=v, k=v" reloptions; blank → empty. */
  private[index] def parseOpts(options: String): Map[String, String] = {
    val s = Option(options).getOrElse("").trim
    if (s.isEmpty) Map.empty
    else s.split(',').map { kv =>
      kv.split('=') match {
        case Array(k, v) => k.trim -> v.trim
        case _ => throw new IllegalArgumentException(
          s"malformed index option '$kv' (expected key=value)")
      }
    }.toMap
  }

  /** CREATE INDEX as SQL text. Returns "ok". */
  def create(spark: SparkSession, name: String, source: String,
      idCol: String, vecCol: String, method: String, opclassName: String,
      options: String): String = {
    val am = IndexOptions.accessMethod(method)
    val (family, metric) = IndexOptions.opclass(opclassName, am)
    val opts = parseOpts(options)
    val indexing = am match {
      case "hnsw" => "hnsw"
      case "ivfflat" => "ivf"
      case _ => opts.getOrElse("indexing", "hnsw") match {
        case k @ ("hnsw" | "ivf") => k
        case "flat" => throw new IllegalArgumentException(
          "indexing=flat is the unindexed exact scan — nothing to create")
        case other => throw new IllegalArgumentException(
          s"unknown indexing kind: $other (expected hnsw or ivf)")
      }
    }
    val parts = opts.get("parts").map(_.trim.toInt).getOrElse(1)
    val rest = opts - "indexing" - "parts"
    def df = spark.read.parquet(source)
    (family, indexing) match {
      case ("dense", "hnsw") =>
        graft.operators.Hnsw.ensure(spark, name, df, source, idCol, vecCol,
          metric, parts, rest)
      case ("dense", "ivf") =>
        graft.operators.IvfIndex.ensure(spark, name, df, source, vecCol,
          metric, rest)
      // typed IVF opclasses: one artifact per type family, the metric is
      // a search-time choice (TypedAnn convention) — validated above
      case ("bvec", "ivf") =>
        graft.operators.TypedAnn.ensureBvec(spark, name, df, source,
          idCol, vecCol, nlist = IndexOptions.ivf(rest))
      case ("f16", "ivf") =>
        graft.operators.TypedAnn.ensureF16(spark, name, df, source,
          idCol, vecCol, nlist = IndexOptions.ivf(rest))
      case ("svec", "ivf") =>
        // pushdown-registered svec artifacts store their CSR column as
        // "sv" = svec_from_dense(col), the value-identity convention
        graft.operators.TypedAnn.ensureSvec(spark, name,
          df.select(col(idCol),
            graft.functions.svecFromDense(col(vecCol)).as("sv")),
          source, idCol, "sv", nlist = IndexOptions.ivf(rest))
      // typed opclasses under the hnsw AM: graphs over the family's
      // DENSIFIED view (l2 on the view IS the family metric or its
      // search-time override) — the declarative-closure conventions
      case ("bvec", "hnsw") =>
        graft.operators.Hnsw.ensure(spark, name,
          df.select(col(idCol), graft.functions.bvecToDense(
            graft.functions.binarize(col(vecCol))).as("bv01")),
          source, idCol, "bv01", "l2", parts, rest)
      case ("f16", "hnsw") =>
        graft.operators.Hnsw.ensure(spark, name,
          df.select(col(idCol), graft.functions.f16ToVector(
            graft.functions.toF16Bits(col(vecCol))).as("v16")),
          source, idCol, "v16", "l2", parts, rest)
      case ("svec", "hnsw") =>
        graft.operators.Hnsw.ensure(spark, name,
          df.select(col(idCol), graft.functions.svecToDense(
            graft.functions.svecFromDense(col(vecCol))).as("dv")),
          source, idCol, "dv", "l2", parts, rest)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported (opclass family, indexing) combination: $other")
    }
    // record what vacuum needs to reconstruct the build; alter goes
    // through commit (atomic rename) under the DDL lock
    IndexCatalog.alter(spark, name, "sql_cols", s"$idCol,$vecCol")
    IndexCatalog.alter(spark, name, "sql_am", am)
    IndexCatalog.alter(spark, name, "sql_opclass", opclassName)
    "ok"
  }

  /** VACUUM as SQL text: rebuild the artifact from its current source,
    * reclaiming rows deleted from it. Dense artifacts rebuild through
    * REINDEX (fresh generation dir + one atomic pointer swap — readers
    * keep serving throughout, the CONCURRENTLY property); typed-family
    * artifacts rebuild via drop + re-create (no reindex path — a brief
    * no-index window, documented). Requires the index to have been
    * created via [[create]] (the sql_* params carry the reconstruction
    * recipe). Returns "ok". */
  def vacuum(spark: SparkSession, name: String): String = {
    val m = IndexCatalog.load(spark, name).getOrElse(
      throw new IllegalArgumentException(s"no such index: $name"))
    val cols = m.params.getOrElse("sql_cols", throw new IllegalArgumentException(
      s"index $name was not created via create_vector_index — " +
        "vacuum via the Scala API (reindex / IncrMaint.vacuum)"))
    val Array(idCol, vecCol) = cols.split(',')
    val am = m.params.getOrElse("sql_am", "vectors")
    val opclassName = m.params.getOrElse("sql_opclass", "vector_l2_ops")
    val (family, _) = IndexOptions.opclass(opclassName, am)
    def df = spark.read.parquet(m.source)
    (family, m.kind) match {
      case ("dense", "hnsw") =>
        graft.operators.Hnsw.reindex(spark, name, df, m.source, idCol,
          vecCol, m.metric,
          m.params.getOrElse("parts", "1").toInt,
          m.params.getOrElse("m", "12").toInt,
          m.params.getOrElse("ef_construction", "300").toInt)
      case ("dense", "ivf") =>
        graft.operators.IvfIndex.reindex(spark, name, df, m.source,
          vecCol, m.metric, m.params.getOrElse("nlist", "16").toInt)
      case _ =>
        // typed families and densified-view graphs: rebuild through the
        // same dispatch that created them
        val opts = Seq(
          m.params.get("m").map("m=" + _),
          m.params.get("ef_construction").map("ef_construction=" + _),
          m.params.get("nlist").map("nlist=" + _),
          m.params.get("parts").map("parts=" + _)).flatten.mkString(",")
        IndexCatalog.drop(spark, name)
        create(spark, name, m.source, idCol, vecCol, am, opclassName, opts)
    }
    // reindex/rebuild manifests come from the family builders and drop
    // the sql_* recipe — restore it so vacuum stays repeatable
    IndexCatalog.alter(spark, name, "sql_cols", cols)
    IndexCatalog.alter(spark, name, "sql_am", am)
    IndexCatalog.alter(spark, name, "sql_opclass", opclassName)
    "ok"
  }
}
