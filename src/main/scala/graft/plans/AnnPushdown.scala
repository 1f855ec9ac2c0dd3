package graft.plans

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.functions.L2sqDistance
import graft.operators.IvfIndex

/**
 * Catalyst rewrite of `ORDER BY l2sq(vec, q) LIMIT k` over an indexed
 * source into the IVF partition-pruned index scan — the Spark analog of
 * the reference's index access method kicking in on
 * `ORDER BY val <-> q LIMIT k` (src/index/am.rs:105-133,
 * am_scan.rs:26-55; plan shape asserted by
 * tests/sqllogictest/pushdown_plan.slt).
 *
 * GUC analogs (src/gucs/executing.rs:4-23), read per query:
 *  - spark.graft.ann.enabled  (default false): master switch
 *  - spark.graft.ann.nprobe   (default 10): probed lists; = nlist → exact
 *
 * Tables opt in via [[AnnPushdown.register]], mapping the source parquet
 * path to a cataloged IVF index (a real engine would keep this in the
 * table catalog; the reference keeps it in pg_index).
 *
 * The replacement subtree is aliased back to the original output
 * exprIds, so parent operators resolve unchanged; results are identical
 * when nprobe = nlist and top-k approximate otherwise — exactly the
 * reference's contract.
 */
object AnnPushdown {

  case class IndexedTable(indexName: String, idCol: String, vecCol: String)

  private val registry = new ConcurrentHashMap[String, IndexedTable]()

  def register(sourcePath: String, t: IndexedTable): Unit =
    registry.put(normalize(sourcePath), t)

  def unregister(sourcePath: String): Unit =
    registry.remove(normalize(sourcePath))

  def lookup(paths: Seq[String]): Option[IndexedTable] =
    paths.map(normalize).flatMap(p => Option(registry.get(p))).headOption

  private def normalize(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")

  /** Install on a live session (extraOptimizations) — usable without
    * restart; GraftExtensions covers spark.sql.extensions wiring. */
  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[AnnRewriteRule]))
      spark.experimental.extraOptimizations = existing :+ AnnRewriteRule(spark)
  }

  def floatsOf(lit: Literal): Array[Float] = {
    val arr = lit.value.asInstanceOf[ArrayData]
    val out = new Array[Float](arr.numElements())
    var i = 0
    while (i < out.length) { out(i) = arr.getFloat(i); i += 1 }
    out
  }
}

/** spark.sql.extensions entry point: inject via
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(AnnRewriteRule)
}

case class AnnRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import AnnPushdown._

  private def enabled: Boolean =
    spark.conf.get("spark.graft.ann.enabled", "false").toBoolean
  private def nprobe: Int =
    spark.conf.get("spark.graft.ann.nprobe", "10").toInt

  /** Marker to stop the rule re-matching its own replacement. */
  private val RewrittenTag = org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean]("graft.ann.rewritten")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case gl @ GlobalLimit(Literal(k: Int, _),
          LocalLimit(_, s @ Sort(order, true, p @ Project(projList, rel), _)))
          if gl.getTagValue(RewrittenTag).isEmpty =>
        matchAnnTopK(k, order, projList, rel) match {
          case Some(rewritten) =>
            rewritten.setTagValue(RewrittenTag, true)
            rewritten
          case None => gl
        }
      // sphere predicate (strategy-2 "FOR SEARCH") pushdown: EXACT —
      // triangle-inequality list pruning + the same filter on top
      case p @ Project(projList, f @ Filter(cond, rel))
          if f.getTagValue(RewrittenTag).isEmpty =>
        matchRange(cond, rel) match {
          case Some(newChild) =>
            val nf = Filter(cond, newChild)
            nf.setTagValue(RewrittenTag, true)
            Project(projList, nf)
          case None => p
        }
    }
  }

  /** Filter shape: l2sq(vecAttr, queryLit) < radiusLit over an indexed
    * relation. Replacement keeps the exact filter; only the scan shrinks
    * (identical results by construction — no approximation). */
  private def matchRange(cond: Expression, rel: LogicalPlan): Option[LogicalPlan] = {
    if (!rel.isInstanceOf[LogicalRelation] &&
        !rel.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryRelation])
      return None
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    val (vecAttr, qLit, r2) = conjuncts(cond).collectFirst {
      case LessThan(L2sqDistance(v: AttributeReference, q: Literal),
          Literal(r: Double, _)) => (v, q, r)
    }.getOrElse(return None)
    val idx = lookup(pathsOf(rel)).getOrElse(return None)
    if (vecAttr.name != idx.vecCol) return None
    val manifest = graft.index.IndexCatalog.load(spark, idx.indexName)
      .getOrElse(return None)
    if (manifest.metric != "l2" || !manifest.floats.contains("radii"))
      return None
    val model = IvfIndex.Model(manifest.metric, manifest.centroids)
    val scan = IvfIndex.rangeScan(spark,
      graft.index.IndexCatalog.dataDir(spark, idx.indexName), model,
      manifest.floats("radii"), floatsOf(qLit), r2)
    val newPlan = scan.queryExecution.analyzed
    // remap old relation attrs to the new scan's outputs by name
    val byName = newPlan.output.map(a => a.name -> a).toMap
    val remap = rel.output.flatMap { old =>
      byName.get(old.name).map(n => Alias(n, old.name)(exprId = old.exprId))
    }
    if (remap.length != rel.output.length) return None
    Some(Project(remap, newPlan))
  }

  /** Source parquet paths of a leaf plan — sees through the cache
    * manager's InMemoryRelation substitution. */
  private def pathsOf(rel: LogicalPlan): Seq[String] = rel match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
      case _ => Nil
    }
    case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
      imr.cacheBuilder.cachedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toString)
      }.flatten
    case _ => Nil
  }

  /** Shape: Project(id, Alias(l2sq(vecAttr, queryLit)) AS dist) over an
    * indexed relation, sorted by dist (asc) first. */
  private def matchAnnTopK(k: Int, order: Seq[SortOrder],
      projList: Seq[NamedExpression], rel: LogicalPlan): Option[LogicalPlan] = {
    if (!rel.isInstanceOf[LogicalRelation] &&
        !rel.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryRelation])
      return None
    val idx = lookup(pathsOf(rel)).getOrElse(return None)
    // find the dist alias in the projection
    val distAlias = projList.collectFirst {
      case a @ Alias(L2sqDistance(v: AttributeReference, q: Literal), _)
          if v.name == idx.vecCol => (a, q)
    }.getOrElse(return None)
    val (alias, qLit) = distAlias
    // sort must lead with that alias ascending
    order.headOption match {
      case Some(SortOrder(attr: AttributeReference, Ascending, _, _))
          if attr.exprId == alias.exprId =>
      case _ => return None
    }
    val idAttr = projList.collectFirst {
      case a: AttributeReference if a.name == idx.idCol => a
    }.getOrElse(return None)
    // The replacement produces exactly (id, dist): bail if the projection
    // carries anything else, otherwise the rewrite would silently drop
    // columns / leave dangling exprIds for parents (matchRange's analog
    // of `remap.length == rel.output.length`).
    if (!projList.forall(ne =>
        ne.exprId == idAttr.exprId || ne.exprId == alias.exprId))
      return None

    val manifest = graft.index.IndexCatalog.load(spark, idx.indexName)
      .getOrElse(return None)
    val model = IvfIndex.Model(manifest.metric, manifest.centroids)
    val probes = math.min(math.max(nprobe, 1), model.nlist)
    val searchDf = IvfIndex.search(spark,
      graft.index.IndexCatalog.dataDir(spark, idx.indexName), model,
      idx.idCol, idx.vecCol, floatsOf(qLit), k, probes)
    val newPlan = searchDf.queryExecution.analyzed
    val Seq(newId, newDist) = newPlan.output
    // alias replacement output back to the original exprIds
    Some(Project(Seq(
      Alias(newId, idAttr.name)(exprId = idAttr.exprId),
      Alias(newDist, alias.name)(exprId = alias.exprId)), newPlan))
  }
}
