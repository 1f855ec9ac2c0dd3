package graft.index

import org.apache.spark.sql.{Row, SparkSession}

/**
 * PG partitioned-table DDL (partition.slt:6-15):
 *
 * {{{
 * CREATE TABLE items (val vector(3), category_id int)
 *   PARTITION BY LIST(category_id);
 * CREATE TABLE id_123 PARTITION OF items FOR VALUES IN (1, 2, 3);
 * }}}
 *
 * The parent maps onto the native Spark analog — a Hive-layout
 * PARTITIONED BY parquet table (the engine's partitioned-parent index
 * machinery already reads exactly that layout). A PG list partition is
 * a separate table object bound to a value set; Spark has no sub-table
 * objects, so children register in a driver-side catalog mapping
 * `child -> (parent, values)` and `CREATE INDEX ON <child>` resolves to
 * the PARENT's location scoped by `partCol IN (values)` — a PARTIAL
 * index over the child's rows, which is precisely the Postgres
 * semantics of indexing one partition (and what the predicate-scoped
 * registration machinery already serves). Child registrations are
 * in-memory only: they are DDL aliases carrying no data (every row
 * lives in the parent's layout), so a restarted driver re-runs the
 * two CREATE statements — documented divergence from PG catalog
 * durability.
 *
 * Only LIST partitioning maps (`FOR VALUES IN`): RANGE/HASH bounds
 * error clearly rather than mis-map.
 */
object PgPartitions {
  case class Child(parent: String, partCol: String, values: Seq[String])

  private val children =
    new java.util.concurrent.ConcurrentHashMap[String, Child]()

  private def key(name: String): String = name.toLowerCase

  def register(name: String, c: Child): Unit = children.put(key(name), c)
  def resolve(name: String): Option[Child] = Option(children.get(key(name)))
  def drop(name: String): Boolean = children.remove(key(name)) != null

  /** The child's row scope as a predicate over the parent. */
  def whereSql(c: Child): String =
    s"${c.partCol} IN (${c.values.mkString(", ")})"
}

/** `CREATE TABLE t (cols) PARTITION BY LIST(col)` → the native
  * partitioned parquet table (`USING parquet PARTITIONED BY (col)`).
  * The column blob arrives AFTER the vector-type rewrite (tableTypes
  * runs on every CREATE TABLE before statement recognition), so
  * `vector(3)` columns are already storage-typed. */
case class CreatePartitionedTableCommand(ifNotExists: Boolean, name: String,
    colsBlob: String, kind: String, partCol: String)
    extends VectorIndexCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (!kind.equalsIgnoreCase("list"))
      throw new IllegalArgumentException(
        s"PARTITION BY ${kind.toUpperCase} is not supported — only LIST " +
          "partitioning maps onto the Hive-layout partitioned tables " +
          "this engine serves")
    val ine = if (ifNotExists) "IF NOT EXISTS " else ""
    spark.sql(s"CREATE TABLE $ine$name ($colsBlob) USING parquet " +
      s"PARTITIONED BY ($partCol)")
    Seq(Row("ok"))
  }
}

/** `CREATE TABLE child PARTITION OF parent FOR VALUES IN (...)` →
  * driver-side child registration (see [[PgPartitions]]). The parent
  * must be a partitioned table; its partition column comes from the
  * catalog, so the child's scope can never drift from the layout. */
case class CreatePartitionOfCommand(ifNotExists: Boolean, name: String,
    parent: String, valuesBlob: String) extends VectorIndexCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (ifNotExists && PgPartitions.resolve(name).isDefined)
      return Seq(Row("exists"))
    val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(parent)
    val id = parts match {
      case Seq(t) => org.apache.spark.sql.catalyst.TableIdentifier(t)
      case Seq(db, t) =>
        org.apache.spark.sql.catalyst.TableIdentifier(t, Some(db))
      case _ => throw new IllegalArgumentException(
        s"cannot resolve partition parent $parent")
    }
    val meta = spark.sessionState.catalog.getTableMetadata(id)
    val pcols = meta.partitionColumnNames
    if (pcols.length != 1)
      throw new IllegalArgumentException(
        s"""table "$parent" is not partitioned by one column — """ +
          "CREATE TABLE ... PARTITION OF needs a LIST-partitioned parent")
    val values = SqlDml.splitTopLevelCommas(valuesBlob).map(_.trim)
      .filter(_.nonEmpty)
    if (values.isEmpty) throw new IllegalArgumentException(
      "FOR VALUES IN (...) needs at least one value")
    PgPartitions.register(name,
      PgPartitions.Child(parent, pcols.head, values))
    Seq(Row("ok"))
  }
}

/** `DROP TABLE [IF EXISTS] a, b, c` — the PG multi-name spelling
  * (partition.slt:54 drops children and parent in one statement; Spark's
  * own DROP TABLE takes exactly one name, so the list form and
  * single-name drops of registered partition children are claimed;
  * everything else delegates). Children unregister; real tables drop
  * through Spark's own DDL. */
case class DropTablesCommand(ifExists: Boolean, names: Seq[String])
    extends VectorIndexCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val ine = if (ifExists) "IF EXISTS " else ""
    names.foreach { n =>
      if (!PgPartitions.drop(n)) spark.sql(s"DROP TABLE $ine$n")
    }
    Seq(Row(s"ok (${names.length} dropped)"))
  }
}
