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
 * DURABLE (round 15, closing the partition.slt durability divergence):
 * they persist as one commit-after-write registry file under
 * `spark.graft.index.root` (`_pg_partitions.bin` — the MANIFEST.bin
 * serialization convention, written to `.tmp` then atomically renamed)
 * and lazily reload per root, so a restarted driver still resolves
 * `CREATE INDEX ON <child>` like PG's durable catalog does. In-memory
 * state stays authoritative within a session; the file is the
 * restart-recovery source. Writers (register/drop) serialize across
 * PROCESSES through the catalog's `.locks/` file-lease convention
 * (round 16, closing the last-write-wins hazard: two drivers
 * registering children concurrently could drop each other's write) and
 * MERGE the committed file under the lock before persisting, so
 * another driver's children survive this one's commit. Reads stay
 * lock-free on the lazily-loaded in-memory map.
 *
 * Only LIST partitioning maps (`FOR VALUES IN`): RANGE/HASH bounds
 * error clearly rather than mis-map.
 */
object PgPartitions {
  case class Child(parent: String, partCol: String, values: Seq[String])

  // key: <root>|<lowercased child name> — sessions with different
  // index roots never see each other's aliases
  private val children =
    new java.util.concurrent.ConcurrentHashMap[String, Child]()
  private val loadedRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val ioLock = new Object

  private def file(root: String) =
    new java.io.File(root, "_pg_partitions.bin")

  private def key(root: String, name: String): String =
    root + "|" + name.toLowerCase

  /** One lazy reload per root: persisted aliases fill in UNDER the
    * in-memory state (putIfAbsent — an in-session registration is never
    * clobbered by the file). The loaded-mark is taken INSIDE the lock:
    * marking first would let a second thread resolve before the first
    * finished reading the file and miss persisted aliases. */
  private def load(root: String): Unit = ioLock.synchronized {
    if (loadedRoots.add(root)) mergeDisk(root)
  }

  /** Unconditional file → memory merge (putIfAbsent: in-session state
    * wins per key; other processes' keys fill in). Callers hold ioLock. */
  private def mergeDisk(root: String): Unit = {
    val f = file(root)
    if (f.isFile) {
      val in = new java.io.ObjectInputStream(new java.io.FileInputStream(f))
      try in.readObject().asInstanceOf[Map[String, Child]]
        .foreach { case (n, c) => children.putIfAbsent(key(root, n), c) }
      finally in.close()
    }
  }

  /** Under the lease the committed FILE is authoritative (round-17
    * advice): every register/drop persists synchronously under this same
    * lease, so outside a lease body this process holds NO unpersisted
    * state for the root — an in-memory key absent from the file can only
    * be another process's later DROP, and the former add-only putIfAbsent
    * merge would resurrect it on our next persist. Replace the root's
    * slice wholesale: file keys win (another process's re-register with
    * new values too), memory-only keys drop. */
  private def syncDisk(root: String): Unit = {
    val f = file(root)
    val onDisk: Map[String, Child] =
      if (!f.isFile) Map.empty
      else {
        val in = new java.io.ObjectInputStream(new java.io.FileInputStream(f))
        try in.readObject().asInstanceOf[Map[String, Child]]
        finally in.close()
      }
    val prefix = root + "|"
    import scala.jdk.CollectionConverters._
    children.asScala.keys.filter(_.startsWith(prefix))
      .filterNot(k => onDisk.contains(k.stripPrefix(prefix)))
      .foreach(children.remove(_))
    onDisk.foreach { case (n, c) => children.put(key(root, n), c) }
  }

  /** Cross-process writer lease over the registry file — the
    * IndexCatalog `.locks/<name>.lock` convention (atomic create, stale
    * reclaim after `spark.graft.index.lock.ttlMs`). Mutations re-sync
    * from the committed file UNDER the lease before persisting, so two
    * drivers' interleaved register AND drop calls all survive. */
  private def withRegistryLease[T](spark: SparkSession, root: String)
      (body: => T): T =
    IndexCatalog.withIndexLock(spark, "_pg_partitions", "alter") {
      ioLock.synchronized {
        loadedRoots.add(root)
        syncDisk(root)
        body
      }
    }

  /** Commit-after-write of this root's full alias map. */
  private def persist(root: String): Unit = ioLock.synchronized {
    val prefix = root + "|"
    import scala.jdk.CollectionConverters._
    val m = children.asScala.collect {
      case (k, v) if k.startsWith(prefix) => k.stripPrefix(prefix) -> v
    }.toMap
    new java.io.File(root).mkdirs()
    val tmp = new java.io.File(root, "_pg_partitions.bin.tmp")
    val out = new java.io.ObjectOutputStream(new java.io.FileOutputStream(tmp))
    try out.writeObject(m) finally out.close()
    java.nio.file.Files.move(tmp.toPath, file(root).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def register(spark: SparkSession, name: String, c: Child): Unit = {
    val root = IndexCatalog.root(spark)
    withRegistryLease(spark, root) {
      children.put(key(root, name), c)
      persist(root)
    }
  }

  def resolve(spark: SparkSession, name: String): Option[Child] = {
    val root = IndexCatalog.root(spark)
    load(root)
    Option(children.get(key(root, name)))
  }

  def drop(spark: SparkSession, name: String): Boolean = {
    val root = IndexCatalog.root(spark)
    withRegistryLease(spark, root) {
      val removed = children.remove(key(root, name)) != null
      if (removed) persist(root)
      removed
    }
  }

  /** Parse-time claim check (DROP TABLE single-name dispatch): the
    * parser has no session parameter, so the active session supplies
    * the root; with NONE active the claim is declined (None → the
    * statement delegates to Spark's own DROP TABLE) — a cross-root
    * suffix scan here could claim a child registered under a DIFFERENT
    * index root than the one the command would run against
    * (round-15 advice). */
  private[index] def resolveParseTime(name: String): Option[Child] =
    SparkSession.getActiveSession.flatMap(s => resolve(s, name))

  /** Simulate a driver restart for specs, scoped to `names` (the
    * AnnPushdown.resetNamesForTest convention — suites share the JVM): the
    * in-memory aliases clear and the root re-loads lazily from the
    * persisted registry. */
  private[graft] def resetNamesForTest(spark: SparkSession,
      names: Set[String]): Unit = {
    val root = IndexCatalog.root(spark)
    names.foreach(n => children.remove(key(root, n)))
    loadedRoots.remove(root)
  }

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
    if (ifNotExists && PgPartitions.resolve(spark, name).isDefined)
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
    PgPartitions.register(spark, name,
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
      if (!PgPartitions.drop(spark, n)) spark.sql(s"DROP TABLE $ine$n")
    }
    Seq(Row(s"ok (${names.length} dropped)"))
  }
}
