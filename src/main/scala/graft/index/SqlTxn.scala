package graft.index

import org.apache.spark.sql.SparkSession

/** PG transaction-block DDL (reference src/index/hooks.rs:60-106,
  * exercised by tests/transaction/test.sql): `BEGIN; CREATE INDEX ...;
  * ABORT;` must retract the index. A batch engine has no MVCC to defer
  * visibility, so the analog is a session-scoped DDL JOURNAL: BEGIN
  * opens it, a CREATE that commits a genuinely NEW index records
  * (name, source), ABORT retracts journaled creates through the DROP
  * statement's own retirement path (claim retired by name, artifact
  * dropped, shadowed survivors re-registered), COMMIT just closes the
  * journal — every statement inside the block still executes and
  * commits atomically on its own, exactly as outside one.
  *
  * Scope (the narrowed divergence, CONFORMANCE table): only NEW-index
  * CREATEs retract — a re-CREATE/REINDEX of an existing name rebuilds
  * in place (no MVCC copy to restore; PG itself holds the old index
  * only via MVCC), and DML rows are never transactional. VACUUM inside
  * a block errors with PG's own message — PG forbids it too
  * (25001 invalid_transaction_state). A crash mid-block leaves the
  * statements already executed (each was its own atomic commit), not a
  * rolled-back block.
  *
  * State is per SparkSession (weak-keyed — sessions die with their
  * entries) and guarded by one lock: statements of one session execute
  * driver-side sequentially, the lock only protects cross-session map
  * access. */
object SqlTxn {
  private final class State {
    // newest first — ABORT retracts in reverse creation order
    var created: List[(String, String)] = Nil
  }
  private val states =
    new java.util.WeakHashMap[SparkSession, State]()

  def active(spark: SparkSession): Boolean =
    states.synchronized(states.containsKey(spark))

  def begin(spark: SparkSession): String = states.synchronized {
    if (states.containsKey(spark))
      "WARNING: there is already a transaction in progress"
    else { states.put(spark, new State); "ok" }
  }

  /** Record a CREATE that committed a genuinely new index (no prior
    * manifest). No-op outside a block. */
  def journalCreate(spark: SparkSession, name: String,
      source: String): Unit = states.synchronized {
    Option(states.get(spark)).foreach(s =>
      s.created = (name -> source) :: s.created)
  }

  def commit(spark: SparkSession): String = states.synchronized {
    if (states.remove(spark) == null)
      "WARNING: there is no transaction in progress"
    else "ok"
  }

  def abort(spark: SparkSession): String = {
    val st = states.synchronized(states.remove(spark))
    if (st == null) "WARNING: there is no transaction in progress"
    else {
      // the DROP statement's retirement path, newest first; ifExists —
      // a retraction must stay best-effort if someone dropped the name
      // mid-block. The reported count is the retractions that actually
      // SUCCEEDED (round-17 nit): a failed drop (e.g. a poisoned lock)
      // must not read as retracted — it surfaces in the message and on
      // stderr, and the artifact resurfaces on the next statement.
      val results = st.created.map { case (name, _) =>
        scala.util.Try(GraftSqlParser.dropOne(spark, name, ifExists = true))
      }
      val ok = results.count(_.isSuccess)
      val failed = results.length - ok
      results.collect { case scala.util.Failure(e) =>
        System.err.println(s"[graft] ABORT retraction failed: $e") }
      if (failed == 0) s"ok ($ok indexes retracted)"
      else s"ok ($ok indexes retracted, $failed retraction(s) FAILED)"
    }
  }

  /** PG's own refusal (25001) for statements that cannot run inside a
    * transaction block. */
  def refuseInTxn(spark: SparkSession, what: String): Unit =
    if (active(spark)) throw new IllegalStateException(
      s"$what cannot run inside a transaction block")
}
