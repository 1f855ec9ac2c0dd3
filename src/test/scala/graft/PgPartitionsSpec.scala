package graft

import java.io.File
import graft.index.{IndexCatalog, PgPartitions}

/** Cross-process durability of the PARTITION OF child registry
  * (round 16): register/drop serialize through the catalog's `.locks/`
  * file lease and MERGE the committed file before persisting, so two
  * drivers' interleaved writes both survive — the lost-update shape the
  * previous last-write-wins persist could drop. */
class PgPartitionsSpec extends SparkSpec {

  test("interleaved cross-process registers both survive (merge under lease)") {
    val a = "pgpartspec_lease_a"; val b = "pgpartspec_lease_b"
    PgPartitions.drop(spark, a); PgPartitions.drop(spark, b)
    val root = IndexCatalog.root(spark)
    // this driver's state: root loaded while the file lacked child A —
    // the lost-update precondition (a second driver's write lands after
    // our load but before our own register)
    PgPartitions.resolve(spark, "pgpartspec_nonexistent")
    // "the other driver" commits child A out of band: read-modify-write
    // the registry file directly, under the same lease this test's
    // subject uses (so parallel suites' children are preserved too)
    val childA = PgPartitions.Child("pgpartspec_parent", "cat", Seq("1"))
    IndexCatalog.withIndexLock(spark, "_pg_partitions") {
      val f = new File(root, "_pg_partitions.bin")
      val prior: Map[String, PgPartitions.Child] =
        if (f.isFile) {
          val in = new java.io.ObjectInputStream(
            new java.io.FileInputStream(f))
          try in.readObject().asInstanceOf[Map[String, PgPartitions.Child]]
          finally in.close()
        } else Map.empty
      val tmp = new File(root, "_pg_partitions.bin.spec_tmp")
      val out = new java.io.ObjectOutputStream(
        new java.io.FileOutputStream(tmp))
      try out.writeObject(prior + (a -> childA)) finally out.close()
      java.nio.file.Files.move(tmp.toPath, f.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    // this driver now registers B: before the round-16 merge-under-lease
    // fix, persist() wrote only the in-memory view and dropped A
    PgPartitions.register(spark, b,
      PgPartitions.Child("pgpartspec_parent", "cat", Seq("2")))
    try {
      assert(PgPartitions.resolve(spark, a).isDefined,
        "the other driver's child must survive this driver's register")
      assert(PgPartitions.resolve(spark, b).isDefined)
      // and both are PERSISTED: a restart (scoped reset, memory cleared)
      // still resolves both from the file
      PgPartitions.resetNamesForTest(spark, Set(a, b))
      assert(PgPartitions.resolve(spark, a).map(_.values) === Some(Seq("1")))
      assert(PgPartitions.resolve(spark, b).map(_.values) === Some(Seq("2")))
    } finally {
      PgPartitions.drop(spark, a)
      PgPartitions.drop(spark, b)
    }
  }

  test("a cross-process DROP survives this driver's next register (file authoritative under lease)") {
    val a = "pgpartspec_xdrop_a"; val b = "pgpartspec_xdrop_b"
    val c = "pgpartspec_xdrop_c"
    PgPartitions.drop(spark, a); PgPartitions.drop(spark, b)
    PgPartitions.drop(spark, c)
    val root = IndexCatalog.root(spark)
    PgPartitions.register(spark, a,
      PgPartitions.Child("pgpartspec_parent", "cat", Seq("1")))
    PgPartitions.register(spark, b,
      PgPartitions.Child("pgpartspec_parent", "cat", Seq("2")))
    // "the other driver" drops child A out of band: rewrite the registry
    // file without it, under the lease (this driver's memory still
    // holds A — the resurrect precondition of round-17 advice)
    IndexCatalog.withIndexLock(spark, "_pg_partitions") {
      val f = new File(root, "_pg_partitions.bin")
      val in = new java.io.ObjectInputStream(new java.io.FileInputStream(f))
      val prior = try in.readObject()
        .asInstanceOf[Map[String, PgPartitions.Child]] finally in.close()
      val tmp = new File(root, "_pg_partitions.bin.spec_tmp")
      val out = new java.io.ObjectOutputStream(new java.io.FileOutputStream(tmp))
      try out.writeObject(prior - a) finally out.close()
      java.nio.file.Files.move(tmp.toPath, f.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    // this driver registers C: the pre-fix add-only merge would
    // re-persist (resurrect) the dropped A from memory
    PgPartitions.register(spark, c,
      PgPartitions.Child("pgpartspec_parent", "cat", Seq("3")))
    try {
      assert(PgPartitions.resolve(spark, a).isEmpty,
        "another process's drop must survive this driver's register")
      assert(PgPartitions.resolve(spark, b).isDefined)
      assert(PgPartitions.resolve(spark, c).isDefined)
      // persisted state agrees after a restart
      PgPartitions.resetNamesForTest(spark, Set(a, b, c))
      assert(PgPartitions.resolve(spark, a).isEmpty)
      assert(PgPartitions.resolve(spark, b).isDefined)
      assert(PgPartitions.resolve(spark, c).isDefined)
    } finally {
      PgPartitions.drop(spark, b)
      PgPartitions.drop(spark, c)
    }
  }
}
