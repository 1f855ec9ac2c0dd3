package graft.tools

import graft.operators.Hnsw

/** Micro-benchmark + at-scale byte-identity harness for the round-9
  * connectivity-repair memoization: builds a duplicate-shattered corpus
  * (one large connected cluster + many far-away exact-duplicate
  * cliques), then times snapshot() with the memoized bridge scan
  * (default) vs the forced naive per-component scan on
  * identically-built graphs. Also the corpus that REJECTED the
  * beam-search variant: at ~2000 symmetric cliques the nearest
  * reachable node ties across two separate regions, and a local beam
  * provably cannot reproduce the global lowest-index tie-break (the
  * memoized scan is bit-exact by construction). Both paths must produce
  * byte-identical artifacts (the HybridSpec contract, asserted here).
  *
  * Run: `sbt "runMain graft.tools.RepairBench [nMain] [nCliques] [per]"`. */
object RepairBench {
  def main(args: Array[String]): Unit = {
    val nMain = args.lift(0).map(_.toInt).getOrElse(6000)
    val nCliques = args.lift(1).map(_.toInt).getOrElse(150)
    val per = args.lift(2).map(_.toInt).getOrElse(12)
    val dims = 8
    val rnd = new scala.util.Random(13)
    val main = (0 until nMain).map { _ =>
      Array.tabulate(dims)(_ => rnd.nextFloat())
    }
    val cliques = (0 until nCliques).flatMap { c =>
      val base = Array.tabulate(dims)(j =>
        100f * (c + 1) * (if (j % 2 == 0) 1f else -1f))
      (0 until per).map(_ => base.clone())
    }
    val rows = main ++ cliques
    def build(): Hnsw.Graph = {
      val g = new Hnsw.Graph("l2", m = 4, efConstruction = 40)
      rows.zipWithIndex.foreach { case (v, i) => g.insert(i.toLong, v) }
      g
    }
    def bytes(f: Hnsw.FlatGraph): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      val os = new java.io.DataOutputStream(buf)
      Hnsw.FlatGraph.write(os, f); os.close(); buf.toByteArray
    }
    // JIT warmup on a small instance of the same shape (both paths)
    locally {
      val w1 = new Hnsw.Graph("l2", m = 4, efConstruction = 40)
      val w2 = new Hnsw.Graph("l2", m = 4, efConstruction = 40)
      rows.take(3000).zipWithIndex.foreach { case (v, i) =>
        w1.insert(i.toLong, v); w2.insert(i.toLong, v)
      }
      w1.snapshot; w2.snapshotWithScanRepair
    }
    val gMemo = build(); val gScan = build()
    val t0 = System.nanoTime()
    val memoBytes = bytes(gMemo.snapshot)
    val tMemo = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val scanBytes = bytes(gScan.snapshotWithScanRepair)
    val tScan = (System.nanoTime() - t1) / 1e9
    require(java.util.Arrays.equals(memoBytes, scanBytes),
      "memoized repair diverged from the naive scan")
    println(f"[repair] n=${rows.length} bridges=${gMemo.lastRepairBridges} " +
      f"memo=${tMemo}%.2fs scan=${tScan}%.2fs speedup=${tScan / tMemo}%.1fx " +
      "(byte-identical)")
  }
}
