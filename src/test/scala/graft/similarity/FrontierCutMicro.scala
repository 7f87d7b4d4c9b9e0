package graft.similarity

/** One-off micro-measure (no Spark): the mirror walk's per-hop
  * frontier cut at MirrorCap saturation — the r12 verdict's "bounded
  * heap" item. The old cut re-sorted every query's full visited list
  * per hop (O(V log V)); [[GraphAnn.frontierCut]] keeps a beam-sized
  * heap per query (O(V log beam)). At gate scale (V ≈ 10²) the
  * difference is invisible (RepairProbeMeasure: job-dominated); this
  * measures the saturated regime the cap allows (V = 2¹⁸ mirror rows)
  * where the cut runs once per hop per walk on the driver.
  *
  * Run: `sbt "Test/runMain graft.similarity.FrontierCutMicro"`
  */
object FrontierCutMicro {
  def main(args: Array[String]): Unit = {
    val v = 1 << 18
    val beam = 64
    val queries = 16
    val rnd = new scala.util.Random(7L)
    val rows = Array.fill(v)(
      (rnd.nextInt(queries).toLong, rnd.nextLong(1L << 40),
        rnd.nextDouble()))
    def oldCut(): Array[(Long, Long, Double)] =
      rows.groupBy(_._1).iterator.flatMap {
        case (_, rs) => rs.sorted(GraphAnn.mirrorOrd).take(beam)
      }.toArray
    def time(f: () => Array[(Long, Long, Double)]): Double = {
      f(); f() // warm
      val reps = 20
      val t0 = System.nanoTime()
      var i = 0
      var sink = 0
      while (i < reps) { sink += f().length; i += 1 }
      require(sink == reps * queries * beam)
      (System.nanoTime() - t0) / 1e6 / reps
    }
    val tOld = time(() => oldCut())
    val tNew = time(() => GraphAnn.frontierCut(rows, beam))
    // content parity while we're here
    val k = (ts: Array[(Long, Long, Double)]) => ts.sortBy(t => (t._1, t._2)).toSeq
    require(k(oldCut()) == k(GraphAnn.frontierCut(rows, beam)),
      "cut content diverged")
    println(f"[frontier-micro] V=$v beam=$beam queries=$queries " +
      f"oldSortCut=$tOld%.1f ms/hop heapCut=$tNew%.1f ms/hop " +
      f"speedup=${tOld / tNew}%.1fx")
  }
}
