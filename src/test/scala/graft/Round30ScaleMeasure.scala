package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement for SCALE.md (round 15, third session): the
  * persisted media-admission probe at 100× — a micro-batch's
  * near-dup check against a signature index that grows from 10⁴ to
  * 10⁶ signatures.
  *
  *   1. probe — [[graft.similarity.Similarity.simhashPairsAgainstIndex]]
  *      through the banded artifact ([[graft.similarity.TrainedState
  *      .saveBandedSigIndex]]): the batch's bucket keys prune the scan.
  *      Claim: ~flat (matched-bucket row groups only).
  *   2. probe UNPRUNED counterfactual — the in-memory loops' shape:
  *      [[graft.similarity.Similarity.simhashPairsFromSigs]] over
  *      index ∪ batch, re-banding the corpus per call. Claim: carries
  *      the corpus term.
  *   3. append — [[graft.similarity.TrainedState.appendBandedSigsDelta]]
  *      of the batch. Claim: ~flat (one O(batch·4) generation).
  *
  * Signatures are synthetic uniform 64-bit values (the banding and
  * hamming arithmetic neither knows nor cares where a signature came
  * from — media decode cost is per-batch-constant and out of scope).
  *
  * Run: sbt "Test/runMain graft.Round30ScaleMeasure [mult]"
  */
object Round30ScaleMeasure {

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val TS = graft.similarity.TrainedState
    val Sim = graft.similarity.Similarity

    def timedMin(f: => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    // deterministic pseudo-random 64-bit signatures
    def sigs(n: Long, salt: Int) = spark.range(n)
      .select(col("id"),
        xxhash64(col("id"), lit(salt)).as("simhash"))

    def measure(tag: String, n: Long): (Double, Double, Double) = {
      val path = s"/tmp/graft_r30_$tag/idx"
      TS.saveBandedSigIndex(sigs(n, 1), path, blocks = 60,
        numFiles = math.max(4, (n / (1L << 18)).toInt))
      val batch = sigs(50, 2)
        .select((col("id") + 900000000L).as("id"), col("simhash"))
        .localCheckpoint(true)
      def probe(): Unit = {
        Sim.simhashPairsAgainstIndex(batch,
          TS.loadBandedSigIndexCached(spark, path), maxHamming = 3)
          .write.format("noop").mode("overwrite").save()
      }
      probe(); val tProbe = timedMin(probe())
      // counterfactual: the in-memory loop's symmetric re-band
      val flat = sigs(n, 1).localCheckpoint(true)
      def unpruned(): Unit = {
        Sim.simhashPairsFromSigs(flat.unionByName(batch),
            maxHamming = 3)
          .write.format("noop").mode("overwrite").save()
        graft.similarity.StagedCache.release()
      }
      unpruned(); val tUn = timedMin(unpruned())
      val tAppend = timedMin {
        TS.appendBandedSigsDelta(batch, path)
      }
      println(f"[r30scale] $tag sigs=$n probe=$tProbe%.2fs " +
        f"probe_unpruned=$tUn%.2fs append=$tAppend%.2fs")
      (tProbe, tUn, tAppend)
    }

    val (p1, u1, a1) = measure("sf01", 10000L)
    val (pN, uN, aN) = measure(s"sf_${mult}x", 10000L * mult)
    println(f"[r30scale] ${mult}x ratios: probe=${pN / p1}%.2f " +
      f"probe_unpruned=${uN / u1}%.2f append=${aN / a1}%.2f " +
      f"(claims ~flat probe/append — bucket-pruned row groups, " +
      f"O(batch) generations; the unpruned counterfactual re-bands " +
      f"the corpus)")
    spark.stop()
  }
}
