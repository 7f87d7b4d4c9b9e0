package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** r15 ADVICE coverage: [[TrainedState.footerRowCount]] must agree with
  * a distributed `count()` on real multi-generation delta trees and
  * partitioned bases (the load path now makes its localize-vs-
  * distributed decision from footers, with no job — a footer/count
  * divergence would silently flip that decision), and
  * [[TrainedState.reconcileDeltas]]' over-cap DISTRIBUTED branch must
  * produce the same reconciled rows as the localized one. */
class FooterCountSpec extends SparkTestBase {

  import spark.implicits._

  private def vecs(ids: Seq[Long], tag: Float) =
    ids.map(i => (i, Array(i.toFloat, tag, 1.0f)))
      .toDF("vec_id", "embedding")

  test("footerRowCount == count() over a partitioned base and a " +
      "multi-generation _delta tree") {
    val path = java.nio.file.Files
      .createTempDirectory("footer_cnt").toString + "/vecs"
    TrainedState.saveVectors(vecs(0L until 100L, 0f), path, numFiles = 7)
    TrainedState.appendVectorsDelta(vecs(100L until 130L, 1f), path)
    TrainedState.appendVectorsDelta(vecs(110L until 150L, 2f), path)
    TrainedState.appendVectorsDelta(vecs(Seq(5L), 3f), path)
    val base = spark.read.parquet(path)
    assert(TrainedState.footerRowCount(spark, base.inputFiles)
      == base.count())
    val deltas = TrainedState.readDeltas(spark, s"$path/_delta")
    assert(TrainedState.footerRowCount(spark, deltas.inputFiles)
      == deltas.count())
    assert(deltas.inputFiles.length >= 3,
      "expected one file per generation — the footer loop must be " +
        "exercised over multiple files")
  }

  test("reconcileDeltas over-cap distributed branch == localized branch " +
      "(newest-wins per key, tombstones included), with localCap forced " +
      "below the delta size") {
    val path = java.nio.file.Files
      .createTempDirectory("footer_cap").toString + "/vecs"
    TrainedState.saveVectors(vecs(0L until 50L, 0f), path)
    TrainedState.appendVectorsDelta(vecs(40L until 70L, 1f), path)
    TrainedState.appendVectorsDelta(vecs(60L until 80L, 2f), path)
    def reconciled(cap: Long): Set[(Long, Seq[Float])] =
      TrainedState.reconcileDeltas(
          TrainedState.load(spark, TrainedState.vectorsSchema, path),
          spark, path, TrainedState.vectorsSchema, Seq("vec_id"),
          localCap = cap)
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSet
    val local = reconciled(1L << 18)
    val distributed = reconciled(1L) // forced below the 50-row deltas
    assert(local == distributed)
    // the reconcile semantics themselves: generation 2 wins ids 60-69,
    // generation 1 wins 40-59's touched slice, base keeps the rest
    assert(local.size == 80)
    assert(local.find(_._1 == 65L).get._2(1) == 2f)
    assert(local.find(_._1 == 45L).get._2(1) == 1f)
    assert(local.find(_._1 == 10L).get._2(1) == 0f)
  }
}
