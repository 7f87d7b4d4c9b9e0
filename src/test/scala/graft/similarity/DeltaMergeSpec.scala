package graft.similarity

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** r15 verdict #4: size-tiered (LSM-style) delta maintenance. Pins
  *  - bytes written by a generation MERGE scale with the merged
  *    generations, never the corpus-sized base, across repeated
  *    fold/merge cycles;
  *  - reconcile results are unchanged by a merge (including tombstones
  *    and re-touched keys), and remain unchanged in the crash window
  *    where the merged generation and the originals coexist;
  *  - the policy flips to the full fold once the deltas stop being
  *    small relative to the base, restoring zero pending generations.
  */
class DeltaMergeSpec extends SparkTestBase {

  import spark.implicits._

  private def vecs(ids: Seq[Long], tag: Float) =
    ids.map(i => (i, Array.fill(32)(0f).updated(0, i.toFloat)
      .updated(1, tag))).toDF("vec_id", "embedding")

  private def dirBytes(p: String): Long = {
    val f = new java.io.File(p)
    if (!f.exists()) 0L
    else if (f.isFile) f.length()
    else f.listFiles().map(x => dirBytes(x.getPath)).sum
  }

  private def genDirs(path: String): Seq[String] = {
    val d = new java.io.File(s"$path/_delta")
    if (!d.exists()) Seq.empty
    else d.listFiles().filter(f => f.isDirectory &&
      f.getName.startsWith("gen-")).map(_.getPath).toSeq.sorted
  }

  private def served(path: String): Map[Long, Float] =
    TrainedState.loadVectors(spark, path).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)(1))).toMap

  test("merge writes O(deltas) bytes across repeated cycles while the " +
      "base is never rewritten, and the served content equals the " +
      "pre-merge reconcile every cycle") {
    val path = Files.createTempDirectory("merge_bytes").toString + "/vecs"
    // base ~50k rows; deltas ~200 rows per generation
    TrainedState.saveVectors(vecs(0L until 50000L, 0f), path, numFiles = 4)
    val baseB = dirBytes(path) - dirBytes(s"$path/_delta")
    var expected = (0L until 50000L).map(_ -> 0f).toMap
    val baseMtimes = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f =>
        (f.getName, f.lastModified())).toMap
    for (cycle <- 1 to 3) {
      val tag = cycle.toFloat
      val fresh = (50000L + 200L * cycle) until (50000L + 200L * cycle + 200L)
      val retouch = (0L until 50L).map(_ + 10L * cycle)
      TrainedState.appendVectorsDelta(vecs(fresh, tag), path)
      TrainedState.appendVectorsDelta(vecs(retouch, tag + 0.5f), path)
      expected = expected ++ fresh.map(_ -> tag) ++
        retouch.map(_ -> (tag + 0.5f))
      val before = served(path)
      assert(before == expected, s"cycle $cycle: pre-merge reconcile")
      val action = TrainedState.compactOrMergeIfNeeded(spark, path,
        maxGenerations = 2L, kind = "vectors")(
        TrainedState.compactVectors(_, _))
      assert(action == "merged",
        s"cycle $cycle: small deltas against a large base must MERGE, " +
          s"got $action")
      assert(served(path) == expected, s"cycle $cycle: post-merge " +
        "reconcile changed")
      // bytes: exactly one live generation, sized like the merged
      // deltas (hundreds of rows), nowhere near the base
      val gens = genDirs(path)
      assert(gens.size == 1, s"cycle $cycle: expected 1 merged " +
        s"generation, got ${gens.size}")
      val genB = dirBytes(gens.head)
      assert(genB * TrainedState.MergeSizeRatio < baseB,
        s"cycle $cycle: merged generation ($genB B) must be small " +
          s"relative to the base ($baseB B) — merge rewrote too much")
      // the base files were NOT rewritten (same mtimes)
      val nowMtimes = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(f =>
          (f.getName, f.lastModified())).toMap
      assert(nowMtimes == baseMtimes,
        s"cycle $cycle: merge must never touch the base files")
    }
  }

  test("crash window: the merged generation coexisting with the " +
      "original gens serves identical rows (old copies lose newest-wins " +
      "deterministically — no duplicates)") {
    val path = Files.createTempDirectory("merge_crash").toString + "/vecs"
    TrainedState.saveVectors(vecs(0L until 1000L, 0f), path)
    TrainedState.appendVectorsDelta(vecs(900L until 1100L, 1f), path)
    TrainedState.appendVectorsDelta(vecs(1050L until 1200L, 2f), path)
    // tombstone a slice too — deletes must survive the merge
    TrainedState.forgetVectorsDelta(Seq(10L, 950L, 1060L).toDF("vec_id"),
      path)
    val before = served(path)
    // park copies of the pre-merge generations
    val backup = Files.createTempDirectory("merge_bak")
    val origGens = genDirs(path)
    origGens.foreach { g =>
      val name = Paths.get(g).getFileName.toString
      copyTree(Paths.get(g), backup.resolve(name))
    }
    assert(TrainedState.mergeDeltaGenerations(spark, path,
      TrainedState.vectorsSchema, Seq("vec_id")))
    assert(served(path) == before, "merge changed the reconcile")
    // simulate the crash window: restore ONE original generation next
    // to the merged one
    val restored = Paths.get(origGens.head)
    copyTree(backup.resolve(restored.getFileName.toString), restored)
    assert(served(path) == before,
      "a restored pre-merge generation must lose the reconcile " +
        "(stamped _seq below the merged generation)")
    val dupCheck = TrainedState.loadVectors(spark, path)
      .groupBy(col("vec_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(dupCheck == 0, "crash window produced duplicate keys")
  }

  test("the policy flips to the FULL fold when deltas stop being small " +
      "relative to the base, restoring zero pending generations") {
    val path = Files.createTempDirectory("merge_flip").toString + "/vecs"
    TrainedState.saveVectors(vecs(0L until 500L, 0f), path)
    // two delta generations comparable to the base in size
    TrainedState.appendVectorsDelta(vecs(500L until 900L, 1f), path)
    TrainedState.appendVectorsDelta(vecs(900L until 1300L, 1f), path)
    val action = TrainedState.compactOrMergeIfNeeded(spark, path,
      maxGenerations = 2L, kind = "vectors")(
      TrainedState.compactVectors(_, _))
    assert(action == "compacted",
      s"base-comparable deltas must take the full fold, got $action")
    assert(TrainedState.deltaGenerations(spark, path) == 0L)
    assert(served(path) ==
      ((0L until 500L).map(_ -> 0f) ++ (500L until 1300L).map(_ -> 1f))
        .toMap)
  }

  private def copyTree(from: Path, to: Path): Unit = {
    Files.walk(from).forEach { p =>
      val dst = to.resolve(from.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(dst)
      else {
        Files.createDirectories(dst.getParent)
        Files.copy(p, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }
}
