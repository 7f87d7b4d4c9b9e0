package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** [[StagedCache]] — the banded tables [[Similarity.simhashPairsFromSigs]]
  * and [[PortableSim]] persist() lazily at construction register
  * themselves, and a loop-shaped caller's `release()` drains them, so a
  * per-trigger streaming rebuild cannot accumulate one cache entry per
  * batch for the life of the session (the round-10 advice item). */
class StagedCacheSpec extends SparkTestBase {
  import spark.implicits._

  test("simhashPairsFromSigs registers its banded persist; release " +
      "drains it (and is idempotent); results are identical either way") {
    StagedCache.release() // isolate from earlier suites
    val sigs = Seq((1L, 0x1234567890abcdefL), (2L, 0x1234567890abcdeeL),
      (3L, 0x0f0f0f0f0f0f0f0fL)).toDF("id", "simhash")
    val before = StagedCache.pending
    val pairs = Similarity.simhashPairsFromSigs(sigs, maxHamming = 3)
    assert(StagedCache.pending == before + 1,
      "construction must register exactly one staged entry")
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
    val drained = StagedCache.release()
    assert(drained >= 1 && StagedCache.pending == 0)
    assert(StagedCache.release() == 0, "release must be idempotent")
    // the result is a plain lazy plan — it recomputes identically after
    // its staged cache is gone (unpersist is an optimization rollback,
    // never a semantics change)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == got)
  }

  test("a per-trigger loop that releases leaves no persistent RDD " +
      "growth; one that doesn't would accumulate") {
    StagedCache.release()
    val sigs = Seq((1L, 7L), (2L, 7L)).toDF("id", "simhash")
    val base = spark.sparkContext.getPersistentRDDs.size
    (1 to 3).foreach { _ =>
      // the StreamingMedia.admitImages trigger shape: build, materialize,
      // release
      Similarity.simhashPairsFromSigs(sigs, maxHamming = 0).count()
      StagedCache.release()
    }
    assert(spark.sparkContext.getPersistentRDDs.size == base,
      "released loop must not grow the persistent-RDD registry")
  }
}
