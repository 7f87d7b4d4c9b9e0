package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FuzzyDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and keeps running onward"

  test("planted typos are found through either blocking anchor; unrelated " +
      "docs never pair") {
    val docs = Seq(
      (1L, base),
      (2L, base.updated(30, 'X')),                 // mid typo: both anchors hit
      (3L, "Z" + base.drop(1)),                    // FIRST char typo: prefix block misses, suffix catches
      (4L, base.dropRight(1) + "Q"),               // LAST char typo: suffix misses, prefix catches
      (5L, "completely different text about parquet files and columnar io")
    ).toDF("doc_id", "text").repartition(3)
    val got = FuzzyDedup.pairs(docs, "doc_id", "text",
        blockLen = 8, headLen = 100, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), s"mid-typo missed: $got")
    assert(got.contains((1L, 3L)), s"prefix-typo missed (suffix anchor should catch): $got")
    assert(got.contains((1L, 4L)), s"suffix-typo missed (prefix anchor should catch): $got")
    assert(!got.exists { case (a, b) => a == 5L || b == 5L },
      s"unrelated doc paired: $got")
  }

  test("maxBlockSize drops pileup blocks before pairing (the adversarial " +
      "guard), without touching small blocks") {
    // 10 docs sharing BOTH anchors (identical text) + one typo pair
    val pileup = (10L until 20L).map(i => (i, base))
    val docs = (pileup ++ Seq((1L, "unique prefix one two three four five six seven"),
      (2L, "unique prefix one two three four five six sevex")))
      .toDF("doc_id", "text").repartition(3)
    val capped = FuzzyDedup.pairs(docs, "doc_id", "text",
        blockLen = 8, headLen = 100, maxDist = 2, maxBlockSize = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 10-identical pileup (blocks of 10 > cap) is dropped...
    assert(!capped.exists { case (a, b) => a >= 10L && b >= 10L },
      s"pileup survived the cap: $capped")
    // ...the small typo block still pairs
    assert(capped == Set((1L, 2L)), s"small block lost: $capped")
    // uncapped, the pileup pairs O(n²) — 45 pairs + the typo pair
    val uncapped = FuzzyDedup.pairs(docs, "doc_id", "text",
      blockLen = 8, headLen = 100, maxDist = 2).count()
    assert(uncapped == 45 + 1)
  }

  test("groupCols gate candidates: same text in different groups never " +
      "pairs") {
    val docs = Seq((1L, base, "en"), (2L, base, "de"), (3L, base, "en"))
      .toDF("doc_id", "text", "lang").repartition(2)
    val got = FuzzyDedup.pairs(docs, "doc_id", "text",
        groupCols = Seq("lang"), blockLen = 8, headLen = 100, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 3L)), s"cross-group pair leaked: $got")
  }
}
