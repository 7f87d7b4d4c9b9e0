package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The simhash bucket cap (maxBucket) must degrade gracefully: a hot
  * probe block drops, pairs still reachable via their other blocks
  * survive, pairs reachable ONLY through the hot block are the
  * documented recall trade. */
class SimhashCapSpec extends SparkTestBase {

  test("maxBucket drops the hot block but multi-probe recovers the pair") {
    import spark.implicits._
    val hot = 0xAAAAL << 48 // block 0 (bits 48-63): shared by everyone
    val rnd = new scala.util.Random(11)
    // ids 1,2: identical except 3 flipped bits inside block 2 (16-31) ->
    // hamming 3, co-bucketed in blocks 0, 1, 3
    val base = hot | 0x1234L << 32 | 0x00F0L << 16 | 0x00FFL
    val sig1 = base
    val sig2 = base ^ (0x7L << 17)
    // ids 5,6: hamming 3, but differing one bit in EACH of blocks 1,2,3
    // -> their only shared bucket is the hot block 0
    val base56 = hot | 0x9999L << 32 | 0x4444L << 16 | 0x2222L
    val sig5 = base56
    val sig6 = base56 ^ (1L << 33) ^ (1L << 18) ^ (1L << 3)
    // filler ids sharing ONLY the hot block, far from everything else
    val fillers = (10L to 24L).map { id =>
      id -> (hot | (rnd.nextLong() & 0x0000FFFFFFFFFFFFL))
    }
    val sigs = (Seq(1L -> sig1, 2L -> sig2, 5L -> sig5, 6L -> sig6) ++
      fillers).toDF("id", "simhash").repartition(2)

    def pairs(cap: Int) =
      Similarity.simhashPairsFromSigs(sigs, maxHamming = 3, maxBucket = cap)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val uncapped = pairs(0)
    assert(uncapped.contains((1L, 2L)) && uncapped.contains((5L, 6L)))
    // cap 10 < 19 occupants: the shared block-0 bucket drops
    val capped = pairs(10)
    assert(capped.contains((1L, 2L)),
      "pair with surviving co-buckets lost under the cap")
    assert(!capped.contains((5L, 6L)),
      "hot-block-only pair should be the documented recall trade")
    // no NEW pairs can appear under a cap
    assert(capped.subsetOf(uncapped))
  }
}
