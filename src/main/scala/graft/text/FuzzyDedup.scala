package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) near-duplicate detection — the non-token
  * near-dup family (typo'd titles, OCR noise, template drift) that
  * shingle-based MinHash misses because a one-character edit rewrites
  * every overlapping shingle.
  *
  * Candidate generation is OR-blocking over equi-joins: two passes — same
  * (group, first-`blockLen`-chars) and same (group, last-`blockLen`-chars)
  * — so a typo anywhere outside ONE of the two anchors still collides
  * somewhere, and the only shuffles are hash joins on blocking keys (never
  * an all-pairs product). Levenshtein then verifies just the candidates,
  * on a bounded `headLen`-char head: edit distance is O(len²) per pair, so
  * the cap is the per-candidate cost control.
  *
  * At 100 TB the two knobs are `blockLen` (longer key ⇒ smaller blocks ⇒
  * fewer candidates, lower recall for early/late typos) and
  * `maxBlockSize` — the same adversarial-pileup guard as
  * [[graft.similarity.Similarity.minhashPairs]]: a block of n identical
  * prefixes pairs O(n²), and if those are EXACT duplicates that's exact
  * dedup's job, not the fuzzy pass's; oversized blocks are dropped before
  * pairing (0 = uncapped).
  */
object FuzzyDedup {

  /** @param groupCols exact-match columns candidates must share (e.g.
    *                   language) — tightens blocks for free
    * @return (id_a, id_b, dist) with id_a < id_b and dist ≤ maxDist
    */
  def pairs(df: DataFrame, idCol: String, textCol: String,
            groupCols: Seq[String] = Seq.empty, blockLen: Int = 8,
            headLen: Int = 100, maxDist: Int = 2,
            maxBlockSize: Int = 0): DataFrame = {
    require(blockLen > 0 && headLen >= blockLen && maxDist >= 0,
      s"fuzzyDedup: need blockLen>0, headLen>=blockLen, maxDist>=0")
    val docs = df
      .select((Seq(col(idCol).as("_id"),
        substring(col(textCol), 1, headLen).as("_head"),
        substring(col(textCol), 1, blockLen).as("_pre"),
        substring(col(textCol), -blockLen, blockLen).as("_suf")) ++
        groupCols.map(col)): _*)
    def pass(key: String): DataFrame = {
      var blocked = docs.select((Seq(col("_id"), col("_head"),
        col(key).as("_bk")) ++ groupCols.map(col)): _*)
      if (maxBlockSize > 0) {
        val keep = blocked.groupBy((col("_bk") +: groupCols.map(col)): _*)
          .agg(count(lit(1)).as("_bn"))
          .filter(col("_bn") <= maxBlockSize)
          .drop("_bn")
        blocked = blocked.join(keep, "_bk" +: groupCols, "left_semi")
      }
      val a = blocked.select((Seq(col("_id").as("id_a"), col("_bk"),
        col("_head").as("head_a")) ++ groupCols.map(col)): _*)
      val b = blocked.select((Seq(col("_id").as("id_b"), col("_bk"),
        col("_head").as("head_b")) ++ groupCols.map(col)): _*)
      a.join(b, "_bk" +: groupCols).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("head_a"), col("head_b"))
    }
    pass("_pre").unionByName(pass("_suf")).distinct()
      .withColumn("dist", levenshtein(col("head_a"), col("head_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
