package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (RRF) — the standard hybrid-retrieval combiner
  * (Cormack, Clarke & Buettcher 2009): fuse rankings from heterogeneous
  * scorers (BM25, embedding similarity, ...) without calibrating their
  * score scales, by summing reciprocal ranks.
  *
  * `score(id) = Σ_over_lists round(1e9 / (c + rank_in_list))`
  *
  * Contributions are INTEGERIZED per (list, id) before the sum — one
  * double division and one round each, so fusion is engine-exact
  * (oracle-checkable) and the combine is a plain long sum: map-side
  * partial aggregation applies, and the shuffle carries one row per
  * (id, list) hit. Inputs are already rank-truncated top-N lists, so the
  * fused relation is small by construction; the heavy lifting stays in
  * the upstream scorers.
  */
object RankFusion {

  /** Fuse rankings, each a DataFrame with (`id`: long, `rank`: int-like,
    * 1-based). Returns (id, rrf_e9, n_lists). */
  def rrf(rankings: Seq[DataFrame], c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrf of no rankings")
    require(c >= 0, s"c=$c must be non-negative")
    rankings
      .map(df => df.select(col("id").cast("long").as("id"),
        round(lit(1e9) / (col("rank").cast("long") + c)).cast("long")
          .as("contrib_e9")))
      .reduce(_.unionByName(_))
      .groupBy(col("id"))
      .agg(sum(col("contrib_e9")).as("rrf_e9"),
        count(lit(1)).as("n_lists"))
  }
}
