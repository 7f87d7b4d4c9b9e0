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
    * 1-based). Returns (id, rrf_e9, n_lists).
    *
    * An id appearing more than once WITHIN one list (e.g. an arm built by
    * unioning shard top-Ns without dedup) is collapsed to its BEST (=
    * minimum) rank in that list before fusing — otherwise one list would
    * contribute twice and inflate `n_lists`, silently outranking genuine
    * multi-list hits. The collapse is a deterministic min, so the fusion
    * stays engine-exact. */
  def rrf(rankings: Seq[DataFrame], c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrf of no rankings")
    require(c >= 0, s"c=$c must be non-negative")
    rankings
      .map(df => df
        .groupBy(col("id").cast("long").as("id"))
        .agg(min(col("rank").cast("long")).as("rank"))
        .select(col("id"),
          round(lit(1e9) / (col("rank") + c)).cast("long")
            .as("contrib_e9")))
      .reduce(_.unionByName(_))
      .groupBy(col("id"))
      .agg(sum(col("contrib_e9")).as("rrf_e9"),
        count(lit(1)).as("n_lists"))
  }
}
