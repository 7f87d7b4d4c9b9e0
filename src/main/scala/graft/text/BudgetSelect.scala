package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quality-ranked selection to a token budget — "take the best documents
  * until N tokens" (the FineWeb/DataComp-style curation cut that turns a
  * scored corpus into a right-sized training set).
  *
  * A literal global sort + cumulative sum is one sequential task over the
  * corpus, so the operator uses a two-level HISTOGRAM cut instead:
  *
  *   1. quality (integer 1e-6 units) coarsens to `binWidth` bins; one
  *      map-side aggregation builds the per-bin token histogram (≤
  *      1e6/binWidth + 1 rows — driver-sized BY CONSTRUCTION, corpus-
  *      independent);
  *   2. the driver prefix-scans bins best-first: bins whose cumulative
  *      total fits the budget are taken WHOLE (a map-only filter — no
  *      sort, no shuffle of selected rows); exactly one CUT bin
  *      straddles the boundary;
  *   3. only the cut bin's rows — corpus/binCount-sized, binWidth is the
  *      knob — are ranked exactly ((quality desc, id) cumulative sum,
  *      ROWS frame) and kept while the running total fits the remainder.
  *
  * The contract is deterministic and engine-exact: all arithmetic is
  * integer, the cross-bin order is the COARSE bin (defined behavior, not
  * an approximation of the exact order), and ties inside the cut bin
  * break by id. The gate oracle replays all three stages in SQL.
  */
object BudgetSelect {

  /** @param qualityE6 integer 1e-6-unit quality (already-rounded; see
    *   `d_budget_select` for the round-then-scale recipe)
    * @param weightCol non-negative integer row weight (token count)
    * @return selected rows: (`idCol`, quality_e6, w)
    */
  def selectToBudget(docs: DataFrame, idCol: String, qualityE6: Column,
                     weightCol: Column, budget: Long,
                     binWidth: Long = 1000L): DataFrame = {
    require(budget >= 0, s"budget=$budget must be >= 0")
    require(binWidth > 0, s"binWidth=$binWidth must be > 0")
    // persist: the projection (often a multi-regex quality pass) feeds
    // the histogram collect AND both returned branches — staged once, not
    // three times. persist (not localCheckpoint) so the cache manager
    // owns the blocks; they serve the returned (lazy) union and clear
    // with the session/catalog rather than pinning checkpoint RDDs.
    val base = docs.select(col(idCol), qualityE6.cast("long").as("quality_e6"),
        weightCol.cast("long").as("w"))
      .withColumn("_bin",
        floor(col("quality_e6").cast("double") / binWidth).cast("long"))
      .persist()
    val hist = base.groupBy(col("_bin")).agg(sum(col("w")).as("_bw"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(-_._1)
    var acc = 0L
    var cutBin = Long.MinValue
    var before = 0L
    var fullMin = Long.MaxValue // smallest fully-selected bin
    val it = hist.iterator
    var done = false
    while (it.hasNext && !done) {
      val (bin, bw) = it.next()
      if (acc + bw <= budget) { acc += bw; fullMin = bin }
      else { cutBin = bin; before = acc; done = true }
    }
    val full =
      if (fullMin == Long.MaxValue) base.filter(lit(false))
      else base.filter(col("_bin") >= fullMin)
    val cut =
      if (cutBin == Long.MinValue) base.filter(lit(false))
      else {
        // cut-bin rows only: corpus/binCount-sized, exact rank + running
        // total (ROWS frame; ordering is total, so no tie ambiguity)
        val w = Window.orderBy(col("quality_e6").desc, col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        base.filter(col("_bin") === cutBin)
          .withColumn("_cum", sum(col("w")).over(w))
          .filter(col("_cum") <= budget - before)
          .drop("_cum")
      }
    full.unionByName(cut).select(col(idCol), col("quality_e6"), col("w"))
  }
}
