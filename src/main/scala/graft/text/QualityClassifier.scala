package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable model-based quality gating — the learned counterpart of
  * [[TextOps.qualityScore]]'s fixed-weight heuristic (the CCNet /
  * fastText-classifier filtering stage of a training-data pipeline,
  * reduced to its distributed-training shape).
  *
  * The model is a batch PERCEPTRON over the same ratio features the
  * heuristic uses, chosen over logistic regression deliberately: no
  * transcendentals anywhere, so the whole k-iteration training loop is
  * CROSS-ENGINE EXACT and the gate oracle replays it in SQL bit for bit.
  * The exactness argument, layer by layer:
  *
  *   - features are ratios of integer counts → correctly-rounded double
  *     division of identical operands → bit-identical doubles in Spark
  *     and DuckDB (the `d_quality_score` precedent);
  *   - per-row update contributions integerize FIRST
  *     (`round(x_j·1e6) AS BIGINT`) and weights live in integer 1e-6
  *     units, so every per-iteration SUM is an integer sum — exact and
  *     summation-ORDER-FREE, immune to Spark's nondeterministic partial
  *     aggregation order (the drift-PSI trick applied to model training);
  *   - margins are fixed-order dot products of exact integer weights
  *     (≤ ~2⁴⁰ « 2⁵³, exactly representable) with bit-identical features
  *     → bit-identical doubles → the misclassification predicate
  *     `y·m ≤ 0` decides IDENTICALLY in both engines, with no margin
  *     assumption needed.
  *
  * Scale: each iteration is ONE distributed aggregation (map-side
  * partial sums of `Dim` integer columns — one tiny row reaches the
  * driver per iteration, the [[graft.similarity.KMeans]] pattern);
  * features are staged once so the corpus pays one regex pass, not k.
  * Serving is a stateless map-only projection — it applies to a
  * STREAMING DataFrame unchanged (no foreachBatch wrapper needed).
  */
object QualityClassifier {

  /** Feature count including the bias slot 0. */
  val Dim = 5

  /** Per-doc features: `x0`=1 (bias), `x1`=alpha ratio, `x2`=punct
    * ratio, `x3`=stopword hit rate, `x4`=capped length term — plus the
    * integerized contributions `c0..c4` (1e-6 units) and the ±1 label
    * `y` from `labelExpr`. All expressions mirror
    * [[TextOps.qualityScore]]'s components verbatim. */
  def features(docs: DataFrame, labelExpr: Column): DataFrame = {
    val xs = lit(1.0) +: TextOps.qualityComponents(col("text"))
    val cols = col("doc_id") +: labelExpr.cast("long").as("y") +:
      (xs.zipWithIndex.map { case (x, j) => x.as(s"x$j") } ++
        xs.zipWithIndex.map { case (x, j) =>
          round(x * 1e6).cast("long").as(s"c$j") })
    docs.select(cols: _*)
  }

  /** The default gate label: is this document English (`lang` column)?
    * A real linear-separability target for the stopword/ratio features,
    * and trivially replayable by the oracle. */
  def enLabel: Column = when(col("lang") === "en", 1L).otherwise(-1L)

  /** Fixed-order margin in 1e-6-weight units: `w0·x0 + w1·x1 + …` —
    * left-associated exactly as the oracle SQL writes it. */
  def margin(w: Seq[Long]): Column = {
    require(w.length == Dim, s"weight vector must have $Dim slots")
    w.zipWithIndex
      .map { case (wj, j) => lit(wj.toDouble) * col(s"x$j") }
      .reduceLeft(_ + _)
  }

  /** Batch-perceptron training: k passes, each ONE distributed
    * aggregation summing the integerized update contributions of
    * currently-misclassified rows (`y·m ≤ 0` — with w=0 every row
    * updates, the standard bootstrap). Returns integer 1e-6-unit
    * weights. Deterministic: no RNG, no order dependence. */
  def fit(docs: DataFrame, labelExpr: Column, iters: Int): Array[Long] = {
    // one regex pass over the corpus, not k: features cache on first use
    // and the loop re-aggregates the cached columns. persist/unpersist
    // (not localCheckpoint): the blocks are fully consumed INSIDE this
    // method, so they must not outlive it — a long-lived session
    // retraining repeatedly would otherwise accumulate corpus-sized
    // cached blocks (the storage-pressure class the bench's tail paid).
    val f = features(docs, labelExpr).persist()
    try {
      var w = Array.fill(Dim)(0L)
      for (_ <- 1 to iters) {
        val mis = col("y").cast("double") * margin(w.toIndexedSeq) <= 0.0
        val sums = (0 until Dim).map(j =>
          sum(when(mis, col("y") * col(s"c$j")).otherwise(0L)).as(s"d$j"))
        val row = f.agg(sums.head, sums.tail: _*).collect().head
        w = Array.tabulate(Dim)(j =>
          w(j) + (if (row.isNullAt(j)) 0L else row.getLong(j)))
      }
      w
    } finally f.unpersist(blocking = false)
  }

  /** Map-only serve: margin (1e-6 units, rounded to BIGINT) + predicted
    * label per doc. Stateless — applies to streaming inputs unchanged. */
  def scoreWith(docs: DataFrame, w: Seq[Long], labelExpr: Column): DataFrame =
    features(docs, labelExpr)
      .select(col("doc_id"),
        round(margin(w)).cast("long").as("margin_e6"),
        (margin(w) > 0.0).as("pred_en"), col("y"))

  /** Train + serve in one plan (the gate-query composition). */
  def score(docs: DataFrame, labelExpr: Column, iters: Int): DataFrame =
    scoreWith(docs, fit(docs, labelExpr, iters).toIndexedSeq, labelExpr)

  /** Margin bins are keyed on `(margin_e6 + BinOffset) div width`: both
    * engines' integer division agrees only on NON-NEGATIVE operands
    * (Spark `div` truncates toward zero, DuckDB `//` floors — they
    * differ on every negative margin), so the offset shifts the whole
    * margin range positive first. 1e12 is far beyond any reachable
    * |margin| (weights are iteration-bounded integer sums of 1e6-scaled
    * features). */
  val BinOffset = 1000000000000L

  /** Calibration/reliability readout for a trained gate: fixed-width
    * margin bins, each with row count, positive count, and the observed
    * positive rate in ppm — is the score monotone in the actual label
    * rate, and where does the decision boundary actually sit? Pure
    * integer arithmetic over [[scoreWith]] output (`margin_e6`, `y`),
    * one small aggregation — the post-training audit every deployed
    * quality gate ships with. */
  def calibrationBins(scored: DataFrame, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"calibrationBins: binWidth=$binWidth must be > 0")
    require(BinOffset % binWidth == 0,
      s"calibrationBins: binWidth=$binWidth must divide $BinOffset " +
        "(so the shifted bin key subtracts back to the true floor bin)")
    scored
      .withColumn("bin",
        expr(s"(margin_e6 + $BinOffset) div $binWidth") - BinOffset / binWidth)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y") === 1, 1L).otherwise(0L)).as("n_pos"),
        sum(col("margin_e6")).as("sum_margin_e6"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("n_pos * 1000000 div n").as("pos_ppm"),
        col("sum_margin_e6"))
  }
}
