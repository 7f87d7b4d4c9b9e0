package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curriculum INTERLEAVE — a deterministic total order over a banded
  * corpus in which every band spreads uniformly: any contiguous
  * training window sees each band at ≈ its global proportion. This is
  * the delivery-order half of curriculum/mixing design (the share
  * planning half is [[MixPlanner]]): quality tiers, languages, or
  * sources must not arrive in blocks — a block of one band is a
  * distribution shift mid-training.
  *
  * Order contract: sort by `(pos_ppm, band, id)` where `pos_ppm =
  * (rank_in_band − 1) · 10⁶ div band_size` and the within-band rank
  * follows the md5 draw (epoch-parameterized — the d_epoch_shuffle
  * permutation convention, zero RNG state, engines agree bit-for-bit).
  * Emitting the SORT KEY instead of a global row_number keeps delivery
  * range-partitionable — no single-task global window anywhere.
  *
  * Proportionality is EXACT, not statistical: band b contributes
  * `ceil(P·n_b/10⁶)` rows below any pos_ppm threshold P (±1 from the
  * div floor) — the prefix law the spec pins.
  *
  * Scale: one hash exchange on `band` (the rank and band-size windows
  * share it). Bands are few and huge, so that window is numBands tasks
  * — fine to ~10⁸ rows/band; past that, the MAP-ONLY form replaces the
  * rank with the draw itself scaled to ppm (`draw` is uniform, so
  * `draw div 2⁶⁰/10⁶` is already a within-band position — proportional
  * by concentration rather than ±1-exact, and shuffle-free). Both
  * forms are provided; the exact form is the gate/oracle one.
  */
object Curriculum {

  /** The d_epoch_shuffle md5 draw, `cur`-prefixed: uniform in
    * [0, 2⁶⁰), deterministic per (epoch, id); reads the staged `_cid`
    * column. */
  private def draw(epoch: Long): Column =
    expr(s"cast(conv(substring(md5(cast(concat('cur', '$epoch', ':', " +
      "cast(_cid as string)) as binary)), 1, 15), 16, 10) as bigint)")

  /** Exact interleave: `(id, band, r_in_band, pos_ppm)`; delivery order
    * is `ORDER BY (pos_ppm, band, id)`. */
  def interleave(df: DataFrame, idCol: String, bandCol: String,
                 epoch: Long = 0L): DataFrame = {
    val w = Window.partitionBy(col("band"))
    val base = df.select(col(idCol).cast("long").as("_cid"),
        col(bandCol).cast("string").as("band"))
      .withColumn("draw", draw(epoch))
    base
      .withColumn("r_in_band", row_number().over(
        w.orderBy(col("draw"), col("_cid"))).cast("long"))
      .withColumn("n_band", count(lit(1)).over(w))
      .select(col("_cid").as("id"), col("band"), col("r_in_band"),
        expr("(r_in_band - 1) * 1000000 div n_band").as("pos_ppm"))
  }

  /** Map-only interleave (the 100 TB form): position = the draw itself
    * scaled to ppm — shuffle-free, proportional by uniformity of the
    * draw instead of the ±1 rank law. Same output shape minus the
    * rank. */
  def interleaveMapOnly(df: DataFrame, idCol: String, bandCol: String,
                        epoch: Long = 0L): DataFrame =
    df.select(col(idCol).cast("long").as("_cid"),
        col(bandCol).cast("string").as("band"))
      .withColumn("draw", draw(epoch))
      // draw ∈ [0, 2^60); 2^60 div 10^6 = 1152921504606 — dividing by
      // 1152921504607 keeps the quotient strictly below 10^6
      .select(col("_cid").as("id"), col("band"),
        expr("draw div 1152921504607").as("pos_ppm"))
}
