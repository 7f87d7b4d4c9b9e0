package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for shuffle joins: salt the skewed (big) side into
  * `numSalts` sub-keys and replicate the small side across all salts, so one
  * hot key spreads over `numSalts` reducers.
  *
  * AQE's skew-join handling (spark.sql.adaptive.skewJoin) covers most cases
  * at runtime; this explicit operator is for planned skew — a known hot key
  * (the "null key" / "default tenant" pattern) where you want deterministic
  * layout, or non-AQE execution paths (streaming joins).
  */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `keys`, with the big side salted.
    * Result equals the unsalted join exactly; only the shuffle layout
    * changes. The salt is derived from a hash of the big side's full row —
    * deterministic, no rand() (re-executable tasks stay consistent).
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                      numSalts: Int): DataFrame = {
    require(numSalts > 0)
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(numSalts)).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    saltedBig.join(saltedSmall, keys :+ "_salt").drop("_salt")
  }

  /** Grouped aggregation with two-phase salting: partial-aggregate on
    * (key, salt), then final-aggregate on key. Spark's hash aggregate
    * already partial-aggregates map-side; explicit salting additionally
    * splits a hot *reduce* key. aggs maps output column name → aggregate
    * over a partial column (must be re-aggregatable: sum/min/max/count-as-sum).
    */
  def saltedSumAgg(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
                   numSalts: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(numSalts)).cast("int"))
    val partial = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(sumCols.head -> "sum", sumCols.tail.map(_ -> "sum"): _*)
    val renamed = sumCols.foldLeft(partial) { (d, c) =>
      d.withColumnRenamed(s"sum($c)", c)
    }
    renamed.groupBy(keys.map(col): _*)
      .agg(sumCols.head -> "sum", sumCols.tail.map(_ -> "sum"): _*)
      .select(keys.map(col) ++
        sumCols.map(c => col(s"sum($c)").as(s"sum_$c")): _*)
  }
}
