package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[ArraySumAgg]] — posexplode-replay parity, partial-aggregation
  * (multi-partition) correctness on an integer lattice, grouped use,
  * null-row skip, and the loud width-mismatch contract. */
class VectorSumAggSpec extends SparkTestBase {
  import spark.implicits._

  test("matches the posexplode → groupBy(pos) replay on real embeddings") {
    val vecs = graft.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 50)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
    val got = vecs.select(VectorSumAgg.array_sum_agg(col("v")).as("s"))
      .head.getSeq[Double](0)
    val want = vecs.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(sum(col("x")).as("s"))
      .orderBy(col("pos")).collect().map(_.getDouble(1)).toSeq
    assert(got.length == want.length)
    // both sides are distributed double sums — compare at the fp-noise
    // tolerance, exactness comes from the lattice test below
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) <= 1e-9 * math.max(1.0, math.abs(w)))
    }
  }

  test("partial buffers merge exactly across many partitions (integer lattice)") {
    val rows = (1 to 1000).map(i =>
      Seq(i.toDouble, (2 * i).toDouble, 1.0))
    val df = spark.createDataset(rows).repartition(17)
      .select(col("value").as("v"))
    val got = df.select(VectorSumAgg.array_sum_agg(col("v")).as("s"))
      .head.getSeq[Double](0)
    assert(got == Seq(500500.0, 1001000.0, 1000.0))
  }

  test("grouped aggregation keeps one accumulator per group; null rows skip") {
    val df = Seq(
      (1L, Some(Seq(1.0, 2.0))),
      (1L, None),
      (1L, Some(Seq(3.0, 4.0))),
      (2L, Some(Seq(10.0, 20.0)))
    ).toDF("g", "v")
    val got = df.groupBy(col("g"))
      .agg(VectorSumAgg.array_sum_agg(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(1L) == Seq(4.0, 6.0))
    assert(got(2L) == Seq(10.0, 20.0))
  }

  test("an all-null group evaluates to an empty array, not a crash") {
    val df = Seq((1L, Option.empty[Seq[Double]])).toDF("g", "v")
    val got = df.groupBy(col("g"))
      .agg(VectorSumAgg.array_sum_agg(col("v")).as("s"))
      .head.getSeq[Double](1)
    assert(got.isEmpty)
  }

  test("width-0 rows skip like nulls in either order — acceptance never depends on row order") {
    val a = Seq(Seq.empty[Double], Seq(1.0, 2.0)).toDF("v").coalesce(1)
    val b = Seq(Seq(1.0, 2.0), Seq.empty[Double]).toDF("v").coalesce(1)
    for (df <- Seq(a, b)) {
      val got = df.select(VectorSumAgg.array_sum_agg(col("v")).as("s"))
        .head.getSeq[Double](0)
      assert(got == Seq(1.0, 2.0))
    }
  }

  test("width mismatch fails loud — never a silent truncating zip") {
    val df = Seq(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)).toDF("v")
      .coalesce(1) // same task, so update (not merge) sees the mismatch
    val e = intercept[Exception] {
      df.select(VectorSumAgg.array_sum_agg(col("v"))).collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("width") ||
        e.getCause != null && e.getCause.getMessage.contains("width")))
  }
}
