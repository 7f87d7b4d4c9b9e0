package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  /** Bit-by-bit reference interleave. */
  private def ref(x: Int, y: Int): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1).toLong << (2 * i)
      z |= ((y >> i) & 1).toLong << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zorderKey matches the bit-by-bit reference on random 16-bit pairs") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rnd.nextInt(65536), rnd.nextInt(65536))) ++
      Seq((0, 0), (65535, 65535), (0, 65535), (65535, 0), (1, 2))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.zorderKey(col("x"), col("y")).as("z"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) == ref(x, y), s"($x,$y)")
    }
  }

  test("zorderKey interleaves monotonically per dimension slice") {
    // fixing y, the key is strictly increasing in x (spread is monotone)
    val rows = (0 until 100).map(x => (x, 42))
    val keys = rows.toDF("x", "y")
      .select(ZOrder.zorderKey(col("x"), col("y")).as("z"), col("x"))
      .orderBy("x").collect().map(_.getLong(0))
    assert(keys.sliding(2).forall { case Array(a, b) => a < b })
  }

  test("inputs wider than 16 bits are taken mod 2^16") {
    val got = Seq((65536 + 5, 131072 + 9)).toDF("x", "y")
      .select(ZOrder.zorderKey(col("x"), col("y")).as("z"))
      .head().getLong(0)
    assert(got == ref(5, 9))
  }

  test("Z-order layout bounds per-file min/max on BOTH dimensions (file-skipping property)") {
    // range-partition uniform 2-D data by zkey vs by x alone, then measure
    // the per-file [min,max] extent of each dimension — the statistic
    // parquet footers expose and pruning uses. Under the zkey layout BOTH
    // dims have bounded extents per file; under the x sort, y's per-file
    // extent spans the whole domain (no file can be skipped for y
    // predicates).
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(4000)((rnd.nextInt(1024), rnd.nextInt(1024)))
    val df = rows.toDF("x", "y")
      .withColumn("zkey", ZOrder.zorderKey(col("x"), col("y")))
    def extents(sorted: org.apache.spark.sql.DataFrame, dim: String): Seq[Long] =
      sorted.groupBy(spark_partition_id().as("file"))
        .agg((max(col(dim)) - min(col(dim))).cast("long").as("ext"))
        .collect().map(_.getAs[Long]("ext")).toSeq
    val byZ = df.repartitionByRange(16, col("zkey"))
    val byX = df.repartitionByRange(16, col("x"))
    // median per-file y-extent: tight under zkey, full-domain under x-sort
    def median(xs: Seq[Long]) = xs.sorted.apply(xs.size / 2)
    val yExtZ = median(extents(byZ, "y"))
    val yExtX = median(extents(byX, "y"))
    assert(yExtZ < 600, s"zorder y-extent $yExtZ should be bounded")
    assert(yExtX > 900, s"x-sort y-extent $yExtX should span the domain")
    // and zorder still bounds x (both dims benefit, unlike a plain sort)
    assert(median(extents(byZ, "x")) < 600)
  }
}
