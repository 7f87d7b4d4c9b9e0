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
}
