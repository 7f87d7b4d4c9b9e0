package graft.functions

import graft.SparkTestBase
import graft.functions.BottomK.bottomKByHash
import org.apache.spark.sql.functions._

class BottomKSpec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("partition invariance: identical sample whether the group arrives " +
      "in 1 partition or 13 (the KMV merge law, executed by Spark's " +
      "partial-agg machinery)") {
    val vals = (0 until 500).map(i => ("g", s"v$i"))
    val one = vals.toDF("g", "v").repartition(1)
      .groupBy("g").agg(bottomKByHash(col("v"), 7, "salt").as("s"))
      .head.getSeq[String](1)
    val many = vals.toDF("g", "v").repartition(13)
      .groupBy("g").agg(bottomKByHash(col("v"), 7, "salt").as("s"))
      .head.getSeq[String](1)
    assert(one == many, s"$one != $many")
    // and it equals the reference bottom-k computed driver-side
    val expect = vals.map(_._2).sortBy(v => (md5hex("salt" + v), v)).take(7)
    assert(one == expect)
  }

  test("k >= group size returns the whole group in digest order; nulls " +
      "are skipped; k caps the result") {
    val df = Seq(("a", Some("x")), ("a", Some("y")), ("a", None),
      ("b", Some("p")), ("b", Some("q")), ("b", Some("r"))).toDF("g", "v")
      .repartition(3)
    val got = df.groupBy("g")
      .agg(bottomKByHash(col("v"), 2, "z").as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("a").toSet == Set("x", "y")) // null skipped, both survive
    assert(got("a") == got("a").sortBy(v => (md5hex("z" + v), v)))
    assert(got("b").length == 2) // capped below group size
    assert(got("b") ==
      Seq("p", "q", "r").sortBy(v => (md5hex("z" + v), v)).take(2))
  }

  test("different salts pick different samples (salt is the sample seed)") {
    val vals = (0 until 200).map(i => ("g", s"v$i"))
    def sample(salt: String) = vals.toDF("g", "v").repartition(4)
      .groupBy("g").agg(bottomKByHash(col("v"), 5, salt).as("s"))
      .head.getSeq[String](1)
    assert(sample("s1") != sample("s2"))
  }

  test("SQL registration via GraftExtensions: bottomk_by_hash callable " +
      "from SQL and equal to the Column form") {
    val (ident, _, builder) = graft.GraftExtensions.bottomKDescriptor
    org.apache.spark.sql.graftshim.ColumnBridge.registerFunction(
      spark, ident.funcName, builder)
    (0 until 50).map(i => ("g", s"v$i")).toDF("g", "v")
      .createOrReplaceTempView("bk_in")
    val viaSql = spark.sql(
      "SELECT bottomk_by_hash(v, 3, 'q') AS s FROM bk_in GROUP BY g")
      .head.getSeq[String](0)
    val viaCol = spark.table("bk_in").groupBy("g")
      .agg(bottomKByHash(col("v"), 3, "q").as("s")).head.getSeq[String](1)
    assert(viaSql == viaCol)
  }

  test("values beyond the 64 KiB writeUTF limit survive buffer " +
      "serialization — unit round-trip and through a real shuffle") {
    val agg = BottomKByHash(
      org.apache.spark.sql.graftshim.ColumnBridge.expression(col("v")), 2, "s")
    val big = "x" * 100000
    val buf = scala.collection.mutable.ArrayBuffer(("aa", big), ("bb", "small"))
    assert(agg.deserialize(agg.serialize(buf)) == buf)

    // end to end: partial buffers carrying >64KiB values cross the exchange
    val rows = (0 until 12).map(i => ("g", ("y" * 70000) + i))
    val got = rows.toDF("g", "v").repartition(4)
      .groupBy("g").agg(bottomKByHash(col("v"), 3, "se").as("s"))
      .head.getSeq[String](1)
    val expect = rows.map(_._2).sortBy(v => (md5hex("se" + v), v)).take(3)
    assert(got == expect)
  }

  test("hot group: 10^6 rows in ONE group shuffle as one O(k) buffer per " +
      "map task — partial buffers never hold the group (the 100TB question " +
      "for any TypedImperativeAggregate)") {
    // memory side, exercised directly: a million updates through one
    // buffer never grow it beyond k entries
    val agg = BottomKByHash(
      org.apache.spark.sql.graftshim.ColumnBridge.expression(col("v")), 5, "hg")
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    val buf = agg.createAggregationBuffer()
    // bind the child to the single input slot and drive the real update()
    val bound = agg.copy(child =
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.StringType, nullable = true))
    var j = 0
    while (j < 1000000) {
      row.update(0, org.apache.spark.unsafe.types.UTF8String.fromString(s"v$j"))
      bound.update(buf, row)
      assert(buf.length <= 5)
      j += 1
    }

    // plan + shuffle side: with AQE pinned off (stable tree), the exchange
    // above the partial phase writes ONE record per map task for the
    // single group — never the million rows
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevAqe = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false")
    try {
      val df = spark.range(1000000)
        .select(lit("hot").as("g"), concat(lit("v"), col("id")).as("v"))
        .repartition(8)
        .groupBy("g").agg(bottomKByHash(col("v"), 5, "hg").as("s"))
      val got = df.head.getSeq[String](1)
      assert(got == buf.sorted.take(5).map(_._2),
        "distributed result != single-buffer result")
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(exchanges.nonEmpty, "no shuffle exchange found")
      val written = exchanges.map(_.metrics("shuffleRecordsWritten").value).sum
      assert(written <= 8,
        s"shuffle carried $written records — partial buffers not O(k)/task")
    } finally spark.conf.set(aqeKey, prevAqe)
  }

  test("plan shape: partial aggregation below the exchange (ObjectHashAggregate " +
      "partial_bottomk), so the shuffle carries buffers, not rows") {
    val df = (0 until 100).map(i => (s"g${i % 4}", s"v$i")).toDF("g", "v")
      .repartition(5)
      .groupBy("g").agg(bottomKByHash(col("v"), 3, "s").as("s"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_bottomk_by_hash") ||
      plan.toLowerCase.contains("partial") && plan.contains("bottomk_by_hash"),
      s"no partial aggregation phase:\n$plan")
  }
}
