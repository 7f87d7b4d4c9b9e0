package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** The table loader is the single seam between the driver-generated
  * parquet and every query: if the driver regenerates testdata with a
  * different physical encoding, the failure must surface HERE, loudly,
  * not as 40 opaque analysis errors across the query surface (round 5:
  * events.ts moved from TIMESTAMP(NANOS)-as-INT64 to timestamp[us] and
  * silently failed 43 queries in the driver's gate).
  */
class TablesSpec extends SparkTestBase {

  test("events.ts normalizes to session-tz TIMESTAMP at every sf dir") {
    for (d <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$d"
      if (new java.io.File(dir).isDirectory) {
        val ev = Tables.load(spark, dir, "events")
        assert(ev.schema("ts").dataType == TimestampType,
          s"$d: ts loaded as ${ev.schema("ts").dataType}")
        // epoch math (the packed-key convention every events oracle
        // uses) must produce sane 21st-century instants, not nulls or
        // nanosecond-scale garbage from a misread encoding
        val r = ev.agg(
          min(unix_timestamp(col("ts"))).as("lo"),
          max(unix_timestamp(col("ts"))).as("hi"),
          count(when(col("ts").isNull, 1)).as("nulls")).collect()(0)
        assert(r.getLong(2) == 0, s"$d: null ts rows")
        assert(r.getLong(0) > 946684800L && r.getLong(1) < 4102444800L,
          s"$d: epoch range [${r.getLong(0)}, ${r.getLong(1)}] not in " +
            "2000..2100 — ts encoding misread")
      }
    }
  }

  test("pinned dtypes for the columns the query suite leans on — " +
      "documents/embeddings drift fails here, not as opaque per-query " +
      "errors (the events.ts lesson, applied to the other hot tables)") {
    for (d <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$d"
      if (new java.io.File(dir).isDirectory) {
        val doc = Tables.load(spark, dir, "documents")
        for ((c, t) <- Seq("doc_id" -> LongType, "text" -> StringType,
            "lang" -> StringType, "source" -> StringType,
            "n_chars" -> LongType))
          assert(doc.schema(c).dataType == t,
            s"$d documents.$c: ${doc.schema(c).dataType} != $t")
        val emb = Tables.load(spark, dir, "embeddings")
        emb.schema("embedding").dataType match {
          case ArrayType(FloatType, _) =>
          case dt => fail(s"$d embeddings.embedding: $dt — the f32→f64 " +
            "widening exactness contracts of every e_* oracle assume " +
            "array<float>")
        }
        assert(emb.schema("vec_id").dataType == LongType,
          s"$d embeddings.vec_id: ${emb.schema("vec_id").dataType}")
        val ev = Tables.load(spark, dir, "events")
        for ((c, t) <- Seq("event_id" -> LongType, "user_id" -> LongType,
            "value" -> DoubleType, "event_type" -> StringType))
          assert(ev.schema(c).dataType == t,
            s"$d events.$c: ${ev.schema(c).dataType} != $t")
      }
    }
  }

  test("every table loads with a non-empty schema and rows at sf0.001") {
    for (t <- Tables.all) {
      val df = Tables.load(spark, sfDir, t)
      assert(df.schema.nonEmpty, s"$t: empty schema")
      assert(df.limit(1).count() == 1, s"$t: no rows")
    }
  }

  test("loader normalizes both historical events.ts encodings") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_enc").toString
    // timestamp[us]-style: Spark writes TIMESTAMP_NTZ parquet
    Seq((1L, java.time.LocalDateTime.of(2024, 3, 1, 12, 0)))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val ntz = Tables.load(spark, tmp, "events")
    assert(ntz.schema("ts").dataType == TimestampType)
    assert(ntz.select(unix_timestamp(col("ts"))).collect()(0).getLong(0)
      == 1709294400L) // 2024-03-01T12:00Z — session tz is UTC
    // INT64-nanos style (the legacy TIMESTAMP(NANOS) read path)
    Seq((1L, 1709294400L * 1000000000L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val nanos = Tables.load(spark, tmp, "events")
    assert(nanos.schema("ts").dataType == TimestampType)
    assert(nanos.select(unix_timestamp(col("ts"))).collect()(0).getLong(0)
      == 1709294400L)
  }
}
