package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends SparkTestBase {

  test("GraftExtensions injects rolling_hash") {
    // wiring: applying the extensions populates the injected-function list
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // registry effect: install the same descriptor into the live session and
    // drive it through SQL (getOrCreate may reuse a session built without
    // spark.sql.extensions, so install explicitly for the e2e leg)
    val (ident, info, builder) = GraftExtensions.rollingHashDescriptor
    org.apache.spark.sql.graftshim.ColumnBridge.registerFunction(
      spark, ident.funcName, builder)
    val got = spark.sql("SELECT rolling_hash('ab') AS h").head.getLong(0)
    assert(got == (('a'.toLong * 31) + 'b'.toLong) % 1000000007L)
  }

  test("every native kernel is SQL-registered and matches its Column-API twin") {
    import org.apache.spark.sql.graftshim.ColumnBridge
    import org.apache.spark.sql.functions._
    // install the full descriptor set into the live session (getOrCreate
    // may reuse a session built without spark.sql.extensions)
    Seq(GraftExtensions.rollingHashDescriptor,
      GraftExtensions.cmsEstimateDescriptor,
      GraftExtensions.ngramHashesDescriptor,
      GraftExtensions.minhashSigDescriptor,
      GraftExtensions.bottomKDescriptor,
      GraftExtensions.simhash64Descriptor,
      GraftExtensions.pow10fDescriptor,
      GraftExtensions.dotProductDescriptor,
      GraftExtensions.hyperplaneBucketsDescriptor,
      GraftExtensions.zorderKeyDescriptor,
      GraftExtensions.winnowKeysDescriptor,
      GraftExtensions.cdcBoundariesDescriptor,
      GraftExtensions.dotCodesDescriptor,
      GraftExtensions.signedProjectDescriptor,
      GraftExtensions.signBitsDescriptor,
      GraftExtensions.hammingWordsDescriptor,
      GraftExtensions.fwhtRotateDescriptor,
      GraftExtensions.arraySumAggDescriptor).foreach { case (ident, _, b) =>
      ColumnBridge.registerFunction(spark, ident.funcName, b)
    }

    // array_sum_agg: element-wise vector accumulator, SQL == Column API,
    // and the analyzer rejects a non-double array
    val asSql = spark.sql(
      "SELECT array_sum_agg(CAST(v AS ARRAY<DOUBLE>)) AS s FROM VALUES " +
        "(array(1.0, 2.0)), (array(10.0, 20.0)), (array(100.0, 200.0)) " +
        "AS t(v)").head.getSeq[Double](0)
    assert(asSql == Seq(111.0, 222.0))
    val asErr = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT array_sum_agg(array('x', 'y')) AS s").collect()
    }
    assert(asErr.getMessage.toLowerCase.contains("array_sum_agg"))

    // simhash64 over string tokens == the Column-API kernel; a mistyped
    // argument fails in the ANALYZER (SQL users get a type error, not an
    // eval-time ClassCastException)
    val sigSql = spark.sql("SELECT simhash64(array('ab', 'cd', 'ef')) AS s")
      .head.getLong(0)
    val sigApi = spark.range(1)
      .select(ColumnBridge.column(graft.functions.SimHash64(
        ColumnBridge.expression(array(lit("ab"), lit("cd"), lit("ef")))))
        .as("s"))
      .head.getLong(0)
    assert(sigSql == sigApi)
    val typeErr = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT simhash64(array(1L, 2L)) AS s").collect()
    }
    assert(typeErr.getMessage.toLowerCase.contains("simhash64"))

    // pow10f: fdlibm-stable f32 scale factor
    assert(spark.sql("SELECT pow10f(3) AS f").head.getFloat(0) == 1000.0f)
    assert(spark.sql("SELECT pow10f(-2) AS f").head.getFloat(0) == 0.01f)

    // dot_product on float vectors
    val dp = spark.sql(
      "SELECT dot_product(CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>), " +
        "CAST(array(4.0, 5.0, 6.0) AS ARRAY<FLOAT>)) AS d").head.getDouble(0)
    assert(dp == 32.0)

    // hyperplane_buckets == Similarity.hyperplaneBuckets
    val embSql = "CAST(array(0.5, -1.0, 2.0, 0.25) AS ARRAY<FLOAT>)"
    val hbSql = spark.sql(
      s"SELECT hyperplane_buckets($embSql, 4, 8, 2) AS b")
      .head.getSeq[Long](0)
    val hbApi = spark.range(1)
      .select(graft.similarity.Similarity.hyperplaneBuckets(
        expr(embSql), dim = 4, numPlanes = 8, numTables = 2).as("b"))
      .head.getSeq[Long](0)
    assert(hbSql == hbApi)

    // zorder_key: interleaved Morton bits, SQL == Column API
    val zSql = spark.sql("SELECT zorder_key(3, 5) AS z").head.getLong(0)
    val zApi = spark.range(1)
      .select(graft.functions.ZOrder.zorderKey(lit(3), lit(5)).as("z"))
      .head.getLong(0)
    assert(zSql == zApi && zSql == 39L) // 3→bits at 0,2 = 5; 5→bits at 1,5 = 34

    // winnow_keys: SQL == Column API, and the selection is non-empty on
    // a string with at least one full window
    val wSql = spark.sql(
      "SELECT winnow_keys('thequickbrownfoxjumpsover', 12, 5) AS k")
      .head.getSeq[Long](0)
    val wApi = spark.range(1)
      .select(graft.functions.WinnowKeys.winnowKeys(
        lit("thequickbrownfoxjumpsover"), 12, 5).as("k"))
      .head.getSeq[Long](0)
    assert(wSql == wApi && wSql.nonEmpty)

    // cdc_boundaries: SQL == Column API on a token array with interior
    // gram ends
    val toks = "array(" + (1 to 40).map(i => s"'t$i'").mkString(",") + ")"
    val cSql = spark.sql(
      s"SELECT cdc_boundaries($toks, 4, 8) AS b").head.getSeq[Int](0)
    val cApi = spark.range(1)
      .select(graft.functions.CdcBoundaries.cdcBoundaries(
        expr(toks), 4, 8).as("b"))
      .head.getSeq[Int](0)
    assert(cSql == cApi)

    // dot_codes: exact integer dot, SQL == Column API == hand value
    val dc = spark.sql(
      "SELECT dot_codes(CAST(array(1, -2, 3) AS ARRAY<BIGINT>), " +
        "CAST(array(4, 5, 6) AS ARRAY<BIGINT>)) AS d").head.getLong(0)
    assert(dc == 4L - 10L + 18L)

    // signed_project: SQL == Column API on a 4->2 projection
    val pEmb = "CAST(array(0.5, -0.25, 0.125, 1.0) AS ARRAY<FLOAT>)"
    val pSql = spark.sql(
      s"SELECT signed_project($pEmb, 4, 2) AS p").head.getSeq[Long](0)
    val pApi = spark.range(1)
      .select(graft.functions.SignedProjectExpr.signed_project(
        expr(pEmb), 4, 2).as("p"))
      .head.getSeq[Long](0)
    assert(pSql == pApi && pSql.length == 2)

    // sign_bits / hamming_words: SQL == Column API on a hand vector
    val bEmb = "CAST(array(0.5, -0.25, 0.0, 1.0) AS ARRAY<FLOAT>)"
    val bSql = spark.sql(
      s"SELECT sign_bits($bEmb, 4) AS b").head.getSeq[Long](0)
    val bApi = spark.range(1)
      .select(graft.functions.SignBitsExpr.sign_bits(expr(bEmb), 4).as("b"))
      .head.getSeq[Long](0)
    assert(bSql == bApi && bSql == Seq((1L << 0) | (1L << 3)))
    val hSql = spark.sql(
      "SELECT hamming_words(CAST(array(9) AS ARRAY<BIGINT>), " +
        "CAST(array(5) AS ARRAY<BIGINT>)) AS h").head.getLong(0)
    assert(hSql == 2L) // 9 ^ 5 = 12 -> two bits

    // fwht_rotate: SQL == Column API == reference on a hand vector
    val rEmb = "CAST(array(1.0, 0.0, -2.0, 0.5) AS ARRAY<FLOAT>)"
    val rSql = spark.sql(
      s"SELECT fwht_rotate($rEmb, 4) AS r").head.getSeq[Float](0)
    val rRef = graft.functions.FwhtRotateExpr
      .rotateRef(Array(1.0f, 0.0f, -2.0f, 0.5f), 4).toSeq
    assert(rSql == rRef)
  }
}
