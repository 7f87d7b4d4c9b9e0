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
}
