package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class OutliersSpec extends SparkTestBase {

  test("madFlag flags by hand-computed median/MAD") {
    import spark.implicits._
    // group a: values 1,2,3,4,100 -> med=3 (rank (5+1) div 2 = 3),
    // devs {2,1,0,1,97} sorted {0,1,1,2,97} -> mad=1 (rank 3);
    // only 100 has dev 97 > 3*1.
    // group b: values 5,5,5,9 -> med=5 (rank 2), devs {0,0,0,4} -> mad=0
    // (rank 2); the MAD=0 degeneracy flags everything off the median.
    val df = Seq(
      ("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L), ("a", 4L, 4L),
      ("a", 5L, 100L),
      ("b", 1L, 5L), ("b", 2L, 5L), ("b", 3L, 5L), ("b", 4L, 9L)
    ).toDF("g", "id", "v").repartition(2)
    val got = Outliers.madFlag(df, "g", "v", "id", k = 3)
      .orderBy("g", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getInt(6)))
    val want = Seq(
      ("a", 1L, 3L, 1L, 2L, 0), ("a", 2L, 3L, 1L, 1L, 0),
      ("a", 3L, 3L, 1L, 0L, 0), ("a", 4L, 3L, 1L, 1L, 0),
      ("a", 5L, 3L, 1L, 97L, 1),
      ("b", 1L, 5L, 0L, 0L, 0), ("b", 2L, 5L, 0L, 0L, 0),
      ("b", 3L, 5L, 0L, 0L, 0), ("b", 4L, 5L, 0L, 4L, 1))
    assert(got.toSeq == want)
  }

  test("madFlag is a total pass over the input (no rows dropped)") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("lang"), col("doc_id"), col("n_chars"))
    val got = Outliers.madFlag(d, "lang", "n_chars", "doc_id", 3)
    assert(got.count() == d.count())
    assert(got.filter(col("med").isNull || col("mad").isNull).count() == 0)
  }
}
