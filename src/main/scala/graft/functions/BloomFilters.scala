package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.ColumnBridge

/** Column API over Spark's internal Bloom-filter expressions (the machinery
  * behind `InjectRuntimeFilter`, not SQL-registered): build a filter over a
  * small side's join keys and pre-filter the fact side BEFORE its shuffle —
  * the explicit form of a runtime semi-join filter, usable regardless of
  * AQE/threshold heuristics. False positives are bounded by `numBits` and
  * removed by the real join afterwards, so composed results stay exact.
  */
object BloomFilters {

  /** Aggregate: Bloom filter (as binary) over xxhash64 of `keys`. */
  def bloom_agg(keys: Column, estimatedItems: Long, numBits: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ColumnBridge.expression(keys))),
        Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Predicate: might `key` be in `bloom`? (no false negatives). */
  def might_contain(bloom: Column, key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom),
      new XxHash64(Seq(ColumnBridge.expression(key)))))
}
