package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.text.TextOps

/** Incremental near-duplicate detection against a PERSISTED corpus index —
  * the corpus-maintenance shape at 100 TB: you never re-dedup the whole
  * corpus when a new crawl batch arrives; you dedup the ARRIVALS against an
  * index of everything already admitted (plus among themselves), then fold
  * the survivors' signatures into the index for the next batch.
  *
  * The index stores, per document, the 64-bit shingle-id set and the
  * MinHash signature — the two things [[Similarity.minhashPairs]] derives
  * from text before any shuffle. Probing a batch therefore: (a) never
  * re-reads or re-shingles corpus TEXT (the dominant cost — raw documents
  * are ~KBs; sh+sig are ~100s of bytes); (b) runs the exact same banded
  * LSH join + exact-Jaccard verify as the batch operator, so the output is
  * provably `minhashPairs(corpus ∪ batch)` restricted to pairs that touch
  * the batch (parity-spec'd in IncrementalDedupSpec).
  *
  * Reference analog: the reference engine has no incremental story at all —
  * its pipeline reparses every feed per run (lib/greenbutton/src/lib.rs
  * feed loop); this operator plus [[graft.streaming.StreamingDedup]] are
  * the two Spark-native answers (batch-incremental and continuous).
  *
  * Index layout: plain parquet, schema-pinned like [[TrainedState]] but
  * NOT repartition(1) — the index is O(corpus), so it keeps its cluster
  * layout (one file per task; at scale, writers would bucket by a hash of
  * id so `foldIntoIndex` unions stay co-located).
  */
object IncrementalDedup {

  val indexSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sh", ArrayType(LongType), nullable = true),
    StructField("sig", ArrayType(LongType), nullable = true)))

  /** Shingle sets + MinHash signatures for `df(idCol, textCol)` — one row
    * per doc with ≥1 shingle, columns (id, sh, sig). Map-only. */
  def buildIndex(df: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, numHashes: Int = 32): DataFrame =
    df.select(col(idCol).cast(LongType).as("id"),
        array_distinct(TextOps.ngramHashes(TextOps.tokens(col(textCol)),
          shingleN)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", Similarity.minhashSignature(col("sh"), numHashes))

  /** Persist an index (schema-coerced; distributed layout, see scaladoc). */
  def saveIndex(index: DataFrame, path: String): Unit = {
    val cols = indexSchema.fields.map(f => col(f.name).cast(f.dataType).as(f.name))
    index.select(cols.toIndexedSeq: _*).write.mode("overwrite").parquet(path)
  }

  /** Load an index, failing fast at the driver on schema drift. */
  def loadIndex(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    val got = df.schema.fields.map(f => f.name -> f.dataType).toMap
    indexSchema.fields.foreach { f =>
      require(got.get(f.name).contains(f.dataType),
        s"dedup-index schema mismatch at $path: expected ${f.name}: " +
          s"${f.dataType.sql}, found ${got.get(f.name).map(_.sql).getOrElse("<missing>")}")
    }
    df.select(indexSchema.fields.map(f => col(f.name)).toIndexedSeq: _*)
  }

  /** Verified near-dup pairs between a new batch and an indexed corpus —
    * exactly `minhashPairs(corpus ∪ batch)` restricted to pairs with at
    * least one batch side: batch-vs-corpus AND batch-vs-batch, (id_a,
    * id_b, jaccard), id_a < id_b, jaccard = exact shingle Jaccard ≥
    * `minJaccard`. Corpus-vs-corpus pairs were the PREVIOUS batches' job
    * and are never re-derived (ids shared by batch and index pair with
    * themselves only as id_a = id_b, which the orientation filter drops —
    * a redelivered unchanged doc emits nothing new).
    *
    * The `maxBucketSize` guard counts the UNION's buckets, matching the
    * full-recompute semantics bucket for bucket.
    *
    * numHashes/numBands/shingleN must match the values the index was
    * built with — signatures are only comparable under the same family.
    */
  def pairsAgainstIndex(newDocs: DataFrame, index: DataFrame,
                        idCol: String, textCol: String,
                        shingleN: Int = 3, numHashes: Int = 32,
                        numBands: Int = 8, minJaccard: Double = 0.5,
                        maxBucketSize: Int = 0): DataFrame = {
    require(numBands > 0 && numHashes % numBands == 0,
      s"numBands ($numBands) must divide numHashes ($numHashes)")
    val rowsPerBand = numHashes / numBands
    // batch side computes signatures fresh — materialize before banding
    // (bands() reads sig via element_at inside per-band lambdas; an
    // unmaterialized sig would recompute per band slot). The index side
    // needs no barrier: its sig is a STORED parquet column.
    val batchIdx = buildIndex(newDocs, idCol, textCol, shingleN, numHashes)
      .localCheckpoint(true)
    def banded(idx: DataFrame, isNew: Boolean): DataFrame =
      idx.select(col("id"), col("sh"), lit(isNew).as("is_new"),
          explode(Similarity.bands(col("sig"), numBands, rowsPerBand)).as("b"))
        .select(col("id"), col("sh"), col("is_new"),
          col("b.band").as("band"), col("b.bucket").as("bucket"))
    var all = banded(batchIdx, isNew = true)
      .unionByName(banded(index, isNew = false))
    if (maxBucketSize > 0) {
      val sizes = all.groupBy("band", "bucket")
        .agg(count(lit(1)).as("_bn"))
        .filter(col("_bn") <= maxBucketSize)
        .select("band", "bucket")
      all = all.join(sizes, Seq("band", "bucket"), "left_semi")
    }
    val l = all.select(col("band"), col("bucket"), col("id").as("id_a"),
      col("sh").as("sh_a"), col("is_new").as("new_a"))
    val r = all.select(col("band"), col("bucket"), col("id").as("id_b"),
      col("sh").as("sh_b"), col("is_new").as("new_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("new_a") || col("new_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        Similarity.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Admit a batch into the index: union of the existing index and the
    * batch's (id, sh, sig) rows, minus batch ids the caller rejected as
    * duplicates (pass the keep-side of the pair decisions). Write the
    * result with [[saveIndex]] to a NEW path and swap (never overwrite the
    * path a concurrent prober is reading). */
  def foldIntoIndex(index: DataFrame, newDocs: DataFrame,
                    idCol: String, textCol: String,
                    shingleN: Int = 3, numHashes: Int = 32,
                    rejectIds: DataFrame = null): DataFrame = {
    var batch = buildIndex(newDocs, idCol, textCol, shingleN, numHashes)
    if (rejectIds != null) {
      val rj = rejectIds.select(col(rejectIds.columns.head).cast(LongType).as("id"))
      batch = batch.join(rj, Seq("id"), "left_anti")
    }
    index.unionByName(batch)
  }
}
