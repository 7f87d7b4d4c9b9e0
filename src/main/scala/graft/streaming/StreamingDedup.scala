package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode}

import graft.similarity.Similarity
import graft.text.TextOps

/** Incremental near-duplicate detection over a DOCUMENT STREAM: each
  * arriving doc is checked against everything already ingested, without
  * ever re-scanning the corpus — the streaming twin of
  * [[Similarity.minhashPairs]].
  *
  * Shape: the map-only signature stage (native NgramHash → MinHashSig
  * kernels, bit-identical to the batch path) fans each doc out to its
  * (band, bucket) LSH cells; `transformWithState` keyed on the cell holds
  * the docs previously seen in that cell (RocksDB state — off-heap,
  * disk-bounded) and emits a candidate pair for every new-vs-seen
  * collision. A pair colliding in several bands emits once per band
  * (at-least-once per band — `dropDuplicatesWithinWatermark` or a
  * downstream exact verify collapses them; the batch operator's
  * `dropDuplicates` plays that role there).
  *
  * `exact_sig` is true when the FULL signatures match (xxhash64 of all k
  * slots) — at MinHash resolution an exact duplicate; near-dups below
  * that collide in some bands with `exact_sig=false` and need a
  * downstream Jaccard verify against stored text (state deliberately
  * holds only (doc_id, sig_hash) — 16 bytes/doc/band — never text).
  *
  * At scale: state per cell is capped (`maxBucketSize` — identical-
  * signature pileups are real duplicates; the cap bounds the quadratic
  * emission an adversarial cell could produce, same guard as the batch
  * path) and idle cells are TTL-evicted, so state tracks the ACTIVE
  * near-dup surface, not corpus history.
  */
object StreamingDedup {

  case class StreamDoc(doc_id: Long, text: String)
  case class BandHit(band: Int, bucket: Long, doc_id: Long, sig_hash: Long)
  case class StreamDup(doc_id: Long, dup_of: Long, band: Int,
                       exact_sig: Boolean)

  /** Seen-doc record per LSH cell: 16 bytes, never the document. */
  case class SeenDoc(doc_id: Long, sig_hash: Long)

  class BucketDedupProcessor(maxBucketSize: Int, ttl: TTLConfig)
      extends StatefulProcessor[String, BandHit, StreamDup] {
    @transient private var seen: ListState[SeenDoc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[SeenDoc]("seen",
        Encoders.product[SeenDoc], ttl)

    override def handleInputRows(key: String, rows: Iterator[BandHit],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[StreamDup] = {
      // cell population is bounded by maxBucketSize — safe to materialize
      val existing = scala.collection.mutable.ArrayBuffer
        .empty[SeenDoc] ++= seen.get()
      val out = scala.collection.mutable.ArrayBuffer.empty[StreamDup]
      rows.foreach { h =>
        // probe BEFORE append: a doc never pairs with itself, and two
        // same-batch duplicates pair once ((later, earlier)) not twice
        existing.foreach { s =>
          if (s.doc_id != h.doc_id)
            out += StreamDup(h.doc_id, s.doc_id, h.band,
              s.sig_hash == h.sig_hash)
        }
        // membership check: an at-least-once source re-delivering a doc
        // must not store it twice — duplicate SeenDoc records would
        // multiply every later candidate emission and squat the bounded
        // cell slots (O(cap) scan, bounded by maxBucketSize)
        if (existing.length < maxBucketSize &&
            !existing.exists(_.doc_id == h.doc_id)) {
          val rec = SeenDoc(h.doc_id, h.sig_hash)
          existing += rec
          seen.appendValue(rec)
        }
      }
      out.iterator
    }
  }

  /** @param docs streaming DataFrame with (`idCol`: long, `textCol`: string)
    * @param maxBucketSize per-cell state cap (skew/adversary guard)
    * @param ttl idle-cell eviction (requires ProcessingTime time mode)
    */
  def nearDupCandidates(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", shingleN: Int = 3,
                        numHashes: Int = 32, numBands: Int = 8,
                        maxBucketSize: Int = 64,
                        ttl: TTLConfig = TTLConfig.NONE): Dataset[StreamDup] = {
    require(numBands > 0 && numHashes % numBands == 0,
      s"numBands ($numBands) must divide numHashes ($numHashes)")
    val rowsPerBand = numHashes / numBands
    val spark = docs.sparkSession
    import spark.implicits._

    // signature stage — the same kernels as the batch operator. The
    // repartition is the STREAMING staging barrier (localCheckpoint is
    // batch-only): it materializes (id, sig) below the exchange so the
    // banding projection above reads sig as a shuffled attribute instead
    // of inlining k copies of the signature computation (the HOF
    // re-evaluation trap, third sighting — see NOTES).
    val sigs = docs.select(
        col(idCol).cast("long").as("doc_id"),
        array_distinct(TextOps.ngramHashes(TextOps.tokens(col(textCol)),
          shingleN)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", Similarity.minhashSignature(col("sh"), numHashes))
      .select(col("doc_id"), col("sig"))
      .repartition(col("doc_id"))

    val banded = sigs
      .select(col("doc_id"), xxhash64(col("sig")).as("sig_hash"),
        explode(Similarity.bands(col("sig"), numBands, rowsPerBand)).as("b"))
      .select(col("b.band").as("band"), col("b.bucket").as("bucket"),
        col("doc_id"), col("sig_hash"))
      .as[BandHit]

    banded
      .groupByKey(h => s"${h.band}:${h.bucket}")
      .transformWithState(new BucketDedupProcessor(maxBucketSize, ttl),
        if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime(),
        OutputMode.Append(), Encoders.product[StreamDup])
  }
}
