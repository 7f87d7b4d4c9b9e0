package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** [[SftOps]] — turn segmentation hand-vectors, span/render
  * cross-checks (masked_text extracted from the rendered sequence must
  * equal the turn text), and the whole-turn tail-truncation contract
  * including the zero-kept and all-kept boundaries. */
class SftOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def turnsOf(rows: Seq[(Long, String)], t: Int = 2) =
    SftOps.toTurns(rows.toDF("doc_id", "text").repartition(2),
      "doc_id", "text", turnTokens = t)

  test("toTurns: fixed windows, alternating roles, exact token counts") {
    val got = turnsOf(Seq((1L, "a b c d e")), t = 2)
      .orderBy("turn_idx")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4)))
    assert(got === Array(
      (0L, "user", "a b", 2L),
      (1L, "assistant", "c d", 2L),
      (2L, "user", "e", 1L)))
  }

  test("toTurns drops token-less docs instead of exploding a negative range") {
    assert(turnsOf(Seq((1L, "---"), (2L, ""))).count() === 0L)
  }

  test("flattenWithMask: hand-computed spans and rendered extraction") {
    val turns = turnsOf(Seq((1L, "a b c d")), t = 2)
    val got = SftOps.flattenWithMask(turns, "doc_id").collect()
    assert(got.length === 1)
    val r = got.head
    // seq = "<|user|>a b<|assistant|>c d" — assistant span covers "c d"
    assert(r.getLong(1) === 1L) // turn_idx
    assert(r.getLong(2) === 24L && r.getLong(3) === 27L) // [s, e)
    assert(r.getString(4) === "c d") // masked_text
    assert(r.getLong(5) === 27L) // seq_len
  }

  test("flattenWithMask on the corpus: every span extracts exactly its " +
      "turn text; spans never overlap a user marker") {
    val docs = Tables.load(spark, sfDir, "documents").limit(40)
    val turns = SftOps.toTurns(docs, "doc_id", "text", turnTokens = 12)
    val flat = SftOps.flattenWithMask(turns, "doc_id")
    val joined = flat.join(
      turns.select(col("doc_id"), col("turn_idx"), col("txt")),
      Seq("doc_id", "turn_idx"))
    assert(joined.filter(col("masked_text") =!= col("txt")).count() === 0L,
      "span extraction diverged from the turn text")
    // spans are within bounds and strictly ordered per doc
    assert(flat.filter(col("s") >= col("e") || col("e") > col("seq_len"))
      .count() === 0L)
    val n = flat.count()
    assert(n > 0L)
  }

  test("truncateTail keeps exactly the in-budget suffix of whole turns") {
    // token counts per turn: 2, 2, 1 (t=2 over 5 tokens)
    val turns = turnsOf(Seq((1L, "a b c d e")), t = 2)
    val kept = SftOps.truncateTail(turns, "doc_id", maxTokens = 3)
      .orderBy("turn_idx")
      .collect().map(r => (r.getLong(1), r.getLong(5)))
    // tail sums (from ti=2 back): 1, 3, 5 → ti=1 (sum 3) and ti=2 kept
    assert(kept === Array((1L, 3L), (2L, 1L)))
  }

  test("truncateReceipt: hand vector plus zero-kept and all-kept bounds") {
    val turns = turnsOf(Seq((1L, "a b c d e")), t = 2)
    def receipt(m: Long) =
      SftOps.truncateReceipt(turns, "doc_id", maxTokens = m).collect().head
    val r3 = receipt(3L)
    assert((r3.getLong(1), r3.getLong(2), r3.getLong(3), r3.getLong(4))
      === ((3L, 2L, 3L, 1L)))
    // budget below the last turn: nothing fits — counts zero, head null
    val r0 = receipt(0L)
    assert((r0.getLong(1), r0.getLong(2), r0.getLong(3)) === ((3L, 0L, 0L)))
    assert(r0.isNullAt(4))
    // budget covers everything: all turns kept from index 0
    val rAll = receipt(100L)
    assert((rAll.getLong(2), rAll.getLong(3), rAll.getLong(4))
      === ((3L, 5L, 0L)))
  }

  test("preferencePairs: quality-adjacent pairing within stratum, " +
      "margin filter, and completion split — hand vector") {
    // stratum X quality order: a(high) > b(mid) > c(low); margin 1
    // drops nothing; d sits alone in stratum Y → no pair
    val rows = Seq(
      // quality is dominated by the alpha ratio / stopword hits; use
      // punctuation density to force a strict order
      (1L, "X", "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "X", "the quick brown fox jumps over,,, the lazy;; dog !! yes"),
      (3L, "X", "a b c d e f junk ,,,;;;!!!??? ,,,;;;!!! ,,,, ;;;; !!!!"),
      (4L, "Y", "solo stratum doc with some words here to pass the gate"))
    val df = rows.toDF("doc_id", "lang", "text").repartition(2)
    val got = SftOps.preferencePairs(df, "doc_id", "text", "lang",
        promptTokens = 3, marginE6 = 1L)
      .orderBy("chosen_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((1L, 2L), (2L, 3L)))
    val first = got.head
    assert(first.getString(2) === "the quick brown") // prompt: 3 toks
    assert(first.getString(3).startsWith("fox jumps over the lazy"))
    // rejected completion comes from doc 2's tokens after the prompt
    assert(first.getString(4).startsWith("fox jumps over"))
    assert(first.getLong(5) > first.getLong(6) &&
      first.getLong(7) === first.getLong(5) - first.getLong(6))
    // margin above both gaps → no pairs at all
    assert(SftOps.preferencePairs(df, "doc_id", "text", "lang",
      promptTokens = 3, marginE6 = 10_000_000L).count() === 0L)
    // short docs (≤ promptTokens tokens) participate on NEITHER side
    val withShort = (rows :+ ((9L, "X", "tiny doc"))).toDF(
      "doc_id", "lang", "text")
    val ids = SftOps.preferencePairs(withShort, "doc_id", "text",
        "lang", promptTokens = 3, marginE6 = 1L)
      .select("chosen_id", "rejected_id").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(!ids.contains(9L))
  }

  test("truncation + flatten compose: re-flattening the kept suffix " +
      "masks only surviving assistant turns") {
    val docs = Tables.load(spark, sfDir, "documents").limit(30)
    val turns = SftOps.toTurns(docs, "doc_id", "text", turnTokens = 12)
    val kept = SftOps.truncateTail(turns, "doc_id", maxTokens = 24L)
      .drop("tail_sum")
    val flat = SftOps.flattenWithMask(kept, "doc_id")
    // every masked span in the truncated render still extracts its text
    val joined = flat.join(
      kept.select(col("doc_id"), col("turn_idx"), col("txt")),
      Seq("doc_id", "turn_idx"))
    assert(joined.filter(col("masked_text") =!= col("txt")).count() === 0L)
    // and the rendered sequences got shorter or equal, never longer
    val lens = SftOps.flattenWithMask(turns, "doc_id")
      .groupBy("doc_id").agg(max("seq_len").as("full"))
      .join(flat.groupBy("doc_id").agg(max("seq_len").as("cut")), "doc_id")
    assert(lens.filter(col("cut") > col("full")).count() === 0L)
  }
}
