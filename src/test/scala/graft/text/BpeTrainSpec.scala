package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BpeTrainSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(texts: String*) = texts.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def mergeRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq

  test("hand-computed merges: left-to-right application and " +
      "space-before-letter tie-break") {
    // one word "aaa": sym 'a a a </w>' — pairs (a,a)x2, (a,</w>)x1.
    // r1 picks (a,a) cnt 2; L-to-R apply gives 'aa a </w>' (NOT 'a aa').
    // r2: pairs (aa,a),(a,</w>) cnt 1 each; tie-break on pair string:
    // 'a </w>' < 'aa a' (space sorts before 'a') so (a,</w>) merges.
    // r3: (aa,a</w>) is the only pair left.
    val got = mergeRows(BpeTrain.merges(docs("aaa"), "text", 3))
    assert(got == Seq(
      (1L, "a a", "aa", 2L),
      (2L, "a </w>", "a</w>", 1L),
      (3L, "aa a</w>", "aaa</w>", 1L)), got.toString)
  }

  test("pair counts weight by word frequency across docs") {
    // "ab" x3 (one doc has it twice), "ba" x1:
    // pairs: (a,b)=3, (b,</w>)=3, (b,a)=1, (a,</w>)=1 — the 3-3 tie
    // breaks to 'a b' (pair string ascending)
    val got = mergeRows(BpeTrain.merges(docs("ab ab ba", "ab"), "text", 1))
    assert(got == Seq((1L, "a b", "ab", 3L)), got.toString)
  }

  test("early stop when fully merged") {
    // single word of one char: 'a </w>' merges once, then nothing left
    val got = mergeRows(BpeTrain.merges(docs("a a a"), "text", 5))
    assert(got == Seq((1L, "a </w>", "a</w>", 3L)), got.toString)
  }

  test("tokenize conservation laws on the synthetic corpus") {
    val d = graft.Tables.load(spark, sfDir, "documents")
    val merges = BpeTrain.merges(d, "text", 6)
    assert(merges.count() == 6)
    val toks = BpeTrain.tokenize(d, "text", merges)
    // every word instance ends in exactly one marker-bearing token
    val words = d.select(explode(TextOps.tokens(col("text"))).as("w"))
    val nWords = words.count()
    val markerToks = toks.filter(col("token").contains("</w>"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(markerToks == nWords, s"$markerToks != $nWords")
    // character conservation: sum(n * len(token)) == sum over words of
    // len(word) + 4 (the '</w>' marker)
    val lhs = toks.agg(sum(col("n") * length(col("token"))))
      .collect()(0).getLong(0)
    val rhs = words.agg(sum(length(col("w")) + 4)).collect()(0).getLong(0)
    assert(lhs == rhs, s"$lhs != $rhs")
  }

  test("k bound rejects") {
    intercept[IllegalArgumentException](
      BpeTrain.merges(docs("ab"), "text", 0))
  }

  test("merges are partition-invariant (argmax + tie-break see the " +
      "same global counts regardless of layout)") {
    val d = graft.Tables.load(spark, sfDir, "documents").limit(200)
    val a = mergeRows(BpeTrain.merges(d, "text", 4))
    val b = mergeRows(BpeTrain.merges(d.repartition(7), "text", 4))
    assert(a == b, s"$a != $b")
  }

  test("tokenless corpus trains zero merges") {
    val got = BpeTrain.merges(docs("!!!", "???"), "text", 3).collect()
    assert(got.isEmpty)
  }

  test("local and distributed trainers are bit-identical (hand vectors, " +
      "tie-breaks, overlap, early stop, real corpus)") {
    val cases = Seq(
      docs("aaa") -> 3, // overlapping pair + tie-break vector
      docs("ab ab ba", "ab") -> 1, // freq-weighted tie
      docs("a a a") -> 5, // early stop
      docs("the cat sat", "the bat sat on the mat", "a cab") -> 12,
      graft.Tables.load(spark, sfDir, "documents").limit(300) -> 8)
    cases.foreach { case (d, k) =>
      val cached = d.localCheckpoint(true)
      val loc = mergeRows(BpeTrain.mergesLocal(cached, "text", k))
      val dist = mergeRows(BpeTrain.mergesDistributed(cached, "text", k))
      assert(loc == dist, s"k=$k:\nlocal $loc\ndist  $dist")
      // and the adaptive front door routes somewhere consistent with both
      val adaptive = mergeRows(BpeTrain.merges(cached, "text", k))
      assert(adaptive == loc, s"adaptive diverged at k=$k")
    }
  }

  test("adaptive threshold routes above-threshold corpora to the " +
      "distributed engine with identical output") {
    val d = docs("the cat sat", "the bat sat on the mat")
    // localVocabMax=0 forces every vocab over threshold -> distributed
    val forcedDist = mergeRows(BpeTrain.merges(d, "text", 4, localVocabMax = 0L))
    val forcedLoc = mergeRows(BpeTrain.mergesLocal(d, "text", 4))
    assert(forcedDist == forcedLoc, s"$forcedDist != $forcedLoc")
  }

  test("merge table persists and serves through TrainedState (train " +
      "once, tokenize from disk)") {
    val d = graft.Tables.load(spark, sfDir, "documents").limit(200)
      .localCheckpoint(true)
    val merges = BpeTrain.merges(d, "text", 5)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe")
      .toString
    graft.similarity.TrainedState.saveMerges(merges, dir + "/m")
    val loaded = graft.similarity.TrainedState.loadMerges(spark,
      dir + "/m")
    assert(mergeRows(loaded) == mergeRows(merges),
      "merge table changed through the parquet round-trip")
    val a = BpeTrain.tokenize(d, "text", merges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = BpeTrain.tokenize(d, "text", loaded).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, "tokenizing from the persisted table diverged")
    // schema validation fails fast on a mis-pointed path
    d.limit(3).write.parquet(dir + "/junk")
    val e = intercept[IllegalArgumentException] {
      graft.similarity.TrainedState.loadMerges(spark, dir + "/junk")
    }
    assert(e.getMessage.contains("schema mismatch"))
  }
}
