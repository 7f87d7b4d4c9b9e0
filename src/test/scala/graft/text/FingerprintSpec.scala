package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** [[Fingerprint.winnow]] / [[Fingerprint.overlapPairs]] — bit-parity
  * against an independent brute-force winnower (including the
  * rightmost-on-tie rule on periodic text), the k+w−1 coverage
  * guarantee on a planted match, the short-document boundary, and the
  * overlap skew cap. */
class FingerprintSpec extends SparkTestBase {
  import spark.implicits._

  private val K = 12
  private val W = 5

  /** Independent reimplementation, straight from the paper: normalize,
    * hash every k-gram (40-bit md5 prefix — the operator's convention),
    * take each window's min hash with the RIGHTMOST minimizing
    * position, dedupe selections. No packed keys — so a packing bug in
    * the operator cannot be mirrored here. */
  private def brute(text: String, k: Int = K, w: Int = W): Set[(Long, Long)] = {
    val s = text.toLowerCase.replaceAll("[^a-z0-9]", "")
    if (s.length < k + w - 1) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val grams = (1 to s.length - k + 1).map { pos =>
      val hex = md.digest(s.substring(pos - 1, pos - 1 + k)
          .getBytes("UTF-8")).map("%02x".format(_)).mkString
      (pos.toLong, java.lang.Long.parseLong(hex.take(10), 16))
    }
    (0 to grams.length - w).map { j =>
      val win = grams.slice(j, j + w)
      val minH = win.map(_._2).min
      (win.filter(_._2 == minH).map(_._1).max, minH)
    }.toSet
  }

  private def winnow(rows: Seq[(Long, String)]) =
    Fingerprint.winnow(rows.toDF("doc_id", "text").repartition(2),
        "doc_id", "text", K, W)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("bit-parity with the brute-force winnower on the real corpus") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(60)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val got = Fingerprint.winnow(
        Tables.load(spark, sfDir, "documents").limit(60),
        "doc_id", "text", K, W)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.map(r => (r.getLong(1), r.getLong(2))).toSet }
    docs.foreach { case (id, text) =>
      assert(got.getOrElse(id, Set.empty) === brute(text),
        s"doc $id diverges from brute force")
    }
    assert(got.values.map(_.size).sum > docs.length,
      "corpus produced implausibly few fingerprints")
  }

  test("rightmost-on-tie: periodic text ties every window; parity holds") {
    // period-2 text: k-grams at distance 2 are identical, so every
    // window of 5 grams contains 2-3 copies of each hash — the
    // tie-break is exercised at every single window
    val periodic = "ab" * 40
    val got = winnow(Seq((1L, periodic)))
      .map(r => (r._2, r._3)).toSet
    assert(got === brute(periodic))
    // and the tie-break really bites: selected positions must be the
    // RIGHTMOST of their window's minimizers, so with period 2 no two
    // selections are adjacent
    val positions = got.map(_._1).toSeq.sorted
    positions.sliding(2).foreach {
      case Seq(a, b) => assert(b - a >= 2,
        s"adjacent selections $a,$b contradict rightmost tie-break")
      case _ =>
    }
  }

  test("guarantee: a shared run of k+w-1 normalized chars always " +
      "yields a shared fingerprint") {
    val shared = "thequickbrownfox" // 16 = K + W - 1 chars
    val a = s"zzzzzzzzzzzzzzzzzzzzzz $shared qqqqqqqqqqqqqqqqqqqq"
    val b = s"mmmmmmmmmmmmmmmmmmmm $shared tttttttttttttttttttttt"
    val fps = winnow(Seq((1L, a), (2L, b)))
    val h1 = fps.filter(_._1 == 1L).map(_._3).toSet
    val h2 = fps.filter(_._1 == 2L).map(_._3).toSet
    assert(h1.intersect(h2).nonEmpty,
      "winnowing guarantee violated: no shared fingerprint")
  }

  test("documents below the k+w-1 threshold yield no fingerprints") {
    // 15 normalized chars = k + w - 2: grams exist but no full window
    val got = winnow(Seq((1L, "abcdefghijklmno"), (2L, "short")))
    assert(got.isEmpty)
  }

  test("documents beyond the 2^20 packed-position cap fail LOUD — " +
      "never silently corrupt the selection") {
    val huge = "ab" * ((1 << 20) / 2 + 64) // > 1048575 + k - 1 chars
    val e = intercept[Exception] {
      winnow(Seq((1L, huge), (2L, "a normal sized document here")))
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("packed-position cap") ||
        e.getCause != null &&
        e.getCause.getMessage.contains("packed-position cap")),
      s"wrong error: ${e.getMessage}")
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("pairsAgainstIndex == full recompute restricted to batch-" +
      "touching pairs — including under a redelivered doc and a cap") {
    val docs = Tables.load(spark, sfDir, "documents").limit(30)
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") < 20)
    // batch: the other docs PLUS a redelivery of doc 3 and a planted
    // copy of doc 5 under a new id
    val planted = docs.filter(col("doc_id") === 5)
      .select((col("doc_id") + 1000).as("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") >= 20)
      .unionByName(docs.filter(col("doc_id") === 3))
      .unionByName(planted)
    val all = corpus.unionByName(batch).dropDuplicates("doc_id")
    for (cap <- Seq(0, 8)) {
      val index = Fingerprint.winnow(corpus, "doc_id", "text", K, W)
        .select(col("doc_id").as("id"), col("fp_pos"), col("fp_hash"))
      val got = pairsOf(Fingerprint.pairsAgainstIndex(
        batch, index, "doc_id", "text", K, W, minShared = 3,
        maxBucket = cap))
      val batchIds = Set(3L, 1005L) ++ (20L until 30L)
      val want = pairsOf(Fingerprint.overlapPairs(
          Fingerprint.winnow(all, "doc_id", "text", K, W), "doc_id",
          minShared = 3, maxBucket = cap))
        .filter { case ((a, b), _) =>
          batchIds.contains(a) || batchIds.contains(b) }
      assert(got === want, s"cap=$cap")
      if (cap == 0)
        assert(got.contains((5L, 1005L)), "planted copy not found")
    }
  }

  test("foldIntoIndex: probing after fold-in == probing a rebuilt " +
      "index; rejected ids never enter; save/load round-trips") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents").limit(24)
      .select(col("doc_id"), col("text"))
    val first = docs.filter(col("doc_id") < 12)
    val second = docs.filter(col("doc_id") >= 12 && col("doc_id") < 18)
    val third = docs.filter(col("doc_id") >= 18)
    val idx0 = Fingerprint.winnow(first, "doc_id", "text", K, W)
      .select(col("doc_id").as("id"), col("fp_pos"), col("fp_hash"))
    // fold-in batch REDELIVERS doc 2 (already indexed): set-union
    // semantics must keep the indexed rows once, not duplicate them
    val folded = Fingerprint.foldIntoIndex(idx0,
      second.unionByName(first.filter(col("doc_id") === 2)),
      "doc_id", "text", K, W, rejectIds = Seq(13L).toDF("doc_id"))
    assert(folded.groupBy("id", "fp_pos", "fp_hash").count()
      .filter(col("count") > 1).count() === 0L,
      "redelivered doc duplicated its fingerprints in the index")
    val rebuilt = Fingerprint.winnow(
        first.unionByName(second.filter(col("doc_id") =!= 13)),
        "doc_id", "text", K, W)
      .select(col("doc_id").as("id"), col("fp_pos"), col("fp_hash"))
    assert(folded.filter(col("id") === 13L).count() === 0L)
    val dir = java.nio.file.Files
      .createTempDirectory("fp_idx").toString + "/idx"
    Fingerprint.saveIndex(folded, dir, K, W)
    val loaded = Fingerprint.loadIndex(spark, dir)
    assert(Fingerprint.loadIndexParams(spark, dir) === ((K, W)))
    assert(pairsOf(Fingerprint.pairsAgainstIndex(third, loaded,
        "doc_id", "text", K, W, minShared = 3))
      === pairsOf(Fingerprint.pairsAgainstIndex(third, rebuilt,
        "doc_id", "text", K, W, minShared = 3)))
    // the checked probe path reads (k, w) from the params sidecar
    assert(pairsOf(Fingerprint.pairsAgainstSavedIndex(spark, dir,
        third, "doc_id", "text", minShared = 3))
      === pairsOf(Fingerprint.pairsAgainstIndex(third, rebuilt,
        "doc_id", "text", K, W, minShared = 3)))
    // schema fail-fast on drift
    val bad = dir + "_bad"
    folded.withColumn("fp_pos", col("fp_pos").cast("int"))
      .write.mode("overwrite").parquet(bad)
    val e = intercept[IllegalArgumentException] {
      Fingerprint.loadIndex(spark, bad)
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("containmentPairs: a planted half-doc quote scores ~1M ppm " +
      "against its source while sharing few absolute fingerprints") {
    val base = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") < 6)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val big = base.map(_._2).mkString(" ") // concatenation of all six
    // doc 500: the middle half of doc 0 — wholly contained in doc 600
    val quote = base.head._2.substring(
      base.head._2.length / 4, 3 * base.head._2.length / 4)
    val rows = base.toSeq ++ Seq((600L, big), (500L, quote))
    val fps = Fingerprint.winnow(rows.toDF("doc_id", "text")
      .repartition(2), "doc_id", "text", K, W)
    val got = Fingerprint.containmentPairs(fps, "doc_id",
        minContainPpm = 700000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // the quote is inside doc 0 AND inside the concatenation
    assert(got.contains((0L, 500L)), s"quote-vs-source missing: $got")
    assert(got.contains((500L, 600L)))
    val (shared, na, nb, ppm) = got((0L, 500L))
    assert(ppm >= 700000L && shared === math.min(na, nb) * ppm / 1000000L
      || ppm === shared * 1000000L / math.min(na, nb))
    // symmetric check: each base doc IS contained in the concatenation
    base.foreach { case (id, _) =>
      assert(got.contains((id, 600L)), s"doc $id not contained in concat")
    }
  }

  test("matchSpans: every emitted anchor pair points at IDENTICAL " +
      "k-grams in the two documents") {
    val docs = Tables.load(spark, sfDir, "documents").limit(6)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val rows = docs.toSeq :+ ((700L, docs.head._2)) // exact copy of doc 0
    val fps = Fingerprint.winnow(rows.toDF("doc_id", "text")
      .repartition(2), "doc_id", "text", K, W)
    val spans = Fingerprint.matchSpans(fps, "doc_id", minShared = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.nonEmpty)
    val norm = rows.map { case (id, t) =>
      id -> t.toLowerCase.replaceAll("[^a-z0-9]", "") }.toMap
    spans.foreach { case (ia, ib, pa, pb) =>
      val ga = norm(ia).substring(pa.toInt - 1, pa.toInt - 1 + K)
      val gb = norm(ib).substring(pb.toInt - 1, pb.toInt - 1 + K)
      assert(ga === gb, s"anchor mismatch at ($ia,$ib,$pa,$pb)")
    }
    // the planted copy anchors at mirrored positions
    assert(spans.exists { case (ia, ib, pa, pb) =>
      ia == docs.head._1 && ib == 700L && pa == pb })
  }

  test("overlapPairs finds planted near-dups and respects maxBucket") {
    val base = Tables.load(spark, sfDir, "documents").limit(8)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // plant: docs 100/101 are copies of doc base(0), everything else unique
    val rows = base.toSeq ++ Seq((100L, base(0)._2), (101L, base(0)._2))
    val fps = Fingerprint.winnow(rows.toDF("doc_id", "text").repartition(2),
      "doc_id", "text", K, W)
    val pairs = Fingerprint.overlapPairs(fps, "doc_id", minShared = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((base(0)._1, 100L)))
    assert(pairs.contains((base(0)._1, 101L)))
    assert(pairs.contains((100L, 101L)))
    // cap of 2: every fingerprint of the planted TRIPLE sits in a
    // 3-doc bucket, so the triple's pairs vanish; nothing new appears
    val capped = Fingerprint.overlapPairs(fps, "doc_id",
        minShared = 5, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.contains((100L, 101L)),
      "3-doc buckets must be dropped at maxBucket=2")
    assert(capped.subsetOf(pairs))
  }

  test("forgetFromIndex == rebuild-without-the-docs bit-for-bit; the " +
      "receipt covers absent ids; a probe of deleted content finds " +
      "nothing afterward") {
    val docs = Tables.load(spark, sfDir, "documents").limit(40)
      .select(col("doc_id"), col("text"))
    val index = Fingerprint.winnow(docs, "doc_id", "text", K, W)
      .select(col("doc_id").as("id"), col("fp_pos"), col("fp_hash"))
    val delIds = Seq(0L, 7L, 14L, 777777L) // 777777 never ingested
    val dels = delIds.toDF("doc_id")
    val (cleaned, receipt) = Fingerprint.forgetFromIndex(index, dels)

    // exact parity: forget == winnow of the surviving docs
    val rebuilt = Fingerprint.winnow(
        docs.filter(!col("doc_id").isin(delIds: _*)), "doc_id", "text", K, W)
      .select(col("doc_id").as("id"), col("fp_pos"), col("fp_hash"))
    val cs = cleaned.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rs = rebuilt.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cs == rs, "forget != rebuild")

    // receipt: one row per REQUESTED id; removed counts match the
    // docs' own fingerprint counts; the never-ingested id reports
    // (0, false)
    val fpCounts = index.groupBy(col("id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rec = receipt.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rec.keySet == delIds.toSet)
    Seq(0L, 7L, 14L).foreach { id =>
      assert(rec(id) == (fpCounts.getOrElse(id, 0L),
        fpCounts.contains(id)), s"receipt wrong for $id: ${rec(id)}")
    }
    assert(rec(777777L) == (0L, false))

    // a redelivered copy of forgotten content hits its source BEFORE
    // the forget and never matches any forgotten id AFTER (the point
    // of forgetting; hits against RETAINED docs remain legitimate)
    val copyOf7 = docs.filter(col("doc_id") === 7)
      .select((col("doc_id") + 5000).as("doc_id"), col("text"))
    def hitsVsDeleted(idx: org.apache.spark.sql.DataFrame) =
      Fingerprint.pairsAgainstIndex(copyOf7, idx,
          "doc_id", "text", K, W, minShared = 1)
        .filter(col("id_a").isin(delIds: _*) ||
          col("id_b").isin(delIds: _*)).count()
    assert(hitsVsDeleted(index) > 0, "probe not sensitive pre-forget")
    assert(hitsVsDeleted(cleaned) == 0,
      "deleted content still probed as retained")
  }
}
