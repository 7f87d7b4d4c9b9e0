package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.multimodal.Multimodal
import graft.similarity.Similarity

/** The streaming image-admission loop must equal the batch-sequential
  * reference: probe the current signature index, reject any image with a
  * qualifying pair, fold survivors in. */
class StreamingMediaSpec extends SparkTestBase {
  import spark.implicits._

  private def mk(id: Long, body: String): Multimodal.MediaRow =
    Multimodal.MediaRow(id, "image",
      Multimodal.FakeCodec.encode(8, 8, 0, body.getBytes("UTF-8")),
      8, 8, 0, 1)

  test("admitAudio: VAD floor per micro-batch == batch vadSegments") {
    implicit val sqlCtx = spark.sqlContext
    def aud(id: Long, b: Array[Byte]) = Multimodal.MediaRow(id, "audio",
      Multimodal.FakeCodec.encode(0, 0, 16000, b), 0, 0, 16000, 1)
    val loud = Array.fill[Byte](800)(120.toByte)
    val silent = Array.fill[Byte](800)(10.toByte)
    val half = Array.fill[Byte](400)(120.toByte) ++
      Array.fill[Byte](400)(10.toByte)
    val batches = Seq(Seq(aud(1L, loud), aud(2L, silent)),
      Seq(aud(3L, half)))
    val mem = MemoryStream[Multimodal.MediaRow]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingMedia.admitAudio(mem.toDS(), window = 400, tau = 60,
      minActiveWindows = 2) {
      (df, _) => collected ++= df.collect()
    }
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = collected.map(r => r.getLong(0) ->
      (r.getBoolean(1), r.getLong(2))).toMap
    // loud: 2 active windows (>= 2, admit); silent: 0 (drop);
    // half: 1 active window (< 2, drop)
    assert(got == Map(1L -> (true, 2L), 2L -> (false, 0L),
      3L -> (false, 1L)))
  }

  test("admitImages: dup of an indexed image AND of an earlier batch's " +
      "admit both reject; unrelated images admit; loop == sequential " +
      "reference") {
    implicit val sqlCtx = spark.sqlContext
    val bodies = Seq(
      "the quick brown fox jumps over the lazy dog again and again!!",
      "a completely different payload with other bytes and rhythm 123",
      "third unrelated image body, nothing shared with the others :)",
      "yet another distinct plane of pixels to admit cleanly this time")
    // index holds image 1
    val indexed = Seq(mk(1L, bodies(0)))
    val idx0 = Multimodal.pHashSigs(spark.createDataset(indexed))
    // batch 1: 10 = copy of indexed 1 (reject), 11 = fresh (admit)
    // batch 2: 20 = copy of 11 — an EARLIER BATCH's admit (reject),
    //          21 = fresh (admit)
    // batch 3: 0 = copy of indexed 1 with a LOWER id than its indexed
    //          match (the non-monotonic arrival a higher-side-only rule
    //          silently admits — must reject), 30 = fresh (admit)
    val batches = Seq(
      Seq(mk(10L, bodies(0)), mk(11L, bodies(1))),
      Seq(mk(20L, bodies(1)), mk(21L, bodies(2))),
      Seq(mk(0L, bodies(0)), mk(30L, bodies(3))))

    // seed through the PERSISTED artifact via the misuse-proof entry
    // point — the restart path reads the recorded blocks parameter
    // instead of trusting the call site
    val root = java.nio.file.Files.createTempDirectory("media_idx").toString
    Multimodal.saveSigIndex(idx0.toDF(), s"$root/idx", blocks = 60)

    val mem = MemoryStream[Multimodal.MediaRow]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingMedia.admitImagesFromSaved(mem.toDS(), spark,
      s"$root/idx") {
      (df, _) => collected ++= df.collect()
    }
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val got = collected.map(r => r.getLong(0) ->
      (r.getBoolean(1), r.getLong(2))).toMap
    assert(got(10L)._1 == false, "copy of an indexed image admitted")
    assert(got(11L)._1 == true)
    assert(got(20L)._1 == false,
      "copy of an earlier batch's admit admitted (fold-in not live)")
    assert(got(21L)._1 == true)
    assert(got(0L)._1 == false,
      "LOW-id copy of an indexed image admitted (orientation blindness)")
    assert(got(30L)._1 == true)

    // batch-sequential reference loop: a batch id rejects on a pair
    // whose other side is indexed (either orientation) or a lower
    // batch-mate
    var refIndex = idx0.toDF()
    val refGot = scala.collection.mutable.Map.empty[Long, (Boolean, Long)]
    batches.foreach { b =>
      val sigs = Multimodal.pHashSigs(spark.createDataset(b))
      val batchIds = b.map(_.media_id).toSet
      val idxIds = refIndex.collect().map(_.getLong(0)).toSet
      val ps = Similarity.simhashPairsFromSigs(
          refIndex.unionByName(sigs), maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val deciding = ps.flatMap { case (a, bb) =>
        (if (batchIds.contains(bb)) Seq(bb) else Nil) ++
          (if (batchIds.contains(a) && idxIds.contains(bb)) Seq(a) else Nil)
      }
      val counts = deciding.groupBy(identity)
        .map { case (k, v) => k -> v.size.toLong }
      b.foreach { m =>
        val n = counts.getOrElse(m.media_id, 0L)
        refGot(m.media_id) = (n == 0L, n)
      }
      val admitted = b.filter(m => refGot(m.media_id)._1 &&
        !idxIds.contains(m.media_id))
      refIndex = refIndex.unionByName(
        Multimodal.pHashSigs(spark.createDataset(admitted)))
    }
    assert(got == refGot.toMap)
  }

  test("admitImages: redelivered id with CHANGED payload REPLACES its " +
      "index signature — near-dups of the new content reject, copies of " +
      "the superseded content admit") {
    implicit val sqlCtx = spark.sqlContext
    val bodyA = "original pixel payload aaaa bbbb cccc dddd eeee ffff gggg"
    val bodyB = "totally rewritten content 1111 2222 3333 4444 5555 6666!!"
    // index holds id 1 with content A
    val idx0 = Multimodal.pHashSigs(spark.createDataset(Seq(mk(1L, bodyA))))
    // batch 1: id 1 REDELIVERED with content B (no near-dup of B anywhere
    //          → admitted; ids equal → no self-pair blocks it)
    // batch 2: 99 = copy of B → must REJECT (the stale-signature bug
    //          admitted it: the index still served A for id 1);
    //          98 = copy of the SUPERSEDED A → must ADMIT (id 1's content
    //          is now B; A left the corpus with the replacement)
    val batches = Seq(
      Seq(mk(1L, bodyB)),
      Seq(mk(99L, bodyB), mk(98L, bodyA)))
    val mem = MemoryStream[Multimodal.MediaRow]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingMedia.admitImages(mem.toDS(), idx0.toDF()) {
      (df, _) => collected ++= df.collect()
    }
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = collected.map(r => r.getLong(0) ->
      (r.getBoolean(1), r.getLong(2))).toMap
    assert(got(1L)._1 == true, "changed redelivery of id 1 rejected")
    assert(got(99L)._1 == false,
      "copy of the redelivered NEW content admitted — stale signature " +
        "still serving (replace-on-fold-in broken)")
    assert(got(98L)._1 == true,
      "copy of the SUPERSEDED content rejected — old signature not " +
        "replaced")
  }

  // four distinct 64-byte frame bodies (cross hamming large by
  // construction: different byte rhythms)
  private val frameBodies = Seq(
    "A" * 16 + "zq9" * 16, "b7#" * 16 + "M" * 16,
    "0" * 8 + "Xy!" * 16 + "k" * 8, "wW2%" * 16).map(_.take(64))

  private def vid(id: Long, frames: Seq[String]): Multimodal.MediaRow = {
    val body = frames.mkString.getBytes("UTF-8")
    Multimodal.MediaRow(id, "video",
      Multimodal.FakeCodec.encode(8, 8, 0, body), 8, 8, 0, frames.length)
  }

  test("admitVideos: planted copied video rejected across batches; " +
      "one-shared-frame video under the threshold admits; streaming == " +
      "batch-sequential content-ID reference") {
    implicit val sqlCtx = spark.sqlContext
    val f = frameBodies
    // index holds video 1 = frames (0,1,2)
    val v1 = vid(1L, Seq(f(0), f(1), f(2)))
    val idx0 = Multimodal.framePHashSigs(spark.createDataset(Seq(v1)))
      .select((col("media_id") * Multimodal.FramePack + col("frame_idx"))
        .as("id"), col("simhash"))
    // batch 1: 10 = full copy of video 1 (3 shared frames >= 2: REJECT
    //          — the planted copied video, vs the PRE-SEEDED index);
    //          11 = fresh content (frame 3 repeated differently: ADMIT)
    // batch 2: 20 = copy of 11 — an earlier batch's admit (REJECT
    //          ACROSS BATCHES, proves fold-in is live);
    //          21 = shares exactly ONE frame with indexed video 1
    //          (1 < minSharedFrames=2: ADMIT — threshold semantics)
    val v11 = vid(11L, Seq(f(3), f(3)))
    val batches = Seq(
      Seq(vid(10L, Seq(f(0), f(1), f(2))), v11),
      Seq(vid(20L, Seq(f(3), f(3))),
        vid(21L, Seq(f(0), f(3).reverse, f(1).reverse))))

    val mem = MemoryStream[Multimodal.MediaRow]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingMedia.admitVideos(mem.toDS(), idx0,
      minSharedFrames = 2) {
      (df, _) => collected ++= df.collect()
    }
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = collected.map(r => r.getLong(0) ->
      (r.getBoolean(1), r.getLong(2))).toMap
    assert(got(10L) == (false, 3L), s"planted copy not rejected: $got")
    assert(got(11L)._1 == true, s"fresh video rejected: $got")
    assert(got(20L)._1 == false,
      s"copy of an earlier batch's admit admitted (fold-in not live): $got")
    assert(got(21L) == (true, 1L),
      s"one shared frame must stay under minSharedFrames=2: $got")

    // batch-sequential reference: per batch, count a batch video's
    // DISTINCT frames pairing cross-video with an indexed video (either
    // orientation) or a lower batch-mate; fold admitted videos in
    var refIndex = idx0
    val refGot = scala.collection.mutable.Map.empty[Long, (Boolean, Long)]
    batches.foreach { b =>
      val sigs = Multimodal.framePHashSigs(spark.createDataset(b))
        .select((col("media_id") * Multimodal.FramePack + col("frame_idx"))
          .as("id"), col("simhash"))
      val batchIds = b.map(_.media_id).toSet
      val idxMedia = refIndex.collect()
        .map(r => r.getLong(0) / Multimodal.FramePack).toSet
      val ps = Similarity.simhashPairsFromSigs(
          refIndex.unionByName(sigs), maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .filter { case (a, bb) =>
          a / Multimodal.FramePack != bb / Multimodal.FramePack }
      val matched = ps.flatMap { case (fa, fb) =>
        val (ma, mb) = (fa / Multimodal.FramePack, fb / Multimodal.FramePack)
        (if (batchIds.contains(ma) && idxMedia.contains(mb))
          Seq((ma, fa)) else Nil) ++
          (if (batchIds.contains(mb) && idxMedia.contains(ma))
            Seq((mb, fb)) else Nil) ++
          (if (batchIds.contains(ma) && batchIds.contains(mb))
            Seq((mb, fb)) else Nil)
      }.distinct.groupBy(_._1).map { case (m, fs) => m -> fs.size.toLong }
      b.foreach { m =>
        val n = matched.getOrElse(m.media_id, 0L)
        refGot(m.media_id) = (n < 2, n)
      }
      val adm = b.filter(m => refGot(m.media_id)._1).map(_.media_id).toSet
      refIndex = refIndex
        .filter(!(col("id") / lit(Multimodal.FramePack)).cast("long")
          .isin(adm.toSeq: _*))
        .unionByName(sigs.filter(
          (col("id") / lit(Multimodal.FramePack)).cast("long")
            .isin(adm.toSeq: _*)))
        .localCheckpoint(true)
    }
    assert(got == refGot.toMap, s"streaming $got != reference $refGot")
  }

  test("admitImagesPersisted: decisions == the in-memory loop on the " +
      "same stream, the index survives a RESTART from the path alone, " +
      "forgetMediaPersisted re-opens the slot (receipts carry the band " +
      "rows), and the policy compaction folds the artifact") {
    implicit val sqlCtx = spark.sqlContext
    val TS = graft.similarity.TrainedState
    val bodies = Seq(
      "the quick brown fox jumps over the lazy dog again and again!!",
      "a completely different payload with other bytes and rhythm 123",
      "third unrelated image body, nothing shared with the others :)",
      "yet another distinct plane of pixels to admit cleanly this time")
    val idx0 = Multimodal.pHashSigs(
      spark.createDataset(Seq(mk(1L, bodies(0)))))
    val batches = Seq(
      Seq(mk(10L, bodies(0)), mk(11L, bodies(1))),
      Seq(mk(20L, bodies(1)), mk(21L, bodies(2))),
      Seq(mk(0L, bodies(0)), mk(30L, bodies(3))))
    val root = java.nio.file.Files
      .createTempDirectory("media_pidx").toString
    TS.saveBandedSigIndex(idx0.toDF(), s"$root/idx", blocks = 60)

    def runLoop(bs: Seq[Seq[Multimodal.MediaRow]],
                maxGen: Long = 1000L): Map[Long, (Boolean, Long)] = {
      val mem = MemoryStream[Multimodal.MediaRow]
      val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
      val q = StreamingMedia.admitImagesPersisted(mem.toDS(), spark,
        s"$root/idx", maxGenerations = maxGen) {
        (df, _) => collected ++= df.collect()
      }
      try {
        bs.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      collected.map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2))).toMap
    }

    // parity with the in-memory loop's documented decisions, policy
    // compaction at maxGenerations = 2 (three triggers → ≥2 folds)
    val got = runLoop(batches, maxGen = 2L)
    assert(got.view.mapValues(_._1).toMap == Map(
      10L -> false, 11L -> true, 20L -> false, 21L -> true,
      0L -> false, 30L -> true), s"persisted decisions: $got")
    assert(TS.deltaGenerations(spark, s"$root/idx") < 2L,
      "policy compaction never fired")

    // RESTART from the path alone: a new loop instance must reject a
    // copy of image 21 (admitted by the PREVIOUS instance — the
    // in-memory loop forgets this on restart unless re-seeded)
    val got2 = runLoop(Seq(Seq(mk(40L, bodies(2)), mk(41L,
      "fresh content after the restart, bytes unlike all others 987"))))
    assert(got2(40L)._1 == false,
      "restarted loop admitted a dup of a previous instance's admit")
    assert(got2(41L)._1 == true)

    // forget 21 → receipts (4 band rows, was_indexed); a copy then
    // admits; never-indexed 999 confirms negatively
    val receipts = scala.collection.mutable.ArrayBuffer.empty[Row]
    val memDel = MemoryStream[Long]
    val qDel = StreamingMedia.forgetMediaPersisted(
      memDel.toDF().toDF("id"), s"$root/idx") { (df, _) =>
      receipts ++= df.collect()
    }
    try {
      memDel.addData(21L, 999L); qDel.processAllAvailable()
    } finally qDel.stop()
    val byId = receipts.map(r => r.getLong(0) ->
      (r.getLong(1), r.getBoolean(2))).toMap
    assert(byId == Map(21L -> (4L, true), 999L -> (0L, false)),
      s"receipts: $byId")
    val got3 = runLoop(Seq(Seq(mk(50L, bodies(2)))))
    assert(got3(50L)._1 == true,
      "copy of a FORGOTTEN image still rejected — tombstone not read")
  }

  test("admitVideosPersisted: planted copy rejected from the persisted " +
      "frame index, threshold semantics hold, packed-frame deletion " +
      "re-opens the slot") {
    implicit val sqlCtx = spark.sqlContext
    val TS = graft.similarity.TrainedState
    val f = frameBodies
    val idx0 = Multimodal.framePHashSigs(
        spark.createDataset(Seq(vid(1L, Seq(f(0), f(1), f(2))))))
      .select((col("media_id") * Multimodal.FramePack + col("frame_idx"))
        .as("id"), col("simhash"))
    val root = java.nio.file.Files
      .createTempDirectory("media_vpidx").toString
    TS.saveBandedSigIndex(idx0, s"$root/idx", blocks = 60)

    def runLoop(bs: Seq[Seq[Multimodal.MediaRow]])
        : Map[Long, (Boolean, Long)] = {
      val mem = MemoryStream[Multimodal.MediaRow]
      val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
      val q = StreamingMedia.admitVideosPersisted(mem.toDS(), spark,
        s"$root/idx", minSharedFrames = 2) {
        (df, _) => collected ++= df.collect()
      }
      try {
        bs.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      collected.map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2))).toMap
    }
    val v11 = vid(11L, Seq(f(3), f(3)))
    val got = runLoop(Seq(
      Seq(vid(10L, Seq(f(0), f(1), f(2))), v11),
      Seq(vid(20L, Seq(f(3), f(3))),
        vid(21L, Seq(f(0), f(3).reverse, f(1).reverse)))))
    assert(got(10L) == (false, 3L), s"planted copy not rejected: $got")
    assert(got(11L)._1 == true && got(20L)._1 == false &&
      got(21L) == (true, 1L), s"decisions: $got")

    // delete video 1 by MEDIA id (frames enumerate from the artifact)
    val memDel = MemoryStream[Long]
    val receipts = scala.collection.mutable.ArrayBuffer.empty[Row]
    val qDel = StreamingMedia.forgetMediaPersisted(
      memDel.toDF().toDF("id"), s"$root/idx", packedFrames = true) {
      (df, _) => receipts ++= df.collect()
    }
    try { memDel.addData(1L); qDel.processAllAvailable() }
    finally qDel.stop()
    assert(receipts.map(r => (r.getLong(0), r.getLong(1),
      r.getBoolean(2))).toList == List((1L, 12L, true)), // 3 frames × 4
      s"receipts: $receipts")
    // a full copy of the deleted video now admits (its only 2+ shared
    // frames were with video 1)
    val got2 = runLoop(Seq(Seq(vid(60L, Seq(f(0), f(1), f(2))))))
    assert(got2(60L)._1 == true,
      "copy of a DELETED video still rejected — tombstones not read")
  }
}
