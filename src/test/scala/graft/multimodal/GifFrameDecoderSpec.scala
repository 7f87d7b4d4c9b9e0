package graft.multimodal

import graft.SparkTestBase

/** REAL multi-frame decode through the [[Multimodal.FrameDecoder]]
  * seam: checked-in animated GIFs flow through javax.imageio → per-frame
  * luma planes → the SAME frame-signature / scene-cut / content-ID
  * operators the synthetic gate data exercises, while GRFT payloads
  * keep routing to the stub bit-identically. */
class GifFrameDecoderSpec extends SparkTestBase {
  import spark.implicits._

  private def gif(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/multimodal/$name")
    require(in != null, s"fixture $name missing")
    try in.readAllBytes() finally in.close()
  }

  private def vid(id: Long, payload: Array[Byte]): Multimodal.MediaRow =
    Multimodal.MediaRow(id, "video", payload, 32, 24, 0, 0)

  test("GifFrameDecoder: animated GIF decodes to full per-frame luma " +
      "planes in order") {
    val frames = Multimodal.GifFrameDecoder
      .decodeFrames(vid(1L, gif("anim_a.gif"))).toSeq
    assert(frames.map(_._1) == Seq(0, 1, 2))
    assert(frames.forall(_._2.length == 32 * 24))
    // distinct seeds produce distinct planes
    assert(!java.util.Arrays.equals(frames(0)._2, frames(1)._2))
  }

  test("cross-video content-ID on real GIFs: the one shared frame pairs, " +
      "distinct frames do not") {
    val media = spark.createDataset(Seq(
      vid(1L, gif("anim_a.gif")), vid(2L, gif("anim_b.gif"))))
    val pairs = Multimodal.frameDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3))).toSeq
    // anim_a frame 1 and anim_b frame 1 render the same seed
    assert(pairs.contains((1L, 1, 2L, 1)),
      s"shared frame not paired: $pairs")
    assert(pairs.forall { case (_, fa, _, fb) => fa == 1 && fb == 1 },
      s"distinct frames spuriously paired: $pairs")
  }

  test("scene cuts on a real GIF: the abrupt content change is the one " +
      "cut") {
    val media = spark.createDataset(Seq(vid(1L, gif("anim_cut.gif"))))
    val cuts = Multimodal.sceneCuts(media, tau = 3)
      .collect().map(r => r.getInt(1) -> r.getBoolean(4)).toMap
    // frames: seed 3, 3, 9, 9 -> only the 1->2 transition is a cut
    // (measured luma delta 2558 over 768-pixel planes = 3.33/px; the
    // identical transitions are exactly 0)
    assert(cuts(2) == true, s"missed the content change: $cuts")
    assert(cuts(1) == false && cuts(3) == false,
      s"identical-frame transition flagged: $cuts")
  }

  test("streaming content-ID admission works on REAL GIF payloads: a " +
      "re-ingested animation sharing a frame with an indexed one is " +
      "rejected at the shared-frame threshold") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    // index holds anim_a's frames
    val idx0 = Multimodal.framePHashSigs(
        spark.createDataset(Seq(vid(1L, gif("anim_a.gif")))))
      .select((col("media_id") * Multimodal.FramePack + col("frame_idx"))
        .as("id"), col("simhash"))
    // batch: 10 = anim_a redelivered under a new id (3 shared frames ->
    // reject at minSharedFrames=2); 11 = anim_b (1 shared frame -> admit)
    val mem = MemoryStream[Multimodal.MediaRow]
    val collected = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    val q = graft.streaming.StreamingMedia.admitVideos(mem.toDS(), idx0,
      minSharedFrames = 2) { (df, _) => collected ++= df.collect() }
    try {
      mem.addData(vid(10L, gif("anim_a.gif")), vid(11L, gif("anim_b.gif")))
      q.processAllAvailable()
    } finally q.stop()
    val got = collected.map(r => r.getLong(0) ->
      (r.getBoolean(1), r.getLong(2))).toMap
    assert(got(10L) == (false, 3L), s"GIF copy not rejected: $got")
    assert(got(11L) == (true, 1L),
      s"one shared frame must stay under the threshold: $got")
  }

  test("AutoFrameDecoder: GRFT payloads route to the stub " +
      "bit-identically (oracled m_* video queries unchanged); GIFs to " +
      "the real decoder") {
    val body = ("frame-one-bytes!" * 8 + "frame-two-bytes." * 8)
      .getBytes("UTF-8")
    val grft = Multimodal.MediaRow(7L, "video",
      Multimodal.FakeCodec.encode(8, 8, 0, body), 8, 8, 0, 2)
    val viaAuto = Multimodal.AutoFrameDecoder.decodeFrames(grft).toSeq
    val viaStub = Multimodal.StubFrameDecoder.decodeFrames(grft).toSeq
    assert(viaAuto.map(_._1) == viaStub.map(_._1))
    viaAuto.zip(viaStub).foreach { case ((_, a), (_, b)) =>
      assert(java.util.Arrays.equals(a, b))
    }
    val media = spark.createDataset(Seq(grft))
    val d = Multimodal.framePHashSigs(media).collect()
      .map(r => (r.getInt(1), r.getLong(2))).toSet
    val s = Multimodal.framePHashSigs(media,
        decoder = Multimodal.StubFrameDecoder).collect()
      .map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(d == s)

    val g = Multimodal.AutoFrameDecoder
      .decodeFrames(vid(1L, gif("anim_a.gif"))).toSeq
    val gr = Multimodal.GifFrameDecoder
      .decodeFrames(vid(1L, gif("anim_a.gif"))).toSeq
    assert(g.map(_._1) == gr.map(_._1))
    g.zip(gr).foreach { case ((_, a), (_, b)) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }
}
