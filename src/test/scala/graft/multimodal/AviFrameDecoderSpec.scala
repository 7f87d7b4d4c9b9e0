package graft.multimodal

import graft.SparkTestBase

/** REAL video-container parse through the [[Multimodal.FrameDecoder]]
  * seam: checked-in uncompressed AVIs (RIFF chunk tree, 24-bit BI_RGB
  * bottom-up DIB frames) decode to closed-form luma planes and flow
  * through the SAME content-ID operators as the GIF and synthetic
  * paths, with loud failures on unsupported encodings. */
class AviFrameDecoderSpec extends SparkTestBase {
  import spark.implicits._

  private def avi(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/multimodal/$name")
    require(in != null, s"fixture $name missing")
    try in.readAllBytes() finally in.close()
  }

  private def vid(id: Long, payload: Array[Byte]): Multimodal.MediaRow =
    Multimodal.MediaRow(id, "video", payload, 16, 8, 0, 0)

  test("AviFrameDecoder: frames decode to the generator's closed-form " +
      "luma planes, un-flipping the bottom-up DIB rows") {
    // fixture pixels are B=G=R=v with v(x, y, seed) = (17x+31y+53s)%256,
    // so integer Rec.601 luma == v exactly; clip_a seeds are (0, 1, 2)
    val frames = Multimodal.AviFrameDecoder
      .decodeFrames(vid(1L, avi("clip_a.avi"))).toSeq
    assert(frames.map(_._1) == Seq(0, 1, 2))
    for ((f, plane) <- frames) {
      assert(plane.length == 16 * 8)
      for (y <- 0 until 8; x <- 0 until 16)
        assert((plane(y * 16 + x) & 0xff) ==
          (x * 17 + y * 31 + f * 53) % 256,
          s"frame $f pixel ($x,$y)")
    }
  }

  test("cross-video content-ID on real AVIs: the one shared frame " +
      "pairs, distinct frames do not") {
    val media = spark.createDataset(Seq(
      vid(1L, avi("clip_a.avi")), vid(2L, avi("clip_b.avi"))))
    val pairs = Multimodal.frameDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3))).toSeq
    assert(pairs.contains((1L, 1, 2L, 1)), s"shared frame not paired: $pairs")
    assert(pairs.forall { case (_, fa, _, fb) => fa == 1 && fb == 1 },
      s"distinct frames spuriously paired: $pairs")
  }

  test("AutoFrameDecoder routes RIFF/AVI to the real parser and GRFT " +
      "to the stub in one mixed batch") {
    val stub = Multimodal.mediaFromDocuments(
      graft.Tables.load(spark, sfDir, "documents")
        .filter(org.apache.spark.sql.functions.col("doc_id") === 0))
      .collect().head.copy(media_id = 5L, kind = "video", n_frames = 2)
    val media = spark.createDataset(Seq(vid(1L, avi("clip_a.avi")), stub))
    val stats = Multimodal.frameStats(media).collect()
      .groupBy(_.media_id).view.mapValues(_.length).toMap
    assert(stats(1L) == 3) // the container's own frame count, not metadata
    assert(stats(5L) == 2) // stub striping honors n_frames
  }

  test("unsupported encodings fail loud, not with garbage planes") {
    val p = avi("clip_a.avi")
    val strf = {
      var i = 0; var at = -1
      while (at < 0 && i < p.length - 4) {
        if (p(i) == 's' && p(i + 1) == 't' && p(i + 2) == 'r' &&
          p(i + 3) == 'f') at = i
        i += 1
      }
      require(at > 0, "strf not found in fixture"); at
    }
    val eightBit = p.clone()
    eightBit(strf + 8 + 14) = 8 // biBitCount 24 -> 8
    intercept[IllegalArgumentException] {
      Multimodal.AviFrameDecoder.decodeFrames(vid(1L, eightBit)).toSeq
    }
    val rle = p.clone()
    rle(strf + 8 + 16) = 1 // biCompression BI_RGB -> BI_RLE8
    intercept[IllegalArgumentException] {
      Multimodal.AviFrameDecoder.decodeFrames(vid(1L, rle)).toSeq
    }
    intercept[IllegalArgumentException] { // truncated chunk tree
      Multimodal.AviFrameDecoder
        .decodeFrames(vid(1L, p.take(p.length - 100))).toSeq
    }
  }
}
