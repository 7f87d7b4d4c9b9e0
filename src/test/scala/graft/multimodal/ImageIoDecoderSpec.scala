package graft.multimodal

import graft.SparkTestBase

/** REAL image decode through the [[Multimodal.PixelDecoder]] seam: a
  * checked-in PNG (src/test/resources/multimodal/) flows through
  * javax.imageio → luma plane → pHash → banded pairs — the same
  * operators the synthetic gate data exercises — while GRFT payloads
  * keep routing to the stub bit-identically. */
class ImageIoDecoderSpec extends SparkTestBase {
  import spark.implicits._

  private def png(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/multimodal/$name")
    require(in != null, s"fixture $name missing")
    try in.readAllBytes() finally in.close()
  }

  private def row(id: Long, payload: Array[Byte]): Multimodal.MediaRow =
    Multimodal.MediaRow(id, "image", payload, 0, 0, 0, 1)

  test("ImageIoDecoder: checked-in PNG decodes to the full luma plane " +
      "with exact integer Rec.601 values") {
    val (w, h, plane) = Multimodal.ImageIoDecoder.decodeIntensity(
      png("real_base.png"))
    assert((w, h) == (48, 32))
    assert(plane.length == 48 * 32)
    // pixel (0,0) was written as r=0, g=200, b=0 -> luma 587*200/1000
    assert((plane(0) & 0xff) == (587 * 200) / 1000)
    // pixel (1,0): r=5, g=200, b=1 -> (299*5 + 587*200 + 114*1)/1000
    assert((plane(1) & 0xff) == (299 * 5 + 587 * 200 + 114 * 1) / 1000)
  }

  test("ImageIoDecoder fails LOUDLY on an unreadable payload") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.decodeIntensity(
        Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    }
    assert(e.getMessage.contains("imageio"))
  }

  test("real PNGs through pHashSigs + banded pHashPairs: exact copy at " +
      "hamming 0, near-dup close, distinct image far and unpaired") {
    val media = spark.createDataset(Seq(
      row(1L, png("real_base.png")),
      row(2L, png("real_base.png")),     // exact byte copy
      row(3L, png("real_neardup.png")),  // 16 of 1536 pixels whitened
      row(4L, png("real_distinct.png"))))
    val sigs = Multimodal.pHashSigs(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L), "identical PNGs hashed differently")
    val hNear = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    val hFar = java.lang.Long.bitCount(sigs(1L) ^ sigs(4L))
    assert(hNear <= 6, s"near-dup hamming $hNear too large")
    assert(hFar > 12, s"distinct image hamming $hFar suspiciously small")
    val pairs = Multimodal.pHashPairs(media, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "exact PNG copy not paired")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)),
      s"near-dup PNG not paired (pairs=$pairs, hamming=$hNear)")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"distinct image paired: $pairs")
  }

  test("stub-vs-real parity on the synthetic body: AutoDecoder routes " +
      "GRFT payloads to the stub bit-identically, PNGs to imageio") {
    val grft = Multimodal.FakeCodec.encode(8, 8, 0,
      "synthetic body bytes for parity".getBytes("UTF-8"))
    val viaAuto = Multimodal.AutoDecoder.decodeIntensity(grft)
    val viaStub = Multimodal.StubDecoder.decodeIntensity(grft)
    assert(viaAuto._1 == viaStub._1 && viaAuto._2 == viaStub._2)
    assert(java.util.Arrays.equals(viaAuto._3, viaStub._3))

    val p = png("real_base.png")
    val autoPng = Multimodal.AutoDecoder.decodeIntensity(p)
    val realPng = Multimodal.ImageIoDecoder.decodeIntensity(p)
    assert(autoPng._1 == realPng._1 && autoPng._2 == realPng._2)
    assert(java.util.Arrays.equals(autoPng._3, realPng._3))

    // and through the distributed operator: default == explicit stub on
    // synthetic media (the oracled m_* gate queries are unchanged)
    val media = spark.createDataset(Seq(row(7L, grft)))
    val d = Multimodal.pHashSigs(media).collect().head.getLong(1)
    val s = Multimodal.pHashSigs(media, decoder = Multimodal.StubDecoder)
      .collect().head.getLong(1)
    assert(d == s)
  }
}
