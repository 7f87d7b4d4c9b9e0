package graft.multimodal

import graft.SparkTestBase

/** REAL audio decode through the [[Multimodal.SampleDecoder]] seam: a
  * checked-in PCM WAV flows through javax.sound.sampled → unsigned
  * 8-bit samples → the SAME windowed-energy / VAD operators the
  * synthetic gate data exercises, while GRFT payloads keep routing to
  * the stub bit-identically. */
class WavDecoderSpec extends SparkTestBase {
  import spark.implicits._

  private def wav(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/multimodal/$name")
    require(in != null, s"fixture $name missing")
    try in.readAllBytes() finally in.close()
  }

  private def row(id: Long, payload: Array[Byte]): Multimodal.MediaRow =
    Multimodal.MediaRow(id, "audio", payload, 0, 0, 8000, 1)

  test("WavDecoder: 16-bit mono PCM decodes to the exact amplitude " +
      "envelope (min(255, |s| >> 7))") {
    val (sr, samples) = Multimodal.WavDecoder.decodeSamples(
      wav("speech_like.wav"))
    assert(sr == 8000)
    assert(samples.length == 1600)
    // loud half: |±20000| >> 7 = 156, phase-independent
    assert((samples(0) & 0xff) == 20000 >> 7)
    assert((samples(20) & 0xff) == 20000 >> 7)
    // tail near-silence: |±50| >> 7 = 0
    assert((samples(800) & 0xff) == 0)
    assert((samples(801) & 0xff) == 0)
  }

  test("stereo downmix is the integer floor-mean of channels") {
    val (_, samples) = Multimodal.WavDecoder.decodeSamples(wav("stereo.wav"))
    assert(samples.length == 400)
    // even frames: L=|10000|>>7 = 78, R=|-20000|>>7 = 156 -> floor 117
    assert((samples(0) & 0xff) == ((10000 >> 7) + (20000 >> 7)) / 2)
    // odd frames: L=78, R=|4000|>>7 = 31 -> floor 54
    assert((samples(1) & 0xff) == ((10000 >> 7) + (4000 >> 7)) / 2)
  }

  test("WavDecoder fails LOUDLY on unreadable bytes") {
    intercept[Exception] {
      Multimodal.WavDecoder.decodeSamples(Array[Byte](1, 2, 3, 4))
    }
  }

  test("real WAV through vadSegments: the loud half is one active " +
      "segment, the near-silent tail is not") {
    val media = spark.createDataset(Seq(row(1L, wav("speech_like.wav"))))
    // windows of 100 samples: loud half (windows 0..7) sits at 156
    // envelope units/sample regardless of square-wave phase, the
    // near-silent tail at 0 — tau=60 separates cleanly
    val segs = Multimodal.vadSegments(media, window = 100, tau = 60)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(segs.toSeq == Seq((1, 0, 7)),
      s"expected one segment over windows 0..7, got ${segs.toSeq}")
  }

  test("AutoSampleDecoder: GRFT payloads route to the stub " +
      "bit-identically; WAV routes to the real decoder") {
    val grft = Multimodal.FakeCodec.encode(0, 0, 16000,
      Array.tabulate[Byte](64)(i => i.toByte))
    val viaAuto = Multimodal.AutoSampleDecoder.decodeSamples(grft)
    val viaStub = Multimodal.StubSampleDecoder.decodeSamples(grft)
    assert(viaAuto._1 == viaStub._1)
    assert(java.util.Arrays.equals(viaAuto._2, viaStub._2))
    val w = wav("speech_like.wav")
    val a = Multimodal.AutoSampleDecoder.decodeSamples(w)
    val r = Multimodal.WavDecoder.decodeSamples(w)
    assert(a._1 == r._1 && java.util.Arrays.equals(a._2, r._2))
    // and through the distributed operator: default == explicit stub on
    // synthetic media (the oracled m_* gate queries are unchanged)
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(7L, "audio", grft, 0, 0, 16000, 1)))
    val d = Multimodal.audioWindows(media, 16).collect()
      .map(w0 => (w0.window_idx, w0.energy)).toSeq
    val s = Multimodal.audioWindows(media, 16,
        decoder = Multimodal.StubSampleDecoder).collect()
      .map(w0 => (w0.window_idx, w0.energy)).toSeq
    assert(d == s)
  }
}
