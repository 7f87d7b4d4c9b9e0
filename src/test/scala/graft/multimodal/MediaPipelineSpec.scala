package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class MediaPipelineSpec extends SparkTestBase {

  private def img(id: Long, body: String) = Multimodal.MediaRow(id, "image",
    Multimodal.FakeCodec.encode(8, 8, 0, body.getBytes("UTF-8")), 8, 8, 0, 1)
  private def aud(id: Long, body: Array[Byte]) = Multimodal.MediaRow(id,
    "audio", Multimodal.FakeCodec.encode(0, 0, 16000, body), 0, 0, 16000, 1)
  private def vid(id: Long, body: String, nf: Int) = Multimodal.MediaRow(id,
    "video", Multimodal.FakeCodec.encode(4, 4, 0, body.getBytes("UTF-8")),
    4, 4, 0, nf)

  test("pipeline: image dup loses keep-one, silent audio drops, " +
      "copied video rejects, features cover exactly the survivors") {
    import spark.implicits._
    val imgBody = "a reasonably long decoded image plane with varied bytes!"
    val vidBody = "frame one payload bytes here!" * 4 +
      "frame TWO has other content :::" * 4 +
      "third frame, different again..." * 4
    val loud = Array.fill[Byte](800)(120.toByte) // mean 120 > tau
    val silent = Array.fill[Byte](800)(10.toByte) // mean 10 < tau
    val media = spark.createDataset(Seq(
      img(1L, imgBody), img(2L, imgBody), // dup pair: keep 1, drop 2
      img(3L, "a totally different image body with other rhythm 0123456"),
      aud(10L, loud), aud(11L, silent),
      vid(20L, vidBody, 3), vid(21L, vidBody, 3), // copy: 21 rejects
      vid(22L, "totally unrelated video body " * 12, 3)
    )).repartition(2)
    val out = java.nio.file.Files
      .createTempDirectory("media_pipe").toString
    val stats = MediaPipeline.run(spark, media, out, vadTau = 60)

    assert(stats.n_input == 8)
    assert(stats.n_images == 3 && stats.n_images_kept == 2)
    assert(stats.n_audio == 2 && stats.n_audio_kept == 1)
    assert(stats.n_video == 3 && stats.n_video_kept == 2)
    assert(stats.n_features ==
      stats.n_images_kept + stats.n_audio_kept + stats.n_video_kept)

    val feats = spark.read.parquet(s"$out/features")
    val ids = feats.select("media_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L, 10L, 20L, 22L))
    // per-kind partition dirs exist
    val kinds = feats.select("kind").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
    assert(feats.filter(size(col("embedding")) =!= 16).count() == 0)
  }
}
