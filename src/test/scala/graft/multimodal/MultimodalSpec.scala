package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.Tables

class MultimodalSpec extends SparkTestBase {

  lazy val media = Multimodal.mediaFromDocuments(
    Tables.load(spark, sfDir, "documents"))

  test("codec round-trips payload bytes exactly") {
    val body = "hello media".getBytes("UTF-8")
    val enc = Multimodal.FakeCodec.encode(320, 240, 16000, body)
    val (w, h, sr, dec) = Multimodal.FakeCodec.decode(enc)
    assert((w, h, sr) == (320, 240, 16000))
    assert(dec.sameElements(body))
  }

  test("decode rejects garbage payloads") {
    intercept[IllegalArgumentException] {
      Multimodal.FakeCodec.decode(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8,
        9, 10, 11, 12, 13, 14, 15, 16))
    }
  }

  test("media table covers all three kinds with payloads") {
    val kinds = media.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
    assert(media.filter(length(col("payload")) <= Multimodal.FakeCodec.HeaderLen)
      .count() == 0)
  }

  test("imageFeatures decodes every row with consistent meta") {
    val feats = Multimodal.imageFeatures(media)
    assert(feats.count() == media.count())
    val a = feats.toDF().select(col("media_id"), col("width").as("w_dec"))
    val b = media.toDF().select(col("media_id"), col("width").as("w_meta"))
    assert(a.join(b, "media_id").filter(col("w_dec") =!= col("w_meta")).count() == 0)
  }

  test("resize updates header, preserves body") {
    val f = Multimodal.imageFeatures(Multimodal.resize(media, 224, 224))
    val orig = Multimodal.imageFeatures(media)
    assert(f.filter(col("width") =!= 224).count() == 0)
    // body untouched → identical n_bytes and mean
    val joined = f.toDF().alias("a").join(orig.toDF().alias("b"), "media_id")
      .filter(col("a.n_bytes") =!= col("b.n_bytes") ||
        col("a.mean_intensity") =!= col("b.mean_intensity"))
    assert(joined.count() == 0)
  }

  test("sampleFrames emits ceil(n_frames/5) rows per video") {
    val frames = Multimodal.sampleFrames(media, 5).toDF()
    val got = frames.groupBy("media_id").count()
    val want = media.filter(col("kind") === "video").toDF()
      .select(col("media_id"), ceil(col("n_frames") / 5.0).as("want"))
    assert(got.join(want, "media_id").filter(col("count") =!= col("want")).count() == 0)
    assert(frames.count() > 0)
  }

  test("featurize produces fixed-dim vectors usable by ANN") {
    val df = Multimodal.featurize(media, 16)
    assert(df.filter(size(col("embedding")) =!= 16).count() == 0)
  }
}
