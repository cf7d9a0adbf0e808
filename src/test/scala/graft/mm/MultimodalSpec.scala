package graft.mm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "a" * 100), (1L, "b" * 50), (2L, "c" * 75)
  ).toDF("doc_id", "text")

  test("mediaTable: binary payload + cycling modality") {
    val m = Multimodal.mediaTable(docs).collect().map(r =>
      (r.getLong(0), r.getAs[Array[Byte]](1).length, r.getString(2)))
    assert(m.toSet == Set((0L, 100, "image"), (1L, 50, "audio"), (2L, 75, "video")))
  }

  test("extractFeatures: deterministic stub features per modality") {
    val f = Multimodal.extractFeatures(Multimodal.mediaTable(docs))
      .collect().map(x => x.media_id -> x).toMap
    assert(f(0L).n_bytes == 100 && f(0L).width == 100 && f(0L).height == 100 / 7 && f(0L).n_frames == 1)
    assert(f(1L).n_frames == 50 && f(1L).width == 0)
    assert(f(2L).width == 75 && f(2L).height == 75 && f(2L).n_frames == 75)
    // checksum is a pure function of the payload
    val again = Multimodal.extractFeatures(Multimodal.mediaTable(docs))
      .collect().map(x => x.media_id -> x.checksum).toMap
    assert(f.map { case (k, v) => k -> v.checksum } == again)
  }

  test("sampleChunks: strided binary slicing") {
    val out = Multimodal.sampleChunks(Multimodal.mediaTable(docs), chunk = 10, stride = 2)
      .filter(col("media_id") === 0L)
      .select(col("chunks")).collect().head.getSeq[Array[Byte]](0)
    assert(out.length == 5)           // 100 bytes / (10*2)
    assert(out.forall(_.length == 10))
  }
}
