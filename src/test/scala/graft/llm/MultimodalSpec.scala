package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import Multimodal.StubCodec

class MultimodalSpec extends AnyFunSuite with SparkTestSession {

  private def assets() = {
    import spark.implicits._
    Seq(
      (1L, StubCodec.encodeHeader(1920, 1080, 300), "video/x-graft", "s3://a/1"),
      (2L, StubCodec.encodeHeader(640, 480, 1), "image/x-graft", "s3://a/2"),
      (3L, Array[Byte](1, 2, 3), "application/octet-stream", "s3://a/3"),
      (4L, null.asInstanceOf[Array[Byte]], null, "s3://a/4"))
      .toDF("asset_id", "payload", "mime", "uri")
  }

  test("decode over partitions: dims extracted, junk and null flagged") {
    val d = Multimodal.decodeAssets(assets()).orderBy("asset_id").collect()
    assert(d(0).getInt(1) == 1920 && d(0).getInt(2) == 1080 && d(0).getInt(3) == 300)
    assert(d(1).getInt(1) == 640)
    assert(!d(2).getBoolean(4) && d(2).isNullAt(1))
    assert(!d(3).getBoolean(4))
  }

  test("resize keeps aspect and contract; frame sampling explodes strided indices") {
    val resized = Multimodal.decodeAssets(
      Multimodal.resize(assets(), maxDim = 960)).orderBy("asset_id").collect()
    assert(resized(0).getInt(1) == 960 && resized(0).getInt(2) == 540)
    assert(resized(1).getInt(1) == 640) // already under maxDim
    val frames = Multimodal.sampleFrames(
      Multimodal.decodeAssets(assets()), stride = 100).orderBy("asset_id", "frame_idx").collect()
    assert(frames.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 0), (1L, 100), (1L, 200), (2L, 0)))
  }
}
