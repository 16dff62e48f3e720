package graft.ext

import java.security.MessageDigest

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("mapPartitions feature extraction: deterministic stub decode + real sha256") {
    val media = Seq(
      Multimodal.MediaRecord(1L, "hello world".getBytes("UTF-8"), "text/plain"),
      Multimodal.MediaRecord(2L, Array[Byte](0, 1, 2, 3, 4, 5, 6, 7), "application/octet-stream"))
      .toDS()
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.id)

    val f1 = feats(0)
    assert(f1.byteLen === 11)
    val expectedSha = MessageDigest.getInstance("SHA-256")
      .digest("hello world".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(f1.sha256 === expectedSha)
    assert(f1.width === 1 + (11L * 7919 % 640).toInt)
    assert(f1.height === 1 + (11L * 104729 % 480).toInt)

    val f2 = feats(1)
    assert(f2.byteLen === 8)
    assert(f2.frameSample.toSeq === Seq(0, 2, 4, 6)) // quartile-stride sampling
  }

  test("resize stub: aspect-preserving fit, never upscales, never zero") {
    assert(Multimodal.resizeStub(1920, 1080, 640, 480) === ((640, 360)))
    assert(Multimodal.resizeStub(100, 100, 640, 480) === ((100, 100))) // no upscale
    assert(Multimodal.resizeStub(10000, 1, 64, 64) === ((64, 1)))
    assert(Multimodal.resizeStub(1, 10000, 64, 64)._2 === 64)
  }

  test("extraction is a narrow map — no shuffle in the plan") {
    val media = Seq(Multimodal.MediaRecord(1L, Array[Byte](1), "x")).toDS()
    val plan = Multimodal.extractFeatures(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
