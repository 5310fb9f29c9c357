package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark

/** The REAL image codec path (javax.imageio): decode, luminance-histogram
  * features, and thumbnail resize — driven both directly and through the
  * Spark operators, with synthetic PNGs generated in-test.
  */
class MultimodalSpec extends AnyFunSuite {

  /** Deterministic in-memory PNG with per-pixel RGB from `f(x, y)`. */
  private def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("image features: real javax.imageio decode into a luminance histogram") {
    val black = Multimodal.decodeMedia(png(8, 8)((_, _) => 0x000000), "image/png", 8)
    assert(black(0) == 1.0 && black.drop(1).forall(_ == 0.0))
    val white = Multimodal.decodeMedia(png(8, 8)((_, _) => 0xffffff), "image/png", 8)
    assert(white(7) == 1.0 && white.take(7).forall(_ == 0.0))
    val gradient = png(16, 16) { (x, y) =>
      val v = (x * 16 + y) & 0xff; (v << 16) | (v << 8) | v
    }
    val g = Multimodal.decodeMedia(gradient, "image/png", 8)
    assert(math.abs(g.sum - 1.0) < 1e-9) // normalized histogram
    assert(g.count(_ > 0) > 1) // gradient spreads across buckets
  }

  test("non-image mimes and undecodable image bytes fall back to the stub") {
    val junk = Array.tabulate(100)(_.toByte)
    assert(Multimodal.decodeMedia(junk, "audio/wav", 8)
      .sameElements(Multimodal.decodeStub(junk, 8)))
    assert(Multimodal.decodeMedia(junk, "image/png", 8)
      .sameElements(Multimodal.decodeStub(junk, 8)))
  }

  test("extractFeatures routes image rows through the real decoder in Spark") {
    import spark.implicits._
    val media = Seq(
      (1L, "image/png", png(8, 8)((_, _) => 0xffffff)),
      (2L, "text/plain", "hello world".getBytes("UTF-8")))
      .toDF("media_id", "mime", "media")
    val out = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(r => r.media_id -> r).toMap
    assert(out(1L).features(7) == 1.0)
    assert(out(1L).feat_norm == 1.0)
    assert(out(2L).features
      .sameElements(Multimodal.decodeStub("hello world".getBytes("UTF-8"), 8)))
  }

  test("resizeAll produces a real deterministic thumbnail for images") {
    import spark.implicits._
    val checker = png(64, 48) { (x, y) =>
      if ((x / 8 + y / 8) % 2 == 0) 0xffffff else 0x000000
    }
    val media = Seq((1L, "image/png", checker)).toDF("media_id", "mime", "media")
    def thumb(): Array[Byte] = Multimodal.resizeAll(media, thumbW = 16, thumbH = 12)
      .collect()(0).getAs[Array[Byte]]("media")
    val t1 = thumb()
    val decoded = Multimodal.decodeImage(t1).get
    assert(decoded.getWidth == 16 && decoded.getHeight == 12)
    assert(t1.sameElements(thumb())) // byte-identical re-encode
    // the stub path still honors the bounded-size contract for other mimes
    val stubOut = Multimodal.resizeAll(
      Seq((2L, "video/mp4", Array.tabulate(999)(_.toByte))).toDF("media_id", "mime", "media"),
      targetBytes = 128).collect()(0).getAs[Array[Byte]]("media")
    assert(stubOut.length == 128)
  }
}
