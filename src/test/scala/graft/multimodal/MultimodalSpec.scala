package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The image decode must be REAL (true pixels through javax.imageio), the
  * fallback deterministic, and the Spark pipeline map-side only.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def solid(w: Int, h: Int, rgb: Int) = ImageCodec.encodeSolidPng(w, h, rgb)

  test("PNG round-trip: exact dimensions, exact channel means, single frame") {
    val d = ImageCodec.decode(solid(37, 21, 0xa1b2c3)).get
    assert(d.width == 37 && d.height == 21 && d.nFrames == 1)
    assert(d.meanR == 0xa1 && d.meanG == 0xb2 && d.meanB == 0xc3)
  }

  test("thumbnail is pooled luma in [0,1], tracking the image content") {
    // left half black, right half white: left thumb cells ~0, right ~1
    val png = ImageCodec.encodePng(64, 64, (x, _) => if (x < 32) 0x000000 else 0xffffff)
    val d = ImageCodec.decode(png).get
    val t = d.thumb
    assert(t.length == ImageCodec.ThumbSide * ImageCodec.ThumbSide)
    for (row <- 0 until 4) {
      assert(t(row * 4) < 0.01f && t(row * 4 + 1) < 0.01f, s"left cells row $row: ${t.mkString(",")}")
      assert(t(row * 4 + 2) > 0.99f && t(row * 4 + 3) > 0.99f, s"right cells row $row")
    }
    // gradient: thumb cells strictly increase left to right
    val grad = ImageCodec.encodePng(64, 16, (x, _) => { val v = x * 4; (v << 16) | (v << 8) | v })
    val g = ImageCodec.decode(grad).get.thumb
    assert(g(0) < g(1) && g(1) < g(2) && g(2) < g(3), g.mkString(","))
  }

  test("JPEG (second real codec): exact dimensions, means within lossy tolerance") {
    val jpg = ImageCodec.encodeJpeg(48, 32, (_, _) => 0x608090)
    val d = ImageCodec.decode(jpg).get
    assert(d.width == 48 && d.height == 32)
    assert(math.abs(d.meanR - 0x60) < 8 && math.abs(d.meanG - 0x80) < 8 &&
      math.abs(d.meanB - 0x90) < 8, s"(${d.meanR}, ${d.meanG}, ${d.meanB})")
  }

  test("multi-frame GIF: true frame count via getNumImages, not a constant 1") {
    // write an animated GIF with the JDK's sequence writer, decode it back
    val img1 = new java.awt.image.BufferedImage(16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val img2 = new java.awt.image.BufferedImage(16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val img3 = new java.awt.image.BufferedImage(16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 16; y <- 0 until 12) {
      img1.setRGB(x, y, 0x202020); img2.setRGB(x, y, 0x808080); img3.setRGB(x, y, 0xe0e0e0)
    }
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    Seq(img1, img2, img3).foreach(i =>
      writer.writeToSequence(new javax.imageio.IIOImage(i, null, null), null))
    writer.endWriteSequence(); writer.dispose(); ios.close()

    val d = ImageCodec.decode(out.toByteArray).get
    assert(d.width == 16 && d.height == 12)
    assert(d.nFrames == 3, s"expected 3 frames, got ${d.nFrames}")
    // pixel stats come from frame 0 (GIF palette quantization is lossless
    // for a single solid gray)
    assert(math.abs(d.meanR - 0x20) < 2, d.meanR.toString)
  }

  test("non-image bytes take the deterministic fallback, flagged decoded=false") {
    assert(ImageCodec.decode("not an image".getBytes("UTF-8")).isEmpty)
    assert(ImageCodec.decode(Array.empty[Byte]).isEmpty)
    assert(ImageCodec.decode(null).isEmpty)
    // truncated PNG: magic bytes present but body cut off — must not throw
    assert(ImageCodec.decode(solid(16, 16, 0x112233).take(20)).isEmpty)

    val items = Seq(
      Multimodal.MediaItem(1L, "image", "plain text".getBytes("UTF-8"), "s", 10L),
      Multimodal.MediaItem(2L, "image", solid(20, 10, 0x405060), "s", 0L))
      .toDS()
    val out = Multimodal.withFeatures(items).collect().sortBy(_.media_id)
    assert(!out(0).decoded && out(0).width >= 64, "fallback keeps digest-derived pseudo-dims")
    assert(out(1).decoded && out(1).width == 20 && out(1).height == 10 &&
      out(1).mean_r == 0x40 && out(1).mean_g == 0x50 && out(1).mean_b == 0x60)
    // deterministic: re-running yields identical rows (retry/speculation safety)
    val again = Multimodal.withFeatures(items).collect().sortBy(_.media_id)
    assert(out.zip(again).forall { case (a, b) =>
      a == b.copy(feature_vec = a.feature_vec) && a.feature_vec.sameElements(b.feature_vec) })
  }

  test("decode pipeline is map-side only: no shuffle exchange in the plan") {
    val items = Seq(Multimodal.MediaItem(1L, "image", solid(8, 8, 0), "s", 0L)).toDS()
    val plan = Multimodal.withFeatures(items).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode introduced a shuffle:\n$plan")
  }
}
