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

  // ---- perceptual dHash ----

  /** 9x8 cell-grid image: gray level per cell from `v(i, j)`, rendered at
    * (w, h) divisible by (9, 8) so pooling is exact.
    */
  private def gridPng(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] =
    ImageCodec.encodePng(w, h, (x, y) => {
      val g = v(x * 9 / w, y * 8 / h); (g << 16) | (g << 8) | g
    })

  test("dHash equals the hand-computed comparison table of the cell grid") {
    // v(i, j) = (3*(i+1) + j) % 7 * 25: bit j*8+i = [v(i+1,j) > v(i,j)]
    def v(i: Int, j: Int): Int = ((3 * (i + 1) + j) % 7) * 25
    var want = 0L
    for (j <- 0 until 8; i <- 0 until 8)
      if (v(i + 1, j) > v(i, j)) want |= 1L << (j * 8 + i)
    assert(ImageCodec.dHash(gridPng(72, 64, v)).contains(want))
  }

  test("dHash is invariant to scale, JPEG re-encode, and brightness shift") {
    def v(i: Int, j: Int): Int = ((5 * (i + 1) + 2 * j) % 7) * 25
    val base = ImageCodec.dHash(gridPng(72, 64, v)).get
    // 2x upscale (PNG, exact pooling)
    assert(ImageCodec.dHash(gridPng(144, 128, v)).contains(base))
    // JPEG re-encode: flat 8x8 cells sit on DCT blocks, error << the
    // 25-level margin, so the hash is bit-identical, not merely close
    val jpeg = ImageCodec.encodeJpeg(72, 64, (x, y) => {
      val g = v(x * 9 / 72, y * 8 / 64); (g << 16) | (g << 8) | g
    })
    assert(ImageCodec.dHash(jpeg).contains(base))
    // +8 global brightness: comparisons see only relative differences
    assert(ImageCodec.dHash(gridPng(72, 64, (i, j) => v(i, j) + 8)).contains(base))
    // a genuinely different grid hashes differently
    def v2(i: Int, j: Int): Int = ((2 * (i + 1) + 4 * j) % 7) * 25
    assert(!ImageCodec.dHash(gridPng(72, 64, v2)).contains(base))
    // undecodable bytes: None, never a throw
    assert(ImageCodec.dHash("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("nearDupBits groups within-hamming signatures and equals brute force") {
    import graft.functions.DedupFunctions
    val sigs = Seq(
      (1L, 0x0123456789abcdefL),
      (2L, 0x0123456789abcdeeL), // hamming 1 from #1
      (3L, 0x0123456789abcd00L), // hamming 6 from #1 — outside
      (4L, 0x7123456789abcdefL), // hamming 3 from #1 (high bits 0x71 vs 0x01)
      (5L, -1L))
      .toDF("id", "sig")
    val got = DedupFunctions.nearDupBits(sigs, "id", "sig", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue())).toSet
    val rows = Seq((1L, 0x0123456789abcdefL), (2L, 0x0123456789abcdeeL),
      (3L, 0x0123456789abcd00L), (4L, 0x7123456789abcdefL), (5L, -1L))
    val want = (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      d = java.lang.Long.bitCount(sa ^ sb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(got == want, s"got $got want $want")
  }
}
