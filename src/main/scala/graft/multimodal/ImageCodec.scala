package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Real, pure-JVM image decode for the multimodal plane — no native deps.
  *
  * `javax.imageio` ships with the JDK and reads PNG, JPEG, GIF, BMP and
  * WBMP; that makes image columns a REAL capability (true dimensions, true
  * pixel statistics) rather than plumbing evidence, while audio/video stay
  * behind the documented deterministic fallback until a codec is available.
  *
  * Everything here is deterministic and side-effect free, so decode results
  * are stable across retries/speculative tasks — a requirement for
  * exactly-once sinks downstream.
  *
  * Reference anchor: none — this is a beyond-reference north-star item
  * (multimodal columns for LLM training-data pipelines).
  */
object ImageCodec {

  /** Pixel-derived facts about one decoded image. `thumb` is a ThumbSide ×
    * ThumbSide average-pooled grayscale thumbnail in [0,1] — a tiny,
    * fixed-width embedding usable by the similarity plane (e.g. embedding
    * near-dup over screenshots) without any model dependency.
    */
  final case class DecodedImage(
      width: Int,
      height: Int,
      nFrames: Int,
      meanR: Double,
      meanG: Double,
      meanB: Double,
      thumb: Array[Float])

  val ThumbSide = 4

  /** Decompression-bomb guard: a corrupt/hostile header can DECLARE
    * arbitrary dimensions (a few bytes cost gigapixels of decode work and
    * memory). An untrusted-corpus decoder must bound work by a budget, not
    * trust the header — found by mutation fuzzing (CodecFuzzSpec), where a
    * flipped PNG IHDR byte turned one row into a multi-minute decode.
    */
  val MaxPixels: Long = 1L << 26 // 67 Mpx ≈ 8192x8192

  /** Decode an image payload; None when the bytes are not a supported
    * format or declare more than [[MaxPixels]] pixels. One payload decodes
    * in one task (images are row-sized, not partition-sized), so this
    * composes with `Multimodal.withFeatures`'s Iterator→Iterator batch
    * shape and constant-memory guarantee.
    */
  def decode(bytes: Array[Byte]): Option[DecodedImage] = readImage(bytes)
    .map { case (img, nFrames) => stats(img, nFrames) }

  /** Bomb-guarded read shared by [[decode]] and [[dHash]]: (image, frame
    * count), None on non-image/corrupt/oversized payloads.
    */
  private def readImage(bytes: Array[Byte]): Option[(BufferedImage, Int)] = {
    if (bytes == null || bytes.length == 0) return None
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, false, true)
        // header-declared dims checked BEFORE any pixel is decoded
        val w = reader.getWidth(0).toLong
        val h = reader.getHeight(0).toLong
        if (w <= 0 || h <= 0 || w * h > MaxPixels) return None
        // allowSearch=true: exact frame count (multi-frame GIFs); cheap for
        // the single-frame formats
        val nFrames = math.max(1, reader.getNumImages(true))
        val img = reader.read(0)
        if (img == null) return None
        Some((img, nFrames))
      } finally reader.dispose()
    } catch {
      case _: Exception => None // truncated/corrupt payload: not an image
    } finally iis.close()
  }

  /** dHash grid: 9 columns × 8 rows of pooled luma → 64 horizontal
    * comparisons (Krawetz's difference hash, the standard perceptual
    * image fingerprint).
    */
  val HashW = 9
  val HashH = 8

  /** 64-bit perceptual difference hash: average-pool integer luma
    * (299r+587g+114b, never divided — cell means compare by integer
    * cross-multiplication, so the hash is exactly reproducible from any
    * engine's integer arithmetic) onto the [[HashW]]×[[HashH]] grid; bit
    * `j*8+i` is set iff cell (i+1, j) is brighter than cell (i, j).
    * Scale-invariant by construction (pooling), robust to lossy
    * re-encodes and global brightness shifts (comparisons see only
    * relative differences). None on undecodable payloads.
    */
  def dHash(bytes: Array[Byte]): Option[Long] = readImage(bytes).map { case (img, _) =>
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Long](HashW * HashH)
    val counts = new Array[Long](HashW * HashH)
    var y = 0
    while (y < h) {
      val ty = y * HashH / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = 299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
        val cell = ty * HashW + x * HashW / w
        sums(cell) += luma
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var j = 0
    while (j < HashH) {
      var i = 0
      while (i < HashW - 1) {
        val l = j * HashW + i
        val r = l + 1
        // mean(right) > mean(left), integer-exact: direct sum compare when
        // the cells hold equally many pixels (every grid-aligned fixture),
        // BigInt cross-multiplication otherwise (a Long cross product can
        // overflow at the MaxPixels bound; 64 cold-path comparisons per
        // image cost nothing)
        val brighter =
          if (counts(l) == counts(r)) sums(r) > sums(l)
          else BigInt(sums(r)) * counts(l) > BigInt(sums(l)) * counts(r)
        if (brighter) bits |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    bits
  }

  /** One pass over the pixels: per-channel means + pooled grayscale thumb.
    * Uses getRGB per pixel — adequate for row-sized images; a Raster
    * fast-path is a drop-in if profiling ever demands it.
    */
  private def stats(img: BufferedImage, nFrames: Int): DecodedImage = {
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    val sums = new Array[Double](ThumbSide * ThumbSide)
    val counts = new Array[Long](ThumbSide * ThumbSide)
    var y = 0
    while (y < h) {
      val ty = y * ThumbSide / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        sr += r; sg += g; sb += b
        val cell = ty * ThumbSide + x * ThumbSide / w
        // Rec.601 luma, normalized to [0,1]
        sums(cell) += (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    val thumb = Array.tabulate(ThumbSide * ThumbSide) { i =>
      if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat
    }
    DecodedImage(w, h, nFrames, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, thumb)
  }

  /** Deterministic in-memory PNG encode — fixture generator for specs and
    * oracle queries (the synthetic testdata has no binary media, so queries
    * that prove the decoder synthesize payloads whose ground truth is a
    * closed-form function of the row id, checkable from SQL).
    */
  def encodePng(width: Int, height: Int, fill: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, fill(x, y) & 0xffffff); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Solid-color PNG: the simplest payload whose decoded statistics are
    * exactly predictable (mean channel == the fill channel, lossless codec).
    */
  def encodeSolidPng(width: Int, height: Int, rgb: Int): Array[Byte] =
    encodePng(width, height, (_, _) => rgb)

  /** Deterministic in-memory JPEG encode (lossy) — for specs that prove the
    * decoder handles a second real codec, with tolerance on pixel stats.
    */
  def encodeJpeg(width: Int, height: Int, fill: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, fill(x, y) & 0xffffff); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }
}
