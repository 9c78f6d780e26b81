package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Real, pure-JVM video decode for the multimodal plane — no native deps.
  *
  * AVI is RIFF: a documented, chunk-structured container ('RIFF…AVI ',
  * 'LIST hdrl' with 'avih'/'strh'/'strf' headers, 'LIST movi' with one
  * chunk per frame). This codec walks the chunk tree generically and
  * decodes two frame encodings:
  *
  *  - `..db` uncompressed DIB frames (BI_RGB bottom-up BGR rows, 4-byte row
  *    padding) — decoded directly, losslessly;
  *  - `..dc` compressed frames — handed to `javax.imageio` (covers MJPEG,
  *    whose frames are baseline JPEGs).
  *
  * Timing comes from the stream header's rate/scale rational (falling back
  * to avih's µs-per-frame), so fps and duration are container facts, not
  * guesses. Per-frame mean luma gives a temporal-activity signal
  * (`lumaVariance`) — the scene-change feature a training-data pipeline
  * filters on.
  *
  * Deterministic and side-effect free (retry/speculation safe).
  *
  * Reference anchor: none — beyond-reference north-star item (multimodal
  * columns). Format facts are public: MSDN AVI RIFF reference / OpenDML.
  */
object VideoCodec {

  final case class DecodedVideo(
      width: Int,
      height: Int,
      nFrames: Int,
      fps: Double,
      durationMs: Double,
      meanR: Double,            // over all pixels of all decoded frames
      meanG: Double,
      meanB: Double,
      frameLuma: Array[Double]) // per-frame mean luma in [0,255]

  /** Mean luma variance across frames — 0 for a static clip, large for
    * scene changes; the cheap temporal-activity score.
    */
  def lumaVariance(d: DecodedVideo): Double = {
    val n = d.frameLuma.length
    if (n == 0) 0.0
    else {
      val m = d.frameLuma.sum / n
      d.frameLuma.map(x => (x - m) * (x - m)).sum / n
    }
  }

  // ---- decode ----

  private final case class StreamFormat(
      width: Int, height: Int, bitCount: Int, compression: Int)

  /** The shared RIFF walk behind [[decode]] and [[frameDHashes]]:
    * (µs-per-frame, rate, scale, stream format, frame chunks). Iterative
    * with an explicit range stack — see the hostile-nesting note below.
    */
  private def walkAvi(bytes: Array[Byte]): Option[
      (Long, Long, Long, Option[StreamFormat], Seq[(String, Int, Int)])] = {
    if (bytes == null || bytes.length < 12) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (fourCC(buf, 0) != "RIFF" || fourCC(buf, 8) != "AVI ") return None

    var usPerFrame = 0L
    var rate = 0L; var scale = 0L
    var fmt: Option[StreamFormat] = None
    val frames = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)] // (id, off, len)

    // Generic chunk walk. ITERATIVE with an explicit range stack: the
    // obvious recursive walk has depth linear in the number of nested
    // LIST chunks, so a hostile payload of 8-byte LISTs could drive a
    // StackOverflowError past the Exception handler in the callers and
    // kill the task — the decoder must be total on untrusted bytes.
    // On LIST we push the continuation range, then the child, so the
    // child is processed next — identical traversal (and frame) order
    // to the recursive walk, bounded heap instead of unbounded stack.
    val ranges = scala.collection.mutable.Stack[(Int, Int)]((12, bytes.length))
    while (ranges.nonEmpty) {
      var (p, end) = ranges.pop()
      var ok = true
      while (ok && p + 8 <= end) {
        val id = fourCC(buf, p)
        val len = buf.getInt(p + 4)
        if (len < 0 || p + 8 + len > end) ok = false // malformed: stop this range cleanly
        else {
          id match {
            case "LIST" =>
              ranges.push((p + 8 + len + (len & 1), end)) // resume after this LIST
              ranges.push((p + 12, p + 8 + len))          // child first (skip 4-byte list type)
              ok = false                                  // descend now
            case "avih" =>
              if (len >= 4) usPerFrame = buf.getInt(p + 8).toLong & 0xffffffffL
            case "strh" =>
              if (len >= 32 && fourCC(buf, p + 8) == "vids") {
                scale = buf.getInt(p + 8 + 20).toLong & 0xffffffffL
                rate = buf.getInt(p + 8 + 24).toLong & 0xffffffffL
              }
            case "strf" =>
              if (len >= 40 && fmt.isEmpty)
                fmt = Some(StreamFormat(
                  width = buf.getInt(p + 8 + 4),
                  height = buf.getInt(p + 8 + 8),
                  bitCount = buf.getShort(p + 8 + 14).toInt & 0xffff,
                  compression = buf.getInt(p + 8 + 16)))
            case fid if fid.length == 4 && (fid.endsWith("db") || fid.endsWith("dc")) =>
              if (len > 0) frames += ((fid, p + 8, len))
            case _ => () // idx1, JUNK, unknown chunks: skipped
          }
          p += 8 + len + (len & 1) // chunks are word-aligned
        }
      }
    }
    Some((usPerFrame, rate, scale, fmt, frames.toSeq))
  }

  def decode(bytes: Array[Byte]): Option[DecodedVideo] = {
    try {
      val (usPerFrame, rate, scale, fmt, frames) = walkAvi(bytes).getOrElse(return None)
      val f = fmt.getOrElse(return None)
      if (frames.isEmpty) return None

      var sr = 0.0; var sg = 0.0; var sb = 0.0
      var nPix = 0L
      val luma = scala.collection.mutable.ArrayBuffer.empty[Double]
      var w = f.width; var h = math.abs(f.height)
      frames.foreach { case (id, off, len) =>
        val stats =
          if (id.endsWith("db")) decodeDib(bytes, off, len, f)
          else decodeCompressed(bytes, off, len)
        stats.foreach { case (fw, fh, r, g, b, l) =>
          w = fw; h = fh
          sr += r; sg += g; sb += b
          nPix += fw.toLong * fh
          luma += l / (fw.toLong * fh)
        }
      }
      if (luma.isEmpty || nPix == 0) return None

      val fps =
        if (rate > 0 && scale > 0) rate.toDouble / scale
        else if (usPerFrame > 0) 1e6 / usPerFrame
        else return None
      Some(DecodedVideo(
        width = w, height = h, nFrames = luma.length,
        fps = fps, durationMs = luma.length * 1000.0 / fps,
        meanR = sr / nPix, meanG = sg / nPix, meanB = sb / nPix,
        frameLuma = luma.toArray))
    } catch { case _: Exception => None } // truncated/corrupt payload
  }

  /** Per-frame perceptual dHashes — the video member of the near-dup
    * plane (q140's image dHash applied along time, q150): every decodable
    * frame yields the same 9×8 pooled-luma difference hash
    * [[ImageCodec.dHash]] computes, so an MJPEG re-encode of an RGB clip
    * produces bit-identical frame hashes under the q140 margin
    * construction, and frame-level matches band-join via
    * [[graft.functions.DedupFunctions.nearDupBits]] — never all-pairs.
    * `..dc` frames reuse the imageio dHash directly; `..db` DIB frames
    * hash in place (bottom-up rows mapped to top-down grid cells, the
    * integer-exact cell compare of the image path). Undecodable frames
    * are skipped; None when nothing decodes.
    */
  def frameDHashes(bytes: Array[Byte]): Option[Array[Long]] = {
    try {
      val (_, _, _, fmt, frames) = walkAvi(bytes).getOrElse(return None)
      val f = fmt.getOrElse(return None)
      if (frames.isEmpty) return None
      val hashes = frames.flatMap { case (id, off, len) =>
        if (id.endsWith("db")) dibDHash(bytes, off, len, f)
        else ImageCodec.dHash(java.util.Arrays.copyOfRange(bytes, off, off + len))
      }
      if (hashes.isEmpty) None else Some(hashes.toArray)
    } catch { case _: Exception => None }
  }

  /** dHash of one uncompressed BI_RGB frame, identical in contract to
    * [[ImageCodec.dHash]]: integer pooled-luma cell sums over the 9×8
    * grid (file rows are BOTTOM-UP — mapped to top-down y so the grid
    * orientation matches the imageio path), equal-count direct compare
    * with the BigInt cross-multiplication cold path.
    */
  private def dibDHash(bytes: Array[Byte], off: Int, len: Int,
      f: StreamFormat): Option[Long] = {
    if (f.compression != 0 || f.bitCount != 24) return None
    val w = f.width; val h = math.abs(f.height)
    if (w <= 0 || h <= 0 || w.toLong * h > ImageCodec.MaxPixels) return None
    val rowBytesL = (w.toLong * 3 + 3) & ~3L
    if (len.toLong < rowBytesL * h) return None
    val rowBytes = rowBytesL.toInt
    val HashW = ImageCodec.HashW; val HashH = ImageCodec.HashH
    val sums = new Array[Long](HashW * HashH)
    val counts = new Array[Long](HashW * HashH)
    var row = 0
    while (row < h) {
      val y = h - 1 - row // bottom-up storage
      val ty = y * HashH / h
      val base = off + row * rowBytes
      var x = 0
      while (x < w) {
        val b = bytes(base + 3 * x) & 0xff
        val g = bytes(base + 3 * x + 1) & 0xff
        val r = bytes(base + 3 * x + 2) & 0xff
        val cell = ty * HashW + x * HashW / w
        sums(cell) += 299L * r + 587L * g + 114L * b
        counts(cell) += 1
        x += 1
      }
      row += 1
    }
    var bits = 0L
    var j = 0
    while (j < HashH) {
      var i = 0
      while (i < HashW - 1) {
        val l = j * HashW + i
        val r = l + 1
        val brighter =
          if (counts(l) == counts(r)) sums(r) > sums(l)
          else BigInt(sums(r)) * counts(l) > BigInt(sums(l)) * counts(r)
        if (brighter) bits |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    Some(bits)
  }

  /** Uncompressed BI_RGB 24-bit DIB: bottom-up BGR rows, 4-byte-aligned.
    * Returns (w, h, sumR, sumG, sumB, sumLuma) or None on a frame this
    * decoder does not handle (other bit depths / RLE).
    */
  private def decodeDib(bytes: Array[Byte], off: Int, len: Int,
      f: StreamFormat): Option[(Int, Int, Double, Double, Double, Double)] = {
    if (f.compression != 0 || f.bitCount != 24) return None
    val w = f.width; val h = math.abs(f.height)
    // header dims are UNTRUSTED: long math (Int rowBytes*h overflows at
    // hostile widths and would bypass the length check) + pixel budget
    if (w <= 0 || h <= 0 || w.toLong * h > ImageCodec.MaxPixels) return None
    val rowBytesL = (w.toLong * 3 + 3) & ~3L
    if (len.toLong < rowBytesL * h) return None
    val rowBytes = rowBytesL.toInt
    var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0
    var row = 0
    while (row < h) {
      var x = 0
      val base = off + row * rowBytes
      while (x < w) {
        val b = bytes(base + 3 * x) & 0xff
        val g = bytes(base + 3 * x + 1) & 0xff
        val r = bytes(base + 3 * x + 2) & 0xff
        sr += r; sg += g; sb += b
        sl += 0.299 * r + 0.587 * g + 0.114 * b
        x += 1
      }
      row += 1
    }
    Some((w, h, sr, sg, sb, sl))
  }

  /** Compressed frame (MJPEG et al.): the chunk payload is a standalone
    * image — reuse the imageio path.
    */
  private def decodeCompressed(bytes: Array[Byte], off: Int,
      len: Int): Option[(Int, Int, Double, Double, Double, Double)] = {
    val payload = java.util.Arrays.copyOfRange(bytes, off, off + len)
    ImageCodec.decode(payload).map { d =>
      val n = d.width.toLong * d.height
      val luma = 0.299 * d.meanR + 0.587 * d.meanG + 0.114 * d.meanB
      (d.width, d.height, d.meanR * n, d.meanG * n, d.meanB * n, luma * n)
    }
  }

  private def fourCC(buf: ByteBuffer, off: Int): String = {
    if (off + 4 > buf.limit()) return ""
    new String(Array(buf.get(off), buf.get(off + 1), buf.get(off + 2), buf.get(off + 3)),
      "US-ASCII")
  }

  // ---- encode (fixture generator) ----

  /** Deterministic in-memory AVI encode: one 'vids' stream of uncompressed
    * 24-bit BI_RGB DIB frames. `frame(i)(x, y)` returns the 0xRRGGBB pixel.
    * Lossless, so decoded pixel statistics are exactly predictable —
    * fixture generator for specs and oracle queries.
    */
  def encodeAviRgb(width: Int, height: Int, fps: Int,
      frames: Array[(Int, Int) => Int]): Array[Byte] = {
    val rowBytes = (width * 3 + 3) & ~3
    val bodies = frames.map { fill =>
      val body = new Array[Byte](rowBytes * height)
      var row = 0
      while (row < height) {
        val y = height - 1 - row // bottom-up storage
        var x = 0
        while (x < width) {
          val rgb = fill(x, y)
          body(row * rowBytes + 3 * x) = (rgb & 0xff).toByte // B
          body(row * rowBytes + 3 * x + 1) = ((rgb >> 8) & 0xff).toByte
          body(row * rowBytes + 3 * x + 2) = ((rgb >> 16) & 0xff).toByte
          x += 1
        }
        row += 1
      }
      body
    }
    buildAvi(width, height, fps, bodies, frameId = "00db", compression = 0)
  }

  /** MJPEG variant: each frame is a standalone baseline JPEG in a '00dc'
    * chunk — the compressed-frame decode path (lossy; spec-checked with
    * tolerance, not oracle-hashed).
    */
  def encodeAviMjpeg(width: Int, height: Int, fps: Int,
      frames: Array[(Int, Int) => Int]): Array[Byte] = {
    val bodies = frames.map(fill => ImageCodec.encodeJpeg(width, height, fill))
    // biCompression 'MJPG' little-endian fourcc
    val mjpg = 'M'.toInt | ('J'.toInt << 8) | ('P'.toInt << 16) | ('G'.toInt << 24)
    buildAvi(width, height, fps, bodies, frameId = "00dc", compression = mjpg)
  }

  private def buildAvi(width: Int, height: Int, fps: Int,
      frameBodies: Array[Array[Byte]], frameId: String, compression: Int): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && frameBodies.nonEmpty, "bad AVI parameters")
    val frames = frameBodies
    val frameBytes = frameBodies.map(_.length).max

    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream(8 + body.length + 1)
      out.write(id.getBytes("US-ASCII")); writeLe32(out, body.length)
      out.write(body)
      if (body.length % 2 == 1) out.write(0) // word alignment
      out.toByteArray
    }
    def list(listType: String, children: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream(12 + children.length)
      out.write("LIST".getBytes("US-ASCII")); writeLe32(out, 4 + children.length)
      out.write(listType.getBytes("US-ASCII")); out.write(children)
      out.toByteArray
    }

    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(1000000 / fps)        // dwMicroSecPerFrame
    avih.putInt(frameBytes * fps)     // dwMaxBytesPerSec
    avih.putInt(0)                    // dwPaddingGranularity
    avih.putInt(0x10)                 // dwFlags: AVIF_HASINDEX off, interleaved off
    avih.putInt(frames.length)        // dwTotalFrames
    avih.putInt(0); avih.putInt(1)    // dwInitialFrames, dwStreams
    avih.putInt(frameBytes)           // dwSuggestedBufferSize
    avih.putInt(width); avih.putInt(height)
    avih.putInt(0); avih.putInt(0); avih.putInt(0); avih.putInt(0)

    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes("US-ASCII"))
    strh.put("DIB ".getBytes("US-ASCII"))
    strh.putInt(0); strh.putInt(0)    // dwFlags, wPriority+wLanguage
    strh.putInt(0)                    // dwInitialFrames
    strh.putInt(1)                    // dwScale
    strh.putInt(fps)                  // dwRate  (fps = rate/scale)
    strh.putInt(0)                    // dwStart
    strh.putInt(frames.length)        // dwLength
    strh.putInt(frameBytes)           // dwSuggestedBufferSize
    strh.putInt(-1)                   // dwQuality
    strh.putInt(0)                    // dwSampleSize
    strh.putLong(0L)                  // rcFrame

    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40)                   // biSize
    strf.putInt(width)
    strf.putInt(height)               // positive: bottom-up
    strf.putShort(1)                  // biPlanes
    strf.putShort(24)                 // biBitCount
    strf.putInt(compression)          // 0 = BI_RGB, or a codec fourcc
    strf.putInt(frameBytes)           // biSizeImage
    strf.putInt(0); strf.putInt(0); strf.putInt(0); strf.putInt(0)

    val hdrl = list("hdrl", chunk("avih", avih.array()) ++
      list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array())))

    val movi = {
      val children = new ByteArrayOutputStream()
      frames.foreach(body => children.write(chunk(frameId, body)))
      list("movi", children.toByteArray)
    }

    val riffBody = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = new ByteArrayOutputStream(8 + riffBody.length)
    out.write("RIFF".getBytes("US-ASCII")); writeLe32(out, riffBody.length)
    out.write(riffBody)
    out.toByteArray
  }

  private def writeLe32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }
}
