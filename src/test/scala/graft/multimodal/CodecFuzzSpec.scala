package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Decoders run against a 100 TB untrusted corpus: they must be TOTAL —
  * any byte sequence decodes to Some(value) or None, never an exception
  * (a single throw inside mapPartitions kills the task and, after retries,
  * the job). Seeded mutation fuzzing: flip/truncate/extend valid payloads
  * and feed pure noise; every case must return without throwing.
  */
class CodecFuzzSpec extends AnyFunSuite {

  private def mutations(valid: Array[Byte], seed: Long): Iterator[Array[Byte]] = {
    val rnd = new scala.util.Random(seed)
    val flips = Iterator.tabulate(150) { _ =>
      val b = valid.clone()
      // corrupt 1-8 positions, biased toward the header
      (0 until 1 + rnd.nextInt(8)).foreach { _ =>
        val pos = if (rnd.nextBoolean() && b.length > 64) rnd.nextInt(64) else rnd.nextInt(b.length)
        b(pos) = rnd.nextInt(256).toByte
      }
      b
    }
    val truncs = Iterator.tabulate(40)(_ => valid.take(rnd.nextInt(valid.length)))
    val extended = Iterator.single(valid ++ Array.fill(33)(rnd.nextInt(256).toByte))
    val noise = Iterator.tabulate(40) { _ =>
      Array.fill(1 + rnd.nextInt(512))(rnd.nextInt(256).toByte)
    }
    flips ++ truncs ++ extended ++ noise
  }

  private def fuzz(name: String, valid: Array[Byte], decode: Array[Byte] => Any): Unit = {
    var n = 0
    mutations(valid, seed = 0xC0DEC + name.hashCode).foreach { payload =>
      try { decode(payload); n += 1 }
      catch { case e: Throwable =>
        fail(s"$name decoder threw on mutated payload #$n (len=${payload.length}): $e")
      }
    }
    assert(n > 200, s"fuzz corpus unexpectedly small: $n")
  }

  test("image decoder is total under mutation") {
    fuzz("png", ImageCodec.encodeSolidPng(32, 24, 0x336699), ImageCodec.decode)
    fuzz("jpeg", ImageCodec.encodeJpeg(32, 24, (_, _) => 0x336699), ImageCodec.decode)
  }

  test("audio decoder is total under mutation") {
    fuzz("wav", AudioCodec.encodeSquareWav(8000, 800, 2000, 5), AudioCodec.decode)
  }

  test("video decoder is total under mutation") {
    val avi = VideoCodec.encodeAviRgb(16, 12, 5,
      Array(0x102030, 0x405060).map(c => (_: Int, _: Int) => c))
    fuzz("avi", avi, VideoCodec.decode)
    // mjpeg container too: corrupt frames route through the imageio path
    val mj = VideoCodec.encodeAviMjpeg(16, 12, 5, Array((_: Int, _: Int) => 0x808080))
    fuzz("avi-mjpeg", mj, VideoCodec.decode)
  }

  // ---- perceptual plane (VERDICT r14 #7): the constellation / frame-hash
  // paths get the same totality hardening as the decoders — they run on
  // the identical untrusted bytes, one layer up.

  test("audio constellation hash is total under mutation and defined on pure-noise PCM") {
    fuzz("constellation", AudioCodec.encodeSquareWav(8000, 4000, 2000, 5),
      AudioCodec.constellationHash(_))
    // VALID container, noise samples: Goertzel must return a hash and be
    // deterministic — noise is what most of a 100 TB audio corpus is
    val rnd = new scala.util.Random(5150)
    (1 to 20).foreach { _ =>
      val samples = Array.fill(800 + rnd.nextInt(4000))(
        (rnd.nextInt(65536) - 32768).toShort)
      val wav = AudioCodec.encodeWavPcm16(8000, 1, samples)
      val a = AudioCodec.constellationHash(wav)
      assert(a.isDefined, "noise PCM must still fingerprint")
      assert(a == AudioCodec.constellationHash(wav), "must be deterministic")
    }
    // degenerate-but-valid edges: all-zero clip at exactly `segments`
    // frames hashes; one frame short returns None (the documented bound)
    assert(AudioCodec.constellationHash(
      AudioCodec.encodeWavPcm16(8000, 1, new Array[Short](8))).isDefined)
    assert(AudioCodec.constellationHash(
      AudioCodec.encodeWavPcm16(8000, 1, new Array[Short](7))).isEmpty)
    // stereo noise pools to mono without throwing
    assert(AudioCodec.constellationHash(AudioCodec.encodeWavPcm16(8000, 2,
      Array.fill(1600)((rnd.nextInt(65536) - 32768).toShort))).isDefined)
  }

  test("video frame dHashes are total under mutation and on hostile DIB dimensions") {
    val avi = VideoCodec.encodeAviRgb(16, 12, 5,
      Array(0x102030, 0x405060).map(c => (_: Int, _: Int) => c))
    fuzz("frame-dhash", avi, VideoCodec.frameDHashes(_))
    val mj = VideoCodec.encodeAviMjpeg(16, 12, 5, Array((_: Int, _: Int) => 0x808080))
    fuzz("frame-dhash-mjpeg", mj, VideoCodec.frameDHashes(_))
    // hostile-but-wellformed dims: below the 9×8 pooling grid (empty
    // cells), widths forcing odd 4-byte-aligned strides, single pixels —
    // must never throw and must be deterministic
    Seq((1, 1), (3, 2), (8, 7), (9, 8), (10, 9), (31, 3), (2, 64)).foreach {
      case (w, h) =>
        val v = VideoCodec.encodeAviRgb(w, h, 5,
          Array((x: Int, y: Int) => (x * 37 + y * 101) & 0xffffff))
        val r = try VideoCodec.frameDHashes(v) catch {
          case e: Throwable => fail(s"${w}x$h threw: $e")
        }
        assert(r.map(_.toSeq) == VideoCodec.frameDHashes(v).map(_.toSeq),
          s"${w}x$h not deterministic")
    }
  }
}
