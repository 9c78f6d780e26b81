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
}
