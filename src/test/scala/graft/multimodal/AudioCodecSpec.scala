package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The audio decode must be REAL (true PCM through javax.sound.sampled),
  * the fallback deterministic, and the pipeline map-side only.
  */
class AudioCodecSpec extends SparkSpec {
  import spark.implicits._

  test("WAV square-wave round-trip: exact format, frame count, rms == peak == amplitude") {
    val wav = AudioCodec.encodeSquareWav(8000, nSamples = 1600, amplitude = 2500, halfPeriod = 5)
    val d = AudioCodec.decode(wav).get
    assert(d.sampleRate == 8000 && d.channels == 1 && d.bitsPerSample == 16)
    assert(d.nFrames == 1600)
    assert(d.durationMs == 200.0)
    assert(d.rms == 2500.0 && d.peak == 2500.0, s"(${d.rms}, ${d.peak})")
  }

  test("sine wave: rms tracks amplitude/sqrt(2), peak tracks amplitude") {
    val a = 10000.0
    val samples = Array.tabulate(8000)(i => (a * math.sin(2 * math.Pi * i * 440 / 8000)).toShort)
    val d = AudioCodec.decode(AudioCodec.encodeWavPcm16(8000, 1, samples)).get
    assert(math.abs(d.rms - a / math.sqrt(2)) < a * 0.01, d.rms.toString)
    assert(math.abs(d.peak - a) < a * 0.01, d.peak.toString)
    assert(d.nFrames == 8000 && math.abs(d.durationMs - 1000.0) < 1e-9)
  }

  test("stereo: channels reported, frames are per-channel, stats pool both channels") {
    // L = +3000 constant, R = -3000 constant: rms == peak == 3000 pooled
    val interleaved = Array.tabulate(2000)(i => if (i % 2 == 0) 3000.toShort else (-3000).toShort)
    val d = AudioCodec.decode(AudioCodec.encodeWavPcm16(16000, 2, interleaved)).get
    assert(d.channels == 2 && d.nFrames == 1000)
    assert(d.rms == 3000.0 && d.peak == 3000.0)
    assert(math.abs(d.durationMs - 62.5) < 1e-9)
  }

  test("AIFF (big-endian container): same stats as the WAV of the same signal") {
    // write an AIFF through the JDK from a known PCM signal — exercises the
    // big-endian sample-parsing branch, which WAV never touches
    val samples = Array.tabulate(1200)(i => if ((i / 6) % 2 == 0) 2200 else -2200).map(_.toShort)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true) // big-endian
    val bytes = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      bytes(2 * i) = (s >> 8).toByte; bytes(2 * i + 1) = (s & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, out)
    val d = AudioCodec.decode(out.toByteArray).get
    assert(d.sampleRate == 8000 && d.channels == 1 && d.nFrames == 1200)
    assert(d.rms == 2200.0 && d.peak == 2200.0, s"(${d.rms}, ${d.peak})")
  }

  test("repartitionForDecode: task count follows the byte budget, not the row count") {
    val items = (1L to 100L).map(i =>
      Multimodal.MediaItem(i, "image", Array.fill(8)(i.toByte), "s", 10L * 1024 * 1024)).toDS()
    val total = 100L * 10 * 1024 * 1024 // 1000 MB
    val parts = Multimodal.repartitionForDecode(items, total,
      targetBytesPerTask = 256L * 1024 * 1024).rdd.getNumPartitions
    assert(parts == 3, s"1000MB / 256MB budget should give 3 tasks, got $parts")
    // tiny corpus: never fewer than one task
    val one = Multimodal.repartitionForDecode(items, 1024L).rdd.getNumPartitions
    assert(one == 1, s"tiny corpus should collapse to 1 task, got $one")
  }

  test("constellationHash: volume- and sample-rate-invariant, one-window edit moves hamming by 2") {
    def clip(rate: Int, amp: Int, bandsSeq: Seq[Int]): Array[Byte] = {
      val segLen = rate / 5
      val samples = Array.tabulate(bandsSeq.length * segLen) { i =>
        val b = bandsSeq(i / segLen)
        math.round(amp * math.sin(2 * math.Pi * 400.0 * b * i / rate)).toShort
      }
      AudioCodec.encodeWavPcm16(rate, 1, samples)
    }
    val tones = Seq(3, 1, 6, 2, 5, 4, 1, 3)
    val base = AudioCodec.constellationHash(clip(16000, 8000, tones)).get
    // closed form: bit t*8 + (b-1) per window
    val expect = tones.zipWithIndex.map { case (b, t) => 1L << (t * 8 + b - 1) }.reduce(_ | _)
    assert(base == expect, f"hash must be the closed-form band table: $base%x vs $expect%x")
    // resampled + quiet copy: identical (absolute-Hz bands, argmax of ratios)
    assert(AudioCodec.constellationHash(clip(8000, 2500, tones)).contains(base))
    // one window's tone moved: exactly 2 bits differ (one-hot windows)
    val edited = AudioCodec.constellationHash(clip(16000, 8000, tones.init :+ 4)).get
    assert(java.lang.Long.bitCount(base ^ edited) == 2)
    // a different sequence sits far outside the radius
    val other = AudioCodec.constellationHash(clip(16000, 8000, Seq(6, 4, 2, 5, 1, 6, 3, 2))).get
    assert(java.lang.Long.bitCount(base ^ other) > 3)
    // stereo pools channels: same tones on both channels hash identically
    val segLen = 16000 / 5
    val st = Array.tabulate(tones.length * segLen * 2) { k =>
      val i = k / 2
      val b = tones(i / segLen)
      math.round(8000 * math.sin(2 * math.Pi * 400.0 * b * i / 16000)).toShort
    }
    assert(AudioCodec.constellationHash(AudioCodec.encodeWavPcm16(16000, 2, st)).contains(base))
    // undecodable / too-short payloads: None, never a throw
    assert(AudioCodec.constellationHash("not audio".getBytes).isEmpty)
    assert(AudioCodec.constellationHash(
      AudioCodec.encodeWavPcm16(8000, 1, Array[Short](1, 2, 3))).isEmpty)
  }

  test("non-audio and truncated bytes decode to None, never throw") {
    assert(AudioCodec.decode("not audio".getBytes("UTF-8")).isEmpty)
    assert(AudioCodec.decode(Array.empty[Byte]).isEmpty)
    assert(AudioCodec.decode(null).isEmpty)
    val wav = AudioCodec.encodeSquareWav(8000, 800, 1000, 4)
    assert(AudioCodec.decode(wav.take(30)).isEmpty) // cut inside the header
    // a PNG is not audio either
    assert(AudioCodec.decode(ImageCodec.encodeSolidPng(8, 8, 0)).isEmpty)
  }

  test("Spark pipeline: real decode flagged, fallback deterministic, no shuffle") {
    val items = Seq(
      Multimodal.MediaItem(1L, "audio", AudioCodec.encodeSquareWav(8000, 800, 1500, 4), "s", 0L),
      Multimodal.MediaItem(2L, "audio", "garbage".getBytes("UTF-8"), "s", 7L)).toDS()
    val out = Multimodal.withAudioFeatures(items).collect().sortBy(_.media_id)
    assert(out(0).decoded && out(0).sample_rate == 8000 && out(0).rms == 1500.0)
    assert(!out(1).decoded && out(1).sample_rate == 0 && out(1).checksum.nonEmpty)
    val again = Multimodal.withAudioFeatures(items).collect().sortBy(_.media_id)
    assert(out.sameElements(again), "decode must be deterministic across runs")
    val plan = Multimodal.withAudioFeatures(items).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"audio decode introduced a shuffle:\n$plan")
  }
}
