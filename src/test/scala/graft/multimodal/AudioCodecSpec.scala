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
