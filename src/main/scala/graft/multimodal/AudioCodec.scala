package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFormat, AudioSystem, UnsupportedAudioFileException}

/** Real, pure-JVM audio decode for the multimodal plane — no native deps.
  *
  * `javax.sound.sampled` ships with the JDK and parses WAV, AU and AIFF
  * containers with PCM payloads; non-16-bit encodings are converted through
  * the JDK's format-conversion chain. That makes audio columns a REAL
  * capability — true sample rate, channel count, duration and signal
  * statistics — leaving only video behind the documented deterministic
  * fallback.
  *
  * Deterministic and side-effect free: decode results are stable across
  * retries/speculative tasks (exactly-once-sink safe).
  *
  * Reference anchor: none — beyond-reference north-star item (multimodal
  * columns for LLM training-data pipelines).
  */
object AudioCodec {

  /** Signal-derived facts about one decoded clip. `rms` and `peak` are in
    * raw 16-bit sample units (0..32767), channels pooled.
    */
  final case class DecodedAudio(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      nFrames: Long,
      durationMs: Double,
      rms: Double,
      peak: Double)

  /** Decode an audio payload; None when the bytes are not a supported
    * container/encoding. One payload decodes in one task (clips are
    * row-sized), composing with the Iterator→Iterator batch shape of
    * [[Multimodal]].
    */
  /** Hostile-header work bound: a corrupt container can DECLARE formats
    * that make the JDK conversion stream spin or expand without limit
    * (found by mutation fuzzing — a flipped WAV header byte pinned a core
    * inside readAllBytes indefinitely). An untrusted-corpus decoder bounds
    * the PCM it will materialize instead of trusting the header.
    */
  val MaxPcmBytes: Long = 64L << 20

  /** The shared hostile-input-bounded PCM16 extraction behind [[decode]]
    * and [[constellationHash]]: format guards, normalization to signed
    * 16-bit, and the bounded conversion read. None on anything
    * undecodable within the bounds.
    */
  private def pcm16(bytes: Array[Byte]): Option[(AudioFormat, Array[Byte])] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val raw = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val srcFmt = raw.getFormat
        // declared format is UNTRUSTED: reject non-finite/absurd rates and
        // channel counts before asking the JDK to convert them
        val rate0 = srcFmt.getSampleRate
        if (!java.lang.Float.isFinite(rate0) || rate0 < 1f || rate0 > 1e6f) return None
        if (srcFmt.getChannels < 1 || srcFmt.getChannels > 64) return None
        // normalize to signed 16-bit PCM so the sample math is uniform; the
        // JDK converts from PCM_U8/PCM_FLOAT/ULAW/ALAW where supported
        val want = new AudioFormat(
          srcFmt.getSampleRate, 16, srcFmt.getChannels, true, false)
        val pcm =
          if (srcFmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
              srcFmt.getSampleSizeInBits == 16) raw
          else AudioSystem.getAudioInputStream(want, raw)
        val fmt = pcm.getFormat
        // bounded read: cap at the plausible conversion expansion of the
        // actual payload (never the declared length), and treat a stream
        // that returns 0 bytes (hostile frame size) or overruns the cap as
        // undecodable
        val cap = math.min(MaxPcmBytes, bytes.length.toLong * 8 + 4096)
        val out = new java.io.ByteArrayOutputStream(math.min(cap, 1L << 16).toInt)
        val chunk = new Array[Byte](8192)
        var done = false
        var overrun = false
        while (!done && !overrun) {
          val r = pcm.read(chunk)
          if (r <= 0) done = true
          else { out.write(chunk, 0, r); if (out.size() > cap) overrun = true }
        }
        if (overrun) None else Some((fmt, out.toByteArray))
      } finally raw.close()
    } catch {
      case _: UnsupportedAudioFileException => None
      case _: Exception => None // truncated/corrupt payload
    }
  }

  def decode(bytes: Array[Byte]): Option[DecodedAudio] = {
    pcm16(bytes).flatMap { case (fmt, data) =>
        val bigEndian = fmt.isBigEndian
        val n = data.length / 2
        var i = 0
        var sumSq = 0.0
        var peak = 0L
        while (i < n) {
          val lo = data(2 * i + (if (bigEndian) 1 else 0)) & 0xff
          val hi = data(2 * i + (if (bigEndian) 0 else 1))
          val s = (hi << 8) | lo
          sumSq += s.toDouble * s
          val a = math.abs(s.toLong)
          if (a > peak) peak = a
          i += 1
        }
        val channels = fmt.getChannels
        val frames = if (channels > 0) n.toLong / channels else 0L
        if (frames == 0) None
        else {
          val rate = fmt.getSampleRate.toDouble
          Some(DecodedAudio(
            sampleRate = fmt.getSampleRate.toInt,
            channels = channels,
            bitsPerSample = 16,
            nFrames = frames,
            durationMs = frames * 1000.0 / rate,
            rms = math.sqrt(sumSq / n),
            peak = peak.toDouble))
        }
    }
  }

  /** Perceptual 64-bit audio signature — the audio member of the
    * near-dup plane (the q140 image dHash's sibling): the clip is cut
    * into `segments` equal time windows, each window's DOMINANT frequency
    * band (Goertzel power at `bandHz`, `2·bandHz`, …, `bands·bandHz` —
    * absolute Hz, so the signature survives a sample-rate change) sets
    * one bit at `t·bands + argmax`. One-hot per window means a k-window
    * edit moves Hamming distance by exactly 2k, and the comparison is
    * AMPLITUDE-invariant by construction (argmax of power ratios), so
    * volume-normalized re-encodes and resampled copies collide while
    * different tone sequences sit ≥ 2·(differing windows) apart —
    * band-joinable by the signature-generic
    * [[graft.functions.DedupFunctions.nearDupBits]] pigeonhole, never
    * all-pairs. Defaults 8×8 fill the 64 bits; `bands·bandHz` must stay
    * below the lowest Nyquist rate in the corpus (the 400 Hz default
    * keeps band 8 at 3200 Hz, valid down to 8 kHz clips). None on
    * undecodable payloads or clips shorter than `segments` frames.
    */
  def constellationHash(
      bytes: Array[Byte], segments: Int = 8, bands: Int = 8,
      bandHz: Int = 400): Option[Long] = {
    require(segments * bands <= 64, s"$segments x $bands exceeds 64 bits")
    pcm16(bytes).flatMap { case (fmt, data) =>
      val channels = fmt.getChannels
      val bigEndian = fmt.isBigEndian
      val n = data.length / 2
      val frames = if (channels > 0) n / channels else 0
      if (frames < segments) None
      else {
        val rate = fmt.getSampleRate.toDouble
        // channel-pooled mono: the fingerprint describes the mix
        val mono = new Array[Double](frames)
        var i = 0
        while (i < frames) {
          var c = 0
          var acc = 0.0
          while (c < channels) {
            val k = i * channels + c
            val lo = data(2 * k + (if (bigEndian) 1 else 0)) & 0xff
            val hi = data(2 * k + (if (bigEndian) 0 else 1))
            acc += ((hi << 8) | lo).toDouble
            c += 1
          }
          mono(i) = acc / channels
          i += 1
        }
        var bits = 0L
        var t = 0
        while (t < segments) {
          val lo = t * frames / segments
          val hi = (t + 1) * frames / segments
          var best = 0
          var bestP = -1.0
          var b = 0
          while (b < bands) {
            val f = bandHz.toDouble * (b + 1)
            // Goertzel power at f over mono[lo, hi)
            val w = 2.0 * math.Pi * f / rate
            val coeff = 2.0 * math.cos(w)
            var s1 = 0.0
            var s2 = 0.0
            var j = lo
            while (j < hi) {
              val s0 = mono(j) + coeff * s1 - s2
              s2 = s1; s1 = s0
              j += 1
            }
            val p = s1 * s1 + s2 * s2 - coeff * s1 * s2
            if (p > bestP) { bestP = p; best = b }
            b += 1
          }
          bits |= 1L << (t * bands + best)
          t += 1
        }
        Some(bits)
      }
    }
  }

  /** Deterministic in-memory WAV encode (RIFF + 16-bit signed LE PCM),
    * hand-rolled so fixtures have zero dependence on writer quirks —
    * fixture generator for specs and oracle queries (synthetic payloads
    * whose signal statistics are closed-form functions of the row id).
    */
  def encodeWavPcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, s"bad format $sampleRate Hz x$channels")
    require(samples.length % channels == 0, "sample count must be a multiple of channels")
    val dataLen = samples.length * 2
    val out = new ByteArrayOutputStream(44 + dataLen)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    out.write("RIFF".getBytes("US-ASCII")); le32(36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); le32(16)
    le16(1) // PCM
    le16(channels)
    le32(sampleRate)
    le32(sampleRate * channels * 2) // byte rate
    le16(channels * 2)              // block align
    le16(16)                        // bits per sample
    out.write("data".getBytes("US-ASCII")); le32(dataLen)
    samples.foreach(s => le16(s & 0xffff))
    out.toByteArray
  }

  /** Mono square wave: every sample is exactly ±amplitude, so RMS == peak
    * == amplitude — decoded statistics are exactly predictable.
    */
  def encodeSquareWav(sampleRate: Int, nSamples: Int, amplitude: Short,
      halfPeriod: Int): Array[Byte] = {
    require(halfPeriod > 0, "halfPeriod must be positive")
    val samples = Array.tabulate(nSamples) { i =>
      if ((i / halfPeriod) % 2 == 0) amplitude else (-amplitude).toShort
    }
    encodeWavPcm16(sampleRate, 1, samples)
  }
}
