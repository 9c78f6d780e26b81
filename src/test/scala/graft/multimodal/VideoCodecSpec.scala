package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The video decode must be REAL — a generic RIFF/AVI chunk walk plus true
  * pixel decode of raw-DIB and MJPEG frames — with deterministic fallback
  * and a map-side-only pipeline.
  */
class VideoCodecSpec extends SparkSpec {
  import spark.implicits._

  test("raw-DIB AVI round-trip: exact container facts and pixel means") {
    // 3 solid frames: gray 10, 20, 30 — lossless, everything exact
    val frames = Array(10, 20, 30).map(g => (_: Int, _: Int) => (g << 16) | (g << 8) | g)
    val avi = VideoCodec.encodeAviRgb(21, 13, fps = 5, frames)
    val d = VideoCodec.decode(avi).get
    assert(d.width == 21 && d.height == 13 && d.nFrames == 3)
    assert(d.fps == 5.0 && d.durationMs == 600.0)
    assert(d.meanR == 20.0 && d.meanG == 20.0 && d.meanB == 20.0)
    assert(d.frameLuma.length == 3)
    assert(math.abs(d.frameLuma(0) - 10.0) < 1e-9 && math.abs(d.frameLuma(2) - 30.0) < 1e-9)
    // unpadded width (21*3 = 63 -> padded 64) decoded correctly is the
    // 4-byte-row-alignment proof
  }

  test("per-channel means and bottom-up row order decode correctly") {
    // top half red, bottom half blue: means prove BGR order + orientation
    val avi = VideoCodec.encodeAviRgb(8, 8, 4,
      Array((_: Int, y: Int) => if (y < 4) 0xff0000 else 0x0000ff))
    val d = VideoCodec.decode(avi).get
    assert(d.meanR == 127.5 && d.meanG == 0.0 && d.meanB == 127.5, s"(${d.meanR},${d.meanG},${d.meanB})")
  }

  test("luma variance separates static clips from scene changes") {
    val static = VideoCodec.decode(VideoCodec.encodeAviRgb(8, 8, 4,
      Array.fill(4)((_: Int, _: Int) => 0x505050))).get
    val cuts = VideoCodec.decode(VideoCodec.encodeAviRgb(8, 8, 4,
      Array(0x000000, 0xffffff, 0x000000, 0xffffff).map(c => (_: Int, _: Int) => c))).get
    assert(VideoCodec.lumaVariance(static) == 0.0)
    assert(VideoCodec.lumaVariance(cuts) > 10000.0)
  }

  test("MJPEG AVI: frames decode through the compressed path within lossy tolerance") {
    val avi = VideoCodec.encodeAviMjpeg(32, 24, 10,
      Array.fill(3)((_: Int, _: Int) => 0x808080))
    val d = VideoCodec.decode(avi).get
    assert(d.width == 32 && d.height == 24 && d.nFrames == 3 && d.fps == 10.0)
    assert(math.abs(d.meanR - 0x80) < 8 && math.abs(d.meanG - 0x80) < 8, s"(${d.meanR},${d.meanG})")
  }

  test("non-video, truncated, and frameless payloads decode to None, never throw") {
    assert(VideoCodec.decode("not a video".getBytes("UTF-8")).isEmpty)
    assert(VideoCodec.decode(Array.empty[Byte]).isEmpty)
    assert(VideoCodec.decode(null).isEmpty)
    // a WAV is RIFF but not AVI
    assert(VideoCodec.decode(AudioCodec.encodeSquareWav(8000, 80, 100, 4)).isEmpty)
    val avi = VideoCodec.encodeAviRgb(8, 8, 4, Array((_: Int, _: Int) => 0))
    assert(VideoCodec.decode(avi.take(40)).isEmpty) // cut inside hdrl
  }

  test("Spark pipeline: real decode flagged, fallback deterministic, no shuffle") {
    val items = Seq(
      Multimodal.MediaItem(1L, "video",
        VideoCodec.encodeAviRgb(8, 8, 4, Array((_: Int, _: Int) => 0x102030)), "s", 0L),
      Multimodal.MediaItem(2L, "video", "garbage".getBytes("UTF-8"), "s", 7L)).toDS()
    val out = Multimodal.withVideoFeatures(items).collect().sortBy(_.media_id)
    assert(out(0).decoded && out(0).n_frames == 1 && out(0).mean_b == 0x30)
    assert(!out(1).decoded && out(1).width == 0 && out(1).checksum.nonEmpty)
    val again = Multimodal.withVideoFeatures(items).collect().sortBy(_.media_id)
    assert(out.sameElements(again), "decode must be deterministic across runs")
    val plan = Multimodal.withVideoFeatures(items).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"video decode introduced a shuffle:\n$plan")
  }

  test("frameDHashes: DIB and MJPEG paths agree bit-for-bit on margin grids; an edit moves one frame") {
    // the q140/q150 cell construction: 25-level horizontal margins make
    // the dHash the exact comparison table under JPEG loss and the +8 shift
    def fills(grids: Array[Array[Int]], bright: Int): Array[(Int, Int) => Int] =
      grids.map { cs => (x: Int, y: Int) =>
        val v = ((cs(y * 8 / 64) * (x * 9 / 72 + 1)) % 7) * 25 + bright
        (v << 16) | (v << 8) | v
      }
    val g0 = Array.tabulate(4, 8)((f, j) => (f * 3 + j * 5) % 6 + 1)
    val rgb = VideoCodec.frameDHashes(
      VideoCodec.encodeAviRgb(72, 64, 5, fills(g0, 0))).get
    val mjpeg = VideoCodec.frameDHashes(
      VideoCodec.encodeAviMjpeg(72, 64, 5, fills(g0, 8))).get
    assert(rgb.length == 4 && mjpeg.length == 4)
    assert(rgb.toSeq == mjpeg.toSeq,
      "DIB and imageio dHash paths must agree on margin-guarded grids")
    // replace the last frame's grid: exactly that frame's hash moves
    val g1 = g0.clone(); g1(3) = g0(3).map(c => c % 6 + 1)
    val edited = VideoCodec.frameDHashes(
      VideoCodec.encodeAviRgb(72, 64, 5, fills(g1, 0))).get
    assert(edited.take(3).toSeq == rgb.take(3).toSeq && edited(3) != rgb(3))
    // hostile inputs: None, never a throw
    assert(VideoCodec.frameDHashes("not a video".getBytes).isEmpty)
    assert(VideoCodec.frameDHashes(Array[Byte](1, 2, 3)).isEmpty)
  }
}
