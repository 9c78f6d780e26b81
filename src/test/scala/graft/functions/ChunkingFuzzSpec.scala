package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded randomized equivalence for sliding-window chunking: on random
  * corpora (mixed token counts incl. empty and single-token docs, runs of
  * whitespace) and random (chunkTokens, overlapTokens), the operator must
  * equal a driver-side reference (plain Scala, no Spark) implementing the
  * documented semantics: windows at every stride multiple below the token
  * count, last chunk short, whitespace normalized to single spaces.
  */
class ChunkingFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def reference(
      docs: Seq[(Long, String)], chunk: Int, overlap: Int): Set[(Long, Long, String, Long)] = {
    val stride = chunk - overlap
    (for {
      (id, text) <- docs
      toks = text.split("\\s+").filter(_.nonEmpty).toSeq
      if toks.nonEmpty
      // starts stop at the last window contributing a new token: a window
      // fully inside the previous one is suppressed by design
      (st, k) <- (0 until math.max(toks.size - overlap, 1) by stride).zipWithIndex
    } yield {
      val slice = toks.slice(st, st + chunk)
      (id, k.toLong, slice.mkString(" "), slice.size.toLong)
    }).toSet
  }

  test("randomized corpora x (chunkTokens, overlapTokens) == driver-side reference") {
    val rnd = new scala.util.Random(97531L)
    for (trial <- 1 to 6) {
      val docs = (1L to (5 + rnd.nextInt(40)).toLong).map { id =>
        val n = rnd.nextInt(120) // 0 tokens possible
        val sep = if (rnd.nextBoolean()) " " else "  \t "
        (id, Seq.fill(n)(s"w${rnd.nextInt(50)}").mkString(sep))
      }
      val chunk = 1 + rnd.nextInt(20)
      val overlap = rnd.nextInt(chunk) // in [0, chunk)
      val got = TextFunctions.chunkDocs(
          docs.toDF("doc_id", "text"), "doc_id", "text", chunk, overlap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
      val want = reference(docs, chunk, overlap)
      assert(got == want,
        s"trial $trial (chunk=$chunk overlap=$overlap): " +
          s"extra=${(got diff want).take(3)} missing=${(want diff got).take(3)}")
    }
  }
}
