package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair encoding tokenizer, from scratch (Sennrich et al. 2016, the
  * public algorithm GPT-2-family tokenizers build on) — upgrades token
  * counting from whitespace/regex heuristics to a REAL subword vocabulary.
  *
  * Division of labor at 100 TB:
  *  - [[train]]'s data-scale step is the distributed word-frequency count —
  *    one map-side-combined shuffle over the corpus tokens, the only part
  *    that touches every byte;
  *  - the merge loop then runs driver-side over the compact (word, count)
  *    dictionary. That dictionary is MODEL-scale (a vocabulary, like the
  *    IVF centroid set), not data-scale — this is also how practical BPE
  *    trainers operate, and on a real corpus one trains on a sampled
  *    dictionary anyway.
  *  - [[graft.expressions.BpeEncode]] applies the learned merges map-side
  *    (JVM loop + per-word memo, no shuffle) for encoding/counting.
  *
  * End-of-word marker `</w>` distinguishes "low" as a whole word from "low"
  * as a prefix of "lower" — the classic formulation. Fully deterministic:
  * pair-count ties break lexicographically.
  */
object BpeTokenizer {

  val EndOfWord = "</w>"

  /** Learn `numMerges` merges from the corpus. Stops early when no pair
    * occurs at least twice (merging singletons is pure vocabulary bloat).
    *
    * The driver-side dictionary is BOUNDED, not trusted to be model-scale:
    * on a 100 TB web corpus distinct "words" (unicode noise, URLs, code
    * tokens) run to 10^8+ and an unfiltered collect is a driver OOM.
    *  - `minCount` (default 2, standard BPE trainer practice) drops
    *    hapax words map-side BEFORE the collect — they are overwhelmingly
    *    the noise tail, and cutting them is a deliberate, documented
    *    training choice (the oracle applies the same cut);
    *  - `maxDictSize` is a hard cap: if the filtered dictionary still
    *    exceeds it, training REFUSES with guidance instead of silently
    *    truncating (a truncated dictionary would train nondeterministically)
    *    or OOMing the driver.
    * The cap costs no extra job: collecting maxDictSize+1 rows detects
    * overflow, and when under the cap the collect is already complete.
    */
  def train(df: DataFrame, textCol: Column, numMerges: Int,
      minCount: Long = 2L, maxDictSize: Int = 5000000): Seq[(String, String)] = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(maxDictSize >= 1, s"maxDictSize must be >= 1, got $maxDictSize")
    val rows = df
      .select(explode(TextFunctions.tokens(lower(textCol))).as("w"))
      .groupBy("w").count()
      .filter(col("count") >= minCount)
      .limit(maxDictSize + 1)
      .collect()
    require(rows.length <= maxDictSize,
      s"BPE training dictionary exceeds maxDictSize=$maxDictSize distinct words " +
        s"(with minCount=$minCount). Raise minCount to cut the noise tail, raise " +
        s"maxDictSize, or train on a sampled corpus — refusing rather than " +
        s"truncating nondeterministically or exhausting driver memory.")
    trainFromCounts(rows.map(r => (r.getString(0), r.getLong(1))).toSeq, numMerges)
  }

  /** The merge loop over a (word, count) dictionary. Exposed for specs and
    * for training from a pre-aggregated/sampled dictionary.
    */
  def trainFromCounts(wordCounts: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] = wordCounts
      .filter(_._1.nonEmpty).sortBy(_._1) // stable iteration order
      .map { case (w, c) => (w.map(_.toString).toArray :+ EndOfWord, c) }
      .toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var stop = false
    while (merges.length < numMerges && !stop) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      // argmax count; ties break on the lexicographically smallest pair so
      // training is order-independent and bit-reproducible
      val best = counts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, (p, c)) =>
          acc match {
            case Some((bp, bc)) if c < bc => acc
            case Some((bp, bc)) if c == bc &&
              (bp._1 < p._1 || (bp._1 == p._1 && bp._2 <= p._2)) => acc
            case _ => Some((p, c))
          }
      }
      best match {
        case Some((pair, c)) if c >= 2 =>
          merges += pair
          words = words.map { case (syms, cnt) => (mergePair(syms, pair), cnt) }
        case _ => stop = true
      }
    }
    merges.toSeq
  }

  /** Replace every non-overlapping left-to-right occurrence of `pair` with
    * its concatenation.
    */
  def mergePair(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = new mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Encode one word: repeatedly apply the LOWEST-RANKED applicable merge
    * (the standard greedy BPE apply — mirrors training order, so every
    * trained word round-trips to its trained segmentation).
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var syms = word.map(_.toString).toArray :+ EndOfWord
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) done = true
      else syms = mergePair(syms, bestPair)
    }
    syms.toSeq
  }

  /** Column form: encode a token array to BPE subword tokens (map-side JVM
    * loop, memoized per word).
    */
  def encodeTokens(tokens: Column, merges: Seq[(String, String)]): Column =
    graft.expressions.BpeExpressions.bpeEncode(tokens, merges)

  /** Tokenizer fertility evaluation — THE multilingual tokenizer-quality
    * census (pieces-per-word by language; e.g. Rust et al. 2021, "How Good
    * is Your Tokenizer?"): a vocabulary trained on a skewed mix
    * over-segments the under-represented languages, and fertility is how
    * that shows up. Per `groupCol` value: doc count, word / BPE-piece /
    * token-char totals, `fertility` = pieces per word, `chars_per_piece` =
    * mean piece length (the compression view of the same fact).
    *
    * Scale shape: encode is the map-side memoized [[encodeTokens]]
    * expression, totals are ONE map-side-combined aggregation to
    * |groups| rows — no shuffle beyond the group census, text never
    * moves. Ratios on the aggregated integer totals (round4), so the
    * result is partitioning-independent.
    */
  def fertilityByGroup(df: DataFrame, groupCol: String, textCol: Column,
      merges: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.functions._
    val toks = TextFunctions.tokens(lower(textCol))
    df.select(col(groupCol), toks.as("__t"))
      .select(col(groupCol),
        size(col("__t")).cast("long").as("__w"),
        size(encodeTokens(col("__t"), merges)).cast("long").as("__p"),
        aggregate(col("__t"), lit(0L), (a, x) => a + length(x)).as("__c"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__w")).as("words"),
        sum(col("__p")).as("pieces"),
        sum(col("__c")).as("chars"))
      .select(col(groupCol), col("n_docs"), col("words"), col("pieces"),
        col("chars"),
        TextFunctions.round4(col("pieces").cast("double") /
          greatest(col("words"), lit(1L))).as("fertility"),
        TextFunctions.round4(col("chars").cast("double") /
          greatest(col("pieces"), lit(1L))).as("chars_per_piece"))
  }
}
