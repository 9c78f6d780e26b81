package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018 — the SentencePiece model),
  * completing the tokenizer plane next to [[BpeTokenizer]]: BPE composes
  * merges bottom-up, the unigram model SEGMENTS top-down by Viterbi under
  * per-piece costs. This is the frequency-seeded deterministic variant:
  * the vocabulary is the top-K substrings by frequency (plus every single
  * character for coverage), piece cost = quantized −ln(count/total) —
  * one float op, immediately landed on the integer millinat grid (the
  * q107 pow precedent), so training AND inference are engine-restatable
  * with no rounding contract. (Full SentencePiece EM prunes the seed by
  * expected likelihood loss; the seed-and-cost scheme here keeps every
  * step a closed form — the documented trade, same spirit as the langid
  * 96-char prefix.)
  *
  * 100 TB shape: substring counting is one explode + a map-side-combined
  * count (the data-scale passes); vocabulary selection is a rank over the
  * PIECE-TYPE table (bounded by distinct ≤MaxPieceLen-grams — alphabet-
  * bounded, not corpus-bounded); inference is scan-side via
  * [[graft.expressions.UnigramStats]] with the cost table riding as a
  * literal — zero joins, zero exchanges, the langid/classifier scoring
  * shape.
  */
object UnigramLm {

  /** OOV floor: a single character absent from the vocabulary — larger
    * than any in-vocab cost (ln(1e-6·…)·1e6 tops out well below this), so
    * unknown characters never beat real pieces.
    */
  val UnkCost = 25000000L

  /** Words truncate here before segmentation (engine AND oracle) — the
    * CLD-style bounded-work trade; natural-language words virtually never
    * reach it.
    */
  val MaxWordLen = 16

  val MaxPieceLen = 4

  /** Train: substring counts → top-`vocabSize` multi-char pieces by
    * (count desc, piece asc) + ALL single chars (coverage guarantee) →
    * integer millinat costs. Returns (piece, cnt, cost).
    */
  def train(df: DataFrame, textCol: Column, vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val words = df
      .select(explode(TextFunctions.tokens(lower(textCol))).as("w"))
      .select(substring(col("w"), 1, MaxWordLen).as("w"))
    val counts = words
      .select(col("w"), explode(sequence(lit(1), length(col("w")))).as("j"))
      .select(col("w"), col("j"), explode(sequence(lit(1),
        least(lit(MaxPieceLen), length(col("w")) - col("j") + lit(1)))).as("l"))
      .select(expr("substring(w, j, l)").as("piece"))
      .groupBy(col("piece")).agg(count(lit(1)).as("cnt"))
    // rank window over PIECE TYPES (alphabet-bounded, never corpus-scale)
    val w0 = Window.partitionBy(lit(0)).orderBy(col("cnt").desc, col("piece"))
    val multi = counts.filter(length(col("piece")) > 1)
      .withColumn("__rk", row_number().over(w0))
      .filter(col("__rk") <= vocabSize).drop("__rk")
    val kept = counts.filter(length(col("piece")) === 1).unionByName(multi)
    val whole = Window.partitionBy(lit(0))
    kept
      .withColumn("__tot", sum(col("cnt")).over(whole))
      .withColumn("cost",
        floor(-log(col("cnt").cast("double") / col("__tot").cast("double"))
          * 1e6 + 0.5).cast("long"))
      .select(col("piece"), col("cnt"), col("cost"))
  }

  /** Segment every document under a trained vocabulary and return the
    * per-doc Viterbi stats (n_words, n_pieces, total_cost) — the cost
    * table collects once (model-scale, the BPE-merge precedent) and rides
    * the scan as an expression literal.
    */
  def segmentStats(docs: DataFrame, idCol: String, textCol: Column,
      vocab: DataFrame): DataFrame = {
    val costs = vocab.select(col("piece"), col("cost")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = TextFunctions.tokens(lower(coalesce(textCol, lit(""))))
    docs
      .select(col(idCol), graft.expressions.UnigramExpressions
        .unigramStats(toks, costs).as("s"))
      .select(col(idCol), col("s.n_words").as("n_words"),
        col("s.n_pieces").as("n_pieces"), col("s.total_cost").as("total_cost"))
  }
}
