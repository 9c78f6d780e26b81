package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE must reproduce the textbook algorithm exactly: hand-computed merge
  * traces, train/apply round-trips, determinism, and the map-side
  * expression agreeing with the driver-side reference implementation.
  */
class BpeTokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed merge trace on a one-word corpus") {
    // corpus: "aa" x3. Symbols (a, a, </w>). Pair counts: (a,a)=3,
    // (a,</w>)=3 — tie, lexicographic: '<' sorts before 'a', so (a,</w>)
    // merges first; then (a,a</w>) -> one token per word.
    val merges = BpeTokenizer.trainFromCounts(Seq(("aa", 3L)), numMerges = 10)
    assert(merges == Seq(("a", "</w>"), ("a", "a</w>")), merges.toString)
    val ranks = merges.zipWithIndex.toMap
    assert(BpeTokenizer.encodeWord("aa", ranks) == Seq("aa</w>"))
    // "aaa" reuses the learned merges greedily: a + aa</w>
    assert(BpeTokenizer.encodeWord("aaa", ranks) == Seq("a", "aa</w>"))
    // unseen symbols stay as characters + marker
    assert(BpeTokenizer.encodeWord("ab", ranks) == Seq("a", "b", "</w>"))
  }

  test("frequent pairs merge before rare ones (Sennrich worked example shape)") {
    val counts = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = BpeTokenizer.trainFromCounts(counts, numMerges = 4)
    // (e,s) occurs in newest(6)+widest(3)=9, the unique max; then (es,t)=9,
    // then (est,</w>)=9; then (l,o)=5+2=7
    assert(merges.take(4) == Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")),
      merges.toString)
    val ranks = merges.zipWithIndex.toMap
    assert(BpeTokenizer.encodeWord("newest", ranks) == Seq("n", "e", "w", "est</w>"))
    assert(BpeTokenizer.encodeWord("lowest", ranks) == Seq("lo", "w", "est</w>"))
  }

  test("training is deterministic and stops when no pair repeats") {
    val counts = Seq(("abc", 1L), ("def", 1L))
    // every pair occurs once: nothing merges
    assert(BpeTokenizer.trainFromCounts(counts, 10).isEmpty)
    val c2 = Seq(("spark", 4L), ("sparse", 3L), ("park", 2L))
    val a = BpeTokenizer.trainFromCounts(c2, 20)
    val b = BpeTokenizer.trainFromCounts(c2.reverse, 20)
    assert(a == b, "merge list must not depend on dictionary order")
  }

  test("minCount hapax cut leaves >=2-count training unchanged; dict cap refuses, not truncates") {
    // repeated words drive every merge; noise words are single unique
    // characters disjoint from the repeated alphabet, so no pair they
    // contribute can ever reach count 2 — training must be identical with
    // the hapax cut on or off
    val text = (Seq.fill(6)("low lower lowest") ++ "0123456789".map(_.toString)).mkString(" ")
    val df = Seq(text).toDF("text")
    val unfiltered = BpeTokenizer.train(df, col("text"), numMerges = 10, minCount = 1)
    val filtered = BpeTokenizer.train(df, col("text"), numMerges = 10) // default minCount = 2
    assert(filtered.nonEmpty)
    assert(unfiltered == filtered,
      s"hapax cut changed >=2-count training: $unfiltered vs $filtered")
    // past the cap: REFUSE with guidance (silent truncation would train on
    // a nondeterministic dictionary subset; no cap is a driver OOM at scale)
    val ex = intercept[IllegalArgumentException] {
      BpeTokenizer.train(df, col("text"), numMerges = 10, minCount = 1, maxDictSize = 3)
    }
    assert(ex.getMessage.contains("maxDictSize") && ex.getMessage.contains("minCount"))
    // under the cap: unaffected
    assert(BpeTokenizer.train(df, col("text"), numMerges = 10, maxDictSize = 100) == filtered)
  }

  test("expression encode == driver encode; trained words compress") {
    val docs = graft.Tables.documents(spark, sfDir)
    val merges = BpeTokenizer.train(docs, col("text"), numMerges = 30)
    assert(merges.size == 30)
    val ranks = merges.zipWithIndex.toMap
    val toks = TextFunctions.tokens(lower(col("text")))
    val out = docs.limit(20)
      .select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), col("t"),
        BpeTokenizer.encodeTokens(col("t"), merges).as("bpe"))
      .collect()
    out.foreach { r =>
      val words = r.getSeq[String](1)
      val bpe = r.getSeq[String](2)
      val expected = words.flatMap(w => BpeTokenizer.encodeWord(w, ranks))
      assert(bpe == expected, s"doc ${r.getLong(0)}: expression diverged from reference")
      // subword count is bounded by characters+1 per word and >= 1 per word
      assert(bpe.length >= words.length && bpe.length <= words.map(_.length + 1).sum)
    }
    // the un-merged baseline is one symbol per character plus the marker;
    // 30 merges on this corpus must compress that substantially
    val totalChars = out.map(_.getSeq[String](1).map(_.length + 1).sum).sum
    val totalBpe = out.map(_.getSeq[String](2).length).sum
    assert(totalBpe < totalChars * 3 / 4,
      s"no compression: $totalBpe subwords vs $totalChars character symbols")
  }

  test("fertilityByGroup: census matches a driver-side reference fold") {
    val docs = Seq(
      ("en", "the cat sat on the mat"),
      ("en", "the dog"),
      ("de", "katze und hund und katze"),
      ("de", ""),
      ("zh", "one")).toDF("lang", "text")
    val merges = BpeTokenizer.train(docs, col("text"), numMerges = 5)
    val ranks = merges.zipWithIndex.toMap
    val got = BpeTokenizer.fertilityByGroup(docs, "lang", col("text"), merges)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    def r4(d: Double) = math.floor(d * 10000.0 + 0.5) / 10000.0
    val ref = docs.collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (lang, rows) =>
        val words = rows.flatMap(_._2.toLowerCase.split("\\s+").filter(_.nonEmpty))
        val pieces = words.map(w => BpeTokenizer.encodeWord(w, ranks).length.toLong).sum
        val chars = words.map(_.length.toLong).sum
        lang -> (rows.length.toLong, words.length.toLong, pieces, chars,
          r4(pieces.toDouble / math.max(words.length, 1)),
          r4(chars.toDouble / math.max(pieces, 1L)))
      }
    assert(got == ref, s"got=$got\nref=$ref")
    // a zero-token doc still counts in n_docs but adds nothing else
    assert(got("de")._1 == 2L)
    // fertility >= 1 wherever any word exists (a word is >= 1 piece)
    got.values.filter(_._2 > 0).foreach(v => assert(v._5 >= 1.0))
  }
}
