package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LangIdSpec extends SparkSpec {
  import spark.implicits._

  // five synthetic "languages": same word skeletons, per-language vowel
  // rotation — distinct char-n-gram distributions, ASCII-only (the q126
  // corpus construction)
  private val rotations = Map(
    "de" -> "iouae", "en" -> "aeiou", "es" -> "ouaei",
    "fr" -> "eioua", "zh" -> "uaeio")
  private val classes = rotations.keys.toSeq.sorted

  private def corpus(n: Int) = {
    val words = Seq("data", "table", "query", "batch", "scan", "merge",
      "group", "value", "stream", "vector")
    (0L until n.toLong).map { i =>
      val lang = classes((i % 5).toInt)
      val base = (0 until 12).map(j => words(((i + j * 7) % 10).toInt)).mkString(" ")
      val text = base.map { ch =>
        val p = "aeiou".indexOf(ch)
        if (p >= 0) rotations(lang)(p) else ch
      }
      (i, lang, text)
    }.toDF("doc_id", "lang", "text")
  }

  test("train/predict: held-out accuracy is high; argmax rule matches driver reference") {
    val docs = corpus(300)
    val model = LangId.train(docs.filter($"doc_id" % 2 === 0),
      "doc_id", "text", "lang", classes, buckets = 128, passes = 5)
    val got = LangId.predict(docs.filter($"doc_id" % 2 === 1), "doc_id", "text", model)
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
    val n = got.count()
    val correct = got.filter($"pred_lang" === $"lang").count()
    assert(n == 150L)
    assert(correct.toDouble / n >= 0.95,
      s"held-out accuracy ${correct.toDouble / n} below 0.95 — the trained " +
        "classifier must actually separate the synthetic languages")

    // the engine's argmax must equal a driver-side argmax over the same
    // integer scores (first-index tie-break)
    got.collect().foreach { r =>
      val scores = classes.map(l => r.getAs[Long](s"score_$l"))
      val best = classes(scores.indexOf(scores.max))
      assert(r.getAs[String]("pred_lang") == best,
        s"doc ${r.get(0)}: pred ${r.get(1)} != driver argmax $best over $scores")
    }
  }

  test("training is deterministic under repartitioning; scores are integers, bit-equal") {
    val docs = corpus(120)
    val m1 = LangId.train(docs, "doc_id", "text", "lang", classes, buckets = 64, passes = 3)
    val m2 = LangId.train(docs.repartition(17, $"text"),
      "doc_id", "text", "lang", classes, buckets = 64, passes = 3)
    assert(m1.avgBias.toSeq == m2.avgBias.toSeq)
    assert(m1.avgWeights.map(_.toSeq).toSeq == m2.avgWeights.map(_.toSeq).toSeq)
    assert(m1.updates == m2.updates)
    val s1 = LangId.predict(docs, "doc_id", "text", m1)
      .collect().map(r => r.getLong(0) -> classes.map(l => r.getAs[Long](s"score_$l"))).toMap
    val s2 = LangId.predict(docs.repartition(5), "doc_id", "text", m1)
      .collect().map(r => r.getLong(0) -> classes.map(l => r.getAs[Long](s"score_$l"))).toMap
    assert(s1 == s2)
  }

  test("NULL/short text scores on bias alone; unknown label refused; gram construction exact") {
    val docs = Seq((0L, "en", "data table"), (1L, "fr", null: String),
      (2L, "de", "abc")).toDF("doc_id", "lang", "text")
    val model = LangId.train(docs, "doc_id", "text", "lang",
      Seq("de", "en", "fr"), buckets = 32, passes = 2)
    val scored = LangId.predict(docs, "doc_id", "text", model).collect()
      .map(r => r.getLong(0) -> r).toMap
    // NULL text: every class score equals its avg bias
    Seq("de", "en", "fr").zipWithIndex.foreach { case (l, ci) =>
      assert(scored(1L).getAs[Long](s"score_$l") == model.avgBias(ci))
    }
    // "abc" (3 chars, maxChars ample): grams = ab,bc,abc — 2-,3-grams only
    val grams = docs.filter($"doc_id" === 2L)
      .select(LangId.charGrams($"text", 96).as("g"))
      .head.getSeq[String](0)
    assert(grams.sorted == Seq("ab", "abc", "bc"))
    intercept[IllegalArgumentException] {
      LangId.train(docs, "doc_id", "text", "lang", Seq("de", "en"), buckets = 32)
    }
  }

  test("LangIdScoresExpr == the built-in HOF spelling, bit for bit (incl. multibyte text)") {
    val docs = corpus(60)
      .unionByName(Seq(
        (900L, "de", "naïve café über straße — größer"), // multibyte chars
        (901L, "en", "MIXED Case And\tTabs  plus\nnewlines"),
        (902L, "es", "xy"), // shorter than the largest gram width
        (903L, "fr", "")).toDF("doc_id", "lang", "text"))
    val model = LangId.train(corpus(60), "doc_id", "text", "lang", classes,
      buckets = 64, passes = 3)
    // reference: the interpreted spelling this expression replaced —
    // charGrams -> per-gram xxhash64 bucket -> per-class literal-array add
    val wArr = typedLit(
      (0 until model.buckets).map { b =>
        classes.indices.map(ci => model.avgWeights(ci)(b))
      })
    val hofSums = aggregate(
      LangId.charGrams($"text", model.maxChars),
      typedLit(classes.indices.map(ci => model.avgBias(ci))),
      (acc, g) => zip_with(acc,
        element_at(wArr,
          (pmod(xxhash64(g), lit(model.buckets.toLong)) + lit(1L)).cast("int")),
        (a, w) => a + w))
    val exprSums = graft.expressions.LangIdScoresExpr.scores(
      coalesce($"text", lit("")), model.avgWeights, model.avgBias,
      model.buckets, model.maxChars)
    val rows = docs.select($"doc_id", hofSums.as("h"), exprSums.as("e")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"doc ${r.get(0)}: HOF ${r.getSeq[Long](1)} != expr ${r.getSeq[Long](2)}")
    }
  }

  test("prediction plan is scan-only: no exchange, no join (the corpus-scale pass)") {
    val docs = corpus(50)
    val model = LangId.train(docs, "doc_id", "text", "lang", classes, buckets = 32, passes = 2)
    val plan = LangId.predict(docs, "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"scoring must not join:\n$plan")
  }
}
