package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint word pools → a linearly separable concept with real margin
  private def plantedCorpus(n: Int) = {
    val good = Array("alpha", "beta", "gamma", "delta")
    val bad = Array("omega", "sigma", "tau", "rho")
    (0 until n).map { i =>
      val pool = if (i % 2 == 0) good else bad
      val words = (0 until 5 + i % 7).map(j => pool((i + j) % pool.length))
      (i.toLong, words.mkString(" "), i % 2 == 0)
    }.toDF("doc_id", "text", "is_good")
  }

  test("planted separable concept: training converges and classifies perfectly") {
    val docs = plantedCorpus(40)
    val model = QualityClassifier.trainPerceptron(
      docs, "doc_id", "text", col("is_good"), buckets = 32, passes = 10)
    val scored = QualityClassifier.scorePerceptron(
        docs, "doc_id", "text", col("is_good"), model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(scored.length == 40)
    assert(scored.forall { case (_, _, pred, label) => pred == label },
      s"planted concept must be learned exactly: ${scored.filter(t => t._3 != t._4).toSeq}")
    // separable + enough passes → the perceptron stops updating well before
    // the pass budget (convergence, not just accuracy)
    assert(model.updates < 10L * 40,
      s"updates should stop after convergence, got ${model.updates}")
  }

  test("model is invariant to input partitioning (training order is the id order)") {
    val docs = plantedCorpus(30)
    val m1 = QualityClassifier.trainPerceptron(
      docs.repartition(1), "doc_id", "text", col("is_good"), buckets = 16, passes = 3)
    val m7 = QualityClassifier.trainPerceptron(
      docs.repartition(7, col("text")), "doc_id", "text", col("is_good"),
      buckets = 16, passes = 3)
    assert(m1.weights.toSeq == m7.weights.toSeq && m1.bias == m7.bias)
    assert(m1.avgWeights.toSeq == m7.avgWeights.toSeq && m1.avgBias == m7.avgBias)
  }

  test("maxTrainDocs refuses past the cap instead of truncating") {
    val docs = plantedCorpus(30)
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.trainPerceptron(
        docs, "doc_id", "text", col("is_good"), buckets = 16, maxTrainDocs = 10)
    }
    assert(e.getMessage.contains("maxTrainDocs"))
  }

  test("scored margins equal a driver-side recompute with the model weights") {
    val docs = plantedCorpus(25)
    val model = QualityClassifier.trainPerceptron(
      docs, "doc_id", "text", col("is_good"), buckets = 16, passes = 4)
    val scored = QualityClassifier.scorePerceptron(
        docs, "doc_id", "text", col("is_good"), model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recompute margins from raw tokens + the spark-side hash (xxhash64)
    val toks = docs
      .select(col("doc_id"),
        explode(TextFunctions.tokens(lower(col("text")))).as("w"))
      .select(col("doc_id"), pmod(xxhash64(col("w")), lit(16L)).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = toks.groupBy(_._1).map { case (id, rows) =>
      id -> (rows.map(t => model.avgWeights(t._2.toInt)).sum + model.avgBias)
    }
    expected.foreach { case (id, m) => assert(scored(id) == m, s"doc $id") }
  }

  test("real corpus: the distilled token-count gate beats the majority class") {
    val docs = Tables.documents(spark, sfDir)
    val label = TextFunctions.tokenCount(lower(col("text"))) >= 60
    val scored = QualityClassifier.trainAndScore(
      docs, "doc_id", "text", label, buckets = 64, passes = 10).cache()
    try {
      val n = scored.count().toDouble
      val acc = scored.filter(col("pred") === col("label")).count() / n
      val majority = math.max(
        scored.filter(col("label") === 1L).count() / n,
        scored.filter(col("label") === -1L).count() / n)
      // batch-summed perceptron updates degenerate to the majority class on
      // this task (measured 0.45); the averaged online pass must do clearly
      // better — the "does it actually learn" regression guard
      assert(acc > majority + 0.2, s"acc=$acc majority=$majority")
    } finally scored.unpersist(blocking = false)
  }

  test("crossValidate: folds partition the corpus, confusion counts are complete, holdout learns") {
    val docs = plantedCorpus(60)
    val out = QualityClassifier.crossValidate(
        docs, "doc_id", "text", col("is_good"),
        foldCol = pmod(col("doc_id"), lit(3L)), folds = 3,
        buckets = 32, passes = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.map(_._1).sorted.toSeq == Seq(0L, 1L, 2L))
    assert(out.map(_._2).sum == 60, "folds must partition the corpus")
    out.foreach { case (f, n, tp, fp, tn, fn) =>
      assert(tp + fp + tn + fn == n, s"fold $f confusion must be complete")
      // the planted concept is separable; a model trained on the OTHER
      // folds must classify this fold's unseen docs perfectly
      assert(fp == 0 && fn == 0, s"fold $f: fp=$fp fn=$fn")
    }
  }

  test("uncertaintySample: exactly the k smallest |margin| docs, heap plan (no global sort)") {
    val docs = Tables.documents(spark, sfDir)
    val label = TextFunctions.tokenCount(lower(col("text"))) >= 60
    val model = QualityClassifier.trainPerceptron(
      docs, "doc_id", "text", label, buckets = 64, passes = 5)
    val picked = QualityClassifier.uncertaintySample(
      docs, "doc_id", "text", label, model, k = 10)
    val got = picked.collect().map(r => (r.getLong(0), math.abs(r.getLong(1))))
    assert(got.length == 10)
    // the selected set IS the 10 smallest |margin| (with id tie-break)
    val all = QualityClassifier.scorePerceptron(docs, "doc_id", "text", label, model)
      .collect().map(r => (math.abs(r.getLong(1)), r.getLong(0))).sorted.take(10)
    assert(got.map(_._2).sorted.toSeq == all.map(_._1).sorted.toSeq,
      s"picked ${got.toSeq} vs expected ${all.toSeq}")
    val plan = picked.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"uncertainty top-k must plan per-task heaps, not a global sort:\n$plan")
  }

  test("selfTrain: on a separable corpus the teacher's pseudo-labels are right, student perfect") {
    val docs = plantedCorpus(60)
    val (teacher, student) = QualityClassifier.selfTrain(
      docs, "doc_id", "text", col("is_good"),
      isLabeled = col("doc_id") < 30, buckets = 32, passes = 10)
    // the teacher saw only ids < 30; both models must classify EVERYTHING
    for ((m, name) <- Seq((teacher, "teacher"), (student, "student"))) {
      val wrong = QualityClassifier.scorePerceptron(docs, "doc_id", "text", col("is_good"), m)
        .filter(col("pred") =!= col("label")).count()
      assert(wrong == 0, s"$name misclassifies $wrong docs of the planted concept")
    }
  }

  test("frozen gate scores a stream unchanged: stream ≡ batch, across micro-batches") {
    // scoring is a stateless select, so the SAME scorePerceptron call must
    // run as a Structured Streaming stage — batch backfill and live ingest
    // share one code path
    val srcDir = java.nio.file.Files.createTempDirectory("graft_clf_src_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_clf_ckpt_").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_clf_out_").toString
    val all = plantedCorpus(30)
    val model = QualityClassifier.trainPerceptron(
      all, "doc_id", "text", col("is_good"), buckets = 32, passes = 5)
    val schema = all.schema
    all.filter(col("doc_id") < 15).coalesce(1).write.mode("append").parquet(srcDir)
    def drain(): Unit = {
      val q = QualityClassifier.scorePerceptron(
          spark.readStream.schema(schema).parquet(srcDir),
          "doc_id", "text", col("is_good"), model)
        .writeStream.format("parquet").outputMode("append")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    drain()
    all.filter(col("doc_id") >= 15).coalesce(1).write.mode("append").parquet(srcDir)
    drain()
    val streamed = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val batch = QualityClassifier.scorePerceptron(all, "doc_id", "text", col("is_good"), model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("scoring plan: pure scan→map — no exchange, no join, weights ride as a literal map") {
    val docs = Tables.documents(spark, sfDir)
    val model = QualityClassifier.PerceptronModel(
      64, Array.fill(64)(1L), 0L, Array.fill(64)(1L), 0L, 0L)
    val scored = QualityClassifier.scorePerceptron(
      docs, "doc_id", "text", lit(true), model)
    val plan = scored.queryExecution.executedPlan.toString
    // the margin is a per-row HOF fold against the literal weight map:
    // the corpus-scale scoring pass must shuffle NOTHING — an Exchange or
    // a join here means it regressed to a weights relation or a per-doc agg
    assert(!plan.contains("Exchange"), s"scoring must be exchange-free:\n$plan")
    assert(!"(?i)join".r.findFirstIn(plan).isDefined, s"scoring must be join-free:\n$plan")
  }

  test("keepTopPerDomain: per-domain cut, integer quotas, md5 ties, quota-0 domains drop") {
    import org.apache.spark.sql.functions._
    // dom a: margins 1..10, quota floor(10*300/1000)=3 -> margins 10,9,8
    // dom b: 5 docs, ALL margins equal, quota 1 -> the md5-order winner
    // dom c: 2 docs, quota floor(2*300/1000)=0 -> domain fully dropped
    val rows =
      (1L to 10L).map(i => (i, "a", i)) ++
      (11L to 15L).map(i => (i, "b", 7L)) ++
      (16L to 17L).map(i => (i, "c", 99L))
    val scored = rows.toDF("doc_id", "source", "margin")
    val got = QualityClassifier.keepTopPerDomain(scored, "doc_id", "source", 300L)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    val aKept = got.filter(_._1 == "a")
    assert(aKept.map(_._3).toSeq == Seq(10L, 9L, 8L), aKept.toSeq.toString)
    assert(aKept.map(_._4).toSeq == Seq(1L, 2L, 3L))
    val bWinner = spark.range(11, 16)
      .select(col("id"), md5(col("id").cast("string")).as("h"))
      .orderBy("h", "id").limit(1).collect().head.getLong(0)
    assert(got.filter(_._1 == "b").map(_._2).toSeq == Seq(bWinner))
    assert(!got.exists(_._1 == "c"), "quota-0 domain must drop entirely")
    // determinism under repartitioning
    val again = QualityClassifier.keepTopPerDomain(
        scored.repartition(7, col("margin")), "doc_id", "source", 300L)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    assert(again.toSeq == got.toSeq)
  }
}
