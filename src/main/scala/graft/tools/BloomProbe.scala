package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.functions.DedupFunctions

/** Shuffle-byte evidence for the bloom-prefiltered decontamination path:
  * with a reference set too large to broadcast, the exact gram join
  * shuffles EVERY train gram; the bloom arm filters train grams map-side
  * first, so only true hits + false positives reach the exchange. Both
  * arms produce identical (id, n_shared) results (asserted).
  *
  * Usage: tools/run.sh graft.tools.BloomProbe [sfDir]
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the scenario under test is the NON-broadcastable reference set
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var shuffleBytes = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    })

    val docs = Tables.documents(spark, sfDir)
    val train = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 50 =!= 0)
    val eval_ = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 50 === 0)

    def measure(name: String)(f: => Array[(Long, Long)]): Array[(Long, Long)] = {
      Thread.sleep(500) // let prior stage-completion events drain
      shuffleBytes = 0L
      val t0 = System.nanoTime()
      val out = f
      Thread.sleep(500)
      println(f"$name%-12s shuffleMB=${shuffleBytes / 1e6}%9.2f  sec=${(System.nanoTime() - t0) / 1e9}%6.2f  rows=${out.length}")
      out
    }

    val exact = measure("exact") {
      DedupFunctions.contaminationNgramOverlap(
          train, "doc_id", "text", eval_, "text", n = 3, broadcastRef = false)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    }
    val bloom = measure("bloom") {
      DedupFunctions.contaminationViaBloom(
          train, "doc_id", "text", eval_, "text", n = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    }
    require(exact.sameElements(bloom), "bloom arm must be exact")
    println("results identical: true")
  }
}
