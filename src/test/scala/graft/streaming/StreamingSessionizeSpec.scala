package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** True-streaming sessionization: sessions emit exactly once, when the
  * event-time watermark confirms them closed, and the emitted rows equal the
  * batch gap-sessionization of the same events.
  *
  * Each inner Seq is fed as its own micro-batch (processAllAvailable between
  * adds) — the watermark advances only at batch boundaries, so coalescing
  * everything into one batch would never close anything mid-stream. The
  * `user 99` rows exist purely to push the watermark; their own (trailing,
  * never-confirmed) session is excluded from assertions.
  */
class StreamingSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val WmPusher = 99L

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  private def run(batches: Seq[SessEvent]*): Set[SessionRow] = {
    val source = MemoryStream[SessEvent](spark, 1)
    val q = StreamingSessionize.sessions(source.toDS(), gapMinutes = 30,
        watermarkDelay = "10 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_out").start()
    try batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table("sess_out").as[SessionRow].collect().toSet
      .filter(_.user_id != WmPusher)
  }

  test("sessions close only when the watermark passes last-event + gap") {
    val out = run(
      Seq(SessEvent(1, 1, ts(1), 1.0), SessEvent(1, 2, ts(6), 2.0),
        SessEvent(1, 3, ts(61), 4.0), SessEvent(2, 4, ts(2), 8.0)),
      // watermark after batch 1 is 61-10=51: user 1's [1,6] (closes at 36)
      // and user 2's [2] (closes at 32) are confirmed; the pusher then moves
      // the watermark to 190, and the timeout-only follow-up batch closes
      // user 1's [61] (closes at 91) as well
      Seq(SessEvent(WmPusher, 5, ts(200), 0.0)))
    assert(out == Set(
      SessionRow(1, 1, 2, 5L * 60000000L, 3.0),
      SessionRow(1, 2, 1, 0L, 4.0),
      SessionRow(2, 1, 1, 0L, 8.0)), s"got $out")
  }

  test("later batches close prior sessions; indices stay monotone per user") {
    val out = run(
      Seq(SessEvent(1, 1, ts(1), 1.0), SessEvent(1, 2, ts(6), 2.0),
        SessEvent(1, 3, ts(61), 4.0)),
      Seq(SessEvent(1, 4, ts(200), 16.0)),  // wm 51: closes [1,6] in-batch
      Seq(SessEvent(1, 5, ts(400), 32.0)),  // wm 190: closes [61]
      Seq(SessEvent(WmPusher, 6, ts(500), 0.0))) // wm 490: closes [200], [400]
    assert(out == Set(
      SessionRow(1, 1, 2, 5L * 60000000L, 3.0),
      SessionRow(1, 2, 1, 0L, 4.0),
      SessionRow(1, 3, 1, 0L, 16.0),
      SessionRow(1, 4, 1, 0L, 32.0)), s"got $out")
  }

  test("out-of-order events within the watermark merge into the right session") {
    val out = run(
      Seq(SessEvent(1, 1, ts(1), 1.0), SessEvent(1, 3, ts(11), 4.0)),
      // late-but-acceptable: wm after batch 1 is 11-10=1, and 6 > 1
      Seq(SessEvent(1, 2, ts(6), 2.0)),
      Seq(SessEvent(1, 4, ts(100), 8.0)),        // wm still 1 → nothing closes
      Seq(SessEvent(WmPusher, 5, ts(500), 0.0))) // wm 490: closes [1,6,11], [100]
    assert(out == Set(
      SessionRow(1, 1, 3, 10L * 60000000L, 7.0),
      SessionRow(1, 2, 1, 0L, 8.0)),
      s"late event should join its session before closure, got $out")
  }

  test("streaming output equals the batch gap-sessionization of the same events") {
    val events = for {
      u <- 1L to 5L
      s <- 0 to 2 // three sessions per user, 100 min apart
      i <- 0 to 3 // four events each, 7 min apart (< 30-min gap)
    } yield SessEvent(u, u * 1000 + s * 10 + i, ts(1 + s * 100 + i * 7), (u + i).toDouble)
    val out = run(
      events,
      Seq(SessEvent(WmPusher, 1, ts(10000), 0.0)),  // wm 212: sessions 1-2 close
      Seq(SessEvent(WmPusher, 2, ts(10001), 0.0)))  // wm 9990: session 3 closes
    val batch = events.toDS().groupByKey(_.user_id).flatMapGroups { (u, it) =>
      val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(sorted.head))
      sorted.tail.foreach { e =>
        if (e.ts.getTime - sessions.last.last.ts.getTime > 30 * 60000L)
          sessions += scala.collection.mutable.ArrayBuffer(e)
        else sessions.last += e
      }
      sessions.zipWithIndex.map { case (s, i) =>
        SessionRow(u, i + 1L, s.size.toLong,
          (s.last.ts.getTime - s.head.ts.getTime) * 1000L,
          s.map(_.value).sum)
      }.iterator
    }.collect().toSet
    assert(out == batch, s"stream≠batch:\n stream=$out\n batch=$batch")
  }
}
