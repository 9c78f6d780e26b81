package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event of the stream being sessionized (the `events` table shape). */
final case class SessEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp, value: Double)

/** Per-user custom state: the next session index to assign and the events of
  * sessions the watermark has not yet confirmed closed. State size is
  * bounded by the events inside one gap+watermark horizon per user.
  */
final case class SessWindowState(nextIdx: Long, open: Seq[SessEvent])

/** One finalized session — the same output row as the batch sessionization
  * (q42): count, duration, exact decimal-accumulated value sum as double.
  */
final case class SessionRow(
    user_id: Long, session_idx: Long, n_events: Long, duration_us: Long, sum_value: Double)

/** Streaming-native gap sessionization via `flatMapGroupsWithState` — the
  * true-streaming counterpart of the batch window sessionize (q42): sessions
  * are emitted incrementally as the event-time watermark confirms them
  * closed, instead of recomputing windows over history each tick.
  *
  * Semantics: a session breaks when consecutive events (per user, ordered by
  * ts then event_id) are more than `gapMinutes` apart. A session is emitted
  * exactly once, when `lastEventTs + gap ≤ watermark` — at that point no
  * acceptable late event can extend or bridge it (anything older than the
  * watermark is dropped by Spark before reaching the state function), so the
  * output is deterministic wrt the batch computation on the same accepted
  * events. Un-confirmed sessions ride in [[SessWindowState]]; an event-time
  * timeout at `lastOpenTs + gap` guarantees emission even if a user's
  * stream goes quiet.
  *
  * 100 TB shape: state is per-key (user) and bounded by the gap horizon;
  * the only shuffle is the groupByKey hash partitioning — identical to the
  * batch version's single shuffle, but incremental per micro-batch.
  */
object StreamingSessionize {

  def sessions(
      events: Dataset[SessEvent],
      gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def tsUs(e: SessEvent): Long = e.ts.getTime * 1000L + (e.ts.getNanos / 1000) % 1000

    def fn(user: Long, it: Iterator[SessEvent], state: GroupState[SessWindowState])
        : Iterator[SessionRow] = {
      val prev = state.getOption.getOrElse(SessWindowState(1L, Seq.empty))
      val all = (prev.open ++ it).sortBy(e => (tsUs(e), e.event_id))
      if (all.isEmpty) { state.remove(); return Iterator.empty }
      // split the (time-ordered) events at gaps
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(all.head))
      all.tail.foreach { e =>
        if (tsUs(e) - tsUs(sessions.last.last) > gapUs)
          sessions += scala.collection.mutable.ArrayBuffer(e)
        else sessions.last += e
      }
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      // closure condition is monotone in session order → confirmed = prefix
      val (closed, open) = sessions.span(s => tsUs(s.last) + gapUs <= wmUs)
      var idx = prev.nextIdx
      val out = closed.map { s =>
        // exact decimal accumulation, emitted as double — same contract as
        // the batch q42 sum (order-independent, driver-hash-safe)
        val sum = s.foldLeft(BigDecimal(0).setScale(2))((acc, e) =>
          acc + BigDecimal(e.value).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        val r = SessionRow(user, idx, s.size.toLong,
          tsUs(s.last) - tsUs(s.head), sum.toDouble)
        idx += 1
        r
      }
      if (open.isEmpty) state.remove()
      else {
        state.update(SessWindowState(idx, open.flatten.toSeq))
        // fire when the watermark passes the EARLIEST open session's close —
        // keying the timeout on the youngest would let an older confirmed
        // session sit unemitted until new data happened to arrive. Always
        // > current watermark (an earlier close was emitted by span above).
        state.setTimeoutTimestamp((tsUs(open.head.last) + gapUs) / 1000L)
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
