package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Stateful streaming operators: watermark-bounded dedup and
  * gap-session-ization via flatMapGroupsWithState (SURVEY.md §2.8's
  * Structured-Streaming extension surface).
  *
  * Both are the streaming twins of batch operators in this library
  * ([[graft.ext.Dedup.exact]] and [[graft.ops.Analytics.sessionize]]):
  * same semantics, state bounded by the event-time watermark instead of a
  * full-table shuffle.
  */
object StatefulOps {

  /** Streaming exact-dedup: drop rows whose key was already seen within
    * the watermark window. State is evicted as the watermark advances —
    * bounded memory at any scale (vs the reference's blind re-append,
    * `etl/etl_process.py:156-163`). */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, watermark: String,
      keyCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** One event on the stream. */
  case class Evt(user_id: Long, ts: Timestamp, value: Double)

  /** Open-session accumulator kept in GroupState (epoch micros). */
  case class SessionState(startUs: Long, endUs: Long, n: Long, sum: Double)

  /** A closed session. */
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  private def us(t: Timestamp): Long = t.getTime * 1000 + t.getNanos / 1000 % 1000

  private def closeSession(uid: Long, s: SessionState): SessionOut =
    SessionOut(uid, new Timestamp(s.startUs / 1000), new Timestamp(s.endUs / 1000),
      s.n, s.sum)

  /** Shared gap-session fold: feed time-sorted events into the open
    * session, closing it whenever the gap is exceeded inside the batch.
    * Returns (sessions closed by this batch, the still-open session). */
  private def foldSessions(uid: Long, sorted: Seq[Evt],
      initial: Option[SessionState], gapMs: Long): (Seq[SessionOut], Option[SessionState]) = {
    var open = initial
    val closed = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      val t = us(e.ts)
      open match {
        case Some(s) if t - s.endUs <= gapMs * 1000 =>
          open = Some(SessionState(s.startUs, math.max(s.endUs, t), s.n + 1, s.sum + e.value))
        case Some(s) => // gap exceeded inside the batch → close, start new
          closed += closeSession(uid, s)
          open = Some(SessionState(t, t, 1, e.value))
        case None =>
          open = Some(SessionState(t, t, 1, e.value))
      }
    }
    (closed.result(), open)
  }

  /** Gap-based sessionization with explicit state: a session closes when
    * `gap` passes with no events (decided by event-time timeout, i.e. the
    * watermark — late data within the watermark still extends its
    * session). Emits closed sessions only (append mode). */
  def sessionize(events: Dataset[Evt], watermark: String = "30 minutes",
      gapMs: Long = 30 * 60 * 1000): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[Evt], state: GroupState[SessionState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed session end + gap → close it
            val out = state.getOption.map(closeSession(uid, _)).toSeq
            state.remove()
            out.iterator
          } else {
            val (closed, open) =
              foldSessions(uid, rows.toSeq.sortBy(e => us(e.ts)), state.getOption, gapMs)
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endUs / 1000 + gapMs)
            }
            closed.iterator
          }
      }
  }

  /** The same gap-sessionization on Spark 4's `transformWithState` API —
    * typed ValueState plus EXPLICIT event-time timers instead of the
    * single implicit GroupState timeout (a processor can hold many named
    * states and timers; this one needs one of each). Requires the RocksDB
    * state store provider. Semantically identical to [[sessionize]] —
    * the parity spec drives both through the same input. */
  class SessionProcessor(gapMs: Long) extends StatefulProcessor[Long, Evt, SessionOut] {
    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState("session", Encoders.product[SessionState],
        TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[Evt],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val initial = if (session.exists()) Some(session.get()) else None
      val (closed, open) =
        foldSessions(uid, rows.toSeq.sortBy(e => us(e.ts)), initial, gapMs)
      open.foreach { s =>
        session.update(s)
        // one live timer per key: re-arm at the new session end + gap
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(s.endUs / 1000 + gapMs)
      }
      closed.iterator
    }

    override def handleExpiredTimer(uid: Long, timerValues: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionOut] =
      if (session.exists()) {
        val out = closeSession(uid, session.get())
        session.clear()
        Iterator.single(out)
      } else Iterator.empty
  }

  /** [[sessionize]] via [[SessionProcessor]] (transformWithState). */
  def sessionizeTws(events: Dataset[Evt], watermark: String = "30 minutes",
      gapMs: Long = 30 * 60 * 1000): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** A typed event on the transition stream. */
  case class TypedEvt(user_id: Long, event_id: Long, ts: Timestamp, event_type: String)

  /** One observed (prev → curr) transition for a user. */
  case class Transition(user_id: Long, prev: String, curr: String)

  /** Per-user last-seen event kept in GroupState. */
  case class LastEvt(tsUs: Long, eventId: Long, eventType: String)

  /** Streaming twin of [[graft.ops.Analytics.eventTransitions]] /
    * [[graft.ops.Incremental.incrTransitions]]: emit each user's
    * adjacent event-type bigram as it happens, keeping only the LAST
    * event per user as state — O(users) and constant per user, the
    * minimal mergeable state the incremental batch op derived. Events
    * within a batch sort by (ts, event_id) — the same total order as the
    * batch window — and the bigram straddling two batches comes from the
    * saved state, mirroring the batch boundary join.
    *
    * Contract: per-user event-time order must hold ACROSS batches (each
    * batch carries events newer than the last — the replay/ingest shape;
    * [[StreamBatchParitySpec]] replays the real corpus this way). A
    * source with cross-batch disorder needs a watermark reorder buffer
    * upstream; an in-batch disorder is handled by the sort. */
  def transitions(events: Dataset[TypedEvt]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvt, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[TypedEvt], state: GroupState[LastEvt]) =>
          val sorted = rows.toSeq.sortBy(e => (us(e.ts), e.event_id))
          var last = state.getOption
          val out = Seq.newBuilder[Transition]
          sorted.foreach { e =>
            last.foreach(l => out += Transition(uid, l.eventType, e.event_type))
            last = Some(LastEvt(us(e.ts), e.event_id, e.event_type))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** [[transitions]] in the transformWithState API — the same O(1)
    * last-event-per-user state through the explicit-state processor
    * interface (typed ValueState handle, no timers needed: transition
    * emission is purely input-driven). Requires the RocksDB state store
    * provider, like every transformWithState operator. */
  class TransitionProcessor extends StatefulProcessor[Long, TypedEvt, Transition] {
    @transient private var last: ValueState[LastEvt] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState("last", Encoders.product[LastEvt], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[TypedEvt],
        timerValues: TimerValues): Iterator[Transition] = {
      val sorted = rows.toSeq.sortBy(e => (us(e.ts), e.event_id))
      var cur = if (last.exists()) Some(last.get()) else None
      val out = Seq.newBuilder[Transition]
      sorted.foreach { e =>
        cur.foreach(l => out += Transition(uid, l.eventType, e.event_type))
        cur = Some(LastEvt(us(e.ts), e.event_id, e.event_type))
      }
      cur.foreach(last.update)
      out.result().iterator
    }
  }

  /** [[transitions]] via [[TransitionProcessor]] (transformWithState). */
  def transitionsTws(events: Dataset[TypedEvt]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TransitionProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Stream-stream interval join: attribute each conversion to the same
    * user's click that happened within `window` BEFORE it. Both sides are
    * watermarked and the join condition bounds conversion time inside
    * [click_ts, click_ts + window], so each side's state store holds only
    * rows younger than watermark + window — bounded memory at any scale
    * (an unbounded-condition stream join would retain both streams
    * forever). Inner join → emits as soon as both rows arrive; the
    * watermark only drives state eviction.
    *
    * Inputs must carry (`user_id`, `click_ts`) and (`user_id`,
    * `conv_ts`) respectively. */
  def clickConversionJoin(clicks: DataFrame, conversions: DataFrame,
      watermark: String = "10 minutes", window: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val c = clicks.withWatermark("click_ts", watermark)
    val v = conversions.withWatermark("conv_ts", watermark)
      .withColumnRenamed("user_id", "conv_user")
    c.join(v,
      col("user_id") === col("conv_user")
        && col("conv_ts") >= col("click_ts")
        && col("conv_ts") <= col("click_ts") + expr(s"INTERVAL $window"),
      "inner")
      .drop("conv_user")
  }
}
