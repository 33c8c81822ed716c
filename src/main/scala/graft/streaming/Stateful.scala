package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming stateful operators — the `flatMapGroupsWithState` forms
  * of the reference's keyed-state functions (SURVEY.md §2.4/§2.7).
  * Their batch equivalents are the window functions in
  * `graft.operators.GmallDwd.pageLog`; `StreamingSpec` asserts the two
  * forms agree on the same input.
  *
  * Reference semantics reproduced:
  *  - D1 first-wins dedup, 5 s TTL (`DwsTradePaymentSucWindow.java:74-102`)
  *  - D2 latest-wins dedup, 2 s timer (`app/func/OrderDetailFilterFunction.java:20-83`)
  *  - D3 daily-UV dedup, 1-day TTL (`DwdTrafficUniqueVisitorDetail.java:51-87`)
  *  - D4 new/returning-visitor correction (`BaseLogApp.java:64-101`)
  *  - D5 daily-first + lifetime-first detection (`DwsTradeOrderWindow.java:74-127`)
  *  - D6 back-flow: first-of-day AND gap ≥ 8 days (`DwsUserUserLoginWindow.java:83-135`)
  *  - C1 CEP jump detection with 10 s timeout (`DwdTrafficUserJumpDetail.java:62-107`)
  *
  * Scale notes: each operator is one shuffle on its key; state is one
  * small record per key in the state store (RocksDB-backed on a
  * cluster). Eviction per operator mirrors what its semantics allow:
  * `firstWins` TTLs its marker after `ttlMillis` (the reference's 5 s
  * dedup window — retract duplicates arrive within milliseconds);
  * `latestWins` and `jumpDetect` evict on event-time timeout. The
  * `dailyFlags` lifetime-first flag and `backFlow`'s 8-day-gap memory
  * are *semantically* unbounded (the reference likewise keeps D4's
  * last-visit state with no TTL) — at 100 TB those two are the
  * operators to back with a compacted snapshot + periodic state
  * rewrite, not a TTL. Within a micro-batch the group iterator is
  * sorted by (ts, event_id) so results are deterministic and
  * batch-equivalent.
  */
object Stateful {

  /** Canonical keyed event for the log-side operators. */
  case class UserEvent(user_id: Long, event_id: Long, ts: Timestamp, dt: String,
                       is_session_start: Int)

  /** D3/D4/D5 output: per-event daily-first and lifetime-new flags. */
  case class FlaggedEvent(user_id: Long, event_id: Long, ts: Timestamp, dt: String,
                          is_daily_first: Int, is_new: Int)

  /** D3/D4/D5 state: lifetime-first date and last date seen. */
  case class VisitState(first_dt: String, last_dt: String)

  /** C1 output: one row per detected jump (the jump's starting event). */
  case class Jump(user_id: Long, event_id: Long, ts: Timestamp)

  /** C1 state: the pending session-start awaiting its follow-up. */
  case class PendingStart(event_id: Long, tsMillis: Long)

  /** Generic keyed record for the dedup operators. */
  case class Keyed(key: String, ts: Timestamp, payload: String)

  private implicit val visitStateEnc: Encoder[VisitState] = Encoders.product[VisitState]
  private implicit val flaggedEnc: Encoder[FlaggedEvent] = Encoders.product[FlaggedEvent]
  private implicit val pendingEnc: Encoder[PendingStart] = Encoders.product[PendingStart]
  private implicit val jumpEnc: Encoder[Jump] = Encoders.product[Jump]
  private implicit val keyedEnc: Encoder[Keyed] = Encoders.product[Keyed]
  private implicit val boolEnc: Encoder[Boolean] = Encoders.scalaBoolean
  private implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /** D3+D4+D5 fused: flags each event with `is_daily_first` (first per
    * user per day) and `is_new` (event date == lifetime-first date).
    * State = (first_dt, last_dt) per user — the 1-day-TTL `ValueState`
    * pair of the reference, collapsed into one record.
    *
    * Batch equivalent: `row_number() over (partition by user_id, dt)`
    * and `min(dt) over (partition by user_id)` in `GmallDwd.pageLog`.
    */
  private val dailyFlagsFunc:
      (Long, Iterator[UserEvent], GroupState[VisitState]) => Iterator[FlaggedEvent] = {
    (_: Long, it: Iterator[UserEvent], state: GroupState[VisitState]) =>
      val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var st = state.getOption.getOrElse(VisitState(null, null))
      val out = sorted.map { e =>
        val firstDt = if (st.first_dt == null) e.dt else st.first_dt
        val dailyFirst = if (st.last_dt == null || st.last_dt != e.dt) 1 else 0
        st = VisitState(firstDt, e.dt)
        FlaggedEvent(e.user_id, e.event_id, e.ts, e.dt, dailyFirst,
          if (e.dt == firstDt) 1 else 0)
      }
      state.update(st)
      out.iterator
  }

  def dailyFlags(events: Dataset[UserEvent]): Dataset[FlaggedEvent] =
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(dailyFlagsFunc)

  /** Per-user compacted-snapshot record of [[dailyFlags]]' state. */
  case class VisitSnapshot(user_id: Long, first_dt: String, last_dt: String)
  private implicit val visitSnapshotEnc: Encoder[VisitSnapshot] =
    Encoders.product[VisitSnapshot]

  /** Compacted snapshot of a [[dailyFlags]] query's keyed state: reads
    * the checkpoint's state store (Spark's `statestore` batch source,
    * last committed batch) back into one row per user. This is the
    * 100 TB answer for *semantically* unbounded state (the scaladoc
    * above: D4's lifetime-first date and last-visit date admit no TTL
    * — the reference keeps them forever too): instead of one
    * ever-growing state store carried across every restart, snapshot
    * the state to columnar storage on a schedule, compact it offline
    * if needed (dedup, drop churned users per retention), and
    * bootstrap the next incarnation from the snapshot via
    * [[dailyFlagsFrom]]. StreamRecoverySpec proves the cut run
    * (phase 1 → snapshot → fresh query bootstrapped from it → phase 2)
    * emits exactly the uncut run's rows. */
  def visitStateSnapshot(spark: org.apache.spark.sql.SparkSession,
                         checkpoint: String): Dataset[VisitSnapshot] = {
    spark.read.format("statestore").load(checkpoint)
      .select("key.value", "value.groupState.first_dt", "value.groupState.last_dt")
      .toDF("user_id", "first_dt", "last_dt")
      .as[VisitSnapshot]
  }

  /** [[dailyFlags]] bootstrapped from a compacted snapshot: a FRESH
    * query (new checkpoint, empty state store) whose first batch
    * seeds each user's `VisitState` from `snapshot` — Spark's
    * `flatMapGroupsWithState` initial-state plumbing, so the seed
    * rides the same state-store write path as live updates. The
    * update function is THE SAME value as [[dailyFlags]]'; the two
    * entry points cannot drift. */
  def dailyFlagsFrom(events: Dataset[UserEvent],
                     snapshot: Dataset[VisitSnapshot]): Dataset[FlaggedEvent] = {
    val init = snapshot.groupByKey(_.user_id)
      .mapValues(s => VisitState(s.first_dt, s.last_dt))
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout, init)(dailyFlagsFunc)
  }

  /** D6: back-flow detection — emits one row per (user, day) with
    * `back_ct` = 1 when the gap since the previous active day is ≥ 8
    * days. State = last active date (epoch days).
    *
    * Batch equivalent: `lag(dt) over (partition by user_id order by
    * dt)` + `datediff ≥ 8` in `GmallDws.userLogin`. */
  case class LoginDay(user_id: Long, dt: String, back_ct: Long)
  private implicit val loginDayEnc: Encoder[LoginDay] = Encoders.product[LoginDay]
  private implicit val strEnc: Encoder[String] = Encoders.STRING

  def backFlow(events: Dataset[UserEvent]): Dataset[LoginDay] =
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[String]) =>
          val days = it.toSeq.map(_.dt).distinct.sorted
          var last = state.getOption.orNull
          val out = days.map { dt =>
            val gap = if (last == null) 0L
            else java.time.temporal.ChronoUnit.DAYS.between(
              java.time.LocalDate.parse(last), java.time.LocalDate.parse(dt))
            last = dt
            LoginDay(uid, dt, if (gap >= 8) 1L else 0L)
          }
          if (last != null) state.update(last)
          out.iterator
      }

  /** D1: first-wins dedup — emit only the first record per key; the
    * seen-marker is evicted when the watermark passes the newest seen
    * ts + `ttlMillis` (the reference's 5 s OnReadAndWrite TTL, bound
    * to the watermark clock like [[latestWins]]: retract duplicates
    * arrive within milliseconds, and the sweep keeps the unbounded key
    * domain from accumulating state forever). Requires `withWatermark`
    * upstream. (A ProcessingTimeTimeout would busy-loop micro-batches
    * whenever timers are registered — event time is both deterministic
    * and cheaper.) */
  def firstWins(records: Dataset[Keyed], ttlMillis: Long = 5000L): Dataset[Keyed] =
    records.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, it: Iterator[Keyed], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = it.toSeq.sortBy(r => (r.ts.getTime, r.payload))
            state.setTimeoutTimestamp(sorted.last.ts.getTime + ttlMillis)
            if (state.exists) Iterator.empty
            else {
              state.update(true)
              Iterator.single(sorted.head)
            }
          }
      }

  /** D2: latest-wins dedup — hold the newest record per key; emit it
    * when the event-time timeout fires (the reference's 2 s
    * processing-time timer, re-expressed on the watermark clock so it
    * is deterministic/testable). Requires `withWatermark` upstream.
    *
    * Batch equivalent: `row_number() over (partition by key order by
    * ts desc) = 1`. */
  def latestWins(records: Dataset[Keyed], holdMillis: Long = 2000L): Dataset[Keyed] =
    records.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, it: Iterator[Keyed], state: GroupState[Keyed]) =>
          if (state.hasTimedOut) {
            val best = state.get
            state.remove()
            Iterator.single(best)
          } else {
            val newest = (it.toSeq ++ state.getOption)
              .maxBy(r => (r.ts.getTime, r.payload))
            state.update(newest)
            state.setTimeoutTimestamp(newest.ts.getTime + holdMillis)
            Iterator.empty
          }
      }

  /** C1: CEP jump (bounce) detection. Per user, a session-start event
    * is a jump when (a) the very next event is also a session start
    * within `withinMillis` — pattern `begin(start).next(start)` — or
    * (b) no event at all follows within `withinMillis` (the CEP
    * timeout side output). A session start followed within the window
    * by a normal event is not a jump.
    *
    * State = the pending session-start; an event-time timeout at
    * `ts + withinMillis` implements the CEP `within(10 s)` timeout.
    * Requires `withWatermark` upstream.
    *
    * Batch equivalent (SURVEY.md §5): `lead(ts)`/`lead(is_start)` over
    * (partition by user order by ts) with the same predicate. */
  def jumpDetect(events: Dataset[UserEvent], withinMillis: Long = 10000L): Dataset[Jump] =
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[PendingStart]) =>
          if (state.hasTimedOut) {
            val p = state.get
            state.remove()
            Iterator.single(Jump(uid, p.event_id, new Timestamp(p.tsMillis)))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = Seq.newBuilder[Jump]
            var pending = state.getOption.orNull
            sorted.foreach { e =>
              if (pending != null) {
                if (e.ts.getTime <= pending.tsMillis + withinMillis) {
                  // follow-up inside the window: jump iff it is a new start
                  if (e.is_session_start == 1)
                    out += Jump(uid, pending.event_id, new Timestamp(pending.tsMillis))
                } else {
                  // window elapsed unobserved -> CEP timeout match
                  out += Jump(uid, pending.event_id, new Timestamp(pending.tsMillis))
                }
                pending = null
              }
              if (e.is_session_start == 1) pending = PendingStart(e.event_id, e.ts.getTime)
            }
            if (pending != null) {
              state.update(pending)
              state.setTimeoutTimestamp(pending.tsMillis + withinMillis)
            } else if (state.exists) state.remove()
            out.result().iterator
          }
      }
}
