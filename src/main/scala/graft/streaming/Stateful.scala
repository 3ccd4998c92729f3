package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state beyond windowed aggregation (SURVEY.md §2.7
  * gap list): user sessionization with `flatMapGroupsWithState` and
  * watermarked stream-stream joins. The reference never realizes
  * either; a real clickstream deployment of this pipeline needs both.
  */
object Stateful {

  case class Click(userid: String, source: String, timestamp: Timestamp)
  case class SessionState(start: Timestamp, lastTs: Timestamp, nEvents: Long)
  /** fMGWS state wrapper: ALL of a user's unfinalized sessions, oldest
    * first — a gap-closed interval must stay in state until the
    * watermark passes its end + gap, because an above-watermark
    * straggler can still bridge the gap and merge into it. */
  case class SessionsState(items: Seq[SessionState])
  case class UserSession(userid: String, start: Timestamp, end: Timestamp,
                         nEvents: Long, durationS: Long)

  implicit private val clickEnc: Encoder[Click] = Encoders.product[Click]
  implicit private val stateEnc: Encoder[SessionsState] = Encoders.product[SessionsState]
  implicit private val outEnc: Encoder[UserSession] = Encoders.product[UserSession]
  implicit private val stringEnc: Encoder[String] = Encoders.STRING

  /** Event-time sessionization: one session per user while gaps stay
    * within `gapMs` — INCLUSIVE at the boundary, matching the built-in
    * `session_window` exactly: two events exactly gapMs apart MERGE
    * into one session (verified empirically against MergingSessions in
    * StatefulSpec's gap-boundary test; this scaladoc claimed the
    * opposite until r10, and the DuckDB gaps-and-islands oracle
    * encoded the same wrong `>=` break — a latent divergence the
    * µs-precision fixture could never trip).
    * A session emits exactly when the event-time watermark passes its
    * lastTs + gap — append-mode results are FINAL: no above-watermark
    * event can change an emitted session, because every interval the
    * watermark hasn't released yet stays in state and remains
    * mergeable. State per user is O(unfinalized sessions) — bounded by
    * the watermark horizon / gap, typically one. Malformed records
    * (null timestamps from the permissive wire parse) are dropped
    * before keying — a null event time would otherwise NPE the state
    * function and kill the query. Input: output of
    * [[ProductViewPipeline.parse]]. */
  def userSessions(parsed: DataFrame, gapMs: Long = 30 * 60 * 1000L,
                   watermarkDelay: String = "10 minutes"): Dataset[UserSession] = {
    val clicks = parsed
      .select(col("userid"), col("source"), col("timestamp"))
      .filter(col("timestamp").isNotNull)
      .as[Click](clickEnc)
      .withWatermark("timestamp", watermarkDelay)

    def fin(userid: String, s: SessionState): UserSession =
      UserSession(userid, s.start, s.lastTs, s.nEvents,
        (s.lastTs.getTime - s.start.getTime) / 1000L)

    clicks
      .groupByKey(_.userid)
      .flatMapGroupsWithState[SessionsState, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userid: String, events: Iterator[Click], state: GroupState[SessionsState]) =>
          // Interval merge: carried unfinalized sessions plus this
          // batch's events, sorted by start, fold gap-connected
          // neighbors. Handles every ordering case uniformly —
          // in-batch gaps, out-of-order events that extend a session
          // backwards, late stragglers that bridge a previously-split
          // gap, and stragglers gap-separated before everything (which
          // form their own session, merging with each other when
          // adjacent). The timeout path is the same body with no
          // events: partition what the watermark has finalized.
          val wm = state.getCurrentWatermarkMs()
          val carried = state.getOption.map(_.items).getOrElse(Seq.empty)
          val points = events.toSeq
            .map(e => SessionState(e.timestamp, e.timestamp, 1L))
          val merged = (carried ++ points)
            .sortBy(iv => (iv.start.getTime, iv.lastTs.getTime))
            .foldLeft(List.empty[SessionState]) { (acc, iv) =>
              acc match {
                // <= : the boundary is inclusive (built-in parity) —
                // an event exactly gapMs after lastTs extends the session
                case h :: t if iv.start.getTime - h.lastTs.getTime <= gapMs =>
                  val last = if (iv.lastTs.after(h.lastTs)) iv.lastTs else h.lastTs
                  SessionState(h.start, last, h.nEvents + iv.nEvents) :: t
                case _ => iv :: acc
              }
            }.reverse // chronological, disjoint, gap-separated
          // strict <: with the inclusive merge rule an event at exactly
          // lastTs + gap still merges, and such an event at exactly the
          // current watermark is NOT late — the session may only
          // finalize once the watermark is strictly past its horizon
          val (done, open) =
            merged.partition(s => s.lastTs.getTime + gapMs < wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessionsState(open))
            // next finalization point; must sit above the watermark
            state.setTimeoutTimestamp(
              math.max(open.map(_.lastTs.getTime).min + gapMs, wm + 1))
          }
          done.map(s => fin(userid, s)).iterator
      }
  }

  /** Built-in streaming sessionization — the `session_window`
    * aggregation (MergingSessionsExec + state store) as the native
    * complement of [[userSessions]]' custom flatMapGroupsWithState:
    * identical merge semantics (INCLUSIVE at the gap boundary — two
    * events exactly `gap` apart merge into one session; see
    * [[userSessions]]' scaladoc for the r10 history of that
    * boundary), append mode finalizes a session when the watermark
    * passes its window END (= lastTs + gap, where [[userSessions]]
    * reports lastTs — the spec reconciles the two).
    * Prefer this one when the per-session output is a plain aggregate
    * (counts/sums): the state merge is engine-managed and codegen'd;
    * [[userSessions]] remains for session bodies the built-in can't
    * express (per-session event lists, custom finalization). The
    * BATCH twin with its DuckDB gap-and-islands oracle is
    * [[graft.queries.TemporalOps.sessionWindows]]. */
  def sessionWindowCounts(parsed: DataFrame, gap: String = "30 minutes",
                          watermarkDelay: String = "10 minutes"): DataFrame =
    parsed.select(col("userid"), col("timestamp"))
      .filter(col("timestamp").isNotNull)
      .withWatermark("timestamp", watermarkDelay)
      .groupBy(col("userid"), session_window(col("timestamp"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("userid"), col("session_window.start").as("start"),
              col("session_window.end").as("end"), col("n_events"))

  case class UserProfile(userid: String, lifetime_views: Long)
  implicit private val profileEnc: Encoder[UserProfile] = Encoders.product[UserProfile]

  /** Spark 4 `transformWithState` path: per-user lifetime view count
    * held in a `ValueState[Long]`. The modern arbitrary-state API —
    * typed state handles, timers, TTL — and the successor to
    * flatMapGroupsWithState; requires the RocksDB state store
    * provider (its only implementation). */
  private class ProfileProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, Click, UserProfile] {
    @transient private var views: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      views = getHandle.getValueState[Long](
        "views", Encoders.scalaLong, org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        userid: String, rows: Iterator[Click],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserProfile] = {
      val prev = if (views.exists()) views.get() else 0L
      val n = prev + rows.size
      views.update(n)
      Iterator.single(UserProfile(userid, n))
    }
  }

  /** Per-user lifetime view counts over the parsed click stream. */
  def userProfiles(parsed: DataFrame): Dataset[UserProfile] =
    parsed
      .select(col("userid"), col("source"), col("timestamp"))
      .as[Click](clickEnc)
      .groupByKey(_.userid)
      .transformWithState(
        new ProfileProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())

  /** Watermarked stream-stream join: views joined to purchases of the
    * same user within `maxDelay` after the view. Both sides carry
    * watermarks and the join condition bounds event time on both
    * sides, so Spark can evict join state (unbounded otherwise).
    * `joinType` extends the semantics to outer variants: with
    * "left_outer", a view whose match window the watermark has closed
    * emits once with null purchase columns — the conversion-funnel
    * "viewed but never bought" record, produced exactly when it is
    * safe to say so and never retracted. */
  def viewToPurchaseJoin(views: DataFrame, purchases: DataFrame,
                         watermark: String = "10 minutes",
                         maxDelay: String = "30 minutes",
                         joinType: String = "inner"): DataFrame = {
    val v = views
      .select(col("userid").as("v_user"), col("source"),
              col("timestamp").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val p = purchases
      .select(col("userid").as("p_user"), col("productid"),
              col("timestamp").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    v.join(p,
      col("v_user") === col("p_user") &&
      col("purchase_ts") >= col("view_ts") &&
      col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $maxDelay"),
      joinType)
  }
}
