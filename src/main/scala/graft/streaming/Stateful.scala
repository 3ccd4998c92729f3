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
  case class UserSession(userid: String, start: Timestamp, end: Timestamp,
                         nEvents: Long, durationS: Long)

  implicit private val clickEnc: Encoder[Click] = Encoders.product[Click]
  implicit private val stateEnc: Encoder[SessionState] = Encoders.product[SessionState]
  implicit private val outEnc: Encoder[UserSession] = Encoders.product[UserSession]
  implicit private val stringEnc: Encoder[String] = Encoders.STRING

  /** Event-time sessionization: one session per user while gaps stay
    * under `gapMs`; a session closes (and emits) when the event-time
    * watermark passes lastTs + gap. State per user is O(1) — start,
    * last timestamp, count — and is dropped on emit, so total state is
    * bounded by active users within the watermark horizon, not by
    * history. Input: output of [[ProductViewPipeline.parse]]. */
  def userSessions(parsed: DataFrame, gapMs: Long = 30 * 60 * 1000L,
                   watermarkDelay: String = "10 minutes"): Dataset[UserSession] = {
    val clicks = parsed
      .select(col("userid"), col("source"), col("timestamp"))
      .as[Click](clickEnc)
      .withWatermark("timestamp", watermarkDelay)

    def fin(userid: String, s: SessionState): UserSession =
      UserSession(userid, s.start, s.lastTs, s.nEvents,
        (s.lastTs.getTime - s.start.getTime) / 1000L)

    clicks
      .groupByKey(_.userid)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userid: String, events: Iterator[Click], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val done = fin(userid, state.get)
            state.remove()
            Iterator.single(done)
          } else {
            val out = scala.collection.mutable.ListBuffer.empty[UserSession]
            var cur = state.getOption
            for (e <- events.toSeq.sortBy(_.timestamp.getTime)) {
              cur match {
                case Some(s) if e.timestamp.getTime - s.lastTs.getTime <= gapMs
                    && s.start.getTime - e.timestamp.getTime <= gapMs =>
                  // monotonic bounds: a cross-batch out-of-order event
                  // older than the session's lastTs (negative gap) must
                  // extend the session backwards, never move lastTs
                  // backwards or produce end < start
                  val last = if (e.timestamp.after(s.lastTs)) e.timestamp else s.lastTs
                  val first = if (e.timestamp.before(s.start)) e.timestamp else s.start
                  cur = Some(SessionState(first, last, s.nEvents + 1))
                case Some(s) if e.timestamp.getTime - s.lastTs.getTime <= gapMs =>
                  // late straggler above the watermark but gap-separated
                  // BEFORE the session start: it belongs to an earlier,
                  // already-closed session. Emit it as its own session
                  // instead of fusing two gap-separated sessions.
                  out += UserSession(userid, e.timestamp, e.timestamp, 1L, 0L)
                case Some(s) => // in-batch gap: close the old session now
                  out += fin(userid, s)
                  cur = Some(SessionState(e.timestamp, e.timestamp, 1L))
                case None =>
                  cur = Some(SessionState(e.timestamp, e.timestamp, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout must sit above the current watermark
              state.setTimeoutTimestamp(
                math.max(s.lastTs.getTime + gapMs, state.getCurrentWatermarkMs + 1))
            }
            out.iterator
          }
      }
  }

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

  /** Watermarked stream-stream inner join: views joined to purchases
    * of the same user within `maxDelay` after the view. Both sides
    * carry watermarks and the join condition bounds event time on both
    * sides, so Spark can evict join state (unbounded otherwise). */
  def viewToPurchaseJoin(views: DataFrame, purchases: DataFrame,
                         watermark: String = "10 minutes",
                         maxDelay: String = "30 minutes"): DataFrame = {
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
      col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $maxDelay"))
  }
}
