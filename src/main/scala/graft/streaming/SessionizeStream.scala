package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with EXPLICIT per-key state
  * (`flatMapGroupsWithState`, SURVEY §2 #24's custom-state path) — the
  * streaming twin of [[graft.operators.Sessionize]].
  *
  * State per user is one open session (start/last/count/sum). A new
  * event within `gapMinutes` of the last extends it; a later event
  * closes it (the closed session is EMITTED) and opens a new one; an
  * event-time timeout at `last + gap` (driven by the watermark) closes
  * idle sessions — so state is bounded by the number of concurrently
  * active users, never by history.
  *
  * Simplification (documented, spec-asserted): events are ordered
  * within each micro-batch; a cross-batch late event older than the
  * open session's start is treated as its own session. Production
  * variants buffer events up to the watermark before folding.
  */
object SessionizeStream extends Serializable {

  final case class SessionState(startUs: Long, lastUs: Long, n: Long, sum: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long,
                           sum_value: Double)

  private def toUs(ts: Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def toTs(us: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))

  // Same rounding as the batch twin's round(sum, 2) (Sessionize.scala):
  // Spark's Round is BigDecimal-HALF_UP over the shortest decimal repr,
  // so a sum landing exactly on a .005 boundary agrees in both twins.
  private def emit(user: Long, s: SessionState): Session =
    Session(user, toTs(s.startUs), toTs(s.lastUs), s.n,
      BigDecimal(s.sum).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)

  /** events: streaming DataFrame with (ts timestamp, user_id long,
    * value double). Returns closed sessions (append mode).
    */
  def sessions(events: DataFrame, gapMinutes: Int,
               watermark: String = "30 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val gapMs = gapMinutes * 60L * 1000L

    def fold(user: Long, it: Iterator[(Long, Timestamp, Double)],
             state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val closed = emit(user, state.get)
        state.remove()
        Iterator.single(closed)
      } else {
        val out = scala.collection.mutable.ListBuffer.empty[Session]
        var cur = state.getOption
        it.toSeq.sortBy(e => toUs(e._2)).foreach { case (_, ts, v) =>
          val us = toUs(ts)
          cur match {
            case Some(s) if us - s.lastUs <= gapUs && us >= s.startUs =>
              cur = Some(SessionState(s.startUs, math.max(s.lastUs, us), s.n + 1, s.sum + v))
            case Some(s) =>
              out += emit(user, s)
              cur = Some(SessionState(us, us, 1, v))
            case None =>
              cur = Some(SessionState(us, us, 1, v))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // clamp: a late event can make last+gap fall BEHIND the
          // current watermark, and setTimeoutTimestamp throws on that
          // (killing the query) — fire at the next opportunity instead
          val wm = state.getCurrentWatermarkMs()
          state.setTimeoutTimestamp(math.max(s.lastUs / 1000L + gapMs, wm + 1))
        }
        out.iterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"), col("value").cast("double"))
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fold)
  }
}
