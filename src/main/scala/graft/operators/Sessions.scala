package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DecimalType}

/** Sessionization over the events stream: consecutive events of a user
  * belong to one session until a gap larger than `gapMinutes`.
  *
  * Two implementations with identical semantics:
  *  - `sessionizeBatch`: window lag → break marker → running sum (two
  *    passes over one shuffle on user_id) — SQL-expressible, so the
  *    DuckDB oracle can recompute it;
  *  - `SessionizeStream`: `flatMapGroupsWithState` keyed by user — the
  *    custom-state streaming operator (closed sessions emit as soon as a
  *    later event proves the gap; open sessions wait in state).
  */
object Sessions {

  /** Per-session aggregates; deterministic tie-break on (ts, event_id). */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(
        min(col("ts")).as("session_start"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DecimalType(38, 4)).as("total_value"))
      .orderBy(col("user_id"), col("sid"))
  }

  // ------------------------------------------------------- streaming
  final case class Ev(user_id: Long, event_id: Long, tsMicros: Long, value: Double)
  /** `totalE4` accumulates value in EXACT 1e-4 units (each event rounded
    * HALF_UP to 4 dp first, the same rule as the batch path's
    * `cast(DecimalType(18,4))`) — a Double running total would drift
    * from the batch aggregation by float error over a long session. */
  final case class SessionState(startMicros: Long, lastMicros: Long, n: Long, totalE4: Long)
  final case class Session(user_id: Long, startMicros: Long, n_events: Long, total_value: Double)

  private def toE4(v: Double): Long =
    BigDecimal.decimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      .underlying.unscaledValue.longValueExact

  // ------------------------------------------------- streaming funnel
  final case class FEv(user_id: Long, event_id: Long, tsMicros: Long, event_type: String)
  final case class FunnelState(stagesDone: Int, lastMicros: Long)
  final case class StageHit(user_id: Long, stage: String, tsMicros: Long)

  /** Streaming funnel: per-user stage state machine over
    * `flatMapGroupsWithState`. A user advances to stage k+1 on the first
    * event of that stage type with a timestamp strictly after the stage-k
    * completion; each advance emits a `StageHit` immediately (no waiting
    * for the stream to end — the batch funnel query only answers after a
    * full pass). Greedy earliest-advance is optimal here, so membership
    * matches the batch funnel's min-timestamp construction exactly.
    * Events are sorted per batch; cross-batch per-key order is the
    * stream's responsibility (same contract as sessionizeStream). State
    * is two numbers per user — bounded regardless of stream length. */
  def funnelStream(
      spark: SparkSession,
      events: Dataset[FEv],
      stages: Seq[String]): Dataset[StageHit] = {
    import spark.implicits._
    require(stages.distinct == stages,
      s"funnel stages must be distinct (the per-stage index is a map), got $stages")
    val stageIdx = stages.zipWithIndex.toMap
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[FEv], state: GroupState[FunnelState]) =>
          val sorted = it.toVector.sortBy(e => (e.tsMicros, e.event_id))
          var cur = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val start = cur
          val hits = Vector.newBuilder[StageHit]
          sorted.foreach { e =>
            if (cur.stagesDone < stages.length &&
                stageIdx.get(e.event_type).contains(cur.stagesDone) &&
                (cur.stagesDone == 0 || e.tsMicros > cur.lastMicros)) {
              cur = FunnelState(cur.stagesDone + 1, e.tsMicros)
              hits += StageHit(user, stages(cur.stagesDone - 1), e.tsMicros)
            }
          }
          // write state ONLY on progress: an unconditional update would
          // create a permanent NoTimeout state entry for EVERY user that
          // ever emits any event (funnel-relevant or not) and rewrite it
          // each batch — state growing with the user universe, not with
          // funnel participation
          if (cur != start) state.update(cur)
          hits.result().iterator
      }
  }

  /** flatMapGroupsWithState session assembly: events for a user extend
    * the open session or close it (emitting) when the gap exceeds the
    * threshold. Events within a batch are sorted by (ts, event_id) —
    * cross-batch order is the stream's responsibility (CDC feeds are
    * per-key ordered). The final open session stays in state until a
    * later event closes it (a stream with a liveness/heartbeat event per
    * key gets completion for free; timeouts would force continuous
    * no-data batches under the default trigger). */
  def sessionizeStream(
      spark: SparkSession,
      events: Dataset[Ev],
      gapMinutes: Int): Dataset[Session] = {
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Ev], state: GroupState[SessionState]) =>
          // NoTimeout is registered, so no hasTimedOut branch exists:
          // open sessions close only via a later event (liveness events
          // per key give completion for free — see scaladoc)
          val sorted = it.toVector.sortBy(e => (e.tsMicros, e.event_id))
          val closed = Vector.newBuilder[Session]
          var cur = state.getOption
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.tsMicros - s.lastMicros <= gapMicros =>
                cur = Some(s.copy(lastMicros = e.tsMicros, n = s.n + 1,
                  totalE4 = s.totalE4 + toE4(e.value)))
              case Some(s) =>
                closed += Session(user, s.startMicros, s.n, s.totalE4 / 1e4)
                cur = Some(SessionState(e.tsMicros, e.tsMicros, 1, toE4(e.value)))
              case None =>
                cur = Some(SessionState(e.tsMicros, e.tsMicros, 1, toE4(e.value)))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }
}
