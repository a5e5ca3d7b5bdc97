package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Custom streaming state (SURVEY.md §2.7 T5 extension): per-taxi
  * running session stats maintained with `flatMapGroupsWithState` —
  * the Structured Streaming primitive for state Spark's windowed
  * aggregates can't express (monotone per-key accumulators that emit
  * an update row per input batch).
  *
  * State per taxi: trips seen, revenue total, last trip end. Emits one
  * updated snapshot per taxi per micro-batch that touched it (Update
  * mode). State is bounded: one small case class per active taxi;
  * idle taxis are dropped via processing-time timeout.
  */
object TaxiSessionTracker {

  case class TripEvent(taxi_id: String, trip_total: Option[Double],
      trip_seconds: Option[Int])
  case class TaxiSession(taxi_id: String, trips: Long, revenue: Double,
      seconds: Long)

  def sessionState(trips: Dataset[TripEvent],
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      : Dataset[TaxiSession] = {
    import trips.sparkSession.implicits._
    trips
      .groupByKey(_.taxi_id)
      .flatMapGroupsWithState(OutputMode.Update, timeout) {
        (taxiId: String, events: Iterator[TripEvent],
            state: GroupState[TaxiSession]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(TaxiSession(taxiId, 0L, 0.0, 0L))
            events.foreach { e =>
              s = s.copy(
                trips = s.trips + 1,
                revenue = s.revenue + e.trip_total.getOrElse(0.0),
                seconds = s.seconds + e.trip_seconds.getOrElse(0).toLong)
            }
            state.update(s)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration("1 hour")
            Iterator.single(s)
          }
      }
  }

  /** DataFrame adapter from the cleaned trips stream. */
  def fromCleaned(cleaned: DataFrame): Dataset[TaxiSession] = {
    import cleaned.sparkSession.implicits._
    sessionState(cleaned
      .select("taxi_id", "trip_total", "trip_seconds").as[TripEvent])
  }

  /** The same per-taxi accumulator on Spark 4's `transformWithState`
    * (the arbitrary-state API that supersedes flatMapGroupsWithState):
    * typed `ValueState` obtained from the processor handle, optional
    * TTL instead of manual timeout bookkeeping, and composable
    * ListState/MapState/timers for richer state. Requires the RocksDB
    * state store provider
    * (`spark.sql.streaming.stateStore.providerClass` →
    * `...state.RocksDBStateStoreProvider`) — which is also the right
    * provider at 100 TB: state lives off-heap/on-disk with changelog
    * checkpointing instead of filling executor heaps. */
  class SessionProcessor
      extends StatefulProcessor[String, TripEvent, TaxiSession] {
    @transient private var session: ValueState[TaxiSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[TaxiSession](
        "session", Encoders.product[TaxiSession], TTLConfig.NONE)

    override def handleInputRows(taxiId: String, events: Iterator[TripEvent],
        timerValues: TimerValues): Iterator[TaxiSession] = {
      var s =
        if (session.exists()) session.get()
        else TaxiSession(taxiId, 0L, 0.0, 0L)
      events.foreach { e =>
        s = s.copy(
          trips = s.trips + 1,
          revenue = s.revenue + e.trip_total.getOrElse(0.0),
          seconds = s.seconds + e.trip_seconds.getOrElse(0).toLong)
      }
      session.update(s)
      Iterator.single(s)
    }
  }

  def sessionStateTws(trips: Dataset[TripEvent]): Dataset[TaxiSession] = {
    import trips.sparkSession.implicits._
    trips
      .groupByKey(_.taxi_id)
      .transformWithState(new SessionProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
