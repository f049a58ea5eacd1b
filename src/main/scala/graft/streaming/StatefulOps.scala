package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary stateful streaming (SURVEY.md §2.7 W1 scale path): per-key
  * running aggregates via `flatMapGroupsWithState` — the primitive for
  * operators the built-in windowed aggregations can't express (running
  * distinct-ish counters, session rollups, per-entity model state).
  *
  * State is per-key and bounded by the key cardinality; at cluster scale the
  * state store partitions with the shuffle, so this scales exactly like a
  * groupBy on the same key.
  */
object StatefulOps {

  case class KeyedValue(key: Long, value: Double)
  case class RunningStats(key: Long, n: Long, sum: Double, max: Double)

  /** Running (count, sum, max) per key, emitted on every update batch. */
  def runningStats(events: Dataset[KeyedValue]): Dataset[RunningStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[RunningStats, RunningStats](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[KeyedValue], state: GroupState[RunningStats]) =>
          val prev = state.getOption.getOrElse(RunningStats(key, 0L, 0.0d, Double.MinValue))
          var n = prev.n
          var sum = prev.sum
          var mx = prev.max
          rows.foreach { r => n += 1; sum += r.value; mx = math.max(mx, r.value) }
          val next = RunningStats(key, n, sum, mx)
          state.update(next)
          Iterator.single(next)
      }
  }
}
