package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the q106 ordered conversion funnel: per-user stage
  * timestamps (first view, first click AFTER that view, first purchase
  * AFTER that click) maintained continuously.
  *
  * Exactness under reordering: a stage min depends on the stages before it
  * (a click only counts if it follows the user's FIRST view), so events
  * cannot be folded in arrival order. Instead each user's state buffers
  * events inside the watermark horizon and folds ONLY those at or below
  * the current watermark, in event-time order — by the watermark contract
  * every event that could still affect that prefix has arrived, so the
  * fold equals the batch computation on the same prefix. Events later
  * than the watermark are dropped (the standard horizon trade, same as
  * `dropDuplicatesWithinWatermark` — a batch q106 sweep reconciles the
  * tail at rest).
  *
  * State per user: the three folded stage timestamps plus ONLY the not-
  * yet-final buffered events (bounded by the user's arrival volume inside
  * one watermark horizon — the reorder window, not history). Emission is
  * update-mode: a user re-emits its stage row whenever folding advanced
  * something.
  */
object StreamingFunnel {

  case class FunnelEvent(user_id: Long, event_type: String, ts: java.sql.Timestamp)

  /** Per-user funnel snapshot: micros since epoch per reached stage,
    * -1 for not reached. */
  case class FunnelStages(user_id: Long, t1: Long, t2: Long, t3: Long)

  /** Java-serialized to Array[Byte] state (the StreamingTopK pattern — the
    * tuple-list field trips the codegen'd product encoder). */
  private case class St(buffer: List[(Long, String)], t1: Long, t2: Long, t3: Long)
      extends Serializable

  private def stToBytes(s: St): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(s); oos.close()
    bos.toByteArray
  }

  private def stFromBytes(b: Array[Byte]): St = {
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(b))
    try ois.readObject().asInstanceOf[St] finally ois.close()
  }

  /** stages: the ordered event types, e.g. Seq("view", "click", "purchase")
    * — fixed to three for the state fold (q106's shape). */
  def funnelStages(events: Dataset[FunnelEvent], stages: Seq[String],
                   watermark: String): Dataset[FunnelStages] = {
    require(stages.size == 3, s"funnelStages expects exactly 3 ordered stages, got $stages")
    val spark = events.sparkSession
    import spark.implicits._
    val Seq(s1, s2, s3) = stages
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Array[Byte], FunnelStages](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[FunnelEvent], state: GroupState[Array[Byte]]) =>
          val prev = state.getOption.map(stFromBytes).getOrElse(St(Nil, -1L, -1L, -1L))
          val horizon = state.getCurrentWatermarkMs() * 1000L // micros
          // drop events already final past the horizon (they can no longer
          // change the fold: everything at/below the watermark is folded)
          // full-precision micros from the fractional second: getTime*1000
          // would truncate to ms, collapsing sub-millisecond-distinct events
          // onto one key and diverging from the batch q106 fold, which
          // compares timestamp[us] values exactly (ADVICE r7)
          val incoming = it
            .map { e =>
              val i = e.ts.toInstant
              (i.getEpochSecond * 1000000L + i.getNano / 1000L, e.event_type)
            }
            .filter(_._1 > horizon || horizon == 0L)
            .toList
          val all = prev.buffer ++ incoming
          // fold the final prefix (ts <= horizon) in event-time order; ties
          // on ts are order-independent (strict > gates between stages)
          val (ready, hold) = all.partition(_._1 <= horizon)
          var (t1, t2, t3) = (prev.t1, prev.t2, prev.t3)
          for ((ts, et) <- ready.sortBy(_._1)) {
            if (et == s1 && (t1 == -1L || ts < t1)) t1 = ts
            else if (et == s2 && t1 != -1L && ts > t1 && (t2 == -1L || ts < t2)) t2 = ts
            else if (et == s3 && t2 != -1L && ts > t2 && (t3 == -1L || ts < t3)) t3 = ts
          }
          val changed = t1 != prev.t1 || t2 != prev.t2 || t3 != prev.t3
          state.update(stToBytes(St(hold, t1, t2, t3)))
          // wake this key when the watermark moves past its oldest held
          // event, so buffered prefixes fold without new arrivals
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(hold.map(_._1).min / 1000L + 1L)
          if (changed || state.hasTimedOut) Iterator(FunnelStages(user, t1, t2, t3))
          else Iterator.empty
      }
  }
}
