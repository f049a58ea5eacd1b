package graft.streaming

import graft.functions.SpaceSavingTopK.Summary
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous heavy hitters: the streaming twin of the batch
  * [[graft.functions.SpaceSavingTopK]] aggregate, holding one space-saving
  * summary per key in `flatMapGroupsWithState` state and re-emitting the
  * key's current top-k on every micro-batch that touches it.
  *
  * The state IS the batch aggregate's buffer (same [[Summary]], same
  * serialized form), so the streaming path inherits the batch guarantees
  * verbatim: after n updates to a key, every item with true count > n/m is
  * in the summary and c(x) ≤ est(x) ≤ c(x) + err(x) — the sketch is a
  * sequential fold, and a micro-batch boundary is just a fold boundary
  * (StreamingTopKSpec pins exact-mode parity with the batch aggregate and
  * the guarantee under cross-batch eviction).
  *
  * Scale shape: state per key is the FIXED m-counter buffer regardless of
  * stream length — the unbounded per-(key, item) running-count state a naive
  * `groupBy(key, item).count` stream would accumulate is exactly what this
  * avoids. The state store partitions on the key with the shuffle, like any
  * stateful aggregation.
  */
object StreamingTopK {

  case class KeyedItem(key: String, item: String)
  case class TopEntry(key: String, item: String, est: Long, err: Long)

  def topkFreq(items: Dataset[KeyedItem], capacity: Int, k: Int): Dataset[TopEntry] = {
    import items.sparkSession.implicits._
    items.groupByKey(_.key)
      .flatMapGroupsWithState[Array[Byte], TopEntry](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedItem], state: GroupState[Array[Byte]]) =>
          val summary = state.getOption.map(Summary.fromBytes)
            .getOrElse(new Summary(capacity))
          rows.foreach(r => if (r.item != null) summary.add(r.item))
          state.update(summary.toBytes)
          summary.top(k).iterator.map { case (item, est, err) =>
            TopEntry(key, item, est, err)
          }
      }
  }
}
