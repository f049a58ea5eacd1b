package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-saving heavy-hitters sketch (Metwally/Agrawal/El Abbadi, ICDT 2005)
  * as a native mergeable aggregate — the bounded-memory answer to "top
  * frequent items" when the exact per-group counts would themselves be a
  * corpus-sized shuffle. With `capacity` = m counters over n updates:
  *
  *   - every item with true count c(x) > n/m is IN the summary
  *     (absent ⇒ c(x) ≤ error ≤ n/m);
  *   - estimates bracket the truth: c(x) ≤ est(x) ≤ c(x) + err(x).
  *
  * Update: hit → increment; miss with room → insert (1, 0); miss when full →
  * evict a minimum-estimate entry (deterministic tie-break: lexicographically
  * smallest item) and inherit its estimate as the newcomer's error — the
  * classic counter-inheritance that keeps est an overestimate.
  *
  * Merge (Agarwal et al., "Mergeable Summaries", PODS 2012): union-sum the
  * estimates and errors, compensating an item ABSENT from a full side by
  * that side's minimum estimate (an upper bound on what eviction may have
  * erased there — keeps the overestimate invariant; a non-full side absent
  * means truly zero), then prune back to the top-`capacity` estimates.
  * Errors stay additive: ε ≤ n_total/m after any merge tree, which is what
  * makes this a map-side-combinable Spark aggregate rather than a
  * single-pass streaming structure.
  *
  * Eviction scans the m counters linearly — O(m) per unseen item at a full
  * buffer; right for the m ≤ a-few-thousand sketch sizes this is for. A
  * production variant for huge m would pair the hash map with a min-heap
  * (same contract, same merge).
  *
  * eval returns the top-`k` entries as array<struct<item, est, err>>,
  * ordered by (est desc, item asc) — deterministic for a given summary.
  */
case class SpaceSavingTopK(
    child: Expression, capacity: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingTopK.Summary] with UnaryLike[Expression] {

  require(capacity >= 1, s"capacity=$capacity must be positive")
  require(k >= 1 && k <= capacity, s"k=$k must be in [1, capacity=$capacity]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string item column, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_freq"

  override def createAggregationBuffer(): SpaceSavingTopK.Summary =
    new SpaceSavingTopK.Summary(capacity)

  override def update(buf: SpaceSavingTopK.Summary, input: InternalRow): SpaceSavingTopK.Summary = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: SpaceSavingTopK.Summary, other: SpaceSavingTopK.Summary): SpaceSavingTopK.Summary =
    buf.mergeWith(other)

  override def eval(buf: SpaceSavingTopK.Summary): Any = {
    val top = buf.top(k)
    new GenericArrayData(top.map { case (item, est, err) =>
      InternalRow(UTF8String.fromString(item), est, err)
    })
  }

  override def serialize(buf: SpaceSavingTopK.Summary): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): SpaceSavingTopK.Summary =
    SpaceSavingTopK.Summary.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingTopK =
    copy(child = newChild)
}

object SpaceSavingTopK {

  /** m-counter space-saving state: item → [est, err]. Not thread-safe (each
    * Spark aggregation buffer is single-threaded). */
  final class Summary(val capacity: Int) {
    private[SpaceSavingTopK] val counts =
      new java.util.HashMap[String, Array[Long]](capacity * 2)

    private def isFull: Boolean = counts.size() >= capacity

    /** Minimum estimate across counters; 0 when not full (nothing was ever
      * evicted, so an absent item has true count 0). */
    private def minEst: Long = {
      if (!isFull) return 0L
      var m = Long.MaxValue
      val it = counts.values().iterator()
      while (it.hasNext) { val e = it.next()(0); if (e < m) m = e }
      m
    }

    def add(item: String): Unit = {
      val cur = counts.get(item)
      if (cur != null) { cur(0) += 1; return }
      if (!isFull) { counts.put(item, Array(1L, 0L)); return }
      // evict a min-estimate counter (smallest item among ties — deterministic
      // within a buffer) and inherit its estimate as the newcomer's error
      var evictItem: String = null
      var evictEst = Long.MaxValue
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val est = e.getValue()(0)
        if (est < evictEst || (est == evictEst && e.getKey < evictItem)) {
          evictItem = e.getKey; evictEst = est
        }
      }
      counts.remove(evictItem)
      counts.put(item, Array(evictEst + 1, evictEst))
    }

    def mergeWith(other: Summary): Summary = {
      if (other.counts.isEmpty) return this
      val min1 = minEst
      val min2 = other.minEst
      val merged = new java.util.HashMap[String, Array[Long]](counts.size() + other.counts.size())
      val it1 = counts.entrySet().iterator()
      while (it1.hasNext) {
        val e = it1.next()
        val o = other.counts.get(e.getKey)
        val v = e.getValue
        // absent from the other (full) side: anything up to min2 may have
        // been counted and evicted there — add it to BOTH est and err
        if (o != null) merged.put(e.getKey, Array(v(0) + o(0), v(1) + o(1)))
        else merged.put(e.getKey, Array(v(0) + min2, v(1) + min2))
      }
      val it2 = other.counts.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        if (!merged.containsKey(e.getKey)) {
          val v = e.getValue
          merged.put(e.getKey, Array(v(0) + min1, v(1) + min1))
        }
      }
      counts.clear()
      if (merged.size() <= capacity) counts.putAll(merged)
      else {
        // prune to the top-capacity estimates (tie: item asc) — the
        // mergeable-summaries bound keeps ε ≤ n_total/capacity
        val entries = new java.util.ArrayList(merged.entrySet())
        entries.sort { (a: java.util.Map.Entry[String, Array[Long]],
                        b: java.util.Map.Entry[String, Array[Long]]) =>
          val c = java.lang.Long.compare(b.getValue()(0), a.getValue()(0))
          if (c != 0) c else a.getKey.compareTo(b.getKey)
        }
        var i = 0
        while (i < capacity) {
          val e = entries.get(i)
          counts.put(e.getKey, e.getValue)
          i += 1
        }
      }
      this
    }

    /** Top-`k` by (est desc, item asc). */
    def top(k: Int): Array[(String, Long, Long)] = {
      val arr = new Array[(String, Long, Long)](counts.size())
      var i = 0
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        arr(i) = (e.getKey, e.getValue()(0), e.getValue()(1))
        i += 1
      }
      arr.sortBy { case (item, est, _) => (-est, item) }.take(k)
    }

    def toBytes: Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(capacity)
      out.writeInt(counts.size())
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val b = e.getKey.getBytes("UTF-8")
        out.writeInt(b.length)
        out.write(b)
        out.writeLong(e.getValue()(0))
        out.writeLong(e.getValue()(1))
      }
      out.flush()
      bos.toByteArray
    }
  }

  object Summary {
    def fromBytes(bytes: Array[Byte]): Summary = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val s = new Summary(in.readInt())
      val n = in.readInt()
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        s.counts.put(new String(b, "UTF-8"), Array(in.readLong(), in.readLong()))
        i += 1
      }
      s
    }
  }

  /** Column-API surface: `topkFreq(col, capacity, k)` as an aggregate column. */
  def apply(items: Column, capacity: Int, k: Int): Column =
    ColumnBridge.column(
      SpaceSavingTopK(ColumnBridge.expression(items), capacity, k)
        .toAggregateExpression())
}
