package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry of operator-pinned DataFrames.
  *
  * Several operators feed one frame into multiple plan branches (shingle sets,
  * quantized embeddings, edge tables) and pin it with `persist()`. Because the
  * returned plans are lazy, the operator itself can never release the pin —
  * only the caller knows when the result has been fully consumed. Round 2
  * shipped 11 pins and 1 release; in a long-lived session (a benchmark loop, a
  * notebook, a server) the pins accumulated until cache eviction thrashing
  * inflated later queries 3–17× (VERDICT r2 "What's wrong #2").
  *
  * The contract now: operators call [[pin]] (persist + register) instead of
  * `persist()` directly, and the caller invokes [[release]] once per unit of
  * work — after an action has consumed the operator's result — which
  * unpersists everything pinned since the previous release. [[Bench]] and
  * [[ScalingProbe]] release between queries; a user session would release
  * between pipeline runs. Frames whose lifetime IS operator-scoped (e.g.
  * [[graft.graph.Graphs.pageRank]]'s edge cache, dead once the final iteration
  * is checkpointed) unpersist themselves and never touch the registry.
  */
object Caching {

  private type PlanKey = org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  private val pinned = new java.util.concurrent.ConcurrentLinkedQueue[(DataFrame, PlanKey)]()

  // Spark's CacheManager keys cache entries by CANONICALIZED PLAN, so two
  // concurrent queries pinning plan-identical frames (q34's shingle set and
  // q70's, say) share ONE entry — and the first query's release would drop
  // it out from under the second query's still-running jobs. Worse than a
  // recompute: uncacheQuery(cascade = false) also re-compiles dependent
  // cache entries, and swapping a shared entry under a concurrently
  // EXECUTING iterative query was observed emitting duplicated rows
  // (q70/q72 at sf0.1 under Verify's 4-thread pool, round 5). Pins are
  // therefore reference-counted by the same canonicalized-plan key: the
  // physical unpersist happens only when the LAST holder releases.
  private val refCounts = new java.util.concurrent.ConcurrentHashMap[PlanKey, Integer]()

  // per-thread scope for concurrent units of work (see [[scoped]]): while a
  // scope is open on this thread, its pins bypass the global registry so a
  // concurrent caller's release() can never unpin another query's frames
  private val threadScope = new ThreadLocal[java.util.ArrayDeque[(DataFrame, PlanKey)]]()

  /** A pinned frame is by definition re-read by several downstream jobs, and
    * AQE cannot re-coalesce cached plans (canChangeCachedPlanOutputPartitioning
    * defaults false) — so a frame that arrives through an exchange would cache
    * at the full spark.sql.shuffle.partitions width and charge every consumer
    * that many tasks. Cap it at cluster parallelism before persisting (the
    * [[Par.compact]] rationale; at a cluster-shape 2048 partitions the probe
    * measured pin-heavy queries 3-4× slower without this). `coalesce` is
    * narrow: the producing exchange keeps its width, only the materialized
    * partition count changes.
    *
    * Idempotent on [[pin]]'s own output (ADVICE r10): re-pinning a returned
    * frame must not stack a second coalesce — that canonicalizes to a
    * DIFFERENT plan key, double-caching the frame and splitting its
    * refcount. A frame already topped by coalesce(defaultParallelism) is
    * returned as-is. */
  private def compact(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.Repartition
    val n = df.sparkSession.sparkContext.defaultParallelism
    df.queryExecution.logical match {
      case Repartition(`n`, false, _) => df
      case _ => df.coalesce(n)
    }
  }

  /** Persist `df` (compacted — see [[compact]]) at MEMORY_AND_DISK and
    * register it — with the enclosing [[scoped]] block if one is open on this
    * thread, else with the global registry for the next [[release]]. Returns
    * the pinned frame for chaining; consumers MUST read the returned frame,
    * not the argument, or they miss the cache entry. */
  def pin(rawDf: DataFrame): DataFrame = {
    val df = compact(rawDf)
    val key = df.queryExecution.analyzed.canonicalized
    // persist INSIDE the remapping function: ConcurrentHashMap runs it under
    // the key's bin lock, so the count increment and the CacheManager persist
    // are atomic per key. Without this there was a TOCTOU window (ADVICE r5):
    // an unpinning thread could remove the count-1 entry, then a pinning
    // thread merge→1 and no-op persist (entry still cached), then the
    // unpinner's deferred unpersist drops the entry the new pin thinks it
    // holds — the same mid-query corruption class the refcounts fixed, in a
    // narrower window.
    refCounts.compute(key, (_, v) => {
      // persist only on the FIRST pin: count ≥ 1 implies the entry is in the
      // CacheManager (the unpinner's unpersist runs under this same bin lock
      // and only at count 0), so re-persisting would just emit an "already
      // cached" warning per increment. Atomicity is unchanged — both the
      // 0→1 persist and the 1→0 unpersist happen inside the remapping
      // function.
      if (v == null) df.persist(StorageLevel.MEMORY_AND_DISK)
      Integer.valueOf(if (v == null) 1 else v + 1)
    })
    val scope = threadScope.get()
    if (scope != null) scope.add((df, key)) else pinned.add((df, key))
    df
  }

  /** Decrement the pin's plan refcount; unpersist only when it reaches zero
    * — a plan-identical pin held by a concurrent query keeps the entry. The
    * unpersist runs inside the remapping function for the same per-key
    * atomicity as [[pin]]'s persist (see there). */
  private def unpin(df: DataFrame, key: PlanKey): Unit =
    refCounts.computeIfPresent(key, (_, v) =>
      if (v <= 1) { df.unpersist(blocking = false); null }
      else Integer.valueOf(v - 1))

  /** Run `body` as one unit of work with its own pin scope: every [[pin]]
    * made on THIS thread inside `body` (plan construction and the blocking
    * action both run there) is released when `body` completes — other
    * threads' in-flight pins are untouched, including plan-identical ones
    * (refcounted). This is how a concurrent runner ([[Verify]]'s query pool)
    * gets per-query release without the global registry's all-or-nothing
    * semantics. Nesting restores the outer scope. */
  def scoped[T](body: => T): T = {
    val prev = threadScope.get()
    val mine = new java.util.ArrayDeque[(DataFrame, PlanKey)]()
    threadScope.set(mine)
    try body
    finally {
      if (prev != null) threadScope.set(prev) else threadScope.remove()
      mine.forEach { case (df, key) => unpin(df, key) }
    }
  }

  /** Release every globally-registered pin since the last release (frames
    * pinned inside a [[scoped]] block are excluded — their scope owns them).
    * Safe to call at any point where no pinned plan is still executing. */
  def release(): Unit = {
    var entry = pinned.poll()
    while (entry != null) {
      unpin(entry._1, entry._2)
      entry = pinned.poll()
    }
  }

  /** Currently registered global pin count (tests / monitoring). */
  def pinnedCount: Int = pinned.size()

  /** Live refcount entries across ALL holders — zero when every pin has
    * been released (tests / monitoring). */
  private[graft] def liveRefKeys: Int = refCounts.size()

  /** Refcount currently held for `df`'s canonicalized plan — zero when no
    * holder pins a plan-identical frame. Unlike [[liveRefKeys]] this is
    * stable under concurrent pinning of UNRELATED plans (tests that run in
    * parallel with other suites must assert on their own keys, not on the
    * global registry). Accepts the RAW (pre-pin) frame: the same [[compact]]
    * step [[pin]] applies is applied here before keying. */
  private[graft] def refCountOf(df: DataFrame): Int = {
    val v = refCounts.get(compact(df).queryExecution.analyzed.canonicalized)
    if (v == null) 0 else v.intValue()
  }
}
