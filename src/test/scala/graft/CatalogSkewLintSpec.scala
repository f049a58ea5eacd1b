package graft

import graft.plans.SkewLint

/** Standing CI guard: [[graft.plans.SkewLint]] walks EVERY bench-set query
  * plan with the catalog's known hot keys annotated, turning the round-10
  * skew measurement ("AQE silently declines shape B" — SCALING.md, probed
  * at 90 % key concentration on the events fact) into permanent regression
  * protection (VERDICT r11 #4). The one annotated hot key is `event_type`:
  * the events fact's 5-value key whose click/view concentration the q93
  * salted-join row exists for.
  *
  * Two postures:
  *   - DEFAULT broadcast threshold — what the plans actually compile to.
  *     Must be finding-free: every event_type join either broadcasts its
  *     dim, feeds a same-key aggregate (the exchange-reuse design SkewLint
  *     deliberately spares), or salts (q93 — the salted key is a synthetic
  *     concat column, invisible to the lint by construction).
  *   - BROADCAST DISABLED — the stress posture: which joins' skew story
  *     RELIES on the dim being broadcastable? Those are pinned, each with
  *     the reason the reliance is sound at 100 TB: their dim side is
  *     bounded by the key's own cardinality (|event_type| ≤ 5, or the
  *     5×24 type-hour grid), so "the dim broadcasts" holds at ANY corpus
  *     scale — the fact side grows, the dim side cannot. A NEW name in
  *     this list means a new event_type join whose dim is NOT provably
  *     bounded — adjudicate it (materialize the dim or salt) before
  *     pinning.
  */
// Slow tier (VERDICT r12 #4): excluded from the default `sbt test` run —
// the full tier runs with GRAFT_SLOW_TESTS=1 (round_close.sh does).
@org.scalatest.tags.Slow
class CatalogSkewLintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val hotKeys = Set("event_type")

  /** Accepted (query, key) findings under the no-broadcast stress: joins
    * whose dim side is bounded by the hot key's own cardinality, so the
    * broadcast these plans rely on can never outgrow an executor.
    *
    *   - q129_hll_portable: est⋈exact on event_type — the exact side is a
    *     groupBy(event_type) distinct-count, ≤ |event_type| = 5 rows at any
    *     corpus scale; the broadcast is structurally safe. */
  private val pinnedNoBroadcast: Set[(String, String)] = Set(
    ("q129_hll_portable", "event_type"))

  // one walk, both postures: the optimized LOGICAL plan does not depend on
  // the broadcast threshold (SkewLint reads the threshold live at check
  // time, against plan stats), so each query is constructed once — the
  // construction, not the lint, is the expensive part (BPE/PageRank-style
  // rows run bounded driver loops when built)
  private lazy val (findingsDefault, findingsNoBroadcast) = {
    val perQuery = SparkEntry.benchQueries.map { q =>
      Caching.scoped {
        val df = q.run(spark, dir)
        val dflt = SkewLint.check(df, hotKeys).map(f => (q.name, f.key))
        val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val stress =
          try SkewLint.check(df, hotKeys).map(f => (q.name, f.key))
          finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        (dflt, stress)
      }
    }
    (perQuery.flatMap(_._1), perQuery.flatMap(_._2).toSet)
  }

  test("bench catalog is SkewLint-clean on the annotated hot keys") {
    assert(findingsDefault.isEmpty,
      s"new skew-trap joins (AQE will silently not split these): $findingsDefault")
  }

  test("broadcast-reliant hot-key joins are exactly the pinned set") {
    assert(findingsNoBroadcast == pinnedNoBroadcast,
      s"unpinned: ${findingsNoBroadcast -- pinnedNoBroadcast}; " +
        s"stale pins: ${pinnedNoBroadcast -- findingsNoBroadcast}")
  }
}
