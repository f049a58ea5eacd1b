package graft

import graft.operators.Bloom
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** [[Bloom.prunedJoin]] — the runtime-filter-shaped join. The contract is
  * twofold: (1) semantics are EXACTLY the plain inner join at any (k, m) —
  * false positives survive the prune but never the exact join; (2) the prune
  * is a per-row filter on the fact side BELOW its shuffle exchange, so the
  * exchange moves only rows that can possibly match. */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def fact = (1L to 500L).map(i => (i, s"f$i")).toDF("fk", "payload")
  private def dim = (1L to 500L).filter(_ % 7 == 0).map(i => (i, s"d$i"))
    .toDF("dk", "attr")

  private def plain = fact.join(dim, col("fk") === col("dk"))
    .select(col("fk"), col("payload"), col("attr"))
    .as[(Long, String, String)].collect().toSeq.sorted

  test("pruned join equals the plain inner join at a production-sized filter") {
    val got = Bloom.prunedJoin(fact, "fk", dim, "dk", k = 5, m = 1 << 12)
      .select(col("fk"), col("payload"), col("attr"))
      .as[(Long, String, String)].collect().toSeq.sorted
    assert(got == plain)
  }

  test("false positives do not change the result: tiny filter, heavy collisions") {
    // m = 64 bits for 71 member keys × k=3 positions — the filter is near
    // saturated, so most non-members collide through; the exact join must
    // still remove every one of them.
    val words = Bloom.build(dim.select(col("dk").cast("string")), k = 3, m = 64)
    val passed = fact.filter(
      Bloom.containsAll(words, Bloom.positions(col("fk").cast("string"), 3, 64)))
      .count()
    assert(passed > dim.count(), "expected false positives through a saturated filter")
    val got = Bloom.prunedJoin(fact, "fk", dim, "dk", k = 3, m = 64)
      .select(col("fk"), col("payload"), col("attr"))
      .as[(Long, String, String)].collect().toSeq.sorted
    assert(got == plain)
  }

  test("no false negatives at any size: every true match survives the prune") {
    for (m <- Seq(64, 256, 1 << 12); k <- Seq(1, 3, 7)) {
      val n = Bloom.prunedJoin(fact, "fk", dim, "dk", k, m).count()
      assert(n == plain.size, s"k=$k m=$m")
    }
  }

  test("plan shape: the getbit prune sits below the fact-side shuffle exchange") {
    // force the shuffle join the operator exists for (at test scale the dim
    // would otherwise broadcast and no exchange appears at all)
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val out =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        // a Range-backed fact: local Seq relations get the filter folded into
        // LocalTableScan at optimize time, hiding the shape under test
        val factScan = spark.range(1, 501)
          .select(col("id").as("fk"), concat(lit("f"), col("id")).as("payload"))
        val df = Bloom.prunedJoin(factScan, "fk", dim, "dk", k = 5, m = 1 << 12)
        df.collect()
        df
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
    val exchanges = out.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    // the fact-side exchange must have the membership filter beneath it, so
    // pruned rows are dropped before any byte is shuffled
    val pruned = exchanges.exists(_.child.collect {
      case f: FilterExec if f.condition.toString.contains("getbit") => f
    }.nonEmpty)
    assert(pruned, out.queryExecution.executedPlan.toString)
  }
}
