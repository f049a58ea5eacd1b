package graft

import org.apache.spark.sql.functions._
import graft.plans.SkewLint

/** The SkewLint contract demonstrated on miniatures of the round-10
  * skew-probe plan shapes (SCALING.md "AQE skew-join vs the manual salt"):
  * flag on shape B (bare join, dim aggregate in-plan — AQE silently
  * disqualified), silence on shape A (same-key downstream groupBy — the
  * exchange-reusing design where even forced splitting is vetoed) and on
  * shape C (dim pre-materialized — the one shape OptimizeSkewedJoin
  * actually handles), silence when the dim is broadcastable. */
class SkewLintSpec extends SparkSpec {

  private def ev = spark.range(1000)
    .select((col("id") % 5).cast("string").as("event_type"),
      col("id").cast("double").as("value"))

  private def dim = ev.groupBy(col("event_type"))
    .agg(avg(col("value")).as("type_avg"))

  private def withNoBroadcast[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("shape B (in-plan dim aggregate, no downstream requirement) is flagged") {
    withNoBroadcast {
      val joined = ev.join(dim, "event_type")
        .select(when(col("value") > col("type_avg"), 1L).otherwise(0L).as("above"))
        .agg(sum(col("above")).as("n_above"))
      val findings = SkewLint.check(joined, Set("event_type"))
      assert(findings.map(_.key) == Seq("event_type"))
      assert(findings.head.message.contains("Skew.saltedJoin"))
    }
  }

  test("shape A (join feeds a same-join-key groupBy) is silent") {
    withNoBroadcast {
      val joined = ev.join(dim, "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") > col("type_avg"), 1L).otherwise(0L)).as("n_above"))
      assert(SkewLint.check(joined, Set("event_type")).isEmpty)
    }
  }

  test("shape C (dim pre-materialized) is silent") {
    withNoBroadcast {
      val dimMat = dim.coalesce(1).localCheckpoint(eager = true)
      val joined = ev.join(dimMat, "event_type")
        .select(when(col("value") > col("type_avg"), 1L).otherwise(0L).as("above"))
        .agg(sum(col("above")).as("n_above"))
      assert(SkewLint.check(joined, Set("event_type")).isEmpty)
    }
  }

  test("a broadcastable dim is silent (no skewed shuffle exists to split)") {
    // default threshold (10 MB) — the 5-row dim's stats sit far below it
    val joined = ev.join(dim, "event_type")
      .select(when(col("value") > col("type_avg"), 1L).otherwise(0L).as("above"))
      .agg(sum(col("above")).as("n_above"))
    assert(SkewLint.check(joined, Set("event_type")).isEmpty)
  }

  test("shape B on DIFFERENTLY-named join columns is flagged via either name") {
    // fact.event_type = dim.etype — annotating either side's name must
    // catch it (ADVICE r11: the same-name-only matcher silently skipped
    // renamed dim keys)
    withNoBroadcast {
      val dimRenamed = dim.withColumnRenamed("event_type", "etype")
      val joined = ev.join(dimRenamed, col("event_type") === col("etype"))
        .select(when(col("value") > col("type_avg"), 1L).otherwise(0L).as("above"))
        .agg(sum(col("above")).as("n_above"))
      assert(SkewLint.check(joined, Set("event_type")).map(_.key) == Seq("event_type"))
      assert(SkewLint.check(joined, Set("etype")).map(_.key) == Seq("etype"))
    }
  }

  test("differently-named hot join feeding a groupBy on EITHER alias is silent") {
    withNoBroadcast {
      val dimRenamed = dim.withColumnRenamed("event_type", "etype")
      val joined = ev.join(dimRenamed, col("event_type") === col("etype"))
        .groupBy(col("etype"))
        .agg(sum(when(col("value") > col("type_avg"), 1L).otherwise(0L)).as("n_above"))
      assert(SkewLint.check(joined, Set("event_type")).isEmpty)
    }
  }

  test("keys not annotated as skewed are never flagged") {
    withNoBroadcast {
      val joined = ev.join(dim, "event_type")
        .select(when(col("value") > col("type_avg"), 1L).otherwise(0L).as("above"))
        .agg(sum(col("above")).as("n_above"))
      assert(SkewLint.check(joined, Set("other_key")).isEmpty)
    }
  }
}
