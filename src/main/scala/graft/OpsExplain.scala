package graft

import org.apache.spark.sql.DataFrame

/** Dev hook for operator-LEVEL plan evidence (VERDICT r14 #8): loop bodies
  * that end in an eager `localCheckpoint` are invisible to query-level
  * explain (the query plan is a trivial `Scan ExistingRDD`), so the
  * operators dump the sub-computation's formatted plan themselves when
  * `GRAFT_EXPLAIN_OPS` is set. Zero cost when unset; never set by Bench,
  * Verify or the driver — this is a plans/<round> evidence generator only. */
object OpsExplain {
  private val on: Boolean = sys.env.contains("GRAFT_EXPLAIN_OPS")

  /** Print `df`'s formatted physical plan under `tag` (when enabled) and
    * return `df` unchanged — insert at the frame that is about to be
    * checkpointed, BEFORE the checkpoint/coalesce. */
  def dump(tag: String, df: DataFrame): DataFrame = {
    if (on) println(s"===== [ops-plan] $tag =====\n" +
      df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    df
  }
}
