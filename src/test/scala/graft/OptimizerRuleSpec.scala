package graft

import graft.plans.LargeNotInListToAntiJoin
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

class OptimizerRuleSpec extends SparkSpec {
  import spark.implicits._

  private val bigList = (0 until 40).map(i => s"stop$i")

  // file-backed source: LocalRelation inputs get constant-folded away by
  // ConvertToLocalRelation before extra optimizer rules run
  private lazy val parquetPath: String = {
    val p = java.nio.file.Files.createTempDirectory("notin").toString + "/t"
    (Seq("keep1", "keep2", "stop3", "stop17") ++ Seq.fill(3)("keep1"))
      .toDF("term").write.mode("overwrite").parquet(p)
    p
  }
  private def df = spark.read.parquet(parquetPath)

  test("large NOT IN filters rewrite to a broadcast left-anti join") {
    val before = df.filter(!$"term".isInCollection(bigList))
      .as[String].collect().sorted.toSeq
    LargeNotInListToAntiJoin // ensure object init
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ LargeNotInListToAntiJoin
    try {
      val q = df.filter(!$"term".isInCollection(bigList))
      val antiJoins = q.queryExecution.optimizedPlan.collect {
        case j: Join if j.joinType == LeftAnti => j
      }
      assert(antiJoins.nonEmpty, "rule did not fire")
      assert(q.as[String].collect().sorted.toSeq == before)
      assert(before == Seq("keep1", "keep1", "keep1", "keep1", "keep2"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == LargeNotInListToAntiJoin)
    }
  }

  test("small lists and null-probe semantics stay untouched") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ LargeNotInListToAntiJoin
    try {
      // below threshold: no rewrite
      val small = df.filter(!$"term".isInCollection(Seq("stop3")))
      assert(small.queryExecution.optimizedPlan.collect {
        case j: Join if j.joinType == LeftAnti => j
      }.isEmpty)
      // null probes are dropped just like NOT IN semantics demand
      val p = java.nio.file.Files.createTempDirectory("notin_null").toString + "/t"
      (Seq("keep1", "stop3") :+ null.asInstanceOf[String]).toDF("term")
        .write.mode("overwrite").parquet(p)
      val out = spark.read.parquet(p)
        .filter(!$"term".isInCollection(bigList)).as[String].collect()
      assert(out.toSeq == Seq("keep1"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == LargeNotInListToAntiJoin)
    }
  }
}
