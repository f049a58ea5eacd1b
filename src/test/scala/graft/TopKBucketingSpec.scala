package graft

import graft.ml.TopK
import graft.ml.TopK.Scored
import graft.operators.Bucketing
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class TopKBucketingSpec extends SparkSpec {
  import spark.implicits._

  test("top-k Aggregator equals the rank-window form") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map { i =>
      (s"g${i % 5}", i.toLong, math.floor(rnd.nextDouble() * 1000) / 1000)
    }
    val df = rows.toDF("g", "id", "score")
    // window form
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"score".desc, $"id".asc)
    val windowed = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 7)
      .select($"g", $"id", $"score")
      .as[(String, Long, Double)].collect().toSet
    // aggregator form
    val agged = df.as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => Scored(r._2, r._3))
      .agg(TopK.topK(7).toColumn)
      .flatMap { case (g, top) => top.map(s => (g, s.id, s.score)) }
      .collect().toSet
    assert(agged == windowed)
  }

  test("bucketed join on the bucket key plans with zero shuffle exchanges") {
    val tmp = java.nio.file.Files.createTempDirectory("buckets").toString
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Bucketing.writeBucketed(orders, "orders_b", s"$tmp/orders", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "lineitem_b", s"$tmp/lineitem", "l_orderkey", 4)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.read(spark, "orders_b")
        .join(Bucketing.read(spark, "lineitem_b"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // join is co-located; only the final small aggregation may exchange
      assert(exchanges.size <= 1)
      assert(joined.agg(sum($"n")).as[Long].head() == 6000L)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }
}
