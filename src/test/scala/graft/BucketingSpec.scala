package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._

/** Plan contracts for the q227 bucketed layout: persisting both fact tables
  * `bucketBy(16, <orderkey>)` must (a) remove BOTH shuffle exchanges under
  * the orders⋈lineitem sort-merge join — the property that deletes the two
  * biggest exchanges of a fact-fact join at 100 TB — and (b) prune a point
  * predicate on the bucket key to a single bucket's files
  * (SelectedBucketsCount 1/16), the key-lookup file skip. Broadcast is
  * disabled inside the suite so the small test SF actually plans the
  * sort-merge join the cluster-scale shape would use. */
class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withSmj[A](body: => A): A = {
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    // AQE off so collect{} sees the physical tree, not the adaptive wrapper
    val prevA = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  private def collectAll[A](p: SparkPlan)(f: PartialFunction[SparkPlan, A]): Seq[A] =
    (p.collect(f)) ++ p.subqueries.flatMap(collectAll(_)(f))

  test("bucketed orders⋈lineitem sort-merge join plans with zero input exchanges") {
    withSmj {
      // materialize the bucketed tables (idempotent overwrite inside q227)
      SparkEntry.queries("q227_bucketed_join")(spark, dir).collect()
      val tag = graft.Scratch.tag(dir)
      val joined = spark.table(s"orders_b_$tag")
        .join(spark.table(s"lineitem_b_$tag"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderpriority"), col("l_extendedprice"))
      val plan = joined.queryExecution.executedPlan
      val smjs = collectAll(plan) { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, s"expected a sort-merge join:\n$plan")
      val exchanges = collectAll(plan) { case e: ShuffleExchangeExec => e }
      assert(exchanges.isEmpty,
        s"bucketed join must not shuffle either side:\n$plan")
    }
  }

  test("point predicate on the bucket key prunes to 1 of 16 buckets") {
    withSmj {
      SparkEntry.queries("q227_bucketed_join")(spark, dir).collect()
      val tag = graft.Scratch.tag(dir)
      val probe = spark.table(s"orders_b_$tag").filter(col("o_orderkey") === 7L)
      val scans = collectAll(probe.queryExecution.executedPlan) {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty)
      val pruned = scans.head.optionalBucketSet
      assert(pruned.isDefined, "bucket pruning did not engage")
      assert(pruned.get.cardinality() == 1,
        s"expected 1 selected bucket, got ${pruned.get.cardinality()}")
    }
  }

  test("q230 partitioned layout: lang predicate prunes directories at plan time") {
    withSmj {
      // materialize the partitioned layout (idempotent overwrite inside q230)
      SparkEntry.queries("q230_partition_pruned_scan")(spark, dir).collect()
      val base = graft.Scratch.dir("graft_part_", dir)
      val en = spark.read.parquet(base).filter(col("lang") === "en")
        .select(col("doc_id"))
      val scans = collectAll(en.queryExecution.executedPlan) {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty)
      val scan = scans.head
      // the predicate must live in partitionFilters (directory pruning),
      // never in dataFilters (per-row evaluation after reading the bytes)
      assert(scan.partitionFilters.exists(_.references.exists(_.name == "lang")),
        s"lang predicate missing from partitionFilters: ${scan.partitionFilters}")
      assert(!scan.dataFilters.exists(_.references.exists(_.name == "lang")),
        s"lang predicate leaked into dataFilters: ${scan.dataFilters}")
      val langs = spark.read.parquet(base).select(col("lang")).distinct().count()
      assert(langs > 1, "fixture must have multiple partitions")
      assert(scan.selectedPartitions.partitionCount == 1,
        s"expected 1 of $langs directories, read ${scan.selectedPartitions.partitionCount}")
    }
  }

  test("bucketed round-trip result equals the direct parquet join") {
    withSmj {
      val bucketed = SparkEntry.queries("q227_bucketed_join")(spark, dir)
        .orderBy(col("o_orderpriority")).collect().toSeq
      val direct = graft.sources.Tables(spark, dir, "orders")
        .join(graft.sources.Tables(spark, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          graft.functions.Exprs.dsum(
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("o_orderpriority")).collect().toSeq
      assert(bucketed == direct)
    }
  }
}
