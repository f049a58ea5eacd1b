package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (QueryDef.bench) against
  * SPARK_GRAFT_SF_DIR and prints one JSON line for the driver.
  *
  * Each query runs four times: a warm-up pass (JIT + codegen + page cache)
  * and three timed passes, recording the MEDIAN — a single GC pause or
  * scheduler stall in local mode can inflate one pass by multiples, and the
  * median is robust to one outlier where min-of-2 still let a lucky/unlucky
  * pair through. Execution materializes every output column through the noop
  * sink, so projections can't be cheated away by a count-only plan.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // NB: driver heap can't be set here (the JVM is already running in
      // local mode) — pass -J-Xmx/JAVA_OPTS at launch instead
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(q: QueryDef): Double = {
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // Optional subset for local iteration (unset → the headline set, as the
    // driver runs it; with a subset, ANY catalog query can be timed)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val results = only.fold(SparkEntry.benchQueries)(names => SparkEntry.all.filter(q => names(q.name)))
      .map { q =>
      // LSA's factorization memo is session-scoped product behavior: a
      // query needing components 1..k reuses whatever earlier queries
      // extracted (q105 after q103 pays only phase 2). Each timed pass
      // restores the memo to its PRE-warm-up state so the pass measures
      // that marginal work — never a free hit on its own warm-up's entry.
      // clearCache() below leaves the memo intact (checkpoint blocks are
      // persisted RDDs, not catalog cache entries), so cross-QUERY sharing
      // is exactly what a user session would see.
      val memoSnap = (ml.Lsa.memoSnapshot(), ml.Pca.memoSnapshot())
      def timedPass(): Double = {
        ml.Lsa.restoreMemo(memoSnap._1); ml.Pca.restoreMemo(memoSnap._2); runOnce(q)
      }
      try {
        runOnce(q) // warm-up: JIT, codegen cache, OS page cache
        // median of three timed passes — robust to a single outlier pass
        val ts = Array.fill(3)(timedPass()).sorted
        q.name -> ts(1)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          q.name -> -1.0
      } finally {
        // release operator pins and drop all cached data between queries:
        // each query is measured against a clean cache, not against the
        // accumulated pins of every query before it (the round-2 bench ran
        // 3-17x slower than isolated runs from exactly this leak)
        Caching.release()
        spark.catalog.clearCache()
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
