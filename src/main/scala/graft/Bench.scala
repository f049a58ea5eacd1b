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
  * HEAVY rows run in a DEDICATED FINAL SWEEP inside a FRESH SparkSession
  * (VERDICT r9 #2, r10 #1): across a ~137-row session the JVM accumulates
  * state (hundreds of compiled plans, codegen cache, heap fragmentation
  * feeding GC pauses into multi-job loops) that inflates late multi-second
  * rows ~3× over their idle-box cost — round 9 committed q116 at 8.77 s vs
  * 2.85 s solo; round 10 fixed that with a final sweep but hardcoded its
  * membership to the LSA/PCA family, so the driver then committed q197
  * (added the same round) at 37.7 s vs 10.4 s solo. Membership is now
  * COST-BASED: any row whose warm-up pass exceeds [[Bench.lateThresholdSec]]
  * joins the final sweep automatically (warm-up runs early-session, before
  * the tax builds, so it is an honest cost signal — JIT-cold, hence
  * conservative: it over-includes, never under-includes), unioned with the
  * LSA/PCA factorization family whose memo discipline needs the dedicated
  * context regardless of cost. The final sweep then runs in a fresh
  * SparkSession on the SAME context (session state dropped, factorization
  * memos cleared, its own warm-up retaking memo snapshots) — the reset the
  * 21-heavy-context probes showed restores every row to its solo cost —
  * while keeping the same interleaved 3-pass anti-stall discipline within
  * the sweep.
  *
  * Execution materializes every output column through the noop sink, so
  * projections can't be cheated away by a count-only plan. The JSON line is
  * ALSO written to bench.json next to the working directory — round 8's
  * driver artifact kept only a truncated 4 KB tail of the stdout line (59 of
  * ~107 rows), so the artifact now survives log truncation (the
  * Verify/failed.json lesson applied to the bench).
  */
object Bench {

  /** Warm-up-pass cost above which a row is measured in the dedicated final
    * sweep. ~5 s solo steady-state is where the late-session tax becomes
    * visible (VERDICT r10 #1); warm-up time runs 1.5–2× steady state
    * (JIT-cold), so thresholding the warm-up at the same 5 s pulls in rows
    * from ~2.5 s steady — deliberately conservative. */
  val lateThresholdSec: Double =
    sys.env.get("SPARK_GRAFT_BENCH_LATE_SEC").map(_.toDouble).getOrElse(5.0)

  /** The factorization family always takes the final sweep: its session
    * memo discipline (snapshot/restore of shared components) wants the
    * dedicated context, and its rows were the original late-tax victims. */
  val lateAlways = Set("q103_lsa_component", "q105_lsa_second",
    "q109_lsa_topk", "q119_lsa_doc_scores", "q116_pca_component",
    "q117_pca_scores", "q123_pca_topk")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_SHUFFLE_PARTITIONS: cluster-shape probe knob (SCALING.md
    // partition-count section) — the driver's runs keep the default 32.
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    def newSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", shufflePartitions)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        // NB: driver heap can't be set here (the JVM is already running in
        // local mode) — pass -J-Xmx/JAVA_OPTS at launch instead
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    var spark = newSession()

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

    // A rename of any lateAlways query must fail loudly, not silently drop
    // the row back into the main sweep and invalidate the late-sweep
    // methodology (ADVICE r10). Checked against the full catalog so subset
    // runs catch it too.
    locally {
      val catalog = SparkEntry.all.map(_.name).toSet
      val unresolved = lateAlways.filterNot(catalog)
      require(unresolved.isEmpty,
        s"Bench.lateAlways names not in the catalog (renamed?): ${unresolved.mkString(", ")}")
    }

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

    val diag = sys.env.contains("SPARK_GRAFT_BENCH_DIAG")
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    val lsaSnaps = () => memoSnaps.values.map(_._1)
    val pcaSnaps = () => memoSnaps.values.map(_._2)

    // Timed sweeps, round-robin: pass k of every query before pass k+1 of
    // any. Median per query. Each slot runs a PRIMING pass then the timed
    // pass. The priming pass repopulates the query's own Caching.pin
    // entries (and OS page cache) that the previous slot's cleanup dropped,
    // so the timed pass measures the warm-cache steady state — the protocol
    // every prior round's committed numbers used (the sequential bench's
    // three passes rode the warm-up's pins, since cleanup only ran between
    // queries). Without the prime, interleaving silently switched the whole
    // artifact to cold-cache semantics: the round-9 first cut read q34 at
    // 2.6 s where the round-8 binary measures 0.9 s on the same box —
    // pin-heavy dedup queries were recomputing their pinned shingle frames
    // inside every timed pass. Priming inside the slot (rather than letting
    // pins accumulate across the sweep) keeps the round-2 lesson intact: at
    // most ONE query's pins are live at any moment.
    // restoreMemoPruned (not restoreMemo): with every query's snapshot live
    // across the whole interleaved run, a releasing restore would unpersist
    // checkpoint blocks other snapshots still reference
    // (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND, round 9), while letting evicted
    // components accumulate pressured the storage layer into multi-× per-run
    // variance — pruned restore releases only components no snapshot can
    // resurrect. The memo is restored again between prime and timed pass so
    // the timed pass measures the query's marginal factorization work, not a
    // free hit on its own prime.
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

    // ---- Session 1: warm-up (cost probe) + main sweep ----
    // The lateAlways family skips session 1 entirely — it warms up inside
    // its own fresh session below, where its memo snapshots are valid.
    val candidates = queries.filterNot(q => lateAlways(q.name))
    // Sacrificial init pass: the FIRST query otherwise pays the one-time
    // session costs (codegen framework bootstrap, parquet reader classes,
    // noop sink registration — ~5 s) inside its warm-up and gets
    // misclassified as heavy (q01 steady 0.27 s read >5 s warm in the
    // protocol smoke test).
    try spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count()
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] init pass: ${e.getMessage}") }
    val warmSecs = scala.collection.mutable.Map.empty[String, Double]
    candidates.foreach { q =>
      memoSnaps(q.name) = (ml.Lsa.memoSnapshot(), ml.Pca.memoSnapshot())
      guarded(q) {
        val w = runOnce(q)
        // A first-of-its-family warm-up pays that family's JIT/codegen on
        // top of the query's real cost (q34 steady 0.7 s read >5 s warm in
        // the smoke test). For would-be-late rows only, measure once more —
        // JIT now paid — and classify on the cheaper pass.
        warmSecs(q.name) = if (w <= lateThresholdSec) w else math.min(w, runOnce(q))
      }
    }
    val mainQs = candidates.filter(q => warmSecs.getOrElse(q.name, 0.0) <= lateThresholdSec)
    val lateQs = queries.filter(q =>
      lateAlways(q.name) || warmSecs.getOrElse(q.name, 0.0) > lateThresholdSec)
    if (lateQs.nonEmpty) System.err.println(
      s"[bench] final sweep (${lateQs.size} rows): ${lateQs.map(_.name).mkString(", ")}")
    timedSweeps(mainQs)

    // ---- Final sweep: fresh SESSION (same context) for the heavy rows ----
    // newSession(), not stop()+new context: the round-11 protocol A/B
    // found NO measurable benefit in a full context restart (all observed
    // deltas were host band variance — PLANS.md round-11 notes), and the
    // late-session tax is already cured by late ORDERING plus
    // session-STATE reset (round 10's q116 fix). newSession() is the
    // cheaper reset: it drops accumulated session state (SQL conf,
    // catalog, temp views) and the sweep clears the factorization memos
    // and cache; executors, block manager, and JIT state carry over —
    // exactly the part that should stay warm.
    if (lateQs.nonEmpty) {
      Caching.release()
      spark.catalog.clearCache()
      ml.Lsa.clearMemo(); ml.Pca.clearMemo()
      memoSnaps.clear()
      spark = spark.newSession()
      lateQs.foreach { q => // fresh-session warm-up, memo snapshots retaken
        memoSnaps(q.name) = (ml.Lsa.memoSnapshot(), ml.Pca.memoSnapshot())
        guarded(q) { runOnce(q) }
      }
      timedSweeps(lateQs)
    }

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
