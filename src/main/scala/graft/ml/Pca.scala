package graft.ml

import graft.Par.ParOps
import graft.functions.Exprs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Principal component analysis over an embedding column, as pure DataFrame
  * dataflow — the dense-matrix sibling of [[Lsa]] (which factorizes the
  * sparse TF-IDF matrix): center on the exact per-position mean, accumulate
  * the d×d covariance, and power-iterate on the d²-row covariance table.
  * Components beyond the first come from deflation — power iteration on
  * C − Σ_{j<i} λⱼvⱼvⱼᵀ with λⱼ = vⱼᵀCvⱼ — the same per-round ladder
  * [[Lsa]] proved on the sparse sibling: ALL previous components flow
  * through one long-format (comp, pos, v) frame, so a round's deflation
  * cost is independent of how many components are already extracted.
  *
  * Engine-portable by the standing ladder: means and covariance cells go
  * through 12-dp-rounded products into exact DECIMAL(30,12) sums (rounded
  * back to 12 dp), the iteration normalizes with a 10-dp sqrt, so every
  * round is bit-identical across engines and the oracles unroll the whole
  * chain as CTEs. Component SIGNS are not canonicalized — the all-ones
  * start makes each signed iterate itself deterministic (the q105 stance).
  *
  * Scale: n is unbounded, d is the embedding width (bounded — 64 here).
  * The one corpus-sized stage is the covariance accumulation: d² product
  * terms per row, generated ROW-LOCALLY (nested array transform + one
  * explode — no self-join) and collapsed by map-side partial aggregation,
  * so the exchange carries d²·partitions partials, never n·d² rows. The
  * iteration then runs entirely on d- and d²-row frames (broadcast-sized
  * by construction). At extreme d the standard mitigations are block-wise
  * covariance or subsampling; at d ≤ a few hundred this shape is exact
  * and cheap.
  *
  * The covariance table and extracted components are memoized per session
  * and input plan (the [[Lsa]] memo pattern): q116 (top component), q117
  * (projections) and q123 (top-k) share ONE covariance pass and one
  * component-1 loop per session. [[memoSnapshot]]/[[restoreMemo]] give
  * measurement harnesses the same bench-honest semantics as Lsa's, and
  * eviction unpersists the checkpointed frames it drops.
  */
object Pca {

  /** Extracted component: the unit iterate v (pos, v) and — lazily, only
    * once deflation for a LATER component needs it — the eigenvalue
    * λ = vᵀCv as a 1-row frame. */
  private final class Comp(val v: DataFrame, lamPlan: () => DataFrame) {
    private var lamCached: DataFrame = _
    def lam: DataFrame = synchronized {
      if (lamCached == null) lamCached = lamPlan().compacted.localCheckpoint(eager = true)
      lamCached
    }
    def release(): Unit = synchronized {
      Checkpoints.unpersist(v)
      if (lamCached != null) Checkpoints.unpersist(lamCached)
    }
  }

  /** Checkpointed covariance artifacts, shared by every PCA surface over
    * the same input plan. */
  private final class Cov(val cells: DataFrame, val mu: DataFrame) {
    def release(): Unit = { Checkpoints.unpersist(cells); Checkpoints.unpersist(mu) }
  }

  private final case class CovKey(
      session: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)

  private final case class CompKey(
      session: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      iterations: Int)

  private val covMemo = new java.util.concurrent.ConcurrentHashMap[CovKey, Cov]()
  private val compMemo = new java.util.concurrent.ConcurrentHashMap[CompKey, Vector[Comp]]()

  /** Drop all memoized state, unpersisting the checkpointed frames. */
  def clearMemo(): Unit = {
    compMemo.values.forEach(_.foreach(_.release()))
    compMemo.clear()
    covMemo.values.forEach(_.release())
    covMemo.clear()
  }

  /** Opaque snapshot for measurement harnesses — same contract as
    * [[Lsa.memoSnapshot]]: restore before each timed pass so a query
    * measures its marginal work given EARLIER queries' extractions, never
    * a free hit from its own warm-up. */
  def memoSnapshot(): AnyRef = Array[AnyRef](
    new java.util.HashMap[CovKey, Cov](covMemo),
    new java.util.HashMap[CompKey, Vector[Comp]](compMemo))

  /** Restore a [[memoSnapshot]], unpersisting whatever the restore evicts.
    * Survivor membership is by REFERENCE: a Vector extension shares its
    * prefix Comps with the snapshot, so those must not be released. */
  def restoreMemo(snap: AnyRef): Unit = {
    val Array(cv, cm) = snap.asInstanceOf[Array[AnyRef]]
    val rCov = cv.asInstanceOf[java.util.HashMap[CovKey, Cov]]
    val rComp = cm.asInstanceOf[java.util.HashMap[CompKey, Vector[Comp]]]
    val keepComp = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Comp, java.lang.Boolean]())
    rComp.values.forEach(_.foreach(keepComp.add))
    compMemo.values.forEach(_.foreach(c => if (!keepComp.contains(c)) c.release()))
    val keepCov = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Cov, java.lang.Boolean]())
    rCov.values.forEach(keepCov.add(_))
    covMemo.values.forEach(c => if (!keepCov.contains(c)) c.release())
    compMemo.clear(); compMemo.putAll(rComp)
    covMemo.clear(); covMemo.putAll(rCov)
  }

  /** [[restoreMemo]] WITHOUT releasing evicted entries — see
    * [[Lsa.restoreMemoShared]]: required when many snapshots are live at
    * once (the interleaved Bench), where a releasing restore unpersists
    * blocks other snapshots still reference. */
  def restoreMemoShared(snap: AnyRef): Unit = {
    val Array(cv, cm) = snap.asInstanceOf[Array[AnyRef]]
    compMemo.clear()
    compMemo.putAll(cm.asInstanceOf[java.util.HashMap[CompKey, Vector[Comp]]])
    covMemo.clear()
    covMemo.putAll(cv.asInstanceOf[java.util.HashMap[CovKey, Cov]])
  }

  /** [[restoreMemoShared]] plus garbage collection (the Lsa twin): before
    * restoring, release every Comp/Cov in the CURRENT memos referenced by
    * NO snapshot in `allSnaps` — post-warm-up extractions no snapshot can
    * resurrect. Identity membership, never key equality (Vector
    * extensions share prefix Comps with their snapshots). */
  def restoreMemoPruned(snap: AnyRef, allSnaps: Iterable[AnyRef]): Unit = {
    val keepComp = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Comp, java.lang.Boolean]())
    val keepCov = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Cov, java.lang.Boolean]())
    allSnaps.foreach { s =>
      val Array(cv, cm) = s.asInstanceOf[Array[AnyRef]]
      cm.asInstanceOf[java.util.HashMap[CompKey, Vector[Comp]]]
        .values.forEach(_.foreach(keepComp.add))
      cv.asInstanceOf[java.util.HashMap[CovKey, Cov]].values.forEach(keepCov.add(_))
    }
    compMemo.values.forEach(_.foreach(c => if (!keepComp.contains(c)) c.release()))
    covMemo.values.forEach(c => if (!keepCov.contains(c)) c.release())
    restoreMemoShared(snap)
  }

  private def normalized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** emb: (vec_id, embedding: array&lt;float|double&gt;). Returns the
    * d²-cell covariance table (i, j, c), 1-based positions, plus the
    * per-position means as (pos, mu) — both checkpointed, memoized per
    * (session, input plan). */
  private def cov(emb: DataFrame): Cov = {
    val sel = normalized(emb)
    val key = CovKey(emb.sparkSession, sel.queryExecution.analyzed.canonicalized)
    covMemo.computeIfAbsent(key, _ => {
      // repartition BEFORE the d²-per-row expansion: the product generation
      // must parallelize by available cores, not by the input's file count —
      // a single-file local read would otherwise run the whole covariance on
      // one task (values are exact DECIMAL sums, so partitioning never
      // changes the result). The partition count is EXPLICIT: a bare
      // repartition(col) participates in AQE partition coalescing, and the
      // pre-expansion frame is small enough (n·d doubles) that AQE folds it
      // back to ~1 partition — reintroducing the single-task d² expansion
      // the repartition exists to prevent (the post-expansion volume AQE
      // can't see is n·d², 4096× larger)
      val e = sel
        .repartition(sel.sparkSession.sparkContext.defaultParallelism, col("vec_id"))
        .compacted.persist(StorageLevel.MEMORY_AND_DISK)
      val mu = e.select(posexplode(col("v")).as(Seq("p0", "x")))
        .groupBy((col("p0") + 1).cast(LongType).as("pos"))
        .agg(round(davg(round(col("x"), 12), 12), 12).as("mu"))
        .compacted.localCheckpoint(eager = true)
      // array_sort(collect_list(struct)) — not collect_list-after-sort, whose
      // order aggregation does not guarantee (the KMeans pattern)
      val muArr = mu.agg(array_sort(collect_list(struct(col("pos"), col("mu")))).as("es"))
        .select(transform(col("es"), x => x.getField("mu")).as("mu_arr"))
      val n = e.agg(count(lit(1)).cast("double").as("n"))
      // centered outer products fold through OuterDsum (round 14): the
      // pre-r14 shape exploded n·d² (i, j, p) structs into a d²-group hash
      // aggregate; the imperative aggregate folds the same rounded products
      // into the same exact-DECIMAL slots row-locally (bit-parity pinned in
      // VecDsumSpec), so nothing n·d²-sized is ever materialized. Slots with
      // no addend surface as null and are dropped — the exploded form simply
      // had no such group (dense rows have none either way).
      val dim = {
        val r = e.select(size(col("v")).as("d")).head(1)
        if (r.isEmpty) 0 else r.head.getInt(0)
      }
      val cells = graft.OpsExplain.dump("Pca.cov cells body", e.crossJoin(broadcast(muArr))
        .select(zip_with(col("v"), col("mu_arr"), (x, m) => round(x - m, 12)).as("cv"))
        .agg(graft.functions.OuterDsum(col("cv"), 12).as("sv"))
        .select(posexplode(col("sv")).as(Seq("k", "sraw")))
        .filter(col("sraw").isNotNull)
        .select((floor(col("k") / lit(math.max(dim, 1))) + 1).cast(LongType).as("i"),
          (col("k") % lit(math.max(dim, 1)) + 1).cast(LongType).as("j"),
          round(col("sraw"), 12).as("s"))
        .crossJoin(broadcast(n))
        .select(col("i"), col("j"), round(col("s") / col("n"), 12).as("c")))
        .compacted.localCheckpoint(eager = true)
      e.unpersist(blocking = false)
      new Cov(cells, mu)
    })
  }

  /** Extract components 1..k for this (session, input plan, iterations),
    * reusing any already memoized — the [[Lsa.comps]] contract: concurrent
    * queries needing the same factorization block on the per-key lock and
    * share instead of duplicating the jobs. */
  private def comps(emb: DataFrame, k: Int, iterations: Int): (Cov, Vector[Comp]) = {
    val c = cov(emb)
    val key = CompKey(emb.sparkSession,
      normalized(emb).queryExecution.analyzed.canonicalized, iterations)
    val v = compMemo.compute(key, (_, existing) => {
      var acc = if (existing == null) Vector.empty[Comp] else existing
      while (acc.size < k) {
        val vec = iterate(c.cells, iterations, acc)
        acc :+= new Comp(vec, () =>
          c.cells.join(vec.select(col("pos").as("j"), col("v")), "j")
            .groupBy(col("i"))
            .agg(round(dsum(round(col("c") * col("v"), 12), 12), 12).as("u"))
            .join(vec, col("i") === col("pos"))
            .agg(round(dsum(round(col("u") * col("v"), 12), 12), 12).as("lam")))
      }
      acc
    })
    (c, v.take(k))
  }

  /** Top principal direction: (pos, weight), unit norm, 8 dp. */
  def topComponent(emb: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"Pca.topComponent iterations must be >= 1, got $iterations")
    comps(emb, 1, iterations)._2.last.v
      .select(col("pos"), round(col("v"), 8).as("weight"))
  }

  /** Top-k principal directions by deflation: (component, pos, weight)
    * with component ∈ 1..k in extraction order, each unit-norm, 8 dp. */
  def topK(emb: DataFrame, k: Int, iterations: Int): DataFrame = {
    require(k >= 1, s"Pca.topK k must be >= 1, got $k")
    require(iterations >= 1, s"Pca.topK iterations must be >= 1, got $iterations")
    comps(emb, k, iterations)._2.zipWithIndex
      .map { case (c, i) =>
        c.v.select(lit((i + 1).toLong).as("component"), col("pos"),
          round(col("v"), 8).as("weight"))
      }
      .reduce(_.union(_))
  }

  /** Per-vector score along the top component: (vec_id, score) with
    * score = (x − μ)·v, the centered projection, 8 dp. One d-row broadcast
    * against the corpus — scan-shaped. */
  def projectTop(emb: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"Pca.projectTop iterations must be >= 1, got $iterations")
    val (c, comp) = comps(emb, 1, iterations)
    val muArr = c.mu.agg(array_sort(collect_list(struct(col("pos"), col("mu")))).as("es"))
      .select(transform(col("es"), x => x.getField("mu")).as("mu_arr"))
    val vArr = comp.last.v.agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("es"))
      .select(transform(col("es"), x => x.getField("v")).as("v_arr"))
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("x"))
      .crossJoin(broadcast(muArr)).crossJoin(broadcast(vArr))
      .select(col("vec_id"),
        round(aggregate(
          zip_with(zip_with(col("x"), col("mu_arr"), (x, m) => round(x - m, 12)),
            col("v_arr"), (cx, w) => round(cx * w, 12)),
          lit(0.0d), (acc, t) => acc + t), 8).as("score"))
  }

  /** Power iteration v ← normalize(C v − Σⱼ λⱼ(vⱼ·v)vⱼ) on the d²-row
    * covariance table: all-ones start, per round one (j-keyed join +
    * i-grouped sum) over the checkpointed cell table, a deflation pass
    * over the long-format previous-component frame (absent for component
    * 1), and a 1-row norm broadcast — every frame here is d-, k·d- or
    * d²-sized. Returns (pos, v) at full 12-dp precision. */
  private def iterate(cells: DataFrame, iterations: Int, prev: Vector[Comp]): DataFrame = {
    // all previous components as ONE long frame + one k-row eigenvalue
    // frame: per-round deflation cost is independent of the component count
    val defl = if (prev.isEmpty) None else Some((
      prev.zipWithIndex
        .map { case (p, j) => p.v.select(lit(j).as("comp"), col("pos"), col("v").as("pv")) }
        .reduce(_.union(_)).compacted.localCheckpoint(eager = true),
      prev.zipWithIndex
        .map { case (p, j) => p.lam.select(lit(j).as("comp"), col("lam")) }
        .reduce(_.union(_)).compacted.localCheckpoint(eager = true)))
    var v = cells.select(col("i").as("pos")).distinct()
      .withColumn("v", lit(1.0d)).compacted.localCheckpoint(eager = true)
    for (_ <- 1 to iterations) {
      val raw = cells.join(v.select(col("pos").as("j"), col("v")), "j")
        .groupBy(col("i"))
        .agg(round(dsum(round(col("c") * col("v"), 12), 12), 12).as("u"))
      val u = (defl match {
        case None => raw
        case Some((pvs, lams)) =>
          val dots = pvs.join(v.select(col("pos"), col("v").as("s")), "pos")
            .groupBy(col("comp"))
            .agg(round(dsum(round(col("pv") * col("s"), 12), 12), 12).as("dot"))
          val coefs = dots.join(lams, "comp")
            .select(col("comp"), round(col("lam") * col("dot"), 12).as("coef"))
          val d = pvs.join(broadcast(coefs), "comp")
            .groupBy(col("pos"))
            .agg(round(dsum(round(col("coef") * col("pv"), 12), 12), 12).as("d"))
          raw.join(d, raw("i") === d("pos"))
            .select(col("i"), round(col("u") - col("d"), 12).as("u"))
      }).compacted.localCheckpoint(eager = true)
      val nm = u.agg(round(sqrt(dsum(round(col("u") * col("u"), 12), 12)), 10).as("nm"))
      v = u.crossJoin(broadcast(nm))
        .select(col("i").as("pos"), round(col("u") / col("nm"), 12).as("v"))
        .compacted.localCheckpoint(eager = true)
    }
    v
  }
}
