package graft.graph

import graft.Par.ParOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.storage.StorageLevel

/** Graph analytics from the character-network spec (SURVEY.md §2.4 A11-A12,
  * §2.7 G1-G2): pairwise co-occurrence, out-edge normalization, and iterative
  * PageRank / Label Propagation as driver-controlled DataFrame loops.
  *
  * Iterations localCheckpoint() every few rounds to truncate plan growth
  * (SURVEY.md §7 risk 3); edges persist across iterations. At cluster scale
  * the edge table would be pre-partitioned on src so every iteration's join
  * reuses one shuffle-free partitioning.
  */
object Graphs {

  /** A11: directed co-occurrence counts — for each group (paragraph/document),
    * every ordered pair of distinct items that appear together, counted over
    * groups (PDF2 pp. 2-3 worked example in FIXTURES.md F6).
    * Input: (group, item) rows; output: (src, dst, cnt). */
  def coOccurrence(items: DataFrame, group: String = "doc_id", item: String = "term"): DataFrame = {
    val dt = items.select(col(group).as("g"), col(item).as("i")).distinct()
    val a = dt.as("a")
    val b = dt.as("b")
    a.join(b, col("a.g") === col("b.g") && col("a.i") =!= col("b.i"))
      .groupBy(col("a.i").as("src"), col("b.i").as("dst"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** A12: normalize out-edge weights to a probability distribution per src
    * (PDF2 p. 4). Integer-ratio arithmetic: deterministic across engines. */
  def normalizeEdges(edges: DataFrame): DataFrame =
    edges.withColumn("w",
      col("cnt").cast(DoubleType) /
        sum(col("cnt")).over(Window.partitionBy(col("src"))).cast(DoubleType))

  /** G1: PageRank over normalized edges (src, dst, w), fixed iteration count.
    * r_{k+1}(v) = round((1-d)/n + d * Σ_{(u,v)} r_k(u)·w(u,v), 12).
    * The co-occurrence graph is symmetric, so no dangling-mass handling is
    * needed (every vertex has in- and out-edges).
    *
    * Determinism: the per-iteration sum is an exact SCALED-LONG accumulator —
    * each product is rounded half-up to 18 dp as an integer micro-unit
    * (floor(rank·w·1e18 + 0.5), pure IEEE ops, bit-identical in any engine)
    * and summed as a primitive long. Exactness holds at any graph size: a
    * vertex's incoming mass Σ rank(u)·w(u,v) ≤ Σ rank(u) = 1, so the long
    * sum stays < 2^63. The new rank is then rounded to 12 dp, so every
    * iteration is bit-identical regardless of partial-aggregation order —
    * the unrolled-CTE oracle re-syncs at each round instead of relying on
    * the final round(6) to mask drift. (A DECIMAL(38,18) accumulator has the
    * same semantics; the long form keeps the hot aggregate in primitive
    * codegen instead of Decimal128 adds — the r3 verdict's q25 follow-up.) */
  def pageRank(edges: DataFrame, iterations: Int = 10, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w")).compacted.persist(StorageLevel.MEMORY_AND_DISK)
    val verts = e.select(col("src").as("v")).distinct().compacted.persist(StorageLevel.MEMORY_AND_DISK)
    val n = verts.count()
    var ranks = verts.withColumn("rank", lit(1.0d / n))
    for (i <- 1 to iterations) {
      // ranks is vertex-sized (small relative to edges): broadcast it so the
      // cached edge table never reshuffles across iterations
      ranks = e.join(broadcast(ranks), e("src") === ranks("v"))
        .groupBy(col("dst").as("v2"))
        .agg(round(lit((1.0d - damping) / n) +
          lit(damping) * (sum(floor(col("rank") * col("w") * lit(1.0e18d) + lit(0.5d))
            .cast(org.apache.spark.sql.types.LongType)).cast(DoubleType) / lit(1.0e18d)),
          12).as("rank"))
        .withColumnRenamed("v2", "v")
      // Checkpoint every 4 rounds: broadcasting ranks executes its plan, so
      // lineage must be truncated periodically — but between checkpoints the
      // re-executed chain is at most 3 broadcast joins over the *cached* edge
      // table (cheap), while each eager materialization is a full job.
      // Checkpointing every round was measured at 63% of the whole sf0.1
      // bench; every 4 keeps re-execution bounded while spending one fewer
      // eager job than the round-3 every-3 cadence.
      if (i < iterations && i % 4 == 0) ranks = ranks.compacted.localCheckpoint(eager = true)
    }
    // the result is vertex-sized: materialize it eagerly (cheap) so the pinned
    // edge/vertex caches can be released HERE instead of leaking for the rest
    // of the session (round-2 bench pollution)
    ranks = ranks.compacted.localCheckpoint(eager = true)
    e.unpersist(blocking = false)
    verts.unpersist(blocking = false)
    ranks
  }

  /** PageRank for GENERAL directed graphs — the flagged variant of
    * [[pageRank]] for inputs outside that operator's documented contract
    * (symmetric co-occurrence graphs with a broadcast-sized vertex set):
    *
    *   - **dangling mass**: vertices with no out-edges lose their rank in
    *     the plain update; here D_k = Σ_{dangling u} r_k(u) is redistributed
    *     uniformly — r_{k+1}(v) = round((1-d)/n + d·(Σ r_k(u)w(u,v) + D_k/n), 12).
    *   - **shuffle-join rank update**: the rank frame joins the edge table
    *     by equi-shuffle, never `broadcast()` — correct for vertex sets far
    *     beyond driver/executor broadcast reach (corpus-sized graphs), at
    *     the cost of shuffling ranks each round where [[pageRank]] reuses
    *     the cached edge partitioning.
    *
    * Determinism matches [[pageRank]]: incoming mass via the exact
    * scaled-long (1e18) accumulator; D_k summed the same way at 1e12 (ranks
    * are 12-dp, so floor(rank·1e12+0.5) is exact) — every iteration is
    * bit-identical across engines and partitionings, and the q81 oracle
    * unrolls it round by round. Per round: one shuffle join + grouped sum,
    * one vertex-sized left join, and a cross-join of the 1-ROW D_k
    * aggregate — the dangling mass stays in the plan (no per-round driver
    * action: at cluster scale, 10 extra job launches per query are pure
    * scheduler chatter; the identical long→double→/1e12→/n ladder runs as
    * Column arithmetic instead, so the oracle unrolls unchanged). */
  def pageRankGeneral(edges: DataFrame, iterations: Int = 10,
                      damping: Double = 0.85): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val e = edges.select(col("src"), col("dst"), col("w")).compacted.localCheckpoint(eager = true)
    val verts = e.select(col("src").as("v")).union(e.select(col("dst").as("v")))
      .distinct().compacted.localCheckpoint(eager = true)
    val n = verts.count()
    val dangling = verts.join(e.select(col("src").as("v")).distinct(),
      Seq("v"), "left_anti").compacted.localCheckpoint(eager = true)
    var ranks = verts.withColumn("rank", lit(1.0d / n))
    for (_ <- 1 to iterations) {
      // D_k as a 1-ROW FRAME cross-joined into the update, not a collect():
      // the mass aggregate executes inside the same job as the round's
      // checkpoint, eliminating a per-round driver barrier
      val dmDf = ranks.join(dangling, "v")
        .agg(coalesce(sum(floor(col("rank") * lit(1.0e12d) + lit(0.5d)).cast(LongType)),
          lit(0L)).as("dm"))
      // same operation ORDER as the oracle: dm/1e12, then /n, then d*(inc+·)
      val dmTerm = col("dm").cast(DoubleType) / lit(1.0e12d) / lit(n.toDouble)
      val inc = e.join(ranks, e("src") === ranks("v"))
        .groupBy(col("dst").as("v2"))
        .agg((sum(floor(col("rank") * col("w") * lit(1.0e18d) + lit(0.5d))
          .cast(LongType)).cast(DoubleType) / lit(1.0e18d)).as("inc"))
      // LEFT join from verts: a vertex with no in-edges still receives the
      // teleport + dangling share (the plain variant never meets this case)
      ranks = verts.join(inc, verts("v") === inc("v2"), "left")
        .crossJoin(dmDf)
        .select(col("v"), round(lit((1.0d - damping) / n) +
          lit(damping) * (coalesce(col("inc"), lit(0.0d)) + dmTerm), 12).as("rank"))
        // eager checkpoint keeps the next round's two consumers (dm agg +
        // join) off a growing plan
        .compacted.localCheckpoint(eager = true)
    }
    ranks
  }

  /** Personalized PageRank (Page et al. 1999 §6; Jeh & Widom, "Scaling
    * Personalized Web Search", WWW'03): [[pageRankGeneral]] with the teleport — and the
    * dangling mass — directed at a SEED set instead of all vertices
    * (uniform over seeds), the random-walk-with-restart scoring behind
    * "related items" / seed-expansion retrieval. Non-seed vertices receive
    * mass only through in-edges, so disconnected regions score exactly 0.
    * Same exact-accumulator ladder as the general variant (scaled-long
    * sums, 12-dp re-sync per round); the start vector IS the teleport
    * distribution. Seeds absent from the graph are ignored; at least one
    * must be present. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iterations: Int = 10,
                           damping: Double = 0.85): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val e = edges.select(col("src"), col("dst"), col("w")).compacted.localCheckpoint(eager = true)
    val verts = e.select(col("src").as("v")).union(e.select(col("dst").as("v")))
      .distinct().compacted.localCheckpoint(eager = true)
    val sd = verts.join(seeds.select(col("v")), Seq("v"), "left_semi")
      .compacted.localCheckpoint(eager = true)
    val nS = sd.count()
    require(nS > 0, "personalizedPageRank needs at least one seed present in the graph")
    val dangling = verts.join(e.select(col("src").as("v")).distinct(),
      Seq("v"), "left_anti").compacted.localCheckpoint(eager = true)
    // sm ∈ {0,1}: seed-membership as a multiplier (1·x = x and 0·x = 0
    // exactly, so the arithmetic matches the oracle's CASE form bit-for-bit)
    val seedMark = verts.join(sd.select(col("v"), lit(1.0d).as("sm")), Seq("v"), "left")
      .select(col("v"), coalesce(col("sm"), lit(0.0d)).as("sm"))
      .compacted.localCheckpoint(eager = true)
    var ranks = seedMark
      .select(col("v"), (col("sm") * lit(1.0d / nS)).as("rank"))
      .compacted.localCheckpoint(eager = true)
    for (_ <- 1 to iterations) {
      // plan-side D_k, as in [[pageRankGeneral]]: 1-row aggregate
      // cross-joined, no per-round driver action
      val dmDf = ranks.join(dangling, "v")
        .agg(coalesce(sum(floor(col("rank") * lit(1.0e12d) + lit(0.5d)).cast(LongType)),
          lit(0L)).as("dm"))
      // the whole seed share — teleport + dangling return — in the same
      // operation order the oracle mirrors: dm/1e12, /nS, ·d, +(1-d)/nS
      val seedShare = lit((1.0d - damping) / nS) +
        lit(damping) * (col("dm").cast(DoubleType) / lit(1.0e12d) / lit(nS.toDouble))
      val inc = e.join(ranks, e("src") === ranks("v"))
        .groupBy(col("dst").as("v2"))
        .agg((sum(floor(col("rank") * col("w") * lit(1.0e18d) + lit(0.5d))
          .cast(LongType)).cast(DoubleType) / lit(1.0e18d)).as("inc"))
      ranks = seedMark.join(inc, seedMark("v") === inc("v2"), "left")
        .crossJoin(dmDf)
        .select(col("v"), round(col("sm") * seedShare +
          lit(damping) * coalesce(col("inc"), lit(0.0d)), 12).as("rank"))
        .compacted.localCheckpoint(eager = true)
    }
    ranks
  }

  /** Connected components over an undirected edge list (src, dst) by the
    * large-star / small-star alternation (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14): each round contracts
    * every node's strictly-larger neighbors onto its local minimum
    * (large-star), then folds each node's smaller neighborhood onto that
    * minimum (small-star), until the edge set is a fixpoint — a disjoint
    * union of stars whose centers are the component minima. Unlike
    * min-label propagation (O(diameter) rounds — O(n) on a duplicate
    * CHAIN doc_i ~ doc_{i+1}), the alternation converges in O(log² n)
    * rounds worst-case and ~log n in practice (GraphsSpec pins a
    * 128-deep chain at ≤ 12 rounds). The fixpoint — every vertex labeled
    * with the minimum vertex id in its component — is the same unique
    * result the propagation computed, so q70/q72's recursive-CTE
    * transitive-closure oracles replay it unchanged.
    *
    * Serves the dedup family: near-dup PAIRS (q33/q34/q35) become duplicate
    * CLUSTERS, from which a curation pipeline keeps one representative per
    * cluster (q72). The reference has no clustering op — this is part of the
    * training-data-pipeline surface beyond it.
    *
    * Scale: every phase is edge-keyed equi-shuffles (a grouped min + a
    * join) over frames that never exceed the edge count — no broadcast of
    * anything vertex-sized, no single-partition stage. The convergence
    * check is a set-difference on the edge frame; with O(log) rounds the
    * total extra work stays edge-linear. Output: (v, component) for every
    * vertex incident to an edge; isolated vertices are the caller's
    * left-join default. */
  def connectedComponents(edges: DataFrame): DataFrame =
    twoPhaseCc(edges)._1

  /** [[connectedComponents]] plus the round count (spec: chain convergence
    * bound). */
  private[graft] def twoPhaseCc(edges: DataFrame): (DataFrame, Int) = {
    // localCheckpoint, NOT persist — same CacheManager-sharing rationale as
    // the propagation variant (see the note in minLabelCc), same cluster
    // fault-tolerance tradeoff.
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .compacted.localCheckpoint(eager = true)
    val verts = und.select(col("src").as("v")).distinct()
    // canonical big→small orientation; kept canonical by both phases
    var e = und.filter(col("src") > col("dst")).compacted.localCheckpoint(eager = true)
    var eCount = e.count()
    var rounds = 0
    var changed = eCount > 0 // empty input: skip the loop
    while (changed) {
      rounds += 1
      // large-star: for each u, attach every LARGER neighbor v to
      // m = min(Γ(u) ∪ {u}); output (v, m) is canonical (v > u ≥ m)
      val nb = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val lmin = nb.groupBy(col("src").as("u")).agg(min(col("dst")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val large = nb.join(lmin, nb("src") === lmin("u"))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .distinct()
      // small-star: for each u over its SMALLER neighborhood Γ⁻(u),
      // attach Γ⁻(u) ∪ {u} to m = min(Γ⁻(u)); all outputs stay canonical
      val smin = large.groupBy(col("src")).agg(min(col("dst")).as("m"))
      val small = large.join(smin, "src")
        .select(col("dst").as("src"), col("m").as("dst"))
        .union(smin.select(col("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .compacted.localCheckpoint(eager = true)
      // fixpoint = exact set equality (stars with minimal centers are
      // fixed points of both phases). Both frames are distinct sets, so
      // |A| = |B| ∧ A\B = ∅ ⇒ A = B: a cheap count first, and the
      // one-sided difference only when the counts agree.
      val smallCount = small.count()
      changed = smallCount != eCount ||
        small.except(e).limit(1).count() > 0
      e = small
      eCount = smallCount
    }
    // at fixpoint e is a disjoint star forest: leaves (v, center) with the
    // center = component min; centers label themselves via the left join
    val labels = verts
      .join(e.select(col("src").as("v"), col("dst").as("ctr")), Seq("v"), "left")
      .select(col("v"), coalesce(col("ctr"), col("v")).as("label"))
    (labels, rounds)
  }

  /** Min-label propagation twin (label(v) ← min over neighbors until
    * fixpoint, O(diameter) rounds): kept as the parity cross-check for
    * [[twoPhaseCc]] — same unique fixpoint, different round structure. */
  private[graft] def minLabelCc(edges: DataFrame): DataFrame = {
    // localCheckpoint, NOT persist: the fixpoint loop re-reads this frame
    // every round, and a persisted plan is a CacheManager entry a
    // plan-identical CONCURRENT query could share and then uncache/recache
    // mid-loop (observed corrupting q70 under Verify's thread pool, round
    // 5). Checkpointing truncates to a private materialized RDD no sibling
    // query can touch, and flattens the loop's lineage for free.
    // TRADEOFF (cluster deployments): localCheckpoint blocks are neither
    // replicated nor recomputable — an executor loss or dynamic-allocation
    // decommission mid-fixpoint fails the job instead of recomputing. On a
    // 1000-executor cluster, prefer reliable checkpoint (set a checkpoint
    // dir and use Dataset.checkpoint), or disable dynamic allocation for
    // the fixpoint stage; local[n] (this harness) has no executor loss.
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .compacted.localCheckpoint(eager = true)
    var labels = und.select(col("src").as("v")).distinct().withColumn("label", col("v"))
    var changed = 1L
    while (changed > 0) {
      // min label among neighbours; every v has ≥1 neighbour (symmetrized
      // edge list), so the join back to labels is inner, not left
      val nbrMin = und.join(labels, und("src") === labels("v"))
        .groupBy(und("dst").as("v2")).agg(min(col("label")).as("nbl"))
      val next = labels.join(nbrMin, labels("v") === nbrMin("v2"))
        .select(col("v"), least(col("label"), col("nbl")).as("label"),
          (col("nbl") < col("label")).as("chg"))
        // one eager materialization per round: the convergence count and the
        // next round's join both read it, and lineage stays flat
        .compacted.localCheckpoint(eager = true)
      changed = next.filter(col("chg")).count()
      labels = next.select(col("v"), col("label"))
    }
    // checkpoint blocks are freed by the ContextCleaner when the RDD is
    // GC'd (DataFrame.unpersist only talks to the CacheManager, which never
    // saw this frame) — edge-sized and bounded per call
    labels
  }

  /** G2: synchronous Label Propagation with deterministic tie-breaking
    * (max total *integer* edge weight, then smallest label — integer weights
    * keep the argmax engine-portable). Labels start as the vertex id. */
  def labelPropagation(edges: DataFrame, iterations: Int = 5): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("cnt")).compacted.persist(StorageLevel.MEMORY_AND_DISK)
    var labels = e.select(col("src").as("v")).distinct().withColumn("label", col("v"))
    for (i <- 1 to iterations) {
      val byLabel = e.join(broadcast(labels), e("dst") === labels("v"))
        .groupBy(col("src").as("v2"), col("label"))
        .agg(sum(col("cnt")).as("wsum"))
      val w = Window.partitionBy(col("v2")).orderBy(col("wsum").desc, col("label").asc)
      labels = byLabel.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("v2").as("v"), col("label"))
      // checkpoint every round INCLUDING the last: the final materialization
      // (vertex-sized, cheap) is what lets the edge cache release below
      labels = labels.compacted.localCheckpoint(eager = true)
    }
    e.unpersist(blocking = false)
    labels
  }

  /** Per-vertex triangle counts over an undirected graph given as a
    * directed edge list (src, dst) — canonicalized and deduplicated here.
    * Extends the character-network family (co-occurrence → PageRank/LPA)
    * with the classic cohesion statistic: how many closed wedges each
    * vertex participates in (the numerator of local clustering).
    *
    * Algorithm: degree orientation + wedge closure (Cohen, "Graph Twiddling
    * in a MapReduce World", CiSE 2009; Suri & Vassilvitskii, WWW'11). Every
    * undirected edge is oriented from the endpoint that is SMALLER in the
    * total order (degree, id) to the larger; each triangle then has exactly
    * one apex with two out-edges, so it is found exactly once by joining
    * the apex's out-neighbor pairs (wedges) against the oriented edge set.
    *
    * Scale: orientation bounds each vertex's out-degree by O(√m) on any
    * graph (arboricity argument), so the wedge fan-out — the only
    * super-linear term in the naive formulation — is capped without
    * sampling or loss; a degree-10⁶ hub produces wedges only as the CLOSING
    * side, never as the apex. Every step is an equi-shuffle join or grouped
    * count over edge-keyed frames; nothing vertex- or wedge-sized is
    * broadcast or collected. Output: (v, triangles) for every vertex
    * incident to an edge, zeros included. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    // orient low (deg, id) → high; carry the head's order key for the
    // wedge-side comparison below
    val oriented = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("w"), col("db").as("dw")))
        .otherwise(struct(col("b").as("u"), col("a").as("w"), col("da").as("dw"))).as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"), col("e.dw").as("dw"))
      .compacted.persist(StorageLevel.MEMORY_AND_DISK)
    // wedges at apex u, pair ordered by the SAME (deg, id) order — so the
    // closing edge {x, y}, if present, is oriented exactly x → y
    val e1 = oriented.as("e1")
    val e2 = oriented.as("e2")
    val wedges = e1.join(e2, col("e1.u") === col("e2.u") &&
        (col("e1.dw") < col("e2.dw") ||
          (col("e1.dw") === col("e2.dw") && col("e1.w") < col("e2.w"))))
      .select(col("e1.u").as("t1"), col("e1.w").as("t2"), col("e2.w").as("t3"))
    val tris = wedges.join(oriented.select(col("u").as("t2"), col("w").as("t3")),
      Seq("t2", "t3"))
    val perVertex = tris.select(explode(array(col("t1"), col("t2"), col("t3"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("tri"))
    val out = deg.join(perVertex, Seq("v"), "left")
      .select(col("v"), coalesce(col("tri"), lit(0L)).as("triangles"))
    oriented.unpersist(blocking = false)
    out
  }

  /** k-core (Seidman, "Network structure and minimum degree", Social
    * Networks 1983): the unique maximal subgraph in which every vertex has
    * degree ≥ k, by parallel peeling — each round simultaneously removes every
    * vertex whose current degree is < k, until fixpoint. Removal cascades
    * (dropping a vertex lowers its neighbors' degrees), so the round count
    * is the peel DEPTH of the input, not its size; each round is one
    * grouped degree count + two semi joins — equi-shuffles only, nothing
    * vertex-sized broadcast or collected. The result is unique regardless
    * of peel order (the k-core is a closure), which is what makes the
    * unrolled oracle engine-portable: extra no-op rounds past the fixpoint
    * change nothing.
    *
    * Output: (v, core_deg) for every vertex of the k-core, with its degree
    * INSIDE the core (≥ k by definition). */
  def kCore(edges: DataFrame, k: Int): DataFrame = kCoreWithRounds(edges, k)._1

  /** [[kCore]] plus the peel-round count (spec: cascade-depth bound). */
  private[graft] def kCoreWithRounds(edges: DataFrame, k: Int): (DataFrame, Int) = {
    require(k >= 1, s"kCore k must be >= 1, got $k")
    var e = edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .compacted.localCheckpoint(eager = true)
    var n = e.count()
    var rounds = 0
    var changed = n > 0
    while (changed) {
      val deg = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("v"))
      val e2 = e
        .join(keep.select(col("v").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("v").as("b")), Seq("b"), "left_semi")
        .compacted.localCheckpoint(eager = true)
      val n2 = e2.count()
      changed = n2 != n
      if (changed) rounds += 1
      e = e2
      n = n2
    }
    val core = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("core_deg"))
    (core, rounds)
  }

  /** Adamic–Adar link prediction (Adamic & Adar, "Friends and neighbors
    * on the Web", Social Networks 2003) over an undirected graph: for every
    * NON-adjacent pair (x, y) with at least one common neighbor,
    * AA(x,y) = Σ_{z ∈ N(x)∩N(y)} 1/ln(deg z) — common neighbors weighted
    * inversely by how promiscuous they are. A common neighbor has degree
    * ≥ 2 by construction, so ln is never zero.
    *
    * Portability ladder: ln(deg) rounds to 10 dp (the libm precedent), the
    * reciprocal to 12 dp, the sum through the exact DECIMAL accumulator,
    * the score to 8 dp.
    *
    * Scale: the wedge join fans out deg(z)² pairs at each common neighbor —
    * `maxDegree` (the q33-df-cap pattern) drops z from the COMMON-NEIGHBOR
    * role when deg(z) > cap, bounding join work at O(cap·m); the discarded
    * hubs are the ones contributing least (1/ln(deg) → 0), but the cap is
    * still the CALLER's truncation decision — the library default is
    * lossless. Pair volume itself is the operator's output, as with q33. */
  def adamicAdar(edges: DataFrame, maxDegree: Option[Int] = None): DataFrame = {
    import graft.functions.Exprs.dsum
    val und = edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .compacted.persist(StorageLevel.MEMORY_AND_DISK)
    val nbrs = und.select(col("a").as("v"), col("b").as("n"))
      .union(und.select(col("b").as("v"), col("a").as("n")))
    val deg = nbrs.groupBy(col("n")).agg(count(lit(1)).as("degn"))
    val z = maxDegree.foldLeft(nbrs.join(deg, "n"))((d, cap) => d.filter(col("degn") <= cap))
    val z1 = z.as("z1")
    val z2 = z.as("z2")
    val wedges = z1.join(z2, col("z1.n") === col("z2.n") && col("z1.v") < col("z2.v"))
      .select(col("z1.v").as("x"), col("z2.v").as("y"), col("z1.degn").as("degz"))
    val cand = wedges.join(und.select(col("a").as("x"), col("b").as("y")),
      Seq("x", "y"), "left_anti")
    val out = cand
      .select(col("x"), col("y"),
        round(lit(1.0d) / round(log(col("degz").cast(DoubleType)), 10), 12).as("t"))
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("n_common"), round(dsum(col("t"), 12), 8).as("aa_score"))
    und.unpersist(blocking = false)
    out
  }

  /** Multi-source BFS: minimum hop distance from any seed over the
    * undirected graph, bounded at `maxHops` — the reachability/lineage
    * primitive (contamination spread, citation radius, seed-set expansion).
    *
    * Layered frontier relaxation: round r expands ONLY the hop-(r−1) layer
    * (a vertex's min distance is settled the round it is first reached, so
    * earlier layers never re-expand), then folds the frontier into the
    * distance table with a grouped min. Per round: one equi-shuffle join
    * frontier⋈adjacency + one v-keyed grouped min — no pair terms, no
    * windows; checkpoints every 4 rounds keep the loop plan flat (the
    * PageRank discipline). Integer hops only, so the grouped min is
    * order-independent and the result replays exactly in a recursive-CTE
    * oracle capped at the same horizon. Vertices unreached within
    * `maxHops` are absent from the output — the cap is the CALLER's
    * semantic horizon, not a convergence guess. */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"bfsHops maxHops must be >= 0, got $maxHops")
    val und = edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val adj = und.union(und.select(col("b").as("a"), col("a").as("b")))
      .compacted.localCheckpoint(eager = true)
    var dist = seeds.select(col("v")).distinct()
      .select(col("v"), lit(0L).as("hop"))
      .compacted.localCheckpoint(eager = true)
    for (r <- 1 to maxHops) {
      val frontier = dist.filter(col("hop") === (r - 1).toLong)
        .select(col("v").as("a"))
        .join(adj, "a")
        .select(col("b").as("v"), lit(r.toLong).as("hop"))
      dist = dist.union(frontier).groupBy(col("v")).agg(min(col("hop")).as("hop"))
      if (r % 4 == 0 || r == maxHops) dist = dist.compacted.localCheckpoint(eager = true)
    }
    dist.select(col("v"), col("hop").as("hops"))
  }

  /** k-truss (Cohen, "Trusses: cohesive subgraphs for social network
    * analysis", NSA TR 2008): the maximal subgraph in which every EDGE
    * participates in ≥ k−2 triangles — the edge-granular sibling of
    * [[kCore]]'s vertex peel, and a stricter cohesion filter (every
    * k-truss is inside a (k−1)-core). Synchronous edge peeling: each round
    * enumerates triangles on the surviving edges (the [[triangleCounts]]
    * degree-oriented wedge join — m^1.5-bounded), counts per-EDGE support
    * (each triangle supports its three edges), and drops every edge below
    * k−2 simultaneously; dropping an edge kills its triangles, so removal
    * cascades and the round count is the peel DEPTH. The truss is unique
    * (a closure), so extra no-op rounds change nothing — the q114 property
    * that makes a fixed-depth oracle unroll portable.
    *
    * Output: (a, b, support) for every surviving edge with its triangle
    * support INSIDE the truss (≥ k−2 by definition). */
  def kTruss(edges: DataFrame, k: Int): DataFrame = kTrussWithRounds(edges, k)._1

  /** [[kTruss]] plus the peel-round count (spec: cascade-depth bound).
    *
    * DELIBERATE deviation from the catalog's otherwise action-free plan
    * discipline: the peel loop's fixpoint test is a driver-side `count()`
    * per round (the `localCheckpoint` already materializes each round's
    * edge set, so the count is a cached-RDD fold, not a recompute). A
    * declared-horizon variant (the [[bfsHops]]/[[shortestPathsBounded]]
    * stance) would trade the exact fixpoint for a caller-supplied round
    * bound; k-truss convergence depth is data-dependent (peel cascades),
    * so the exact test is kept and the cost — one O(partitions) job per
    * round beyond the checkpoint — is accepted and documented here. */
  private[graft] def kTrussWithRounds(edges: DataFrame, k: Int): (DataFrame, Int) = {
    require(k >= 2, s"kTruss k must be >= 2, got $k")
    def supports(e: DataFrame): DataFrame = {
      // degree-oriented triangle enumeration on the current edge set
      val deg = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val ori = e
        .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
        .select(
          when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
            col("a")).otherwise(col("b")).as("u"),
          when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
            col("b")).otherwise(col("a")).as("w"),
          when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
            col("db")).otherwise(col("da")).as("dw"))
      val e1 = ori.select(col("u"), col("w").as("w1"), col("dw").as("d1"))
      val e2 = ori.select(col("u"), col("w").as("w2"), col("dw").as("d2"))
      val tri = e1.join(e2, Seq("u"))
        .filter(col("d1") < col("d2") || (col("d1") === col("d2") && col("w1") < col("w2")))
        .join(ori.select(col("u").as("w1"), col("w").as("w2")), Seq("w1", "w2"), "left_semi")
        .select(col("u").as("t1"), col("w1").as("t2"), col("w2").as("t3"))
      // each triangle supports its three canonical edges
      tri.select(explode(array(
          struct(least(col("t1"), col("t2")).as("a"), greatest(col("t1"), col("t2")).as("b")),
          struct(least(col("t1"), col("t3")).as("a"), greatest(col("t1"), col("t3")).as("b")),
          struct(least(col("t2"), col("t3")).as("a"), greatest(col("t2"), col("t3")).as("b"))))
          .as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
    }
    var e = edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .compacted.localCheckpoint(eager = true)
    var n = e.count()
    var rounds = 0
    var changed = n > 0
    while (changed) {
      val sup = supports(e)
      val e2 = e.join(sup, Seq("a", "b"), "left")
        .filter(coalesce(col("support"), lit(0L)) >= (k - 2).toLong)
        .select(col("a"), col("b"))
        .compacted.localCheckpoint(eager = true)
      val n2 = e2.count()
      changed = n2 != n
      if (changed) rounds += 1
      e = e2
      n = n2
    }
    val out = e.join(supports(e), Seq("a", "b"), "left")
      .select(col("a"), col("b"), coalesce(col("support"), lit(0L)).as("support"))
    (out, rounds)
  }

  /** Newman modularity Q of a vertex partition over the SIMPLE undirected
    * graph (Newman & Girvan, "Finding and evaluating community structure
    * in networks", PRE 2004): Q = Σ_c [e_c/m − (d_c/2m)²] with e_c the
    * intra-community edge count, d_c the community degree sum, m the edge
    * count — the quality metric that closes the loop on Label Propagation
    * (a partition without a score is not an evaluation).
    *
    * All-integer until ONE division: Q = Σ_c (4·m·e_c − d_c²) / (4m²),
    * accumulated in exact DECIMAL(38,0) (the q113 moment ladder), so the
    * 8-dp result is bit-portable. Shape: one distinct + two label joins +
    * three grouped counts — every stage key-partitioned, the final frame
    * 1-row. Output: (m_edges, n_communities, modularity). */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val und = edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct().compacted.localCheckpoint(eager = true)
    val la = labels.select(col("v").as("a"), col("label").as("la"))
    val lb = labels.select(col("v").as("b"), col("label").as("lb"))
    val intra = und.join(la, "a").join(lb, "b")
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("label")).agg(count(lit(1)).as("ec"))
    val deg = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val dcs = deg.join(labels, "v").groupBy(col("label")).agg(sum(col("deg")).as("dcs"))
    val m = und.agg(count(lit(1)).as("m"))
    val terms = dcs.join(intra, Seq("label"), "left")
      .select(col("label"), coalesce(col("ec"), lit(0L)).as("ec"), col("dcs"))
      .crossJoin(m)
      .select((lit(4L).cast(dec) * col("m").cast(dec) * col("ec").cast(dec) -
        col("dcs").cast(dec) * col("dcs").cast(dec)).as("num"))
    val ncomm = dcs.agg(count(lit(1)).as("n_communities"))
    terms.agg(sum(col("num")).as("num"))
      .crossJoin(m).crossJoin(ncomm)
      .select(col("m").as("m_edges"), col("n_communities"),
        round(col("num").cast(DoubleType) /
          (lit(4L).cast(dec) * col("m").cast(dec) * col("m").cast(dec)).cast(DoubleType),
          8).as("modularity"))
  }

  /** Bounded-hop single-source (multi-seed) shortest paths over a weighted
    * undirected graph — Bellman–Ford by synchronous rounds: round r relaxes
    * every edge from the current distance table and folds with a grouped
    * MIN, so after `maxHops` rounds dist(v) is the cheapest path using at
    * most that many edges (the caller's declared horizon, same stance as
    * [[bfsHops]]). INTEGER costs only: the grouped min is order-independent
    * and the oracle unrolls round by round with no float ladder. Per round
    * one dist⋈adjacency equi join + one v-keyed grouped min — the
    * [[bfsHops]] cost shape with a cost column. Unreached vertices are
    * absent. Output: (v, cost, hops) with hops the edge count of the
    * cheapest path (cost ties broken by fewer hops — folded through the
    * same min by packing cost·K + hops, K > maxHops, unpacked on output). */
  def shortestPathsBounded(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"shortestPathsBounded maxHops must be >= 0, got $maxHops")
    // pack (cost, hops) into one long so a single MIN folds the pair with
    // lexicographic (cost, hops) order; K bounds the hops field
    val K = 1024L
    require(maxHops < K, s"maxHops must be < $K")
    // Operator-contract guard, checked plan-side per row: a NEGATIVE cost
    // silently corrupts the lexicographic packed MIN, and an accumulated
    // path cost >= Long.MaxValue/K overflows the pack. Bounding each edge
    // at (Long.MaxValue/K - 1)/maxHops makes the worst maxHops-edge path
    // unable to overflow. raise_error fires on first violation.
    val maxCost = (Long.MaxValue / K - 1) / math.max(maxHops, 1).toLong
    val und = edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"),
        col("cost").cast(org.apache.spark.sql.types.LongType).as("cost"))
      .withColumn("cost",
        when(col("cost").between(0L, maxCost), col("cost"))
          .otherwise(raise_error(concat(
            lit(s"shortestPathsBounded: edge cost outside [0, $maxCost]: "),
            col("cost").cast("string")))))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(min(col("cost")).as("cost"))
    val adj = und.union(und.select(col("b").as("a"), col("a").as("b"), col("cost")))
      .compacted.localCheckpoint(eager = true)
    var dist = seeds.select(col("v")).distinct()
      .select(col("v"), lit(0L).as("pk"))
      .compacted.localCheckpoint(eager = true)
    for (r <- 1 to maxHops) {
      val relaxed = dist.select(col("v").as("a"), col("pk"))
        .join(adj, "a")
        .select(col("b").as("v"),
          expr(s"((pk div $K) + cost) * $K + (pk % $K + 1)").as("pk"))
      dist = dist.union(relaxed).groupBy(col("v")).agg(min(col("pk")).as("pk"))
      if (r % 4 == 0 || r == maxHops) dist = dist.compacted.localCheckpoint(eager = true)
    }
    dist.select(col("v"), expr(s"pk div $K").as("cost"), (col("pk") % K).as("hops"))
  }

  /** HITS (Kleinberg, "Authoritative Sources in a Hyperlinked Environment",
    * JACM 1999) over an UNWEIGHTED directed graph, with L1 normalization —
    * each round: a ← Aᵀh then renormalize to Σa = 1; h ← A·a then
    * renormalize to Σh = 1. L1 instead of Kleinberg's L2 because the
    * rankings are identical (normalization only rescales the iterate) and
    * an exact cross-engine ladder needs sums, not square roots.
    *
    * Determinism is the PageRank contract: with Σh = 1 every raw authority
    * mass is ≤ 1, so each term floor(h·1e18 + 0.5) is an exact long, the
    * longs sum exactly, and the normalizer re-enters through a second
    * scaled-long pass at 1e12 before the 12-dp re-sync — bit-identical
    * across engines and partition orders, so the oracle unrolls round by
    * round. Per round: two equi-shuffle join+sum passes over the
    * checkpointed edge table + two 1-row total cross-joins (the plan-side
    * dangling-mass pattern — no per-round driver action).
    *
    * Output: (v, auth, hub) over all vertices, 12-dp; vertices with no
    * in-edges score auth = 0, no out-edges hub = 0. */
  def hits(edges: DataFrame, iterations: Int = 4): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val e = edges.select(col("src"), col("dst")).filter(col("src") =!= col("dst"))
      .distinct().compacted.localCheckpoint(eager = true)
    val verts = e.select(col("src").as("v")).union(e.select(col("dst").as("v")))
      .distinct().compacted.localCheckpoint(eager = true)
    val n = verts.count()
    var hub = verts.withColumn("hub", round(lit(1.0d / n), 12))
    var auth = verts.withColumn("auth", lit(0.0d))
    def renorm(raw: DataFrame, cName: String): DataFrame = {
      // raw is (v, raw) with every value in [0, 1]; total via the exact
      // 1e12 ladder as a 1-ROW frame (values are 12-dp so floor(·1e12+0.5)
      // is exact), then the 12-dp re-sync both engines share
      val tot = raw.agg((sum(floor(col("raw") * lit(1.0e12d) + lit(0.5d)).cast(LongType))
        .cast(DoubleType) / lit(1.0e12d)).as("tot"))
      val scored = raw.crossJoin(tot)
        .select(col("v"), round(col("raw") / col("tot"), 12).as(cName))
      verts.join(scored, Seq("v"), "left")
        .select(col("v"), coalesce(col(cName), lit(0.0d)).as(cName))
    }
    for (i <- 1 to iterations) {
      // a_raw(v) = Σ_{u→v} h(u): exact scaled-long sum; Σh = 1 bounds every
      // partial below 1e18 so the long accumulator cannot overflow
      val aRaw = e.join(hub, e("src") === hub("v"))
        .groupBy(e("dst").as("v"))
        .agg(round(sum(floor(col("hub") * lit(1.0e18d) + lit(0.5d)).cast(LongType))
          .cast(DoubleType) / lit(1.0e18d), 12).as("raw"))
      auth = renorm(aRaw, "auth").compacted.localCheckpoint(eager = true)
      val hRaw = e.join(auth, e("dst") === auth("v"))
        .groupBy(e("src").as("v"))
        .agg(round(sum(floor(col("auth") * lit(1.0e18d) + lit(0.5d)).cast(LongType))
          .cast(DoubleType) / lit(1.0e18d), 12).as("raw"))
      hub = renorm(hRaw, "hub").compacted.localCheckpoint(eager = true)
    }
    auth.join(hub, "v")
  }
}
