package graft

import graft.graph.Graphs
import org.apache.spark.sql.functions._

/** Golden test from the PDF2 spec's worked example (FIXTURES.md F6) plus
  * PageRank/LPA structural invariants. */
// Slow tier (VERDICT r12 #4): excluded from the default `sbt test` run —
// the full tier runs with GRAFT_SLOW_TESTS=1 (round_close.sh does).
@org.scalatest.tags.Slow
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  // Two "paragraphs" of person names (the spec's exact example).
  private def paragraphs = Seq(
    (1L, "狄云"), (1L, "戚芳"), (1L, "戚芳"), (1L, "戚长发"), (1L, "卜垣"),
    (2L, "戚芳"), (2L, "卜垣"), (2L, "卜垣")
  ).toDF("pid", "name")

  test("co-occurrence matches the PDF2 golden pair counts") {
    val pairs = Graphs.coOccurrence(paragraphs, "pid", "name")
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val golden = Map(
      ("狄云", "戚芳") -> 1L, ("狄云", "戚长发") -> 1L, ("狄云", "卜垣") -> 1L,
      ("戚芳", "狄云") -> 1L, ("戚芳", "戚长发") -> 1L, ("戚芳", "卜垣") -> 2L,
      ("戚长发", "狄云") -> 1L, ("戚长发", "戚芳") -> 1L, ("戚长发", "卜垣") -> 1L,
      ("卜垣", "狄云") -> 1L, ("卜垣", "戚芳") -> 2L, ("卜垣", "戚长发") -> 1L)
    assert(pairs == golden)
  }

  test("normalized out-edge weights match the PDF2 golden adjacency") {
    val w = Graphs.normalizeEdges(Graphs.coOccurrence(paragraphs, "pid", "name"))
      .select($"src", $"dst", $"w").as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(w(("狄云", "戚芳")) == 1.0 / 3.0)
    assert(w(("戚芳", "卜垣")) == 0.5)
    assert(w(("卜垣", "戚芳")) == 0.5)
    assert(w(("卜垣", "狄云")) == 0.25)
  }

  test("edge weights sum to 1 per source") {
    val sums = Graphs.normalizeEdges(Graphs.coOccurrence(paragraphs, "pid", "name"))
      .groupBy($"src").agg(sum($"w").as("s")).as[(String, Double)].collect()
    assert(sums.forall { case (_, s) => math.abs(s - 1.0) < 1e-12 })
  }

  test("pagerank: ranks sum to ~1 and the most-connected vertex ranks highest") {
    val edges = Graphs.normalizeEdges(Graphs.coOccurrence(paragraphs, "pid", "name"))
    val ranks = Graphs.pageRank(edges, iterations = 20).as[(String, Double)].collect().toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-6)
    // 戚芳 and 卜垣 share the heaviest edges; both must outrank 狄云/戚长发
    assert(ranks("戚芳") > ranks("狄云") && ranks("卜垣") > ranks("戚长发"))
  }

  test("label propagation converges to a single community on this graph") {
    val labels = Graphs.labelPropagation(
      Graphs.coOccurrence(paragraphs, "pid", "name"), iterations = 4)
      .as[(String, String)].collect().toMap
    assert(labels.size == 4)
    assert(labels.values.toSet.size == 1)
  }

  test("connected components: min-label fixpoint over a multi-round chain") {
    // component {1,2,3,4,5} is a CHAIN (diameter 4 — forces several
    // propagation rounds), component {10,11} a single edge, 7 isolated
    // (absent from edges, so absent from the result by contract)
    val edges = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), (10L, 11L))
      .toDF("src", "dst")
    val comp = Graphs.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connected components: empty edge list yields empty result") {
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graphs.connectedComponents(edges).count() == 0)
  }

  test("general pagerank conserves mass and redistributes the dangling share") {
    // 1 -> {2, 3}, 2 -> 3; vertex 3 is dangling, vertex 1 has no in-edges
    val e = Seq((1L, 2L, 0.5), (1L, 3L, 0.5), (2L, 3L, 1.0)).toDF("src", "dst", "w")
    val ranks = Graphs.pageRankGeneral(e, iterations = 20)
      .as[(Long, Double)].collect().toMap
    assert(ranks.size == 3)
    // dangling redistribution conserves total mass (plain update would leak
    // vertex 3's rank every round and the sum would collapse toward 0.15)
    assert(math.abs(ranks.values.sum - 1.0) < 1e-6)
    assert(ranks(3L) > ranks(2L)) // the sink accumulates the most mass
    // a no-inbound vertex still earns MORE than bare teleport: its entire
    // excess over (1-d)/n is the redistributed dangling share
    assert(ranks(1L) > (1.0 - 0.85) / 3 + 1e-3)
  }

  test("two-phase CC converges in O(log n) rounds on a 128-deep chain") {
    // the adversarial-diameter fixture (VERDICT r5 Next #4): a duplicate
    // chain doc_i ~ doc_{i+1}. Min-label propagation needs 128 rounds;
    // large-star/small-star must stay logarithmic.
    val edges = (0L until 128L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = Graphs.twoPhaseCc(edges)
    assert(rounds <= 12, s"expected O(log n) rounds on a chain, took $rounds")
    val comp = labels.as[(Long, Long)].collect()
    assert(comp.length == 129 && comp.forall(_._2 == 0L))
  }

  test("two-phase CC equals min-label propagation on an adversarial mix") {
    // chains of different depths + a star + a triangle + reversed edges,
    // ids deliberately out of discovery order
    val edges = ((10L until 40L).map(i => (i + 1, i)) ++ // descending chain
      Seq((50L, 60L), (50L, 61L), (50L, 62L), (62L, 50L)) ++ // star + dup edge
      Seq((70L, 71L), (71L, 72L), (72L, 70L)) ++ // triangle
      Seq((90L, 2L), (2L, 91L))).toDF("src", "dst")
    val two = Graphs.twoPhaseCc(edges)._1.as[(Long, Long)].collect().toMap
    val prop = Graphs.minLabelCc(edges).as[(Long, Long)].collect().toMap
    assert(two == prop)
    assert(two(40L) == 10L && two(62L) == 50L && two(72L) == 70L && two(90L) == 2L)
  }

  test("triangle counts: clique, pendant, and triangle-free components") {
    // 4-clique {1,2,3,4} (each vertex in C(3,2)=3 triangles), pendant 5–1,
    // and a triangle-free edge 6–7; input deliberately mixes directions
    // and duplicates to exercise canonicalization.
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 2L), (3L, 4L),
      (5L, 1L), (6L, 7L), (6L, 7L)).toDF("src", "dst")
    val got = Graphs.triangleCounts(edges).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 0L, 6L -> 0L, 7L -> 0L))
  }

  test("triangle counts: apex fan-out is bounded by orientation, not hub degree") {
    // star hub 0 with 40 leaves plus one closing edge (1,2): exactly one
    // triangle {0,1,2}. Degree orientation must find it while never using
    // the hub as a wedge apex.
    val edges = ((1L to 40L).map(i => (0L, i)) ++ Seq((1L, 2L))).toDF("src", "dst")
    val got = Graphs.triangleCounts(edges).as[(Long, Long)].collect().toMap
    assert(got(0L) == 1L && got(1L) == 1L && got(2L) == 1L)
    assert((3L to 40L).forall(got(_) == 0L))
    assert(got.values.sum == 3L)
  }

  test("personalized pagerank: unreachable vertices score exactly zero, mass conserved") {
    // two disjoint 2-cycles (1↔2, 3↔4), seed {1}: the walk can never reach
    // {3,4} (exact 0.0, not epsilon); teleport+walk keeps total mass 1
    val edges = Seq((1L, 2L, 1.0), (2L, 1L, 1.0), (3L, 4L, 1.0), (4L, 3L, 1.0))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("v")
    val got = Graphs.personalizedPageRank(edges, seeds, iterations = 12)
      .as[(Long, Double)].collect().toMap
    assert(got(3L) == 0.0 && got(4L) == 0.0, s"unreachable must be exact 0: $got")
    assert(got(1L) > got(2L) && got(2L) > 0, s"seed must outrank its neighbor: $got")
    assert(math.abs(got.values.sum - 1.0) < 1e-9, s"mass not conserved: ${got.values.sum}")
    // a seed set disjoint from the graph is refused loudly
    intercept[IllegalArgumentException] {
      Graphs.personalizedPageRank(edges, Seq(99L).toDF("v"), iterations = 2)
    }
  }

  test("k-core: chain cascades one layer per round, triangle survives as a 2-core") {
    // 8-vertex chain (1..8) + disjoint triangle (10,11,12). At k=2 the
    // chain peels from both ends — each round's removal drops the next
    // vertex below k — so 4 cascading rounds empty it; the triangle is
    // exactly the surviving 2-core.
    val edges = ((1L to 7L).map(i => (i, i + 1)) ++
      Seq((10L, 11L), (11L, 12L), (10L, 12L))).toDF("src", "dst")
    val (core, rounds) = Graphs.kCoreWithRounds(edges, k = 2)
    val got = core.as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 2L, 11L -> 2L, 12L -> 2L), s"core: $got")
    assert(rounds == 4, s"expected 4 cascading peel rounds, got $rounds")
  }

  test("k-core: q114's oracle unroll depth of 6 covers the query input's peel depth") {
    // The q114 oracle unrolls a FIXED 6 peel rounds; the operator peels to
    // fixpoint. This pins the margin on the query's ACTUAL verify-scale
    // input (real corpus graph + fixture) instead of assuming it (ADVICE
    // r7): if a corpus change ever cascades deeper than 6, this fails
    // loudly here, not as an inscrutable oracle hash mismatch.
    val real = graft.graph.Graphs.coOccurrence(
      graft.operators.TextPipeline.tokenize(
        graft.sources.Tables(spark, "/root/testdata/sf0.01", "documents")))
      .filter(col("cnt") >= 20).select(col("src"), col("dst"))
    val fixture = (
      (1 to 7).map(i => (s"kcfix$i", s"kcfix${i + 1}")) ++
        Seq(("ktfix1", "ktfix2"), ("ktfix2", "ktfix3"), ("ktfix1", "ktfix3"))
      ).toDF("src", "dst")
    val (_, rounds) = Graphs.kCoreWithRounds(real.union(fixture), k = 2)
    assert(rounds <= 6, s"q114 oracle unrolls 6 rounds but the input needs $rounds — " +
      "extend the oracle's unroll depth")
  }

  test("k-core: k above the max degree yields an empty core; clique survives intact") {
    val clique = (for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)).toDF("src", "dst")
    val all = Graphs.kCore(clique, k = 4).as[(Long, Long)].collect().toMap
    assert(all == (1L to 5L).map(_ -> 4L).toMap)
    assert(Graphs.kCore(clique, k = 5).count() == 0L)
  }

  test("adamic-adar: hand-computed scores, adjacent pairs excluded") {
    // path 1-2-3 plus hub 4 adjacent to all of {1,2,3}:
    //   deg: 1->2 (2,4), 2->3 (1,3,4), 3->2 (2,4), 4->3 (1,2,3)
    //   non-adjacent pairs: only (1,3), common neighbors {2, 4}
    //   AA(1,3) = 1/ln(3) + 1/ln(3)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 4L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val got = Graphs.adamicAdar(edges).as[(Long, Long, Long, Double)].collect()
    assert(got.length == 1, s"expected only the (1,3) pair: ${got.mkString(",")}")
    val (x, y, nc, score) = got.head
    assert((x, y, nc) == ((1L, 3L, 2L)))
    val term = BigDecimal(1.0 / BigDecimal(math.log(3.0)).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = BigDecimal(term + term).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(score == expected, s"got $score expected $expected")
  }

  test("adamic-adar: degree cap drops hub-mediated wedges only") {
    // pairs mediated ONLY by a hub above the cap disappear; pairs with a
    // low-degree common neighbor keep that neighbor's contribution
    val hub = (1L to 10L).map(i => (100L, i))
    val lowZ = Seq((1L, 50L), (2L, 50L)) // z=50 has degree 2
    val got = Graphs.adamicAdar((hub ++ lowZ).toDF("src", "dst"), maxDegree = Some(5))
      .as[(Long, Long, Long, Double)].collect()
    // without the cap every pair (i,j), i<j≤10, shares hub 100 — 45 pairs.
    // With it, hub-mediated wedges vanish: (1,2) survives via z=50 alone
    // (one common neighbor — the hub's contribution is dropped), and
    // (50,100) survives via its low-degree common neighbors z∈{1,2}
    val byPair = got.map(r => (r._1, r._2) -> r._3).toMap
    assert(byPair == Map((1L, 2L) -> 1L, (50L, 100L) -> 2L), got.mkString(","))
  }

  test("bfsHops: layered distances, min over multiple seeds, horizon exclusion") {
    // chain 1-2-3-4-5-6-7-8-9 plus a shortcut 1-5: seed {1} reaches 5 in
    // one hop via the shortcut, so 6 settles at 2 not 5; vertex 9 sits 5
    // hops out and a horizon of 4 must exclude it. A second seed {9}
    // then pulls the tail distances down to min-over-seeds.
    val edges = ((1L to 8L).map(i => (i, i + 1)) :+ (1L, 5L)).toDF("src", "dst")
    val one = Graphs.bfsHops(edges, Seq(1L).toDF("v"), maxHops = 4)
      .as[(Long, Long)].collect().toMap
    assert(one == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L,
      6L -> 2L, 7L -> 3L, 8L -> 4L), s"one-seed: $one")
    val two = Graphs.bfsHops(edges, Seq(1L, 9L).toDF("v"), maxHops = 4)
      .as[(Long, Long)].collect().toMap
    assert(two(9L) == 0L && two(8L) == 1L && two(7L) == 2L && two(6L) == 2L,
      s"two-seed: $two")
    // maxHops = 0 is just the seed set
    val zero = Graphs.bfsHops(edges, Seq(3L).toDF("v"), maxHops = 0)
      .as[(Long, Long)].collect().toMap
    assert(zero == Map(3L -> 0L))
  }

  test("shortestPathsBounded: cheap long path beats expensive edge, ties to fewer hops") {
    // s→x direct costs 10; s→y→z→x costs 3 over 3 hops. s→t direct cost 2
    // ties s→y→t (1+1) — fewer hops must win. Horizon 2 can only see the
    // 2-hop prefix of the cheap path.
    val edges = Seq(
      ("s", "x", 10L), ("s", "y", 1L), ("y", "z", 1L), ("z", "x", 1L),
      ("s", "t", 2L), ("y", "t", 1L)).toDF("src", "dst", "cost")
    val got = Graphs.shortestPathsBounded(edges, Seq("s").toDF("v"), maxHops = 6)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("x") == (3L, 3L), got.toString)
    assert(got("t") == (2L, 1L), got.toString)
    assert(got("y") == (1L, 1L) && got("z") == (2L, 2L) && got("s") == (0L, 0L))
    val short = Graphs.shortestPathsBounded(edges, Seq("s").toDF("v"), maxHops = 1)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // one hop: x still reachable only via the cost-10 edge
    assert(short("x") == (10L, 1L), short.toString)
    assert(!short.contains("z"))
  }

  test("shortestPathsBounded: negative edge cost is refused plan-side") {
    // a negative cost would silently corrupt the lexicographic packed MIN;
    // the operator guards it with a per-row raise_error
    val bad = Seq(("s", "x", -1L)).toDF("src", "dst", "cost")
    val e = intercept[Exception] {
      Graphs.shortestPathsBounded(bad, Seq("s").toDF("v"), maxHops = 2)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("edge cost outside")), e.toString)
  }

  test("kTruss: triangle chain cascades away, K4 survives; depth bounded") {
    // chain T{1,2,3}, T{2,3,4}, T{3,4,5}: outer edges have support 1 and
    // drop in round 1; the shared edges (2,3), (3,4) then lose their
    // triangles and drop in round 2 — full cascade. The K4 survives as
    // its own 4-truss (every edge in 2 triangles).
    val chain = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (3L, 5L), (4L, 5L))
    val k4 = Seq((6L, 7L), (6L, 8L), (6L, 9L), (7L, 8L), (7L, 9L), (8L, 9L))
    val edges = (chain ++ k4).toDF("src", "dst")
    val (truss, rounds) = Graphs.kTrussWithRounds(edges, k = 4)
    val got = truss.as[(Long, Long, Long)].collect().toSet
    assert(got == k4.map { case (a, b) => (a, b, 2L) }.toSet, got.toString)
    assert(rounds == 2, s"expected cascade depth 2, got $rounds")
    // the whole graph is its own 2-truss (support >= 0)
    assert(Graphs.kTruss(edges, k = 2).count() == 13L)
  }

  test("q171's input peels within the oracle's unrolled margin") {
    import org.apache.spark.sql.functions.col
    val real = Graphs.coOccurrence(
      graft.operators.TextPipeline.tokenize(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")))
      .filter(col("cnt") >= 20).select(col("src"), col("dst"))
    val fixture = (Seq(
      ("ktfx1", "ktfx2"), ("ktfx1", "ktfx3"), ("ktfx2", "ktfx3"),
      ("ktfx2", "ktfx4"), ("ktfx3", "ktfx4"),
      ("ktfx3", "ktfx5"), ("ktfx4", "ktfx5"),
      ("kqfx1", "kqfx2"), ("kqfx1", "kqfx3"), ("kqfx1", "kqfx4"),
      ("kqfx2", "kqfx3"), ("kqfx2", "kqfx4"), ("kqfx3", "kqfx4"))).toDF("src", "dst")
    val (_, rounds) = Graphs.kTrussWithRounds(real.union(fixture), k = 4)
    assert(rounds <= 4, s"q171 oracle unrolls 4 rounds but the input needs $rounds")
  }

  test("modularity: two clear clusters score high, one-community scores zero") {
    // two triangles joined by one bridge edge — the textbook 2-community graph
    val edges = Seq(("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
      ("b1", "b2"), ("b2", "b3"), ("b1", "b3"), ("a1", "b1")).toDF("src", "dst")
    val goodLabels = Seq("a1" -> "A", "a2" -> "A", "a3" -> "A",
      "b1" -> "B", "b2" -> "B", "b3" -> "B").toDF("v", "label")
    val good = Graphs.modularity(edges, goodLabels).collect().head
    assert(good.getAs[Long]("m_edges") == 7L)
    assert(good.getAs[Long]("n_communities") == 2L)
    // Q = Σ(4·7·e_c − d_c²)/(4·49): e=3 each, d = 7 both → (84−49)·2/196 = 0.35714286
    assert(good.getAs[Double]("modularity") == 0.35714286, good.toString)
    // everything in one community: Q = (4m·m − (2m)²)/(4m²) = 0 exactly
    val one = Graphs.modularity(edges,
      edges.select(explode(array($"src", $"dst")).as("v")).distinct()
        .select($"v", lit("X").as("label"))).collect().head
    assert(one.getAs[Double]("modularity") == 0.0, one.toString)
    // a bad partition (cut through the triangles) scores below the good one
    val badLabels = Seq("a1" -> "A", "b1" -> "A", "a2" -> "B", "b2" -> "B",
      "a3" -> "B", "b3" -> "B").toDF("v", "label")
    val bad = Graphs.modularity(edges, badLabels).collect().head
    assert(bad.getAs[Double]("modularity") < good.getAs[Double]("modularity"))
  }

  test("hits: bipartite hubs/authorities, L1 sums, zero sides") {
    // 2 hubs → 3 authorities; a1 is cited by both hubs, a2/a3 by one each.
    val edges = Seq(("h1", "a1"), ("h1", "a2"), ("h2", "a1"), ("h2", "a3"))
      .toDF("src", "dst")
    val got = Graphs.hits(edges, iterations = 4)
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // pure hubs never receive authority; pure authorities never hub
    assert(got("h1")._1 == 0.0 && got("h2")._1 == 0.0)
    assert(got("a1")._2 == 0.0 && got("a2")._2 == 0.0 && got("a3")._2 == 0.0)
    // L1 normalization: each score family sums to 1 (12-dp tolerance)
    val aSum = got.values.map(_._1).sum
    val hSum = got.values.map(_._2).sum
    assert(math.abs(aSum - 1.0) < 1e-9, s"auth sum $aSum")
    assert(math.abs(hSum - 1.0) < 1e-9, s"hub sum $hSum")
    // a1 has two citing hubs, a2/a3 one each → strictly more authority;
    // symmetric structure makes a2 and a3 (and h1, h2) tie exactly
    assert(got("a1")._1 > got("a2")._1)
    assert(got("a2")._1 == got("a3")._1)
    assert(got("h1")._2 == got("h2")._2)
    // fixpoint here: a1 = 1/2, a2 = a3 = 1/4 (both hubs cite a1 equally)
    assert(math.abs(got("a1")._1 - 0.5) < 1e-9, got("a1").toString)
    assert(math.abs(got("a2")._1 - 0.25) < 1e-9)
  }

  test("hits: asymmetric chain separates hub from authority rankings") {
    // digraph: x→y, y→z, x→z — y is both a hub (cites z) and an
    // authority (cited by x); z is the dominant authority, x the hub
    val edges = Seq(("x", "y"), ("y", "z"), ("x", "z")).toDF("src", "dst")
    val got = Graphs.hits(edges, iterations = 4)
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("z")._1 > got("y")._1 && got("y")._1 > got("x")._1, got.toString)
    assert(got("x")._2 > got("y")._2 && got("y")._2 > got("z")._2, got.toString)
  }
}
