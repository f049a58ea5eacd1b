package graft.queries

import graft.QueryDef
import graft.graph.Graphs
import graft.operators.TextPipeline
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Graph-mining queries (PDF2 workload): co-occurrence network of terms over
  * documents, normalized adjacency, PageRank, Label Propagation. The PageRank
  * and LPA oracles are fixed-iteration loop *unrollings* into chained CTEs —
  * same dataflow the Spark driver loop executes, so results are comparable.
  */
object Graph {

  private def edgesCte: String = s"""
    WITH ${Text.toksCte},
    dt AS (SELECT DISTINCT doc_id, term FROM toks),
    cooc AS (
      SELECT a.term AS src, b.term AS dst, COUNT(*) AS cnt
      FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term <> b.term
      GROUP BY 1, 2),
    edges AS (
      SELECT src, dst, cnt,
        CAST(cnt AS DOUBLE)/CAST(SUM(cnt) OVER (PARTITION BY src) AS DOUBLE) AS w
      FROM cooc),
    verts AS (SELECT DISTINCT src AS v FROM cooc),
    nv AS (SELECT COUNT(*) AS n FROM verts)"""

  /** Unrolled PageRank oracle: r0 … r{iters} as chained aggregating CTEs;
    * `finalSelect` runs over the last round aliased as (term, rank).
    * Mirrors [[Graphs.pageRank]]'s determinism contract: each double product
    * rounds half-up to an exact 1e-18 micro-unit integer (pure IEEE ops),
    * the integers sum exactly, and the new rank rounds to 12 dp — so both
    * engines re-sync each round regardless of aggregation order. (DuckDB
    * SUM(BIGINT) yields HUGEINT — the exact sum — cast straight to DOUBLE,
    * matching Spark's long→double cast bit-for-bit since the value < 2^63.) */
  private def pageRankSql(iters: Int, d: Double,
                          finalSelect: String = "SELECT term, rank FROM result"): String = {
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (
        SELECT e.dst AS v,
          round((SELECT CAST(1.0-$d AS DOUBLE)/n FROM nv) +
            $d*(CAST(SUM(CAST(floor(r.rank*e.w*1e18 + 0.5) AS BIGINT)) AS DOUBLE)/1e18), 12) AS rank
        FROM edges e JOIN r${i - 1} r ON e.src = r.v GROUP BY e.dst)"""
    }.mkString(",\n")
    s"""$edgesCte,
    r0 AS (SELECT v, CAST(1.0 AS DOUBLE)/(SELECT n FROM nv) AS rank FROM verts),
    $rounds,
    result AS (SELECT v AS term, round(rank, 6) AS rank FROM r$iters)
    $finalSelect"""
  }

  /** Unrolled synchronous LPA oracle with (max integer weight, min label)
    * tie-breaking — bit-exact across engines because weights stay integral. */
  private def lpaSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""l$i AS (
        SELECT v, label FROM (
          SELECT e.src AS v, l.label, SUM(e.cnt) AS wsum,
            row_number() OVER (PARTITION BY e.src ORDER BY SUM(e.cnt) DESC, l.label ASC) AS rn
          FROM edges e JOIN l${i - 1} l ON e.dst = l.v GROUP BY e.src, l.label) t
        WHERE rn = 1)"""
    }.mkString(",\n")
    s"""$edgesCte,
    l0 AS (SELECT v, v AS label FROM verts),
    $rounds,
    result AS (SELECT v AS term, label FROM l$iters)"""
  }

  private def termEdges(s: org.apache.spark.sql.SparkSession, dir: String) =
    Graphs.normalizeEdges(
      Graphs.coOccurrence(TextPipeline.tokenize(Tables(s, dir, "documents"))))

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q23_cooccurrence",
      (s, dir) => Graphs.coOccurrence(TextPipeline.tokenize(Tables(s, dir, "documents")))
        .select(col("src"), col("dst"), col("cnt")),
      oracle = Some(s"""
        ${Text.toksCte.replaceFirst("^\\s*", "WITH ")},
        dt AS (SELECT DISTINCT doc_id, term FROM toks)
        SELECT a.term AS src, b.term AS dst, COUNT(*) AS cnt
        FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term <> b.term
        GROUP BY 1, 2"""),
      bench = true),

    QueryDef("q24_edge_weights",
      (s, dir) => termEdges(s, dir).select(col("src"), col("dst"), col("cnt"), col("w")),
      oracle = Some(s"""$edgesCte
        SELECT src, dst, cnt, w FROM edges""")),

    QueryDef("q25_pagerank",
      (s, dir) => Graphs.pageRank(termEdges(s, dir), iterations = 10)
        .select(col("v").as("term"), round(col("rank"), 6).as("rank")),
      oracle = Some(pageRankSql(10, 0.85)),
      bench = true),

    QueryDef("q26_label_propagation",
      (s, dir) => Graphs.labelPropagation(
        Graphs.coOccurrence(TextPipeline.tokenize(Tables(s, dir, "documents"))), iterations = 5)
        .select(col("v").as("term"), col("label")),
      oracle = Some(lpaSql(5) + "\n    SELECT term, label FROM result")),

    // T4: global rank sort + limit — "find the protagonists" (PDF2 p.6 task 6)
    QueryDef("q43_top_ranked",
      (s, dir) => Graphs.pageRank(termEdges(s, dir), iterations = 10)
        .select(col("v").as("term"), round(col("rank"), 6).as("rank"))
        .orderBy(col("rank").desc, col("term").asc)
        .limit(10),
      oracle = Some(pageRankSql(10, 0.85,
        "SELECT term, rank FROM result ORDER BY rank DESC, term ASC LIMIT 10"))),

    // T5: group-by-label collation of community members (PDF2 p.6 task 6)
    QueryDef("q44_communities",
      (s, dir) => Graphs.labelPropagation(
        Graphs.coOccurrence(TextPipeline.tokenize(Tables(s, dir, "documents"))), iterations = 5)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("size"),
          array_join(array_sort(collect_list(col("v"))), ",").as("members")),
      oracle = Some(lpaSql(5) + """
        SELECT label, COUNT(*) AS size,
          string_agg(term, ',' ORDER BY term) AS members
        FROM result GROUP BY label""")),

    // A11 at token-window granularity: co-occurrence within a ±3-token
    // window (a range join on positions, PDF2's sliding-scope alternative)
    QueryDef("q58_cooccur_window",
      (s, dir) => {
        val pos = Tables(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(graft.functions.Exprs.tokens(col("text"))).as(Seq("pos", "term")))
        val a = pos.as("a")
        val b = pos.as("b")
        a.join(b, col("a.doc_id") === col("b.doc_id") &&
            col("a.term") =!= col("b.term") &&
            abs(col("a.pos") - col("b.pos")) <= 3)
          .groupBy(col("a.term").as("src"), col("b.term").as("dst"))
          .agg(count(lit(1)).as("cnt"))
      },
      oracle = Some(s"""
        WITH seq AS (
          SELECT doc_id,
            list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
                        t -> t <> '') AS tk
          FROM documents),
        pos AS (
          SELECT doc_id, i - 1 AS pos, tk[i] AS term
          FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS i FROM seq) g)
        SELECT a.term AS src, b.term AS dst, COUNT(*) AS cnt
        FROM pos a JOIN pos b
          ON a.doc_id = b.doc_id AND a.term <> b.term AND abs(a.pos - b.pos) <= 3
        GROUP BY 1, 2"""))
  )
}
