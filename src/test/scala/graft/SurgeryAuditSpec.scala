package graft

import org.apache.spark.sql.functions._

/** The q239 residual-audit's POSITIVE branch: the synthetic corpus proves
  * surgery idempotent (n_residual_hits = 0 everywhere), so this spec pins
  * the detector on a crafted weld — a corpus where cutting the contaminated
  * span joins its neighbors into an 8-gram that IS a benchmark gram. A
  * hash-matched all-zero column proves consistency, not behavior (the q224
  * lesson); this is the behavior half. */
class SurgeryAuditSpec extends SparkSpec {
  import spark.implicits._

  test("a weld that recreates a benchmark gram is counted as a residual hit") {
    // doc 97 (the benchmark slice, 97 % 97 == 0): carries the contaminating
    // gram C = c1..c8 and the weld gram W = w1..w8, separated by junk so no
    // mixed window of doc 97 accidentally matches a window of doc 1.
    // doc 1: W's first half, then C, then W's second half — the only
    // flagged window is C itself (positions 5-12); cutting it welds
    // w4|w5, and the cleaned text IS exactly W.
    // doc 2: clean — must not appear in the audit at all.
    // ids avoid the query's enrichment arms (1 % 13, 1 % 7, 97 % 13,
    // 97 % 7 all nonzero) so the crafted texts reach the census verbatim.
    val c = (1 to 8).map(i => s"c$i").mkString(" ")
    val w = (1 to 8).map(i => s"w$i").mkString(" ")
    val junk = (1 to 7).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (97L, s"$c $junk $w"),
      (1L, s"w1 w2 w3 w4 $c w5 w6 w7 w8"),
      (2L, "nothing suspicious in this document at all today")
    ).toDF("doc_id", "text")
    // deleted in the finally below (ADVICE r13): repeated runs were
    // accumulating parquet trees in /tmp — the leak class Scratch fixed
    val dirP = java.nio.file.Files.createTempDirectory("graft_surgery_audit")
    val dir = dirP.toString
    try {
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val audit = SparkEntry.queries("q239_decontam_residual_audit")(spark, dir)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      // doc 1 only: 8 survivors, one seam (w4|w5), one seam-spanning gram —
      // and that gram is W, a benchmark gram: residual hit counted.
      assert(audit == Set((1L, 8L, 1L, 1L, 1L)))

      // the q238 emission on the same corpus: the cleaned text is exactly W —
      // the weld the audit flagged is really there in the deploy artifact
      val emitted = SparkEntry.queries("q238_decontam_surgery_emit")(spark, dir)
        .select(col("doc_id"), col("clean_text")).as[(Long, String)].collect().toSet
      assert(emitted == Set((1L, w)))
    } finally {
      graft.Caching.release()
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(): Unit
      }
      rm(dirP.toFile)
    }
  }
}
