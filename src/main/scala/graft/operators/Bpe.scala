package graft.operators

import graft.Par.ParOps
import graft.functions.{BpeEncode, BpeMergeStep, Exprs}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable byte-pair-encoding tokenizer (Sennrich et al., ACL 2016) —
  * the subword tokenizer a training-data pipeline actually packs and mixes
  * by, replacing the whitespace proxy counts of q75/q78.
  *
  * Training is the PageRank loop shape ([[graft.graph.Graphs.pageRank]]):
  * the distributed state is one row per DISTINCT corpus word — (count,
  * symbol sequence) — and each round is (1) a pair-count shuffle: explode
  * adjacent symbol pairs, weighted sum by word count; (2) a driver-side
  * argmax of ONE row (count desc, then lexicographic (l, r) — fully
  * deterministic, engine-portable over the ASCII token alphabet); (3) a
  * narrow per-row merge application ([[BpeMergeStep]], no shuffle). State
  * is localCheckpoint'ed every 4 rounds, the measured PageRank cadence.
  *
  * Scale: the state is word-vocabulary-sized, not corpus-sized — the only
  * corpus-wide pass is the initial word count (one shuffle). Pair counting
  * shuffles the vocabulary (bounded, Heaps'-law growth), and the argmax
  * moves a single row to the driver per round. Encoding never shuffles:
  * the merge table is numMerges entries, shipped as a plan-time constant
  * inside [[BpeEncode]] (the GreedySegment pattern).
  *
  * Determinism contract with the DuckDB oracle: identical pair counting
  * (adjacent positions, overlap allowed), identical tie-break, identical
  * greedy merge application — the oracle unrolls the rounds as
  * MATERIALIZED CTEs and replays the merge as a `list_reduce` fold.
  */
object Bpe {

  /** One trained merge: at `rank`, symbols `l` + `r` fuse to `l+r`. */
  case class Merge(rank: Long, l: String, r: String)

  /** Train `numMerges` merges on the word distribution of `textCol`.
    * Stops early if the corpus runs out of adjacent pairs. */
  def train(docs: DataFrame, textCol: Column, numMerges: Int): Seq[Merge] = {
    // corpus-wide pass: one shuffle to the distinct-word frame, then chars.
    // localCheckpoint (not persist): private to this loop, no CacheManager
    // entry a plan-identical concurrent query could swap mid-training.
    var syms = docs.select(explode(Exprs.tokens(textCol)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), filter(split(col("word"), ""), c => c =!= "").as("syms"))
      .compacted.localCheckpoint(eager = true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val best = syms
        .select(col("cnt"),
          slice(col("syms"), lit(1), size(col("syms")) - 1).as("la"),
          slice(col("syms"), lit(2), size(col("syms")) - 1).as("ra"))
        .select(col("cnt"), explode(arrays_zip(col("la"), col("ra"))).as("p"))
        .groupBy(col("p.la").as("l"), col("p.ra").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r) = (best(0).getString(0), best(0).getString(1))
        merges += Merge(rank.toLong, l, r)
        syms = syms.withColumn("syms", BpeMergeStep(col("syms"), l, r))
        if (rank % 4 == 0 && rank < numMerges)
          syms = syms.compacted.localCheckpoint(eager = true)
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Encode a token-array column with a trained merge table (applied in
    * rank order — reproduces the training segmentation for seen words). */
  def encode(tokens: Column, merges: Seq[Merge]): Column =
    BpeEncode(tokens, merges.sortBy(_.rank).map(m => (m.l, m.r)))

  /** One trained WordPiece merge: `l`+`r` fuse at `rank`, selected with
    * likelihood `score`. */
  case class ScoredMerge(rank: Long, l: String, r: String, score: Double)

  /** WordPiece-style trainer (Schuster & Nakajima, ICASSP 2012 — the BERT
    * tokenizer's training objective as implemented by the HuggingFace
    * `tokenizers` WordPiece trainer): identical loop shape to [[train]],
    * but each round's merge maximizes the LIKELIHOOD score
    * `count(l,r) / (count(l) · count(r))` instead of the raw pair count —
    * a rare-symbol pair that almost always co-occurs beats a frequent
    * pair of independently-frequent symbols. Per round this costs one
    * extra vocabulary-frame shuffle (the per-symbol occurrence census);
    * the score is one double division of exactly-representable integers
    * rounded to 12 dp (the denominator multiplies AS DOUBLE so corpus
    * totals past 2^31.5 cannot overflow a long product), so the argmax
    * row — and with it the whole training trajectory — replays
    * bit-identically in SQL. Merge application and the encode path are
    * shared with BPE unchanged ([[BpeMergeStep]]/[[encode]]). */
  def trainWordPiece(docs: DataFrame, textCol: Column,
                     numMerges: Int): Seq[ScoredMerge] = {
    val dbl = org.apache.spark.sql.types.DoubleType
    var syms = docs.select(explode(Exprs.tokens(textCol)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), filter(split(col("word"), ""), c => c =!= "").as("syms"))
      .compacted.localCheckpoint(eager = true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[ScoredMerge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val symCnt = syms.select(explode(col("syms")).as("s"), col("cnt"))
        .groupBy(col("s")).agg(sum(col("cnt")).as("cs"))
      val best = syms
        .select(col("cnt"),
          slice(col("syms"), lit(1), size(col("syms")) - 1).as("la"),
          slice(col("syms"), lit(2), size(col("syms")) - 1).as("ra"))
        .select(col("cnt"), explode(arrays_zip(col("la"), col("ra"))).as("p"))
        .groupBy(col("p.la").as("l"), col("p.ra").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .join(symCnt.select(col("s").as("l"), col("cs").as("cl")), "l")
        .join(symCnt.select(col("s").as("r"), col("cs").as("cr")), "r")
        .select(col("l"), col("r"),
          round(col("c").cast(dbl) / (col("cl").cast(dbl) * col("cr").cast(dbl)), 12)
            .as("score"))
        .orderBy(col("score").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r) = (best(0).getString(0), best(0).getString(1))
        merges += ScoredMerge(rank.toLong, l, r, best(0).getDouble(2))
        syms = syms.withColumn("syms", BpeMergeStep(col("syms"), l, r))
        if (rank % 4 == 0 && rank < numMerges)
          syms = syms.compacted.localCheckpoint(eager = true)
        rank += 1
      }
    }
    merges.toSeq
  }
}
