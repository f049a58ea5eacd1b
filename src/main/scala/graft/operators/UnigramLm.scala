package graft.operators

import graft.Par.ParOps
import graft.functions.Exprs.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Unigram-language-model subword tokenizer (Kudo, "Subword Regularization",
  * ACL 2018 — the SentencePiece unigram algorithm's E/M core), in BOTH
  * E-step flavors: [[train]] runs hard EM (Viterbi argmax counts) and
  * [[trainEm]] the full soft EM (forward–backward lattice posteriors —
  * Kudo §3.2's actual E-step). The M-step re-estimates piece
  * probabilities from the (hard or expected) counts with add-one smoothing
  * over the frequency-pruned substring seed vocabulary. The one remaining
  * simplification vs Kudo, documented as the operator's contract: the
  * vocabulary is fixed after seeding (no likelihood-loss pruning
  * schedule) — the BPE family (q79–q84) covers the learned-merge
  * tokenizer; this operator covers the probabilistic-segmentation family.
  *
  * Spark-first shape — NO driver action anywhere (not even a count):
  *   - the corpus is touched ONCE (word counts — Heaps-bounded);
  *   - the substring table, the DP, and the backpointer walk are all
  *     word-keyed frames over the DISTINCT word set;
  *   - loop bounds are PLAN-TIME constants (`maxWordLen` positions,
  *     `rounds` EM rounds), so the whole train is one static plan chain,
  *     checkpointed per round — and therefore unrollable as chained CTEs
  *     in an external oracle;
  *   - vocabulary size V and total count N enter as 1-ROW cross-joined
  *     aggregates (the plan-side dangling-mass pattern).
  *
  * Determinism ladder: logp = round(ln((c+1)/(N+V)), 10); every DP score
  * is round(prev + logp, 10) — a fixed left-to-right op order both engines
  * share; DP ties break to the LONGEST last piece (score DESC, j DESC).
  *
  * Words longer than `maxWordLen` are dropped (the caller's declared
  * horizon — segmentation cost and plan depth are bounded by it).
  */
object UnigramLm {

  /** (word, cnt) over the corpus, length-bounded. */
  def wordCounts(docs: DataFrame, maxWordLen: Int): DataFrame =
    docs.select(explode(tokens(col("text"))).as("word"))
      .filter(length(col("word")).between(1, maxWordLen))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** All (word, i, j, piece) substring rows: end position i (1-based),
    * piece length j ≤ maxPieceLen, piece = word[i−j+1 .. i]. Row-local. */
  private def substrings(words: DataFrame, maxPieceLen: Int): DataFrame =
    words.select(col("word"), explode(expr(
      s"""flatten(transform(sequence(1, length(word)), i ->
            transform(sequence(1, least($maxPieceLen, i)), j ->
              named_struct('i', i, 'j', j))))""")).as("s"))
      .select(col("word"), col("s.i").as("i"), col("s.j").as("j"),
        expr("substring(word, s.i - s.j + 1, s.j)").as("piece"))

  /** One hard-EM Viterbi pass of every word under `model` (piece, logp):
    * returns the segmentation pieces (word, p, piece) with p the 1-based
    * START position — ordered reassembly needs no further state.
    *
    * The word table is Heaps-bounded, so the DP runs ROW-LOCALLY: one join
    * attaches each word's candidate (i, j, logp) transitions, one grouped
    * collect folds them into an array, and a single `aggregate` HOF builds
    * the score/backpointer table left-to-right inside codegen — score[i] =
    * round(score[i−j] + logp, 10), argmax by (score, then LONGER piece)
    * via struct-ordered array_max, the identical ladder the unrolled
    * oracle replays. A second HOF walks the backpointers. No per-position
    * job, no window, no driver action. */
  private def viterbi(words: DataFrame, subs: DataFrame, model: DataFrame): DataFrame = {
    val cands = subs.join(model.select(col("piece"), col("logp")), "piece")
      .groupBy(col("word"))
      .agg(collect_list(struct(col("i"), col("j"), col("logp"))).as("cs"))
    // dp[k] (0-indexed) = best (score, bp) for END position k+1; ties take
    // the larger bp — struct ordering compares score first, then bp, so
    // array_max IS the (score DESC, j DESC) pick of the unrolled form
    val dp = cands.select(col("word"), expr(
      """aggregate(sequence(1, length(word)),
           cast(array() as array<struct<score:double,bp:int>>),
           (acc, i) -> concat(acc, array(
             array_max(transform(filter(cs, c -> c.i = i),
               c -> struct(
                 round((CASE WHEN c.j = i THEN cast(0.0 as double)
                        ELSE acc[i - c.j - 1].score END) + c.logp, 10) AS score,
                 c.j AS bp)))))) """).as("dp"))
    // backpointer walk, also row-local: state (p, out), one step per
    // iteration bound by word length; emit (start position, piece)
    dp.select(col("word"), expr(
      """aggregate(sequence(1, length(word)),
           named_struct('p', length(word),
                        'out', cast(array() as array<struct<p:int,piece:string>>)),
           (st, t) -> CASE WHEN st.p > 0 THEN named_struct(
               'p', st.p - dp[st.p - 1].bp,
               'out', concat(st.out, array(named_struct(
                 'p', st.p - dp[st.p - 1].bp + 1,
                 'piece', substring(word, st.p - dp[st.p - 1].bp + 1, dp[st.p - 1].bp)))))
             ELSE st END,
           st -> st.out)""").as("out"))
      .select(col("word"), explode(col("out")).as("e"))
      .select(col("word"), col("e.p").as("p"), col("e.piece").as("piece"))
  }

  /** The trained model after `rounds` hard-EM rounds: every seed piece with
    * its final Viterbi usage count c (occurrences × word frequency; 0 for
    * unused pieces — the fixed vocabulary keeps them alive through add-one
    * smoothing) and logp = round(ln((c+1)/(N+V)), 10). */
  def train(docs: DataFrame, maxWordLen: Int = 12, maxPieceLen: Int = 4,
            rounds: Int = 2, minSeedCount: Long = 2L): DataFrame = {
    require(maxWordLen >= 1 && maxPieceLen >= 1, "length bounds must be positive")
    val words = graft.Caching.pin(wordCounts(docs, maxWordLen))
    val subs = substrings(words, maxPieceLen).compacted.localCheckpoint(eager = true)
    trainOn(words, subs, rounds, minSeedCount)
  }

  /** [[train]] on PRE-BUILT (words, subs) frames: callers that also need
    * the frames downstream ([[encodePieces]], [[segment]]) build and
    * checkpoint them ONCE and share — the first cut rebuilt and
    * re-checkpointed both inside train, doubling the seeding work per
    * q142/q162 run. */
  private def trainOn(words: DataFrame, subs: DataFrame,
                      rounds: Int, minSeedCount: Long): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // seed counts: every substring occurrence weighted by word frequency
    val c0 = subs.join(words, "word").groupBy(col("piece"))
      .agg(sum(col("cnt")).as("c"))
    // seed prune (Kudo §3.2's frequent-substring seeding): pieces below
    // minSeedCount drop UNLESS single chars — those always survive, so
    // every word stays segmentable. Without the prune, any word short
    // enough to BE a seed piece keeps itself as one piece (its own
    // substring always wins the ML argmax) — the degenerate case the
    // frequency floor exists to remove.
    val seedPieces = c0
      .filter(col("c") >= lit(minSeedCount) || length(col("piece")) === 1)
      .select(col("piece")).compacted.localCheckpoint(eager = true)
    var model = withLogp(seedPieces, c0)
    for (_ <- 1 to rounds) {
      val seg = viterbi(words, subs, model)
      val cr = seg.join(words, "word").groupBy(col("piece"))
        .agg(sum(col("cnt")).as("c"))
      model = withLogp(seedPieces, cr)
    }
    model
  }

  /** Add-one model over the fixed seed vocabulary: (piece, c, logp) with
    * V and N entering as 1-row cross joins — no driver action. */
  private def withLogp(seedPieces: DataFrame, counts: DataFrame): DataFrame = {
    val base = seedPieces.join(counts, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("c"), lit(0L)).as("c"))
    val tot = base.agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
    base.crossJoin(tot)
      .select(col("piece"), col("c"),
        round(log((col("c") + lit(1L)).cast(DoubleType) /
          (col("n") + col("v")).cast(DoubleType)), 10).as("logp"))
      .compacted.localCheckpoint(eager = true)
  }

  /** Forward–backward EXPECTED piece counts of every word under `model` —
    * the true E-step of Kudo §3.2 (soft EM), where [[viterbi]] is the hard
    * approximation: γ(piece at [i−j+1, i]) = exp(α[i−j] + logp + β[i] −
    * α[len]), the lattice posterior. Also row-local: two `aggregate` HOFs
    * build the α and β tables, a third emits every candidate's posterior.
    *
    * Deterministic log-sum-exp ladder: each α/β entry is
    * round(m + ln(Σ round(exp(x−m), 15)), 10) with m the (order-free) max
    * and the Σ an EXACT DECIMAL(20,15) fold — no float-sum order exists,
    * so both engines replay entry for entry; the posterior exponent
    * re-rounds at 10 dp before exp, the γ after. Output: (word, piece, g). */
  private def expected(words: DataFrame, subs: DataFrame, model: DataFrame): DataFrame = {
    val cands = subs.join(model.select(col("piece"), col("logp")), "piece")
      .groupBy(col("word"))
      .agg(collect_list(struct(col("i"), col("j"), col("logp"))).as("cs"))
    // α[i] stored at a[i-1]; the i−j = 0 term contributes alpha 0
    val fw = cands.select(col("word"), col("cs"), expr(
      """aggregate(sequence(1, length(word)), cast(array() as array<double>),
           (acc, i) -> concat(acc, array(
             aggregate(
               transform(filter(cs, c -> c.i = i),
                 c -> (CASE WHEN c.j = i THEN cast(0.0 as double)
                       ELSE acc[i - c.j - 1] END) + c.logp),
               named_struct('m', cast(-1e18 as double), 's', cast(0 as decimal(20,15)), 'xs', cast(array() as array<double>)),
               (st, x) -> named_struct('m', greatest(st.m, x), 's', st.s, 'xs', concat(st.xs, array(x))),
               st -> round(st.m + ln(cast(
                 aggregate(st.xs, cast(0 as decimal(20,15)),
                   (a, x) -> cast(a + cast(round(exp(x - st.m), 15) as decimal(20,15)) as decimal(20,15)))
                 as double)), 10))))) """).as("al"))
    // β[i] stored at b-index len−i−1 (built right to left); β[len] = 0
    val bw = fw.select(col("word"), col("cs"), col("al"), expr(
      """aggregate(sequence(1, length(word)), cast(array() as array<double>),
           (acc, t) -> concat(acc, array(
             aggregate(
               transform(filter(cs, c -> c.i - c.j = length(word) - t),
                 c -> c.logp + (CASE WHEN c.i = length(word) THEN cast(0.0 as double)
                                ELSE acc[length(word) - c.i - 1] END)),
               named_struct('m', cast(-1e18 as double), 's', cast(0 as decimal(20,15)), 'xs', cast(array() as array<double>)),
               (st, x) -> named_struct('m', greatest(st.m, x), 's', st.s, 'xs', concat(st.xs, array(x))),
               st -> round(st.m + ln(cast(
                 aggregate(st.xs, cast(0 as decimal(20,15)),
                   (a, x) -> cast(a + cast(round(exp(x - st.m), 15) as decimal(20,15)) as decimal(20,15)))
                 as double)), 10))))) """).as("be"))
    bw.select(col("word"), explode(expr(
      """transform(cs, c -> named_struct(
           'piece', substring(word, c.i - c.j + 1, c.j),
           'g', round(exp(round(
             (CASE WHEN c.j = c.i THEN cast(0.0 as double) ELSE al[c.i - c.j - 1] END)
             + c.logp
             + (CASE WHEN c.i = length(word) THEN cast(0.0 as double)
                ELSE be[length(word) - c.i - 1] END)
             - al[length(word) - 1], 10)), 10)))""")).as("e"))
      .select(col("word"), col("e.piece").as("piece"), col("e.g").as("g"))
  }

  /** Soft-EM training (the full forward–backward E-step): like [[train]]
    * but with fractional expected counts — c is a DOUBLE (8-dp), the
    * add-one M-step otherwise identical. The hard/soft pair mirrors
    * Kudo's own presentation (Viterbi decode, EM training). */
  def trainEm(docs: DataFrame, maxWordLen: Int = 12, maxPieceLen: Int = 4,
              rounds: Int = 2, minSeedCount: Long = 2L): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val words = graft.Caching.pin(wordCounts(docs, maxWordLen))
    val subs = substrings(words, maxPieceLen).compacted.localCheckpoint(eager = true)
    val c0 = subs.join(words, "word").groupBy(col("piece"))
      .agg(sum(col("cnt")).as("c"))
    val seedPieces = c0
      .filter(col("c") >= lit(minSeedCount) || length(col("piece")) === 1)
      .select(col("piece")).compacted.localCheckpoint(eager = true)
    var model = withLogp(seedPieces, c0)
    for (_ <- 1 to rounds) {
      val post = expected(words, subs, model)
      // round the EXACT decimal sum before any double cast — rounding the
      // cast double instead loses the half-up midpoint to double error
      // (one 8-dp cell flipped between engines in the first cut)
      val cr = post.join(words, "word").groupBy(col("piece"))
        .agg(round(sum(round(col("cnt").cast(DoubleType) * col("g"), 10)
          .cast(org.apache.spark.sql.types.DecimalType(30, 10))), 8)
          .cast(DoubleType).as("c"))
      model = withLogpSoft(seedPieces, cr)
    }
    model
  }

  /** [[withLogp]] for fractional counts: c DOUBLE, N an exact DECIMAL(30,8)
    * fold of the 8-dp counts. */
  private def withLogpSoft(seedPieces: DataFrame, counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val base = seedPieces.join(counts, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("c"), lit(0.0d)).as("c"))
    val tot = base.agg(sum(col("c").cast(DecimalType(30, 8))).cast(DoubleType).as("n"),
      count(lit(1)).as("v"))
    base.crossJoin(tot)
      .select(col("piece"), col("c"),
        round(log((col("c") + lit(1.0d)) /
          (col("n") + col("v")).cast(DoubleType)), 10).as("logp"))
      .compacted.localCheckpoint(eager = true)
  }

  /** The raw per-word Viterbi pieces under the trained model:
    * (word, p, piece) with p the 1-based start position — the id-encoding
    * surface [[segment]] aggregates into readable segmentations. */
  def encodePieces(docs: DataFrame, maxWordLen: Int = 12, maxPieceLen: Int = 4,
                   rounds: Int = 2, minSeedCount: Long = 2L): DataFrame = {
    require(maxWordLen >= 1 && maxPieceLen >= 1, "length bounds must be positive")
    val words = graft.Caching.pin(wordCounts(docs, maxWordLen))
    val subs = substrings(words, maxPieceLen).compacted.localCheckpoint(eager = true)
    viterbi(words, subs, trainOn(words, subs, rounds, minSeedCount))
  }

  /** Viterbi segmentation of every distinct corpus word under the trained
    * model: (word, cnt, n_pieces, seg, ok) with seg the space-joined pieces
    * in reading order and ok the lossless-reassembly gate (the q120
    * roundtrip stance: a tokenizer that cannot reassemble its input is
    * corrupting the corpus). */
  def segment(docs: DataFrame, maxWordLen: Int = 12, maxPieceLen: Int = 4,
              rounds: Int = 2, minSeedCount: Long = 2L): DataFrame = {
    require(maxWordLen >= 1 && maxPieceLen >= 1, "length bounds must be positive")
    val words = graft.Caching.pin(wordCounts(docs, maxWordLen))
    val subs = substrings(words, maxPieceLen).compacted.localCheckpoint(eager = true)
    viterbi(words, subs, trainOn(words, subs, rounds, minSeedCount))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_pieces"),
        array_join(transform(array_sort(collect_list(struct(col("p"), col("piece")))),
          x => x.getField("piece")), " ").as("seg"))
      .join(words, "word")
      .select(col("word"), col("cnt"), col("n_pieces"), col("seg"),
        (regexp_replace(col("seg"), " ", "") === col("word")).as("ok"))
  }
}
