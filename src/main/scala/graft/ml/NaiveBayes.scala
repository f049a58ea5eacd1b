package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Multinomial Naive Bayes as aggregations (SURVEY.md §2.4 A6/A9).
  *
  * Training is two grouped sums off one token stream (the reference's
  * TrainModelReducer routes the same two sums to separate files by key shape,
  * TrainModelReducer.java:22-41); the model is three small DataFrames that
  * broadcast into scoring.
  *
  * Scoring (standard, log-space): score(d, c) = ln P(c) + Σ_t n_t(d)·ln p(t|c)
  * with Laplace smoothing p(t|c) = (cnt(c,t)+1)/(total(c)+V) — the smoothing
  * the reference applies at PredictMapper.java:66-77. Test terms outside the
  * training vocabulary are dropped (the reference's inner-join J2 semantics).
  * `referenceCompat = true` reproduces the reference's aberrant scoring
  * (product of logs, ×log prior, abs, argmin — PredictMapper.java:78-86).
  */
object NaiveBayes {

  /** Model tables from labeled tokens (label, term). `vocabSizeDf` is a
    * 1-row (v: Long) frame — the vocabulary size stays a lazy scalar inside
    * the plan instead of an eager driver action. */
  case class Model(termCounts: DataFrame, classTotals: DataFrame, priors: DataFrame,
                   vocabSizeDf: DataFrame) {
    /** Eager convenience accessor (tests, reporting). */
    def vocabSize: Long = vocabSizeDf.collect().head.getLong(0)
  }

  /** A6: train from a labeled token stream (doc_id, label, term).
    * Fully lazy — no driver-side actions; scalars (doc count, vocabulary
    * size) are 1-row broadcast frames folded into the scoring plan. */
  def train(toks: DataFrame): Model = {
    val termCounts = toks.groupBy(col("label"), col("term")).agg(count(lit(1)).as("tcnt"))
    val classTotals = termCounts.groupBy(col("label")).agg(sum(col("tcnt")).as("total"))
    val docs = toks.select(col("doc_id"), col("label")).distinct()
    val nDocsDf = docs.agg(count(lit(1)).as("n_docs"))
    val priors = docs.groupBy(col("label")).agg(count(lit(1)).as("n_d"))
      .crossJoin(broadcast(nDocsDf))
      .select(col("label"),
        (col("n_d").cast(DoubleType) / col("n_docs").cast(DoubleType)).as("prior"))
    val vocabSizeDf = termCounts.agg(countDistinct(col("term")).as("v"))
    Model(termCounts, classTotals, priors, vocabSizeDf)
  }

  /** A9: score + argmax. Input: test tokens (doc_id, term). Output (doc_id, pred). */
  def predict(testToks: DataFrame, model: Model, referenceCompat: Boolean = false): DataFrame = {
    val testCounts = testToks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("cnt"))
      // vocabulary restriction: J2 inner-join semantics (out-of-vocab dropped)
      .join(broadcast(model.termCounts.select(col("term")).distinct()), "term")
    val classes = model.classTotals.join(model.priors, "label")
      .crossJoin(broadcast(model.vocabSizeDf))
    val scored = testCounts
      .crossJoin(broadcast(classes))
      .join(broadcast(model.termCounts), Seq("label", "term"), "left")
      .na.fill(0L, Seq("tcnt"))
      .withColumn("logp",
        log((col("tcnt").cast(DoubleType) + lit(1.0d)) /
          (col("total").cast(DoubleType) + col("v").cast(DoubleType))))
    val score =
      if (referenceCompat)
        // Π of logs over terms (count-weighted by pow), × log prior, abs,
        // argmin. The per-term log is rounded to 10 dp BEFORE the product
        // (the q69 idf pattern): JVM and libm ln differ by ulps, and a
        // product over many terms amplifies that into cross-engine argmin
        // flips on near-ties — rounding REDUCES cross-engine drift (Spark
        // and DuckDB round doubles slightly differently near half-
        // boundaries, and the double product itself stays aggregation-
        // order-dependent; validated empirically by the q68 hash-match).
        abs(product(pow(round(col("logp"), 10), col("cnt"))) * log(max(col("prior"))))
      else
        sum(col("cnt").cast(DoubleType) * col("logp")) + log(max(col("prior")))
    val agg = scored.groupBy(col("doc_id"), col("label")).agg(score.as("score"))
    val ord = if (referenceCompat) col("score").asc else col("score").desc
    val w = Window.partitionBy(col("doc_id")).orderBy(ord, col("label").asc)
    agg.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("label").as("pred"))
  }
}
