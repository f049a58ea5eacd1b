package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._

/** DSIR importance weights + Gumbel-top-k resample (operators.Dsir). */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // Target slice speaks "alpha beta"; the raw tail speaks "gamma delta".
  // A raw doc written in target vocabulary must out-weigh one that isn't.
  private def corpus = Seq(
    (1L, "alpha beta alpha beta alpha", true),
    (2L, "beta alpha beta alpha", true),
    (3L, "alpha beta alpha", true),
    (10L, "alpha beta alpha beta", false), // target-like raw doc
    (11L, "gamma delta gamma delta", false), // off-target raw doc
    (12L, "gamma delta epsilon zeta", false)
  ).toDF("doc_id", "text", "is_tgt")

  test("importance weights rank target-like docs above off-target docs") {
    val w = Dsir.importanceWeights(corpus, col("is_tgt"), buckets = 64)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(w.keySet == Set(1L, 2L, 3L, 10L, 11L, 12L))
    // n_feats = unigrams + bigrams = 2·len − 1
    assert(w(10L)._1 == 7L, w(10L).toString)
    assert(w(11L)._1 == 7L)
    assert(w(10L)._2 > w(11L)._2, s"target-like ${w(10L)} vs off-target ${w(11L)}")
    assert(w(10L)._2 > w(12L)._2)
    // target docs themselves score high (their n-grams define the model)
    assert(w(1L)._2 > w(11L)._2)
  }

  test("weights are invariant to partitioning (DECIMAL fold)") {
    val a = Dsir.importanceWeights(corpus.repartition(1), col("is_tgt"), buckets = 64)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val b = Dsir.importanceWeights(corpus.repartition(7), col("is_tgt"), buckets = 64)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("gumbel resample returns exactly k distinct docs from the corpus") {
    val got = Dsir.resampleTopK(corpus, col("is_tgt"), k = 4, buckets = 64)
      .as[(Long, Double)].collect()
    assert(got.length == 4)
    assert(got.map(_._1).distinct.length == 4)
    assert(got.map(_._1).toSet.subsetOf(Set(1L, 2L, 3L, 10L, 11L, 12L)))
    // keys descend in the heap's (score desc, id asc) order once sorted
    val keys = got.sortBy(r => (-r._2, r._1)).map(_._2).toSeq
    assert(keys == keys.sorted.reverse)
  }

  test("degenerate configs are refused") {
    intercept[IllegalArgumentException](Dsir.importanceWeights(corpus, col("is_tgt"), buckets = 0))
    intercept[IllegalArgumentException](Dsir.resampleTopK(corpus, col("is_tgt"), k = 0))
  }
}
