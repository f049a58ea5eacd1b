package graft

import graft.functions.MultiPatternCount
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Aho–Corasick multi-pattern counter: hand-computed match sets (the
  * textbook {he,she,his,hers} automaton, self-overlap, nested prefixes)
  * plus parity with the interpreted HOF start-position counter on seeded
  * pseudo-random text — two independent formulations, one match set.
  */
class MultiPatternSpec extends SparkSpec {
  import spark.implicits._

  private def native(texts: Seq[String], ps: Seq[String]): Seq[Seq[Long]] =
    texts.toDF("t")
      .select(MultiPatternCount(col("t"), ps).as("c"))
      .collect().toSeq.map(_.getSeq[Long](0))

  /** Interpreted twin: count of start positions i with t[i, i+|p|) == p. */
  private def twin(t: Column, ps: Seq[String]): Column =
    transform(lit(ps.toArray), p =>
      size(filter(sequence(lit(1), length(t)), i =>
        t.substr(i, length(p)) === p)).cast("long"))

  test("the textbook he/she/his/hers automaton on 'ushers'") {
    val got = native(Seq("ushers"), Seq("he", "she", "his", "hers")).head
    assert(got == Seq(1L, 1L, 0L, 1L))
  }

  test("overlapping matches are all counted") {
    assert(native(Seq("aaaa"), Seq("aa")).head == Seq(3L))
    assert(native(Seq("ababa"), Seq("aba")).head == Seq(2L))
  }

  test("nested prefix patterns emit at interior nodes") {
    val got = native(Seq("table table table key"),
      Seq("table table", "table table key")).head
    assert(got == Seq(2L, 1L))
  }

  test("empty text and no-hit patterns count zero") {
    assert(native(Seq(""), Seq("x", "yz")).head == Seq(0L, 0L))
    assert(native(Seq("hello"), Seq("x", "yz")).head == Seq(0L, 0L))
  }

  test("parity with the HOF start-position counter on seeded random text") {
    val rnd = new scala.util.Random(42)
    val alpha = "ab "
    val texts = (1 to 40).map(_ =>
      (1 to (5 + rnd.nextInt(60))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val ps = Seq("a", "ab", "ba", "aa", "a b", "b a", "aba", "a a", "bb")
    val df = texts.toDF("t")
      .select(MultiPatternCount(col("t"), ps).as("n"), twin(col("t"), ps).as("h"))
    assert(df.filter(not(col("n") === col("h"))).count() == 0L)
  }
}
