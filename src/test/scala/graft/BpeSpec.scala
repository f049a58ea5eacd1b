package graft

import graft.functions.{BpeEncode, BpeOps, Exprs}
import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge pass is greedy left-to-right; merged symbol never restarts a match") {
    assert(BpeOps.mergePass(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(BpeOps.mergePass(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
    assert(BpeOps.mergePass(Array("x", "y"), "a", "b").toSeq == Seq("x", "y"))
    assert(BpeOps.mergePass(Array("aa", "a", "a"), "aa", "a").toSeq == Seq("aaa", "a"))
  }

  test("training learns the textbook merge sequence with deterministic tie-breaks") {
    // words: low x3, lower, lowest. Round 1: (l,o)=5 ties (o,w)=5 -> lex
    // smallest (l,o). Then (lo,w)=5, (low,e)=2, and among the count-1
    // pairs (lowe,r) < (lowe,s) < (s,t) lexicographically.
    val docs = Seq("low lower lowest", "low low").toDF("text")
    val merges = Bpe.train(docs, col("text"), numMerges = 4)
    assert(merges == Seq(
      Bpe.Merge(1, "l", "o"), Bpe.Merge(2, "lo", "w"),
      Bpe.Merge(3, "low", "e"), Bpe.Merge(4, "lowe", "r")))
  }

  test("training stops early when the corpus runs out of adjacent pairs") {
    val merges = Bpe.train(Seq("ab ab").toDF("text"), col("text"), numMerges = 10)
    assert(merges == Seq(Bpe.Merge(1, "a", "b")))
  }

  test("degenerate corpora: empty corpus and single-char words train no merges") {
    assert(Bpe.train(Seq.empty[String].toDF("text"), col("text"), 4).isEmpty)
    assert(Bpe.train(Seq("a b a c").toDF("text"), col("text"), 4).isEmpty)
    // encoding with an empty merge table is plain character splitting
    val enc = Seq("ab").toDF("text")
      .select(Bpe.encode(Exprs.tokens(col("text")), Seq.empty).as("s"))
      .as[Seq[String]].head()
    assert(enc == Seq("a", "b"))
  }

  test("encoding with the trained table reproduces the final training state") {
    val docs = Seq("low lower lowest", "low low").toDF("text")
    val merges = Bpe.train(docs, col("text"), numMerges = 4)
    val enc = Seq("low lower lowest", "", "unseen low").toDF("text")
      .select(Bpe.encode(Exprs.tokens(col("text")), merges).as("sub"))
      .as[Seq[String]].collect()
    assert(enc(0) == Seq("low", "lower", "lowe", "s", "t"))
    assert(enc(1) == Seq.empty[String]) // no tokens -> empty, not null
    // unseen word segments by the same merges, seen word unchanged
    assert(enc(2) == Seq("u", "n", "s", "e", "e", "n", "low"))
  }

  test("distributed training equals an in-memory reference on a seeded corpus") {
    // independent implementation: plain Scala maps, no Spark — the same
    // cross-check shape the DuckDB oracle provides, but run in-process so
    // it guards the distributed loop in plain `sbt test`
    def referenceBpe(words: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
      var vocab = words.map { case (w, c) => w.map(_.toString).toVector -> c }
      val out = Seq.newBuilder[(String, String)]
      var done = false
      for (_ <- 1 to numMerges if !done) {
        val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
          pairs((syms(i), syms(i + 1))) = pairs.getOrElse((syms(i), syms(i + 1)), 0L) + c
        if (pairs.isEmpty) done = true
        else {
          val (l, r) = pairs.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
          out += ((l, r))
          vocab = vocab.groupMapReduce { case (syms, _) =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                b += l + r; i += 2
              } else { b += syms(i); i += 1 }
            }
            b.result()
          } { case (_, c) => c }(_ + _)
        }
      }
      out.result()
    }
    // deterministic pseudo-random corpus: 60 docs over a 40-word alphabet
    val rng = new scala.util.Random(20260813L)
    val alphabet = Vector.tabulate(40)(i => rng.alphanumeric.filter(_.isLower).take(2 + i % 5).mkString)
    val docs = Seq.tabulate(60) { _ =>
      Seq.fill(8 + rng.nextInt(25))(alphabet(rng.nextInt(alphabet.size))).mkString(" ")
    }.toDF("text")
    val wordCounts = docs.select(explode(graft.functions.Exprs.tokens(col("text"))).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val expected = referenceBpe(wordCounts, numMerges = 12)
    val trained = Bpe.train(docs, col("text"), numMerges = 12)
    assert(trained.map(m => (m.l, m.r)) == expected)
    assert(trained.map(_.rank) == (1L to expected.length))
  }

  test("graft_bpe_encode is callable from SQL and equals the Column form") {
    GraftExtensions.register(spark)
    val sql = spark.sql(
      """SELECT graft_bpe_encode(array('low', 'lowest'),
                                 array('l o', 'lo w', 'low e')) AS sub""")
      .as[Seq[String]].head()
    val colForm = Seq(Seq("low", "lowest")).toDF("toks")
      .select(BpeEncode(col("toks"),
        Seq(("l", "o"), ("lo", "w"), ("low", "e"))).as("sub"))
      .as[Seq[String]].head()
    assert(sql == colForm && sql == Seq("low", "lowe", "s", "t"))
    // malformed merge entries are rejected at build time with a clear message
    val err = intercept[Exception] {
      spark.sql("SELECT graft_bpe_encode(array('x'), array('nospace'))").collect()
    }
    assert(err.getMessage.contains("left right"))
  }

  test("bpe_encode rejects non-string-array input at analysis time") {
    val e = intercept[Exception] {
      Seq(Seq(1, 2)).toDF("xs").select(BpeEncode(col("xs"), Seq(("a", "b")))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<string>") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("wordpiece: likelihood score picks rare-but-cohesive pairs over raw count") {
    // corpus: "xy" ×2, "aab" ×5. Symbol census round 1: x=2 y=2 a=10 b=5.
    // Pair counts: (x,y)=2 (a,a)=5 (a,b)=5. BPE would merge (a,a) (count 5);
    // WordPiece scores (x,y)=2/(2·2)=0.5 > (a,b)=5/(10·5)=0.1 >
    // (a,a)=5/(10·10)=0.05 — the rare-but-always-together pair wins.
    // Round 2 (xy fused): (a,b)=0.1 beats (a,a)=0.05. Round 3 (aab→[a,ab]):
    // only (a,ab)=5/(5·5)=0.2 remains.
    val docs = Seq((1L, "xy xy aab aab aab aab aab")).toDF("doc_id", "text")
    val got = Bpe.trainWordPiece(docs, col("text"), numMerges = 3)
    assert(got.map(m => (m.rank, m.l, m.r)) ==
      Seq((1L, "x", "y"), (2L, "a", "b"), (3L, "a", "ab")), got.mkString(","))
    assert(got.map(_.score) == Seq(0.5, 0.1, 0.2), got.mkString(","))
    // BPE on the same corpus takes the raw-count path instead
    assert(Bpe.train(docs, col("text"), 1).head == Bpe.Merge(1L, "a", "a"))
    // the shared encode path applies scored merges identically
    val enc = Seq(Seq("xy", "aab")).toDF("toks")
      .select(BpeEncode(col("toks"),
        got.sortBy(_.rank).map(m => (m.l, m.r))).as("sub"))
      .as[Seq[String]].head()
    assert(enc == Seq("xy", "aab"))
    // early stop past pair exhaustion (both words fully fused after round
    // 3), same contract as train
    assert(Bpe.trainWordPiece(docs, col("text"), numMerges = 10).length == 3)
  }
}
