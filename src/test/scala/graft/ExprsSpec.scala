package graft

import graft.functions.Exprs
import org.apache.spark.sql.functions._

class ExprsSpec extends SparkSpec {
  import spark.implicits._

  test("codegen DotProduct is bit-identical to the HOF fold on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(100)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val pairs = emb.as("a").crossJoin(emb.as("b")).limit(2000)
    val diffs = pairs.select(
      Exprs.dot(col("a.v"), col("b.v")).as("fast"),
      Exprs.dotHof(col("a.v"), col("b.v")).as("hof"))
      .filter($"fast" =!= $"hof")
    assert(diffs.count() == 0L)
  }

  test("dot on hand vectors") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.select(Exprs.dot($"a", $"b")).as[Double].head() == 32.0)
    assert(df.select(Exprs.cosine($"a", $"a")).as[Double].head() == 1.0)
  }

  test("cosine guards zero vectors") {
    val df = Seq((Array(0.0, 0.0), Array(1.0, 1.0))).toDF("a", "b")
    assert(df.select(Exprs.cosine($"a", $"b")).as[Double].head() == 0.0)
  }

  test("h60 matches the cross-engine md5 prefix value") {
    // Golden values independently computed by DuckDB 1.0
    // (CAST('0x'||substr(md5(x),1,15) AS BIGINT)) and Python hashlib —
    // pins Spark's conv(substr(md5,1,15),16,10) to the portable contract.
    val df = Seq("abc", "hello world", "42:some shingle text").toDF("s")
    val got = df.select($"s", Exprs.h60($"s")).as[(String, Long)].collect().toMap
    assert(got("abc") == 648541476951500027L)
    assert(got("hello world") == 426544247714475757L)
    assert(got("42:some shingle text") == 685363433132350180L)
    assert(got.values.forall(_ >= 0L)) // 60-bit: always non-negative
  }

  test("shingles builds space-joined n-grams, empty under n tokens") {
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
    val sh = df.select($"doc_id", Exprs.shingles(Exprs.tokens($"text"), 3).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(1L) == Seq("a b c", "b c d"))
    assert(sh(2L) == Seq.empty)
  }
}
