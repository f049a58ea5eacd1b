package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class ExtensionsSkewSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot is callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    val v = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(v == 11.0)
  }

  test("graft_minhash_bands is callable from SQL and equals the Column form") {
    GraftExtensions.register(spark)
    val sql = spark.sql(
      """SELECT b.band, b.band_sig
         FROM (SELECT explode(graft_minhash_bands(array('a b c', 'b c d'), 8, 4, true)) AS b)""")
      .as[(Long, String)].collect().toSet
    val col = Seq(Seq("a b c", "b c d")).toDF("shs")
      .select(explode(graft.operators.Dedup.minhashBandSigsFromShingles($"shs", 8, 4)).as("b"))
      .select($"b.band", $"b.band_sig").as[(Long, String)].collect().toSet
    assert(sql == col && sql.size == 4)
  }

  test("graft_simhash is callable from SQL and equals the Column form") {
    GraftExtensions.register(spark)
    val sql = spark.sql("SELECT graft_simhash(array('a', 'b', 'a'), true) AS fp")
      .as[Long].head()
    val col = Seq(Seq("a", "b", "a")).toDF("toks")
      .select(graft.functions.SimHashBits($"toks", portable = true).as("fp"))
      .as[Long].head()
    assert(sql == col)
  }

  test("signing functions reject bad input types at analysis, not executor runtime") {
    GraftExtensions.register(spark)
    // non-string array → analysis-time type-check failure (ADVICE r5: was a
    // ClassCastException inside nullSafeEval on the executor)
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_simhash(array(1, 2), true)").collect()
    }
    assert(e1.getMessage.toLowerCase.contains("array<string>") ||
      e1.getMessage.contains("DATATYPE_MISMATCH"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_minhash_bands(array(1L), 8, 4, true)").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("array<string>") ||
      e2.getMessage.contains("DATATYPE_MISMATCH"))
    // NULL portable → explicit rejection, not a silent hash-mode flip to false
    val e3 = intercept[Exception] {
      spark.sql("SELECT graft_simhash(array('a'), NULL)").collect()
    }
    assert(e3.getMessage.contains("boolean"))
  }

  test("graft_segment is callable from SQL with a literal dictionary") {
    GraftExtensions.register(spark)
    val names = spark.sql(
      "SELECT graft_segment('guojingandhuangrong', array('guojing', 'huangrong', 'rong')) AS n")
      .as[Seq[String]].head()
    assert(names == Seq("guojing", "huangrong"))
    // non-literal dictionary is rejected with a clear message
    val err = intercept[Exception] {
      spark.sql("SELECT graft_segment(s, array(s)) FROM (SELECT 'ab' AS s)").collect()
    }
    assert(err.getMessage.contains("foldable"))
  }

  test("graft_topk_freq aggregates from SQL and equals the Column form") {
    GraftExtensions.register(spark)
    val sql = spark.sql(
      "SELECT graft_topk_freq(item, 8, 2) AS top FROM VALUES ('a'),('a'),('b'),('a'),('c') t(item)")
      .select(explode(col("top")).as("e")).select("e.item", "e.est")
      .as[(String, Long)].collect().toSeq
    assert(sql == Seq(("a", 3L), ("b", 1L)))
    // sketch parameters must be constants
    val err = intercept[Exception] {
      spark.sql("SELECT graft_topk_freq(item, length(item), 1) FROM VALUES ('a') t(item)")
        .collect()
    }
    assert(err.getMessage.contains("constant"))
  }

  test("registerViews exposes the tables to spark.sql") {
    GraftExtensions.registerViews(spark, "/root/testdata/sf0.001")
    val n = spark.sql("SELECT COUNT(*) FROM lineitem").as[Long].head()
    assert(n == 6000L)
    val joined = spark.sql(
      """SELECT r_name, COUNT(*) AS c FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey GROUP BY 1""")
    assert(joined.count() == 5L)
  }

  test("salted join equals the plain join") {
    val left = (1L to 1000L).map(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("key", "v")
    val right = Seq(("hot", 1), ("k1", 2), ("k5", 3)).toDF("key", "w")
    val plain = left.join(right, "key").select($"key", $"v", $"w")
      .as[(String, Long, Int)].collect().toSet
    val salted = Skew.saltedJoin(left, right, "key", salts = 8)
      .select($"key", $"v", $"w").as[(String, Long, Int)].collect().toSet
    assert(salted == plain && plain.size == 102)
  }

  test("salted group count equals the plain group count") {
    val df = (1L to 500L).map(i => if (i % 3 == 0) "hot" else s"k${i % 7}").toDF("key")
    val plain = df.groupBy($"key").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedGroupCount(df, "key", salts = 8)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }
}
