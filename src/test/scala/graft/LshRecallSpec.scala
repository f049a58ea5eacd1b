package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Measures the recall effect of query-side Hamming-1 multi-probing in
  * [[Similarity.lshTopK]] (the r3 verdict's ask #5): recall vs the exact
  * brute-force top-k, probing on vs off, on the driver's sf0.001 embeddings.
  * The numbers printed here are the ones cited in lshTopK's scaladoc.
  * Also exercises [[Caching.scoped]]: all operator pins made inside each
  * measurement release with the scope. */
class LshRecallSpec extends SparkSpec {

  test("query-side multi-probing raises lshTopK recall vs exact top-k") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val k = 10

    val exact = Caching.pin(Similarity.bruteTopK(emb, emb, k))
    val nExact = exact.count()
    assert(nExact > 0)

    def recall(probe: Boolean): Double = Caching.scoped {
      val approx = Similarity.lshTopK(emb, k, probe = probe)
      val hits = approx.select(col("q_id"), col("n_id"))
        .join(exact.select(col("q_id"), col("n_id")), Seq("q_id", "n_id"), "left_semi")
        .count()
      hits.toDouble / nExact
    }

    val rOff = recall(probe = false)
    val rOn = recall(probe = true)
    info(f"lshTopK recall@k=$k on sf0.001: probing OFF $rOff%.3f, probing ON $rOn%.3f")
    assert(rOn >= rOff, s"probing must never lower recall: on=$rOn off=$rOff")
    // Strict gain is a property of this fixture's geometry, not of Hamming-1
    // probing in general (a seed/fixture change can leave recall flat) — so
    // it is reported, not asserted (ADVICE r4).
    if (rOff < 1.0 && rOn == rOff)
      info(s"NOTE: probing added no recall on this fixture (on=$rOn off=$rOff)")

    Caching.release()
    assert(Caching.pinnedCount == 0)
  }

  test("scoped pins release without touching an outer scope's pins") {
    import spark.implicits._
    val outer = Caching.scoped {
      val a = Caching.pin(Seq(1, 2, 3).toDF("x"))
      assert(a.storageLevel.useMemory)
      val inner = Caching.scoped {
        val b = Caching.pin(Seq(4).toDF("y"))
        assert(b.storageLevel.useMemory)
        b
      }
      // inner scope closed → its pin is gone; ours survives
      assert(!inner.storageLevel.useMemory)
      assert(a.storageLevel.useMemory)
      a
    }
    assert(!outer.storageLevel.useMemory)
    assert(Caching.pinnedCount == 0)
  }
}
