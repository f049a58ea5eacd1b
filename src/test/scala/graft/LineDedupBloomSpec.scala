package graft

import graft.operators.{Bloom, LineDedup}
import org.apache.spark.sql.functions._

/** Line-level dedup (q91 operator) and the portable Bloom filter (q92
  * operator), pinned on hand-built fixtures where every expected row is
  * derivable by eye.
  */
class LineDedupBloomSpec extends SparkSpec {
  import spark.implicits._

  // ---- LineDedup ----------------------------------------------------------

  test("chunkLines splits the token stream into width-w spans, last span ragged") {
    val df = Seq((1L, "a b c d e"), (2L, "x"), (3L, "")).toDF("doc_id", "text")
    val got = df.select($"doc_id", LineDedup.chunkLines($"text", 2).as("l"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("a b", "c d", "e"))
    assert(got(2L) == Seq("x"))
    assert(got(3L) == Seq.empty)
  }

  test("dedupLines keeps the corpus-first occurrence and drops the rest") {
    // boilerplate "footer" appears in docs 1, 2, 3 — survives only in doc 1
    // (its first occurrence by (doc_id, line_no)); unique lines all survive.
    val lines = Seq(
      (1L, 0, "alpha"), (1L, 1, "footer"),
      (2L, 0, "footer"), (2L, 1, "beta"),
      (3L, 0, "gamma"), (3L, 1, "footer"), (3L, 2, "delta")
    ).toDF("doc_id", "line_no", "line")
    val got = LineDedup.dedupLines(lines)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2L, 0L, "alpha\nfooter")))
    assert(got(2L) == ((2L, 1L, "beta")))
    assert(got(3L) == ((3L, 1L, "gamma\ndelta")))
  }

  test("dedupLines: a doc of pure boilerplate reassembles to the empty string") {
    val lines = Seq(
      (1L, 0, "footer"),
      (2L, 0, "footer")
    ).toDF("doc_id", "line_no", "line")
    val got = LineDedup.dedupLines(lines)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((1L, 0L, "footer")))
    assert(got(2L) == ((1L, 1L, "")))
  }

  test("dedupLines ties within one doc resolve to the smallest line_no") {
    val lines = Seq((5L, 0, "dup"), (5L, 1, "dup"), (5L, 2, "tail"))
      .toDF("doc_id", "line_no", "line")
    val got = LineDedup.dedupLines(lines)
      .as[(Long, Long, Long, String)].collect().head
    assert(got == ((5L, 3L, 1L, "dup\ntail")))
  }

  // ---- Bloom --------------------------------------------------------------

  private val K = 3
  private val M = 1 << 12

  test("Bloom membership: every inserted key tests positive (no false negatives)") {
    val members = (0 until 200).map(i => s"key$i").toDF("s")
    val words = Bloom.build(members, K, M)
    val hits = members
      .select(Bloom.containsAll(words, Bloom.positions($"s", K, M)).as("hit"))
      .as[Boolean].collect()
    assert(hits.forall(identity))
  }

  test("Bloom membership: absent keys mostly test negative, FP rate sane") {
    val members = (0 until 200).map(i => s"key$i").toDF("s")
    val words = Bloom.build(members, K, M)
    val probes = (0 until 1000).map(i => s"absent$i").toDF("s")
    val fp = probes
      .select(Bloom.containsAll(words, Bloom.positions($"s", K, M)).as("hit"))
      .as[Boolean].collect().count(identity)
    // 200 keys * 3 hashes in 4096 bits → fill ≈ 13.6%, FP ≈ 0.136³ ≈ 0.25%.
    // 1000 probes → expect ~2.5; 30 is > 10σ out — catches a broken hash/bit
    // path without being flaky.
    assert(fp < 30, s"false-positive count $fp out of 1000 is not sane")
  }

  test("Bloom membership matches a driver-side replay of the same bit math") {
    // independent reimplementation: same h60 semantics via MessageDigest
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    def pos(s: String): Seq[Long] = (0 until K).map(i => {
      val h = h60(s"$i:$s"); ((h % M) + M) % M
    })
    val members = (0 until 50).map(i => s"m$i")
    val words = Bloom.build(members.toDF("s"), K, M)
    val bitset = {
      val bs = new java.util.BitSet(M)
      members.flatMap(pos).foreach(b => bs.set(b.toInt))
      bs
    }
    val probes = members.take(10) ++ (0 until 40).map(i => s"p$i")
    val expect = probes.map(s => pos(s).forall(b => bitset.get(b.toInt)))
    val got = probes.toDF("s")
      .select($"s", Bloom.containsAll(words, Bloom.positions($"s", K, M)).as("hit"))
      .as[(String, Boolean)].collect().toMap
    probes.zip(expect).foreach { case (s, e) =>
      assert(got(s) == e, s"membership mismatch for '$s'")
    }
  }

  test("Bloom build is bounded by m bits regardless of member count") {
    val members = (0 until 5000).map(i => s"k$i").toDF("s")
    val words = Bloom.build(members, K, 64 * 4)
    assert(words.length == 4) // m/64 words, however many members
  }
}
