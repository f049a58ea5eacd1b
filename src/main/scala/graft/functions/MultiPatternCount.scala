package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-pattern substring counter — an Aho–Corasick automaton
  * (Aho & Corasick 1975, CACM 18(6)) over a plan-time pattern list.
  *
  * The curation use is blocklist scanning: phrase lists (toxicity, PII
  * markers, boilerplate) are checked against every document. Scanning once
  * per PATTERN (`instr`/`regexp_count` per phrase) reads the corpus
  * |patterns| times; the automaton reads each document ONCE regardless of
  * list size — the property that matters when the list is thousands of
  * phrases and the corpus is 100 TB. The automaton is built once per
  * expression instance (plan-time constant, ~|Σpattern chars| nodes) and
  * shipped inside the serialized plan, so executors never exchange
  * anything: the whole operator is a zero-shuffle scan.
  *
  * Semantics: counts ALL occurrences of every pattern, overlapping
  * included — one count per (pattern, end position) pair, the native AC
  * match set. Output is a Long array aligned with the constructor's
  * pattern order. Parity with the interpreted HOF twin (count of start
  * positions via `filter(sequence(...))`) is asserted in
  * MultiPatternSpec across border/nesting/overlap cases.
  */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty strings")
  require(patterns.distinct.length == patterns.length, "patterns must be distinct")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_multi_pattern_count"

  @transient private lazy val auto = MultiPatternCount.Automaton(patterns)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new Array[Long](patterns.length)
    var state = 0
    var i = 0
    while (i < s.length) {
      state = auto.step(state, s.charAt(i))
      val em = auto.emits(state)
      var k = 0
      while (k < em.length) { counts(em(k)) += 1L; k += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(c: Expression): MultiPatternCount =
    copy(child = c)
}

object MultiPatternCount {
  /** Column-API surface: counts(text) aligned with `patterns`. */
  def apply(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiPatternCount(ColumnBridge.expression(text), patterns))

  /** Goto/fail/emit tables. `emits(state)` is pre-merged over the fail
    * chain at build time (BFS order guarantees the parent chain is final
    * when a node is sealed), so the scan never walks suffix links twice. */
  private[functions] final case class Automaton(
      next: Array[Map[Char, Int]], fail: Array[Int], emits: Array[Array[Int]]) {
    def step(state: Int, c: Char): Int = {
      var st = state
      while (st != 0 && !next(st).contains(c)) st = fail(st)
      next(st).getOrElse(c, 0)
    }
  }

  private[functions] object Automaton {
    def apply(patterns: Seq[String]): Automaton = {
      val next = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.Map.empty[Char, Int])
      val own = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
      patterns.zipWithIndex.foreach { case (p, id) =>
        var s = 0
        p.foreach { c =>
          s = next(s).getOrElseUpdate(c, {
            next += scala.collection.mutable.Map.empty[Char, Int]
            own += Nil
            next.length - 1
          })
        }
        own(s) = id :: own(s)
      }
      val n = next.length
      val fail = new Array[Int](n)
      val emits = new Array[List[Int]](n)
      emits(0) = own(0)
      val queue = scala.collection.mutable.Queue.empty[Int]
      for ((_, v) <- next(0)) { fail(v) = 0; emits(v) = own(v); queue += v }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        for ((c, v) <- next(u)) {
          var f = fail(u)
          while (f != 0 && !next(f).contains(c)) f = fail(f)
          // f is on u's fail chain, so next(f)(c) sits strictly shallower
          // than v — no self-link possible (root children were sealed above).
          fail(v) = next(f).getOrElse(c, 0)
          emits(v) = own(v) ::: emits(fail(v))
          queue += v
        }
      }
      Automaton(next.map(_.toMap).toArray, fail, emits.map(_.toArray.sorted))
    }
  }
}
