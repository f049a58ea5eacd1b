package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming retrieval-eval gate — the continuously-maintained twin of the
  * q207/q208 fixed-panel recall cards (VERDICT r11 stretch: the ANN family
  * had a streaming INGEST twin but no streaming RECALL gate, the last
  * batch/stream asymmetry in the ANN story).
  *
  * Deployment shape: at refit time the batch side snapshots ground truth
  * for a FIXED query panel (the q208 posture — truth is 64·n once, against
  * the index snapshot, never per batch). As new vectors stream into the PQ
  * index, [[panelTopK]] maintains each panel query's current ADC top-k over
  * everything ingested so far and emits a per-epoch snapshot; [[card]]
  * joins those snapshots against the STATIC truth table (a stream-static
  * equi join — no state) and folds the same integer-ppm recall@k / MRR /
  * hit@1 metrics as the batch card. The gate's reading after the stream
  * catches up IS the batch card's reading — StreamingRetrievalEvalSpec
  * pins that parity on shared fixtures, per-epoch and final.
  *
  * Scale posture (the q208 arithmetic, streamed): per micro-batch the work
  * is |panel|·Δn row-local distance evaluations and a shuffle of
  * |panel|·Δn narrow (q_id, n_id, codes) rows onto |panel| keys; state is
  * |panel|·k (id, d2) pairs — both corpus-INDEPENDENT. The ADC lookup
  * tables (|panel|·m·kc doubles) ride the task closure, the same
  * plan-embedded-model stance as [[StreamingPqIngest]].
  *
  * Exactly-once input is the UPSTREAM contract ([[StreamingPqIngest.ingest]]
  * absorbs redeliveries); as defense the top-k merge collapses duplicate
  * (id, d2) pairs, so a replayed row already in a heap cannot double-rank.
  */
object StreamingRetrievalEval {

  /** One ingested index posting: id + PQ codes (plain PQ — the q125 ADC
    * family; for IVF feed residual-encoded codes and residual-space truth). */
  case class CodeVec(vecId: Long, codes: Seq[Long])

  /** One per-epoch top-k snapshot row for one panel query. */
  case class EpochTopK(qId: Long, epoch: Long, nId: Long, d2: Double, rk: Long)

  /** Per-query state: epochs seen + current top-k as (n_id, d2), kept in
    * (d2 asc, n_id asc) order — the standing ANN tie rule. */
  case class PanelState(epoch: Long, top: Seq[(Long, Double)])

  /** Catalyst `round(_, 6)` for doubles, replicated exactly (HALF_UP over
    * the shortest-decimal representation): the streamed d2 must land on
    * the identical 6-dp grid as [[graft.ml.Pq.adcTopK]]'s output or rank
    * ties would resolve differently across the batch/stream pair. */
  private def round6(d: Double): Double =
    new java.math.BigDecimal(java.lang.Double.toString(d))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Maintain each panel query's ADC top-k over the growing index and emit
    * a full snapshot per epoch (per-query micro-batch counter). Distances
    * replicate [[graft.ml.Pq.adcTopK]] bit-for-bit: per-sub cells are the
    * sequential squared-diff fold of the query slice against the sub
    * centroid, summed left-associated in sub_id order, rounded 6 dp before
    * ranking with ties on n_id — so the stream's heap and the batch heap
    * can never disagree on order. Panel and codebooks are bounded driver
    * values by the fixed-panel / KB-model contracts. */
  def panelTopK(codes: Dataset[CodeVec], panel: Seq[(Long, Seq[Double])],
                codebooks: Seq[(Int, Long, Seq[Double])],
                m: Int, kc: Int, k: Int): Dataset[EpochTopK] = {
    require(panel.nonEmpty, "panel must be non-empty")
    require(codebooks.nonEmpty, "codebook list must be non-empty")
    require(k > 0, s"k must be positive, got $k")
    import codes.sparkSession.implicits._
    val sub = codebooks.head._3.length // d/m — every sub-centroid's width
    // per-query ADC lookup tables, keyed sub·kc + centroid_id (the
    // adcTopK map-key discipline: an emptied centroid cannot shift the
    // indexing); each cell is the same left-to-right fold as the batch d2
    val dtab: Map[Long, Map[Long, Double]] = panel.map { case (qid, qv) =>
      qid -> codebooks.map { case (s, cid, c) =>
        val sv = qv.slice(s * sub, s * sub + sub)
        var acc = 0.0
        var i = 0
        while (i < c.length) { val dx = sv(i) - c(i); acc += dx * dx; i += 1 }
        (s.toLong * kc + cid) -> acc
      }.toMap
    }.toMap
    val qIds = panel.map(_._1).sorted
    // row-local fan-out: every posting scores against every panel query
    // (skipping self-pairs — the standing q_id =!= n_id eval exclusion)
    val exploded = codes.flatMap { cv =>
      qIds.collect { case q if q != cv.vecId => (q, cv.vecId, cv.codes) }
    }
    exploded.groupByKey(_._1)
      .flatMapGroupsWithState[PanelState, EpochTopK](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qId: Long, rows: Iterator[(Long, Long, Seq[Long])], state) =>
          val prev = state.getOption.getOrElse(PanelState(0L, Vector.empty))
          val table = dtab(qId)
          val fresh = rows.map { case (_, nId, cs) =>
            // left-associated sum in sub_id order — adcTopK's reduce(_ + _)
            var dist = table(cs(0))
            var s = 1
            while (s < m) { dist = dist + table(s.toLong * kc + cs(s)); s += 1 }
            (nId, round6(dist))
          }.toVector
          val top = (prev.top ++ fresh).distinct
            .sortBy { case (id, d2) => (d2, id) }
            .take(k)
          val epoch = prev.epoch + 1
          state.update(PanelState(epoch, top))
          top.iterator.zipWithIndex.map { case ((nId, d2), i) =>
            EpochTopK(qId, epoch, nId, d2, (i + 1).toLong)
          }
      }
  }

  /** Per-epoch retrieval card over [[panelTopK]] snapshots: inner
    * stream-static join against the batch-side truth table (q_id, n_id,
    * rk — e.g. [[graft.ml.Pq.bruteL2TopK]] over the index snapshot), then
    * the exact integer-ppm fold of the batch retrievalEvalCard per epoch.
    * `nQueries` is the fixed panel size — a plan constant, so the card
    * needs no second streaming aggregate. Run the query in Update output
    * mode: each epoch's key is touched by exactly one micro-batch, so the
    * sink sees one row per epoch. */
  def card(sys: Dataset[EpochTopK], truth: DataFrame, nQueries: Long, k: Int): DataFrame =
    sys.toDF()
      .select(col("qId").as("q_id"), col("epoch"), col("nId").as("n_id"), col("rk").as("srk"))
      .join(truth.select(col("q_id"), col("n_id"), col("rk").as("trk")), Seq("q_id", "n_id"))
      .groupBy(col("epoch"))
      .agg(count(lit(1)).as("n_hits"),
        coalesce(sum(when(col("trk") === 1L, expr("1000000 DIV srk")).otherwise(0L)),
          lit(0L)).as("rr_sum"),
        sum(when(col("trk") === 1L && col("srk") === 1L, 1L).otherwise(0L)).as("n_hit1"))
      .select(col("epoch"), lit(nQueries).as("n_queries"), col("n_hits"),
        expr(s"(1000000 * n_hits) DIV ($nQueries * $k)").as("recall_ppm"),
        expr(s"rr_sum DIV $nQueries").as("mrr_ppm"),
        col("n_hit1"),
        expr(s"(1000000 * n_hit1) DIV $nQueries").as("hit1_ppm"))
}
