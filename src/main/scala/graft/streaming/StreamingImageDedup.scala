package graft.streaming

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming perceptual-image dedup — the continuous-ingest twin of the
  * batch aHash pipeline (q177), extending the [[StreamingDedup]] posture
  * from text to the multimodal column family: every arriving image is
  * decoded and 64-bit average-hashed *inside its own row*
  * ([[Multimodal.imageAHash]] is a narrow per-partition map, so the plan
  * stays a single stateful operator), exploded to its four 16-bit LSH
  * bands, and grouped by (band, value). Per-bucket state holds members'
  * (id, hash halves); a new arrival emits a pair against every existing
  * member within the Hamming budget.
  *
  * Unlike MinHash candidates — which still need a downstream Jaccard
  * verify — the state here carries the full 64-bit hash, so the Hamming
  * check runs IN the stateful operator and emitted pairs are final
  * (batch parity on the distinct pair set, StreamingImageDedupSpec).
  *
  * Scale: state partitions by the band bucket key — the key the batch job
  * shuffles on — and `maxBucketSize` bounds both state and per-arrival
  * fan-out. Same streaming-cap semantics as [[StreamingDedup]]: a full
  * bucket stops ADMITTING members (a stream cannot un-emit), where batch
  * drops the dense bucket retroactively — documented, not hidden. */
object StreamingImageDedup {

  case class BandedHash(t: Long, bv: Long, id: Long, hi: Long, lo: Long)
  case class Bucket(members: List[(Long, Long, Long)]) // (id, hi, lo)
  case class ImagePair(docA: Long, docB: Long, hamming: Long)

  /** One (band index, band value, id, hash halves) row per band per
    * decodable record — pure narrow ops, works on batch and streaming
    * frames alike. Non-raster payloads are dropped (the imageAHash
    * contract). */
  def bandedHashes(records: Dataset[MediaRecord]): Dataset[BandedHash] = {
    import records.sparkSession.implicits._
    Multimodal.imageAHash(records)
      .select(col("media_id"), col("h_hi"), col("h_lo"), explode(array(
        struct(lit(0L).as("t"), col("b0").as("bv")),
        struct(lit(1L).as("t"), col("b1").as("bv")),
        struct(lit(2L).as("t"), col("b2").as("bv")),
        struct(lit(3L).as("t"), col("b3").as("bv")))).as("b"))
      .select(col("b.t").as("t"), col("b.bv").as("bv"), col("media_id").as("id"),
        col("h_hi").as("hi"), col("h_lo").as("lo"))
      .as[BandedHash]
  }

  /** Near-duplicate image pairs over a streaming [[MediaRecord]] frame,
    * emitted as soon as the second band-colliding member arrives and the
    * Hamming distance clears `maxHamming`. Append mode; pairs are
    * normalized (docA < docB) and may repeat across bands — parity with
    * the batch band join is on the DISTINCT pair set, mirroring the batch
    * plan's `.distinct()`. */
  def ahashCandidates(records: Dataset[MediaRecord], maxHamming: Long = 10L,
                      maxBucketSize: Int = 64): Dataset[ImagePair] = {
    import records.sparkSession.implicits._
    bandedHashes(records)
      .groupByKey(b => (b.t, b.bv))
      .flatMapGroupsWithState[Bucket, ImagePair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Long, Long), rows: Iterator[BandedHash], state: GroupState[Bucket]) =>
          var members = state.getOption.map(_.members).getOrElse(Nil)
          val out = List.newBuilder[ImagePair]
          rows.foreach { r =>
            if (!members.exists(_._1 == r.id) && members.size < maxBucketSize) {
              members.foreach { case (mid, mhi, mlo) =>
                val ham = java.lang.Long.bitCount(mhi ^ r.hi) +
                  java.lang.Long.bitCount(mlo ^ r.lo)
                if (ham <= maxHamming)
                  out += ImagePair(math.min(mid, r.id), math.max(mid, r.id), ham.toLong)
              }
              members = (r.id, r.hi, r.lo) :: members
            }
          }
          state.update(Bucket(members))
          out.result().iterator
      }
  }
}
