package graft

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{EwmaState, SeqValue}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming recursive EWMA (StatefulOps.ewma): stream state ≡ an ordered
  * batch fold, intra-batch disorder repaired by the seq sort. */
class StreamingEwmaSpec extends SparkSpec {
  import spark.implicits._

  private val alpha = 0.3

  private def referenceFold(xs: Seq[Double]): Double =
    xs.tail.foldLeft(xs.head) { (s, x) =>
      BigDecimal(alpha * x + (1.0 - alpha) * s)
        .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

  test("final stream state equals the ordered reference fold per key") {
    implicit val ctx = spark.sqlContext
    // key 1: in-order across waves; key 2: shuffled WITHIN each wave (the
    // seq sort must repair it)
    val waves = Seq(
      Seq(SeqValue(1L, 1L, 10.0), SeqValue(1L, 2L, 20.0),
        SeqValue(2L, 2L, 5.0), SeqValue(2L, 1L, 50.0)),
      Seq(SeqValue(1L, 3L, 0.0),
        SeqValue(2L, 4L, 1.0), SeqValue(2L, 3L, 100.0)))
    val ms = MemoryStream[SeqValue]
    val q = StatefulOps.ewma(ms.toDS(), alpha)
      .writeStream.outputMode("update")
      .format("memory").queryName("ewma_stream")
      .start()
    val got = try {
      waves.foreach { w => ms.addData(w); q.processAllAvailable() }
      // update mode appends one row per key per batch: last row per key wins
      spark.table("ewma_stream").as[EwmaState].collect()
        .groupBy(_.key).map { case (k, rows) => k -> rows.maxBy(_.lastSeq) }
    } finally q.stop()
    val k1 = referenceFold(Seq(10.0, 20.0, 0.0))
    val k2 = referenceFold(Seq(50.0, 5.0, 100.0, 1.0))
    assert(got(1L).ewma == k1 && got(1L).n == 3L, got(1L).toString)
    assert(got(2L).ewma == k2 && got(2L).n == 4L, got(2L).toString)
  }

  test("degenerate alpha is refused") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[SeqValue]
    intercept[IllegalArgumentException](StatefulOps.ewma(ms.toDS(), 0.0))
  }
}
