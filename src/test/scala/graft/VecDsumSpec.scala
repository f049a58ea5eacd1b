package graft

import graft.functions.{Exprs, VecDsum}
import org.apache.spark.sql.functions._

/** Bit-parity of the element-wise gradient aggregate against the
  * posexplode + dsum formulation [[graft.ml.Logistic.train]] used before
  * round 14, and of the driver-side round12 against Spark's Round. */
class VecDsumSpec extends SparkSpec {
  import spark.implicits._

  private def randomFrame(n: Int, d: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n) { i =>
      (i.toLong,
        Array.fill(d)(math.floor(rnd.nextDouble() * 512 * 1e10) / 1e10),
        if (rnd.nextBoolean()) 1.0 else 0.0,
        math.floor(rnd.nextDouble() * 1e10) / 1e10)
    }.toDF("id", "x", "y", "p")
  }

  test("VecDsum equals posexplode + per-position dsum, slot by slot") {
    val df = randomFrame(500, 17, seed = 3)
    val coef = col("p") - col("y")
    // the pre-round-14 gradient: explode, group by position, exact dsum
    val exploded = df
      .select(col("p"), col("y"), posexplode(col("x")).as(Seq("pos", "xj")))
      .groupBy(col("pos"))
      .agg(Exprs.dsum(round((col("p") - col("y")) * col("xj"), 12), 12).as("s"))
      .orderBy(col("pos"))
      .as[(Int, Double)].collect()
    val vec = df.agg(VecDsum(col("x"), coef, 12).as("s"))
      .select(posexplode(col("s")).as(Seq("pos", "v")))
      .orderBy(col("pos"))
      .as[(Int, Double)].collect()
    assert(exploded.length == 17 && vec.length == 17)
    exploded.zip(vec).foreach { case ((pe, se), (pv, sv)) =>
      assert(pe == pv && se == sv, s"slot $pe: explode=$se vec=$sv")
    }
  }

  test("VecDsum over zero rows is null; null coef rows contribute nothing") {
    val empty = Seq.empty[(Long, Array[Double], Double, Double)]
      .toDF("id", "x", "y", "p")
    assert(empty.agg(VecDsum(col("x"), col("p") - col("y"), 12).as("s"))
      .collect().head.isNullAt(0))
    // one real row + one null-coef row == just the real row
    val one = Seq((1L, Array(1.5, 2.5), 0.0, 0.75)).toDF("id", "x", "y", "p")
    val withNull = Seq((1L, Array(1.5, 2.5), Some(0.0), Some(0.75)),
      (2L, Array(9.0, 9.0), None, None)).toDF("id", "x", "y", "p")
    val a = one.agg(VecDsum(col("x"), col("p") - col("y"), 12)).as[Seq[Double]].head()
    val b = withNull.agg(VecDsum(col("x"), col("p") - col("y"), 12)).as[Seq[Double]].head()
    assert(a == b)
  }

  test("OuterDsum equals the exploded (i, j, p) covariance form, slot by slot") {
    import org.apache.spark.sql.types.LongType
    val rnd = new scala.util.Random(5)
    val d = 7
    val df = Seq.tabulate(300)(_ =>
      Tuple1(Array.fill(d)(math.floor((rnd.nextDouble() - 0.5) * 1e10) / 1e10)))
      .toDF("cv")
    // the pre-round-14 Pca.cov expansion
    val exploded = df
      .select(explode(flatten(transform(col("cv"), (xi, i) =>
        transform(col("cv"), (xj, j) =>
          struct((i + 1).cast(LongType).as("i"), (j + 1).cast(LongType).as("j"),
            round(xi * xj, 12).as("p")))))).as("t"))
      .select(col("t.i").as("i"), col("t.j").as("j"), col("t.p").as("p"))
      .groupBy(col("i"), col("j"))
      .agg(round(Exprs.dsum(col("p"), 12), 12).as("s"))
      .orderBy(col("i"), col("j"))
      .as[(Long, Long, Double)].collect()
    val outer = df.agg(graft.functions.OuterDsum(col("cv"), 12).as("sv"))
      .select(posexplode(col("sv")).as(Seq("k", "sraw")))
      .filter(col("sraw").isNotNull)
      .select((floor(col("k") / lit(d)) + 1).cast(LongType).as("i"),
        (col("k") % lit(d) + 1).cast(LongType).as("j"),
        round(col("sraw"), 12).as("s"))
      .orderBy(col("i"), col("j"))
      .as[(Long, Long, Double)].collect()
    assert(exploded.length == d * d && outer.length == d * d)
    exploded.zip(outer).foreach { case ((ie, je, se), (io, jo, so)) =>
      assert(ie == io && je == jo && se == so, s"($ie,$je): explode=$se outer=$so")
    }
  }

  test("driver-side round12 matches Spark's round(col, 12) on random doubles") {
    val rnd = new scala.util.Random(11)
    val vals = Array.fill(4000)((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(8) - 3)) ++
      Array(0.0, -0.0, 1.0000000000005, -1.0000000000005, 2.5e-13, -2.5e-13)
    val sparkSide = vals.toSeq.toDF("v").select(round(col("v"), 12)).as[Double].collect()
    vals.zip(sparkSide).foreach { case (v, s) =>
      val d = graft.ml.Logistic.round12(v)
      assert(java.lang.Double.doubleToLongBits(d) == java.lang.Double.doubleToLongBits(s),
        s"round12($v): driver=$d spark=$s")
    }
  }

  test("trained weights are bit-equal to the pre-round-14 frame-loop trainer") {
    // the exact weight-frame GD loop Logistic.train ran before round 14,
    // inlined as the reference implementation
    def trainOld(data: org.apache.spark.sql.DataFrame, lr: Double,
                 iterations: Int): Array[(Long, Double)] = {
      import org.apache.spark.sql.types.{DoubleType, LongType}
      val e = data.select(col("id"), col("x"), col("y"))
        .coalesce(spark.sparkContext.defaultParallelism)
        .persist()
      val n = e.count().toDouble
      var weights = e.limit(1)
        .select(posexplode(col("x")))
        .select(col("pos"), lit(0.0d).as("w"))
        .coalesce(1)
        .localCheckpoint(true)
      for (_ <- 1 to iterations) {
        val wArr = weights
          .agg(array_sort(collect_list(struct(col("pos"), col("w")))).as("es"))
          .select(transform(col("es"), x => x.getField("w")).as("wv"))
        val scored = e.crossJoin(broadcast(wArr))
          .withColumn("p",
            round(lit(1.0d) / (lit(1.0d) + exp(-round(Exprs.dot(col("x"), col("wv")), 12))), 10))
        weights = weights.join(
          scored.select(col("p"), col("y"), posexplode(col("x")).as(Seq("pos", "xj")))
            .groupBy(col("pos"))
            .agg((Exprs.dsum(round((col("p") - col("y")) * col("xj"), 12), 12) / lit(n)).as("g")),
          "pos")
          .select(col("pos"), round(col("w") - lit(lr) * col("g"), 12).as("w"))
          .coalesce(1)
          .localCheckpoint(true)
      }
      e.unpersist(blocking = false)
      weights.select(col("pos").cast(LongType).as("pos"), col("w").cast(DoubleType).as("w"))
        .orderBy(col("pos")).as[(Long, Double)].collect()
    }
    // features on the real [0, 512)-ish scale q176 uses, plus a bias slot
    val data = randomFrame(200, 5, seed = 42).select(col("id"), col("x"), col("y"))
    for (iters <- Seq(0, 1, 6)) {
      val expected = trainOld(data, lr = 0.5, iterations = iters)
      val got = graft.ml.Logistic.train(data, lr = 0.5, iterations = iters)
        .orderBy(col("pos")).as[(Long, Double)].collect()
      assert(got.length == 5)
      expected.zip(got).foreach { case ((pe, we), (pg, wg)) =>
        assert(pe == pg &&
          java.lang.Double.doubleToLongBits(we) == java.lang.Double.doubleToLongBits(wg),
          s"iters=$iters pos=$pe: old=$we new=$wg")
      }
    }
  }
}
