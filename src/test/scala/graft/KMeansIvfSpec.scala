package graft

import graft.ml.KMeans
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class KMeansIvfSpec extends SparkSpec {
  import spark.implicits._

  test("k-means separates two obvious clusters and is deterministic") {
    // two tight clusters around (0,0) and (10,10)
    val pts = ((0L until 10L).map(i => (i, Array(0.0 + i * 0.01, 0.0))) ++
      (10L until 20L).map(i => (i, Array(10.0, 10.0 + i * 0.01)))).toDF("vec_id", "vec")
    val centroids = KMeans.fit(pts, k = 2, iterations = 5)
    val assigned = KMeans.assign(pts, centroids)
      .select($"vec_id", $"centroid_id").as[(Long, Long)].collect().toMap
    val c1 = (0L until 10L).map(assigned).toSet
    val c2 = (10L until 20L).map(assigned).toSet
    assert(c1.size == 1 && c2.size == 1 && c1 != c2)
    val again = KMeans.assign(pts, KMeans.fit(pts, k = 2, iterations = 5))
      .select($"vec_id", $"centroid_id").as[(Long, Long)].collect().toMap
    assert(again == assigned)
  }

  test("IVF top-k reports exact cosines and good recall vs brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(300).select($"vec_id", $"embedding")
    val brute = Similarity.bruteTopK(emb, emb, k = 5)
      .as[(Long, Long, Double, Long)].collect()
    val bruteMap = brute.map(r => (r._1, r._2) -> r._3).toMap
    val ivf = Similarity.ivfTopK(emb, k = 5, nlist = 8, nprobe = 4, kmeansIters = 2)
      .as[(Long, Long, Double, Long)].collect()
    assert(ivf.nonEmpty)
    // sims are exact for every reported pair
    ivf.foreach { case (q, n, sim, _) =>
      bruteMap.get((q, n)).foreach(exact => assert(exact == sim))
    }
    // recall@5 with half the buckets probed should be substantial
    val bruteSet = brute.map(r => (r._1, r._2)).toSet
    val recall = ivf.map(r => (r._1, r._2)).count(bruteSet.contains).toDouble / bruteSet.size
    assert(recall >= 0.5, s"recall $recall")
  }
}
