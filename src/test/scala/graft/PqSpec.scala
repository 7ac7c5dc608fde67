package graft

import org.apache.spark.sql.functions._

import graft.ops.Embeddings

class PqSpec extends SparkSpec {
  import spark.implicits._
  initLogs()

  private val dim = 8
  private val m = 4 // subvectors of 2 dims

  /** three tight planted clusters in 8-d, 32 points each. */
  private lazy val planted = {
    val centers = Seq(
      Array(5.0, 5, 5, 5, 5, 5, 5, 5),
      Array(-5.0, -5, -5, -5, 5, 5, 5, 5),
      Array(0.0, 0, 5, 5, -5, -5, 0, 0))
    val rnd = new scala.util.Random(7)
    (0L until 96L).map { i =>
      val c = centers((i % 3).toInt)
      (i, c.map(_ + rnd.nextGaussian() * 0.05).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("pqEncode picks each subspace's true nearest centroid") {
    val cbs = Embeddings.pqInitCodebooks(planted, "vec_id", "embedding",
      dim, m, every = 10)
    val rows = planted
      .select(col("vec_id"), col("embedding"),
        Embeddings.pqEncode(col("embedding"), cbs).as("codes"))
      .as[(Long, Seq[Double], Seq[Int])].collect()
    rows.foreach { case (_, v, codes) =>
      codes.zipWithIndex.foreach { case (code, s) =>
        val sv = v.slice(s * 2, s * 2 + 2)
        val best = cbs(s).zipWithIndex.minBy { case (c, j) =>
          (c.zip(sv).map { case (a, b) => (a - b) * (a - b) }.sum, j)
        }._2
        assert(code == best, s"subspace $s: got $code want $best")
      }
    }
  }

  test("pqDecode reconstructs within the cluster radius; " +
    "trained codebooks do not reconstruct worse") {
    def avgErr(cbs: Array[Array[Array[Double]]]): Double = {
      val errs = planted.select(col("embedding"),
          Embeddings.pqDecode(
            Embeddings.pqEncode(col("embedding"), cbs), cbs).as("rec"))
        .as[(Seq[Double], Seq[Double])].collect()
        .map { case (v, r) =>
          math.sqrt(v.zip(r).map { case (a, b) => (a - b) * (a - b) }.sum) }
      errs.sum / errs.length
    }
    val init = Embeddings.pqInitCodebooks(planted, "vec_id", "embedding",
      dim, m, every = 10)
    val trained = Embeddings.pqTrainCodebooks(planted, "vec_id", "embedding",
      dim, m, every = 10, iters = 5)
    val (e0, e1) = (avgErr(init), avgErr(trained))
    assert(e0 < 1.0, s"raw-init reconstruction too lossy: $e0")
    assert(e1 <= e0 + 1e-9, s"training regressed reconstruction: $e1 > $e0")
  }

  test("pqTopK: ADC top-1 equals the exact nearest neighbor on " +
    "separated clusters") {
    val cbs = Embeddings.pqTrainCodebooks(planted, "vec_id", "embedding",
      dim, m, every = 10, iters = 3)
    val coded = planted.select(col("vec_id"),
      Embeddings.pqEncode(col("embedding"), cbs).as("codes"))
    val all = planted.as[(Long, Seq[Double])].collect()
    val queries = Seq(5L, 17L, 40L).map(q =>
      q -> all.find(_._1 == q).get._2.toArray).toArray
    val got = Embeddings.pqTopK(queries, coded, "vec_id", "codes", cbs, k = 3)
      .filter(col("rank") === 1)
      .select("qid", "vec_id").as[(Long, Long)].collect().toMap
    queries.foreach { case (qid, qv) =>
      val exact = all.minBy { case (i, v) =>
        (v.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum, i) }._1
      assert(got(qid) == exact, s"query $qid: adc ${got(qid)} vs exact $exact")
    }
  }
}
