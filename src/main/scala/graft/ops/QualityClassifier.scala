package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GPT-3-style document quality classifier (Brown et al. 2020 §A /
  * Wenzek et al. 2020 use the same recipe — public method): a logistic
  * regression trained to separate a trusted reference slice (label 1)
  * from the raw crawl (label 0); the score then gates or re-weights
  * every document. The reference has no equivalent.
  *
  * Scale shape — the whole point at 100 TB:
  *  - TRAINING is full-batch gradient descent with a DRIVER-HELD
  *    weight vector (the feature dimension is tiny — a handful of
  *    quality signals); each iteration is exactly ONE corpus aggregate
  *    (d exact sums + a count, map-side combined), the KMeans
  *    bounded-driver-collect pattern. No per-row state, no shuffle
  *    beyond the aggregate.
  *  - SCORING is a pure scan-stage expression (broadcast-free: the
  *    weights are literals), so the trained model stamps a 100 TB
  *    corpus in the same pass that reads it.
  *
  * Determinism / oracle policy: gradient terms quantize to 1e-6 via
  * `floor(t·1e6 + 0.5)` summed as EXACT LONGS — pure IEEE arithmetic
  * that is bit-identical across engines and partitionings. (The
  * decimal(18,6)-cast convention used elsewhere is NOT safe here:
  * Spark casts double→decimal through the shortest string repr with
  * HALF_UP while DuckDB rounds the binary value, and iteration-1
  * terms are structurally short decimals — x·(σ(0)−y) = ±x/2 — that
  * land on 6-dp cast boundaries; a 1-ulp weight divergence was
  * observed at sf0.01 before the switch.) The sigmoid's libm exp gets
  * the 9-dp rounding guard on both its input (the dot product) and
  * its output. Weights persist through
  * [[ModelStore.saveModelTable]] as a (pos, w) table — train once,
  * score forever (the q211/EnrichStream contract).
  */
object QualityClassifier {

  /** the logit z = round(x·w, 9) — left-to-right association, mirrored
    * token-for-token by the SQL oracle. */
  private def logit(features: Seq[Column], w: Seq[Double]): Column =
    round(features.zip(w).map { case (f, wj) => f * lit(wj) }
      .reduce(_ + _), 9)

  /** σ(z) with the exp guard: round(1/(1+exp(−z)), 9). */
  private def sigmoid(z: Column): Column =
    round(lit(1.0) / (lit(1.0) + exp(-z)), 9)

  /** train `iters` full-batch GD rounds from w = 0:
    *   w_j ← w_j − lr · ( Σ ⌊x_j·(σ(x·w) − y)·10⁶ + ½⌋ / 10⁶ / n )
    * One corpus aggregate per round; the Σ is an exact long sum of the
    * 1e-6-quantized terms. Features must be non-null on every row. */
  def fitLogReg(df: DataFrame, features: Seq[Column], label: Column,
                iters: Int = 3, lr: Double = 0.5): Array[Double] = {
    require(iters >= 1 && features.nonEmpty,
      "fitLogReg: need >= 1 iteration and >= 1 feature")
    var w = Array.fill(features.length)(0.0)
    for (_ <- 0 until iters) {
      val diff = sigmoid(logit(features, w.toSeq)) - label
      val aggs = features.map(f =>
        sum(floor(f * diff * lit(1e6) + lit(0.5)).cast("long"))) :+
        count(lit(1)).cast("long")
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getLong(features.length)
      w = w.zipWithIndex.map { case (wj, j) =>
        wj - lr * (row.getLong(j).toDouble / 1e6 / n) }
    }
    w
  }

  /** scan-stage score column under trained weights: σ(x·w), 9-dp. */
  def scoreCol(features: Seq[Column], w: Seq[Double]): Column =
    sigmoid(logit(features, w))

  /** weights as a ModelStore-persistable (pos, w) table; order-pin on
    * load with `pos`. */
  def weightsTable(spark: SparkSession, w: Seq[Double]): DataFrame = {
    import spark.implicits._
    w.zipWithIndex.map { case (wj, j) => (j, wj) }.toDF("pos", "w")
  }

  /** inverse of [[weightsTable]] (bounded collect: d rows). */
  def loadWeights(table: DataFrame): Array[Double] =
    table.orderBy("pos").collect().map(_.getDouble(1))
}
