package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic Lloyd k-means over an embedding column — the
  * clustering pass a 100 TB pipeline runs to build IVF cells
  * ([[Similarity.ivfTopK]]), balance training mixes, or profile a
  * corpus.
  *
  * Engine-reproducible by construction, which is what makes q66's
  * DuckDB oracle possible:
  *  - initial centroids are every `initEvery`-th vector by id (no RNG);
  *  - assignment minimizes |c|² − 2·x·c (same argmin as squared L2)
  *    with the codegen'd sequential [[Similarity.dot]] — bit-identical
  *    to an oracle's list_sum fold — and ties break on the smaller
  *    cell id;
  *  - centroid updates quantize components to the 2⁻²⁶ grid
  *    (floor(v·2²⁶) as exact integers — casting raw doubles to decimals
  *    instead turned out to round differently across engines at the
  *    last decimal ULP) and sum them exactly: order-independent, so
  *    every iteration's centroids (and therefore every assignment) is
  *    deterministic at any parallelism. The ~1.5e-8 quantization is
  *    far below any clustering-relevant signal.
  *
  * Scale shape per iteration: one broadcast of k·dim doubles inside the
  * assignment expression (k centroids collect to the driver — tiny),
  * one posexplode + hash aggregate for the means (k·dim groups). No
  * per-row driver work, no cross join of the corpus.
  */
object KMeans {

  /** centroid quantization grid: 2²⁶ (≈1.5e-8 resolution). */
  val Grid: Double = 67108864.0

  /** run `iters` assign+update rounds; returns one row per (cell, pos):
    * final centroid component `c` plus the cell's member count `n`.
    *
    * `id` must be a LongType column (it seeds the deterministic init:
    * every `initEvery`-th id becomes a centroid). A cell that loses all
    * members in some round drops out of subsequent rounds — standard
    * Lloyd behavior; the returned profile only contains surviving
    * cells. */
  def lloydProfile(df: DataFrame, id: String, vec: String,
                   initEvery: Int, iters: Int): DataFrame = {
    require(iters >= 1, "lloydProfile: iters must be >= 1")
    val spark = df.sparkSession
    require(df.schema(id).dataType == LongType,
      s"lloydProfile: id column '$id' must be LongType, " +
        s"got ${df.schema(id).dataType.simpleString}")
    val dvec = col(vec).cast("array<double>")

    var centroids: Seq[(Long, Seq[Double])] = df
      .filter(col(id) % initEvery === 0)
      .select(col(id), dvec.as("c")).collect()
      .sortBy(_.getLong(0)).zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Double](1)) }.toSeq
    require(centroids.nonEmpty,
      s"lloydProfile: init selected zero centroids (no row has $id % " +
        s"$initEvery == 0) — pick initEvery within the id range")

    def assignCol(cs: Seq[(Long, Seq[Double])]): Column = {
      val scored = cs.map { case (cell, c) =>
        var c2 = 0.0
        c.foreach(x => c2 += x * x) // sequential, same fold as the oracle
        struct((lit(c2) - lit(2.0) * Similarity.dot(dvec, typedLit(c))).as("d"),
          lit(cell).as("cell"))
      }
      array_min(array(scored: _*)).getField("cell")
    }

    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      assigned = df.select(col(id), dvec.as("v"), assignCol(centroids).as("cell"))
      val means = assigned.select(col("cell"), posexplode(col("v")))
        .groupBy("cell", "pos")
        .agg((sum(floor(col("col") * KMeans.Grid)).cast("double") /
          KMeans.Grid / count(lit(1))).as("c"))
        .collect()
      centroids = means.groupBy(_.getLong(0)).toSeq.map { case (cell, rows) =>
        (cell, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
      }.sortBy(_._1)
    }

    val counts = assigned.groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = for {
      (cell, c) <- centroids
      (v, pos) <- c.zipWithIndex
    } yield Row(cell, counts.getOrElse(cell, 0L), pos, v)
    val schema = StructType(Seq(
      StructField("cell", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("pos", IntegerType, nullable = false),
      StructField("c", DoubleType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), schema)
  }
}
