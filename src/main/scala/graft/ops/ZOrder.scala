package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping —
  * the lakehouse layout trick for the "filter on EITHER of two keys"
  * scan pattern: sorting by (a, b) clusters a but scatters b, while
  * sorting by the bit-interleaved z-value keeps file-level min/max
  * ranges tight on BOTH dimensions, so a parquet reader's row-group
  * pruning works for predicates on any clustered column. At 100 TB the
  * one-time layout cost (a range-exchange on a single long) buys every
  * later scan's skipping.
  *
  * Everything is pure Column arithmetic (shift/mask/or — codegen'd,
  * replayable verbatim in SQL, q157): `zCell` maps a value into a
  * 2^bits fixed grid, `zValue` interleaves the cells' bits LSB-first
  * (cell j contributes its bit b at position b·ndims + j), `zBucket`
  * takes the TOP `log2(buckets)` bits — a deterministic equi-depth-in-
  * z-space split that needs no sampled range boundaries, so layouts
  * are reproducible across runs and engines.
  *
  * Writer usage: `clusterByZOrder(df, cells, bits, files)` returns the
  * frame hash-partitioned by z-bucket and sorted by z-value within
  * each partition — `.write.parquet(...)` then emits one tightly-boxed
  * file per bucket. (Deliberately NOT repartitionByRange: its sampled
  * boundaries are nondeterministic; the top-bits bucket is stable.)
  */
object ZOrder {

  /** Map `c` into cell [0, 2^bits) of a fixed [lo, hi] grid — clamped,
    * so out-of-range values land in the edge cells instead of failing.
    * Fixed bounds (not sampled quantiles) keep the layout deterministic
    * and incremental-append-stable: tomorrow's files use the same grid. */
  def zCell(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, "zCell: bits must be in [1,20]")
    require(hi > lo, "zCell: hi must exceed lo")
    val cells = 1L << bits
    val step = (hi - lo) / cells
    least(greatest(floor((c.cast("double") - lo) / step), lit(0.0)),
      lit((cells - 1).toDouble)).cast("long")
  }

  /** Interleave the bits of `cells` (each already in [0, 2^bits)) into
    * one Morton code. Dimension j's bit b lands at position
    * b * ndims + j, LSB-first. ndims * bits must fit a long (≤ 62). */
  def zValue(cells: Seq[Column], bits: Int): Column = {
    val ndims = cells.length
    require(ndims >= 2, "zValue: need at least 2 dimensions")
    require(ndims * bits <= 62, "zValue: ndims * bits must be <= 62")
    val terms = for {
      b <- 0 until bits
      (c, j) <- cells.zipWithIndex
    } yield shiftleft(shiftrightunsigned(c, b).bitwiseAND(lit(1L)),
      b * ndims + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Top-bits bucket of a z-value: 2^bucketBits deterministic buckets
    * over the z-space (totalBits = ndims * bits of the code). */
  def zBucket(z: Column, totalBits: Int, bucketBits: Int): Column = {
    require(bucketBits >= 1 && bucketBits <= totalBits,
      "zBucket: bucketBits must be in [1, totalBits]")
    shiftrightunsigned(z, totalBits - bucketBits)
  }

  /** [[zCell]] as SQL over expression `e` — q157 oracle builder. */
  def zCellSql(e: String, lo: Double, hi: Double, bits: Int): String = {
    val cells = 1L << bits
    val step = (hi - lo) / cells
    s"CAST(least(greatest(floor((CAST($e AS DOUBLE) - $lo) / $step), 0.0), " +
      s"${(cells - 1).toDouble}) AS BIGINT)"
  }

  /** [[zValue]] as SQL over cell expressions — same term order. */
  def zValueSql(cells: Seq[String], bits: Int): String =
    (for { b <- 0 until bits; (c, j) <- cells.zipWithIndex }
      yield s"(((($c) >> $b) & 1) << ${b * cells.length + j})")
      .mkString("(", " | ", ")")

  /** Cluster `df` for writing: z-value from the given (column, lo, hi)
    * grid specs, one output partition per top-bits bucket, rows sorted
    * by full z-value within each. Follow with `.write.parquet(...)`. */
  def clusterByZOrder(df: DataFrame, dims: Seq[(Column, Double, Double)],
                      bits: Int, bucketBits: Int): DataFrame = {
    val cells = dims.map { case (c, lo, hi) => zCell(c, lo, hi, bits) }
    val z = zValue(cells, bits)
    val totalBits = dims.length * bits
    df.withColumn("__z", z)
      .repartition(1 << bucketBits, zBucket(col("__z"), totalBits, bucketBits))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
