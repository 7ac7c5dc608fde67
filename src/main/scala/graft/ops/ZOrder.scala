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

  // ---- Hilbert curve (the locality-optimal complement of Morton) ---------

  /** 2-D Hilbert distance of grid cells — the classic bit-level
    * reflect/rotate walk (public method: the standard xy2d formulation,
    * cf. Hamilton's compact Hilbert indices, 2006). Hilbert preserves
    * locality strictly better than Morton: CONSECUTIVE d values are
    * always grid neighbors (|Δx|+|Δy| = 1, spec-pinned), where a
    * z-curve jumps across quadrant seams — tighter per-file bounding
    * boxes for the same layout cost at 100 TB.
    *
    * The walk's per-level state rotation is SEQUENTIAL in the bit
    * levels, so this is a DataFrame STAGE CHAIN, not one Column: each
    * level's (x, y, d) materialize as named columns — multi-referenced
    * non-cheap aliases survive CollapseProject (the q183 hoisting
    * rule), keeping the plan linear in `bits` where one nested Column
    * expression would double per level. The identical staged SQL
    * ([[hilbertSqlCtes]]) replays it (q187).
    *
    * `xCell`/`yCell` must already be cells in [0, 2^bits) (use
    * [[zCell]]). Appends `out` = the Hilbert d in [0, 4^bits). */
  def hilbertValue2D(df: DataFrame, xCell: Column, yCell: Column,
                     bits: Int, out: String): DataFrame = {
    require(bits >= 1 && bits <= 20, "hilbertValue2D: bits must be in [1,20]")
    // reflection constant is the FULL grid size n−1 at every level (the
    // canonical xy2d form — x/y stay full-width; only (v & s) is read
    // per level, and n−1−v complements the low bits consistently)
    val n = 1L << bits
    var cur = df.withColumn("__hx", xCell.cast("long"))
      .withColumn("__hy", yCell.cast("long"))
      .withColumn("__hd", lit(0L))
    for (lvl <- bits - 1 to 0 by -1) {
      val s = 1L << lvl
      cur = cur
        .withColumn("__rx",
          when(col("__hx").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("__ry",
          when(col("__hy").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("__hd", col("__hd") +
          lit(s) * lit(s) * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        // reflect (rx==1 within the ry==0 half-turn), then swap x/y
        .withColumn("__nx",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(n - 1) - col("__hy"))
              .otherwise(col("__hy")))
            .otherwise(col("__hx")))
        .withColumn("__ny",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(n - 1) - col("__hx"))
              .otherwise(col("__hx")))
            .otherwise(col("__hy")))
        .withColumn("__hx", col("__nx"))
        .withColumn("__hy", col("__ny"))
    }
    cur.withColumn(out, col("__hd"))
      .drop("__hx", "__hy", "__hd", "__rx", "__ry", "__nx", "__ny")
  }

  /** [[hilbertValue2D]] as a chain of SQL CTEs — the q187 oracle
    * builder. `src` must expose cell columns `x` and `y` (plus any
    * payload, which rides along via the explicit `carry` list); emits
    * CTEs `h{bits}..h0`, with the final (x, y exhausted) distance in
    * `h0.d`. */
  def hilbertSqlCtes(src: String, bits: Int,
                     carry: Seq[String] = Seq.empty): String = {
    val n = 1L << bits
    val keep = if (carry.isEmpty) "" else carry.mkString(", ", ", ", "")
    val head = s"h$bits AS (SELECT x, y, CAST(0 AS BIGINT) AS d$keep FROM $src)"
    val levels = (bits - 1 to 0 by -1).map { lvl =>
      val s = 1L << lvl
      s"""h$lvl AS (SELECT
          CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${n - 1} - y ELSE y END)
               ELSE x END AS x,
          CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${n - 1} - x ELSE x END)
               ELSE y END AS y,
          d + $s * $s * xor(3 * rx, ry) AS d$keep
        FROM (SELECT *,
            CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
            CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry
          FROM h${lvl + 1}))"""
    }
    (head +: levels).mkString(",\n")
  }

  /** N-dimensional Hilbert distance via Skilling's transpose algorithm
    * (J. Skilling, "Programming the Hilbert curve", AIP Conf. Proc.
    * 707, 2004 — public method): the 2-D staged walk generalizes to
    * any dimension with the same plan shape — a fixed unrolled chain
    * of pure Column bit arithmetic (shift/mask/xor — codegen'd, no
    * UDF, no shuffle), replayable verbatim in SQL
    * ([[hilbertNdSqlCtes]], q199).
    *
    * Stages: the "inverse undo" loop runs (bits−1)·n conditional-swap
    * stages on the cell columns (each touches only X0 and Xi — the
    * sequential dependency is real, so stages unroll in order), then
    * the Gray encode chain, one reflection constant t folded from the
    * last axis, and the bit interleave of the transposed axes (MSB
    * group first: index bit lvl·n + (n−1−i) takes X_i's bit lvl).
    *
    * `cells` must already be grid cells in [0, 2^bits) (use [[zCell]]);
    * n·bits ≤ 60 keeps d in a non-negative long. Appends `out` = the
    * Hilbert d in [0, 2^(n·bits)) — a bijection with unit-Manhattan
    * steps between consecutive d (asserted exhaustively in OpsSpec).
    * For n = 2 prefer [[hilbertValue2D]] (same cost, the canonical
    * xy2d orientation).
    *
    * DO NOT `filter` on `out` in the SAME plan that computes it:
    * predicate pushdown substitutes the filter through every walk
    * stage, and because each stage references the previous stage's
    * columns more than once, the rewritten predicate grows
    * EXPONENTIALLY in the stage count — the optimizer OOMs before any
    * row moves (observed: driver heap exhausted in
    * PushPredicateThroughNonJoin at bits = 6, n = 3). The intended
    * use never hits this: [[clusterByHilbertND]] range-partitions and
    * WRITES the layout, and range predicates run against the written
    * table (where `out` is a plain stored column and pushdown reaches
    * the parquet scan). If you must gate on `out` in-plan, use
    * [[hilbertGate]] — it computes the same walk behind a lineage
    * barrier, so filtering its result is safe by construction. */
  def hilbertValueND(df: DataFrame, cells: Seq[Column], bits: Int,
                     out: String): DataFrame = {
    val n = cells.length
    require(n >= 2, "hilbertValueND: need >= 2 dimensions")
    require(bits >= 1 && n * bits <= 60,
      "hilbertValueND: need bits >= 1 and n*bits <= 60")
    def x(i: Int) = col(s"__t$i")
    var cur = cells.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      d.withColumn(s"__t$i", c.cast("long"))
    }
    // inverse undo: Q from 2^(bits-1) down to 2
    for (lvl <- bits - 1 to 1 by -1; i <- 0 until n) {
      val q = 1L << lvl
      val p = q - 1L
      val cond = x(i).bitwiseAND(lit(q)) > 0
      if (i == 0) {
        // t = (X0 ^ X0) & P = 0: only the taken branch does work
        cur = cur.withColumn("__t0",
          when(cond, x(0).bitwiseXOR(lit(p))).otherwise(x(0)))
      } else {
        val t = x(0).bitwiseXOR(x(i)).bitwiseAND(lit(p))
        cur = cur
          .withColumn("__u0",
            when(cond, x(0).bitwiseXOR(lit(p))).otherwise(x(0).bitwiseXOR(t)))
          .withColumn(s"__t$i", when(cond, x(i)).otherwise(x(i).bitwiseXOR(t)))
          .withColumn("__t0", col("__u0")).drop("__u0")
      }
    }
    // Gray encode (sequential: X_i ^= X_{i-1} uses the updated left)
    for (i <- 1 until n)
      cur = cur.withColumn(s"__t$i", x(i).bitwiseXOR(x(i - 1)))
    // reflection constant from the last axis: t ^= Q-1 where bit set
    val tConst = (bits - 1 to 1 by -1).map { lvl =>
      val q = 1L << lvl
      when(x(n - 1).bitwiseAND(lit(q)) > 0, lit(q - 1L)).otherwise(lit(0L))
    }.reduceOption((a, b) => a.bitwiseXOR(b)).getOrElse(lit(0L))
    cur = cur.withColumn("__tc", tConst)
    for (i <- 0 until n)
      cur = cur.withColumn(s"__t$i", x(i).bitwiseXOR(col("__tc")))
    // interleave transposed bits into d
    val d = (for { lvl <- 0 until bits; i <- 0 until n } yield
      shiftleft(shiftrightunsigned(x(i), lvl).bitwiseAND(lit(1L)),
        lvl * n + (n - 1 - i))).reduce(_ + _)
    cur.withColumn(out, d)
      .drop("__tc").drop((0 until n).map(i => s"__t$i"): _*)
  }

  /** [[hilbertValueND]] behind a lineage barrier: compute the Skilling
    * walk, then pin, so that downstream predicates on `out` (or on any
    * column) CANNOT be pushed back through the walk stages — the
    * exponential-predicate optimizer OOM documented on
    * [[hilbertValueND]] is unreachable through this entry point.
    *
    * The barrier is [[Materialize.pin]] (deployment-selected local or
    * reliable checkpoint). Under [[Materialize.Off]] the gate still
    * erects a LAZY local checkpoint rather than degrading to pure
    * lineage: an un-pinned gate would not be a gate, and the lazy form
    * materializes nothing until the first action while already
    * truncating the logical plan at LogicalRDD, which is what stops
    * the pushdown rewrite. For n = 2 the walk routes through the
    * canonical [[hilbertValue2D]] orientation (same values as the
    * standalone 2-D API). */
  def hilbertGate(df: DataFrame, cells: Seq[Column], bits: Int,
                  out: String): DataFrame = {
    val walked =
      if (cells.length == 2) hilbertValue2D(df, cells(0), cells(1), bits, out)
      else hilbertValueND(df, cells, bits, out)
    // pinGate, not a direct localCheckpoint: under Off the gate still
    // erects the lazy barrier, but its blocks register with any active
    // withBatchRelease scope so a standing query's per-batch sweep can
    // release them (a raw localCheckpoint here escaped the sweep —
    // one leaked block set per micro-batch)
    Materialize.pinGate(walked)
  }

  /** [[hilbertValueND]] as a chain of SQL CTEs — the q199 oracle
    * builder. `src` must expose cell columns `x0..x{n-1}` (payload
    * rides along via `carry`); emits the final distance as `hd.d`. */
  def hilbertNdSqlCtes(src: String, n: Int, bits: Int,
                       carry: Seq[String] = Seq.empty): String = {
    val keep = if (carry.isEmpty) "" else carry.mkString(", ", ", ", "")
    val xs = (0 until n).map(i => s"x$i")
    val ctes = scala.collection.mutable.ArrayBuffer[String]()
    var prev = src
    var step = 0
    def emit(selects: Seq[String]): Unit = {
      step += 1
      ctes += s"hs$step AS (SELECT ${selects.mkString(", ")}$keep FROM $prev)"
      prev = s"hs$step"
    }
    for (lvl <- bits - 1 to 1 by -1; i <- 0 until n) {
      val q = 1L << lvl
      val p = q - 1L
      if (i == 0) {
        emit(s"CASE WHEN (x0 & $q) > 0 THEN xor(x0, $p) ELSE x0 END AS x0"
          +: xs.drop(1).map(c => s"$c"))
      } else {
        val t = s"(xor(x0, x$i) & $p)"
        emit(xs.map {
          case "x0" => s"CASE WHEN (x$i & $q) > 0 THEN xor(x0, $p) " +
            s"ELSE xor(x0, $t) END AS x0"
          case c if c == s"x$i" => s"CASE WHEN (x$i & $q) > 0 THEN x$i " +
            s"ELSE xor(x$i, $t) END AS x$i"
          case c => c
        })
      }
    }
    // Gray encode, one CTE per dimension (sequential dependency)
    for (i <- 1 until n)
      emit(xs.map { case c if c == s"x$i" => s"xor(x$i, x${i - 1}) AS x$i"
        case c => c })
    // reflection constant + apply
    val tExpr = (bits - 1 to 1 by -1).map { lvl =>
      val q = 1L << lvl
      s"(CASE WHEN (x${n - 1} & $q) > 0 THEN ${q - 1L} ELSE 0 END)"
    }.reduceOption((a, b) => s"xor($a, $b)").getOrElse("0")
    emit(xs.map(c => s"$c") :+ s"CAST($tExpr AS BIGINT) AS tc")
    step += 1
    ctes += s"hs$step AS (SELECT ${xs.map(c => s"xor($c, tc) AS $c")
      .mkString(", ")}$keep FROM $prev)"
    prev = s"hs$step"
    val dExpr = (for { lvl <- 0 until bits; i <- 0 until n } yield
      s"(((x$i >> $lvl) & 1) << ${lvl * n + (n - 1 - i)})").mkString(" + ")
    ctes += s"hd AS (SELECT CAST($dExpr AS BIGINT) AS d$keep FROM $prev)"
    ctes.mkString(",\n")
  }

  /** [[clusterByHilbert]]'s N-dimensional twin: one output partition
    * per top-bits bucket of the Skilling Hilbert distance, rows sorted
    * by full d within each. */
  def clusterByHilbertND(df: DataFrame, dims: Seq[(Column, Double, Double)],
                         bits: Int, bucketBits: Int): DataFrame = {
    val staged = hilbertValueND(df,
      dims.map { case (c, lo, hi) => zCell(c, lo, hi, bits) }, bits, "__h")
    staged
      .repartition(1 << bucketBits,
        zBucket(col("__h"), dims.length * bits, bucketBits))
      .sortWithinPartitions("__h")
      .drop("__h")
  }

  /** [[clusterByZOrder]]'s Hilbert twin: one output partition per
    * top-bits bucket of the Hilbert distance, rows sorted by full d
    * within each. 2-D only (the dominant layout case; higher-D goes
    * through [[hilbertValueND]]'s Skilling walk). */
  def clusterByHilbert(df: DataFrame,
                       xDim: (Column, Double, Double),
                       yDim: (Column, Double, Double),
                       bits: Int, bucketBits: Int): DataFrame = {
    val staged = hilbertValue2D(df,
      zCell(xDim._1, xDim._2, xDim._3, bits),
      zCell(yDim._1, yDim._2, yDim._3, bits), bits, "__h")
    staged
      .repartition(1 << bucketBits, zBucket(col("__h"), 2 * bits, bucketBits))
      .sortWithinPartitions("__h")
      .drop("__h")
  }
}
