package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Whole-frame scalar statistics (reference:
  * src/DataFrame/Operations/Statistics.hs:84-380 and kernels in
  * src/DataFrame/Internal/Statistics.hs:17-274).
  *
  * Each helper is a Column aggregate, so callers can batch several into one
  * `df.agg(...)` pass — at 100 TB, "one scan per statistic" is the
  * difference between one job and ten.
  */
object Stats {

  def mean(c: Column): Column = F.avg(c)
  def median(c: Column): Column = F.median(c)
  def variance(c: Column): Column = F.var_samp(c)
  def stddev(c: Column): Column = F.stddev_samp(c)
  def percentile(c: Column, p: Double): Column = F.percentile(c, F.lit(p))
  def interQuartileRange(c: Column): Column =
    F.percentile(c, F.lit(0.75)) - F.percentile(c, F.lit(0.25))
  def correlation(a: Column, b: Column): Column = F.corr(a, b)
  /** mean squared error (Internal/Statistics.hs:201-207). */
  def meanSquaredError(a: Column, b: Column): Column = F.avg(F.pow(a - b, 2))

  /** Spark's builtin skewness = g1 = m3 / m2^1.5 (population form). */
  def skewness(c: Column): Column = F.skewness(c)

  /** The reference's estimator: sqrt(n-1) * m3 / sqrt(m2'^3) over central
    * sums (Internal/Statistics.hs:89-111) — kept for oracle parity where
    * the exact estimator matters. Built from raw moments so it runs as one
    * declarative aggregate (no second pass for the mean).
    */
  def skewnessRef(c: Column): Column = {
    val n = F.count(F.when(c.isNotNull, 1)).cast("double")
    val s1 = F.sum(c)
    val s2 = F.sum(c * c)
    val s3 = F.sum(c * c * c)
    val m = s1 / n
    val m2 = s2 / n - m * m                       // central sum² / n
    val m3 = s3 / n - F.lit(3.0) * m * (s2 / n) + F.lit(2.0) * m * m * m
    F.sqrt(n - 1) * m3 / F.sqrt(m2 * m2 * m2)
  }

  /** Per-group box-plot statistics — the data side of the reference's
    * `plotBoxPlots` (Display/Terminal/Plot.hs): five-number summary,
    * IQR, Tukey whiskers (q1/q3 ∓ 1.5·IQR) and the outlier count.
    * Two aggregation passes over the grouped values (quartiles, then
    * outlier counts against the broadcast quartiles) — never a
    * per-group collect. */
  def boxPlotStats(df: DataFrame, value: String, by: String,
                   whiskerScale: Int = -1): DataFrame = {
    val v = F.col(value).cast("double")
    def rnd(c: Column) =
      if (whiskerScale >= 0) F.round(c, whiskerScale) else c
    val q = df.groupBy(by).agg(
      F.min(v).as("v_min"),
      F.percentile(v, F.lit(0.25)).as("q1"),
      F.median(v).as("v_median"),
      F.percentile(v, F.lit(0.75)).as("q3"),
      F.max(v).as("v_max"),
      F.count(v).as("n"))
      .withColumn("iqr", F.col("q3") - F.col("q1"))
      // whiskerScale >= 0 rounds the whiskers BEFORE outlier counting:
      // q1 ∓ 1.5·iqr is a multiply-add chain whose last ulp can differ
      // across engines (FMA contraction) — rounding makes the outlier
      // threshold engine-portable for oracle comparison
      .withColumn("lo_whisker", rnd(F.col("q1") - F.col("iqr") * 1.5))
      .withColumn("hi_whisker", rnd(F.col("q3") + F.col("iqr") * 1.5))
    val outliers = df.select(F.col(by), v.as("v"))
      .join(F.broadcast(q.select(F.col(by), F.col("lo_whisker").as("lw"),
        F.col("hi_whisker").as("hw"))), Seq(by))
      .groupBy(by)
      .agg(F.sum(F.when(F.col("v") < F.col("lw") ||
        F.col("v") > F.col("hw"), 1L).otherwise(0L)).as("n_outliers"))
    q.join(outliers, Seq(by))
      .select(F.col(by), F.col("v_min"), F.col("q1"), F.col("v_median"),
        F.col("q3"), F.col("v_max"), F.col("iqr"),
        F.col("lo_whisker"), F.col("hi_whisker"), F.col("n"),
        F.col("n_outliers"))
  }

  /** Pairwise Pearson correlation over `cols` — the data side of
    * `plotCorrelationMatrix`. ONE aggregation pass computes every
    * pair's decimal-exact moment sums (order-independent — q24's
    * proven corr recipe); the tiny pair list assembles driver-side.
    * round(12) per the multiply-subtract fp policy. */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "correlationMatrix: need at least 2 columns")
    val spark = df.sparkSession
    def s1(c: String) = graft.expr.AggregateExpressions
      .dsumScaled(F.col(c).cast("double"), 6)
    def s2(a: String, b: String) = graft.expr.AggregateExpressions
      .dsumScaled(F.col(a).cast("double") * F.col(b).cast("double"), 4)
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j }
      yield (cols(i), cols(j))
    val aggs = cols.map(c => s1(c).as(s"s_$c")) ++
      cols.map(c => s2(c, c).as(s"ss_$c")) ++
      pairs.map { case (a, b) => s2(a, b).as(s"sp_${a}_$b") } :+
      F.count(F.lit(1)).cast("double").as("n")
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    def g(name: String) = r.getDouble(r.fieldIndex(name))
    val n = g("n")
    val rows = pairs.map { case (a, b) =>
      val cov = g(s"sp_${a}_$b") - g(s"s_$a") * g(s"s_$b") / n
      val va = g(s"ss_$a") - g(s"s_$a") * g(s"s_$a") / n
      val vb = g(s"ss_$b") - g(s"s_$b") * g(s"s_$b") / n
      (a, b, BigDecimal(cov / math.sqrt(va * vb))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    import spark.implicits._
    rows.toDF("col_a", "col_b", "corr")
  }

  /** Binned 2-D density — the data side of `plotHeatmap`: (bx, by,
    * count) over an equi-width grid, same binning arithmetic as
    * [[mutualInformationBinnedDF]] (bounds ride a broadcast). */
  def heatmapBins(df: DataFrame, a: String, b: String,
                  bins: Int = 10): DataFrame = {
    val src = df.select(F.col(a).cast("double").as("va"),
      F.col(b).cast("double").as("vb"))
      .filter(F.col("va").isNotNull && F.col("vb").isNotNull)
    val bounds = src.agg(
      F.min("va").as("amin"), F.max("va").as("amax"),
      F.min("vb").as("bmin"), F.max("vb").as("bmax"))
    def bin(c: Column, lo: Column, hi: Column): Column =
      F.least(F.floor((c - lo) / ((hi - lo) / bins + F.lit(1e-300))),
        F.lit(bins - 1L)).cast("long")
    src.crossJoin(F.broadcast(bounds))
      .select(bin(F.col("va"), F.col("amin"), F.col("amax")).as("bx"),
        bin(F.col("vb"), F.col("bmin"), F.col("bmax")).as("by"))
      .groupBy("bx", "by").agg(F.count(F.lit(1)).as("n"))
      .orderBy("bx", "by")
  }

  /** data side of `plotScatter` / `plotScatterBy`
    * (Display/Terminal/Plot.hs:66-92): (x, y[, group]) as doubles with
    * null points dropped. `samplePct` < 100 thins points with a
    * content-derived hash BEFORE any collect — deterministic across
    * reruns/partitionings, and the only sane way to plot a corpus-scale
    * table (the renderer needs thousands of points, not 10¹²). */
  def scatterData(df: DataFrame, x: String, y: String,
                  group: Option[String] = None,
                  samplePct: Double = 100.0): DataFrame = {
    require(samplePct > 0 && samplePct <= 100, "samplePct in (0, 100]")
    val base = df.select(F.col(x).cast("double").as("x") +:
        F.col(y).cast("double").as("y") +:
        group.map(g => F.col(g).as("group")).toSeq: _*)
      .filter(F.col("x").isNotNull && F.col("y").isNotNull)
    if (samplePct >= 100.0) base
    else base.filter(
      F.pmod(F.xxhash64(F.col("x"), F.col("y")), F.lit(10000L)) <
        // floor at 1: samplePct < 0.005 would otherwise round the keep
        // threshold to 0 and silently drop every point
        F.lit(math.max(1L, math.round(samplePct * 100))))
  }

  /** data side of `plotLines` / `plotStackedBars`
    * (Display/Terminal/Plot.hs:94-104,117-134): the y columns in long
    * (x, series, value) format ordered by x — one unpivot Expand in the
    * scan stage, the shape any multi-series renderer consumes. */
  def linesData(df: DataFrame, x: String, ys: Seq[String]): DataFrame = {
    require(ys.nonEmpty, "linesData: need at least one y column")
    df.select(F.col(x) +: ys.map(c => F.col(c).cast("double").as(c)): _*)
      .unpivot(Array(F.col(x)), ys.map(F.col).toArray, "series", "value")
      .orderBy(F.col(x), F.col("series"))
  }

  /** driver-side ASCII density grid of [[heatmapBins]] (bounded: ≤
    * bins² rows collect); x right, y up. */
  def asciiHeatmap(df: DataFrame, a: String, b: String,
                   bins: Int = 10): String = {
    val cells = heatmapBins(df, a, b, bins).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getLong(2))
      .toMap
    if (cells.isEmpty) return "(empty)"
    val maxN = cells.values.max.toDouble
    val shades = " .:-=+*#%@"
    (bins - 1 to 0 by -1).map { y =>
      (0 until bins).map { x =>
        val n = cells.getOrElse((x, y), 0L)
        shades(math.min(shades.length - 1,
          math.ceil(n / maxN * (shades.length - 1)).toInt))
      }.mkString
    }.mkString("\n")
  }

  /** [[mutualInformationBinned]] as a one-row DataFrame with the
    * engine-portable fp policy (each log term rounded to 10 dp, then a
    * decimal-exact order-independent sum) — the oracle-checkable
    * formulation (q77). Fully lazy: the bin bounds ride a broadcast
    * crossJoin instead of a driver collect, so this composes into
    * larger plans and scales like any aggregate. */
  def mutualInformationBinnedDF(df: DataFrame, a: String, b: String,
                                bins: Int = 10): DataFrame = {
    val src = df.select(F.col(a).cast("double").as("va"),
      F.col(b).cast("double").as("vb"))
    val bounds = src.agg(
      F.min("va").as("amin"), F.max("va").as("amax"),
      F.min("vb").as("bmin"), F.max("vb").as("bmax"))
    def bin(c: Column, lo: Column, hi: Column): Column =
      F.least(F.floor((c - lo) / ((hi - lo) / bins + F.lit(1e-300))),
        F.lit(bins - 1L)).cast("long")
    val joint = src.crossJoin(F.broadcast(bounds))
      .select(bin(F.col("va"), F.col("amin"), F.col("amax")).as("bx"),
        bin(F.col("vb"), F.col("bmin"), F.col("bmax")).as("by"))
      .groupBy("bx", "by").agg(F.count(F.lit(1)).as("cnt"))
    val total = joint.agg(F.sum("cnt").cast("double").as("total"))
    val px = joint.groupBy("bx").agg(F.sum("cnt").cast("double").as("cx"))
    val py = joint.groupBy("by").agg(F.sum("cnt").cast("double").as("cy"))
    val term = (F.col("cnt").cast("double") / F.col("total")) *
      F.log((F.col("cnt").cast("double") * F.col("total")) /
        (F.col("cx") * F.col("cy")))
    joint.join(px, "bx").join(py, "by").crossJoin(F.broadcast(total))
      .select(F.round(term, 10).cast("decimal(18,10)").as("t"))
      .agg(F.sum("t").cast("double").as("mi"))
  }

  /** Binned mutual information between two numeric columns
    * (Internal/Statistics.hs:209-274): equi-width bin both columns, then
    * MI = Σ p(x,y) ln(p(x,y) / (p(x)p(y))). Two shuffles over binned keys;
    * all marginals derived from the joint histogram (single scan).
    */
  def mutualInformationBinned(df: DataFrame, a: String, b: String,
                              bins: Int = 10): Double = {
    val bounds = df.agg(
      F.min(a).cast("double"), F.max(a).cast("double"),
      F.min(b).cast("double"), F.max(b).cast("double")).collect()(0)
    val (aMin, aMax) = (bounds.getDouble(0), bounds.getDouble(1))
    val (bMin, bMax) = (bounds.getDouble(2), bounds.getDouble(3))
    def bin(c: Column, lo: Double, hi: Double): Column =
      F.least(F.floor((c - lo) / F.lit((hi - lo) / bins + 1e-300)),
        F.lit(bins - 1L))
    val joint = df.select(bin(F.col(a), aMin, aMax).as("bx"),
        bin(F.col(b), bMin, bMax).as("by"))
      .groupBy("bx", "by").count()
      .cache()
    val total = joint.agg(F.sum("count")).collect()(0).getLong(0).toDouble
    val px = joint.groupBy("bx").agg(F.sum("count").as("cx"))
    val py = joint.groupBy("by").agg(F.sum("count").as("cy"))
    val mi = joint.join(px, "bx").join(py, "by")
      .select(F.sum(
        (F.col("count") / total) *
          F.log((F.col("count") * total) / (F.col("cx") * F.col("cy")))))
      .collect()(0).getDouble(0)
    joint.unpersist()
    mi
  }

  /** Exact WEIGHTED percentiles per group (public Type-1 weighted
    * quantile — "the value below which fraction p of the total WEIGHT
    * falls"; with weight = token count this answers "the quality score
    * covering half the TOKENS", which is what a token-budgeted corpus
    * decision actually needs — an unweighted doc percentile
    * over-counts short documents).
    *
    * Definition: per group, aggregate weight by distinct value, order
    * by value, and report the smallest value whose cumulative weight
    * reaches p·W. No interpolation — the answer is always an observed
    * value (Type 1), which keeps the result exact and engine-portable.
    *
    * Determinism/portability: weights quantize to DECIMAL(30,6) at
    * entry, so the cumulative and total sums are EXACT and associative
    * (no fp reorder drift), and each threshold p·W is a
    * decimal×decimal product — both engines compare identical exact
    * rationals, so a cumulative weight landing exactly ON a threshold
    * tie-breaks identically.
    *
    * Scale shape: one (group, value) hash aggregate (map-side
    * combine) collapses the corpus to distinct values per group; the
    * cumulative sum is a window partitioned by GROUP over that
    * COLLAPSED frame (one domain's distinct values on one executor —
    * spillable, never corpus-global; the capPerGroup argument); the
    * p-fan-out explodes a constant literal array. Rows with null
    * value, null group, or null/non-positive weight drop. Returns (group, p, wpct),
    * one row per group × requested p. */
  def weightedPercentiles(df: DataFrame, group: String, value: Column,
                          weight: Column, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty, "weightedPercentiles: need at least one p")
    require(ps.forall(p => p > 0.0 && p <= 1.0),
      "weightedPercentiles: every p must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    // DECIMAL(30,6): 24 integer digits of headroom — a weight >= 1e12
    // would overflow (18,6) to null and be silently conflated with the
    // documented null/non-positive drop. Null GROUPS drop explicitly
    // (declared, not an accident of a later equi-join).
    val wv = df.select(F.col(group).as("__g"), value.as("__v"),
        weight.cast("decimal(30,6)").as("__w"))
      .filter(F.col("__g").isNotNull && F.col("__v").isNotNull &&
        F.col("__w").isNotNull && F.col("__w") > 0)
      .groupBy("__g", "__v").agg(F.sum(F.col("__w")).as("__w"))
    val tot = wv.groupBy("__g").agg(F.sum(F.col("__w")).as("__tw"))
    val win = Window.partitionBy("__g").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = wv.withColumn("__cw", F.sum(F.col("__w")).over(win))
      .join(F.broadcast(tot), Seq("__g"))
    val pArr = F.array(ps.map(p => F.struct(
      F.lit(p).as("p"),
      F.lit(java.math.BigDecimal.valueOf(p)).as("pd"))): _*)
    cum.select(F.col("__g"), F.col("__v"), F.col("__cw"), F.col("__tw"),
        F.explode(pArr).as("__ps"))
      .filter(F.col("__cw") >= F.col("__ps.pd") * F.col("__tw"))
      .groupBy(F.col("__g"), F.col("__ps.p").as("p"))
      .agg(F.min(F.col("__v")).as("wpct"))
      .select(F.col("__g").as(group), F.col("p"), F.col("wpct"))
  }

  /** Per-group winsorization: clip `value` into its group's exact
    * [lo, hi] percentile band (public method — the standard
    * feature-preprocessing tail clamp; pairs with [[robustZOutliers]],
    * which FLAGS tails where this CLAMPS them). One grouped
    * exact-percentile aggregate broadcast back (the zScore pattern, no
    * global window), then a pure scan-stage least/greatest. Percentile
    * interpolation is the q25-proven Spark ≡ DuckDB quantile_cont
    * identity, and least/greatest of identical doubles is exact, so
    * the clipped column replays bit-identically (q179). Appends
    * `out`. */
  def winsorize(df: DataFrame, group: String, value: Column,
                lo: Double = 0.05, hi: Double = 0.95,
                out: String = "winsorized"): DataFrame = {
    require(lo >= 0.0 && hi <= 1.0 && lo < hi,
      "winsorize: need 0 <= lo < hi <= 1")
    val v = value.cast("double")
    val qs = df.groupBy(F.col(group)).agg(
      F.percentile(v, F.lit(lo)).as("__wlo"),
      F.percentile(v, F.lit(hi)).as("__whi"))
    // LEFT join + coalesce: an inner join would silently DROP rows
    // whose group is null (equi-joins never match null keys) from an
    // append-a-column API; null-group rows instead pass through
    // unclamped — no band is defined for them
    df.join(F.broadcast(qs), Seq(group), "left")
      .withColumn(out, F.least(F.greatest(v, F.coalesce(F.col("__wlo"), v)),
        F.coalesce(F.col("__whi"), v)))
      .drop("__wlo", "__whi")
  }

  /** Robust per-row outlier score: the median/MAD z-score
    *   rz = 0.6745 · (x − median_g) / MAD_g,
    * MAD_g = median(|x − median_g|) (public method — Iglewicz & Hoaglin's
    * modified z-score; the robust alternative to [[graft.api.Frame]]'s
    * mean/stddev zScore, immune to the outliers it is hunting: one
    * 10 GB document shifts a mean but not a median). |rz| > cutoff
    * (default 3.5, the standard recommendation) flags the row.
    *
    * Scale shape: two grouped EXACT-median aggregates (groups-sized
    * results) broadcast back — the zScore agg-broadcast pattern, no
    * global window, the corpus streams through the final scan once
    * per pass. A constant group (MAD = 0) yields null rz and false
    * flag rather than ±inf. rz = 0.6745 · round((x−med)/MAD, 6) — the
    * ratio quantizes (tie-free for real-data MADs), the constant
    * multiplies afterwards; see the inline note for why the reverse
    * order is not engine-portable. Appends (rz, is_outlier). */
  def robustZOutliers(df: DataFrame, group: String, value: Column,
                      cutoff: Double = 3.5): DataFrame = {
    val v = value.cast("double")
    val med = df.groupBy(F.col(group)).agg(F.median(v).as("__med"))
    val mad = df.join(F.broadcast(med), Seq(group))
      .groupBy(F.col(group))
      .agg(F.median(F.abs(v - F.col("__med"))).as("__mad"))
    // Quantization order matters for engine portability: rounding
    // 0.6745·(x−med)/MAD at 6 dp hits EXACT decimal ties — with
    // integer data med/MAD are quarter-integers, and 1349·d/(2000·m)
    // lands on K.5×10⁻⁶ rationals (120 of 500 k rows at the sf1
    // probe), where Java 17's non-minimal double repr (Spark's
    // BigDecimal path) and Ryu-style reprs (DuckDB) round OPPOSITE
    // ways. The bare ratio d/m cannot tie at 6 dp unless MAD ≥ 5⁶/4
    // (the reduced denominator must carry 5⁶ — impossible for
    // real-data MADs), so: round the RATIO at 6 dp (cross-engine-safe
    // by that margin argument), THEN multiply by the constant — a
    // deterministic IEEE product both engines compute bit-identically,
    // with no further rounding.
    // LEFT joins: null-group rows would vanish under an inner equi-join
    // (null keys never match) — they keep instead, with null rz and a
    // false flag (no group statistics are defined for them)
    df.join(F.broadcast(med), Seq(group), "left")
      .join(F.broadcast(mad), Seq(group), "left")
      .withColumn("rz", F.when(F.col("__mad") === 0, F.lit(null).cast("double"))
        .otherwise(F.lit(0.6745) *
          F.round((v - F.col("__med")) / F.col("__mad"), 6)))
      .withColumn("is_outlier", F.coalesce(F.abs(F.col("rz")) > cutoff, F.lit(false)))
      .drop("__med", "__mad")
  }
}
