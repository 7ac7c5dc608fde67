package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Boolean-feature synthesis — a Spark-first slice of the reference's
  * Synthesis module (/root/reference/src/DataFrame/Synthesis.hs:
  * generateConditions 45-64 builds `p <= q` atoms over percentile
  * candidates and expands them with not/and/or; pickTopNBool +
  * f1FromCounts 214-237 score candidates by F1 against a binary
  * target; beamSearch 349+ keeps the best `beamWidth` per round).
  *
  * The distributed reformulation: every candidate predicate in a round
  * is ONE boolean Column, and the whole round scores in a SINGLE
  * aggregate pass — `sum(when(pred && target))` etc. for tp/fp/fn of
  * all candidates at once. A round over C candidates is one scan with
  * 3·C codegen'd counters, not C jobs; rows never leave the executors.
  * The beam (driver-side) holds only (expression, description, f1)
  * triples.
  *
  * Deterministic: exact-percentile thresholds, exact counts, ties
  * broken on the candidate's description string.
  */
object FeatureSynthesis {

  final case class Candidate(description: String, expr: Column, f1: Double)

  private def f1FromCounts(tp: Long, fp: Long, fn: Long): Double = {
    // reference f1FromCounts semantics (Synthesis.hs:228-237); the
    // no-positive-prediction / no-positive-truth case scores 0
    val precision = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
    val recall = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
    if (precision + recall == 0) 0.0
    else 2 * precision * recall / (precision + recall)
  }

  /** score all candidates in one aggregate pass. */
  private def scoreAll(df: DataFrame, target: Column,
                       cands: Seq[(String, Column)]): Seq[Candidate] = {
    if (cands.isEmpty) return Nil
    val aggs = cands.zipWithIndex.flatMap { case ((_, p), i) =>
      Seq(sum(when(p && target, 1L).otherwise(0L)).as(s"tp_$i"),
        sum(when(p && !target, 1L).otherwise(0L)).as(s"fp_$i"),
        sum(when(!p && target, 1L).otherwise(0L)).as(s"fn_$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cands.zipWithIndex.map { case ((desc, p), i) =>
      Candidate(desc, p, f1FromCounts(
        row.getLong(3 * i), row.getLong(3 * i + 1), row.getLong(3 * i + 2)))
    }
  }

  /** Fully-distributed atom scoring: every (feature, percentile
    * threshold) atom's tp/fp/fn and F1, as a DataFrame — no driver
    * loop at all (melt + broadcast threshold join + one grouped
    * aggregate), so the atom round scales to any corpus and is
    * oracle-checkable (q78). `synthesizeBoolean` keeps the beam
    * rounds; this is its first round as pure relational algebra. */
  def atomScores(df: DataFrame, target: Column, features: Seq[String],
                 percentiles: Seq[Int] = 10 to 90 by 10): DataFrame = {
    require(features.nonEmpty, "atomScores: no feature columns")
    val pcts = percentiles.map(_ / 100.0)
    val spark = df.sparkSession
    val src = df.select(features.map(c => col(c).cast("double").as(c)) :+
      target.cast("boolean").as("__t"): _*)
    val thrAggs = features.map(f => percentile(col(f), typedLit(pcts)).as(f))
    val thrRow = src.agg(thrAggs.head, thrAggs.tail: _*).head()
    val thrSeq = features.zipWithIndex.flatMap { case (f, i) =>
      thrRow.getSeq[Double](i).distinct.sorted.map(q => (f, q)) }
    import spark.implicits._
    val thrDf = thrSeq.toDF("feature", "thr")
    val melted = src.select(col("__t"),
      posexplode(array(features.map(col): _*)).as(Seq("__f", "__v")))
      .select(element_at(typedLit(features), col("__f") + 1).as("feature"),
        col("__v"), col("__t"))
    val counts = melted.join(broadcast(thrDf), Seq("feature"))
      .groupBy("feature", "thr")
      .agg(sum(when(col("__v") <= col("thr") && col("__t"), 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("__v") <= col("thr") && !col("__t"), 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("__v") > col("thr") && col("__t"), 1L)
          .otherwise(0L)).as("fn"))
    val p = when(col("tp") + col("fp") === 0, 0.0)
      .otherwise(col("tp").cast("double") / (col("tp") + col("fp")))
    val r = when(col("tp") + col("fn") === 0, 0.0)
      .otherwise(col("tp").cast("double") / (col("tp") + col("fn")))
    counts
      .withColumn("f1", round(when(p + r === 0.0, 0.0)
        .otherwise(lit(2.0) * p * r / (p + r)), 9))
      .orderBy(col("f1").desc, col("feature"), col("thr"))
  }

  /** Numeric expression synthesis — the reference's `fitRegression`
    * (Synthesis.hs:290-317): beam search over arithmetic expressions
    * scored by mean-squared error against a numeric target. Atoms are
    * the feature columns, the target mean, and the reference's
    * power-of-ten constants; expansion combines beam members with
    * atoms under + − × (division omitted: an unguarded /0 poisons MSE
    * and a guard changes semantics). Scoring batches every candidate
    * into ONE aggregate pass per round, like the boolean beam. */
  final case class NumCandidate(description: String, expr: Column, mse: Double)

  def synthesizeNumeric(df: DataFrame, target: Column,
                        features: Seq[String],
                        beamWidth: Int = 8, rounds: Int = 2): Seq[NumCandidate] = {
    require(features.nonEmpty, "synthesizeNumeric: no feature columns")
    require(beamWidth >= 1 && rounds >= 0)
    val src = df.select(features.map(c => col(c).cast("double").as(c)) :+
      target.cast("double").as("__t"): _*).cache()
    try {
      val t = col("__t")
      val tMean = src.agg(avg(t)).head().getDouble(0)
      val constants: Seq[(String, Column)] =
        (s"$tMean", lit(tMean)) +:
          (for (p <- Seq(10.0, 1.0, 0.1); i <- 1 to 3)
            yield { val v = math.pow(p, i); (s"$v", lit(v)) }).distinct
      val atoms: Seq[(String, Column)] =
        features.map(f => (f, col(f))) ++ constants

      def score(cands: Seq[(String, Column)]): Seq[NumCandidate] = {
        if (cands.isEmpty) return Nil
        val aggs = cands.zipWithIndex.map { case ((_, e), i) =>
          avg(pow(e - t, 2)).as(s"mse_$i") }
        val row = src.agg(aggs.head, aggs.tail: _*).head()
        cands.zipWithIndex.flatMap { case ((desc, e), i) =>
          if (row.isNullAt(i)) None
          else {
            val m = row.getDouble(i)
            if (m.isNaN || m.isInfinite) None
            else Some(NumCandidate(desc, e, m))
          }
        }
      }

      var beam = score(atoms).sortBy(c => (c.mse, c.description))
        .take(beamWidth)
      for (_ <- 1 to rounds) {
        val expanded = for {
          b <- beam
          (ad, ae) <- atoms
          cand <- Seq((s"(${b.description}) + ($ad)", b.expr + ae),
            (s"(${b.description}) - ($ad)", b.expr - ae),
            (s"(${b.description}) * ($ad)", b.expr * ae))
        } yield cand
        val seen = beam.map(_.description).toSet
        val fresh = expanded.filterNot(c => seen.contains(c._1))
        beam = (beam ++ score(fresh))
          .sortBy(c => (c.mse, c.description)).take(beamWidth)
      }
      beam
    } finally src.unpersist()
  }

  /** synthesize a boolean feature approximating binary `target` from
    * threshold atoms over `features`, expanded `rounds` times with
    * and/or/not combinations; returns the beam sorted best-first. */
  def synthesizeBoolean(df: DataFrame, target: Column,
                        features: Seq[String],
                        beamWidth: Int = 8, rounds: Int = 1,
                        percentiles: Seq[Int] = 10 to 90 by 10): Seq[Candidate] = {
    require(features.nonEmpty, "synthesizeBoolean: no feature columns")
    require(beamWidth >= 1 && rounds >= 0)
    val pcts = percentiles.map(_ / 100.0)
    val src = df.select(features.map(c => col(c).cast("double").as(c)) :+
      target.cast("boolean").as("__t"): _*).cache()
    try {
      val t = col("__t")
      // percentile atoms: f <= q_p  (generateConditions' `p .<= q` with
      // q drawn from the percentile literals)
      val thrAggs = features.map(f =>
        percentile(col(f), typedLit(pcts)).as(f))
      val thrRow = src.agg(thrAggs.head, thrAggs.tail: _*).head()
      val atoms: Seq[(String, Column)] = features.zipWithIndex.flatMap {
        case (f, i) =>
          thrRow.getSeq[Double](i).distinct.sorted.map(q =>
            (s"$f <= $q", col(f) <= lit(q)))
      }
      var beam = scoreAll(src, t, atoms)
        .sortBy(c => (-c.f1, c.description)).take(beamWidth)
      for (_ <- 1 to rounds) {
        val expanded = (for {
          (a, i) <- beam.zipWithIndex
          (b, j) <- beam.zipWithIndex if i < j
          cand <- Seq((s"(${a.description}) and (${b.description})",
              a.expr && b.expr),
            (s"(${a.description}) or (${b.description})", a.expr || b.expr))
        } yield cand) ++ beam.map(c => (s"not (${c.description})", !c.expr))
        val seen = beam.map(_.description).toSet
        val fresh = expanded.filterNot(c => seen.contains(c._1))
        beam = (beam ++ scoreAll(src, t, fresh))
          .sortBy(c => (-c.f1, c.description)).take(beamWidth)
      }
      beam
    } finally src.unpersist()
  }
}
