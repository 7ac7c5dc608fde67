package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations, audited in ONE aggregation
  * pass — the pre-flight gate a 100 TB ingest runs before (not after)
  * an expensive pipeline: every rule folds into the same `df.agg(...)`,
  * so the corpus is scanned exactly once regardless of how many rules
  * are declared, partials combine map-side, and the result is a tiny
  * long-format frame (rule, observed, threshold, pass) the driver can
  * assert on. No rule can trigger its own job.
  *
  * Metrics are plain SQL aggregates (fraction-of-rows shapes), so a
  * DuckDB oracle replays the whole audit (q155). `uniqueRate` uses
  * exact count(distinct) — it shares the scan via Catalyst's Expand
  * rewrite; at extreme cardinality swap in approx_count_distinct.
  */
object Expectations {

  /** One rule: `observed` must satisfy `op` (">=", "<=", "==") against
    * `threshold`. `observed` must be an aggregate Column. */
  final case class Expectation(name: String, observed: Column,
                               threshold: Double, op: String = ">=") {
    require(Set(">=", "<=", "==").contains(op), s"unknown op: $op")
  }

  /** fraction of rows with a non-null value. */
  def notNullRate(c: Column): Column =
    avg(when(c.isNotNull, 1.0).otherwise(0.0))

  /** fraction of rows whose value matches `pattern` (nulls don't match). */
  def matchRate(c: Column, pattern: String): Column =
    avg(when(c.rlike(pattern), 1.0).otherwise(0.0))

  /** fraction of rows with lo <= value <= hi (nulls fail). */
  def betweenRate(c: Column, lo: Double, hi: Double): Column =
    avg(when(c.between(lo, hi), 1.0).otherwise(0.0))

  /** fraction of rows whose value is in the allowed set (nulls fail). */
  def inSetRate(c: Column, allowed: Seq[String]): Column =
    avg(when(c.isInCollection(allowed), 1.0).otherwise(0.0))

  /** distinct values / non-null rows — 1.0 means the column is a key. */
  def uniqueRate(c: Column): Column =
    countDistinct(c).cast("double") / count(c)

  /** Run every expectation in one aggregation pass. Returns one row per
    * rule: (rule, observed, threshold, pass), in declaration order. */
  def audit(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    val aggs = rules.map(r => r.observed.cast("double").as(r.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.map { r =>
      val obs = col(r.name)
      val pass = r.op match {
        case ">=" => obs >= r.threshold
        case "<=" => obs <= r.threshold
        case "==" => obs === r.threshold
      }
      struct(lit(r.name).as("rule"), obs.as("observed"),
        lit(r.threshold).as("threshold"), pass.as("pass"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }
}
