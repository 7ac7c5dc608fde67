package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed point-in-interval (range) join — `l.key = r.key AND l.ts
  * BETWEEN r.start AND r.end` — as a bucketed equi-join.
  *
  * Spark plans a raw inequality conjunct as a key equi-join whose
  * non-equi part is a post-join filter: every same-key pair
  * materializes before the range predicate prunes, which explodes on
  * hot keys. Here time is cut into `bucketWidthMicros` buckets: a point
  * lands in exactly ONE bucket, an interval explodes into the buckets
  * it covers, and the join is a pure equi-join on (key, bucket) with
  * the exact BETWEEN applied after. No dedup pass is needed — a
  * (point, interval) match can only meet in the point's single bucket.
  *
  * Pick `bucketWidthMicros` near the typical interval length: cost is
  * ~(interval/bucketWidth + 1) replicated interval rows, and bucket-join
  * fan-in of points per (key, bucket). `maxBucketsPerInterval` caps
  * pathological intervals by TRUNCATING them to the cap — an explicit,
  * documented recall trade-off like Dedup's skew guards; the default
  * (None) replicates faithfully.
  */
object RangeJoin {

  private val PB = "__graft_pbkt"
  private val IB = "__graft_ibkt"
  private val RK = "__graft_rkey"

  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
                      ts: String, start: String, end: String,
                      bucketWidthMicros: Long,
                      maxBucketsPerInterval: Option[Int] = None): DataFrame = {
    require(bucketWidthMicros > 0, "bucketWidthMicros must be positive")
    // cap <= 0 would make sequence(sB, sB+cap-1) DESCEND (Spark's
    // implicit -1 step), silently inflating candidates with
    // below-range buckets that only the exact post-filter prunes
    require(maxBucketsPerInterval.forall(_ >= 1),
      "pointInInterval: maxBucketsPerInterval must be >= 1")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet) - key
    require(shared.isEmpty,
      s"pointInInterval: points and intervals share non-key columns " +
        s"${shared.toSeq.sorted.mkString(", ")} — rename or drop one side " +
        "(only the key column may be shared)")
    val w = bucketWidthMicros
    val sB = (unix_micros(col(start)) / w).cast("long")
    val eB0 = (unix_micros(col(end)) / w).cast("long")
    val eB = maxBucketsPerInterval match {
      case Some(cap) => least(eB0, sB + (cap - 1))
      case None => eB0
    }
    val p = points.withColumn(PB, (unix_micros(col(ts)) / w).cast("long"))
    val iv = intervals
      .filter(col(start) <= col(end))
      .withColumn(IB, explode(sequence(sB, eB)))
      .withColumnRenamed(key, RK)
    p.join(iv, col(PB) === col(IB) && col(key) === col(RK), "inner")
      .filter(col(ts) >= col(start) && col(ts) <= col(end))
      .drop(PB, IB, RK)
  }

  /** Keyed INTERVAL-OVERLAP join — `l.key = r.key AND l.start <= r.end
    * AND r.start <= l.end` — as a bucketed equi-join (the
    * interval-interval completion of [[pointInInterval]]; same reason:
    * Spark would materialize every same-key pair and post-filter).
    *
    * Both sides explode into the buckets they cover; overlapping
    * intervals share at least one bucket (their intersection is
    * non-empty and every covered instant's bucket is covered by both),
    * so recall is FULL by construction — but unlike the point case a
    * pair can MEET IN SEVERAL buckets, so matches dedupe by the
    * caller-provided id columns before re-attaching payloads. The
    * exact overlap predicate verifies after the bucket join (no false
    * positives). `maxBucketsPerInterval` truncates pathological
    * intervals on BOTH sides — the explicit recall trade, as above.
    * Returns left payload + right payload (right key dropped). */
  def intervalOverlap(left: DataFrame, right: DataFrame, key: String,
                      leftId: String, rightId: String,
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      bucketWidthMicros: Long,
                      maxBucketsPerInterval: Option[Int] = None): DataFrame = {
    require(bucketWidthMicros > 0, "bucketWidthMicros must be positive")
    require(maxBucketsPerInterval.forall(_ >= 1), // see pointInInterval
      "intervalOverlap: maxBucketsPerInterval must be >= 1")
    val shared = left.columns.toSet.intersect(right.columns.toSet) - key
    require(shared.isEmpty,
      s"intervalOverlap: sides share non-key columns " +
        s"${shared.toSeq.sorted.mkString(", ")} — rename or drop one side")
    val w = bucketWidthMicros
    def buckets(s: String, e: String) = {
      val sB = (unix_micros(col(s)) / w).cast("long")
      val eB0 = (unix_micros(col(e)) / w).cast("long")
      val eB = maxBucketsPerInterval match {
        case Some(cap) => least(eB0, sB + (cap - 1))
        case None => eB0
      }
      sequence(sB, eB)
    }
    val l = left.filter(col(lStart) <= col(lEnd))
      .withColumn(PB, explode(buckets(lStart, lEnd)))
    val r = right.filter(col(rStart) <= col(rEnd))
      .withColumn(IB, explode(buckets(rStart, rEnd)))
      .withColumnRenamed(key, RK)
    val matched = l.join(r, col(PB) === col(IB) && col(key) === col(RK))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .select(col(leftId), col(rightId)).distinct()
    // re-attach payloads by id (narrow id-pair frame shuffles, payloads
    // join once each — the packTexts convention)
    matched
      .join(left, Seq(leftId))
      .join(right.withColumnRenamed(key, RK).drop(RK), Seq(rightId))
  }
}
