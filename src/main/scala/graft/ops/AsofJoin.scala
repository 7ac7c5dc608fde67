package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join — the feature-store primitive Spark has no
  * native operator for: attach to every left row the most recent right
  * row with the same key and `rightTs <= leftTs` (backward direction,
  * ties included — the same semantics as DuckDB's ASOF JOIN, which is
  * the oracle for q61).
  *
  * Spark-first plan shape: instead of a per-row range probe (a
  * BroadcastNestedLoop/theta join — quadratic blowup), tag and UNION the
  * two sides, then carry the right-side values forward with
  * `last(value, ignoreNulls) OVER (PARTITION BY key ORDER BY ts, side)`
  * and keep only left rows. Exactly ONE shuffle on the key, a
  * per-key-partitioned window (never a global one), and state linear in
  * the partition — the shape that survives a 100 TB event stream joined
  * to a slowly-changing dimension. Right rows sort BEFORE left rows at
  * equal timestamps, so ties attach (rightTs <= leftTs, not <).
  *
  * Rows with a null timestamp on either side are dropped (no "as of
  * never"); duplicate right rows per (key, ts) should be pre-deduped by
  * the caller to make the attached value deterministic.
  *
  * Value columns are carried as ONE struct per right row (a struct with
  * all-null fields is still non-null), so `last(_, ignoreNulls)` picks
  * the most recent right ROW — a legitimately-NULL value on the matched
  * row stays NULL instead of being skipped for an older non-null one
  * (DuckDB ASOF JOIN semantics, which the q61 oracle checks).
  */
object AsofJoin {

  private val Side = "__graft_asof_side"
  private val Payload = "__graft_asof_payload"

  /** backward as-of join; `valueCols` are the right-side columns to
    * attach (null where no right row precedes the left row). */
  def asofJoinBackward(left: DataFrame, right: DataFrame,
                       key: String, ts: String,
                       valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "asofJoinBackward: no value columns")
    val leftCols = left.columns.toSeq
    require(valueCols.forall(right.columns.contains),
      "asofJoinBackward: valueCols must exist on the right side")
    require(!valueCols.exists(leftCols.contains),
      "asofJoinBackward: valueCols clash with left-side columns")

    val lTagged = left.filter(col(ts).isNotNull).withColumn(Side, lit(1))
    val rTagged = right.filter(col(ts).isNotNull)
      .select(col(key), col(ts),
        struct(valueCols.map(col): _*).as(Payload))
      .withColumn(Side, lit(0))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)

    val w = Window.partitionBy(key).orderBy(col(ts).asc, col(Side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn(Payload, last(col(Payload), ignoreNulls = true).over(w))
    carried.filter(col(Side) === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"$Payload.$c").as(c)): _*)
  }

  /** convenience: attach one right column under a new name. */
  def asofJoinBackward(left: DataFrame, right: DataFrame, key: String,
                       ts: String, valueCol: String, as: String): DataFrame =
    asofJoinBackward(left,
      right.withColumnRenamed(valueCol, as), key, ts, Seq(as))
}
