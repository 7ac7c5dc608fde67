package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel analysis: for an ordered sequence of step types, find per user
  * the greedy first-occurrence chain t1 < t2 < ... < tk (t_i = earliest
  * event of step i strictly after t_{i-1}). Greedy-first is exact for
  * the existence question "did the user complete steps in order" —
  * taking the earliest possible occurrence of each step never excludes
  * a later completion.
  *
  * Plan shape: one hash-aggregate per step over (events ⋈ carried
  * times) — k key-partitioned shuffle rounds for a k-step funnel, no
  * windows over whole users' histories, no per-user event lists in
  * memory. Scales with events/step, not with the longest user history.
  */
object Funnel {

  /** per-user step times: (user, t1..tk), t_i null where the chain
    * broke. */
  def funnelTimes(events: DataFrame, user: String, ts: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelTimes: no steps")
    val slim = events.select(col(user), col(ts), col(typeCol))
    var acc = slim.groupBy(user).agg(
      min(when(col(typeCol) === steps.head, col(ts))).as("t1"))
    for ((st, i) <- steps.tail.zipWithIndex) {
      val prev = s"t${i + 1}"; val cur = s"t${i + 2}"
      val carried = (1 to i + 1).map(j => max(col(s"t$j")).as(s"t$j"))
      val next = min(when(col(typeCol) === st && col(ts) > col(prev),
        col(ts))).as(cur)
      val aggs = carried :+ next
      acc = slim.join(acc, Seq(user))
        .groupBy(user).agg(aggs.head, aggs.tail: _*)
    }
    acc
  }

  /** one-row funnel summary: total users plus, per step, how many users
    * reached it in order. */
  def funnelCounts(events: DataFrame, user: String, ts: String,
                   typeCol: String, steps: Seq[String]): DataFrame = {
    val times = funnelTimes(events, user, ts, typeCol, steps)
    val aggs = count(lit(1)).as("n_users") +:
      steps.indices.map(i => count(col(s"t${i + 1}")).as(s"n_step${i + 1}"))
    times.agg(aggs.head, aggs.tail: _*)
  }
}
