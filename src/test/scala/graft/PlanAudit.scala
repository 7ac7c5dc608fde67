package graft

/** One-off diagnostic (not a gate): for every registry query, count how
  * many times the physical plan scans the SAME parquet file (AQE off so
  * ReusedExchange is visible at planning time). Queries that read a
  * table twice on purpose (incremental splits, corpus-vs-benchmark
  * overlaps, self-joins) will show up — the output is for review, the
  * test always passes. */
class PlanAudit extends SparkSpec {
  test("audit: same-file scan counts per registry query") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val re = """file:[^\],]+\.parquet""".r
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        try {
          val plan = fn(spark, sfSmoke).queryExecution.executedPlan.toString
          val counts = plan.linesIterator.filter(_.contains("FileScan"))
            .flatMap(l => re.findFirstIn(l)).toSeq
            .groupBy(identity).view.mapValues(_.size)
            .filter(_._2 > 1).toMap
          if (counts.nonEmpty)
            info(s"$name: " + counts.map { case (f, n) =>
              s"${f.split('/').last} x$n" }.mkString(", "))
        } catch { case e: Throwable => info(s"$name: ERROR ${e.getMessage}") }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
