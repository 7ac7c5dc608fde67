package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query A/B bench: `runMain graft.tools.QBench q46_simhash [iters]`.
  *
  * Same session config and noop-sink methodology as [[graft.Bench]], but
  * ONE query in a fresh session — the shared-session Bench run cannot
  * attribute a per-query delta (co-resident queries shift GC and codegen
  * cache state; the round-3 lesson). Use this before calling any
  * per-query number a regression or an improvement.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QBench <queryName> [iters]")
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 7
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // same hygiene as Bench: each run re-checkpoints, so a prior
      // iteration's localCheckpoint blocks are pure storage carryover
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      dt
    }
    once() // warm-up: codegen + JIT
    val ts = Seq.fill(iters)(once()).sorted
    val med = ts(ts.length / 2)
    println(f"""QBENCH {"query":"$name","median":$med%.3f,"min":${ts.head}%.3f,"max":${ts.last}%.3f,"iters":$iters,"sf":"$sfDir"}""")
    spark.stop()
  }
}
