package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off A/B for the q146 JSON-extraction shape (VERDICT r9 item 6):
  * `from_json` is CodegenFallback in Spark, and q146 additionally parses
  * the payload a SECOND time for the missing-key probe. Candidates:
  *
  *   A (current): from_json("k BIGINT").k  +  get_json_object($.missing)
  *   B: get_json_object chain — $.k cast to BIGINT + $.missing
  *      (streaming Jackson path, no struct materialization; still one
  *      parse per extraction = two parses per row)
  *   C: json_tuple('k','missing') — ONE parse per row for both fields,
  *      k cast from string
  *
  * Same fresh-session noop-sink methodology as [[QBench]].
  */
object JsonAb {
  def main(args: Array[String]): Unit = {
    val iters = if (args.nonEmpty) args(0).toInt else 7
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    def aggOver(kc: Column, missc: Column): DataFrame =
      graft.Tables.events(spark, sfDir)
        .select(col("event_type"), kc.as("k"), missc.as("miss"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
          min(col("k")).as("k_min"), max(col("k")).as("k_max"),
          count(when(col("k").isNull, 1)).as("n_bad"),
          count(col("miss")).as("n_miss"))
        .orderBy("event_type")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "A_from_json" -> (() => aggOver(
        graft.api.functions.parseJson(col("props"), "k BIGINT").getField("k"),
        graft.api.functions.jsonGet(col("props"), "$.missing"))),
      "B_gjo_chain" -> (() => aggOver(
        get_json_object(col("props"), "$.k").cast("bigint"),
        get_json_object(col("props"), "$.missing"))),
      "C_json_tuple" -> (() => {
        val parsed = graft.Tables.events(spark, sfDir)
          .select(col("event_type"),
            json_tuple(col("props"), "k", "missing"))
          .toDF("event_type", "k_s", "miss")
        parsed.select(col("event_type"),
            col("k_s").cast("bigint").as("k"), col("miss"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
            min(col("k")).as("k_min"), max(col("k")).as("k_max"),
            count(when(col("k").isNull, 1)).as("n_bad"),
            count(col("miss")).as("n_miss"))
          .orderBy("event_type")
      }))

    // cross-variant result equality first — a fast path that changes the
    // hash is not a candidate
    val rows = variants.map { case (n, f) => n -> f().collect().toSeq }
    val ok = rows.forall(_._2 == rows.head._2)
    println(s"RESULTS_IDENTICAL=$ok")

    for ((name, f) <- variants) {
      f().write.format("noop").mode("overwrite").save() // warm-up
      val ts = Seq.fill(iters) {
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"JSONAB $name%s median=${ts(ts.length / 2)}%.3f " +
        f"min=${ts.head}%.3f max=${ts.last}%.3f iters=$iters%d")
    }
    spark.stop()
  }
}
