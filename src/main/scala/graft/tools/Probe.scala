package graft.tools
import org.apache.spark.sql.SparkSession
/** scratch benchmarking/plan-inspection main (not part of the library API) */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    for (q <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sf).write.format("noop").mode("overwrite").save()
      println(s"$q run $i: ${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
