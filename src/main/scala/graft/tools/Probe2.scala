package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    li.cache()  // no: measure uncached first
    li.unpersist()
    def time(name: String)(f: => Unit): Unit = {
      for (i <- 1 to 3) { val t0 = System.nanoTime(); f
        println(s"$name run $i: ${(System.nanoTime()-t0)/1e9}") }
    }
    time("scan_count") { li.count() }
    time("double_agg") {
      li.groupBy("l_returnflag","l_linestatus")
        .agg(sum("l_quantity"), sum("l_extendedprice"), avg("l_discount"))
        .write.format("noop").mode("overwrite").save() }
    time("decimal_agg") {
      li.groupBy("l_returnflag","l_linestatus")
        .agg(sum(col("l_quantity").cast("decimal(30,6)")),
             sum(col("l_extendedprice").cast("decimal(30,6)")))
        .write.format("noop").mode("overwrite").save() }
    time("decimal18_agg") {
      li.groupBy("l_returnflag","l_linestatus")
        .agg(sum(col("l_quantity").cast("decimal(18,6)")),
             sum(col("l_extendedprice").cast("decimal(18,6)")))
        .write.format("noop").mode("overwrite").save() }
    time("repart_decimal_agg") {
      li.repartition(32).groupBy("l_returnflag","l_linestatus")
        .agg(sum(col("l_quantity").cast("decimal(30,6)")),
             sum(col("l_extendedprice").cast("decimal(30,6)")))
        .write.format("noop").mode("overwrite").save() }
    time("long_fixedpoint_agg") {
      li.groupBy("l_returnflag","l_linestatus")
        .agg(sum(round(col("l_quantity")*1e6).cast("long")),
             sum(round(col("l_extendedprice")*1e6).cast("long")))
        .write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
