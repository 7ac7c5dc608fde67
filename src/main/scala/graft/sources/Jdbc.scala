package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — the reference's dataframe-persistent bridge
  * (dataframe-persistent/src/DataFrame/IO/Persistent.hs:17-39)
  * re-expressed over `spark.read.jdbc`.
  *
  * Scale posture: a plain table read is ONE partition (single JDBC
  * cursor); `fromPersistentPartitioned` splits the scan into
  * `numPartitions` range-bounded cursors on a numeric column so a
  * cluster pulls in parallel — always use it for anything bigger than a
  * dimension table.
  */
object Jdbc {

  def fromPersistent(spark: SparkSession, url: String, table: String,
                     props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** parallel range-partitioned read: WHERE partCol in [lower, upper)
    * split into numPartitions cursors. */
  def fromPersistentPartitioned(spark: SparkSession, url: String, table: String,
                                partCol: String, lower: Long, upper: Long,
                                numPartitions: Int,
                                props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partCol, lower, upper, numPartitions, props)

  def toPersistent(df: DataFrame, url: String, table: String,
                   mode: SaveMode = SaveMode.ErrorIfExists,
                   props: Properties = new Properties()): Unit =
    df.write.mode(mode).jdbc(url, table, props)
}
