package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC source/sink — the second columnar format a lake-scale pipeline
  * meets in the wild (Hive-era warehouses are ORC; parquet is the
  * native format everywhere else in this engine). Spark's ORC reader
  * is vectorized with predicate pushdown and column pruning, the same
  * scan posture as parquet, so reading a 100 TB ORC warehouse needs no
  * special handling — only the format name changes.
  *
  * The reference has no ORC surface (its IO is CSV/JSON/parquet —
  * /root/reference/src/DataFrame/IO); this rounds out format parity
  * for warehouse migration jobs. Oracle coverage: q70 writes a slice
  * out through this sink, reads it back through this reader, and the
  * DuckDB oracle recomputes the expected aggregate straight from the
  * parquet table — a type-mapping bug shows up as a schema/hash
  * mismatch, exactly the q32 CSV round-trip pattern.
  */
object Orc {

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Distributed ORC sink. zstd is the right default at scale (ratio ≈
    * zlib, decode speed ≈ snappy); `maxRecordsPerFile` caps file size
    * like the parquet sink. */
  def writeOrc(df: DataFrame, path: String,
               compression: String = "zstd",
               maxRecordsPerFile: Long = 0L): Unit = {
    var w = df.write.mode("overwrite").option("compression", compression)
    if (maxRecordsPerFile > 0)
      w = w.option("maxRecordsPerFile", maxRecordsPerFile)
    w.orc(path)
  }
}
