package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** JSON source/sink (reference: src/DataFrame/IO/JSON.hs:23-133).
  *
  * The reference reads ONE top-level JSON array of objects; Spark's
  * native format is JSON-lines (splittable — the only shape that scans
  * in parallel at scale). `readJSON` defaults to the reference's
  * top-level-array convention via multiLine; `readJSONL` is the scale
  * path. Schema = union of keys across objects (Spark's inference does
  * exactly the reference's key-union), missing keys → null.
  */
object Json {

  /** reference convention: top-level array of objects, one file.
    * `numbersAsDouble` mirrors the reference's CTNumber-→Double rule
    * (JSON.hs:76-101) — integral columns surface as double. */
  def readJSON(spark: SparkSession, path: String,
               numbersAsDouble: Boolean = true): DataFrame = {
    val df = spark.read.option("multiLine", true).json(path)
    if (numbersAsDouble) castIntegralsToDouble(df) else df
  }

  /** JSON-lines: splittable, distributed — the 100 TB shape. */
  def readJSONL(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Compressed crawl-dump ingestion (`.jsonl.gz` / `.jsonl.zst` — the
    * shape web corpora actually land in). Spark reads these through the
    * Hadoop codecs transparently, BUT gzip/zstd streams are
    * NON-SPLITTABLE: each file is exactly one task no matter its size,
    * so a landing zone of ten 10 GB dumps scans with parallelism 10 on
    * a 1000-core cluster, and every downstream stage inherits those ten
    * fat partitions. The documented pattern this helper encodes:
    *
    *  1. scan the compressed files as they are (one task per file —
    *     unavoidable; decompression cost is paid exactly once);
    *  2. `repartition(targetPartitions)` IMMEDIATELY after the scan —
    *     one round-robin shuffle while rows are still raw, so parsing
    *     cost beyond the scan, and every later transform, runs at
    *     cluster parallelism instead of file parallelism;
    *  3. persist to parquet (splittable, column-pruned) before heavy
    *     multi-pass work — re-scanning a gzip dump pays the whole
    *     decompress+parse again on every pass.
    *
    * `targetPartitions` defaults to `spark.sql.shuffle.partitions`
    * (the session's cluster-parallelism setting). At the landing zone
    * itself, prefer MANY files of ~100 MB-1 GB over few huge ones —
    * that keeps even step 1 parallel. (zstd dumps additionally need
    * the Hadoop ZStandardCodec's native library on the executors;
    * gzip is always available.) */
  def readJsonlDump(spark: SparkSession, path: String,
                    targetPartitions: Int = 0): DataFrame = {
    val n =
      if (targetPartitions > 0) targetPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    spark.read.json(path).repartition(n)
  }

  def writeJSONL(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  private def castIntegralsToDouble(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case LongType | IntegerType =>
          F.col(s"`${f.name}`").cast(DoubleType).as(f.name)
        case _ => F.col(s"`${f.name}`")
      }
    }
    df.select(cols.toSeq: _*)
  }
}
