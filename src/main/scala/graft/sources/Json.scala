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
