package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** XML source/sink — the format of enterprise feeds (SEC filings,
  * PubMed, legal/medical corpora, Wikipedia dumps) that a training-data
  * pipeline ingests at its edges. Spark 4 ships the XML data source in
  * core (`format("xml")`, the donated spark-xml lineage), with schema
  * inference over elements and the same permissive/corrupt-record
  * convention as the JSON reader.
  *
  * Scale posture: files split on `rowTag` boundaries only when a row
  * fits a line-ish chunk — a single multi-GB document parses in one
  * task, so a 100 TB XML landing zone should arrive as many files (the
  * normal shape for dump archives: one file per shard); this reader
  * then scans with full task parallelism, and like Avro it is the
  * first hop of an ingest-to-parquet job, not a query target.
  *
  * The reference has no XML surface (its IO is CSV/JSON/parquet —
  * /root/reference/src/DataFrame/IO). Oracle coverage: q145 writes a
  * slice out through this sink, reads it back with inference on, and
  * the DuckDB oracle recomputes the expected aggregate straight from
  * the parquet table — an element-inference or escaping bug (`&`, `<`
  * in text) fails the hash match (the q32/q70 round-trip pattern).
  */
object Xml {

  /** Read XML files, one row per `rowTag` element, schema inferred
    * (longs/doubles/strings — the CSV-inference type lattice). */
  def readXml(spark: SparkSession, path: String,
              rowTag: String = "row"): DataFrame =
    spark.read.format("xml").option("rowTag", rowTag).load(path)

  /** Distributed XML sink: each row an element named `rowTag` under one
    * `rootTag` per file. Null fields are omitted (standard XML absence
    * semantics — the reader restores them as nulls). */
  def writeXml(df: DataFrame, path: String, rowTag: String = "row",
               rootTag: String = "rows"): Unit =
    df.write.mode("overwrite")
      .option("rowTag", rowTag).option("rootTag", rootTag)
      .format("xml").save(path)
}
