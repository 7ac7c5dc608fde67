package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.ops.{Dedup, Materialize, Similarity}

/** Streaming bridge for the incremental dedup family: a standing
  * ingestion keeps the SEEN corpus as a state TABLE in storage, and
  * each micro-batch
  *
  *  1. drops intra-batch near-dups — the larger id of every pair (the
  *     [[Similarity.semanticDedup]] keep rule);
  *  2. drops batch docs with a near-dup in the seen state, via the
  *     incremental operators ([[Dedup.minhashLshIncremental]] /
  *     [[Similarity.semanticDedupIncremental]] — new×seen candidates
  *     only, so an ingest costs O(batch + touched buckets), never
  *     O(corpus));
  *  3. appends ALL processed batch rows to the state table — later dup
  *     decisions must see every smaller-id doc, kept or dropped, which
  *     is what makes the stream's keep set EQUAL to the one-shot batch
  *     dedup ("drop the larger-id member of every near-dup pair");
  *  4. appends the batch's survivors to the output path.
  *
  * With unique ids and id-ordered batches the survivors equal the
  * batch run exactly (pair discovery is deterministic: a pair (a < b)
  * surfaces in b's micro-batch, intra if they co-arrive, cross
  * otherwise — asserted multi-batch vs batch in StreamingSpec). With
  * out-of-order batches the recipe still dedups, but the keep rule
  * degrades to arrival order (first arrival wins its pairs).
  *
  * foreachBatch rather than mapGroupsWithState, deliberately: dedup
  * state is a corpus-sized table with RELATIONAL access patterns
  * (band-bucket / cell equi-joins against the whole history), not
  * per-key scalar state. Parquet state + incremental joins is the
  * shape that scales; swap the dirs for any table format. At cluster
  * scale, partition/Z-order the state dir by band bucket or cell so
  * each ingest's joins prune to touched files.
  */
object DedupStream {

  private def readState(spark: SparkSession, dir: String,
                        schema: StructType): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(!_.getPath.getName.startsWith("_")))
      Some(spark.read.schema(schema).parquet(dir))
    else None
  }

  /** one micro-batch of the MinHash+LSH recipe (exposed so tests and
    * existing foreachBatch wirings can call it directly). */
  def minhashBatch(batch: DataFrame, id: String, text: String,
                   stateDir: String, outDir: String, threshold: Double,
                   numPerms: Int = 64, bands: Int = 32): Unit = {
    val spark = batch.sparkSession
    val b = Materialize.pin(batch.select(col(id), col(text)))
    val intraDrop = Dedup.minhashLsh(b, id, text, threshold, numPerms, bands)
      .select(col("d2").as(id))
    val crossDrop = readState(spark, stateDir, b.schema) match {
      case Some(seen) =>
        Dedup.minhashLshIncremental(b, seen, id, text, threshold,
          numPerms, bands).select(col("d1").as(id))
      case None => b.limit(0).select(col(id))
    }
    val kept = b.join(intraDrop.union(crossDrop).distinct(),
      Seq(id), "left_anti")
    kept.write.mode("append").parquet(outDir)
    b.write.mode("append").parquet(stateDir)
  }

  /** one micro-batch of the SemDeDup recipe over an embedding stream;
    * `centroids` is the static (cid, vec) cell table (the q97/q180
    * convention). */
  def semanticBatch(batch: DataFrame, id: String, vec: String,
                    centroids: DataFrame, stateDir: String, outDir: String,
                    threshold: Double,
                    maxCell: Option[Int] = None): Unit = {
    val spark = batch.sparkSession
    val b = Materialize.pin(batch.select(col(id), col(vec)))
    val intraKept = Similarity.semanticDedup(b, centroids, id, vec,
      threshold, maxCell).select(col(id))
    val kept0 = b.join(intraKept, Seq(id), "left_semi")
    val kept = readState(spark, stateDir, b.schema) match {
      case Some(seen) =>
        kept0.join(
          Similarity.semanticDedupIncremental(b, seen, centroids, id, vec,
            threshold, maxCell).select(col(id)),
          Seq(id), "left_semi")
      case None => kept0
    }
    kept.write.mode("append").parquet(outDir)
    b.write.mode("append").parquet(stateDir)
  }

  /** wire a per-batch function into a streaming query (AvailableNow —
    * drain-and-stop; swap the trigger for a continuous ingest). */
  def start(stream: DataFrame, checkpointDir: String)
           (batchFn: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((df: DataFrame, bid: Long) => batchFn(df, bid))
      .trigger(Trigger.AvailableNow())
      .start()
}
