package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.{Materialize, TextAnalysis}

/** Streaming ENRICHMENT with persisted models — the score-many half of
  * the train-once/score-many contract ([[graft.ops.ModelStore]]): a
  * standing ingestion stamps model outputs (trained language ID,
  * quality scores, perplexity) onto every arriving document.
  *
  * The scoring operators are multi-aggregate relational plans
  * (per-doc bucket counts → profile join → likelihood sum → argmax),
  * which Structured Streaming cannot run as a continuous query
  * (chained aggregations are unsupported); foreachBatch gives each
  * micro-batch BATCH semantics, where the full operator library
  * applies unchanged — the [[DedupStream]] posture, minus the state
  * table (enrichment is stateless given the model).
  *
  * IDEMPOTENT under foreachBatch's at-least-once contract the same way
  * [[DedupStream]] is: each batch's output lands in a batchId-keyed
  * subdirectory with OVERWRITE semantics, so a retry replaces its own
  * partial output. Read results back with [[DedupStream.readTable]].
  *
  * The model frame (language-ID profiles here) is vocabulary-sized and
  * STATIC for the life of the query — load it once from ModelStore
  * before wiring the stream; every micro-batch's scoring join
  * broadcasts it. Model refresh = stop, reload, restart (a model that
  * changes mid-stream makes enrichment non-reproducible).
  */
object EnrichStream {

  /** one micro-batch of a generic enrichment: apply `f` (any batch
    * transform over the projected batch) and write the result
    * idempotently to `outDir/batch-<id>/`. */
  def enrichBatch(batch: DataFrame, batchId: Long, outDir: String)
                 (f: DataFrame => DataFrame): Unit =
    f(batch).write.mode("overwrite").parquet(s"$outDir/batch-$batchId")

  /** one micro-batch of the trained-language-ID recipe: stamp
    * (lang) from the persisted profile table onto every batch doc —
    * the batch pins once because [[TextAnalysis.predictLangTrained]]
    * reads it in both the scoring branch and the id spine. */
  def langIdBatch(batch: DataFrame, batchId: Long, id: String,
                  text: String, profiles: DataFrame, buckets: Int,
                  outDir: String): Unit = {
    // In a standing query each micro-batch's pin (localCheckpoint)
    // would otherwise accumulate blocks until driver GC lets the
    // ContextCleaner reclaim them (the Soak.release lesson). Snapshot
    // the persistent-RDD ids before the pin and release exactly what
    // this batch added — never the caller's own pinned frames.
    val sc = batch.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    enrichBatch(batch, batchId, outDir) { raw =>
      val b = Materialize.pin(raw)
      b.join(
        TextAnalysis.predictLangTrained(b, id, text, profiles, buckets),
        Seq(id))
    }
    sc.getPersistentRDDs.foreach { case (rddId, rdd) =>
      if (!before.contains(rddId)) rdd.unpersist(blocking = false)
    }
  }

  /** wire the language-ID recipe into a standing query
    * ([[DedupStream.start]]'s AvailableNow drain contract). */
  def langIdEnrich(stream: DataFrame, id: String, text: String,
                   profiles: DataFrame, buckets: Int,
                   checkpointDir: String, outDir: String): StreamingQuery =
    DedupStream.start(stream, checkpointDir) { (b, bid) =>
      langIdBatch(b, bid, id, text, profiles, buckets, outDir)
    }
}
