package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.api.Frame
import graft.ops.{TextAnalysis => TA}

/** Deterministic sharded training-data export — the final step of a
  * corpus pipeline: pseudo-randomly shuffle the corpus into `nShards`
  * fixed output shards with a reproducible within-shard order, and
  * emit per-shard integrity manifests (doc counts, token counts, an
  * order-independent content fingerprint) so a training job can verify
  * what it reads. (No reference equivalent; the shuffle-then-shard
  * layout is the standard public pretraining export convention —
  * training loaders read shards sequentially, so the global
  * document-order randomization must happen HERE, at write time.)
  *
  * Everything derives from the portable charPoly→mix hash family — no
  * RNG state, so the same corpus produces byte-identical shard
  * membership and order on every engine, rerun, partitioning, and
  * cluster size (the [[Frame.sampleHash]] property, applied to
  * layout):
  *
  *  - shard(id)  = mix(id) mod nShards — membership is a scan-stage
  *    expression; new documents route without reshuffling old ones.
  *  - order(id)  = (mix(mix(id) + 1), id) — the DOUBLE mix
  *    decorrelates within-shard order from the shard residue class
  *    (ordering by mix(id) inside shard s would enumerate the
  *    arithmetic progression s, s + nShards, … of mix values — a
  *    stratified, not shuffled, order).
  *
  * Scale shape: assignment and order keys are pure scan-stage
  * arithmetic; the write is ONE exchange keyed by shard with a
  * partition-local sort (`repartition(nShards) + sortWithinPartitions`
  * — Spark's required shape for sorted single-file-per-shard output);
  * the manifest is one hash aggregate with map-side combine whose
  * fingerprint is an order-independent sum, so it merges up the
  * aggregation tree without any sort at all. Size `nShards` so a shard
  * is a task-sized file (hundreds of MB): at 100 TB that is hundreds
  * of thousands of shards — each still one bounded task.
  */
object Shard {

  /** shard id in [0, nShards) for an integral id column. */
  def shardOf(id: Column, nShards: Int): Column =
    pmod(Frame.portableMix(id), lit(nShards.toLong)).cast("int")

  /** within-shard shuffle key: double-mix, decorrelated from shard. */
  def orderKeyOf(id: Column): Column =
    Frame.portableMix(Frame.portableMix(id) + 1)

  /** corpus + (shard, shard_key) columns appended. */
  def assignShards(df: DataFrame, id: String, nShards: Int): DataFrame = {
    require(nShards >= 1, "assignShards: nShards must be >= 1")
    df.withColumn("shard", shardOf(col(id), nShards))
      .withColumn("shard_key", orderKeyOf(col(id)))
  }

  /** Per-shard integrity manifest: (shard, n_docs, n_tokens,
    * fingerprint). The fingerprint is Σ_docs mix(charPoly(text) · 31 +
    * mix(id)) mod M — content AND identity hashed per document, summed
    * mod M, so it is order-independent (the aggregate needs no sort and
    * merges map-side), and any dropped, duplicated, re-idued, or edited
    * document changes it. An integrity checksum, not a cryptographic
    * one. Null text hashes as empty (charPoly's seed), null-id rows
    * are the caller's data bug and still count. */
  def shardManifest(df: DataFrame, id: String, text: String,
                    nShards: Int): DataFrame = {
    require(nShards >= 1, "shardManifest: nShards must be >= 1")
    val docHash = Frame.portableMix(
      TA.portableWordHash(coalesce(col(text), lit(""))) * 31 +
        Frame.portableMix(col(id)))
    df.select(shardOf(col(id), nShards).as("shard"),
        TA.tokenCount(col(text)).cast("long").as("__nt"),
        docHash.as("__dh"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        pmod(sum(col("__dh")), lit(Frame.MixM)).as("fingerprint"))
  }

  /** Write the corpus as `nShards` shard directories
    * (`.../shard=<s>/part-...parquet`), each internally ordered by the
    * portable shuffle key: one exchange keyed by shard, partition-local
    * sort, dynamic-partition parquet write. Returns the manifest frame
    * (computed from the INPUT — compare against a manifest of the
    * read-back to verify the round trip). */
  def writeShards(df: DataFrame, id: String, text: String, nShards: Int,
                  path: String): DataFrame = {
    require(nShards >= 1, "writeShards: nShards must be >= 1")
    assignShards(df, id, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_key"), col(id))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    shardManifest(df, id, text, nShards)
  }
}
