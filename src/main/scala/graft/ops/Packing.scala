package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data preparation: lay every
  * document's tokens end-to-end in a deterministic global order (by a
  * unique sortable id) and cut the concatenated stream into fixed-size
  * packs of `maxLen` tokens — the standard "concat-and-chunk" batching
  * used to build training examples (no reference equivalent; public
  * method, e.g. GPT-style pretraining data loaders).
  *
  * The global running token offset is a distributed prefix sum, NOT a
  * single-partition window (PlanSpec forbids those — an
  * all-rows-on-one-executor sort dies at corpus scale):
  *
  *   1. project the NARROW (id, n_tokens) frame — the shuffled rows are
  *      ~16 bytes regardless of document size; text never moves;
  *   2. range-partition by id and sort within partitions — global order
  *      with each partition holding a contiguous id range;
  *   3. per-partition token subtotals via one tiny groupBy on
  *      spark_partition_id() (map-side combine → one row per partition),
  *      prefix-summed on the DRIVER (bounded: #partitions rows — the
  *      KMeans/DecisionTree bounded-driver-aggregate pattern) and
  *      broadcast-joined back;
  *   4. within-partition running sums via a window PARTITIONED by the
  *      physical partition id — group size = one data partition, never
  *      the corpus.
  *
  * The ranged frame is pinned once (`localCheckpoint`) because the
  * subtotal branch and the window branch must see the SAME partition
  * boundaries — RangePartitioner re-samples per execution, so an
  * unmaterialized plan could give the two branches different pids and
  * join mismatched (pid, offset) rows (the q45 multi-branch lesson).
  * Unlike the other ops' materialize flags (pure recompute cost), a
  * lazy mode here would trade CORRECTNESS — so there is no flag: the
  * checkpoint is unconditional. Results do not depend on where the
  * boundaries fall, only on both branches agreeing.
  *
  * Output: one row per (document, pack) overlap —
  * (id, pack_id, tok_start, tok_end): the doc-relative token slice
  * [tok_start, tok_end) that lands in `pack_id`. A document longer than
  * `maxLen` spans several packs; a short document shares its pack with
  * its neighbors. Zero-token documents contribute nothing and are
  * absent. Offsets are exact up to 2^53 total corpus tokens (floor on
  * double) — ~9 PB of text before that bound bites.
  */
object Packing {

  /** `startOffset` seeds the global token offset — the pack-APPEND
    * mode an incremental ingest needs: pass the previous run's total
    * token count (= its final `cb + ntok`, i.e. the end offset of its
    * last, possibly partial, pack) and the new documents continue the
    * token stream exactly where the prior pack left off, first filling
    * the prior run's tail pack before opening new ones. The default 0
    * is a fresh corpus. */
  def packConcat(df: DataFrame, id: String, nTokens: Column,
                 maxLen: Long, startOffset: Long = 0L): DataFrame = {
    require(maxLen >= 1, "packConcat: maxLen must be >= 1")
    require(startOffset >= 0, "packConcat: startOffset must be >= 0")
    val L = lit(maxLen)
    val ranged = Materialize.pin(
      df.select(col(id), nTokens.cast("long").as("ntok"))
        .filter(col("ntok") > 0)
        .repartitionByRange(col(id))
        .sortWithinPartitions(id)
        .withColumn("pid", spark_partition_id()))
    // tiny: one row per partition after map-side combine
    val partSums = ranged.groupBy("pid").agg(sum(col("ntok")).as("psum"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = startOffset
    val offsets = partSums.map { case (p, s) =>
      val off = acc; acc += s; (p, off)
    }
    val offsetsDf = df.sparkSession.createDataFrame(offsets.toIndexedSeq)
      .toDF("pid", "poff")
    val w = Window.partitionBy("pid").orderBy(id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = ranged.join(broadcast(offsetsDf), Seq("pid"))
      .withColumn("cb", sum(col("ntok")).over(w) - col("ntok") + col("poff"))
    cum.select(col(id), col("ntok"), col("cb"),
        explode(sequence(floor(col("cb") / L),
          floor((col("cb") + col("ntok") - 1) / L))).as("pack_id"))
      .select(col(id), col("pack_id"),
        (greatest(col("pack_id") * L, col("cb")) - col("cb")).as("tok_start"),
        (least((col("pack_id") + 1) * L, col("cb") + col("ntok")) - col("cb"))
          .as("tok_end"))
  }

  /** packConcat over whitespace-token counts of a text column. */
  def packDocuments(df: DataFrame, id: String, text: String,
                    maxLen: Long, startOffset: Long = 0L): DataFrame =
    packConcat(df, id, size(split(col(text), " ")), maxLen, startOffset)

  /** Materialized training examples: the actual token content of every
    * pack. The (id, pack) interval map from [[packConcat]] equi-joins
    * back to the corpus, each document contributes the token slice
    * that landed in the pack, and one aggregate per pack reassembles
    * fragments in document order (in-memory sort bounded by docs-per-
    * pack ≤ maxLen). Every pack holds exactly `maxLen` tokens except
    * the final one. Returns (pack_id, n_toks, pack_text). */
  def packTexts(df: DataFrame, id: String, text: String,
                maxLen: Long): DataFrame = {
    val packs = packDocuments(df, id, text, maxLen)
    packs.join(df.select(col(id), split(col(text), " ").as("__w")), Seq(id))
      .select(col("pack_id"), col(id),
        slice(col("__w"), (col("tok_start") + 1).cast("int"),
          (col("tok_end") - col("tok_start")).cast("int")).as("frag"))
      .groupBy("pack_id").agg(
        array_join(flatten(transform(
          array_sort(collect_list(struct(col(id), col("frag")))),
          x => x.getField("frag"))), " ").as("pack_text"))
      .select(col("pack_id"),
        size(split(col("pack_text"), " ")).as("n_toks"), col("pack_text"))
  }
}
