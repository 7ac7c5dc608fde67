package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media travels
  * as an opaque `binary` column plus a typed metadata struct, and
  * decode / feature-extraction runs per-partition so a payload never
  * leaves the executor that holds it (the decode itself is a STUB — no
  * image/audio codecs ship in this environment; see [[decodeStub]]).
  *
  * Scale notes: binary payloads dominate row size, so operators here
  * never shuffle payloads — features are extracted in the scan stage and
  * the payload column is dropped before any wide operation. Real decoders
  * slot into [[decodeStub]] without touching the plumbing.
  */
object Multimodal {

  /** metadata schema carried next to every payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false),
    StructField("byte_entropy", DoubleType, nullable = false),
    StructField("histogram_head", ArrayType(LongType), nullable = false)))

  /** Deterministic fake "images": payload = the document's UTF-8 bytes,
    * metadata derived from them. Stands in for `spark.read.format(
    * "binaryFile")` + sidecar metadata in a real pipeline. */
  def packDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(lit("fake/raw").as("format"),
        (length(col("text")) % 640).cast("int").as("width"),
        (length(col("text")) % 480).cast("int").as("height"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes")).as("meta"))

  /** STUB decode: a real implementation would decode image/audio bytes
    * here (per-partition, batched). The deterministic fake computes a
    * byte histogram + entropy so the full pipeline (schema, partition
    * locality, feature shape) is real and testable. */
  def decodeStub(payload: Array[Byte]): (Double, Double, Array[Long]) = {
    val hist = new Array[Long](256)
    var sum = 0.0
    payload.foreach { b => val u = b & 0xFF; hist(u) += 1; sum += u }
    val n = math.max(payload.length, 1)
    var entropy = 0.0
    hist.foreach { c =>
      if (c > 0) { val p = c.toDouble / n; entropy -= p * math.log(p) }
    }
    (sum / n, entropy, hist.take(8))
  }

  /** per-partition feature extraction over (doc_id, payload, meta) rows —
    * the mapPartitions shape a real decoder would use (one codec init per
    * partition, payloads processed where they live). */
  def extractFeatures(packed: DataFrame): DataFrame = {
    val spark = packed.sparkSession
    val rdd = packed.select("doc_id", "payload").rdd.mapPartitions { rows =>
      // real pipeline: initialize the decoder once per partition here
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val (mean, entropy, head) = decodeStub(payload)
        Row(id, payload.length.toLong, mean, entropy, head.toSeq)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** "frame sampling": every `stride`-th block of `blockBytes` bytes, as
    * the video-frame-sample analog (array<binary> column, bounded count). */
  def sampleFrames(packed: DataFrame, blockBytes: Int = 64,
                   stride: Int = 4, maxFrames: Int = 8): DataFrame = {
    val nBlocks = (length(col("payload")) + blockBytes - 1) / blockBytes
    val idx = sequence(lit(0), least(((nBlocks - 1) / stride).cast("int"), lit(maxFrames - 1)))
    packed.select(col("doc_id"),
      transform(idx, i => substring(col("payload"), i * stride * blockBytes + 1, lit(blockBytes)))
        .as("frames"))
  }

  /** "resize": truncate/zero-pad payloads to a fixed size (the geometric
    * resize analog for opaque payloads — real resize goes in the decoder). */
  def resizePayload(packed: DataFrame, target: Int): DataFrame =
    packed.withColumn("payload",
      substring(rpad(col("payload"), target, Array[Byte](0)), 1, target))
}
