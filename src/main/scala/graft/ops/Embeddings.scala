package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.VectorExpressions

/** Embedding-column utilities a corpus pipeline runs before/after
  * similarity search: L2 normalization (so cosine reduces to a dot —
  * halves the arithmetic of every downstream pair scoring) and
  * symmetric int8 quantization (4× smaller vectors on disk and over
  * the shuffle wire — the standard storage/recall trade for
  * billion-vector stores; recall loss is bounded by scale/2 per
  * component).
  *
  * All kernels are codegen'd Catalyst expressions
  * ([[graft.expr.VectorDivide]] & friends) — scan-stage work, no
  * shuffle, no interpreted higher-order functions on the hot path.
  */
object Embeddings {

  /** L2 norm of a vector column (sequential fold — oracle-parity). */
  def norm(vec: Column): Column = Similarity.norm(vec)

  /** vec / ||vec||₂ as array<double>. Zero vectors produce NaN
    * components (0/0) — filter them beforehand if they can occur. */
  def l2Normalize(vec: Column): Column =
    VectorExpressions.vecDiv(vec, Similarity.norm(vec))

  /** symmetric int8 scale for a vector: maxAbs/127 (0.0 stays exactly
    * 0). Zero vectors get scale 0 — quantize guards them to all-zero
    * output via the clamp, and dequantize restores all-zero exactly. */
  def int8Scale(vec: Column): Column = {
    val vd = vec.cast("array<double>")
    greatest(array_max(vd), -array_min(vd)) / lit(127.0)
  }

  /** quantize at an explicit scale (array<tinyint>). */
  def quantizeInt8(vec: Column, scale: Column): Column =
    VectorExpressions.vecQuantizeInt8(vec, scale)

  /** dequantize back to array<double>. */
  def dequantInt8(q: Column, scale: Column): Column =
    VectorExpressions.vecDequantInt8(q, scale)

  /** frame-level: replace `vec` with (`vec`_q tinyint array, `vec`_scale)
    * — the layout to WRITE; join/dequant on read. One scan, two
    * codegen'd kernels, no shuffle. */
  def quantizeEmbeddings(df: DataFrame, vec: String): DataFrame = {
    val sc = s"${vec}_scale"
    df.withColumn(sc, int8Scale(col(vec)))
      .withColumn(s"${vec}_q", quantizeInt8(col(vec), col(sc)))
      .drop(vec)
  }

  /** inverse of [[quantizeEmbeddings]]: reconstruct `vec` (lossy —
    * error ≤ scale/2 per component). */
  def dequantEmbeddings(df: DataFrame, vec: String): DataFrame =
    df.withColumn(vec, dequantInt8(col(s"${vec}_q"), col(s"${vec}_scale")))
      .drop(s"${vec}_q", s"${vec}_scale")

  /** approximate dot of two QUANTIZED vectors, scored directly on the
    * int8 arrays (integer accumulate, then × scaleA·scaleB) — reads 4×
    * less data than dequantize-then-dot and never materializes the
    * double arrays. The candidate-scoring kernel for ANN over a
    * quantized corpus. */
  def dotQuantized(qa: Column, scaleA: Column, qb: Column,
                   scaleB: Column): Column =
    VectorExpressions.dotInt8(qa, qb).cast("double") * scaleA * scaleB

  /** approximate cosine of two quantized vectors (norms likewise from
    * the integer self-dots — zero-norm inputs yield NaN). */
  def cosineQuantized(qa: Column, scaleA: Column, qb: Column,
                      scaleB: Column): Column = {
    val num = dotQuantized(qa, scaleA, qb, scaleB)
    val na = sqrt(dotQuantized(qa, scaleA, qa, scaleA))
    val nb = sqrt(dotQuantized(qb, scaleB, qb, scaleB))
    num / (na * nb)
  }
}
