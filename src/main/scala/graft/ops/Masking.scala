package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.api.Frame

/** Denoising-objective preparation (public method — the span-corruption
  * pretraining objective of T5, Raffel et al. 2020, arXiv:1910.10683;
  * the reference has no equivalent): turn clean text into
  * (input-with-sentinels, target) pairs by masking token spans.
  *
  * This is the BLOCKED deterministic variant: tokens partition into
  * fixed chunks of `chunk` tokens; each full chunk masks one
  * `spanLen`-token span at a pseudo-random offset drawn from the
  * portable mixer of (doc id, chunk index). Blocking is what makes the
  * pass engine-portable and embarrassingly parallel: span placement for
  * any token depends only on (id, its chunk) — no sequential scan state
  * per document, so the whole pass is pure per-row Column arithmetic in
  * the scan stage (a DuckDB oracle replays it bit-identically, q172),
  * and masking rate is exactly spanLen/chunk on full chunks. The
  * trailing partial chunk never masks (too short to guarantee an
  * in-bounds span) — the documented bias, negligible at corpus scale.
  *
  * Output convention (T5): the input replaces each masked span with
  * `<extra_id_K>` (K = the chunk's 0-based index among the doc's
  * chunks); the target is the concatenation of `<extra_id_K>` + masked
  * tokens, in order. A doc shorter than `chunk` tokens passes through
  * with an empty target. A NULL id has no portable mixer seed: the doc
  * passes through unmasked (null offsets send every token down the
  * 'other' branch) and n_masked reports 0, not the full-chunk count.
  */
object Masking {

  /** (input, target) span corruption of `text`. Returns the input frame
    * plus (n_tokens, n_masked, input, target). */
  def spanCorruption(df: DataFrame, id: String, text: String,
                     chunk: Int = 20, spanLen: Int = 3): DataFrame = {
    require(chunk >= 2, "spanCorruption: chunk must be >= 2")
    require(spanLen >= 1 && spanLen < chunk,
      "spanCorruption: need 1 <= spanLen < chunk")
    // Span offsets are computed ONCE PER FULL CHUNK into a small array
    // column and indexed from the token lambdas — inlining the
    // mixer chain into each token's condition re-evaluates ~5 hash
    // chains per token inside CodegenFallback HOF lambdas (measured
    // 13 s at sf0.1; this shape runs 1 s). n_masked is closed-form:
    // every full chunk masks exactly spanLen tokens.
    val ws = split(col(text), " ")
    val n = size(ws)
    val nFull = (n / chunk).cast("int") // exact: ints are double-exact
    // off(i,k) = mix(mix(i) + k) mod (chunk - spanLen + 1), k = 0..nFull-1
    // nFull = 0 guard: sequence(0, -1) DESCENDS in Spark (implicit step
    // −1) — it does not produce an empty array; short docs must get one
    val offs = when(nFull > 0, transform(sequence(lit(0), nFull - 1), k =>
      pmod(Frame.portableMix(Frame.portableMix(col(id)) + k.cast("long")),
        lit((chunk - spanLen + 1).toLong))))
      .otherwise(array().cast("array<bigint>"))
    def sentinel(k: Column) = concat(lit("<extra_id_"), k, lit(">"))
    def tok(w: Column, p: Column, offsC: Column,
            atStart: (Column, Column) => Column,
            inSpan: Column => Column, other: Column => Column) = {
      val k = (p / chunk).cast("int")
      val pc = pmod(p, lit(chunk))
      val off = try_element_at(offsC, k + 1) // null past the last full chunk
      when(off.isNotNull && pc === off, atStart(k.cast("long"), w))
        .when(off.isNotNull && pc > off && pc < off + spanLen, inSpan(w))
        .otherwise(other(w))
    }
    val pos = sequence(lit(0), n - 1)
    val stage = df.withColumn("__offs", offs)
    stage
      .withColumn("n_tokens", n)
      .withColumn("n_masked", // null id → null offsets → nothing masks
        when(col(id).isNotNull, (nFull * spanLen).cast("long"))
          .otherwise(lit(0L)))
      .withColumn("input", array_join(filter(
        zip_with(ws, pos, (w, p) => tok(w, p, col("__offs"),
          (k, _) => sentinel(k), _ => lit(null), identity)),
        _.isNotNull), " "))
      .withColumn("target", array_join(filter(
        zip_with(ws, pos, (w, p) => tok(w, p, col("__offs"),
          (k, w0) => concat(sentinel(k), lit(" "), w0), identity,
          _ => lit(null))),
        _.isNotNull), " "))
      .drop("__offs")
  }
}
