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
  * with an empty target.
  */
object Masking {

  /** (input, target) span corruption of `text`. Returns the input frame
    * plus (n_tokens, n_masked, input, target). */
  def spanCorruption(df: DataFrame, id: String, text: String,
                     chunk: Int = 20, spanLen: Int = 3): DataFrame = {
    require(chunk >= 2, "spanCorruption: chunk must be >= 2")
    require(spanLen >= 1 && spanLen < chunk,
      "spanCorruption: need 1 <= spanLen < chunk")
    val ws = split(col(text), " ")
    val n = size(ws)
    // span start offset within full chunk k of doc i:
    //   off(i,k) = mix(mix(i) + k) mod (chunk - spanLen + 1)
    def off(k: Column) =
      pmod(Frame.portableMix(Frame.portableMix(col(id)) + k),
        lit((chunk - spanLen + 1).toLong))
    // per-token: chunk index, position in chunk, full-chunk flag, masked flag
    val pos = sequence(lit(0), n - 1)
    val isMasked = transform(pos, p => {
      val k = (p / chunk).cast("long")
      val pc = pmod(p, lit(chunk))
      val full = (k + 1) * chunk <= n // chunk fully inside the doc
      full && pc >= off(k) && pc < off(k) + spanLen
    })
    def sentinel(k: Column) = concat(lit("<extra_id_"), k, lit(">"))
    val inputToks = zip_with(ws, pos, (w, p) => {
      val k = (p / chunk).cast("long")
      val pc = pmod(p, lit(chunk))
      val full = (k + 1) * chunk <= n
      when(full && pc === off(k), sentinel(k))
        .when(full && pc > off(k) && pc < off(k) + spanLen, lit(null))
        .otherwise(w)
    })
    val targetToks = zip_with(ws, pos, (w, p) => {
      val k = (p / chunk).cast("long")
      val pc = pmod(p, lit(chunk))
      val full = (k + 1) * chunk <= n
      when(full && pc === off(k), concat(sentinel(k), lit(" "), w))
        .when(full && pc > off(k) && pc < off(k) + spanLen, w)
        .otherwise(lit(null))
    })
    df.withColumn("n_tokens", n)
      .withColumn("n_masked",
        size(filter(isMasked, x => x)).cast("long"))
      .withColumn("input",
        array_join(filter(inputToks, _.isNotNull), " "))
      .withColumn("target",
        array_join(filter(targetToks, _.isNotNull), " "))
  }
}
