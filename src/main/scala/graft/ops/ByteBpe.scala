package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-level BPE (the GPT-2 tokenizer form — Radford et al. 2019,
  * "Language Models are Unsupervised Multitask Learners", encoder.py's
  * published `bytes_to_unicode` table; public method). The initial
  * alphabet is the word's UTF-8 BYTES, each mapped to a printable
  * unicode character, so every word in every script decomposes —
  * there is no [UNK]/unseen-codepoint class at all, which is why this
  * is the form production pipelines ship ([[Bpe]] and the rest of the
  * tokenizer triple are char-level and word-internal).
  *
  * Same scale skeleton as [[Bpe]] (the reference has no tokenizer):
  * ONE corpus-scale word-count aggregate, then merge rounds bounded by
  * the DISTINCT-word vocabulary (driver-local under `localVocabCap`,
  * distributed above it — identical merges either way), and relational
  * encode where the per-word greedy loop runs once per distinct word
  * and an equi-join stamps token arrays onto the corpus. Word model:
  * mapped bytes + the trailing `</w>` end-of-word symbol, so fit and
  * encode share [[Bpe]]'s machinery verbatim; on pure printable-ASCII
  * text byte symbols coincide with char symbols and the two tokenizers
  * agree exactly (pinned in BpeSpec and by the q207/q208 oracles).
  *
  * Byte-level BPE is LOSSLESS by construction: [[decodeTokens]] maps
  * token characters back to bytes and UTF-8-decodes, recovering each
  * word exactly (asserted on CJK/emoji/umlaut text in BpeSpec). As with
  * [[Bpe]]'s reconstruction, a corpus word literally containing the
  * 4-char marker string `</w>` would alias the word boundary — the
  * house convention since q106.
  */
object ByteBpe {

  /** the GPT-2 byte→unicode table: printable ASCII `!`..`~` and the
    * Latin-1 ranges `¡`..`¬`, `®`..`ÿ` map to themselves; the other 68
    * byte values map to codepoints 256, 257, … in byte order. A
    * bijection, so decode is exact. */
  val byteToChar: IndexedSeq[String] = {
    val arr = new Array[String](256)
    val printable = ('!'.toInt to '~'.toInt) ++ (0xA1 to 0xAC) ++ (0xAE to 0xFF)
    printable.foreach(b => arr(b) = b.toChar.toString)
    var n = 0
    (0 until 256).foreach { b =>
      if (arr(b) == null) { arr(b) = (256 + n).toChar.toString; n += 1 }
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(arr)
  }

  private val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (s, b) => s.charAt(0) -> b }.toMap

  /** a word's initial byte-level symbol sequence: UTF-8 bytes mapped
    * through [[byteToChar]], plus the `</w>` end-of-word symbol. */
  def byteSymbols(w: String): Seq[String] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(
      w.getBytes(StandardCharsets.UTF_8)).map(b => byteToChar(b & 0xFF)) :+
      Bpe.EndOfWord

  /** exact inverse of a merged token sequence: concatenate, split at
    * `</w>` word boundaries, map chars back to bytes, UTF-8 decode. */
  private[graft] def decodeWordSyms(syms: Seq[String]): String = {
    val joined = syms.mkString("")
    val words = joined.split(java.util.regex.Pattern.quote(Bpe.EndOfWord), -1)
    words.map { seg =>
      val bytes = seg.map(c => charToByte(c).toByte).toArray
      new String(bytes, StandardCharsets.UTF_8)
    }.filter(_.nonEmpty).mkString(" ")
  }

  /** train `numMerges` byte-level merges; same vocabulary-bounded
    * local/distributed split and UTF8-binary tie-break as [[Bpe.fit]]
    * (identical merges on both paths — BpeSpec). */
  def fit(df: DataFrame, text: String, numMerges: Int,
          localVocabCap: Int = 1 << 20,
          minWordCount: Long = 1L): Seq[(String, String)] =
    fitFromCounts(Materialize.pin(Bpe.wordCounts(df, text)), numMerges,
      localVocabCap, minWordCount)

  /** [[fit]] from a precomputed (w, c) word-count table — see
    * [[Bpe.fitFromCounts]]: one corpus pass, every tokenizer variant. */
  def fitFromCounts(wc0: DataFrame, numMerges: Int,
                    localVocabCap: Int = 1 << 20,
                    minWordCount: Long = 1L): Seq[(String, String)] = {
    require(numMerges >= 1, "ByteBpe.fitFromCounts: numMerges must be >= 1")
    require(minWordCount >= 1L,
      "ByteBpe.fitFromCounts: minWordCount must be >= 1")
    val wc = if (minWordCount > 1L) wc0.filter(col("c") >= minWordCount)
             else wc0
    if (wc.count() <= localVocabCap) {
      val rows = wc.collect().map(r => (r.getString(0), r.getLong(1)))
      Bpe.fitLocal(rows, numMerges, byteSymbols)
    } else {
      val symsUdf = udf((w: String) => byteSymbols(w))
      Bpe.fitDistributed(wc, numMerges, _ => symsUdf(col("w")))
    }
  }

  /** tokenize a corpus under trained byte-level merges:
    * (id, tokens array<string>) — [[Bpe.encodeTokens]]'s relational
    * stamp with the byte alphabet. */
  def encodeTokens(df: DataFrame, id: String, text: String,
                   merges: Seq[(String, String)]): DataFrame =
    Bpe.encodeTokensWith(df, id, text, merges, byteSymbols)

  /** encoded-token count per document without materializing per-doc
    * arrays — [[Bpe.encodedTokenCount]]'s shape. */
  def encodedTokenCount(df: DataFrame, id: String, text: String,
                        merges: Seq[(String, String)]): DataFrame =
    Bpe.encodedTokenCountWith(df, id, text, merges, byteSymbols)

  /** [[encodedTokenCount]] over a pre-broadcast rank table
    * ([[Bpe.broadcastRanks]]) — the standing-query form: one broadcast
    * for the life of the query instead of one per micro-batch. */
  private[graft] def encodedTokenCountB(df: DataFrame, id: String,
                                        text: String,
                                        bRanks: org.apache.spark.broadcast.Broadcast[Map[(String, String), Int]]): DataFrame =
    Bpe.encodedTokenCountB(df, id, text, bRanks, byteSymbols)

  /** decode an encoded corpus back to text: (id, recon_text) — the
    * lossless round trip. The per-doc byte-remap is a UDF by design:
    * decode is the validation/export path, and unlike fit/encode the
    * inverse table lookup has no per-distinct-word structure to
    * exploit (tokens differ per doc). */
  def decodeTokens(df: DataFrame, id: String,
                   tokensCol: String = "tokens"): DataFrame = {
    val decUdf = udf((toks: Seq[String]) => decodeWordSyms(toks))
    df.select(col(id), decUdf(col(tokensCol)).as("recon_text"))
  }
}
