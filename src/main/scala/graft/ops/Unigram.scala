package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece) subword tokenizer — Kudo 2018,
  * arXiv:1804.10959 (public method; the reference has no tokenizer).
  * BPE's complement in the tokenizer family: where BPE greedily merges
  * the most frequent pair, the unigram model keeps a vocabulary of
  * pieces with log-probabilities and segments each word by VITERBI —
  * the max-likelihood segmentation — with EM re-estimating the piece
  * distribution from its own segmentations.
  *
  * Same structural bet as [[Bpe]]: the corpus is touched by exactly ONE
  * pass (the word-count aggregate); everything else — seeding, EM
  * rounds, encoding — runs on the DISTINCT-WORD table, bounded by
  * vocabulary size, never corpus size.
  *
  *  - Seed: all substrings of length 1..maxPieceLen of the (marker-
  *    prefixed) distinct words, weighted by word count; every single
  *    character is kept (coverage guarantee) plus the top `vocabSize`
  *    multi-char substrings by (count desc, piece UTF8 asc) — a
  *    TakeOrderedAndProject, no full sort. Initial logp = ln(cnt/total).
  *  - EM round (Viterbi-EM, the hard-EM variant of Kudo §3.2): E-step
  *    Viterbi-segments each distinct word under the current model (a
  *    per-distinct-word JVM function over the broadcast vocabulary —
  *    inherently sequential DP, the [[Bpe.encodeWord]] justification)
  *    and counts pieces weighted by word count; M-step renormalizes
  *    logp = ln(cnt/total) and DROPS unused pieces (the pruning step).
  *    Each round's model is ≤ vocab-sized — the KMeans/PQ
  *    bounded-driver-collect convention.
  *  - Encode: Viterbi once per DISTINCT word, then the [[Bpe]] stamp:
  *    equi-join onto the exploded corpus, per-doc ordered reassembly.
  *
  * Word model (SentencePiece convention): each word is prefixed with
  * the U+2581 `▁` word-boundary marker before segmentation, so a
  * document's pieces concatenate back LOSSLESSLY — replace `▁` with a
  * space and trim (oracle-gated end-to-end, the q106 convention).
  * Unknown single characters at encode time fall back to `unkPenalty`
  * (never −∞), so segmentation always completes and losslessness holds
  * even for words unseen in training.
  */
object Unigram {

  /** SentencePiece's U+2581 LOWER-ONE-EIGHTH-BLOCK word marker. */
  val WordStart = "▁"

  /** the (marker-prefixed word, count) vocabulary — the single
    * corpus-scale pass. */
  def wordCounts(df: DataFrame, text: String): DataFrame =
    df.select(explode(split(col(text), " ")).as("w0"))
      .filter(col("w0") =!= "")
      .select(concat(lit(WordStart), col("w0")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))

  /** every substring of length 1..maxPieceLen, one entry per
    * OCCURRENCE (repeats count — these are occurrence frequencies). */
  private def substrings(w: Column, maxPieceLen: Int): Column =
    flatten(transform(sequence(lit(1), length(w)), i =>
      transform(sequence(lit(1), least(lit(maxPieceLen), length(w) - i + 1)),
        l => w.substr(i, l))))

  /** seed candidate counts (piece, cnt): substring occurrences over
    * distinct words, weighted by word count. Bounded by distinct words
    * × avg length × maxPieceLen — vocabulary-scale, never corpus-scale. */
  def seedCounts(df: DataFrame, text: String,
                 maxPieceLen: Int = 4): DataFrame = {
    require(maxPieceLen >= 1, "Unigram.seedCounts: maxPieceLen must be >= 1")
    seedCountsOf(wordCounts(df, text), maxPieceLen)
  }

  private def seedCountsOf(wc: DataFrame, maxPieceLen: Int): DataFrame =
    wc.select(col("c"), explode(substrings(col("w"), maxPieceLen)).as("piece"))
      .groupBy("piece").agg(sum(col("c")).as("cnt"))

  /** seed vocabulary: ALL single characters (coverage guarantee —
    * every word must segment) plus the top `vocabSize` multi-char
    * substrings by (cnt desc, piece asc — UTF8 byte order in both
    * engines). Exposed for the q184 oracle. Returns (piece, cnt). */
  def seedVocab(df: DataFrame, text: String, vocabSize: Int,
                maxPieceLen: Int = 4): DataFrame = {
    require(vocabSize >= 1, "Unigram.seedVocab: vocabSize must be >= 1")
    seedVocabOf(seedCountsOf(wordCounts(df, text), maxPieceLen), vocabSize)
  }

  private def seedVocabOf(counts: DataFrame, vocabSize: Int): DataFrame = {
    val chars = counts.filter(length(col("piece")) === 1)
    val multi = counts.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece")).limit(vocabSize)
    chars.unionByName(multi)
  }

  /** max-likelihood segmentation of one word under piece log-probs:
    * DP over end positions, candidate piece lengths 1..maxPieceLen.
    * Unknown single chars score `unkPenalty` (finite), so best() is
    * always finite and backtracking is total. Ties prefer the
    * SHORTEST last piece (strict `>` with l ascending) —
    * deterministic. */
  private[graft] def viterbi(w: String, logp: Map[String, Double],
                             maxPieceLen: Int,
                             unkPenalty: Double): Seq[String] = {
    val n = w.length
    if (n == 0) return Seq.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    var end = 1
    while (end <= n) {
      val maxL = math.min(maxPieceLen, end)
      var l = 1
      while (l <= maxL) {
        val lp = logp.getOrElse(w.substring(end - l, end),
          if (l == 1) unkPenalty else Double.NegativeInfinity)
        val s = best(end - l) + lp
        if (s > best(end)) { best(end) = s; back(end) = l }
        l += 1
      }
      end += 1
    }
    val buf = scala.collection.mutable.ListBuffer.empty[String]
    var p = n
    while (p > 0) { val l = back(p); w.substring(p - l, p) +=: buf; p -= l }
    buf.toList
  }

  private def r9(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue

  private def normalize(counts: Array[(String, Long)]): Map[String, Double] = {
    val tot = counts.map(_._2).sum.toDouble
    counts.map { case (p, c) => p -> r9(math.log(c / tot)) }.toMap
  }

  /** train a unigram-LM vocabulary: seed, then `emRounds` rounds of
    * Viterbi-EM (E: segment distinct words, count pieces weighted by
    * word count; M: renormalize, drop unused pieces). Each round is
    * one vocabulary-table job + one bounded (≤ vocab-size) collect.
    * Returns (piece, logp) sorted by piece — deterministic. */
  def fit(df: DataFrame, text: String, vocabSize: Int = 500,
          maxPieceLen: Int = 4, emRounds: Int = 2,
          unkPenalty: Double = -20.0): Seq[(String, Double)] = {
    require(emRounds >= 0, "Unigram.fit: emRounds must be >= 0")
    val spark = df.sparkSession
    val wc = Materialize.pin(wordCounts(df, text))
    val seed = seedVocabOf(seedCountsOf(wc, maxPieceLen), vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var vocab = normalize(seed)
    for (_ <- 1 to emRounds) {
      val bV = spark.sparkContext.broadcast(vocab)
      val segUdf = udf((w: String) =>
        viterbi(w, bV.value, maxPieceLen, unkPenalty))
      val counts = wc
        .select(col("c"), explode(segUdf(col("w"))).as("piece"))
        .groupBy("piece").agg(sum(col("c")).as("cnt"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      vocab = normalize(counts)
    }
    vocab.toSeq.sortBy(_._1)
  }

  /** tokenize a corpus under a trained vocabulary: (id,
    * tokens array<string>), pieces in document order. Viterbi runs
    * once per DISTINCT word; the corpus side is explode + equi-join +
    * ordered reassembly (the [[Bpe.encodeTokens]] stamp). Lossless:
    * concat tokens, `▁`→space, trim ⇒ the (separator-collapsed)
    * document. */
  def encodeTokens(df: DataFrame, id: String, text: String,
                   vocab: Seq[(String, Double)], maxPieceLen: Int = 4,
                   unkPenalty: Double = -20.0): DataFrame = {
    val bV = df.sparkSession.sparkContext.broadcast(vocab.toMap)
    val encUdf = udf((w: String) =>
      viterbi(WordStart + w, bV.value, maxPieceLen, unkPenalty))
    val words = df.select(col(id),
        posexplode(split(col(text), " ")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val dict = words.select("w").distinct()
      .withColumn("toks", encUdf(col("w")))
    words.join(dict, Seq("w"))
      .groupBy(col(id)).agg(
        flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("toks")))),
          x => x.getField("toks"))).as("tokens"))
  }
}
