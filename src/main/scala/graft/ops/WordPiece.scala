package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer training and encoding over a Spark corpus
  * (Schuster & Nakajima 2012; the BERT tokenizer, trained with the
  * likelihood-ratio pair score popularized by the open-source
  * implementations — public method; the reference has no tokenizer).
  * Completes the tokenizer triple next to [[Bpe]] (frequency merges)
  * and [[Unigram]] (probabilistic pruning): WordPiece merges the pair
  * maximizing score = c(ab) / (c(a)·c(b)) — the pair whose JOINT
  * frequency most exceeds what its parts predict — and, unlike BPE,
  * INFERENCE ignores merge order entirely: encoding is greedy
  * longest-prefix match against the final vocabulary.
  *
  * Same scale skeleton as [[Bpe]] (one corpus pass, vocabulary-sized
  * rounds):
  *  - ONE corpus-scale aggregate builds the (word, count) vocabulary —
  *    the only job that touches 100 TB;
  *  - each merge round runs on the vocabulary table: adjacent-pair and
  *    single-symbol occurrence counts (both weighted hash aggregates),
  *    two vocab-scale joins to assemble the score, one driver-side
  *    argmax row, one rewrite projection (re-pinned per round);
  *    below `localVocabCap` distinct words the loop runs in driver
  *    memory off one bounded collect — IDENTICAL merges by
  *    construction (same counts, same IEEE score, same UTF8 tie-break);
  *  - encoding is RELATIONAL at corpus scale: greedy longest-match
  *    runs once per DISTINCT word (a per-word JVM scan — inherently
  *    positional), then an equi-join stamps token arrays onto the
  *    exploded corpus and a per-doc aggregate reassembles word order.
  *
  * Symbol model (BERT convention): a word's first character is a
  * start-form symbol, every later character a `##`-prefixed
  * continuation; merging (a, b) yields a + strip##(b), keeping a's
  * form. The corpus must not contain literal `#` inside words for the
  * prefix to stay unambiguous (guarded in encode by the [UNK] rule,
  * asserted for the test tables in WordPieceSpec).
  *
  * fp/determinism policy: pair/symbol counts are exact longs; the
  * score is ONE IEEE division of exact doubles — identical on every
  * engine — and ties break (p1, p2) UTF8-lexicographic, so fit is
  * reproducible across partitionings and replayable in SQL (q198).
  */
object WordPiece {

  val Unk = "[UNK]"
  private val Cont = "##"

  private def strip(b: String): String =
    if (b.startsWith(Cont)) b.substring(2) else b

  /** a word's initial symbol decomposition: first char start-form,
    * rest ##-continuations. */
  private[graft] def initialSyms(w: String): Seq[String] =
    if (w.isEmpty) Seq.empty
    else w.head.toString +: w.tail.map(c => Cont + c)

  /** one merge applied to a symbol sequence, all occurrences,
    * left-to-right (BPE's non-overlap rule). */
  private[graft] def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val m = a + strip(b)
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += m; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** greedy longest-prefix-match encode of one word against the final
    * vocabulary (the BERT WordPiece inference rule). A position with
    * no matching piece collapses the WHOLE word to [UNK]. */
  private[graft] def encodeWord(w: String, vocab: Set[String]): Seq[String] = {
    if (w.isEmpty) return Seq.empty
    val out = Seq.newBuilder[String]
    var start = 0
    while (start < w.length) {
      var end = w.length
      var hit: String = null
      while (hit == null && end > start) {
        val sub0 = w.substring(start, end)
        val sub = if (start > 0) Cont + sub0 else sub0
        if (vocab.contains(sub)) hit = sub else end -= 1
      }
      if (hit == null) return Seq(Unk)
      out += hit
      start = end
    }
    out.result()
  }

  /** the (word, count) vocabulary — the single corpus-scale pass. */
  def wordCounts(df: DataFrame, text: String): DataFrame =
    df.select(explode(split(col(text), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))

  private def symbolsCol(w: Column): Column =
    transform(sequence(lit(0), length(w) - 1),
      i => when(i === 0, substring(w, 1, 1))
        .otherwise(concat(lit(Cont), substr(w, i + 1, lit(1)))))

  /** train `numMerges` merges; returns the COMPLETE vocabulary —
    * alphabet (start + continuation forms seen in the corpus, UTF8
    * order) followed by merged tokens in merge order — ready for
    * [[encodeTokens]] and [[ModelStore.saveWordPieceVocab]]. Stops
    * early when no pair occurs twice (the [[Bpe.fit]] support floor). */
  def fit(df: DataFrame, text: String, numMerges: Int,
          localVocabCap: Int = 1 << 20,
          minWordCount: Long = 1L,
          batchCap: Int = 1): Seq[String] =
    fitFromCounts(Materialize.pin(wordCounts(df, text)), numMerges,
      localVocabCap, minWordCount, batchCap)

  /** [[fit]] from a precomputed (w, c) word-count table — see
    * [[Bpe.fitFromCounts]]: one corpus pass, every tokenizer variant. */
  def fitFromCounts(wc0: DataFrame, numMerges: Int,
                    localVocabCap: Int = 1 << 20,
                    minWordCount: Long = 1L,
                    batchCap: Int = 1): Seq[String] = {
    require(numMerges >= 1, "WordPiece.fitFromCounts: numMerges must be >= 1")
    require(minWordCount >= 1L,
      "WordPiece.fitFromCounts: minWordCount must be >= 1")
    // frequency-floor prune before the loop (see Bpe.fit) — applies to
    // both paths, so local ≡ distributed still holds under a floor
    val wc = if (minWordCount > 1L) wc0.filter(col("c") >= minWordCount)
             else wc0
    val alphabet = wc
      .select(explode(symbolsCol(col("w"))).as("s"))
      .distinct().orderBy("s")
      .collect().map(_.getString(0)).toSeq
    val merges =
      if (batchCap == 1 && wc.count() <= localVocabCap) {
        val rows = wc.collect().map(r => (r.getString(0), r.getLong(1)))
        fitLocal(rows, numMerges)
      } else fitDistributed(wc, numMerges, batchCap)
    // two different merge rounds can yield the same surface token
    // (('ab','##c') and ('a','##bc') both produce 'abc'); keep the
    // first occurrence so ModelStore never persists one piece under
    // two ranks (encode is a Set and is unaffected either way)
    (alphabet ++ merges).distinct
  }

  private def utf8Lt(a: String, b: String): Boolean =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0

  private[graft] def fitLocal(words: Array[(String, Long)],
                              numMerges: Int): Seq[String] = {
    var vocab: Array[(Seq[String], Long)] =
      words.map { case (w, c) => (initialSyms(w), c) }
    val merged = Seq.newBuilder[String]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val pairs = new java.util.HashMap[(String, String), Long]()
      val singles = new java.util.HashMap[String, Long]()
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length) {
          singles.merge(syms(i), c, _ + _)
          if (i + 1 < syms.length) pairs.merge((syms(i), syms(i + 1)), c, _ + _)
          i += 1
        }
      }
      var best: (String, String) = null
      var bestS = Double.NegativeInfinity
      pairs.forEach { (p, cp) =>
        if (cp >= 2L) {
          val s = cp.toDouble / (singles.get(p._1).toDouble *
            singles.get(p._2).toDouble)
          if (s > bestS || (s == bestS && best != null &&
              (utf8Lt(p._1, best._1) ||
                (p._1 == best._1 && utf8Lt(p._2, best._2))))) {
            best = p; bestS = s
          }
        }
      }
      if (best == null) exhausted = true
      else {
        merged += best._1 + strip(best._2)
        vocab = vocab.map { case (syms, c) =>
          (applyMerge(syms, best._1, best._2), c)
        }
      }
      round += 1
    }
    merged.result()
  }

  /** Distributed fit. `batchCap = 1` (default) is the EXACT sequential
    * loop — one argmax per job round, identical merges to
    * [[fitLocal]]. `batchCap > 1` is the batched SCALE VARIANT: each
    * job round ranks pairs once by the current likelihood score and
    * admits a prefix of up to `batchCap` pairs that are pairwise
    * symbol-DISJOINT with brand-new merged tokens (stopping at the
    * first conflict or self-pair).
    *
    * Unlike [[Bpe.fitDistributed]]'s count-based batches, batched
    * WordPiece is NOT guaranteed to replay the sequential pick order:
    * the likelihood score's denominators (symbol unigram counts)
    * shrink for every symbol a merge consumes, and a newly-created
    * low-count symbol can legitimately win the very next sequential
    * round — information only the next aggregate can reveal. The
    * batched variant is therefore a deliberate, deterministic,
    * partitioning-invariant TRAINING VARIANT for crawl-scale fits
    * (where 2 jobs per merge × 30k merges is the difference between
    * hours and days), not an equivalent implementation — pinned as
    * such in WordPieceSpec. Because no sequential-identity claim is
    * being protected, selection SKIPS conflicting candidates rather
    * than stopping at the first one (greedy maximal independent set
    * down the ranked list — under the likelihood score the top pairs
    * cluster on shared rare symbols, and prefix-stop measured only
    * 2.4× fewer jobs where skipping reaches the cap). Within a batch
    * every admitted pair's score is its true current score
    * (disjointness keeps all three counts untouched), so each batch is
    * a set of simultaneously-justified merges under the round's
    * distribution. */
  private[graft] def fitDistributed(wc: DataFrame,
                                    numMerges: Int,
                                    batchCap: Int = 1): Seq[String] = {
    require(batchCap >= 1, "WordPiece.fitDistributed: batchCap must be >= 1")
    var vocab = Materialize.pin(
      wc.withColumn("syms", symbolsCol(col("w"))).drop("w"))
    // current symbol inventory (batched admission rule): initial
    // alphabet + every merged token produced so far
    val symbolSet = scala.collection.mutable.HashSet[String]()
    if (batchCap > 1)
      vocab.select(explode(col("syms")).as("s")).distinct()
        .collect().foreach(r => symbolSet += r.getString(0))
    val merged = Seq.newBuilder[String]
    var total = 0
    var exhausted = false
    while (total < numMerges && !exhausted) {
      val want = math.min(batchCap, numMerges - total)
      val singles = vocab
        .select(col("c"), explode(col("syms")).as("s"))
        .groupBy("s").agg(sum(col("c")).as("cs"))
      val pairs = vocab
        .select(col("c"), explode(transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(get(col("syms"), i).as("p1"),
            get(col("syms"), i + 1).as("p2")))).as("p"))
        .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
        .agg(sum(col("c")).as("cnt"))
        .filter(col("cnt") >= 2)
      // over-collect 8×: skipping shared-symbol candidates down the
      // ranked list needs slack to fill the batch (bounded: ≤ 8·cap
      // rows on the driver — the likelihood score clusters top pairs
      // on shared rare symbols, so skips are dense)
      val top = pairs
        .join(singles.select(col("s").as("p1"), col("cs").as("ca")), Seq("p1"))
        .join(singles.select(col("s").as("p2"), col("cs").as("cb")), Seq("p2"))
        .withColumn("score", col("cnt").cast("double") /
          (col("ca").cast("double") * col("cb").cast("double")))
        .orderBy(col("score").desc, col("p1"), col("p2"))
        .limit(if (batchCap == 1) 1 else 8 * want).select("p1", "p2").collect()
      if (top.isEmpty) exhausted = true
      else {
        // joins reorder key columns; read by name
        val admitted = scala.collection.mutable.ArrayBuffer[(String, String)]()
        val used = scala.collection.mutable.HashSet[String]()
        var i = 0
        while (admitted.length < want && i < top.length) {
          val (a, b) = (top(i).getAs[String]("p1"), top(i).getAs[String]("p2"))
          val tok = a + strip(b)
          val collide = symbolSet(tok) // checked BEFORE registering tok
          // rank 1 is always admitted (it IS the sequential pick);
          // later candidates are skipped when they touch an admitted
          // symbol or their token collides with an existing spelling
          if (i > 0 && (used(a) || used(b) || collide)) { i += 1 }
          else {
            admitted += ((a, b))
            used += a; used += b; used += tok
            symbolSet += tok
            i += 1
          }
        }
        val batch = admitted.toList
        batch.foreach { case (a, b) => merged += a + strip(b) }
        total += batch.size
        val mergeUdf = udf((syms: Seq[String]) => {
          var s = syms
          batch.foreach { case (a, b) => s = applyMerge(s, a, b) }
          s
        })
        vocab = Materialize.pin(
          vocab.select(mergeUdf(col("syms")).as("syms"), col("c")))
      }
    }
    merged.result()
  }

  /** tokenize a corpus against a trained vocabulary:
    * (id, tokens array<string>). Greedy longest match runs once per
    * DISTINCT word; the corpus side is explode + equi-join + ordered
    * reassembly ([[Bpe.encodeTokens]]'s shape). */
  def encodeTokens(df: DataFrame, id: String, text: String,
                   vocab: Seq[String]): DataFrame = {
    val (words, dict) = wordsAndDict(df, id, text, vocab)
    words.join(dict, Seq("w"))
      .groupBy(col(id)).agg(
        flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("toks")))),
          x => x.getField("toks"))).as("tokens"))
  }

  /** encoded-token count per document without materializing per-doc
    * arrays (the pre-pack statistic). */
  def encodedTokenCount(df: DataFrame, id: String, text: String,
                        vocab: Seq[String]): DataFrame = {
    val (words, dict) = wordsAndDict(df, id, text, vocab)
    words.join(dict.select(col("w"), size(col("toks")).as("nt")), Seq("w"))
      .groupBy(col(id)).agg(sum(col("nt")).as("n_wp_tokens"))
  }

  private def wordsAndDict(df: DataFrame, id: String, text: String,
                           vocab: Seq[String]): (DataFrame, DataFrame) = {
    val vset = vocab.toSet
    val bVocab = df.sparkSession.sparkContext.broadcast(vset)
    val encUdf = udf((w: String) => encodeWord(w, bVocab.value))
    val words = df.select(col(id),
      posexplode(split(col(text), " ")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val dict = words.select("w").distinct()
      .withColumn("toks", encUdf(col("w")))
    (words, dict)
  }
}
