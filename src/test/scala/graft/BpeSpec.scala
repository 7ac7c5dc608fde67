package graft

import org.apache.spark.sql.functions._

import graft.ops.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._
  initLogs()

  // Sennrich et al. 2016 §3.2's worked example: low x5, lower x2,
  // newest x6, widest x3. First-round pair counts peak at 9 shared by
  // (e,s), (s,t), (t,</w>) — lexicographic tie-break picks (e,s).
  private val sennrich = Seq(
    (0L, "low low low low low"),
    (1L, "lower lower"),
    (2L, "newest newest newest newest newest newest"),
    (3L, "widest widest widest")).toDF("doc_id", "text")

  test("applyMerge joins all occurrences left-to-right without re-pairing") {
    assert(Bpe.applyMerge(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    // overlapping runs: the freshly-formed symbol does not re-pair
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("x", "y"), "a", "b") == Seq("x", "y"))
  }

  test("fit reproduces the hand-computed Sennrich merges in order") {
    val merges = Bpe.fit(sennrich, "text", numMerges = 5)
    assert(merges == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
  }

  test("fit stops early when no pair repeats") {
    val tiny = Seq((0L, "ab")).toDF("doc_id", "text")
    assert(Bpe.fit(tiny, "text", numMerges = 10).isEmpty)
  }

  test("encodeWord replays merge ranks greedily") {
    val ranks = Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"),
      ("lo", "w")).zipWithIndex.toMap
    // the unseen word of the worked example
    assert(Bpe.encodeWord("lowest", ranks) == Seq("low", "est</w>"))
    assert(Bpe.encodeWord("low", ranks) == Seq("low", "</w>"))
    assert(Bpe.encodeWord("newest", ranks) == Seq("n", "e", "w", "est</w>"))
    assert(Bpe.encodeWord("", ranks) == Seq.empty)
  }

  test("encodeTokens stamps dict encodings back in word order; " +
    "encodedTokenCount agrees") {
    val merges = Bpe.fit(sennrich, "text", numMerges = 5)
    val doc = Seq((7L, "low lowest newest")).toDF("doc_id", "text")
    val toks = Bpe.encodeTokens(doc, "doc_id", "text", merges)
      .select("tokens").as[Seq[String]].head()
    assert(toks == Seq("low", "</w>", "low", "est</w>", "n", "e", "w", "est</w>"))
    val n = Bpe.encodedTokenCount(doc, "doc_id", "text", merges)
      .select("n_bpe_tokens").as[Long].head()
    assert(n == toks.size.toLong)
  }

  test("local and distributed fit paths produce identical merges") {
    val local = Bpe.fit(sennrich, "text", 8) // vocab 4 << cap → local
    val dist = Bpe.fitDistributed(
      Bpe.wordCounts(sennrich, "text").localCheckpoint(), 8)
    assert(local == dist)
    // forcing the distributed path through fit's cap gives the same
    assert(Bpe.fit(sennrich, "text", 8, localVocabCap = 0) == local)
  }

  test("fit and encode are invariant to input partitioning") {
    val rep = sennrich.repartition(7, col("text"))
    assert(Bpe.fit(rep, "text", 5) == Bpe.fit(sennrich, "text", 5))
    val merges = Bpe.fit(sennrich, "text", 5)
    val docs = Seq((1L, "newest low"), (2L, "wider lows")).toDF("doc_id", "text")
    val a = Bpe.encodeTokens(docs, "doc_id", "text", merges)
      .orderBy("doc_id").select("tokens").as[Seq[String]].collect().toSeq
    val b = Bpe.encodeTokens(docs.repartition(5), "doc_id", "text", merges)
      .orderBy("doc_id").select("tokens").as[Seq[String]].collect().toSeq
    assert(a == b)
  }
}
