package graft

import org.apache.spark.sql.functions._
import graft.ops.{Bpe, ModelStore, TextAnalysis => TA, Unigram}

/** Train-once/score-many round trips: every fitted artifact written by
  * [[graft.ops.ModelStore]] must load back so that load-then-encode is
  * BIT-IDENTICAL to fit-then-encode — the property that lets a 100 TB
  * pipeline train a tokenizer once and score corpora for months. */
class ModelStoreSpec extends SparkSpec {
  import spark.implicits._
  initLogs()

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString + "/m"

  lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the lazy dog sleeps while the quick fox runs"),
    (3L, "pack my box with five dozen liquor jugs today"),
    (4L, "sphinx of black quartz judge my vow right now")
  ).toDF("doc_id", "text")

  test("BPE merges: save/load round-trips values AND merge order; " +
    "load-then-encode equals fit-then-encode bit-for-bit") {
    val dir = tmp("ms_bpe")
    val merges = Bpe.fit(corpus, "text", numMerges = 12)
    ModelStore.saveBpeMerges(spark, merges, dir)
    val loaded = ModelStore.loadBpeMerges(spark, dir)
    assert(loaded == merges, "merge table or its ORDER changed in transit")
    val a = Bpe.encodeTokens(corpus, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Bpe.encodeTokens(corpus, "doc_id", "text", loaded)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("unigram vocab: save/load round-trips (piece, logp) exactly; " +
    "load-then-encode equals fit-then-encode bit-for-bit") {
    val dir = tmp("ms_uni")
    val vocab = Unigram.fit(corpus, "text", vocabSize = 60)
    ModelStore.saveUnigramVocab(spark, vocab, dir)
    val loaded = ModelStore.loadUnigramVocab(spark, dir)
    assert(loaded == vocab, "vocab or a logp double changed in transit")
    val a = Unigram.encodeTokens(corpus, "doc_id", "text", vocab)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Unigram.encodeTokens(corpus, "doc_id", "text", loaded)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("langid profiles: save/load round-trips the model table; " +
    "load-then-predict equals fit-then-predict bit-for-bit") {
    val dir = tmp("ms_lang")
    val labeled = Seq(
      ("en", "the quick brown fox jumps over the lazy dog"),
      ("en", "a stitch in time saves nine every single day"),
      ("de", "der schnelle braune fuchs springt über den faulen hund"),
      ("de", "übung macht den meister sagte die alte frau")
    ).toDF("lang", "text")
    val profiles = TA.fitLangProfiles(labeled, "lang", "text", buckets = 64)
    ModelStore.saveLangProfiles(profiles, dir)
    val loaded = ModelStore.loadLangProfiles(spark, dir)
    val pa = profiles.orderBy("lang", "bucket").collect().map(_.toSeq).toSeq
    val pb = loaded.orderBy("lang", "bucket").collect().map(_.toSeq).toSeq
    assert(pa == pb && pa.size == 2 * 64)
    val a = TA.predictLangTrained(corpus, "doc_id", "text", profiles, 64)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = TA.predictLangTrained(corpus, "doc_id", "text", loaded, 64)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("PQ codebooks: save/load round-trips the subspace x code x dim " +
    "array bit-exactly; load-then-encode equals fit-then-encode") {
    import graft.ops.Embeddings
    val dir = tmp("ms_pq")
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 60L).map { i =>
      (i, Seq.fill(8)(rnd.nextGaussian() * 3)) }.toDF("vec_id", "embedding")
    val cbs = Embeddings.pqTrainCodebooks(vecs, "vec_id", "embedding",
      dim = 8, m = 4, every = 10, iters = 3)
    ModelStore.savePqCodebooks(spark, cbs, dir)
    val loaded = ModelStore.loadPqCodebooks(spark, dir)
    assert(loaded.length == cbs.length)
    assert(loaded.zip(cbs).forall { case (a, b) =>
      a.length == b.length && a.zip(b).forall { case (x, y) =>
        x.toSeq == y.toSeq } }, "codebook values or order changed")
    val a = vecs.select(Embeddings.pqEncode(col("embedding"), cbs).as("c"))
      .as[Seq[Int]].collect().toSeq
    val b = vecs.select(Embeddings.pqEncode(col("embedding"), loaded).as("c"))
      .as[Seq[Int]].collect().toSeq
    assert(a == b && a.nonEmpty)
    intercept[Exception] {
      ModelStore.savePqCodebooks(spark, cbs, dir) // guarded overwrite
    }
  }

  test("model table: save/load round-trips a k-means profile with " +
    "pinned row order") {
    import graft.ops.KMeans
    val dir = tmp("ms_kmeans")
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 40L).map { i =>
      (i, Seq.fill(4)(rnd.nextGaussian() + (i % 2) * 10)) }
      .toDF("vec_id", "embedding")
    val prof = KMeans.lloydProfile(vecs, "vec_id", "embedding",
      initEvery = 20, iters = 2)
    ModelStore.saveModelTable(prof, dir)
    val loaded = ModelStore.loadModelTable(spark, dir, "cell", "pos")
    val pa = prof.orderBy("cell", "pos").collect().map(_.toSeq).toSeq
    assert(loaded.collect().map(_.toSeq).toSeq == pa && pa.nonEmpty)
  }

  test("save refuses to clobber an existing artifact unless overwrite") {
    val dir = tmp("ms_guard")
    ModelStore.saveBpeMerges(spark, Seq(("a", "b")), dir)
    intercept[Exception] {
      ModelStore.saveBpeMerges(spark, Seq(("c", "d")), dir)
    }
    ModelStore.saveBpeMerges(spark, Seq(("c", "d")), dir, overwrite = true)
    assert(ModelStore.loadBpeMerges(spark, dir) == Seq(("c", "d")))
  }
}
