package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup-path soak at sf1-equivalent scale (VERDICT r5 item 6): the
  * sf* fixtures stop at 0.1 (5 000 documents), so this main replicates
  * the sf0.1 documents table `SPARK_GRAFT_SOAK_COPIES`× (default 10 →
  * 50 000 docs ≈ sf1) with a per-copy marker token prepended to the
  * text. The marker keeps copies NEAR-duplicates (3-gram Jaccard ≈ 0.9
  * across copies), which is the hostile shape for the dedup path:
  * every document sits in a `copies`-sized near-dup clique, so the
  * shingle posting lists and band buckets are `copies`× longer than
  * organic data — exactly the skew the dfCap / maxBucket guards exist
  * for. The soak proves the guards bound the quadratics at scale:
  * wall-times must stay in the tens of seconds and the JVM must not
  * OOM; results go to one JSON line (appended to SOAK_LOCAL.json).
  *
  * Run: SPARK_GRAFT_SOAK_COPIES=10 sbt "runMain graft.tools.Soak"
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SOAK_COPIES", "10").toInt
    val out = sys.env.getOrElse("SPARK_GRAFT_SOAK_DIR", "/tmp/soak")
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- build the expanded table once per run ---------------------------
    val docs = graft.Tables.documents(spark, sfDir)
    val expanded = (0 until copies).map { k =>
      docs.select(
        (col("doc_id") + lit(k.toLong * 10_000_000L)).as("doc_id"),
        (if (k == 0) col("text")
         else concat(lit(s"soakmark$k "), col("text"))).as("text"))
    }.reduce(_ unionAll _)
    expanded.write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
    val big = spark.read.parquet(s"$out/documents.parquet")
    val nDocs = big.count()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def release(): Unit = spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))

    // exact dedup: one hash-agg + semi join — linear
    val (nExact, tExact) = time {
      graft.ops.Dedup.exact(big, "doc_id", "text").count() }
    release()
    // q44b shape: dfCap scaled to pass organic shingles (DF ≈ copies)
    // while pruning stop-shingles whose posting lists went quadratic
    val (nJac, tJac) = time {
      graft.ops.Dedup.ngramJaccard(big, "doc_id", "text", 0.2,
        dfCap = Some(5 * copies)).count() }
    release()
    // q45b shape: band-bucket cap slightly above the planted clique size
    val (nLsh, tLsh) = time {
      graft.ops.Dedup.minhashLsh(big, "doc_id", "text", 0.8,
        maxBucket = Some(2 * copies)).count() }
    release()
    // simhash near-dup (pigeonhole blocking), same clique pressure
    val (nSim, tSim) = time {
      graft.ops.Dedup.simhashPairs(big, "doc_id", "text", 3).count() }
    release()
    // duplicate-span coverage: every copied window is corpus-repeated,
    // so the dup-vocabulary join carries ~copies× posting pressure
    val (nSpan, tSpan) = time {
      graft.ops.Dedup.duplicateSpanStats(big, "doc_id", "text").count() }
    release()
    // bigram-LM self-fit: count + score branches over copies× bigrams
    val (nLm, tLm) = time {
      graft.ops.TextAnalysis.bigramLmScore(big, "doc_id", "text").count() }
    release()
    // sequence packing: distributed prefix sum over 200k-row id order
    val (nPack, tPack) = time {
      graft.ops.Packing.packDocuments(big, "doc_id", "text", 2048).count() }
    release()
    // BPE: the corpus-scale word-count pass + 20 local merge rounds,
    // then the relational encode (distinct-word dict + stamp join)
    val (nBpe, tBpe) = time {
      val merges = graft.ops.Bpe.fit(big, "text", numMerges = 20)
      graft.ops.Bpe.encodedTokenCount(big, "doc_id", "text", merges).count() }
    release()
    // Misra-Gries heavy hitters over every token occurrence
    val (nHh, tHh) = time {
      big.select(explode(split(col("text"), " ")).as("w"))
        .agg(graft.expr.HeavyHitters.misraGries(col("w"), 64).as("hh"))
        .select(explode(col("hh"))).count() }
    release()
    // per-source quantile pruning (exact per-group percentile)
    val (nKtq, tKtq) = time {
      graft.ops.TextAnalysis.keepTopQuantile(
        big.withColumn("ntok", size(split(col("text"), " ")))
          .withColumn("src", col("doc_id") % 20),
        "src", col("ntok").cast("double"), q = 0.5).count() }
    release()
    // SemDeDup: replicated embeddings are IDENTICAL across copies, so
    // every base vector becomes a copies-sized cos=1 clique inside one
    // cell — the hostile shape for within-cell pairing. Centroids come
    // from the base table (every 20th id), so cells hold ~20×copies
    // members; the quadratic is bounded per cell, never corpus-wide.
    val emb = graft.Tables.embeddings(spark, sfDir)
    val bigEmb = (0 until copies).map { k =>
      emb.select((col("vec_id") + lit(k.toLong * 10_000_000L)).as("vec_id"),
        col("embedding"))
    }.reduce(_ unionAll _)
    val centroids = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("cid"), col("embedding"))
    val (nSem, tSem) = time {
      graft.ops.Similarity.semanticDedup(bigEmb, centroids, "vec_id",
        "embedding", threshold = 0.95).count() }
    release()
    // PQ encode the replicated embedding corpus (scan-stage argmin over
    // 8 subspaces x base/20 centroids — no shuffle, bounded by the scan)
    val cbs = graft.ops.Embeddings.pqInitCodebooks(
      emb, "vec_id", "embedding", dim = 64, m = 8, every = 100)
    val (nPq, tPq) = time {
      bigEmb.select(col("vec_id"),
        graft.ops.Embeddings.pqEncode(col("embedding"), cbs).as("codes"))
        .count() }
    release()
    // ADC top-k + exact re-rank over the coded corpus: the codes-only
    // scan is one pass per query batch (8 queries here); the re-rank
    // joins ONLY the 8 x k x rerank shortlist back to full vectors —
    // corpus-size-independent beyond the scan, the bound under test
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val coded = bigEmb.select(col("vec_id"), col("embedding"),
      graft.ops.Embeddings.pqEncode(col("embedding"), cbs).as("codes"))
      .localCheckpoint()
    val (nAdc, tAdc) = time {
      graft.ops.Embeddings.pqTopK(queries, coded, "vec_id", "codes",
        cbs, k = 10).count() }
    // NO release between the two timed ops: both read the `coded`
    // localCheckpoint, whose lineage is truncated — unpersisting it
    // here leaves the rerank with unrecomputable blocks
    // (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND).
    val (nRr, tRr) = time {
      graft.ops.Embeddings.pqTopKRerank(queries, coded, "vec_id", "codes",
        "embedding", cbs, k = 10, rerank = 4).count() }
    release()
    // incremental MinHash+LSH: odd-id half ingests against the even-id
    // seen corpus — every new doc hits a (copies/2)-sized seen clique
    // per band, the hostile shape maxSeenBucket bounds
    val (nInc, tInc) = time {
      graft.ops.Dedup.minhashLshIncremental(
        big.filter(col("doc_id") % 2 === 1), big.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", 0.8, maxSeenBucket = Some(2 * copies)).count() }
    release()
    // incremental SimHash: same boundary split; the replicated copies
    // are hamming-0 cliques, so every chunk bucket carries the full
    // clique pressure (the pigeonhole analog of the LSH mega-bucket)
    val (nSInc, tSInc) = time {
      graft.ops.Dedup.simhashPairsIncremental(
        big.filter(col("doc_id") % 2 === 1), big.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", maxDist = 3).count() }
    release()
    // per-domain cap: the group-partitioned rank window over 20 synthetic
    // domains of 10k docs each — the per-group sort is the surface under test
    val (nCap, tCap) = time {
      graft.ops.Mixture.capPerGroup(
        big.withColumn("src", col("doc_id") % 20), "doc_id", "src", 1000)
        .count() }
    release()
    // bounded-heap top-k at the SAME n as the cap window above — the
    // direct A/B of shuffle-everything-then-rank vs k-entry partials
    val (nTk, tTk) = time {
      graft.ops.Mixture.topKPerGroup(
        big.withColumn("src", col("doc_id") % 20), "src",
        length(col("text")).cast("double"), "doc_id", 1000).count() }
    release()
    // A-Res weighted sample: one global group, n-entry heap per partition
    val (nWs, tWs) = time {
      graft.ops.Mixture.weightedSample(
        big, "doc_id", length(col("text")).cast("double"), 1000).count() }
    release()
    // edit-distance near-dup in its intended regime — DIVERSE short keys
    // (names/URLs/hashes): every base doc's 16-hex md5 stem + 2-digit
    // copy suffix puts each 40-key clique within 2 substitutions, while
    // q=4 grams over the 16^4 space keep posting lists clique-sized
    // (~copies docs per gram; a 2-gram key on this corpus would be
    // all-hot and dfCap would rightly empty it — measured, which is why
    // the soak uses the 4-gram regime the scaladoc prescribes for
    // low-entropy alphabets). Expected rows ≈ 5000 cliques × C(40,2).
    val (nEd, tEd) = time {
      graft.ops.Dedup.editDistancePairs(
        big.select(col("doc_id"),
          concat(
            substring(md5(expr("CAST(doc_id % 10000000 AS STRING)")), 1, 16),
            lpad(expr("CAST(doc_id DIV 10000000 AS STRING)"), 2, "0")).as("k")),
        "doc_id", "k", maxDist = 2, q = 4, dfCap = Some(5 * copies)).count() }
    release()
    // decontamination, exact vs Bloom-prefiltered: SAME output by
    // construction; replicated copies make every benchmark gram
    // corpus-frequent, so the exact variant shuffles all ~copies×
    // corpus grams while the bloom variant prunes non-benchmark grams
    // scan-side — the pair measures the shuffle saving at scale
    val bench = docs.filter(col("doc_id") % 20 === 7)
    val (nDecE, tDecE) = time {
      graft.ops.Dedup.decontaminationReport(
        big, bench, "doc_id", "text", n = 8).count() }
    release()
    val (nDecB, tDecB) = time {
      graft.ops.Dedup.decontaminationReportBloom(
        big, bench, "doc_id", "text", n = 8,
        expectedGrams = 1L << 20).count() }
    release()

    // Avro format path at corpus scale: committer-backed write of the
    // replicated docs corpus (one container file per partition, zstd),
    // then a splittable AvroKeyInputFormat scan back — measures the
    // Row↔GenericRecord conversion overhead per side, which the tiny
    // sf0.01 round-trip oracle (q144) cannot see
    val avroDir = s"$out/avro_docs"
    val (nAvW, tAvW) = time {
      graft.sources.Avro.writeAvro(big, avroDir); nDocs }
    val (nAvR, tAvR) = time {
      graft.sources.Avro.readAvro(spark, avroDir).count() }
    release()

    val rt = Runtime.getRuntime
    val heapUsedMb = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
    val json =
      s"""{"soak":"dedup","copies":$copies,"docs":$nDocs,""" +
        f""""exact":{"rows":$nExact,"sec":$tExact%.2f},""" +
        f""""ngram_jaccard":{"rows":$nJac,"sec":$tJac%.2f},""" +
        f""""minhash_lsh":{"rows":$nLsh,"sec":$tLsh%.2f},""" +
        f""""simhash":{"rows":$nSim,"sec":$tSim%.2f},""" +
        f""""dup_spans":{"rows":$nSpan,"sec":$tSpan%.2f},""" +
        f""""bigram_lm":{"rows":$nLm,"sec":$tLm%.2f},""" +
        f""""semantic_dedup":{"rows":$nSem,"sec":$tSem%.2f},""" +
        f""""pq_encode":{"rows":$nPq,"sec":$tPq%.2f},""" +
        f""""pq_topk":{"rows":$nAdc,"sec":$tAdc%.2f},""" +
        f""""pq_rerank":{"rows":$nRr,"sec":$tRr%.2f},""" +
        f""""minhash_incremental":{"rows":$nInc,"sec":$tInc%.2f},""" +
        f""""simhash_incremental":{"rows":$nSInc,"sec":$tSInc%.2f},""" +
        f""""domain_cap":{"rows":$nCap,"sec":$tCap%.2f},""" +
        f""""topk_per_group":{"rows":$nTk,"sec":$tTk%.2f},""" +
        f""""weighted_sample":{"rows":$nWs,"sec":$tWs%.2f},""" +
        f""""edit_distance":{"rows":$nEd,"sec":$tEd%.2f},""" +
        f""""packing":{"rows":$nPack,"sec":$tPack%.2f},""" +
        f""""bpe":{"rows":$nBpe,"sec":$tBpe%.2f},""" +
        f""""heavy_hitters":{"rows":$nHh,"sec":$tHh%.2f},""" +
        f""""quantile_filter":{"rows":$nKtq,"sec":$tKtq%.2f},""" +
        f""""decontam_exact":{"rows":$nDecE,"sec":$tDecE%.2f},""" +
        f""""decontam_bloom":{"rows":$nDecB,"sec":$tDecB%.2f},""" +
        f""""avro_write":{"rows":$nAvW,"sec":$tAvW%.2f},""" +
        f""""avro_read":{"rows":$nAvR,"sec":$tAvR%.2f},""" +
        s""""heap_used_mb":$heapUsedMb}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("SOAK_LOCAL.json"), json + "\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    spark.stop()
  }
}
