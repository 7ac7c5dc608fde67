package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Property-based checks for the custom kernels and portable-hash
  * invariants — randomized inputs catch the edge cases example tests
  * miss. The pure-JVM kernels run hundreds of scalacheck cases in
  * milliseconds; Spark-side invariants use one seeded bulk frame per
  * property (one job, not one per case). */
class PropertySpec extends SparkSpec {
  import spark.implicits._
  initLogs()

  private def checkProp(p: Prop, cases: Int = 200): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(r.passed, r.status.toString)
  }

  // ---- TopNgramCount vs a naive reference implementation -----------------
  private def naiveTopNgram(words: Seq[String], n: Int): Long =
    if (words.length < n) 0L
    else words.sliding(n).map(_.mkString(" ")).toSeq
      .groupBy(identity).values.map(_.size).max.toLong

  test("TopNgramCount matches the naive count on random word lists") {
    val word = Gen.oneOf("a", "b", "ab", "xyz", "", "δ")
    val gen = for {
      len <- Gen.choose(0, 30)
      ws <- Gen.listOfN(len, word)
      n <- Gen.choose(1, 4)
    } yield (ws, n)
    checkProp(Prop.forAllNoShrink(gen) { case (words, n) =>
      val arr = new GenericArrayData(
        words.map(w => UTF8String.fromString(w)).toArray[Any])
      graft.expr.TopNgramCount.compute(arr, n) == naiveTopNgram(words, n)
    })
  }

  // ---- MinHash signature invariants --------------------------------------
  test("MinHash signatures: permutation-invariant, fixed length, monotone under union") {
    val gen = for {
      hs <- Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (hs, seed)
    checkProp(Prop.forAllNoShrink(gen) { case (hs, seed) =>
      val a = graft.expr.MinHashSignature.compute(hs.toArray, 16)
      val shuffled = graft.expr.MinHashSignature.compute(
        new scala.util.Random(seed).shuffle(hs).toArray, 16)
      val sup = graft.expr.MinHashSignature.compute(
        (hs ++ List(42L, -7L)).toArray, 16)
      a.toSeq == shuffled.toSeq && a.length == 16 &&
        sup.zip(a).forall { case (s, x) => s <= x }
    })
  }

  // ---- SimHash signature vs the per-bit majority fold it replaced --------
  private def naiveSimhash(hs: Seq[Long], bits: Int): Long =
    (0 until bits).map { b =>
      val votes = hs.foldLeft(0) { (acc, h) =>
        acc + (if (((h >> b) & 1L) == 1L) 1 else -1)
      }
      if (votes > 0) 1L << b else 0L
    }.foldLeft(0L)(_ | _)

  test("SimHashSignature matches the per-bit majority fold on random word hashes") {
    val gen = for {
      hs <- Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
      bits <- Gen.oneOf(1, 7, 31, 64)
    } yield (hs, bits)
    checkProp(Prop.forAllNoShrink(gen) { case (hs, bits) =>
      val arr = new GenericArrayData(hs.toArray)
      graft.expr.SimHashSignature.compute(arr, bits) == naiveSimhash(hs, bits)
    })
  }

  // ---- Int128 accumulation vs BigInt reference ---------------------------
  test("Int128 micros accumulation matches BigInt over random signed longs") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-1000000000000L, 1000000000000L))
    checkProp(Prop.forAllNoShrink(gen) { xs =>
      var hi = 0L; var lo = 0L
      xs.foreach { v =>
        val nl = lo + v
        val carry = ((lo & v) | ((lo | v) & ~nl)) >>> 63
        hi = hi + (v >> 63) + carry
        lo = nl
      }
      val got = graft.expr.Int128MicrosToDouble.toDouble(hi, lo, 6)
      val want = new java.math.BigDecimal(
        new java.math.BigInteger(xs.map(BigInt(_)).sum.toString), 6)
        .doubleValue()
      got == want
    })
  }

  // ---- portable mixer: one bulk frame, reference arithmetic --------------
  test("micros fast path agrees with the BigDecimal reference everywhere") {
    def ref(v: Double): Long =
      java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    // adversarial: exact .5-micro boundaries, tiny, negative, large
    for (v <- Seq(0.0, -0.0, 1.5e-7, -1.5e-7, 0.0000005, -0.0000005,
        0.0000015, 1.0, -1.0, 123.4567895, -123.4567895, 1e-9, 7e11,
        0.1 + 0.2, math.Pi, -math.E * 1e6))
      assert(graft.expr.MomentsAggregate.micros(v) == ref(v), s"v=$v")
    val gen = Gen.chooseNum(-1e12, 1e12)
    checkProp(Prop.forAllNoShrink(gen) { v =>
      graft.expr.MomentsAggregate.micros(v) == ref(v)
    }, cases = 2000)
    // products of floats — the aggregate's actual input distribution
    val fg = Gen.chooseNum(-100f, 100f)
    checkProp(Prop.forAllNoShrink(Gen.zip(fg, fg)) { case (a, b) =>
      val v = a.toDouble * b.toDouble
      graft.expr.MomentsAggregate.micros(v) == ref(v)
    }, cases = 2000)
  }

  test("portableMix stays in [0, 2^31-1) and matches the documented arithmetic") {
    val M = 2147483647L
    def mixRef(x: Long): Long =
      (((x % M) * 2654435761L + 2246822519L) % M) * 2246822519L % M
    val rnd = new scala.util.Random(97)
    val xs = Seq.fill(2000)(math.abs(rnd.nextLong() / 2))
    val got = xs.toDF("id")
      .select(col("id"), graft.api.Frame.portableMix(col("id")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      assert(got(x) >= 0 && got(x) < M && got(x) == mixRef(x))
    }
  }

  test("kFoldsHash partitions: disjoint, complete, deterministic") {
    val df = spark.range(0, 500).select($"id".as("doc_id"))
    val folds = graft.api.Frame(df).kFoldsHash("doc_id", 4)
      .map(_.df.select("doc_id").as[Long].collect().toSet)
    assert(folds.map(_.size).sum == 500)
    assert(folds.reduce(_ union _).size == 500) // disjoint + complete
    val again = graft.api.Frame(df).kFoldsHash("doc_id", 4)
      .map(_.df.select("doc_id").as[Long].collect().toSet)
    assert(folds == again)
  }

  // ---- BPE invariants (pure-JVM kernels) ----------------------------------
  test("BPE: encodeWord losslessly reconstructs the word under any merges") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty)
    val pair = Gen.zip(Gen.alphaLowerStr.suchThat(_.nonEmpty),
      Gen.alphaLowerStr.suchThat(_.nonEmpty))
    val gen = Gen.zip(word, Gen.listOf(pair))
    checkProp(Prop.forAllNoShrink(gen) { case (w, merges) =>
      val ranks = merges.zipWithIndex.toMap
      val toks = graft.ops.Bpe.encodeWord(w, ranks)
      // concatenating the tokens and stripping the end marker gives the
      // word back, and every token is non-empty
      toks.mkString.stripSuffix(graft.ops.Bpe.EndOfWord) == w &&
        toks.forall(_.nonEmpty)
    })
  }

  test("BPE: applyMerge never changes the flattened symbol stream") {
    val sym = Gen.oneOf("a", "b", "ab", "c")
    val gen = Gen.zip(Gen.listOf(sym), Gen.zip(sym, sym))
    checkProp(Prop.forAllNoShrink(gen) { case (syms, (a, b)) =>
      graft.ops.Bpe.applyMerge(syms, a, b).mkString == syms.mkString
    })
  }

  // ---- Misra-Gries invariants (pure-JVM merge/update algebra) -------------
  test("MG summary: n/k bound and heavy-item recall on random partitioned streams") {
    val gen = Gen.zip(
      Gen.listOfN(400, Gen.chooseNum(0, 30).map(i => s"t$i")),
      Gen.chooseNum(4, 24), Gen.chooseNum(1, 7))
    checkProp(Prop.forAllNoShrink(gen) { case (items, k, parts) =>
      // drive the aggregate's REAL update/merge across `parts`
      // partitions, exactly as Spark would
      import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
      import org.apache.spark.sql.types.StringType
      val agg = graft.expr.MisraGriesAgg(
        BoundReference(0, StringType, nullable = true), k)
      val bufs = items.grouped(math.max(1, items.size / parts)).map { part =>
        val b = agg.createAggregationBuffer()
        part.foreach { s => agg.update(b,
          new GenericInternalRow(Array[Any](UTF8String.fromString(s)))) }
        b
      }.toSeq
      val merged = bufs.reduce(agg.merge)
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = items.size.toLong
      val got = {
        val m = scala.collection.mutable.Map[String, Long]()
        merged.forEach { (s, c) => m(s.toString) = c }
        m.toMap
      }
      got.forall { case (s, c) => c <= truth(s) && c >= truth(s) - n / k } &&
        truth.forall { case (s, f) => f <= n / k || got.contains(s) }
    }, cases = 100)
  }

  // ---- positional API surface --------------------------------------------
  test("withIndex / topKPerGroup") {
    val f = graft.api.Frame(Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9), ("b", 8))
      .toDF("k", "v"))
    val idx = f.withIndex("i", graft.api.Asc($"k"), graft.api.Asc($"v"))
    assert(idx.df.orderBy("i").select("v").as[Int].collect().toSeq ==
      Seq(1, 2, 3, 8, 9))
    val top = f.topKPerGroup(Seq("k"), 2, graft.api.Desc($"v"))
    assert(top.df.orderBy("k", "v").as[(String, Int)].collect().toSeq ==
      Seq(("a", 2), ("a", 3), ("b", 8), ("b", 9)))
  }
}
