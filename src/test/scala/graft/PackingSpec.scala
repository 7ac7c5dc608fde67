package graft

import org.apache.spark.sql.functions._

import graft.ops.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._
  initLogs()

  /** brute-force expectation: lay token counts end-to-end by id, cut at
    * multiples of L. */
  private def expected(docs: Seq[(Long, Long)], L: Long): Seq[(Long, Long, Long, Long)] = {
    var cum = 0L
    docs.sortBy(_._1).filter(_._2 > 0).flatMap { case (id, n) =>
      val cb = cum; cum += n
      (cb / L to (cb + n - 1) / L).map { p =>
        (id, p, math.max(p * L, cb) - cb, math.min((p + 1) * L, cb + n) - cb)
      }
    }
  }

  test("packConcat cuts the concatenated token stream at maxLen boundaries") {
    val docs = Seq((10L, 3L), (11L, 5L), (12L, 9L), (13L, 2L), (14L, 1L))
    val df = docs.toDF("id", "ntok")
    val got = Packing.packConcat(df, "id", col("ntok"), maxLen = 4)
      .orderBy("id", "pack_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected(docs, 4))
    // every pack except the last is exactly full
    val perPack = got.groupBy(_._2).view.mapValues(_.map(r => r._4 - r._3).sum)
    val lastPack = perPack.keys.max
    perPack.foreach { case (p, tot) =>
      if (p != lastPack) assert(tot == 4, s"pack $p holds $tot tokens") }
  }

  test("packConcat: a doc longer than maxLen spans several packs; " +
    "zero-token docs are absent") {
    val df = Seq((1L, 0L), (2L, 10L)).toDF("id", "ntok")
    val got = Packing.packConcat(df, "id", col("ntok"), maxLen = 3)
      .orderBy("pack_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 0L, 0L, 3L), (2L, 1L, 3L, 6L),
      (2L, 2L, 6L, 9L), (2L, 3L, 9L, 10L)))
  }

  test("packConcat is invariant to input partitioning") {
    val docs = (0L until 500L).map(i => (i, 1L + i % 37))
    val base = docs.toDF("id", "ntok")
    val a = Packing.packConcat(base, "id", col("ntok"), maxLen = 100)
      .orderBy("id", "pack_id").as[(Long, Long, Long, Long)].collect().toSeq
    val b = Packing.packConcat(base.repartition(7, col("ntok")), "id",
        col("ntok"), maxLen = 100)
      .orderBy("id", "pack_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(a == b)
    assert(a == expected(docs, 100))
  }
}
