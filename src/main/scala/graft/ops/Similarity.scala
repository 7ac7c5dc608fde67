package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (array<float>).
  *
  * The dot product is a sequential left-fold over zipped arrays — pure
  * codegen'd expressions, deterministic accumulation order (needed for
  * oracle parity and reproducible runs).
  *
  * Scale path: brute-force top-k broadcast-joins the (small) query set
  * against the corpus — linear in corpus size, no shuffle of the corpus.
  * The IVF variant prunes to the nProbe closest coarse cells so each query
  * row only scores a fraction of the corpus; centroids are tiny and
  * broadcast. At 1000 executors both stay embarrassingly parallel.
  */
object Similarity {

  /** dot(a, b) with double accumulation in element order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force exact top-k cosine neighbors for each row of `queries`.
    * Returns (qid, rank, nid, cos). Queries side must be small (it is
    * broadcast); corpus streams. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, id: String,
                     vec: String, k: Int): DataFrame = {
    val q = queries.select(col(id).as("qid"), col(vec).as("qv"))
    val c = corpus.select(col(id).as("nid"), col(vec).as("nv"))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos"))
  }

  /** All pairs with cosine >= threshold (near-duplicate detection).
    * Quadratic candidate space — prefer [[ivfTopK]] or LSH banding when
    * the corpus is large; kept exact for verification and oracles. */
  def cosineJoin(df: DataFrame, id: String, vec: String,
                 threshold: Double): DataFrame = {
    val a = df.select(col(id).as("d1"), col(vec).as("v1"))
    val b = df.select(col(id).as("d2"), col(vec).as("v2"))
    a.join(b, col("d1") < col("d2"))
      .select(col("d1"), col("d2"), cosine(col("v1"), col("v2")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** IVF-style ANN: assign every corpus vector to its nearest of
    * `centroids` (broadcast), search only the `nProbe` cells closest to
    * each query. Approximate: recall < 1 when a true neighbor lives in an
    * unprobed cell. Returns (qid, rank, nid, cos). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              id: String, vec: String, k: Int, nProbe: Int): DataFrame = {
    val cent = centroids.select(col("cid"), col(vec).as("cv"))
    def assign(df: DataFrame, keyOut: String, n: Int): DataFrame = {
      val scored = df.join(broadcast(cent))
        .withColumn("cdist", cosine(col("v"), col("cv")))
      val w = Window.partitionBy(col("rid")).orderBy(col("cdist").desc, col("cid"))
      scored.withColumn("crank", row_number().over(w))
        .filter(col("crank") <= n)
        .select(col("rid"), col("v"), col("cid").as(keyOut))
    }
    val c = assign(corpus.select(col(id).as("rid"), col(vec).as("v")), "cell", 1)
      .select(col("rid").as("nid"), col("v").as("nv"), col("cell"))
    val q = assign(queries.select(col(id).as("rid"), col(vec).as("v")), "cell", nProbe)
      .select(col("rid").as("qid"), col("v").as("qv"), col("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("cos"))
      .groupBy("qid", "nid").agg(max("cos").as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos"))
  }
}
