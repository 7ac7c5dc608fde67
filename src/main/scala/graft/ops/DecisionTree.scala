package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed CART decision-tree classifier over numeric features —
  * the core of the reference's DecisionTree module
  * (/root/reference/src/DataFrame/DecisionTree.hs:36-44 TreeConfig:
  * maxTreeDepth / minSamplesSplit / minLeafSize / percentile split
  * candidates), re-expressed as Spark histogram split-finding. The
  * reference's TAO refinement and expression-synthesis splits
  * (Synthesis.hs) stay out of scope — this is the classic
  * axis-aligned gini tree.
  *
  * Scale shape (the MLlib formulation): per depth LEVEL — not per
  * node — one melt (posexplode of the feature array) plus ONE exact
  * percentile aggregate for candidate thresholds and ONE
  * groupBy(node, feature, bucket, label) count pass; every split
  * decision then happens driver-side on nodes × features × buckets ×
  * labels counts (tiny). Rows never leave the executors; the tree
  * (literal when-chain) ships TO the data. Depth D costs D scans of
  * the training frame.
  *
  * Deterministic end-to-end: exact percentile candidates, exact
  * counts, ties broken on (feature index, threshold, label).
  */
object DecisionTree {

  /** tree node: leaf when feature < 0. */
  final case class Node(id: Long, depth: Int, n: Long, prediction: String,
                        feature: Int, threshold: Double,
                        left: Long, right: Long)

  final case class Tree(nodes: Map[Long, Node], features: Seq[String]) {
    /** the fitted tree as a when-chain Column: label for a feature row. */
    def predictColumn: Column = {
      def go(id: Long): Column = {
        val nd = nodes(id)
        if (nd.feature < 0) lit(nd.prediction)
        else when(col(features(nd.feature)).cast("double") <= nd.threshold,
          go(nd.left)).otherwise(go(nd.right))
      }
      go(1L)
    }
    /** node profile frame (for inspection / oracle surfaces); leaves
      * carry null feature/threshold. */
    def toDF(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      nodes.values.toSeq.sortBy(_.id)
        .map(n => (n.id, n.depth, n.n, n.prediction,
          if (n.feature < 0) null else features(n.feature),
          if (n.feature < 0) null
          else (java.lang.Double.valueOf(n.threshold): java.lang.Double)))
        .toDF("node_id", "depth", "n", "prediction", "feature", "threshold")
    }
  }

  private def gini(counts: Iterable[Long]): Double = {
    val n = counts.sum.toDouble
    if (n == 0) 0.0 else 1.0 - counts.map(c => (c / n) * (c / n)).sum
  }

  /** fit a classifier; features must be numeric, label is cast to
    * string. `percentiles` are the split-candidate quantiles per
    * (node, feature) — the reference's TreeConfig.percentiles. */
  def fitClassifier(df: DataFrame, features: Seq[String], label: String,
                    maxDepth: Int = 4, minSamplesSplit: Int = 5,
                    minLeafSize: Int = 1,
                    percentiles: Seq[Int] = 10 to 90 by 10): Tree = {
    require(features.nonEmpty, "fitClassifier: no feature columns")
    require(maxDepth >= 0 && minLeafSize >= 1)
    require(maxDepth <= 12,
      "fitClassifier: maxDepth > 12 — the literal when-chain grows as " +
        "2^depth expressions (codegen limit); deeper trees need a " +
        "model-as-data representation, not a Column")
    val spark = df.sparkSession
    val pcts = percentiles.map(_ / 100.0)

    val base = df.select(
      (features.map(f => col(f).cast("double").as(f)) :+
        col(label).cast("string").as("__label")): _*)
      .na.drop(features :+ "__label").cache()
    try {
      val rootCounts = base.groupBy("__label").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      require(rootCounts.nonEmpty, "fitClassifier: no training rows")
      def majority(m: Map[String, Long]): String =
        m.toSeq.maxBy { case (l, c) => (c, l) }._1 // count, then label text

      var nodes = Map(1L -> Node(1L, 0, rootCounts.values.sum,
        majority(rootCounts), -1, 0.0, 0L, 0L))
      var open: Map[Long, Map[String, Long]] = Map(1L -> rootCounts)

      for (depth <- 0 until maxDepth if open.nonEmpty) {
        // node assignment for this level's tree prefix
        def assign(id: Long): Column = {
          val nd = nodes(id)
          if (nd.feature < 0) lit(id)
          else when(col(features(nd.feature)) <= nd.threshold,
            assign(nd.left)).otherwise(assign(nd.right))
        }
        val openIds = open.keySet
        val melted = base
          .withColumn("__node", assign(1L))
          .filter(col("__node").isin(openIds.toSeq: _*))
          .select(col("__node"), col("__label"),
            posexplode(array(features.map(col): _*)).as(Seq("__f", "__v")))
          .filter(col("__v").isNotNull)

        // ONE exact-percentile pass → candidate thresholds per (node, f)
        val thrRows = melted.groupBy("__node", "__f")
          .agg(percentile(col("__v"), typedLit(pcts)).as("__thr"))
          .collect()
        val thrMap: Map[(Long, Int), Seq[Double]] = thrRows.map { r =>
          (r.getLong(0), r.getInt(1)) ->
            r.getSeq[Double](2).distinct.sorted
        }.toMap
        if (thrMap.isEmpty) { open = Map.empty }
        else {
          val thrDf = spark.createDataFrame(
            spark.sparkContext.parallelize(thrMap.toSeq.map { case ((n, f), t) =>
              org.apache.spark.sql.Row(n, f, t)
            }, 1),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("__node",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("__f",
                org.apache.spark.sql.types.IntegerType),
              org.apache.spark.sql.types.StructField("__thrs",
                org.apache.spark.sql.types.ArrayType(
                  org.apache.spark.sql.types.DoubleType)))))

          // ONE histogram pass: bucket = #thresholds strictly below v
          val hist = melted.join(broadcast(thrDf), Seq("__node", "__f"))
            .withColumn("__bkt", aggregate(col("__thrs"), lit(0),
              (acc, t) => acc + when(col("__v") > t, 1).otherwise(0)))
            .groupBy("__node", "__f", "__bkt", "__label").count()
            .collect()
            .map(r => ((r.getLong(0), r.getInt(1)), (r.getInt(2),
              r.getString(3), r.getLong(4))))
            .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
            .withDefaultValue(Seq.empty[(Int, String, Long)])

          var nextOpen = Map.empty[Long, Map[String, Long]]
          for ((id, labelCounts) <- open.toSeq.sortBy(_._1)) {
            val total = labelCounts.values.sum
            val parentGini = gini(labelCounts.values)
            if (total >= minSamplesSplit && parentGini > 0) {
              // best (feature, threshold) by weighted-gini gain
              val best = (for {
                f <- features.indices
                thrs = thrMap.getOrElse((id, f), Seq.empty[Double])
                if thrs.nonEmpty
                byBkt = hist((id, f))
                (thr, ti) <- thrs.zipWithIndex
              } yield {
                // bucket b <= ti → value <= thrs(ti) (bucket counts
                // thresholds strictly below, so b==ti means v in
                // (thrs(ti-1), thrs(ti)])... v <= thr ⇔ bkt <= ti
                val left = byBkt.filter(_._1 <= ti)
                  .groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
                val lN = left.values.sum; val rN = total - lN
                val right = labelCounts.map { case (l, c) =>
                  l -> (c - left.getOrElse(l, 0L)) }
                val w = (lN * gini(left.values) + rN * gini(right.values)) / total
                (parentGini - w, f, thr, left, right, lN, rN)
              }).filter(c => c._6 >= minLeafSize && c._7 >= minLeafSize)
                .sortBy(c => (-c._1, c._2, c._3)).headOption
              best match {
                case Some((gain, f, thr, left, right, lN, rN)) if gain > 1e-12 =>
                  val lId = id * 2; val rId = id * 2 + 1
                  nodes += id -> nodes(id).copy(feature = f, threshold = thr,
                    left = lId, right = rId)
                  nodes += lId -> Node(lId, depth + 1, lN, majority(left), -1, 0.0, 0, 0)
                  nodes += rId -> Node(rId, depth + 1, rN, majority(right), -1, 0.0, 0, 0)
                  nextOpen += lId -> left
                  nextOpen += rId -> right.filter(_._2 > 0)
                case _ => // no admissible split: leaf stays
              }
            }
          }
          open = nextOpen
        }
      }
      Tree(nodes, features)
    } finally base.unpersist()
  }
}
