package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed CART decision-tree classifier over numeric features —
  * the core of the reference's DecisionTree module
  * (/root/reference/src/DataFrame/DecisionTree.hs:36-44 TreeConfig:
  * maxTreeDepth / minSamplesSplit / minLeafSize / percentile split
  * candidates), re-expressed as Spark histogram split-finding, plus
  * TAO refinement ([[taoRefine]]/[[taoOptimize]], DecisionTree.hs:
  * 121-330). The reference's boolean-expression-synthesis split
  * candidates (Synthesis.hs compounds inside findBestSplitTAO) stay
  * out of scope — splits here are axis-aligned thresholds throughout.
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

  /** tree node: leaf when feature < 0. `split2 = Some((op, f2, t2))`
    * makes the split COMPOUND: `(feature <= threshold) op (f2 <= t2)`
    * with op one of and/or/andnot/ornot/notand/notor/nand/nor — the
    * two-literal boolean family of the reference's synthesis-grammar
    * split candidates (DecisionTree.hs:121-330 + Synthesis.hs). Only
    * [[taoRefineCompound]] produces these; the greedy fit stays
    * axis-aligned. */
  final case class Node(id: Long, depth: Int, n: Long, prediction: String,
                        feature: Int, threshold: Double,
                        left: Long, right: Long,
                        split2: Option[(String, Int, Double)] = None)

  /** the two-literal boolean family [[taoRefineCompound]] searches. */
  val compoundOps: Seq[String] =
    Seq("and", "or", "andnot", "ornot", "notand", "notor", "nand", "nor")

  /** the node's split predicate as a Column (left-child condition). */
  private[ops] def splitCol(nd: Node, features: Seq[String],
                            castDouble: Boolean = false): Column = {
    def p(f: Int, t: Double) = {
      val c = col(features(f))
      (if (castDouble) c.cast("double") else c) <= t
    }
    val a = p(nd.feature, nd.threshold)
    nd.split2 match {
      case None => a
      case Some((op, f2, t2)) =>
        val b = p(f2, t2)
        op match {
          case "and" => a && b
          case "or" => a || b
          case "andnot" => a && !b
          case "ornot" => a || !b
          case "notand" => !a && b
          case "notor" => !a || b
          case "nand" => !a || !b
          case "nor" => !a && !b
        }
    }
  }

  final case class Tree(nodes: Map[Long, Node], features: Seq[String]) {
    /** the fitted tree as a when-chain Column: label for a feature row. */
    def predictColumn: Column = {
      def go(id: Long): Column = {
        val nd = nodes(id)
        if (nd.feature < 0) lit(nd.prediction)
        else when(splitCol(nd, features, castDouble = true),
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

  /** ONE TAO (Tree Alternating Optimization) pass over a fitted tree
    * (reference taoIteration + optimizeNode, DecisionTree.hs:148-246):
    * bottom-to-top by depth level, each internal node's (feature,
    * threshold) is re-optimized against the rows that REACH it, with
    * both child subtrees held fixed. Only "care points" matter — rows
    * where exactly one fixed subtree predicts the true label
    * (identifyCarePoints, DecisionTree.hs:296-330); the node's split
    * becomes a 1-D classification of desired direction, solved with the
    * SAME per-level percentile + histogram machinery as the fit: one
    * melt + one threshold pass + one count pass per level, split chosen
    * driver-side from tiny (node × feature × bucket) counts. A
    * candidate is admissible only if both sides of the FULL reach set
    * keep `minLeafSize` rows, and it is accepted only when it strictly
    * reduces care-point errors — where the reference would collapse an
    * inadmissible node to a leaf, this pass keeps the current split
    * (never worse than the input tree). Per level, leaves are
    * re-majorized on their current reach set BEFORE the internal nodes
    * above them optimize (the reference's bottom-up order — split
    * decisions see fresh child predictions); a final pass re-labels
    * every leaf against the refined splits and recounts `n` bottom-up.
    *
    * A subtree emptied by an upstream re-split keeps its old prediction
    * with n = 0 (the reference prunes these; one pass leaves them —
    * they are unreachable only for the CURRENT data, and [[taoOptimize]]
    * iterations may repopulate them). */
  def taoRefine(df: DataFrame, tree: Tree, label: String,
                minLeafSize: Int = 1,
                percentiles: Seq[Int] = 10 to 90 by 10): Tree = {
    val spark = df.sparkSession
    val features = tree.features
    val pcts = percentiles.map(_ / 100.0)
    val base = df.select(
      (features.map(f => col(f).cast("double").as(f)) :+
        col(label).cast("string").as("__label")): _*)
      .na.drop(features :+ "__label").cache()
    try {
      var nodes = tree.nodes

      def subtreePred(id: Long): Column = {
        val nd = nodes(id)
        if (nd.feature < 0) lit(nd.prediction)
        else when(splitCol(nd, features),
          subtreePred(nd.left)).otherwise(subtreePred(nd.right))
      }
      // node reached after descending `target` levels (leaves stop early)
      def assignToDepth(id: Long, d: Int, target: Int): Column = {
        val nd = nodes(id)
        if (d == target || nd.feature < 0) lit(id)
        else when(splitCol(nd, features),
          assignToDepth(nd.left, d + 1, target))
          .otherwise(assignToDepth(nd.right, d + 1, target))
      }
      // per-node column dispatched on __node (few nodes per level)
      def byNode(items: Seq[(Long, Column)]): Column =
        items.tail.foldLeft(when(col("__node") === items.head._1, items.head._2)) {
          case (acc, (id, c)) => acc.when(col("__node") === id, c)
        }

      val maxDepth = nodes.values.map(_.depth).max
      for (d <- maxDepth to 0 by -1) {
        // leaves at this level first (reference optimizeNode's Leaf arm):
        // re-majorize on the CURRENT reach set so the internal nodes
        // optimized above them see fresh child predictions
        val leafIds = nodes.values
          .filter(n => n.depth == d && n.feature < 0).map(_.id).toSeq.sorted
        if (leafIds.nonEmpty) {
          val counts = base.withColumn("__node", assignToDepth(1L, 0, d))
            .filter(col("__node").isin(leafIds: _*))
            .groupBy("__node", "__label").count().collect()
            .groupBy(_.getLong(0))
          for ((id, rows) <- counts) {
            val m = rows.map(r => r.getString(1) -> r.getLong(2))
            nodes += id -> nodes(id).copy(n = m.map(_._2).sum,
              prediction = m.maxBy { case (l, c) => (c, l) }._1)
          }
        }
        val internal = nodes.values
          .filter(n => n.depth == d && n.feature >= 0).toSeq.sortBy(_.id)
        if (internal.nonEmpty) {
          val ids = internal.map(_.id)
          // reach rows + fixed-subtree predictions + current direction;
          // __dir: 1 = only LEFT subtree correct, 2 = only RIGHT, 0 = don't care
          val withPred = base
            .withColumn("__node", assignToDepth(1L, 0, d))
            .filter(col("__node").isin(ids: _*))
            .withColumn("__lp", byNode(internal.map(n => n.id -> subtreePred(n.left))))
            .withColumn("__rp", byNode(internal.map(n => n.id -> subtreePred(n.right))))
            .withColumn("__curL", byNode(internal.map(n =>
              n.id -> splitCol(n, features))))
            .withColumn("__dir",
              when(col("__lp") === col("__label") && col("__rp") =!= col("__label"), 1)
                .when(col("__rp") === col("__label") && col("__lp") =!= col("__label"), 2)
                .otherwise(0))
            .select(col("__node"), col("__dir"), col("__curL"),
              posexplode(array(features.map(col): _*)).as(Seq("__f", "__v")))
            .filter(col("__v").isNotNull)
            .cache()
          try {
            // current care-point errors + reach size per node (melted ×
            // |features|: divide back out via the f==0 slice)
            val curRows = withPred.filter(col("__f") === 0)
              .groupBy("__node").agg(
                sum(when((col("__dir") === 1 && !col("__curL")) ||
                  (col("__dir") === 2 && col("__curL")), 1L).otherwise(0L)).as("e"),
                count(lit(1)).as("n"))
              .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
            // candidate thresholds per (node, feature) over the FULL reach set
            val thrMap: Map[(Long, Int), Seq[Double]] = withPred
              .groupBy("__node", "__f")
              .agg(percentile(col("__v"), typedLit(pcts)).as("__thr"))
              .collect().map { r =>
                (r.getLong(0), r.getInt(1)) -> r.getSeq[Double](2).distinct.sorted
              }.toMap
            if (thrMap.nonEmpty) {
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
              // ONE count pass: (node, f, bucket) → total + care-by-direction
              val hist = withPred.join(broadcast(thrDf), Seq("__node", "__f"))
                .withColumn("__bkt", aggregate(col("__thrs"), lit(0),
                  (acc, t) => acc + when(col("__v") > t, 1).otherwise(0)))
                .groupBy("__node", "__f", "__bkt").agg(
                  count(lit(1)).as("t"),
                  sum(when(col("__dir") === 1, 1L).otherwise(0L)).as("cl"),
                  sum(when(col("__dir") === 2, 1L).otherwise(0L)).as("cr"))
                .collect()
                .map(r => ((r.getLong(0), r.getInt(1)),
                  (r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5))))
                .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sortBy(_._1)).toMap
                .withDefaultValue(Seq.empty)

              for (nd <- internal; (curErr, reachN) <- curRows.get(nd.id)) {
                val best = (for {
                  f <- features.indices
                  thrs = thrMap.getOrElse((nd.id, f), Seq.empty[Double])
                  if thrs.nonEmpty
                  byBkt = hist((nd.id, f))
                  clTot = byBkt.map(_._3).sum
                  (thr, ti) <- thrs.zipWithIndex
                } yield {
                  // v <= thrs(ti) ⇔ bkt <= ti (bucket counts thresholds
                  // strictly below v — the fit's convention)
                  val leftSide = byBkt.filter(_._1 <= ti)
                  val lN = leftSide.map(_._2).sum
                  val errs = (clTot - leftSide.map(_._3).sum) +
                    leftSide.map(_._4).sum
                  (errs, f, thr, lN, reachN - lN)
                }).filter(c => c._4 >= minLeafSize && c._5 >= minLeafSize)
                  .sortBy(c => (c._1, c._2, c._3)).headOption
                best match {
                  case Some((errs, f, thr, _, _)) if errs < curErr =>
                    nodes += nd.id -> nodes(nd.id).copy(feature = f,
                      threshold = thr, split2 = None)
                  case _ => // keep the current split
                }
              }
            }
          } finally withPred.unpersist()
        }
      }

      // leaf re-labeling + recount against the refined splits
      val leafCounts = base
        .withColumn("__node", assignToDepth(1L, 0, Int.MaxValue))
        .groupBy("__node", "__label").count().collect()
        .groupBy(_.getLong(0))
      nodes = nodes.map { case (id, nd) =>
        if (nd.feature >= 0) id -> nd
        else leafCounts.get(id) match {
          case Some(rows) =>
            val m = rows.map(r => r.getString(1) -> r.getLong(2))
            id -> nd.copy(n = m.map(_._2).sum,
              prediction = m.maxBy { case (l, c) => (c, l) }._1)
          case None => id -> nd.copy(n = 0L)
        }
      }
      def recount(id: Long): Long = {
        val nd = nodes(id)
        if (nd.feature < 0) nd.n
        else {
          val n = recount(nd.left) + recount(nd.right)
          nodes += id -> nodes(id).copy(n = n)
          n
        }
      }
      recount(1L)
      Tree(nodes, features)
    } finally base.unpersist()
  }

  /** Compound-split TAO pass (the reference's boolean-synthesis split
    * candidates: findBestSplitTAO expands the Synthesis grammar's
    * and/or/not combinations over threshold literals —
    * DecisionTree.hs:121-330 + Synthesis.hs). Same care-point scoring
    * as [[taoRefine]], but candidates are TWO-literal boolean splits
    * `(fi <= ti) op (fj <= tj)` over all feature pairs, both literals'
    * thresholds drawn from the same per-node percentile set, op ranging
    * over the 8-member two-literal family ([[compoundOps]]; XOR needs
    * two levels and stays out, as in the reference grammar).
    *
    * Scale shape: per level, ONE pass computes every feature's per-node
    * bucket index (codegen when-chains over ≤ percentile-count
    * thresholds), then one tiny (node × bi × bj) count aggregate per
    * feature PAIR; the candidate search runs driver-side on 2-D prefix
    * sums, O(1) per (t1, t2, op) candidate. Cost grows as |features|²
    * aggregates per level — use on the handful-of-features frames trees
    * are for, not wide ones (guarded at 16). A compound is accepted
    * only on strictly fewer care-point errors than the CURRENT split
    * (axis or compound), with both sides keeping `minLeafSize` rows of
    * the full reach set — never worse than the input tree.
    *
    * `disallowed` excludes feature PAIRS from the compound search
    * (reference `SynthConfig.disallowedCombinations`,
    * DecisionTree.hs:50-63 — the user's "these two columns must not be
    * combined" constraint, e.g. leaky or collinear pairs). Order-
    * insensitive; a skipped pair also skips its per-pair count
    * aggregate, so exclusions make the pass cheaper, never just
    * filtered-after. Names not in the tree's feature set are ignored
    * (the reference is permissive the same way). */
  def taoRefineCompound(df: DataFrame, tree: Tree, label: String,
                        minLeafSize: Int = 1,
                        percentiles: Seq[Int] = 10 to 90 by 10,
                        disallowed: Seq[(String, String)] = Nil): Tree = {
    require(tree.features.size <= 16,
      "taoRefineCompound: quadratic in features — keep the feature set <= 16")
    val features = tree.features
    val pcts = percentiles.map(_ / 100.0)
    val base = df.select(
      (features.map(f => col(f).cast("double").as(f)) :+
        col(label).cast("string").as("__label")): _*)
      .na.drop(features :+ "__label").cache()
    try {
      var nodes = tree.nodes
      def subtreePred(id: Long): Column = {
        val nd = nodes(id)
        if (nd.feature < 0) lit(nd.prediction)
        else when(splitCol(nd, features),
          subtreePred(nd.left)).otherwise(subtreePred(nd.right))
      }
      def assignToDepth(id: Long, d: Int, target: Int): Column = {
        val nd = nodes(id)
        if (d == target || nd.feature < 0) lit(id)
        else when(splitCol(nd, features),
          assignToDepth(nd.left, d + 1, target))
          .otherwise(assignToDepth(nd.right, d + 1, target))
      }
      def byNode(items: Seq[(Long, Column)]): Column =
        items.tail.foldLeft(when(col("__node") === items.head._1, items.head._2)) {
          case (acc, (id, c)) => acc.when(col("__node") === id, c)
        }

      val maxDepth = nodes.values.map(_.depth).max
      for (d <- maxDepth to 0 by -1) {
        // leaves first, as in taoRefine: fresh child predictions
        val leafIds = nodes.values
          .filter(n => n.depth == d && n.feature < 0).map(_.id).toSeq.sorted
        if (leafIds.nonEmpty) {
          val counts = base.withColumn("__node", assignToDepth(1L, 0, d))
            .filter(col("__node").isin(leafIds: _*))
            .groupBy("__node", "__label").count().collect()
            .groupBy(_.getLong(0))
          for ((id, rows) <- counts) {
            val m = rows.map(r => r.getString(1) -> r.getLong(2))
            nodes += id -> nodes(id).copy(n = m.map(_._2).sum,
              prediction = m.maxBy { case (l, c) => (c, l) }._1)
          }
        }
        val internal = nodes.values
          .filter(n => n.depth == d && n.feature >= 0).toSeq.sortBy(_.id)
        if (internal.nonEmpty) {
          val ids = internal.map(_.id)
          val reach = base
            .withColumn("__node", assignToDepth(1L, 0, d))
            .filter(col("__node").isin(ids: _*))
            .withColumn("__lp", byNode(internal.map(n => n.id -> subtreePred(n.left))))
            .withColumn("__rp", byNode(internal.map(n => n.id -> subtreePred(n.right))))
            .withColumn("__curL", byNode(internal.map(n => n.id -> splitCol(n, features))))
            .withColumn("__dir",
              when(col("__lp") === col("__label") && col("__rp") =!= col("__label"), 1)
                .when(col("__rp") === col("__label") && col("__lp") =!= col("__label"), 2)
                .otherwise(0))

          // per-node percentile thresholds for every feature, one pass
          val thrMap: Map[(Long, Int), Seq[Double]] = reach
            .groupBy("__node")
            .agg(percentile(col(features.head), typedLit(pcts)).as("__t0"),
              features.tail.zipWithIndex.map { case (f, i) =>
                percentile(col(f), typedLit(pcts)).as(s"__t${i + 1}") }: _*)
            .collect().flatMap { r =>
              features.indices.map(i =>
                (r.getLong(0), i) -> r.getSeq[Double](i + 1).distinct.sorted)
            }.toMap

          // bucket index per feature: #thresholds strictly below v,
          // per-node threshold set dispatched on __node
          def bucketOf(thrs: Seq[Double], c: Column): Column =
            thrs.foldLeft(lit(0)) { (acc, t) =>
              acc + when(c > t, 1).otherwise(0) }
          val withBkts = features.indices.foldLeft(reach) { (acc, f) =>
            acc.withColumn(s"__b$f", byNode(ids.map(id =>
              id -> bucketOf(thrMap.getOrElse((id, f), Seq.empty),
                col(features(f))))))
          }.select(col("__node") +: col("__dir") +: col("__curL") +:
            features.indices.map(f => col(s"__b$f")): _*)
            .cache()
          try {
            val curRows = withBkts.groupBy("__node").agg(
              sum(when((col("__dir") === 1 && !col("__curL")) ||
                (col("__dir") === 2 && col("__curL")), 1L).otherwise(0L)).as("e"),
              count(lit(1)).as("n"),
              sum(when(col("__dir") === 1, 1L).otherwise(0L)).as("cl"))
              .collect()
              .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
              .toMap

            val blocked = disallowed
              .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
            val pairs = for { i <- features.indices; j <- features.indices
                              if i < j &&
                                !blocked((features(i), features(j))) }
              yield (i, j)
            // per node: best (errs, opIdx, i, j, t1, t2) across all pairs
            val best = scala.collection.mutable.Map.empty[Long,
              (Long, Int, Int, Int, Double, Double)]
            for ((i, j) <- pairs) {
              val cells = withBkts.groupBy("__node", s"__b$i", s"__b$j").agg(
                count(lit(1)).as("t"),
                sum(when(col("__dir") === 1, 1L).otherwise(0L)).as("cl"),
                sum(when(col("__dir") === 2, 1L).otherwise(0L)).as("cr"))
                .collect()
                .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2),
                  r.getLong(3), r.getLong(4), r.getLong(5))))
                .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
              for (nd <- internal; nodeCells <- cells.get(nd.id)) {
                val (curErr, reachN, clTot) = curRows(nd.id)
                val ti = thrMap.getOrElse((nd.id, i), Seq.empty)
                val tj = thrMap.getOrElse((nd.id, j), Seq.empty)
                if (ti.nonEmpty && tj.nonEmpty) {
                  val (ni, nj) = (ti.size + 1, tj.size + 1)
                  // prefix sums over (bi <= x, bj <= y) for t/cl/cr
                  val pt = Array.ofDim[Long](ni + 1, nj + 1)
                  val pcl = Array.ofDim[Long](ni + 1, nj + 1)
                  val pcr = Array.ofDim[Long](ni + 1, nj + 1)
                  for ((bi, bj, t, cl, cr) <- nodeCells) {
                    pt(bi + 1)(bj + 1) += t; pcl(bi + 1)(bj + 1) += cl
                    pcr(bi + 1)(bj + 1) += cr
                  }
                  for (p <- Seq(pt, pcl, pcr); x <- 1 to ni; y <- 1 to nj)
                    p(x)(y) += p(x - 1)(y) + p(x)(y - 1) - p(x - 1)(y - 1)
                  val (totT, totCl, totCr) = (pt(ni)(nj), pcl(ni)(nj), pcr(ni)(nj))
                  for (x <- 1 to ti.size; y <- 1 to tj.size;
                       (op, opIdx) <- compoundOps.zipWithIndex) {
                    // rectangle = (fi <= ti(x-1)) && (fj <= tj(y-1))
                    def sel(p: Array[Array[Long]], tot: Long): Long = {
                      op match {
                        case "and" => p(x)(y)
                        case "andnot" => p(x)(nj) - p(x)(y)
                        case "notand" => p(ni)(y) - p(x)(y)
                        case "nor" => tot - p(x)(nj) - p(ni)(y) + p(x)(y)
                        case "or" => p(x)(nj) + p(ni)(y) - p(x)(y)
                        case "ornot" => tot - p(ni)(y) + p(x)(y)
                        case "notor" => tot - p(x)(nj) + p(x)(y)
                        case "nand" => tot - p(x)(y)
                      }
                    }
                    val lN = sel(pt, totT)
                    val rN = totT - lN
                    if (lN >= minLeafSize && rN >= minLeafSize) {
                      val errs = (totCl - sel(pcl, totCl)) + sel(pcr, totCr)
                      if (errs < curErr) {
                        val cand = (errs, opIdx, i, j, ti(x - 1), tj(y - 1))
                        val better = best.get(nd.id).forall(b =>
                          Ordering[(Long, Int, Int, Int, Double, Double)]
                            .lt(cand, b))
                        if (better) best(nd.id) = cand
                      }
                    }
                  }
                }
              }
            }
            for ((id, (_, opIdx, i, j, t1, t2)) <- best)
              nodes += id -> nodes(id).copy(feature = i, threshold = t1,
                split2 = Some((compoundOps(opIdx), j, t2)))
          } finally withBkts.unpersist()
        }
      }

      // leaf re-labeling + recount against the refined splits
      val leafCounts = base
        .withColumn("__node", assignToDepth(1L, 0, Int.MaxValue))
        .groupBy("__node", "__label").count().collect()
        .groupBy(_.getLong(0))
      nodes = nodes.map { case (id, nd) =>
        if (nd.feature >= 0) id -> nd
        else leafCounts.get(id) match {
          case Some(rows) =>
            val m = rows.map(r => r.getString(1) -> r.getLong(2))
            id -> nd.copy(n = m.map(_._2).sum,
              prediction = m.maxBy { case (l, c) => (c, l) }._1)
          case None => id -> nd.copy(n = 0L)
        }
      }
      def recount(id: Long): Long = {
        val nd = nodes(id)
        if (nd.feature < 0) nd.n
        else {
          val n = recount(nd.left) + recount(nd.right)
          nodes += id -> nodes(id).copy(n = n)
          n
        }
      }
      recount(1L)
      Tree(nodes, features)
    } finally base.unpersist()
  }

  /** TAO loop (reference taoOptimize, DecisionTree.hs:121-146): repeat
    * [[taoRefine]] passes until the misclassification-rate improvement
    * drops below `tol` (one scan-stage aggregate per iteration) or
    * `iterations` passes ran. Never worse than the input tree: each
    * pass only accepts strictly-improving node splits. */
  def taoOptimize(df: DataFrame, tree: Tree, label: String,
                  iterations: Int = 10, tol: Double = 1e-6,
                  minLeafSize: Int = 1,
                  percentiles: Seq[Int] = 10 to 90 by 10,
                  compound: Boolean = false,
                  disallowed: Seq[(String, String)] = Nil): Tree = {
    require(iterations >= 1 && tol >= 0)
    def loss(t: Tree): Double = df
      .select(t.predictColumn.as("__p"), col(label).cast("string").as("__l"))
      .na.drop(Seq("__l"))
      .agg(avg(when(col("__p") =!= col("__l"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    var cur = tree
    var curLoss = loss(cur)
    var i = 0
    var converged = false
    while (i < iterations && !converged) {
      val axis = taoRefine(df, cur, label, minLeafSize, percentiles)
      val next = if (compound)
        taoRefineCompound(df, axis, label, minLeafSize, percentiles,
          disallowed)
      else axis
      val nextLoss = loss(next)
      converged = curLoss - nextLoss < tol
      cur = next
      curLoss = nextLoss
      i += 1
    }
    cur
  }

  /** greedy CART fit + TAO refinement — the reference's
    * fitDecisionTree composition (DecisionTree.hs:97-118). */
  def fitClassifierTao(df: DataFrame, features: Seq[String], label: String,
                       maxDepth: Int = 4, minSamplesSplit: Int = 5,
                       minLeafSize: Int = 1, taoIterations: Int = 10,
                       taoTol: Double = 1e-6,
                       percentiles: Seq[Int] = 10 to 90 by 10,
                       compound: Boolean = false,
                       disallowed: Seq[(String, String)] = Nil): Tree = {
    val greedy = fitClassifier(df, features, label, maxDepth,
      minSamplesSplit, minLeafSize, percentiles)
    taoOptimize(df, greedy, label, taoIterations, taoTol, minLeafSize,
      percentiles, compound, disallowed)
  }
}
