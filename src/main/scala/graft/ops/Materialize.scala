package graft.ops

import org.apache.spark.sql.DataFrame

/** Process-wide materialization strategy for the engine's iterative
  * and multi-consumer operators (pageRank, mmrDiversify,
  * connectedComponents, BPE rounds, the incremental dedup family,
  * packing prefix sums, ...). Each of those pins an intermediate frame
  * once per round so (a) lineage stays round-deep-1 instead of
  * re-deriving exponentially, and (b) frames consumed by several
  * downstream branches compute once.
  *
  * HOW a frame pins is a deployment decision, not a per-operator one,
  * so it lives here as one shared knob:
  *
  *  - [[Local]] (default) — `localCheckpoint()`: executor-local
  *    blocks, no DFS write. Fast, and right for local[...] runs and
  *    short batch jobs — but NOT executor-loss tolerant: losing an
  *    executor on a real cluster loses its blocks and fails the job
  *    (lineage was truncated, so there is nothing to recompute from).
  *  - [[Reliable]] — `checkpoint()` into a DFS directory: each pin is
  *    a write+read of the frame, but a 1000-executor, hours-long run
  *    survives individual executor loss. Set this once at job start
  *    for 100 TB-scale runs.
  *  - [[Off]] — no pinning: pure lineage. Only sensible for tiny
  *    inputs or plans the caller pins themselves; iterative lineage
  *    grows per round.
  *
  * Operators keep their `materialize: Boolean` parameter — it answers
  * "pin here at all?" (some callers compose the op into a larger plan
  * they pin once); the strategy answers "pin HOW". The knob is a
  * process-wide `@volatile var` deliberately: it is set once during
  * job bootstrap (like `SparkContext.setCheckpointDir` itself), not
  * flipped mid-query.
  */
object Materialize {

  sealed trait Strategy {
    private[graft] def pinFrame(df: DataFrame): DataFrame
  }

  /** Executor-local checkpoint — fast, not executor-loss tolerant. */
  case object Local extends Strategy {
    private[graft] def pinFrame(df: DataFrame): DataFrame =
      df.localCheckpoint()
  }

  /** Reliable checkpoint into `dir` (any Hadoop-visible path; on a
    * cluster use a DFS path all executors reach). Sets the context's
    * checkpoint dir on first use if the caller hasn't already. */
  final case class Reliable(dir: String) extends Strategy {
    private[graft] def pinFrame(df: DataFrame): DataFrame = {
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
      df.checkpoint()
    }
  }

  /** No pinning — lineage grows with iterations; caller's problem. */
  case object Off extends Strategy {
    private[graft] def pinFrame(df: DataFrame): DataFrame = df
  }

  @volatile var strategy: Strategy = Local

  /** Pin `df` per the current strategy. */
  private[graft] def pin(df: DataFrame): DataFrame = strategy.pinFrame(df)

  /** Pin `df` per the current strategy iff `enabled` (the operators'
    * `materialize` flag). */
  private[graft] def pin(df: DataFrame, enabled: Boolean): DataFrame =
    if (enabled) strategy.pinFrame(df) else df

  private val batchLock = new Object

  /** Run `body` with exclusive pin-and-release rights on the shared
    * SparkContext: snapshot the CONTEXT-GLOBAL persistent-RDD map, run
    * the body, release exactly the RDDs it added (never the caller's
    * standing pins — broadcast model tables are not persistent RDDs
    * and are untouched). The JVM-wide lock is what makes the global
    * diff SOUND: two interleaved foreachBatch bodies on one context
    * would otherwise release each other's in-flight pins, and a
    * localCheckpoint whose blocks are dropped mid-job is unrecoverable
    * by construction (lineage is truncated). Micro-batches are short;
    * serializing them is the correct trade. */
  private[graft] def withBatchRelease[T](
      spark: org.apache.spark.sql.SparkSession)(body: => T): T =
    batchLock.synchronized {
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet
      try body
      finally sc.getPersistentRDDs.foreach { case (rddId, rdd) =>
        if (!before.contains(rddId)) rdd.unpersist(blocking = false)
      }
    }
}
