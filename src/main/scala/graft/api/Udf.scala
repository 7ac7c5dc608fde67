package graft.api

import scala.reflect.runtime.universe.TypeTag
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Aggregator

/** The sanctioned user-code escape hatch — the reference's `lift`/`lift2`
  * scalar UDFs (Functions.hs:63-105) and `reduce` fold aggregate
  * (Functions.hs:237-240).
  *
  * A lifted Scala function runs outside whole-stage codegen (ser/de per
  * row), so the native Column DSL in [[functions]] is always preferred in
  * hot paths; this exists so users with genuinely custom logic never have
  * to leave the engine.
  *
  * `reduce` diverges deliberately from the reference: a single-node
  * engine can left-fold a column sequentially, but a distributed fold
  * needs an associative `merge` of partial accumulators — so the Spark
  * surface requires one (SURVEY §4.3). Per-partition folds run map-side;
  * only accumulators shuffle.
  */
object Udf {

  /** lift a unary Scala function into the expression DSL
    * (Functions.hs:63-65). Null inputs short-circuit to null (the
    * reference lifts over Maybe the same way). */
  def lift[A: TypeTag, B: TypeTag](f: A => B): Column => Column = {
    val u = F.udf((a: A) => Option(a).map(f))
    c => u(c)
  }

  /** lift a binary Scala function (Functions.hs:67-77). */
  def lift2[A: TypeTag, B: TypeTag, C: TypeTag](f: (A, B) => C): (Column, Column) => Column = {
    val u = F.udf((a: A, b: B) =>
      if (a == null || b == null) None else Some(f(a, b)))
    (a, b) => u(a, b)
  }

  /** user fold-aggregate over a column: `start`, per-row `fold`, and the
    * associative `merge` of two partial accumulators. Returns a Column
    * usable anywhere a built-in aggregate is (groupBy.agg, Frame
    * aggregate). */
  def reduce[B: TypeTag, A](start: A, fold: (A, B) => A, merge: (A, A) => A)(
      c: Column)(implicit accEnc: Encoder[A]): Column = {
    val agg = new FoldAggregator[B, A](start, fold, merge, accEnc)
    F.udaf(agg).apply(c)
  }

  private final class FoldAggregator[B, A](
      start: A, fold: (A, B) => A, comb: (A, A) => A, accEnc: Encoder[A])
    extends Aggregator[B, A, A] {
    def zero: A = start
    def reduce(acc: A, x: B): A = fold(acc, x)
    def merge(a: A, b: A): A = comb(a, b)
    def finish(a: A): A = a
    def bufferEncoder: Encoder[A] = accEnc
    def outputEncoder: Encoder[A] = accEnc
  }
}
