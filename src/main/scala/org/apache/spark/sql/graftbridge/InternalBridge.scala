package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** DataFrame-from-InternalRow bridge. `internalCreateDataFrame` is
  * `private[sql]` in Spark 4; exposing it from this subpackage lets
  * graft build frames from UnsafeRow RDDs without the Row-encoder
  * round trip (used by Frame.indexed — see the rationale there). */
object InternalBridge {
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
                              schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
