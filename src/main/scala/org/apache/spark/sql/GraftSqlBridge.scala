package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Minimal bridge into Spark's `private[sql]` surface, required by the
  * graft V1 streaming SOURCE: `MicroBatchExecution` asserts that the
  * DataFrame a V1 `Source.getBatch` returns is tagged
  * `isStreaming = true`, and the only constructor for such a frame is
  * `SparkSession.internalCreateDataFrame(_, _, isStreaming = true)` —
  * `private[sql]` with no public equivalent. Declaring this one-method
  * object inside the `org.apache.spark.sql` package is the established
  * out-of-tree-source idiom for that API gap; nothing else reaches
  * through the boundary. */
object GraftSqlBridge {
  def streamingDataFrame(sqlContext: SQLContext,
      rows: RDD[InternalRow], schema: StructType): DataFrame =
    sqlContext.sparkSession.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rows, schema, isStreaming = true)
}
