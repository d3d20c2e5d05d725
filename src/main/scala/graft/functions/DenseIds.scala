package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale-safe contiguous id assignment.
  *
  * `dense_rank().over(Window.orderBy(key))` yields deterministic
  * contiguous ids but funnels EVERY row through one task — the clearest
  * 100×-scale killer there is. The same ids can be produced fully in
  * parallel: range-repartition on the key (a normal range shuffle whose
  * partition boundaries are ordered), sort within each partition, and
  * `zipWithIndex` (one lightweight extra job to compute per-partition
  * offsets). The global order — and therefore every id — is identical
  * to the window's, because range partitions are themselves ordered.
  */
object DenseIds {

  /** Appends contiguous 0-based `idCol` (long) in ascending `keyCol`
    * order to a frame whose `keyCol` is UNIQUE per row (typically a
    * post-aggregation frame — one row per group key). Equivalent to
    * `dense_rank().over(Window.orderBy(keyCol)) - 1` on such a frame,
    * but computed with parallel tasks; the input is evaluated once. */
  def zipDenseIds(df: DataFrame, keyCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(col(keyCol)).sortWithinPartitions(keyCol)
    val schema = StructType(sorted.schema.fields :+
      StructField(idCol, LongType, nullable = false))
    spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
  }

  /** (keyCol, idCol) dimension: contiguous 0-based ids over the DISTINCT
    * values of `keyCol`, ascending — join it back to assign group ids
    * when the source frame has repeated keys. */
  def denseSortIds(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    zipDenseIds(df.select(keyCol).distinct(), keyCol, idCol)
}
