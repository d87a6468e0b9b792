package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ZValueFunctions

/** Physical data layout for multi-dimensional pruning. A 100 TB table
  * is read through its file/row-group min-max statistics; which rows a
  * filter can SKIP is decided entirely by how rows were clustered at
  * write time. [[zOrdered]] produces the two-filter-column layout:
  * sort by the Morton interleave ([[graft.functions.ZValue]]) so every
  * output file covers a compact rectangle of the (x, y) key space and
  * min/max pruning works on either dimension — a lexicographic
  * `ORDER BY x, y` layout prunes only on the leading column.
  */
object Layout {

  /** Rows re-clustered by the Morton code of two bounded dimension
    * keys: range-partitioned on the code (each partition = a compact
    * z-range, globally ordered across partitions) and sorted within, so
    * a parquet write emits files whose (x, y) bounding boxes tile the
    * key space instead of spanning it. Callers bound the keys into the
    * 16-bit Morton domain (e.g. `col("k").bitwiseAND(4095)`).
    *
    * The z column is dropped before returning: layout is a physical
    * property, not schema.
    */
  def zOrdered(df: DataFrame, x: Column, y: Column,
      partitions: Int): DataFrame =
    df.withColumn("_zv", ZValueFunctions.zValue(x, y))
      .repartitionByRange(partitions, col("_zv"))
      .sortWithinPartitions(col("_zv"))
      .drop("_zv")
}
