package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata (TESTDATA.md): one parquet per table. */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Session config every graft session needs: `events.ts` is parquet
    * TIMESTAMP(NANOS), which Spark's vectorized reader rejects
    * (PARQUET_TYPE_ILLEGAL) unless nanos columns are read as Long.
    * SESSION-WIDE effect by design — every nanos-timestamp parquet column
    * in the session comes back BIGINT; [[events]] is the only such table
    * here and re-encodes it. Called once by the session builders
    * (Verify/Bench/SparkTestBase), not per table load.
    */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  /** Reads the nanos Long (see [[configure]]) and truncates to micros —
    * exactly what DuckDB does internally when it loads a TIMESTAMP_NS
    * column, so oracle comparisons stay bit-identical.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // defensive + idempotent: a session built outside the in-repo
    // builders (which all call configure) would otherwise fail the nanos
    // read with PARQUET_TYPE_ILLEGAL
    configure(spark)
    apply(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
}
