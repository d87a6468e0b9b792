package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.TripSources

/** Reference CSVs → the producer's wire JSON (string timestamps, null
  * fields omitted — exactly what from_json tolerates), shared by every
  * golden streaming replay (scripts/to_kinesis.py:48-93).
  */
object GoldenFeed {
  def wireJson(spark: SparkSession): Array[String] = {
    import spark.implicits._
    val refData = "/root/reference/data"
    val starts = TripSources.readTripStartCsv(spark, s"$refData/Trip_Start")
    val ends = TripSources.producerAdmittedEnds(
      TripSources.readTripEndCsv(spark, s"$refData/Trip_End"))
    val sj = starts.select(to_json(struct(
      col("trip_id"),
      date_format(col("pickup_datetime"), "yyyy-MM-dd HH:mm:ss")
        .as("pickup_datetime"),
      lit("trip_start").as("data_type"),
      col("pickup_location_id"), col("dropoff_location_id"), col("vendor_id"),
      date_format(col("estimated_dropoff_datetime"), "yyyy-MM-dd HH:mm:ss")
        .as("estimated_dropoff_datetime"),
      col("estimated_fare_amount"))).as("value"))
    val ej = ends.select(to_json(struct(
      col("trip_id"),
      date_format(col("dropoff_datetime"), "yyyy-MM-dd HH:mm:ss")
        .as("dropoff_datetime"),
      lit("trip_end").as("data_type"),
      col("rate_code"), col("payment_type"), col("fare_amount"),
      col("trip_distance"), col("tip_amount"), col("trip_type"),
      col("passenger_count"))).as("value"))
    sj.unionByName(ej).as[String].collect()
  }
}
