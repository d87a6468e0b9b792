package graft.sources

import org.apache.spark.sql.types._

/** Fixed schemas for the three trip record families.
  *
  * The reference (Amoako419/Real-Time_Trip_Processing) is schema-on-read:
  * pandas `read_csv` (scripts/to_kinesis.py:15,28) plus an attribute-copy
  * loop (scripts/lambda1.py:66-88). We declare explicit `StructType`s so the
  * plan is fully typed for Catalyst while `from_json` stays permissive
  * (extra/missing JSON fields -> null), matching the reference's tolerant
  * behavior (SURVEY.md par.1.3).
  *
  * All numerics are DoubleType: the reference computes in float64 end-to-end
  * (pandas); DynamoDB's Decimal is only a transport encoding
  * (scripts/glue_scripts.py:64). Timestamps travel as strings on the wire
  * (scripts/to_kinesis.py:50,74) and are parsed lazily with coercion
  * (scripts/glue_scripts.py:115) -> we keep wire columns StringType and
  * expose parsed TimestampType columns in the sources.
  */
object TripSchemas {

  /** trip_start wire event, scripts/to_kinesis.py:48-61. */
  val tripStartEvent: StructType = StructType(Seq(
    StructField("trip_id", StringType, nullable = false),
    StructField("pickup_datetime", StringType),
    StructField("data_type", StringType),
    StructField("pickup_location_id", IntegerType),
    StructField("dropoff_location_id", IntegerType),
    StructField("vendor_id", IntegerType),
    StructField("estimated_dropoff_datetime", StringType),
    StructField("estimated_fare_amount", DoubleType),
    StructField("record_id", StringType)
  ))

  /** trip_end wire event, scripts/to_kinesis.py:72-87. */
  val tripEndEvent: StructType = StructType(Seq(
    StructField("trip_id", StringType, nullable = false),
    StructField("dropoff_datetime", StringType),
    StructField("data_type", StringType),
    StructField("rate_code", DoubleType),
    StructField("payment_type", DoubleType),
    StructField("fare_amount", DoubleType),
    StructField("trip_distance", DoubleType),
    StructField("tip_amount", DoubleType),
    StructField("trip_type", DoubleType),
    StructField("passenger_count", DoubleType),
    StructField("record_id", StringType)
  ))

  /** Union wire schema: one JSON event stream carries both families
    * (the Kinesis stream, scripts/to_kinesis.py:63-67,89-93); absent
    * fields null out per family.
    */
  val tripEvent: StructType = StructType(
    (tripStartEvent.fields ++
      tripEndEvent.fields.filterNot(f =>
        tripStartEvent.fieldNames.contains(f.name))).toSeq)

  /** trip_start.csv columns (data/Trip_Start/trip_start.csv:1). */
  val tripStartCsv: StructType = StructType(Seq(
    StructField("trip_id", StringType, nullable = false),
    StructField("pickup_location_id", IntegerType),
    StructField("dropoff_location_id", IntegerType),
    StructField("vendor_id", IntegerType),
    StructField("pickup_datetime", TimestampType),
    StructField("estimated_dropoff_datetime", TimestampType),
    StructField("estimated_fare_amount", DoubleType)
  ))

  /** trip_end.csv columns (data/Trip_End/trip_end.csv:1). */
  val tripEndCsv: StructType = StructType(Seq(
    StructField("dropoff_datetime", TimestampType),
    StructField("rate_code", DoubleType),
    StructField("passenger_count", DoubleType),
    StructField("trip_distance", DoubleType),
    StructField("fare_amount", DoubleType),
    StructField("tip_amount", DoubleType),
    StructField("payment_type", DoubleType),
    StructField("trip_type", DoubleType),
    StructField("trip_id", StringType, nullable = false)
  ))
}

/** Typed seams (SURVEY.md par.1.3): Dataset[T] at module boundaries. */
case class TripStart(
    trip_id: String,
    pickup_datetime: java.sql.Timestamp,
    pickup_location_id: Option[Int],
    dropoff_location_id: Option[Int],
    vendor_id: Option[Int],
    estimated_dropoff_datetime: Option[java.sql.Timestamp],
    estimated_fare_amount: Option[Double])

case class TripEnd(
    trip_id: String,
    dropoff_datetime: java.sql.Timestamp,
    rate_code: Option[Double],
    payment_type: Option[Double],
    fare_amount: Option[Double],
    trip_distance: Option[Double],
    tip_amount: Option[Double],
    trip_type: Option[Double],
    passenger_count: Option[Double])

/** Merge of a matched start+end pair (scripts/lambda2.py:66-109). */
case class CompletedTrip(
    trip_id: String,
    pickup_datetime: java.sql.Timestamp,
    dropoff_datetime: java.sql.Timestamp,
    pickup_location_id: Option[Int],
    dropoff_location_id: Option[Int],
    vendor_id: Option[Int],
    estimated_fare_amount: Option[Double],
    rate_code: Option[Double],
    payment_type: Option[Double],
    fare_amount: Option[Double],
    trip_distance: Option[Double],
    tip_amount: Option[Double],
    trip_type: Option[Double],
    passenger_count: Option[Double],
    status: String)

/** One daily-KPI row (scripts/glue_scripts.py:139-161). */
case class DailyKpi(
    pickup_date: java.sql.Date,
    total_fare: Double,
    trip_count: Long,
    average_fare: Double,
    maximum_fare: Double,
    minimum_fare: Double)
