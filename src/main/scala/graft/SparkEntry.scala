package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextAnalysis, TextHash}
import graft.operators.{KpiAggregator, RawEventStore, TripMatcher}
import graft.sources.TripSources

/** Driver contract — one named query per implemented operator of
  * SURVEY.md par.2, each with a DuckDB-equivalent oracle SQL over the same
  * parquet tables (TESTDATA.md). Mapping of the reference's trip domain
  * onto the testdata: `events` plays the trip-event stream, `orders` plays
  * trip_start, `lineitem` plays trip_end (FIXTURES.md par.2).
  *
  * Determinism rules (SURVEY.md par.7.3): no uuid()/current_timestamp()
  * columns in verified outputs; floating-point aggregates rounded the same
  * way on both sides so Spark's partial-agg accumulation order can't flip
  * low bits vs DuckDB's sequential scan.
  */
object SparkEntry {

  /** Flagship query on sf=0.001 (SURVEY.md par.7.2 analog): start-end match
    * join + daily five-KPI aggregate. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    completedTripKpis(spark, "/root/testdata/sf0.001")

  // ---- shared builders ----------------------------------------------------

  /** Floating-point aggregate stabilizer for oracle comparison: truncate at
    * 10^-n via floor(x*10^n)/10^n. Unlike round(), which Spark evaluates on
    * the DECIMAL STRING (HALF_UP) and DuckDB on the BINARY double, this is
    * pure IEEE-754 arithmetic and therefore bit-identical across engines.
    */
  private def trunc(c: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    val p = math.pow(10, n)
    floor(c * lit(p)) / lit(p)
  }
  private def trunc4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = trunc(c, 4)

  private def joinedTrips(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).join(Tables.lineitem(s, dir),
      col("o_orderkey") === col("l_orderkey"), "inner")

  private def completedTripKpis(s: SparkSession, dir: String): DataFrame =
    KpiAggregator.dailyKpis(joinedTrips(s, dir),
        to_date(col("o_orderdate")), col("l_extendedprice"), col("l_orderkey"))
      .select(col("pickup_date"),
        trunc(col("total_fare"), 2).as("total_fare"),
        col("trip_count"),
        trunc(col("average_fare"), 4).as("average_fare"),
        col("maximum_fare"), col("minimum_fare"))

  private def eventKeys(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(col("event_id"),
      concat_ws("#", lit("RAW"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).as("sk"))

  // ---- the contract -------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1+P10: the five daily KPIs as ONE fused hash aggregate
    // (glue_scripts.py:139-161 rewritten per SURVEY.md par.4 rewrite 1).
    "trip_kpis_daily" -> ((s, dir) => {
      Tables.events(s, dir)
        .filter(col("value").isNotNull && !isnan(col("value")))
        .groupBy(to_date(col("ts")).as("pickup_date"))
        .agg(trunc(sum(col("value")), 4).as("total_fare"),
          count(col("event_id")).as("trip_count"),
          trunc(avg(col("value")), 4).as("average_fare"),
          max(col("value")).as("maximum_fare"),
          min(col("value")).as("minimum_fare"))
    }),

    // J4: the reference's literal 5-aggregate + 4-left-join KPI assembly
    // (glue_scripts.py:171-175); must equal trip_kpis_daily.
    "trip_kpis_literal_join" -> ((s, dir) => {
      KpiAggregator.dailyKpisLiteral(Tables.events(s, dir),
          to_date(col("ts")), col("value"), col("event_id"))
        .select(col("pickup_date"),
          trunc(col("total_fare"), 4).as("total_fare"),
          col("trip_count"),
          trunc(col("average_fare"), 4).as("average_fare"),
          col("maximum_fare"), col("minimum_fare"))
    }),

    // J1/J2/J3: start-end equi-join + merge projection with collision
    // policy (lambda2.py:66-109). orders=starts, lineitem=ends.
    "completed_trips" -> ((s, dir) => {
      val starts = Tables.orders(s, dir).withColumnRenamed("o_orderkey", "trip_id")
      val ends = Tables.lineitem(s, dir).withColumnRenamed("l_orderkey", "trip_id")
      TripMatcher.mergeProjection(starts, ends)
    }),

    // The flagship (SURVEY.md par.7.2): join + daily KPI aggregate.
    "completed_trip_kpis" -> ((s, dir) => completedTripKpis(s, dir)),

    // Anti-join: still-unmatched starts, the derived `status='raw'` set
    // (README.md:57 semantics made declarative).
    "unmatched_trips" -> ((s, dir) => {
      val starts = Tables.orders(s, dir).withColumnRenamed("o_orderkey", "trip_id")
      val ends = Tables.lineitem(s, dir).withColumnRenamed("l_orderkey", "trip_id")
      TripMatcher.unmatchedStarts(starts, ends)
    }),

    // D1: first-occurrence dedup on the natural key (lambda1.py:119-150).
    "dedup_first_wins" -> ((s, dir) =>
      RawEventStore.dedupFirstWins(Tables.events(s, dir),
        Seq("user_id", "event_type"), Seq("ts", "event_id"))),

    // P2: required-field validation with type-appropriate rule
    // (lambda1.py:38-47).
    "validated_events" -> ((s, dir) => {
      Tables.events(s, dir).filter(
        col("event_id").isNotNull && col("event_type").isNotNull &&
          when(col("event_type") === "purchase", col("value").isNotNull)
            .otherwise(col("ts").isNotNull))
    }),

    // P3: NaN/Infinity nulls the attribute, keeps the row
    // (lambda1.py:72-82). Non-finite values injected deterministically
    // since the testdata has none.
    "sanitized_values" -> ((s, dir) => {
      val seeded = Tables.events(s, dir).select(col("event_id"),
        when(col("event_id") % 7 === 0, lit(Double.NaN))
          .when(col("event_id") % 11 === 0, lit(Double.PositiveInfinity))
          .otherwise(col("value")).as("value_clean"))
      TripSources.sanitizeNumerics(seeded, Seq("value_clean"))
    }),

    // P5: sort-key synthesis SK = RAW#{type}#{ts} (lambda1.py:56).
    "event_keys" -> ((s, dir) => eventKeys(s, dir)),

    // P6: prefix predicate on the synthesized key (lambda2.py:42-52).
    "raw_prefix_filter" -> ((s, dir) =>
      eventKeys(s, dir).filter(col("sk").startsWith("RAW#click"))),

    // P7: event-family domain filter (lambda2.py:209-212).
    "trip_type_filter" -> ((s, dir) =>
      Tables.events(s, dir).filter(col("event_type").isin("click", "view"))),

    // P8: timestamp parse with coercion; invalid -> null -> dropped
    // (glue_scripts.py:113-119). Malformed strings injected.
    "ts_parse_coerce" -> ((s, dir) => {
      Tables.events(s, dir).select(col("event_id"),
          when(col("event_id") % 10 === 0, lit("not-a-date"))
            .otherwise(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).as("ts_str"))
        .withColumn("parsed_ts",
          try_to_timestamp(col("ts_str"), lit("yyyy-MM-dd HH:mm:ss")))
        .filter(col("parsed_ts").isNotNull)
        .select("event_id", "parsed_ts")
    }),

    // P9: numeric parse with coercion + null-drop (glue_scripts.py:121-126).
    "numeric_parse_coerce" -> ((s, dir) => {
      Tables.events(s, dir).select(col("event_id"),
          when(col("event_id") % 13 === 0, lit("abc"))
            .otherwise(col("value").cast("string")).as("fare_str"))
        .withColumn("fare", expr("try_cast(fare_str AS DOUBLE)"))
        .filter(col("fare").isNotNull && !isnan(col("fare")))
        .select("event_id", "fare")
    }),

    // P10: timestamp -> date projection (glue_scripts.py:136).
    "date_projection" -> ((s, dir) =>
      Tables.events(s, dir).select(col("event_id"),
        to_date(col("ts")).as("event_date"))),

    // O1/O2: union of both families + global event-time interleave
    // (to_kinesis.py:117-123). Replay-only operator: full-shuffle sort.
    "union_interleave" -> ((s, dir) => {
      val starts = Tables.orders(s, dir).select(col("o_orderkey").as("id"),
        col("o_orderdate").as("event_time"), lit("trip_start").as("data_type"))
      val ends = Tables.lineitem(s, dir).select(col("l_orderkey").as("id"),
        col("l_shipdate").as("event_time"), lit("trip_end").as("data_type"))
      starts.unionByName(ends).orderBy("event_time", "data_type", "id")
    }),

    // O4: first-match-per-key (lambda2.py:54-56) as row_number()==1.
    "first_per_key" -> ((s, dir) =>
      RawEventStore.dedupFirstWins(Tables.events(s, dir),
        Seq("user_id"), Seq("ts", "event_id"))),

    // A3: frequency count / value_counts (notebook cell 15).
    "freq_count" -> ((s, dir) =>
      KpiAggregator.freqCount(Tables.events(s, dir), to_date(col("ts")))),

    // A4: per-column null profile (notebook cells 3,7).
    "null_profile" -> ((s, dir) =>
      KpiAggregator.nullProfile(Tables.events(s, dir),
        Seq("event_id", "ts", "user_id", "event_type", "value", "props"))),

    // A2: report metadata aggregates (glue_scripts.py:196-205).
    "report_metadata" -> ((s, dir) => {
      val trips = joinedTrips(s, dir)
      val kpis = KpiAggregator.dailyKpis(trips,
        to_date(col("o_orderdate")), col("l_extendedprice"), col("l_orderkey"))
      KpiAggregator.reportMetadata(trips, kpis, to_date(col("o_orderdate")))
    }),

    // ---- training-data pipeline: text analysis over `documents` ----------

    // T1: token counting — whitespace + BPE-ish regex tokens.
    "doc_token_counts" -> ((s, dir) =>
      TextAnalysis.withTokenCounts(Tables.documents(s, dir))
        .select(col("doc_id"), col("ws_tokens").cast("long").as("ws_tokens"),
          col("bpe_tokens").cast("long").as("bpe_tokens"))),

    // T2: quality scoring — length/punct/stopword ratios + composite.
    "doc_quality" -> ((s, dir) =>
      TextAnalysis.withQualityScore(Tables.documents(s, dir))
        .select(col("doc_id"),
          trunc4(col("len_score")).as("len_score"),
          trunc4(col("punct_ratio")).as("punct_ratio"),
          trunc4(col("stopword_ratio")).as("stopword_ratio"),
          trunc4(col("quality_score")).as("quality_score"))),

    // T3: language-ID by function-word/script hits.
    "doc_lang_id" -> ((s, dir) =>
      TextAnalysis.withLangId(Tables.documents(s, dir))
        .select("doc_id", "lang_pred")),

    // T4: rolling-hash fingerprint (min 60-bit hash over 8-char shingles)
    // + whole-text md5.
    "doc_fingerprint" -> ((s, dir) =>
      TextAnalysis.withFingerprint(Tables.documents(s, dir))
        .select("doc_id", "fingerprint", "md5_fingerprint"))
  )

  def oracleSql: Map[String, String] = Map(
    "trip_kpis_daily" ->
      """SELECT CAST(ts AS DATE) AS pickup_date, floor(sum(value)*10000)/10000 AS total_fare,
        |count(event_id) AS trip_count, floor(avg(value)*10000)/10000 AS average_fare,
        |max(value) AS maximum_fare, min(value) AS minimum_fare
        |FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        |GROUP BY CAST(ts AS DATE)""".stripMargin,

    "trip_kpis_literal_join" ->
      """SELECT CAST(ts AS DATE) AS pickup_date, floor(sum(value)*10000)/10000 AS total_fare,
        |count(event_id) AS trip_count, floor(avg(value)*10000)/10000 AS average_fare,
        |max(value) AS maximum_fare, min(value) AS minimum_fare
        |FROM events GROUP BY CAST(ts AS DATE)""".stripMargin,

    "completed_trips" ->
      """SELECT o.o_orderkey AS trip_id, o.o_custkey, o.o_orderstatus,
        |o.o_totalprice, o.o_orderdate, o.o_orderpriority,
        |l.l_partkey, l.l_suppkey, l.l_linenumber, l.l_quantity,
        |l.l_extendedprice, l.l_discount, l.l_tax, l.l_returnflag,
        |l.l_linestatus, l.l_shipdate,
        |'completed_trip' AS data_type, 'completed' AS status
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey""".stripMargin,

    "completed_trip_kpis" ->
      """SELECT CAST(o.o_orderdate AS DATE) AS pickup_date,
        |floor(sum(l.l_extendedprice)*100)/100 AS total_fare,
        |count(l.l_orderkey) AS trip_count,
        |floor(avg(l.l_extendedprice)*10000)/10000 AS average_fare,
        |max(l.l_extendedprice) AS maximum_fare,
        |min(l.l_extendedprice) AS minimum_fare
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY CAST(o.o_orderdate AS DATE)""".stripMargin,

    "unmatched_trips" ->
      """SELECT o_orderkey AS trip_id, o_custkey, o_orderstatus, o_totalprice,
        |o_orderdate, o_orderpriority FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)""".stripMargin,

    "dedup_first_wins" ->
      """SELECT event_id, ts, user_id, event_type, value, props FROM (
        |SELECT e.*, row_number() OVER (PARTITION BY user_id, event_type
        |ORDER BY ts, event_id) AS rn FROM events e) t WHERE rn = 1""".stripMargin,

    "validated_events" ->
      """SELECT event_id, ts, user_id, event_type, value, props FROM events
        |WHERE event_id IS NOT NULL AND event_type IS NOT NULL AND
        |(CASE WHEN event_type = 'purchase' THEN value IS NOT NULL
        |ELSE ts IS NOT NULL END)""".stripMargin,

    "sanitized_values" ->
      """SELECT event_id, CASE WHEN isnan(v) OR isinf(v) THEN NULL ELSE v END AS value_clean
        |FROM (SELECT event_id, CASE WHEN event_id % 7 = 0 THEN 'NaN'::DOUBLE
        |WHEN event_id % 11 = 0 THEN 'Infinity'::DOUBLE ELSE value END AS v
        |FROM events) t""".stripMargin,

    "event_keys" ->
      """SELECT event_id, concat_ws('#', 'RAW', event_type,
        |strftime(ts, '%Y-%m-%d %H:%M:%S')) AS sk FROM events""".stripMargin,

    "raw_prefix_filter" ->
      """SELECT event_id, sk FROM (SELECT event_id, concat_ws('#', 'RAW',
        |event_type, strftime(ts, '%Y-%m-%d %H:%M:%S')) AS sk FROM events) t
        |WHERE sk LIKE 'RAW#click%'""".stripMargin,

    "trip_type_filter" ->
      """SELECT event_id, ts, user_id, event_type, value, props FROM events
        |WHERE event_type IN ('click','view')""".stripMargin,

    "ts_parse_coerce" ->
      """SELECT event_id, try_strptime(ts_str, '%Y-%m-%d %H:%M:%S') AS parsed_ts
        |FROM (SELECT event_id, CASE WHEN event_id % 10 = 0 THEN 'not-a-date'
        |ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS ts_str FROM events) t
        |WHERE try_strptime(ts_str, '%Y-%m-%d %H:%M:%S') IS NOT NULL""".stripMargin,

    "numeric_parse_coerce" ->
      """SELECT event_id, TRY_CAST(fare_str AS DOUBLE) AS fare
        |FROM (SELECT event_id, CASE WHEN event_id % 13 = 0 THEN 'abc'
        |ELSE CAST(value AS VARCHAR) END AS fare_str FROM events) t
        |WHERE TRY_CAST(fare_str AS DOUBLE) IS NOT NULL""".stripMargin,

    "date_projection" ->
      "SELECT event_id, CAST(ts AS DATE) AS event_date FROM events",

    "union_interleave" ->
      """SELECT o_orderkey AS id, o_orderdate AS event_time,
        |'trip_start' AS data_type FROM orders
        |UNION ALL
        |SELECT l_orderkey AS id, l_shipdate AS event_time,
        |'trip_end' AS data_type FROM lineitem""".stripMargin,

    "first_per_key" ->
      """SELECT event_id, ts, user_id, event_type, value, props FROM (
        |SELECT e.*, row_number() OVER (PARTITION BY user_id
        |ORDER BY ts, event_id) AS rn FROM events e) t WHERE rn = 1""".stripMargin,

    "freq_count" ->
      """SELECT CAST(ts AS DATE) AS key, count(*) AS n FROM events
        |GROUP BY CAST(ts AS DATE)""".stripMargin,

    "null_profile" ->
      """SELECT count(*)-count(event_id) AS nulls_event_id,
        |count(*)-count(ts) AS nulls_ts, count(*)-count(user_id) AS nulls_user_id,
        |count(*)-count(event_type) AS nulls_event_type,
        |count(*)-count(value) AS nulls_value, count(*)-count(props) AS nulls_props
        |FROM events""".stripMargin,

    "report_metadata" ->
      """WITH j AS (SELECT CAST(o.o_orderdate AS DATE) AS d FROM orders o
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
        |SELECT count(*) AS record_count, min(d) AS start_date,
        |max(d) AS end_date, count(DISTINCT d) AS kpi_count FROM j""".stripMargin,

    "doc_token_counts" ->
      """SELECT doc_id,
        |CASE WHEN length(trim(text))=0 THEN 0
        |ELSE len(string_split_regex(trim(text), '\s+')) END AS ws_tokens,
        |len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens
        |FROM documents""".stripMargin,

    "doc_quality" ->
      """WITH q AS (SELECT doc_id,
        |least(length(text)/500.0, 1.0) AS len_score,
        |len(regexp_extract_all(text, '[[:punct:]]'))
        |  / CAST(greatest(length(text),1) AS DOUBLE) AS punct_ratio,
        |len(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it|that)\b'))
        |  / CAST(greatest(CASE WHEN length(trim(text))=0 THEN 0
        |      ELSE len(string_split_regex(trim(text), '\s+')) END, 1) AS DOUBLE) AS stopword_ratio
        |FROM documents)
        |SELECT doc_id, floor(len_score*10000)/10000 AS len_score,
        |floor(punct_ratio*10000)/10000 AS punct_ratio,
        |floor(stopword_ratio*10000)/10000 AS stopword_ratio,
        |floor((0.4*len_score + 0.3*least(stopword_ratio*5.0,1.0)
        |  + 0.3*(1.0-least(punct_ratio*10.0,1.0)))*10000)/10000 AS quality_score
        |FROM q""".stripMargin,

    "doc_lang_id" ->
      """WITH h AS (SELECT doc_id,
        |len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is)\b')) AS en,
        |len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht)\b')) AS de,
        |len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|une)\b')) AS fr,
        |len(regexp_extract_all(lower(text), '\b(el|los|las|es|una|que)\b')) AS es,
        |len(regexp_extract_all(text, '\p{Han}')) AS zh
        |FROM documents)
        |SELECT doc_id, CASE WHEN zh > 0 THEN 'zh'
        |WHEN en >= de AND en >= fr AND en >= es THEN 'en'
        |WHEN de >= fr AND de >= es THEN 'de'
        |WHEN fr >= es THEN 'fr' ELSE 'es' END AS lang_pred FROM h""".stripMargin,

    "doc_fingerprint" ->
      """SELECT doc_id,
        |list_min(list_transform(range(1, greatest(length(text)-7,1)+1),
        |  i -> ('0x' || substr(md5(substr(text, i::INT, 8)), 1, 15))::BIGINT)) AS fingerprint,
        |md5(text) AS md5_fingerprint FROM documents""".stripMargin
  )
}
