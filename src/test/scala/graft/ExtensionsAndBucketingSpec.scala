package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Two scale-mechanics checks:
  *  - GraftExtensions registers the native expression for SQL use;
  *  - bucketing both matcher inputs by trip key makes the equi-join
  *    shuffle-free (the SURVEY.md J1 scale note, demonstrated).
  */
class ExtensionsAndBucketingSpec extends AnyFunSuite with SparkTestBase {

  test("GraftExtensions: dot_product_float callable from SQL") {
    // force session creation (getOrCreate would reuse the base session and
    // skip extensions); the SparkContext is still shared JVM-wide.
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s.sql(
        "SELECT dot_product_float(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d")
        .head().getDouble(0)
      assert(r === 11.0)
      // the text-side natives are registered too
      val wf = s.sql(
        "SELECT size(winnow_fingerprints('the quick brown fox jumps', 8, 4)) AS n")
        .head().getInt(0)
      assert(wf > 0)
      val mg = s.sql("SELECT min_gram_hash('abcdefghij', 8) AS h").head().getLong(0)
      assert(mg > 0)
      val ts = s.sql(
        "SELECT text_stats('the quick brown fox and the dog').ws_tokens AS w")
        .head().getInt(0)
      assert(ts === 7)
      // r7 media decoders: a 2x3 PNG IHDR and a canonical WAV header
      val dims = s.sql("SELECT image_dims(unhex(" +
        "'89504E470D0A1A0A0000000D49484452000000020000000308060000001A')) AS d")
        .select("d.format", "d.width", "d.height").head()
      assert(dims.getString(0) === "png" && dims.getInt(1) === 2 &&
        dims.getInt(2) === 3)
      val wavHex = "52494646" + "24000000" + "57415645" + "666D7420" +
        "10000000" + "0100" + "0100" + "401F0000" + "401F0000" + "0100" + "0800"
      val wm = s.sql(s"SELECT wav_meta(unhex('$wavHex')) AS m")
        .select("m.sample_rate", "m.channels").head()
      assert(wm.getInt(0) === 8000 && wm.getInt(1) === 1)
      // r8 natives: k-means distance kernel and the Morton layout code
      val sq = s.sql("SELECT sq_dist_long(array(1L, 2L), array(4L, 6L)) AS d")
        .head().getLong(0)
      assert(sq === 25L) // 3^2 + 4^2
      val zv = s.sql("SELECT z_value(5L, 3L) AS z").head().getLong(0)
      assert(zv === 27L) // x=101b -> bits 0,4; y=011b -> bits 1,3
      // r12 natives: CDC chunker and unit-L2 normalization
      val cc = s.sql(
        "SELECT cdc_chunks('tiny', 8, 64) AS c").select(col("c")).head()
        .getSeq[org.apache.spark.sql.Row](0)
      assert(cc.length == 1 && cc.head.getInt(1) == 4) // one whole-text chunk
      val nn = s.sql(
        "SELECT dot_product_float(l2_normalize_float(array(3.0F, 4.0F)), " +
          "l2_normalize_float(array(3.0F, 4.0F))) AS n").head().getDouble(0)
      assert(math.abs(nn - 1.0) < 1e-6)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("bucketed matcher inputs join without an exchange") {
    import spark.implicits._
    val starts = (1 to 1000).map(i => (s"t$i", s"2024-05-25 10:${i % 60}:00"))
      .toDF("trip_id", "pickup_datetime")
    val ends = (1 to 900).map(i => (s"t$i", 10.0 + i))
      .toDF("trip_id", "fare_amount")

    starts.write.mode("overwrite").bucketBy(8, "trip_id")
      .sortBy("trip_id").saveAsTable("b_starts")
    ends.write.mode("overwrite").bucketBy(8, "trip_id")
      .sortBy("trip_id").saveAsTable("b_ends")

    // disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_starts")
        .join(spark.table("b_ends"), Seq("trip_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free, got:\n$plan")
      assert(joined.count() === 900)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_starts")
      spark.sql("DROP TABLE IF EXISTS b_ends")
    }
  }
}
