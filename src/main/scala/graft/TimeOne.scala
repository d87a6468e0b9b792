package graft
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val name = args(0)
    SparkEntry.queries(name)(spark, dir).count() // warm
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, dir).count()
    println(f"TIMED $name rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
