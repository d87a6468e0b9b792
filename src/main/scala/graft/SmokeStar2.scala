package graft
import org.apache.spark.sql.functions._
object SmokeStar2 {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(8)
    val spark = GraftSession.builder(cores).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def q = SparkEntry.queries("graph_components_star")(spark, dir)
    q.count() // warm
    val t0 = System.nanoTime()
    val n = q.count()
    println(f"cores=$cores rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
