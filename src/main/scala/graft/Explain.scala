package graft
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("explain", 8)
    val dir = "/root/testdata/sf0.001"
    for (q <- args) {
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
