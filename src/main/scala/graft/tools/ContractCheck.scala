package graft.tools
object ContractCheck {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size}")
    println(s"missing-oracle=${(q -- o).toSeq.sorted}")
    println(s"orphan-oracle=${(o -- q).toSeq.sorted}")
    val nums = q.map(_.split("_")(0).drop(1).toInt)
    val gaps = (1 to nums.max).filterNot(nums.contains)
    println(s"max=q${nums.max} gaps=$gaps")
    val spark = graft.Tables.session("contract", 8)
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry rows=$n")
    spark.stop()
  }
}
