package graft
/** Plan snapshot tool (`runMain graft.Explain <query>...`).
  *
  * Caveat (ADVICE r18, accepted + documented): a handful of queries run
  * their computation EAGERLY at DataFrame-construction time —
  * driver-coordinated collects (q200/q202/q206/q250-class moment fits,
  * q263/q343's distributed selection, q284's IRLS, q193's EM) — so
  * their printed plan is the final LocalRelation/LocalTableScan, not
  * the computation; invoking Explain on them EXECUTES them at this
  * tool's SF. For those queries the computation's shape is audited via
  * OptProbe stage profiles and the operator specs, not this snapshot.
  */
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
