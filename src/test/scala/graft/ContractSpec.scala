package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract itself: a typo'd oracle key would silently
  * detach a query from the correctness gate, and an accidental oracle for
  * an LSH/sketch query would FAIL the gate (they are not SQL-expressible).
  */
class ContractSpec extends AnyFunSuite {

  // round 6: q29/q44/q78 moved OUT of this set — their validated forms
  // emit deterministic columns + an in-band est_ok flag, so they oracle.
  // Only the genuinely approximate LSH/ANN outputs remain rows-only.
  private val declaredRowsOnly = Set(
    "q10_dedup_minhash", "q11_dedup_simhash", "q17_similarity_lsh",
    "q18_embedding_neardup", "q32_similarity_ivf")

  test("every oracle key names a query; rows-only set is exactly the declared one") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle keys without a query: ${o -- q}")
    assert((q -- o) == declaredRowsOnly,
      s"rows-only drift: ${(q -- o).toSeq.sorted} vs declared ${declaredRowsOnly.toSeq.sorted}")
  }

  test("oracle SQL is non-empty and single-statement") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, s"$k: empty oracle")
      assert(!sql.trim.stripSuffix(";").contains(";"), s"$k: multiple statements")
    }
  }
}
