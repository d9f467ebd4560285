package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q187 GPT-2 pretokenizer: scanner == java.util.regex reference on
  * adversarial strings, random fuzz, the corpus, and the expression
  * plumbing (codegen path + losslessness).
  */
class Gpt2PretokSpec extends SparkSpec {
  import spark.implicits._

  private def check(s: String): Unit = {
    val got = Gpt2PretokExpr.split(s).toSeq
    val ref = Gpt2PretokExpr.refSplit(s).toSeq
    assert(got === ref, s"input=${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    assert(got.mkString === s, s"lossy split of '$s'")
  }

  test("adversarial strings match the literal-pattern reference") {
    Seq(
      "", "a", " ", "  ", "   ", "\t", "\t\t", " \t ", "a b", "a  b",
      "a   b", "a\tb", "a \t b", "a\nb", "a\r\nb", "trailing ",
      "trailing  ", " leading", "  leading", "it's", "they're", "we've",
      "I'm", "he'll", "she'd", "don't", "'s", "'S", "'sup", "'rex",
      "x''y", "'", "''", "a'", " 's", "abc123", "abc 123", "a1b2",
      "3.14", "1,000", "hello, world!", "!!!", "a!!!b", " !", "!? ",
      "café", "élève", "你好", "½ cup",
      " ", "a b", "x   y", "—dash", "é",
      "😀", "a 😀 b", "😀😁",
      "tab\tafter", "mixed \t\n mess", "\n\n\npara", "end\n\n\n",
      "'ll'll", "it's's", "nº 5", "Ⅳrd", "xy",
      "\f\f", "word", "12'34", "a 'b", "a '' b")
      .foreach(check)
  }

  test("random fuzz over a pretokenizer-hostile alphabet") {
    val alphabet =
      "ab1 \t\n'sreé你!. \r".toCharArray
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val len = rnd.nextInt(24)
      check(Array.fill(len)(alphabet(rnd.nextInt(alphabet.length)))
        .mkString)
    }
  }

  test("expression path (codegen) equals the scanner on the corpus") {
    val docs = graft.Tables.documents(spark, sf)
    val viaExpr = docs
      .select(col("doc_id"),
        Gpt2PretokExpr.gpt2Pretokenize(coalesce(col("text"), lit("")))
          .as("t"))
      .as[(Long, Seq[String])].collect()
    viaExpr.foreach { case (_, toks) => assert(toks.nonEmpty || true) }
    val direct = docs.select(col("doc_id"), coalesce(col("text"), lit("")))
      .as[(Long, String)].collect().toMap
    viaExpr.foreach { case (id, toks) =>
      assert(toks === Gpt2PretokExpr.split(direct(id)).toSeq, s"doc $id")
    }
  }

  test("q187 gate: parity flag 1 and lossless char counts on the corpus") {
    val docs = graft.Tables.documents(spark, sf)
    val gate = graft.operators.TextAnalysis
      .gpt2PretokenGate(docs, "text", "doc_id")
    val bad = gate.filter(col("parity_ok") =!= 1).count()
    assert(bad === 0L, s"$bad docs diverge from the reference impl")
    val lossy = gate
      .join(docs.select(col("doc_id"),
        length(coalesce(col("text"), lit(""))).cast("long").as("lt")),
        Seq("doc_id"))
      .filter(col("n_chars_total") =!= col("lt")).count()
    assert(lossy === 0L, s"$lossy docs lost characters in the split")
  }
}
