package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Jaro-Winkler kernel: pinned doubles (cross-checked against DuckDB's
  * jaro_winkler_similarity during the bit-exactness fuzz), UTF-8 byte
  * semantics, and a fuzz pass of the codegen kernel against an
  * independent straight-line reference.
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jwDf(pairs: Seq[(String, String)]): Seq[Double] =
    pairs.toDF("a", "b")
      .select(JaroWinklerExprs.jaroWinkler(col("a"), col("b")))
      .as[Double].collect().toSeq

  test("pinned values match the published examples and DuckDB") {
    val got = jwDf(Seq(
      ("martha", "marhta"), ("dixon", "dicksonx"),
      ("jellyfish", "smellyfish"), ("dwayne", "duane"),
      ("CRATE", "TRACE"), ("abcd", "badc"),
      ("prefixmatch", "prefixxxxxx")))
    assert(got == Seq(
      0.9611111111111111, 0.8133333333333332, 0.8962962962962964,
      0.8400000000000001, 0.7333333333333334, 0.8333333333333334,
      // jaro 0.69697 < boost threshold 0.7: NO prefix boost
      0.6969696969696969), got)
  }

  test("edges: empty strings, identity, disjoint, window-0 transposition") {
    val got = jwDf(Seq(
      ("", ""), ("a", ""), ("", "a"), ("a", "a"), ("abc", "abc"),
      // window = max(2,2)/2-1 = 0: 'ab' vs 'ba' has NO in-window match
      ("ab", "ba"), ("aaaaaaaaaab", "b")))
    assert(got == Seq(0.0, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0), got)
  }

  test("multi-byte code points compare byte-wise (the DuckDB contract)") {
    // 'é' (2 bytes) vs 'è' (2 bytes): first byte agrees, second differs
    // -> byte-level partial matches, NOT codepoint-level disjointness
    val Seq(a, b) = jwDf(Seq(("é", "è"), ("漢字", "漢字")))
    assert(b == 1.0)
    // bytes C3A9 vs C3A8: l=2 each, window 0, m=1 (C3), jaro = 2/3
    // (1/2+1/2+1)/3 = 2/3 < 0.7 -> no boost
    assert(a == 2.0 / 3.0, s"got $a")
  }

  test("null propagates") {
    val got = Seq(("x", Option.empty[String]), ("x", Some("x")))
      .toDF("a", "b")
      .select(JaroWinklerExprs.jaroWinkler(col("a"), col("b")))
      .collect()
    assert(got(0).isNullAt(0) && got(1).getDouble(0) == 1.0)
  }

  test("fuzz: codegen kernel == independent reference on random bytes") {
    val rnd = new scala.util.Random(1234)
    val alphabets = Seq("ab", "abcd", "abcdefghijklmnopqrstuvwxyz", "aé漢 ")
    val pairs = for {
      alpha <- alphabets
      _ <- 1 to 800
    } yield {
      def s() = (0 until rnd.nextInt(21))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      (s(), s())
    }
    val got = jwDf(pairs)
    pairs.zip(got).foreach { case ((a, b), v) =>
      val want = JaroWinklerSpec.reference(a, b)
      assert(v == want, s"'$a' vs '$b': $v != $want")
    }
  }

  test("interpreted eval matches codegen") {
    val pairs = Seq(("martha", "marhta"), ("ab", "ba"), ("", "x"))
    val interp = pairs.map { case (a, b) =>
      JaroWinklerExpr(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(a)),
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(b)))
        .eval(null).asInstanceOf[Double]
    }
    assert(interp == jwDf(pairs))
  }
}

object JaroWinklerSpec {
  /** Straight-line reference: seq-of-bytes, boxed collections, no code
    * shared with the kernel.
    */
  def reference(sa: String, sb: String): Double = {
    val a = sa.getBytes("UTF-8").toSeq
    val b = sb.getBytes("UTF-8").toSeq
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(0, math.max(a.size, b.size) / 2 - 1)
    val used = scala.collection.mutable.Set[Int]()
    val matches = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    for (i <- a.indices) {
      val cand = ((i - window) to (i + window))
        .filter(j => j >= 0 && j < b.size && !used.contains(j) &&
          a(i) == b(j))
      if (cand.nonEmpty) { used += cand.head; matches += ((i, cand.head)) }
    }
    val m = matches.size
    if (m == 0) return 0.0
    val s1m = matches.map(p => a(p._1))
    val s2m = matches.map(_._2).sorted.map(b)
    val t = s1m.zip(s2m).count(p => p._1 != p._2) / 2
    val j = (m.toDouble / a.size + m.toDouble / b.size +
      (m - t).toDouble / m) / 3.0
    if (j > 0.7) {
      val l = a.zip(b).take(4).takeWhile(p => p._1 == p._2).size
      j + l * 0.1 * (1.0 - j)
    } else j
  }
}
