package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shingle / n-gram construction as pure codegen'd HOF columns — no explode
  * (no row blow-up before hashing) and no UDFs.
  */
object TextShingles {

  /** Lowercase + collapse runs of whitespace to single spaces. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Distinct character k-shingles of the normalized text, array<string>.
    * Texts shorter than k yield a single (short) shingle.
    */
  def charShingles(text: Column, k: Int): Column = {
    val norm = normalize(text)
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(norm) - (k - 1), lit(1))),
        i => norm.substr(i, lit(k))))
  }

  /** Distinct word n-grams (space-joined) of the normalized text. */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = split(normalize(text), " ")
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
  }
}
