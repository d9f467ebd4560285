package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shingle / n-gram construction as pure HOF columns — no explode (no row
  * blow-up before hashing) and no UDFs.
  *
  * PERFORMANCE CONTRACT: Spark evaluates higher-order functions interpreted
  * (CodegenFallback), and a lambda body referencing an expression SUBTREE
  * re-evaluates that subtree per array element. Callers must therefore pass
  * pre-projected ATTRIBUTES (a column materialized by a previous select) to
  * the *Of variants — e.g. normalize() once into a "norm" column, then
  * charShinglesOf(col("norm")). The convenience wrappers here are correct
  * but quadratic on long texts; fine for specs, not for the data path.
  */
object TextShingles {

  /** Lowercase + collapse runs of whitespace to single spaces. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Distinct character k-shingles of an ALREADY-NORMALIZED attribute.
    * Texts shorter than k yield a single (short) shingle.
    */
  def charShinglesOf(norm: Column, k: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(norm) - (k - 1), lit(1))),
        i => norm.substr(i, lit(k))))

  /** ALL word n-grams (space-joined, duplicates kept) of a pre-split token
    * attribute; empty array when the text has fewer than n tokens. Used
    * where n-gram multiplicity matters (repetition counting, q46).
    */
  def allWordNgramsOf(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))

  /** Distinct word n-grams (space-joined) of a pre-split token attribute. */
  def wordNgramsOf(toks: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))

  /** Convenience wrapper — see the performance contract above. */
  def charShingles(text: Column, k: Int): Column =
    charShinglesOf(normalize(text), k)

  /** Convenience wrapper — see the performance contract above. */
  def wordNgrams(text: Column, n: Int): Column =
    wordNgramsOf(split(normalize(text), " "), n)
}
