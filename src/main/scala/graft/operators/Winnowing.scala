package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PolyHashExprs

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD
  * 2003 — the MOSS algorithm): hash every k-gram of the normalized text,
  * slide a w-window over the hash sequence, keep the minimum of each
  * window (rightmost on ties). Guarantees: every shared substring of
  * length >= k + w - 1 produces at least one shared fingerprint, and the
  * expected density is 2/(w+1) of all positions — a LOCAL, position-aware
  * sketch, unlike MinHash (global, order-blind). The primitive behind
  * plagiarism detection, exact-quote mining, and license-text spotting in
  * training corpora.
  *
  * Both operators are engine-reproducible end to end: the k-gram hash is
  * the base-31/1e9+7 polynomial over code points
  * ([[graft.functions.PolyHashExprs]]), so a SQL oracle can recompute the
  * exact fingerprint values — no validated-gate indirection needed.
  */
object Winnowing {

  /** Q148: the fingerprint extraction — one (doc_id, pos, fp) row per
    * distinct selected (position, hash); `pos` is the 1-based code-point
    * index of the fingerprinted k-gram. Map-only + explode: ZERO
    * shuffles at any scale (the repartition is the single-row-group
    * testdata parallelism fix, not a semantic exchange).
    */
  def fingerprints(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 8, w: Int = 4): DataFrame =
    Hashing.repartitionForCompute(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("__txt")),
      "doc_id")
      .select(col("doc_id"),
        explode(PolyHashExprs.winnowSelect(
          PolyHashExprs.polyWindowHashes(
            TextShingles.normalize(col("__txt")), k), w)).as("enc"))
      .select(col("doc_id"),
        (col("enc") % PolyHashExprs.PosEncode).as("pos"),
        // integer div (the SQL `div` operator): the encoded long exceeds
        // exact-double range concerns only via `/`, never via `div`
        expr(s"enc div ${PolyHashExprs.PosEncode}").as("fp"))

  /** Q150: near-dup pairs by shared fingerprint count — the MOSS ranking.
    * Shape mirrors substringDupPairs: fingerprints shuffle ONCE as 8-byte
    * longs on the fp key; a document-frequency cap (df in [2, dfMax])
    * kills both unique fingerprints (no partner) and corpus-boilerplate
    * fingerprints (the quadratic blow-up) before the pair self-join, so
    * the join output is bounded by df²·|capped buckets| — never all-pairs.
    * At 100 TB the dfMax cap is the knob that keeps the pair stage linear
    * in corpus size.
    */
  def dupPairs(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 8, w: Int = 4, dfMax: Int = 20,
      minShared: Int = 10): DataFrame = {
    val fp = fingerprints(docs, textCol, idCol, k, w)
      .select(col("doc_id"), col("fp")).distinct()
    val df = fp.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
      .filter(col("__df").between(2, dfMax))
    val kept = fp.join(df, Seq("fp"))
    kept.select(col("fp"), col("doc_id").as("doc_a"))
      .join(kept.select(col("fp"), col("doc_id").as("doc_b")), Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
