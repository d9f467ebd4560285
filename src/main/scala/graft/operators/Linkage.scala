package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Q191: RECORD-LINKAGE match scoring (Fellegi & Sunter 1969) — the
  * probabilistic SCORING layer on top of the repo's blocking families
  * (SNM q147, prefix filtering q146, LSH banding q10): given blocked
  * candidate pairs and a set of comparison fields, each field
  * contributes log(m/u) when it agrees and log((1−m)/(1−u)) when it
  * disagrees, where u — the probability two RANDOM records agree on the
  * field — is estimated exactly from the value distribution
  * (u = Σ_v n_v² / n²) and m is the assumed true-match agreement rate.
  * The summed log-odds is the classic match weight; pairs above
  * `minScore` classify as probable matches.
  *
  * Exactness: u is an exact integer ratio evaluated in one mirrored
  * IEEE division; every weight is a literal-mirrored double expression
  * (the q139 lesson: `1−m` is written `1.0 − m`, never a folded
  * constant, so both engines compute the identical double), and the
  * field sum is a fixed-order chain.
  *
  * Scale: the u table is one count aggregate per field reduced to ONE
  * row, broadcast via crossJoin; candidate generation is a blocked
  * equi-join (block keys must be selective — the standard linkage
  * contract; un-blocked linkage is quadratic by definition and the
  * blocking families exist to avoid it). No driver data, no windows.
  */
object Linkage {

  def fellegiSunter(df: DataFrame, idCol: String, blockCols: Seq[String],
      fieldCols: Seq[String], m: Double = 0.9,
      minScore: Double = 0.0): DataFrame = {
    require(blockCols.nonEmpty && fieldCols.nonEmpty,
      "need at least one block column and one comparison field")
    require(m > 0.0 && m < 1.0, s"m out of (0,1): $m")
    val cols = (idCol +: (blockCols ++ fieldCols)).distinct
    // the projected base feeds SIX consumers (two pair sides + one
    // count aggregate per field) — materialize it once instead of
    // re-scanning the input per consumer (ScanAudit: 6 scans -> 1)
    val base = df.select(cols.map(col): _*).localCheckpoint(false)
    // one row of u estimates, broadcast onto every candidate pair
    val uRow = broadcast(fieldCols.map { f =>
      base.groupBy(col(f)).agg(count(lit(1)).as("__n"))
        .agg((sum(col("__n") * col("__n")).cast("double") /
          (sum(col("__n")).cast("double") *
            sum(col("__n")).cast("double"))).as(s"__u_$f"))
    }.reduce(_.crossJoin(_)))
    def side(tag: String) = base.select(
      (col(idCol).as(s"id_$tag") +:
        blockCols.map(c => col(c).as(s"__b_${c}_$tag"))) ++
        fieldCols.map(c => col(c).as(s"${c}_$tag")): _*)
    val pairs = side("a").join(side("b"),
      blockCols.map(c => col(s"__b_${c}_a") === col(s"__b_${c}_b"))
        .reduce(_ && _) && col("id_a") < col("id_b"))
      .crossJoin(uRow)
    val agrees: Seq[Column] = fieldCols.map(f =>
      col(s"${f}_a") <=> col(s"${f}_b"))
    val weights: Seq[Column] = fieldCols.zip(agrees).map { case (f, g) =>
      when(g, log(lit(m) / col(s"__u_$f")))
        .otherwise(log((lit(1.0) - lit(m)) / (lit(1.0) - col(s"__u_$f"))))
    }
    pairs
      .select(col("id_a"), col("id_b"),
        agrees.map(g => when(g, 1).otherwise(0)).reduce(_ + _)
          .as("n_agree"),
        round(weights.reduce(_ + _), 6).as("score"))
      .filter(col("score") > minScore)
  }
}
