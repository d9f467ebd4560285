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
  * Scale: the u estimates reduce to ONE row per run and ship as PLAN
  * LITERALS (the IVF-centroid discipline — a crossJoin'd u row dragged
  * the whole score expression into an interpreted nested-loop-join
  * condition; as literals every ln(m/u) constant-folds and the pair
  * scoring is a pure codegen projection). Candidate generation is a
  * SALTED blocked join ([[Skew.saltedJoin]] on the composite block
  * key — block keys are low-cardinality by nature, so a shuffle
  * equi-join would serialize each block's quadratic fan-out onto one
  * task) over a probe side spread by an explicit
  * [[Hashing.repartitionForCompute]] (the fan-out happens AT the join,
  * so AQE's byte-based coalescing under-provisions it otherwise).
  * Block selectivity is still the linkage contract: un-blocked linkage
  * is quadratic by definition and the blocking families exist to avoid
  * it; salting buys parallelism, not asymptotics. No driver-side data
  * beyond the |fields|-sized u row, no windows.
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
    // u estimates: one row, collected and embedded as plan literals so
    // every weight constant-folds (see scaladoc)
    val uRow = fieldCols.map { f =>
      base.groupBy(col(f)).agg(count(lit(1)).as("__n"))
        .agg((sum(col("__n") * col("__n")).cast("double") /
          (sum(col("__n")).cast("double") *
            sum(col("__n")).cast("double"))).as(s"__u_$f"))
    }.reduce(_.crossJoin(_)).collect().head
    val u: Map[String, Double] =
      fieldCols.zipWithIndex.map { case (f, i) =>
        f -> uRow.getDouble(i)
      }.toMap
    // block keys are LOW-CARDINALITY by nature (that is what makes them
    // blocks), so a plain equi-join would shuffle every row of a block
    // onto one task no matter how the input is partitioned — the
    // all-pairs fan-out then runs serially per block (measured 13.5 s
    // at sf0.1, the suite's slowest row). SALT it: the composite block
    // key joins through Skew.saltedJoin, which scatters the probe side
    // over `salt` sub-keys and replicates the build side salt× —
    // blocks×salt-way parallelism for salt× duplication of one side.
    // Rows with a NULL in any block column are dropped first on both
    // sides (SQL equality semantics — NULL never joins), which also
    // keeps the concatenated key faithful to the tuple.
    def side(tag: String) = base
      .filter(blockCols.map(c => col(c).isNotNull).reduce(_ && _))
      .select(
        (col(idCol).as(s"id_$tag") +:
          blockCols.map(c => col(c).as(s"__b_${c}_$tag"))) ++
          fieldCols.map(c => col(c).as(s"${c}_$tag")): _*)
    def withBlk(tag: String) = side(tag)
      .withColumn("__blk", concat_ws("\u0001",
        blockCols.map(c => col(s"__b_${c}_$tag").cast("string")): _*))
      .drop(blockCols.map(c => s"__b_${c}_$tag"): _*)
    val pairs = Skew.saltedJoin(
      Hashing.repartitionForCompute(withBlk("a"), "id_a"),
      withBlk("b"), "__blk", salt = 8)
      .filter(col("id_a") < col("id_b"))
      .drop("__blk")
    val agrees: Seq[Column] = fieldCols.map(f =>
      col(s"${f}_a") <=> col(s"${f}_b"))
    val weights: Seq[Column] = fieldCols.zip(agrees).map { case (f, g) =>
      when(g, log(lit(m) / lit(u(f))))
        .otherwise(log((lit(1.0) - lit(m)) / (lit(1.0) - lit(u(f)))))
    }
    pairs
      .select(col("id_a"), col("id_b"),
        agrees.map(g => when(g, 1).otherwise(0)).reduce(_ + _)
          .as("n_agree"),
        round(weights.reduce(_ + _), 6).as("score"))
      .filter(col("score") > minScore)
  }
}
