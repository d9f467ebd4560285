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

  /** Projected, lazily-materialized input — one scan for all consumers
    * (two pair sides + the per-field u aggregates).
    */
  private def project(df: DataFrame, idCol: String,
      blockCols: Seq[String], fieldCols: Seq[String]): DataFrame = {
    val cols = (idCol +: (blockCols ++ fieldCols)).distinct
    df.select(cols.map(col): _*).localCheckpoint(false)
  }

  /** Frequency u-estimates u_f = Σ_v n_v² / n², collected as scalars
    * (embedded as plan literals downstream — see [[fellegiSunter]]).
    */
  private def uEstimates(base: DataFrame,
      fieldCols: Seq[String]): Map[String, Double] = {
    val uRow = fieldCols.map { f =>
      base.groupBy(col(f)).agg(count(lit(1)).as("__n"))
        .agg((sum(col("__n") * col("__n")).cast("double") /
          (sum(col("__n")).cast("double") *
            sum(col("__n")).cast("double"))).as(s"__u_$f"))
    }.reduce(_.crossJoin(_)).collect().head
    fieldCols.zipWithIndex.map { case (f, i) =>
      f -> uRow.getDouble(i)
    }.toMap
  }

  /** Blocked candidate pairs with one 0/1 agreement column `g_<field>`
    * per comparison field — the shared substrate of [[fellegiSunter]]
    * and [[emRefine]]. Salted join + explicit probe repartition per the
    * q191 plan saga (PLANS.md).
    *
    * Occupancy guard: candidate fan-out is occupancy² PER BLOCK, so one
    * degenerate block key (an empty-string city, a default nation)
    * turns the linkage quadratic no matter how good the other blocks
    * are — salting spreads the pairs but cannot shrink their count.
    * Before the join, one map-side-combinable count over the (already
    * checkpointed) projection finds any block above
    * `maxBlockOccupancy` and FAILS LOUDLY with the offending keys (the
    * q182 oversized-basket device, eager form) instead of silently
    * launching an O(occ²) stage. The default caps any single block at
    * ~2³¹ candidate pairs; refine `blockCols` (or raise the cap
    * deliberately) to proceed.
    */
  private def agreementPairs(base: DataFrame, idCol: String,
      blockCols: Seq[String], fieldCols: Seq[String],
      maxBlockOccupancy: Long): DataFrame = {
    require(maxBlockOccupancy >= 2,
      s"maxBlockOccupancy out of range: $maxBlockOccupancy")
    val over = base
      .filter(blockCols.map(c => col(c).isNotNull).reduce(_ && _))
      .groupBy(blockCols.map(c => col(c).cast("string")): _*)
      .agg(count(lit(1)).as("__occ"))
      .filter(col("__occ") > maxBlockOccupancy)
      .limit(3).collect()
    require(over.isEmpty,
      s"linkage block occupancy over cap $maxBlockOccupancy — " +
        "candidate fan-out is occupancy^2 per block; refine blockCols " +
        "or raise maxBlockOccupancy. Offending block keys: " +
        over.map(r => blockCols.indices.map(i => s"${blockCols(i)}=" +
          r.getString(i)).mkString("(", ",", ")") +
          s" occupancy=${r.getLong(blockCols.size)}").mkString("; "))
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
    Skew.saltedJoin(
      Hashing.repartitionForCompute(withBlk("a"), "id_a"),
      withBlk("b"), "__blk", salt = 8)
      .filter(col("id_a") < col("id_b"))
      .select(
        col("id_a") +: col("id_b") +: fieldCols.map(f =>
          when(col(s"${f}_a") <=> col(s"${f}_b"), 1).otherwise(0)
            .as(s"g_$f")): _*)
  }

  def fellegiSunter(df: DataFrame, idCol: String, blockCols: Seq[String],
      fieldCols: Seq[String], m: Double = 0.9,
      minScore: Double = 0.0,
      maxBlockOccupancy: Long = 65536L): DataFrame = {
    require(blockCols.nonEmpty && fieldCols.nonEmpty,
      "need at least one block column and one comparison field")
    require(m > 0.0 && m < 1.0, s"m out of (0,1): $m")
    val base = project(df, idCol, blockCols, fieldCols)
    val u = uEstimates(base, fieldCols)
    val pairs =
      agreementPairs(base, idCol, blockCols, fieldCols, maxBlockOccupancy)
    val weights: Seq[Column] = fieldCols.map { f =>
      when(col(s"g_$f") === 1, log(lit(m) / lit(u(f))))
        .otherwise(log((lit(1.0) - lit(m)) / (lit(1.0) - lit(u(f)))))
    }
    pairs
      .select(col("id_a"), col("id_b"),
        fieldCols.map(f => col(s"g_$f")).reduce(_ + _).as("n_agree"),
        round(weights.reduce(_ + _), 6).as("score"))
      .filter(col("score") > minScore)
  }

  /** Q193: EM-REFINED linkage parameters (the Winkler/Jaro application
    * of EM to the Fellegi–Sunter model under conditional independence):
    * instead of ASSUMING the true-match agreement rate m, estimate
    * (p, m_f, u_f) from the agreement-vector data itself — E-step: each
    * pair's posterior match probability
    * {{{ w = p·Π_f t_f / (p·Π_f t_f + (1−p)·Π_f s_f) }}}
    * with t_f = m_f or 1−m_f and s_f = u_f or 1−u_f by agreement;
    * M-step: p = Σw/n, m_f = Σw·g_f / Σw, u_f = Σ(1−w)·g_f / Σ(1−w).
    * A fixed `rounds` budget (the q158/q173 discipline) seeded from the
    * frequency u's and a conventional m₀ prior.
    *
    * Determinism: the per-pair posterior is one literal-mirrored IEEE
    * chain (fixed left-association; every round's parameters enter as
    * DOUBLES both engines derive from the same integer sums), then
    * ROUNDS TO THE 1e-6 GRID — the M-step sums are therefore BIGINT
    * micro sums, order-independent under any partitioning, and each
    * round's parameters are bit-identical across engines. The oracle
    * unrolls the same rounds as CTEs.
    *
    * Scale (r18 rewrite, measured): the per-pair posterior depends ONLY
    * on the agreement vector, and there are at most 2^|fields| distinct
    * vectors — so the pair table reduces ONCE to a pattern-count table
    * (one map-side-combinable aggregation over the salted join, ≤ 2^f
    * rows to the driver) and every EM round is exact integer arithmetic
    * over those counts: Σ_pairs wμ·g_f = Σ_patterns cnt·wμ·g_f because
    * same-pattern pairs share the identical micro-grid wμ. Bit-identical
    * to the per-pair form by that integer identity (spec-pinned), and it
    * removes the old materialized pair checkpoint — the r18 profile
    * showed its 2.2 GB deserialized cache costing 43% GC time on the
    * round aggregates (14 s stage at sf0.1; whole query now ~2 s).
    * Output is |fields| parameter rows.
    */
  def emRefine(df: DataFrame, idCol: String, blockCols: Seq[String],
      fieldCols: Seq[String], rounds: Int = 2, p0: Double = 0.1,
      m0: Double = 0.9, maxBlockOccupancy: Long = 65536L): DataFrame = {
    require(blockCols.nonEmpty && fieldCols.nonEmpty,
      "need at least one block column and one comparison field")
    require(rounds >= 1 && rounds <= 50, s"rounds out of range: $rounds")
    val spark = df.sparkSession
    import spark.implicits._
    val base = project(df, idCol, blockCols, fieldCols)
    // ONE pass over the salted candidate join: agreement-PATTERN counts
    // (≤ 2^|fields| rows — the driver-side state is parameter-sized by
    // construction, the BPE-trainer class of driver iteration)
    val patRows =
      agreementPairs(base, idCol, blockCols, fieldCols, maxBlockOccupancy)
        .groupBy(fieldCols.map(f => col(s"g_$f")): _*)
        .agg(count(lit(1)).as("__c"))
        .collect()
    val pats: Array[(Array[Int], Long)] = patRows.map { row =>
      (Array.tabulate(fieldCols.size)(i => row.getInt(i)),
        row.getLong(fieldCols.size))
    }
    // Spark's round(double) is BigDecimal HALF_UP — replay it exactly
    // (the huberFit2 r6 precedent)
    def roundMicro(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    var p = p0
    var mm: Map[String, Double] = fieldCols.map(_ -> m0).toMap
    var uu: Map[String, Double] = uEstimates(base, fieldCols)
    var r = 0
    while (r < rounds) {
      // the SAME fixed left-associated IEEE chain the in-plan form ran,
      // now per PATTERN: identical doubles in, identical wμ out, and
      // every pair-level integer sum equals the count-weighted pattern
      // sum exactly (same-pattern pairs share one wμ)
      var n = 0L
      var sw = 0L
      val swg = Array.fill(fieldCols.size)(0L)
      val sg = Array.fill(fieldCols.size)(0L)
      pats.foreach { case (g, c) =>
        var num = p
        var alt = 1.0 - p
        var i = 0
        while (i < fieldCols.size) {
          val f = fieldCols(i)
          num *= (if (g(i) == 1) mm(f) else 1.0 - mm(f))
          alt *= (if (g(i) == 1) uu(f) else 1.0 - uu(f))
          i += 1
        }
        // degenerate-posterior guard (ADVICE r18 item 3): if num+alt
        // underflows to exactly 0 (m or u pinned at 0/1 across many
        // fields), 0/0 is NaN and BigDecimal(NaN) would throw where the
        // old in-plan round(...).cast("long") yielded 0 — replay that
        val w = if (num + alt == 0.0) 0L
          else roundMicro(1000000.0 * (num / (num + alt)))
        n += c
        sw += c * w
        i = 0
        while (i < fieldCols.size) {
          if (g(i) == 1) { swg(i) += c * w; sg(i) += c }
          i += 1
        }
      }
      require(sw > 0L && sw < n * 1000000L,
        s"EM degenerated at round ${r + 1}: sw=$sw n=$n")
      p = sw.toDouble / (n * 1000000L).toDouble
      mm = fieldCols.zipWithIndex.map { case (f, i) =>
        f -> swg(i).toDouble / sw.toDouble
      }.toMap
      uu = fieldCols.zipWithIndex.map { case (f, i) =>
        f -> (sg(i) * 1000000L - swg(i)).toDouble /
          (n * 1000000L - sw).toDouble
      }.toMap
      r += 1
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    fieldCols.map(f => (f, r6(p), r6(mm(f)), r6(uu(f))))
      .toDF("field", "p_est", "m_est", "u_est")
  }

  /** Q202: GOLDEN-RECORD survivorship — the last step of entity
    * resolution, after candidate generation (blocking families), pair
    * scoring ([[fellegiSunter]]/[[emRefine]]) and transitive closure
    * ([[graft.operators.Dedup.clusterPairs]]): merge each matched
    * cluster into ONE canonical record with deterministic per-field
    * rules. Rules implemented: `modeCols` survive by most-frequent
    * value with smallest-value tie-break (the only mode that is
    * engine- and partition-independent — an unspecified-tie `arg_max`
    * silently flips rows between runs); `maxCols` survive by maximum
    * (the "best/latest value" rule); the canonical id is the cluster's
    * minimum member id (matching clusterPairs' label convention, so
    * `cluster_id` doubles as the surviving key). Unmatched records pass
    * through as their own singleton clusters — a golden table is a
    * FULL replacement of the input, not just the merged part.
    *
    * Contract: survivorship fields must be non-null (null ordering
    * inside the tie-break struct differs across engines; normalize
    * nulls upstream — the profile audit q43 is the gate for that).
    *
    * Scale: clusterPairs is O(diameter) bounded rounds over pair ids;
    * the survivorship itself is one map-side-combinable aggregation
    * per rule family over (cluster, value) — no windows over record
    * scale, no driver data. The labeled projection is checkpointed
    * once and shared by the core and per-mode-column aggregations.
    */
  def goldenRecords(records: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      modeCols: Seq[String], maxCols: Seq[String],
      maxIters: Int = 20): DataFrame = {
    require(modeCols.nonEmpty || maxCols.nonEmpty, "no survivorship rules")
    val labels = graft.operators.Dedup.clusterPairs(
        pairs.select(col(aCol), col(bCol)), aCol, bCol, maxIters)
      .select(col("doc_id").as("__id"), col("cluster_id"))
    val base = records
      .join(labels, col(idCol) === col("__id"), "left")
      .select((coalesce(col("cluster_id"), col(idCol)).as("__cluster") +:
        col(idCol).as("__rid") +:
        (modeCols ++ maxCols).distinct.map(col)): _*)
      .localCheckpoint(false)
    val core = base.groupBy(col("__cluster"))
      .agg(count(lit(1)).as("n_members"),
        maxCols.map(c => max(col(c)).as(c)): _*)
    val out = modeCols.foldLeft(core) { (acc, c) =>
      val mode = base
        .groupBy(col("__cluster"), col(c))
        .agg(count(lit(1)).as("__n"))
        .groupBy(col("__cluster"))
        .agg(min(struct((lit(0L) - col("__n")).as("negn"),
          col(c).as("v"))).as("__m"))
        .select(col("__cluster"), col("__m.v").as(c))
      acc.join(mode, Seq("__cluster"))
    }
    out.select(col("__cluster").as("cluster_id") +: col("n_members") +:
      (modeCols ++ maxCols).distinct.map(col): _*)
  }

  /** Q251: EDIT-DISTANCE-1 FUZZY SELF-JOIN via the FastSS deletion
    * neighborhood (Bocek et al. 2007) — every pair of records whose
    * names are within Levenshtein distance 1, WITHOUT an all-pairs
    * comparison: two strings within one edit share a member of each
    * other's single-deletion neighborhood (substitution: deleting the
    * differing position from both yields the same string;
    * insertion/deletion: the shorter string IS a deletion variant of
    * the longer), so candidates come from an equi-join on the
    * {self} ∪ {single deletions} key set — n·(L+1) key rows, posting
    * lists bounded by the alphabet, never n². Each candidate pair is
    * then VERIFIED with the exact `levenshtein` (identical semantics
    * in Spark and DuckDB), so the output is exactly the all-pairs
    * truth. The typo-linkage primitive q191/q202's blocked scorers
    * assume upstream.
    */
  def lev1Neighbors(df: DataFrame, nameCol: String,
      idCol: String): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"),
      col(nameCol).as("name"))
    // array_distinct BEFORE the explode: deleting any character of an
    // equal-character RUN yields the same variant (e.g. the zero runs
    // in "Customer#000000042"), and duplicate keys on BOTH sides
    // multiply the candidate join quadratically in the run length
    // (measured ~17% off q251 at sf0.1). The remaining cost is
    // OUTPUT-size-driven: digit-structured ids are pathologically
    // dense in edit distance (~18 true pairs per record here), the
    // q191 blocked-linkage adjudication
    // r18: compute-repartitioned by the join key — the single-row-group
    // customer scan left the whole candidate join + pre-distinct on ONE
    // task (4.0 s of the 5.0 s query at sf0.1); keyed on `k` so both
    // self-join sides are co-partitioned at session parallelism
    val keys = Hashing.repartitionForCompute(
      base.select(col("id"), col("name"),
        explode(array_distinct(concat(
          array(col("name")),
          transform(sequence(lit(1), length(col("name"))),
            i => concat(
              col("name").substr(lit(1), i - lit(1)),
              col("name").substr(i + lit(1), length(col("name"))))))))
          .as("k")), "k")
    val a = keys.select(col("k"), col("id").as("id_a"),
      col("name").as("name_a"))
    val b = keys.select(col("k"), col("id").as("id_b"),
      col("name").as("name_b"))
    a.join(b, Seq("k"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"))
      .distinct()
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 1L)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
