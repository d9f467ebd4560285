package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** pLSA topic modeling (Hofmann 1999, "Probabilistic Latent Semantic
  * Analysis") via FIXED-ROUND EM over the doc-term matrix — the corpus
  * structure-discovery step of a training-data pipeline (topic balance
  * auditing, per-topic mixture planning, domain drift inspection).
  *
  * Model: P(d, w) = Σ_z P(z|d)·P(w|z). E-step: posterior
  * P(z|d,w) ∝ P(w|z)·P(z|d); M-step: P(w|z) ∝ Σ_d n(d,w)·P(z|d,w),
  * P(z|d) ∝ Σ_w n(d,w)·P(z|d,w). A fixed `rounds` budget (the
  * q158/q173/q193 iterative discipline — unrollable by the oracle).
  *
  * Determinism (the q193 grid discipline, distributed-parameter form):
  * every probability lives on an INTEGER grid (`gridScale` units,
  * default 1e-9 "nano"). The per-(d,w) posterior is one
  * literal-mirrored IEEE chain over EXACT integers — joint_z =
  * pwz_z·pzd_z is an exact BIGINT product (≤ gridScale² = 1e18), the
  * denominator an exact BIGINT sum, the division a single
  * double-divide rounded straight back to the grid — so every M-step
  * sum is a BIGINT sum of grid units: order-independent under any
  * partitioning, bit-identical across engines, and rounding error
  * cannot compound across rounds (each round's inputs are exact grid
  * integers in both engines). Init is integer-derived too: P(w|z)⁰ ∝
  * 1 + (polyHash(w) + z·2654435761) mod 997 (per-topic pseudo-random
  * word weights, replayable in SQL — the q217 hash), P(z|d)⁰ uniform.
  *
  * Scale: each round is two shuffle equi-joins over the doc-term
  * counts (on word against the K×V topic-word table, on doc against
  * the K×D doc-topic table — both co-partitioned with the counts by
  * their join key, NEVER collected) plus two map-side-combinable
  * aggregations back to (word) and (doc). Topics ride as length-K
  * arrays, so K never explodes row counts and the posterior
  * normalizer is row-local. The only global exchange besides the
  * joins is the K-row topic-mass total, broadcast back. Per-round
  * frames are pinned ([[Pinning.pin]]) — lineage stays O(1) per round
  * and the E-step never recomputes the previous round. Driver data:
  * none.
  *
  * Grid-mass contract: M-step sums are Σ n(d,w)·post ≤ corpus token
  * mass × gridScale per (w,z) cell — with the nano default a single
  * word must stay under ~9×10⁹ occurrences to fit int64; at larger
  * corpus mass pass a coarser `gridScale` (micro = 1e6 lifts the bound
  * ×1000). The reference engine (kafka-streams-join) has no
  * aggregation surface at all — this family is part of the mandated
  * training-pipeline extension.
  */
object TopicModel {

  /** Multiplier shared with the q217 minhash chain (Knuth 2654435761). */
  private val Mult = 2654435761L

  /** round(gridScale · num / den) on exact integer inputs — the ONE
    * float op per grid value, literal-mirrored in the oracle SQL as
    * `round(<scale>.0 * CAST(num AS DOUBLE) / CAST(den AS DOUBLE))`.
    */
  private def nano(num: Column, den: Column, gridScale: Long): Column =
    round(lit(gridScale.toDouble) * num.cast("double") /
      den.cast("double")).cast("long")

  /** (d, w, n) token counts under the engine-wide normalization
    * (lower/trim/space-collapse, empty tokens dropped — q216/q217's
    * tokenizer).
    */
  private def tokenCounts(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("d"),
        explode(split(TextShingles.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("d"), col("w"))
      .agg(count(lit(1)).as("n"))

  /** Runs `rounds` EM rounds and returns (per-round topic-word tables
    * pwz(0..rounds), final doc-topic table, the pinned doc-term counts
    * frame). pwz frames carry (w, pw: array<long>[k]); pzd carries
    * (d, pd: array<long>[k]); the counts frame carries (d, w, n) and is
    * returned so fold-in callers (q230) reuse the one pinned
    * aggregation instead of re-scanning the corpus.
    */
  private def emRounds(docs: DataFrame, textCol: String, idCol: String,
      k: Int, rounds: Int, gridScale: Long)
      : (Seq[DataFrame], DataFrame, DataFrame) = {
    require(k >= 2 && k <= 16, s"topic count out of range: $k")
    require(rounds >= 1 && rounds <= 20, s"rounds out of range: $rounds")
    require(gridScale >= 1000L && gridScale <= 1000000000L,
      s"gridScale out of range: $gridScale")
    val u0 = Math.round(gridScale.toDouble / k) // uniform grid cell
    // r18 optimization (guide §2, measured on the stage profile): the
    // doc-term aggregate is small BY BYTES (~1.6 MB at sf0.1), so AQE
    // coalesced it to ONE partition — and because every downstream
    // E-step join broadcasts the K×V / K×D tables, the whole EM round
    // (posterior arithmetic + both M-step partial aggregations) ran on
    // a single core (~400 ms per stage, every round). The explicit
    // compute repartition spreads the pinned frame across the session's
    // parallelism; every M-step sum is an order-independent integer
    // sum, so the result is bit-identical. Keyed by "d" so the
    // per-doc M-step aggregation can reuse the exchange.
    val nd = Pinning.pin(Hashing.repartitionForCompute(
      tokenCounts(docs, textCol, idCol), "d"))

    // init P(w|z)⁰: per-topic pseudo-random integer weights from the
    // word's polynomial hash, normalized per topic over the vocab
    val wt = nd.select(col("w")).distinct()
      .select(col("w"),
        graft.functions.PolyHashExprs.polyHash(col("w")).as("ph"))
      .select(col("w"), array((0 until k).map(z =>
        (col("ph") + lit(z * Mult)) % lit(997L) + lit(1L)): _*).as("wt"))
    val wtTot = wt.agg(array((0 until k).map(z =>
      sum(col("wt")(z))): _*).as("tot"))
    var pwz = Pinning.pin(wt.crossJoin(broadcast(wtTot))
      .select(col("w"), array((0 until k).map(z =>
        nano(col("wt")(z), col("tot")(z), gridScale)): _*).as("pw")))
    // init P(z|d)⁰: uniform — round 1's posterior then depends only on
    // the word, and doc-topic differentiation appears at its M-step
    var pzd = Pinning.pin(nd.select(col("d")).distinct()
      .select(col("d"),
        array(Seq.fill(k)(lit(u0)): _*).as("pd")))

    val perRound = Seq.newBuilder[DataFrame]
    perRound += pwz
    var r = 0
    while (r < rounds) {
      // E-step: joint_z = pwz_z·pzd_z exact, denominator row-local,
      // posterior rounded straight back to the grid (den==0 → uniform)
      val post = nd.join(pwz, Seq("w")).join(pzd, Seq("d"))
        .withColumn("joint",
          zip_with(col("pw"), col("pd"), (a, b) => a * b))
        .withColumn("den",
          aggregate(col("joint"), lit(0L), (acc, x) => acc + x))
        .select(col("d"), col("w"), col("n"),
          array((0 until k).map(z =>
            when(col("den") > 0,
              nano(col("joint")(z), col("den"), gridScale))
              .otherwise(lit(u0))): _*).as("post"))
      // M-step contributions n(d,w)·post_z — BIGINT grid sums.
      // r19 (guide §2.4, VERDICT r18 item 6): contrib feeds THREE
      // aggregation scans per round (the topic-total scalar, the
      // per-word M-step, the per-doc M-step) and nothing upstream was
      // shared — each scan re-ran the whole E-step join + posterior
      // arithmetic. Pinning contrib computes the E-step ONCE per round;
      // swz is pinned too (V×k longs) so its scalar total and the
      // normalized select read one materialization. Values unchanged —
      // pins only deduplicate evaluation of a deterministic frame.
      val contrib = Pinning.pin(post.select(col("d") +: col("w") +:
        (0 until k).map(z => (col("n") * col("post")(z)).as(s"c$z")): _*))
      val swz = Pinning.pin(contrib.groupBy(col("w"))
        .agg(sum(col("c0")).as("s0"),
          (1 until k).map(z => sum(col(s"c$z")).as(s"s$z")): _*))
      val sz = swz.agg(array((0 until k).map(z =>
        sum(col(s"s$z"))): _*).as("tot"))
      pwz = Pinning.pin(swz.crossJoin(broadcast(sz))
        .select(col("w"), array((0 until k).map(z =>
          when(col("tot")(z) > 0,
            nano(col(s"s$z"), col("tot")(z), gridScale))
            .otherwise(lit(0L))): _*).as("pw")))
      val sdz = contrib.groupBy(col("d"))
        .agg(sum(col("c0")).as("s0"),
          (1 until k).map(z => sum(col(s"c$z")).as(s"s$z")): _*)
        .withColumn("sd", (0 until k).map(z => col(s"s$z"))
          .reduce(_ + _))
      pzd = Pinning.pin(sdz.select(col("d"),
        array((0 until k).map(z =>
          when(col("sd") > 0, nano(col(s"s$z"), col("sd"), gridScale))
            .otherwise(lit(u0))): _*).as("pd")))
      perRound += pwz
      r += 1
    }
    (perRound.result(), pzd, nd)
  }

  /** Q225: every round's topic-word table — (round, z, word, p_nano)
    * with round 0 pinning the deterministic init. One row per
    * (round, topic, vocab word).
    */
  def plsaTopicRounds(docs: DataFrame, textCol: String,
      idCol: String = "doc_id", k: Int = 3, rounds: Int = 3,
      gridScale: Long = 1000000000L): DataFrame = {
    val (pwzRounds, _, _) = emRounds(docs, textCol, idCol, k, rounds, gridScale)
    pwzRounds.zipWithIndex.map { case (df, r) =>
      df.select(lit(r).as("round"), col("w").as("word"),
        posexplode(col("pw")).as(Seq("z", "p_nano")))
        .select(col("round"), col("z"), col("word"), col("p_nano"))
    }.reduce(_.union(_))
  }

  /** Q226: the final doc-topic mixtures — (doc_id, z, p_nano), the
    * table a mixture planner or topic-balance audit joins.
    */
  def plsaDocTopics(docs: DataFrame, textCol: String,
      idCol: String = "doc_id", k: Int = 3, rounds: Int = 3,
      gridScale: Long = 1000000000L): DataFrame = {
    val (_, pzd, _) = emRounds(docs, textCol, idCol, k, rounds, gridScale)
    pzd.select(col("d").as("doc_id"),
        posexplode(col("pd")).as(Seq("z", "p_nano")))
      .select(col("doc_id"), col("z"), col("p_nano"))
  }

  /** The trained topic-word table — (w, pw: array<long>[k]) after the
    * final round; the model [[assignTopics]] and the streaming gate
    * classify against.
    */
  def plsaModel(docs: DataFrame, textCol: String,
      idCol: String = "doc_id", k: Int = 3, rounds: Int = 3,
      gridScale: Long = 1000000000L): DataFrame =
    emRounds(docs, textCol, idCol, k, rounds, gridScale)._1.last

  /** Q230 in one call: train the model AND classify the same corpus,
    * sharing the pinned doc-term counts between training and the
    * fold-in (r19, VERDICT r18 item 3 — the separate
    * `assignTopics(docs, plsaModel(docs))` form re-ran the tokenize +
    * count aggregation the trainer had already pinned). Result is
    * bit-identical to that form: the fold-in arithmetic sees the same
    * (d, w, n) rows and the same final pwz.
    */
  def plsaAssign(docs: DataFrame, textCol: String,
      idCol: String = "doc_id", k: Int = 3, rounds: Int = 3,
      gridScale: Long = 1000000000L): DataFrame = {
    val (pwzRounds, _, nd) =
      emRounds(docs, textCol, idCol, k, rounds, gridScale)
    assignFromCounts(nd, pwzRounds.last, k, gridScale)
  }

  /** Q230: PRODUCTION inference — classify documents against a trained
    * topic-word table with one EM fold-in step (uniform doc prior →
    * E-step posterior → one M-step doc renormalization → argmax with
    * the (p DESC, z ASC) tie rule). Same integer-grid arithmetic as
    * training, so the result is engine-exact. Documents sharing no
    * vocabulary with the model are unassignable and yield no row (the
    * join is the coverage filter). `k`/`gridScale` must match the
    * model's.
    *
    * Scale: one stream-static-joinable equi-join on word + one
    * map-side-combinable aggregation per doc; the argmax is a
    * max-of-struct aggregate, never a rank window.
    */
  def assignTopics(docs: DataFrame, pwz: DataFrame, textCol: String,
      idCol: String = "doc_id", k: Int = 3,
      gridScale: Long = 1000000000L): DataFrame =
    // same compute-repartition as emRounds' pinned counts: without it
    // the fold-in posterior + per-doc aggregation run on the one
    // AQE-coalesced partition of the doc-term aggregate
    assignFromCounts(
      Hashing.repartitionForCompute(tokenCounts(docs, textCol, idCol), "d"),
      pwz, k, gridScale)

  /** The fold-in over an already-built (d, w, n) counts frame — shared
    * by [[assignTopics]] (fresh counts) and [[plsaAssign]] (the
    * trainer's pinned counts).
    */
  private def assignFromCounts(nd: DataFrame, pwz: DataFrame, k: Int,
      gridScale: Long): DataFrame = {
    require(k >= 2 && k <= 16, s"topic count out of range: $k")
    val u0 = Math.round(gridScale.toDouble / k)
    val post = nd.join(pwz, Seq("w"))
      .withColumn("joint", transform(col("pw"), p => p * lit(u0)))
      .withColumn("den",
        aggregate(col("joint"), lit(0L), (acc, x) => acc + x))
      .select(col("d"), col("n"),
        array((0 until k).map(z =>
          when(col("den") > 0, nano(col("joint")(z), col("den"), gridScale))
            .otherwise(lit(u0))): _*).as("post"))
    val sdz = post
      .select(col("d") +:
        (0 until k).map(z => (col("n") * col("post")(z)).as(s"c$z")): _*)
      .groupBy(col("d"))
      .agg(sum(col("c0")).as("s0"),
        (1 until k).map(z => sum(col(s"c$z")).as(s"s$z")): _*)
      .withColumn("sd", (0 until k).map(z => col(s"s$z")).reduce(_ + _))
    sdz.select(col("d"),
        array((0 until k).map(z =>
          when(col("sd") > 0, nano(col(s"s$z"), col("sd"), gridScale))
            .otherwise(lit(u0))): _*).as("pd"))
      .select(col("d").as("doc_id"),
        posexplode(col("pd")).as(Seq("z", "p")))
      .groupBy(col("doc_id"))
      .agg(max(struct(col("p").as("p"), (-col("z")).as("nz"),
        col("z").as("z"))).as("m"))
      .select(col("doc_id"), col("m.z").as("topic"),
        col("m.p").as("p_nano"))
  }
}
