package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer-vocabulary induction — the step a training pipeline runs
  * AFTER corpus prep (dedup → quality → mix) and BEFORE packing: learn the
  * subword merge table from the corpus itself. Classic byte-pair encoding
  * (Sennrich et al. 2016): repeatedly count adjacent symbol pairs across
  * the corpus and merge the most frequent pair into one symbol.
  *
  * The scale design hinges on one observation: BPE statistics only depend
  * on the WORD-FREQUENCY table, not the corpus — so the corpus is scanned
  * exactly once (one map-side-combinable `groupBy(word)`), and every
  * training round runs over the compact (word, freq) table, whose size is
  * vocabulary-bounded (Heaps' law: millions of rows at 100 TB, not
  * trillions). Each round is one aggregation + one argmax + one
  * symbol-array rewrite; rounds checkpoint (`localCheckpoint`) so the plan
  * stays flat instead of nesting `numMerges` transforms — the same
  * flat-lineage discipline as q55's label propagation.
  *
  * The merge application is a pure catalyst `aggregate` HOF fold (no UDF):
  * greedy LEFT-TO-RIGHT pairing, so "aaa" under merge (a,a) becomes
  * (aa, a) — the reference BPE behavior — with the candidate symbol
  * carried in the fold accumulator. Argmax tie-break is (count DESC, left
  * ASC, right ASC): deterministic on any partitioning and any engine.
  */
object BpeTrain {

  /** Adjacent-symbol pairs of one word's symbol array, as "l␟r" strings —
    * unambiguous because [[wordTable]] strips the unit separator from
    * every word before the symbol split.
    */
  private[operators] val SEP = ""

  private[operators] def pairsOf(symbols: Column): Column =
    zip_with(
      slice(symbols, lit(1), greatest(size(symbols) - 1, lit(0))),
      slice(symbols, lit(2), greatest(size(symbols) - 1, lit(0))),
      (a, b) => concat(a, lit(SEP), b))

  /** One corpus scan → the (word, freq, symbols) training table; symbols
    * start as single characters.
    */
  private[operators] def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(col(textCol), "\\s+")).as("raw"))
      // U+001F (the pair-encoding separator) and U+001E (the oracle's
      // symbol-terminator) are NOT Java-regex \s, so words containing
      // them would survive the split and later corrupt the delimited
      // symbol encoding (engine pair strings / oracle regex parsing) —
      // strip BOTH from the symbol alphabet here, matching
      // BpeEncodeExpr.compute and the q240/q241 oracles.
      .select(translate(col("raw"), SEP + "\u001E", "").as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .withColumn("symbols",
        filter(split(col("word"), ""), s => s =!= lit("")))

  /** Apply merge (l, r) → l+r to a symbol array, greedy left-to-right:
    * fold symbols with a one-symbol lookbehind in the accumulator.
    */
  private[operators] def applyMerge(symbols: Column, l: String, r: String): Column = {
    val folded = aggregate(
      symbols,
      struct(array().cast("array<string>").as("out"),
        lit(null).cast("string").as("pend")),
      (acc, x) =>
        when(acc.getField("pend").isNull,
          struct(acc.getField("out").as("out"), x.as("pend")))
          .when(acc.getField("pend") === lit(l) && x === lit(r),
            struct(
              concat(acc.getField("out"), array(lit(l + r))).as("out"),
              lit(null).cast("string").as("pend")))
          .otherwise(struct(
            concat(acc.getField("out"), array(acc.getField("pend"))).as("out"),
            x.as("pend"))),
      acc =>
        when(acc.getField("pend").isNull, acc.getField("out"))
          .otherwise(concat(acc.getField("out"),
            array(acc.getField("pend")))))
    folded
  }

  /** Learn `numMerges` BPE merges from the corpus. Returns one row per
    * merge: (merge_rank, left, right, pair_freq) in learning order.
    * Throws if the corpus runs out of mergeable pairs early — a truncated
    * vocab must fail loudly, not return silently short.
    */
  def bpeTrainMerges(docs: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = wordTable(docs, textCol).localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (rank <- 1 to numMerges) {
      // count pairs weighted by word frequency; deterministic argmax
      // ordered (n DESC, l ASC, r ASC) on SPLIT columns — ordering by
      // the concatenated pair string would rank symbols containing
      // code points below U+001F differently from the (l, r) order the
      // q241 oracle uses (wordpieceTrainMerges already splits)
      val top = words
        .select(col("freq"), explode(pairsOf(col("symbols"))).as("pair"))
        .groupBy(col("pair"))
        .agg(sum(col("freq")).as("n"))
        .withColumn("l", split(col("pair"), SEP, 2).getItem(0))
        .withColumn("r", split(col("pair"), SEP, 2).getItem(1))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1)
        .select(col("l"), col("r"), col("n"))
        .as[(String, String, Long)]
        .collect()
      if (top.isEmpty) throw new IllegalStateException(
        s"bpeTrainMerges: no mergeable pair left at rank $rank of $numMerges")
      val (l, r, n) = top.head
      merges += ((rank, l, r, n))
      val next = words
        .withColumn("symbols", applyMerge(col("symbols"), l, r))
        .localCheckpoint()
      words.unpersist(blocking = false)
      words = next
    }
    words.unpersist(blocking = false)
    merges.result()
      .toDF("merge_rank", "left", "right", "pair_freq")
  }

  /** BATCHED trainer: learn `numMerges` merges with one pair-count scan
    * per ROUND instead of per merge — each round accepts the top
    * `batchK` pairwise-DISJOINT pairs from a single count table
    * (descending (count, l-asc, r-asc) walk; a pair sharing a symbol — left,
    * right, or the merged token — with an already-accepted pair this
    * round is SKIPPED, since applying the earlier merge invalidates its
    * count). This is the standard scalable-BPE device: the driver loop
    * runs O(numMerges / batch) Spark jobs, not O(numMerges), lifting the
    * job-per-merge bound [[bpeTrainMerges]] hits at 32k-merge vocab
    * sizes.
    *
    * Semantics note (why this is a separate method, not a flag): batched
    * acceptance reads all `batchK` argmaxes from ONE count table, so a
    * merge whose true sequential rank depends on a recount after an
    * interacting earlier merge can land at a different rank — e.g. the
    * sequential chain (t,h) → (th,e) needs a recount to see "th", so the
    * batched list defers (th,e) to the next round and may promote an
    * independent pair first. The output is still fully deterministic and
    * engine-independent (same (count DESC, left ASC, right ASC) order,
    * same greedy left-to-right application in acceptance order), and a
    * conservative equivalence experiment on the test corpus showed exact
    * sequential agreement requires average batch ≈ 1.6 (the top pairs
    * chain) — the throughput win requires accepting the standard batched
    * semantics, which BpeTrainBatchedSpec pins against a local reference
    * implementing exactly these rules.
    */
  def bpeTrainMergesBatched(docs: DataFrame, textCol: String,
      numMerges: Int, batchK: Int = 16): DataFrame = {
    require(batchK >= 1, s"batchK must be >= 1, got $batchK")
    val spark = docs.sparkSession
    import spark.implicits._
    var words = wordTable(docs, textCol).localCheckpoint(eager = false)
    // the PREVIOUS round's table: unpersisted only AFTER the collect has
    // materialized the current round's lazy checkpoint — unpersisting
    // eagerly would drop blocks the (lineage-truncated) current table
    // still needs to come into existence
    var prev: Option[DataFrame] = None
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var done = 0
    while (done < numMerges) {
      // ONE job per round: the count+top collect computes every partition
      // of `words`, which materializes its lazy checkpoint as a side
      // effect — no separate checkpoint job.
      // limit is batchK*8: skipping conflicts walks past the top batchK,
      // and a too-short list only costs an extra round, never correctness
      val top = words
        .select(col("freq"), explode(pairsOf(col("symbols"))).as("pair"))
        .groupBy(col("pair"))
        .agg(sum(col("freq")).as("n"))
        .withColumn("l", split(col("pair"), SEP, 2).getItem(0))
        .withColumn("r", split(col("pair"), SEP, 2).getItem(1))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(batchK * 8)
        .select(col("l"), col("r"), col("n"))
        .as[(String, String, Long)]
        .collect()
      prev.foreach(_.unpersist(blocking = false))
      prev = None
      if (top.isEmpty) throw new IllegalStateException(
        s"bpeTrainMergesBatched: no mergeable pair left at rank ${done + 1} " +
          s"of $numMerges")
      val touched = scala.collection.mutable.Set.empty[String]
      val accepted = Seq.newBuilder[(String, String, Long)]
      var k = 0
      top.iterator.takeWhile(_ => k < batchK && done + k < numMerges)
        .foreach { case (l, r, n) =>
          if (!touched(l) && !touched(r) && !touched(l + r)) {
            accepted += ((l, r, n))
            touched ++= Seq(l, r, l + r)
            k += 1
          }
        }
      val batch = accepted.result()
      batch.foreach { case (l, r, n) =>
        done += 1
        merges += ((done, l, r, n))
      }
      val next = words
        .withColumn("symbols", batch.foldLeft(col("symbols")) {
          case (s, (l, r, _)) => applyMerge(s, l, r)
        })
        .localCheckpoint(eager = false)
      prev = Some(words)
      words = next
    }
    prev.foreach(_.unpersist(blocking = false))
    words.unpersist(blocking = false)
    merges.result()
      .toDF("merge_rank", "left", "right", "pair_freq")
  }

  /** A small fixed English-ish merge table for [[bpeTokenStats]] — the
    * "given tokenizer" case: encoding with a vocabulary trained elsewhere
    * (the normal production split: train once, encode everywhere). Order
    * matters — later merges build on earlier ones ((t,h) then (th,e)
    * turns "the" into one token).
    */
  val DefaultMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "e" -> "r",
    "o" -> "n", "r" -> "e", "a" -> "t", "e" -> "n", "o" -> "r")

  /** Encode one word (symbol array) under an ordered merge list: the fold
    * of [[applyMerge]] over the merges, greedy left-to-right within each
    * merge round — the standard BPE encode for a rank-ordered vocab.
    */
  private[operators] def encodeSymbols(symbols: Column,
      merges: Seq[(String, String)]): Column =
    merges.foldLeft(symbols) { case (s, (l, r)) => applyMerge(s, l, r) }

  /** Q119: per-document token statistics under a FIXED merge vocabulary —
    * the encode side of the BPE loop (q111 trains; this applies). For a
    * training pipeline this is THE token counter: budget selection
    * (q110), packing (q102) and mixture planning (q118) all want tokens
    * under the real tokenizer, not whitespace counts.
    *
    * Scale design: pure per-row column expressions (split → per-word
    * encode fold → sum), no shuffle at all before the caller's
    * aggregation — a map-only kernel over the corpus scan, exactly like
    * the q13 token counter. The merge list is a plan literal (it IS the
    * tokenizer), so everything stays in whole-stage codegen.
    *
    * U+001F/U+001E are stripped from the text first: they delimit symbols
    * in the engine-portable pair encoding (see [[wordTable]]), so they
    * cannot be allowed to appear inside a symbol.
    */
  def bpeTokenStats(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)] = DefaultMerges): DataFrame = {
    val stats = org.apache.spark.sql.GraftBridge.column(
      graft.functions.BpeEncodeExpr(
        org.apache.spark.sql.GraftBridge.expression(
          coalesce(col(textCol), lit(""))),
        merges))
    docs.select(
      col(idCol),
      stats.getItem(0).as("ws_tokens"),
      stats.getItem(1).as("bpe_tokens"))
  }

  /** Higher-order-function formulation of [[bpeTokenStats]] — the
    * shuffle-free but CodegenFallback-interpreted original, kept as the
    * independent cross-check the spec pins the native
    * [[graft.functions.BpeEncodeExpr]] against (same pattern as the
    * SimHash native==HOF bit-identity spec). Not wired to any query.
    */
  def bpeTokenStatsHof(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)] = DefaultMerges): DataFrame = {
    val words = filter(
      split(translate(coalesce(col(textCol), lit("")), "\u001F\u001E", ""),
        "\\s+"),
      w => w =!= "")
    val chars = (w: Column) => filter(split(w, ""), s => s =!= lit(""))
    val tokensPerWord =
      transform(words, w => size(encodeSymbols(chars(w), merges)).cast("long"))
    docs.select(
      col(idCol),
      size(words).cast("long").as("ws_tokens"),
      aggregate(tokensPerWord, lit(0L), (acc, x) => acc + x)
        .as("bpe_tokens"))
  }

  /** Q111: single-round merge-candidate statistics — the first BPE
    * iteration's pair table, top-k by (count DESC, pair ASC). SQL-
    * expressible (unlike the iterative trainer, whose later rounds depend
    * on earlier argmaxes), so this is the oracled surface; the trainer is
    * spec-pinned against a local reference implementation instead.
    */
  def bpePairCandidates(docs: DataFrame, textCol: String,
      k: Int = 20): DataFrame =
    docs
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) >= 2)
      .select(explode(transform(
        sequence(lit(1), length(col("word")) - 1),
        i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))
      // BOUNDED global top-k: orderBy+limit plans TakeOrderedAndProject —
      // per-partition k-heaps merged at the driver (#partitions × k rows)
      // — so a CJK-scale pair table (|charset|² ≈ 10⁸ rows) never funnels
      // into one partition the way a global rank Window would. Rank is
      // then derived WINDOWLESS from the k survivors: one k-bounded
      // collect_list + array_sort + posexplode (struct order (-n, pair)
      // ascending ≡ (n DESC, pair ASC), the argmax tie-break).
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
      .agg(array_sort(collect_list(struct(
        (-col("n")).as("negn"), col("pair").as("pair"), col("n").as("n"))))
        .as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("s.pair").as("pair"), col("s.n").as("n"),
        (col("pos") + 1).as("rank"))
}
