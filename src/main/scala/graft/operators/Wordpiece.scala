package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenization (Schuster & Nakajima 2012; the BERT
  * tokenizer) — the third member of the engine's tokenizer trio next
  * to BPE ([[BpeTrain]], q59/q111/q119) and unigram-LM ([[UnigramLm]],
  * q206/q207/q215). Two halves, mirroring the BPE family's production
  * split:
  *
  *  - TRAINING ranks merges by the WordPiece likelihood score
  *    `count(l,r) / (count(l)·count(r))` instead of raw pair frequency
  *    (the HuggingFace WordPiece trainer's rule) — q228 is the oracled
  *    single-round candidate table, [[wordpieceTrainMerges]] the
  *    spec-pinned iterative trainer (the q111-vs-bpeTrainMerges
  *    split: later rounds depend on earlier argmaxes, so the trainer
  *    is pinned against a straight-line reference instead of SQL).
  *  - ENCODE segments each word greedily longest-match-first against a
  *    fixed vocabulary with `##` continuation pieces; an unmatched
  *    position makes the whole word ONE `[UNK]` (no backtracking) —
  *    q229, on the native codegen kernel
  *    [[graft.functions.WordPieceEncodeExpr]].
  *
  * Scale: training statistics live on the word-FREQUENCY table (one
  * corpus scan, then vocabulary-bounded rounds — the BpeTrain
  * argument); the score ordering is the double quotient of exact
  * BIGINT counts, identical on any engine, tie-broken by pair — a
  * deterministic total order. Encode is map-only whole-stage codegen.
  */
object Wordpiece {

  /** Fixed encode vocabulary for q229 (the "given tokenizer" case,
    * like [[BpeTrain.DefaultMerges]]): initial pieces + `##`
    * continuations sized so most corpus words segment into 1-5 pieces
    * while "dup" and "order" dead-end into [UNK] (the no-backtracking
    * rule: greedy takes "du"/"or", then no continuation matches).
    */
  val DefaultVocab: Seq[String] = Seq(
    // initial pieces (longest-match candidates at position 0)
    "a", "ba", "bi", "co", "cu", "da", "fa", "fi", "gr", "ha", "jo",
    "ke", "li", "me", "or", "pa", "qu", "ro", "sc", "sl", "sm", "so",
    "sp", "st", "ta", "th", "va", "ve", "wi",
    "hash", "join", "scan", "sort", "the",
    // continuation pieces
    "##a", "##ble", "##c", "##ch", "##dow", "##e", "##er", "##g",
    "##ge", "##k", "##l", "##lue", "##m", "##mn", "##n", "##o",
    "##ow", "##r", "##rt", "##st", "##t", "##ta", "##u", "##up",
    "##w", "##y")

  /** Longest piece content length in [[DefaultVocab]]. */
  val DefaultMaxSub: Int = 4

  /** Q228: single-round WordPiece merge candidates — adjacent
    * character pairs ranked by `n / (ln·rn)` (pair count over the
    * product of the symbols' corpus counts), top-k by
    * (score DESC, l ASC, r ASC). Output carries the exact integer
    * counts, never the float score.
    *
    * Scale: ONE corpus scan (a map-side-combinable `groupBy(word)` to
    * the vocabulary-bounded (word, freq) table — the BpeTrain
    * argument; both count aggregations run freq-WEIGHTED over that
    * compact table, and Spark's exchange reuse shares its shuffle
    * between them), a broadcast join against the symbol-count table
    * (alphabet-sized), and the q111 windowless top-k device
    * (TakeOrderedAndProject, never a global rank window).
    */
  def wordpiecePairCandidates(docs: DataFrame, textCol: String,
      k: Int = 20): DataFrame = {
    require(k >= 1 && k <= 10000, s"k out of range: $k")
    val words = docs
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val chars = words
      .select(col("freq"),
        explode(filter(split(col("word"), ""), s => s =!= lit("")))
          .as("c"))
      .groupBy(col("c")).agg(sum(col("freq")).as("cn"))
    val pairs = words
      .filter(length(col("word")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), length(col("word")) - 1),
        i => struct(col("word").substr(i, lit(1)).as("l"),
          col("word").substr(i + 1, lit(1)).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("n"))
    val scored = pairs
      .join(broadcast(chars.select(col("c").as("l"), col("cn").as("ln"))),
        Seq("l"))
      .join(broadcast(chars.select(col("c").as("r"), col("cn").as("rn"))),
        Seq("r"))
      .withColumn("score",
        col("n").cast("double") /
          (col("ln").cast("double") * col("rn").cast("double")))
    val out = scored
      .orderBy(col("score").desc, col("l"), col("r"))
      .limit(k)
      .agg(array_sort(collect_list(struct((-col("score")).as("negs"),
        col("l").as("l"), col("r").as("r"), col("n").as("n"),
        col("ln").as("ln"), col("rn").as("rn")))).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("s.l").as("l"), col("s.r").as("r"), col("s.n").as("n"),
        col("s.ln").as("ln"), col("s.rn").as("rn"),
        (col("pos") + 1).as("rank"))
    out
  }

  /** Iterative WordPiece trainer: learn `numMerges` merges, each round
    * ranking candidate pairs by `pairCount / (leftCount·rightCount)`
    * over the CURRENT symbol tables (counts weighted by word
    * frequency), tie-break (l ASC, r ASC); greedy left-to-right merge
    * application ([[BpeTrain.applyMerge]]). Spec-pinned against a
    * straight-line reference (WordpieceSpec) — later rounds depend on
    * earlier argmaxes, so it is not SQL-unrollable at useful sizes.
    *
    * Returns (merge_rank, left, right, pair_freq, left_freq,
    * right_freq) in learning order. Throws when pairs run out early —
    * a silently short vocab corrupts every downstream encode.
    *
    * Scale: the BpeTrain shape — rounds over the vocabulary-bounded
    * (word, freq, symbols) table, one pair count + one symbol count +
    * one driver argmax row per round, flat lineage via per-round
    * checkpoints.
    */
  def wordpieceTrainMerges(docs: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    require(numMerges >= 1 && numMerges <= 10000,
      s"numMerges out of range: $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    var words = BpeTrain.wordTable(docs, textCol).localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long, Long, Long)]
    for (rank <- 1 to numMerges) {
      val symCounts = words
        .select(col("freq"), explode(col("symbols")).as("s"))
        .groupBy(col("s")).agg(sum(col("freq")).as("cn"))
      val top = words
        .select(col("freq"), explode(BpeTrain.pairsOf(col("symbols")))
          .as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
        .withColumn("l", split(col("pair"), BpeTrain.SEP, 2).getItem(0))
        .withColumn("r", split(col("pair"), BpeTrain.SEP, 2).getItem(1))
        .join(broadcast(symCounts.select(col("s").as("l"),
          col("cn").as("ln"))), Seq("l"))
        .join(broadcast(symCounts.select(col("s").as("r"),
          col("cn").as("rn"))), Seq("r"))
        .withColumn("score", col("n").cast("double") /
          (col("ln").cast("double") * col("rn").cast("double")))
        .orderBy(col("score").desc, col("l"), col("r"))
        .limit(1)
        .select(col("l"), col("r"), col("n"), col("ln"), col("rn"))
        .as[(String, String, Long, Long, Long)]
        .collect()
      if (top.isEmpty) throw new IllegalStateException(
        s"wordpieceTrainMerges: no mergeable pair left at rank $rank " +
          s"of $numMerges")
      val (l, r, n, ln, rn) = top.head
      merges += ((rank, l, r, n, ln, rn))
      val next = words
        .withColumn("symbols", BpeTrain.applyMerge(col("symbols"), l, r))
        .localCheckpoint()
      words.unpersist(blocking = false)
      words = next
    }
    words.unpersist(blocking = false)
    merges.result()
      .toDF("merge_rank", "left", "right", "pair_freq", "left_freq",
        "right_freq")
  }

  /** BATCHED WordPiece trainer: learn `numMerges` merges with one
    * scored-count scan per ROUND instead of per merge — the
    * [[BpeTrain.bpeTrainMergesBatched]] device applied to the
    * WordPiece likelihood ranking. Each round builds ONE
    * (pair, n, ln, rn, score) table, walks it in (score DESC, l ASC,
    * r ASC) order, and accepts up to `batchK` pairwise symbol-DISJOINT
    * pairs (a pair sharing a symbol — left, right, or the merged
    * token — with an already-accepted pair is SKIPPED). The
    * conflict-skip rule is what keeps batched scores VALID: merging
    * (a,b) only changes the corpus counts of symbols a, b, and ab and
    * of pairs touching them, so a disjoint pair's n, ln, rn — hence
    * its exact score — are unchanged by the earlier acceptance.
    *
    * Same batched-vs-sequential semantics caveat as BPE: a pair whose
    * true sequential rank depends on a recount after an INTERACTING
    * earlier merge may land at a different rank (it defers to the
    * next round). Output is fully deterministic and engine-independent;
    * batchK = 1 degenerates to [[wordpieceTrainMerges]] exactly
    * (WordpieceTrainBatchedSpec pins both properties). At a 30k-merge
    * production vocab this runs O(numMerges / batchK) Spark jobs,
    * lifting the job-per-merge driver wall.
    */
  def wordpieceTrainMergesBatched(docs: DataFrame, textCol: String,
      numMerges: Int, batchK: Int = 16): DataFrame = {
    require(numMerges >= 1 && numMerges <= 100000,
      s"numMerges out of range: $numMerges")
    require(batchK >= 1, s"batchK must be >= 1, got $batchK")
    val spark = docs.sparkSession
    import spark.implicits._
    var words = BpeTrain.wordTable(docs, textCol)
      .localCheckpoint(eager = false)
    // previous round's table: unpersisted only AFTER the collect has
    // materialized the current round's lazy checkpoint (the BpeTrain
    // discipline)
    var prev: Option[DataFrame] = None
    val merges = Seq.newBuilder[(Int, String, String, Long, Long, Long)]
    var done = 0
    while (done < numMerges) {
      val symCounts = words
        .select(col("freq"), explode(col("symbols")).as("s"))
        .groupBy(col("s")).agg(sum(col("freq")).as("cn"))
      // limit batchK*8: the conflict walk skips past the top batchK;
      // a too-short list costs an extra round, never correctness
      val top = words
        .select(col("freq"), explode(BpeTrain.pairsOf(col("symbols")))
          .as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
        .withColumn("l", split(col("pair"), BpeTrain.SEP, 2).getItem(0))
        .withColumn("r", split(col("pair"), BpeTrain.SEP, 2).getItem(1))
        .join(broadcast(symCounts.select(col("s").as("l"),
          col("cn").as("ln"))), Seq("l"))
        .join(broadcast(symCounts.select(col("s").as("r"),
          col("cn").as("rn"))), Seq("r"))
        .withColumn("score", col("n").cast("double") /
          (col("ln").cast("double") * col("rn").cast("double")))
        .orderBy(col("score").desc, col("l"), col("r"))
        .limit(batchK * 8)
        .select(col("l"), col("r"), col("n"), col("ln"), col("rn"))
        .as[(String, String, Long, Long, Long)]
        .collect()
      prev.foreach(_.unpersist(blocking = false))
      prev = None
      if (top.isEmpty) throw new IllegalStateException(
        s"wordpieceTrainMergesBatched: no mergeable pair left at rank " +
          s"${done + 1} of $numMerges")
      val touched = scala.collection.mutable.Set.empty[String]
      val accepted = Seq.newBuilder[(String, String, Long, Long, Long)]
      var k = 0
      top.iterator.takeWhile(_ => k < batchK && done + k < numMerges)
        .foreach { case (l, r, n, ln, rn) =>
          if (!touched(l) && !touched(r) && !touched(l + r)) {
            accepted += ((l, r, n, ln, rn))
            touched ++= Seq(l, r, l + r)
            k += 1
          }
        }
      val batch = accepted.result()
      batch.foreach { case (l, r, n, ln, rn) =>
        done += 1
        merges += ((done, l, r, n, ln, rn))
      }
      val next = words
        .withColumn("symbols", batch.foldLeft(col("symbols")) {
          case (s, (l, r, _, _, _)) => BpeTrain.applyMerge(s, l, r)
        })
        .localCheckpoint(eager = false)
      prev = Some(words)
      words = next
    }
    prev.foreach(_.unpersist(blocking = false))
    words.unpersist(blocking = false)
    merges.result()
      .toDF("merge_rank", "left", "right", "pair_freq", "left_freq",
        "right_freq")
  }

  /** Q229: per-document token statistics under the fixed WordPiece
    * vocabulary — (doc_id, ws_tokens, wp_tokens, unk_words), the q119
    * shape for the WordPiece encoder. Map-only native kernel; the
    * vocabulary IS the tokenizer and rides as a plan literal.
    */
  def wordpieceTokenStats(docs: DataFrame, textCol: String,
      idCol: String, vocab: Seq[String] = DefaultVocab,
      maxSub: Int = DefaultMaxSub): DataFrame = {
    val stats = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WordPieceEncodeExpr(
        org.apache.spark.sql.GraftBridge.expression(
          coalesce(col(textCol), lit(""))),
        vocab, maxSub))
    docs.select(col(idCol),
      stats.getItem(0).as("ws_tokens"),
      stats.getItem(1).as("wp_tokens"),
      stats.getItem(2).as("unk_words"))
  }

  /** Q234: CROSS-TOKENIZER FERTILITY — per language, how many tokens
    * each tokenizer spends on the same text (chars/token is the
    * fertility metric tokenizer selection reads): whitespace, BPE
    * (q119's fixed merge table), and WordPiece (q229's vocabulary),
    * plus the WordPiece [UNK] casualty count. One map-only pass runs
    * BOTH native kernels per row, then one map-side-combinable
    * aggregation — the corpus never shuffles.
    */
  def tokenizerFertility(docs: DataFrame, textCol: String,
      langCol: String, vocab: Seq[String] = DefaultVocab,
      maxSub: Int = DefaultMaxSub,
      merges: Seq[(String, String)] = BpeTrain.DefaultMerges)
      : DataFrame = {
    val txt = coalesce(col(textCol), lit(""))
    val wp = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WordPieceEncodeExpr(
        org.apache.spark.sql.GraftBridge.expression(txt), vocab, maxSub))
    val bpe = org.apache.spark.sql.GraftBridge.column(
      graft.functions.BpeEncodeExpr(
        org.apache.spark.sql.GraftBridge.expression(txt), merges))
    docs
      .select(col(langCol).as("lang"),
        length(txt).cast("long").as("nc"),
        wp.getItem(0).as("ws"), wp.getItem(1).as("wp"),
        wp.getItem(2).as("un"), bpe.getItem(1).as("bp"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nc")).as("n_chars"),
        sum(col("ws")).as("ws_tokens"),
        sum(col("bp")).as("bpe_tokens"),
        sum(col("wp")).as("wp_tokens"),
        sum(col("un")).as("unk_words"))
  }
}
