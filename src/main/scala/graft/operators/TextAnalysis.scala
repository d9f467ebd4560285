package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (mandated extension
  * alongside SURVEY §2.3 Q8): token counting, quality scoring, language-ID
  * heuristic, and document fingerprinting. Everything is a codegen'd column
  * expression — per-document work is embarrassingly parallel, and the only
  * shuffle in any query here is the final small groupBy.
  */
object TextAnalysis {

  /** SQL `div` (integral division) as a Column — floor-toward-zero on
    * longs, identical semantics to DuckDB's `//` for non-negative
    * operands. The Column API has no integer-division method; routing
    * through the Catalyst expression keeps callers out of `expr()`
    * string splicing.
    */
  private[graft] def idiv(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** Whitespace token count (0 for empty/blank text). */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0))).cast("long")

  /** BPE-ish subword token estimate: count of matches of a GPT-style
    * pre-tokenizer regex (word pieces, numbers, punctuation runs).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0))).cast("long")

  /** Quality heuristics: length, punctuation ratio, stopword ratio, mean
    * token length — the standard cheap filters for corpus cleaning.
    */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val n = length(text).cast("double")
    val toks = tokenCount(text)
    val punct = size(regexp_extract_all(text, lit("[^\\w\\s]"), lit(0))).cast("double")
    val stop = size(regexp_extract_all(lower(text),
      lit("\\b(the|a|an|and|or|of|to|in|is|it)\\b"), lit(0))).cast("double")
    Seq(
      "n_chars_measured" -> length(text).cast("long"),
      "n_tokens" -> toks,
      "punct_ratio" -> round(punct / greatest(n, lit(1.0)), 6),
      "stopword_ratio" -> round(stop / greatest(toks.cast("double"), lit(1.0)), 6),
      "mean_token_len" -> round(n / greatest(toks.cast("double"), lit(1.0)), 6))
  }

  /** Per-document quality score table. */
  def quality(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol) +: qualityColumns(col(textCol)).map {
      case (name, c) => c.as(name)
    }: _*)

  private val langStopwords: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is|that|it|was|for)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|ein|eine|zu|den)\\b",
    "fr" -> "\\b(le|la|les|et|est|une|des|du|que|pas)\\b",
    "es" -> "\\b(el|los|las|es|una|del|que|por|con|para)\\b")

  /** Stopword-hit language-ID heuristic: score each candidate language by
    * stopword matches; pick the first language (in [[langStopwords]] order)
    * whose score is maximal and positive — a deterministic argmax with a
    * declared tie-break, trivially mirrored in oracle SQL. No hits → "und".
    */
  def langIdColumn(text: Column): Column = {
    val lowered = lower(text)
    val hits = langStopwords.map { case (code, pat) =>
      code -> size(regexp_extract_all(lowered, lit(pat), lit(0))).cast("long")
    }
    val maxHits = greatest(hits.map(_._2): _*)
    hits.foldLeft(when(maxHits <= 0, lit("und"))) { case (acc, (code, h)) =>
      acc.when(h === maxHits, lit(code))
    }.otherwise(lit("und"))
  }

  /** Per-document predicted language. */
  def langId(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol), langIdColumn(col(textCol)).as("lang_pred"))

  /** Q211: CALIBRATION audit of the lang-ID classifier — the model-eval
    * primitive a scored pipeline needs before its scores gate anything
    * (reliability diagram + per-bucket expected-calibration-error
    * terms): bucket documents by the classifier's CONFIDENCE (here the
    * stopword-hit share of the winning language), then compare each
    * bucket's mean confidence against its observed accuracy vs the
    * corpus's labeled `lang`. A well-calibrated scorer has
    * |accuracy − confidence| ≈ 0 per bucket; ECE is the n-weighted sum
    * of the `gap_micros` column.
    *
    * Confidence is the LAPLACE-SMOOTHED winner share,
    * mx/(tot + |langs|): the raw share mx/tot saturates at 1.0 whenever
    * only one language hits at all (the universal case on short or
    * domain text), flattening the diagram into a single bucket;
    * smoothing makes confidence grow with EVIDENCE (one hit → 0.2,
    * five unanimous hits → 0.55), which is what a calibratable score
    * must do.
    *
    * Exactness: confidence, means and accuracies are all integer micro
    * divisions (one `div` each); buckets are integer deciles (capped at
    * 9 so confidence 1.0 lands in the top bucket). Undecidable docs
    * (zero stopword hits) are excluded — they carry no confidence to
    * calibrate. Scale: ONE map-only scoring pass (the regex counters
    * are codegen'd) into a 10-row aggregation.
    */
  def langCalibration(docs: DataFrame, textCol: String = "text",
      langCol: String = "lang"): DataFrame = {
    val lowered = lower(col(textCol))
    val hits = langStopwords.map { case (_, pat) =>
      size(regexp_extract_all(lowered, lit(pat), lit(0))).cast("long")
    }
    val nLangs = langStopwords.size
    docs
      .select(col(langCol).as("truth"),
        langIdColumn(col(textCol)).as("pred"),
        greatest(hits: _*).as("mx"),
        hits.reduce(_ + _).as("tot"))
      .filter(col("tot") > 0)
      .withColumn("conf", expr(s"(mx * 1000000L) div (tot + $nLangs)"))
      .withColumn("bucket", least(expr("conf div 100000L"), lit(9L)))
      .withColumn("ok", (col("pred") === col("truth")).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("conf")).as("__sc"),
        sum(col("ok")).as("__ok"))
      .select(col("bucket"), col("n"),
        expr("__sc div n").as("mean_conf_micros"),
        expr("(__ok * 1000000L) div n").as("acc_micros"),
        abs(expr("__sc div n") - expr("(__ok * 1000000L) div n"))
          .as("gap_micros"))
  }

  /** Polynomial rolling-hash fingerprint of the normalized text:
    * fp = fold(chars, 0, (acc, ch) -> (acc * 31 + ascii(ch)) mod 1e9+7).
    * Order-sensitive (unlike a bag-of-words hash). The modulus keeps
    * acc*31+ch < 2^63 so engines that trap on int64 overflow (DuckDB)
    * compute the identical value. NATIVE fused loop
    * ([[graft.functions.RollingHashExpr]]); the interpreted HOF
    * formulation survives as [[fingerprintHof]] for the bit-identity spec.
    */
  def fingerprint(text: Column): Column =
    graft.functions.RollingHashExpr.rollingHash(TextShingles.normalize(text))

  /** Interpreted HOF formulation of [[fingerprint]] (spec cross-check). */
  def fingerprintHof(text: Column): Column = {
    val p = lit(1000000007L)
    val chars = split(TextShingles.normalize(text), "")
    aggregate(chars, lit(0L), (acc, ch) => pmod(acc * 31L + ascii(ch), p))
  }

  /** Q46: Gopher/C4-style repetition quality rules — the cheap structural
    * filters a training-data pipeline applies before any model-based
    * scoring. Four counters per document (token count, distinct tokens,
    * most-frequent-token count, most-frequent-bigram count) come from ONE
    * native map-only pass ([[graft.functions.TokenStatsExpr]]); the rules
    * are plain arithmetic over them:
    *
    *   r_short        n_toks < minToks
    *   r_low_div      type-token ratio < minTtr          (template spam)
    *   r_rep_token    top-token fraction > maxTokFrac    (keyword stuffing)
    *   r_rep_bigram   top-bigram fraction > maxBigramFrac (boilerplate loops)
    *
    * keep = no rule fired. Rule flags are ints (0/1) so every engine hashes
    * them identically. At 100 TB this is a pure scan→project — no shuffle;
    * the explode+groupBy formulation (which shuffles every token) exists
    * only as the oracle/spec cross-check.
    */
  def qualityRules(
      docs: DataFrame, textCol: String, idCol: String,
      minToks: Int = 15, minTtr: Double = 0.4,
      maxTokFrac: Double = 0.12, maxBigramFrac: Double = 0.06): DataFrame = {
    val st = graft.functions.TokenStatsExpr.tokenStats(
      split(TextShingles.normalize(col(textCol)), " "))
    val withC = docs
      .select(col(idCol), st.as("st"))
      .select(col(idCol),
        col("st").getItem(0).as("n_toks"),
        col("st").getItem(1).as("n_distinct"),
        col("st").getItem(2).as("top_token_c"),
        col("st").getItem(3).as("top_bigram_c"))
    val nD = col("n_toks").cast("double")
    val ttr = col("n_distinct") / greatest(nD, lit(1.0))
    val tokFrac = col("top_token_c") / greatest(nD, lit(1.0))
    val bgFrac = col("top_bigram_c") / greatest(nD - 1.0, lit(1.0))
    val rShort = (col("n_toks") < minToks).cast("int")
    val rLowDiv = (ttr < minTtr).cast("int")
    val rRepTok = (tokFrac > maxTokFrac).cast("int")
    val rRepBg = (bgFrac > maxBigramFrac).cast("int")
    withC.select(
      col(idCol), col("n_toks"), col("n_distinct"),
      col("top_token_c"), col("top_bigram_c"),
      round(ttr, 6).as("ttr"),
      round(tokFrac, 6).as("top_token_frac"),
      round(bgFrac, 6).as("top_bigram_frac"),
      rShort.as("r_short"), rLowDiv.as("r_low_div"),
      rRepTok.as("r_rep_token"), rRepBg.as("r_rep_bigram"),
      (rShort + rLowDiv + rRepTok + rRepBg === 0).cast("int").as("keep"))
  }

  /** Explode+groupBy formulation of [[graft.functions.TokenStatsExpr]]'s
    * counters — the cross-check used by TextAnalysisSpec (and mirrored by
    * the q46 oracle SQL). Shuffles every token; spec-only.
    */
  def tokenStatsExploded(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      split(TextShingles.normalize(col(textCol)), " ").as("toks"))
    val tok = toks.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_toks"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_token_c"))
    val bg = toks.select(col("doc_id"),
        explode(TextShingles.allWordNgramsOf(col("toks"), 2)).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_bigram_c"))
    tok.join(bg, Seq("doc_id"))
  }

  // --- PII redaction (q47) ---------------------------------------------
  // The redaction patterns stay in the RE2-compatible subset (no
  // backreferences, no lookaround) so Spark (java.util.regex) and the
  // DuckDB oracle (RE2) match identical spans.
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\+?\\d[\\d-]{6,}\\d"
  private val ipRe = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** Deterministic synthetic contact block derived from the doc id. The
    * testdata corpus contains no PII at all (no digits, no '@'), so q47
    * first APPENDS known PII — the same derive-from-testdata pattern as
    * Multimodal's stub media column — and then redacts it; the redaction
    * regexes are the real operator under test.
    */
  def withSyntheticContact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.withColumn("text_pii", concat(
      col(textCol),
      lit(" contact user"), col(idCol).cast("string"),
      lit("@example.com or +1-555-"),
      lpad(pmod(col(idCol), lit(10000)).cast("string"), 4, "0"),
      lit(" ip 10.0."), pmod(col(idCol), lit(256)).cast("string"), lit(".7")))

  /** Q47: PII scrubbing — replace emails, then phone numbers, then IPv4
    * addresses with typed placeholders, and count each kind (the audit
    * trail a compliance pipeline keeps). Pure map-only regex columns; the
    * replacement ORDER is part of the contract (emails first, so the
    * phone pattern never sees an address's digits).
    */
  def piiRedact(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col("text_pii")
    // Each kind is COUNTED on the same intermediate string its replacement
    // runs on (emails on the raw text, phones on the email-redacted text,
    // IPs on the phone-redacted text). Counting everything on the raw text
    // would disagree with the substitutions actually made whenever patterns
    // overlap — e.g. a phone-like digit run inside an email local part
    // would be counted as a phone but never replaced.
    val afterEmail = regexp_replace(t, emailRe, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, phoneRe, "<PHONE>")
    val redacted = regexp_replace(afterPhone, ipRe, "<IP>")
    withSyntheticContact(docs, textCol, idCol).select(
      col(idCol),
      regexp_count(t, lit(emailRe)).cast("long").as("n_emails"),
      regexp_count(afterEmail, lit(phoneRe)).cast("long").as("n_phones"),
      regexp_count(afterPhone, lit(ipRe)).cast("long").as("n_ips"),
      redacted.as("redacted"))
  }

  /** Q54: the table-generating (UDTF) surface — posexplode a document into
    * `(pos, token)` rows, the long layout downstream NLP joins want.
    * Position comes from the generator itself, not a window: numbering
    * tokens after a plain explode would need a per-doc sort, where
    * posexplode emits the ordinal for free during generation.
    */
  def tokenPositions(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol),
        split(TextShingles.normalize(col(textCol)), " ").as("toks"))
      .select(col(idCol), posexplode(col("toks")).as(Seq("pos", "token")))

  /** Q8: per-language corpus stats (count, avg chars, token sum). */
  def langStats(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(sum(col("n_chars")).cast("double") / count(lit(1)), 6).as("avg_chars"),
        sum(tokenCount(col("text"))).as("n_tokens"))

  /** Q42: exact top-k most frequent terms per language — the corpus-level
    * vocabulary summary next to q36's per-document TF-IDF. Token counts
    * partial-aggregate before the shuffle; the ranking window sees only
    * each language's DISTINCT terms. Deterministic tiebreak (count desc,
    * term asc).
    */
  def topTermsPerLang(docs: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("lang"),
      explode(split(TextShingles.normalize(col("text")), " ")).as("term"))
    val counts = toks.groupBy(col("lang"), col("term")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("term"))
    counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("lang"), col("term"), col("n"), col("rank"))
  }

  /** Q36: TF-IDF top-k terms per document — the standard relevance/keyword
    * primitive for corpus analysis. tf = term count / doc token count,
    * idf = ln(N / docfreq), deterministic rank tiebreak (score desc, term
    * asc).
    *
    * Scale shape: term-frequency and doc-frequency are partial+final
    * aggregations; the per-doc window ranks only that doc's DISTINCT terms
    * (bounded by doc length). N is a one-row aggregate broadcast into the
    * scoring join — everything stays in ONE plan, no driver-side action.
    */
  def tfidfTopTerms(docs: DataFrame, textCol: String, idCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = docs.agg(count(lit(1)).cast("double").as("__n_docs"))
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(TextShingles.normalize(col(textCol)), " ")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
    val docLen = tf.groupBy(col("doc_id")).agg(sum(col("c")).as("n_toks"))
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("dfreq"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    tf.join(docLen, Seq("doc_id"))
      .join(docFreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        (col("c").cast("double") / col("n_toks")) * log(col("__n_docs") / col("dfreq")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), round(col("score"), 6).as("tfidf"), col("rank"))
  }

  /** Deterministic decomposed-Unicode suffix derived from the doc id. The
    * testdata corpus is pure ASCII (already NFC — the fast path), so q70
    * first APPENDS text in DECOMPOSED form (base letter + combining mark:
    * "cafe"+U+0301, "no"+U+0308+"el") — the same derive-from-testdata
    * pattern as q47's synthetic PII — and then canonicalizes it; the NFC
    * composition is the real operator under test.
    */
  def withSyntheticUnicode(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.withColumn("text_uni", concat(
      col(textCol),
      lit(" cafe\u0301 no\u0308el #"), col(idCol).cast("string")))

  /** Q70: Unicode canonicalization — NFC-compose the text (native
    * [[graft.functions.NfcNormalizeExpr]]) and report the code-point count
    * before and after (the shrink IS the number of composed pairs — the
    * audit a normalization pass emits). Pure map-only projection, zero
    * shuffles at any scale.
    */
  def normalizeUnicode(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col("text_uni")
    withSyntheticUnicode(docs, textCol, idCol).select(
      col(idCol),
      length(t).cast("long").as("n_chars_raw"),
      length(graft.functions.NfcNormalizeExpr.nfcNormalize(t)).cast("long").as("n_chars_nfc"),
      graft.functions.NfcNormalizeExpr.nfcNormalize(t).as("nfc"))
  }

  /** Q73: heavy hitters — every token whose corpus-wide frequency is at
    * least `relThreshold` of ALL token occurrences (the blocklist /
    * vocabulary-pruning primitive; a RELATIVE threshold, unlike q42's
    * per-language top-k, so the output is the set of tokens that dominate
    * the corpus regardless of how many distinct tokens exist).
    *
    * Scale shape: token counts partial-aggregate map-side; the total is a
    * ONE-ROW aggregate broadcast into the filter — no second pass over the
    * corpus, no driver-side action.
    */
  def heavyTokens(docs: DataFrame, textCol: String,
      relThreshold: Double = 0.001): DataFrame = {
    val counts = docs
      .select(explode(split(TextShingles.normalize(col(textCol)), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.crossJoin(broadcast(total))
      .filter(col("n") >= col("__total") * relThreshold)
      .select(col("term"), col("n"),
        round(col("n") / col("__total").cast("double"), 6).as("frac"))
  }

  /** Q74: sentence segmentation stats — per doc: sentence count, token
    * count, mean tokens per sentence, longest sentence in characters.
    * Sentences are maximal runs of non-terminator characters plus their
    * trailing `[.!?]` run, so the chunks tile the text exactly and the
    * per-sentence token counts sum to the doc's token count — mean tokens
    * per sentence therefore needs NO per-sentence traversal, just two
    * regexp counts. The only per-sentence work is the max-length fold over
    * the (tens-of-elements) sentence array. Map-only, zero shuffles.
    */
  def sentenceStats(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    // project the split into an ATTRIBUTE first (TextShingles performance
    // contract): the interpreted transform() below takes the projection
    // out of whole-stage codegen, so a shared `sents` subtree would be
    // re-evaluated — running the sentence regex up to 4× per row
    val sents = col("__sents")
    val nSents = greatest(size(sents), lit(1))
    val nToks = regexp_count(col(textCol), lit("\\S+"))
    docs
      .select(col(idCol), col(textCol),
        regexp_extract_all(col(textCol), lit("[^.!?]+[.!?]*"), lit(0)).as("__sents"))
      .select(
        col(idCol),
        size(sents).cast("long").as("n_sentences"),
        nToks.cast("long").as("n_tokens"),
        round(nToks.cast("double") / nSents, 6).as("mean_sentence_toks"),
        coalesce(array_max(transform(sents, s => length(trim(s)))), lit(0))
          .cast("long").as("max_sentence_chars"))
  }

  /** Q77: pointwise mutual information of adjacent token pairs —
    * PMI(a,b) = ln( p(ab) / (p(a)·p(b)) ) — the collocation-mining
    * primitive ("new york" scores high, "of the" near zero) used for
    * phrase vocabulary induction.
    *
    * Scale shape: unigram and bigram counts partial-aggregate map-side;
    * the two probability joins are keyed by term (the bigram side splits
    * its key), and both grand totals are ONE-ROW aggregates broadcast
    * into the scoring projection. `minCount` prunes the long tail BEFORE
    * the joins, so the joined relation is the (small) frequent-bigram
    * set, not the raw corpus.
    */
  def bigramPmi(docs: DataFrame, textCol: String, minCount: Long = 5): DataFrame = {
    val toks = docs.select(
      split(TextShingles.normalize(col(textCol)), " ").as("toks"))
    val uni = toks.select(explode(col("toks")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val bi = toks.select(
        explode(TextShingles.allWordNgramsOf(col("toks"), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
      .select(split(col("bg"), " ").getItem(0).as("w1"),
        split(col("bg"), " ").getItem(1).as("w2"), col("c_ab"))
    // n2 (bigram positions) = Σ(len−1) = Σlen − n_nonnull_docs = n1 − d:
    // split() yields ≥ 1 token for every NON-NULL text (even empty), and
    // a NULL text contributes 0 tokens to n1 — so d counts non-null
    // texts only (count(col) skips nulls). Both totals come from ONE
    // aggregate over the unigram counts plus a text-free doc count; no
    // third tokenization scan of the corpus.
    val totals = uni.agg(sum(col("c")).cast("double").as("__n1"))
      .crossJoin(broadcast(docs.agg(count(col(textCol)).cast("double").as("__d"))))
      .select(col("__n1"), (col("__n1") - col("__d")).as("__n2"))
    bi
      .join(uni.select(col("term").as("w1"), col("c").as("c_a")), Seq("w1"))
      .join(uni.select(col("term").as("w2"), col("c").as("c_b")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c_ab"),
        round(log((col("c_ab") / col("__n2")) /
          ((col("c_a") / col("__n1")) * (col("c_b") / col("__n1")))), 6).as("pmi"))
  }

  /** Deterministic synthetic URLs derived from the doc id (the corpus has
    * none): every doc links one of 50 sites, every third doc additionally
    * links a common tracker domain.
    */
  def withSyntheticUrls(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.withColumn("text_url", concat(
      col(textCol),
      lit(" see https://site"), pmod(col(idCol), lit(50)).cast("string"),
      lit(".example.org/page/"), col(idCol).cast("string"),
      when(pmod(col(idCol), lit(3)) === 0,
        lit(" and http://tracker.common.net/pixel")).otherwise(lit(""))))

  /** Q75: URL/domain extraction — pull every URL out of the text, reduce
    * to its host, and count mentions + distinct documents per domain (the
    * domain-blocklist/provenance primitive of web-corpus curation). The
    * explode carries only (doc_id, domain) pairs — never the text — and
    * counts partial-aggregate; `n_docs` is exact distinct over doc ids
    * within a domain.
    */
  def domainCounts(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    withSyntheticUrls(docs, textCol, idCol)
      .select(col(idCol).as("doc_id"),
        explode(regexp_extract_all(col("text_url"),
          lit("https?://([^/\\s]+)"), lit(1))).as("domain"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_mentions"), countDistinct(col("doc_id")).as("n_docs"))

  /** Bounded smallest-k aggregator over longs — constant state per group
    * (a sorted k-slot buffer), map-side combinable, mergeable. The
    * building block for capped posting lists: the window alternative
    * (`row_number` over token) would sort EVERY occurrence of every
    * stopword in one partition — the textbook skew trap a 100 TB
    * inverted-index build cannot afford.
    */
  class SmallestKLongsAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, Seq[Long], Seq[Long]] {
    import org.apache.spark.sql.{Encoder, Encoders}
    override def zero: Seq[Long] = Nil
    override def reduce(b: Seq[Long], a: Long): Seq[Long] =
      if (b.lengthCompare(k) >= 0 && a >= b.last) b
      else ((b :+ a).sorted.distinct).take(k)
    override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
      (b1 ++ b2).sorted.distinct.take(k)
    override def finish(r: Seq[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Q100: inverted-index build — token → document frequency + the first
    * `cap` doc ids (ascending), the retrieval/dedup-infrastructure
    * artifact over a cleaned corpus. One explode carrying (token, doc_id)
    * pairs only (never the text), one distinct-pair reduction, one
    * aggregation per token where BOTH outputs are bounded-state and
    * map-side combinable: `count` for df and [[SmallestKLongsAgg]] for
    * the capped postings — no unbounded collect_set, no per-token sort
    * of all occurrences. Postings serialize as a CSV string (engine-
    * portable comparison; array stringification differs across readers).
    */
  def invertedIndex(docs: DataFrame, textCol: String, idCol: String,
      minDf: Long = 2L, cap: Int = 20): DataFrame = {
    val smallestK = udaf(new SmallestKLongsAgg(cap))
    docs
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(split(TextShingles.normalize(col(textCol)), " ")))
          .as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("df"),
        smallestK(col("doc_id")).as("postings"))
      .filter(col("df") >= minDf)
      .select(col("token"), col("df"),
        array_join(col("postings"), ",").as("postings_csv"))
  }

  /** Q121: Gopher-style intra-document repetition COVERAGE signals — the
    * duplicate-n-gram family (Rae et al. 2021 §A1.1) that complements the
    * q46 concentration rules: how much of a document consists of material
    * repeated elsewhere IN the same document (boilerplate loops, template
    * spam, copy-paste padding).
    *
    *   dup_2gram_frac      1 - distinct_2grams / total_2grams
    *   dup_3gram_frac      1 - distinct_3grams / total_3grams
    *   dup_tok_char_frac   chars in tokens occurring >=2x / total chars
    *
    * keep = every fraction at-or-under its threshold. All seven counters
    * come from ONE native map-only pass
    * ([[graft.functions.RepetitionStatsExpr]]) — at 100 TB this rides the
    * corpus scan with zero shuffle, where the explode+groupBy(doc, ngram)
    * formulation (spec/oracle cross-check only) shuffles every n-gram.
    * Tokenization is raw `\S+` (no normalization): repetition is a
    * structural property of the document as written.
    */
  def repetitionSignals(docs: DataFrame, textCol: String, idCol: String,
      max2gramFrac: Double = 0.30, max3gramFrac: Double = 0.20,
      maxDupCharFrac: Double = 0.60): DataFrame = {
    val toks = filter(
      split(coalesce(col(textCol), lit("")), "\\s+"), t => t =!= "")
    val st = graft.functions.RepetitionStatsExpr.repetitionStats(toks)
    val withC = docs
      .select(col(idCol), st.as("st"))
      .select(col(idCol),
        col("st").getItem(0).as("n_toks"),
        col("st").getItem(1).as("total_2grams"),
        col("st").getItem(2).as("distinct_2grams"),
        col("st").getItem(3).as("total_3grams"),
        col("st").getItem(4).as("distinct_3grams"),
        col("st").getItem(5).as("chars_total"),
        col("st").getItem(6).as("chars_dup_tok"))
    val f2 = lit(1.0) - col("distinct_2grams") /
      greatest(col("total_2grams").cast("double"), lit(1.0))
    val f3 = lit(1.0) - col("distinct_3grams") /
      greatest(col("total_3grams").cast("double"), lit(1.0))
    val fc = col("chars_dup_tok") /
      greatest(col("chars_total").cast("double"), lit(1.0))
    withC.select(
      col(idCol), col("n_toks"),
      col("total_2grams"), col("distinct_2grams"),
      col("total_3grams"), col("distinct_3grams"),
      col("chars_total"), col("chars_dup_tok"),
      round(f2, 6).as("dup_2gram_frac"),
      round(f3, 6).as("dup_3gram_frac"),
      round(fc, 6).as("dup_tok_char_frac"),
      (f2 <= max2gramFrac && f3 <= max3gramFrac && fc <= maxDupCharFrac)
        .cast("int").as("keep"))
  }

  /** Q142 weights: (intercept_micro, w per ppm feature). Integer weights
    * over ppm-grid features keep the score BIGINT-exact — shared with the
    * oracle builder so the engines cannot drift.
    */
  val ClassifierWeights: Map[String, Long] = Map(
    "intercept" -> -2500000L,
    "stop_ppm" -> 30L, // natural prose has stopwords — reward
    "punct_ppm" -> -15L, // symbol soup / markup — penalize
    "digit_ppm" -> -10L, // tables, serial numbers — penalize
    "mean_tok_len_cap" -> 200L) // degenerate short tokens score low

  /** Q142: fixed-weight linear quality classifier — the fasttext-style
    * "quality classifier" stage of a pretraining pipeline (CCNet /
    * GPT-3's WebText classifier), distilled to its data-engine shape: a
    * dot product of document features against published weights, scoring
    * 100 TB map-only with zero shuffle. The features are RATIO signals
    * (stopword density, punctuation density, digit density, mean token
    * length), which naively means float division → engine-dependent ulps
    * → an unhashable score. Instead every feature lands on an exact ppm
    * integer grid (`1e6·a div b` — floor division, identical in any
    * engine) and the weights are integers, so `score_micro` is
    * BIGINT-exact arithmetic end to end and `keep = score_micro > 0` has
    * no float boundary to flip. The real-valued classifier this mirrors
    * is recovered by scaling: score = score_micro / 1e6.
    */
  def qualityClassifier(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val nChars = length(t).cast("long")
    val nToks = tokenCount(t)
    val nStop = size(regexp_extract_all(lower(t),
      lit("\\b(the|a|an|and|or|of|to|in|is|it)\\b"), lit(0))).cast("long")
    val nPunct = size(regexp_extract_all(t, lit("[^\\w\\s]"), lit(0))).cast("long")
    val nDigit = size(regexp_extract_all(t, lit("[0-9]"), lit(0))).cast("long")
    // ppm features: floor division on positive longs — engine-identical
    def ppm(num: Column, den: Column): Column =
      idiv(num * lit(1000000L), greatest(den, lit(1L)))
    val stopPpm = ppm(nStop, nToks)
    val punctPpm = ppm(nPunct, nChars)
    val digitPpm = ppm(nDigit, nChars)
    // mean token length in milli-chars, capped at 20.000 so one pathological
    // unbroken-run doc can't dominate the linear score
    val meanTokLenCap = least(idiv(ppm(nChars, nToks), lit(1000L)), lit(20000L))
    val w = ClassifierWeights
    val score = lit(w("intercept")) +
      lit(w("stop_ppm")) * stopPpm +
      lit(w("punct_ppm")) * punctPpm +
      lit(w("digit_ppm")) * digitPpm +
      lit(w("mean_tok_len_cap")) * meanTokLenCap
    docs.select(col(idCol),
      stopPpm.as("stop_ppm"), punctPpm.as("punct_ppm"),
      digitPpm.as("digit_ppm"), meanTokLenCap.as("mean_tok_len_milli"),
      score.as("score_micro"),
      (score > 0).cast("int").as("keep"))
  }

  /** Q143: domain-concentration report — "is this crawl dominated by a
    * handful of hosts?", the provenance-diversity gate run before a
    * corpus ships. Per domain: mention count, corpus share, cumulative
    * share in rank order; plus the corpus Herfindahl–Hirschman index
    * broadcast onto every row. Shares are exact ppm integers
    * (`1e6·n div N`; HHI = `1e6·Σn² div N²` — Σn² is an exact BIGINT sum,
    * ONE division at the end), so no float summation-order drift. The
    * heavy work is [[domainCounts]]'s single aggregation; rank/cumsum
    * windows and the HHI scalar run over the already-reduced domain table
    * (rows = distinct domains, not documents), and the one-row HHI
    * aggregate is a broadcast nested loop — the same already-reduced
    * global-window pattern as q110's boundary bucket.
    */
  def domainConcentration(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val counts = domainCounts(docs, textCol, idCol)
      .select(col("domain"), col("n_mentions"))
    val tot = counts.agg(
      sum(col("n_mentions")).as("__N"),
      sum(col("n_mentions") * col("n_mentions")).as("__sumSq"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_mentions").desc, col("domain"))
    counts
      .withColumn("rank", row_number().over(w))
      .withColumn("__cum", sum(col("n_mentions")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(tot))
      .select(col("rank"), col("domain"), col("n_mentions"),
        idiv(col("n_mentions") * lit(1000000L), col("__N")).as("share_ppm"),
        idiv(col("__cum") * lit(1000000L), col("__N")).as("cum_share_ppm"),
        idiv(col("__sumSq") * lit(1000000L), col("__N") * col("__N"))
          .as("hhi_ppm"))
  }

  /** Q144: vocabulary coverage / OOV rate — "how much of this corpus does
    * a k-entry vocabulary cover?", the tokenizer-fit diagnostic run when
    * choosing or auditing a vocab. The unit is the word `n`-gram
    * (duplicates kept — coverage weights by OCCURRENCE, the token stream
    * a tokenizer actually sees), and the vocab is the top `vocabSize`
    * grams by corpus frequency under the TOTAL order (count desc, gram
    * asc) — deterministic at the cutoff, mirrored exactly by the
    * oracle's row_number. Two passes over the gram stream by design:
    * pass 1 aggregates counts (one shuffle on gram, map-side partials),
    * the reduced table sorts-and-limits to the vocab (tiny); pass 2
    * re-tokenizes and probes the BROADCAST vocab — corpus text never
    * shuffles, and the per-doc OOV aggregation shuffles only (id, counts)
    * pairs. A "cache the exploded grams" formulation would materialize
    * the corpus × gram-count blowup to save the cheaper of two scans —
    * the wrong trade at 100 TB.
    */
  def vocabCoverage(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 2, vocabSize: Int = 500): DataFrame = {
    // pre-project the split token array (TextShingles' performance
    // contract): with the split/normalize subtree INLINE in the n-gram
    // lambda, the interpreted HOF re-evaluates it once per array element
    // — the regex normalize runs |tokens| times per document (quadratic;
    // measured 5x the query's whole runtime at sf0.1)
    val toks = docs
      .select(col(idCol).as("doc_id"),
        split(TextShingles.normalize(coalesce(col(textCol), lit(""))), " ")
          .as("__toks"))
      .select(col("doc_id"),
        explode(TextShingles.allWordNgramsOf(col("__toks"), n)).as("tok"))
    val vocab = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("tok"))
      .limit(vocabSize)
      .select(col("tok"), lit(1).as("__in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_grams"), col("n_oov"),
        idiv(col("n_oov") * lit(1000000L), col("n_grams")).as("oov_ppm"))
  }

  /** Q155: BM25 relevance scores of every document against a fixed query
    * term set — the retrieval scoring a RAG pipeline runs over its corpus
    * (Robertson-Spärck Jones probabilistic weighting with the Lucene
    * positive-bounded idf: ln((N − df + 0.5)/(df + 0.5) + 1)). Length
    * normalization uses the document's FULL token count against the
    * corpus average.
    *
    * Scale design: ONE corpus-sized token aggregation to (doc, term,
    * count) — the subtree both the doc-length re-aggregate and the
    * query-term filter share (ReuseExchange, the q151 device); the idf
    * table is |query|-bounded and broadcasts; corpus scalars (N, avg
    * len) broadcast as a one-row frame. Determinism: each term's score
    * contribution rounds to the 1e-6 grid and sums exactly (q133's
    * decimal-micros discipline), so per-doc totals are partition- and
    * engine-order-independent.
    */
  def bm25Scores(docs: DataFrame, textCol: String, idCol: String,
      queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(filter(
        split(TextShingles.normalize(coalesce(col(textCol), lit(""))), " "),
        t => t =!= "")).as("term"))
    // ONE corpus pass: a wide conditional aggregation emits the doc
    // length AND each query term's count as columns of a single per-doc
    // row (query sets are small by nature — this is a |query|-wide agg,
    // not a vocabulary-wide one). The doc-count-sized result is
    // materialized (lazy localCheckpoint) because its consumers — corpus
    // scalars, document frequencies, scoring — prune differently and
    // would each re-read the corpus otherwise (the q151 differentiated-
    // subtree case); stack() then unpivots back to (doc, term, c) rows
    // for scoring.
    val termCols = queryTerms.map(q =>
      sum(when(col("term") === q, 1L).otherwise(0L)).as(s"c_$q"))
    val perDoc = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("len"), termCols: _*)
      .localCheckpoint(eager = false)
    val corpus = perDoc.agg(count(lit(1)).as("N"), sum(col("len")).as("toks"))
    val stackArgs = queryTerms
      .map(q => s"'${q.replace("'", "''")}', `c_$q`").mkString(", ")
    val tf = perDoc.select(col("doc_id"), col("len"),
      expr(s"stack(${queryTerms.size}, $stackArgs) AS (term, c)"))
      .filter(col("c") > 0)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("dfreq"))
    val scoreMicros = round(
      log((col("N").cast("double") - col("dfreq").cast("double") + lit(0.5)) /
        (col("dfreq").cast("double") + lit(0.5)) + lit(1.0)) *
        (col("c").cast("double") * lit(k1 + 1.0)) /
        (col("c").cast("double") + lit(k1) *
          (lit(1.0 - b) + lit(b) * col("len").cast("double") /
            (col("toks").cast("double") / col("N").cast("double")))) * 1e6)
      .cast("long")
    tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(corpus))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_matched"),
        (sum(scoreMicros.cast("decimal(18,0)")) /
          lit(1000000L).cast("decimal(7,0)")).cast("double").as("score"))
      .withColumn("score", round(col("score"), 6))
  }

  /** Q149: per-document n-gram NOVELTY — the fraction of a document's
    * distinct word n-grams whose corpus-wide first occurrence (minimum
    * doc id) is this document. The standard measure of how much NEW text
    * an incremental crawl batch actually contributes (a batch of
    * re-crawls scores ~0) and a cheap duplicate-cluster tiebreaker:
    * within a near-dup cluster, the lowest-novelty members are the
    * derivative copies.
    *
    * Scale design: documents explode to DISTINCT hashed grams (8-byte
    * longs — strings never leave the fused first projection), ONE
    * aggregation on the gram key computes min(doc_id) with map-side
    * partials, and the per-doc re-aggregate joins exploded grams to the
    * reduced first-occurrence table on the same gram partitioning —
    * Catalyst reuses the gram exchange for the groupBy and the join
    * probe (the PPJoin posting/freq shape). No corpus-sized all-pairs
    * anywhere; 64-bit collisions merge two grams' first-occurrence at
    * the documented ~n²/2⁶⁴ odds.
    */
  def ngramNovelty(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame = {
    val grams = Hashing.repartitionForCompute(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("__txt")),
      "doc_id")
      .select(col("doc_id"),
        explode(graft.functions.WindowHashExprs.ngramHashSortedSet(
          TextShingles.normalize(col("__txt")), n)).as("gram"))
    val first = grams.groupBy(col("gram")).agg(min(col("doc_id")).as("__fd"))
    grams.join(first, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__fd") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_grams"), 6))
  }

  /** Q169: TextRank keyword extraction (Mihalcea & Tarau 2004) — corpus
    * keywords as PageRank over the word-adjacency graph, composing the
    * integer-grid power iteration ([[Graph.pageRankMicros]]) with the
    * text stack: normalized tokens → distinct unordered adjacent word
    * pairs (self-loops dropped) → both orientations → 4 exact rounds →
    * top-`topK` words by rank. The words the corpus keeps circling back
    * to adjoin MANY distinct other words and inherit rank from them —
    * the graph view of salience that raw frequency (q42) and tf-idf
    * (q36) don't capture.
    *
    * Determinism end-to-end: node ids are xxhash64 of the word (rank
    * values are id-independent — the power iteration sums over
    * neighbors, never compares ids — so any injective word→id map gives
    * identical ranks; the oracle runs the SAME rounds on the raw word
    * strings as node ids, which is the standing collision audit: a hash
    * collision would merge two nodes and fail the compare). Ranks are
    * the q158 integer grid; the top-k orders by (rank DESC, word).
    *
    * Scale: NO global window anywhere — the previous form ranked the
    * corpus-wide vocabulary through `row_number().over(Window.orderBy)`,
    * a single-task sort of tens of millions of rows at 100×. Ids are now
    * map-side hashes, the top-k is TakeOrderedAndProject-bounded
    * (orderBy+limit), and the only window runs over the already-limited
    * `topK` rows to number the final positions.
    */
  def textRankKeywords(docs: DataFrame, textCol: String, topK: Int = 20,
      iters: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = filter(split(TextShingles.normalize(col(textCol)), " "),
      t => t =!= "")
    val base = docs.select(toks.as("__toks"))
      .filter(size(col("__toks")) > 1)
    val adj = base.select(explode(zip_with(
        slice(col("__toks"), lit(1),
          greatest(size(col("__toks")) - 1, lit(0))),
        slice(col("__toks"), lit(2),
          greatest(size(col("__toks")) - 1, lit(0))),
        (a, b) => struct(least(a, b).as("wa"), greatest(a, b).as("wb"))))
        .as("p"))
      .select(col("p.wa").as("wa"), col("p.wb").as("wb"))
      .filter(col("wa") =!= col("wb"))
      .distinct()
    val vocab = adj
      .select(explode(array(col("wa"), col("wb"))).as("word")).distinct()
      .withColumn("nid", xxhash64(col("word")))
    val edges = adj.select(explode(array(
        struct(xxhash64(col("wa")).as("src"), xxhash64(col("wb")).as("dst")),
        struct(xxhash64(col("wb")).as("src"), xxhash64(col("wa")).as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val ranks = Graph.pageRankMicros(edges, "src", "dst", iters)
    ranks.join(vocab, ranks("node") === vocab("nid"))
      .select(col("word"), col("rank"))
      .orderBy(col("rank").desc, col("word"))
      .limit(topK)
      .withColumn("pos", row_number()
        .over(Window.orderBy(col("rank").desc, col("word"))).cast("long"))
  }

  /** Q180: LANGUAGE-ID CONFUSION MATRIX — evaluate the n-gram heuristic
    * classifier (q14) against the corpus's declared labels: one row per
    * (declared, predicted) cell with count and the cell's share of the
    * declared language (integer ppm, row-normalized — the standard
    * confusion-matrix view, so per-language recall reads straight off
    * the diagonal). The audit an ingest pipeline runs before trusting
    * either column: a hot off-diagonal cell means the heuristic (or the
    * upstream label) is systematically wrong for that pair.
    *
    * One map-only classification pass + one (declared, predicted)
    * aggregate; the row totals ride a window over the |langs|²-bounded
    * cell table.
    */
  def langConfusion(docs: DataFrame, textCol: String,
      langCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = docs
      .select(col(langCol).as("lang_declared"),
        langIdColumn(col(textCol)).as("lang_pred"))
      .groupBy(col("lang_declared"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
    cells
      .withColumn("__rt", sum(col("n"))
        .over(Window.partitionBy(col("lang_declared"))))
      .select(col("lang_declared"), col("lang_pred"), col("n"),
        expr("(n * 1000000) div __rt").as("row_ppm"))
  }

  /** Q281: COHEN'S KAPPA between the lang-ID heuristic and the
    * declared label — the chance-corrected agreement scalar that q180's
    * confusion matrix begs for (raw accuracy flatters any classifier
    * on a skewed label mix; κ subtracts the agreement two independent
    * labelers would reach by chance). Exact integer arithmetic
    * end-to-end: κ = (po·N − Σ rt·ct) / (N² − Σ rt·ct) over the
    * diagonal sum and the margin products — ONE mirrored double divide
    * (plus the po/pe observability columns). One map-only
    * classification pass into the |langs|²-bounded cell table;
    * degenerate single-label corpora emit NaN explicitly.
    */
  def cohenKappa(docs: DataFrame, textCol: String, langCol: String)
      : DataFrame = {
    val cells = docs
      .select(col(langCol).as("decl"),
        langIdColumn(col(textCol)).as("pred"))
      .groupBy(col("decl"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val tot = cells.agg(sum(col("n")).as("nn"),
      sum(when(col("decl") === col("pred"), col("n"))
        .otherwise(lit(0L))).as("po_num"))
    val pe = cells.groupBy(col("decl").as("k")).agg(sum(col("n")).as("rt"))
      .join(cells.groupBy(col("pred").as("k")).agg(sum(col("n")).as("ct")),
        Seq("k"))
      .agg(sum(col("rt") * col("ct")).as("pe_num"))
    def d(name: String): Column = col(name).cast("double")
    tot.crossJoin(broadcast(pe))
      .withColumn("den", col("nn") * col("nn") - col("pe_num"))
      .select(col("nn").as("n_docs"),
        round(d("po_num") / d("nn"), 6).as("po"),
        round(d("pe_num") / (d("nn") * d("nn")), 6).as("pe"),
        round(when(col("den") === lit(0L), lit(Double.NaN))
          .otherwise((col("po_num") * col("nn") - col("pe_num"))
            .cast("double") / col("den").cast("double")), 6)
          .as("kappa"))
  }

  /** Q183: DOC-LENGTH POWER-LAW FIT — corpus shape diagnostics: bucket
    * document lengths into log₂ bins and fit ln(count) against
    * ln(bin center) with OLS. Web-scale text lengths are roughly
    * power-law; a slope far from the expected regime (or a broken fit)
    * is the cheap tripwire for truncation bugs, boilerplate floods, or
    * a generator change upstream. Emits the per-bin histogram rows plus
    * the fitted slope/intercept/r² repeated alongside (one result set,
    * self-describing).
    *
    * Cross-engine: bins are integer (floor log₂ via bit length — no
    * float log in the binning); the fit uses regr_slope/intercept/r2 on
    * ln() doubles (q99 parity precedent). The histogram is one
    * map-side-combinable aggregate; the fit runs over |bins| rows.
    */
  def docLengthPowerLaw(docs: DataFrame, lenCol: String): DataFrame = {
    val bins = docs
      .filter(col(lenCol) > 0)
      // floor(log2(n)) = 63 - leading zeros; expressed portably as the
      // bit length of the value via repeated comparison-free arithmetic:
      // floor(ln(n)/ln(2)) on doubles can misbin exact powers of two, so
      // use the integer form both engines share: length of the binary
      // string minus 1
      .select((length(conv(col(lenCol).cast("long").cast("string"),
        10, 2)) - 1).cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_docs"))
    val fit = bins.agg(
      regr_slope(log(col("n_docs").cast("double")),
        log(pow(lit(2.0), col("bin").cast("double")))).as("slope"),
      regr_intercept(log(col("n_docs").cast("double")),
        log(pow(lit(2.0), col("bin").cast("double")))).as("intercept"),
      regr_r2(log(col("n_docs").cast("double")),
        log(pow(lit(2.0), col("bin").cast("double")))).as("r2"))
    bins.crossJoin(broadcast(fit))
      .select(col("bin"), col("n_docs"),
        round(col("slope"), 6).as("slope"),
        round(col("intercept"), 6).as("intercept"),
        round(col("r2"), 6).as("r2"))
  }

  /** Q187 (validated, the q29/q168 gate pattern): GPT-2 REGEX
    * PRETOKENIZATION — the split every BPE-family tokenizer applies
    * before merges, as the native lookahead-free scanner
    * [[graft.functions.Gpt2PretokExpr]]. The `\s+(?!\S)` lookahead is
    * not RE2-expressible, so DuckDB cannot replay the split; the oracle
    * instead pins (a) the LOSSLESSNESS invariant — the summed character
    * count of the emitted pretokens must equal `len(text)`, which DuckDB
    * computes independently (any dropped/duplicated character breaks the
    * hash compare) — and (b) the in-band `parity_ok` flag: per document,
    * the scanner's token sequence is compared against the literal
    * `java.util.regex` pattern (the local reference implementation,
    * lookahead included); the oracle pins the flag to 1, so ANY
    * divergence on ANY document fails the gate. Validation-priced: the
    * reference regex runs next to the production scanner, the standing
    * validated-gate trade.
    *
    * The one `udf` wraps the reference-implementation comparison — a
    * backtracking java.util.regex run no Catalyst expression should
    * reproduce (the production path IS the native expression feeding
    * `n_chars_total`).
    *
    * Scale: map-only, zero shuffle; one scanner pass + one reference
    * pass per document.
    */
  def gpt2PretokenGate(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val parity = udf { (text: String) =>
      val t = if (text == null) "" else text
      val a = graft.functions.Gpt2PretokExpr.split(t)
      val b = graft.functions.Gpt2PretokExpr.refSplit(t)
      if (a.sameElements(b)) 1 else 0
    }
    docs
      .select(col(idCol),
        graft.functions.Gpt2PretokExpr
          .gpt2Pretokenize(coalesce(col(textCol), lit(""))).as("__toks"),
        parity(col(textCol)).as("parity_ok"))
      .select(col(idCol),
        aggregate(col("__toks"), lit(0L),
          (acc, t) => acc + length(t).cast("long")).as("n_chars_total"),
        col("parity_ok"))
  }

  /** Q167: READABILITY scoring — Flesch reading ease per document, the
    * classic grade-level quality signal next to the ratio rules (q13/q46)
    * and the LM-surprisal family (q133/q139/q159): too-hard AND too-easy
    * both correlate with junk (OCR soup scores hard; keyword stuffing
    * scores trivially easy). FRE = 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words), with the standard regex approximations:
    * sentences = runs of [.!?] (floored at 1), syllables = vowel-group
    * runs per word — a documented heuristic (true syllabification needs
    * a dictionary), applied identically in both engines.
    *
    * Exactness: all three inputs are INTEGER regex-run counts — the same
    * count in Java regex and RE2 for these simple classes — and the
    * score is one literal-mirrored double expression (every literal cast
    * to DOUBLE in the oracle, the q139 lesson). Map-only, zero shuffle;
    * docs with no words emit nothing (no distribution to score).
    */
  def readability(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    docs
      .select(col(idCol),
        regexp_count(t, lit("\\S+")).cast("long").as("words"),
        greatest(regexp_count(t, lit("[.!?]+")).cast("long"), lit(1L))
          .as("sentences"),
        regexp_count(t, lit("[aeiouyAEIOUY]+")).cast("long")
          .as("syllables"))
      .filter(col("words") > 0)
      .withColumn("fre", round(
        lit(206.835) -
          lit(1.015) * (col("words").cast("double") /
            col("sentences").cast("double")) -
          lit(84.6) * (col("syllables").cast("double") /
            col("words").cast("double")), 6))
  }

  /** Q198: BLOCKLIST / phrase-filter hits — per document, the count of
    * every pattern occurrence (overlapping included) from a bounded
    * phrase list, in ONE corpus pass via the codegen'd Aho-Corasick
    * kernel ([[graft.functions.AhoCorasickExprs]]). The per-pattern
    * alternative (`locate`/regexp per phrase) re-scans the corpus
    * |patterns| times — at 100 TB the corpus pass IS the cost. Output:
    * one row per (doc, pattern) with >= 1 hit. Map-only, zero shuffle;
    * the pattern list is a plan literal from the filter config.
    */
  def blocklistHits(docs: DataFrame, textCol: String, idCol: String,
      patterns: Seq[String]): DataFrame = {
    require(patterns.nonEmpty, "empty pattern list")
    docs
      .select(col(idCol),
        graft.functions.AhoCorasickExprs
          .matchCounts(coalesce(col(textCol), lit("")), patterns)
          .as("__c"))
      .select(col(idCol), posexplode(col("__c")))
      .filter(col("col") > 0)
      .select(col(idCol),
        element_at(typedLit(patterns), col("pos").cast("int") + 1)
          .as("pat"),
        col("col").as("n_hits"))
  }

  /** Q216: VOCABULARY COVERAGE CURVE — the tokenizer-sizing diagnostic:
    * for each percentage threshold, the minimal vocabulary size whose
    * cumulative token mass reaches it, taking words in (count desc,
    * word) order. Computed WITHOUT a vocab-sized global sort: the word
    * histogram reduces to one row per DISTINCT FREQUENCY (≤
    * O(√total_tokens) rows, since Σ f·n_f = N), running sums window
    * over that tiny frame, and the crossing group's partial word count
    * is ceil division on the cross-multiplied needed mass — all
    * integer, bit-identical across engines and partitionings. Words
    * inside one frequency group are interchangeable for coverage, so
    * the group-level computation equals the word-level scan exactly.
    *
    * Scale: one map-side-combinable corpus shuffle (the histogram),
    * one vocab-sized shuffle down to distinct frequencies, then
    * sqrt-bounded frames — the unpartitioned window is over distinct
    * frequencies, never words (PlanSpec-enrolled boundedness).
    */
  def coverageCurve(docs: DataFrame, textCol: String,
      thresholds: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(thresholds.nonEmpty &&
      thresholds.forall(t => t >= 1 && t <= 100),
      s"thresholds must be percentages in [1,100]: $thresholds")
    import org.apache.spark.sql.expressions.Window
    val hist = docs
      .select(explode(split(TextShingles.normalize(col(textCol)), " "))
        .as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val freqs = hist.groupBy(col("cnt").as("f"))
      .agg(count(lit(1)).as("nw"))
      .withColumn("mass", col("f") * col("nw"))
    // unpartitioned window over DISTINCT FREQUENCIES: sqrt-bounded
    val w = Window.orderBy(col("f").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = freqs.select(col("f"), col("nw"), col("mass"),
      sum(col("nw")).over(w).as("cw"), sum(col("mass")).over(w).as("cm"))
    val tot = freqs.agg(sum(col("mass")).as("total"))
    val th = tot.select(explode(
        typedLit(thresholds.map(_.toLong))).as("pct"), col("total"))
      .withColumn("needed",
        idiv(col("pct") * col("total") + lit(99L), lit(100L)))
    // needed ∈ (cm − mass, cm] picks exactly one crossing group
    th.join(cum, col("cm") >= col("needed") &&
        col("cm") - col("mass") < col("needed"))
      .select(col("pct"),
        (col("cw") - col("nw") +
          idiv(col("needed") - col("cm") + col("mass") + col("f") - lit(1L),
            col("f"))).as("vocab_size"),
        col("needed").as("needed_mass"),
        col("total").as("total_tokens"))
  }

  /** Q219: VOCABULARY GROWTH (Heaps'-law points) — new distinct word
    * n-grams per corpus decile and the cumulative vocabulary, deciles
    * taken in document-id order. The unit is the n-GRAM (q144's
    * tokenizer-fit unit): single words saturate in the first documents
    * of any fixed-vocabulary corpus, while gram combinations keep
    * growing — the curve whose flattening rate is the classic
    * diminishing-returns diagnostic for corpus expansion. Each gram
    * contributes exactly once, at the bucket of its FIRST document:
    * one map-side-combinable min per gram, a bucket histogram, and a
    * cumulative window over ≤ buckets rows.
    */
  def vocabGrowth(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, buckets: Int = 10): DataFrame = {
    require(buckets >= 1 && buckets <= 10000, s"bad buckets: $buckets")
    require(n >= 1 && n <= 8, s"bad n: $n")
    import org.apache.spark.sql.expressions.Window
    val firstDoc = docs
      // pre-project the split (TextShingles' performance contract: the
      // interpreted HOF must not re-run normalize per array element)
      .select(col(idCol).cast("long").as("id"),
        split(TextShingles.normalize(coalesce(col(textCol), lit(""))), " ")
          .as("__toks"))
      .select(col("id"),
        explode(TextShingles.allWordNgramsOf(col("__toks"), n)).as("gram"))
      .groupBy(col("gram")).agg(min(col("id")).as("first_id"))
    val nDocs = docs.agg((max(col(idCol)).cast("long") + lit(1L)).as("n"))
    val perBucket = firstDoc.crossJoin(broadcast(nDocs))
      .select(idiv(col("first_id") * lit(buckets.toLong), col("n"))
        .as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_words"))
    // unpartitioned window over ≤ buckets rows: bounded by contract
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket.select(col("bucket"), col("new_words"),
      sum(col("new_words")).over(w).as("cum_words"))
  }

  /** Q261: WORD BURSTINESS — the variance-to-mean ratio of each
    * word's per-document count across the WHOLE corpus (documents
    * where the word is absent count as zero): function words sit near
    * Poisson (VMR ≈ 1 − μ·(…)), topical/bursty words spike — the
    * classic keyword-vs-glue diagnostic (Church & Gale 1995). Top-k
    * by VMR among words above a document-frequency floor (rare words
    * have degenerate VMR), the q111 windowless top-k device.
    *
    * Exactness: Σc and Σc² per word are exact BIGINTs over present
    * rows (absent docs contribute 0 to both), n_docs broadcasts, and
    * VMR = ((Σc² − (Σc)²/n) / (n−1)) / (Σc/n) is one mirrored double
    * chain rounded to 6 dp; the top-k orders by the IDENTICAL doubles
    * (then word) on both engines.
    */
  def wordBurstiness(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 20, minDocs: Long = 5L): DataFrame = {
    require(k >= 1 && k <= 10000, s"k out of range: $k")
    val counts = docs
      .select(col(idCol).as("doc_id"),
        explode(split(TextShingles.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val n = docs.agg(count(lit(1)).as("n"))
    val stats = counts.groupBy(col("w"))
      .agg(count(lit(1)).as("df"), sum(col("c")).as("sc"),
        sum(col("c") * col("c")).as("sc2"))
      .filter(col("df") >= minDocs)
      .crossJoin(broadcast(n))
      .withColumn("vmr",
        ((col("sc2").cast("double") -
          col("sc").cast("double") * col("sc").cast("double") /
            col("n").cast("double")) /
          (col("n").cast("double") - lit(1.0))) /
          (col("sc").cast("double") / col("n").cast("double")))
    stats
      .orderBy(col("vmr").desc, col("w"))
      .limit(k)
      .agg(array_sort(collect_list(struct((-col("vmr")).as("negv"),
        col("w").as("w"), col("df").as("df"), col("sc").as("sc"),
        col("vmr").as("vmr")))).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("s.w").as("word"), col("s.df").as("n_docs_with"),
        col("s.sc").as("n_occurrences"),
        round(col("s.vmr"), 6).as("vmr"), (col("pos") + 1).as("rank"))
  }

  /** Q262: HAPAX LEGOMENA RATIO per source — the share of each
    * source's vocabulary appearing exactly once: young/organic corpora
    * run hapax-rich (Zipf tail intact), template or deduplicated feeds
    * collapse toward zero. Pure exact integers plus one mirrored
    * 6-dp divide; companions q216 (coverage) and q219 (Heaps growth).
    */
  def hapaxRatio(docs: DataFrame, textCol: String,
      srcCol: String): DataFrame =
    docs.select(col(srcCol).as("source"),
        explode(split(TextShingles.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("f"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"),
        sum(when(col("f") === 1L, 1L).otherwise(0L)).as("hapax"))
      .select(col("source"), col("vocab"), col("hapax"),
        round(col("hapax").cast("double") / col("vocab").cast("double"),
          6).as("hapax_ratio"))

  /** Q247: PER-SOURCE LEXICAL DRIFT — the unigram-distribution KL
    * divergence of each source against the whole corpus, plus the
    * source's token entropy: the distribution-level companion to
    * q238's embedding-centroid drift and q217's set-overlap
    * similarity. A feed whose token distribution walks away from the
    * corpus (template spam, language shift, scraper breakage) shows
    * up here before any content join.
    *
    * Exactness (the q246 grid + ln-parity discipline): each word's
    * log-ratio `ln(f·N / (n_s·c_w))` lands on a `grid⁻¹` integer
    * grid, so the KL numerator Σ f·r is an exact BIGINT in any
    * order; the final KL and entropy are one mirrored double
    * divide (+ ln for entropy) rounded to 6 dp. The ln argument is
    * built in DOUBLE (f·N overflows BIGINT at corpus scale) with the
    * multiplication shape mirrored in the oracle.
    *
    * Scale: corpus counts derive FROM the (source, word) table (one
    * corpus scan, vocabulary-bounded reuse), one equi-join on word,
    * one |sources|-row aggregation.
    */
  def sourceLexicalDrift(docs: DataFrame, textCol: String,
      srcCol: String, grid: Long = 1000L): DataFrame = {
    require(grid >= 10L && grid <= 100000L, s"grid out of range: $grid")
    val wc = docs.select(col(srcCol).as("source"),
        explode(split(TextShingles.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("f"))
    val corpus = wc.groupBy(col("w")).agg(sum(col("f")).as("cw"))
    val total = corpus.agg(sum(col("cw")).as("nn"))
    val terms = wc
      .join(corpus, Seq("w"))
      .crossJoin(broadcast(total))
      .withColumn("ns",
        sum(col("f")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))))
      .select(col("source"), col("f"), col("ns"),
        round(lit(grid.toDouble) *
          log((col("f").cast("double") * col("nn").cast("double")) /
            (col("ns").cast("double") * col("cw").cast("double"))))
          .cast("long").as("r"),
        round(lit(grid.toDouble) * log(col("f").cast("double")))
          .cast("long").as("lf"))
    terms.groupBy(col("source"))
      .agg(max(col("ns")).as("n_tokens"),
        count(lit(1)).as("n_vocab"),
        sum(col("f") * col("r")).as("klg"),
        sum(col("f") * col("lf")).as("hfg"))
      .select(col("source"), col("n_tokens"), col("n_vocab"),
        round(col("klg").cast("double") /
          (lit(grid.toDouble) * col("n_tokens").cast("double")), 6)
          .as("kl_corpus"),
        round(log(col("n_tokens").cast("double")) -
          col("hfg").cast("double") /
            (lit(grid.toDouble) * col("n_tokens").cast("double")), 6)
          .as("entropy"))
  }

  /** Q248: PER-SOURCE BIGRAM TRANSITION ENTROPY — the Markov-1
    * entropy rate H = Σ b_xy·ln(b_x/b_xy) / B over each source's
    * adjacent-token bigrams: how predictable the next word is given
    * the current one. Template/boilerplate feeds collapse toward 0
    * (deterministic transitions); natural text sits well above. The
    * sequence-level sibling of q247's bag-of-words drift.
    *
    * Same exactness device: per-bigram log-ratio on the integer grid,
    * exact BIGINT numerator, one mirrored divide, 6 dp.
    *
    * Scale: one map-side-combinable (source, x, y) count from the
    * token-array scan, left-context totals derived FROM it (bounded
    * reuse), a |sources|-row aggregation.
    */
  def sourceBigramEntropy(docs: DataFrame, textCol: String,
      srcCol: String, grid: Long = 1000L): DataFrame = {
    require(grid >= 10L && grid <= 100000L, s"grid out of range: $grid")
    val toks = docs.select(col(srcCol).as("source"),
      filter(split(TextShingles.normalize(col(textCol)), " "),
        t => t =!= lit("")).as("t"))
    val bc = toks
      .select(col("source"), explode(zip_with(
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
        (a, b) => struct(a.as("x"), b.as("y")))).as("p"))
      .groupBy(col("source"), col("p.x").as("x"), col("p.y").as("y"))
      .agg(count(lit(1)).as("bxy"))
    val left = bc.groupBy(col("source"), col("x"))
      .agg(sum(col("bxy")).as("bx"))
    bc.join(left, Seq("source", "x"))
      .select(col("source"), col("bxy"),
        round(lit(grid.toDouble) *
          log(col("bx").cast("double") / col("bxy").cast("double")))
          .cast("long").as("r"))
      .groupBy(col("source"))
      .agg(sum(col("bxy")).as("n_bigrams"),
        sum(col("bxy") * col("r")).as("hg"))
      .select(col("source"), col("n_bigrams"),
        round(col("hg").cast("double") /
          (lit(grid.toDouble) * col("n_bigrams").cast("double")), 6)
          .as("transition_entropy"))
  }

  /** Q249: PAIRWISE SOURCE DIVERGENCE — the Jensen–Shannon divergence
    * between every two sources' unigram distributions, the symmetric
    * bounded companion to q247's KL-vs-corpus (JS ∈ [0, ln 2];
    * mixture-planning reads it as "how much does adding feed B
    * diversify feed A"). Pairs sharing no vocabulary are omitted (their
    * JS is exactly ln 2 by definition) — the q217 inter-join
    * discipline, |sources|² pair space over the vocabulary-bounded
    * count table, never content × content.
    *
    * Exactness: the shared-word terms use the q246/q247 grid device —
    * `ln(2·f_a·n_b / (f_a·n_b + f_b·n_a))` grid-rounds to BIGINT (ln
    * argument built in DOUBLE, mirrored shape) and sums exactly; each
    * side's ONLY-words remainder is `(n_a − Σ_shared f_a)·round(g·ln 2)`
    * because a word absent from the other source contributes exactly
    * p·ln 2. One mirrored double chain produces the 6-dp JS.
    */
  def sourceJsDivergence(docs: DataFrame, textCol: String,
      srcCol: String, grid: Long = 1000L): DataFrame = {
    require(grid >= 10L && grid <= 100000L, s"grid out of range: $grid")
    val wc = docs.select(col(srcCol).as("source"),
        explode(split(TextShingles.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("f"))
    val totals = wc.groupBy(col("source")).agg(sum(col("f")).as("n"))
    val ln2g = round(lit(grid.toDouble) * log(lit(2.0))).cast("long")
    val shared = wc.select(col("source").as("src_a"), col("w"),
        col("f").as("fa"))
      .join(wc.select(col("source").as("src_b"), col("w"),
        col("f").as("fb")), Seq("w"))
      .filter(col("src_a") < col("src_b"))
      .join(broadcast(totals.select(col("source").as("src_a"),
        col("n").as("na"))), Seq("src_a"))
      .join(broadcast(totals.select(col("source").as("src_b"),
        col("n").as("nb"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("fa"), col("fb"),
        col("na"), col("nb"),
        round(lit(grid.toDouble) * log(
          (lit(2.0) * col("fa").cast("double") * col("nb").cast("double"))
            / (col("fa").cast("double") * col("nb").cast("double") +
               col("fb").cast("double") * col("na").cast("double"))))
          .cast("long").as("ra"),
        round(lit(grid.toDouble) * log(
          (lit(2.0) * col("fb").cast("double") * col("na").cast("double"))
            / (col("fa").cast("double") * col("nb").cast("double") +
               col("fb").cast("double") * col("na").cast("double"))))
          .cast("long").as("rb"))
    shared.groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_common"),
        max(col("na")).as("na"), max(col("nb")).as("nb"),
        sum(col("fa") * col("ra")).as("ag"),
        sum(col("fb") * col("rb")).as("bg"),
        sum(col("fa")).as("fab"), sum(col("fb")).as("fbb"))
      .select(col("src_a"), col("src_b"), col("n_common"),
        round(((col("ag") + (col("na") - col("fab")) * ln2g)
          .cast("double") / col("na").cast("double") +
          (col("bg") + (col("nb") - col("fbb")) * ln2g)
            .cast("double") / col("nb").cast("double"))
          / (lit(2.0) * lit(grid.toDouble)), 6).as("js"))
  }

  /** Q246: ZIPF RANK-FREQUENCY SLOPE per source — the OLS fit of
    * ln(freq) on ln(rank) over each source's top-`topK` words, the
    * classic "is this natural language or boilerplate/spam" corpus
    * diagnostic (natural text sits near slope −1; template or
    * machine-generated feeds flatten or steepen it). Companions:
    * q216's coverage curve and q219's Heaps growth.
    *
    * Exactness: the ln values land on a `grid⁻¹` integer grid (the
    * established grid + ln-parity discipline), so all four OLS sums
    * are exact BIGINT in any aggregation order; the slope is one
    * mirrored double divide rounded to 6 dp. Bounds: x ≤ grid·ln(topK),
    * y ≤ grid·ln(corpus tokens) ≈ 2.8e4 at 100 TB — Σxy fits BIGINT
    * with ~8 decimal digits to spare.
    *
    * Scale: one map-side-combinable (source, word) count, a window
    * rank PARTITIONED by source over the vocabulary-bounded count
    * table (never the corpus), then a |sources|-row aggregation.
    */
  def zipfSlope(docs: DataFrame, textCol: String, srcCol: String,
      topK: Int = 32, grid: Long = 1000L): DataFrame = {
    require(topK >= 2 && topK <= 100000, s"topK out of range: $topK")
    require(grid >= 10L && grid <= 100000L, s"grid out of range: $grid")
    import org.apache.spark.sql.expressions.Window
    val wc = docs.select(col(srcCol).as("source"),
        explode(split(TextShingles.normalize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("f"))
    val win = Window.partitionBy(col("source"))
      .orderBy(col("f").desc, col("w"))
    val ranked = wc.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= topK)
      .select(col("source"),
        round(lit(grid.toDouble) * log(col("rank").cast("double")))
          .cast("long").as("x"),
        round(lit(grid.toDouble) * log(col("f").cast("double")))
          .cast("long").as("y"))
    ranked.groupBy(col("source"))
      .agg(count(lit(1)).as("n_top"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .filter(col("n_top") >= 2)
      .select(col("source"), col("n_top"),
        round((col("n_top") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          (col("n_top") * col("sxx") - col("sx") * col("sx"))
            .cast("double"), 6).as("zipf_slope"))
  }
}
