package graft

import org.apache.spark.sql.functions._

/** The engine's `spark.sql` entry point: temp-view catalog + registered
  * native functions; SQL formulations must agree with the DataFrame
  * operators.
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("interval join via spark.sql equals the DataFrame operator") {
    Catalog.registerTables(spark, sf)
    val viaSql = spark.sql(
      """SELECT c.user_id, v.event_id AS view_id, c.event_id AS click_id
        |FROM events c JOIN events v
        |  ON v.user_id = c.user_id
        | AND c.event_type = 'click' AND v.event_type = 'view'
        | AND v.ts >= c.ts - INTERVAL 1 HOUR AND v.ts <= c.ts""".stripMargin)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val viaDf = operators.EventJoins.clickedDisplays(Tables.events(spark, sf), "1 HOUR")
      .select($"user_id", $"view_id", $"click_id")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(viaSql == viaDf && viaSql.nonEmpty)
  }

  test("native minhash_signature callable from SQL") {
    Catalog.registerTables(spark, sf)
    Catalog.registerFunctions(spark)
    val sigs = spark.sql(
      """SELECT doc_id, minhash_signature(array(text), 8) AS sig
        |FROM documents LIMIT 5""".stripMargin).collect()
    assert(sigs.length == 5)
    assert(sigs.head.getSeq[Long](1).length == 8)
  }

  test("native vector/text functions callable from SQL") {
    Catalog.registerTables(spark, sf)
    Catalog.registerFunctions(spark)
    val r = spark.sql(
      """SELECT vec_cosine(embedding, embedding) AS self_cos,
        |       vec_dot(vec_l2_normalize(embedding), vec_l2_normalize(embedding)) AS unit_dot,
        |       simhash(split('the quick brown fox', ' ')) AS fp,
        |       word_ngrams('a b c d', 2) AS grams,
        |       char_shingles('abcd', 2) AS shingles
        |FROM embeddings LIMIT 3""".stripMargin).collect()
    assert(r.length == 3)
    r.foreach { row =>
      assert(math.abs(row.getDouble(0) - 1.0) < 1e-9)
      assert(math.abs(row.getDouble(1) - 1.0) < 1e-9)
      assert(row.getSeq[String](3) == Seq("a b", "b c", "c d"))
      assert(row.getSeq[String](4) == Seq("ab", "bc", "cd"))
    }
    val r2 = spark.sql(
      """SELECT rolling_hash('abc') AS rh,
        |       sorted_long_jaccard(hashed_sorted_set(array('a','b','c')),
        |                           hashed_sorted_set(array('b','c','d'))) AS j,
        |       int8_quantize(embedding) AS q,
        |       int8_quantize_stats(embedding)[0] AS scale
        |FROM embeddings LIMIT 1""".stripMargin).collect().head
    assert(r2.getLong(0) == (('a' * 31 + 'b') * 31 + 'c') % 1000000007L)
    assert(math.abs(r2.getDouble(1) - 0.5) < 1e-12) // |{b,c}| / |{a,b,c,d}|
    assert(r2.getSeq[Byte](2).nonEmpty && r2.getDouble(3) > 0)
    // round-9 natives: poly_hash (code-point fold == rolling_hash on BMP),
    // winnowing selection, overlap count, hilbert key
    val r3 = spark.sql(
      """SELECT poly_hash('abc') AS ph,
        |       size(winnow_select(poly_window_hashes('abcdefghijklmnop', 8), 4)) AS nw,
        |       sorted_long_overlap(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS ov,
        |       hilbert_key(0L, 0L, 4) AS h00,
        |       hilbert_key(0L, 1L, 4) AS h01""".stripMargin).collect().head
    assert(r3.getLong(0) == (('a' * 31 + 'b') * 31 + 'c') % 1000000007L)
    assert(r3.getInt(1) > 0)
    assert(r3.getLong(2) == 2L)
    // this orientation's first steps: (0,0)=0, (1,0)=1, (1,1)=2, (0,1)=3
    assert(r3.getLong(3) == 0L && r3.getLong(4) == 3L)
    // round-12 native: jaro_winkler (the pinned martha/marhta double)
    val r4 = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS jw").collect().head
    assert(r4.getDouble(0) == 0.9611111111111111)
    // round-13 native: dhash over a binary payload == the kernel
    val r5 = spark.sql(
      "SELECT dhash(encode('the quick brown fox jumps', 'UTF-8')) AS h")
      .collect().head
    assert(r5.getLong(0) == graft.functions.DHashExpr.compute(
      "the quick brown fox jumps".getBytes("UTF-8")))
    // round-14 native: wordpiece encode over a literal vocab == the
    // greedy walk (ta ##ble + one [UNK])
    val r6 = spark.sql(
      "SELECT wordpiece_encode_stats('table dup', " +
        "array('ta', '##ble', 'du'), 4) AS s")
      .collect().head.getSeq[Long](0)
    assert(r6 == Seq(2L, 3L, 1L))
  }

  test("round-15 natives: the FULL kernel catalog is SQL-callable") {
    Catalog.registerFunctions(spark)
    import graft.functions._
    import org.apache.spark.sql.Column
    // each row: (SQL invocation, the Column-API wrapper on the same
    // literals) — parity pins the registration plumbing (name, arity,
    // literal extraction) to the kernel the operators already use
    def one(sqlExpr: String, colExpr: Column): Unit = {
      val viaSql = spark.sql(s"SELECT $sqlExpr AS v").collect().head.get(0)
      val viaCol = spark.range(1).select(colExpr.as("v"))
        .collect().head.get(0)
      assert(String.valueOf(viaSql) === String.valueOf(viaCol),
        s"SQL '$sqlExpr' diverged from the Column wrapper")
    }
    one("bpe_encode_stats('the the th', array(array('t','h'), array('th','e')))",
      org.apache.spark.sql.GraftBridge.column(BpeEncodeExpr(
        org.apache.spark.sql.GraftBridge.expression(lit("the the th")),
        Seq("t" -> "h", "th" -> "e"))))
    one("unigram_viterbi('abc', array('ab','c','a','b'), array(100L,50L,10L,10L), 2)",
      UnigramViterbiExprs.segment(lit("abc"),
        Seq("ab" -> 100L, "c" -> 50L, "a" -> 10L, "b" -> 10L), 2))
    one("aho_corasick_counts('a table scan table', array('table','scan'))",
      AhoCorasickExprs.matchCounts(lit("a table scan table"),
        Seq("table", "scan")))
    one("gpt2_pretok('Hello world, 42!')",
      Gpt2PretokExpr.gpt2Pretokenize(lit("Hello world, 42!")))
    one("cdc_chunks('the quick brown fox jumps over the lazy dog', 4, 8)",
      CdcChunksExpr.cdcChunks(
        lit("the quick brown fox jumps over the lazy dog"), 4, 8))
    val codebook = Array(0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 2.0, 2.0)
    val cbSql = codebook.map(d => s"${d}D").mkString("array(", ", ", ")")
    one(s"pq_encode(array(0.9D, 1.1D, 0.1D, -0.1D), $cbSql, 2, 2, 2)",
      PqExprs.pqEncode(
        array(lit(0.9), lit(1.1), lit(0.1), lit(-0.1)), codebook, 2, 2, 2))
    one("adc_score(1L, array(0.5D, 1.5D, 2.5D, 3.5D), 2, 2)",
      PqExprs.adcScore(lit(1L),
        array(lit(0.5), lit(1.5), lit(2.5), lit(3.5)), 2, 2))
    one("common_prefix_len('abcd', 'abxy')",
      PrefixLcpExprs.commonPrefixLen(lit("abcd"), lit("abxy")))
    one("range_lookup(5L, array(2L, 7L, 10L), array('low', 'mid', 'high'))",
      RangeLookupExprs.lookup(lit(5L), Seq(2L, 7L, 10L),
        Seq("low", "mid", "high")))
    one("repetition_stats(array('a', 'a', 'b', 'a'))",
      RepetitionStatsExpr.repetitionStats(
        array(lit("a"), lit("a"), lit("b"), lit("a"))))
    one("hyperplane_signature(array(0.3D, -0.7D, 1.2D, 0.1D), 4, 8, 42L)",
      VectorExprs.hyperplaneSignature(
        array(lit(0.3), lit(-0.7), lit(1.2), lit(0.1)), 4, 8))
    one("window_xxhashes('hello world abc', 8)",
      WindowHashExprs.windowHashes(lit("hello world abc"), 8))
    one("window_xxhash_sorted_set('hello world abc', 8)",
      WindowHashExprs.windowHashSortedSet(lit("hello world abc"), 8))
    one("ngram_xxhash_sorted_set('a b c d e', 2)",
      WindowHashExprs.ngramHashSortedSet(lit("a b c d e"), 2))
    one("window_xxhash_pos('hello world abc', 8)",
      WindowHashExprs.windowHashPos(lit("hello world abc"), 8))
    // and spot-check two literal values so the parity isn't vacuous
    assert(spark.sql("SELECT common_prefix_len('abcd', 'abxy')")
      .collect().head.getInt(0) === 2)
    assert(spark.sql(
      "SELECT aho_corasick_counts('a table scan table', array('table','scan'))")
      .collect().head.getSeq[Long](0) === Seq(2L, 1L))
  }

  test("aggregation via SQL equals DataFrame operator") {
    Catalog.registerTables(spark, sf)
    val viaSql = spark.sql(
      "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1")
      .as[(String, Long)].collect().toMap
    val viaDf = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(viaSql == viaDf)
  }

  test("correlated LATERAL top-1 equals the window-rank formulation") {
    import org.apache.spark.sql.expressions.Window
    Catalog.registerTables(spark, sf)
    val viaLateral = spark.sql(
      """SELECT c.c_custkey, t.o_orderkey
        |FROM customer c,
        |LATERAL (SELECT o_orderkey FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t""".stripMargin)
      .as[(Long, Long)].collect().toMap
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey")
      .as[(Long, Long)].collect().toMap
    assert(viaLateral == viaWindow && viaLateral.nonEmpty)
  }

  test("spark.sql.extensions=graft.GraftExtensions injects every native function") {
    import org.apache.spark.sql.SparkSession
    // The conf path (`--conf spark.sql.extensions=graft.GraftExtensions`)
    // does Class.forName + zero-arg construct + apply at session build;
    // prove that contract via reflection, exactly as Spark's
    // Utils.loadExtensions does it:
    val loaded = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    // then build a session through the official injection point. (A builder
    // .config() can't reach the suite's already-running SparkContext, so
    // withExtensions is the testable equivalent in-JVM.)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder().master("local[4]")
        .withExtensions(loaded).getOrCreate()
      // NOTE: never ext.stop() here — it would stop the SHARED SparkContext
      // and kill every later suite; abandoning the session object is fine.
      // a function from each family, WITHOUT registerFunctions being called
      val row = ext.sql(
        """SELECT rolling_hash('abc') AS rh,
          |       vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |       token_stats(array('a', 'a', 'b')) AS st""".stripMargin)
        .collect().head
      assert(row.getLong(0) == (('a' * 31 + 'b') * 31 + 'c') % 1000000007L)
      assert(row.getDouble(1) == 11.0)
      assert(row.getSeq[Long](2) == Seq(3L, 2L, 2L, 1L))
      // the plain shared session must NOT have gained the function
      val fresh = spark.newSession()
      intercept[Exception](fresh.sql("SELECT rolling_hash('x')").collect())
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  test("ANSI WITHIN GROUP and UNPIVOT via spark.sql equal the DataFrame operators") {
    Catalog.registerTables(spark, sf)
    val contSql = spark.sql(
      """SELECT o_orderpriority,
        |  percentile_cont(0.25) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)) AS p25,
        |  percentile_cont(0.5)  WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)) AS median_price,
        |  percentile_cont(0.75) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)) AS p75,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority""".stripMargin)
      .as[(String, Double, Double, Double, Long)].collect().sorted.toSeq
    val contDf = operators.Relational.groupPriceQuartiles(Tables.orders(spark, sf))
      .select($"o_orderpriority", $"p25", $"median_price", $"p75", $"n_orders")
      .as[(String, Double, Double, Double, Long)].collect().sorted.toSeq
    assert(contSql == contDf && contSql.nonEmpty)

    val unpivotSql = spark.sql(
      """SELECT * FROM (
        |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n_events,
        |         round(avg(value), 6) AS avg_value, round(max(value), 6) AS max_value
        |  FROM events GROUP BY event_type)
        |UNPIVOT (metric_value FOR metric IN (n_events, avg_value, max_value))""".stripMargin)
      .as[(String, String, Double)].collect().sorted.toSeq
    val unpivotDf = operators.Relational.eventStatsUnpivot(Tables.events(spark, sf))
      .as[(String, String, Double)].collect().sorted.toSeq
    assert(unpivotSql == unpivotDf && unpivotSql.nonEmpty)
  }
}
