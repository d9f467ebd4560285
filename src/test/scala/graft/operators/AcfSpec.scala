package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Daily-revenue ACF (q259): a planted periodic series peaks at its
  * period, a straight-line reference matches exactly, constant series
  * drop (no defined ACF), and pair counts respect the day gaps.
  */
class AcfSpec extends SparkSpec {
  import spark.implicits._

  /** Build a fake orders frame with one order per day, price = f(day). */
  private def series(prices: Seq[Double]) =
    prices.zipWithIndex.map { case (p, d) =>
      (d.toLong, 1L, f"1970-01-01 00:00:00", p)
    }.toDF("o_orderkey", "o_custkey", "ds", "o_totalprice")
      .withColumn("o_orderdate",
        to_timestamp(lit("1970-01-01 00:00:00")) +
          make_dt_interval(col("o_orderkey")))
      .drop("ds")

  test("period-3 series: ACF(3) and ACF(6) near 1, off-period negative") {
    val prices = (0 until 90).map(d => Seq(100.0, 200.0, 600.0)(d % 3))
    val acf = Relational.revenueAcf(series(prices), maxLag = 7)
      .select(col("lag"), col("acf"))
      .as[(Long, Double)].collect().toMap
    // sample ACF carries the (n-k)/n pair-count shrink at higher lags
    assert(acf(3L) > 0.95 && acf(6L) > 0.9, s"period peaks: $acf")
    assert(acf(1L) < 0.0 && acf(2L) < 0.0, s"off-period: $acf")
  }

  test("matches a straight-line sample-ACF reference") {
    // deterministic pseudo-random series
    val prices = (0 until 60).map(d =>
      (((d * 2654435761L) % 997).toDouble + 100.0))
    val got = Relational.revenueAcf(series(prices), maxLag = 5)
      .select(col("lag"), col("n_pairs"), col("acf"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val cents = prices.map(p => math.round(100.0 * p))
    val n = cents.length.toLong
    val s = cents.sum
    val dev = cents.map(_ * n - s)
    val c0 = dev.map(v => BigInt(v) * BigInt(v)).sum
    val want = (1 to 5).map { k =>
      val ck = (k until cents.length)
        .map(t => BigInt(dev(t)) * BigInt(dev(t - k))).sum
      val acf = BigDecimal(ck.toDouble / c0.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (k.toLong, (cents.length - k).toLong, acf)
    }
    assert(got.toSeq === want)
  }

  test("constant series yields no rows (zero variance)") {
    val acf = Relational.revenueAcf(series(Seq.fill(30)(500.0)))
    assert(acf.count() === 0L)
  }

  test("q263 Theil-Sen: recovers a planted slope through gross outliers") {
    // y = 500 + 3*d dollars, with every 10th day corrupted 50x
    val prices = (0 until 80).map { d =>
      val base = 500.0 + 3.0 * d
      if (d % 10 == 5) base * 50 else base
    }
    val got = Relational.theilSenTrend(series(prices), maxLagDays = 100)
      .as[(Long, Double)].collect().head
    // slope in cents/day: 300; the median shrugs off the outliers
    // (a mean-of-slopes estimator lands far above — the 50x days
    // contribute slopes in the tens of thousands)
    assert(math.abs(got._2 - 300.0) < 1.0, s"sen: $got")
    assert(got._1 > 1000L) // all day pairs within the lag cap
  }

  test("discPercentileBySelection replays percentile_disc exactly") {
    // the r18 q263 optimization swaps the single-reducer percentile
    // buffer for distributed selection — the selected element must be
    // IDENTICAL to the aggregate's on every multiset shape: ties at the
    // cut, even/odd sizes, negatives, single element
    val cases = Seq(
      Seq(1.0),
      Seq(2.0, 1.0),
      Seq(3.0, 1.0, 2.0),
      Seq(1.0, 1.0, 2.0, 2.0),
      Seq(5.0, 4.0, 3.0, 2.0, 1.0),
      Seq(-1.5, 2.5, 2.5, 2.5, 7.0, 7.0),
      (1 to 1000).map(i => ((i * 2654435761L) % 997).toDouble))
    for (vs <- cases; p <- Seq(0.25, 0.5, 0.75, 0.9)) {
      val df = vs.toDF("v")
      val want = df
        .agg(expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY v)"))
        .collect().head.getDouble(0)
      val (n, got) = Relational.discPercentileBySelection(df, "v", p)
      assert(n === vs.size.toLong, s"n at p=$p vs=$vs")
      assert(got === Some(want), s"p=$p vs=$vs")
    }
    assert(Relational.discPercentileBySelection(
      Seq.empty[Double].toDF("v"), "v", 0.5) === ((0L, None)))
  }

  test("discPercentileBySelection: target element past a partition boundary, Long-safe skip") {
    // r19 (VERDICT r18 item 2): the element read was `it.drop(li.toInt
    // - 1)` — an Int truncation of the Long local rank. The fix is a
    // Long while-loop skip; this spec forces the target rank DEEP into
    // a non-first range partition (heavy ties pack every equal value
    // into one partition, the 100 TB failure shape at test scale) and
    // sweeps p so the in-partition skip distance varies.
    val few = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      // 5000 ties of the max value: ranks 1001..6000 all land in the
      // tied value's single range partition; p >= 0.5 targets deep
      // inside it
      val vs = (1 to 1000).map(_.toDouble) ++ Seq.fill(5000)(9999.0)
      val df = vs.toDF("v").repartition(7)
      for (p <- Seq(0.05, 0.2, 0.5, 0.9, 0.999)) {
        val want = df
          .agg(expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY v)"))
          .collect().head.getDouble(0)
        val (n, got) = Relational.discPercentileBySelection(df, "v", p)
        assert(n === vs.size.toLong)
        assert(got === Some(want), s"p=$p")
      }
      // nulls are ignored like the aggregate ignores them (ADVICE r18
      // item 4): n counts only non-null values
      val withNulls = (Seq[java.lang.Double](1.0, null, 3.0, null, 2.0))
        .toDF("v")
      val (n2, got2) =
        Relational.discPercentileBySelection(withNulls, "v", 0.5)
      assert(n2 === 3L && got2 === Some(2.0))
    } finally spark.conf.set("spark.sql.shuffle.partitions", few)
  }

  test("q343 Theil-Sen ladder: same slope as exact on the outlier series") {
    val prices = (0 until 80).map { d =>
      val base = 500.0 + 3.0 * d
      if (d % 10 == 5) base * 50 else base
    }
    val got = Relational.theilSenTrendLadder(series(prices),
      maxLagExp = 6)
      .as[(Long, Double)].collect().head
    // the dyadic-ladder median recovers the identical planted slope
    // through the same gross outliers, on a log-factor pair table:
    // 7 lags x <=80 days bounds the pairs under 7*80
    assert(math.abs(got._2 - 300.0) < 1.0, s"sen ladder: $got")
    assert(got._1 > 100L && got._1 < 560L, s"pair count: $got")
  }

  test("q264 Gini: uniform revenue -> 0, single-customer concentration -> near 1") {
    def orders(weights: Seq[Double]) =
      weights.zipWithIndex.map { case (w, i) =>
        (i.toLong, i.toLong, "1970-01-01 00:00:00", w)
      }.toDF("o_orderkey", "o_custkey", "ds", "o_totalprice")
        .withColumn("o_orderdate", to_timestamp(col("ds"))).drop("ds")
    val flat = Relational.revenueGini(orders(Seq.fill(50)(100.0)))
      .as[(Long, Double)].collect().head
    assert(flat === ((50L, 0.0)))
    val spike = Relational.revenueGini(
      orders(Seq.fill(49)(0.01) ++ Seq(100000.0)))
      .as[(Long, Double)].collect().head
    assert(spike._2 > 0.95, s"concentrated gini: $spike")
  }

  test("q265 Benford: expected probabilities pinned, observed shares sum to 1") {
    val rows = Relational.benfordAudit(
      graft.Tables.orders(spark, sf))
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq === (1L to 9L))
    val pb = rows.map(r => r._1 -> r._4).toMap
    assert(pb(1L) === BigDecimal(math.log10(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
  }

  test("q275 CUSUM: planted level shift is found at the shift day") {
    // 40 days at 100, then 40 days at 500: |CUSUM| peaks at day 39
    val prices = Seq.fill(40)(100.0) ++ Seq.fill(40)(500.0)
    val got = Relational.cusumChangePoint(series(prices))
      .as[(Long, Long, Double)].collect().head
    assert(got._1 === 80L)
    assert(got._2 === 39L, s"change day: $got")
    // cusum/n at day 39: 40 days of dev (100-300)*100 cents = -8000
    assert(got._3 === -800000.0 / 1.0, s"magnitude: $got")
  }

  test("q276 EWMA: constant series smooths to itself (full windows)") {
    val got = Relational.ewmaDaily(series(Seq.fill(40)(500.0)))
      .select(col("epoch_day"), col("ewma_cents"))
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(got.length === 40)
    // day 15 onward has all 16 taps: sum(w)=65535 -> 50000*65535/65536
    got.filter(_._1 >= 15).foreach { case (_, e) =>
      assert(math.abs(e - 50000.0 * 65535.0 / 65536.0) < 0.01, s"$e")
    }
    // day 0 sees only its own tap: 50000 * 32768 / 65536 = 25000
    assert(got.head._2 === 25000.0)
  }

  test("q276 EWMA: hand reference on a short ramp") {
    val prices = Seq(1.0, 2.0, 3.0, 4.0)
    val got = Relational.ewmaDaily(series(prices))
      .select(col("epoch_day"), col("ewma_cents"))
      .as[(Long, Double)].collect().sortBy(_._1)
    val cents = prices.map(p => math.round(100.0 * p))
    val want = cents.indices.map { t =>
      val num = (0 to math.min(15, t)).map(i =>
        cents(t - i) * (1L << (15 - i))).sum
      BigDecimal(num.toDouble / 65536.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.map(_._2).toSeq === want)
  }

  test("q277 Mann-Kendall: rising trend z>0, constant z=0, brute S with ties") {
    val up = Relational.mannKendallTrend(
      series((0 until 30).map(d => 100.0 + d)))
      .as[(Long, Long, Double, Double)].collect().head
    assert(up._2 === 30L * 29 / 2 && up._4 > 3.0, s"rising: $up")
    val const = Relational.mannKendallTrend(
      series(Seq.fill(20)(500.0)))
      .as[(Long, Long, Double, Double)].collect().head
    assert(const._2 === 0L && const._4 === 0.0, s"const: $const")
    // brute-force S and var on a tied series
    val prices = Seq(5.0, 3.0, 5.0, 8.0, 3.0, 9.0, 5.0, 1.0)
    val cents = prices.map(p => math.round(100.0 * p))
    var s = 0L
    for (i <- cents.indices; j <- cents.indices if i < j)
      s += java.lang.Long.signum(cents(j) - cents(i))
    val n = cents.length
    val tie = cents.groupBy(identity).values
      .map(g => g.size.toLong * (g.size - 1) * (2L * g.size + 5)).sum
    val varS = (n.toDouble * (n - 1) * (2 * n + 5) - tie) / 18.0
    val z = if (s > 0) (s - 1) / math.sqrt(varS)
      else if (s < 0) (s + 1) / math.sqrt(varS) else 0.0
    val got = Relational.mannKendallTrend(series(prices))
      .as[(Long, Long, Double, Double)].collect().head
    assert(got._2 === s, s"S: $got vs $s")
    assert(math.abs(got._4 - z) < 1e-6, s"z: $got vs $z")
  }

  test("q283 Durbin-Watson: alternating residuals near 4, smooth drift near 0, brute DW") {
    // alternating around a flat trend: e flips sign daily -> DW ~ 4
    val alt = Relational.durbinWatson(
      series((0 until 60).map(d => if (d % 2 == 0) 400.0 else 600.0)))
      .as[(Long, Double, Double)].collect().head
    assert(alt._3 > 3.5, s"alternating: $alt")
    // one slow sine-ish hump around the trend -> strong positive
    // autocorrelation, DW near 0
    val hump = Relational.durbinWatson(
      series((0 until 60).map(d => 500.0 + (if (d < 30) d else 60 - d))))
      .as[(Long, Double, Double)].collect().head
    assert(hump._3 < 0.5, s"hump: $hump")
    // brute-force reference on a deterministic pseudo-random series
    val prices = (0 until 50).map(d =>
      100.0 + ((d * 2654435761L) % 499).toDouble)
    val got = Relational.durbinWatson(series(prices))
      .as[(Long, Double, Double)].collect().head
    val cents = prices.map(p => math.round(100.0 * p))
    val n = cents.length
    val days = (0 until n).map(_.toLong)
    val sd = days.sum; val sr = cents.sum
    val sdd = days.map(d => d * d).sum
    val sdr = days.zip(cents).map { case (d, r) => d * r }.sum
    val b = (n.toDouble * sdr - sd.toDouble * sr.toDouble) /
      (n.toDouble * sdd - sd.toDouble * sd.toDouble)
    val a = (sr.toDouble - b * sd.toDouble) / n
    val e = days.zip(cents).map { case (d, r) =>
      math.round(r.toDouble - (a + b * d.toDouble)) }
    val num = (1 until n).map(t =>
      (e(t) - e(t - 1)).toDouble * (e(t) - e(t - 1))).sum
    val den = e.map(v => v.toDouble * v).sum
    assert(got._1 === n.toLong)
    assert(math.abs(got._3 - num / den) < 1e-5, s"dw: $got vs ${num / den}")
  }

  test("q285 Grubbs: planted spike located, G matches a brute reference") {
    val prices = (0 until 50).map(d =>
      if (d == 31) 5000.0 else 500.0 + (d % 5))
    val got = Relational.grubbsOutlier(series(prices))
      .as[(Long, Long, Double, Double)].collect().head
    assert(got._1 === 50L && got._2 === 31L, s"located: $got")
    val cents = prices.map(p => math.round(100.0 * p))
    val n = cents.length
    val mean = cents.sum.toDouble / n
    val dev = cents.map(c => math.abs(c - mean)).max
    val s2 = cents.map(c => (c - mean) * (c - mean)).sum / (n - 1.0)
    assert(math.abs(got._4 - dev / math.sqrt(s2)) < 1e-4,
      s"G: $got vs ${dev / math.sqrt(s2)}")
  }

  test("q286 MASE: strong weekly cycle scores << 1, white-ish series ~ 1") {
    // perfect period-7 series: lag-7 error 0 -> mase 0
    val weekly = (0 until 70).map(d => 100.0 * (1 + d % 7))
    val got = Relational.seasonalNaiveMase(series(weekly))
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(got._1 === 69L && got._2 === 63L)
    assert(got._4 === 0.0 && got._5 === 0.0, s"periodic: $got")
    // deterministic pseudo-random with avalanche mixing (a plain
    // linear-congruential walk has near-constant lag-1 steps, which
    // would fake lag-1 skill): no weekly structure -> mase near 1
    val noise = (0 until 70).map { d =>
      val h = d * 0x9E3779B97F4A7C15L
      100.0 + (((h ^ (h >>> 31)) & 0x7fffffffL) % 997L).toDouble
    }
    val flat = Relational.seasonalNaiveMase(series(noise))
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(flat._5 > 0.6 && flat._5 < 1.5, s"no structure: $flat")
  }

  test("q287 Jarque-Bera: symmetric series skew=0; brute moments match") {
    // symmetric two-level series (10/30 in the $1000 coarse units)
    val sym = Relational.jarqueBera(
      series((0 until 40).map(d => if (d % 2 == 0) 10000.0 else 30000.0)))
      .as[(Long, Double, Double, Double)].collect().head
    assert(sym._2 === 0.0, s"symmetric skew: $sym")
    // skewed series vs brute-force reference (coarse 1e4-cent units)
    val prices = (0 until 60).map { d =>
      val h = d * 0x9E3779B97F4A7C15L
      val u = ((h ^ (h >>> 31)) & 0x7fffffffL) % 100L
      (10000L + u * u * 3L).toDouble // right-skewed
    }
    val got = Relational.jarqueBera(series(prices))
      .as[(Long, Double, Double, Double)].collect().head
    val rs = prices.map(p => math.round(100.0 * p) / 100000L)
    val n = rs.length.toDouble
    val mu = rs.sum / n
    val m2 = rs.map(v => math.pow(v - mu, 2)).sum / n
    val m3 = rs.map(v => math.pow(v - mu, 3)).sum / n
    val m4 = rs.map(v => math.pow(v - mu, 4)).sum / n
    val sk = m3 / math.pow(m2, 1.5)
    val ku = m4 / (m2 * m2) - 3.0
    val jb = n / 6.0 * (sk * sk + ku * ku / 4.0)
    assert(got._1 === 60L)
    assert(math.abs(got._2 - sk) < 1e-5, s"skew: $got vs $sk")
    assert(math.abs(got._3 - ku) < 1e-5, s"kurt: $got vs $ku")
    assert(math.abs(got._4 - jb) < 1e-2, s"jb: $got vs $jb")
    assert(got._2 > 0.1, s"right-skewed by construction: $got")
  }

  test("q260 seasonality: planted weekend spike shows up, flat series = 1.0") {
    // day 0 = 1970-01-01 = Thursday -> dow (d+4)%7: 0=Mon..6=Sun
    val prices = (0 until 70).map { d =>
      val dow = (d + 4) % 7
      if (dow >= 5) 900.0 else 100.0 // weekend 9x
    }
    val idx = Relational.dowSeasonality(series(prices))
      .select(col("dow"), col("seasonal_index"))
      .as[(Long, Double)].collect().toMap
    assert(idx.keySet === (0L to 6L).toSet)
    assert(idx(5L) > 2.0 && idx(6L) > 2.0, s"weekend: $idx")
    (0L to 4L).foreach(d => assert(idx(d) < 1.0, s"weekday $d: $idx"))
    // flat series: every index exactly 1.0
    Relational.dowSeasonality(series(Seq.fill(70)(500.0)))
      .select(col("seasonal_index")).as[Double].collect()
      .foreach(v => assert(v === 1.0))
  }

  /** Orders frame with explicit (day, price) rows — variable per-day
    * order COUNTS, for the two-series CCF.
    */
  private def ordersAt(rows: Seq[(Long, Double)]) =
    rows.zipWithIndex.map { case ((d, p), i) => (i.toLong, d, p) }
      .toDF("o_orderkey", "d", "o_totalprice")
      .withColumn("o_orderdate",
        to_timestamp(lit("1970-01-01 00:00:00")) +
          make_dt_interval(col("d")))
      .drop("d")

  test("q318 CCF: hand series — lag-0 peak, symmetric negative side lags") {
    // days 0..3: (r, c) = (10,1), (20,2), (30,1), (40,2)
    // dvx = (-60,-20,20,60), dvy = (-2,2,-2,2), c0x=8000, c0y=16
    // ccf(0) = 160/sqrt(128000), ccf(±1) = -40/sqrt(128000)
    val o = ordersAt(Seq((0L, 10.0), (1L, 10.0), (1L, 10.0),
      (2L, 30.0), (3L, 20.0), (3L, 20.0)))
    val got = Relational.ccfDaily(o)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet === (-3L to 3L).toSet, s"$got")
    assert(got(0L) === ((4L, 0.447214)), s"$got")
    assert(got(1L) === ((3L, -0.111803)), s"$got")
    assert(got(-1L) === ((3L, -0.111803)), s"$got")
  }

  test("q319 ADF: mean-reverting series rejects the unit root; collinear NaN") {
    // geometric decay toward 0: strongly stationary, beta < 0, t < 0
    val decay = (0 until 40).map(d => 1000.0 * math.pow(0.7, d) + 10.0)
    val got = Relational.adfTest(series(decay))
      .as[(Long, Double, Double)].collect().head
    assert(got._1 === 38L, s"$got")
    assert(got._2 < 0.0 && got._3 < -3.0, s"stationary: $got")
    // a two-level alternating series makes x2 = 2*x1 - const: the
    // design is collinear with the intercept -> det 0 -> NaN, not ANSI
    val alt = (0 until 12).map(d => if (d % 2 == 0) 10.0 else 20.0)
    val bad = Relational.adfTest(series(alt))
      .as[(Long, Double, Double)].collect().head
    assert(bad._2.isNaN && bad._3.isNaN, s"collinear: $bad")
  }

  test("q321 Chow: planted slope break found; stable line stays small") {
    // alternating ±1 noise keeps every SSE strictly positive so the
    // F ratio is defined on both series
    def noisy(slope2: Double) = (0 until 40).map { d =>
      val base = if (d <= 19) 100.0 + 5.0 * d
      else 100.0 + 5.0 * 19 + slope2 * (d - 19)
      base + (if (d % 2 == 0) 1.0 else -1.0)
    }
    val broken = Relational.chowTest(series(noisy(slope2 = 50.0)))
      .as[(Long, Long, Double)].collect().head
    assert(broken._1 === 40L && broken._2 === 19L, s"$broken")
    assert(broken._3 > 100.0, s"break must dominate: $broken")
    val stable = Relational.chowTest(series(noisy(slope2 = 5.0)))
      .as[(Long, Long, Double)].collect().head
    assert(stable._3 < 5.0, s"no break: $stable")
  }

  test("q334 Bartels RVN: alternating ranks jump, trend ranks crawl") {
    // alternating [10,20]x3: NM4=180, DEN4=54 -> RVN=10/3, z>0
    val alt = Relational.bartelsRvn(
      series(Seq(10.0, 20.0, 10.0, 20.0, 10.0, 20.0)))
      .as[(Long, Double, Double)].collect().head
    assert(alt === ((6L, 3.333333, 1.813529)), s"$alt")
    // monotone ranks: successive jumps of 1 -> RVN = 20/70, z<0
    val mono = Relational.bartelsRvn(
      series(Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)))
      .as[(Long, Double, Double)].collect().head
    assert(mono === ((6L, 0.285714, -2.331681)), s"$mono")
    // constant series: zero rank variance -> NaN
    val const = Relational.bartelsRvn(series(Seq.fill(5)(7.0)))
      .as[(Long, Double, Double)].collect().head
    assert(const._2.isNaN && const._3.isNaN, s"$const")
  }

  test("q320 KPSS: alternating series 0.125 exact; trend scores higher") {
    val alt = Relational.kpssTest(series(Seq(10.0, 20.0, 10.0, 20.0)))
      .as[(Long, Double)].collect().head
    assert(alt === ((4L, 0.125)), s"$alt")
    val trend = Relational.kpssTest(series(Seq(10.0, 20.0, 30.0, 40.0)))
      .as[(Long, Double)].collect().head
    assert(trend === ((4L, 0.425)), s"$trend")
    // constant series: zero variance -> NaN
    val const = Relational.kpssTest(series(Seq.fill(5)(100.0)))
      .as[(Long, Double)].collect().head
    assert(const._2.isNaN, s"$const")
  }
}
