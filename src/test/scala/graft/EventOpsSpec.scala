package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.EventOps

/** EventOps product-analytics tier: hand-checked cohort/funnel/band/skew
  * fixtures — semantics the DuckDB gate can't pin down alone (stage
  * ordering strictness, frame warm-up nulls, cumulative-share ordering).
  */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cohortRetention: cohort = first-seen week; offsets count distinct active users") {
    val e = Seq(
      // user 1: first week W0, active W0 and W1
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-09 10:00:00"), 1L, "view", 1.0, "{}"),
      // user 2: first week W0 only
      (3L, ts("2024-01-03 10:00:00"), 2L, "view", 1.0, "{}"),
      // user 3: first week W1
      (4L, ts("2024-01-10 10:00:00"), 3L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.cohortRetention(e).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got(("2024-01-01", 0)) == ((2L, 2L, 1.0)), "both W0 users active in week 0")
    assert(got(("2024-01-01", 1)) == ((1L, 2L, 0.5)), "only user 1 returns in week 1")
    assert(got(("2024-01-08", 0)) == ((1L, 1L, 1.0)))
    assert(got.size == 3)
  }

  test("funnelConversion: stages advance only on strictly-later events") {
    val e = Seq(
      // user 1 completes the funnel in order
      (1L, ts("2024-01-01 09:00:00"), 1L, "signup", 1.0, "{}"),
      (2L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-01 11:00:00"), 1L, "purchase", 1.0, "{}"),
      // user 2: click BEFORE signup → stage 2 not reached
      (4L, ts("2024-01-02 08:00:00"), 2L, "click", 1.0, "{}"),
      (5L, ts("2024-01-02 09:00:00"), 2L, "signup", 1.0, "{}"),
      // user 3: signup + click, purchase before click → stage 3 not reached
      (6L, ts("2024-01-03 09:00:00"), 3L, "signup", 1.0, "{}"),
      (7L, ts("2024-01-03 09:30:00"), 3L, "purchase", 1.0, "{}"),
      (8L, ts("2024-01-03 10:00:00"), 3L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.funnelConversion(e).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 1L)))
    assert(r.getDouble(3) == math.rint(2.0 / 3.0 * 1e6) / 1e6)
    assert(r.getDouble(4) == 0.5)
  }

  test("rollingBand: integer-cents variance; single-day frame yields null std/bands") {
    val e = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "view", 1.00, "{}"),
      (2L, ts("2024-01-02 09:00:00"), 1L, "view", 3.00, "{}"),
      (3L, ts("2024-01-03 09:00:00"), 1L, "view", 5.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = EventOps.rollingBand(e).orderBy(col("day")).collect()
    assert(rows(0).isNullAt(3) && rows(0).isNullAt(4) && rows(0).isNullAt(5),
      "warm-up day: no sample variance from one point")
    // day 2 frame {100, 300} cents: mean 2.00, var = (2*100000-160000)/2 → std √20000/100 = √2
    assert(rows(1).getDouble(2) == 2.0)
    assert(rows(1).getDouble(3) == math.rint(math.sqrt(2.0) * 1e6) / 1e6)
    // day 3 frame {1,3,5}: mean 3, std 2 → bands 7 / -1
    assert(rows(2).getDouble(2) == 3.0 && rows(2).getDouble(3) == 2.0)
    assert(rows(2).getDouble(4) == 7.0 && rows(2).getDouble(5) == -1.0)
  }

  test("decayedUserValue: data-anchored decay, hand-checked weights, partition-invariant") {
    val e = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "view", 100.0, "{}"),  // age 7 at anchor
      (2L, ts("2024-01-08 09:00:00"), 1L, "view", 100.0, "{}"),  // age 0 (anchor day)
      (3L, ts("2024-01-08 10:00:00"), 2L, "view", 50.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.decayedUserValue(e, tauDays = 7.0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // w(age 0) = 1e6, w(age 7) = round(e^-1 * 1e6) = 367879; output is
    // integer micros (no divide-back — zero float surface for the oracle)
    assert(got(2L) == 50000000L)
    assert(got(1L) == 100L * 1000000L + math.rint(100.0 * 367879L).toLong)
    val re = EventOps.decayedUserValue(e.repartition(5), tauDays = 7.0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re == got, "integer-quantized sums are partition-order-proof")
  }

  test("anomalousDays: preceding-window baseline flags the spike, warm-up never flags") {
    // 5 steady days of 1.00 then a 100.00 spike: baseline (preceding
    // frame) is the flat days, so the spike flags; the spike itself never
    // contaminates its own baseline
    val e = ((1 to 5).map(d => (d.toLong, ts(f"2024-01-0$d%01d 09:00:00"), 1L, "view", 1.00, "{}")) :+
      (6L, ts("2024-01-06 09:00:00"), 1L, "view", 100.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = EventOps.anomalousDays(e).collect()
    assert(rows.length == 1, s"only the spike flags: ${rows.toSeq}")
    val r = rows.head
    assert(r.getDate(1).toString == "2024-01-06" && r.getDouble(2) == 100.0)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 0.0, "baseline from the 5 flat days")
    // warm-up: fewer than 3 preceding days never flags even when wild
    val warm = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "view", 1.00, "{}"),
      (2L, ts("2024-01-02 09:00:00"), 1L, "view", 500.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(EventOps.anomalousDays(warm).collect().isEmpty)
  }

  test("basketLift: exact lift from distinct user-type counts; repeats don't inflate") {
    val e = Seq(
      // users 1,2 do BOTH view+click; user 3 only view (twice: distinct collapses)
      (1L, ts("2024-01-01 09:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 09:10:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-01 09:20:00"), 2L, "view", 1.0, "{}"),
      (4L, ts("2024-01-01 09:30:00"), 2L, "click", 1.0, "{}"),
      (5L, ts("2024-01-01 09:40:00"), 3L, "view", 1.0, "{}"),
      (6L, ts("2024-01-01 09:50:00"), 3L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = EventOps.basketLift(e).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) == (("click", "view", 2L)))
    // lift = P(both)/(P(a)P(b)) = (2/3) / ((2/3)(3/3)) = 1.0 → 1e6 ppm
    assert(r.getLong(3) == 1000000L)
  }

  test("skewProfile: (cnt desc, key) order, shares of TOTAL, cumulative over top-N only") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("c"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val rows = EventOps.skewProfile(df, "k", topN = 2).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"), "top-2 only")
    assert(rows(0).getLong(2) == 600000L && rows(0).getLong(3) == 600000L)
    assert(rows(1).getLong(2) == 300000L && rows(1).getLong(3) == 900000L,
      "cumulative share still denominates by the FULL total")
  }

  test("Anomaly: batch face reproduces anomalousDays row-for-row (values, " +
       "rounded baselines); streaming run emits the same anomaly after " +
       "watermark passes the day") {
    import graft.streaming.Anomaly
    // 10 quiet days of 100.00 then a 500.00 spike: days 1-10 baseline ~1e4
    // cents with tiny jitter (so std > 0), day 11 is the anomaly
    val rows = (1 to 10).map { d =>
      (d.toLong, ts(f"2024-03-$d%02d 12:00:00"), 1L, "purchase", 100.0 + (d % 3) * 0.01, "{}")
    } :+ ((11L, ts("2024-03-11 12:00:00"), 1L, "purchase", 500.0, "{}"))
    val e = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val batchOp = EventOps.anomalousDays(e).collect().map(_.toString).toSet
    assert(batchOp.nonEmpty, "fixture must contain an anomaly")
    val typed = Anomaly.anomalies(
      e.select(col("event_type"), col("ts"), col("value")).as[Anomaly.Event])
      .toDF().collect().map(_.toString).toSet
    assert(typed == batchOp, s"batch parity: $typed vs $batchOp")

    // streaming: same rows in two micro-batches; day 11 finalizes only
    // after the watermark passes its end
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Anomaly.Event]
    val q = Anomaly.anomalies(mem.toDS().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("anomaly_stream").outputMode("append").start()
    try {
      mem.addData(rows.take(10).map(r => Anomaly.Event(r._4, r._2, r._5)): _*)
      q.processAllAvailable()
      mem.addData(Anomaly.Event("purchase", ts("2024-03-11 12:00:00"), 500.0))
      q.processAllAvailable()
      assert(spark.table("anomaly_stream").count() == 0,
        "day 11 must not finalize while the watermark is inside it")
      mem.addData(Anomaly.Event("view", ts("2024-03-13 00:00:00"), 1.0))
      q.processAllAvailable()
      val got = spark.table("anomaly_stream").collect().map(_.toString).toSet
      assert(got == batchOp, s"streaming emits the same anomaly: $got")
    } finally q.stop()
  }

  test("rfmSegments: 8 distinct-valued customers split 2 per quartile bucket " +
       "on every dimension; champion and lapsing labels land where expected") {
    // customer k: k orders, all on 2020-01-k (recency 8-k days), each
    // priced 100k -> every metric has 8 distinct values, so interpolated
    // quartile boundaries fall strictly between ranks {2,3}, {4,5}, {6,7}
    val orders = (1 to 8).flatMap { k =>
      (1 to k).map(j => (k * 100L + j, k.toLong, "O",
        100.0 * k, ts(f"2020-01-0$k 00:00:00"), "1-URGENT"))
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val r = EventOps.rfmSegments(orders).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3),
          x.getInt(4), x.getInt(5), x.getInt(6), x.getString(7)))).toMap
    assert(r.size == 8)
    // metrics: recency = 8-k, n = k, cents = k^2 * 10000 (k orders x 100k x 100)
    for (k <- 1 to 8) {
      val (rec, n, cents, _, _, _, _) = r(k.toLong)
      assert((rec, n, cents) == ((8L - k, k.toLong, k.toLong * k * 10000)))
    }
    def buckets(i: Int) = r.values.map(v => v.productElement(i).asInstanceOf[Int])
      .groupBy(identity).view.mapValues(_.size).toMap
    for (i <- 3 to 5)
      assert(buckets(i) == Map(1 -> 2, 2 -> 2, 3 -> 2, 4 -> 2), s"dim $i: ${buckets(i)}")
    // cust 8: most recent + top frequency + top spend
    assert(r(8L)._7 == "champion" && r(7L)._7 == "champion")
    assert(r(1L)._7 == "lapsing" && r(2L)._7 == "lapsing")
    assert(r(5L)._7 == "standard" && r(6L)._7 == "standard")
  }

  test("conversionLag: exact type-1 quantiles at hand-computed ranks; " +
       "pre-signup purchases never convert; non-converters drop") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    def ev(id: Long, t: String, u: Long, typ: String) =
      (id, ts(t), u, typ, 1.0, "{}")
    // users 1..5 sign up in Jan; lags 10, 20, 30, 40, 50 s.
    // user 6 purchases BEFORE signup only; user 7 never purchases.
    val rows = (1L to 5L).flatMap { u =>
      Seq(ev(u * 10, s"2024-01-0$u 00:00:00", u, "signup"),
        ev(u * 10 + 1, s"2024-01-0$u 00:00:${u * 10}", u, "purchase"))
    } ++ Seq(
      ev(100, "2024-01-06 00:00:00", 6L, "purchase"),
      ev(101, "2024-01-06 00:01:00", 6L, "signup"),
      ev(102, "2024-01-07 00:00:00", 7L, "signup"))
    val got = EventOps.conversionLag(rows.toDF(
      "event_id", "ts", "user_id", "event_type", "value", "props")).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // n=5: median rank (5+1) div 2 = 3 -> 30; p90 rank (45+9) div 10 = 5 -> 50
    assert(got == Map("2024-01-01" -> ((5L, 30L, 50L))), s"$got")
  }

  test("eventTransitions: hand-computed ppm matrix; sequences never cross " +
       "users; row probabilities sum to ~1e6 per from-state") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    // user 1: a->b->a->b ; user 2: a->b ; user 3: c (no transition)
    val events = Seq(
      (1L, ts("2024-01-01 00:00:01"), 1L, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 00:00:02"), 1L, "b", 1.0, "{}"),
      (3L, ts("2024-01-01 00:00:03"), 1L, "a", 1.0, "{}"),
      (4L, ts("2024-01-01 00:00:04"), 1L, "b", 1.0, "{}"),
      (5L, ts("2024-01-01 00:00:05"), 2L, "a", 1.0, "{}"),
      (6L, ts("2024-01-01 00:00:06"), 2L, "b", 1.0, "{}"),
      (7L, ts("2024-01-01 00:00:07"), 3L, "c", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.eventTransitions(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // from a: 3x a->b (users 1,1,2) = 1e6; from b: 1x b->a of total 1
    assert(got == Map(("a", "b") -> ((3L, 1000000L)), ("b", "a") -> ((1L, 1000000L))),
      s"$got")
    // user 3's lone event and each user's LAST event contribute nothing:
    // 5 transitions would exist if sequences crossed users; only 4 do,
    // and none involve "c"
    assert(!got.keySet.exists(k => k._1 == "c" || k._2 == "c"))
  }

  test("attributionCredit: first/last by (ts, id); linear half-up split; " +
       "lookback excludes stale touches; organic purchases emit nothing") {
    val e = Seq(
      // user 1: view then click then purchase -> first=view, last=click,
      // linear 500000 each
      (1L, ts("2024-01-01 09:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-02 11:00:00"), 1L, "purchase", 5.0, "{}"),
      // user 2: touch 10 days before purchase -> outside lookback; organic
      (4L, ts("2024-01-01 09:00:00"), 2L, "view", 1.0, "{}"),
      (5L, ts("2024-01-11 09:00:00"), 2L, "purchase", 5.0, "{}"),
      // user 3: single click -> full credit under all three models
      (6L, ts("2024-01-05 09:00:00"), 3L, "click", 1.0, "{}"),
      (7L, ts("2024-01-05 10:00:00"), 3L, "purchase", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.attributionCredit(e).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got("view") == ((1L, 1000000L, 0L, 500000L)), got.toString)
    assert(got("click") == ((2L, 1000000L, 2000000L, 1500000L)), got.toString)
    assert(got.size == 2)
  }

  test("stickiness: trailing-7d WAU counts a user once per window; " +
       "silent days emit no row") {
    val e = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"), // same user-day
      (3L, ts("2024-01-01 09:00:00"), 2L, "view", 1.0, "{}"),
      (4L, ts("2024-01-03 09:00:00"), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.stickiness(e).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("2024-01-01") == ((2L, 2L, 1000000L)), got.toString)
    // day 3: user 1 active; both users' day-1 activity still in window
    assert(got("2024-01-03") == ((1L, 2L, 500000L)), got.toString)
    assert(got.size == 2, "no rows for silent days")
  }

  test("itemSimilarity: closed-form ppm cosine; per-user cap excludes " +
       "heavy users before pair generation") {
    def ev(id: Long, u: Long, item: Int) =
      (id, ts("2024-01-01 09:00:00"), u, "view", 1.0, s"""{"k": $item}""")
    // u1,u2 share {1,2}; u3 has {1,3}: n1=3 n2=2 n3=1
    // (1,2): c=2 -> 2e6/sqrt(6) = 816497 ; (1,3): c=1 -> 1e6/sqrt(3) = 577350
    val e = Seq(ev(1, 1, 1), ev(2, 1, 2), ev(3, 2, 1), ev(4, 2, 2),
      ev(5, 3, 1), ev(6, 3, 3))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.itemSimilarity(e).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3), r.getInt(4))))
      .toMap
    assert(got((1, 2)) == ((2L, 816497L, 1)), got.toString)
    assert(got((1, 3)) == ((1L, 577350L, 2)), got.toString)
    assert(got.size == 2)
    // cap 1: every user with >1 item drops -> no pairs at all
    assert(EventOps.itemSimilarity(e, maxUserItems = 1).collect().isEmpty)
  }

  test("sessionPaths: trigrams never cross a 30-minute session boundary") {
    val e = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 09:05:00"), 1L, "b", 1.0, "{}"),
      (3L, ts("2024-01-01 09:10:00"), 1L, "c", 1.0, "{}"),
      // 40-minute gap -> new session; (b,c,d) and (c,d,e) must not count
      (4L, ts("2024-01-01 09:50:00"), 1L, "d", 1.0, "{}"),
      (5L, ts("2024-01-01 09:55:00"), 1L, "e", 1.0, "{}"),
      (6L, ts("2024-01-01 09:58:00"), 1L, "f", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.sessionPaths(e).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(got == Map(("a", "b", "c") -> 1L, ("d", "e", "f") -> 1L), got.toString)
  }

  test("momentsProfile: closed-form on [1,2,3] (skew 0, kurt -1.5); " +
       "constant group yields NULL moments, never NaN") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("c", 7), ("c", 7))
      .toDF("k", "v")
    val got = graft.operators.RelationalOps.momentsProfile(df, "v", "k")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4))))).toMap
    assert(got("a") == ((3L, 2000000L, Some(0.0), Some(-1.5))), got.toString)
    assert(got("c") == ((2L, 7000000L, None, None)), got.toString)
  }

  test("momentsProfile: a group past the exact-moment bounds fails LOUDLY " +
       "(raise_error), never a silent ANSI-off decimal NULL") {
    // |x| bound: one row at 40000 > 3e4 (x^4 would wrap LONG well before
    // the decimal sums are even reached)
    val wide = Seq(("a", 40000)).toDF("k", "v")
    val e1 = intercept[Exception] {
      graft.operators.RelationalOps.momentsProfile(wide, "v", "k").collect()
    }
    assert(e1.getMessage.contains("exceeds the exact-moment bounds"),
      e1.getMessage)
    // n*max|x| bound: 60001 rows at 30000 -> 1.80003e9 > 1.5e9, the
    // DECIMAL(38,0) capacity line for the kurtosis numerator's terms
    val big = spark.range(60001).selectExpr("'g' as k", "30000 as v")
    val e2 = intercept[Exception] {
      graft.operators.RelationalOps.momentsProfile(big, "v", "k").collect()
    }
    assert(e2.getMessage.contains("exceeds the exact-moment bounds"),
      e2.getMessage)
    // just inside both bounds still computes (50000 * 30000 = 1.5e9)
    val ok = spark.range(50000).selectExpr("'g' as k",
      "case when id = 0 then 30000 else 0 end as v")
    val row = graft.operators.RelationalOps.momentsProfile(ok, "v", "k").collect()
    assert(row.length == 1 && row(0).getLong(1) == 50000L, row.mkString)
  }

  test("revenueTrend: exact slope on a linear series; single-day series " +
       "reads NULL (zero x-variance)") {
    // type "up": daily cents 1000 + 250·k over 5 consecutive days → the
    // OLS slope is exactly 250 cents/day = 250_000_000 micros
    val ev = ((0 to 4).map(k =>
      ("up", Timestamp.valueOf(s"1995-01-0${k + 1} 12:00:00"), 10.0 + 2.5 * k)) :+
      (("flat", Timestamp.valueOf("1995-01-03 09:00:00"), 55.0)))
      .toDF("event_type", "ts", "value")
      .withColumn("event_id", lit(1L)).withColumn("user_id", lit(1L))
    val got = EventOps.revenueTrend(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), Option(r.get(2))))).toMap
    assert(got("up") == ((5L, Some(250000000L))), got.toString)
    assert(got("flat") == ((1L, None)), "one day has no slope")
  }

  test("weekdaySeasonality: portable dow anchors Sunday=0 at the 1995-01-01 " +
       "epoch; index is the exact cross-multiplied ppm") {
    // Sun $10, Mon $30: mean day = $20 → Sunday index 0.5, Monday 1.5
    val ev = Seq(
      ("buy", Timestamp.valueOf("1995-01-01 12:00:00"), 10.0), // Sunday → dow 0
      ("buy", Timestamp.valueOf("1995-01-02 12:00:00"), 30.0)) // Monday → dow 1
      .toDF("event_type", "ts", "value")
    val got = EventOps.weekdaySeasonality(ev).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0) == ((1L, 1000L, 500000L)), got.toString)
    assert(got(1) == ((1L, 3000L, 1500000L)), got.toString)
    // a second Sunday folds into dow 0 (n_days 2), not a new row
    val ev2 = ev.union(Seq(("buy", Timestamp.valueOf("1995-01-08 12:00:00"), 20.0))
      .toDF("event_type", "ts", "value"))
    val sun = EventOps.weekdaySeasonality(ev2).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sun(0) == 2L && sun(1) == 1L, sun.toString)
  }

  test("revenueAcf: exact micros on an alternating series; lags past the " +
       "series length emit no row") {
    // daily cents 1000,2000,1000,2000: d = ±2000·… → acf(1) = −3/4,
    // acf(2) = +1/2, acf(3) = −1/4 exactly; lags 4..7 have zero pairs
    val ev = (1 to 4).map { k =>
      ("buy", Timestamp.valueOf(s"1995-01-0$k 12:00:00"),
        if (k % 2 == 1) 10.0 else 20.0)
    }.toDF("event_type", "ts", "value")
    val got = EventOps.revenueAcf(ev).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), Option(r.get(2))))).toMap
    assert(got(1) == ((3L, Some(-750000L))), got.toString)
    assert(got(2) == ((2L, Some(500000L))), got.toString)
    assert(got(3) == ((1L, Some(-250000L))), got.toString)
    assert(!got.contains(4) && got.size == 3, got.toString)
  }

  test("theilSenTrend: the median pairwise slope shrugs off an outlier " +
       "day that drags OLS") {
    // daily cents 1000, 2000, 3000, 10000: five of six pairwise slopes
    // are pulled by the spike, but the type-1 median (rank 3 of 6) is
    // still the underlying 1000 cents/day
    val ev = (1 to 4).map { k =>
      ("buy", Timestamp.valueOf(s"1995-01-0$k 12:00:00"),
        if (k == 4) 100.0 else 10.0 * k)
    }.toDF("event_type", "ts", "value")
    val r = EventOps.theilSenTrend(ev).head()
    assert(r.getString(0) == "buy" && r.getLong(1) == 6L, r.toString)
    assert(r.getLong(2) == 1000L * 1000000L, s"median slope ${r.getLong(2)}")
    // OLS on the same series reads far above the median slope
    val ols = EventOps.revenueTrend(ev).head().getAs[Long]("slope_micros")
    assert(ols > r.getLong(2), s"OLS $ols should be dragged above Theil–Sen")
  }

  test("cusumChangepoint: the peak |cusum| lands on the last pre-shift " +
       "day of a level shift") {
    // 4 days at $10 then 4 days at $20: scaled deviations ∓4000, cusum
    // bottoms at -16000 on day 4 — the shift boundary
    val ev = (1 to 8).map { k =>
      ("buy", Timestamp.valueOf(s"1995-01-0$k 12:00:00"), if (k <= 4) 10.0 else 20.0)
    }.toDF("event_type", "ts", "value")
    val r = EventOps.cusumChangepoint(ev).head()
    assert(r.getString(0) == "buy")
    assert(r.getDate(1).toString == "1995-01-04", s"change day ${r.getDate(1)}")
    assert(r.getLong(2) == -16000L, s"cusum ${r.getLong(2)}")
    assert(r.getLong(3) == 8L)
  }

  test("customerValueDeciles: equal-count deciles, exact share ppm; " +
       "dowHourHeatmap: shares sum to ~1e6 and dow stays in 0..6") {
    import spark.implicits._
    // spends 100..2000 cents over 20 customers → 2 per decile;
    // decile 9 = {1900, 2000} → share = 3900/21000
    val orders = (1L to 20L).map(i => (i, i * 1.00)).toDF("o_custkey", "o_totalprice")
    val d = EventOps.customerValueDeciles(orders).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(d.keySet == (0 to 9).toSet && d.values.forall(_._1 == 2L), d.toString)
    assert(d(9) == ((2L, 3900L, (3900L * 1000000L + 10500L) / 21000L)), d.toString)
    assert(d(0)._2 == 300L, "decile 0 holds the two smallest spenders")
    val events = (0 until 48).map { i =>
      (i.toLong, 1L, java.sql.Timestamp.valueOf(s"1995-01-0${1 + i / 24} ${i % 24}:30:00"), 1.0)
    }.toDF("event_id", "user_id", "ts", "value")
    val h = EventOps.dowHourHeatmap(events).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(4)))).toMap
    assert(h.keys.forall { case (dw, hr) => dw >= 0 && dw <= 6 && hr >= 0 && hr <= 23 })
    assert(h.size == 48 && h.values.forall(_._1 == 1L))
    val shareSum = h.values.map(_._2).sum
    assert(math.abs(shareSum - 1000000L) <= h.size, s"ppm shares sum ~1e6: $shareSum")
  }

  test("temporalSplitEmbargo: splits are disjoint day ranges with a visible " +
       "gap of exactly the embargo width") {
    import spark.implicits._
    // 60 daily events ending 1995-03-01; val = last 28 days, embargo = 7
    val events = (0 until 60).map { i =>
      (i.toLong, 1L + i % 3,
        Timestamp.valueOf(java.time.LocalDate.of(1995, 3, 1).minusDays(i).atStartOfDay))
    }.toDF("event_id", "user_id", "ts")
    val got = EventOps.temporalSplitEmbargo(events, valDays = 28, embargoDays = 7)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDate(3).toLocalDate, r.getDate(4).toLocalDate))).toMap
    assert(got.keySet == Set("train", "embargo", "val"), got.toString)
    assert(got("val")._1 == 28L && got("embargo")._1 == 7L && got("train")._1 == 25L)
    // ordering and the gap: train ends, embargo fills the next 7 days,
    // val starts the day after embargo ends
    assert(got("train")._3.plusDays(1) == got("embargo")._2, got.toString)
    assert(got("embargo")._3.plusDays(1) == got("val")._2, got.toString)
    assert(java.time.temporal.ChronoUnit.DAYS.between(
      got("train")._3, got("val")._2) == 8L, "embargo gap is exactly 7 days wide")
  }

  test("transitionEntropy: a deterministic funnel state scores 0; a " +
       "uniform 2-way scatter scores ln 2 micro-nats") {
    // user streams: from "a" always to "b" (4x); from "b" to "c"/"d" 2x each
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "b", 1.0, "{}"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "c", 1.0, "{}"),
      (4L, ts("2024-01-01 10:00:00"), 2L, "a", 1.0, "{}"),
      (5L, ts("2024-01-01 10:01:00"), 2L, "b", 1.0, "{}"),
      (6L, ts("2024-01-01 10:02:00"), 2L, "d", 1.0, "{}"),
      (7L, ts("2024-01-01 10:00:00"), 3L, "a", 1.0, "{}"),
      (8L, ts("2024-01-01 10:01:00"), 3L, "b", 1.0, "{}"),
      (9L, ts("2024-01-01 10:02:00"), 3L, "c", 1.0, "{}"),
      (10L, ts("2024-01-01 10:00:00"), 4L, "a", 1.0, "{}"),
      (11L, ts("2024-01-01 10:01:00"), 4L, "b", 1.0, "{}"),
      (12L, ts("2024-01-01 10:02:00"), 4L, "d", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.transitionEntropy(e).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("a") == ((4L, 1L, 0L)), s"funnel state has zero entropy: ${got("a")}")
    // b -> {c, d} uniformly: H = ln 2 = 2 * round(0.5 * ln 2 * 1e6)
    assert(got("b") == ((4L, 2L, 693148L)), s"uniform 2-way = ln 2: ${got("b")}")
    assert(!got.contains("c") && !got.contains("d"), "terminal states emit no row")
  }

  test("orderStreakHistogram: rank-difference islands find the longest " +
       "consecutive-day run; same-day repeat orders collapse") {
    def d(s: String) = Timestamp.valueOf(s + " 10:00:00")
    val orders = Seq(
      (1L, 1L, d("2024-01-01")), (2L, 1L, d("2024-01-02")),
      (3L, 1L, d("2024-01-03")), (4L, 1L, d("2024-01-10")),
      (5L, 2L, d("2024-02-05")),
      // customer 3: two orders the SAME day then the next day -> streak 2
      (6L, 3L, d("2024-03-01")), (7L, 3L, d("2024-03-01")), (8L, 3L, d("2024-03-02")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val got = EventOps.orderStreakHistogram(orders).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 1L, 1L -> 1L, 2L -> 1L), got.toString)
  }

  test("interarrivalProfile: metronomic gaps read CV 0, mixed gaps the " +
       "exact moment ratio; singleton streams emit no gap") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 10:00:10"), 1L, "view", 1.0, "{}"),
      (3L, ts("2024-01-01 10:00:20"), 1L, "view", 1.0, "{}"),
      (4L, ts("2024-01-01 10:00:00"), 2L, "click", 1.0, "{}"),
      (5L, ts("2024-01-01 10:00:10"), 2L, "click", 1.0, "{}"),
      (6L, ts("2024-01-01 10:00:40"), 2L, "click", 1.0, "{}"),
      // singleton: no gap row may appear for "buy"
      (7L, ts("2024-01-01 12:00:00"), 3L, "buy", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.interarrivalProfile(e).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("view") == ((2L, 10L, 0L)), s"metronome: ${got("view")}")
    // gaps 10, 30: mean 20; CV^2 = (2*1000 - 1600)/1600 = 0.25 -> 500000
    assert(got("click") == ((2L, 20L, 500000L)), s"mixed: ${got("click")}")
    assert(!got.contains("buy"), "singleton streams contribute no gaps")
  }

  test("seasonalResidualOutliers: a day breaking its own weekday's pattern " +
       "fires; a 'low' weekend that matches its weekday baseline does not") {
    // two Mondays at 100, one Monday at 400 (the outlier); two Sundays
    // at 10 (low in absolute terms but each ON-pattern for Sundays)
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "p", 1.00, "{}"),  // Mon
      (2L, ts("2024-01-08 10:00:00"), 1L, "p", 1.00, "{}"),  // Mon
      (3L, ts("2024-01-15 10:00:00"), 1L, "p", 4.00, "{}"),  // Mon outlier
      (4L, ts("2024-01-07 10:00:00"), 1L, "p", 0.10, "{}"),  // Sun
      (5L, ts("2024-01-14 10:00:00"), 1L, "p", 0.10, "{}"))  // Sun
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.seasonalResidualOutliers(e).collect()
      .map(r => r.getDate(0).toString -> r.getLong(4)).toMap
    // Monday mean = (100+100+400+1)/3 = 200; 2024-01-15: (400-200)/200 = +1e6
    // and the two quiet Mondays read (100-200)/200 = -500000 (not > thresh)
    assert(got.keySet == Set("2024-01-15"), got.toString)
    assert(got("2024-01-15") == 1000000L, got.toString)
  }

  test("ewmaRevenue: single day is the identity; adjacent days blend by the " +
       "ppm kernel; gap days renormalize over the weights actually present") {
    val w = EventOps.ewmaWeightsPpm
    assert(w.head == 300000L && w(1) == 210000L && w.length == 10, w.toString)
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "purchase", 1.00, "{}"),
      (2L, ts("2024-01-02 10:00:00"), 1L, "purchase", 2.00, "{}"),
      // 4-day gap, then one more day: lags 0, 5 and 6 are present for it
      (3L, ts("2024-01-07 10:00:00"), 1L, "purchase", 3.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.ewmaRevenue(e).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("2024-01-01") == ((100L, 100L)), "series head = its own value")
    // (w0*200 + w1*100 + sw/2) div sw with sw = 510000 -> 159
    assert(got("2024-01-02") == ((200L, 159L)), got("2024-01-02").toString)
    // day 7 sees day 2 at lag 5 and day 1 at lag 6, nothing else
    val sw = w(0) + w(5) + w(6)
    val exp = (w(0) * 300L + w(5) * 200L + w(6) * 100L + sw / 2) / sw
    assert(got("2024-01-07") == ((300L, exp)), got("2024-01-07").toString)
  }

  test("kmConversion: hand-checked risk sets, log-space cumsum, " +
       "never-purchasers censor at the horizon, n=d goes NULL") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    def ev(id: Long, t: String, u: Long, typ: String) =
      (id, ts(t), u, typ, 1.0, "{}")
    // A,B convert at day 1, C at day 3, D never (horizon day 5 via a view)
    val e = Seq(
      ev(1, "2024-01-01 00:00:00", 1, "signup"),
      ev(2, "2024-01-01 00:00:00", 2, "signup"),
      ev(3, "2024-01-01 00:00:00", 3, "signup"),
      ev(4, "2024-01-01 00:00:00", 4, "signup"),
      ev(5, "2024-01-02 00:00:00", 1, "purchase"),
      ev(6, "2024-01-02 00:00:00", 2, "purchase"),
      ev(7, "2024-01-04 00:00:00", 3, "purchase"),
      ev(8, "2024-01-06 00:00:00", 4, "view"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.kmConversion(e).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got.keySet == Set(1L, 3L), got.toString)
    val half = math.round(math.log(0.5) * 1e6) // -693147
    assert(got(1L) == ((4L, 2L, Some(half))), got(1L).toString)
    assert(got(3L) == ((2L, 1L, Some(2 * half))), got(3L).toString)
    // everyone converts at the same instant-day: n = d, S hits 0 -> NULL
    val all = Seq(
      ev(1, "2024-01-01 00:00:00", 1, "signup"),
      ev(2, "2024-01-01 01:00:00", 1, "purchase"),
      ev(3, "2024-01-01 00:00:00", 2, "signup"),
      ev(4, "2024-01-01 02:00:00", 2, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val g2 = EventOps.kmConversion(all).collect()
    assert(g2.length == 1 && g2.head.getLong(0) == 0L &&
      g2.head.getLong(1) == 2L && g2.head.getLong(2) == 2L &&
      g2.head.isNullAt(3), g2.toSeq.toString)
  }

  test("eventsDebounce: bursts collapse to their first event per " +
       "(user, type) stream; cross-type streams never interact") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    def ev(id: Long, t: String, u: Long, typ: String) =
      (id, ts(t), u, typ, 1.0, "{}")
    val e = Seq(
      ev(1, "2024-01-01 00:00:00", 1, "view"),
      ev(2, "2024-01-01 00:00:02", 1, "view"),  // +2s same burst
      ev(3, "2024-01-01 00:00:04", 1, "view"),  // +2s same burst
      ev(4, "2024-01-01 00:00:10", 1, "view"),  // +6s new burst
      ev(5, "2024-01-01 00:00:12", 1, "view"),  // +2s same burst
      ev(6, "2024-01-01 00:00:01", 1, "click")) // other type: own stream
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.eventsDebounce(e).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("view") == ((5L, 2L, 600000L)), got.toString)
    assert(got("click") == ((1L, 1L, 0L)), got.toString)
  }

  test("monthlyChurn: hand-checked month-over-month retention; the last " +
       "observed month is excluded as censored") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    def ev(id: Long, t: String, u: Long) = (id, ts(t), u, "view", 1.0, "{}")
    val e = Seq(
      ev(1, "2024-01-05 00:00:00", 1), ev(2, "2024-02-07 00:00:00", 1),
      ev(3, "2024-01-09 00:00:00", 2),
      ev(4, "2024-02-11 00:00:00", 3))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.monthlyChurn(e).collect()
    assert(got.length == 1, got.toSeq.toString)
    val r = got.head
    assert(r.getDate(0).toString == "2024-01-01" && r.getLong(1) == 2L &&
      r.getLong(2) == 1L && r.getLong(3) == 500000L, r.toString)
  }

  test("markovAttribution: single-channel chain attributes everything to " +
       "it; two-channel chain matches the hand-iterated fixed point") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    def ev(id: Long, t: String, u: Long, typ: String) =
      (id, ts(t), u, typ, 1.0, "{}")
    // 5 users view->purchase, 5 users view->nothing
    val one = ((1L to 5L).flatMap(u => Seq(
      ev(u * 10, "2024-01-01 00:00:00", u, "view"),
      ev(u * 10 + 1, "2024-01-01 01:00:00", u, "purchase"))) ++
      (6L to 10L).map(u => ev(u * 10, "2024-01-01 00:00:00", u, "view")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val g1 = EventOps.markovAttribution(one).collect()
    assert(g1.length == 1)
    val r1 = g1.head
    assert(r1.getString(0) == "view" && r1.getLong(1) == 500000L &&
      r1.getLong(2) == 0L && r1.getLong(3) == 1000000L &&
      r1.getLong(4) == 1000000L, r1.toString)
    // u1 view->purchase, u2 click->purchase, u3 view-> nothing:
    // hand-iterated integer fixed point (see scaladoc arithmetic)
    val two = Seq(
      ev(1, "2024-01-01 00:00:00", 1, "view"),
      ev(2, "2024-01-01 01:00:00", 1, "purchase"),
      ev(3, "2024-01-01 00:00:00", 2, "click"),
      ev(4, "2024-01-01 01:00:00", 2, "purchase"),
      ev(5, "2024-01-01 00:00:00", 3, "view"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val g2 = EventOps.markovAttribution(two).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(g2("view") == ((666667L, 333333L, 500001L, 500001L)), g2.toString)
    assert(g2("click") == ((666667L, 333334L, 499999L, 499999L)), g2.toString)
  }

  test("reactivationRate: win-backs need a gap month AND earlier history; " +
       "consecutive activity and brand-new users never count") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    def ev(id: Long, t: String, u: Long) = (id, ts(t), u, "view", 1.0, "{}")
    val e = Seq(
      // u1: Jan, Feb, Apr -> Apr is a reactivation (gap Mar, history Jan)
      ev(1, "2024-01-05 00:00:00", 1), ev(2, "2024-02-05 00:00:00", 1),
      ev(3, "2024-04-05 00:00:00", 1),
      // u2: Mar, Apr -> Apr is consecutive, not a reactivation
      ev(4, "2024-03-05 00:00:00", 2), ev(5, "2024-04-05 00:00:00", 2),
      // u3: Apr only -> brand new, not a reactivation
      ev(6, "2024-04-05 00:00:00", 3))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.reactivationRate(e).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("2024-04-01") == ((3L, 1L, 333333L)), got.toString)
    assert(got("2024-02-01") == ((1L, 0L, 0L)), got.toString)
    assert(got("2024-03-01") == ((1L, 0L, 0L)), got.toString)
  }

  test("newVsReturning: first-purchase month is NEW, later months are " +
       "RETURNING, and the share replays half-up") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    def p(id: Long, t: String, u: Long, v: Double) =
      (id, ts(t), u, "purchase", v, "{}")
    val e = Seq(
      p(1, "2024-01-10 00:00:00", 1, 10.0),
      p(2, "2024-02-15 00:00:00", 1, 5.0),
      p(3, "2024-02-20 00:00:00", 2, 20.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.newVsReturning(e).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("2024-01-01") == ((1000L, 0L, 1000000L)), got.toString)
    assert(got("2024-02-01") == ((2000L, 500L, 800000L)), got.toString)
  }

  test("dayNRetention: day-N hits count exactly; users whose day-N falls " +
       "past the horizon are not eligible") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    def ev(id: Long, t: String, u: Long) = (id, ts(t), u, "view", 1.0, "{}")
    val e = Seq(
      ev(1, "2024-01-01 00:00:00", 1), ev(2, "2024-01-02 00:00:00", 1),
      ev(3, "2024-01-08 00:00:00", 1),  // u1: active at offsets 0, 1, 7
      ev(4, "2024-01-01 00:00:00", 2),  // u2: day 0 only
      ev(5, "2024-01-29 00:00:00", 3))  // u3: t0 = horizon -> never eligible
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.dayNRetention(e).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1) == ((2L, 1L, 500000L)), got.toString)
    assert(got(7) == ((2L, 1L, 500000L)), got.toString)
    assert(got(14) == ((2L, 0L, 0L)), got.toString)
    assert(got(28) == ((2L, 0L, 0L)), got.toString)
  }

  test("sessionDurationProfile: exact type-1 quantiles over hand-built " +
       "session durations") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // 10 sessions for one user, 2h apart, durations 10s..100s
    val e = (1 to 10).flatMap { k =>
      val st = base + k * 7200000L
      Seq((k * 10L, new java.sql.Timestamp(st), 1L, "view", 1.0, "{}"),
        (k * 10L + 1, new java.sql.Timestamp(st + k * 10000L), 1L, "view", 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.sessionDurationProfile(e).head()
    assert(r.getLong(0) == 10L, r.toString)
    assert(r.getLong(1) == 50L, r.toString)  // rank (10+1) div 2 = 5
    assert(r.getLong(2) == 90L, r.toString)  // rank (90+9) div 10 = 9
    assert(r.getLong(3) == 100L, r.toString) // rank (990+99) div 100 = 10
  }

  test("abConversionZtest: hand-computed pooled z; unanimous arms read " +
       "NULL instead of a division error") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    def ev(id: Long, u: Long, typ: String) =
      (id, ts("2024-01-01 00:00:00"), u, typ, 1.0, "{}")
    // arm0 = even users (all 4 convert), arm1 = odd (2 of 4 convert)
    val e = ((1L to 8L).map(u => ev(u, u, "view")) ++
      Seq(2L, 4L, 6L, 8L, 1L, 3L).zipWithIndex.map { case (u, i) =>
        ev(100L + i, u, "purchase") })
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.abConversionZtest(e).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 4L, 4L, 2L)), r.toString)
    assert(r.getLong(4) == 1000000L && r.getLong(5) == 500000L, r.toString)
    val p = 6.0 / 8.0
    val expZ = math.round(0.5 / math.sqrt(p * (1 - p) * 0.5) * 1e6)
    assert(r.getLong(6) == expZ, s"${r.getLong(6)} vs $expZ")
    assert(!r.getBoolean(7), r.toString) // 1.63 sigma: not significant
    // everyone converts -> zero pooled variance -> NULL, no crash
    val all = ((1L to 4L).map(u => ev(u, u, "view")) ++
      (1L to 4L).map(u => ev(10L + u, u, "purchase")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val ra = EventOps.abConversionZtest(all).head()
    assert(ra.isNullAt(6) && ra.isNullAt(7), ra.toString)
  }

  test("rollingCorr: a perfectly coupled revenue/view series reads 1e6 " +
       "once the window fills; thin windows read NULL") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // day i: one purchase of value i (x = 100*i cents) and i views (y = i)
    val e = (1 to 20).flatMap { i =>
      val day = f"2024-01-$i%02d"
      (1L to i.toLong).map(v =>
        (i * 100L + v, ts(s"$day 01:00:00"), v, "view", 1.0, "{}")) :+
        ((i * 10000L, ts(s"$day 00:00:00"), 99L, "purchase", i * 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.rollingCorr(e).collect()
      .map(r => r.getDate(0).toString ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got("2024-01-13") == None, got.toString)
    assert(got("2024-01-14") == Some(1000000L), got.toString)
    assert(got("2024-01-20") == Some(1000000L), got.toString)
  }

  test("ltvCohortCurve: per-cohort cumulative cents by month offset; " +
       "pre-signup purchases excluded") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    def ev(id: Long, t: String, u: Long, typ: String, v: Double) =
      (id, ts(t), u, typ, v, "{}")
    val e = Seq(
      ev(1, "2024-01-05 00:00:00", 1, "signup", 0.0),
      ev(2, "2024-01-20 00:00:00", 1, "purchase", 10.0),
      ev(3, "2024-02-10 00:00:00", 1, "purchase", 5.0),
      ev(4, "2024-01-01 00:00:00", 1, "purchase", 99.0)) // pre-signup: excluded
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.ltvCohortCurve(e).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      ("2024-01-01", 0L) -> ((1000L, 1000L)),
      ("2024-01-01", 1L) -> ((500L, 1500L))), got.toString)
  }

  test("discountElasticity: a perfect linear relation reads r = 1e6 and " +
       "the exact slope in quantity-per-permille micros") {
    import spark.implicits._
    val li = Seq((0.000, 1.0), (0.100, 2.0), (0.200, 3.0))
      .toDF("l_discount", "l_quantity")
    val r = EventOps.discountElasticity(li).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 1000000L, r.toString)
    assert(r.getLong(2) == 10000L, r.toString) // 1 unit per 100 permille
  }

  test("forecastBacktest: naive scores the +1-day ramp at its slope, " +
       "seasonal-naive at the 7-day gap; heads excluded per predictor") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val e = (1 to 9).map(i =>
      (i.toLong, ts(f"2024-01-0$i%01d 00:00:00"), 1L, "purchase", i * 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.forecastBacktest(e).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("naive") == ((8L, 100L, 100L)), got.toString)
    assert(got("seasonal_naive") == ((2L, 700L, 700L)), got.toString)
  }

  test("holtForecast: a perfectly linear series is learned exactly " +
       "(in-sample MAE 0 vs naive = the slope); forecasts extrapolate " +
       "the trend") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // daily cents 100, 120, 140, 160: init l=120 b=20; every one-step
    // forecast l+b hits y exactly, l/b stay (y, 20) through fdiv10
    val e = (1 to 4).map(i =>
      (i.toLong, ts(f"2024-01-0$i%01d 00:00:00"), 1L, "purchase", 0.80 + i * 0.20, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.holtForecast(e).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 160L, 20L)), r.toString)
    assert((r.getLong(3), r.getLong(4)) == ((180L, 300L)), r.toString)
    assert(r.getLong(5) == 0L, "holt learns the line exactly: " + r)
    assert(r.getLong(6) == 20L, "naive lags by one slope step: " + r)
    // under 3 days there is no recursion to run — zero rows, no crash
    val tiny = e.limit(2)
    assert(EventOps.holtForecast(tiny).count() == 0L)
  }

  test("holtWintersForecast: a pure weekly sawtooth is learned exactly " +
       "(in-sample MAE 0, level/trend/seasonals at fixed point); naive " +
       "pays the weekly jump") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // 4 weeks of 1.00..7.00 dollars: l0 = 400 cents, sv = [-300..300],
    // b = 0 — every recursion step reproduces the state exactly
    val e = (0 until 28).map { i =>
      (i.toLong + 1, ts(f"2024-01-${i + 1}%02d 00:00:00"), 1L, "purchase",
        (i % 7 + 1) * 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.holtWintersForecast(e).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((28L, 400L, 0L)), r.toString)
    // next slot is 28 % 7 = 0 → the 100-cent weekday
    assert(r.getLong(3) == 100L, r.toString)
    assert(r.getLong(4) == 600L, r.toString)
    assert(r.getLong(5) == 0L, "HW learns the sawtooth exactly: " + r)
    // naive: +100 six times, -600 once per week over 21 scored steps
    assert(r.getLong(6) == 171L, r.toString)
    // under 8 days there is no seasonal init — zero rows, no crash
    assert(EventOps.holtWintersForecast(e.limit(6)).count() == 0L)
  }

  test("shapleyAttribution: hand-computed two-channel game; shares sum to " +
       "v(full) - v(empty) (efficiency axiom)") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    def ev(id: Long, t: String, u: Long, typ: String) =
      (id, ts(t), u, typ, 1.0, "{}")
    // v({view}) = 1/2, v({click}) = 1, v({view,click}) = 1, v(empty) = 0:
    // phi_view = (0.5 + 0)/2 = 0.25; phi_click = (1 + 0.5)/2 = 0.75
    val e = Seq(
      ev(1, "2024-01-01 00:00:00", 1, "view"), ev(2, "2024-01-01 01:00:00", 1, "purchase"),
      ev(3, "2024-01-01 00:00:00", 2, "click"), ev(4, "2024-01-01 01:00:00", 2, "purchase"),
      ev(5, "2024-01-01 00:00:00", 3, "view"), ev(6, "2024-01-01 00:30:00", 3, "click"),
      ev(7, "2024-01-01 01:00:00", 3, "purchase"),
      ev(8, "2024-01-01 00:00:00", 4, "view"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.shapleyAttribution(e).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("view" -> 250000L, "click" -> 750000L), got.toString)
  }

  test("ljungBox: Q matches the integer formula recomputed from the ACF " +
       "frame, and a strongly autocorrelated series rejects white noise") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // 30 days of a rising ramp: heavy positive autocorrelation
    val e = (1 to 30).map(i =>
      (i.toLong, ts(f"2024-01-$i%02d 00:00:00"), 1L, "purchase", i * 10.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val acf = EventOps.revenueAcf(e).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    val n = 30L
    val expQ = (1 to 7).map { k =>
      val r = BigInt(acf(k))
      ((r * r * n * (n + 2) + BigInt((n - k) * 500000L)) /
        BigInt((n - k) * 1000000L)).toLong
    }.sum
    val got = EventOps.ljungBox(e).head()
    assert(got.getLong(0) == 30L && got.getInt(1) == 7)
    assert(got.getLong(2) == expQ, s"${got.getLong(2)} vs $expQ")
    assert(got.getBoolean(3), "ramp must reject white noise")
  }

  test("latenessProfile: on-time events land in bucket 0, a late event " +
       "buckets by its gap behind the high-water mark, shares sum to 1e6") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    def ev(id: Long, t: String) = (id, ts(t), 1L, "view", 1.0, "{}")
    val e = Seq(
      ev(1, "2024-01-01 10:00:00"),          // first: on time by definition
      ev(2, "2024-01-01 11:00:00"),          // new max: on time
      ev(3, "2024-01-01 10:59:30"),          // 30 s late -> bucket 1
      ev(4, "2024-01-01 10:30:00"),          // 30 min late -> bucket 2
      ev(5, "2023-12-30 11:00:00"))          // ~2 days late -> bucket 4
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.latenessProfile(e).collect()
      .map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(0)._1 == 2L && got(0)._2 == 0L, got.toString)
    assert(got(1) == ((1L, 30L * 1000000L, 200000L)), got.toString)
    assert(got(2)._1 == 1L && got(2)._2 == 1800L * 1000000L)
    assert(got(4)._1 == 1L, got.toString)
    assert(got.values.map(_._3).sum == 1000000L, "shares are half-up ppm")
  }

  test("rollingRegressionSlope: a perfectly linear revenue ramp reads the " +
       "exact slope; the first month has no slope (den = 0)") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // months 2024-01..06, revenue 100, 200, ... 600 dollars
    val e = (1 to 6).map(m =>
      (m.toLong, ts(f"2024-$m%02d-15 00:00:00"), 1L, "purchase", m * 100.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.rollingRegressionSlope(e).collect().sortBy(_.getDate(0).toString)
    assert(got.head.isNullAt(3), "single-point window has no slope")
    // all later windows see the exact 10000 cents/month ramp
    got.tail.foreach { r =>
      assert(r.getLong(3) == 10000L * 1000000L, r.toString) }
    assert(got.last.getLong(2) == 6L, "trailing window caps at 6 months")
  }

  test("abSrmCheck: an exact parity split reads z = 0 and no SRM; a " +
       "lopsided assignment trips the 3-sigma gate") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val even = (1L to 100L).map(u => (u, ts, u, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.abSrmCheck(even).head()
    assert(r.getLong(0) == 100L && r.getLong(1) == 50L)
    assert(r.getLong(2) == 0L && !r.getBoolean(3), r.toString)
    // 90 even vs 10 odd users: z = (180-100)/10 = 8 sigma
    val skewed = ((1L to 90L).map(_ * 2) ++ (1L to 10L).map(_ * 2 - 1))
      .zipWithIndex.map { case (u, i) => ((i + 1).toLong, ts, u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rs = EventOps.abSrmCheck(skewed).head()
    assert(rs.getLong(2) == 8000000L && rs.getBoolean(3), rs.toString)
  }

  test("hurstExponent: a deterministic alternating series is strongly " +
       "mean-reverting (H well below 0.5) with full blocks at every size") {
    import spark.implicits._
    // 128 days alternating +/-: R/S stays ~constant as s grows -> H ~ 0
    val e = (0 until 128).map { i =>
      ((i + 1).toLong,
        java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)
          .atStartOfDay()),
        1L, "purchase", if (i % 2 == 0) 100.0 else 200.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.hurstExponent(e).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got.keySet == Set(8, 16, 32, 64), got.toString)
    assert(got(8)._1 == 16L && got(64)._1 == 2L, "full blocks only")
    val h = got(8)._2.get
    assert(h == got(64)._2.get, "one H statistic replicated per row")
    assert(h < 200000L, s"alternating series must read far below H=0.5: $h")
  }

  test("pageHinkley: a level shift makes ph rise from 0; the statistic " +
       "replays the hand-computed first steps") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val e = (Seq.fill(10)(100.0) ++ Seq.fill(5)(200.0)).zipWithIndex.map {
      case (v, i) => ((i + 1).toLong,
        ts(f"2024-01-${i + 1}%02d 00:00:00"), 1L, "purchase", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.pageHinkley(e).collect().sortBy(_.getDate(0).toString)
    // flat prefix: every term is 0, ph stays 0
    assert(got.take(10).forall(r => r.getLong(3) == 0L), "flat series: ph = 0")
    // day 11: x = 20000c, running mean = (10*10000+20000)/11 -> term > 0
    assert(got(10).getLong(3) > 0L, got(10).toString)
    // ph is nondecreasing through the shifted tail (mean lags the level)
    val tail = got.drop(10).map(_.getLong(3))
    assert(tail.zip(tail.tail).forall { case (a, b) => b >= a }, tail.toSeq.toString)
  }

  test("seasonalDecompose: components reassemble the series exactly, " +
       "edge days without a full MA window are excluded, and a pure " +
       "weekly pattern lands in the seasonal term") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // 28 days: constant 100 + a +70 spike every 7th day (one weekday)
    val e = (1 to 28).map { i =>
      val v = if (i % 7 == 0) 170.0 else 100.0
      (i.toLong, ts(f"2024-01-$i%02d 00:00:00"), 1L, "purchase", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.seasonalDecompose(e).collect().sortBy(_.getDate(0).toString)
    assert(got.length == 22, "28 days minus 3 at each edge")
    // exact reassembly is structural: cents = trend + seasonal + residual
    assert(got.forall(r =>
      r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4)), "additivity")
    // every full window holds exactly one spike -> flat trend = 110
    assert(got.forall(_.getLong(2) == 11000L), got.map(_.getLong(2)).toSeq.toString)
    // the spike weekday carries the positive seasonal, residuals ~ 0
    assert(got.forall(r => math.abs(r.getLong(4)) <= 1L),
      "pure weekly pattern leaves no residual")
    assert(got.count(_.getLong(3) > 0L) > 0 &&
      got.filter(_.getLong(3) > 0L).forall(_.getLong(1) == 17000L))
  }

  test("stlStrength: a pure weekly pattern reads full seasonal strength " +
       "and zero trend; a clean linear ramp reads the reverse") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    def ev(rows: Seq[(Int, Double)]) = rows.map { case (i, v) =>
      (i.toLong, ts(f"2024-01-$i%02d 00:00:00"), 1L, "purchase", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val weekly = EventOps.stlStrength(
      ev((1 to 28).map(i => (i, if (i % 7 == 0) 170.0 else 100.0)))).head()
    assert(weekly.getLong(1) == 0L, "flat trend: " + weekly)
    assert(weekly.getLong(2) == 1000000L, "pure seasonality: " + weekly)
    val ramp = EventOps.stlStrength(
      ev((1 to 28).map(i => (i, 100.0 + 10.0 * i)))).head()
    assert(ramp.getLong(1) == 1000000L, "pure trend: " + ramp)
    assert(ramp.getLong(2) == 0L, "no seasonality: " + ramp)
  }

  test("cupedAdjustment: when pre perfectly predicts post, theta is the " +
       "exact slope, both arms adjust to the same mean, and variance " +
       "reduction is total") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // user u: u views before the cutoff, one purchase of u dollars after
    val rows = (1 to 8).flatMap { u =>
      (1 to u).map(k => (u * 100L + k, ts(f"2024-01-${k}%02d 01:00:00"),
        u.toLong, "view", 0.0, "{}")) :+
        ((u * 100L + 99L, ts("2024-01-20 00:00:00"), u.toLong, "purchase",
          u.toDouble, "{}"))
    }
    val got = EventOps.cupedAdjustment(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // y = 100u cents, x = u views -> theta = 100 cents/view exactly
    assert(got(0L).getLong(2) == 100000000L, got(0L).toString)
    // arm means 500 vs 400 cents converge to 450 after adjustment
    assert(got(0L).getLong(3) == 500000L && got(1L).getLong(3) == 400000L)
    assert(got(0L).getLong(4) == 450000L && got(1L).getLong(4) == 450000L)
    assert(got(0L).getLong(5) == 1000000L, "perfect predictor: full reduction")
  }

  test("diffInDiff: a planted treatment lift on parallel trends reads " +
       "the exact effect; identical arms read DiD = 0") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // arms share a +200c time trend; odd users (arm 1) get +300c extra
    // post. Per-arm noise (u mod 4) keeps cell variances positive.
    def purch(id: Long, u: Long, day: Int, v: Double) =
      (id, ts(f"2024-01-$day%02d 00:00:00"), u, "purchase", v, "{}")
    val rows = (1 to 8).flatMap { u =>
      val noise = (u % 4).toDouble
      val lift = if (u % 2 == 1) 3.0 else 0.0
      Seq(purch(u * 10L, u.toLong, 5, 1.0 + noise),
        purch(u * 10L + 1, u.toLong, 20, 3.0 + noise + lift))
    }
    val r = EventOps.diffInDiff(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")).head()
    assert(r.getLong(0) == 16L && r.getLong(1) == 4L, r.toString)
    assert(r.getLong(2) == 300000L, "planted 300c lift in milli-cents: " + r)
    assert(!r.isNullAt(3) && r.getLong(3) > 0L, "positive SE: " + r)
    // var_sum = 4 * (13333.3/4) cents^2 -> SE = 115.47c, t = 2.598
    assert(r.getLong(3) == 115470L, r.toString)
    assert(r.getLong(4) == 2598076L, r.toString)
  }

  test("funnelStageZtest: both transitions report arm counts that " +
       "conserve the funnel, and a balanced fixture reads z = 0") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // 4 users sign up; users 1,2 click; user 1 purchases; mirrored so
    // both arms behave identically -> z exactly 0 on transition 1->2
    val rows = (1 to 4).flatMap { u =>
      Seq((u * 10L, ts("2024-01-01 00:00:00"), u.toLong, "signup", 0.0, "{}")) ++
        (if (u <= 2) Seq((u * 10L + 1, ts("2024-01-02 00:00:00"), u.toLong, "click", 0.0, "{}")) else Nil) ++
        (if (u == 1) Seq((u * 10L + 2, ts("2024-01-03 00:00:00"), u.toLong, "purchase", 1.0, "{}")) else Nil)
    }
    val got = EventOps.funnelStageZtest(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().map(r => r.getString(0) -> r).toMap
    val t12 = got("1->2")
    assert(t12.getLong(1) == 2L && t12.getLong(3) == 2L, t12.toString)
    assert(t12.getLong(2) == 1L && t12.getLong(4) == 1L, t12.toString)
    assert(t12.getLong(5) == 0L, "balanced arms: z = 0: " + t12)
    val t23 = got("2->3")
    assert(t23.getLong(1) + t23.getLong(3) == 2L, "clickers carry forward: " + t23)
  }

  test("itemRecHitrate: co-purchase structure recovers the held-out item; " +
       "a user with unrelated items misses; single-item users are excluded") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    // holdouts must DIFFER across users or the held-out item vanishes
    // from all training: u1 {1,2,3} holds 3 (train 1,2); u2 {1,2,3,4}
    // holds 4 but TRAINS on 3, so 3 survives into the neighbor lists;
    // u3 {2,3} holds 3; u4 {9,1} holds an item nobody trains on;
    // u5 single item -> excluded
    def ev(id: Long, u: Long, item: Int) =
      (id, ts, u, "view", 0.0, s"""{"k":$item}""")
    val rows = Seq(
      ev(1, 1, 1), ev(2, 1, 2), ev(3, 1, 3),
      ev(4, 2, 1), ev(5, 2, 2), ev(6, 2, 3), ev(7, 2, 4),
      ev(8, 3, 2), ev(9, 3, 3),
      ev(10, 4, 9), ev(11, 4, 1),
      ev(12, 5, 7))
    val r = EventOps.itemRecHitrate(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")).head()
    assert(r.getInt(0) == 3, r.toString)
    assert(r.getLong(1) == 4L, "users 1-4 evaluated, 5 excluded: " + r)
    // u1 hit (3 in item 1/2's lists via u2's train pairs), u3 hit
    // (3 in item 2's list), u2 miss (4 trained by nobody), u4 miss
    assert(r.getLong(2) == 2L, r.toString)
    assert(r.getLong(3) == 500000L, r.toString)
  }
}
