package graft

import org.apache.spark.sql.functions._
import graft.operators.ScaleOps
import graft.functions.TopKAggregator
import graft.streaming.Sessionize

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero Exchange (co-located sort-merge)") {
    val left = (1L to 200L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 200L).map(i => (i, s"r$i")).toDF("k", "rv")
    ScaleOps.writeBucketed(left, "bspec_left", "k", 4)
    ScaleOps.writeBucketed(right, "bspec_right", "k", 4)
    // disable broadcast so the join would otherwise need a shuffle exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bspec_left").join(spark.table("bspec_right"), "k")
      assert(joined.count() == 200)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE bspec_left"); spark.sql("DROP TABLE bspec_right")
    }
  }

  test("saltedJoin produces exactly the rows of the plain join") {
    // skew: one hot key with many rows
    val skewed = ((1L to 500L).map(_ => (1L, "hot")) ++ Seq((2L, "cold"), (3L, "cold")))
      .toDF("k", "v")
    val dim = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("k", "name")
    val plain = skewed.join(dim, "k").groupBy("k").count()
      .as[(Long, Long)].collect().toMap
    val salted = ScaleOps.saltedJoin(skewed, dim, "k", salt = 8).groupBy("k").count()
      .as[(Long, Long)].collect().toMap
    assert(salted == plain && plain == Map(1L -> 500L, 2L -> 1L))
  }

  test("saltedJoin splits the hot key's straggler partition (90%-one-key skew)") {
    // 90% of rows share one key: the plain equi-join hashes every hot row
    // into ONE shuffle partition (the straggler task at cluster scale);
    // salting spreads them across ~salt partitions. Assert on physical
    // partition row counts, not just output equivalence.
    val hotN = 9000
    val skewed = ((1 to hotN).map(_ => (1L, "hot")) ++
      (1 to 1000).map(i => ((i % 50) + 2L, "cold"))).toDF("k", "v")
    val dim = (1L to 60L).map(i => (i, s"d$i")).toDF("k", "name")
    // freeze the physical layout: no broadcast (keep a real shuffle join),
    // no AQE (it would coalesce/re-split partitions and hide the effect),
    // and enough shuffle partitions that (key, salt) combos don't all
    // collide (the suite default is 4 for speed)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      def maxPartitionRows(df: org.apache.spark.sql.DataFrame): Int =
        df.rdd.mapPartitions(it => Iterator(it.size)).collect().max
      val plainMax = maxPartitionRows(skewed.join(dim, "k"))
      val saltedMax = maxPartitionRows(ScaleOps.saltedJoin(skewed, dim, "k", salt = 16))
      assert(plainMax >= hotN, s"plain join should stack the hot key in one partition, max=$plainMax")
      assert(saltedMax <= hotN / 4,
        s"salted join should split the hot key ~16 ways, max=$saltedMax vs plain $plainMax")
    } finally {
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }

  test("asOfJoinBanded equals asOfJoin: hot key, cross-band carry, null leading bands") {
    import graft.operators.RelationalOps
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rnd = new scala.util.Random(7)
    // left events span Jan..Jun; right rows are sparse (three in total), so
    // most bands have NO right row and every fill crosses band boundaries;
    // January rows precede any right row and must stay null
    val left = (1 to 500).map { i =>
      val u = if (i % 10 == 0) 2L else 1L
      (i.toLong, u, ts(f"2024-${1 + rnd.nextInt(6)}%02d-${1 + rnd.nextInt(28)}%02d 10:00:00"))
    }.toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts("2024-02-15 00:00:00"), 100.0),
      (1L, ts("2024-05-01 00:00:00"), 200.0),
      (2L, ts("2024-03-10 00:00:00"), 300.0)).toDF("user_id", "ts", "score")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "asof_score").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val base = res(RelationalOps.asOfJoin(left, right, Seq("user_id"), "ts", Seq("score")))
    val banded = res(RelationalOps.asOfJoinBanded(left, right, Seq("user_id"), "ts",
      Seq("score"), c => date_trunc("month", c)))
    assert(banded == base)
    assert(base.values.exists(_.isEmpty), "fixture must include pre-first-signup rows")
  }

  test("asOfJoinBanded splits the hot key's window partition across time bands") {
    import graft.operators.RelationalOps
    // 90%-one-key skew: the plain as-of join sorts ALL of user 1's rows in
    // one window partition (the straggler); banding by month splits them
    // ~6 ways. Same physical-layout freeze as the saltedJoin test.
    val hotN = 9000
    def ts(m: Int, d: Int) = java.sql.Timestamp.valueOf(f"2024-$m%02d-$d%02d 10:00:00")
    val left = ((1 to hotN).map(i => (i.toLong, 1L, ts(1 + i % 6, 1 + i % 28))) ++
      (1 to 500).map(i => (hotN + i.toLong, 2L + (i % 20), ts(1 + i % 6, 1 + i % 28))))
      .toDF("event_id", "user_id", "ts")
    val right = (0 until 40).map(i => (1L + (i % 20), ts(1 + i % 6, 1), i * 1.0))
      .toDF("user_id", "ts", "score")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      def maxPartitionRows(df: org.apache.spark.sql.DataFrame): Int =
        df.rdd.mapPartitions(it => Iterator(it.size)).collect().max
      val plainMax = maxPartitionRows(
        RelationalOps.asOfJoin(left, right, Seq("user_id"), "ts", Seq("score")))
      val bandedMax = maxPartitionRows(
        RelationalOps.asOfJoinBanded(left, right, Seq("user_id"), "ts", Seq("score"),
          c => date_trunc("month", c)))
      assert(plainMax >= hotN,
        s"plain as-of should stack the hot key in one partition, max=$plainMax")
      assert(bandedMax <= hotN / 3,
        s"banded as-of should split the hot key ~6 ways, max=$bandedMax vs plain $plainMax")
    } finally {
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }

  test("bloomPrunedJoin: output equals the plain join, sketch prefilter in the plan") {
    val big = (1L to 2000L).map(i => (i % 100, s"row$i")).toDF("k", "v")
    val small = Seq((1L, "a"), (2L, "b"), (50L, "c")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).collect().map(_.toString).sorted
    val pruned = ScaleOps.bloomPrunedJoin(big, small, "k", expectedItems = 100)
    assert(pruned.collect().map(_.toString).sorted.sameElements(plain))
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"bloom prefilter missing from plan:\n$p")
  }

  test("saltedCount equals plain count per key") {
    val df = ((1L to 300L).map(_ => 7L) ++ (1L to 5L)).toDF("k")
    val plain = df.groupBy("k").count().as[(Long, Long)].collect().toMap
    val salted = ScaleOps.saltedCount(df, "k", 16).as[(Long, Long)].collect().toMap
    assert(salted == plain)
  }

  test("TopKAggregator matches the window top-k, with map-side-sized buffers") {
    val orders = Seq(
      (1L, 1L, 100.0), (2L, 1L, 100.0), (3L, 1L, 100.0), (4L, 1L, 50.0),
      (5L, 2L, 10.0), (6L, 2L, 20.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val windowed = graft.operators.RelationalOps.topKOrdersPerCustomer(orders, 3)
      .select($"o_custkey", $"o_orderkey").as[(Long, Long)].collect().toSet
    val agg = new TopKAggregator(3)
    val typed = orders.select($"o_totalprice", $"o_orderkey", $"o_custkey")
      .as[(Double, Long, Long)]
      .groupByKey(_._3)
      .mapValues(r => (r._1, r._2))
      .agg(agg.toColumn.name("topk"))
      .flatMap { case (cust, topk) => topk.map { case (_, id) => (cust, id) } }
      .collect().toSet
    assert(typed == windowed)
  }

  test("sessionization over a real stream: state persists across micro-batches, timeout closes sessions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    val withWm = mem.toDS().withWatermark("ts", "0 seconds")
    val q = Sessionize.sessions(withWm, gapMs = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("sess_stream").outputMode("append").start()
    try {
      // batch 1: two events in one session
      mem.addData(
        Sessionize.Event(1L, ts("2024-01-01 10:00:00"), "view"),
        Sessionize.Event(1L, ts("2024-01-01 10:10:00"), "click"))
      q.processAllAvailable()
      assert(spark.table("sess_stream").count() == 0) // session still open
      // batch 2: event far past the gap → watermark advances, timeout fires,
      // old session closes and the new one opens
      mem.addData(Sessionize.Event(1L, ts("2024-01-01 13:00:00"), "view"))
      q.processAllAvailable()
      mem.addData(Sessionize.Event(1L, ts("2024-01-01 15:00:00"), "view"))
      q.processAllAvailable()
      val got = spark.table("sess_stream").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(3))).toSet
      assert(got.contains((1L, "2024-01-01 10:00:00.0", 2L))) // first session closed with both events
    } finally q.stop()
  }

  test("streaming funnel: out-of-order stage arrival still counts (deferred finalization), " +
       "batch parity exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Funnel
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // THE disorder case an incremental stage machine gets wrong: the
    // click ARRIVES before the earlier-timestamped signup
    val evs = Seq(
      Funnel.Event(1L, ts("2024-01-01 10:00:00"), "click"),
      Funnel.Event(1L, ts("2024-01-01 09:00:00"), "signup"),
      Funnel.Event(1L, ts("2024-01-01 11:00:00"), "purchase"),
      Funnel.Event(2L, ts("2024-01-01 09:30:00"), "click")) // click with no signup: stage 0
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Funnel.Event]
    // the 2 h watermark DELAY is what admits the late signup: disorder
    // tolerance in this design is exactly the watermark allowance (a
    // 0-second watermark would drop the 09:00 signup once the 10:00
    // click has advanced event time — late-row filtering happens before
    // the state handler ever sees the row)
    val q = Funnel.funnel(mem.toDS().withWatermark("ts", "2 hours"), quietMs = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("funnel_stream").outputMode("append").start()
    try {
      mem.addData(evs(0)); q.processAllAvailable() // click first (arrival order)
      mem.addData(evs(1), evs(2), evs(3)); q.processAllAvailable()
      assert(spark.table("funnel_stream").count() == 0, "nothing finalizes before quiet")
      // watermark pusher: unrelated user far in the future fires the timeouts
      mem.addData(Funnel.Event(99L, ts("2024-01-02 00:00:00"), "view"))
      q.processAllAvailable()
      val got = spark.table("funnel_stream").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == Map(1L -> 3, 2L -> 0),
        s"user 1 completes despite disorder; clicks without signup stay stage 0: $got")
    } finally q.stop()
    // batch parity on the same events
    val batch = Funnel.funnel(evs.toDS()).collect().map(r => r.user_id -> r.stage).toMap
    assert(batch == Map(1L -> 3, 2L -> 0))
  }

  test("ANALYZE column stats + CBO flip a filtered dim join to broadcast") {
    // The catalog-statistics loop a warehouse deployment runs: without
    // column stats Spark sizes a FILTERED dimension at its full file
    // size (the filter's selectivity is unknowable), plans a sort-merge
    // join, and shuffles the fact side; after ANALYZE ... FOR ALL
    // COLUMNS, CBO's NDV-based selectivity shrinks the estimate under
    // the broadcast threshold and the same query broadcasts. At 100 TB
    // this single flip is often the difference between a dashboard
    // query and a cluster-wide shuffle — stats collection IS part of
    // the engine surface, not an ops afterthought.
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024).toString)
      spark.conf.set("spark.sql.adaptive.enabled", "false") // isolate CBO from AQE re-planning
      val pad = "x" * 60
      (0 until 20000).map(i => (i.toLong, i % 500, s"$pad$i"))
        .toDF("k", "sel", "payload")
        .write.mode("overwrite").saveAsTable("cbo_dim")
      (0 until 20000).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
        .write.mode("overwrite").saveAsTable("cbo_fact")
      val q = "SELECT f.k, f.v FROM cbo_fact f JOIN cbo_dim d ON f.k = d.k WHERE d.sel = 7"
      val before = spark.sql(q).queryExecution.executedPlan.toString
      assert(before.contains("SortMergeJoin") && !before.contains("BroadcastHashJoin"),
        s"without column stats the filtered dim must NOT look broadcastable:\n$before")
      spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS FOR ALL COLUMNS")
      val after = spark.sql(q).queryExecution.executedPlan.toString
      assert(after.contains("BroadcastHashJoin"),
        s"NDV-based selectivity should shrink the dim under the threshold:\n$after")
    } finally {
      spark.sql("DROP TABLE IF EXISTS cbo_dim")
      spark.sql("DROP TABLE IF EXISTS cbo_fact")
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("flatMapGroupsWithState sessionization: gap splits, counts, batch flush") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val evs = Seq(
      Sessionize.Event(1L, ts("2024-01-01 10:00:00"), "view"),
      Sessionize.Event(1L, ts("2024-01-01 10:10:00"), "click"),
      Sessionize.Event(1L, ts("2024-01-01 12:00:00"), "view"), // > 30min gap → new session
      Sessionize.Event(2L, ts("2024-01-01 09:00:00"), "view")).toDS()
    val got = Sessionize.sessions(evs, gapMs = 30 * 60 * 1000).collect()
      .map(s => (s.user_id, s.session_start.toString, s.n_events)).toSet
    assert(got == Set(
      (1L, "2024-01-01 10:00:00.0", 2L),
      (1L, "2024-01-01 12:00:00.0", 1L),
      (2L, "2024-01-01 09:00:00.0", 1L)))
  }
}
