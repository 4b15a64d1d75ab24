package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.RelationalOps

class RelationalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("topKOrdersPerCustomer: exactly k rows per customer, ties broken by orderkey") {
    val orders = Seq(
      (1L, 1L, 100.0), (2L, 1L, 100.0), (3L, 1L, 100.0), (4L, 1L, 50.0),
      (5L, 2L, 10.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val top = RelationalOps.topKOrdersPerCustomer(orders, 3)
    val c1 = top.filter($"o_custkey" === 1L).select("o_orderkey").as[Long].collect().sorted
    assert(c1.toSeq == Seq(1L, 2L, 3L)) // equal prices → lowest orderkeys win deterministically
    assert(top.filter($"o_custkey" === 2L).count() == 1)
  }

  test("asOfLastSignup: picks most recent signup at-or-before each purchase") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), "signup", 0.0, ""),
      (2L, 10L, ts("2024-01-02 00:00:00"), "purchase", 1.0, ""),
      (3L, 10L, ts("2024-01-03 00:00:00"), "signup", 0.0, ""),
      (4L, 10L, ts("2024-01-04 00:00:00"), "purchase", 1.0, ""),
      // purchase exactly at signup ts → inclusive bound
      (5L, 20L, ts("2024-01-05 00:00:00"), "signup", 0.0, ""),
      (6L, 20L, ts("2024-01-05 00:00:00"), "purchase", 1.0, ""),
      // purchase with no prior signup → NULL
      (7L, 30L, ts("2024-01-06 00:00:00"), "purchase", 1.0, ""))
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val got = RelationalOps.asOfLastSignup(events)
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(2)).map(_.toString)).toMap
    assert(got(2L).contains("2024-01-01 00:00:00.0"))
    assert(got(4L).contains("2024-01-03 00:00:00.0"))
    assert(got(6L).contains("2024-01-05 00:00:00.0"))
    assert(got(7L).isEmpty)
  }

  test("asOfJoin (generic): carries multiple right values, per key, inclusive bound") {
    val quotes = Seq(
      ("AAPL", ts("2024-01-01 10:00:00"), 100.0, 101.0),
      ("AAPL", ts("2024-01-01 11:00:00"), 102.0, 103.0),
      ("MSFT", ts("2024-01-01 10:30:00"), 50.0, 51.0))
      .toDF("symbol", "ts", "bid", "ask")
    val trades = Seq(
      (1L, "AAPL", ts("2024-01-01 10:30:00")),
      (2L, "AAPL", ts("2024-01-01 11:00:00")), // exactly at quote ts → inclusive
      (3L, "MSFT", ts("2024-01-01 10:00:00"))) // before any quote → NULLs
      .toDF("trade_id", "symbol", "ts")
    val got = RelationalOps.asOfJoin(trades, quotes, Seq("symbol"), "ts", Seq("bid", "ask"))
      .collect().map(r => r.getLong(r.fieldIndex("trade_id")) ->
        (Option(r.get(r.fieldIndex("asof_bid"))), Option(r.get(r.fieldIndex("asof_ask"))))).toMap
    assert(got(1L) == (Some(100.0), Some(101.0)))
    assert(got(2L) == (Some(102.0), Some(103.0)))
    assert(got(3L) == (None, None))
  }

  test("set ops: except/intersect are distinct set semantics") {
    val orders = Seq(
      (1L, 1L, "O"), (2L, 1L, "O"), (3L, 1L, "F"),
      (4L, 2L, "O"), (5L, 3L, "F"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus")
      .withColumn("o_totalprice", lit(1.0))
    val exceptRows = RelationalOps.openNotFinishedCustomers(orders).as[Long].collect().toSet
    val intersectRows = RelationalOps.openAndFinishedCustomers(orders).as[Long].collect().toSet
    assert(exceptRows == Set(2L))    // cust 1 has both; cust 2 open-only
    assert(intersectRows == Set(1L))
  }

  test("yoySpend: first year NULL delta, later years exact decimal difference") {
    val orders = Seq(
      (1L, 1L, ts("2020-06-01 00:00:00"), 100.0),
      (2L, 1L, ts("2021-06-01 00:00:00"), 150.5))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val got = RelationalOps.yoySpend(orders)
      .collect().map(r => r.getInt(1) -> Option(r.getDecimal(3)).map(_.toString)).toMap
    assert(got(2020).isEmpty)
    assert(got(2021).contains("50.50"))
  }

  test("rollup includes leaf, subtotal, and grand-total rows") {
    val customer = Seq((1L, "a", 1, 10.0), (2L, "b", 1, 20.0)).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val nation = Seq((1, "N1", 1)).toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((1, "R1")).toDF("r_regionkey", "r_name")
    val got = RelationalOps.customerRollup(customer, nation, region).collect()
    assert(got.length == 3) // (R1,N1), (R1,null), (null,null)
    val grand = got.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    assert(grand.getLong(2) == 2 && grand.getDecimal(3).toString == "30.00")
  }

  test("firstSeenRate: first day all-new, repeat visitors dilute the rate, returning user not re-counted") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 100L, "view", 1.0, "{}"), // same user same day: one active row
      (3L, ts("2024-01-02 09:00:00"), 100L, "view", 1.0, "{}"), // returning
      (4L, ts("2024-01-02 09:30:00"), 200L, "view", 1.0, "{}")) // new on day 2
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = RelationalOps.firstSeenRate(events)
      .collect().map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("2024-01-01") == ((1L, 1L, 1000000L)))
    assert(got("2024-01-02") == ((2L, 1L, 500000L)))
  }

  test("pointInTimeJoin: half-open windows pick exactly the valid version; orphans drop") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val dim = Seq(
      (1L, "bronze", d("2024-01-01"), d("2024-02-01")),
      (1L, "gold", d("2024-02-01"), d("2024-03-01")),
      (2L, "silver", d("2024-01-15"), d("2024-02-15")))
      .toDF("k", "tier", "valid_from", "valid_to")
    val facts = Seq(
      (10L, 1L, d("2024-01-31")), // last day of v1
      (11L, 1L, d("2024-02-01")), // boundary: half-open → v2
      (12L, 2L, d("2024-02-14")),
      (13L, 2L, d("2024-03-01"))) // outside every window → drops
      .toDF("fid", "k", "ts")
    val got = RelationalOps.pointInTimeJoin(facts, dim, Seq("k"), "ts")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == Map(10L -> "bronze", 11L -> "gold", 12L -> "silver"),
      "exactly one version per fact, boundary goes to the NEWER version")
  }

  test("dqExpectations: per-rule violation counts on an engineered dirty table") {
    val parent = Seq(1L, 2L).toDF("pk")
    val dirty = Seq(
      (Some(1L), Some("A"), Some(1L)),
      (Some(1L), Some("B"), Some(2L)),   // dup key 1; B not accepted
      (None, Some("A"), Some(9L)),       // null key; orphan fk 9
      (Some(3L), None, None))            // null status; null fk ignored by relationships
      .toDF("k", "status", "fk")
    val got = RelationalOps.dqExpectations(dirty,
      unique = Seq("k"), notNull = Seq("k"),
      accepted = Seq("status" -> Seq("A")),
      relationships = Seq(("fk", parent, "pk")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got(("unique", "k")) == ((1L, false)), "one duplicated key value")
    assert(got(("not_null", "k")) == ((1L, false)))
    assert(got(("accepted_values", "status")) == ((2L, false)), "B + null both violate")
    assert(got(("relationships", "fk")) == ((1L, false)), "fk 9 orphaned; null fk exempt")
  }

  test("dq severity tier: audit carries severities; quarantine stores exactly " +
       "the error-severity violating rows, warn rows proceed") {
    import RelationalOps.DqRule._
    val parent = Seq(1L, 2L).toDF("pk")
    val dirty = Seq(
      (Some(1L), Some("A"), Some(1L)),
      (Some(1L), Some("B"), Some(2L)),   // dup key 1 (error); B not accepted (warn)
      (None, Some("A"), Some(9L)),       // null key (error); orphan fk 9 (error)
      (Some(3L), None, None))            // null status (warn); null fk exempt
      .toDF("k", "status", "fk")
    val rules = Seq(
      Unique("k"), NotNull("k"),
      AcceptedValues("status", Seq("A"), severity = "warn"),
      Relationship("fk", parent, "pk"))
    val dir = java.nio.file.Files.createTempDirectory("graft-dq-quarantine").toString
    val audit = RelationalOps.dqQuarantine(dirty, rules, dir)
      .collect().map(r => (r.getString(0), r.getString(2)) -> ((r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(audit(("unique", "error")) == ((1L, false)))
    assert(audit(("not_null", "error")) == ((1L, false)))
    assert(audit(("accepted_values", "warn")) == ((2L, false)))
    assert(audit(("relationships", "error")) == ((1L, false)))
    // round trip: quarantined rows are the error-rule violations ONLY
    val q = spark.read.parquet(dir)
    val byRule = q.collect().groupBy(_.getAs[String]("dq_rule"))
      .map { case (r, rows) => r -> rows.map(_.getAs[Any]("k")).toSet }
    assert(byRule("unique") == Set(1L),
      "both members of the dup group share k=1; set collapses to the key")
    assert(q.filter(col("dq_rule") === "unique").count() == 2L,
      "quarantine stores every MEMBER row of a duplicate group")
    assert(byRule("not_null") == Set(null))
    assert(byRule("relationships") == Set(null), "the orphan-fk row has k=null")
    assert(!byRule.contains("accepted_values"), "warn severity must NOT quarantine")
    assert(q.columns.toSet == Set("k", "status", "fk", "dq_rule", "dq_column", "dq_severity"),
      "full table schema preserved for triage")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("upsertByKey: update wins, inserts land, untouched rows preserved") {
    val existing = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "v", "x")
    val updates = Seq((2L, "B2", 22.0), (9L, "new", 99.0)).toDF("k", "v", "x")
    val got = RelationalOps.upsertByKey(existing, updates, Seq("k"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got == Map(
      1L -> (("a", 10.0)), 2L -> (("B2", 22.0)),
      3L -> (("c", 30.0)), 9L -> (("new", 99.0))))
  }

  test("applyCdc: latest sequence wins, tombstones delete, stale " +
       "out-of-order changes are ignored, inserts land") {
    val existing = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "a-new", 2L, "U"),  // wins over the stale seq-1 below
      (1L, "a-stale", 1L, "U"),
      (2L, "ignored", 5L, "D"), // tombstone: key 2 disappears
      (2L, "resurrect", 4L, "U"), // older than the delete -> ignored
      (9L, "inserted", 1L, "I")).toDF("k", "v", "cdc_seq", "cdc_op")
    val got = RelationalOps.applyCdc(existing, changes, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a-new", 3L -> "c", 9L -> "inserted"), s"$got")
    // arrival order must not matter: reversed change feed, same snapshot
    val rev = RelationalOps.applyCdc(existing,
      changes.orderBy(col("cdc_seq").desc), Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rev == got)
  }

  test("mv maintenance: any base/delta split merges to the full recompute, " +
       "and merge order does not matter (algebraic state)") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val orders = Seq(
      (1L, 10L, "O", 10.11, ts("1998-01-05 00:00:00"), "1-URGENT"),
      (2L, 11L, "F", 20.22, ts("1998-01-20 00:00:00"), "2-HIGH"),
      (3L, 10L, "O", 30.33, ts("1998-02-01 00:00:00"), "3-MEDIUM"),
      (4L, 12L, "O", 40.44, ts("1999-03-15 00:00:00"), "2-HIGH"),
      (5L, 13L, "P", 50.55, ts("1999-03-25 00:00:00"), "1-URGENT"),
      (6L, 10L, "F", 60.66, ts("2000-12-31 00:00:00"), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val full = RelationalOps.mvRead(RelationalOps.mvState(orders))
      .collect().map(_.toString).sorted.toSeq

    val Array(a, b, c) = Array(
      orders.filter(col("o_orderkey") <= 2),
      orders.filter(col("o_orderkey") === 3 || col("o_orderkey") === 4),
      orders.filter(col("o_orderkey") >= 5))
    def st(df: org.apache.spark.sql.DataFrame) = RelationalOps.mvState(df)
    val incr = RelationalOps.mvRead(
      RelationalOps.mvMerge(RelationalOps.mvMerge(st(a), st(b)), st(c)))
      .collect().map(_.toString).sorted.toSeq
    val reordered = RelationalOps.mvRead(
      RelationalOps.mvMerge(RelationalOps.mvMerge(st(c), st(a)), st(b)))
      .collect().map(_.toString).sorted.toSeq
    assert(incr == full, s"incremental\n$incr\nvs full\n$full")
    assert(reordered == full, "merge must commute/associate")
    // the split-group case: an odd/even split lands rows of the SAME
    // (status, month) group in different deltas — partial counts/sums
    // must re-add to the exact totals
    val d1 = orders.filter(col("o_orderkey") % 2 === 0)
    val d2 = orders.filter(col("o_orderkey") % 2 === 1)
    val splitMerge = RelationalOps.mvRead(RelationalOps.mvMerge(st(d1), st(d2)))
      .collect().map(_.toString).sorted.toSeq
    assert(splitMerge == full, "groups split across deltas must re-sum exactly")
  }

  test("kAnonymityAudit: equivalence-class histogram with the at-risk " +
       "flag below k") {
    val masked = Seq(
      (100L, "A"), (100L, "A"),          // class of 2
      (200L, "B"),                       // singleton → re-identifiable
      (300L, "A"), (300L, "A"), (300L, "A")) // class of 3
      .toDF("acctbal_band", "c_mktsegment")
    val got = RelationalOps.kAnonymityAudit(masked,
      Seq("acctbal_band", "c_mktsegment"), k = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      1L -> ((1L, 1L, true)), 2L -> ((1L, 2L, true)), 3L -> ((1L, 3L, false))),
      got.toString)
  }

  test("asOfJoinTolerance: fresh match carries value + age; stale match " +
       "keeps age but nulls the value; no match nulls both") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 10L, ts("1995-01-01 09:00:00"), "signup"),
      (2L, 10L, ts("1995-01-03 09:00:00"), "purchase"), // age 2 → fresh
      (3L, 10L, ts("1995-01-20 09:00:00"), "purchase"), // age 19 → stale
      (4L, 77L, ts("1995-01-05 09:00:00"), "purchase")) // no signup at all
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = RelationalOps.asOfLastSignupTolerant(ev).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(2)), Option(r.get(3))))).toMap
    assert(got(2L) == ((Some(ts("1995-01-01 09:00:00")), Some(2))), got(2L).toString)
    assert(got(3L) == ((None, Some(19))), "stale: value nulled, age kept")
    assert(got(4L) == ((None, None)), "unmatched: both null")
  }

  test("tableProfile: one row per column with exact null and distinct " +
       "counts; n_distinct ignores nulls") {
    val df = Seq((Option(1L), "x"), (Option(1L), "y"), (None, "z"))
      .toDF("a", "b")
    val got = RelationalOps.tableProfile(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map("a" -> ((3L, 1L, 1L)), "b" -> ((3L, 0L, 3L))), got.toString)
  }

  test("snapshotDiff: added/removed/changed classified, unchanged rows " +
       "absent, NULL comparisons are null-safe both ways") {
    val old = Seq(
      (1L, Option(10.0), Option("a")),  // unchanged
      (2L, Option(20.0), Option("b")),  // price changes
      (3L, Option(30.0), None),         // null status → value: changed
      (4L, None, Option("d")),          // null price stays null: unchanged
      (5L, Option(50.0), Option("e")))  // removed
      .toDF("k", "price", "status")
    val neu = Seq(
      (1L, Option(10.0), Option("a")),
      (2L, Option(25.0), Option("b")),
      (3L, Option(30.0), Option("c")),
      (4L, None, Option("d")),
      (6L, Option(60.0), Option("f")))  // added
      .toDF("k", "price", "status")
    val got = RelationalOps.snapshotDiff(old, neu, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "changed", 5L -> "removed", 6L -> "added"),
      got.toString)
    // the changed row carries both sides
    val r2 = RelationalOps.snapshotDiff(old, neu, Seq("k"))
      .filter(col("k") === 2L).head()
    assert(r2.getDouble(2) == 20.0 && r2.getDouble(3) == 25.0, r2.toString)
  }

  test("hierarchyRoots: pointer doubling resolves exact depth on a chain " +
       "far deeper than the round count; disjoint trees keep their roots; " +
       "extra rounds are the identity") {
    // one 600-deep chain (node i's parent is i-1; node 0 is the root):
    // 10 doubling rounds cover depth <= 1024, where naive descent needs 600
    val chain = spark.range(0, 601).select(col("id").as("node"),
      greatest(col("id") - 1, lit(0L)).as("parent"))
    val got = RelationalOps.hierarchyRoots(chain, rounds = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got(600L) == ((0L, 600)), got(600L).toString)
    assert(got(0L) == ((0L, 0)) && got(1L) == ((0L, 1)), "root and first child")
    // two disjoint trees: roots never cross
    val forest = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L), (12L, 11L))
      .toDF("node", "parent")
    val f = RelationalOps.hierarchyRoots(forest, rounds = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(f == Map(1L -> ((1L, 0)), 2L -> ((1L, 1)),
      10L -> ((10L, 0)), 11L -> ((10L, 1)), 12L -> ((10L, 2))), f.toString)
    // rounds beyond convergence change nothing (root self-loop = identity)
    val f2 = RelationalOps.hierarchyRoots(forest, rounds = 9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(f2 == f, "extra doubling rounds must be the identity")
  }

  test("hashPartitionBalance: bucket counts conserve rows; a single hot key " +
       "prices the worst case as buckets x the ideal share") {
    // all rows share one key → one occupied bucket holds everything:
    // max/mean against the CONFIGURED 8 buckets = 8e6 ppm exactly
    val hot = Seq.fill(40)(Tuple1(7L)).toDF("user_id")
    val h = RelationalOps.hashPartitionBalance(hot, "user_id", 8).head()
    assert(h.getLong(0) == 1L && h.getLong(1) == 40L, h.toString)
    assert(h.getLong(2) == 40L && h.getLong(3) == 40L, h.toString)
    assert(h.getLong(4) == 8000000L, h.toString)
    // spread keys: rows conserved, min <= max, ratio >= 1e6 (can't beat ideal)
    val spread = (1L to 200L).map(Tuple1(_)).toDF("user_id")
    val s = RelationalOps.hashPartitionBalance(spread, "user_id", 8).head()
    assert(s.getLong(1) == 200L, s.toString)
    assert(s.getLong(2) <= s.getLong(3), s.toString)
    assert(s.getLong(4) >= 1000000L, s.toString)
  }

  test("zorderSpanAudit: rows conserved; a single point spans 1 cell; " +
       "z-buckets bound BOTH dimensions; negative keys wrap sign-safely") {
    val one = Seq((100L, 200L)).toDF("a", "b")
    val g1 = RelationalOps.zorderSpanAudit(one, "a", "b").head()
    // ((1)*1e6 + 32768) div 65536 = 15 ppm on both dimensions
    assert(g1.getLong(1) == 1L && g1.getLong(2) == 15L && g1.getLong(3) == 15L, g1.toString)
    // the bucket is the top-6 bits of the native Morton value
    val expZ = org.apache.spark.sql.graft.InterleaveBits.interleave(100L, 200L)
    assert(g1.getLong(0) == expZ >> 26, g1.toString)
    // a 64x64 grid over the full 16-bit range: every bucket's bounding
    // box must stay well under the full span on BOTH dimensions (the
    // single-key-sorted layout would put ~1e6 on one of them)
    val grid = (for { i <- 0 until 64; j <- 0 until 64 }
      yield (i * 1024L, j * 1024L)).toDF("a", "b")
    val gs = RelationalOps.zorderSpanAudit(grid, "a", "b").collect()
    assert(gs.map(_.getLong(1)).sum == 4096L, "rows conserved")
    gs.foreach { r =>
      assert(r.getLong(2) <= 500000L && r.getLong(3) <= 500000L,
        s"bucket bounding box leaks a dimension: $r") }
    // sign-safe wrap: -1 quantizes to 65535, not -1
    val neg = Seq((-1L, 0L)).toDF("a", "b")
    val gn = RelationalOps.zorderSpanAudit(neg, "a", "b").head()
    assert(gn.getLong(0) == org.apache.spark.sql.graft.InterleaveBits.interleave(65535L, 0L) >> 26,
      gn.toString)
  }

  test("hilbertIndex: the order-16 walk restricted to the origin 4x4 " +
       "subgrid is a bijection onto d in [0,16) with unit-Manhattan " +
       "steps (the Hilbert property Morton lacks)") {
    val xy2d = org.apache.spark.sql.graft.HilbertIndex.xy2d _
    assert(xy2d(0L, 0L) == 0L)
    // self-similarity: the curve fills the origin subquadrant first, so
    // cells [0,4)^2 get exactly d in [0,16)
    val cells = for { x <- 0 until 4; y <- 0 until 4 } yield (x, y, xy2d(x.toLong, y.toLong))
    assert(cells.map(_._3).sorted == (0L until 16L), cells.toString)
    val byD = cells.map(c => c._3 -> ((c._1, c._2))).toMap
    (0L until 15L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"d=$d -> d+1 must be an adjacent cell: ($x1,$y1) -> ($x2,$y2)")
    }
    // Morton on the same subgrid jumps diagonally: d=1 -> d=2 moves
    // (1,0) -> (0,1), Manhattan 2 — the locality gap Hilbert closes
    val mort = org.apache.spark.sql.graft.InterleaveBits.interleave _
    val mByD = (for { x <- 0 until 4; y <- 0 until 4 }
      yield mort(x.toLong, y.toLong) -> ((x, y))).toMap
    val (mx1, my1) = mByD(1L); val (mx2, my2) = mByD(2L)
    assert(math.abs(mx1 - mx2) + math.abs(my1 - my2) == 2)
  }

  test("hilbertSpanAudit: rows conserved; buckets bound BOTH dimensions; " +
       "total bounding-box area is no worse than the Morton layout's on " +
       "a uniform grid") {
    val grid = (for { i <- 0 until 64; j <- 0 until 64 }
      yield (i * 1024L, j * 1024L)).toDF("a", "b")
    val hs = RelationalOps.hilbertSpanAudit(grid, "a", "b").collect()
    assert(hs.map(_.getLong(1)).sum == 4096L, "rows conserved")
    hs.foreach { r =>
      assert(r.getLong(2) <= 500000L && r.getLong(3) <= 500000L,
        s"bucket bounding box leaks a dimension: $r") }
    val zs = RelationalOps.zorderSpanAudit(grid, "a", "b").collect()
    def area(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => r.getLong(2) * r.getLong(3)).sum
    assert(area(hs) <= area(zs),
      s"hilbert total box area ${area(hs)} must not exceed morton ${area(zs)}")
  }

  test("paretoFrontier: dominated points drop, same-x ties keep only the " +
       "best y, exact duplicates both survive, partitioning-invariant") {
    val pts = Seq(
      (1L, 10L, 1L),  // frontier (biggest x)
      (2L, 8L, 5L),   // frontier
      (3L, 8L, 3L),   // same x as 2, lower y -> dominated
      (4L, 5L, 5L),   // dominated by 2 (equal y, smaller x)
      (5L, 3L, 9L),   // frontier
      (6L, 3L, 9L),   // exact duplicate of 5 -> both survive
      (7L, 1L, 2L))   // dominated by everything above
      .toDF("id", "x", "y")
    val got = RelationalOps.paretoFrontier(pts, "id", "x", "y", shards = 4)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 5L, 6L), got.toString)
    val again = RelationalOps.paretoFrontier(pts.repartition(5), "id", "x", "y", shards = 2)
      .select("id").as[Long].collect().toSet
    assert(again == got, "frontier is layout- and shard-count-invariant")
    // brute-force cross-check on a pseudo-random cloud
    val cloud = (1 to 60).map { i =>
      (i.toLong, (i * 37 % 19).toLong, (i * 53 % 17).toLong) }
    val exp = cloud.filter { p => !cloud.exists(q =>
      q._2 >= p._2 && q._3 >= p._3 && (q._2 > p._2 || q._3 > p._3)) }
      .map(_._1).toSet
    val gotCloud = RelationalOps.paretoFrontier(
      cloud.toDF("id", "x", "y"), "id", "x", "y", shards = 8)
      .select("id").as[Long].collect().toSet
    assert(gotCloud == exp, s"got $gotCloud expected $exp")
  }

  test("lDiversityAudit: a k-anonymous but homogeneous class is flagged; " +
       "diverse classes are not; rows conserve") {
    val df = Seq(
      // class (100, "A"): 4 rows, but ALL share nation 7 -> l = 1, at risk
      (100L, "A", 7), (100L, "A", 7), (100L, "A", 7), (100L, "A", 7),
      // class (100, "B"): 3 rows, 3 distinct nations -> l = 3, safe
      (100L, "B", 1), (100L, "B", 2), (100L, "B", 3),
      // class (200, "A"): 2 rows, 2 nations -> l = 2, at risk (< 3)
      (200L, "A", 1), (200L, "A", 2))
      .toDF("acctbal_band", "c_mktsegment", "c_nationkey")
    val got = RelationalOps.lDiversityAudit(df,
      Seq("acctbal_band", "c_mktsegment"), "c_nationkey").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      1L -> ((1L, 4L, true)),
      2L -> ((1L, 2L, true)),
      3L -> ((1L, 3L, false))), got.toString)
  }

  test("openOrdersDaily: balance is cum(opened) - cum(closed); an order " +
       "closes on its LAST ship date; unshipped orders stand forever") {
    import java.sql.Date
    val orders = Seq(
      (1L, Date.valueOf("2024-01-01"), 1L, 10.0),
      (2L, Date.valueOf("2024-01-01"), 2L, 10.0),
      (3L, Date.valueOf("2024-01-02"), 3L, 10.0))
      .toDF("o_orderkey", "o_orderdate", "o_custkey", "o_totalprice")
    val li = Seq(
      (1L, Date.valueOf("2024-01-01")), (1L, Date.valueOf("2024-01-02")),
      (3L, Date.valueOf("2024-01-03")))
      .toDF("l_orderkey", "l_shipdate")
    val got = RelationalOps.openOrdersDaily(orders, li).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("2024-01-01") == ((2L, 0L, 2L)), got.toString)
    assert(got("2024-01-02") == ((1L, 1L, 2L)), got.toString) // o1 closes on LAST ship
    assert(got("2024-01-03") == ((0L, 1L, 1L)), got.toString) // o2 never closes
  }

  test("demandVolatility: steady weekly demand reads CV 0, lumpy demand " +
       "replays the exact moment formula; thin histories are guarded out") {
    import java.sql.Date
    // 8 Mondays; part 1 ships 10/wk (steady), part 2 alternates 2 and 18,
    // part 3 ships only 2 weeks (guarded out at minWeeks = 8)
    val mondays = (0 until 8).map(i => Date.valueOf(java.time.LocalDate
      .parse("2024-01-01").plusWeeks(i).toString))
    val li = (mondays.map(d => (1L, 10.0, d)) ++
      mondays.zipWithIndex.map { case (d, i) =>
        (2L, if (i % 2 == 0) 2.0 else 18.0, d) } ++
      mondays.take(2).map(d => (3L, 5.0, d)))
      .toDF("l_partkey", "l_quantity", "l_shipdate")
    val got = RelationalOps.demandVolatility(li).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(!got.contains(3L), got.toString)
    assert(got(1L) == ((8L, 80L, 0L)), got.toString)
    // part 2: sq = 80, sqq = 4*4 + 4*324 = 1312; sqrt(8*1312 - 6400)/80
    val exp = math.round(math.sqrt((8L * 1312L - 6400L).toDouble) / 80.0 * 1e6)
    assert(got(2L) == ((8L, 80L, exp)), s"${got(2L)} vs $exp")
  }

  test("pricingWaterfall: per-row cent quantization of gross, discount, " +
       "tax, and net bridges exactly") {
    import java.sql.Date
    val li = Seq((100.00, 0.10, 0.05, Date.valueOf("2024-01-15")))
      .toDF("l_extendedprice", "l_discount", "l_tax", "l_shipdate")
    val r = RelationalOps.pricingWaterfall(li).head()
    assert(r.getDate(0).toString == "2024-01-01", r.toString)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((10000L, 1000L, 450L, 9450L)), r.toString)
  }

  test("priceIndexMonthly: matched-basket Laspeyres reads 1e6 at base and " +
       "the exact price relative after") {
    import java.sql.Date
    val li = Seq(
      (1L, 20.00, 10.0, Date.valueOf("2024-01-10")),  // 2.00/unit
      (1L, 15.00, 5.0, Date.valueOf("2024-02-10")))   // 3.00/unit
      .toDF("l_partkey", "l_extendedprice", "l_quantity", "l_shipdate")
    val got = RelationalOps.priceIndexMonthly(li).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("2024-01-01") == ((1L, 1000000L)), got.toString)
    assert(got("2024-02-01") == ((1L, 1500000L)), got.toString)
  }

  test("prioritySla: first-ship-within-7-days share per priority; " +
       "unshipped orders are excluded") {
    import java.sql.Date
    val orders = Seq(
      (1L, "1-URGENT", Date.valueOf("2024-01-01")),
      (2L, "1-URGENT", Date.valueOf("2024-01-01")),
      (3L, "5-LOW", Date.valueOf("2024-01-01"))) // no lineitems
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val li = Seq(
      (1L, Date.valueOf("2024-01-06")),   // 5 days: met
      (1L, Date.valueOf("2024-01-20")),   // later line irrelevant (MIN)
      (2L, Date.valueOf("2024-01-10")))   // 9 days: missed
      .toDF("l_orderkey", "l_shipdate")
    val got = RelationalOps.prioritySla(orders, li).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map("1-URGENT" -> ((2L, 1L, 500000L))), got.toString)
  }

  test("fulfillmentLagProfile: exact rank quantiles over order->last-ship " +
       "lags; unshipped orders drop") {
    import java.sql.Date
    val orders = (1L to 10L).map(k =>
      (k, Date.valueOf("2024-01-01"), k, 1.0)) :+
      ((99L, Date.valueOf("2024-01-01"), 99L, 1.0)) // no lineitems: excluded
    val odf = orders.toDF("o_orderkey", "o_orderdate", "o_custkey", "o_totalprice")
    val li = (1L to 10L).map(k =>
      (k, Date.valueOf(java.time.LocalDate.parse("2024-01-01").plusDays(k).toString)))
      .toDF("l_orderkey", "l_shipdate")
    val r = RelationalOps.fulfillmentLagProfile(odf, li).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((10L, 5L, 9L, 10L)), r.toString)
  }

  test("supplierReturns: return share in ppm and integer-cents revenue " +
       "per supplier") {
    val li = Seq(
      (1L, 10.00, "R"), (1L, 20.00, "N"), (1L, 30.00, "A"),
      (2L, 5.00, "R"))
      .toDF("l_suppkey", "l_extendedprice", "l_returnflag")
    val got = RelationalOps.supplierReturns(li).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((3L, 6000L, 333333L)), got.toString) // (1e6 + 1) div 3
    assert(got(2L) == ((1L, 500L, 1000000L)), got.toString)
  }

  test("concentration8020: top ceil(n/5) customers' spend share, exact " +
       "sharded rank, hand-checked on a 10-customer ramp") {
    import java.sql.Date
    val orders = (1L to 10L).map(c =>
      (c, Date.valueOf("2024-01-01"), c, c * 100.0))
      .toDF("o_orderkey", "o_orderdate", "o_custkey", "o_totalprice")
    val r = RelationalOps.concentration8020(orders).head()
    assert(r.getLong(0) == 10L && r.getLong(1) == 2L, r.toString)
    // top 2 spend 1900 of 5500 -> (19e10 + 275e3) div 55e4 = 345455
    assert(r.getLong(2) == 345455L, r.toString)
  }

  test("rboTopkStability: identical consecutive leaderboards read RBO@10 " +
       "= sum of the pinned weights; disjoint ones read 0") {
    import spark.implicits._
    val d = java.sql.Timestamp.valueOf(_: String)
    // months 1->2 identical top parts; month 3 disjoint from month 2
    def li(pk: Long, month: Int, price: Double) =
      (1L, pk, 1L, 1, 1.0, price, 0.0, 0.0, "N", "O", d(f"2024-$month%02d-10 00:00:00"))
    val rows = (1 to 10).flatMap(i => Seq(
      li(i, 1, 1000.0 - i), li(i, 2, 1000.0 - i), li(i + 100, 3, 1000.0 - i)))
    val lineitem = rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    val got = RelationalOps.rboTopkStability(lineitem).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(2), r.getLong(3)))).toMap
    // identical lists: A_d = d at every depth, so each term is exactly
    // w_d -> rbo = sum of the pinned weights = 651321560 ppb
    assert(got("2024-01-01") == ((10L, 651321560L)), got.toString)
    assert(got("2024-02-01") == ((0L, 0L)), got.toString)
  }

  test("abcXyzMatrix: a dominant steady part classes AX; a tail erratic " +
       "part classes CZ; cell revenue shares are half-up ppm") {
    import spark.implicits._
    val d = java.sql.Timestamp.valueOf(_: String)
    def li(pk: Long, month: Int, qty: Double, price: Double) =
      (1L, pk, 1L, 1, qty, price, 0.0, 0.0, "N", "O", d(f"2024-$month%02d-10 00:00:00"))
    // part 1: 10 steady months x 800 -> A (8000 of 10000 total = 80%), X
    // part 2: two wild months (1 vs 99) of 1000 each -> C, Z-ish CV
    val rows = (1 to 10).map(m => li(1, m, 10.0, 800.0)) ++
      Seq(li(2, 1, 1.0, 1000.0), li(2, 2, 99.0, 1000.0))
    val lineitem = rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    val got = RelationalOps.abcXyzMatrix(lineitem).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(("A", "X")) == ((1L, 800000L)), got.toString)
    // part 2: cv^2 = 2*(1^2+99^2)/(100^2) - 1 = 0.9602 -> Y (<= 1), C class
    assert(got(("C", "Y")) == ((1L, 200000L)), got.toString)
  }

  test("simpsonParadoxScreen: within-group slopes negative while the " +
       "pooled slope is positive -> every group flags as reversed") {
    import spark.implicits._
    val d = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    // brand A at low discounts, brand B at high discounts; within each
    // brand quantity FALLS with discount, but B's level is far higher,
    // so pooled OLS rises
    def li(pk: Long, disc: Double, qty: Double) =
      (1L, pk, 1L, 1, qty, 100.0, disc, 0.0, "N", "O", d)
    val lineitem = (Seq(li(1, 0.00, 10), li(1, 0.01, 9), li(1, 0.02, 8)) ++
      Seq(li(2, 0.08, 100), li(2, 0.09, 99), li(2, 0.10, 98)))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val part = Seq((1L, "p1", "BRAND#A", "t", 1, 1.0), (2L, "p2", "BRAND#B", "t", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val r = RelationalOps.simpsonParadoxScreen(lineitem, part).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L, r.toString)
    assert(r.getLong(2) > 0L, "pooled slope must be positive: " + r)
  }

  test("duplicatePaymentScreen: flags same-customer same-cents pairs " +
       "inside the gap window only, canonicalized a < b") {
    import spark.implicits._
    val d = java.sql.Timestamp.valueOf(_: String)
    val orders = Seq(
      (1L, 7L, "O", 500.00, d("2024-01-01 00:00:00"), "1-URGENT"),
      (2L, 7L, "O", 500.00, d("2024-01-05 00:00:00"), "1-URGENT"), // dup of 1
      (3L, 7L, "O", 500.00, d("2024-03-01 00:00:00"), "1-URGENT"), // outside gap
      (4L, 8L, "O", 500.00, d("2024-01-02 00:00:00"), "1-URGENT"), // other cust
      (5L, 7L, "O", 501.00, d("2024-01-02 00:00:00"), "1-URGENT")) // other amount
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val got = RelationalOps.duplicatePaymentScreen(orders).collect()
    assert(got.length == 1, got.mkString(";"))
    val r = got.head
    assert(r.getLong(1) == 1L && r.getLong(2) == 2L && r.getLong(4) == 4L,
      r.toString)
  }

  test("fkOrphanAudit: clean edges read zero, orphans are counted per " +
       "edge with half-up ppm, duplicate parent keys don't inflate") {
    import spark.implicits._
    val child = Seq(1L, 2L, 3L, 9L).toDF("ck") // 9 has no parent
    val parent = Seq(1L, 1L, 2L, 3L, 4L).toDF("pk") // dup parent key 1
    val clean = Seq(4L).toDF("ck2")
    val got = RelationalOps.fkOrphanAudit(Seq(
      ("child->parent", child, parent),
      ("clean->parent", clean, parent))).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("child->parent") == ((4L, 1L, 250000L)), got.toString)
    assert(got("clean->parent") == ((1L, 0L, 0L)), got.toString)
  }

  test("crostonForecast: steady monthly demand reads rate = size/month, " +
       "a single-demand part reads NULL interval and rate") {
    import spark.implicits._
    val d = Timestamp.valueOf(_: String)
    val rows =
      Seq((10L, d("2024-01-05 00:00:00"), 10.0), (10L, d("2024-02-07 00:00:00"), 10.0),
        (10L, d("2024-03-09 00:00:00"), 10.0),
        (20L, d("2024-02-01 00:00:00"), 7.0))
    val li = rows.toDF("l_partkey", "l_shipdate", "l_quantity")
    val got = RelationalOps.crostonForecast(li).collect()
      .map(r => r.getLong(0) -> r).toMap
    val p10 = got(10L)
    assert(p10.getLong(1) == 3L, p10.toString)
    assert(p10.getLong(2) == 10000L, "steady size smooths to itself: " + p10)
    assert(p10.getLong(3) == 1000L, "unit gaps smooth to 1 month: " + p10)
    assert(p10.getLong(4) == 10000000L, "rate = 10 units/month in ppm: " + p10)
    val p20 = got(20L)
    assert(p20.getLong(1) == 1L && p20.getLong(2) == 7000L, p20.toString)
    assert(p20.isNullAt(3) && p20.isNullAt(4), "one demand: no interval: " + p20)
  }

  test("perfectOrderRate: one late line or one returned line breaks the " +
       "whole order; the failure-mode split attributes each break") {
    import spark.implicits._
    val d = Timestamp.valueOf(_: String)
    val orders = Seq(
      (1L, d("2024-01-01 00:00:00")), // perfect
      (2L, d("2024-01-02 00:00:00")), // one line late
      (3L, d("2024-01-03 00:00:00")), // one line returned
      (4L, d("2024-02-01 00:00:00"))  // next month, perfect
    ).toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      (1L, d("2024-01-10 00:00:00"), "N"), (1L, d("2024-01-20 00:00:00"), "N"),
      (2L, d("2024-01-05 00:00:00"), "N"), (2L, d("2024-03-15 00:00:00"), "N"),
      (3L, d("2024-01-06 00:00:00"), "R"),
      (4L, d("2024-02-10 00:00:00"), "N")
    ).toDF("l_orderkey", "l_shipdate", "l_returnflag")
    val got = RelationalOps.perfectOrderRate(orders, li).collect()
      .map(r => r.getDate(0).toString -> r).toMap
    val jan = got("2024-01-01")
    assert(jan.getLong(1) == 3L && jan.getLong(2) == 1L, jan.toString)
    assert(jan.getLong(3) == 333333L, jan.toString)
    assert(jan.getLong(4) == 333333L && jan.getLong(5) == 333333L, jan.toString)
    assert(got("2024-02-01").getLong(3) == 1000000L, got("2024-02-01").toString)
  }

  test("safetyStock: steady demand needs zero buffer, volatile demand " +
       "sizes z*sigma, single-month parts read NULL") {
    import spark.implicits._
    val d = Timestamp.valueOf(_: String)
    val li = Seq(
      (1L, d("2024-01-05 00:00:00"), 10.0), (1L, d("2024-02-05 00:00:00"), 10.0),
      (1L, d("2024-03-05 00:00:00"), 10.0),
      (2L, d("2024-01-05 00:00:00"), 5.0), (2L, d("2024-02-05 00:00:00"), 15.0),
      (3L, d("2024-01-05 00:00:00"), 7.0)
    ).toDF("l_partkey", "l_shipdate", "l_quantity")
    val got = RelationalOps.safetyStock(li).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(3) == 0L && got(1L).getLong(4) == 0L, got(1L).toString)
    assert(got(1L).getAs[Long]("reorder_point_milli") == 10000L, got(1L).toString)
    // part 2: sd of {5, 15} = 7.0711 -> ss = 7071 * 1.645 = 11631
    assert(got(2L).getLong(3) == 7071L, got(2L).toString)
    assert(got(2L).getLong(4) == (7071L * 1645000L) / 1000000L, got(2L).toString)
    assert(got(3L).isNullAt(3) && got(3L).isNullAt(4), got(3L).toString)
  }
}
