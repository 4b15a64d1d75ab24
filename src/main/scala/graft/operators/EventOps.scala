package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product/event-analytics operators over the `events` feed: cohort
  * retention, funnel conversion, volatility bands, and key-skew profiling.
  * The reference's warehouse is consumed by BI dashboards
  * (/root/reference/README.md:33-44); these are the standard event-feed
  * queries such a consumer runs, expressed with the same portability
  * discipline as the rest of the engine (integer-exact accumulation
  * wherever float summation order could differ between engines).
  */
object EventOps {

  /** Weekly cohort retention: users cohorted by the week of their FIRST
    * event; each (cohort_week, week_offset) cell counts how many of them
    * were active that many weeks later, with the retention ratio against
    * cohort size.
    *
    * Scale shape: first-seen is a user-keyed aggregate; activity weeks are
    * a distinct over (user, week) — both shuffles keyed on user_id, so the
    * join between them is co-partitioned (no third shuffle of the big
    * side). Cohort sizes are a tiny per-week aggregate broadcast back; the
    * final cell aggregate is #weeks² rows. Nothing global, nothing skewed
    * beyond the user key itself.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val first = events.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).cast(DateType).as("cohort_week"))
    val active = events
      .select(col("user_id"), date_trunc("week", col("ts")).cast(DateType).as("week"))
      .distinct()
    val sizes = first.groupBy(col("cohort_week")).agg(count(lit(1)).as("cohort_size"))
    active.join(first, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast(IntegerType).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"), col("cohort_size"),
        round(col("n_active").cast(DoubleType) / col("cohort_size"), 6).as("retention"))
  }

  /** Ordered funnel conversion (signup → click → purchase): a user
    * advances a stage only with a strictly-later event of the next type.
    * One summary row: stage populations + conversion ratios.
    *
    * Scale shape: three user-keyed min-aggregates, each joined to the
    * previous stage's (user, ts) frame on user_id — co-partitioned keyed
    * joins all the way down, population counts are single-row aggregates
    * combined by broadcast cross. The per-stage event scans push the
    * event_type predicate into the source read.
    */
  def funnelConversion(events: DataFrame,
                       stages: Seq[String] = Seq("signup", "click", "purchase")): DataFrame = {
    require(stages.length == 3, "three-stage funnel")
    val s0 = events.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
    val s1 = events.filter(col("event_type") === stages(1))
      .join(s0, Seq("user_id")).filter(col("ts") > col("t0"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = events.filter(col("event_type") === stages(2))
      .join(s1, Seq("user_id")).filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val n0 = s0.agg(count(lit(1)).as("n_stage1"))
    val n1 = s1.agg(count(lit(1)).as("n_stage2"))
    val n2 = s2.agg(count(lit(1)).as("n_stage3"))
    n0.crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
      .select(col("n_stage1"), col("n_stage2"), col("n_stage3"),
        round(col("n_stage2").cast(DoubleType) / col("n_stage1"), 6).as("conv_1_2"),
        round(col("n_stage3").cast(DoubleType) / col("n_stage2"), 6).as("conv_2_3"))
  }

  /** Daily volatility bands per event type: trailing 7-day mean ± 2σ over
    * the daily value totals. Everything accumulates as integer CENTS —
    * frame sums and sums-of-squares are exact bigints, the sample variance
    * is computed from those exact sums ((n·Σx² − (Σx)²) / (n(n−1))), and
    * only the final sqrt/round touch floating point — so the result is
    * identical regardless of frame evaluation order in either engine (the
    * lm_perplexity/bm25 quantization discipline, applied to window
    * frames).
    *
    * Scale shape: one (type, day) pre-aggregate shrinks the feed to
    * #types × #days rows BEFORE the window; the window then partitions by
    * event_type over that tiny frame — never over raw events.
    */
  def rollingBand(events: DataFrame, frameDays: Int = 7): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-(frameDays - 1), Window.currentRow)
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("cents")).over(w))
      .withColumn("ss", sum(col("cents") * col("cents")).over(w))
      .select(col("event_type"), col("day"),
        round(col("s").cast(DoubleType) / col("n") / 100.0, 6).as("mean_value"),
        when(col("n") > 1,
          round(sqrt((col("n") * col("ss") - col("s") * col("s")).cast(DoubleType)
            / (col("n") * (col("n") - 1))) / 100.0, 6)).as("std_value"))
      .withColumn("upper_band",
        when(col("std_value").isNotNull, round(col("mean_value") + lit(2) * col("std_value"), 6)))
      .withColumn("lower_band",
        when(col("std_value").isNotNull, round(col("mean_value") - lit(2) * col("std_value"), 6)))
  }

  /** Exponentially time-decayed per-user value — the recency-weighted
    * engagement/LTV score every ranking and churn model consumes:
    * Σ value·e^(−age_days/τ), anchored at the corpus max day so the
    * result is a pure function of the data (no wall clock — reproducible
    * and oracle-checkable). Portability is two-step: the decay WEIGHT is
    * quantized to a 1e-6 integer first — exp() runs only on small integer
    * day ages, a handful of distinct inputs, so a 1-ulp libm difference
    * between engines has almost no surface to flip a rounding — and the
    * per-row value·weight product (double × small int: IEEE-exact,
    * deterministic) is quantized again before the per-user sum, which is
    * then pure integer addition (the engine-wide discipline: float
    * SUMMATION order is the thing that must never matter).
    *
    * Scale shape: the anchor is one tiny aggregate broadcast back; the
    * decay weight is a per-row codegen'd expression; the user sum is one
    * partial-aggregated keyed shuffle. Nothing global, nothing iterative.
    */
  def decayedUserValue(events: DataFrame, tauDays: Double = 7.0): DataFrame = {
    val anchor = events.agg(max(date_trunc("day", col("ts")).cast(DateType)).as("as_of"))
    events
      .select(col("user_id"), col("value"),
        date_trunc("day", col("ts")).cast(DateType).as("day"))
      .crossJoin(broadcast(anchor))
      .select(col("user_id"),
        // ${tauDays}d: a bare `7.0` literal parses as DECIMAL(2,1) in
        // Spark SQL and drags the division into decimal arithmetic
        // (scale-6 truncation of the exp argument — a ~1e-7 input shift
        // the weight quantization then amplifies into off-by-one
        // integers); the `d` suffix keeps the whole chain in DOUBLE,
        // matching the oracle engine's literal typing
        expr(s"cast(round(value * cast(round(exp(-datediff(as_of, day) / ${tauDays}d)" +
          " * 1000000) as bigint)) as bigint)").as("dq"))
      .groupBy(col("user_id"))
      // integer micros out — no divide-back, so the oracled surface has
      // zero float representation (the span_dedup_stats lesson)
      .agg(sum(col("dq")).as("decayed_value_micros"))
  }

  /** Trailing-band anomaly detection: a (type, day) total is anomalous
    * when it falls outside mean ± 2σ of the PRECEDING `frameDays` days —
    * the frame excludes the current day, unlike `rollingBand`'s trailing
    * frame, because a spike inside its own baseline dampens the very
    * signal it should trip. Emits only the anomalies (the alerting
    * read). Same integer-cents discipline: frame sums are exact bigints,
    * one sqrt at the end, and the flag compares exact-integer-derived
    * doubles — deterministic in both engines. Warm-up days (fewer than 3
    * prior days) never flag.
    */
  def anomalousDays(events: DataFrame, frameDays: Int = 7): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-frameDays, -1)
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("cents")).over(w))
      .withColumn("ss", sum(col("cents") * col("cents")).over(w))
      .filter(col("n") >= 3)
      .withColumn("mean_c", col("s").cast(DoubleType) / col("n"))
      .withColumn("std_c",
        sqrt((col("n") * col("ss") - col("s") * col("s")).cast(DoubleType)
          / (col("n") * (col("n") - 1))))
      .filter(abs(col("cents").cast(DoubleType) - col("mean_c")) > lit(2.0) * col("std_c"))
      .select(col("event_type"), col("day"),
        round(col("cents").cast(DoubleType) / 100.0, 2).as("value"),
        round(col("mean_c") / 100.0, 6).as("baseline_mean"),
        round(col("std_c") / 100.0, 6).as("baseline_std"))
  }

  /** Market-basket lift over the event feed: for every pair of event
    * types, how much more often users do BOTH than independence predicts
    * (lift = P(a∧b) / (P(a)·P(b))) — the cross-sell/feature-affinity
    * read every product-analytics stack ships. Computed from exact
    * integer counts (distinct (user, type) pairs, canonical a < b
    * self-join keyed on user) and quantized at the integer grid, so the
    * ratio is engine-stable. Pair cardinality is #types² — tiny — and
    * the only corpus-scale shuffles are the distinct and the user-keyed
    * self-join (co-partitioned).
    */
  def basketLift(events: DataFrame): DataFrame = {
    val ue = events.select(col("user_id"), col("event_type")).distinct()
    val nUsers = ue.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val supp = ue.groupBy(col("event_type")).agg(count(lit(1)).as("n_single"))
    val pairs = ue.select(col("user_id"), col("event_type").as("event_a"))
      .join(ue.select(col("user_id"), col("event_type").as("event_b")), Seq("user_id"))
      .filter(col("event_a") < col("event_b"))
      .groupBy(col("event_a"), col("event_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(supp.select(col("event_type").as("event_a"), col("n_single").as("n_a"))),
        Seq("event_a"))
      .join(broadcast(supp.select(col("event_type").as("event_b"), col("n_single").as("n_b"))),
        Seq("event_b"))
      .crossJoin(broadcast(nUsers))
      .select(col("event_a"), col("event_b"), col("n_both"),
        // pure-integer half-up ppm: no double division, no engine round()
        // semantics (n_both·n_users·1e6 stays well inside BIGINT for any
        // corpus whose distinct-pair count fits an analytics audit)
        expr("(cast(n_both as decimal(38,0)) * n_users * 1000000 + (n_a * n_b) div 2) div (n_a * n_b)")
          .as("lift_ppm"))
  }

  /** Key-skew profiler: the top `topN` heaviest values of `keyCol` with
    * each key's share of total rows and the running cumulative share — the
    * diagnostic run BEFORE keying a 100 TB shuffle on a column (it answers
    * "will AQE's skew split save this join, or is one key 40% of the
    * table?"). The cumulative window runs AFTER the TakeOrdered top-N, so
    * its single-partition frame is `topN` rows, never the key space.
    */
  /** RFM customer segmentation over orders — recency / frequency /
    * monetary quartile buckets plus a named segment, the classic
    * warehouse-mart consumer of the order feed. Deliberately NOT a
    * global `ntile` window (one reducer sorting every customer):
    * quartile BOUNDARIES are computed as one exact-percentile aggregate
    * over the per-customer rollup and broadcast back, so bucketing is a
    * per-row compare — two customer-keyed shuffles total (the rollup,
    * nothing else), identical plan at any customer count. Metrics are
    * integers (days, counts, cents) so the boundary compares are exact;
    * bucket 1 = least of the metric, 4 = most (recency bucket 1 ⇒ most
    * recent buyer).
    */
  def rfmSegments(orders: DataFrame): DataFrame = {
    val cust = orders.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate").cast(DateType)).as("last_order"),
        count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("monetary_cents"))
    val anchor = orders.agg(max(col("o_orderdate").cast(DateType)).as("anchor"))
    val r = cust.crossJoin(broadcast(anchor))
      .select(col("o_custkey"),
        datediff(col("anchor"), col("last_order")).cast(LongType).as("recency_days"),
        col("n_orders"), col("monetary_cents"))
    val bounds = r.agg(
      expr("percentile(recency_days, 0.25d)").as("r1"),
      expr("percentile(recency_days, 0.5d)").as("r2"),
      expr("percentile(recency_days, 0.75d)").as("r3"),
      expr("percentile(n_orders, 0.25d)").as("f1"),
      expr("percentile(n_orders, 0.5d)").as("f2"),
      expr("percentile(n_orders, 0.75d)").as("f3"),
      expr("percentile(monetary_cents, 0.25d)").as("m1"),
      expr("percentile(monetary_cents, 0.5d)").as("m2"),
      expr("percentile(monetary_cents, 0.75d)").as("m3"))
    def bucket(c: String, q: String): String =
      s"cast(1 + if($c > ${q}1, 1, 0) + if($c > ${q}2, 1, 0) + if($c > ${q}3, 1, 0) as int)"
    r.crossJoin(broadcast(bounds))
      .withColumn("r_bucket", expr(bucket("recency_days", "r")))
      .withColumn("f_bucket", expr(bucket("n_orders", "f")))
      .withColumn("m_bucket", expr(bucket("monetary_cents", "m")))
      .select(col("o_custkey"), col("recency_days"), col("n_orders"),
        col("monetary_cents"), col("r_bucket"), col("f_bucket"), col("m_bucket"),
        expr("""case when r_bucket = 1 and f_bucket = 4 and m_bucket = 4 then 'champion'
               |     when r_bucket >= 3 and m_bucket = 4 then 'at_risk_spender'
               |     when r_bucket >= 3 then 'lapsing'
               |     when f_bucket = 4 or m_bucket = 4 then 'loyal'
               |     else 'standard' end""".stripMargin).as("segment"))
  }

  /** Conversion-lag distribution per signup cohort: seconds from each
    * user's FIRST signup to their first purchase at-or-after it, rolled
    * up as exact type-1 quantiles (median, p90) — rank ⌈q·n⌉ in
    * (lag, user_id) order, so the output is pure integers with no
    * interpolation semantics to disagree across engines (the RFM
    * boundary lesson, taken further: no floats at all). Scale shape: two
    * user-keyed aggregates, one cohort window over the (bounded)
    * converter set, no event-grain window.
    */
  def conversionLag(events: DataFrame): DataFrame = {
    val signup = events.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
    val lag = signup
      .join(events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts")), Seq("user_id"))
      .filter(col("p_ts") >= col("signup_ts"))
      .groupBy(col("user_id"), col("signup_ts"))
      .agg(min(col("p_ts")).as("purchase_ts"))
      .select(col("user_id"),
        date_trunc("month", col("signup_ts")).cast(DateType).as("cohort"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("signup_ts")))
          .as("lag_s"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("lag_s"), col("user_id"))
    lag.withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("cohort"))))
      .groupBy(col("cohort"), col("n"))
      .agg(
        max(when(col("rk") === expr("(n + 1) div 2"), col("lag_s"))).as("median_lag_s"),
        max(when(col("rk") === expr("(9 * n + 9) div 10"), col("lag_s"))).as("p90_lag_s"))
      .select(col("cohort"), col("n").cast(LongType).as("n_converters"),
        col("median_lag_s"), col("p90_lag_s"))
  }

  /** Per-user next-event transition matrix (first-order Markov over the
    * event stream): P(next = b | current = a) in integer ppm, from each
    * user's ts-ordered sequence. The user-journey read that funnels
    * (fixed order) and sessions (boundaries) don't give: where do users
    * actually GO from each state. Half-up ppm against the from-state
    * total; (ts, event_id) ordering tiebreak keeps lead() deterministic.
    * Scale shape: one user-keyed window (the shuffle every sequence op
    * pays) + a (from, to) aggregate whose cardinality is |event types|²
    * — driver-tiny regardless of corpus size.
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("from_total"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(cast(n as decimal(38,0)) * 1000000 + from_total div 2) div from_total").as("p_ppm"))
  }

  /** Telemetry debounce — the double-fire cleaner every event pipeline
    * ships before analytics: within each (user, event_type) stream,
    * consecutive events ≤ `gapSeconds` apart are one burst (gaps-and-
    * islands over the raw sequence), and only the burst's FIRST event
    * survives. Reported as a per-type audit (raw count, kept count,
    * drop ppm) — the retention read that decides whether double-fires
    * are a real data-quality problem. One user+type-keyed window (the
    * sequence-op shuffle) + a |types|-row rollup; integer seconds and
    * ppm throughout.
    */
  def eventsDebounce(events: DataFrame, gapSeconds: Int = 5): DataFrame = {
    require(gapSeconds >= 1, s"gapSeconds out of range: $gapSeconds")
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("gap_s",
        unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
      .withColumn("first_of_burst",
        col("gap_s").isNull || col("gap_s") > gapSeconds)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_raw"),
        sum(expr("cast(first_of_burst as bigint)")).as("n_kept"))
      .withColumn("drop_ppm",
        expr("(cast(n_raw - n_kept as decimal(38,0)) * 1000000 + n_raw div 2) div n_raw"))
  }

  /** Monthly churn — the cohort-free retention pulse next to
    * [[cohortRetention]] (fixed cohorts) and [[stickiness]] (DAU/MAU):
    * for each calendar month, the share of its active users who do NOT
    * appear in the following month. Active sets are exact distinct
    * (user, month) pairs; retention is an equi-join against month+1;
    * the data's last month is excluded (its successor is unobserved, so
    * "churn" there would be a censoring artifact, the same reasoning as
    * [[kmConversion]]'s right-censoring). Two partial-agg shuffles and
    * a month-grid join — the month grid is dimension-scale.
    */
  def monthlyChurn(events: DataFrame): DataFrame = {
    val am = events
      .select(col("user_id"),
        date_trunc("month", col("ts")).cast(DateType).as("m"))
      .distinct()
    val mx = am.agg(max(col("m")).as("mx"))
    val retained = am
      .join(am.select(col("user_id"), add_months(col("m"), -1).as("m")),
        Seq("user_id", "m"), "left_semi")
      .groupBy(col("m")).agg(count(lit(1)).as("n_retained"))
    am.groupBy(col("m")).agg(count(lit(1)).as("n_active"))
      .join(retained, Seq("m"), "left")
      .crossJoin(broadcast(mx))
      .filter(col("m") < col("mx"))
      .select(col("m").as("month"), col("n_active"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        expr("""(cast(n_active - coalesce(n_retained, 0L) as decimal(38,0)) * 1000000
          | + n_active div 2) div n_active""".stripMargin).as("churn_ppm"))
  }

  /** Markov removal-effect attribution (Anderl et al. 2014) — the
    * model-based upgrade of [[attributionCredit]]'s first/last/linear
    * heuristics: build the first-order journey chain (START → touches →
    * CONV at the first purchase / NULL at journey end), then price each
    * channel by how much total conversion DROPS when that channel is
    * absorbed into NULL — removal_effect(c) = 1 − P_conv(chain minus c)
    * / P_conv(chain), normalized into attribution shares.
    *
    * Determinism: transition probabilities are half-up integer ppm; the
    * absorption probabilities come from `rounds` fixed-point iterations
    * v(s) ← (Σ_t p_ppm(s,t)·v(t) + 5·10⁵) div 10⁶ with v(CONV) = 10⁶,
    * v(NULL) = 0 pinned, every scenario (base + one per removed channel)
    * carried as a column in ONE frame — so both engines replay the exact
    * integer sequence bit-for-bit and convergence tolerance never
    * touches the hash gate. Negative removal effects (a channel whose
    * removal helps) are reported raw and clamped to 0 for the share.
    *
    * Scale shape: one user-keyed window pass over the corpus (the same
    * shuffle every sequence op pays) collapses everything to the
    * |states|² transition grid; the `rounds` iteration then runs on
    * (scenarios × states) ≤ |types|² rows — driver-tiny at ANY corpus
    * size. localCheckpoint every round (the multi-reference loop rule).
    */
  def markovAttribution(events: DataFrame, rounds: Int = 12): DataFrame = {
    require(rounds >= 1 && rounds <= 40, s"rounds out of range: $rounds")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // journey truncates at the FIRST purchase (inclusive, becomes CONV)
    val fp = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(min(struct(col("ts"), col("event_id"))).as("fp"))
    val kept = events.join(fp, Seq("user_id"), "left")
      .filter(col("fp").isNull || struct(col("ts"), col("event_id")) <= col("fp"))
      .withColumn("state",
        when(col("event_type") === "purchase", lit("CONV")).otherwise(col("event_type")))
    val seq = kept.select(col("user_id"), col("state"),
      row_number().over(w).as("rn"), lead(col("state"), 1).over(w).as("nxt"))
    val tr = seq.filter(col("rn") === 1).select(lit("START").as("f"), col("state").as("t"))
      .unionAll(seq.filter(col("state") =!= "CONV" && col("nxt").isNotNull)
        .select(col("state").as("f"), col("nxt").as("t")))
      .unionAll(seq.filter(col("state") =!= "CONV" && col("nxt").isNull)
        .select(col("state").as("f"), lit("NULL").as("t")))
    val tc = tr.groupBy(col("f"), col("t")).agg(count(lit(1)).as("n"))
    val p = tc.join(broadcast(tc.groupBy(col("f")).agg(sum(col("n")).as("tot"))), Seq("f"))
      .select(col("f"), col("t"),
        expr("(cast(n as decimal(38,0)) * 1000000 + tot div 2) div tot").as("p_ppm"))
      .localCheckpoint() // referenced every round
    val scenarios = p.select(col("f").as("scenario")).filter(col("scenario") =!= "START")
      .distinct().unionAll(p.sparkSession.range(1).select(lit("base").as("scenario")))
      .localCheckpoint()
    val states = p.select(col("f").as("state")).distinct().localCheckpoint()
    var v = scenarios.crossJoin(states).withColumn("v", lit(0L)).localCheckpoint()
    for (_ <- 1 to rounds) {
      v = scenarios.crossJoin(p)
        .join(v.select(col("scenario"), col("state").as("t"), col("v")),
          Seq("scenario", "t"), "left")
        .groupBy(col("scenario"), col("f").as("state"))
        .agg(expr("""(sum(p_ppm * (case when t = 'CONV' then 1000000L
          | when t = 'NULL' then 0L else coalesce(v, 0L) end))
          | + 500000) div 1000000""".stripMargin).as("raw"))
        .select(col("scenario"), col("state"),
          when(col("state") === col("scenario"), lit(0L)).otherwise(col("raw")).as("v"))
        .localCheckpoint()
    }
    val atStart = v.filter(col("state") === "START")
    val base = atStart.filter(col("scenario") === "base")
      .select(col("v").as("pb"))
    val re = atStart.filter(col("scenario") =!= "base")
      .crossJoin(broadcast(base))
      .select(col("scenario").as("channel"),
        col("pb").as("conv_base_micro"), col("v").as("conv_removed_micro"),
        when(col("pb") === 0L, lit(null).cast(LongType))
          .otherwise(expr("1000000 - (v * 1000000 + pb div 2) div pb"))
          .as("removal_effect_ppm"))
    val tot = re.agg(sum(expr("greatest(coalesce(removal_effect_ppm, 0L), 0L)")).as("re_tot"))
    re.crossJoin(broadcast(tot))
      .select(col("channel"), col("conv_base_micro"), col("conv_removed_micro"),
        col("removal_effect_ppm"),
        when(col("re_tot") === 0L || col("removal_effect_ppm").isNull, lit(null).cast(LongType))
          .otherwise(expr(
            "(greatest(removal_effect_ppm, 0L) * 1000000 + re_tot div 2) div re_tot"))
          .as("attribution_ppm"))
  }

  /** Monthly reactivation rate — the win-back pulse completing the
    * [[monthlyChurn]] / [[dayNRetention]] panel: a user REACTIVATES in
    * month m if active in m, absent in m−1, and active in some month
    * before m−1 (distinguishing win-backs from brand-new users).
    * Share is against m's active base. Exact distinct (user, month)
    * sets; three self-joins on the month-grid frame (all equi-keyed on
    * (user, month)); the data's first two months can't have
    * reactivations by construction and report their observed zeros.
    */
  def reactivationRate(events: DataFrame): DataFrame = {
    val am = events
      .select(col("user_id"),
        date_trunc("month", col("ts")).cast(DateType).as("m"))
      .distinct().localCheckpoint() // referenced four times below
    val first = am.groupBy(col("user_id")).agg(min(col("m")).as("m0"))
    val reUsers = am
      .join(am.select(col("user_id"), add_months(col("m"), 1).as("m"))
        .withColumnRenamed("user_id", "user_id"), Seq("user_id", "m"), "left_anti")
      .join(first, Seq("user_id"))
      .filter(col("m0") < add_months(col("m"), -1))
      .groupBy(col("m")).agg(count(lit(1)).as("n_reactivated"))
    am.groupBy(col("m")).agg(count(lit(1)).as("n_active"))
      .join(reUsers, Seq("m"), "left")
      .select(col("m").as("month"), col("n_active"),
        coalesce(col("n_reactivated"), lit(0L)).as("n_reactivated"),
        expr("""(cast(coalesce(n_reactivated, 0L) as decimal(38,0)) * 1000000 + n_active div 2)
          | div n_active""".stripMargin).as("reactivation_ppm"))
  }

  /** New-vs-returning revenue split per month — the growth-accounting
    * read: each purchase is NEW revenue if it lands in the payer's
    * first-purchase month, RETURNING otherwise; a business whose new
    * share trends to zero is coasting on its base. Exact integer
    * cents; one per-user reduction (first purchase month) + a join
    * back on the payer + a month rollup.
    */
  def newVsReturning(events: DataFrame): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"),
        date_trunc("month", col("ts")).cast(DateType).as("m"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
    val first = p.groupBy(col("user_id")).agg(min(col("m")).as("m0"))
    p.join(first, Seq("user_id"))
      .groupBy(col("m").as("month"))
      .agg(sum(when(col("m") === col("m0"), col("cents")).otherwise(0L)).as("new_cents"),
        sum(when(col("m") =!= col("m0"), col("cents")).otherwise(0L)).as("returning_cents"))
      .withColumn("new_share_ppm",
        // DECIMAL-widened ppm: a month's cents sum past ~9.2e12 would
        // overflow the LONG multiply (the abc_xyz sf1-ladder lesson)
        expr("""(cast(new_cents as decimal(38,0)) * 1000000
          | + (new_cents + returning_cents) div 2)
          | div (new_cents + returning_cents)""".stripMargin))
  }

  /** Day-N retention — the product-health pulse at daily grain (the
    * classic D1/D7/D14/D28 panel next to [[monthlyChurn]]'s month
    * pulse): for each N, the share of users active ON day t₀+N among
    * users whose day-N was OBSERVABLE (t₀ + N ≤ horizon — the same
    * right-censoring guard as [[kmConversion]]; without it late
    * signups deflate D28 mechanically). Exact distinct (user, offset)
    * sets; N rides an exploded literal array so all four panels come
    * from ONE pass over the offsets frame. Integer ppm.
    */
  def dayNRetention(events: DataFrame, days: Seq[Int] = Seq(1, 7, 14, 28)): DataFrame = {
    require(days.nonEmpty && days.forall(_ >= 1), s"bad days: $days")
    val d0 = events.groupBy(col("user_id"))
      .agg(min(date_trunc("day", col("ts")).cast(DateType)).as("t0"))
    val horizon = events.agg(max(date_trunc("day", col("ts")).cast(DateType)).as("h"))
    val offsets = events
      .select(col("user_id"), date_trunc("day", col("ts")).cast(DateType).as("day"))
      .distinct()
      .join(d0, Seq("user_id"))
      .select(col("user_id"), datediff(col("day"), col("t0")).cast(LongType).as("off"))
    val panel = d0.crossJoin(broadcast(horizon))
      .select(col("user_id"), col("t0"), col("h"),
        explode(lit(days.toArray)).as("n_day"))
      .filter(date_add(col("t0"), col("n_day")) <= col("h"))
    panel
      .join(offsets.withColumnRenamed("off", "n_day_hit")
        .select(col("user_id"), col("n_day_hit").cast(IntegerType).as("n_day"),
          lit(1).as("hit")),
        Seq("user_id", "n_day"), "left")
      .groupBy(col("n_day"))
      .agg(count(lit(1)).as("n_eligible"),
        sum(expr("cast(coalesce(hit, 0) as bigint)")).as("n_retained"))
      .select(col("n_day"), col("n_eligible"), col("n_retained"),
        expr("(cast(n_retained as decimal(38,0)) * 1000000 + n_eligible div 2) div n_eligible")
          .as("retention_ppm"))
  }

  /** Session-duration profile — exact p50/p90/p99 of gap-sessionized
    * session lengths (30-minute gap, the [[graft.streaming.Sessionize]]
    * definition): the latency-SLO read for engagement. Durations come
    * from the same user-keyed islands window as `events_sessions`;
    * the exact type-1 quantiles use [[ShardedOrder]]'s global rank —
    * the session count is fact-scale, so no single-reducer sort — with
    * rank thresholds ⌈q·n⌉ and (duration, user, start) as the total
    * order. One sequence-op shuffle + the sharded rank.
    */
  def sessionDurationProfile(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = events
      .withColumn("is_new",
        when(lag(col("ts"), 1).over(w).isNull ||
          (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
            > gapSeconds, 1L).otherwise(0L))
      .withColumn("sid", sum(col("is_new")).over(run))
      .groupBy(col("user_id"), col("sid"))
      .agg((unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
        .as("dur_s"), min(col("ts")).as("start"))
    val ranked = ShardedOrder.withGlobalRank(sessions, "rk", 32,
      col("dur_s"), col("user_id"), col("start"))
    val n = ranked.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(n))
      .groupBy(col("n"))
      .agg(
        max(when(col("rk") === expr("(n + 1) div 2"), col("dur_s"))).as("p50_s"),
        max(when(col("rk") === expr("(9 * n + 9) div 10"), col("dur_s"))).as("p90_s"),
        max(when(col("rk") === expr("(99 * n + 99) div 100"), col("dur_s"))).as("p99_s"))
      .select(col("n").as("n_sessions"), col("p50_s"), col("p90_s"), col("p99_s"))
  }

  /** Two-proportion z-test on conversion by experiment arm — the A/B
    * readout: users split by a deterministic assignment (user_id
    * parity here; any hash serves), conversion = ever purchased, and
    * the pooled-variance z = (p_A − p_B)/√(p̂(1−p̂)(1/n_A + 1/n_B))
    * computed as ONE fixed-shape double over the four exact counts,
    * micros-quantized; significance flags at the two-sided 5% critical
    * value (|z| > 1.96, pinned literal). Output: both arms' counts,
    * rates in ppm, lift, z_micro, significant. One per-user reduction;
    * everything else is a 2-row frame.
    */
  def abConversionZtest(events: DataFrame): DataFrame = {
    val perUser = events.groupBy(col("user_id"))
      .agg(max(expr("cast(event_type = 'purchase' as int)")).as("conv"))
      .select(pmod(col("user_id"), lit(2)).as("arm"), col("conv"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(expr("cast(conv as bigint)")).as("c"))
    val a = arms.filter(col("arm") === 0).select(col("n").as("n_a"), col("c").as("c_a"))
    val b = arms.filter(col("arm") === 1).select(col("n").as("n_b"), col("c").as("c_b"))
    a.crossJoin(b)
      .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        expr("(cast(c_a as decimal(38,0)) * 1000000 + n_a div 2) div n_a").as("rate_a_ppm"),
        expr("(cast(c_b as decimal(38,0)) * 1000000 + n_b div 2) div n_b").as("rate_b_ppm"),
        // pooled p of exactly 0 or 1 has zero variance: the test is
        // undefined (both arms unanimous) -> NULL, not a division error
        when(col("c_a") + col("c_b") === 0 ||
          col("c_a") + col("c_b") === col("n_a") + col("n_b"),
          lit(null).cast(LongType))
          .otherwise(expr("""cast(round(
            |  (cast(c_a as double) / cast(n_a as double)
            |   - cast(c_b as double) / cast(n_b as double))
            |  / sqrt(cast(c_a + c_b as double) / cast(n_a + n_b as double)
            |         * (1.0d - cast(c_a + c_b as double) / cast(n_a + n_b as double))
            |         * (1.0d / cast(n_a as double) + 1.0d / cast(n_b as double)))
            |  * 1000000) as bigint)""".stripMargin)).as("z_micro"))
      .withColumn("significant_95",
        when(col("z_micro").isNull, lit(null)).otherwise(abs(col("z_micro")) > 1960000L))
  }

  /** Rolling 28-day Pearson correlation between the daily PURCHASE
    * revenue and the daily VIEW count — the leading-indicator read ("do
    * views predict spend this month"): windowed exact integer moments
    * (Σx, Σy, Σxy, Σx², Σy² over the trailing frame), one fixed-shape
    * double per day quantized to micros. The series is the day grid —
    * time-dimension scale, constant-key window idiom; days with a
    * degenerate window (zero variance, fewer than `minDays` points)
    * read NULL. The corpus-scale work is the one (day) aggregate.
    */
  def rollingCorr(events: DataFrame, window: Int = 28, minDays: Int = 14): DataFrame = {
    val daily = events
      .groupBy(date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(sum(expr("cast(if(event_type = 'purchase', round(value * 100), 0) as bigint)"))
        .as("x"),
        sum(expr("cast(event_type = 'view' as bigint)")).as("y"))
    val w = Window.partitionBy(pmod(col("x"), lit(1))).orderBy(col("day"))
      .rowsBetween(-(window - 1), Window.currentRow)
    val D = DecimalType(38, 0)
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x").cast(D)).over(w))
      .withColumn("sy", sum(col("y").cast(D)).over(w))
      .withColumn("sxy", sum((col("x").cast(D) * col("y")).cast(D)).over(w))
      .withColumn("sxx", sum((col("x").cast(D) * col("x")).cast(D)).over(w))
      .withColumn("syy", sum((col("y").cast(D) * col("y")).cast(D)).over(w))
      .select(col("day"),
        when(col("n") < minDays ||
          col("n") * col("sxx") === col("sx") * col("sx") ||
          col("n") * col("syy") === col("sy") * col("sy"), lit(null).cast(LongType))
          .otherwise(expr("""cast(round(
            |  cast(n * sxy - sx * sy as double)
            |  / sqrt(cast(n * sxx - sx * sx as double))
            |  / sqrt(cast(n * syy - sy * sy as double)) * 1000000) as bigint)""".stripMargin))
          .as("corr_micros"))
  }

  /** Cohort LTV curve — cumulative purchase value per signup cohort by
    * month offset: the revenue-weighted sequel to [[cohortRetention]]'s
    * headcount curve (retention says who came back; LTV says what they
    * were worth). Cohort = first-signup month; offset = calendar-month
    * index delta (year·12+month arithmetic — pure integers, no
    * months_between float semantics); value = integer cents; the
    * cumulative is a per-cohort window over the offset grid (cohorts ×
    * offsets — dimension-scale, properly partitioned). Purchases before
    * signup are excluded (same guard as [[conversionLag]]).
    */
  def ltvCohortCurve(events: DataFrame): DataFrame = {
    val signup = events.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
    val grid = signup
      .join(events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("value")),
        Seq("user_id"))
      .filter(col("p_ts") >= col("signup_ts"))
      .select(date_trunc("month", col("signup_ts")).cast(DateType).as("cohort"),
        ((year(col("p_ts")) * 12 + month(col("p_ts"))) -
          (year(col("signup_ts")) * 12 + month(col("signup_ts")))).cast(LongType)
          .as("month_offset"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .groupBy(col("cohort"), col("month_offset"))
      .agg(sum(col("cents")).as("cents"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("month_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.withColumn("cum_ltv_cents", sum(col("cents")).over(w))
  }

  /** Discount elasticity — does a deeper discount move quantity?
    * Pearson correlation and OLS slope of (discount permille, quantity)
    * over every lineitem, from EXACT integer moments (n, Σx, Σy, Σxy,
    * Σx², Σy² — DECIMAL(38,0)), each output one fixed-shape double
    * quantized to micros. Slope is quantity units per permille of
    * discount. One map-side-combined aggregate; nothing else.
    */
  def discountElasticity(lineitem: DataFrame): DataFrame = {
    val D = DecimalType(38, 0)
    lineitem
      .select(expr("cast(round(l_discount * 1000) as bigint)").as("x"),
        expr("cast(l_quantity as bigint)").as("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(D)).as("sx"), sum(col("y").cast(D)).as("sy"),
        sum((col("x").cast(D) * col("y")).cast(D)).as("sxy"),
        sum((col("x").cast(D) * col("x")).cast(D)).as("sxx"),
        sum((col("y").cast(D) * col("y")).cast(D)).as("syy"))
      .select(col("n"),
        expr("""cast(round(
          |  cast(n * sxy - sx * sy as double)
          |  / sqrt(cast(n * sxx - sx * sx as double))
          |  / sqrt(cast(n * syy - sy * sy as double)) * 1000000) as bigint)""".stripMargin)
          .as("r_micros"),
        expr("""cast(round(
          |  cast(n * sxy - sx * sy as double)
          |  / cast(n * sxx - sx * sx as double) * 1000000) as bigint)""".stripMargin)
          .as("slope_micros"))
  }

  /** Walk-forward forecast backtest — the model-selection read a
    * forecasting stack wants before trusting any predictor: replay the
    * daily-revenue series and score the two standard baselines
    * out-of-sample — naive (carry yesterday, here the PREVIOUS OBSERVED
    * day) and seasonal-naive (same weekday last week, exact 7-day
    * calendar lag) — by MAE and bias in integer cents. Any candidate
    * model must beat seasonal-naive or it ships nothing. Days without a
    * prediction (series head; missing calendar lag) are excluded per
    * predictor, n reported. One corpus (day) aggregate; the lag logic
    * runs on the day grid (window + one self-join, dimension-scale).
    */
  def forecastBacktest(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
      .localCheckpoint() // referenced by both predictors
    val w = Window.partitionBy(pmod(col("cents"), lit(1))).orderBy(col("day"))
    val naive = daily
      .withColumn("pred", lag(col("cents"), 1).over(w))
      .filter(col("pred").isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(abs(col("cents") - col("pred"))).as("ae"),
        sum(col("cents") - col("pred")).as("err"))
      .select(lit("naive").as("model"), col("n"),
        expr("(ae + n div 2) div n").as("mae_cents"),
        expr("(err + n div 2) div n").as("bias_cents"))
    val snaive = daily
      .join(daily.select(date_add(col("day"), 7).as("day"), col("cents").as("pred")),
        Seq("day"))
      .agg(count(lit(1)).as("n"),
        sum(abs(col("cents") - col("pred"))).as("ae"),
        sum(col("cents") - col("pred")).as("err"))
      .select(lit("seasonal_naive").as("model"), col("n"),
        expr("(ae + n div 2) div n").as("mae_cents"),
        expr("(err + n div 2) div n").as("bias_cents"))
    naive.unionByName(snaive)
  }

  /** Holt–Winters additive triple smoothing (level + trend + weekly
    * seasonality) — [[holtForecast]] grown the seasonal state a daily
    * business series actually has: s_slot ("how much this weekday
    * deviates") updates alongside l and b, all three as EXACT integer
    * recursions (α = β... = 0.2/0.1/0.2 as tenths, the same sign-safe
    * floor division). Init: l = first-week mean, b = 0, s_i = y_i − l;
    * the recursion runs from day 8. Slots index the OBSERVATION sequence
    * mod 7 (a gap shifts the phase — the series is treated as
    * consecutive observations, matching the collected-array formulation).
    * One-step in-sample MAE lands beside the naive MAE from the same
    * range, so the row answers: does modeling the weekly shape beat
    * carry-yesterday where plain Holt ([[holtForecast]]) doesn't?
    * Same scale shape as holtForecast: one day aggregate, then a fold
    * over the calendar-bounded collected series.
    */
  def holtWintersForecast(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
    // Sign-safe floor div 7 (fdiv10's shape): a refund-heavy first week
    // can sum negative, where `div` truncates but the oracle's `//` floors.
    val wk1 = "aggregate(slice(s, 1, 7), 0L, (a, e) -> a + e.cents)"
    val l0 = s"((($wk1) - (((($wk1) % 7) + 7) % 7)) div 7)"
    val foldSql =
      s"""element_at(transform(array($l0), l0 ->
         |  aggregate(slice(s, 8, greatest(size(s) - 7, 0)),
         |    named_struct('l', l0, 'b', 0L,
         |                 'sv', transform(slice(s, 1, 7), e -> e.cents - l0),
         |                 'i', 7, 'prev', element_at(s, 7).cents,
         |                 'sae_h', 0L, 'sae_n', 0L),
         |    (st, e) -> element_at(transform(array(
         |        ${fdiv10("2 * (e.cents - element_at(st.sv, st.i % 7 + 1)) + 8 * (st.l + st.b)")}), l2 ->
         |      named_struct('l', l2,
         |        'b', ${fdiv10("(l2 - st.l) + 9 * st.b")},
         |        'sv', transform(sequence(0, 6), j -> if(j = st.i % 7,
         |          ${fdiv10("2 * (e.cents - l2) + 8 * element_at(st.sv, st.i % 7 + 1)")},
         |          element_at(st.sv, j + 1))),
         |        'i', st.i + 1, 'prev', e.cents,
         |        'sae_h', st.sae_h
         |          + abs(e.cents - (st.l + st.b + element_at(st.sv, st.i % 7 + 1))),
         |        'sae_n', st.sae_n + abs(e.cents - st.prev))), 1),
         |    st -> st)), 1)""".stripMargin
    daily.agg(expr("sort_array(collect_list(struct(day, cents)))").as("s"))
      .filter(expr("size(s) >= 8"))
      .select(expr("cast(size(s) as bigint)").as("n_days"),
        expr(foldSql).as("r"))
      .select(col("n_days"), col("r.l").as("level_cents"),
        col("r.b").as("trend_cents"),
        expr("r.l + r.b + element_at(r.sv, cast(n_days % 7 as int) + 1)")
          .as("forecast_1_cents"),
        expr("array_max(r.sv) - array_min(r.sv)").as("seas_amp_cents"),
        expr("(r.sae_h + (n_days - 7) div 2) div (n_days - 7)").as("mae_hw_cents"),
        expr("(r.sae_n + (n_days - 7) div 2) div (n_days - 7)").as("mae_naive_cents"))
  }

  /** Per-user spend milestones — the batch face of the
    * [[graft.streaming.Milestones]] transformWithState processor: order
    * each user's purchases by (ts, event_id), run the cumulative
    * cents, and emit one row per purchase whose cumulative total CROSSES
    * a `stepCents` multiple (milestone = the highest multiple reached —
    * a single large purchase that jumps several marks emits once, at the
    * top one). The loyalty/limit-alert primitive: "tell me when a
    * customer passes each $100 of lifetime spend". Per-user window —
    * user-keyed partitions, never a global sort.
    */
  def spendMilestones(events: DataFrame, stepCents: Long = 10000L): DataFrame = {
    require(stepCents > 0, s"stepCents must be positive: $stepCents")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Floor (not truncating) division: refunds can drive a cumulative
    // NEGATIVE, and the oracle's `//` floors while Spark's `div`
    // truncates — fdivN keeps the two engines equal on both signs.
    def fdivStep(e: String): String =
      s"((($e) - (((($e) % $stepCents) + $stepCents) % $stepCents)) div $stepCents)"
    events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .withColumn("cum", sum(col("cents")).over(w))
      .filter(expr(s"${fdivStep("cum")} > ${fdivStep("cum - cents")}"))
      .select(col("user_id"), col("event_id"),
        expr(s"${fdivStep("cum")} * $stepCents").as("milestone_cents"),
        col("cum").as("cum_cents"))
  }

  /** Sign-safe integer floor division by 10 — `div` truncates toward
    * zero on Spark while DuckDB's `//` floors, and Holt's trend can go
    * negative; subtracting the sign-preserving mod first makes the
    * numerator an exact multiple, where truncation == floor on BOTH
    * engines.
    */
  private def fdiv10(e: String): String =
    s"((($e) - (((($e) % 10) + 10) % 10)) div 10)"

  /** Holt double-exponential smoothing (level + trend) over the daily
    * revenue series — the first real MODEL next to [[forecastBacktest]]'s
    * naive baselines: l_t = α·y_t + (1−α)(l+b), b_t = β(l_t−l) + (1−β)b
    * with α = 0.2, β = 0.1 as EXACT integer-weight recursions
    * (fdiv10(2y + 8(l+b)), fdiv10((l'−l) + 9b)) — deterministic to the
    * cent at any length, replayed by a recursive CTE in the oracle. The
    * in-sample one-step MAE lands beside the naive MAE computed in the
    * same pass, so the row answers the only question that matters: does
    * the trend model beat carry-yesterday on this series?
    *
    * Scale shape: one corpus (day) aggregate; the recursion runs over
    * the COLLECTED day series — calendar-bounded (~10³ rows at ANY
    * corpus size), the BPE-merge-table collect class, never corpus-scale.
    */
  def holtForecast(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
    val foldSql =
      s"""aggregate(slice(s, 3, greatest(size(s) - 2, 0)),
         |  named_struct('l', element_at(s, 2).cents,
         |               'b', element_at(s, 2).cents - element_at(s, 1).cents,
         |               'prev', element_at(s, 2).cents,
         |               'sae_h', 0L, 'sae_n', 0L),
         |  (st, e) -> element_at(transform(array(
         |      ${fdiv10("2 * e.cents + 8 * (st.l + st.b)")}), l2 ->
         |    named_struct('l', l2,
         |                 'b', ${fdiv10("(l2 - st.l) + 9 * st.b")},
         |                 'prev', e.cents,
         |                 'sae_h', st.sae_h + abs(e.cents - (st.l + st.b)),
         |                 'sae_n', st.sae_n + abs(e.cents - st.prev))), 1),
         |  st -> st)""".stripMargin
    daily.agg(expr("sort_array(collect_list(struct(day, cents)))").as("s"))
      .filter(expr("size(s) >= 3"))
      .select(expr("cast(size(s) as bigint)").as("n_days"),
        expr(foldSql).as("r"))
      .select(col("n_days"), col("r.l").as("level_cents"),
        col("r.b").as("trend_cents"),
        expr("r.l + r.b").as("forecast_1_cents"),
        expr("r.l + 7 * r.b").as("forecast_7_cents"),
        expr("(r.sae_h + (n_days - 2) div 2) div (n_days - 2)").as("mae_holt_cents"),
        expr("(r.sae_n + (n_days - 2) div 2) div (n_days - 2)").as("mae_naive_cents"))
  }

  /** Shapley-value attribution over observed touch SETS — the
    * order-independent, axiomatically fair companion to
    * [[markovAttribution]]'s chain model (Shapley 1953; the simplified
    * game used by ad-attribution platforms): v(S) = conversion rate of
    * journeys whose pre-purchase touch set is EXACTLY S (unobserved
    * coalitions read v = 0, documented), and φ_i = Σ_{S⊆C∖i}
    * |S|!·(n−1−|S|)!·(v(S∪i) − v(S)) / n!.
    *
    * Exact integer arithmetic end-to-end: touch sets are BITMASKS
    * (channels bit-assigned in name order), v is half-up ppm, the
    * factorial weights are integers, and the single division by n!
    * happens last — so both engines replay bit-for-bit. n ≤ 5 channels
    * enforced (2ⁿ coalition grid; past that you sample permutations).
    * Scale shape: one per-user reduction to (mask, converted) — the
    * same window pass every journey op pays — then everything runs on
    * the ≤ 2ⁿ-row coalition grid.
    */
  def shapleyAttribution(events: DataFrame): DataFrame = {
    val channels = events.filter(col("event_type") =!= "purchase")
      .select(col("event_type").as("channel")).distinct()
      // constant-key partition (repo idiom): same one-reducer semantics —
      // fine over ≤ |types| rows — without the misleading global-window
      // warning a constant-folded literal key triggers
      .withColumn("bit",
        row_number().over(Window.partitionBy(pmod(length(col("channel")), lit(1)))
          .orderBy(col("channel"))) - 1)
      .localCheckpoint()
    val nCh = channels.count().toInt
    require(nCh >= 1 && nCh <= 5, s"channel count out of range for exact Shapley: $nCh")
    val fp = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(min(struct(col("ts"), col("event_id"))).as("fp"))
    // touches strictly before the first purchase; users with no purchase
    // keep their whole stream and read converted = false
    val perUser = events.join(fp, Seq("user_id"), "left")
      .withColumn("converted", col("fp").isNotNull)
      .filter(col("event_type") =!= "purchase" &&
        (col("fp").isNull || struct(col("ts"), col("event_id")) < col("fp")))
      .join(broadcast(channels), col("event_type") === col("channel"))
      .groupBy(col("user_id"), col("converted"))
      .agg(expr("cast(bit_or(shiftleft(1, bit)) as int)").as("mask"))
    // journeys that purchased with ZERO prior touches (mask 0) come from
    // the anti side of the filter above: re-derive them from fp directly
    val bare = fp.join(perUser.select(col("user_id")), Seq("user_id"), "left_anti")
      .select(col("user_id"), lit(true).as("converted"), lit(0).as("mask"))
    val v = perUser.unionByName(bare)
      .groupBy(col("mask"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(converted as bigint)")).as("conv"))
      .select(col("mask"), expr("(conv * 1000000 + n div 2) div n").as("v_ppm"))
      .localCheckpoint()
    val spark = events.sparkSession
    val masks = spark.range(1L << nCh).select(col("id").cast(IntegerType).as("mask"))
      .join(v, Seq("mask"), "left")
      .select(col("mask"), coalesce(col("v_ppm"), lit(0L)).as("v_ppm"))
    val factTable = "array(1, 1, 2, 6, 24, 120)"
    val nFact = (1 to nCh).product
    channels.crossJoin(masks.select(col("mask").as("s"), col("v_ppm").as("v_s")))
      .filter(expr("(s & shiftleft(1, bit)) = 0"))
      .join(masks.select(col("mask").as("su"), col("v_ppm").as("v_su")),
        expr("su = s | shiftleft(1, bit)"))
      .select(col("channel"),
        expr(s"""element_at($factTable, bit_count(s) + 1)
          | * element_at($factTable, $nCh - 1 - bit_count(s) + 1)
          | * (v_su - v_s)""".stripMargin).as("term"))
      .groupBy(col("channel"))
      .agg(expr(s"sum(term) div ${nFact}L").as("phi_ppm"))
  }

  /** Conditional next-event entropy per state — the one-number
    * predictability read over [[eventTransitions]]' matrix:
    * H(next | from = a) = −Σ_b p·ln p in micro-nats. H ≈ 0 means the
    * state funnels deterministically (every `add_to_cart` goes to
    * `purchase`); ln(|types|) means it scatters uniformly — the signal
    * for WHERE journey modeling has any leverage. Each term is one
    * fixed-shape double over the exact integer pair counts, micros-
    * quantized before the per-state sum (the [[StatsOps.mutualInformation]]
    * discipline). Corpus-scale work is the same single user-keyed window
    * + (from,to) aggregate as the transition matrix; the entropy sum
    * runs on |types|² rows.
    */
  def transitionEntropy(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("from_total"), count(lit(1)).as("n_dest"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("from_total"), col("n_dest"),
        expr("""cast(round(
          |  -cast(n as double) / cast(from_total as double)
          |  * ln(cast(n as double) / cast(from_total as double)) * 1000000
          |) as bigint)""".stripMargin).as("term_micros"))
      .groupBy(col("from_type"), col("from_total"), col("n_dest"))
      .agg(sum(col("term_micros")).as("entropy_micros"))
  }

  /** Gaps-and-islands: the histogram of each customer's LONGEST streak of
    * consecutive order days. The island id is the classic rank-difference
    * trick (day_offset − per-customer row_number is constant exactly
    * while days are consecutive) — pure integer, and every window is
    * customer-keyed (parallel across the dimension; no customer's
    * history outgrows a task). Output is the #distinct-streak-length
    * histogram — driver-tiny at any corpus size.
    */
  def orderStreakHistogram(orders: DataFrame): DataFrame = {
    val d = orders.select(col("o_custkey").as("ck"),
      datediff(date_trunc("day", col("o_orderdate")).cast(DateType),
        lit("1995-01-01").cast(DateType)).cast(LongType).as("doff"))
      .distinct()
    val w = Window.partitionBy(col("ck")).orderBy(col("doff"))
    val islands = d.withColumn("island", col("doff") - row_number().over(w))
      .groupBy(col("ck"), col("island")).agg(count(lit(1)).as("len"))
    islands.groupBy(col("ck")).agg(max(col("len")).as("max_streak"))
      .groupBy(col("max_streak")).agg(count(lit(1)).as("n_customers"))
  }

  /** Inter-arrival profile per event type over each USER's stream: gap
    * seconds between a user's consecutive events of that type, rolled up
    * to (n_gaps, half-up mean, CV in ppm) per type. CV ≈ 1e6 is
    * memoryless Poisson arrival; below is metronomic (bot cadence);
    * above is bursty sessions — [[graft.operators.TextOps.tokenBurstiness]]'s
    * behavioral twin. The lag window is (user, type)-keyed (parallel
    * across users — never a per-type global sequence, which would
    * serialize a fact-scale type through one reducer). CV comes from
    * exact integer moments (Σg, Σg² in DECIMAL(38,0)) through ONE
    * fixed-shape double sqrt, micros-quantized — the momentsProfile
    * discipline.
    */
  def interarrivalProfile(events: DataFrame): DataFrame = {
    val D = DecimalType(38, 0)
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = events
      .select(col("user_id"), col("event_type"), col("ts"),
        unix_timestamp(col("ts")).as("sec"), col("event_id"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .filter(col("gap").isNotNull)
    gaps.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap").cast(D)).as("sg"),
        sum((col("gap") * col("gap")).cast(D)).as("sgg"))
      .filter(col("sg") > 0)
      .select(col("event_type"), col("n_gaps"),
        expr("cast((sg + n_gaps div 2) div n_gaps as bigint)").as("mean_gap_s"),
        // CV² = (n·Σg² − (Σg)²) / (Σg)²: exact integer cross terms, one
        // sqrt over the ratio of two doubles, ppm half-up
        expr("""cast(round(sqrt(
          |  cast(n_gaps * sgg - sg * sg as double) / cast(sg * sg as double))
          |  * 1000000) as bigint)""".stripMargin).as("cv_ppm"))
  }

  /** Seasonally-adjusted daily revenue outliers — the composition of
    * [[weekdaySeasonality]]'s baseline with a residual screen: each
    * day's cents against ITS WEEKDAY's mean (computed excluding nothing;
    * the baseline is the per-dow half-up mean), residual in signed ppm
    * of the baseline, flagged beyond ±`thresholdPpm`. Raw daily outlier
    * screens fire every weekend on any weekday-seasonal business; this
    * one only fires when a day breaks ITS OWN weekday's pattern. Pure
    * integer: portable dow, integer cents, one cross-multiplied ppm.
    * One (day) aggregate + a 7-row broadcast back.
    */
  def seasonalResidualOutliers(events: DataFrame,
                               thresholdPpm: Long = 500000L): DataFrame = {
    val daily = dailyCentsWithDow(events)
    val base = seasonalBaseline(events)
    seasonalResiduals(daily, base, thresholdPpm)
  }

  /** (day, cents, dow) daily rollup — the shared input of the batch
    * screen and the streaming monitor (portable epoch dow, integer
    * cents).
    */
  def dailyCentsWithDow(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
      .withColumn("dow",
        pmod(datediff(col("day"), lit("1995-01-01").cast(DateType)), lit(7))
          .cast(LongType))

  /** Per-weekday expected daily cents (half-up mean) — the 7-row
    * baseline artifact the streaming monitor persists and replays.
    */
  def seasonalBaseline(events: DataFrame): DataFrame =
    dailyCentsWithDow(events).groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("cents")).as("dow_cents"))
      .select(col("dow"),
        expr("(dow_cents + n_days div 2) div n_days").as("expected_cents"))

  /** Residual screen of a (day, cents, dow) frame against a given
    * 7-row baseline — the definition both the batch query and the
    * streaming `seasonalMonitorWriter` share verbatim.
    */
  def seasonalResiduals(daily: DataFrame, base: DataFrame,
                        thresholdPpm: Long = 500000L): DataFrame =
    daily.join(broadcast(base.select(col("dow"), col("expected_cents"))), Seq("dow"))
      .filter(col("expected_cents") =!= 0)
      .select(col("day"), col("dow"), col("cents"), col("expected_cents"),
        // sign split pins the negative-operand semantics explicitly
        // (both engines truncate toward zero — verified — but the split
        // keeps the contract visible and convention-proof)
        expr("""case when cents >= expected_cents
          |  then cast(cents - expected_cents as decimal(38,0)) * 1000000 div expected_cents
          |  else -(cast(expected_cents - cents as decimal(38,0)) * 1000000 div expected_cents)
          |end""".stripMargin).as("residual_ppm"))
      .filter(abs(col("residual_ppm")) > thresholdPpm)

  /** Integer truncated-kernel exponential smoothing weights for
    * [[ewmaRevenue]]: w_k = round(α(1−α)^k · 1e6) for k = 0..K−1 with
    * α = 0.3, K = 10 — ppm-quantized CONSTANTS shared verbatim by the
    * engine and the oracle, so the smoothing itself is an exact integer
    * dot product (no float ever crosses an engine boundary).
    */
  val ewmaWeightsPpm: Seq[Long] =
    (0 until 10).map(k => math.round(0.3 * math.pow(0.7, k) * 1e6))

  /** EWMA-smoothed daily revenue: s_d = Σ_k w_k·cents_{d−k} / Σ_k w_k over
    * the OBSERVED days inside the K-day kernel (the weight sum
    * renormalizes per row, so series edges and gap days aren't damped
    * toward zero — the sparse-series convention). The recursive EWMA is
    * deliberately unrolled into a truncated kernel: a recursion is a
    * sequential scan (one reducer at fact scale, and float state drift
    * across engines), while the kernel is one K-fold broadcast expand +
    * one partial aggregate — embarrassingly parallel, integer-exact, and
    * within (1−α)^K < 3% of the infinite-memory EWMA. Day arithmetic
    * rides the portable epoch offset x = datediff(day, 1995-01-01).
    */
  def ewmaRevenue(events: DataFrame): DataFrame = {
    val sp = events.sparkSession
    import sp.implicits._
    val daily = events
      .groupBy(date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
      .select(datediff(col("day"), lit("1995-01-01").cast(DateType))
        .cast(LongType).as("x"), col("cents"))
    val weights = ewmaWeightsPpm.zipWithIndex
      .map { case (w, k) => (k.toLong, w) }
      .toDF("k", "w")
    // scatter each day's cents onto the K target days it influences,
    // gather with the per-target weight sum, keep only REAL days
    val smoothed = daily.crossJoin(broadcast(weights))
      .select((col("x") + col("k")).as("x"), col("w"),
        (col("w") * col("cents")).as("wc"))
      .groupBy(col("x"))
      .agg(sum(col("wc")).as("swc"), sum(col("w")).as("sw"))
    daily.join(smoothed, Seq("x"))
      .select(
        expr("date_add(date '1995-01-01', cast(x as int))").as("day"),
        col("cents"),
        expr("(swc + sw div 2) div sw").as("ewma_cents"))
  }

  /** Item-item collaborative filtering over the props item key: cosine
    * similarity between items on their user co-interaction vectors
    * (binary), top-`k` neighbors per item — the classic "users who
    * touched A also touched B" recommender precompute. Cosine is
    * integer-quantized ppm: c_ab·1e6 is exactly representable, one
    * sqrt+division of exactly-agreed integers, half-up round. The
    * user-keyed self-join is the textbook pair bomb at scale, so users
    * with more than `maxUserItems` distinct items are excluded FIRST
    * (bot/crawler pathology; bounds per-user pair fan-out at
    * maxUserItems² and makes the shuffle volume ≤ users·cap²) — the
    * same df-style guard the jaccard/minhash family uses. Top-k per
    * item is a bounded window over the pair frame, keyed by item_a.
    */
  def itemSimilarity(events: DataFrame, k: Int = 3,
                     maxUserItems: Int = 50): DataFrame = {
    val ui = events
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("item"))
      .filter(col("item").isNotNull)
      .distinct()
    val okUsers = ui.groupBy(col("user_id")).agg(count(lit(1)).as("n_items"))
      .filter(col("n_items") <= maxUserItems)
      .select(col("user_id"))
    val bounded = ui.join(okUsers, Seq("user_id"))
    val nI = bounded.groupBy(col("item")).agg(count(lit(1)).as("n_i"))
    val pairs = bounded.select(col("user_id"), col("item").as("item_a"))
      .join(bounded.select(col("user_id"), col("item").as("item_b")), Seq("user_id"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("c_ab"))
    val scored = pairs
      .join(broadcast(nI.select(col("item").as("item_a"), col("n_i").as("n_a"))), Seq("item_a"))
      .join(broadcast(nI.select(col("item").as("item_b"), col("n_i").as("n_b"))), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("c_ab"),
        expr("cast(round(cast(c_ab as decimal(38,0)) * 1000000 / sqrt(cast(n_a * n_b as double))) as bigint)")
          .as("cosine_ppm"))
    val w = Window.partitionBy(col("item_a"))
      .orderBy(col("cosine_ppm").desc, col("item_b"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("item_a"), col("item_b"), col("c_ab"), col("cosine_ppm"),
        col("rk").cast(IntegerType).as("rk"))
  }

  /** Leave-one-out hit@k of the [[itemSimilarity]] recommender — the
    * eval that turns "we computed neighbor lists" into a number: hold
    * out ONE item per user (deterministically the max item id — a fixed
    * holdout, reproducible under retries and engines), rebuild the
    * co-interaction cosine on the remaining TRAIN interactions only (no
    * leakage), and count users whose held-out item appears in the top-k
    * SYMMETRIZED neighbor list of any of their train items. Same
    * per-user item cap as the recommender (bounds the pair fan-out);
    * everything after the capped self-join is item-dimension work.
    * Output is one row: evaluated users, hits, half-up ppm hit rate.
    */
  def itemRecHitrate(events: DataFrame, k: Int = 3,
                     maxUserItems: Int = 50): DataFrame = {
    val ui = events
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("item"))
      .filter(col("item").isNotNull)
      .distinct()
    val okUsers = ui.groupBy(col("user_id")).agg(count(lit(1)).as("n_items"))
      .filter(col("n_items") <= maxUserItems && col("n_items") >= 2)
      .select(col("user_id"))
    val bounded = ui.join(okUsers, Seq("user_id"))
    val hold = bounded.groupBy(col("user_id")).agg(max(col("item")).as("holdout"))
    val train = bounded.join(hold, Seq("user_id"))
      .filter(col("item") =!= col("holdout"))
      .select(col("user_id"), col("item"))
    val nI = train.groupBy(col("item")).agg(count(lit(1)).as("n_i"))
    val pairs = train.select(col("user_id"), col("item").as("item_a"))
      .join(train.select(col("user_id"), col("item").as("item_b")), Seq("user_id"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("c_ab"))
    val scored = pairs
      .join(broadcast(nI.select(col("item").as("item_a"), col("n_i").as("n_a"))), Seq("item_a"))
      .join(broadcast(nI.select(col("item").as("item_b"), col("n_i").as("n_b"))), Seq("item_b"))
      .select(col("item_a"), col("item_b"),
        expr("cast(round(cast(c_ab as decimal(38,0)) * 1000000 / sqrt(cast(n_a * n_b as double))) as bigint)")
          .as("cosine_ppm"))
    val sym = scored.select(col("item_a").as("src"), col("item_b").as("dst"), col("cosine_ppm"))
      .unionByName(scored.select(col("item_b").as("src"), col("item_a").as("dst"), col("cosine_ppm")))
    val wN = Window.partitionBy(col("src")).orderBy(col("cosine_ppm").desc, col("dst"))
    val topk = sym.withColumn("rk", row_number().over(wN))
      .filter(col("rk") <= k).select(col("src"), col("dst"))
    val evald = hold.agg(count(lit(1)).as("n_users"))
    val hits = train.select(col("user_id"), col("item").as("src"))
      .join(hold, Seq("user_id"))
      .join(topk, Seq("src"))
      .filter(col("dst") === col("holdout"))
      .select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_hits"))
    evald.crossJoin(broadcast(hits))
      .select(lit(k).as("k"), col("n_users"), col("n_hits"),
        when(col("n_users") === 0L, lit(null).cast(LongType))
          .otherwise(expr("(cast(n_hits as decimal(38,0)) * 1000000 + n_users div 2) div n_users"))
          .as("hitrate_ppm"))
  }

  /** Session path mining: the top-`k` most common 3-event paths inside
    * 30-minute-gap sessions — second-order, session-bounded sequence
    * structure that `eventTransitions` (first-order, unbounded) can't
    * see. One user-keyed window shuffle derives session ids AND the two
    * lookaheads; the path aggregate is |event types|³-bounded. (ts,
    * event_id) ordering keeps every lead deterministic under ties.
    */
  def sessionPaths(events: DataFrame, gapMinutes: Int = 30,
                   k: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessions = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      // µs-exact gap (unix_timestamp would truncate to seconds and flip
      // boundary ties vs the oracle's INTERVAL comparison)
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .withColumn("new_s",
        when(col("gap_us").isNull || col("gap_us") > gapMinutes * 60000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessions
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("s2", lead(col("session_id"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .withColumn("s3", lead(col("session_id"), 2).over(w))
      .filter(col("s2") === col("session_id") && col("s3") === col("session_id"))
      .groupBy(col("event_type").as("step1"), col("e2").as("step2"), col("e3").as("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(k)
  }

  /** Multi-touch attribution: every purchase distributes conversion
    * credit over the user's qualifying touches (view/click strictly
    * before the purchase, within `lookbackDays`) under the three
    * classic models at once — first-touch, last-touch, linear — summed
    * per touch channel in integer micros (half-up for linear's 1e6/n
    * split; first/last award the full 1e6). Deterministic: touch order
    * is (ts, event_id), so simultaneous touches can't flip first/last.
    * Scale shape: ONE user-keyed equi-join with a time-range residual
    * (the interval-join pattern `range_join` audits), then one window
    * over (user, purchase) pairs and a channel-cardinality aggregate.
    * Purchases with no qualifying touch get no row — organic
    * conversions are a separate count, not a fake channel.
    */
  def attributionCredit(events: DataFrame, lookbackDays: Int = 7): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val touches = events.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id").as("t_id"),
        col("event_type").as("channel"), col("ts").as("t_ts"))
    val joined = purchases.join(touches, Seq("user_id"))
      .filter(col("t_ts") < col("p_ts") &&
        col("t_ts") >= col("p_ts") - expr(s"INTERVAL $lookbackDays DAYS"))
    val perPurchase = Window.partitionBy(col("user_id"), col("p_id"))
    val asc = perPurchase.orderBy(col("t_ts"), col("t_id"))
    val desc = perPurchase.orderBy(col("t_ts").desc, col("t_id").desc)
    joined
      .withColumn("rk_first", row_number().over(asc))
      .withColumn("rk_last", row_number().over(desc))
      .withColumn("n_touch", count(lit(1)).over(perPurchase))
      .groupBy(col("channel"))
      .agg(
        count(lit(1)).as("n_touches"),
        sum(when(col("rk_first") === 1, 1000000L).otherwise(0L)).as("first_micros"),
        sum(when(col("rk_last") === 1, 1000000L).otherwise(0L)).as("last_micros"),
        sum(expr("(1000000L + n_touch div 2) div n_touch")).as("linear_micros"))
  }

  /** DAU / trailing-7-day WAU / stickiness per active day. The sliding
    * distinct-user count is exact without any sliding window state: each
    * (user, active-day) pair fans out to the 7 report days it supports
    * (a bounded 7× Generate), and a distinct+count per report day does
    * the rest — partial-aggregated, no self-join, no global window, the
    * same plan at any corpus size. Stickiness is half-up integer ppm of
    * dau/wau. Report days are the days with at least one active user
    * (the trailing window may also cover silent days; they produce no
    * row, matching how a daily job would emit).
    */
  def stickiness(events: DataFrame): DataFrame = {
    val userDays = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val dau = userDays.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = userDays
      .select(col("user_id"),
        explode(expr("sequence(day, date_add(day, 6))")).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        expr("(cast(dau as decimal(38,0)) * 1000000 + wau div 2) div wau").as("stickiness_ppm"))
  }

  def skewProfile(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    val top = counts
      .orderBy(col("cnt").desc, col(keyCol))
      .limit(topN)
    // A constant partition key keeps the single-partition frame (the
    // input is the post-TakeOrdered topN rows, bounded by construction)
    // while giving WindowExec a non-empty partition spec, silencing its
    // per-run "No Partition Defined" warning in every bench log. It must
    // be NON-FOLDABLE — `lit(0)` gets constant-folded out of the spec by
    // the optimizer (plan-verified) and the warning returns; pmod(cnt, 1)
    // is 0 for every row but survives as an attribute-referencing expr.
    val cum = Window.partitionBy(pmod(col("cnt"), lit(1)))
      .orderBy(col("cnt").desc, col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(total))
      .withColumn("cum_cnt", sum(col("cnt")).over(cum))
      .select(col(keyCol), col("cnt"),
        expr("(cast(cnt as decimal(38,0)) * 1000000 + total div 2) div total").as("share_ppm"),
        expr("(cum_cnt * 1000000L + total div 2) div total").as("cum_share_ppm"))
  }

  /** Per-type linear revenue trend: OLS slope of daily cents against the
    * day index (days since the corpus epoch — small integers, so every
    * moment stays well inside DECIMAL(38,0)). The closed form
    * (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) follows the `momentsProfile`
    * discipline: exact integer moments, the two polynomial terms agreed
    * exactly cross-engine, ONE double division quantized to micros.
    * One (type, day) aggregate + one per-type moment aggregate — map-side
    * combined, nothing global. Constant-day groups (B = 0) yield NULL.
    */
  def revenueTrend(events: DataFrame): DataFrame = {
    val D = DecimalType(38, 0)
    val daily = events
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
      .select(col("event_type"),
        datediff(col("day"), lit("1995-01-01").cast(DateType)).cast(LongType).as("x"),
        col("cents").as("y"))
    daily
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(D)).as("sx"), sum(col("y").cast(D)).as("sy"),
        sum((col("x") * col("x")).cast(D)).as("sxx"),
        sum((col("x") * col("y")).cast(D)).as("sxy"))
      .select(col("event_type"), col("n"),
        expr("n * sxy - sx * sy").as("A"), expr("n * sxx - sx * sx").as("B"))
      .select(col("event_type"), col("n").as("n_days"),
        when(col("B") =!= 0,
          expr("cast(round(cast(A as double) / cast(B as double) * 1000000) as bigint)"))
          .as("slope_micros"))
  }

  /** CUSUM changepoint scan per event type: the day where the running sum
    * of deviations from the series mean peaks in magnitude — the classic
    * single-changepoint estimator for "when did the level shift". The
    * deviation is kept integral by cross-multiplication
    * (cents·n − total, i.e. n× the true deviation), so the running sum,
    * the argmax, and the tiebreak (earliest day) are all exact integer
    * comparisons on any engine. One (type, day) aggregate, per-type
    * totals broadcast back, one type-keyed window pair over #days rows.
    */
  /** Day-of-week seasonality index over event revenue: per-weekday mean
    * daily cents vs the all-days mean, in ppm (1 000 000 = "an average
    * day"). The weekday is the PORTABLE integer
    * (day − 1995-01-01) mod 7 (the epoch is a Sunday ⇒ 0 = Sunday) —
    * Spark's `dayofweek` (Sunday=1) and DuckDB's (Sunday=0) conventions
    * never touch the oracled surface. The index is one fixed-shape double
    * cross-multiplication over exact longs
    * (cents_dow·days_all)/(days_dow·cents_all), ppm-quantized once.
    * Corpus-scale work is the single (day) aggregate; everything
    * after runs on ≤ 7 + 1 broadcast rows.
    */
  def weekdaySeasonality(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
    val byDow = daily
      .select(pmod(datediff(col("day"), lit("1995-01-01").cast(DateType)), lit(7))
        .cast(IntegerType).as("dow"), col("cents"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("cents")).as("cents"))
    val tot = byDow.agg(sum(col("n_days")).as("days_all"), sum(col("cents")).as("cents_all"))
    byDow.crossJoin(broadcast(tot))
      .select(col("dow"), col("n_days"), col("cents"),
        when(col("cents_all") =!= 0,
          expr("""cast(round(
            |  cast(cents as double) * cast(days_all as double)
            |  / (cast(n_days as double) * cast(cents_all as double))
            |  * 1000000) as bigint)""".stripMargin))
          .as("index_ppm"))
  }

  /** Autocorrelation of the daily-revenue series at lags 1..maxLag — the
    * "is there weekly structure / persistence" read next to
    * `revenueTrend`'s slope and `cusumChangepoint`'s level shift.
    * Mean-centering stays exact by cross-multiplication: with S = Σx over
    * n observed days, the centered term n·x_t − S is an exact long, the
    * lag products ride DECIMAL(38,0) (they reach ~10²³ — past both long
    * and double), and ACF_k = Σd_t·d_{t+k} / Σd_t² is ONE double division
    * micros-quantized per lag. t is the OBSERVED-day rank (gaps collapse
    * — documented choice; a calendar series would gap-fill first via
    * `gapFillDaily`). Corpus-scale work is the one (day) aggregate; the
    * lag self-join runs on the bounded day frame (≤ #days × maxLag rows).
    */
  def revenueAcf(events: DataFrame, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val D = DecimalType(38, 0)
    val daily = events
      .groupBy(date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
    val tRank = Window.partitionBy(pmod(col("cents"), lit(1))).orderBy(col("day"))
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
    val dev = daily
      .withColumn("t", row_number().over(tRank).cast(LongType))
      .crossJoin(broadcast(tot))
      .select(col("t"), (col("cents") * col("n") - col("s")).cast(D).as("d"))
    val den = dev.agg(sum(col("d") * col("d")).as("den"))
    val lags = dev.sparkSession.range(1, maxLag + 1).select(col("id").cast(IntegerType).as("lag"))
    dev.crossJoin(lags)
      .join(dev.select(col("t").as("t2"), col("d").as("d2")),
        col("t2") === col("t") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("d") * col("d2")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        when(col("den") =!= 0,
          expr("cast(round(cast(num as double) / cast(den as double) * 1000000) as bigint)"))
          .as("acf_micros"))
  }

  /** Ljung–Box portmanteau test on the daily-revenue ACF — the "is this
    * series white noise" yes/no that turns [[revenueAcf]]'s per-lag reads
    * into one decision number: Q = n(n+2)·Σ_{k≤h} r_k²/(n−k), compared
    * against the χ²(h) 95% critical value. Q is assembled integer-exact
    * from the micro-quantized ACF values: each lag's term is
    * (r_micros²·n·(n+2) + d/2) div d with d = (n−k)·10⁶ — DECIMAL(38,0)
    * carries the ~10¹⁸ product past long range — and Q_micro is their
    * sum. The critical value is a pinned literal (h=7 only; the repo has
    * no chi-square quantile function and a hardcoded table row keeps both
    * engines trivially identical). Scale: everything after the one
    * corpus (day) aggregate runs on the ≤ maxLag-row ACF frame.
    */
  def ljungBox(events: DataFrame, maxLag: Int = 7): DataFrame = {
    require(maxLag == 7, s"critical value pinned for h = 7, got $maxLag")
    val crit95Micro = 14067140L // chi-square 0.95 quantile, df = 7
    val n = events
      .select(date_trunc("day", col("ts")).cast(DateType).as("day"))
      .distinct()
      .agg(count(lit(1)).as("n"))
    revenueAcf(events, maxLag)
      .crossJoin(broadcast(n))
      .select(col("n"),
        expr("""(cast(acf_micros as decimal(38,0)) * acf_micros * n * (n + 2)
          | + cast((n - lag) as decimal(38,0)) * 500000)
          | div (cast((n - lag) as decimal(38,0)) * 1000000)""".stripMargin)
          .as("term"))
      .groupBy(col("n"))
      .agg(sum(col("term")).cast(LongType).as("q_micro"))
      .select(col("n").as("n_days"), lit(maxLag).as("h"), col("q_micro"),
        (col("q_micro") > crit95Micro).as("reject_white_noise_95"))
  }

  /** Kaplan–Meier signup→purchase conversion curve — the survival-
    * analysis read [[conversionLag]]'s converters-only quantiles miss:
    * users who never purchased are RIGHT-CENSORED at the observation
    * horizon (global max event ts), not dropped, so the curve is an
    * unbiased estimate of time-to-convert. At each death day t (first
    * purchase, in whole days since signup): n_risk = users whose event or
    * censor day ≥ t, d = conversions at t, and the survival estimate is
    * carried in LOG space as an exact integer — log_surv_micro =
    * Σ_{t_j ≤ t} round(10⁶·ln((n_j−d_j)/n_j)) — because the product form
    * would need a per-step quantized multiply chain while the log form is
    * a plain cumulative sum of per-step integers (each term one
    * fixed-shape double over exact counts, the repo's entropy-op
    * discipline; S(t) = exp(log/10⁶) for the reader). If a step consumes
    * every at-risk user (n = d, S hits exactly 0, log → −∞) that row and
    * all later rows carry NULL. Scale: one per-user reduction (first
    * signup, first qualifying purchase), then everything runs on the
    * distinct-day grid — dimension-scale, constant-key window idiom.
    */
  def kmConversion(events: DataFrame): DataFrame = {
    val horizon = events.agg(max(col("ts")).as("h_ts"))
    val signup = events.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
    val purchase = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    // min over the WHEN-guard (not a filter): a user whose purchases all
    // predate signup must censor at the horizon, not vanish from the set
    val perUser = signup
      .join(purchase, Seq("user_id"), "left")
      .groupBy(col("user_id"), col("signup_ts"))
      .agg(min(when(col("p_ts") >= col("signup_ts"), col("p_ts"))).as("purchase_ts"))
      .crossJoin(broadcast(horizon))
      .select(
        when(col("purchase_ts").isNotNull,
          expr("(unix_timestamp(purchase_ts) - unix_timestamp(signup_ts)) div 86400"))
          .otherwise(expr("(unix_timestamp(h_ts) - unix_timestamp(signup_ts)) div 86400"))
          .as("t_day"),
        col("purchase_ts").isNotNull.as("event"))
    // left-joined users with no purchase row at all still censor at horizon
    val grid = perUser.groupBy(col("t_day"))
      .agg(sum(expr("cast(event as bigint)")).as("d"),
        sum(expr("cast(not event as bigint)")).as("c"))
    val nTot = perUser.agg(count(lit(1)).as("n_tot"))
    val wBefore = Window.partitionBy(pmod(col("t_day"), lit(1))).orderBy(col("t_day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(pmod(col("t_day"), lit(1))).orderBy(col("t_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .crossJoin(broadcast(nTot))
      .withColumn("n_risk", col("n_tot") - coalesce(sum(col("d") + col("c")).over(wBefore), lit(0L)))
      .withColumn("term",
        when(col("d") === 0L, lit(0L))
          .when(col("n_risk") > col("d"),
            expr("cast(round(ln(cast(n_risk - d as double) / cast(n_risk as double)) * 1000000) as bigint)"))
          .otherwise(lit(null)))
      .withColumn("dead", max(when(col("term").isNull, 1).otherwise(0)).over(wCum))
      .withColumn("log_surv_micro",
        when(col("dead") === 1, lit(null)).otherwise(sum(col("term")).over(wCum)))
      .filter(col("d") > 0L)
      .select(col("t_day"), col("n_risk"), col("d").as("d_events"), col("log_surv_micro"))
  }

  /** Theil–Sen robust trend per event type: the MEDIAN of all pairwise
    * day-to-day slopes — the estimator that shrugs off the outlier days
    * OLS (`revenueTrend`) gets dragged by (breakdown point 29% vs 0%).
    * Each pairwise slope is ONE fixed-shape double over exact longs
    * quantized to micros; the median is the exact type-1 lower median
    * (rank ⌈n/2⌉ in (slope, xa, xb) order — integer rank arithmetic, no
    * interpolation semantics to diverge). The pair frame is #days² per
    * type — dimension-scale after the one corpus (type, day) aggregate,
    * same boundedness class as `conversionLag`'s converter set.
    */
  def theilSenTrend(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
      .select(col("event_type"),
        datediff(col("day"), lit("1995-01-01").cast(DateType)).cast(LongType).as("x"),
        col("cents"))
    val pairs = daily.select(col("event_type"), col("x").as("xa"), col("cents").as("ca"))
      .join(daily.select(col("event_type"), col("x").as("xb"), col("cents").as("cb")),
        Seq("event_type"))
      .filter(col("xa") < col("xb"))
      .select(col("event_type"), col("xa"), col("xb"),
        expr("""cast(round(cast(cb - ca as double)
          | / cast(xb - xa as double) * 1000000) as bigint)""".stripMargin)
          .as("slope_micros"))
    val wRank = Window.partitionBy(col("event_type"))
      .orderBy(col("slope_micros"), col("xa"), col("xb"))
    val wCnt = Window.partitionBy(col("event_type"))
    pairs
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n_pairs", count(lit(1)).over(wCnt))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("event_type"), col("n_pairs"), col("slope_micros"))
  }

  def cusumChangepoint(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
    val totals = daily.groupBy(col("event_type"))
      .agg(sum(col("cents")).as("total"), count(lit(1)).as("n_days"))
    val wRun = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPick = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("cusum_scaled")).desc, col("day"))
    daily
      .join(broadcast(totals), Seq("event_type"))
      .withColumn("cusum_scaled",
        sum(col("cents") * col("n_days") - col("total")).over(wRun))
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("change_day"),
        col("cusum_scaled"), col("n_days"))
  }

  /** Day-of-week × hour activity heatmap — the load-shape read behind
    * capacity planning and anomaly baselines: event count and integer-
    * cents value per (dow, hour) cell, with the share of the whole in
    * half-up ppm. Same sign-safe epoch-anchored dow as
    * `weekdaySeasonality` (pmod — portable, never negative); one keyed
    * partial-agg shuffle over ≤ 168 output cells.
    */
  def dowHourHeatmap(events: DataFrame): DataFrame = {
    val cells = events.select(
      pmod(datediff(date_trunc("day", col("ts")).cast(DateType),
        lit(java.sql.Date.valueOf("1995-01-01"))), lit(7)).cast(IntegerType).as("dow"),
      hour(col("ts")).as("hour"),
      expr("cast(round(value * 100) as bigint)").as("cents"))
      .groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n_events"),
        expr("cast(sum(cents) as bigint)").as("total_cents"))
    val tot = cells.agg(sum(col("n_events")).as("n_all"))
    cells.crossJoin(broadcast(tot))
      .select(col("dow"), col("hour"), col("n_events"), col("total_cents"),
        expr("(cast(n_events as decimal(38,0)) * 1000000 + n_all div 2) div n_all").as("share_ppm"))
  }

  /** Customer-value decile profile — the LTV concentration read: rank
    * customers by exact integer spend (sharded global rank — no single
    * reducer at a 10⁹-customer dimension), cut into 10 equal-count
    * deciles, and report each decile's population, spend, and share of
    * total in half-up ppm. Decile 9's share vs decile 0's is the classic
    * "top 10% carry X%" number; the whole profile prices a retention
    * program before anyone runs it.
    */
  def customerValueDeciles(orders: DataFrame): DataFrame = {
    val pc = orders.groupBy(col("o_custkey"))
      .agg(expr("cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)")
        .as("spend_cents"))
    val ranked = ShardedOrder.withGlobalRank(pc, "rk", 32,
      col("spend_cents"), col("o_custkey"))
    val n = pc.agg(count(lit(1)).as("n"),
      expr("cast(sum(spend_cents) as decimal(38,0))").as("total"))
    ranked.crossJoin(broadcast(n))
      .withColumn("decile", expr("cast(least(((rk - 1) * 10) div n, 9) as int)"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        expr("cast(sum(spend_cents) as bigint)").as("decile_cents"),
        expr("""cast((sum(cast(spend_cents as decimal(38,0))) * 1000000
          | + max(total) div 2) div max(total) as bigint)""".stripMargin)
          .as("share_ppm"))
  }

  /** Temporal train/validation split with an EMBARGO gap — the
    * time-series leakage rule `leakage_safe_split`'s hash split cannot
    * express: validation is the trailing `valDays` window, training ends
    * `embargoDays` BEFORE validation starts, and the gap rows are
    * dropped (features with any lookback — trailing averages, session
    * state — would otherwise leak validation-period signal into
    * training; the embargo must be ≥ the longest feature lookback).
    * Purely derived from the data's own max day, so the split is a
    * deterministic function of the table (replayable, no wall clock).
    * Output is the audit row per split: counts, user reach, and the
    * [from_day, to_day] bounds — disjoint with a visible gap by
    * construction. One aggregate + one broadcast + one grouped pass.
    */
  def temporalSplitEmbargo(events: DataFrame, valDays: Int = 28,
                           embargoDays: Int = 7): DataFrame = {
    require(valDays >= 1 && embargoDays >= 0,
      s"bad window: valDays=$valDays embargoDays=$embargoDays")
    val days = events.select(col("user_id"),
      date_trunc("day", col("ts")).cast(DateType).as("day"))
    val mx = days.agg(max(col("day")).as("max_day"))
    days.crossJoin(broadcast(mx))
      .withColumn("split",
        when(col("day") > date_sub(col("max_day"), valDays), lit("val"))
          .when(col("day") <= date_sub(col("max_day"), valDays + embargoDays),
            lit("train"))
          .otherwise(lit("embargo")))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("day")).as("from_day"), max(col("day")).as("to_day"))
  }

  /** Event-time lateness profile — the WATERMARK PLANNER: how far behind
    * the running event-time high-water mark does each event arrive, in
    * arrival order (event_id — the append sequence both engines share)?
    * The bucketed histogram per event type (on-time / ≤1 min / ≤1 h /
    * ≤1 day / beyond) is exactly the evidence a streaming deploy needs
    * to pick `withWatermark`'s delay: the smallest bucket bound covering
    * ~all mass is the delay that loses ~nothing. The running max is the
    * sharded prefix-max ([[ShardedOrder.withRunningMax]]) — never a
    * one-reducer global window over the fact stream; lateness stays in
    * exact integer micros.
    */
  def latenessProfile(events: DataFrame): DataFrame = {
    val base = events.select(col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"))
    val scanned = ShardedOrder.withRunningMax(
      base, col("ts_us"), "prev_max", 32, col("event_id"))
    val bucketed = scanned.select(col("event_type"),
      greatest(coalesce(col("prev_max") - col("ts_us"), lit(0L)), lit(0L)).as("late_us"))
      .select(col("event_type"), col("late_us"),
        when(col("late_us") === 0, 0)
          .when(col("late_us") <= 60L * 1000000L, 1)
          .when(col("late_us") <= 3600L * 1000000L, 2)
          .when(col("late_us") <= 86400L * 1000000L, 3)
          .otherwise(4).as("bucket"))
    val counts = bucketed.groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n_events"), max(col("late_us")).as("max_late_us"))
    val tot = counts.groupBy(col("event_type")).agg(sum(col("n_events")).as("n_type"))
    counts.join(broadcast(tot), Seq("event_type"))
      .select(col("event_type"), col("bucket").cast(IntegerType).as("bucket"),
        col("n_events"), col("max_late_us"),
        expr("(cast(n_events as decimal(38,0)) * 1000000 + n_type div 2) div n_type").as("share_ppm"))
  }

  /** Trailing 6-month OLS revenue slope — the momentum read between
    * [[rollingCorr]] (co-movement) and [[EventOps]]' Theil–Sen (global
    * robust trend): per month, the least-squares slope of revenue cents
    * on the month index over the trailing window. Window sums are exact
    * integers over the month DIMENSION (constant-key window over ≤ a few
    * hundred rows — the repo idiom for series frames); the slope is ONE
    * double ratio of the integer normal-equation terms, in micros of
    * cents/month. NULL until the window has two distinct x (den = 0).
    */
  def rollingRegressionSlope(events: DataFrame, window: Int = 6): DataFrame = {
    val D = DecimalType(38, 0)
    val monthly = events.filter(col("event_type") === "purchase")
      .groupBy(date_trunc("month", col("ts")).cast(DateType).as("month"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("y"))
      .withColumn("x",
        months_between(col("month"), lit("1995-01-01").cast(DateType)).cast(LongType))
    val w = Window.partitionBy(pmod(col("x"), lit(1))).orderBy(col("month"))
      .rowsBetween(-(window - 1), Window.currentRow)
    monthly
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y").cast(D)).over(w))
      .withColumn("sxy", sum((col("x").cast(D) * col("y")).cast(D)).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .select(col("month"), col("y").as("rev_cents"), col("n").as("n_win"),
        when(col("n") * col("sxx") === col("sx") * col("sx"), lit(null).cast(LongType))
          .otherwise(expr("""cast(round(
            |  cast(n * sxy - sx * sy as double)
            |  / cast(n * sxx - sx * sx as double) * 1000000) as bigint)""".stripMargin))
          .as("slope_micros"))
  }

  /** Sample-ratio-mismatch check (the experimentation platform's first
    * data-quality gate): users are assigned to arms by a deterministic
    * parity rule both engines share, and the observed split is tested
    * against the designed 50/50 with the exact binomial normal
    * approximation z = (2·n_a − N)/√N. A |z| > 3 experiment is broken
    * BEFORE any treatment-effect read is meaningful. One distinct-user
    * aggregate; all integers until the final fixed-shape z.
    */
  def abSrmCheck(events: DataFrame): DataFrame =
    events.select(col("user_id")).distinct()
      .select(pmod(col("user_id"), lit(2)).as("arm"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"))
      .select(col("n"), col("n_a"),
        when(col("n") === 0, lit(null).cast(LongType))
          .otherwise(expr("""cast(round(cast(2 * n_a - n as double)
            | / sqrt(cast(n as double)) * 1000000) as bigint)""".stripMargin))
          .as("z_micros"))
      .withColumn("srm", abs(col("z_micros")) > 3000000L)

  /** Hurst exponent of the daily revenue series by rescaled-range (R/S)
    * analysis (Hurst 1951; Mandelbrot's long-memory diagnostic): H ≈ 0.5
    * is a random walk, H > 0.5 persistent trending, H < 0.5 mean-
    * reverting — the read that says whether [[rollingRegressionSlope]]'s
    * momentum is real structure or noise. Per block size s ∈ {8,16,32,64}:
    * full blocks of the day-indexed series, range of cumulative
    * deviations over the block, rescaled by the block SD. The algebra is
    * arranged so every input to the one ln() per block is an EXACT
    * integer: cumdev numerators ride s·Σxᵢ − t·sum (denominator s cancels
    * against the SD's), so ln(R/S) = ln(R_num/√(s·Σx² − sum²)). H is the
    * 4-point log-log OLS slope with PINNED ln(s) micros constants.
    * All windows run on the day/block dimension (constant-key idiom).
    */
  def hurstExponent(events: DataFrame): DataFrame = {
    val D = DecimalType(38, 0)
    val daily = events.filter(col("event_type") === "purchase")
      .groupBy(date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("x"))
    val wIdx = Window.partitionBy(pmod(col("x"), lit(1))).orderBy(col("day"))
    val idxed = daily.withColumn("idx", row_number().over(wIdx) - 1)
    val lnS = Map(8 -> 2079442L, 16 -> 2772589L, 32 -> 3465736L, 64 -> 4158883L)
    // per-block cumdev needs the BLOCK TOTAL inside the running
    // expression — block totals first, then the running scan joins them
    val rows = lnS.keys.toSeq.sorted.map { s =>
      val blocks = idxed
        .withColumn("blk", expr(s"idx div $s"))
        .withColumn("pos", expr(s"idx % $s"))
      val totals = blocks.groupBy(col("blk"))
        .agg(count(lit(1)).as("m"), sum(col("x").cast(D)).as("sm"),
          sum((col("x").cast(D) * col("x")).cast(D)).as("sq"))
        .filter(col("m") === s)
      val wBlk = Window.partitionBy(col("blk")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val scans = blocks.join(broadcast(totals.select(col("blk"), col("sm"), col("sq"))),
          Seq("blk"))
        .withColumn("cs", sum(col("x").cast(D)).over(wBlk))
        .withColumn("t", count(lit(1)).over(wBlk))
        .withColumn("dev_num", (col("cs") * lit(s) - col("t").cast(D) * col("sm")).cast(D))
        .groupBy(col("blk"))
        .agg((max(col("dev_num")) - min(col("dev_num"))).cast(D).as("r_num"),
          max((col("sq") * lit(s) - col("sm") * col("sm")).cast(D)).as("q"))
      scans
        .filter(col("q") > 0 && col("r_num") > 0)
        .select(expr("""cast(round(ln(cast(r_num as double) / sqrt(cast(q as double)))
          | * 1000000) as bigint)""".stripMargin).as("ln_rs"))
        .agg(count(lit(1)).as("n_blocks"), sum(col("ln_rs")).as("s_ln"))
        .select(lit(s).as("s"), lit(lnS(s)).as("ln_s_micros"), col("n_blocks"),
          // double mean, not integer div: s_ln can be negative and the
          // engines' integer divisions disagree on negative truncation
          expr("""case when n_blocks = 0 then null
            | else cast(round(cast(s_ln as double) / cast(n_blocks as double)) as bigint)
            | end""".stripMargin)
            .as("avg_ln_rs_micros"))
    }.reduce(_ union _)
    val pts = rows.filter(col("n_blocks") > 0).localCheckpoint()
    val slope = pts.agg(count(lit(1)).as("k"),
        sum(col("ln_s_micros")).as("sx"), sum(col("avg_ln_rs_micros")).as("sy"),
        sum(col("ln_s_micros") * col("avg_ln_rs_micros")).as("sxy"),
        sum(col("ln_s_micros") * col("ln_s_micros")).as("sxx"))
      .select(when(col("k") < 2 || col("k") * col("sxx") === col("sx") * col("sx"),
        lit(null).cast(LongType))
        .otherwise(expr("""cast(round(cast(k * sxy - sx * sy as double)
          | / cast(k * sxx - sx * sx as double) * 1000000) as bigint)""".stripMargin))
        .as("h_micros"))
    pts.crossJoin(broadcast(slope))
      .select(col("s"), col("n_blocks"), col("avg_ln_rs_micros"), col("h_micros"))
  }

  /** Page–Hinkley drift statistic over the daily revenue series (Page
    * 1954; the sequential-analysis sibling of [[cusumChangepoint]], which
    * tests against a FIXED reference mean — PH tracks the RUNNING mean,
    * so it fires on slow drifts CUSUM's fixed baseline absorbs). Per day:
    * deviation from the running mean quantized to integer micro-cents
    * (one fixed-shape double per row — the running mean is the only
    * rational), then integer cumulative m_t and its running minimum; the
    * monitor's alarm statistic is the gap ph = m_t − min m. Series
    * windows ride the constant-key idiom over the day dimension.
    */
  def pageHinkley(events: DataFrame): DataFrame = {
    val daily = events.filter(col("event_type") === "purchase")
      .groupBy(date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("x"))
    val wc = Window.partitionBy(pmod(col("x"), lit(1))).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("i", count(lit(1)).over(wc))
      .withColumn("cs", sum(col("x")).over(wc))
      .withColumn("term_micros", expr(
        """cast(round((cast(x as double) - cast(cs as double) / cast(i as double))
          | * 1000000) as bigint)""".stripMargin))
      .withColumn("mt_micros", sum(col("term_micros")).over(wc))
      .withColumn("min_mt", min(col("mt_micros")).over(wc))
      .select(col("day"), col("x").as("rev_cents"), col("mt_micros"),
        (col("mt_micros") - col("min_mt")).as("ph_micros"))
  }

  /** Classical additive seasonal decomposition of daily purchase revenue
    * — rev = trend + seasonal + residual, the series read that UNIFIES
    * the repo's separate trend ([[theilSenTrend]]), weekday-pattern
    * ([[weekdaySeasonality]]) and outlier ([[seasonalResidualOutliers]])
    * ops into per-day components a forecaster can subtract. Trend is the
    * centered 7-day moving average (full windows only — the first/last 3
    * days are excluded rather than padded, the honest convention);
    * seasonal is the per-weekday mean of the detrended series,
    * re-centered so the seven indices sum to ~0; residual is the exact
    * integer remainder.
    *
    * Determinism: day cents are exact integers; the MA, the weekday
    * means, and the recentering mean are each ONE fixed-shape double
    * over integer sums quantized back to cents (negative-safe — no
    * integer `div`, whose truncation differs from DuckDB's floor `//`
    * on negatives). All windows ride the constant-key idiom over the
    * day dimension; facts collapse in the one groupBy.
    */
  def seasonalDecompose(events: DataFrame): DataFrame = {
    val daily = events.filter(col("event_type") === "purchase")
      .groupBy(date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
    val wMa = Window.partitionBy(pmod(col("cents"), lit(1))).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val trended = daily
      .withColumn("w_n", count(lit(1)).over(wMa))
      .withColumn("w_s", sum(col("cents")).over(wMa))
      .filter(col("w_n") === 7)
      .withColumn("trend_cents",
        expr("cast(round(cast(w_s as double) / 7.0d) as bigint)"))
      .withColumn("detr", col("cents") - col("trend_cents"))
      .withColumn("dow", pmod(datediff(col("day"), lit("1995-01-01").cast(DateType)), lit(7)))
    val seas = trended.groupBy(col("dow"))
      .agg(sum(col("detr")).as("ds"), count(lit(1)).as("dn"))
      .withColumn("raw_seas",
        expr("cast(round(cast(ds as double) / cast(dn as double)) as bigint)"))
    val center = seas.agg(sum(col("raw_seas")).as("cs"), count(lit(1)).as("ck"))
    val seasonal = seas.crossJoin(broadcast(center))
      .select(col("dow"),
        (col("raw_seas") - expr("cast(round(cast(cs as double) / cast(ck as double)) as bigint)"))
          .as("seasonal_cents"))
    trended.join(broadcast(seasonal), Seq("dow"))
      .select(col("day"), col("cents"), col("trend_cents"), col("seasonal_cents"),
        (col("detr") - col("seasonal_cents")).as("residual_cents"))
  }

  /** Trend/seasonality STRENGTH (Wang–Hyndman features) over
    * [[seasonalDecompose]]'s components — the two numbers that let a
    * fleet of series be triaged without eyeballing plots:
    * F_T = max(0, 1 − Var(R)/Var(T+R)) (how much the deseasonalized
    * series is trend), F_S = max(0, 1 − Var(R)/Var(S+R)) (how much the
    * detrended series is seasonality). Variances are exact integer
    * moments over the day dimension (components can be negative — sums
    * are fine, no integer division anywhere); each strength is ONE
    * fixed-shape double ratio, ppm-quantized and clamped at 0.
    */
  def stlStrength(events: DataFrame): DataFrame = {
    val D = DecimalType(38, 0)
    val comp = seasonalDecompose(events)
      .select(col("residual_cents").as("r"),
        (col("trend_cents") + col("residual_cents")).as("ds"),
        (col("seasonal_cents") + col("residual_cents")).as("dt"))
    comp.agg(count(lit(1)).as("n"),
        sum(col("r").cast(D)).as("sr"), sum((col("r").cast(D) * col("r")).cast(D)).as("qr"),
        sum(col("ds").cast(D)).as("sds"), sum((col("ds").cast(D) * col("ds")).cast(D)).as("qds"),
        sum(col("dt").cast(D)).as("sdt"), sum((col("dt").cast(D) * col("dt")).cast(D)).as("qdt"))
      .select(col("n"),
        when(expr("cast(qds as double) * n - cast(sds as double) * cast(sds as double)") <= 0.0,
          lit(0L))
          .otherwise(greatest(lit(0L), expr("""cast(round((1.0d
            | - (cast(qr as double) * n - cast(sr as double) * cast(sr as double))
            |   / (cast(qds as double) * n - cast(sds as double) * cast(sds as double)))
            | * 1000000) as bigint)""".stripMargin)))
          .as("trend_strength_ppm"),
        when(expr("cast(qdt as double) * n - cast(sdt as double) * cast(sdt as double)") <= 0.0,
          lit(0L))
          .otherwise(greatest(lit(0L), expr("""cast(round((1.0d
            | - (cast(qr as double) * n - cast(sr as double) * cast(sr as double))
            |   / (cast(qdt as double) * n - cast(sdt as double) * cast(sdt as double)))
            | * 1000000) as bigint)""".stripMargin)))
          .as("seasonal_strength_ppm"))
  }

  /** Difference-in-differences over the parity experiment — the
    * quasi-experimental read when assignment can't be trusted to
    * randomize LEVELS but can be trusted to randomize TRENDS: compare
    * each arm's post-vs-pre change in per-user purchase revenue, and
    * difference the changes. The repeated-cross-section formulation:
    * four (arm × period) cells, DiD = (ȳ₁ᵖᵒˢᵗ − ȳ₁ᵖʳᵉ) −
    * (ȳ₀ᵖᵒˢᵗ − ȳ₀ᵖʳᵉ), SE = √Σ s²_g/n_g over the four cells, t = DiD/SE.
    * One per-user pass collects pre/post cents; cell moments ride
    * DECIMAL(38,0); DiD/SE/t are fixed-shape doubles quantized to
    * milli-cents / micros. Everything after the user aggregate runs on
    * a 4-row cell frame.
    */
  def diffInDiff(events: DataFrame, cutoff: String = "2024-01-16"): DataFrame = {
    val D = DecimalType(38, 0)
    val perUser = events.groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "purchase" &&
          col("ts") < lit(cutoff).cast(TimestampType),
          expr("cast(round(value * 100) as bigint)")).otherwise(0L)).as("pre"),
        sum(when(col("event_type") === "purchase" &&
          col("ts") >= lit(cutoff).cast(TimestampType),
          expr("cast(round(value * 100) as bigint)")).otherwise(0L)).as("post"))
      .select(pmod(col("user_id"), lit(2)).as("arm"), col("pre"), col("post"))
    // long (arm, period, value) frame -> 4 cell moment rows
    val cells = perUser
      .select(col("arm"), lit(0).as("period"), col("pre").as("v"))
      .unionByName(perUser.select(col("arm"), lit(1).as("period"), col("post").as("v")))
      .groupBy(col("arm"), col("period"))
      .agg(count(lit(1)).as("n"), sum(col("v").cast(D)).as("s"),
        sum((col("v").cast(D) * col("v")).cast(D)).as("q"))
      .select(col("arm"), col("period"), col("n"),
        expr("cast(s as double) / cast(n as double)").as("mean"),
        // s²/n per cell, nullif-guarded for a degenerate 1-user cell
        expr("""(cast(q as double) * cast(n as double) - cast(s as double) * cast(s as double))
          | / nullif(cast(n as double) * cast(n as double) * cast(n - 1 as double), 0.0d)""".stripMargin)
          .as("vn"))
    val w = cells.groupBy()
      .agg(
        sum(when(col("arm") === 1 && col("period") === 1, col("mean"))).as("m11"),
        sum(when(col("arm") === 1 && col("period") === 0, col("mean"))).as("m10"),
        sum(when(col("arm") === 0 && col("period") === 1, col("mean"))).as("m01"),
        sum(when(col("arm") === 0 && col("period") === 0, col("mean"))).as("m00"),
        sum(col("vn")).as("var_sum"), min(col("n")).as("min_cell_n"),
        sum(col("n")).as("n_obs"),
        sum(when(col("vn").isNull, 1L).otherwise(0L)).as("n_degenerate"))
    w.select(col("n_obs"), col("min_cell_n"),
      expr("cast(round(((m11 - m10) - (m01 - m00)) * 1000) as bigint)").as("did_milli"),
      when(col("n_degenerate") > 0 || col("var_sum").isNull || col("var_sum") <= 0.0,
        lit(null).cast(LongType))
        .otherwise(expr("cast(round(sqrt(var_sum) * 1000) as bigint)")).as("se_milli"),
      when(col("n_degenerate") > 0 || col("var_sum").isNull || col("var_sum") <= 0.0,
        lit(null).cast(LongType))
        .otherwise(expr(
          "cast(round(((m11 - m10) - (m01 - m00)) / sqrt(var_sum) * 1000000) as bigint)"))
        .as("t_micros"))
  }

  /** Per-transition two-proportion z-tests over the signup→click→
    * purchase funnel, arm vs arm — [[funnelConversion]] says WHERE users
    * drop; this says whether the experiment MOVED either transition.
    * Stage membership reuses the funnel's strictly-ordered first-times;
    * arms are the user-parity rule shared with [[abConversionZtest]].
    * One row per transition with the pooled-variance z in micros
    * (NULL when a transition is unanimous — zero pooled variance).
    */
  def funnelStageZtest(events: DataFrame,
                       stages: Seq[String] = Seq("signup", "click", "purchase")): DataFrame = {
    require(stages.length == 3, "three-stage funnel")
    val s0 = events.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
    val s1 = events.filter(col("event_type") === stages(1))
      .join(s0, Seq("user_id")).filter(col("ts") > col("t0"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = events.filter(col("event_type") === stages(2))
      .join(s1, Seq("user_id")).filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    def transition(base: DataFrame, next: DataFrame, label: String): DataFrame = {
      val conv = base.select(col("user_id"))
        .join(next.select(col("user_id")).withColumn("c", lit(1L)), Seq("user_id"), "left")
        .select(pmod(col("user_id"), lit(2)).as("arm"),
          coalesce(col("c"), lit(0L)).as("c"))
      val arms = conv.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("k"))
      val a = arms.filter(col("arm") === 0).select(col("n").as("n_a"), col("k").as("c_a"))
      val b = arms.filter(col("arm") === 1).select(col("n").as("n_b"), col("k").as("c_b"))
      a.crossJoin(broadcast(b))
        .select(lit(label).as("transition"),
          col("n_a"), col("c_a"), col("n_b"), col("c_b"),
          when(col("c_a") + col("c_b") === 0 ||
            col("c_a") + col("c_b") === col("n_a") + col("n_b"),
            lit(null).cast(LongType))
            .otherwise(expr("""cast(round(
              |  (cast(c_a as double) / cast(n_a as double)
              |   - cast(c_b as double) / cast(n_b as double))
              |  / sqrt(cast(c_a + c_b as double) / cast(n_a + n_b as double)
              |         * (1.0d - cast(c_a + c_b as double) / cast(n_a + n_b as double))
              |         * (1.0d / cast(n_a as double) + 1.0d / cast(n_b as double)))
              |  * 1000000) as bigint)""".stripMargin)).as("z_micro"))
    }
    transition(s0, s1, "1->2").unionByName(transition(s1, s2, "2->3"))
  }

  /** CUPED (Deng et al. 2013) — variance-reduced experiment readout:
    * adjust each arm's post-period metric by θ·(pre-period metric −
    * global pre mean), with θ = cov(pre, post)/var(pre) estimated on
    * the POOLED users (the standard, assignment-independent choice).
    * Here pre = view count before the cutoff, post = purchase cents on
    * or after it, arms = the same user-parity rule as
    * [[abConversionZtest]] — so the two ops read the same experiment.
    *
    * Determinism: per-user (x, y) are exact integers from one grouped
    * pass; all moments ride DECIMAL(38,0); θ is ONE fixed-shape double
    * QUANTIZED TO MICROS FIRST, and every downstream expression consumes
    * the quantized θ — so adjusted means and the variance-reduction
    * ratio are bit-identical on any engine. Everything after the
    * per-user aggregate runs on a 2-row arm frame.
    */
  def cupedAdjustment(events: DataFrame, cutoff: String = "2024-01-16"): DataFrame = {
    val D = DecimalType(38, 0)
    val perUser = events.groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "view" &&
          col("ts") < lit(cutoff).cast(TimestampType), 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase" &&
          col("ts") >= lit(cutoff).cast(TimestampType),
          expr("cast(round(value * 100) as bigint)")).otherwise(0L)).as("y"))
      .select(pmod(col("user_id"), lit(2)).as("arm"), col("x"), col("y"))
    val mo = perUser.agg(count(lit(1)).as("n"),
      sum(col("x").cast(D)).as("sx"), sum(col("y").cast(D)).as("sy"),
      sum((col("x").cast(D) * col("x")).cast(D)).as("qx"),
      sum((col("x").cast(D) * col("y")).cast(D)).as("qxy"),
      sum((col("y").cast(D) * col("y")).cast(D)).as("qy"))
    val withTheta = mo.select(col("*"),
      when(expr("cast(qx as double) * n - cast(sx as double) * cast(sx as double)") <= 0.0,
        lit(null).cast(LongType))
        .otherwise(expr("""cast(round(
          |  (cast(qxy as double) * n - cast(sx as double) * cast(sy as double))
          |  / (cast(qx as double) * n - cast(sx as double) * cast(sx as double))
          |  * 1000000) as bigint)""".stripMargin))
        .as("theta_micros"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x").cast(D)).as("sxa"), sum(col("y").cast(D)).as("sya"))
    arms.crossJoin(broadcast(withTheta))
      .select(col("arm"), col("n_users"), col("theta_micros"),
        expr("cast(round(cast(sya as double) / n_users * 1000) as bigint)")
          .as("mean_y_milli"),
        when(col("theta_micros").isNull, lit(null).cast(LongType))
          .otherwise(expr("""cast(round((cast(sya as double) / n_users
            |  - cast(theta_micros as double) / 1000000.0d
            |    * (cast(sxa as double) / n_users - cast(sx as double) / n)) * 1000) as bigint)""".stripMargin))
          .as("adj_mean_milli"),
        // variance of the CUPED residual y − θq·x vs raw y, global ppm
        when(col("theta_micros").isNull ||
          expr("cast(qy as double) * n - cast(sy as double) * cast(sy as double)") <= 0.0,
          lit(null).cast(LongType))
          .otherwise(greatest(lit(0L), expr("""cast(round((1.0d -
            |  ((cast(qy as double) * n - cast(sy as double) * cast(sy as double))
            |   - 2.0d * (cast(theta_micros as double) / 1000000.0d)
            |     * (cast(qxy as double) * n - cast(sx as double) * cast(sy as double))
            |   + (cast(theta_micros as double) / 1000000.0d) * (cast(theta_micros as double) / 1000000.0d)
            |     * (cast(qx as double) * n - cast(sx as double) * cast(sx as double)))
            |  / (cast(qy as double) * n - cast(sy as double) * cast(sy as double)))
            | * 1000000) as bigint)""".stripMargin)))
          .as("var_reduction_ppm"))
  }
}
