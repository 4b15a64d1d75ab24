package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Statistical profiling tier ([EXT] — the EDA/data-quality reads an
  * analytics warehouse serves next to its marts: distribution histograms,
  * categorical-independence tests, rank correlation). The reference's BI
  * layer delegates these to Metabase visuals; here each is a Spark
  * aggregate with the repo's cross-engine determinism discipline.
  *
  * Determinism pattern shared by all three: anything that feeds a
  * comparison or a sum is either pure INTEGER arithmetic (cents, ranks,
  * squared rank gaps) or a FIXED-SHAPE double expression over
  * exactly-representable integers quantized to micros BEFORE the final
  * sum — the `momentsProfile` lesson (closed forms over exact integers
  * are bit-identical everywhere; running float accumulators are not).
  */
object StatsOps {

  /** Equi-width histogram in pure integer arithmetic: values quantized to
    * cents, bin = (v − min) · bins div (max − min + 1) — the +1 keeps the
    * max value inside the last bin with no float edge anywhere. Bounds
    * ride a broadcast 1-row frame; one partial-agg shuffle for the
    * counts. Empty bins are absent by construction (COUNT over observed
    * bins), which both engines agree on.
    */
  def histogram(df: DataFrame, valCol: String, bins: Int = 20): DataFrame = {
    require(bins >= 1, s"bins must be positive, got $bins")
    val cents = df.select(expr(s"cast(round($valCol * 100) as bigint)").as("v"))
    val bounds = cents.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    cents.crossJoin(broadcast(bounds))
      .select(expr(s"(v - mn) * $bins div (mx - mn + 1)").as("bin"),
        col("mn"), col("mx"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        // bin edges re-derived from the broadcast bounds — integer floor
        // division mirrors the binning arithmetic exactly
        min(expr(s"mn + (bin * (mx - mn + 1)) div $bins")).as("lo_cents"),
        min(expr(s"mn + ((bin + 1) * (mx - mn + 1)) div $bins - 1")).as("hi_cents"))
  }

  /** EQUI-DEPTH histogram — the quantile-spaced companion to the
    * equi-width [[histogram]]: bins hold (approximately) equal ROW
    * counts, so a skewed money distribution gets resolution where the
    * mass is instead of 18 empty bins and 2 full ones. Exact and
    * deterministic: per-distinct-value counts, the exact sharded
    * cumulative ([[ShardedOrder]] — no single-reducer window at any
    * value cardinality), and each distinct value assigned to the bin of
    * its FIRST row in value order (`(cum_lt · bins) div n` — ties never
    * split across bins, the property per-row ntile gets wrong). Output
    * rows are (bin, n, lo_cents, hi_cents); bins can hold unequal counts
    * exactly where heavy ties force it, which is the honest answer.
    */
  def histogramEquiDepth(df: DataFrame, valCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be positive, got $bins")
    val cnt = df.select(expr(s"cast(round($valCol * 100) as bigint)").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("k"))
    val cum = ShardedOrder.withRunningSum(cnt, col("k"), "cum_le", 32, col("v"))
    val tot = cnt.agg(sum(col("k")).as("n"))
    cum.crossJoin(broadcast(tot))
      .select(col("v"), col("k"),
        expr(s"cast(((cum_le - k) * $bins) div n as int)").as("bin"))
      .groupBy(col("bin"))
      .agg(sum(col("k")).as("n"), min(col("v")).as("lo_cents"),
        max(col("v")).as("hi_cents"))
  }

  /** Pearson chi-square test of independence between two categorical
    * columns. Observed/row/column totals are exact longs; each cell's
    * (obs·n − rowtot·coltot)²/(n·rowtot·coltot) term is ONE fixed-shape
    * double expression over exactly-representable integers (all inputs
    * < 2^53), quantized to micros, then SUMMED AS INTEGERS — so the
    * statistic is bit-identical on any engine and any partitioning.
    * (The textbook Σ(O−E)²/E over float expectations would be neither.)
    * Cells and marginals are bounded by category cardinalities —
    * broadcast scale; the only corpus-scale work is the (a, b) count.
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("obs"))
    val rowTot = obs.groupBy(col("a")).agg(sum(col("obs")).as("rt"))
    val colTot = obs.groupBy(col("b")).agg(sum(col("obs")).as("ct"))
    val n = obs.agg(sum(col("obs")).as("n"),
      countDistinct(col("a")).as("na"), countDistinct(col("b")).as("nb"))
    // the FULL a x b grid, not just observed cells: an empty cell still
    // contributes its expectation (term = E = rt*ct/n) — dropping it
    // understates the statistic exactly when dependence is strongest
    rowTot.crossJoin(broadcast(colTot))
      .join(obs, Seq("a", "b"), "left")
      .withColumn("obs", coalesce(col("obs"), lit(0L)))
      .crossJoin(broadcast(n))
      .select(
        expr("""cast(round(
          |  (cast(obs * n - rt * ct as double) * cast(obs * n - rt * ct as double))
          |  / (cast(n as double) * cast(rt as double) * cast(ct as double)) * 1000000
          |) as bigint)""".stripMargin).as("term_micros"),
        col("n"), col("na"), col("nb"))
      .groupBy(col("n"), ((col("na") - 1) * (col("nb") - 1)).as("dof"))
      .agg(sum(col("term_micros")).as("chi2_micros"))
      .select(col("n"), col("dof"), col("chi2_micros"))
  }

  /** Mutual information between two categorical columns, in micro-nats —
    * chi-square's effect-size companion (chi² says "dependent or not";
    * MI says HOW MUCH knowing one tells you about the other, on a scale
    * comparable across tables). I = Σ p(a,b)·ln(p(a,b)/(p(a)p(b))) over
    * OBSERVED cells only (the 0·ln0 = 0 convention makes empty cells
    * contribute exactly nothing, so unlike [[chiSquare]] no full-grid
    * expansion is needed). Determinism: each cell term is one
    * fixed-shape double expression over exact integer counts
    * (obs·n / (rt·ct) never crosses a running accumulator), quantized
    * to micros BEFORE the final sum — the same discipline that keeps
    * chi-square and Benford bit-identical cross-engine. Scale shape:
    * one (a,b) partial aggregate at corpus scale; the marginals and the
    * term sum run on the |a|·|b| observed grid — dimension-scale.
    */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("obs"))
    val rowTot = obs.groupBy(col("a")).agg(sum(col("obs")).as("rt"))
    val colTot = obs.groupBy(col("b")).agg(sum(col("obs")).as("ct"))
    val n = obs.agg(sum(col("obs")).as("n"),
      countDistinct(col("a")).as("na"), countDistinct(col("b")).as("nb"))
    obs.join(broadcast(rowTot), Seq("a"))
      .join(broadcast(colTot), Seq("b"))
      .crossJoin(broadcast(n))
      .select(
        expr("""cast(round(
          |  cast(obs as double) / cast(n as double)
          |  * ln(cast(obs as double) * cast(n as double)
          |       / (cast(rt as double) * cast(ct as double))) * 1000000
          |) as bigint)""".stripMargin).as("term_micros"),
        col("n"), col("na"), col("nb"))
      .groupBy(col("n"), col("na"), col("nb"))
      .agg(sum(col("term_micros")).as("mi_micros"))
      .select(col("n"), col("na"), col("nb"), col("mi_micros"))
  }

  /** Cumulative Poisson(1) CDF thresholds scaled to u32 — the shared
    * integer constants behind [[bootstrapCi]]'s deterministic resample
    * weights: a uniform u32 hash draw u maps to weight
    * w = #{k : t_k ≤ u}, which is Poisson(1)-distributed to within the
    * 2⁻³² quantization. Truncated at 8 (P(W > 8) < 1e-8).
    */
  val poissonU32: Seq[Long] = {
    val e1 = math.exp(-1.0)
    var fact = 1.0
    var cum = 0.0
    (0 to 7).map { k =>
      if (k > 0) fact *= k
      cum += e1 / fact
      math.round(cum * 4294967296.0)
    }
  }

  /** Poisson-bootstrap confidence interval for a mean — the distributed
    * bootstrap (Chamandy et al., "Estimating uncertainty for massive data
    * streams"): a classical resample-with-replacement needs coordinated
    * sampling of n rows B times; the Poisson approximation gives every
    * row an INDEPENDENT Poisson(1) multiplicity per replicate, so the
    * whole thing is one stateless map over a B-fold broadcast expand +
    * one (replicate) partial aggregate — no global state, no second scan,
    * embarrassingly parallel at any corpus size (compute scales linearly
    * in B; B = 32 here). Weights come from the portable md5 lottery
    * (`key_b` → u32 → inverse-CDF through [[poissonU32]]), so both
    * engines draw IDENTICAL resamples and the whole output is exact
    * integer: per-replicate half-up mean in cents, CI = the 2nd and
    * (B−1)th order statistics of the B replicate means (≈ the 93.75%
    * percentile interval), selected via one sort of a B-row array —
    * dimension-scale, no global window.
    */
  def bootstrapCi(df: DataFrame, keyCol: String, valCol: String,
                  bRes: Int = 32): DataFrame = {
    require(bRes >= 4, s"bRes out of range: $bRes")
    val sp = df.sparkSession
    import sp.implicits._
    val reps = (0 until bRes).map(_.toLong).toDF("b")
    val base = df.select(col(keyCol).cast(StringType).as("k"),
      expr(s"cast(round($valCol * 100) as bigint)").as("cents"))
    val wExpr = poissonU32.map(t => s"cast(u >= $t as int)").mkString(" + ")
    val rs = base.crossJoin(broadcast(reps))
      .select(col("cents"),
        col("b"),
        expr("cast(conv(substr(md5(concat(k, '_', cast(b as string))), 1, 8), 16, 10) as bigint)")
          .as("u"))
      .select(col("cents"), col("b"), expr(s"cast($wExpr as bigint)").as("w"))
      .groupBy(col("b"))
      .agg(sum(col("w") * col("cents")).as("swc"), sum(col("w")).as("sw"))
      .select(col("b"),
        when(col("sw") > 0, expr("(swc + sw div 2) div sw")).as("mean_b"))
    val full = base.agg(count(lit(1)).as("n"),
      expr("cast((sum(cents) + count(1) div 2) div count(1) as bigint)").as("mean_cents"))
    val ci = rs.agg(
      expr(s"element_at(sort_array(collect_list(struct(mean_b, b))), 2).mean_b")
        .as("ci_lo_cents"),
      expr(s"element_at(sort_array(collect_list(struct(mean_b, b))), ${bRes - 1}).mean_b")
        .as("ci_hi_cents"),
      count(lit(1)).as("n_resamples"))
    full.crossJoin(broadcast(ci))
      .select(col("n"), col("mean_cents"), col("ci_lo_cents"),
        col("ci_hi_cents"), col("n_resamples"))
  }

  /** Gini coefficient of a positive money column — the inequality read
    * next to `skewProfile`'s top-N concentration: one number for "how
    * unequal is spend across customers". Closed form over the ascending
    * (value, id) ranking: G = (2·Σi·x_i − (n+1)·Σx) / (n·Σx) — ranks and
    * cents are exact integers, cross terms ride DECIMAL(38,0) (the
    * momentsProfile discipline), ONE double division quantized to
    * micros. The ranking is the sharded exact global rank
    * ([[ShardedOrder.withGlobalRank]]: range-shard + per-shard window +
    * one-row-per-shard carry), so the profile holds at FACT scale — a
    * 10⁹-customer frame ranks across shards, not through one reducer;
    * zero-total frames yield NULL.
    */
  def giniMicros(df: DataFrame, idCol: String, valCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    ShardedOrder.withGlobalRank(
        df.select(col(idCol), col(valCol).cast(LongType).as("x")),
        "i", 32, col("x"), col(idCol))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(D)).as("sx"),
        sum((col("i").cast(D)) * (col("x").cast(D))).as("six"))
      .select(col("n"),
        when(col("sx") =!= 0,
          expr("""cast(round(
            |  cast(2 * six - (n + 1) * sx as double)
            |  / cast(n * sx as double) * 1000000) as bigint)""".stripMargin))
          .as("gini_micros"))
  }

  /** Herfindahl–Hirschman concentration index per group, in ppm:
    * HHI = Σ share² = Σx² / (Σx)² — both moments exact decimals, one
    * fixed-shape double division. 10 000 ppm ≈ the US-DOJ "highly
    * concentrated" 0.25 threshold × 1e6 scale. One keyed partial-agg
    * shuffle; no window at all (unlike Gini, HHI needs no ranking).
    */
  def hhiPpm(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    df.select(col(groupCol), col(valCol).cast(LongType).as("x"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_members"),
        sum(col("x").cast(D)).as("sx"),
        sum((col("x").cast(D)) * (col("x").cast(D))).as("sxx"))
      .select(col(groupCol), col("n_members"),
        when(col("sx") =!= 0,
          expr("""cast(round(
            |  cast(sxx as double) / (cast(sx as double) * cast(sx as double))
            |  * 1000000) as bigint)""".stripMargin))
          .as("hhi_ppm"))
  }

  /** Benford first-digit audit — the classic fabricated-figures screen
    * over a money column: natural multi-scale amounts follow
    * P(d) = log10(1 + 1/d); invented ones cluster on round or uniform
    * leading digits. The digit comes from the CENTS integer's decimal
    * string (no float formatting anywhere); the expectation is a
    * fixed-shape double over the INTEGER digit, ppm-quantized, so both
    * engines emit identical rows. One partial-agg pass; 9 output rows.
    */
  def benfordAudit(df: DataFrame, valCol: String): DataFrame =
    df.select(expr(s"cast(round($valCol * 100) as bigint)").as("cents"))
      .filter(col("cents") > 0)
      .select(substring(col("cents").cast(StringType), 1, 1).cast(IntegerType).as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(
        df.select(expr(s"cast(round($valCol * 100) as bigint)").as("c"))
          .filter(col("c") > 0).agg(count(lit(1)).as("total"))))
      .select(col("digit"), col("n"),
        expr("(cast(n as decimal(38,0)) * 1000000 + total div 2) div total").as("share_ppm"),
        expr("cast(round(ln(1.0d + 1.0d / cast(digit as double)) / ln(10.0d) * 1000000) as bigint)")
          .as("benford_ppm"))

  /** Benford SECOND-digit audit — the forensic follow-up to
    * [[benfordAudit]]: fabricated numbers that survive the first-digit
    * screen (people know about Benford now) usually fail the flatter
    * second-digit law P(d) = Σ_{k=1..9} log₁₀(1 + 1/(10k + d)). Same
    * construction: digit from the CENTS integer's decimal string (no
    * float formatting), expectation one fixed-shape double chain over
    * integer literals, ppm-quantized; values below 10 cents have no
    * second digit and drop. One partial-agg pass; 10 output rows.
    */
  def benfordSecondDigit(df: DataFrame, valCol: String): DataFrame = {
    val expected = "(" + (1 to 9).map(k =>
      s"ln(1.0d + 1.0d / cast(10 * $k + digit as double))").mkString(" + ") +
      ") / ln(10.0d)"
    df.select(expr(s"cast(round($valCol * 100) as bigint)").as("cents"))
      .filter(col("cents") >= 10)
      .select(substring(col("cents").cast(StringType), 2, 1).cast(IntegerType).as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(
        df.select(expr(s"cast(round($valCol * 100) as bigint)").as("c"))
          .filter(col("c") >= 10).agg(count(lit(1)).as("total"))))
      .select(col("digit"), col("n"),
        expr("(cast(n as decimal(38,0)) * 1000000 + total div 2) div total").as("share_ppm"),
        expr(s"cast(round($expected * 1000000) as bigint)").as("benford_ppm"))
  }

  /** p-chart control limits on the daily error share — classic SPC over
    * the event stream: per day, the error proportion against the
    * whole-series center line p̄ with 3σ binomial limits
    * UCL/LCL = p̄ ± 3·√(p̄(1−p̄)/n_day); days outside the limits are
    * special-cause signals (deploys, outages), where [[EventOps]]'
    * anomaly ops watch VALUE levels this watches a RATE. Center and
    * limits are fixed-shape doubles over exact counts, ppm-quantized,
    * LCL floored at 0. One corpus (day) aggregate + a broadcast totals
    * row.
    */
  def errorPchart(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(event_type = 'error' as bigint)")).as("n_err"))
    val tot = daily.agg(sum(col("n")).as("nt"), sum(col("n_err")).as("et"))
    daily.crossJoin(broadcast(tot))
      .select(col("day"), col("n"), col("n_err"),
        expr("(cast(n_err as decimal(38,0)) * 1000000 + n div 2) div n").as("err_ppm"),
        expr("""cast(round((cast(et as double) / cast(nt as double)
          | + 3.0d * sqrt(cast(et as double) / cast(nt as double)
          |     * (1.0d - cast(et as double) / cast(nt as double))
          |     / cast(n as double))) * 1000000) as bigint)""".stripMargin).as("ucl_ppm"),
        expr("""cast(round(greatest(cast(et as double) / cast(nt as double)
          | - 3.0d * sqrt(cast(et as double) / cast(nt as double)
          |     * (1.0d - cast(et as double) / cast(nt as double))
          |     / cast(n as double)), 0.0d) * 1000000) as bigint)""".stripMargin).as("lcl_ppm"))
      .withColumn("out_of_control",
        col("err_ppm") > col("ucl_ppm") || col("err_ppm") < col("lcl_ppm"))
  }

  /** Two-sample Kolmogorov–Smirnov drift test: for each source, the max
    * ECDF gap between that source's document-length distribution and the
    * REST of the corpus — the distribution-shape alarm next to
    * `sourceDrift`'s token-mixture KL (KL sees vocabulary shift; KS sees
    * length/truncation shift a token mixture can hide). Exact by
    * cross-multiplication: at each observed value v,
    * |cum_src·n_rest − cum_rest·n_src| rides DECIMAL(38,0) (cum·n is
    * ~10²⁰ at a 10¹⁰-doc corpus — past long), the max is an
    * integer argmax with an earliest-value tiebreak, and
    * D_ppm = (max·1e6 + den/2) div den with den = n_src·n_rest — half-up
    * integer division end-to-end, no double ever crossed. Corpus-scale work is the single (source, value)
    * aggregate; the cumulative windows run on the #sources × #distinct
    * values grid (dimension-scale — the full grid, not just observed
    * cells, because an ECDF step on one side must be visible to the
    * other).
    */
  def ksSourceDrift(documents: DataFrame, valCol: String = "n_chars"): DataFrame =
    ksSourceCore(documents.groupBy(col("source"), col(valCol).as("v"))
      .agg(count(lit(1)).as("c")))

  /** Bucketed-ECDF fallback for `ksSourceDrift` at fact-scale VALUE
    * cardinality: the exact grid is #sources × #distinct values — fine
    * for thousands of distinct lengths, quadratic pain if the drift
    * column is near-continuous (10⁸ distinct values → a 10⁹-row grid at
    * 20 sources). Binning first caps the grid at #sources × `bins`
    * regardless of the raw cardinality; the result is the exact KS of
    * the BINNED distributions, which under-reads the true D by at most
    * the largest within-bin ECDF step (the classic histogram-sketch
    * trade, same integer binning as [[histogram]]). When
    * bins ≥ value range the bin map is injective and the statistic
    * equals the exact one — the spec pins that equivalence.
    */
  def ksSourceDriftBinned(documents: DataFrame, valCol: String = "n_chars",
                          bins: Int = 20): DataFrame = {
    require(bins >= 1, s"bins out of range: $bins")
    val vals = documents.select(col("source"), col(valCol).cast(LongType).as("x"))
    val b = vals.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val cnt = vals.crossJoin(broadcast(b))
      .select(col("source"), expr(s"(x - mn) * $bins div (mx - mn + 1)").as("v"))
      .groupBy(col("source"), col("v")).agg(count(lit(1)).as("c"))
    ksSourceCore(cnt).withColumnRenamed("at_value", "at_bin")
  }

  private def ksSourceCore(cnt: DataFrame): DataFrame = {
    val D = DecimalType(38, 0)
    val totals = cnt.groupBy(col("source")).agg(sum(col("c")).as("n_src"))
    val grand = totals.agg(sum(col("n_src")).as("n_all"))
    val values = cnt.select(col("v")).distinct()
    val wSrc = Window.partitionBy(col("source")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(pmod(col("ca"), lit(1))).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumAll = cnt.groupBy(col("v")).agg(sum(col("c")).as("ca"))
      .withColumn("cum_all", sum(col("ca")).over(wAll))
      .select(col("v"), col("cum_all"))
    val wPick = Window.partitionBy(col("source"))
      .orderBy(col("gap").desc, col("v"))
    totals.crossJoin(values)
      .join(cnt, Seq("source", "v"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cum_src", sum(col("c")).over(wSrc))
      .join(cumAll, Seq("v"))
      .crossJoin(broadcast(grand))
      .select(col("source"), col("v"), col("n_src"),
        (col("n_all") - col("n_src")).as("n_rest"),
        abs(col("cum_src").cast(D) * (col("n_all") - col("n_src")).cast(D)
          - (col("cum_all") - col("cum_src")).cast(D) * col("n_src").cast(D)).as("gap"))
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("source"), col("n_src"), col("v").as("at_value"),
        // Pure integer half-up division (r10 advice): no double crossing.
        // gap·1e6 ≤ (n_src·n_rest)·1e6 ~ 1e26 at a 10¹⁰-doc corpus, well
        // inside DECIMAL(38,0); `div` (IntegralDivide) yields BIGINT.
        when(col("n_rest") =!= 0,
          expr("""cast((gap * 1000000
            | + (cast(n_src as decimal(38,0)) * cast(n_rest as decimal(38,0))) div 2)
            | div (cast(n_src as decimal(38,0)) * cast(n_rest as decimal(38,0)))
            | as bigint)""".stripMargin))
          .as("ks_ppm"))
  }

  /** Two-sample KS of a batch against a FIXED reference distribution
    * (given as per-value counts) — the building block the streaming
    * drift monitor shares with the batch query, so the stream's audit
    * rows are provably the batch computation per micro-batch. Same
    * integer cross-multiplied ECDF machinery as `ksSourceDrift`; one
    * audit row out (n_batch, n_ref, at_value, ks_ppm).
    */
  def ksAgainstReference(values: DataFrame, refCounts: DataFrame): DataFrame = {
    val D = DecimalType(38, 0)
    val b = values.groupBy(col("v")).agg(count(lit(1)).as("cb"))
    val r = refCounts.groupBy(col("v")).agg(sum(col("c")).as("cr"))
    val grid = b.join(r, Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("cb"), lit(0L)).as("cb"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    val w = Window.partitionBy(pmod(col("cb"), lit(1))).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = grid.agg(sum(col("cb")).as("n_batch"), sum(col("cr")).as("n_ref"))
    val wPick = Window.partitionBy(pmod(col("gap"), lit(1)))
      .orderBy(col("gap").desc, col("v"))
    grid
      .withColumn("cum_b", sum(col("cb")).over(w))
      .withColumn("cum_r", sum(col("cr")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("v"), col("n_batch"), col("n_ref"),
        abs(col("cum_b").cast(D) * col("n_ref").cast(D)
          - col("cum_r").cast(D) * col("n_batch").cast(D)).as("gap"))
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("n_batch"), col("n_ref"), col("v").as("at_value"),
        // same half-up integer division as ksSourceDrift (shared definition
        // is the point: the streaming drift monitor reuses this function)
        when(col("n_batch") > 0 && col("n_ref") > 0,
          expr("""cast((gap * 1000000
            | + (cast(n_batch as decimal(38,0)) * cast(n_ref as decimal(38,0))) div 2)
            | div (cast(n_batch as decimal(38,0)) * cast(n_ref as decimal(38,0)))
            | as bigint)""".stripMargin))
          .as("ks_ppm"))
  }

  /** Binned fixed-reference KS — the streaming face of the bucketed
    * fallback: the REFERENCE distribution defines the bin edges (min/max
    * of the healthy baseline), so every arriving batch bins into the
    * same stable grid and per-batch audit rows are comparable across the
    * stream's lifetime (batch-derived edges would re-bucket history on
    * every spike). Values outside the reference range clamp to the edge
    * bins — an out-of-range flood lands all its mass in one edge bucket,
    * which maximizes (not hides) the statistic. Same core as
    * [[ksAgainstReference]] over bin indices.
    */
  def ksAgainstReferenceBinned(values: DataFrame, refCounts: DataFrame,
                               bins: Int = 20): DataFrame = {
    require(bins >= 1, s"bins out of range: $bins")
    val b = refCounts.agg(min(col("v")).cast(LongType).as("mn"),
      max(col("v")).cast(LongType).as("mx"))
    val binExpr = expr(
      s"greatest(least((cast(v as bigint) - mn) * $bins div (mx - mn + 1), $bins - 1), 0)")
    ksAgainstReference(
      values.crossJoin(broadcast(b)).select(binExpr.as("v")),
      refCounts.crossJoin(broadcast(b)).select(binExpr.as("v"), col("c")))
      .withColumnRenamed("at_value", "at_bin")
  }

  /** Spearman rank correlation, deterministic variant: ranks are
    * row_number in (value, id) order — a documented tiebreak instead of
    * the statistical average-rank convention, which keeps every rank an
    * exact integer (Σd² is then exact, and the closed form
    * 1 − 6Σd²/(n(n²−1)) is one fixed-shape double over exact integers,
    * micros-quantized). Both rankings use the sharded exact global rank
    * ([[ShardedOrder.withGlobalRank]]), so the correlation is computed
    * across shards at fact scale — no single-reducer rank window.
    */
  def spearmanMicros(df: DataFrame, idCol: String, xCol: String, yCol: String): DataFrame = {
    val ranked = ShardedOrder.withGlobalRank(
      ShardedOrder.withGlobalRank(
        df.select(col(idCol), col(xCol), col(yCol)),
        "rx", 32, col(xCol), col(idCol)),
      "ry", 32, col(yCol), col(idCol))
    ranked
      .select((col("rx") - col("ry")).as("d"))
      .agg(count(lit(1)).as("n"), sum(col("d") * col("d")).as("sd2"))
      .select(col("n"),
        expr("""cast(round(
          |  (1.0d - (6.0d * cast(sd2 as double))
          |   / (cast(n as double) * (cast(n as double) * cast(n as double) - 1.0d)))
          |  * 1000000) as bigint)""".stripMargin).as("rho_micros"))
  }

  /** One-way ANOVA F over an integer-cents measure by a categorical
    * column — the "do group MEANS differ" companion to [[chiSquare]]
    * (categorical×categorical) and the KS family (distribution shape):
    * F = (SSB/(k−1)) / (SSW/(n−k)). Sum decomposition runs on EXACT
    * integers: Q = Σx² and per-group (n_g, s_g) are DECIMAL(38,0)
    * aggregates; the between-group term a_g = 10⁶·s_g²/n_g is ONE
    * fixed-shape double per GROUP quantized to micro-cents² before the
    * k-row sum (IEEE mul/div only — no libm), so group enumeration
    * order cannot drift the hash; likewise the grand term 10⁶·s²/n.
    * F and η² (effect size, SSB/SST) quantize once at the end. One
    * partial-agg shuffle to the k-row grid; nothing else touches the
    * corpus.
    */
  def anovaF(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val cents = df.select(col(groupCol).as("g"),
      expr(s"cast(round($valCol * 100) as bigint)").as("v"))
    val perGroup = cents.groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"), sum(col("v").cast(D)).as("s_g"),
        sum((col("v").cast(D) * col("v")).cast(D)).as("q_g"))
      .select(col("n_g"), col("s_g"), col("q_g"),
        // fixed-shape per-group double, quantized before the k-row sum
        expr("""cast(round(cast(s_g as double) * cast(s_g as double)
          | / cast(n_g as double) * 1000000) as decimal(38,0))""".stripMargin)
          .as("a_micro"))
    perGroup
      .agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        sum(col("s_g")).as("s"), sum(col("q_g")).as("q"),
        sum(col("a_micro")).as("a_micro"))
      .select(col("k"), col("n"),
        expr("""cast(round(cast(s as double) * cast(s as double)
          | / cast(n as double) * 1000000) as decimal(38,0))""".stripMargin)
          .as("b_micro"),
        col("q"), col("a_micro"))
      .select(col("k"), col("n"),
        (col("a_micro") - col("b_micro")).as("ssb_micro"),
        (col("q").cast(D) * lit(1000000).cast(D) - col("a_micro")).as("ssw_micro"))
      .select(col("k"), col("n"),
        when(col("ssw_micro") === 0 || col("k") <= 1 || col("n") <= col("k"),
          lit(null).cast(LongType))
          .otherwise(expr("""cast(round(
            |  (cast(ssb_micro as double) / (k - 1))
            |  / (cast(ssw_micro as double) / (n - k)) * 1000000) as bigint)""".stripMargin))
          .as("f_micro"),
        // NOT the usual integer half-up division: Spark's IntegralDivide
        // on DECIMAL(38,0) operands drops the last unit once the numerator
        // passes ~28 digits (measured: 1.83e27 div 3.15e23 = 5806, exact
        // 5807) — the quantized double division is the exact-replay form
        when(col("ssb_micro") + col("ssw_micro") === 0, lit(null).cast(LongType))
          .otherwise(expr("""cast(round(cast(ssb_micro as double)
            | / cast(ssb_micro + ssw_micro as double) * 1000000) as bigint)""".stripMargin))
          .as("eta2_ppm"))
  }

  /** Cramér's V — the [0, 1] effect size that makes [[chiSquare]]'s
    * statistic comparable across tables: V = √(χ²/(n·min(r−1, c−1))).
    * One sqrt over the integer chi2_micros and exact counts (IEEE sqrt
    * is correctly rounded — deterministic), quantized to micros.
    */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dims = df.agg(countDistinct(col(aCol)).as("na"),
      countDistinct(col(bCol)).as("nb"))
    chiSquare(df, aCol, bCol)
      .crossJoin(broadcast(dims))
      .select(col("n"), col("dof"), col("chi2_micros"),
        when(col("na") <= 1 || col("nb") <= 1, lit(null).cast(LongType))
          .otherwise(expr("""cast(round(sqrt(
            |  (cast(chi2_micros as double) / 1000000.0d)
            |  / (cast(n as double) * least(na - 1, nb - 1))) * 1000000) as bigint)""".stripMargin))
          .as("v_micros"))
  }

  /** Population Stability Index between two halves of the data — the
    * scorecard-monitoring drift number next to the KS family: bin the
    * measure on the GLOBAL equi-width grid ([[histogram]] arithmetic),
    * then PSI = Σ (p_i − q_i)·ln(p_i/q_i) over the grid. Shares are
    * half-up integer ppm clamped to ≥ 1 (the standard epsilon for empty
    * cells — ln must stay finite); each bin's term is one fixed-shape
    * double over the two integer ppm shares, micros-quantized before
    * the ≤ bins-row sum. The conventional read: < 0.1 stable,
    * 0.1–0.2 moderate, > 0.2 drifted (flag emitted at 0.2). Split
    * membership is a pure column predicate the caller provides.
    */
  def psi(df: DataFrame, valCol: String, inRefSql: String, bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be positive, got $bins")
    val cents = df.select(expr(s"cast(round($valCol * 100) as bigint)").as("v"),
      expr(inRefSql).as("in_ref"))
    val bounds = cents.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    val binned = cents.crossJoin(broadcast(bounds))
      .select(expr(s"(v - mn) * $bins div (mx - mn + 1)").as("bin"), col("in_ref"))
      .groupBy(col("bin"))
      .agg(sum(expr("cast(in_ref as bigint)")).as("na"),
        sum(expr("cast(not in_ref as bigint)")).as("nb"))
    val tots = binned.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
    binned.crossJoin(broadcast(tots))
      .select(col("ta"), col("tb"),
        expr("greatest((cast(na as decimal(38,0)) * 1000000 + ta div 2) div ta, 1L)").as("p_ppm"),
        expr("greatest((cast(nb as decimal(38,0)) * 1000000 + tb div 2) div tb, 1L)").as("q_ppm"))
      .select(col("ta"), col("tb"),
        expr("""cast(round((p_ppm - q_ppm)
          | * ln(cast(p_ppm as double) / cast(q_ppm as double))) as bigint)""".stripMargin)
          .as("term_micro"))
      .groupBy(col("ta").as("n_ref"), col("tb").as("n_cur"))
      .agg(sum(col("term_micro")).as("psi_micro"))
      .withColumn("drifted", col("psi_micro") > 200000L)
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) — the nonparametric two-sample
    * location test the warehouse reaches for when [[anovaF]]'s normality
    * assumption is indefensible (price distributions are famously
    * heavy-tailed). Rank arithmetic is EXACT and fact-scale-safe: ranks
    * come from the per-distinct-value cumulative count (a
    * [[ShardedOrder.withRunningSum]] over the value dimension — never a
    * one-reducer global window over rows), average ranks are carried in
    * HALF-UNITS (2·cum_before + t + 1, an integer — no /2 float anywhere),
    * and the tie correction Σ(t³−t) rides DECIMAL(38,0). One fixed-shape
    * double expression at the end produces the normal-approximation
    * z-score in micros: z = (U₁ − n₁n₂/2) / √Var with
    * Var = n₁n₂(N(N²−1) − T)/(12N(N−1)).
    */
  def mannWhitneyU(df: DataFrame, groupCol: String, valCol: String,
                   groupA: String, groupB: String): DataFrame = {
    val D = DecimalType(38, 0)
    val cents = df
      .filter(col(groupCol).isin(groupA, groupB))
      .select((col(groupCol) === groupA).as("in_a"),
        expr(s"cast(round($valCol * 100) as bigint)").as("v"))
    val byVal = cents.groupBy(col("v"))
      .agg(count(lit(1)).as("t"),
        sum(when(col("in_a"), 1L).otherwise(0L)).as("t_a"))
    val cum = ShardedOrder.withRunningSum(byVal, col("t"), "cum_incl", 32, col("v"))
      .withColumn("cum_before", col("cum_incl") - col("t"))
    cum
      .agg(
        sum(col("t_a")).as("n1"),
        sum(col("t") - col("t_a")).as("n2"),
        sum((col("t_a").cast(D) *
          (lit(2).cast(D) * col("cum_before") + col("t") + 1)).cast(D)).as("r1_half"),
        sum((col("t").cast(D) * col("t") * col("t") - col("t")).cast(D)).as("ties_cubed"))
      .select(col("n1"), col("n2"),
        (col("r1_half") - (col("n1").cast(D) * (col("n1") + 1))).cast(D).as("u1_half"),
        col("ties_cubed"))
      .select(col("n1"), col("n2"), col("u1_half").cast(LongType).as("u1_half"),
        when(col("n1") === 0 || col("n2") === 0 ||
          expr("""cast(n1 + n2 as double) * (cast(n1 + n2 as double) * cast(n1 + n2 as double) - 1.0d)
            | - cast(ties_cubed as double)""".stripMargin) <= 0.0,
          lit(null).cast(LongType))
          .otherwise(expr("""cast(round(
            |  (cast(u1_half as double) - cast(n1 as double) * cast(n2 as double))
            |  / (2.0d * sqrt(
            |      cast(n1 as double) * cast(n2 as double)
            |      * (cast(n1 + n2 as double) * (cast(n1 + n2 as double) * cast(n1 + n2 as double) - 1.0d)
            |         - cast(ties_cubed as double))
            |      / (12.0d * cast(n1 + n2 as double) * cast(n1 + n2 - 1 as double))))
            |  * 1000000) as bigint)""".stripMargin))
          .as("z_micros"))
  }

  /** Kendall τ-b over a KEYED DIMENSION-SCALE frame (nations, months,
    * segments — never raw facts: the pair grid is n², which is the
    * correct cost for n ≤ 10⁴ profile rows and the wrong algorithm past
    * that; callers aggregate first, same contract as the chi-square /
    * Cramér grid ops). Concordance counted over the a.key < b.key pair
    * half-grid in pure integers; τ-b = (C − D)/√((n₀−T_x)(n₀−T_y)) is
    * one fixed-shape double at the end. Complements [[spearmanMicros]]:
    * τ's pair semantics are robust to the tie-heavy profiles where
    * Spearman's d² inflates.
    */
  def kendallTau(df: DataFrame, keyCol: String, xCol: String, yCol: String): DataFrame = {
    val base = df.select(col(keyCol).as("k"), col(xCol).as("x"), col(yCol).as("y"))
    val a = base.select(col("k").as("ka"), col("x").as("xa"), col("y").as("ya"))
    val b = base.select(col("k").as("kb"), col("x").as("xb"), col("y").as("yb"))
    val pairs = a.join(b, col("ka") < col("kb"))
      .select((col("xa") - col("xb")).as("dx"), (col("ya") - col("yb")).as("dy"))
    pairs
      .agg(count(lit(1)).as("n0"),
        sum(when((col("dx") > 0 && col("dy") > 0) || (col("dx") < 0 && col("dy") < 0), 1L)
          .otherwise(0L)).as("concordant"),
        sum(when((col("dx") > 0 && col("dy") < 0) || (col("dx") < 0 && col("dy") > 0), 1L)
          .otherwise(0L)).as("discordant"),
        sum(when(col("dx") === 0, 1L).otherwise(0L)).as("tied_x"),
        sum(when(col("dy") === 0, 1L).otherwise(0L)).as("tied_y"))
      .select(col("n0"), col("concordant"), col("discordant"),
        when(col("n0") === col("tied_x") || col("n0") === col("tied_y"),
          lit(null).cast(LongType))
          .otherwise(expr("""cast(round(
            |  cast(concordant - discordant as double)
            |  / sqrt(cast(n0 - tied_x as double) * cast(n0 - tied_y as double))
            |  * 1000000) as bigint)""".stripMargin))
          .as("tau_micros"))
  }

  /** Price-point (psychological-pricing) bias screen — [[benfordAudit]]'s
    * retail sibling: the distribution of the price's CENT ENDING
    * (value mod 100) against the uniform null. Human-set prices pile up
    * on .00/.95/.99; machine-generated or fabricated ones don't. The
    * chi-square runs over the FULL 0–99 ending grid (zero-filled — both
    * engines enumerate the same 100 cells from a literal range, so
    * absent endings count), each cell's term quantized to micros before
    * the 100-row sum; the round-ending mass ({0, 95, 99}) is reported as
    * a half-up ppm share.
    */
  def pricePointBias(df: DataFrame, valCol: String): DataFrame = {
    val cents = df.select(expr(s"pmod(cast(round($valCol * 100) as bigint), 100)").as("e"))
    val obs = cents.groupBy(col("e")).agg(count(lit(1)).as("obs"))
    val spark = df.sparkSession
    val grid = spark.range(0, 100).select(col("id").as("e"))
      .join(obs, Seq("e"), "left")
      .select(col("e"), coalesce(col("obs"), lit(0L)).as("obs"))
    val tot = cents.agg(count(lit(1)).as("n"))
    grid.crossJoin(broadcast(tot))
      .select(col("n"), col("obs"), col("e"),
        expr("""cast(round(
          |  (cast(obs as double) - cast(n as double) / 100.0d)
          |  * (cast(obs as double) - cast(n as double) / 100.0d)
          |  / (cast(n as double) / 100.0d) * 1000000) as bigint)""".stripMargin)
          .as("term_micros"))
      .groupBy(col("n"))
      .agg(sum(col("term_micros")).as("chi2_micros"),
        sum(when(col("e").isin(0L, 95L, 99L), col("obs")).otherwise(0L)).as("round_obs"))
      .select(col("n"), lit(99L).as("dof"), col("chi2_micros"),
        expr("(cast(round_obs as decimal(38,0)) * 1000000 + n div 2) div n").as("round_ending_ppm"))
  }

  /** Mann–Kendall trend test over a KEYED DIMENSION-SCALE series — the
    * significance companion to the Theil–Sen slope (Sen's estimator says
    * how steep; MK says whether the monotone trend is real):
    * S = Σ_{i<j} sign(x_j − x_i), Var(S) = (n(n−1)(2n+5) − Σt(t−1)(2t+5))/18,
    * z with the ±1 continuity correction. Pair grid over the series
    * dimension (months — same n² contract as [[kendallTau]]), S and the
    * tie term exact integers, one fixed-shape double z at the end.
    */
  def mannKendallTrend(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val base = df.select(col(keyCol).as("k"), col(valCol).as("x"))
    val s = base.select(col("k").as("ka"), col("x").as("xa"))
      .join(base.select(col("k").as("kb"), col("x").as("xb")), col("ka") < col("kb"))
      .agg(coalesce(sum(when(col("xb") > col("xa"), 1L)
        .when(col("xb") < col("xa"), -1L).otherwise(0L)), lit(0L)).as("s_stat"))
    val n = base.agg(count(lit(1)).as("n"))
    val ties = base.groupBy(col("x")).agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(expr("t * (t - 1) * (2 * t + 5)")), lit(0L)).as("tie_term"))
    s.crossJoin(n).crossJoin(ties)
      .select(col("n"), col("s_stat"),
        when(expr("""cast(n as double) * cast(n - 1 as double) * cast(2 * n + 5 as double)
          | - cast(tie_term as double)""".stripMargin) <= 0.0, lit(null).cast(LongType))
          .otherwise(expr("""cast(round(
            |  (case when s_stat > 0 then cast(s_stat - 1 as double)
            |        when s_stat < 0 then cast(s_stat + 1 as double)
            |        else 0.0d end)
            |  / sqrt((cast(n as double) * cast(n - 1 as double) * cast(2 * n + 5 as double)
            |          - cast(tie_term as double)) / 18.0d)
            |  * 1000000) as bigint)""".stripMargin))
          .as("z_micros"))
  }

  /** Mahalanobis outlier screen over a 2-D measure pair — the
    * correlation-aware upgrade of the MAD/z-score screens (a line item
    * can be unremarkable in quantity AND price yet far off the
    * quantity×price ridge). Moments (n, Σx, Σy, Σx², Σy², Σxy) are one
    * DECIMAL(38,0) partial-agg pass over integer cents; the 2×2
    * covariance inverse is closed-form inside ONE fixed-shape double
    * expression per row, d² quantized to micros BEFORE the top-k, so
    * the ordering is integer and the TakeOrderedAndProject cutoff
    * cannot sit on a float boundary. Ties break on the row key.
    */
  def mahalanobisOutliers(df: DataFrame, xCol: String, yCol: String,
                          idCols: Seq[String], k: Int = 20): DataFrame = {
    val D = DecimalType(38, 0)
    val base = df.select(
      idCols.map(col) :+
        expr(s"cast(round($xCol * 100) as bigint)").as("x_cents") :+
        expr(s"cast(round($yCol * 100) as bigint)").as("y_cents"): _*)
    val m = base.agg(count(lit(1)).as("n"),
      sum(col("x_cents").cast(D)).as("sx"), sum(col("y_cents").cast(D)).as("sy"),
      sum((col("x_cents").cast(D) * col("x_cents")).cast(D)).as("sxx"),
      sum((col("y_cents").cast(D) * col("y_cents")).cast(D)).as("syy"),
      sum((col("x_cents").cast(D) * col("y_cents")).cast(D)).as("sxy"))
    val scored = base.crossJoin(broadcast(m))
      .withColumn("d2_micros", expr(
        """cast(round((
          |  (cast(syy as double) / cast(n as double)
          |   - (cast(sy as double) / cast(n as double)) * (cast(sy as double) / cast(n as double)))
          |  * (cast(x_cents as double) - cast(sx as double) / cast(n as double))
          |  * (cast(x_cents as double) - cast(sx as double) / cast(n as double))
          |  - 2.0d * (cast(sxy as double) / cast(n as double)
          |   - (cast(sx as double) / cast(n as double)) * (cast(sy as double) / cast(n as double)))
          |  * (cast(x_cents as double) - cast(sx as double) / cast(n as double))
          |  * (cast(y_cents as double) - cast(sy as double) / cast(n as double))
          |  + (cast(sxx as double) / cast(n as double)
          |   - (cast(sx as double) / cast(n as double)) * (cast(sx as double) / cast(n as double)))
          |  * (cast(y_cents as double) - cast(sy as double) / cast(n as double))
          |  * (cast(y_cents as double) - cast(sy as double) / cast(n as double))
          |) / (
          |  (cast(sxx as double) / cast(n as double)
          |   - (cast(sx as double) / cast(n as double)) * (cast(sx as double) / cast(n as double)))
          |  * (cast(syy as double) / cast(n as double)
          |   - (cast(sy as double) / cast(n as double)) * (cast(sy as double) / cast(n as double)))
          |  - (cast(sxy as double) / cast(n as double)
          |   - (cast(sx as double) / cast(n as double)) * (cast(sy as double) / cast(n as double)))
          |  * (cast(sxy as double) / cast(n as double)
          |   - (cast(sx as double) / cast(n as double)) * (cast(sy as double) / cast(n as double)))
          |) * 1000000) as bigint)""".stripMargin))
    scored
      .select(idCols.map(col) :+ col("x_cents") :+ col("y_cents") :+ col("d2_micros"): _*)
      .orderBy(col("d2_micros").desc +: idCols.map(col): _*)
      .limit(k)
  }

  /** t-closeness audit (Li et al. 2007) — completes the k-anonymity /
    * l-diversity privacy triad: per quasi-identifier group, the earth
    * mover's distance between the group's SENSITIVE-attribute
    * distribution and the global one over an ordered, equi-width binned
    * domain (EMD over ordered bins = mean |ΔCDF|). All mass arithmetic
    * is integer: bin counts cumulate per group over the ~b-row bin
    * dimension, the CDF gap |cumP·n − cumQ·n_g| rides DECIMAL(38,0),
    * and ONE double division yields t in ppm. Shape: one partial-agg
    * shuffle to the (group × bin) grid; the zero-filled grid comes from
    * a bins × groups cross of two broadcast-scale dimensions.
    */
  def tClosenessAudit(df: DataFrame, groupCol: String, valCol: String,
                      binWidthCents: Long = 100000L): DataFrame = {
    val D = DecimalType(38, 0)
    val cents = df.select(col(groupCol).as("g"),
      expr(s"cast(round($valCol * 100) as bigint)").as("v"))
    val mn = cents.agg(min(col("v")).as("mn"))
    val binned = cents.crossJoin(broadcast(mn))
      .select(col("g"), expr(s"(v - mn) div $binWidthCents").as("bin"))
    val obs = binned.groupBy(col("g"), col("bin")).agg(count(lit(1)).as("cnt"))
    val bins = obs.select(col("bin")).distinct()
    val groups = obs.groupBy(col("g")).agg(sum(col("cnt")).as("n_g"))
    val grid = groups.crossJoin(broadcast(bins))
      .join(obs, Seq("g", "bin"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val tot = binned.groupBy(col("bin")).agg(count(lit(1)).as("q_cnt"))
    val nAll = binned.agg(count(lit(1)).as("n"), countDistinct(col("bin")).as("b"))
    val wG = Window.partitionBy(col("g")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // constant-key idiom (pmod of a column, NOT a foldable literal —
    // Catalyst folds lit(0) away and the window goes global): fine over
    // the ≤ bins-row dimension frame
    val wQ = Window.partitionBy(pmod(col("bin"), lit(1))).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumQ = tot.withColumn("cum_q", sum(col("q_cnt")).over(wQ))
      .select(col("bin"), col("cum_q"))
    grid
      .withColumn("cum_p", sum(col("cnt")).over(wG))
      .join(broadcast(cumQ), Seq("bin"))
      .crossJoin(broadcast(nAll))
      .groupBy(col("g"), col("n_g"))
      .agg(max(col("n")).as("n"), max(col("b")).as("b"),
        sum(abs(col("cum_p").cast(D) * col("n") - col("cum_q").cast(D) * col("n_g"))
          .cast(D)).as("gap"))
      .select(col("g").as(groupCol), col("n_g"),
        when(col("b") <= 1, lit(0L))
          .otherwise(expr("""cast(round(cast(gap as double)
            | / (cast(n_g as double) * cast(n as double) * cast(b - 1 as double))
            | * 1000000) as bigint)""".stripMargin))
          .as("t_ppm"))
  }

  /** Welch's unequal-variance t-test — the parametric two-sample
    * companion to [[mannWhitneyU]] (MW asks "is one distribution
    * shifted"; Welch asks "do the MEANS differ" without [[anovaF]]'s
    * pooled-variance assumption, which heteroskedastic price groups
    * violate). Per group one partial-agg pass collects the exact
    * integer moments (n, Σcents, Σcents² in DECIMAL(38,0)); the t
    * statistic and the Welch–Satterthwaite degrees of freedom
    *   t  = (m₁ − m₂) / √(s₁²/n₁ + s₂²/n₂)
    *   df = (s₁²/n₁ + s₂²/n₂)² / ((s₁²/n₁)²/(n₁−1) + (s₂²/n₂)²/(n₂−1))
    * are ONE fixed-shape double expression each over those integers,
    * micros-quantized — no running float accumulator anywhere. NULL on
    * degenerate groups (n ≤ 1 or both variances zero).
    */
  def welchTTest(df: DataFrame, groupCol: String, valCol: String,
                 groupA: String, groupB: String): DataFrame = {
    val D = DecimalType(38, 0)
    val cents = df
      .filter(col(groupCol).isin(groupA, groupB))
      .select((col(groupCol) === groupA).as("is_a"),
        expr(s"cast(round($valCol * 100) as bigint)").as("v"))
    val m = cents.groupBy(col("is_a"))
      .agg(count(lit(1)).as("n"), sum(col("v").cast(D)).as("s"),
        sum((col("v").cast(D) * col("v")).cast(D)).as("q"))
    val a = m.filter(col("is_a")).select(col("n").as("n1"), col("s").as("s1"), col("q").as("q1"))
    val b = m.filter(!col("is_a")).select(col("n").as("n2"), col("s").as("s2"), col("q").as("q2"))
    a.crossJoin(broadcast(b))
      // vₖ = sₖ²/nₖ carried as one double each: variance/n =
      // (n·Σx² − S²) / (n²(n−1)) — inputs exact integers, shape fixed;
      // nullif keeps the ANSI divide alive on a degenerate n = 1 arm
      // (the when() below nulls the output anyway via the n ≤ 1 guard)
      .select(col("n1"), col("n2"),
        expr("""(cast(q1 as double) * cast(n1 as double) - cast(s1 as double) * cast(s1 as double))
          | / nullif(cast(n1 as double) * cast(n1 as double) * cast(n1 - 1 as double), 0.0d)""".stripMargin).as("v1"),
        expr("""(cast(q2 as double) * cast(n2 as double) - cast(s2 as double) * cast(s2 as double))
          | / nullif(cast(n2 as double) * cast(n2 as double) * cast(n2 - 1 as double), 0.0d)""".stripMargin).as("v2"),
        expr("cast(s1 as double) / cast(n1 as double) - cast(s2 as double) / cast(n2 as double)")
          .as("mdiff"))
      .select(col("n1"), col("n2"),
        when(col("n1") <= 1 || col("n2") <= 1 || col("v1") + col("v2") <= 0.0,
          lit(null).cast(LongType))
          .otherwise(expr("cast(round(mdiff / sqrt(v1 + v2) * 1000000) as bigint)"))
          .as("t_micros"),
        when(col("n1") <= 1 || col("n2") <= 1 || col("v1") + col("v2") <= 0.0,
          lit(null).cast(LongType))
          .otherwise(expr("""cast(round((v1 + v2) * (v1 + v2)
            | / (v1 * v1 / cast(n1 - 1 as double) + v2 * v2 / cast(n2 - 1 as double))
            | * 1000000) as bigint)""".stripMargin))
          .as("df_micros"))
  }

  /** Standardized Pearson residuals — [[chiSquare]]'s per-cell
    * diagnostic: the one-number test says "dependent", the residual grid
    * says WHERE. r = (O − E)/√(E(1 − rt/n)(1 − ct/n)) over the same
    * zero-filled full a×b grid; under independence each r is ~N(0,1),
    * so |r| > 2 flags the driving cells. The residual is ONE fixed-shape
    * double per cell over exact integer marginals, micros-quantized; no
    * sum follows (the grid IS the output), so this is the least
    * precision-fragile op in the family. Grid is dimension-scale.
    */
  def chiSquareResiduals(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("obs"))
    val rowTot = obs.groupBy(col("a")).agg(sum(col("obs")).as("rt"))
    val colTot = obs.groupBy(col("b")).agg(sum(col("obs")).as("ct"))
    val n = obs.agg(sum(col("obs")).as("n"))
    rowTot.crossJoin(broadcast(colTot))
      .join(obs, Seq("a", "b"), "left")
      .withColumn("obs", coalesce(col("obs"), lit(0L)))
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("obs"),
        // E = rt·ct/n and the (1 − marginal share) deflators in one shape
        expr("""cast(round(
          |  (cast(obs as double) - cast(rt as double) * cast(ct as double) / cast(n as double))
          |  / sqrt(cast(rt as double) * cast(ct as double) / cast(n as double)
          |         * (1.0d - cast(rt as double) / cast(n as double))
          |         * (1.0d - cast(ct as double) / cast(n as double))) * 1000000
          |) as bigint)""".stripMargin).as("resid_micros"))
      .withColumn("flagged", abs(col("resid_micros")) > 2000000L)
  }

  /** Odds ratio of a 2×2 exposure × outcome table with the Wald
    * confidence interval — the epidemiology-shaped effect size
    * [[chiSquare]] (is there dependence?) and [[chiSquareResiduals]]
    * (where?) stop short of: HOW MUCH does exposure multiply the odds,
    * with sampling uncertainty attached. OR = ad/bc; ln OR and
    * se = √(1/a + 1/b + 1/c + 1/d) are each ONE fixed-shape double over
    * the four exact counts, micros-quantized; the CI bounds pin
    * z = 1.96 as a shared literal. Any empty cell reads NULL (the
    * standard undefined-OR convention — callers wanting Haldane's +0.5
    * correction can add it to the inputs). One corpus-scale aggregate;
    * everything after is a 1-row frame.
    */
  def oddsRatio(df: DataFrame, exposedSql: String, outcomeSql: String): DataFrame = {
    df.select(expr(exposedSql).as("e"), expr(outcomeSql).as("o"))
      .agg(sum(expr("cast(e and o as bigint)")).as("a"),
        sum(expr("cast(e and not o as bigint)")).as("b"),
        sum(expr("cast((not e) and o as bigint)")).as("c"),
        sum(expr("cast((not e) and not o as bigint)")).as("d"))
      .select(col("a"), col("b"), col("c"), col("d"),
        when(col("a") === 0L || col("b") === 0L || col("c") === 0L || col("d") === 0L,
          lit(null).cast(LongType))
          .otherwise(expr("""cast(round(ln(
            |  (cast(a as double) * cast(d as double))
            |  / (cast(b as double) * cast(c as double))) * 1000000) as bigint)""".stripMargin))
          .as("log_or_micros"),
        when(col("a") === 0L || col("b") === 0L || col("c") === 0L || col("d") === 0L,
          lit(null).cast(LongType))
          .otherwise(expr("""cast(round(sqrt(
            |  1.0d / cast(a as double) + 1.0d / cast(b as double)
            |  + 1.0d / cast(c as double) + 1.0d / cast(d as double)) * 1000000) as bigint)""".stripMargin))
          .as("se_micros"))
      .select(col("a"), col("b"), col("c"), col("d"), col("log_or_micros"),
        (col("log_or_micros") - expr("cast(round(1.96d * se_micros) as bigint)"))
          .as("ci_lo_micros"),
        (col("log_or_micros") + expr("cast(round(1.96d * se_micros) as bigint)"))
          .as("ci_hi_micros"))
  }

  /** Neyman-optimal stratified sample allocation — the sampling-design
    * op behind every "audit 1 000 rows" request: strata with more mass
    * AND more variance deserve more of the budget, n_h ∝ N_h·σ_h
    * (Neyman 1934). Per-stratum moments are exact integers (one
    * partial-agg pass); σ_h is the one correctly-rounded sqrt per
    * stratum, micros-quantized into an integer weight; the final
    * allocation uses LARGEST-REMAINDER apportionment in pure integer
    * arithmetic (base = ⌊n·w_h/W⌋, the leftover seats go to the largest
    * remainders, ties broken on stratum key) so the n_h sum to exactly
    * the budget on any engine. Everything after the first pass runs on
    * the stratum dimension (constant-key window over ≤ |strata| rows).
    */
  def neymanAllocation(df: DataFrame, stratumCol: String, valCol: String,
                       budget: Int = 1000): DataFrame = {
    val D = DecimalType(38, 0)
    val m = df.select(col(stratumCol).as("g"),
        expr(s"cast(round($valCol * 100) as bigint)").as("v"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_h"), sum(col("v").cast(D)).as("s"),
        sum((col("v").cast(D) * col("v")).cast(D)).as("q"))
      .select(col("g"), col("n_h"),
        when(col("n_h") <= 1, lit(0L))
          .otherwise(expr("""cast(round(sqrt(
            |  (cast(q as double) * cast(n_h as double) - cast(s as double) * cast(s as double))
            |  / (cast(n_h as double) * cast(n_h - 1 as double))) * 1000000) as bigint)""".stripMargin))
          .as("sd_micros"))
      .withColumn("w", (col("n_h").cast(D) * col("sd_micros")).cast(D))
    val tot = m.agg(sum(col("w")).as("tw"), sum(col("n_h").cast(D)).as("tn"))
    // tw = 0 (every stratum degenerate: n_h <= 1 or zero variance) would be
    // an ANSI divide-by-zero; fall back to allocation proportional to n_h.
    val based = m.crossJoin(broadcast(tot))
      .withColumn("we", when(col("tw") === lit(0).cast(D), col("n_h").cast(D))
        .otherwise(col("w")))
      .withColumn("te", when(col("tw") === lit(0).cast(D), col("tn"))
        .otherwise(col("tw")))
      .select(col("g"), col("n_h"), col("sd_micros"),
        expr(s"cast((we * $budget) div te as bigint)").as("base"),
        // remainder in DECIMAL(38,0) units — exact, orderable
        (col("we") * lit(budget) - expr(s"((we * $budget) div te)").cast(D) * col("te"))
          .as("rem"))
    // constant-key idiom (non-foldable) over the ≤ |strata| rows
    val wRem = Window.partitionBy(pmod(length(col("g")), lit(1)))
      .orderBy(col("rem").desc, col("g"))
    val short = based.agg((lit(budget) - sum(col("base"))).as("short"))
    based.crossJoin(broadcast(short))
      .withColumn("rr", row_number().over(wRem))
      .select(col("g").as(stratumCol), col("n_h"), col("sd_micros"),
        (col("base") + when(col("rr") <= col("short"), 1L).otherwise(0L)).as("alloc"))
  }

  /** Empirical-Bayes (beta-binomial) shrinkage of per-group rates — the
    * small-sample fix every per-supplier/per-source rate table needs: a
    * supplier with 2 returns out of 3 items is NOT a 67 % returner; its
    * rate shrinks toward the population mean in proportion to the prior
    * strength K = μ(1−μ)/s² − 1 estimated across groups by method of
    * moments (Robbins 1956; the baseball-batting-average classic).
    * shrunk = (x + K·μ)/(n + K): big-n groups keep their rate, small-n
    * groups borrow the corpus prior.
    *
    * Determinism: per-group micros rates and the cross-group moment sums
    * are exact integers (Σp² DECIMAL(38,0)-widened — group counts at
    * corpus scale would overflow LONG); μ, s², K and the shrunk rate are
    * ONE fixed-shape double chain micros-quantized at the end, the
    * chi-square/assortativity discipline. K clamps to 0 when the
    * observed spread is at or above the binomial prior bound (s² ≥
    * μ(1−μ)) or degenerate (s² = 0) — shrunk = raw, never a negative
    * prior. Scale shape: one partial-agg pass to groups, one
    * broadcast-scale moment rollup, one map-side join back.
    */
  def ebShrunkRates(df: DataFrame, groupCol: String,
                    successExpr: String): DataFrame = {
    val D = DecimalType(38, 0)
    val g = df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"),
        sum(expr(s"cast($successExpr as bigint)")).as("x"))
      // DECIMAL-widened ppm: x is a per-group success COUNT — corpus-scale
      // at the 100 TB target, where the LONG multiply overflows
      .withColumn("p_u", expr("(cast(x as decimal(38,0)) * 1000000 + n div 2) div n"))
    val mom = g.agg(count(lit(1)).as("n_groups"),
      sum(col("p_u")).cast(D).as("sp"),
      sum((col("p_u").cast(D) * col("p_u").cast(D)).cast(D)).as("sp2"))
    g.crossJoin(broadcast(mom))
      .select(col("g").as(groupCol), col("n"), col("x"),
        col("p_u").as("raw_ppm"),
        expr(
          """cast(round(element_at(transform(array(
            |  named_struct(
            |    'mu', cast(sp as double) / cast(n_groups as double) / 1e6,
            |    'v', (cast(sp2 as double) / cast(n_groups as double)
            |          - (cast(sp as double) / cast(n_groups as double))
            |            * (cast(sp as double) / cast(n_groups as double))) / 1e12)),
            |  m -> element_at(transform(array(
            |         if(m.v > 0d, greatest(m.mu * (1d - m.mu) / m.v - 1d, 0d), 0d)),
            |       k -> (cast(x as double) + k * m.mu) / (cast(n as double) + k)), 1)),
            |  1) * 1000000) as bigint)""".stripMargin).as("shrunk_ppm"))
  }

  /** Split-conformal prediction intervals with a measured coverage audit
    * (Vovk et al.; the Lei et al. 2018 split recipe) — the
    * distribution-free uncertainty read a forecasting/regression
    * deployment ships against: whatever the predictor, |y − ŷ| ≤ q̂
    * holds on fresh data with probability ≥ 1 − α when q̂ is the
    * ⌈(n+1)(1−α)⌉-th calibration residual. Three disjoint portable-hash
    * splits (fit 60 / calibrate 20 / test 20 on md5(o_orderkey)); the
    * fitted predictor is the per-priority half-up integer mean — the
    * conformal guarantee is predictor-agnostic, so the simplest
    * deterministic model exercises the full recipe.
    *
    * Exact end to end: cents-integer residuals, the calibration quantile
    * as a type-1 order statistic over [[ShardedOrder]] global ranks
    * (never a single-reducer window), coverage in half-up ppm. One row
    * per α: (alpha_pct, n_fit, n_calib, n_test, qhat_cents,
    * coverage_ppm) — coverage_ppm ≥ (1−α)·1e6 up to finite-sample noise
    * is the audit a production conformal wrapper re-checks per snapshot.
    */
  def conformalInterval(orders: DataFrame,
                        alphasPct: Seq[Int] = Seq(10, 20)): DataFrame = {
    require(alphasPct.nonEmpty && alphasPct.forall(a => a >= 1 && a <= 99),
      s"bad alphas: $alphasPct")
    val sp = orders.sparkSession
    import sp.implicits._
    val base = orders.select(col("o_orderkey").as("k"),
      col("o_orderpriority").as("grp"),
      expr("cast(round(o_totalprice * 100) as bigint)").as("cents"),
      expr("cast(conv(substr(md5(cast(o_orderkey as string)), 1, 8), 16, 10) as bigint) % 100")
        .as("h"))
    val fit = base.filter(col("h") < 60)
    // per-priority mean on the fit split; priority domain is ≤ 5 values
    // so the model broadcasts by construction
    val model = fit.groupBy(col("grp")).agg(
      expr("""cast((cast(sum(cents) as decimal(38,0)) + count(1) div 2)
        | div count(1) as bigint)""".stripMargin).as("pred_cents"))
    val nFit = fit.agg(count(lit(1)).as("n_fit"))
    val calib = base.filter(col("h") >= 60 && col("h") < 80)
      .join(broadcast(model), Seq("grp"))
      .select(col("k"), expr("abs(cents - pred_cents)").as("r"))
    val ranked = ShardedOrder.withGlobalRank(calib, "rk", 32, col("r"), col("k"))
    val nCal = ranked.agg(count(lit(1)).as("n_calib"))
    val alphas = alphasPct.toDF("alpha_pct")
    // type-1 conformal index: ceil((n+1)(1−α)) clamped to n
    val qhat = broadcast(alphas).crossJoin(broadcast(nCal))
      .select(col("alpha_pct"), col("n_calib"),
        expr("least(n_calib, ((n_calib + 1) * (100 - alpha_pct) + 99) div 100)")
          .as("k_idx"))
      .join(ranked, col("rk") === col("k_idx"))
      .select(col("alpha_pct"), col("n_calib"), col("r").as("qhat_cents"))
    val test = base.filter(col("h") >= 80)
      .join(broadcast(model), Seq("grp"))
      .select(expr("abs(cents - pred_cents)").as("r_test"))
    test.crossJoin(broadcast(qhat))
      .groupBy(col("alpha_pct"), col("n_calib"), col("qhat_cents"))
      .agg(count(lit(1)).as("n_test"),
        expr("""cast((cast(sum(cast(r_test <= qhat_cents as bigint)) as decimal(38,0))
          | * 1000000 + count(1) div 2) div count(1) as bigint)""".stripMargin)
          .as("coverage_ppm"))
      .crossJoin(broadcast(nFit))
      .select(col("alpha_pct"), col("n_fit"), col("n_calib"), col("n_test"),
        col("qhat_cents"), col("coverage_ppm"))
  }
}
