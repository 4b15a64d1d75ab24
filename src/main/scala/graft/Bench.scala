package graft

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line for the driver.
  *
  * Each query is forced through a `noop`-format write — full computation
  * and materialization of every output row/column, zero sink cost. A bare
  * `.count()` would let Catalyst prune projections/casts away and time an
  * empty scan (round-1 verdict, "What's wrong" #3).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-bench")
    // Session-wide warm-up on the smallest table, exercising the plan
    // shapes the suite leans on — window, broadcast join, HOF lambda,
    // hash aggregate, sort — not just a bare scan: first-plan JIT/codegen
    // compilation otherwise lands on the alphabetically-first query
    // (r8: ann_recall read ~2× its solo time even with its own per-query
    // warm-up, because each run still paid residual whole-stage-codegen
    // class compilation the simple scan warm-up never triggered).
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      val w = Window.partitionBy(col("r_regionkey")).orderBy(col("r_name"))
      r.crossJoin(broadcast(r.select(col("r_regionkey").as("k"))))
        .withColumn("rn", row_number().over(w))
        .withColumn("h",
          expr("aggregate(transform(sequence(1, 64), x -> x * 1.0d), 0d, (a, x) -> a + x)"))
        .groupBy(col("r_name")).agg(sum(col("rn")).as("s"), max(col("h")).as("m"))
        .orderBy(col("s"))
        .write.format("noop").mode("overwrite").save()
    }
    // Per query: one untimed warm-up, then min of 2 timed runs. A single
    // alphabetical pass confounds A/B comparisons with JIT/codegen warm-up
    // (round-4 verdict: the guarded jaccard variant, first of three, read
    // 2.5x slower than the strictly-more-work unguarded one, third).
    val timedRuns = 2
    // optional arg: comma-separated query names — isolate one query's
    // timing outside the 87-query suite (suite-state A/B diagnosis)
    val only = args.headOption.map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // stderr marker so JVM warnings (task-binary size, GC) between two
      // markers attribute to a query — the r11 hygiene pass had to guess
      System.err.println(s"[bench] start $name")
      def once(): Double = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } finally {
          // queries that persist sub-frames (ann_recall, trained IVF) hand
          // cache lifecycle to the caller: drop blocks even on failure so
          // runs are independent and cached data can't accumulate
          spark.catalog.clearCache()
        }
      }
      val best =
        try { once(); Seq.fill(timedRuns)(once()).min }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); -1.0 }
      name -> best
    }
    // 1-decimal (0.1 s) timings on the printed line: the driver keeps only
    // the last 2000 chars of output (plus sbt's trailing success line), so
    // the JSON line must stay short enough to survive that tail capture
    // whole or it is never machine-parsed. Full-precision per-query numbers
    // go to BENCH_local.json below for round-over-round regression reads.
    def fmt(v: Double): String =
      if (v < 0) "null" // failed query: null, never summed into the total
      else {
        // 0.1 s resolution: per-query values exist to flag outliers (the
        // suite median is ~0.3 s and run-to-run variance is ±2x); finer
        // A/B reads come from local runs. What the resolution buys is ~80
        // chars of line length — the difference between the driver's 2000-
        // char tail capture holding the whole line or truncating its head
        val s = BigDecimal(v).setScale(1, BigDecimal.RoundingMode.HALF_UP)
          .bigDecimal.stripTrailingZeros.toPlainString
        if (s.isEmpty || s.startsWith("0E")) "0" else s
      }
    // The printed line must survive the driver's 2000-char tail capture
    // WHOLE or it is never machine-parsed — r7's full 92-query map
    // overflowed and the driver recorded parsed: null. Per-query values
    // exist to flag outliers, so the line carries the SLOWEST 30 (a fixed
    // count → bounded line length at any registry size) plus an aggregate
    // of the omitted fast tail; every query's full-precision number is in
    // BENCH_local.json below.
    val ok = results.filter(_._2 >= 0)
    val slow = ok.sortBy(-_._2).take(30).sortBy(_._1)
    val rest = ok.sortBy(-_._2).drop(30)
    val qs = (slow.map { case (k, v) => "\"" + k + "\":" + fmt(v) } :+
      s""""_rest":{"n":${rest.size},"total":${fmt(rest.map(_._2).sum)}}""")
      .mkString("{", ",", "}")
    val total = fmt(ok.map(_._2).sum)
    // n_queries: the registered-query count grows round over round (56 in
    // r4 vs 52 in r3), so compare totals normalized, not raw. n_failed
    // makes the normalization honest: `total` sums only succeeded queries,
    // so total / (n_queries - n_failed) is the comparable per-query mean.
    val nFailed = results.count(_._2 < 0)
    val sfNum = "sf([0-9.]+)$".r.findFirstMatchIn(sfDir).map(_.group(1)).getOrElse("\"" + sfDir + "\"")
    val metricLine =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":$nFailed,"queries":$qs,"sf":$sfNum}"""
    println(metricLine)
    // The stdout line reaches the driver wrapped in sbt log prefixes, and
    // its tail capture has recorded parsed: null in r10/r11. Also write the
    // exact metric line as a clean, unprefixed JSON file so any driver that
    // looks for a sibling artifact can parse it directly.
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_metric.json"),
      metricLine + "\n")
    // Full-precision artifact: the printed line is capped at 0.1 s for the
    // driver's tail capture, which blinds regression detection for the ~60
    // sub-0.5 s queries (a 0.2 s -> 0.4 s doubling rounds invisibly).
    // Keep the unrounded numbers in-repo for local round-over-round diffs.
    // Locale.ROOT: f"" interpolates through the JVM default locale, so a
    // comma-decimal locale would emit 0,1234 — invalid JSON
    def full(v: Double): String =
      if (v < 0) "null"
      else String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + full(v) }.mkString("{", ",", "}")
    // subset runs (diagnosis) must not clobber the full-suite artifact
    val localName = if (only.isEmpty) "BENCH_local.json" else "BENCH_local_subset.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(localName),
      s"""{"n_queries":${results.size},"n_failed":$nFailed,"sf":$sfNum,"queries":$fullQs}""" + "\n")
    spark.stop()
  }
}
