package graft

import java.nio.file.Files

/** End-to-end golden pipeline tests (SURVEY.md §5.4): fixture JSON/CSV in,
  * materialized marts out — the full E1/E2 paths through one SparkSession.
  */
class PipelinesSpec extends SparkSpec {

  test("E1 FRED pipeline: landing JSON → flatten → cast → yearly mart table") {
    val dir = Files.createTempDirectory("graft-fred").toString
    val payload =
      """{"realtime_start":"2024-01-01","realtime_end":"2024-01-01","units":"lin","count":4,
        |"observations":[
        | {"realtime_start":"x","realtime_end":"x","date":"2021-01-01","value":"100.00"},
        | {"realtime_start":"x","realtime_end":"x","date":"2021-07-01","value":"102.00"},
        | {"realtime_start":"x","realtime_end":"x","date":"2022-01-01","value":"."},
        | {"realtime_start":"x","realtime_end":"x","date":"2022-07-01","value":"110.00"}]}"""
        .stripMargin.replace("\n", "")
    Files.writeString(java.nio.file.Paths.get(s"$dir/gdp.json"), payload)

    val mart = Pipelines.runFredPipeline(spark, s"$dir/gdp.json", "GDP", "pspec_mart")
    val byYear = mart.collect().map(r => r.getDate(0).toString -> Option(r.get(1))).toMap
    assert(byYear("2021-01-01").contains(101.0))
    // "." is FRED's missing marker → NULL after lenient cast; AVG skips NULLs
    assert(byYear("2022-01-01").contains(110.0))
    assert(spark.catalog.tableExists("pspec_mart"))
    spark.sql("DROP TABLE pspec_mart")
  }

  test("fetchToRaw: injected transport with retry + pacing; landed files feed E1 (S1/S2)") {
    val dir = Files.createTempDirectory("graft-fetch").toString
    val payload =
      """{"realtime_start":"2024-01-01","realtime_end":"2024-01-01","units":"lin","count":1,
        |"observations":[
        | {"realtime_start":"x","realtime_end":"x","date":"2021-01-01","value":"100.00"}]}"""
        .stripMargin.replace("\n", "")
    var calls = 0
    val flakyFetch: String => String = { url =>
      calls += 1
      if (calls == 1) throw new RuntimeException("transient 429")
      assert(url.contains("series_id=GDP"))
      payload
    }
    val landed = Pipelines.fetchToRaw(flakyFetch,
      Seq("https://api.example.test/fred?series_id=GDP"), dir, backoffMs = 1)
    assert(calls == 2 && landed.size == 1) // first attempt failed, retry landed
    // the landed file is the exact payload — and drives the E1 pipeline
    val mart = Pipelines.runFredPipeline(spark, landed.head, "GDP", "pspec_fetch_mart")
    assert(mart.count() == 1)
    spark.sql("DROP TABLE pspec_fetch_mart")
  }

  test("fetchSeriesToRaw: distributed mapPartitions tier lands files identical to the driver tier") {
    import spark.implicits._
    // 100-series fan-out — the scale at which a driver loop stops being the
    // right tier (SURVEY S1 scale note). Same injected transport through
    // both tiers; landing layout must be byte-identical.
    val series = (1 to 100).map(i => (f"S$i%03d", f"https://api.example.test/fred?series_id=S$i%03d"))
    val df = series.toDF("series_id", "url")
    val fetch: String => String = url => s"""{"fetched":"$url"}"""
    val distDir = Files.createTempDirectory("graft-dfetch").toString
    val drvDir = Files.createTempDirectory("graft-sfetch").toString
    val dist = Pipelines.fetchSeriesToRaw(fetch, df, distDir, distributeAbove = 0, parallelism = 8)
    val drv = Pipelines.fetchSeriesToRaw(fetch, df, drvDir, distributeAbove = 1000)
    assert(dist.size == 100 && drv.size == 100)
    def land(dir: String): Map[String, String] =
      new java.io.File(dir).listFiles.map(f => f.getName -> Files.readString(f.toPath)).toMap
    val (a, b) = (land(distDir), land(drvDir))
    assert(a == b, "distributed landing must match the driver tier byte-for-byte")
    assert(a.keySet == series.map { case (sid, _) => s"payload_$sid.json" }.toSet)
    // returned paths are the landed files, deterministically ordered
    assert(dist == dist.sorted && dist.map(p => new java.io.File(p).getName).toSet == a.keySet)
  }

  test("E2 fundamentals pipeline: raw CSV → staging join → KPI mart table") {
    val dir = Files.createTempDirectory("graft-fund").toString
    val csv =
      """symbol,report_type,fiscal_date,currency,total_revenue,gross_profit,operating_income,net_income,total_assets,total_liabilities,total_equity,created_at
        |AAPL,income_statement,2024-01-01,USD,100.00,40.00,30.00,20.00,,,,
        |AAPL,balance_sheet,2024-01-01,USD,,,,,500.00,300.00,200.00,""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$dir/fund.csv"), csv)

    val kpis = Pipelines.runFundamentalsPipeline(spark, s"$dir/fund.csv", "pspec_kpis")
    val r = kpis.collect()(0)
    assert(r.getString(0) == "AAPL")
    assert(r.getDouble(r.fieldIndex("gross_margin")) == 0.4)
    assert(r.getDouble(r.fieldIndex("return_on_equity")) == 0.1)
    spark.sql("DROP TABLE pspec_kpis")
  }

  test("withRetries: succeeds after transient failures, rethrows when exhausted") {
    var calls = 0
    val got = Pipelines.withRetries(3, backoffMs = 1) { () =>
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      42
    }
    assert(got == 42 && calls == 3)
    intercept[RuntimeException] {
      Pipelines.withRetries(1, backoffMs = 1)(() => throw new RuntimeException("always"))
    }
  }

  test("runCorpusPipeline: dups collapse to one survivor, junk filtered, survivors chunked") {
    import spark.implicits._
    val stopdense = "the a of and to in " * 8 // stopword-dense: high quality, 48 tokens
    val docs = Seq(
      (1L, stopdense), (2L, stopdense), // exact dups → doc 1 survives
      (9L, "zz qq ww zz qq ww zz qq")   // stopword-free junk → quality-filtered
    ).map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Pipelines.runCorpusPipeline(docs)
    val byDoc = out.collect().groupBy(_.getLong(0))
    assert(!byDoc.contains(2L)) // exact dup gone
    assert(!byDoc.contains(9L)) // junk gone
    assert(byDoc.contains(1L) && byDoc(1L).nonEmpty) // survivor chunked
  }
}
