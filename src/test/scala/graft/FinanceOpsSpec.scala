package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.FinanceOps

/** Reference-parity semantics (SURVEY.md §5.2): cast leniency, null-guarded
  * ratios, the pivot/join equivalence from §7.3.4, and the FRED mart.
  */
class FinanceOpsSpec extends SparkSpec {
  import spark.implicits._

  test("toMoney: unparseable strings become NULL (lenient raw zone, §7.3.1)") {
    val df = Seq("123.45", "abc", "", "67.891").toDF("value")
      .select(FinanceOps.toMoney(col("value")).as("v"))
    val got = df.collect().map(r => Option(r.get(0)).map(_.toString))
    assert(got.toSeq == Seq(Some("123.45"), None, None, Some("67.89")))
  }

  test("ratio: zero denominator yields NULL, not error or Inf (F3/F4)") {
    val df = Seq((10.0, 2.0), (5.0, 0.0)).toDF("n", "d")
      .select(FinanceOps.ratio(col("n"), col("d")).as("r"))
    val got = df.collect().map(r => Option(r.get(0)))
    assert(got(0).contains(5.0) && got(1).isEmpty)
  }

  test("martFinancialSummary: yearly decimal-exact average, (year, avg_value) schema") {
    val df = Seq(
      ("GDP", "2021-03-01", "100.00"), ("GDP", "2021-06-01", "101.00"),
      ("GDP", "2022-03-01", "200.00"))
      .toDF("series_id", "observation_date", "value")
      .withColumn("observation_date", col("observation_date").cast(DateType))
    val mart = FinanceOps.martFinancialSummary(FinanceOps.stgFinancialData(df))
    assert(mart.columns.toSeq == Seq("year", "avg_value"))
    val byYear = mart.collect().map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
    assert(byYear == Map("2021-01-01" -> 100.5, "2022-01-01" -> 200.0))
  }

  test("pivot equals self-join for unique (key, type) rows (§7.3.4)") {
    val raw = Seq(
      ("AAPL", "2024-01-01", "income_statement", "10.00"),
      ("AAPL", "2024-01-01", "balance_sheet", "20.00"),
      ("MSFT", "2024-01-01", "income_statement", "30.00"))
      .toDF("symbol", "fiscal_date", "report_type", "total")
      .withColumn("total", FinanceOps.toMoney(col("total")))
    val piv = FinanceOps.pivotReportTypes(raw, "report_type",
        Seq("income_statement", "balance_sheet"), Seq("symbol", "fiscal_date"), col("total"))
      .select("symbol", "fiscal_date", "income_statement", "balance_sheet")
    val joined = FinanceOps.joinReportTypes(
        raw.select("symbol", "fiscal_date", "report_type", "total"),
        "income_statement", "balance_sheet", Seq("symbol", "fiscal_date"))
    // same keys, and the MSFT row survives the left join with NULL balance side
    assert(piv.count() == 2 && joined.count() == 2)
    val msftP = piv.filter(col("symbol") === "MSFT").collect()(0)
    assert(msftP.isNullAt(3))
    val msftJ = joined.filter(col("symbol") === "MSFT").collect()(0)
    assert(msftJ.isNullAt(msftJ.fieldIndex("total_balance_sheet")))
    // pivot and join agree on the AAPL values
    val aaplP = piv.filter(col("symbol") === "AAPL").collect()(0)
    val aaplJ = joined.filter(col("symbol") === "AAPL").collect()(0)
    assert(aaplP.getDecimal(2) == aaplJ.getDecimal(aaplJ.fieldIndex("total")))
    assert(aaplP.getDecimal(3) == aaplJ.getDecimal(aaplJ.fieldIndex("total_balance_sheet")))
  }

  test("E2 golden pipeline: stgFundamentals → financialKpis (join gaps, zero denominators)") {
    // fixture per FIXTURES.md §A4: one full pair, one income-only symbol
    // (join-gap NULLs), one zero-equity row (divide-by-zero → NULL)
    val raw = Seq(
      ("AAPL", "income_statement", "2024-01-01", "USD", "100.00", "40.00", "30.00", "20.00", null, null, null),
      ("AAPL", "balance_sheet", "2024-01-01", "USD", null, null, null, null, "500.00", "300.00", "200.00"),
      ("MSFT", "income_statement", "2024-01-01", "USD", "80.00", "32.00", "24.00", "16.00", null, null, null),
      ("ZERO", "income_statement", "2024-01-01", "USD", "10.00", "5.00", "2.00", "1.00", null, null, null),
      ("ZERO", "balance_sheet", "2024-01-01", "USD", null, null, null, null, "50.00", "50.00", "0.00"))
      .toDF("symbol", "report_type", "fiscal_date", "currency", "total_revenue",
        "gross_profit", "operating_income", "net_income", "total_assets",
        "total_liabilities", "total_equity")
      .select(col("symbol"), col("report_type"), col("fiscal_date").cast(DateType), col("currency"),
        FinanceOps.toMoney(col("total_revenue")).as("total_revenue"),
        FinanceOps.toMoney(col("gross_profit")).as("gross_profit"),
        FinanceOps.toMoney(col("operating_income")).as("operating_income"),
        FinanceOps.toMoney(col("net_income")).as("net_income"),
        FinanceOps.toMoney(col("total_assets")).as("total_assets"),
        FinanceOps.toMoney(col("total_liabilities")).as("total_liabilities"),
        FinanceOps.toMoney(col("total_equity")).as("total_equity"))
    val kpis = FinanceOps.financialKpis(FinanceOps.stgFundamentals(raw))
      .collect().map(r => r.getString(0) -> r).toMap
    val aapl = kpis("AAPL")
    assert(aapl.getDouble(2) == 0.4 && aapl.getDouble(4) == 0.2)  // gross margin, net margin
    assert(aapl.getDouble(5) == 0.04 && aapl.getDouble(6) == 0.1) // ROA, ROE
    val msft = kpis("MSFT")
    assert(msft.getDouble(2) == 0.4)            // margins work without balance sheet
    assert(msft.isNullAt(5) && msft.isNullAt(6)) // join gap → NULL ROA/ROE
    val zero = kpis("ZERO")
    assert(zero.isNullAt(6))                     // zero equity → NULL, not Inf
    assert(zero.getDouble(5) == 0.02)
  }

  test("flattenFredPayload: nested observations explode to raw rows; null payload guarded (S4/P7)") {
    val json = Seq(
      """{"count": 2, "observations": [
        |{"date": "2024-01-01", "value": "1.5"}, {"date": "2024-02-01", "value": "."}]}""".stripMargin)
      .toDF("raw")
    val payload = spark.read.schema(graft.sources.Tables.fredPayloadSchema)
      .json(json.as[String])
    val flat = FinanceOps.flattenFredPayload(payload, "GDP")
    val rows = flat.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(0)).toSet == Set("GDP"))
    // "." (FRED missing marker) survives as a string here; staging cast nulls it
    val staged = FinanceOps.stgFinancialData(flat)
    assert(staged.collect().count(_.isNullAt(2)) == 1)
  }

  test("gapFillDaily: missing days densified, value forward-filled, raw stays NULL") {
    import java.sql.Date
    val df = Seq(
      ("A", Date.valueOf("2024-01-01"), BigDecimal("10.00")),
      ("A", Date.valueOf("2024-01-04"), BigDecimal("40.00")),
      ("B", Date.valueOf("2024-02-01"), BigDecimal("5.00")))
      .toDF("k", "day", "total")
    val got = FinanceOps.gapFillDaily(df, "k", "day", "total")
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        (Option(r.getDecimal(2)), r.getDecimal(3))).toMap
    assert(got.size == 5) // A: 4 calendar days, B: 1
    val gap = got(("A", "2024-01-02"))
    assert(gap._1.isEmpty && gap._2.doubleValue == 10.0) // raw NULL, fill carries
    assert(got(("A", "2024-01-04"))._2.doubleValue == 40.0)
  }

  test("interpFillDaily: straight-line integer fill between neighbors, " +
       "edge gaps carry the nearest observation, falling slope floors right") {
    import java.sql.Date
    val df = Seq(
      ("A", Date.valueOf("2024-01-01"), 1000L),
      ("A", Date.valueOf("2024-01-04"), 4000L),  // rising: 1000,2000,3000,4000
      ("B", Date.valueOf("2024-02-01"), 500L),
      ("B", Date.valueOf("2024-02-04"), 499L))   // falling fractional slope
      .toDF("k", "day", "v")
    val got = FinanceOps.interpFillDaily(df, "k", "day", "v")
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3))).toMap
    assert(got.size == 8)
    assert(got(("A", "2024-01-02")) == (None, 2000L))
    assert(got(("A", "2024-01-03")) == (None, 3000L))
    assert(got(("A", "2024-01-04")) == (Some(4000L), 4000L))
    // slope -1/3 cents/day: 500 - 1/3 -> 499.667 rounds half-up to 500;
    // 500 - 2/3 -> 499.333 rounds to 499 (floor-division half-up, sign-safe)
    assert(got(("B", "2024-02-02")) == (None, 500L))
    assert(got(("B", "2024-02-03")) == (None, 499L))
    // edge carry: an all-observed series and a leading gap
    val lead = Seq(("C", Date.valueOf("2024-03-05"), 7L))
      .toDF("k", "day", "v")
    assert(FinanceOps.interpFillDaily(lead, "k", "day", "v")
      .head().getLong(3) == 7L)
  }
}
