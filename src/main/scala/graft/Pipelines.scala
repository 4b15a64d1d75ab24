package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, FinanceOps, TextOps}
import graft.sources.{IngestOps, Tables}

/** The reference's two end-to-end pipelines as linear driver programs
  * (SURVEY.md §3 E1–E3, §2.8 O1): Spark's lazy plan subsumes intra-query
  * ordering, so "orchestration" is just function composition — the dbt
  * `ref()` graph is the Scala val graph (O5).
  */
object Pipelines {

  /** O3: source-fetch retry with backoff — the Airflow `retries: 1` analog
    * (reference dags/etl_dag.py:9). Compute-side retries are Spark's own
    * task retries; this guards the driver-side fetch only.
    */
  def withRetries[A](n: Int, backoffMs: Long = 1000)(f: () => A): A = {
    var attempt = 0
    var delay = backoffMs
    while (true) {
      try return f()
      catch {
        case e: Exception =>
          if (attempt >= n) throw e
          attempt += 1
          Thread.sleep(delay)
          delay *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** S1/S2: the fan-out fetch driver with the transport injected — the
    * library owns per-request retry/backoff (O3), rate-limit pacing (O4,
    * the reference's `time.sleep(15)` for Alpha Vantage's 5 req/min,
    * README.md:367-369), and verbatim landing (S3 habit: re-parses are
    * free, re-fetches are not; reference data_loader/fetch_data.py:13-14
    * writes the payload straight to disk). The HTTP GET itself is a
    * caller-supplied `fetch` function: the engine carries no transport
    * dependency (and this environment has no egress), while a real
    * deployment passes `url => requests-equivalent(url)`. Landing is
    * driver-side by design, exactly like the reference and any Airflow
    * task — API payloads are KBs; scale lives downstream of the landing
    * zone.
    *
    * @return the landed file paths, ready for `Tables.readFredJson`
    */
  def fetchToRaw(fetch: String => String, urls: Seq[String], landingDir: String,
                 rateLimitMs: Long = 0, retries: Int = 2,
                 backoffMs: Long = 1000): Seq[String] = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landingDir))
    urls.zipWithIndex.map { case (url, i) =>
      if (rateLimitMs > 0 && i > 0) Thread.sleep(rateLimitMs)
      val payload = withRetries(retries, backoffMs)(() => fetch(url))
      val path = java.nio.file.Paths.get(landingDir, f"payload_$i%05d.json")
      java.nio.file.Files.writeString(path, payload)
      path.toString
    }
  }

  /** E1/E3: the FRED pipeline — landed JSON payload → flatten → staging
    * cast → yearly mart, materialized as a table. Mirrors
    * extract >> create_tables >> load >> dbt (reference README.md:288)
    * collapsed into one SparkSession.
    *
    * @param payloadPath raw-zone JSON (the fetcher's landing file, S1/S3)
    * @return the materialized mart
    */
  def runFredPipeline(spark: SparkSession, payloadPath: String, seriesId: String,
                      martTable: String = "mart_financial_summary"): DataFrame = {
    val payload = Tables.readFredJson(spark, payloadPath)
    val raw = FinanceOps.flattenFredPayload(payload, seriesId)
    val stg = FinanceOps.stgFinancialData(raw)
    FinanceOps.materializeView(stg, "stg_financial_data")        // S9: staging = view
    val mart = FinanceOps.martFinancialSummary(stg)
    FinanceOps.materializeTable(mart, martTable)                 // S10: mart = table
    spark.table(martTable)
  }

  /** [EXT] The LLM training-data pipeline end-to-end, one call: exact
    * dedup → near-dup collapse (MinHash LSH pairs → connected components,
    * keep each cluster's min doc) → quality floor → fixed-window chunking.
    * Returns the chunked training corpus. Every stage is an operator from
    * DedupOps/TextOps, so the whole chain stays a declarative plan (the
    * one iterative step, dupComponents, is bounded by dup-cluster
    * diameter) — and the full composition is DuckDB-oracled as the
    * `corpus_pipeline` query.
    */
  def runCorpusPipeline(docs: DataFrame, minQuality: Double = 0.3): DataFrame = {
    val exact = DedupOps.exactDedup(docs)
    val comps = DedupOps.dupComponents(DedupOps.minhashCandidatePairs(exact))
    val survivors = exact.join(comps, Seq("doc_id"), "left")
      .filter(col("component").isNull || col("component") === col("doc_id"))
      .select(col("doc_id"), col("text"))
    val kept = TextOps.qualityScore(survivors)
      .filter(col("quality") >= minQuality)
      .select(col("doc_id"))
    TextOps.chunks(survivors.join(kept, Seq("doc_id")))
  }

  /** [EXT] The corpus pipeline at full width — every filter family a
    * modern training-data pipeline runs, composed in the standard order:
    * exact dedup → near-dup collapse → quality floor → Gopher rule gate →
    * repetition cap → PII scrub → chunking. Deduplication runs FIRST
    * (cheapest way to shrink everything downstream); per-doc filters run
    * before redaction so their signals see the original text; redaction
    * precedes chunking so no chunk straddles a scrubbed span. All stages
    * are declarative single passes except the bounded dupComponents
    * iteration — and the whole composition is DuckDB-oracled as ONE query
    * (`corpus_full`).
    */
  def runCorpusPipelineFull(docs: DataFrame, minQuality: Double = 0.3,
                            maxDupTrigram: Double = 0.5): DataFrame = {
    val exact = DedupOps.exactDedup(docs)
    val comps = DedupOps.dupComponents(DedupOps.minhashCandidatePairs(exact))
    // four downstream branches (three filter families + the final join)
    // each consume survivors — persist it once so the dedup chain (incl.
    // the iterative collapse) doesn't replay per branch. Cache lifecycle
    // belongs to the caller (Verify/Bench clearCache between queries).
    val survivors = exact.join(comps, Seq("doc_id"), "left")
      .filter(col("component").isNull || col("component") === col("doc_id"))
      .select(col("doc_id"), col("text"))
      .persist()
    val q = TextOps.qualityScore(survivors)
      .filter(col("quality") >= minQuality).select("doc_id")
    val gk = TextOps.gopherQuality(survivors)
      .filter(col("keep")).select("doc_id")
    val rep = TextOps.repetitionStats(survivors)
      .filter(col("dup_trigram_ratio") <= maxDupTrigram).select("doc_id")
    val kept = survivors
      .join(q, Seq("doc_id")).join(gk, Seq("doc_id")).join(rep, Seq("doc_id"))
    val clean = TextOps.redactPii(kept).withColumnRenamed("redacted", "text")
    TextOps.chunks(clean)
  }

  /** E2: the fundamentals pipeline — raw-zone CSV → ingest defaults →
    * staging join → KPI mart (reference README.md:421-495).
    *
    * @param rawCsvPath raw-zone CSV (the S3→warehouse load input, S6)
    */
  def runFundamentalsPipeline(spark: SparkSession, rawCsvPath: String,
                              kpiTable: String = "mart_financial_kpis"): DataFrame = {
    val raw = IngestOps.withIngestTimestamp(          // F5: created_at default
      Tables.readFundamentalsCsv(spark, rawCsvPath))
    val stg = FinanceOps.stgFundamentals(raw)
    FinanceOps.materializeView(stg, "stg_fundamentals")
    val kpis = FinanceOps.financialKpis(stg)
    FinanceOps.materializeTable(kpis, kpiTable)
    spark.table(kpiTable)
  }
}
