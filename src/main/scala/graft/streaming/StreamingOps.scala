package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Structured-Streaming surface (SURVEY.md §2.10) — the Spark-native
  * generalization of the reference's time-series warehouse (TimescaleDB
  * hypertable on ingest time, reference README.md:268) and its append-only
  * daily feed (reference dags/etl_dag.py:14).
  *
  * Every transform takes/returns DataFrame so the same code runs on a
  * batch frame (tests, backfills) and a `readStream` frame (production):
  * the batch/streaming unification is the point of Structured Streaming.
  */
object StreamingOps {

  /** Event-time watermark: bound state for all downstream stateful ops.
    * At 100 TB/day the watermark is what keeps window state finite.
    */
  def withEventTimeBounds(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", delay)

  /** Tumbling-window rollup — the streaming analog of the mart's yearly
    * aggregate (A1): counts + exact decimal totals per (window, type).
    */
  def tumblingCounts(events: DataFrame, width: String = "1 day"): DataFrame =
    events
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(18, 2)).as("total"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total"))

  /** Sliding-window variant (width, slide). */
  def slidingCounts(events: DataFrame, width: String = "1 hour", slide: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Stream-static enrichment — the canonical streaming dimension join:
    * every micro-batch of the event stream joins the (slowly-changing,
    * re-read per batch) dimension table and rolls up per (segment, type).
    * The dimension side is BROADCAST: at 100 TB/day of stream, the
    * dimension is the small side by construction, and a broadcast join
    * keeps the stream side shuffle-free — stateless, so no watermark is
    * needed and restart recovery is trivial. Same code runs the batch
    * face (oracled as `events_enriched`) and the streaming face (parity
    * spec): the batch/streaming unification Structured Streaming exists
    * for.
    */
  def enrichWithSegments(events: DataFrame, customer: DataFrame): DataFrame =
    events
      .join(broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100) as bigint)")).as("total_cents"))

  /** Session windows: activity sessions per user separated by ≥gap. */
  def userSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Stream-stream interval join (purchase attribution): each purchase
    * matches the same user's signups within [purchase_ts − window,
    * purchase_ts]. Batch plan: equi-join on user_id with a time-range
    * residual (shuffle by user, never a nested loop). Streaming plan: both
    * sides watermarked, and the time bound is what lets Spark evict signup
    * state once the watermark passes signup_ts + window — without it the
    * join state grows forever.
    */
  def purchaseAttribution(purchases: DataFrame, signups: DataFrame,
                          window: String = "7 days",
                          delay: String = "1 hour"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", delay)
    val s = signups
      .select(col("user_id").as("s_user_id"), col("ts").as("signup_ts"))
      .withWatermark("signup_ts", delay)
    p.join(s,
        col("user_id") === col("s_user_id") &&
          col("signup_ts") <= col("purchase_ts") &&
          col("signup_ts") >= col("purchase_ts") - expr(s"INTERVAL $window"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"), col("signup_ts"))
  }

  /** Watermarked stream-stream LEFT OUTER interval join — the remaining
    * standard stateful shape beside [[purchaseAttribution]]'s inner
    * variant: every purchase emits, matched rows with their signup_ts and
    * orphans null-padded. Batch plan: the same user-keyed equi-join with
    * the time-range residual, join type left_outer. Streaming plan: both
    * sides watermarked AND the interval condition bounds state exactly as
    * in the inner join; the null-padded row for an unmatched purchase is
    * emitted only when the watermark passes purchase_ts + delay — before
    * that a matching signup could still arrive, so "no match" is not yet
    * knowable. A purchase whose expiry the watermark never crosses stays
    * in state and emits nothing (append-mode semantics, pinned by the
    * spec's late-arrival-then-expiry case).
    */
  def purchaseAttributionOuter(purchases: DataFrame, signups: DataFrame,
                               window: String = "7 days",
                               delay: String = "1 hour"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", delay)
    val s = signups
      .select(col("user_id").as("s_user_id"), col("ts").as("signup_ts"))
      .withWatermark("signup_ts", delay)
    p.join(s,
        col("user_id") === col("s_user_id") &&
          col("signup_ts") <= col("purchase_ts") &&
          col("signup_ts") >= col("purchase_ts") - expr(s"INTERVAL $window"),
        "left_outer")
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"), col("signup_ts"))
  }

  /** Stateful streaming dedup by event_id, state bounded by the watermark.
    * (On a batch frame Spark treats this as plain dropDuplicates.)
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events.dropDuplicatesWithinWatermark("event_id")

  /** Incremental load (O6, reference README.md:558): catch-up batch
    * semantics via AvailableNow — processes everything currently available,
    * checkpoints, and stops; the streaming version of the reference's
    * daily append.
    */
  def availableNowWriter(df: DataFrame, outPath: String, checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .outputMode("append")

  /** Streaming incremental corpus screen — the daily-ingest dedup loop as
    * a restart-safe stream: each micro-batch is screened against the
    * PERSISTED fingerprint + band indexes
    * (`DedupOps.screenDeltaAgainstCorpus`), survivors append to the clean
    * zone, and their index rows append durably — so a later batch, or a
    * later RUN, can never re-admit a duplicate. The dedup state is the
    * at-rest index, NOT operator memory, on purpose: at 100 TB the
    * fingerprint index is shared with the batch pipeline, inspectable,
    * and compactable, where `dropDuplicates` checkpoint state is opaque
    * to everything but this one query and grows with the corpus, not the
    * delta (ST5 covers the within-watermark case; this owns the
    * against-all-history case).
    *
    * Delivery is at-least-once per micro-batch (a replayed batch re-lands
    * its survivors and re-appends index rows); the INDEX stays correct
    * under replay because screening is idempotent — a fingerprint present
    * twice still screens exactly — and the clean zone inherits the same
    * batch-replay discipline as every append sink (dedup on fp downstream,
    * or swap the write for the batch_id-keyed idempotent pattern of
    * `jdbcSinkWriterIdempotent`).
    */
  def corpusScreenWriter(docs: DataFrame, indexDir: String, outDir: String,
                         checkpoint: String): DataStreamWriter[Row] =
    docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        val (fpPath, bandPath) = (s"$indexDir/fp", s"$indexDir/bands")
        val empty = batch.limit(0)
        def readOrInit(path: String, init: DataFrame => DataFrame): DataFrame =
          if (new java.io.File(path).exists) spark.read.parquet(path)
          else init(empty)
        val clean = graft.operators.DedupOps.screenDeltaAgainstCorpus(
          batch,
          readOrInit(fpPath, graft.operators.DedupOps.corpusFingerprintIndex),
          readOrInit(bandPath, graft.operators.DedupOps.corpusBandIndex))
          .persist() // three consumers below
        clean.write.mode("append").parquet(outDir)
        graft.operators.DedupOps.corpusFingerprintIndex(clean)
          .write.mode("append").parquet(fpPath)
        graft.operators.DedupOps.corpusBandIndex(clean)
          .write.mode("append").parquet(bandPath)
        // the screen's internal fp-clean persist is not reachable from the
        // returned frame; this is a single-purpose ingest job, so clearing
        // the session cache per micro-batch is the correct lifecycle (and
        // what keeps a long-running stream from accumulating one cached
        // block set per batch)
        spark.catalog.clearCache()
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")

  /** Streaming → warehouse (S11 meets §2.10): land each micro-batch in the
    * JDBC warehouse via foreachBatch — Structured Streaming has no native
    * JDBC sink, and foreachBatch is the canonical bridge (it hands every
    * micro-batch to the BATCH writer, so the connection-capped/batched
    * `IngestOps.writeJdbc` path is reused verbatim). Delivery is
    * at-least-once: foreachBatch re-runs a batch after failure, so either
    * make the table idempotent-keyed or include `batch_id` (written here)
    * and dedup downstream — the same discipline as the reference's
    * append-only daily feed. Checkpointing makes restarts resume from the
    * last committed batch.
    */
  def jdbcSinkWriter(df: DataFrame, url: String, table: String,
                     user: String, password: String, checkpoint: String,
                     numPartitions: Int = 8): DataStreamWriter[Row] =
    df.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        graft.sources.IngestOps.writeJdbc(
          batch.withColumn("batch_id", lit(batchId)),
          url, table, user, password, numPartitions = numPartitions)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")

  /** The EXACTLY-ONCE-effective variant of `jdbcSinkWriter`: foreachBatch
    * replays a batch after any failure between sink write and checkpoint
    * commit — same data, same `batchId` — so the warehouse write must be
    * idempotent PER BATCH ID to make at-least-once delivery land as
    * exactly-once state. The standard discipline is delete-then-insert
    * keyed by batch_id inside the batch handler: a replayed batch first
    * removes whatever a previous (uncommitted) attempt landed, then
    * appends, so duplicate delivery collapses to one copy. The DELETE is
    * one driver-side statement per micro-batch (batch_id is the
    * partition-pruned key in a real warehouse); the insert path is the
    * same connection-capped batch writer. Verified by a forced-replay
    * test that deletes the checkpoint's commit marker — the strongest
    * failure injection available to a local harness.
    */
  def jdbcSinkWriterIdempotent(df: DataFrame, url: String, table: String,
                               user: String, password: String, checkpoint: String,
                               numPartitions: Int = 8): DataStreamWriter[Row] =
    df.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val conn = java.sql.DriverManager.getConnection(url, user, password)
        try {
          // existence probe via metadata, NOT a swallowed SQLException — a
          // broad catch would also mask real failures (wrong column case,
          // permissions) and silently turn the sink back into plain append
          val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
          var exists = false
          try while (rs.next()) {
            if (rs.getString(3).equalsIgnoreCase(table)) exists = true
          } finally rs.close()
          if (exists) {
            val st = conn.createStatement()
            // "batch_id" quoted: Spark's JDBC writer creates columns as
            // quoted identifiers, so the unquoted form would fold case
            // (Derby/Postgres fold opposite directions) and miss
            try st.executeUpdate(s"""DELETE FROM $table WHERE "batch_id" = $batchId""")
            finally st.close()
          }
        } finally conn.close()
        graft.sources.IngestOps.writeJdbc(
          batch.withColumn("batch_id", lit(batchId)),
          url, table, user, password, numPartitions = numPartitions)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")

  /** Streaming maintenance of the algebraic MV
    * (`RelationalOps.mvState/mvMerge`): each micro-batch's partial state
    * merges into the persisted view, so the MV tracks the stream without
    * ever recomputing the base — the streaming face of the same
    * O(|state| + |delta|) contract `mv_incremental` oracles in batch.
    *
    * Replay safety WITHOUT deletes: state versions are append-only
    * directories `v=<batchId>`, and version N is a PURE FUNCTION of
    * (latest version < N, batch N). foreachBatch replays a failed batch
    * with the same id and the same data, so the replay deterministically
    * overwrites `v=N` with identical content instead of double-merging —
    * the delete+insert idempotence of `jdbcSinkWriterIdempotent`,
    * restated functionally for an object store where atomic DELETE is
    * the expensive primitive and directory overwrite is the cheap one.
    * Old versions double as point-in-time reads and are retention-pruned
    * like any warehouse snapshot lineage.
    */
  def mvStreamWriter(orders: DataFrame, stateDir: String,
                     checkpoint: String): DataStreamWriter[Row] =
    orders.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val partial = graft.operators.RelationalOps.mvState(batch)
        val merged = mvVersions(stateDir).filter(_ < batchId).sorted.lastOption match {
          case Some(v) => graft.operators.RelationalOps.mvMerge(
            spark.read.parquet(s"$stateDir/v=$v"), partial)
          case None => partial
        }
        merged.write.mode("overwrite").parquet(s"$stateDir/v=$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")

  /** Committed state versions under `stateDir` (metadata-scale listing). */
  def mvVersions(stateDir: String): Seq[Long] = {
    val d = new java.io.File(stateDir)
    if (!d.exists) Seq.empty
    else d.listFiles.toSeq.filter(_.isDirectory).map(_.getName)
      .collect { case s if s.startsWith("v=") => s.stripPrefix("v=").toLong }
  }

  /** The current MV state (latest version); compose with
    * `RelationalOps.mvRead` for the derived-measure view.
    */
  def mvStateLatest(spark: org.apache.spark.sql.SparkSession,
                    stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/v=${mvVersions(stateDir).max}")

  /** Retention for the version lineage: drop all but the newest
    * `keepLast` state versions. Keep ≥ 2 so an in-flight replay of the
    * latest batch can still read its predecessor — pruning the
    * merge-parent of a batch that later replays is the one way the
    * versioned scheme can lose the idempotence property.
    */
  def mvPruneVersions(stateDir: String, keepLast: Int = 2): Seq[Long] = {
    require(keepLast >= 2, s"keepLast must be >= 2 (replay safety), got $keepLast")
    val stale = mvVersions(stateDir).sorted.dropRight(keepLast)
    stale.foreach { v =>
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(s"$stateDir/v=$v"))
    }
    stale
  }

  /** Streaming distribution-drift monitor: each micro-batch's value
    * distribution is KS-tested against a FIXED reference (per-value
    * counts from the training snapshot / a healthy baseline), and one
    * audit row per batch lands in `outDir` — the on-arrival alarm for
    * "this shard's lengths look nothing like what we trained on", before
    * a skewed batch pollutes downstream corpora. The per-batch work is
    * exactly `StatsOps.ksAgainstReference` (the spec proves stream rows
    * == the batch computation), so there is ONE drift definition in the
    * engine; reference counts are re-read per batch (metadata-scale) and
    * broadcast into the dimension-scale grid. Stateless — no watermark,
    * no state store; replays rewrite the same batch_id row (idempotent
    * audit via append + batch_id dedup at read).
    */
  def driftMonitorWriter(values: DataFrame, refCountsDir: String,
                         outDir: String, checkpoint: String): DataStreamWriter[Row] =
    values.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val ref = batch.sparkSession.read.parquet(refCountsDir)
        graft.operators.StatsOps.ksAgainstReference(batch.toDF(), ref)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")

  /** Streaming seasonal-anomaly monitor — the on-arrival face of
    * `EventOps.seasonalResidualOutliers`: each micro-batch of events is
    * rolled up to daily cents and screened against a PERSISTED 7-row
    * weekday baseline (written by the batch pipeline from history;
    * re-read per batch — metadata-scale — and broadcast), so a day that
    * breaks its own weekday's pattern alarms as it lands rather than at
    * the nightly rebuild. The residual definition is shared verbatim
    * (`EventOps.seasonalResiduals` — the spec proves stream rows == the
    * batch computation on the same slice). Stateless; replays rewrite
    * the same batch_id row (idempotent audit via append + batch_id
    * dedup at read). Note the monitor screens each batch's OWN daily
    * rollup: a day split across micro-batches audits per-batch partial
    * days by design (the alarm is directional, the nightly batch query
    * is the authority).
    */
  def seasonalMonitorWriter(events: DataFrame, baselineDir: String,
                            outDir: String, checkpoint: String,
                            thresholdPpm: Long = 500000L): DataStreamWriter[Row] =
    events.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val base = batch.sparkSession.read.parquet(baselineDir)
        graft.operators.EventOps.seasonalResiduals(
            graft.operators.EventOps.dailyCentsWithDow(batch.toDF()),
            base, thresholdPpm)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
}
