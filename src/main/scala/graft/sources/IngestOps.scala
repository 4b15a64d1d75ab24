package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest-side sinks and defaults (SURVEY.md §2.1 S3/S5/S8, §2.7 F5/F8,
  * §2.8 O6): the Spark spellings of the reference's raw-zone writes.
  */
object IngestOps {

  /** S3: raw-zone JSON landing (reference data_loader/fetch_data.py:13-14
    * dumps the API payload verbatim before any parsing — keep that habit:
    * re-parses are free, re-fetches are not).
    */
  def writeRawJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** S5 + F8: CSV sink partitioned by run date — the
    * `s3://…/financial_data/{ds}/…` layout (reference README.md:353-361)
    * as a real partition column, which is what makes the raw zone
    * partition-prunable instead of merely name-spaced.
    */
  def writeRunDateCsv(df: DataFrame, path: String, runDate: String): Unit =
    df.withColumn("dt", lit(runDate))
      .write.mode("overwrite")
      .option("header", "true")
      .partitionBy("dt")
      .csv(path)

  /** ORC round-trip: the second columnar at-rest format next to parquet
    * (a warehouse migrating off the reference's Postgres footprint
    * chooses one or the other; readers must agree byte-for-byte either
    * way). Write + read back through Spark's built-in ORC datasource —
    * the consumer hash-gates the surviving content, so the round-trip
    * is oracle-proven, not assumed.
    */
  def orcRoundTrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").orc(path)
    df.sparkSession.read.orc(path)
  }

  /** PERMISSIVE CSV ingest with captured bad records — the raw-zone
    * reality the reference's manual load step glosses over: feeds carry
    * malformed rows, and a load must neither die on them (FAILFAST) nor
    * silently null them (plain PERMISSIVE). Rows that fail the schema
    * land with their ORIGINAL text in `_corrupt` — clean rows flow on,
    * corrupt rows are quarantine-able (the dq tier's `store-failures`
    * idea applied at the parse boundary).
    *
    * Spark wrinkle encoded here: the corrupt-record column must be part
    * of the read schema, and a query over ONLY that column is
    * disallowed — callers keep at least one data column in scope.
    */
  def readCsvAudited(spark: org.apache.spark.sql.SparkSession, path: String,
                     schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val withCorrupt = schema
      .add(org.apache.spark.sql.types.StructField("_corrupt",
        org.apache.spark.sql.types.StringType, nullable = true))
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(withCorrupt)
      .csv(path)
  }

  /** Parse-boundary audit over `readCsvAudited`: clean/corrupt counts —
    * the load gate a pipeline checks before promoting the batch. The
    * row count deliberately references a DATA column (via a never-null
    * coalesce): Spark refuses queries whose referenced columns are only
    * the corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    * reference keeps the parse honest without caching the frame.
    */
  def csvLoadAudit(df: DataFrame): DataFrame = {
    val dataCols = df.columns.filter(_ != "_corrupt")
    require(dataCols.nonEmpty, "audited frame has no data columns")
    // The grouping key is "" for every row but REFERENCES every data
    // column through a non-foldable expression, for two reasons: (a) a
    // plain aggregate gets pruned down to the corrupt column alone,
    // re-triggering the corrupt-only-query restriction; (b) under CSV
    // column pruning a row is only marked corrupt when a REQUIRED column
    // fails to parse — auditing through a one-column anchor would
    // silently pass rows whose unreferenced columns are malformed. One
    // group → one audit row, same as a global agg.
    val anchor = substring(
      concat_ws("", dataCols.map(c => col(c).cast("string")).toIndexedSeq: _*), 1, 0)
    df.groupBy(anchor.as("__anchor"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("_corrupt").isNull, 1L).otherwise(0L)).as("n_clean"),
        sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L)).as("n_corrupt"))
      .drop("__anchor")
  }

  /** F5: ingest timestamp default — `created_at TIMESTAMPTZ DEFAULT NOW()`
    * (reference README.md:265).
    */
  def withIngestTimestamp(df: DataFrame): DataFrame =
    df.withColumn("created_at", current_timestamp())

  /** S11: JDBC warehouse sink — the reference lands every dbt mart in
    * Postgres for its BI layer (reference readme.md:50-52,
    * requirements.txt:4,6). Spark's JDBC writer batches inserts per
    * partition; `numPartitions` caps concurrent connections so a
    * 1000-executor cluster cannot open 1000 sessions against one
    * warehouse, and `batchsize` amortizes round-trips. No Postgres
    * endpoint exists in this sandbox; the execution path is exercised
    * end-to-end against embedded Derby (on Spark's own classpath) in
    * IngestOpsSpec — same DataSource, dialect-translated DDL/DML.
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
                user: String, password: String,
                numPartitions: Int = 8, batchSize: Int = 10000,
                mode: String = "append"): Unit =
    df.repartition(numPartitions)
      .write.mode(mode)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("numPartitions", numPartitions.toString)
      .option("batchsize", batchSize.toString)
      .save()

  /** Range-clustered parquet write: repartition by range on the cluster
    * key, sort within each partition, write one file per range. The point
    * is DATA SKIPPING AT REST — parquet row-group/file statistics carry
    * min/max per column, and a reader filtering on the cluster key prunes
    * whole files only when key ranges are DISJOINT across files. A plain
    * hash-partitioned write scatters every key range across every file
    * (min/max spans everything, nothing prunes); this layout is the
    * single-column version of what Z-ordering buys multi-column filters.
    *
    * At 100 TB this is the cheapest read-amplification lever there is:
    * one extra range shuffle at write time (sampled range boundaries, no
    * skew cliff) buys every downstream key-range scan a file-level prune
    * — the same reason the IVF index partitions lists by centroid.
    * `files` sizes the output (≈ table bytes / target file size);
    * sortWithinPartitions additionally orders row groups INSIDE each
    * file so row-group-level stats prune sub-file.
    */
  def writeRangeClustered(df: DataFrame, path: String, clusterCol: String,
                          files: Int = 32): Unit =
    df.repartitionByRange(files, col(clusterCol))
      .sortWithinPartitions(col(clusterCol))
      .write.mode("overwrite").parquet(path)

  /** Two-column Z-order clustered write — the multi-dimensional extension
    * of `writeRangeClustered`: each row's two cluster keys are scaled to
    * 16-bit grid cells (min/max normalization — two tiny aggregates) and
    * their bits INTERLEAVED into one z-value; range-partitioning + sorting
    * on that z-value gives every output file a bounded min/max BOX in
    * (colA, colB) space, so file statistics prune scans filtering on
    * EITHER column (a single-column sort only ever prunes its own column
    * — a filter on the other one reads every file).
    *
    * The interleave is an unrolled shift/mask SQL expression — pure
    * codegen, no UDF — and the z-value is dropped before the write, so
    * the layout is invisible to readers except through the statistics.
    * Same 100 TB rationale as range clustering; this is what table
    * formats market as Z-ORDER compaction, available here on plain
    * parquet at write time.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    files: Int = 32): Unit =
    // native O(log n) Morton spread (graft.functions.interleaveBits) —
    // one fused codegen block instead of a 32-term shift/mask Add chain
    writeCurveOrdered(df, path, colA, colB, files,
      graft.functions.GraftFunctions.interleaveBits)

  /** Hilbert-ordered sibling of [[writeZOrdered]]: same 16-bit grid
    * normalization, same range-partition + sort, but the curve key is the
    * native Hilbert index — no quadrant-boundary diagonal jumps, so each
    * output file's (colA, colB) bounding box is as tight or tighter than
    * the Morton layout's for the same file count (measured:
    * `hilbert_span_audit` vs `zorder_span_audit`). This is what table
    * formats are adopting as Hilbert compaction, on plain parquet.
    */
  def writeHilbertOrdered(df: DataFrame, path: String, colA: String, colB: String,
                          files: Int = 32): Unit =
    writeCurveOrdered(df, path, colA, colB, files,
      graft.functions.GraftFunctions.hilbertIndex)

  private def writeCurveOrdered(df: DataFrame, path: String, colA: String,
                                colB: String, files: Int,
                                curve: (org.apache.spark.sql.Column,
                                  org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Unit = {
    import org.apache.spark.sql.types.DoubleType
    val mm = df.agg(
      min(col(colA).cast(DoubleType)).as("la"), max(col(colA).cast(DoubleType)).as("ha"),
      min(col(colB).cast(DoubleType)).as("lb"), max(col(colB).cast(DoubleType)).as("hb"))
      .head()
    val (la, ha, lb, hb) = (mm.getDouble(0), mm.getDouble(1), mm.getDouble(2), mm.getDouble(3))
    def cell(c: String, lo: Double, hi: Double): String =
      if (hi <= lo) "0L"
      else s"least(65535L, cast(floor((cast($c as double) - $lo) / ${hi - lo} * 65536.0d) as bigint))"
    df.withColumn("__za", expr(cell(colA, la, ha)))
      .withColumn("__zb", expr(cell(colB, lb, hb)))
      .withColumn("__z", curve(col("__za"), col("__zb")))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__za", "__zb", "__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ⌈bytes / targetFileBytes⌉ files. The maintenance job every
    * incremental sink eventually needs — streaming appends
    * (`corpusScreenWriter`, `availableNowWriter`) and per-batch index
    * appends (`appendToIvfIndex`) each land one-file-per-micro-batch, and
    * at 100 TB the resulting listing/open overhead (plus lost row-group
    * statistics width) throttles every reader. Sizing from the ACTUAL
    * on-disk bytes (not file count) keeps output files near the target
    * regardless of how skewed the input files are.
    *
    * Safe swap: the rewrite lands in a staging dir first, then an atomic
    * directory rename replaces the original — a reader never observes a
    * half-compacted directory (rename atomicity is per-filesystem; object
    * stores want the staging dir + catalog-pointer flip instead, same
    * two-phase shape).
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, dir: String,
                     targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val path = new java.io.File(dir)
    val bytes = Option(path.listFiles).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.length).sum
    val files = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val staging = new java.io.File(dir + ".compacting")
    try {
      spark.read.parquet(dir).repartition(files)
        .write.mode("overwrite").parquet(staging.toString)
      val old = new java.io.File(dir + ".old")
      require(path.renameTo(old) && staging.renameTo(path),
        s"atomic swap failed for $dir")
      org.apache.commons.io.FileUtils.deleteDirectory(old)
    } catch { case scala.util.control.NonFatal(e) =>
      // a failed rewrite must not leave a stale staging dir for the next
      // compaction run to mistake for its own output
      org.apache.commons.io.FileUtils.deleteQuietly(staging)
      throw e
    }
    files
  }

  /** O6: incremental append into a time-partitioned table (the hypertable
    * analog, S8) — append new run-date partitions; dedup downstream via
    * DedupOps/`dropDuplicatesWithinWatermark` rather than rewriting
    * history. Dynamic partition overwrite keeps re-runs idempotent per
    * partition without touching the rest of the table.
    */
  def appendRunPartition(df: DataFrame, table: String, runDate: String): Unit = {
    val withDt = df.withColumn("dt", lit(runDate)) // dt last: insertInto is positional
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table))
      withDt.write.partitionBy("dt").saveAsTable(table)
    else {
      // dynamic mode: overwrite replaces only the partitions present in the
      // incoming frame (this run's dt), leaving history untouched
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "dynamic")
      try withDt.write.mode("overwrite").insertInto(table)
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
