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
