package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fact-scale global ordering primitives — the shard + carry discipline.
  *
  * A `Window.orderBy(...)` with no partition key serializes the whole
  * frame through ONE reducer ("WindowExec: No Partition Defined"): correct
  * at dimension scale, a straggler at fact scale (10⁹ customers ranks on
  * one task). The scale-correct construction for an EXACT global
  * rank/running-sum (not an approximation) is:
  *
  *  1. range-repartition on the sort key — partition i holds keys ≤
  *     partition i+1's (Spark's RangePartitioner; sampled boundaries only
  *     decide WHERE the cuts fall, never the result),
  *  2. a per-shard window for the local rank / local running sum
  *     (parallel across shards),
  *  3. a carry frame of ONE ROW PER SHARD (count / sum per shard,
  *     prefix-summed over shard ids) broadcast back — the only global
  *     step, over #shards rows, not #rows.
  *
  * global = carry(shard) + local. Deterministic under any cluster layout
  * as long as the composite sort key is UNIQUE (callers pass an id
  * tie-break, same rule as every rank window in this codebase): each
  * row's global rank is the count of strictly-smaller keys + 1 regardless
  * of boundary placement. This is `packChunks`'s sharding discipline
  * generalized from independent per-shard totals to exact global ones.
  */
object ShardedOrder {

  /** Exact global row_number over `sortCols` (must be a unique composite
    * key) as `rankCol`, computed with per-shard windows + a broadcast
    * carry. Equivalent to `row_number().over(Window.orderBy(sortCols))`
    * but never funnels the frame through one reducer.
    */
  def withGlobalRank(df: DataFrame, rankCol: String, shards: Int, sortCols: Column*): DataFrame = {
    require(shards >= 1, s"shards out of range: $shards")
    // localCheckpoint is LOAD-BEARING, not an optimization: __shard comes
    // from spark_partition_id over the range exchange, and the frame is
    // consumed TWICE (per-shard window + carry aggregate). Without
    // materialization each consumer re-executes the exchange, whose
    // boundary SAMPLING can differ between executions (upstream row order
    // is not deterministic), silently mis-associating carries with
    // layouts — observed as wrong ranks at sf0.1. One materialized layout
    // makes the id a fixed fact both consumers share.
    val parted = df.repartitionByRange(shards, sortCols: _*)
      .withColumn("__shard", spark_partition_id())
      .localCheckpoint()
    val wLoc = Window.partitionBy(col("__shard")).orderBy(sortCols: _*)
    val local = parted.withColumn("__lrank", row_number().over(wLoc).cast(LongType))
    // carry: one row per shard; the global window here runs over ≤ shards
    // rows — the whole point of the construction
    // constant-key partition (repo idiom): same one-reducer semantics —
    // fine over ≤ `shards` rows — without the misleading global-window
    // warning in the logs
    val wCarry = Window.partitionBy(pmod(col("__shard"), lit(1)))
      .orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__shard")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wCarry), lit(0L)))
      .select(col("__shard"), col("__off"))
    local.join(broadcast(offsets), Seq("__shard"))
      .withColumn(rankCol, col("__off") + col("__lrank"))
      .drop("__shard", "__lrank", "__off")
  }

  /** One-pass fusion of [[withGlobalRank]] + [[withRunningSum]] over the
    * SAME sort key (r16): callers that need both the exact global rank
    * and the exact inclusive running sum in one order previously stacked
    * the two primitives — two range exchanges, two materialized layouts,
    * two carry rounds. Both derivations share everything but the carried
    * quantity, so this computes them from ONE range exchange, ONE
    * checkpointed layout, ONE per-shard WindowExec (row_number and the
    * framed sum share the partition/order spec) and ONE carry aggregate
    * (count + sum per shard). Results are identical to the stacked form
    * by construction.
    */
  def withGlobalRankAndRunningSum(df: DataFrame, rankCol: String,
                                  valueCol: Column, sumCol: String,
                                  shards: Int, sortCols: Column*): DataFrame = {
    require(shards >= 1, s"shards out of range: $shards")
    // same load-bearing localCheckpoint as withGlobalRank: one layout,
    // shared by the local window pair and the carry aggregate
    val parted = df.repartitionByRange(shards, sortCols: _*)
      .withColumn("__shard", spark_partition_id())
      .withColumn("__v", valueCol)
      .localCheckpoint()
    val wLoc = Window.partitionBy(col("__shard")).orderBy(sortCols: _*)
    val wLocSum = wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted
      .withColumn("__lrank", row_number().over(wLoc).cast(LongType))
      .withColumn("__lsum", sum(col("__v")).over(wLocSum))
    // constant-key partition (repo idiom): same one-reducer semantics —
    // fine over ≤ `shards` rows — without the misleading global-window
    // warning in the logs
    val wCarry = Window.partitionBy(pmod(col("__shard"), lit(1)))
      .orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__shard"))
      .agg(count(lit(1)).as("__cnt"), sum(col("__v")).as("__ssum"))
      .withColumn("__roff", coalesce(sum(col("__cnt")).over(wCarry), lit(0L)))
      .withColumn("__soff", sum(col("__ssum")).over(wCarry))
      .select(col("__shard"), col("__roff"), col("__soff"))
    local.join(broadcast(offsets), Seq("__shard"))
      .withColumn(rankCol, col("__roff") + col("__lrank"))
      .withColumn(sumCol, when(col("__soff").isNull, col("__lsum"))
        .otherwise(col("__soff") + col("__lsum")))
      .drop("__shard", "__v", "__lrank", "__lsum", "__roff", "__soff")
  }

  /** Exact global INCLUSIVE running sum of `valueCol` in `sortCols` order
    * (unique composite key) as `outCol` — same shard + carry shape with
    * per-shard sums as the carry. Equivalent to
    * `sum(valueCol).over(Window.orderBy(sortCols).rowsBetween(unboundedPreceding, currentRow))`.
    */
  def withRunningSum(df: DataFrame, valueCol: Column, outCol: String,
                     shards: Int, sortCols: Column*): DataFrame = {
    require(shards >= 1, s"shards out of range: $shards")
    // same load-bearing localCheckpoint as withGlobalRank: one layout,
    // shared by the local-sum window and the carry aggregate
    val parted = df.repartitionByRange(shards, sortCols: _*)
      .withColumn("__shard", spark_partition_id())
      .withColumn("__v", valueCol)
      .localCheckpoint()
    val wLoc = Window.partitionBy(col("__shard")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("__lsum", sum(col("__v")).over(wLoc))
    // constant-key partition (repo idiom): same one-reducer semantics —
    // fine over ≤ `shards` rows — without the misleading global-window
    // warning in the logs
    val wCarry = Window.partitionBy(pmod(col("__shard"), lit(1)))
      .orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__shard")).agg(sum(col("__v")).as("__ssum"))
      .withColumn("__off", sum(col("__ssum")).over(wCarry))
      .select(col("__shard"), col("__off"))
    local.join(broadcast(offsets), Seq("__shard"))
      .withColumn(outCol, when(col("__off").isNull, col("__lsum"))
        .otherwise(col("__off") + col("__lsum")))
      .drop("__shard", "__v", "__lsum", "__off")
  }

  /** Exact global EXCLUSIVE running max of `valueCol` in `sortCols` order
    * (unique composite key) as `outCol` — the prefix-maximum sibling of
    * [[withRunningSum]], exclusive because that is what a dominance scan
    * wants ("the best y among everything STRICTLY ahead of me"; the
    * inclusive variant is just greatest(out, value)). NULL for the
    * global first row. Same shard + carry shape: per-shard exclusive
    * cummax window, a one-row-per-shard max carried over prior shards.
    */
  def withRunningMax(df: DataFrame, valueCol: Column, outCol: String,
                     shards: Int, sortCols: Column*): DataFrame = {
    require(shards >= 1, s"shards out of range: $shards")
    // same load-bearing localCheckpoint as withGlobalRank: one layout,
    // shared by the local-max window and the carry aggregate
    val parted = df.repartitionByRange(shards, sortCols: _*)
      .withColumn("__shard", spark_partition_id())
      .withColumn("__v", valueCol)
      .localCheckpoint()
    val wLoc = Window.partitionBy(col("__shard")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn("__lmax", max(col("__v")).over(wLoc))
    // constant-key partition (repo idiom): same one-reducer semantics —
    // fine over ≤ `shards` rows — without the misleading global-window
    // warning in the logs
    val wCarry = Window.partitionBy(pmod(col("__shard"), lit(1)))
      .orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__shard")).agg(max(col("__v")).as("__smax"))
      .withColumn("__off", max(col("__smax")).over(wCarry))
      .select(col("__shard"), col("__off"))
    local.join(broadcast(offsets), Seq("__shard"))
      .withColumn(outCol, greatest(col("__off"), col("__lmax")))
      .drop("__shard", "__v", "__lmax", "__off")
  }
}
