package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing ([EXT], SURVEY.md §2.11): treat image/audio/
  * video payloads as opaque `BinaryType` columns with a typed metadata
  * struct, and run decode/feature-extraction as *batched* per-partition
  * passes.
  *
  * The actual codec step is STUBBED (no image/audio libs in this
  * container): `stubDecode` derives deterministic fake dimensions from the
  * bytes. Everything around it — schema, batch iteration, partition
  * sizing — is the real plumbing a decode UDF would use: swap
  * `fakeDecode` for an actual codec call and nothing else changes.
  */
object MultimodalOps {

  /** Attach a binary payload + metadata struct to each document: the shape
    * a crawler/ingest job produces for image-text pairs. Payload here is
    * the utf-8 bytes of `text` standing in for real media bytes.
    */
  def withPayload(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast(BinaryType).as("payload"),
      struct(
        lit("image/fake").as("content_type"),
        octet_length(col("text").cast(BinaryType)).as("n_bytes"),
        col("source").as("origin")).as("media_meta"))

  /** Declarative metadata extraction — stays in whole-stage codegen; this
    * is the path for anything derivable without running a codec.
    * The fake width/height are pure arithmetic on payload size + first
    * byte, so the same computation is expressible in the DuckDB oracle.
    */
  def payloadMeta(documents: DataFrame): DataFrame =
    withPayload(documents)
      .select(
        col("doc_id"),
        col("media_meta.n_bytes").as("n_bytes"),
        ((col("media_meta.n_bytes") * 7 + expr("ascii(substring(cast(payload as string), 1, 1))")) % 1024)
          .cast(IntegerType).as("fake_width"),
        ((col("media_meta.n_bytes") * 13 + lit(31)) % 768)
          .cast(IntegerType).as("fake_height"))

  /** Deterministic stand-in for a codec: "decodes" bytes to (w, h, mean
    * luminance). Replace the body with e.g. ImageIO/ffmpeg and the operator
    * contract is unchanged.
    */
  private def fakeDecode(bytes: Array[Byte]): (Int, Int, Double) = {
    val n = bytes.length
    val first = if (n > 0) bytes(0) & 0xff else 0
    val lum = if (n == 0) 0.0 else bytes.map(b => (b & 0xff).toDouble).sum / n
    ((n * 7 + first) % 1024, (n * 13 + 31) % 768, math.round(lum * 1e6) / 1e6)
  }

  /** Batched decode over partitions — the mapPartitions shape a real codec
    * needs (amortizes per-batch init like decoder contexts / model weights
    * across all rows of a partition; the Scala analog of `mapInPandas`).
    * Partition count governs decode parallelism: repartition upstream to
    * (cluster cores × small factor) before calling at scale.
    */
  def decodeFeatures(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_lum", DoubleType)))
    val payloads = withPayload(documents).select("doc_id", "payload")
    val rows = payloads.rdd.mapPartitions { iter =>
      // per-partition init would go here (decoder context, model handle)
      iter.map { r =>
        val (w, h, lum) = fakeDecode(r.getAs[Array[Byte]]("payload"))
        Row(r.getAs[Long]("doc_id"), w, h, lum)
      }
    }
    spark.createDataFrame(rows, outSchema)
  }
}
