package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing ([EXT], SURVEY.md §2.11): treat image/audio/
  * video payloads as opaque `BinaryType` columns with a typed metadata
  * struct, and run decode/feature-extraction as *batched* per-partition
  * passes.
  *
  * Two codec tiers: `decodeFeatures` keeps the deterministic STUB codec
  * (`fakeDecode` — the shape for codecs whose libraries this container
  * lacks, e.g. audio/video), and `withPngPayload`/`decodePngFeatures` run
  * a REAL compressed-image round trip through the JDK's ImageIO (PNG
  * encode → PNG decode), oracled end-to-end via engineered pixel stats.
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

  /** REAL codec tier: deterministic PNG payloads encoded and decoded with
    * the JDK's ImageIO — an actual compressed-image round trip, not the
    * stub. Pixel content is engineered from the row's own columns
    * (constant per channel: R = doc_id % 256, G = (doc_id·7+13) % 256,
    * B = n_chars % 256; dims 4+doc_id%13 × 4+n_chars%11), so the DECODED
    * stats are closed-form in SQL and the DuckDB gate hash-proves that a
    * real encoder → real decoder pipeline preserved them end-to-end.
    * Both passes are the batched `mapPartitions` shape with per-partition
    * init (ImageIO cache off once per batch, counted by an accumulator
    * the spec asserts on) — swap the pixel source for crawl bytes and
    * nothing else changes.
    */
  def withPngPayload(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val rows = documents.select("doc_id", "n_chars").rdd.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false) // per-batch init, once
      iter.map { r =>
        val (docId, nChars) = (r.getLong(0), r.getLong(1))
        val w = (4 + (docId % 13)).toInt
        val h = (4 + (nChars % 11)).toInt
        val rgb = (((docId % 256).toInt << 16)
          | (((docId * 7 + 13) % 256).toInt << 8)
          | (nChars % 256).toInt)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(docId, bos.toByteArray)
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Decode (doc_id, payload) PNG rows back to dimensions + floor-mean
    * channel stats. Means are integer (pixel-sum div pixel-count): exact
    * for any constant-channel payload and float-free for the comparator
    * on any payload. `initCounter`, when supplied, increments once per
    * partition — the spec's proof that codec init is per-BATCH, not
    * per-row.
    */
  def decodePngFeatures(payloads: DataFrame,
                        initCounter: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = payloads.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_r", LongType),
      StructField("mean_g", LongType),
      StructField("mean_b", LongType)))
    val rows = payloads.select("doc_id", "payload").rdd.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false) // per-batch decoder init
      initCounter.foreach(_.add(1L))
      iter.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Row(r.getAs[Long]("doc_id"), w, h, sr / n, sg / n, sb / n)
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Gradient-PNG payload tier for the perceptual-hash pipeline: real
    * PNGs whose LUMINANCE VARIES within the frame (the constant-color
    * `withPngPayload` images would dHash to all-zero bits). Pixel
    * luminance is the closed form (a·x + b·y + c) mod 256 with
    * a = 1 + doc_id mod 7, b = (doc_id div 7) mod 5, c = n_chars mod 256
    * — engineered from the row's own columns so the DECODED hash is
    * SQL-replayable, with distinct docs colliding exactly when their
    * (a, b, c) wrap pattern agrees (the dup structure the pair query
    * exercises). Canvas is the dHash grid itself, 9×7 (a production
    * pipeline resizes arbitrary images to this grid first — that resize
    * is the only stubbed stage; the batched encode/decode plumbing is
    * identical). Same per-partition-init `mapPartitions` shape as
    * `withPngPayload`.
    */
  def withGradientPng(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val rows = documents.select("doc_id", "n_chars").rdd.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false)
      iter.map { r =>
        val (docId, nChars) = (r.getLong(0), r.getLong(1))
        val a = (1 + docId % 7).toInt
        val b = ((docId / 7) % 5).toInt
        val c = (nChars % 256).toInt
        val (w, h) = (9, 7)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val lum = (a * x + b * y + c) % 256
            img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(docId, bos.toByteArray)
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Perceptual difference-hash (dHash) from DECODED pixels: bit(x, y) =
    * [lum(x+1, y) > lum(x, y)] over the 9×7 luminance grid → 56 bits
    * packed little-endian into a positive BIGINT (the 9-wide/7-high grid
    * is chosen so the top bit stays clear — no sign-wrap divergence
    * between engines). Gradient direction survives brightness shifts and
    * (with a real resize front-end) rescaling — the property that makes
    * dHash the standard near-dup key for images where exact byte hashing
    * fails. Identical hashes then dedup with a plain groupBy: the
    * multimodal analog of `exactDedup`, one shuffle of (doc_id, long)
    * rows at any corpus size. Batched `mapPartitions` decode with the
    * spec-counted per-partition init.
    */
  def imagePhash(payloads: DataFrame,
                 initCounter: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = payloads.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("phash", LongType)))
    val rows = payloads.select("doc_id", "payload").rdd.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false)
      initCounter.foreach(_.add(1L))
      iter.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
        val (w, h) = (img.getWidth, img.getHeight)
        var hash = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w - 1) {
            val l0 = (img.getRGB(x, y) >> 16) & 0xff
            val l1 = (img.getRGB(x + 1, y) >> 16) & 0xff
            if (l1 > l0) hash |= 1L << (y * (w - 1) + x)
            x += 1
          }
          y += 1
        }
        Row(r.getAs[Long]("doc_id"), w, h, hash)
      }
    }
    spark.createDataFrame(rows, outSchema)
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

  /** [[withGradientPng]] at `scale`× resolution (canvas 9·scale ×
    * 7·scale, the SAME closed-form luminance over the larger grid) — the
    * input that makes a real resize stage exercisable: the production
    * pipeline decodes arbitrary-size images and area-averages them down
    * to the hash grid, and this payload gives that stage real work while
    * keeping every downstream pixel SQL-replayable.
    */
  def withGradientPngScaled(documents: DataFrame, scale: Int = 4): DataFrame = {
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val spark = documents.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val rows = documents.select("doc_id", "n_chars").rdd.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false)
      iter.map { r =>
        val (docId, nChars) = (r.getLong(0), r.getLong(1))
        val a = (1 + docId % 7).toInt
        val b = ((docId / 7) % 5).toInt
        val c = (nChars % 256).toInt
        val (w, h) = (9 * scale, 7 * scale)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val lum = (a * x + b * y + c) % 256
            img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(docId, bos.toByteArray)
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Decode → REAL area-average resize → dHash: the full production
    * composition for perceptual image dedup, closing the one stage
    * [[withGradientPng]]'s scaladoc declared stubbed. Each target cell is
    * the integer mean (sum div blockArea — floor division on both
    * engines) of its (w/targetW)×(h/targetH) source block; the dHash
    * then reads the resized grid exactly as [[imagePhash]] reads a
    * native-size one. Area averaging is the resize used by real
    * perceptual-hash front-ends (box filter = antialiased downscale),
    * and on the closed-form gradient every resized pixel — and therefore
    * the hash — is SQL-replayable. Same batched `mapPartitions`
    * per-partition-init shape as every codec stage here.
    */
  def imageResizePhash(payloads: DataFrame, targetW: Int = 9,
                       targetH: Int = 7): DataFrame = {
    val spark = payloads.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("src_w", IntegerType),
      StructField("src_h", IntegerType),
      StructField("phash", LongType)))
    val rows = payloads.select("doc_id", "payload").rdd.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false)
      iter.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
        val (w, h) = (img.getWidth, img.getHeight)
        require(w % targetW == 0 && h % targetH == 0,
          s"source ${w}x$h must tile the ${targetW}x$targetH target grid")
        val (bw, bh) = (w / targetW, h / targetH)
        val cells = Array.ofDim[Int](targetH, targetW)
        var cy = 0
        while (cy < targetH) {
          var cx = 0
          while (cx < targetW) {
            var sum = 0
            var dy = 0
            while (dy < bh) {
              var dx = 0
              while (dx < bw) {
                sum += (img.getRGB(cx * bw + dx, cy * bh + dy) >> 16) & 0xff
                dx += 1
              }
              dy += 1
            }
            cells(cy)(cx) = sum / (bw * bh)
            cx += 1
          }
          cy += 1
        }
        var hash = 0L
        var y = 0
        while (y < targetH) {
          var x = 0
          while (x < targetW - 1) {
            if (cells(y)(x + 1) > cells(y)(x)) hash |= 1L << (y * (targetW - 1) + x)
            x += 1
          }
          y += 1
        }
        Row(r.getAs[Long]("doc_id"), w, h, hash)
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Deterministic video metadata derived from the row's own columns —
    * the typed-metadata half of the opaque-binary video pattern
    * (duration and fps a real container parse would surface; the codec
    * itself is honestly absent in this environment, so the values are
    * engineered from (doc_id, n_chars) exactly like the gradient PNG's
    * luminance constants, keeping every downstream computation
    * oracle-replayable).
    */
  def withVideoMeta(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      (lit(1000L) + (col("n_chars") % 60) * 1000L).as("duration_ms"),
      (lit(24L) + (col("doc_id") % 2) * 6L).as("fps"),
      lit(4096L).as("frame_bytes"))

  /** Uniform-time frame sampling over the video metadata: one sample per
    * `everyMs` of media time, each mapped to its container frame index
    * (ts·fps div 1000) and byte offset — the manifest a downstream
    * decode stage fans out over. Pure per-row expression work (explode
    * over `sequence`, every derived column integer arithmetic) inside
    * whole-stage codegen: zero shuffles, composes with a corpus scan at
    * any scale, and partition count alone governs decode parallelism —
    * exactly the Spark-side plumbing contract for multimodal columns.
    */
  def frameSample(meta: DataFrame, everyMs: Long = 1000L): DataFrame = {
    require(everyMs > 0, s"sampling period must be positive, got $everyMs")
    meta
      .select(col("doc_id"), col("duration_ms"), col("fps"), col("frame_bytes"),
        explode(expr(s"sequence(0L, (duration_ms - 1) div $everyMs)"))
          .as("sample_idx"))
      .select(col("doc_id"), col("sample_idx"),
        (col("sample_idx") * lit(everyMs)).as("ts_ms"),
        expr(s"(sample_idx * $everyMs * fps) div 1000").as("frame_idx"),
        expr(s"((sample_idx * $everyMs * fps) div 1000) * frame_bytes")
          .as("byte_off"))
  }
}
