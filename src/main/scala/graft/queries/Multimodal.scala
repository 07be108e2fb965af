package graft.queries

import graft.{Engine, QueryDef}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, plus a batched "decode / feature-extract" stage.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked DETERMINISTIC FAKE (byte-statistics stand in for pixel
  * statistics). Everything around it is the real Spark shape you'd run at
  * 100 TB: binary payload column, metadata struct, partition-batched
  * decode via mapPartitions over a typed Dataset (the Scala analog of
  * mapInPandas — one iterator per partition so a real codec could amortize
  * model/codec init per batch, never per row), and a pure-SQL metadata
  * path that never touches the payload bytes.
  */
object Multimodal {

  /** Simulated media row: payload + the typed metadata a real pipeline
    * would carry (format/width/height inferred at ingest). */
  private def mediaFrame(spark: SparkSession, dir: String): DataFrame = {
    val docs = Engine.table(spark, dir, "documents")
    // Payload: utf-8 bytes of the text stand in for encoded media bytes.
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "utf-8").as("payload"),
      struct(
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpeg")
          .otherwise("webp").as("format"),
        (col("doc_id") % 640 + 32).cast(IntegerType).as("width"),
        (col("doc_id") % 480 + 32).cast(IntegerType).as("height")).as("meta"))
  }

  // --- metadata path: SQL-only, payload never deserialized ----------------
  // At scale this is a column-pruned scan: the binary column is not read.
  val meta: QueryDef = QueryDef.sqlBacked(
    "mm_meta",
    """SELECT
      |  CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'jpeg'
      |       ELSE 'webp' END AS format,
      |  count(*) AS n,
      |  CAST(sum(doc_id % 640 + 32) AS BIGINT) AS total_width,
      |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
      |FROM documents GROUP BY 1 ORDER BY format""".stripMargin
  ) { (spark, dir) =>
    mediaFrame(spark, dir)
      .select(col("meta.format").as("format"), col("meta.width"),
        octet_length(col("payload")).as("nbytes"))
      .groupBy(col("format"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("width")).cast(LongType).as("total_width"),
        sum(col("nbytes")).cast(LongType).as("total_bytes"))
      .orderBy(col("format"))
  }

  /** Decoded feature row produced by the batched decode stage. */
  final case class MediaFeatures(
      media_id: Long, format: String, width: Int, height: Int,
      n_bytes: Int, byte_mean: Double, frame_samples: Array[Int])

  // --- decode path: partition-batched feature extraction ------------------
  // STUB DECODE: byte statistics replace codec output. The signature —
  // Iterator[raw rows] => Iterator[feature rows] per partition — is the
  // contract a real decoder plugs into.
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaFrame(spark, dir)
      .select(col("media_id"), col("payload"),
        col("meta.format").as("format"), col("meta.width").as("width"),
        col("meta.height").as("height"))
      .as[(Long, Array[Byte], String, Int, Int)]
    media.mapPartitions { rows =>
      // A real implementation would initialize the codec once here.
      rows.map { case (id, payload, format, w, h) =>
        val mean =
          if (payload.isEmpty) 0.0
          else payload.map(b => (b & 0xff).toLong).sum.toDouble / payload.length
        // "Frame sampling": every 16th byte, capped at 8 samples.
        val frames = payload.grouped(16).take(8).map(g => g.head & 0xff).toArray
        MediaFeatures(id, format, w, h, payload.length, mean, frames)
      }
    }.toDF()
      // JSON-encode the sample array for the verify dump: the driver's
      // pandas compare sorts every output column and cannot hash/sort
      // numpy arrays, so no verify output may carry an array column.
      .withColumn("frame_samples", to_json(col("frame_samples")))
      .orderBy(col("media_id"))
  }

  /** DuckDB replay of the stub decode: the corpus is pure ASCII (checked:
    * octet_length = char length for every doc), so utf-8 byte i ≡ code
    * point of char i and the byte statistics are expressible in SQL —
    * unicode(text[i]) per position, exact integer sum → DOUBLE division,
    * every-16th-byte frame samples capped at 8, JSON-encoded like the
    * Spark side. */
  private val decodeOracle =
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'jpeg'
      |       ELSE 'webp' END AS format,
      |  CAST(doc_id % 640 + 32 AS INT) AS width,
      |  CAST(doc_id % 480 + 32 AS INT) AS height,
      |  CAST(length(text) AS INT) AS n_bytes,
      |  CASE WHEN length(text) = 0 THEN 0.0
      |       ELSE CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |              list_transform(range(1, length(text) + 1), i -> CAST(unicode(text[i]) AS BIGINT))),
      |              (a, b) -> a + b) AS DOUBLE) / length(text) END AS byte_mean,
      |  CAST(to_json(list_transform(
      |    range(0, least(8, CAST(ceil(length(text) / 16.0) AS BIGINT))),
      |    i -> unicode(text[i * 16 + 1]))) AS VARCHAR) AS frame_samples
      |FROM documents
      |ORDER BY media_id""".stripMargin

  val decode: QueryDef = QueryDef.sqlBacked("mm_decode", decodeOracle)(decodeFeatures(_, _))

  /** Resized media row produced by the batched resize stage. */
  final case class ResizedMedia(
      media_id: Long, in_w: Int, in_h: Int, out_w: Int, out_h: Int,
      out_bytes: Int, sample_checksum: Long)

  // --- resize path: batched downscale to fit 256×256 ----------------------
  // STUB RESIZE: output dimensions and byte budget are the real integer
  // arithmetic a resizer performs (aspect-preserving fit, area-scaled byte
  // estimate); the pixel work is stood in by a strided byte checksum. The
  // per-partition iterator shape is where a real scaler (libvips etc.)
  // would plug in, initialized once per partition.
  def resize(spark: SparkSession, dir: String, fit: Int = 256): DataFrame = {
    import spark.implicits._
    val media = mediaFrame(spark, dir)
      .select(col("media_id"), col("payload"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[(Long, Array[Byte], Int, Int)]
    media.mapPartitions { rows =>
      rows.map { case (id, payload, w, h) =>
        val longSide = math.max(w, h)
        val ow = math.max(1, w * fit / longSide)
        val oh = math.max(1, h * fit / longSide)
        val n = payload.length
        // Long arithmetic: n * (ow*oh) overflows Int from n ≥ 32768
        // (ow*oh reaches 65536); the result is ≤ n (downscale) so the
        // final narrowing is always safe. Oracle computes in BIGINT too.
        val outBytes =
          if (w == 0 || h == 0) 0
          else (n.toLong * (ow.toLong * oh.toLong) / (w.toLong * h.toLong)).toInt
        val stride = math.max(1, n / 64)
        var checksum = 0L
        var i = 0
        while (i < n) { checksum += payload(i) & 0xff; i += stride }
        ResizedMedia(id, w, h, ow, oh, outBytes, checksum)
      }
    }.toDF()
      .orderBy(col("media_id"))
  }

  /** DuckDB replay of the resize arithmetic (same ASCII byte ≡ code-point
    * identity as the decode oracle; `//` is integer division). */
  private val resizeOracle =
    """SELECT doc_id AS media_id,
      |  CAST(doc_id % 640 + 32 AS INT) AS in_w,
      |  CAST(doc_id % 480 + 32 AS INT) AS in_h,
      |  CAST(greatest(1, (doc_id % 640 + 32) * 256 // greatest(doc_id % 640 + 32, doc_id % 480 + 32)) AS INT) AS out_w,
      |  CAST(greatest(1, (doc_id % 480 + 32) * 256 // greatest(doc_id % 640 + 32, doc_id % 480 + 32)) AS INT) AS out_h,
      |  CAST(length(text) * (greatest(1, (doc_id % 640 + 32) * 256 // greatest(doc_id % 640 + 32, doc_id % 480 + 32))
      |                     * greatest(1, (doc_id % 480 + 32) * 256 // greatest(doc_id % 640 + 32, doc_id % 480 + 32)))
      |       // ((doc_id % 640 + 32) * (doc_id % 480 + 32)) AS INT) AS out_bytes,
      |  CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
      |       ELSE list_reduce(list_prepend(CAST(0 AS BIGINT),
      |         list_transform(range(0, (length(text) - 1) // greatest(1, length(text) // 64) + 1),
      |           i -> CAST(unicode(text[i * greatest(1, length(text) // 64) + 1]) AS BIGINT))),
      |         (a, b) -> a + b) END AS sample_checksum
      |FROM documents
      |ORDER BY media_id""".stripMargin

  val resizeDef: QueryDef = QueryDef.sqlBacked("mm_resize", resizeOracle)(resize(_, _))

  /** One sampled frame emitted by the frame-sampling stage. */
  final case class SampledFrame(
      media_id: Long, frame_idx: Int, frame_off: Int, frame_len: Int,
      frame_sum: Long)

  // --- video path: temporal frame sampling --------------------------------
  // The payload is treated as a frame sequence (fixed 256-byte "frames"
  // standing in for encoded video frames) and sampled on a temporal
  // stride (every 4th frame) — the standard decimation step before
  // per-frame feature extraction. Shape notes for 100 TB: the stage is a
  // per-partition flatMap (one input row → its sampled frames), so the
  // fan-out happens inside the scan stage with no shuffle; a real
  // demuxer/codec initializes once per partition exactly like the decode
  // stub. Frame checksums stand in for per-frame features.
  def frameSample(spark: SparkSession, dir: String,
      frameSize: Int = 256, stride: Int = 4): DataFrame = {
    import spark.implicits._
    val media = mediaFrame(spark, dir)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
    media.mapPartitions { rows =>
      // A real implementation would initialize the demuxer once here.
      rows.flatMap { case (id, payload) =>
        val n = payload.length
        val nFrames = (n + frameSize - 1) / frameSize
        Iterator.range(0, nFrames, stride).map { f =>
          val off = f * frameSize
          val len = math.min(frameSize, n - off)
          var sum = 0L
          var i = off
          while (i < off + len) { sum += payload(i) & 0xff; i += 1 }
          SampledFrame(id, f, off, len, sum)
        }
      }
    }.toDF()
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** DuckDB replay of the frame sampler (ASCII byte ≡ code-point identity
    * again; frames at every 4·256-byte offset, per-frame byte sums). */
  private val frameOracle =
    """SELECT doc_id AS media_id,
      |  CAST(f AS INT) AS frame_idx,
      |  CAST(f * 256 AS INT) AS frame_off,
      |  CAST(least(256, length(text) - f * 256) AS INT) AS frame_len,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(range(f * 256 + 1, f * 256 + least(256, length(text) - f * 256) + 1),
      |      i -> CAST(unicode(text[i]) AS BIGINT))),
      |    (a, b) -> a + b) AS frame_sum
      |FROM (
      |  SELECT doc_id, text,
      |    unnest(range(0, (length(text) + 255) // 256, 4)) AS f
      |  FROM documents WHERE length(text) > 0) t
      |ORDER BY media_id, frame_idx""".stripMargin

  val frames: QueryDef = QueryDef.sqlBacked("mm_framesample", frameOracle)(frameSample(_, _))

  val all: Seq[QueryDef] = Seq(meta, decode, resizeDef, frames)
}
