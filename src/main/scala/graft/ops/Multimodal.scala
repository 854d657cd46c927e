package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads travel as opaque
  * `binary` columns beside a typed metadata struct, parquet-native.
  *
  * The decode step is where a real deployment would call an image /
  * audio library inside a batched partition pass (the Scala analogue
  * of a pandas-batch UDF: one buffer-reuse context per partition, rows
  * streamed through it). Those libraries are not present in this
  * environment, so [[fakeDecode]] is a clearly-marked deterministic
  * stand-in — the Spark-side plumbing (schema, batch shape,
  * partition-level resource lifecycle) is the real, tested part.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType))))))

  /** Demo ingestion: wrap a text column as a binary payload with
    * metadata (stands in for reading image bytes from object store).
    */
  def attachBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("text/plain").as("format"),
        octet_length(col(textCol).cast("binary")).cast("long").as("n_bytes")).as("meta"))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType),
    StructField("feature", ArrayType(FloatType))))

  /** STUB decoder: a real implementation would decode `payload` with
    * an imaging library here. This deterministic fake derives
    * "dimensions" and a tiny "feature vector" from the bytes so the
    * pipeline shape (schema, batching, partition lifecycle) is
    * exercised end-to-end.
    */
  private def fakeDecode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    // ??? <- real decode (e.g. ImageIO.read / ffmpeg frame grab) goes
    // here; everything below is a deterministic placeholder.
    val n = payload.length
    val width = 64 + (n % 512)
    val height = 64 + ((n * 7) % 512)
    val feature = Array.tabulate(8) { i =>
      (if (n == 0) 0f else payload(i % n).toFloat / 255f)
    }
    (width, height, feature)
  }

  /** Batched per-partition decode pass. One decoder context per
    * partition (where a real codec would allocate buffers once),
    * rows streamed through — the Spark-idiomatic shape for
    * expensive-per-record multimodal work.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      // partition-scoped decoder context would be created here
      rows.map { r =>
        val id = r.getLong(0)
        val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val (w, h, feat) = fakeDecode(payload)
        Row(id, w, h, payload.length.toLong, feat.toSeq)
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("thumb", BinaryType)))

  /** STUB resize: a real implementation would decode + rescale to
    * (targetW, targetH) here. The deterministic fake downsamples the
    * byte stream by striding so output size is genuinely bounded by
    * the target dimensions — exercising the real pipeline property
    * (bounded output payloads regardless of input size).
    */
  def resize(spark: SparkSession, media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        // ??? <- real rescale goes here; deterministic stride stub:
        val budget = targetW * targetH
        val thumb =
          if (payload.length <= budget) payload
          else {
            val stride = payload.length / budget
            Array.tabulate(budget)(i => payload(i * stride))
          }
        Row(id, targetW, targetH, thumb)
      }
    }
    spark.createDataFrame(rdd, resizedSchema)
  }

  val framesSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame_feature", ArrayType(FloatType))))

  /** STUB frame sampler: a real implementation would demux the video
    * payload and grab every `everyN`-th frame. The fake treats each
    * `frameBytes`-sized slice as one "frame" and emits a feature per
    * sampled frame — one row per (media, frame), the schema and
    * explode shape a video pipeline needs.
    */
  def sampleFrames(
      spark: SparkSession,
      media: DataFrame,
      frameBytes: Int = 64,
      everyN: Int = 2): DataFrame = {
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val nFrames = payload.length / frameBytes
        // ??? <- real demux/decode; deterministic per-slice stub:
        (0 until nFrames by everyN).map { f =>
          val slice = payload.slice(f * frameBytes, (f + 1) * frameBytes)
          val (_, _, feat) = fakeDecode(slice)
          Row(id, f, feat.toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, framesSchema)
  }
}
