package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches.
  *
  * The DECODE step is a clearly-marked STUB (`fakeDecode`): the real
  * codec libraries are not available in this environment, so it derives
  * deterministic pseudo-features from the bytes. Everything around it —
  * schema, partition-batch iteration, output shape — is the real
  * distributed plumbing and is tested: swapping `fakeDecode` for a JNI
  * or library decoder changes one function.
  */
object Multimodal {

  /** Canonical media schema: id + kind + raw payload + source metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Extracted-feature schema produced by `decodeFeatures`. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("mean_intensity", DoubleType, nullable = false)))

  /** STUB decoder — replace with a real codec. Deterministic in the
    * payload bytes so tests and reruns are stable: "dimensions" come
    * from a byte-sum hash, "intensity" is the mean byte value. */
  private[multimodal] def fakeDecode(kind: String, bytes: Array[Byte])
      : (Int, Int, Int, Double) = {
    val h = bytes.foldLeft(17L)((acc, b) => acc * 31 + (b & 0xFF))
    val w = 64 + math.abs(h % 960).toInt
    val ht = 64 + math.abs((h / 960) % 960).toInt
    val ch = kind match {
      case "image" => 3
      case "audio" => 1
      case _ => 3
    }
    val mean =
      if (bytes.isEmpty) 0.0
      else bytes.map(b => (b & 0xFF).toDouble).sum / bytes.length
    (w, ht, ch, mean)
  }

  /** Per-partition batch decode: the Spark-side pattern for expensive
    * per-record native work — one iterator pass, no driver collect, no
    * shuffle; output is a fresh DataFrame with `featureSchema`. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "kind", "bytes").rdd.mapPartitions {
      rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val kind = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          val (w, h, ch, mean) = fakeDecode(kind, bytes)
          Row(id, kind, bytes.length, w, h, ch,
            math.rint(mean * 1e6) / 1e6)
        }
    }
    spark.createDataFrame(out, featureSchema)
  }

  /** Frame-sampling plan for video payloads: rows (media_id, frame_no)
    * for every `everyNth` frame of `totalFrames` — the fan-out side of a
    * decode pipeline, pure built-ins (explode of a sequence). */
  def frameSamplePlan(media: DataFrame, totalFrames: Int, everyNth: Int)
      : DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), lit(totalFrames - 1), lit(everyNth)))
          .as("frame_no"))
}
