package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video ride along as opaque
  * `binary` payloads with typed metadata; decode / feature-extraction /
  * resize / frame-sampling run per-partition over the binary column.
  *
  * The actual codecs are NOT available in this environment, so
  * [[decodeFeatures]] uses a clearly-marked deterministic stand-in (byte
  * histogram) — the Spark-side contract (schema, batch iteration,
  * partition-local state, output encoder) is real and is what matters at
  * 100 TB: payload bytes never hit the driver, each partition streams its
  * rows once, and the feature column comes back columnar.
  */
object Multimodal {

  /** Wrap a text/bytes source as a multimodal asset table. */
  def asAssets(df: DataFrame, idCol: String, payload: org.apache.spark.sql.Column,
      modality: String): DataFrame =
    df.select(col(idCol).as("asset_id"), payload.as("payload"))
      .withColumn("modality", lit(modality))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("sha", sha2(col("payload"), 256))
      .withColumn("n_chunks", ceil(col("n_bytes") / 4096.0).cast("long"))

  /** Feature-extraction stub over the payload column, mapPartitions form.
    *
    * REAL DECODER GOES HERE: in production this calls the image/audio
    * codec per batch (e.g. JNI/FFI); this environment ships no codecs, so
    * the stand-in computes a deterministic 16-bin byte histogram,
    * normalized — shaped exactly like an embedding head.
    */
  def decodeFeatures(assets: DataFrame, bins: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", assets.schema("asset_id").dataType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = true)))
    implicit val enc = Encoders.row(schema)
    val idIdx = assets.schema.fieldIndex("asset_id")
    val pIdx = assets.schema.fieldIndex("payload")
    assets.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](pIdx)
        if (bytes == null) Row(r.get(idIdx), null) // null payload -> null features
        else {
          val hist = new Array[Double](bins)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xff) * bins / 256) += 1.0; i += 1 }
          val total = math.max(bytes.length, 1).toDouble
          Row(r.get(idIdx), hist.map(_ / total).toSeq)
        }
      }
    }
  }

  /** Resize stub, mapPartitions form: strided downsample of the payload to
    * at most `targetBytes` (REAL RESIZE GOES HERE — an image scaler per
    * batch in production; the partition-streaming contract and binary-in/
    * binary-out schema are the real part). Payloads already small enough
    * pass through unchanged.
    */
  def resizePayload(assets: DataFrame, targetBytes: Int): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fields = assets.schema.fields.map {
      case f if f.name == "payload" => f.copy(dataType = BinaryType)
      case f => f
    }
    val schema = StructType(fields)
    implicit val enc = Encoders.row(schema)
    val pIdx = assets.schema.fieldIndex("payload")
    assets.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](pIdx)
        val out =
          if (bytes == null) null
          else if (bytes.length <= targetBytes) bytes
          else {
            val res = new Array[Byte](targetBytes)
            var i = 0
            while (i < targetBytes) {
              res(i) = bytes((i.toLong * bytes.length / targetBytes).toInt)
              i += 1
            }
            res
          }
        Row.fromSeq(r.toSeq.updated(pIdx, out))
      }
    }
  }

  /** Deterministic "frame sampling": fixed-offset slices of the payload,
    * hex-encoded (stands in for video frame extraction; the slice/batch
    * plumbing is the real part).
    */
  def frameSamples(df: DataFrame, textCol: String, offsets: Seq[Int], width: Int): DataFrame =
    offsets.foldLeft(df) { (d, off) =>
      d.withColumn(s"frame_$off",
        lower(hex(encode(substring(col(textCol), off, width), "UTF-8"))))
    }
}
