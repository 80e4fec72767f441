package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.9): treat image/audio/video as
  * opaque `binary` columns with typed metadata, processed per-partition in
  * batches.
  *
  * The Spark-side machinery — schema, partition-batched processing shape,
  * metadata extraction, deterministic frame sampling — is real and tested.
  * The actual media decode is STUBBED (this container ships no image/audio
  * codecs): `decodeStub` produces a deterministic fake "decoded" summary so
  * the pipeline shape (including failure routing) can be exercised
  * end-to-end. Swap `decodeStub` for a real codec (or route the binary
  * column through mapInPandas + PIL/torchaudio on a Python cluster) without
  * touching the surrounding plan.
  */
object Multimodal {

  /** Canonical multimodal row schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("byte_len", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))), nullable = true)))

  /** Metadata extraction — pure column ops over the binary payload. */
  def byteLen(payload: Column): Column = length(payload).cast("long")

  /** Hex of the first n bytes (magic-number sniffing / content addressing). */
  def headHex(payload: Column, n: Int = 8): Column =
    hex(expr(s"substring(payload, 1, $n)"))

  /** Format sniff from magic bytes (real logic, tiny table). */
  def sniffFormat(payload: Column): Column = {
    val head = hex(substring(payload, 1, 4))
    when(head.startsWith("89504E47"), "png")
      .when(head.startsWith("FFD8FF"), "jpeg")
      .when(head.startsWith("52494646"), "riff")
      .when(head.startsWith("1A45DFA3"), "webm")
      .otherwise("unknown")
  }

  /** STUB decode: a deterministic fake feature vector derived from payload
    * bytes (byte histogram moments). Stands in for image decode / audio
    * feature extraction — same signature, same batch shape. */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    if (payload == null || payload.isEmpty) return Array.fill(4)(0.0)
    var sum = 0L; var min = 255; var max = 0
    payload.foreach { b =>
      val v = b & 0xff
      sum += v; if (v < min) min = v; if (v > max) max = v
    }
    Array(payload.length.toDouble, sum.toDouble / payload.length, min.toDouble, max.toDouble)
  }

  /** Partition-batched decode: the Scala analog of mapInPandas — one
    * iterator pass per partition, batch-sized work units, no per-row task
    * overhead. Returns (media_id, features array<double>). */
  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(DoubleType))))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          Row(id, decodeStub(payload).toSeq)
        }
      }(encoder)
  }

  /** Deterministic frame sampling plan for a video payload: every `stride`th
    * frame index up to `frameCount` — the real sampling arithmetic a frame
    * extractor would follow; the extractor itself is the stub above. */
  def sampleFrameIndexes(frameCount: Column, stride: Int): Column =
    sequence(lit(0), greatest(frameCount - 1, lit(0)), lit(stride))
}
