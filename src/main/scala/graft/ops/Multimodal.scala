package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.9): treat image/audio/video as
  * opaque `binary` columns with typed metadata, processed per-partition in
  * batches.
  *
  * The decode is a REAL bounded header decoder
  * ([[graft.functions.MediaHeader]]): JPEG SOF dimensions + EXIF
  * orientation, PNG IHDR dimensions + bit depth, GIF screen dimensions —
  * pure JVM, O(header bytes) per payload, total on malformed input. Full
  * pixel/audio decompression remains out of scope in this container (no
  * codec libraries); to attach one, swap the kernel inside
  * [[decodeHeaders]]' partition loop (or route the binary column through
  * mapInPandas + PIL/torchaudio on a Python cluster) — the surrounding
  * plan, schema and batch shape do not change.
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

  /** Partition-batched header decode: the Scala analog of mapInPandas —
    * one iterator pass per partition, no per-row task overhead, opaque
    * bytes never leave the partition (only the small decoded fields do).
    * Returns (media_id, format, width, height, orientation, bit_depth);
    * -1 marks fields the payload does not provide, format is never null.
    * The kernel is [[graft.functions.MediaHeader.decode]] — a real JPEG/
    * PNG/GIF header parser, bounded by header size, total on garbage. */
  def decodeHeaders(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("orientation", IntegerType),
      StructField("bit_depth", IntegerType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val m = graft.functions.MediaHeader.decode(payload)
          Row(id, m.format, m.width, m.height, m.orientation, m.bitDepth)
        }
      }(encoder)
  }

  /** Deterministic frame sampling plan for a video payload: every `stride`th
    * frame index up to `frameCount` — the real sampling arithmetic a frame
    * extractor would follow; the extractor itself is the stub above. */
  def sampleFrameIndexes(frameCount: Column, stride: Int): Column =
    sequence(lit(0), greatest(frameCount - 1, lit(0)), lit(stride))

  /** Content near-dup over opaque BINARY payloads (re-encoded mirrors,
    * byte-patched re-uploads — the multimodal twin of d04's text
    * SimHash): byte n-gram SimHash signature per payload
    * ([[graft.functions.BinarySimhashExpression]], one codegen kernel
    * pass), then the shared pigeonhole banding
    * ([[Dedup.simhashPairsFromSigs]]) — candidates meet on equal
    * signature chunks (equi-join, never cross), payload bytes never
    * shuffle (only (id, sig, chunk) triples do). Output (id_a, id_b,
    * distance), id_a < id_b, hamming ≤ maxDistance. */
  def binaryNearDupPairs(df: DataFrame, idCol: String, payloadCol: String,
                         maxDistance: Int = 7, windowBytes: Int = 4): DataFrame =
    Dedup.simhashPairsFromSigs(
      df.select(col(idCol).as("id"),
        graft.functions.BinarySimhashExpression
          .binarySimhash64(col(payloadCol), windowBytes).as("sig")),
      maxDistance)

  /** PIXEL-level image near-dup — what [[binaryNearDupPairs]] provably
    * cannot see: a re-encode (same pixels, different compression level
    * or format) shares almost no byte n-grams with its original, but
    * its decoded luma gradients — and therefore its dHash
    * ([[graft.functions.ImageDHashExpression]]) — survive. One codegen
    * decode+hash pass in the scan stage (payload bytes never shuffle;
    * only (id, sig, chunk) triples do), then the shared pigeonhole
    * banding. Undecodable payloads hash to null and are excluded — they
    * cannot near-dup. Output (id_a, id_b, distance), hamming ≤
    * maxDistance. */
  def pixelNearDupPairs(df: DataFrame, idCol: String, payloadCol: String,
                        maxDistance: Int = 7): DataFrame =
    Dedup.simhashPairsFromSigs(
      df.select(col(idCol).as("id"),
        graft.functions.ImageDHashExpression.imageDHash(col(payloadCol))
          .as("sig"))
        .filter(col("sig").isNotNull),
      maxDistance)
}
