package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video ride as opaque
  * `binary` columns with typed metadata, processed per-partition so a
  * real decoder amortizes model/codec initialization across a batch
  * (the Scala analog of `mapInPandas` batch shape).
  *
  * The container has no image/audio codecs, so the byte-level decode is
  * a clearly-marked deterministic STUB (`StubCodec`) that reads a fake
  * 16-byte header; the Spark-side contract — schema, partition-batch
  * iterator shape, metadata propagation, sampling — is real and tested.
  * Swapping in javacv/ffmpeg means replacing StubCodec only.
  */
object Multimodal {

  /** Asset table schema: id + opaque payload + mime + source URI. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("uri", StringType, nullable = true)))

  /** STUB codec: a 16-byte header of 4 big-endian ints
    * (magic, width, height, n_frames). A real build replaces this object
    * with an actual decoder; everything else in this file stands.
    */
  object StubCodec {
    val Magic: Int = 0x47524654 // "GRFT"

    def encodeHeader(width: Int, height: Int, nFrames: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16)
      bb.putInt(Magic).putInt(width).putInt(height).putInt(nFrames)
      bb.array()
    }

    /** Returns (width, height, nFrames) or None for undecodable bytes. */
    def decode(payload: Array[Byte]): Option[(Int, Int, Int)] =
      if (payload == null || payload.length < 16) None
      else {
        val bb = java.nio.ByteBuffer.wrap(payload)
        if (bb.getInt() != Magic) None
        else Some((bb.getInt(), bb.getInt(), bb.getInt()))
      }
  }

  private val decodedSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("decode_ok", BooleanType, nullable = false)))

  /** Decode/feature-extract over partitions: the iterator-in →
    * iterator-out shape means one codec instance per partition batch,
    * never per row.
    */
  def decodeAssets(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val idIdx = assets.schema.fieldIndex("asset_id")
    val payloadIdx = assets.schema.fieldIndex("payload")
    val rdd = assets.rdd.mapPartitions { rows =>
      // real impl: initialize the decoder ONCE here, reuse across rows
      rows.map { r =>
        val id = r.getLong(idIdx)
        StubCodec.decode(r.getAs[Array[Byte]](payloadIdx)) match {
          case Some((w, h, f)) => Row(id, w, h, f, true)
          case None => Row(id, null, null, null, false)
        }
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** Resize: payload transform keeping the header contract (STUB scales
    * the header dims; a real build re-encodes pixels). Pure column-level
    * binary-in/binary-out plumbing.
    */
  def resize(assets: DataFrame, maxDim: Int): DataFrame = {
    val resizeUdf = udf { payload: Array[Byte] =>
      StubCodec.decode(payload).map { case (w, h, f) =>
        val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
        StubCodec.encodeHeader(
          math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt), f)
      }.orNull
    }
    assets.withColumn("payload", resizeUdf(col("payload")))
  }

  /** Frame sampling plan: every `stride`-th frame index per asset,
    * exploded — the downstream extract step receives (asset_id,
    * frame_idx) work units already partitioned by asset.
    */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded.filter(col("decode_ok") && col("n_frames") > 0)
      .select(
        col("asset_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
}
