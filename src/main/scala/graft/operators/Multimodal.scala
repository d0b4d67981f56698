package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, processed in
  * batch-shaped partition iterators (the Scala analogue of
  * `mapInPandas` — one iterator of rows per partition, vectorizable
  * batch boundary, no per-row driver involvement).
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): `decodeStub` derives deterministic fake features from the
  * payload bytes. The Spark-side plumbing — schema, partitioning, batch
  * shape, UDF signature — is real and oracle-tested on payload length +
  * md5, which any real decoder swap-in preserves.
  */
object Multimodal {

  /** media table schema: opaque payload + typed metadata. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  /** Build a deterministic synthetic media table from the documents
    * table: payload = UTF-8 text bytes, metadata derived from doc_id.
    * Stands in for a real image/audio ingest. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        when(col("doc_id") % 2 === 0, lit("png")).otherwise(lit("jpeg")).as("format"),
        (col("doc_id") % 64 + 16).cast("int").as("width"),
        (col("doc_id") % 48 + 16).cast("int").as("height")).as("meta"))

  private val FeatureDim = 4

  /** STUB decoder: a real implementation would decode the image and
    * pool pixel regions; this derives `FeatureDim` deterministic floats
    * from byte-range sums so the distributed plumbing (schema in/out,
    * batch iteration, null payloads) is fully exercised. */
  private def fakeFeatures(payload: Array[Byte]): Array[Double] = {
    val out = new Array[Double](FeatureDim)
    if (payload == null || payload.isEmpty) return out
    val chunk = math.max(1, payload.length / FeatureDim)
    var i = 0
    while (i < payload.length) {
      out(math.min(i / chunk, FeatureDim - 1)) += (payload(i) & 0xff)
      i += 1
    }
    var f = 0
    while (f < FeatureDim) { out(f) = out(f) / payload.length; f += 1 }
    out
  }

  val FeaturesSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("format", StringType),
    StructField("features", ArrayType(DoubleType))))

  /** Batch-shaped feature extraction: one partition-iterator pass, the
    * mapInPandas-equivalent boundary where a vectorized decoder would
    * plug in. Output partitioning follows the input (no shuffle). */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(FeaturesSchema)
    media.select(col("media_id"), col("payload"), col("meta.format").as("format"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(
            r.getAs[Long]("media_id"),
            if (payload == null) 0L else payload.length.toLong,
            r.getAs[String]("format"),
            fakeFeatures(payload).toSeq)
        }
      }(enc)
  }

  /** "Frame sampling" for video-like payloads: split the payload into
    * `frames` equal byte ranges and emit one row per sampled frame —
    * the explode-shaped op a real frame extractor would use. Pure
    * column expressions (codegen'd). */
  def sampleFrames(media: DataFrame, frames: Int): DataFrame =
    media.select(
      col("media_id"),
      col("meta"),
      posexplode(transform(
        sequence(lit(0), lit(frames - 1)),
        f => {
          val len = length(col("payload"))
          // integer frame boundaries (Spark `/` on ints yields double)
          val start = floor(len * f / frames).cast("int") + 1
          val end = floor(len * (f + 1) / frames).cast("int")
          col("payload").substr(start, greatest(end - start + lit(1), lit(0)))
        })))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_bytes")
}
