package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §7 extensions): image/audio/video
  * as opaque `binary` columns plus typed metadata, with decode /
  * feature-extract / resize / frame-sample stages.
  *
  * The decode kernels are STUBS — the container ships no image/audio
  * codecs, so `decodeStub` produces a deterministic fake feature vector
  * from the bytes. Everything around the stub is real and load-bearing:
  * the schema contract, the partition-wise batch execution
  * (`mapPartitions`, the Scala analog of a Pandas-UDF batch loop), and
  * the pushdown-friendly metadata layout. Swapping a real codec in
  * means replacing ONE function body.
  *
  * Scale notes (100 TB of media): binaries stay opaque until the last
  * possible stage; metadata predicates (mime/width/duration) prune
  * partitions and rows BEFORE any decode; decode parallelism is
  * per-partition with bounded batch memory = batchRows × maxBlobSize.
  */
object Multimodal {

  /** Typed metadata contract for a media asset table. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    // nullable like content: expression-derived under non-ANSI mode
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType),       // images/video
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),    // audio/video
    // nullable: expression-derived binary columns are nullable in
    // Spark's type derivation; contract is "never null in practice"
    StructField("content", BinaryType, nullable = true)))

  /** Build a deterministic synthetic asset table (bytes derived from
    * the id — stands in for real ingested media). */
  def syntheticAssets(spark: SparkSession, n: Int): DataFrame = {
    val mimes = Seq("image/png", "image/jpeg", "audio/wav", "video/mp4")
    spark.range(n.toLong).select(
      col("id").as("asset_id"),
      element_at(array(mimes.map(lit): _*),
        (col("id") % mimes.size).cast("int") + 1).as("mime"),
      when(col("id") % 4 < 2, (col("id") % 512 + 16).cast("int"))
        .otherwise(lit(null)).as("width"),
      when(col("id") % 4 < 2, (col("id") % 256 + 16).cast("int"))
        .otherwise(lit(null)).as("height"),
      when(col("id") % 4 >= 2, col("id") * 40 + 1000)
        .otherwise(lit(null)).as("duration_ms"),
      // deterministic fake payload: sha256 hex of the id, repeated
      repeat(sha2(col("id").cast("string"), 256), 4).cast("binary")
        .as("content"))
  }

  /** Feature dimension of the stub decoder. */
  val FeatureDim = 16

  /** STUB decode kernel: deterministic fake features from bytes.
    * A real implementation would decode pixels/samples here. */
  private[ops] def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      out(i % FeatureDim) += (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  /** Decode + featurize: partition-wise batched execution over the
    * binary column — the Scala analog of `mapInPandas` (iterator of
    * batches in, iterator of batches out; constant memory per task). */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("mime", StringType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    assets.select("asset_id", "mime", "content").mapPartitions { rows =>
      rows.map { r =>
        Row(r.getLong(0), r.getString(1),
          decodeStub(r.getAs[Array[Byte]](2)).toSeq)
      }
    }(enc)
  }

  /** Metadata-only filter stage: prunes BEFORE decode (predicate on
    * typed metadata columns, pushed to the scan). */
  def images(assets: DataFrame, minWidth: Int): DataFrame =
    assets.filter(col("mime").startsWith("image/") &&
      col("width") >= minWidth)

  /** Frame-sample stage for video: every `everyMs` milliseconds of the
    * duration → one (asset_id, frame_ts_ms) row; decode of the frame
    * itself is the stub. Generates rows with `sequence` — no UDF. */
  def sampleFrames(assets: DataFrame, everyMs: Long): DataFrame =
    assets.filter(col("mime").startsWith("video/"))
      .select(col("asset_id"),
        explode(sequence(lit(0L), col("duration_ms") - 1,
          lit(everyMs))).as("frame_ts_ms"))
}
