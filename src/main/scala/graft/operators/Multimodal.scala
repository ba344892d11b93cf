package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video ride
  * through the engine as opaque `BINARY` payloads plus typed metadata
  * columns; decode/feature-extraction runs as typed `mapPartitions` over
  * case-class rows (the Scala analogue of `mapInPandas` batch UDFs — one
  * iterator per partition, schema enforced by Encoders).
  *
  * The actual codec step is a STUB: no image/audio libraries exist in this
  * environment, so [[Multimodal.StubDecoder]] produces deterministic fake
  * features from the bytes. Everything around it — schema, partitioning,
  * encoder plumbing, batch iteration, metadata propagation — is real and
  * tested; swapping in a JNI/javacv decoder changes one function.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRow(
      doc_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int, duration_ms: Int)

  /** Extracted features (stub): length, an 8-hex-char content signature,
    * and a payload mean — the shape a real embedding/feature step fills.
    */
  final case class MediaFeatures(
      doc_id: Long, kind: String, byte_len: Long, sig8: String,
      mean_byte: Double)

  /** The decode seam. Real implementations decode pixels/samples; the stub
    * derives deterministic values from the payload bytes.
    */
  trait MediaDecoder extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** STUB decoder — deterministic fake standing in for image/audio codecs
    * (unavailable in this container). Features derive only from payload
    * bytes, so results are reproducible and oracle-checkable.
    */
  object StubDecoder extends MediaDecoder {
    private val HeaderLen = 3
    override def decode(r: MediaRow): MediaFeatures = {
      val body = r.payload.drop(HeaderLen)
      val sig8 = body.take(4).map(b => f"${b & 0xff}%02x").mkString
      val mean =
        if (r.payload.isEmpty) 0.0
        else r.payload.map(b => (b & 0xff).toDouble).sum / r.payload.length
      MediaFeatures(r.doc_id, r.kind, r.payload.length.toLong, sig8, mean)
    }
  }

  /** Deterministically attach a media payload + metadata to each document:
    * kind cycles image/audio/video by id, the payload is a 3-byte tag plus
    * the sha-256 of the text (a stand-in for real bytes that any engine
    * can recompute), metadata derives from the id. All row-local SQL.
    */
  def attachMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      concat(
        substring(
          element_at(array(lit("IMG"), lit("AUD"), lit("VID")),
            (col("doc_id") % 3 + 1).cast("int")).cast("binary"), 1, 3),
        unhex(sha2(col("text").cast("binary"), 256))).as("payload"),
      (lit(16) + col("doc_id") % 64).cast("int").as("width"),
      (lit(16) + col("doc_id") % 48).cast("int").as("height"),
      (lit(8000) + (col("doc_id") % 4) * 4000).cast("int").as("sample_rate"),
      (lit(1000) + col("doc_id") % 9000).cast("int").as("duration_ms"))

  /** Feature extraction through the typed mapPartitions seam. Partitioning
    * is preserved from the input (repartition upstream by id for balance);
    * one decoder instance per partition, iterator-at-a-time — exactly the
    * batch shape a vectorized UDF would see.
    */
  def extractFeatures(media: DataFrame,
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it => it.map(decoder.decode) }
  }

  /** Resize stub: halves dimensions (floor, min 1). Payload untouched —
    * a real implementation would transcode; metadata math is the real
    * contract being tested.
    */
  def resize(media: DataFrame): DataFrame =
    media
      .withColumn("width", greatest(expr("width DIV 2"), lit(1)).cast("int"))
      .withColumn("height", greatest(expr("height DIV 2"), lit(1)).cast("int"))

  /** Frame sampling for video payloads: up to 8 evenly spaced frame
    * offsets into the payload body (STUB: offsets, not decoded frames).
    * Row-local `sequence`/`transform`, exploded to one row per frame.
    */
  def sampleFrames(media: DataFrame, maxFrames: Int = 8): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("n_frames",
        greatest(least(expr("duration_ms DIV 1000"), lit(maxFrames)), lit(1)))
      .select(col("doc_id"), col("n_frames"),
        posexplode(expr(
          "transform(sequence(0, n_frames - 1)," +
            " i -> 3 + (i * 32) DIV n_frames)"))
          .as(Seq("frame_idx", "frame_off")))
      .select(col("doc_id"), col("frame_idx").cast("bigint"),
        col("frame_off").cast("bigint"))
}
