package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column processing harness.
  *
  * Media (image/audio/video) travel as opaque `binary` columns with a typed
  * metadata struct, the layout a 100 TB training-data lake uses: bytes
  * stay columnar in parquet, metadata is queryable without touching them,
  * and decode runs partition-wise so a cluster decodes 10⁹ assets with
  * per-partition codec initialization, not per-row.
  *
  * No image/audio libraries exist in this container, so [[StubCodec]] is a
  * clearly-marked deterministic fake; everything AROUND it — the schema,
  * the `mapPartitions` batch shape, the per-partition init amortization,
  * the frame-sampling logic — is the real Spark plumbing and is unit
  * tested (MultimodalSpec). Swap [[StubCodec.decode]] for a real codec and
  * nothing else changes.
  */
object Multimodal {

  /** A multimodal record as stored: opaque bytes + typed metadata. */
  case class MediaRecord(
      media_id: Long,
      kind: String,          // image | audio | video
      bytes: Array[Byte],
      width: Int,
      height: Int,
      n_frames: Int)

  /** Decoded features: what a real codec would emit per asset. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Int,
      n_sampled: Int,
      sampled_frames: Seq[Int],
      mean_byte: Double,      // stands in for mean pixel / amplitude
      decoder_inits: Long)    // how many codec inits this partition paid

  /** Deterministic stand-in for the absent media libraries. A real
    * implementation would wrap e.g. javacv/ffmpeg here; the interface —
    * expensive init, cheap per-asset decode — is the part that matters
    * for the Spark plumbing. */
  final class StubCodec {
    StubCodec.inits.incrementAndGet() // count per-partition init cost
    /** "Decode": mean byte value — deterministic, library-free. */
    def decode(bytes: Array[Byte]): Double =
      if (bytes.isEmpty) 0.0 else bytes.map(_ & 0xff).sum.toDouble / bytes.length
  }
  object StubCodec {
    val inits = new java.util.concurrent.atomic.AtomicLong(0)
  }

  /** Uniform frame sampling: every `stride`-th frame, always incl. frame 0. */
  def sampleFrames(nFrames: Int, maxSamples: Int = 4): Seq[Int] = {
    if (nFrames <= 0) Seq.empty
    else {
      val stride = math.max(1, nFrames / maxSamples)
      (0 until nFrames by stride).take(maxSamples)
    }
  }

  /** Build MediaRecords from the documents table (bytes = utf8 text — the
    * deterministic stand-in corpus; metadata derived as in j19). */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(
        $"doc_id".as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod($"doc_id", lit(3)) + 1).cast("int")).as("kind"),
        $"text".cast("binary").as("bytes"),
        (lit(1) + pmod($"n_chars", lit(640))).cast("int").as("width"),
        (lit(1) + pmod($"doc_id", lit(480))).cast("int").as("height"),
        (lit(1) + pmod($"doc_id", lit(10))).cast("int").as("n_frames"))
      .as[MediaRecord]
  }

  /** The decode stage: one codec per PARTITION (not per row), rows decoded
    * as a stream — the shape that holds at 10⁹ assets. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = new StubCodec                       // amortized init
      val initsSoFar = StubCodec.inits.get()
      rows.map { r =>
        val sampled = sampleFrames(r.n_frames)
        MediaFeatures(
          media_id = r.media_id,
          kind = r.kind,
          byte_len = r.bytes.length,
          n_sampled = sampled.length,
          sampled_frames = sampled,
          mean_byte = codec.decode(r.bytes),
          decoder_inits = initsSoFar)
      }
    }
  }

  /** Resize: metadata scales exactly; bytes go through the stub resampler
    * (every k-th byte — a real codec would interpolate pixels). Pure
    * map-side work: at 100 TB this pipelines with decode in one stage. */
  def resize(media: Dataset[MediaRecord], maxDim: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val scale = math.max(1, math.max(r.width, r.height) / maxDim)
      if (scale == 1) r
      else r.copy(
        width = math.max(1, r.width / scale),
        height = math.max(1, r.height / scale),
        bytes = r.bytes.grouped(scale).map(_.head).toArray)
    }
  }

  /** End-to-end: records → features, as a DataFrame for SQL consumers. */
  def features(spark: SparkSession, sfDir: String): DataFrame =
    decodeFeatures(mediaFromDocuments(spark, sfDir)).toDF()
}
