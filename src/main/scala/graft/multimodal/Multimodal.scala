package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support: images/audio/video ride through the engine as
  * opaque `BINARY` columns plus a typed metadata struct, exactly like a
  * 100 TB training-data lake stores them (the bytes live in columnar files;
  * decode happens executor-side, streamed, never on the driver).
  *
  * The actual codecs (JPEG decode, audio resample, video frame extraction)
  * are STUBBED — this container has no image/audio libraries — behind
  * [[MediaCodec]], with deterministic byte-level fakes. Everything Spark
  * owns is real and tested: the schema convention, executor-side batched
  * processing via `mapPartitions` over `Dataset[T]` (the Scala analog of
  * `mapInPandas` batches), partition-preserving narrow plans, and
  * engine-portable binary derivations the DuckDB oracle replays.
  */
object Multimodal {

  /** Media metadata convention: every media column `m` is accompanied by
    * `m_meta: STRUCT<mime: STRING, width: INT, height: INT, duration_ms: BIGINT>`. */
  val mimes = Seq("image/png", "image/jpeg", "audio/wav", "video/mp4")

  /** Deterministic fake payload for row id: md5(id) hex expanded
    * `1 + id % 4` times, un-hexed → 16–64 bytes of stable pseudo-bytes.
    * Engine-portable: the oracle rebuilds identical bytes in SQL. */
  def fakePayload(id: Column): Column =
    unhex(call_function("repeat", md5(id.cast("string").cast("binary")),
      (id % 4 + 1).cast("int")))

  /** Attach a media column + metadata struct to any keyed DataFrame. */
  def attachMedia(df: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol)
    df.withColumn("media", fakePayload(id))
      .withColumn("media_meta", struct(
        element_at(lit(mimes.toArray), (id % mimes.size + 1).cast("int")).as("mime"),
        ((id % 8 + 1) * 64).cast("int").as("width"),
        ((id % 6 + 1) * 64).cast("int").as("height"),
        ((id % 30 + 1) * 1000L).as("duration_ms")))
  }

  case class MediaRow(doc_id: Long, media: Array[Byte], mime: String)
  case class MediaFeatures(doc_id: Long, mime: String, byte_len: Int,
      mean_byte: Double, entropy: Double, histogram: Array[Long])

  /** Executor-side batched feature extraction: one pass per partition, a
    * reusable histogram buffer per batch (the memory shape a real decoder
    * needs). Swap [[MediaCodec.decode]] for a real codec and the plumbing —
    * batching, schema, partitioning — is unchanged. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val decoded = MediaCodec.decode(r.media, r.mime)
          val hist = new Array[Long](16)
          var sum = 0L
          decoded.foreach { b =>
            val u = b & 0xff
            hist(u >> 4) += 1
            sum += u
          }
          val n = decoded.length.toDouble
          val entropy = -hist.filter(_ > 0)
            .map(c => (c / n) * math.log(c / n) / math.log(2)).sum
          MediaFeatures(r.doc_id, r.mime, decoded.length,
            math.round(sum / n * 10000) / 10000.0,
            math.round(entropy * 10000) / 10000.0, hist)
        }
      }
    }
  }

  /** "Frame sampling" for video payloads: every `stride`-th 4-byte chunk —
    * the partition-preserving narrow slice a real frame sampler performs. */
  def sampleFrames(df: DataFrame, mediaCol: String, stride: Int = 4): DataFrame =
    df.withColumn("frames",
      transform(
        sequence(lit(0), greatest((length(col(mediaCol)) / (4 * stride)).cast("int") - 1, lit(0))),
        i => substring(col(mediaCol), lit(1) + i * (4 * stride), lit(4))))

  /** Parse a fixed-layout binary container header without leaving
    * codegen: byte slices of the media column decoded as big-endian
    * unsigned 32-bit words (substring on BINARY is a byte slice; hex →
    * base-16 conv is the engine-portable bytes→integer path). This is
    * the typed-decode seam a real container format (RIFF/PNG/ISO-BMFF
    * boxes) needs — same plan, different offsets. */
  def headerWord(mediaCol: Column, byteOffset: Int): Column =
    conv(hex(substring(mediaCol, byteOffset + 1, 4)), 16, 10).cast("long")

  /** Media corpus statistics grouped by mime type — the accounting query a
    * curation pipeline runs before training. */
  def mediaStats(df: DataFrame): DataFrame =
    df.groupBy(col("media_meta.mime").as("mime"))
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("media"))).as("total_bytes"),
        round(avg(col("media_meta.width") * col("media_meta.height")), 2).as("avg_pixels"),
        max(col("media_meta.duration_ms")).as("max_duration_ms"))
}

/** Codec seam: REAL codecs are not available in this container, so decode is
  * a clearly-marked deterministic stand-in (identity). In production this is
  * the only file that changes — plug javax.imageio / ffmpeg bindings here;
  * the Spark plumbing in [[Multimodal]] is codec-agnostic. */
object MediaCodec {
  /** STUB: a real implementation would decode `mime` bytes to pixels/samples.
    * The deterministic stand-in returns the payload unchanged. */
  def decode(payload: Array[Byte], mime: String): Array[Byte] = payload

  /** STUB: real implementation would re-encode at (w,h); stand-in truncates
    * or zero-pads to w*h/1024 bytes, preserving determinism. */
  def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, w * h / 1024)
    java.util.Arrays.copyOf(payload, target)
  }
}
