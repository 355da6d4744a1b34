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

  /** Perceptual difference hash (dHash, Krawetz's pHash family) over the
    * decoded payload: 72 evenly-spaced samples form an 8×9 "gray grid",
    * and bit (r, c) = grid[r][c] < grid[r][c+1] — 63 bits packed into a
    * non-negative long (the canonical 64th comparison is dropped to stay
    * inside signed-64, engine-portably). With a real image codec the
    * samples are the resized luma grid; the deterministic byte-sampling
    * stand-in keeps the whole hash + banding pipeline exact and
    * oracle-checkable. Near-identical payloads differ in few bits, so
    * Hamming distance is the visual-near-dup metric, and the hash is
    * LOCAL: one flipped payload byte only disturbs the few samples that
    * read it (spec-pinned). Each sample is a 16-BIT word at a stride-7
    * position ((7i mod len), paired with its wrapping successor): the
    * 16–64-byte stand-in payloads oversample a 72-cell grid, and
    * consecutive/monotone sampling would tie neighbouring cells
    * wholesale — biasing bits to 0 and flooring every pair at a small
    * Hamming distance; the coprime stride visits distinct positions
    * between repeats, so neighbour ties are rare and the collision floor
    * stays at the planted duplicates.
    *
    * Shape: one projection builds the 72 sample columns (hex byte
    * slices — codegen'd, CSE-shared), one more folds the 63
    * comparisons. Zero shuffles. */
  def phashTable(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val base = df.select(col(idCol).as("__id"),
      upper(hex(col(mediaCol))).as("__hx"),
      length(col(mediaCol)).as("__len"))
    def byteAt(pos: Column): Column =
      conv(col("__hx").substr((pos * 2 + 1).cast("int"), lit(2)), 16, 10)
        .cast("long")
    val withV = base.select(col("__id") +: (0 to 71).map { i =>
      val p = pmod(lit(i * 7), col("__len")).cast("int")
      (byteAt(p) * 256 + byteAt(pmod(p + 1, col("__len")))).as(s"__v$i")
    }: _*)
    val hash = (0 until 63).map { bit =>
      val r = bit / 8; val c = bit % 8
      when(col(s"__v${r * 9 + c}") < col(s"__v${r * 9 + c + 1}"),
        lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ + _)
    withV.select(col("__id"), hash.as("dhash"))
  }

  /** Visual near-dup pairs: [[phashTable]] hashes banded into
    * `maxHamming + 1` contiguous bit bands (capped at 63) — any pair
    * within Hamming ≤ maxHamming differs in at most maxHamming bands, so
    * by pigeonhole it shares at least one exact band: FULL recall for the
    * requested radius, same derivation as
    * [[graft.ops.Dedup.simhashNearDupPairs]]. Candidates materialize only
    * on band collisions, never all-pairs, then the exact
    * `bit_count(xor)` verify keeps precision at 100%.
    *
    * @return (id_a, id_b, dhash_a, dhash_b, hamming), id_a < id_b */
  def phashNearDupPairs(df: DataFrame, idCol: String, mediaCol: String,
      maxHamming: Int): DataFrame =
    // both band-join legs consume the hash table; without materialization
    // the 72-column sampling grid + 63-term hash fold re-ran once per leg
    // (measured: q153's executed plan held 8 media scans, zero exchange
    // reuse; 0.44× after). The checkpointed frame is (id, 8-byte hash) —
    // storing it is O(rows); recomputing re-reads and re-hashes payloads.
    phashNearDupPairsFromHashes(
      phashTable(df, idCol, mediaCol).localCheckpoint(), maxHamming)

  /** [[phashNearDupPairs]] over a PRECOMPUTED (__id, dhash) table — the
    * seam an audit needs to share ONE materialized hash frame between
    * the banded arm and an exact verification arm. The caller owns
    * materializing `hashes`. */
  def phashNearDupPairsFromHashes(hashes: DataFrame,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0, s"phashNearDupPairs: maxHamming >= 0")
    val nBands = math.min(maxHamming + 1, 63)
    val w = (63 + nBands - 1) / nBands
    val hashed = hashes
    val banded = hashed.select(col("__id"), col("dhash"), explode(
      array((0 until nBands).map(b => struct(
        lit(b).as("band_id"),
        shiftright(col("dhash"), b * w)
          .bitwiseAND(lit((1L << w) - 1)).as("band_bits"))): _*)).as("__b"))
      .select(col("__id"), col("dhash"),
        col("__b.band_id").as("__band_id"), col("__b.band_bits").as("__band_bits"))
    val a = banded.select(col("__id").as("id_a"), col("dhash").as("dhash_a"),
      col("__band_id"), col("__band_bits"))
    val b = banded.select(col("__id").as("id_b"), col("dhash").as("dhash_b"),
      col("__band_id"), col("__band_bits"))
    a.join(b, Seq("__band_id", "__band_bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("dhash_a"), col("dhash_b"))
      .distinct()
      .withColumn("hamming",
        call_function("bit_count", col("dhash_a").bitwiseXOR(col("dhash_b"))))
      .filter(col("hamming") <= maxHamming)
  }

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
