package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaCodec, Multimodal}
import graft.multimodal.Multimodal.{MediaFeatures, MediaRow}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("attachMedia: deterministic payloads with typed metadata struct") {
    val m = Multimodal.attachMedia(docs.limit(50), "doc_id").cache()
    val schema = m.schema
    assert(schema("media").dataType.typeName == "binary")
    val meta = schema("media_meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("mime", "width", "height", "duration_ms"))
    // repeatable: same ids → same bytes
    val a = m.select("doc_id", "media").as[(Long, Array[Byte])].collect().toMap
    val b = Multimodal.attachMedia(docs.limit(50), "doc_id")
      .select("doc_id", "media").as[(Long, Array[Byte])].collect().toMap
    assert(a.keySet == b.keySet && a.forall { case (k, v) => v.sameElements(b(k)) })
    // payload length law: 16 bytes per md5 repeat
    m.select($"doc_id", length($"media").as("len")).as[(Long, Int)].collect()
      .foreach { case (id, len) => assert(len == 16 * (id % 4 + 1), s"id=$id") }
  }

  test("batched mapPartitions feature extraction matches a direct computation") {
    val media = Multimodal.attachMedia(docs.limit(100), "doc_id")
      .select($"doc_id", $"media", $"media_meta.mime".as("mime")).as[MediaRow]
    val feats = Multimodal.extractFeatures(media, batchSize = 7).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats.size == 100)
    // recompute one row independently
    val row = media.filter($"doc_id" === 3L).collect().head
    val bytes = MediaCodec.decode(row.media, row.mime)
    val expMean = bytes.map(_ & 0xff).sum.toDouble / bytes.length
    val f = feats(3L)
    assert(f.byte_len == bytes.length)
    assert(math.abs(f.mean_byte - math.round(expMean * 10000) / 10000.0) < 1e-9)
    assert(f.histogram.sum == bytes.length)
    assert(f.entropy > 0 && f.entropy <= 4.0) // 16 buckets → max 4 bits
  }

  test("frame sampling slices every stride-th 4-byte chunk") {
    val m = Multimodal.attachMedia(docs.filter($"doc_id" === 7L), "doc_id")
    val framed = Multimodal.sampleFrames(m, "media", stride = 2).select("frames")
      .as[Seq[Array[Byte]]].collect().head
    // id=7 → 4 md5 repeats → 64 bytes → 64/8 = 8 frames of 4 bytes
    assert(framed.length == 8)
    assert(framed.forall(_.length == 4))
  }

  test("resize stub: deterministic truncation/padding to target size") {
    val out = MediaCodec.resize(Array.fill[Byte](100)(1), 64, 64)
    assert(out.length == 64 * 64 / 1024)
    val padded = MediaCodec.resize(Array.fill[Byte](1)(1), 128, 128)
    assert(padded.length == 16 && padded(0) == 1 && padded(15) == 0)
  }

  test("phash: identical payloads hash identically; one flipped byte moves " +
      "few bits (locality)") {
    // three payloads: p0, an exact copy, and p0 with ONE byte flipped
    val p0 = (0 until 64).map(i => ((i * 37 + 11) % 256).toByte).toArray
    val p2 = p0.clone(); p2(20) = (p2(20) ^ 0x5a).toByte
    val df = Seq((1L, p0), (2L, p0.clone()), (3L, p2)).toDF("id", "media")
    val h = Multimodal.phashTable(df, "id", "media")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L), "same payload must hash identically")
    val ham = java.lang.Long.bitCount(h(1L) ^ h(3L))
    // one byte of 64 feeds ≤ ~5 word-samples (as high byte or wrapped low
    // byte), each in ≤ 2 comparisons → ≤ 10 of 63 bits
    assert(ham >= 1 && ham <= 10, s"locality violated: hamming $ham")
  }

  test("phashNearDupPairs recovers planted identical-payload clones at hamming 0") {
    val base = Multimodal.attachMedia(
      docs.limit(40).select($"doc_id"), "doc_id")
    val clones = base.filter($"doc_id" % 10 === 0)
      .withColumn("doc_id", $"doc_id" + 1000L)
    val pairs = Multimodal.phashNearDupPairs(
        base.unionByName(clones), "doc_id", "media", maxHamming = 0)
      .collect()
    val planted = pairs.filter(r =>
      r.getAs[Long]("id_b") == r.getAs[Long]("id_a") + 1000L)
    assert(planted.length == 4, s"expected 4 planted pairs, got ${planted.length}")
    assert(planted.forall(_.getAs[Int]("hamming") == 0))
  }
}
