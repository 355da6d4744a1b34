package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization — the third vector-compression tier next to PQ
  * ([[ProductQuantization]], 32×) and per-vector int8
  * ([[Similarity.int8Quantize]], 4× symmetric): per-DIMENSION affine
  * uint8, 4× compression with reconstruction good enough to search on
  * directly, which is why production vector indexes ship an IVF_SQ variant
  * beside IVF_FLAT and IVF_PQ. This module is the model math; the
  * persisted index lifecycle around it is [[AnnIndex.ensureIvfSq]].
  *
  * The quantization convention is IDENTICAL to the shipped int8 audit
  * ([[ProductQuantization.int8QuantizationAudit]], gate q144):
  * scale_d = (hi_d − lo_d)/255, code = clamp(⌊(x − lo_d)/scale_d + 0.5⌋,
  * 0, 255), x̂ = lo_d + code·scale_d — the ⌊·+0.5⌋ spelling because
  * engines disagree on round-half semantics, floor never does. Constant
  * dimensions (scale 0) code to 0 and reconstruct to lo exactly.
  * Reconstruction lands in FLOAT (like the corpus vectors), so the
  * codegen'd [[graft.functions.CosineSimilarity]] scores decoded vectors
  * on the same fused-loop path as raw ones, and the DuckDB oracle mirrors
  * it with `CAST(... AS REAL)`.
  *
  * Scale: the model is dim-sized — [[trainRanges]] is ONE
  * map-side-combinable min/max aggregate (dim rows out of 100 TB), and
  * encode/decode are shuffle-free per-row `transform`s against literal
  * lo/scale arrays (no join rides along with the data).
  */
object ScalarQuant {

  /** Per-dimension (dim, lo, hi) over the corpus — the SQ8 model, trained
    * with one aggregation. Null vectors contribute nothing. */
  def trainRanges(corpus: DataFrame, vecCol: String): DataFrame =
    TextFunctions.widen(corpus)
      .filter(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .groupBy(col("dim"))
      .agg(min(col("__x").cast("double")).as("lo"),
        max(col("__x").cast("double")).as("hi"))

  /** Collect a ranges frame to (loArr, scaleArr) — a dim-sized driver
    * read, bounded by construction. The sort happens driver-side: an
    * `orderBy` on a dim-row frame would cost a whole shuffle job just to
    * order 64 rows. */
  def collectModel(ranges: DataFrame): (Array[Double], Array[Double]) = {
    val rows = ranges.collect().sortBy(_.getInt(0))
    val lo = rows.map(_.getDouble(1))
    val scale = rows.map(r => (r.getDouble(2) - r.getDouble(1)) / 255.0)
    (lo, scale)
  }

  /** codes[d] = clamp(⌊(x[d] − lo[d])/scale[d] + 0.5⌋, 0, 255) as an
    * array<int> expression; out-of-range values (append drift against a
    * frozen model) clamp to the edges, exactly as SQ8 serving does. */
  def encode(vec: Column, loArr: Array[Double], scaleArr: Array[Double])
      : Column =
    transform(vec, (x, i) => {
      val lo = element_at(lit(loArr), i + 1)
      val sc = element_at(lit(scaleArr), i + 1)
      when(sc === 0.0, lit(0)).otherwise(
        least(greatest(
          floor((x.cast("double") - lo) / sc + 0.5), lit(0.0)), lit(255.0))
          .cast("int"))
    })

  /** x̂[d] = float(lo[d] + codes[d]·scale[d]) — reconstruction into the
    * corpus's own element type. */
  def decode(codes: Column, loArr: Array[Double], scaleArr: Array[Double])
      : Column =
    transform(codes, (c, i) =>
      (element_at(lit(loArr), i + 1) +
        c.cast("double") * element_at(lit(scaleArr), i + 1)).cast("float"))
}
