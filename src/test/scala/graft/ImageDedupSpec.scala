package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Real image decode + near-dup detection (VERDICT r4 item 5): PNG
  * payloads decode through javax.imageio, features reflect actual pixel
  * content, and the banded aHash join finds planted near-identical
  * images without an all-pairs product. */
class ImageDedupSpec extends SparkSpec {
  import spark.implicits._

  private def mediaFrame(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("media_id", "payload")
      .select(col("media_id"), lit("image").as("media_type"),
        lit("image/png").as("mime"), lit(16).as("width"), lit(16).as("height"),
        lit(null).cast("long").as("duration_ms"), col("payload"))

  test("decode is real: features reflect pixel content, not payload bytes") {
    // a solid red and a solid blue PNG: channel means must separate them
    def solid(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 8).foreach(y => (0 until 8).foreach(x => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = mediaFrame(Seq((1L, solid(0xff0000)), (2L, solid(0x0000ff))))
    val out = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](r.fieldIndex("features"))).toMap
    // layout: [meanR, meanG, meanB, stdR, stdG, stdB, luma...]
    assert(out(1L)(0) > 0.99f && out(1L)(2) < 0.01f, s"red image: ${out(1L)}")
    assert(out(2L)(0) < 0.01f && out(2L)(2) > 0.99f, s"blue image: ${out(2L)}")
    assert(out(1L)(3) < 0.01f, "solid image must have ~zero channel std")
  }

  test("undecodable payloads fall back to the stub instead of failing") {
    val media = mediaFrame(Seq((1L, "not a png at all".getBytes("UTF-8"))))
    val out = Multimodal.extractFeatures(media, dim = 4).collect()
    assert(out.length == 1 && out(0).getSeq[Float](out(0).fieldIndex("features")).length == 4)
    // and its signature is null, so near-dup never sees garbage
    val sig = Multimodal.imageSignatures(media).head()
    assert(sig.isNullAt(1))
  }

  test("banded aHash near-dup finds planted near-identical images, no cartesian") {
    // 40 distinct synthetic images + 8 near-duplicates (a few pixels
    // flipped) — the near-dups must surface, the rest must not
    val base = (0 until 40).map(i => (i.toLong, Multimodal.syntheticPng(i * 97)))
    val dups = (0 until 8).map(i =>
      (1000L + i, Multimodal.syntheticPng(i * 97, flipPixels = 2)))
    val media = mediaFrame(base ++ dups)
    val sigs = Multimodal.imageSignatures(media)
    val pairs = Multimodal.imageNearDupPairs(sigs, maxHamming = 6)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    val found = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalled = (0 until 8).count(i => found.contains((i.toLong, 1000L + i)))
    assert(recalled == 8, s"only $recalled/8 planted image dups found: $found")
    // identical-image signatures match exactly
    val sigMap = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Multimodal.imageSignatures(
      mediaFrame(Seq((7L, Multimodal.syntheticPng(7 * 97))))).head().getLong(1)
    assert(sigMap(7L) == exact, "aHash must be deterministic")
  }
}
