package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Video frame-sampling plumbing over opaque binary payloads — the
  * third leg of the media triad ([[Multimodal]] images, [[Audio]]
  * sound). Real video codecs (H.264 etc.) need native libraries this
  * environment doesn't ship, so the CONTAINER is a simple
  * length-prefixed frame pack ("GVID" magic + count + per-frame PNG
  * bytes) — but everything downstream of the container is REAL: each
  * sampled frame goes through the same javax.imageio decode and luma
  * kernel as the image pack, and the motion signal is the mean
  * absolute luma-grid delta between consecutive sampled frames.
  * Swapping the container parser for a real demuxer changes nothing
  * else — that seam is the point of the plumbing.
  *
  * Scale shape: bounded-batch mapPartitions like the image/audio
  * paths; one payload decodes at a time, frames are sampled (every
  * `sampleEvery`-th) BEFORE decode so a long clip costs
  * frames/sampleEvery decodes, and payload bytes never reach the
  * driver. Malformed containers or undecodable frames → ok=false
  * nulls (the q47/q229 fallback contract).
  */
object Video {

  private val Magic = "GVID".getBytes("US-ASCII")

  /** Pack PNG frames into the length-prefixed container (fixture
    * helper — specs and the driver query build clips with it). */
  def packFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val dataLen = frames.map(_.length + 4).sum
    val bb = java.nio.ByteBuffer.allocate(8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(Magic).putInt(frames.length)
    frames.foreach { f => bb.putInt(f.length); bb.put(f) }
    bb.array()
  }

  /** A deterministic synthetic clip: `nFrames` PNGs whose content
    * drifts with the frame index (so motion energy is non-zero), built
    * on [[Multimodal.syntheticPng]]. */
  def syntheticClip(seed: Long, nFrames: Int, w: Int = 16,
                    h: Int = 16): Array[Byte] =
    packFrames((0 until nFrames).map(f =>
      Multimodal.syntheticPng(seed + f * 7L, w, h)))

  private[multimodal] def unpack(p: Array[Byte]): Option[IndexedSeq[Array[Byte]]] = {
    try {
      if (p.length < 8 || !p.take(4).sameElements(Magic)) return None
      val bb = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = bb.getInt(4)
      if (n < 0 || n > 1000000) return None
      var off = 8
      val out = IndexedSeq.newBuilder[Array[Byte]]
      var i = 0
      while (i < n) {
        if (off + 4 > p.length) return None
        val len = bb.getInt(off)
        if (len < 0 || off + 4 + len > p.length) return None
        out += java.util.Arrays.copyOfRange(p, off + 4, off + 4 + len)
        off += 4 + len
        i += 1
      }
      Some(out.result())
    } catch { case _: Exception => None }
  }

  /** Decode + frame-sample a binary `payload` column: every
    * `sampleEvery`-th frame is REALLY decoded (imageio) and reduced to
    * the 8×8 luma grid; output appends (ok, n_frames, n_sampled,
    * mean_luma, motion_energy) where motion_energy is the mean
    * absolute grid delta between consecutive sampled frames (0 for
    * single-frame samples).
    *
    * ok=false contract (two deliberate shapes, split on whether the
    * CONTAINER parsed): an unreadable/empty container yields all-null
    * metadata (n_frames unknowable), while a container that parses but
    * whose sampled frames all fail to decode keeps n_frames populated
    * with n_sampled=0 and null feature columns — so a caller can
    * distinguish corrupt files from codec failures with
    * `ok = false AND n_frames IS NULL` vs `... IS NOT NULL`. */
  def videoFeatures(df: DataFrame, sampleEvery: Int = 2,
                    batchSize: Int = 16): DataFrame = {
    require(sampleEvery >= 1)
    val keep = df.schema.fields.filterNot(_.name == "payload")
    val outSchema = StructType(keep ++ Seq(
      StructField("ok", BooleanType),
      StructField("n_frames", IntegerType),
      StructField("n_sampled", IntegerType),
      StructField("mean_luma", DoubleType),
      StructField("motion_energy", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    val keepIdx = keep.map(f => df.schema.fieldIndex(f.name))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val base = keepIdx.map(row.get)
          val payload = row.get(payloadIdx).asInstanceOf[Array[Byte]]
          val tail: Seq[Any] = Option(payload).flatMap(unpack) match {
            case Some(frames) if frames.nonEmpty =>
              val sampled = frames.indices.by(sampleEvery)
                .map(frames).flatMap(Multimodal.decodeImage)
              if (sampled.isEmpty)
                Seq(false, frames.length, 0, null, null)
              else {
                val grids = sampled.map(Multimodal.lumaGrid(_, 8))
                val meanLuma = grids.map(g => g.sum / g.length).sum / grids.length
                val motion =
                  if (grids.length < 2) 0.0
                  else grids.sliding(2).map { case Seq(a, b) =>
                    a.zip(b).map { case (x, y) => math.abs(x - y) }.sum / a.length
                  }.sum / (grids.length - 1)
                Seq(true, frames.length, grids.length,
                  r6(meanLuma), r6(motion))
              }
            case _ => Seq(false, null, null, null, null)
          }
          Row.fromSeq((base ++ tail).toSeq)
        }.iterator
      }
    }(enc)
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
