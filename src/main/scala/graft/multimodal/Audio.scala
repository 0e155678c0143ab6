package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** REAL audio feature extraction over opaque binary payload columns:
  * a dependency-free RIFF/WAVE (PCM16) parser plus the classic signal
  * statistics — duration, RMS energy, peak, zero-crossing rate,
  * clipping fraction. The audio counterpart of the image pack in
  * [[Multimodal]] (reference surface: media columns are opaque bytes
  * plus typed metadata; decode runs inside the engine, never on the
  * driver).
  *
  * Scale shape: identical to the image path — `mapPartitions` over
  * bounded `batchSize` groups (the mapInPandas batch contract), so
  * executor memory is bounded by batch × payload, and payload bytes
  * never reach the driver. Unparseable payloads (wrong magic,
  * truncated chunks, non-PCM codecs) flow through with `ok = false`
  * and null features instead of failing the pipeline — the q47
  * fallback contract.
  */
object Audio {

  /** PCM16 WAV synthesizer (mono, little-endian) — a sine tone with
    * `amplitude` in [0, ∞); values above 1.0 clip, which is exactly
    * what the clipping-fraction feature detects. Deterministic; used
    * by specs and the driver fixture, NOT by the operator. */
  def synthWavPcm16(freqHz: Double, seconds: Double, sampleRate: Int = 8000,
                    amplitude: Double = 0.5): Array[Byte] = {
    val n = (seconds * sampleRate).toInt
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      val x = amplitude * math.sin(2 * math.Pi * freqHz * i / sampleRate)
      val clipped = math.max(-1.0, math.min(1.0, x))
      bb.putShort(math.round(clipped * 32767.0).toShort)
      i += 1
    }
    bb.array()
  }

  /** Parse a PCM16 RIFF/WAVE payload into (sampleRate, channels,
    * mono-mixed samples in [-1, 1]); None for anything that isn't a
    * well-formed PCM16 WAV. */
  private[multimodal] def parseWav(p: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    try {
      if (p.length < 44) return None
      val bb = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag4(off: Int) = new String(p, off, 4, "US-ASCII")
      if (tag4(0) != "RIFF" || tag4(8) != "WAVE") return None
      // walk chunks: fmt then data (other chunks skipped)
      var off = 12
      var fmt: Option[(Int, Int, Int)] = None // (format, channels, rate)
      var data: Option[(Int, Int)] = None     // (offset, length)
      while (off + 8 <= p.length && (fmt.isEmpty || data.isEmpty)) {
        val id = tag4(off)
        val size = bb.getInt(off + 4)
        if (size < 0 || off + 8 + size > p.length) return None
        if (id == "fmt ") {
          if (size < 16) return None
          fmt = Some((bb.getShort(off + 8).toInt,
            bb.getShort(off + 10).toInt, bb.getInt(off + 12)))
          val bits = bb.getShort(off + 22).toInt
          if (bits != 16) return None
        } else if (id == "data") data = Some((off + 8, size))
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
      (fmt, data) match {
        case (Some((1, ch, rate)), Some((dOff, dLen)))
            if ch >= 1 && rate > 0 =>
          val frames = dLen / (2 * ch)
          val out = new Array[Double](frames)
          var f = 0
          while (f < frames) {
            var s = 0.0
            var c = 0
            while (c < ch) {
              s += bb.getShort(dOff + 2 * (f * ch + c)) / 32768.0
              c += 1
            }
            out(f) = s / ch
            f += 1
          }
          Some((rate, ch, out))
        case _ => None
      }
    } catch { case _: Exception => None }
  }

  private[multimodal] def features(samples: Array[Double], rate: Int)
      : (Double, Double, Double, Double, Double) = {
    val n = samples.length
    if (n == 0) return (0.0, 0.0, 0.0, 0.0, 0.0)
    var sq = 0.0; var peak = 0.0; var crossings = 0L; var clipped = 0L
    var i = 0
    while (i < n) {
      val x = samples(i)
      sq += x * x
      val a = math.abs(x)
      if (a > peak) peak = a
      // deliberate 1-LSB tolerance below int16 full scale: encoders
      // that clip often dither the flat-top down to ±32766, so exact
      // ±32767 would undercount real clipping; a legitimately loud
      // non-clipped sample at 32766 is accepted as the cheaper error
      if (a >= 32766.0 / 32768.0) clipped += 1
      if (i > 0 && ((samples(i - 1) >= 0) != (x >= 0))) crossings += 1
      i += 1
    }
    val dur = n.toDouble / rate
    (dur, math.sqrt(sq / n), peak, crossings / dur, clipped.toDouble / n)
  }

  /** Decode + feature-extract a binary `payload` column. Output keeps
    * every non-payload input column and appends
    * (ok, sample_rate, n_samples, duration_s, rms, peak, zcr_per_s,
    * clipping_frac) — null features where `ok` is false. */
  def audioFeatures(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val keep = df.schema.fields.filterNot(_.name == "payload")
    val outSchema = StructType(keep ++ Seq(
      StructField("ok", BooleanType),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", LongType),
      StructField("duration_s", DoubleType),
      StructField("rms", DoubleType),
      StructField("peak", DoubleType),
      StructField("zcr_per_s", DoubleType),
      StructField("clipping_frac", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    val keepIdx = keep.map(f => df.schema.fieldIndex(f.name))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val base = keepIdx.map(row.get)
          val payload = row.get(payloadIdx).asInstanceOf[Array[Byte]]
          val parsed = Option(payload).flatMap(parseWav)
          val tail: Seq[Any] = parsed match {
            case Some((rate, _, samples)) =>
              val (dur, rms, peak, zcr, clip) = features(samples, rate)
              Seq(true, rate, samples.length.toLong,
                r6(dur), r6(rms), r6(peak), r6(zcr), r6(clip))
            case None => Seq(false, null, null, null, null, null, null, null)
          }
          Row.fromSeq((base ++ tail).toSeq)
        }.iterator
      }
    }(enc)
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
