package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

/** A REAL audio codec in pure JVM: RIFF/WAVE with 16-bit PCM — the
  * canonical uncompressed audio container (44-byte RIFF header + interleaved
  * little-endian samples). Gives the audio modality a genuine
  * decode → sample-math → re-encode path without native libraries;
  * compressed audio stays behind the documented stub.
  */
object Wav {

  /** Decoded PCM audio; `samples(channel)(i)` in [-32768, 32767]. */
  case class Audio(sampleRateHz: Int, samples: Array[Array[Short]]) {
    require(samples.nonEmpty && samples.forall(_.length == samples(0).length),
      "channels must be non-empty and equal length")
    require(samples(0).length >= 1, "audio needs >= 1 frame (feature math divides by it)")
    def numChannels: Int = samples.length
    def numFrames: Int = samples(0).length
    def durationSecs: Double = numFrames.toDouble / sampleRateHz
  }

  def encode(audio: Audio): Array[Byte] = {
    val ch = audio.numChannels; val n = audio.numFrames
    val dataLen = n * ch * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(ch.toShort)
      .putInt(audio.sampleRateHz)
      .putInt(audio.sampleRateHz * ch * 2) // byte rate
      .putShort((ch * 2).toShort)          // block align
      .putShort(16)                        // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < ch) { buf.putShort(audio.samples(c)(i)); c += 1 }
      i += 1
    }
    buf.array()
  }

  /** Strict decode: RIFF/WAVE magic, PCM format 1, 16-bit; walks chunks
    * (tolerating extra chunks like LIST) to find fmt and data. */
  def decode(payload: Array[Byte]): Audio = {
    def fail(msg: String) = throw new IllegalArgumentException(s"not a pcm16 wav: $msg")
    if (payload.length < 44) fail("too short")
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val b = new Array[Byte](n); buf.get(b); new String(b, "US-ASCII")
    }
    if (ascii(4) != "RIFF") fail("bad RIFF magic")
    buf.getInt // riff size (don't trust)
    if (ascii(4) != "WAVE") fail("bad WAVE magic")
    var sampleRate = -1; var channels = -1
    var data: Array[Byte] = null
    while (buf.remaining() >= 8 && (data == null || sampleRate < 0)) {
      val id = ascii(4); val size = buf.getInt
      if (size < 0 || size > buf.remaining()) fail(s"chunk '$id' overruns payload")
      id match {
        case "fmt " =>
          if (size < 16) fail(s"fmt chunk too short ($size bytes, need 16)")
          val fmt = buf.getShort
          if (fmt != 1) fail(s"compression format $fmt unsupported (PCM only)")
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          val bits = buf.getShort
          if (bits != 16) fail(s"$bits-bit samples unsupported (16 only)")
          buf.position(buf.position() + (size - 16))
        case "data" =>
          data = new Array[Byte](size); buf.get(data)
        case _ =>
          buf.position(buf.position() + size + (size & 1)) // chunks are word-aligned
      }
    }
    if (sampleRate < 0) fail("missing fmt chunk")
    if (data == null) fail("missing data chunk")
    if (channels < 1) fail(s"bad channel count $channels")
    if (data.length % (channels * 2) != 0) fail("data not a whole number of frames")
    val frames = data.length / (channels * 2)
    if (frames < 1) fail("empty data chunk (feature math needs >= 1 frame)")
    val out = Array.fill(channels)(new Array[Short](frames))
    val db = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < frames) {
      var c = 0
      while (c < channels) { out(c)(i) = db.getShort; c += 1 }
      i += 1
    }
    Audio(sampleRate, out)
  }

  /** Naive nearest-sample resample (decimation/interpolation by index
    * mapping) — the shape a windowed-sinc kernel drops into. */
  def resample(audio: Audio, targetRateHz: Int): Audio = {
    require(targetRateHz >= 1, "target rate must be >= 1")
    if (targetRateHz == audio.sampleRateHz) audio
    else {
      val n = math.max(1, (audio.numFrames.toLong * targetRateHz / audio.sampleRateHz).toInt)
      val out = Array.fill(audio.numChannels)(new Array[Short](n))
      var c = 0
      while (c < audio.numChannels) {
        var i = 0
        while (i < n) {
          val si = math.min(audio.numFrames - 1,
            (i.toLong * audio.sampleRateHz / targetRateHz).toInt)
          out(c)(i) = audio.samples(c)(si)
          i += 1
        }
        c += 1
      }
      Audio(targetRateHz, out)
    }
  }

  /** Real signal statistics per payload: mean, RMS, peak, zero-crossing
    * rate of channel 0 (4), 8-bin amplitude histogram (8), then frames,
    * sample rate, channels, duration (4) = 16 floats. */
  def features(audio: Audio): Array[Float] = {
    val s = audio.samples(0); val n = s.length
    var sum = 0.0; var sq = 0.0; var peak = 0.0; var zc = 0
    val hist = new Array[Double](8)
    var i = 0
    while (i < n) {
      val v = s(i).toDouble
      sum += v; sq += v * v
      if (math.abs(v) > peak) peak = math.abs(v)
      if (i > 0 && (s(i - 1) < 0) != (s(i) < 0)) zc += 1
      hist(math.min(7, (math.abs(v) / 4096).toInt)) += 1
      i += 1
    }
    val out = new Array[Float](16)
    out(0) = (sum / n).toFloat
    out(1) = math.sqrt(sq / n).toFloat
    out(2) = peak.toFloat
    out(3) = (zc.toDouble / math.max(1, n - 1)).toFloat
    var k = 0
    while (k < 8) { out(4 + k) = (hist(k) / n).toFloat; k += 1 }
    out(12) = n.toFloat
    out(13) = audio.sampleRateHz.toFloat
    out(14) = audio.numChannels.toFloat
    out(15) = audio.durationSecs.toFloat
    out
  }
}
