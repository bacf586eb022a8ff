package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
import scala.util.control.NonFatal

import graft.multimodal.Multimodal.MediaMeta

/** Real audio codec for RIFF/WAVE on pure-JDK `javax.sound.sampled` —
  * no external libraries, headless-safe. Closes the audio third of the
  * media stub (images were realized in r3; video remains the labeled
  * `GMM1` stub — the JDK ships no video decoder).
  *
  * MediaMeta field mapping for audio (the struct is shared with
  * images): `width` = sample rate in Hz, `height` = channel count,
  * `durationMs` = clip duration. Documented here and in README.
  *
  *  - `decode` reads ONLY the header (`AudioSystem.getAudioFileFormat`
  *    parses fmt/data chunk sizes without touching samples).
  *  - `features` is the classic cheap audio signature: the first
  *    dim/2 slots are windowed RMS energy (normalized to [-0.5, 0.5]),
  *    the rest windowed zero-crossing rate (-0.5 shifted) — enough for
  *    the real Similarity ops (cosine top-k / ANN / near-dup) to
  *    cluster tones vs noise vs silence. PCM 8/16-bit, channels mixed.
  *  - `resize` has no audio meaning — throw-free pass-through.
  *  - `sampleFrames` cuts n evenly-spaced equal-length segments, each
  *    re-encoded as a standalone WAV.
  *
  * The reference has no media handling at all (SURVEY.md §2.6
  * north-star surface).
  */
object WavCodec extends MediaCodec {

  /** RIFF....WAVE magic. */
  def supports(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  def decode(bytes: Array[Byte]): MediaMeta = {
    if (!supports(bytes)) return MediaMeta("unknown", 0, 0, 0L, valid = false)
    try {
      val aff: AudioFileFormat =
        AudioSystem.getAudioFileFormat(new ByteArrayInputStream(bytes))
      val f = aff.getFormat
      val frames = aff.getFrameLength
      val durMs =
        if (frames > 0 && f.getFrameRate > 0)
          (frames.toDouble / f.getFrameRate * 1000.0).toLong
        else 0L
      // valid means FEATURIZABLE, not just header-parsed: a format we
      // can neither read directly nor convert would otherwise flow
      // downstream as valid with an all-zero feature vector — making
      // every such file an exact "duplicate" of every other in the
      // similarity ops.
      MediaMeta("wav", math.round(f.getSampleRate), f.getChannels, durMs,
        valid = featurizable(f))
    } catch { case NonFatal(_) => MediaMeta("wav", 0, 0, 0L, valid = false) }
  }

  private def directlyReadable(f: AudioFormat): Boolean =
    (f.getEncoding == AudioFormat.Encoding.PCM_SIGNED ||
      f.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED) &&
      (f.getSampleSizeInBits == 8 || f.getSampleSizeInBits == 16)

  private def pcm16(f: AudioFormat): AudioFormat =
    new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, f.getSampleRate, 16,
      f.getChannels, f.getChannels * 2, f.getSampleRate, false)

  private def featurizable(f: AudioFormat): Boolean =
    directlyReadable(f) ||
      (try AudioSystem.isConversionSupported(pcm16(f), f)
       catch { case NonFatal(_) => false })

  /** Channel-mixed samples in [-1, 1], or null if undecodable. Formats
    * beyond 8/16-bit integer PCM (24-bit, 32-bit float WAVs are common
    * in the wild) go through the JDK's own converter to 16-bit PCM
    * first; only unconvertible payloads return null.
    */
  private def samples(bytes: Array[Byte]): Array[Double] =
    try {
      val raw = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val in =
        if (directlyReadable(raw.getFormat)) raw
        else if (AudioSystem.isConversionSupported(pcm16(raw.getFormat), raw.getFormat))
          AudioSystem.getAudioInputStream(pcm16(raw.getFormat), raw)
        else { raw.close(); return null }
      try {
        val f = in.getFormat
        val bits = f.getSampleSizeInBits
        val data = in.readAllBytes()
        val ch = f.getChannels
        val bytesPerSample = bits / 8
        val frameBytes = ch * bytesPerSample
        if (frameBytes == 0) return null
        val n = data.length / frameBytes
        val out = new Array[Double](n)
        val signed = f.getEncoding == AudioFormat.Encoding.PCM_SIGNED
        val big = f.isBigEndian
        var i = 0
        while (i < n) {
          var acc = 0.0
          var c = 0
          while (c < ch) {
            val o = i * frameBytes + c * bytesPerSample
            val v =
              if (bits == 8) {
                if (signed) data(o).toDouble / 128.0
                else ((data(o) & 0xFF) - 128).toDouble / 128.0
              } else {
                val lo = if (big) data(o + 1) else data(o)
                val hi = if (big) data(o) else data(o + 1)
                val s = ((hi.toInt << 8) | (lo & 0xFF)).toShort
                (if (signed) s.toDouble
                 else (((s & 0xFFFF) - 32768).toDouble)) / 32768.0
              }
            acc += v
            c += 1
          }
          out(i) = acc / ch
          i += 1
        }
        out
      } finally in.close()
    } catch { case NonFatal(_) => null }

  def features(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (dim <= 0) return Array.empty
    val out = new Array[Float](dim)
    val s = samples(bytes)
    if (s == null || s.length == 0) return out
    val half = math.max(1, dim / 2)
    val nWin = half
    var wIdx = 0
    while (wIdx < nWin) {
      val from = (s.length.toLong * wIdx / nWin).toInt
      val to = math.max(from + 1, (s.length.toLong * (wIdx + 1) / nWin).toInt)
      var sumSq = 0.0
      var crossings = 0
      var i = from
      while (i < to) {
        sumSq += s(i) * s(i)
        if (i > from && (s(i) >= 0) != (s(i - 1) >= 0)) crossings += 1
        i += 1
      }
      val rms = math.sqrt(sumSq / (to - from))
      out(wIdx) = (math.min(rms, 1.0) - 0.5).toFloat
      val zcrSlot = half + wIdx
      if (zcrSlot < dim)
        out(zcrSlot) = (crossings.toDouble / (to - from) - 0.5).toFloat
      wIdx += 1
    }
    out
  }

  /** Mono 16-bit signed little-endian PCM WAV from integer samples
    * (clamped to short range) — the deterministic audio synthesizer
    * behind q161's fingerprint dedup, twin of
    * [[Multimodal.renderGray8x8]] on the image side. Uses the JDK's
    * own RIFF writer so the bytes exercise the same parse path real
    * files take.
    */
  def encodePcm16(samples: Seq[Int], sampleRate: Int = 8000): Array[Byte] = {
    val f = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      sampleRate, 16, 1, 2, sampleRate, false)
    val n = if (samples == null) 0 else samples.length
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = math.max(-32768, math.min(32767, samples(i)))
      data(2 * i) = (v & 0xFF).toByte
      data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(data), f, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** 60-bit audio fingerprint THROUGH the codec's feature path (twin of
    * [[ImageIoCodec.averageHash64]]): decode → 60 windowed-RMS features
    * → bit b = (energy_b × 60 > Σ energies), i.e. each window compared
    * to the clip's mean energy. Built so the whole WAV→decode→feature→
    * hash round-trip is EXACT in integers for synthesized clips whose
    * windows are constant-valued 16-bit samples: window RMS is then
    * |sv|/32768 exactly (a ≤15-bit dyadic — exact through the float
    * feature slot), so `round((f+0.5)·32768)` reconstructs |sv| and the
    * DuckDB oracle replays the hash relationally from the quantized
    * sample ints without any audio codec (the q149 PNG construction,
    * transposed to audio). Gain-robustness: a uniform gain scales every
    * window AND the mean equally, so mean-relative bits are invariant —
    * a re-mastered (volume-changed) clip hashes identically except
    * where it was actually edited.
    */
  def audioFingerprint60(bytes: Array[Byte]): Long = {
    val f = features(bytes, 128)
    if (f.length < 60) return 0L
    val a = new Array[Long](60)
    var i = 0
    while (i < 60) {
      a(i) = math.round((f(i) + 0.5f).toDouble * 32768.0)
      i += 1
    }
    val s = a.sum
    var fp = 0L
    i = 0
    while (i < 60) {
      if (a(i) * 60 > s) fp |= 1L << i
      i += 1
    }
    fp
  }

  /** No audio meaning — pass-through per the throw-free contract. */
  def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = bytes

  def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (n <= 0) return Seq.empty
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        val frameBytes = f.getFrameSize
        if (frameBytes <= 0) return Seq.empty
        val data = in.readAllBytes()
        val totalFrames = data.length / frameBytes
        if (totalFrames == 0) return Seq.empty
        val take = math.min(n.toLong, totalFrames).toInt
        (0 until take).map { i =>
          val from = (totalFrames.toLong * i / take).toInt
          val to = math.max(from + 1, (totalFrames.toLong * (i + 1) / take).toInt)
          val slice = java.util.Arrays.copyOfRange(
            data, from * frameBytes, to * frameBytes)
          val ais = new AudioInputStream(
            new ByteArrayInputStream(slice), f, (to - from).toLong)
          val bos = new ByteArrayOutputStream()
          AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
          bos.toByteArray
        }
      } finally in.close()
    } catch { case NonFatal(_) => Seq.empty }
  }
}
