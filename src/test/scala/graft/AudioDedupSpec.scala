package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal.JvmAudioCodec
import graft.operators.AudioDedup

/** Audio energy-contour fingerprint invariances and totality. */
class AudioDedupSpec extends AnyFunSuite {

  private def pcmOf(samples: Array[Short]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      out(2 * i) = (samples(i) & 0xff).toByte
      out(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    out
  }

  test("fingerprint survives amplitude scaling (contour, not level)") {
    val rnd = new scala.util.Random(3)
    val s = Array.fill[Short](256)((rnd.nextInt(4000) + 100).toShort)
    val scaled = s.map(v => (v * 3).toShort)
    assert(AudioDedup.fingerprint(pcmOf(s)) === AudioDedup.fingerprint(pcmOf(scaled)))
    assert(AudioDedup.fingerprint(pcmOf(s)).exists(_ != 0L))
  }

  test("round-trips through the real WAV encode/decode unchanged") {
    val rnd = new scala.util.Random(11)
    val s = Array.fill[Short](320)((rnd.nextInt(8000) - 4000).toShort)
    val wav = JvmAudioCodec.encodeWavS16Mono(s, 8000)
    val (_, pcm) = JvmAudioCodec.decode(wav).get
    assert(AudioDedup.fingerprint(pcm) === AudioDedup.fingerprint(pcmOf(s)))
  }

  test("short and undecodable clips are total — and short clips emit NO signature") {
    val spark = SparkTest.spark
    import spark.implicits._
    // no 0L sentinel: a <64-sample clip has no fingerprint at all, so
    // short clips can never collapse into one false Hamming-0 family
    assert(AudioDedup.fingerprint(pcmOf(Array.fill[Short](10)(5))) === None)
    val good = JvmAudioCodec.encodeWavS16Mono(Array.fill[Short](128)(100), 8000)
    val short1 = JvmAudioCodec.encodeWavS16Mono(Array.fill[Short](10)(5), 8000)
    val short2 = JvmAudioCodec.encodeWavS16Mono(Array.fill[Short](40)(-7), 8000)
    val media = Seq(
      (1L, Option(good)),
      (2L, Option(Array[Byte](9, 9, 9))),
      (3L, None: Option[Array[Byte]]),
      (4L, Option(short1)),
      (5L, Option(short2))).toDF("clip_id", "wav")
    val sigs = AudioDedup.signatures(media, "clip_id", "wav").collect()
    assert(sigs.map(_.getLong(0)).toSeq === Seq(1L))
    // hence audio_neardup over a corpus of short clips reports no pairs
    val pairs = graft.operators.ImageDedup.nearPairs(
      AudioDedup.signatures(media.filter($"clip_id" >= 4L), "clip_id", "wav"), 3)
    assert(pairs.count() === 0L)
  }
}
