package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite


/** Pins the hand-rolled RIFF/PCM fast path BIT-IDENTICAL to the
  * `javax.sound` decode it bypasses (VERDICT r13 #3: the registry
  * lock serialized decodes under local[32]; the fix is only safe if
  * the fast path is indistinguishable from the JDK on every payload
  * it claims). Grid over the synthesizeAudio derivation space plus
  * 8-bit, odd-length, and fall-back payloads. */
class AudioRiffDecodeSpec extends AnyFunSuite {

  test("fast path equals the JDK decode bit-for-bit across the " +
    "synthetic WAV grid") {
    for {
      rate <- Seq(8000, 11000, 15000, 44100)
      ch <- Seq(1, 2)
      frames <- Seq(1, 400, 499)
      value <- Seq(0, 1, 173, 1999, -32768, 32767)
    } {
      val b = Multimodal.syntheticWav(rate, ch, frames, value.toShort)
      val fast = Multimodal.riffPcmDecode(b)
      val jdk = Multimodal.audioDecodeJdk(b)
      assert(fast.isDefined, s"fast path must claim PCM16 $rate/$ch")
      assert(fast == jdk, s"rate=$rate ch=$ch frames=$frames v=$value")
    }
  }

  test("8-bit unsigned PCM WAV decodes identically on both paths") {
    // hand-assemble: javax writes 8-bit WAV as PCM_UNSIGNED
    def wav8(samples: Array[Int], rate: Int): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(44 + samples.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(rate).putInt(rate)
        .putShort(1).putShort(8)
        .put("data".getBytes("US-ASCII")).putInt(samples.length)
      samples.foreach(s => buf.put(s.toByte))
      buf.array()
    }
    for (vals <- Seq(Array(128, 128, 128), Array(0, 255, 64, 192),
      Array(200))) {
      val b = wav8(vals, 8000)
      val fast = Multimodal.riffPcmDecode(b)
      val jdk = Multimodal.audioDecodeJdk(b)
      assert(fast.isDefined && fast == jdk, vals.mkString(","))
    }
  }

  test("non-canonical payloads fall back instead of misdecoding") {
    // float WAV (format tag 3): fast path must defer to the JDK
    val f = Multimodal.syntheticWav(8000, 1, 4, 100.toShort)
    f(20) = 3 // format tag PCM -> IEEE float
    assert(Multimodal.riffPcmDecode(f).isEmpty)
    // truncated mid-data: structural overrun defers
    val t = Multimodal.syntheticWav(8000, 1, 400, 5.toShort)
    assert(Multimodal.riffPcmDecode(t.take(100)).isEmpty)
    // non-RIFF bytes: neither path claims them
    val junk = Array.fill[Byte](64)(7)
    assert(Multimodal.riffPcmDecode(junk).isEmpty)
    assert(Multimodal.audioDecodeJdk(junk).isEmpty)
    // and the public decode still resolves float WAV via the JDK
    // (conversion path), unchanged by the fast-path addition
    assert(Multimodal.audioDecode(f) == Multimodal.audioDecodeJdk(f))
  }
}
