package graft.ops

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Real-decoder specs for the multimodal operators (VERDICT r01 task 9):
  * the image path decodes actual PNG pixels (committed fixture), the
  * audio path parses actual PCM WAV samples; only video remains a
  * documented stub.
  */
class MultimodalSpec extends AnyFunSuite {

  test("PNG decode: committed tiny.png yields the frozen pixel histogram") {
    val bytes = Files.readAllBytes(
      Paths.get("src/test/resources/multimodal/tiny.png"))
    val feat = Multimodal.decodeImageFeatures(bytes).get
    val expected = Seq(0.0, 0.020833333333333332, 0.041666666666666664,
      0.0625, 0.0625, 0.08333333333333333, 0.10416666666666667,
      0.041666666666666664, 0.14583333333333334, 0.041666666666666664,
      0.10416666666666667, 0.22916666666666666, 0.020833333333333332,
      0.041666666666666664, 0.0, 0.0)
    assert(feat.length == Multimodal.FeatDim)
    feat.zip(expected).foreach { case (a, e) =>
      assert(math.abs(a - e) < 1e-12, s"histogram mismatch: $a vs $e")
    }
    // the committed fixture IS synthPng(7, 8, 6): synthesis is stable
    assert(Multimodal.synthPng(7, 8, 6).sameElements(bytes))
  }

  test("PNG decode: features come from pixels, not payload bytes") {
    val png = Multimodal.synthPng(42, 16, 16)
    val real = Multimodal.decodeImageFeatures(png).get
    val stub = Multimodal.stubDecode(png)
    assert(!real.sameElements(stub))
    assert(math.abs(real.sum - 1.0) < 1e-9) // histogram over all pixels
    // non-image payloads are rejected, not mis-decoded
    assert(Multimodal.decodeImageFeatures("not a png".getBytes).isEmpty)
  }

  test("WAV decode: parses RIFF PCM samples into a normalized histogram") {
    val wav = Multimodal.synthWav(5)
    val feat = Multimodal.decodeWavFeatures(wav).get
    assert(feat.length == Multimodal.FeatDim)
    assert(math.abs(feat.sum - 1.0) < 1e-9)
    // a 20000-amplitude tone never reaches the extreme bins
    assert(feat(0) == 0.0 && feat(15) == 0.0)
    // mid bins carry the mass
    assert(feat.slice(4, 12).sum > 0.9)
    // deterministic; garbage rejected
    assert(Multimodal.decodeWavFeatures(Multimodal.synthWav(5)).get
      .sameElements(feat))
    assert(Multimodal.decodeWavFeatures(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("decode router: image→pixels, audio→samples, video→stub fallback") {
    val png = Multimodal.synthPng(9, 8, 8)
    assert(Multimodal.decode("image/png", png)
      .sameElements(Multimodal.decodeImageFeatures(png).get))
    val wav = Multimodal.synthWav(9)
    assert(Multimodal.decode("audio/wav", wav)
      .sameElements(Multimodal.decodeWavFeatures(wav).get))
    val blob = "opaque video bytes".getBytes
    assert(Multimodal.decode("video/mp4", blob)
      .sameElements(Multimodal.stubDecode(blob)))
    // declared image that fails to decode falls back to the stub
    assert(Multimodal.decode("image/png", blob)
      .sameElements(Multimodal.stubDecode(blob)))
  }
}
