package graft

import graft.ops.Multimodal
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the pure-JVM container parsers: total on
  * arbitrary bytes (never throw — corrupted payloads are routine at
  * corpus scale) and exact on synthesized containers. */
object MultimodalProps extends Properties("Multimodal") {

  private val junk: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))

  // RIFF-prefixed junk probes the chunk-walk paths specifically
  private val riffJunk: Gen[Array[Byte]] =
    junk.map(b => "RIFF".getBytes("US-ASCII") ++ b)

  property("parseWav/parseBmp/parseAvi/parseGif are total on arbitrary bytes") =
    Prop.forAll(junk) { b =>
      Multimodal.parseWav(b); Multimodal.parseBmp(b); Multimodal.parseAvi(b)
      Multimodal.parseGif(b)
      true
    }

  // GIF-prefixed junk probes the block-walk paths specifically
  property("parseGif is total on GIF-signature-prefixed junk") =
    Prop.forAll(junk) { b =>
      Multimodal.parseGif("GIF89a".getBytes("US-ASCII") ++ b)
      Multimodal.parseGif("GIF87a".getBytes("US-ASCII") ++ b)
      true
    }

  property("GIF round-trip for arbitrary frames/dimensions") =
    Prop.forAll(Gen.choose(1, 65535), Gen.choose(1, 65535), Gen.choose(1, 20)) {
      (w, h, frames) =>
        Multimodal.parseGif(Multimodal.gifBytes(w, h, frames))
          .contains((frames, w, h))
    }

  property("parsers are total on RIFF-prefixed junk") =
    Prop.forAll(riffJunk) { b =>
      Multimodal.parseWav(b); Multimodal.parseAvi(b)
      true
    }

  property("WAV round-trip for arbitrary rate/channels/samples") =
    Prop.forAll(Gen.choose(1, 192000), Gen.choose(1, 8),
      Gen.containerOf[Array, Short](Gen.choose(Short.MinValue, Short.MaxValue))) {
      (rate, ch, samples) =>
        val w = Multimodal.parseWav(Multimodal.wavBytes(rate, ch, samples)).get
        w.sampleRate == rate && w.numChannels == ch &&
          w.nFrames == samples.length / ch &&
          w.peak == (if (samples.isEmpty) 0
                     else samples.map(s => math.abs(s.toInt)).max)
    }

  property("BMP round-trip for arbitrary dimensions") =
    Prop.forAll(Gen.choose(1, 512), Gen.choose(1, 512), Gen.choose(Byte.MinValue, Byte.MaxValue)) {
      (w, h, px) =>
        Multimodal.parseBmp(Multimodal.bmpBytes(w, h, px)).get == ((w, h, 24))
    }

  property("AVI round-trip for arbitrary frames/dimensions") =
    Prop.forAll(Gen.choose(1, 1000000), Gen.choose(1, 8192), Gen.choose(1, 8192)) {
      (f, w, h) =>
        Multimodal.parseAvi(Multimodal.aviBytes(f, w, h)).get == ((f, w, h))
    }
}
