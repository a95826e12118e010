package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.ImageHeader

/** Golden tests for the real byte-level header parser (ref
  * `imgio/imgio.py:42-111`) — hand-assembled containers independent of the
  * [[ImageHeader.synthesize]] builder, so parser and builder cannot agree by
  * sharing a bug. */
class ImageHeaderSpec extends AnyFunSuite {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("PNG IHDR big-endian dimensions") {
    // signature + IHDR(len 13) + width 0x0102 (258) + height 0x0300 (768)
    val png = b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x01, 0x02, 0, 0, 0x03, 0x00,
      8, 6, 0, 0, 0)
    assert(ImageHeader.parse(png) === Some(("PNG", 258, 768)))
  }

  test("GIF87a and GIF89a little-endian screen descriptor") {
    // width 320 = 0x0140 → bytes 40 01; height 200 = 0x00C8 → C8 00
    val gif87 = b('G', 'I', 'F', '8', '7', 'a', 0x40, 0x01, 0xc8, 0x00, 0, 0, 0)
    val gif89 = b('G', 'I', 'F', '8', '9', 'a', 0x40, 0x01, 0xc8, 0x00, 0, 0, 0)
    assert(ImageHeader.parse(gif87) === Some(("GIF", 320, 200)))
    assert(ImageHeader.parse(gif89) === Some(("GIF", 320, 200)))
  }

  test("JPEG walks APP0 + COM segments and fill bytes to a progressive SOF2") {
    val jpeg = b(0xff, 0xd8) ++ // SOI
      b(0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0) ++ // APP0
      b(0xff, 0xfe, 0x00, 0x04, 'h', 'i') ++ // COM, len 4
      b(0xff, 0xff, 0xff) ++ // legal fill bytes before the next marker
      b(0xc2, 0x00, 0x0b, 8, 0x01, 0xe0, 0x02, 0x80, 1, 0x11, 0, 0) // SOF2 480×640
    assert(ImageHeader.parse(jpeg) === Some(("JPEG", 640, 480)))
  }

  test("JPEG DHT (C4) is not mistaken for a frame header") {
    val jpeg = b(0xff, 0xd8) ++
      b(0xff, 0xc4, 0x00, 0x05, 0, 1, 2) ++ // DHT — must be skipped
      b(0xff, 0xc0, 0x00, 0x0b, 8, 0x00, 0x64, 0x00, 0xc8, 1, 0x11, 0) // SOF0 200×100
    assert(ImageHeader.parse(jpeg) === Some(("JPEG", 200, 100)))
  }

  test("non-images and truncated containers return None") {
    assert(ImageHeader.parse("plain text payload".getBytes("UTF-8")).isEmpty)
    assert(ImageHeader.parse(Array.emptyByteArray).isEmpty)
    assert(ImageHeader.parse(b(0x89, 'P', 'N', 'G')).isEmpty) // truncated PNG
    assert(ImageHeader.parse(b(0xff, 0xd8, 0xff, 0xda, 0, 2)).isEmpty) // scan before SOF
    // EOI before any SOF
    assert(ImageHeader.parse(b(0xff, 0xd8, 0xff, 0xd9)).isEmpty)
  }

  test("synthesize round-trips through parse at boundary dimensions") {
    for {
      fmt <- Seq("PNG", "GIF", "JPEG")
      (w, h) <- Seq((1, 1), (1000, 800), (65535, 1), (640, 480))
    } assert(ImageHeader.parse(ImageHeader.synthesize(fmt, w, h)) === Some((fmt, w, h)),
      s"$fmt $w x $h")
  }
}
