package graft.ops

import graft.SparkSuite

class PerceptualHashSpec extends SparkSuite {

  private def corpus(n: Int) =
    PerceptualHash.syntheticImageCorpus(spark, n)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("brightness shift: different bytes, identical aHash") {
    val c = corpus(100)
    (0 until 25).foreach { s =>
      val (base, bright) = (c(4L * s), c(4L * s + 1))
      assert(!java.util.Arrays.equals(base, bright))
      assert(PerceptualHash.aHash64(base).get ===
        PerceptualHash.aHash64(bright).get, s"scene $s")
    }
  }

  test("one-block patch: hamming <= 1 from base") {
    val c = corpus(100)
    (0 until 25).foreach { s =>
      val d = hamming(PerceptualHash.aHash64(c(4L * s)).get,
        PerceptualHash.aHash64(c(4L * s + 2)).get)
      assert(d <= 1, s"scene $s: hamming $d")
    }
  }

  test("unrelated raster: hamming far above the near-dup threshold") {
    val c = corpus(100)
    (0 until 25).foreach { s =>
      val d = hamming(PerceptualHash.aHash64(c(4L * s)).get,
        PerceptualHash.aHash64(c(4L * s + 3)).get)
      assert(d > 2, s"scene $s: hamming $d")
    }
  }

  test("JVM hash == the oracle's integer formula (val*64 > total)") {
    (0 until 10).foreach { s =>
      val hex = Multimodal.sha256Hex(s.toString)
      val vals = hex.map(_.toInt)
      val total = vals.map(_.toLong).sum
      var expect = 0L
      vals.zipWithIndex.foreach { case (v, b) =>
        if (v * 64L > total) expect |= 1L << b
      }
      val c = corpus(4 * s + 1)
      assert(PerceptualHash.aHash64(c(4L * s)).get === expect,
        s"scene $s")
    }
  }

  test("P6 and PNG encodings of the same raster hash identically") {
    // paint scene 3's block pattern into a BufferedImage and encode
    // as PNG: the hash must not depend on the container
    val hex = Multimodal.sha256Hex("3")
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val g = hex.charAt(8 * (y / 4) + (x / 4)).toInt
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val p6 = corpus(13)(12L) // scene 3, v=0
    assert(PerceptualHash.aHash64(out.toByteArray).get ===
      PerceptualHash.aHash64(p6).get)
  }

  test("non-8-divisible dims: floor-boundary grid still covers exactly") {
    // 37x19 gradient PPM built by hand; hash must be defined and the
    // cross-multiplied threshold must mark the bright half
    val (w, h) = (37, 19)
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val g = if (x < w / 2) 40 else 200
      val o = 3 * (y * w + x)
      px(o) = g.toByte; px(o + 1) = g.toByte; px(o + 2) = g.toByte
    }
    val bytes = s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ px
    val hash = PerceptualHash.aHash64(bytes).get
    // right-edge cells are solidly bright -> their bits set
    assert((hash >>> 7) % 2 === 1L) // cell (7, 0)
    assert((hash >>> 63) % 2 === 1L) // cell (7, 7)
    assert((hash & 1L) === 0L) // cell (0, 0) dark
  }

  test("malformed and too-small payloads degrade to None") {
    assert(PerceptualHash.aHash64("not an image".getBytes).isEmpty)
    assert(PerceptualHash.aHash64(Array[Byte]()).isEmpty)
    val tiny = "P6\n4 4\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](48)(7)
    assert(PerceptualHash.aHash64(tiny).isEmpty) // < 8 px per side
    val truncated = "P6\n32 32\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](100)(7)
    assert(PerceptualHash.aHash64(truncated).isEmpty)
  }
}
