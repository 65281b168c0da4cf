package graft.tools

/** Throwaway-style micro-measurement main (test scope, never shipped):
  * per-decode latency of the three PngDecoder rungs, used to attribute
  * StreamBench media_dedup movements to decode vs everything else
  * (round 19, VERDICT r18 #5 measurement). Run:
  * `sbt "Test/runMain graft.tools.DecodeMicroBench"`. */
object DecodeMicroBench {
  def main(args: Array[String]): Unit = {
    javax.imageio.ImageIO.setUseCache(false)
    val dec = new graft.multimodal.Media.PngDecoder
    val pngs = (0L until 200L).map(graft.multimodal.Media.encodePng).toArray
    // a bigger frame class too — decode cost scales with pixels
    val big = {
      val img = new java.awt.image.BufferedImage(
        256, 256, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 256; x <- 0 until 256)
        img.getRaster.setSample(x, y, 0, (x * y * 7 + x + 3 * y) % 256)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def imageio(p: Array[Byte]): Unit =
      assert(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p)) != null)
    def time(reps: Int, n: Int)(f: Int => Unit): Double = {
      val t0 = System.nanoTime()
      var r = 0
      while (r < reps) { var i = 0; while (i < n) { f(i); i += 1 }; r += 1 }
      reps.toLong * n / ((System.nanoTime() - t0) / 1e9)
    }
    for (_ <- 0 until 3) { // 2 warmups + the reported pass
      val f8 = time(50, 200)(i => assert(dec.fastGray(pngs(i)).isDefined))
      val s8 = time(50, 200)(i => assert(dec.decode(pngs(i)).isDefined))
      val i8 = time(50, 200)(i => imageio(pngs(i)))
      val fb = time(20, 50)(_ => assert(dec.fastGray(big).isDefined))
      val ib = time(20, 50)(_ => imageio(big))
      println(f"[decode-bench] 8x8 gray: fastGray $f8%.0f/s, seam $s8%.0f/s, " +
        f"ImageIO.read $i8%.0f/s (fast = ${f8 / i8}%.1fx); " +
        f"256x256 gray: fastGray $fb%.0f/s, ImageIO.read $ib%.0f/s (fast = ${fb / ib}%.1fx)")
    }
  }
}
