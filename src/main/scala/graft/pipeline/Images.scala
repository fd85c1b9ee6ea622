package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Real image codec operations on the JDK's built-in PNG support
  * (javax.imageio, headless-safe): the executor-side kernels behind the
  * multimodal pipeline ops. No Spark here — these run inside
  * `mapPartitions`, one codec warm-up per partition. */
object Images {

  /** Deterministic synthetic RGB image: pixel values are a pure function of
    * (seed, x, y), so every test/oracle can regenerate the exact bytes. */
  def synthPng(seed: Long, width: Int, height: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    // fill the backing raster directly: per-pixel setRGB goes through the
    // ColorModel on every call and dominates synthesis time
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = ((seed * 31 + x) & 0xff).toInt
        val g = ((x ^ y) & 0xff)
        val b = ((seed + y) & 0xff).toInt
        px(y * width + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, width, height, px, 0, width)
    toPng(img)
  }

  /** Constant-color image — the fixture for exact-brightness assertions. */
  def constPng(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    toPng(img)
  }

  def toPng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, "png", out), "no PNG writer available")
    out.toByteArray
  }

  def fromPng(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    img
  }

  /** (width, height, meanBrightness∈[0,1]) decoded from real pixels.
    * Brightness = mean of (r+g+b)/3 over all pixels, normalized by 255. */
  def decodeStats(bytes: Array[Byte]): (Int, Int, Double) = {
    val img = fromPng(bytes)
    val (w, h) = (img.getWidth, img.getHeight)
    // one bulk getRGB: the per-pixel accessor re-runs ColorModel
    // conversion per call and is ~10× slower over a whole frame
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var sum = 0L
    var i = 0
    while (i < px.length) {
      val rgb = px(i)
      sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
      i += 1
    }
    (w, h, sum.toDouble / (3.0 * 255.0 * w * h))
  }

  /** Real resample to (outW, outH) via Graphics2D bilinear scaling. */
  def resizePng(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    val src = fromPng(bytes)
    val dst = new BufferedImage(outW, outH, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, outW, outH, null)
    } finally g.dispose()
    toPng(dst)
  }
}
