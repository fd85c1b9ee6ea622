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

  /** Banded sinusoid image: per-channel spatial frequencies derive from
    * the seed, so different seeds give perceptually DISTINCT images
    * (different low-frequency DCT content) while resize/brightness edits
    * of one seed stay perceptually close — the fixture family for
    * perceptual-hash tests and the `mm_phash` corpus. */
  def wavePng(seed: Long, width: Int, height: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](width * height)
    val fxr = 1 + (seed % 5).toInt;       val fyr = 1 + ((seed / 5) % 4).toInt
    val fxg = 1 + ((seed / 20) % 5).toInt; val fyg = 1 + ((seed / 100) % 4).toInt
    val phase = (seed % 7).toDouble / 7.0
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        def band(fx: Int, fy: Int, p: Double): Int =
          (127.5 + 127.5 * math.sin(2 * math.Pi *
            (fx * x.toDouble / width + fy * y.toDouble / height + p))).toInt
        val r = band(fxr, fyr, phase)
        val g = band(fxg, fyg, phase + 0.25)
        val b = band(fxr + fxg, 1, phase + 0.5)
        px(y * width + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, width, height, px, 0, width)
    toPng(img)
  }

  /** Re-encode with every channel shifted by `delta` (clamped) — the
    * brightness-edit near-duplicate fixture. */
  def brightenPng(bytes: Array[Byte], delta: Int): Array[Byte] = {
    val img = fromPng(bytes)
    val (w, h) = (img.getWidth, img.getHeight)
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var i = 0
    while (i < px.length) {
      val rgb = px(i)
      def c(v: Int) = math.max(0, math.min(255, v + delta))
      px(i) = (c((rgb >> 16) & 0xff) << 16) | (c((rgb >> 8) & 0xff) << 8) |
        c(rgb & 0xff)
      i += 1
    }
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    out.setRGB(0, 0, w, h, px, 0, w)
    toPng(out)
  }

  /** Area-averaged grayscale downscale to (tw × th): every source pixel
    * contributes with its exact overlap weight. Bilinear here would
    * sample only a 2×2 neighborhood per target cell — at >2× reduction
    * that aliases, and a prior resize of the image shifts which pixels
    * get sampled, exploding the Hamming distance between an image and
    * its own rescale. Area averaging commutes (approximately) with any
    * mean-preserving resample — the invariance the hash rests on. */
  private def grayGrid(img: BufferedImage, tw: Int, th: Int): Array[Double] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val gray = new Array[Double](tw * th)
    var ty = 0
    while (ty < th) {
      val sy0 = ty * h / th.toDouble
      val sy1 = (ty + 1) * h / th.toDouble
      var tx = 0
      while (tx < tw) {
        val sx0 = tx * w / tw.toDouble
        val sx1 = (tx + 1) * w / tw.toDouble
        var acc = 0.0; var area = 0.0
        var y = sy0.toInt
        while (y < sy1 && y < h) {
          val wy = math.min(sy1, y + 1.0) - math.max(sy0, y.toDouble)
          var x = sx0.toInt
          while (x < sx1 && x < w) {
            val wx = math.min(sx1, x + 1.0) - math.max(sx0, x.toDouble)
            val rgb = px(y * w + x)
            acc += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
              (rgb & 0xff)) / 3.0 * wx * wy
            area += wx * wy
            x += 1
          }
          y += 1
        }
        gray(ty * tw + tx) = acc / area
        tx += 1
      }
      ty += 1
    }
    gray
  }

  /** 64-bit perceptual hash — the difference-hash ("dHash") construction,
    * a public algorithm (Krawetz, hackerfactor.com "Kind of Like That",
    * 2013; same family as Zauner 2010's block hashes): grayscale
    * area-average to a 9×8 grid, bit (y,x) = cell(y,x+1) > cell(y,x).
    * Gradient SIGNS survive global brightness/contrast shifts exactly
    * (monotone pixel maps preserve order) and survive resizes because
    * area-averaged cell means do; a DCT-median variant was tried first
    * and rejected — on spectrally sparse images most of its 64
    * coefficients sit near zero, so edit noise flipped 14-20 bits.
    * Hamming distance between dHashes tracks perceptual difference. */
  def phash64(bytes: Array[Byte]): Long = {
    val g = grayGrid(fromPng(bytes), 9, 8)
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x + 1) > g(y * 9 + x)) hash |= (1L << (y * 8 + x))
        x += 1
      }
      y += 1
    }
    hash
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
