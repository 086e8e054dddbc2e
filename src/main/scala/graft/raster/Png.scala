package graft.raster

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** K3: PNG tile sink codec (`terrain-proxy/server.js:272-277`,
  * `weather-proxy/server.js:294-300`) — real PNG bytes via the JDK's
  * ImageIO, no external dependency. Used from `Dataset[Tile].map(encode)`
  * ahead of a binary sink.
  */
object Png {

  /** RGBA tile → PNG bytes. */
  def encode(t: Tile): Array[Byte] = {
    val img = new BufferedImage(t.width, t.height, BufferedImage.TYPE_INT_ARGB)
    var y = 0
    while (y < t.height) {
      var x = 0
      while (x < t.width) {
        val i = (y * t.width + x) * 4
        val argb = ((t.pixels(i + 3) & 0xff) << 24) | ((t.pixels(i) & 0xff) << 16) |
          ((t.pixels(i + 1) & 0xff) << 8) | (t.pixels(i + 2) & 0xff)
        img.setRGB(x, y, argb)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** PNG bytes → RGBA tile (for sink round-trip checks / S12-style tile
    * reads).
    */
  def decode(z: Int, x: Int, y: Int, bytes: Array[Byte]): Tile = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val px = new Array[Byte](img.getWidth * img.getHeight * 4)
    var yy = 0
    while (yy < img.getHeight) {
      var xx = 0
      while (xx < img.getWidth) {
        val argb = img.getRGB(xx, yy)
        val i = (yy * img.getWidth + xx) * 4
        px(i) = ((argb >> 16) & 0xff).toByte
        px(i + 1) = ((argb >> 8) & 0xff).toByte
        px(i + 2) = (argb & 0xff).toByte
        px(i + 3) = ((argb >> 24) & 0xff).toByte
        xx += 1
      }
      yy += 1
    }
    Tile(z, x, y, img.getWidth, img.getHeight, px)
  }
}
