package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: images/audio/video as opaque `binary`
  * columns with typed metadata, batch decode / feature-extract /
  * resize / frame-sample plumbing.
  *
  * The container has no image/audio codecs, so `decodeHeader` parses a
  * deterministic GRFT container format (our stand-in for JPEG/WAV
  * headers) and the pixel-level ops are STUBS with real Spark plumbing:
  * correct schemas, per-partition batching, bounded memory. Swapping in
  * a real codec is a one-function change inside `mapPartitions`; the
  * distributed topology (narrow decode → columnar metadata → keyed
  * shuffles only after size reduction) is what matters at 100 TB, where
  * you decode close to the data and never shuffle raw bytes.
  *
  * Mirrors the reference's binary-attribute usage: MNIST 28×28 images
  * packed into a `binary` attribute (`py_pkg/examples/4-machine-learning.py:49-109`).
  */
object Multimodal {

  /** GRFT header: magic "GRFT", u16 width, u16 height, u8 channels,
    * u8 kind (0=image, 1=audio, 2=video), u32 payload length.
    */
  val HeaderLen = 14

  def pack(width: Int, height: Int, channels: Int, kind: Int,
           payload: Array[Byte]): Array[Byte] = {
    require(width >= 0 && width <= 0xffff && height >= 0 && height <= 0xffff,
      s"width/height must fit u16, got ${width}x$height")
    require(channels >= 0 && channels <= 0xff && kind >= 0 && kind <= 0xff,
      s"channels/kind must fit u8, got channels=$channels kind=$kind")
    val b = ByteBuffer.allocate(HeaderLen + payload.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put("GRFT".getBytes("ASCII"))
    b.putShort(width.toShort).putShort(height.toShort)
    b.put(channels.toByte).put(kind.toByte)
    b.putInt(payload.length)
    b.put(payload)
    b.array()
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("channels", IntegerType), StructField("kind", IntegerType),
    StructField("payload_len", IntegerType), StructField("valid", BooleanType)))

  private def parseHeader(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.length < HeaderLen ||
      !(bytes(0) == 'G' && bytes(1) == 'R' && bytes(2) == 'F' && bytes(3) == 'T'))
      return Row(null, null, null, null, null, false)
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    b.position(4)
    val w = b.getShort & 0xffff
    val h = b.getShort & 0xffff
    val c = b.get() & 0xff
    val k = b.get() & 0xff
    val len = b.getInt
    Row(w, h, c, k, len, len == bytes.length - HeaderLen)
  }

  /** Decode the typed metadata of a binary media column into a struct
    * column (schema-declared, per-partition batch parse — the Scala
    * analog of a `mapInPandas` batch decode).
    */
  def decodeHeader(df: DataFrame, binCol: String, out: String = "meta"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(out, metaSchema))
    val idx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map(r => Row.fromSeq(r.toSeq :+ parseHeader(r.getAs[Array[Byte]](idx))))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** STUB pixel decode: summarise the payload instead of rasterising it
    * (deterministic fake for the missing codec). Real implementation
    * would decompress here; everything around it — batching, schema,
    * partition locality — is production-shaped.
    */
  def extractFeatures(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("payload_bytes", LongType),
      StructField("payload_checksum", LongType),
      StructField("mean_byte", DoubleType)))
    val idx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        // invalid containers get null stats, matching decodeHeader's
        // valid=false (garbage blobs must not pollute feature stats)
        val meta = parseHeader(bytes)
        if (meta.isNullAt(0) || !meta.getBoolean(5))
          Row.fromSeq(r.toSeq ++ Seq[Any](null, null, null))
        else {
          // index into the array directly: no per-row payload copy
          var sum = 0L
          var i = HeaderLen
          while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
          val n = bytes.length - HeaderLen
          val mean = if (n == 0) 0.0 else sum.toDouble / n
          Row.fromSeq(r.toSeq ++ Seq[Any](n.toLong, sum, mean))
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** STUB resize: nearest-neighbour downsample of the fake raster
    * (payload treated as row-major width×height×channels bytes, the
    * GRFT stand-in for decoded pixels). Output is a well-formed GRFT
    * container with the new dimensions, so resized media flows through
    * the same decode/feature plumbing. A real implementation swaps the
    * per-row sampling loop for a codec call; the narrow per-partition
    * topology (resize close to the data, shuffle only shrunken bytes)
    * is the part that matters at 100 TB.
    */
  def resize(df: DataFrame, binCol: String, outWidth: Int, outHeight: Int,
             out: String = "resized"): DataFrame = {
    require(outWidth > 0 && outHeight > 0)
    val schema = StructType(df.schema.fields :+ StructField(out, BinaryType))
    val idx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val meta = parseHeader(bytes)
        val resized: Array[Byte] =
          if (meta.isNullAt(0) || !meta.getBoolean(5)) null
          else {
            val (w, h, c) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
            // a header whose dims exceed the actual payload (e.g. a
            // well-formed container packed with arbitrary dims) is
            // invalid raster data, not a crash: yield null like other
            // invalid containers
            if (w == 0 || h == 0 || bytes.length - HeaderLen < w.toLong * h * c) null
            else {
              val payload = bytes.drop(HeaderLen)
              val outBytes = new Array[Byte](outWidth * outHeight * c)
              var y = 0
              while (y < outHeight) {
                val sy = y * h / outHeight
                var x = 0
                while (x < outWidth) {
                  val sx = x * w / outWidth
                  var ch = 0
                  while (ch < c) {
                    outBytes((y * outWidth + x) * c + ch) = payload((sy * w + sx) * c + ch)
                    ch += 1
                  }
                  x += 1
                }
                y += 1
              }
              pack(outWidth, outHeight, c, meta.getInt(3), outBytes)
            }
          }
        Row.fromSeq(r.toSeq :+ resized)
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Frame sampling for video-kind payloads: every k-th `frameSize`
    * slice of the payload becomes one output row (explode-style,
    * bounded by stride — at scale this is where you cut 100 TB of video
    * to the frames you actually train on, before any shuffle).
    */
  def sampleFrames(df: DataFrame, binCol: String, frameSize: Int,
                   stride: Int): DataFrame = {
    require(frameSize > 0 && stride > 0)
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_no", IntegerType),
      StructField("frame", BinaryType)))
    val idx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val payload = if (bytes != null && bytes.length > HeaderLen)
          bytes.drop(HeaderLen) else Array.emptyByteArray
        val nFrames = payload.length / frameSize
        (0 until nFrames by stride).map { f =>
          Row.fromSeq(r.toSeq ++ Seq[Any](f,
            payload.slice(f * frameSize, (f + 1) * frameSize)))
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
