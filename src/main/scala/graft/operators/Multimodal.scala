package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for training-data pipelines.
  *
  * Design: media payloads are opaque `binary` columns with a typed
  * metadata struct alongside — the table layout a 100 TB multimodal
  * corpus uses (payload bytes never parsed by Catalyst; metadata
  * prunable/filterable without touching payloads). Decode /
  * feature-extract run batch-wise per partition (`mapPartitions`) so
  * a real codec would amortize its init across a partition's rows —
  * the same batch shape `mapInPandas` gives Python pipelines.
  *
  * The image/audio codecs themselves are NOT in this container, so
  * `decodeStub` parses this module's deterministic demo header
  * instead of calling a codec — clearly marked; the Spark-side
  * plumbing (schema, partition-wise batching, metadata flow, frame
  * explosion) is real and oracle-/spec-tested. Byte-level feature
  * extraction (histogram, entropy) is fully real.
  */
object Multimodal {

  /** Typed metadata carried next to the payload, never inside it. */
  final case class MediaMeta(
      mime: String, width: Int, height: Int,
      sampleRate: Int, durationMs: Long)

  final case class MediaAsset(
      asset_id: Long, kind: String, payload: Array[Byte],
      meta: MediaMeta)

  final case class ImageFeatures(
      asset_id: Long, width: Int, height: Int, channels: Int,
      bytes: Int, entropy: Double)

  /** Demo header: "GRF0" + kind byte + width + height (big-endian
    * ints) — what [[decodeStub]] parses in place of a codec.
    */
  def packHeader(kind: Byte, width: Int, height: Int,
                 body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(13 + body.length)
    bb.put("GRF0".getBytes("US-ASCII")).put(kind)
      .putInt(width).putInt(height).put(body)
    bb.array()
  }

  /** Build a deterministic demo media table from any (id, text) frame:
    * payload = demo header + UTF-8 bytes, metadata derived from the
    * content hash. Pure Catalyst column work except the header pack.
    */
  def demoAssets(docs: DataFrame, idCol: String,
                 textCol: String): Dataset[MediaAsset] = {
    val spark = docs.sparkSession
    implicit val enc = Encoders.product[MediaAsset]
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .map { case (id, text) =>
        val body = text.getBytes("UTF-8")
        // deterministic "dimensions" from content, so decode is testable
        val w = 16 + (body.length % 64)
        val h = 16 + ((body.length / 3) % 64)
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaAsset(id, kind, packHeader(kind.head.toByte, w, h, body),
          MediaMeta(s"demo/$kind", w, h,
            if (kind == "audio") 16000 else 0,
            if (kind == "video") body.length.toLong * 10 else 0L))
      }
  }

  /** STUB — decode step. A real deployment replaces the header parse
    * below with a codec call (e.g. javax.imageio / ffmpeg bindings);
    * everything around it — partition-wise batching, schema, the
    * entropy/byte-feature math — is production plumbing. Runs
    * per-partition so codec init would be amortized.
    */
  def decodeStub(assets: Dataset[MediaAsset]): Dataset[ImageFeatures] = {
    implicit val enc = Encoders.product[ImageFeatures]
    assets.mapPartitions { it =>
      // per-partition scratch buffer — the "codec context"
      val hist = new Array[Long](256)
      it.map { a =>
        val bb = java.nio.ByteBuffer.wrap(a.payload)
        val magic = new Array[Byte](4); bb.get(magic)
        require(new String(magic, "US-ASCII") == "GRF0",
          s"bad header for asset ${a.asset_id}") // ??? real codec here
        bb.get() // kind byte
        val w = bb.getInt; val h = bb.getInt
        java.util.Arrays.fill(hist, 0L)
        var n = 0
        while (bb.hasRemaining) { hist(bb.get() & 0xff) += 1; n += 1 }
        var entropy = 0.0
        var i = 0
        while (i < 256) {
          if (hist(i) > 0) {
            val p = hist(i).toDouble / n
            entropy -= p * (math.log(p) / math.log(2))
          }
          i += 1
        }
        ImageFeatures(a.asset_id, w, h, channels = 3,
          bytes = a.payload.length, entropy = entropy)
      }
    }
  }

  /** STUB — resize: a real implementation re-encodes the payload; the
    * stub rewrites the metadata struct (the part Catalyst sees) and
    * passes the payload through untouched.
    */
  def resizeStub(assets: Dataset[MediaAsset], w: Int,
                 h: Int): Dataset[MediaAsset] = {
    implicit val enc = Encoders.product[MediaAsset]
    assets.map(a => a.copy(meta = a.meta.copy(width = w, height = h)))
  }

  /** Frame sampling for video assets: one row per sampled timestamp —
    * pure Catalyst (`sequence` + `explode`), no payload decode; the
    * per-frame decode would hang off [[decodeStub]]'s batch shape.
    */
  def frameSample(assets: DataFrame, everyMs: Long): DataFrame =
    assets.filter(col("kind") === "video")
      .filter(col("meta.durationMs") >= 0)
      .select(col("asset_id"), col("meta.durationMs").as("dur"),
        explode(sequence(lit(0L), col("meta.durationMs"),
          lit(everyMs))).as("ts_ms"))
      .withColumn("frame_idx",
        (col("ts_ms") / everyMs).cast("int"))
      .select(col("asset_id"), col("frame_idx"), col("ts_ms"))
}
