package graft.extra

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Hashing

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video as opaque `binary` columns + typed metadata, with decode /
  * feature-extract / frame-sample as per-partition kernels.
  *
  * The Spark-side machinery here is real and tested — schemas, binary
  * payload flow, per-partition batching, kernel signatures. The actual
  * codec work is STUBBED (this container has no image/audio libraries):
  * [[FakeCodec]] "decodes" a deterministic 16-byte header and "extracts"
  * hash-derived features. Swapping in a real codec replaces FakeCodec only;
  * no plan shape changes. (In PySpark the same stage would be
  * `mapInPandas` with an Arrow batch per codec call; the Scala equivalent
  * is the mapPartitions kernel below.)
  */
object Multimodal {

  final case class Asset(asset_id: Long, kind: String, payload: Array[Byte])
  final case class Decoded(asset_id: Long, kind: String, width: Int, height: Int,
      n_bytes: Long, valid: Boolean)
  final case class Feature(asset_id: Long, embedding: Array[Float])
  final case class Frames(asset_id: Long, n_frames: Int, frames: Array[Array[Byte]])
  final case class Resized(asset_id: Long, kind: String, width: Int, height: Int,
      out_width: Int, out_height: Int, n_bytes_out: Long, payload: Array[Byte])

  /** STUB codec — clearly fake, deterministic. Header layout it expects:
    * bytes 0-3 magic "GRFT", 4-7 width, 8-11 height (big-endian).
    */
  object FakeCodec {
    val Magic: Array[Byte] = "GRFT".getBytes("US-ASCII")

    def encodeHeader(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + body.length)
      bb.put(Magic).putInt(width).putInt(height).put(body)
      bb.array()
    }

    def decode(payload: Array[Byte]): Option[(Int, Int)] = {
      if (payload.length < 12 || !payload.take(4).sameElements(Magic)) None
      else {
        val bb = java.nio.ByteBuffer.wrap(payload, 4, 8)
        Some((bb.getInt, bb.getInt))
      }
    }

    /** ??? in spirit: a real model would run here; this emits a
      * deterministic hash-derived vector so the plumbing is testable.
      */
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val base = Hashing.xxBytes(payload, Hashing.DefaultSeed)
      Array.tabulate(dim) { i =>
        val h = Hashing.xxLong(base, i.toLong)
        (h.toDouble / Long.MaxValue).toFloat
      }
    }
  }

  /** Deterministic synthetic assets derived from the documents table (no
    * external data): payload = fake header + utf8 text bytes; kind cycles
    * image/audio. At 100 TB the payloads live in parquet binary columns
    * exactly like this, partitioned so a partition's payload sum fits the
    * executor (see `repartitionByPayload`).
    */
  def assets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      // single small parquet file = one scan partition: spread here so every
      // downstream typed kernel (decode/features/resize/frames) parallelizes
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .as[(Long, String)]
      .map { case (id, text) =>
        val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val w = 16 + (id % 64).toInt
        val h = 16 + (id % 48).toInt
        Asset(id, if (id % 2 == 0) "image" else "audio", FakeCodec.encodeHeader(w, h, body))
      }
  }

  /** Payload-size-aware repartitioning: binary columns make row count a bad
    * proxy for partition weight; target ~`bytesPerPartition` per task.
    */
  def repartitionByPayload(assets: Dataset[Asset], totalBytes: Long,
      bytesPerPartition: Long = 64L * 1024 * 1024): Dataset[Asset] = {
    val parts = math.max(1, (totalBytes / bytesPerPartition).toInt)
    assets.repartition(parts, col("asset_id"))
  }

  /** Decode kernel: one codec init per partition, streamed rows. */
  def decode(spark: SparkSession, assets: Dataset[Asset]): Dataset[Decoded] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      // real codecs are expensive to init: do it once per partition here
      it.map { a =>
        FakeCodec.decode(a.payload) match {
          case Some((w, h)) => Decoded(a.asset_id, a.kind, w, h, a.payload.length.toLong, valid = true)
          case None => Decoded(a.asset_id, a.kind, -1, -1, a.payload.length.toLong, valid = false)
        }
      }
    }
  }

  /** Feature extraction: batches rows per partition so a real model would
    * see fixed-size batches (the Arrow/mapInPandas shape), not row-at-a-time.
    */
  def features(spark: SparkSession, assets: Dataset[Asset], dim: Int = 16,
      batchSize: Int = 64): Dataset[Feature] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real extractor would run one forward pass over `batch` here
        batch.map(a => Feature(a.asset_id, FakeCodec.features(a.payload, dim)))
      }
    }
  }

  /** Aspect-preserving box-fit resize in PURE INTEGER math (no float scale
    * factor, so the output dims are exactly reproducible by any engine:
    * binding dimension by cross-multiplication, floor division for the
    * other). The pixel resample itself is the documented codec stub — the
    * emitted payload is the fake re-encode (new header + body truncated or
    * zero-padded to out_w·out_h bytes), so the binary flow downstream of a
    * real resampler is exercised end-to-end.
    */
  def resize(spark: SparkSession, assets: Dataset[Asset],
      maxW: Int = 32, maxH: Int = 32): Dataset[Resized] = {
    import spark.implicits._
    require(maxW > 0 && maxH > 0, "target box must be positive")
    require(maxW.toLong * maxH <= Int.MaxValue - 12,
      "target box area overflows the payload byte length")
    assets.mapPartitions { it =>
      it.map { a =>
        val (w, h) = FakeCodec.decode(a.payload).getOrElse((-1, -1))
        val (ow, oh) =
          if (w <= 0 || h <= 0) (-1, -1)
          else if (w <= maxW && h <= maxH) (w, h)
          else if (w.toLong * maxH >= h.toLong * maxW)
            (maxW, math.max(1, (h.toLong * maxW / w).toInt)) // width-binding
          else (math.max(1, (w.toLong * maxH / h).toInt), maxH) // height-binding
        val out =
          if (ow <= 0) Array.emptyByteArray
          else {
            // one bounded copy: copyOfRange truncates or zero-pads past the
            // source end (payload.length >= 12 whenever decode succeeded)
            val body = java.util.Arrays.copyOfRange(a.payload, 12, 12 + ow * oh)
            FakeCodec.encodeHeader(ow, oh, body)
          }
        Resized(a.asset_id, a.kind, w, h, ow, oh, out.length.toLong, out)
      }
    }
  }

  /** Frame sampling for audio/video payloads: strided fixed-length windows
    * over the body (skipping the header).
    */
  def frameSample(spark: SparkSession, assets: Dataset[Asset],
      frameLen: Int = 32, stride: Int = 256, maxFrames: Int = 8): Dataset[Frames] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val body = a.payload.drop(12)
        val frames = Iterator.from(0)
          .map(_ * stride)
          .takeWhile(off => off + frameLen <= body.length)
          .take(maxFrames)
          .map(off => java.util.Arrays.copyOfRange(body, off, off + frameLen))
          .toArray
        Frames(a.asset_id, frames.length, frames)
      }
    }
  }
}
