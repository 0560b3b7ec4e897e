package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed view of a multimodal row: an opaque binary payload plus metadata
  * — the shape an image/audio/video column takes in a training-data
  * pipeline (payload bytes stay opaque to Catalyst; metadata is typed). */
case class MultimodalRow(doc_id: Long, payload: Array[Byte], mime: String)

/** Features a decoder emits per payload. */
case class DecodedFeatures(doc_id: Long, n_bytes: Long, head_byte: Int,
                           byte_sum: Long)

/** One sampled "frame" of a payload (video frame-sampling analog).
  * `frame` is the frame's raw content — the bytes a real decoder hands
  * downstream (per-frame hashing, feature extraction); `frame_sum` is
  * the legacy stub feature kept for the decode-plumbing spec. */
case class SampledFrame(doc_id: Long, frame_idx: Int, offset: Long,
                        frame_sum: Long, frame: Array[Byte])

/** Partition-batched decode plumbing for opaque binary columns — the
  * Scala analog of a Pandas-UDF `mapInPandas` decode stage: rows stream
  * through per-partition (so a real decoder amortizes model/codec init
  * once per partition, not per row), emit typed features, and nothing
  * ever collects to the driver.
  *
  * The decode itself is a STUB (this container has no image/audio codecs):
  * a deterministic fake that hashes bytes instead of decoding them. The
  * Spark-side contract — schema, encoder, partition iteration, init-once
  * hook — is the real, tested part; swap `decodeOne` for libjpeg/ffmpeg
  * bindings on a real cluster.
  */
object Multimodal {

  /** Stand-in for a codec: deterministic features from raw bytes. */
  private def decodeOne(r: MultimodalRow): DecodedFeatures = {
    var sum = 0L
    var i = 0
    while (i < r.payload.length) { sum += r.payload(i) & 0xff; i += 1 }
    DecodedFeatures(r.doc_id, r.payload.length.toLong,
      if (r.payload.isEmpty) -1 else r.payload(0) & 0xff, sum)
  }

  /** mapPartitions decode: one "codec init" per partition, then a pure
    * streaming transform of the iterator. */
  def decode(rows: Dataset[MultimodalRow]): Dataset[DecodedFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // real decoders initialize the codec/model HERE, once per partition
      it.map(decodeOne)
    }
  }

  /** Frame-sampling plumbing (video analog): emit every `stride`-th
    * fixed-size window of the payload as one "frame" row — a 1→N
    * flatMap inside mapPartitions, so a 100-GB video column fans out to
    * frame rows WITHOUT driver involvement and a real frame decoder
    * (ffmpeg seek + decode) slots into the same iterator. Each frame
    * carries its raw content bytes (the payload window — a real decoder
    * emits decoded pixels here) for downstream per-frame operators
    * ([[PHash]] consumes them in q_dedup_frames), plus the stubbed
    * byte-sum feature. Only FULL windows are emitted (a trailing
    * partial window is dropped, as a frame decoder drops a truncated
    * last frame). */
  def sampleFrames(rows: Dataset[MultimodalRow], frameBytes: Int = 16,
                   stride: Int = 4): Dataset[SampledFrame] = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be > 0")
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.flatMap { r =>
        val nFrames = r.payload.length / frameBytes
        (0 until nFrames by stride).iterator.map { f =>
          val off = f.toLong * frameBytes
          var sum = 0L
          var i = off.toInt
          while (i < off + frameBytes) { sum += r.payload(i) & 0xff; i += 1 }
          SampledFrame(r.doc_id, f, off, sum,
            java.util.Arrays.copyOfRange(
              r.payload, off.toInt, off.toInt + frameBytes))
        }
      }
    }
  }

  /** documents → MultimodalRow dataset (payload = utf-8 text bytes). */
  def fromDocuments(docs: DataFrame): Dataset[MultimodalRow] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
                lit("text/plain").as("mime"))
      .as[MultimodalRow]
  }
}
