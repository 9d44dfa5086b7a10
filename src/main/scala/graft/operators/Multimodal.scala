package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque
  * BinaryType columns with typed metadata, and decode/feature-extract
  * runs inside a partition kernel — the Spark shape of the reference's
  * frame/audio kernels (demoTalkNet.py:115–128, 210–246).
  *
  * The actual image/audio decode is STUBBED (`decodeStub`): codec
  * libraries are absent from this container, so a deterministic
  * byte-level "feature extractor" stands in. Everything around it —
  * schema, binary column handling, per-partition batching, kernel
  * signature — is the real thing: swap `decodeStub` for a JavaCV/ffmpeg
  * call and nothing else changes.
  *
  * Scale notes: payloads are never shuffled after the kernel (features
  * only); at 100 TB the binary column would be a path reference into
  * object storage and the kernel would fetch-range + decode per row —
  * same dataflow, same schema.
  */
object Multimodal {

  /** Extracted per-payload features (all exact integers). */
  final case class PayloadFeatures(
      doc_id: Long, n_bytes: Long, first_byte: Long, byte_sum: Long)

  /** STUB decode: deterministic byte statistics in place of a real
    * image/audio decoder. Replace with the codec call at deploy time. */
  private def decodeStub(payload: Array[Byte]): (Long, Long) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += (payload(i) & 0xff).toLong; i += 1 }
    val first = if (payload.nonEmpty) (payload(0) & 0xff).toLong else -1L
    (first, sum)
  }

  /** Partition kernel over (id, payload) rows → feature rows.
    * mapPartitions (not per-row UDF) so a real decoder can amortize
    * codec/model initialization per partition, as the reference does
    * per process (demoTalkNet.py:55–61). */
  def extractFeatures(spark: SparkSession, payloads: DataFrame): Dataset[PayloadFeatures] = {
    import spark.implicits._
    payloads.select(col("id").cast("long"), col("payload").cast("binary"))
      // decode is CPU-bound: parallelism follows cores, not file count
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init would go here (decoder handles, model weights)
        it.map { case (id, payload) =>
          val (first, sum) = decodeStub(payload)
          PayloadFeatures(id, payload.length.toLong, first, sum)
        }
      }
  }
}
