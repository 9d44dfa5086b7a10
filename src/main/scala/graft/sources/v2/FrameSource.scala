package graft.sources.v2

import java.util.{Map => JMap}

import graft.sources.Media
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 frame scan with ffmpeg `-ss/-to` range pushdown —
  * models the reference's frame extraction (demoTalkNet.py:486–507):
  * each video normalizes to `fps` (the `-r 25` of :489–490) and a
  * `frame >= a AND frame <= b` predicate is PUSHED into the decode
  * kernel as a `Media.DecodeRange` (the `-ss %.3f -to %.3f` of
  * :491–493) — out-of-range frames are never decoded, not filtered
  * after the fact. The pushed conjuncts are consumed (not returned as
  * residual), so if the kernel ignored the range the extra rows would
  * surface — FrameRangeSpec pins that they don't.
  *
  * One InputPartition per video: a 100k-video corpus is 100k
  * independent decode tasks, the same fan-out BatchPipeline uses.
  *
  * Options:
  *   videos   semicolon list of `key:durationSec` (name = v%05d of key)
  *   fps      normalized frame rate, default 25
  *   decoder  "stub" (default), "avi:<root>" — the REAL MJPG/PNG AVI
  *            decoder (Media.AviFileFrameDecoder), which honors the
  *            same range pushdown via the container's idx1 index —
  *            "ffmpeg:<root>" (any container, shelling seat), or
  *            "auto:<root>" — per-file magic-byte dispatch between
  *            the AVI and ffmpeg decoders (Media.AutoFrameDecoder)
  */
class FrameSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FrameSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new FrameTable(properties.get("videos"),
      Option(properties.get("fps")).map(_.toInt).getOrElse(25),
      Option(properties.get("decoder")).getOrElse("stub"))
  override def supportsExternalMetadata(): Boolean = false
}

object FrameSource {
  val schema: StructType = StructType(Seq(
    StructField("video_name", StringType),
    StructField("frame", LongType),
    StructField("t_sec", DoubleType),
    StructField("payload", BinaryType),
    StructField("checksum", LongType)))

  def parseVideos(spec: String): Seq[Media.VideoMeta] =
    spec.split(';').toIndexedSeq.filter(_.nonEmpty).map { v =>
      val Array(k, d) = v.split(':')
      Media.VideoMeta(k.toLong, f"v${k.toLong}%05d", d.toDouble)
    }
}

class FrameTable(videosSpec: String, fps: Int, decoderSpec: String)
    extends Table with SupportsRead {
  require(videosSpec != null, "FrameSource requires .option(\"videos\", \"key:durationSec;...\")")
  override def name(): String = s"frames(${videosSpec.take(40)})"
  override def schema(): StructType = FrameSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FrameScanBuilder(videosSpec, fps, decoderSpec)
}

class FrameScanBuilder(videosSpec: String, fps: Int, decoderSpec: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = FrameSource.schema
  private var lo = 0L
  private var hi = Long.MaxValue
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // frame literals arrive as Int or Long depending on how the
    // predicate was written — accept any integral Number
    val (handled, residual) = filters.partition {
      case GreaterThan("frame", _: Number) | GreaterThanOrEqual("frame", _: Number) |
           LessThan("frame", _: Number) | LessThanOrEqual("frame", _: Number) |
           EqualTo("frame", _: Number) => true
      case IsNotNull("frame") => true // frames are never null — trivially satisfied
      case _ => false
    }
    handled.foreach {
      case GreaterThan(_, v: Number) => lo = math.max(lo, v.longValue + 1)
      case GreaterThanOrEqual(_, v: Number) => lo = math.max(lo, v.longValue)
      case LessThan(_, v: Number) => hi = math.min(hi, v.longValue - 1)
      case LessThanOrEqual(_, v: Number) => hi = math.min(hi, v.longValue)
      case EqualTo(_, v: Number) => lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue)
      case _ =>
    }
    pushed = handled
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = {
    val empty = hi < lo // contradictory range → no scan at all
    val range = if (empty || (lo == 0L && hi == Long.MaxValue)) None
      else Some(Media.DecodeRange(lo, hi))
    new FrameScan(videosSpec, fps, decoderSpec, required, range, empty)
  }
}

class FrameScan(videosSpec: String, fps: Int, decoderSpec: String,
    required: StructType, range: Option[Media.DecodeRange], empty: Boolean)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"FrameScan fps=$fps, ReadSchema=${required.fieldNames.mkString(",")}, " +
      s"PushedFrameRange=${if (empty) "EMPTY" else range.map(r => s"[${r.startFrame},${r.endFrame}]").getOrElse("-")}"
  override def planInputPartitions(): Array[InputPartition] =
    if (empty) Array.empty
    else FrameSource.parseVideos(videosSpec).map(VideoPartition.apply).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new FrameReaderFactory(fps, decoderSpec, required, range)
}

case class VideoPartition(video: Media.VideoMeta) extends InputPartition

class FrameReaderFactory(fps: Int, decoderSpec: String, required: StructType,
    range: Option[Media.DecodeRange]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FrameReader(partition.asInstanceOf[VideoPartition].video, fps,
      decoderSpec, required, range)
}

class FrameReader(video: Media.VideoMeta, fps: Int, decoderSpec: String,
    required: StructType, range: Option[Media.DecodeRange])
    extends PartitionReader[InternalRow] {
  // the kernel seat, resolved per the `decoder` option: the stub, or
  // the REAL AVI demux (Media.AviFileFrameDecoder) — both honor the
  // pushed range (the real one via the container's idx1 seek)
  private val it = Media.resolveDecoder(decoderSpec).decode(video, fps, range)
  private var cur: Media.Frame = _

  override def next(): Boolean = { if (it.hasNext) { cur = it.next(); true } else false }

  override def get(): InternalRow =
    InternalRow.fromSeq(required.fieldNames.toIndexedSeq.map {
      case "video_name" => UTF8String.fromString(video.name)
      case "frame" => java.lang.Long.valueOf(cur.frame)
      case "t_sec" => java.lang.Double.valueOf(cur.frame.toDouble / fps)
      case "payload" => cur.payload
      case "checksum" => java.lang.Long.valueOf(cur.checksum)
    })

  override def close(): Unit = ()
}
