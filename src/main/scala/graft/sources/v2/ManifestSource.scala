package graft.sources.v2

import java.util.{Map => JMap}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for HF-style streaming-dataset manifests —
  * the ingestion mode of batchProcessVideos.py:111–124:
  * `load_dataset(..., streaming=True, decode=False)` yields dict
  * samples `{"video": {"path": ..., "bytes": ...}, "label": ...}`
  * one at a time; the reference then iterates and processes each
  * sample's `video["path"]`.
  *
  * Spark-first shape: the dataset's shard files become
  * InputPartitions (HF streaming datasets are sharded JSONL/tar under
  * the hood), so a 100k-shard corpus fans out to 100k tasks instead
  * of the reference's single driver-side iterator. Samples are parsed
  * lazily line-by-line; nothing driver-side but the shard listing.
  *
  *  - Column pruning reaches the parser: pruned fields are never
  *    extracted from the JSON tree.
  *  - Limit pushdown mirrors streaming take(n): each shard reader
  *    stops consuming its file after n samples (returned `false` —
  *    a per-partition cap, Spark re-applies the global limit).
  *
  * Usage: spark.read.format(classOf[ManifestSource].getName)
  *   .option("path", fileOrDirOfJsonlShards).load()
  */
class ManifestSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ManifestSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new ManifestTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object ManifestSource {
  /** Flattened sample schema: `video.path`/`video.bytes` surface as
    * columns (decode=False semantics — the payload stays a pointer,
    * nothing is fetched). `shard`/`idx` locate a sample the way the
    * reference's `enumerate(ds)` does, per shard. */
  val schema: StructType = StructType(Seq(
    StructField("shard", StringType),
    StructField("idx", LongType),
    StructField("video_path", StringType),
    StructField("video_bytes", LongType),
    StructField("label", StringType)))

  def listShards(path: String): Seq[String] = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.list(p)
      try {
        val b = Seq.newBuilder[String]
        s.forEach { q =>
          val n = q.getFileName.toString
          // spark text part files or explicit .jsonl shards
          if ((n.endsWith(".jsonl") || n.startsWith("part-")) && !n.endsWith(".crc"))
            b += q.toString
        }
        b.result().sorted
      } finally s.close()
    } else Seq(path)
  }
}

class ManifestTable(path: String) extends Table with SupportsRead {
  require(path != null, "ManifestSource requires .option(\"path\", ...) or load(path)")
  override def name(): String = s"manifest($path)"
  override def schema(): StructType = ManifestSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestScanBuilder(path)
}

class ManifestScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownLimit {
  private var required: StructType = ManifestSource.schema
  private var limit: Option[Int] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushLimit(n: Int): Boolean = {
    limit = Some(n)
    false // per-shard cap only; Spark re-applies the global limit
  }
  override def build(): Scan = new ManifestScan(path, required, limit)
}

class ManifestScan(path: String, required: StructType, limit: Option[Int])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ManifestScan path=$path, ReadSchema=${required.fieldNames.mkString(",")}, " +
      s"PushedLimit=${limit.getOrElse(-1)}"
  override def planInputPartitions(): Array[InputPartition] =
    ManifestSource.listShards(path).map(ManifestShardPartition.apply).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestReaderFactory(required, limit)
}

case class ManifestShardPartition(file: String) extends InputPartition

class ManifestReaderFactory(required: StructType, limit: Option[Int])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ManifestReader(partition.asInstanceOf[ManifestShardPartition].file, required, limit)
}

class ManifestReader(file: String, required: StructType, limit: Option[Int])
    extends PartitionReader[InternalRow] {
  private val reader = java.nio.file.Files.newBufferedReader(java.nio.file.Paths.get(file))
  private val mapper = new ObjectMapper()
  private val shardName = java.nio.file.Paths.get(file).getFileName.toString
  private val need = required.fieldNames.toSet
  private var idx = -1L
  private var line: String = _

  override def next(): Boolean = {
    if (limit.exists(idx + 1 >= _)) return false // streaming take(n)
    line = reader.readLine()
    while (line != null && line.isEmpty) line = reader.readLine()
    if (line == null) false else { idx += 1; true }
  }

  override def get(): InternalRow = {
    // parse only when some JSON-derived column survives pruning
    val root: JsonNode =
      if (need.exists(f => f == "video_path" || f == "video_bytes" || f == "label"))
        mapper.readTree(line)
      else null
    def video(f: String): JsonNode = {
      val v = root.get("video")
      if (v == null) null else v.get(f)
    }
    InternalRow.fromSeq(required.fieldNames.toIndexedSeq.map {
      case "shard" => UTF8String.fromString(shardName)
      case "idx" => java.lang.Long.valueOf(idx)
      case "video_path" =>
        val n = video("path"); if (n == null) null else UTF8String.fromString(n.asText)
      case "video_bytes" =>
        val n = video("bytes"); if (n == null) null else java.lang.Long.valueOf(n.asLong)
      case "label" =>
        val n = root.get("label"); if (n == null) null else UTF8String.fromString(n.asText)
    })
  }

  override def close(): Unit = reader.close()
}
