package graft.sources.v2

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for the reference's trial-list text format —
  * the TalkSet lists (TalkSet/generate_TalkSet.py:48–116, the .txt
  * files under TalkSet/lists/lists_out): space-separated
  * `category audio_name video_name d1 d2 d3 d4 d5 [tag]`.
  *
  * Unlike the read.text + split path (q46), this is a real Catalyst
  * source: column pruning reaches the parser (pruned fields are never
  * materialized) and `category = 'X'` filters are evaluated on the
  * raw line prefix before any field split — the §2.1 "custom
  * TableProvider" option for manifest-shaped inputs.
  *
  * Scale shape: one InputPartition per file — a many-file manifest
  * parallelizes across executors (the reference's five 30k-line lists
  * become five tasks; a production manifest of 100k shards becomes
  * 100k). Files are read streaming, one line at a time; nothing is
  * collected on the driver beyond the file listing.
  *
  * Usage: spark.read.format(classOf[TrialListSource].getName)
  *   .option("path", fileOrDir).load()
  */
class TrialListSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TrialListSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new TrialListTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object TrialListSource {
  val schema: StructType = StructType(Seq(
    StructField("category", StringType),
    StructField("audio_name", StringType),
    StructField("video_name", StringType),
    StructField("d1", DoubleType), StructField("d2", DoubleType),
    StructField("d3", DoubleType), StructField("d4", DoubleType),
    StructField("d5", DoubleType),
    StructField("tag", StringType))) // optional trailing field → null

  def listFiles(path: String): Seq[String] = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.list(p)
      try s.iterator().asScala()
        .map(_.toString).filter(_.endsWith(".txt")).toArray.sorted.toSeq
      finally s.close()
    } else Seq(path)
  }

  // minimal Scala-2.13-friendly java-stream iterator bridge
  implicit private class JIter[T](it: java.util.Iterator[T]) {
    def asScala(): Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }
}

class TrialListTable(path: String) extends Table with SupportsRead {
  require(path != null, "TrialListSource requires .option(\"path\", ...) or load(path)")
  override def name(): String = s"triallist($path)"
  override def schema(): StructType = TrialListSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TrialListScanBuilder(path)
}

class TrialListScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = TrialListSource.schema
  private var categoryEq: Option[String] = None
  private var residual: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (eq, rest) = filters.partition {
      case EqualTo("category", _: String) => true
      case _ => false
    }
    categoryEq = eq.collectFirst { case EqualTo(_, v: String) => v }
    residual = rest
    rest // source handles category=...; everything else stays in Spark
  }
  override def pushedFilters(): Array[Filter] =
    categoryEq.map(v => EqualTo("category", v): Filter).toArray
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new TrialListScan(path, required, categoryEq)
}

class TrialListScan(path: String, required: StructType, categoryEq: Option[String])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"TrialListScan path=$path, ReadSchema=${required.fieldNames.mkString(",")}, " +
      s"PushedCategory=${categoryEq.getOrElse("-")}"
  override def planInputPartitions(): Array[InputPartition] =
    TrialListSource.listFiles(path).map(TrialFilePartition.apply).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new TrialListReaderFactory(required, categoryEq)
}

case class TrialFilePartition(file: String) extends InputPartition

class TrialListReaderFactory(required: StructType, categoryEq: Option[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TrialListReader(partition.asInstanceOf[TrialFilePartition].file, required, categoryEq)
}

class TrialListReader(file: String, required: StructType, categoryEq: Option[String])
    extends PartitionReader[InternalRow] {
  private val reader = java.nio.file.Files.newBufferedReader(java.nio.file.Paths.get(file))
  // ordinal in the full schema for each required field
  private val ords = required.fieldNames.map(TrialListSource.schema.fieldIndex)
  private val prefix = categoryEq.map(_ + " ")
  private var line: String = _

  override def next(): Boolean = {
    line = reader.readLine()
    while (line != null &&
        (line.isEmpty || prefix.exists(p => !line.startsWith(p)))) {
      line = reader.readLine() // prefix filter: no split for skipped lines
    }
    line != null
  }

  override def get(): InternalRow = {
    val f = line.split(' ')
    InternalRow.fromSeq(ords.toIndexedSeq.map { o =>
      if (o >= f.length) null
      else if (o <= 2 || o == 8) UTF8String.fromString(f(o))
      else java.lang.Double.valueOf(f(o).toDouble)
    })
  }

  override def close(): Unit = reader.close()
}
