package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-corpus file sinks — the export side of the training-data
  * pipeline (the JSONL/webdataset shard layout every dataloader
  * consumes), written the same way as [[MediaSinks]]: partition
  * kernels stream files from the EXECUTORS and hand back a manifest,
  * because a driver-side loop over documents cannot scale past one
  * machine. `outDir` must be a shared filesystem on a real cluster
  * (the Q.scratchDir contract).
  */
object TextSinks {

  /** Sharded JSONL export: rows (shard, doc_id, lang, n_chars) land
    * in `shard-<k>.jsonl` files, one line per document in doc_id
    * order within each shard, every line the exact literal
    * `{"doc_id":N,"lang":"X","n_chars":N,"shard":K}` (all-ASCII
    * fields by the generator contract, so bytes = chars and the
    * byte accounting is oracle-recomputable). ONE shuffle
    * (repartition by shard) + a per-partition streaming write; a
    * hash partition may carry several shards, so the kernel cuts a
    * new file at each (sorted) shard boundary. Returns the per-shard
    * write manifest (shard, path, n_docs, n_bytes) EAGERLY — the
    * files are all on disk when this returns, so callers may read
    * them back; the manifest itself is ≤ #shards rows (bounded by
    * construction — the q85/q86 collected-scalar class). */
  def writeJsonlShards(spark: SparkSession, rows: DataFrame, outDir: String)
      : DataFrame = {
    import spark.implicits._
    val written = rows
      .select(col("shard").cast("long"), col("doc_id").cast("long"),
        col("lang"), col("n_chars").cast("long"))
      .as[(Long, Long, String, Long)]
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .mapPartitions { it =>
        val res = scala.collection.mutable.ArrayBuffer[(Long, String, Long, Long)]()
        var cur = -1L
        var w: java.io.BufferedWriter = null
        var n = 0L; var b = 0L; var path = ""
        def close(): Unit = if (w != null) {
          w.close(); res += ((cur, path, n, b)); w = null
        }
        it.foreach { case (sh, id, lang, nc) =>
          if (sh != cur) {
            close(); cur = sh; n = 0L; b = 0L
            path = s"$outDir/shard-$sh.jsonl"
            w = java.nio.file.Files.newBufferedWriter(
              java.nio.file.Paths.get(path))
          }
          val line = s"""{"doc_id":$id,"lang":"$lang","n_chars":$nc,"shard":$sh}"""
          w.write(line); w.write("\n")
          n += 1; b += line.length + 1
        }
        close()
        res.iterator
      }
      .collect() // ≤ #shards manifest rows — bounded by construction
    spark.createDataset(written.toSeq)
      .toDF("shard", "path", "n_docs", "n_bytes")
  }
}
