package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dynamic length-sorted batch packing — the reference's training
  * mini-batch scheme (dataLoader.py:94–104): sort trials by
  * `(length, tiebreak)` descending, then greedily slice off
  * `max(batchSize div length_of_first, 1)` rows per mini-batch (so a
  * batch of long clips holds few rows and a batch of short clips holds
  * many, bounding total frames per batch ≈ batchSize).
  *
  * The reference packs one global list sequentially; here the category
  * key is the parallel unit (`groupByKey(cat).flatMapGroups`) — state
  * is bounded by one group, groups pack concurrently across executors,
  * which is the scale-out shape of the same semantics.
  */
object BatchPack {

  /** items must have columns (cat: string, id: long, len: long);
    * returns (cat, batch_id, id, len), batch_id numbered from 1 in
    * (len, id)-descending order within cat.
    */
  def pack(spark: SparkSession, items: DataFrame, batchSize: Long): DataFrame = {
    import spark.implicits._
    items
      .select(col("cat").cast("string"), col("id").cast("long"), col("len").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (cat, it) =>
        // sorted(..., key=(len, tiebreak), reverse=True) — dataLoader.py:96
        val sorted = it.toArray.sortBy(t => (-t._3, -t._2))
        val out = Array.newBuilder[(String, Long, Long, Long)]
        var start = 0
        var batch = 1L
        while (start < sorted.length) {
          // max(int(batchSize / length), 1) — dataLoader.py:100
          val cap = math.max(batchSize / sorted(start)._3, 1L).toInt
          val end = math.min(sorted.length, start + cap)
          var i = start
          while (i < end) { out += ((cat, batch, sorted(i)._2, sorted(i)._3)); i += 1 }
          batch += 1
          start = end
        }
        out.result().iterator
      }
      .toDF("cat", "batch_id", "id", "len")
  }
}
