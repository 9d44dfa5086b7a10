package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 optimization A/B instrument: times OLD-vs-NEW plan arms
  * ALTERNATING inside ONE JVM (A B A B ...), so the box's documented
  * multi-minute stall windows hit both arms alike and the min-of-N
  * per arm is a same-regime comparison — cross-JVM min-of-2 was
  * swinging 4x on this machine the night the rewrites landed. Each
  * timed cell materializes through the noop sink and clears the cache
  * after (the Bench discipline). One JSON line per arm pair.
  *
  * Arms (SPARK_GRAFT_AB, comma list, default all):
  *  - edges: symmetric coPurchaseEdges+orientEdges (old) vs canonical
  *    coPurchaseEdgesCanon+orientEdgesFromCanon (new, q173/q278/q280/
  *    q281's shipped build)
  *  - q185: the old distinct+double-explode item-similarity plan vs
  *    the shipped canonical-pair plan
  */
object OptAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "3").toInt
    val arms = sys.env.getOrElse("SPARK_GRAFT_AB", "edges,q185")
      .split(",").map(_.trim).toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.install(spark)

    def timed(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    def report(name: String, old: Seq[Double], nw: Seq[Double]): Unit = {
      def s(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
      System.err.println(s"[ab] $name old=${old.map(s).mkString(",")} " +
        s"new=${nw.map(s).mkString(",")}")
      println(s"""{"metric":"ab_$name","old_min":${s(old.min)},""" +
        s""""new_min":${s(nw.min)},"reps":$reps,"sf":"$sfDir"}""")
    }

    import queries.AnalyticsQueries11._
    if (arms("build")) {
      def oldArm = coPurchaseEdges(spark, sfDir)
      def newArm = coPurchaseEdgesCanon(spark, sfDir)
      timed(newArm)
      val cells = (1 to reps).flatMap(_ => Seq(timed(oldArm), timed(newArm)))
      report("build", cells.grouped(2).map(_.head).toSeq,
        cells.grouped(2).map(_.last).toSeq)
    }
    if (arms("orient")) {
      val sym = coPurchaseEdges(spark, sfDir).persist(); sym.count()
      val canon = coPurchaseEdgesCanon(spark, sfDir).persist(); canon.count()
      def oldArm = orientEdges(sym)
      def newArm = orientEdgesFromCanon(canon)
      val t0 = System.nanoTime() // timed() clearCache would drop the pins —
      def timedK(f: => DataFrame): Double = {   // keep them for this arm
        val t = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t) / 1e9
      }
      timedK(newArm)
      val cells = (1 to reps).flatMap(_ => Seq(timedK(oldArm), timedK(newArm)))
      report("orient", cells.grouped(2).map(_.head).toSeq,
        cells.grouped(2).map(_.last).toSeq)
      sym.unpersist(); canon.unpersist()
      val _ = t0
    }
    if (arms("wedge")) {
      // the exact-leg wedge count over the FULL oriented graph (q173/
      // q278's dominant cost): SMJ (shipped) vs SHUFFLE_HASH-hinted
      // joins — SHJ skips the sort of the wedge mass on the closure
      // join's streamed side and of both op sides on the self-join
      val canon = coPurchaseEdgesCanon(spark, sfDir).persist()
      val op = orientEdgesFromCanon(canon).persist(); op.count()
      canon.unpersist()
      def oldArm = wedgeCountFromOp(op, "t")
      def newArm = {
        val wedges = op.as("a")
          .join(op.as("b").hint("shuffle_hash"), col("a.u") === col("b.u") &&
            struct(col("a.dv"), col("a.v")) < struct(col("b.dv"), col("b.v")))
          .select(col("a.v").as("v"), col("b.v").as("w"))
        wedges
          .join(op.select(col("u").as("v"), col("v").as("w")).hint("shuffle_hash"),
            Seq("v", "w"))
          .agg(count(lit(1)).as("t"))
      }
      def timedK(f: => DataFrame): Double = {
        val t = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t) / 1e9
      }
      timedK(newArm)
      val cells = (1 to reps).flatMap(_ => Seq(timedK(oldArm), timedK(newArm)))
      report("wedge", cells.grouped(2).map(_.head).toSeq,
        cells.grouped(2).map(_.last).toSeq)
      op.unpersist()
    }
    if (arms("edges")) {
      def oldArm = orientEdges(coPurchaseEdges(spark, sfDir))
      def newArm = orientEdgesFromCanon(coPurchaseEdgesCanon(spark, sfDir))
      timed(newArm) // codegen/JIT lead, charged to neither arm
      val cells = (1 to reps).flatMap(_ => Seq(timed(oldArm), timed(newArm)))
      report("edges", cells.grouped(2).map(_.head).toSeq,
        cells.grouped(2).map(_.last).toSeq)
    }
    if (arms("q158")) {
      import graft.sources.Tables
      // the pre-round-16 step (no hint): SMJ sorts the cached edge
      // list every iteration; everything else identical to the query
      def arm(hinted: Boolean): DataFrame = {
        val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
        val e0 = Tables.table(spark, sfDir, "orders")
          .join(Tables.table(spark, sfDir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).cast("long").as("src"),
            (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
          .distinct()
          .persist(lvl)
        val e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        val d = e.groupBy(col("src")).agg(count(lit(1)).as("d")).persist(lvl)
        val m = e.join(d, Seq("src"))
          .select(col("src"), col("dst"), col("d")).persist(lvl)
        d.count(); m.count(); e0.unpersist()
        val r0 = d.select(col("src").as("node"), lit(1000000L).as("r"))
        def step(r: DataFrame): DataFrame = {
          val rs = r.withColumnRenamed("node", "src")
          m.join(if (hinted) rs.hint("shuffle_hash") else rs, Seq("src"))
            .groupBy(col("dst"))
            .agg(sum(expr("r DIV d")).as("cs"))
            .select(col("dst").as("node"),
              (lit(150000L) + expr("(85 * cs) DIV 100")).as("r"))
        }
        step(step(step(r0)))
          .orderBy(col("r").desc, col("node"))
          .limit(50)
      }
      timed(arm(hinted = true))
      val cells = (1 to reps).flatMap(_ =>
        Seq(timed(arm(hinted = false)), timed(arm(hinted = true))))
      report("q158", cells.grouped(2).map(_.head).toSeq,
        cells.grouped(2).map(_.last).toSeq)
    }
    if (arms("q280")) {
      // old = the pre-fix shape (full orientation pinned + counted,
      // then the %5 filter pinned on top); new = the shipped query
      // (only the sampled list is ever pinned)
      def oldArm: DataFrame = {
        val edges = coPurchaseEdgesCanon(spark, sfDir).persist()
        val opX = orientEdgesFromCanon(edges).persist()
        opX.count()
        edges.unpersist()
        val h = "(" + graft.queries.Q.uhashSql("27800",
          "least(u, v) * 4294967296 + greatest(u, v)") + ")"
        val opS = opX.filter(expr(s"$h % 5 = 0")).persist()
        val triCounts = triangleResidues(opS, 20L)
          .agg(count(lit(1)).as("t5"),
            expr("count_if(huv % 10 = 0 AND hvw % 10 = 0 AND huw % 10 = 0)")
              .as("t10"),
            expr("count_if(huv = 0 AND hvw = 0 AND huw = 0)").as("t20"))
        val edgeCounts = opS.select(expr(s"$h % 20").as("he"))
          .agg(count(lit(1)).as("n5"),
            expr("count_if(he % 10 = 0)").as("n10"),
            expr("count_if(he = 0)").as("n20"))
        triCounts.crossJoin(edgeCounts)
      }
      def newArm: DataFrame =
        queries("q280_doulion_sweep")(spark, sfDir)
      timed(newArm)
      val cells = (1 to reps).flatMap(_ => Seq(timed(oldArm), timed(newArm)))
      report("q280", cells.grouped(2).map(_.head).toSeq,
        cells.grouped(2).map(_.last).toSeq)
    }
    if (arms("replay")) {
      // sentinelReplay's drop-0 write: coalesce(1) (shipped) vs natural
      // parallelism — measures what the single-task encode costs each
      // streaming drain query (q193/q250/q251/q274) per invocation
      import graft.queries.Q
      val ev = graft.sources.Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("CAST(round(value*100) AS BIGINT)").as("value_c"),
          timestamp_micros(expr("ts_ns DIV 1000")).as("ets"))
      val out = Q.scratchDir(spark, "graft_ab_replay")
      def t(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      def oldArm = t(ev.coalesce(1).write.mode("overwrite").parquet(s"$out/c1"))
      def newArm = t(ev.write.mode("overwrite").parquet(s"$out/par"))
      newArm
      val cells = (1 to reps).flatMap(_ => Seq(oldArm, newArm))
      report("replay", cells.grouped(2).map(_.head).toSeq,
        cells.grouped(2).map(_.last).toSeq)
    }
    if (arms("drain")) {
      // streaming drain state-partition count: 2 (shipped) vs 1 —
      // halves the state-store instances per stateful operator (and
      // their per-batch commit files on the throttled disk) against
      // serializing the 100k-row join compute
      import graft.streaming.EventStream
      def cell(n: Int): Double = {
        spark.conf.set("graft.drain.statePartitions", n.toString)
        val t0 = System.nanoTime()
        EventStream.leftSemiJoinRollup(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.catalog.listTables().collect()
          .filter(_.name.startsWith("graft_stream_"))
          .foreach(t => spark.catalog.dropTempView(t.name))
        dt
      }
      cell(1)
      val cells = (1 to reps).flatMap(_ => Seq(cell(2), cell(1)))
      spark.conf.unset("graft.drain.statePartitions")
      report("drain", cells.grouped(2).map(_.head).toSeq,
        cells.grouped(2).map(_.last).toSeq)
    }
    if (arms("q185")) {
      import graft.sources.Tables
      // the pre-round-16 q185 plan, verbatim
      def oldArm: DataFrame = {
        val li = Tables.table(spark, sfDir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
          .persist() // as the pre-rewrite query did; timed() clears after
        val n = li.groupBy(col("pk")).agg(count(lit(1)).as("n"))
        val co = li.groupBy(col("ok")).agg(collect_set(col("pk")).as("ps"))
          .select(explode(col("ps")).as("item"), col("ps"))
          .select(col("item"), explode(col("ps")).as("other"))
          .filter(col("item") =!= col("other"))
          .groupBy(col("item"), col("other"))
          .agg(count(lit(1)).as("c"))
        scoreTop5(co, n)
      }
      def newArm: DataFrame =
        graft.queries.AnalyticsQueries3
          .queries("q185_item_similarity")(spark, sfDir)
      timed(newArm)
      val cells = (1 to reps).flatMap(_ => Seq(timed(oldArm), timed(newArm)))
      report("q185", cells.grouped(2).map(_.head).toSeq,
        cells.grouped(2).map(_.last).toSeq)
    }
    spark.stop()
  }

  /** The unchanged scoring/window tail of q185, shared by both arms. */
  private def scoreTop5(co: DataFrame, n: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = co
      .join(n.select(col("pk").as("item"), col("n").as("n_item")), Seq("item"))
      .join(n.select(col("pk").as("other"), col("n").as("n_other")), Seq("other"))
      .select(col("item"), col("other"),
        expr("(1000000 * c * c) DIV (n_item * n_other)").as("score"), col("c"))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("score").desc, col("other"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("item"), col("rk"), col("other"), col("c"), col("score"))
      .orderBy(col("item"), col("rk"))
  }
}
