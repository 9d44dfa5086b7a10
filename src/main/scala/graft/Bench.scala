package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract). Timing forces full
  * materialization through the noop sink (no count() shortcuts, no
  * output cost); a warm-up pass at sf0.001 amortizes JIT/codegen so the
  * numbers reflect steady-state plan cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Ladder-only scaling knob (round-11 verdict task 3): the driver
    // contract pins shuffle partitions to the core count, which at
    // rung 2 (sf10, ~1.7 GB parquet / ~60 M lineitem rows) makes
    // every shuffle partition 10× its rung-1 size — hash aggs spill
    // and the measured inflation on q158/q168/q173 was resourcing,
    // not plan shape. With SPARK_GRAFT_SCALE_PARTITIONS=1 the
    // partition count scales with input bytes at ~8 MB of COMPRESSED
    // parquet per shuffle partition (≈128 MB in-flight once ~4×
    // parquet compression and ~4× row-object expansion are paid —
    // the cluster-default sizing rule applied to what actually fills
    // memory), never below the core count. SPARK_GRAFT_SHUFFLE_
    // PARTITIONS=N overrides with an explicit count for isolation
    // experiments. The driver's contract run sets neither, so sf0.1
    // numbers stay comparable across rounds.
    val shufflePartitions = sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
      .getOrElse {
        if (sys.env.get("SPARK_GRAFT_SCALE_PARTITIONS").contains("1")) {
          // listFiles() is null for an unreadable or race-deleted dir
          def dirBytes(p: java.io.File): Long =
            if (p.isDirectory)
              Option(p.listFiles()).getOrElse(Array.empty).map(dirBytes).sum
            else p.length()
          val bytes = dirBytes(new java.io.File(sfDir))
          math.max(cpus.toInt, (bytes / (8L << 20)).toInt + 1).toString
        } else cpus
      }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.install(spark)

    // Sink/roundtrip scratch → tmpfs ONLY on explicit opt-in
    // (SPARK_GRAFT_TMPFS_SCRATCH=1): this VM's disk has a burst-bucket
    // throttle (ARCHITECTURE.md "disk-throttle tail") that can stall
    // late file-writing queries (q46/q54/q67/q68/q71/q226) at 10×
    // their plan cost, and /dev/shm takes the disk out of that
    // measurement — but a silent redirect made the sink-query numbers
    // claim I/O cost they never paid and broke comparability with
    // disk-backed rounds (ADVICE r10). Default is now the real disk
    // regime, and either way the regime is RECORDED in the emitted
    // contract line ("scratch":"tmpfs"|"disk") so every downstream
    // comparison knows which it is reading.
    val wantTmpfs = sys.env.get("SPARK_GRAFT_TMPFS_SCRATCH").contains("1")
    if (wantTmpfs && spark.conf.getOption("graft.scratch.dir").isEmpty) {
      val shm = java.nio.file.Paths.get("/dev/shm")
      if (java.nio.file.Files.isWritable(shm))
        spark.conf.set("graft.scratch.dir", shm.resolve("graft-bench").toString)
    }
    // The regime label probes the ACTUAL filesystem type of the
    // scratch dir (ADVICE r11): a user-supplied graft.scratch.dir on
    // any tmpfs — or a /dev/shm symlink — is recorded as "tmpfs",
    // not mislabeled "disk" by a literal path-prefix check.
    val scratchRegime = spark.conf.getOption("graft.scratch.dir") match {
      case Some(dir) =>
        try {
          val p = java.nio.file.Paths.get(dir)
          var probe = p.toAbsolutePath
          while (!java.nio.file.Files.exists(probe)) probe = probe.getParent
          if (java.nio.file.Files.getFileStore(probe).`type`() == "tmpfs")
            "tmpfs" else "disk"
        } catch { case _: Exception => "disk" }
      case None => "disk"
    }

    def exec(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
      }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-28s $dt%8.2fs  ($dir)")
      // queries persist() intermediates consumed by multiple actions;
      // drop them between queries (outside the timed region) so cache
      // and GC pressure don't accumulate across the ~100-query run and
      // bleed into later queries' numbers. The streaming queries'
      // memory-sink tables (graft_stream_*) are consumed by now too —
      // clearCache() doesn't cover temp views, so drop them explicitly
      // (each helper recreates its own on the next run).
      spark.catalog.clearCache()
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("graft_stream_"))
        .foreach(t => spark.catalog.dropTempView(t.name))
      dt
    }

    // Local profiling aid: SPARK_GRAFT_ONLY=q71,q42 limits the run to a
    // comma-separated prefix-matched subset. Unset (the driver's case)
    // = every declared query, unchanged contract.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    // SPARK_GRAFT_ONESHOT=1: skip warm-up and the stall re-measure
    // loop — one timed pass per query. For scale-ladder profiling
    // (tools/gen_scale_ladder.py) where each query is minutes, not
    // seconds, and min-of-N would double the cost. The driver's
    // contract run never sets this.
    val oneshot = sys.env.get("SPARK_GRAFT_ONESHOT").contains("1")
    if (!oneshot) names.foreach(exec(_, "/root/testdata/sf0.001")) // warm-up
    val firstPass = names.map(n => n -> exec(n, sfDir))
    // This VM shows multi-minute whole-machine stall windows under
    // sustained load (a 1 s query can read as 100 s if the window
    // lands on it — verified: the same queries run in isolation at
    // their plan cost). A measurement several times slower than any
    // plan here should be is re-taken once and the MIN reported:
    // steady-state plan cost is what this benchmark exists to
    // measure, and min-of-2 cannot flatter a genuinely slow plan.
    // Up to 3 re-measure rounds: a stall window can outlive a single
    // immediate retry (observed spanning ~2 min of queries), so later
    // rounds re-take only what is still slow, minutes apart. A query
    // whose re-measurement AGREES with its previous sample (within
    // 1.3x) is confirmed genuine and never re-taken again — otherwise
    // every legitimately-slow query (file sinks, streaming) would be
    // re-run in all 3 rounds and get min-of-4 reporting while fast
    // queries get a single sample, a selective-minimum bias.
    val best = scala.collection.mutable.LinkedHashMap(firstPass: _*)
    val confirmed = scala.collection.mutable.Set[String]()
    // Threshold 4 s (was 8): a clean isolated run shows every
    // non-media query under ~3 s at sf0.1, so anything above 4 s is
    // either genuinely heavy (confirmed once, never re-taken again)
    // or a stall window; at ~10 candidates the re-measure pass costs
    // well under a minute.
    var round = 0
    while (!oneshot && round < 3 && names.exists(n => best(n) > 4.0 && !confirmed(n))) {
      for (n <- names if best(n) > 4.0 && !confirmed(n)) {
        System.err.println(s"[bench] $n: ${best(n)} s looks stall-contaminated; re-measuring")
        val t2 = exec(n, sfDir)
        if (t2 >= 0) {
          val lo = math.min(t2, best(n))
          if (math.max(t2, best(n)) <= lo * 1.3) confirmed += n
          best(n) = lo
        }
      }
      round += 1
    }
    val results = best.toSeq
    // The driver records only the trailing ~2000 chars of the run's
    // output; with 131 full-length query names the JSON line is ~4.6 KB
    // and its head gets cut, so the structured record never parses
    // ("parsed": null in every round's BENCH artifact). Emit the
    // contract line with the unique qNNN prefix as the key and
    // centisecond precision — ~1.7 KB, fits the window whole. The
    // full-name, full-precision numbers are already on stderr (one
    // [bench] line per query) for local profiling.
    // Locale.ROOT: the f-interpolator uses the JVM default locale, and
    // a comma-decimal locale (de_DE, fr_FR, …) would emit 1,23 —
    // invalid JSON, the exact parse failure this line exists to fix.
    def cs(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", v)
    val total = results.map(_._2).filter(_ >= 0).sum
    // The query count grows every round, so the full seconds map will
    // eventually outgrow the window again (at 161 queries it is
    // ~1.92 KB — already at the edge). If the full line exceeds the
    // safe budget, keep the CONTRACT SHAPE (qNN keys, seconds values)
    // but list only the slowest entries — the informative ones — and
    // summarize the omitted fast tail in a self-describing "omitted"
    // object, shrinking the list until the line fits. Every emitted
    // number stays in seconds; nothing needs re-unit-ing downstream.
    def entry(k: String, v: Double): String =
      "\"" + k.takeWhile(_ != '_') + "\":" + cs(v)
    def line(qs: Seq[(String, Double)], extra: String): String =
      s"""{"metric":"total","value":${cs(total)},"unit":"sec","queries":${
        qs.map((entry _).tupled).mkString("{", ",", "}")
      },$extra"scratch":"$scratchRegime","sf":"$sfDir"}"""
    val budget = 1900
    val full = line(results, "")
    val out = if (full.length <= budget) full else {
      val bySlow = results.sortBy { case (_, v) => -v }
      Iterator.from(0).map { shrink =>
        val keep = bySlow.take(math.max(10, bySlow.size - 20 * (shrink + 1)))
        val rest = results.filterNot(keep.contains(_))
        val restSum = rest.map(_._2).filter(_ >= 0).sum
        line(keep.sortBy(_._1),
          s""""omitted":{"n":${rest.size},"sum_sec":${cs(restSum)}},""")
      }.find(_.length <= budget).get
    }
    println(out)
    spark.stop()
  }
}
