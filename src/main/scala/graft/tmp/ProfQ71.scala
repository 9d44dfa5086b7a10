package graft.tmp

import org.apache.spark.sql.SparkSession

// throwaway profiler for q71 phases (not part of the library surface)
object ProfQ71 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var listen = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = if (listen) {
        val i = sc.stageInfo
        val ms = for {a <- i.completionTime; b <- i.submissionTime} yield a - b
        System.err.println(f"[stage] ${i.stageId}%4d ${ms.getOrElse(-1L)}%6dms tasks=${i.numTasks}%3d ${i.name.take(70)}")
      }
    })
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.3fs"); r
    }
    def run(d: String) = graft.SparkEntry.queries("q71_ava_eval_e2e")(spark, d)
      .write.format("noop").mode("overwrite").save()
    t("warmup sf0.001")(run("/root/testdata/sf0.001"))
    t("iter1")(run(dir))
    listen = true
    t("iter2")(run(dir))
    spark.stop()
  }
}
