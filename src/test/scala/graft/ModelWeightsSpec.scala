package graft

import graft.pipeline.ModelWeights
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

/** The weights-fetch seat (the reference's gdown-if-missing contract):
  * fetch once, cache, broadcast, consume from kernels. */
class ModelWeightsSpec extends SparkSpec {

  test("fetchIfMissing downloads once and serves from cache after") {
    val store = Files.createTempDirectory("graft_store")
    val weights = Array.tabulate[Byte](4096)(i => (i % 251).toByte)
    Files.write(store.resolve("talknet.model"), weights)
    val cache = Files.createTempDirectory("graft_wcache").toString
    val calls = new AtomicInteger(0)
    val counting: ModelWeights.Fetcher = { uri =>
      calls.incrementAndGet(); ModelWeights.fileFetcher(uri)
    }
    val uri = store.resolve("talknet.model").toString
    val p1 = ModelWeights.fetchIfMissing(uri, "talknet.model", cache, counting)
    val p2 = ModelWeights.fetchIfMissing(uri, "talknet.model", cache, counting)
    assert(p1 === p2 && calls.get() === 1) // second hit served from cache
    assert(Files.readAllBytes(p1).toSeq === weights.toSeq)
  }

  test("broadcast weights reach a partition kernel intact") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_store2")
    val weights = Array.tabulate[Byte](1024)(i => (i * 7 % 256).toByte)
    Files.write(store.resolve("s3fd.pth"), weights)
    val cache = Files.createTempDirectory("graft_wcache2").toString
    val bc = ModelWeights.load(spark, store.resolve("s3fd.pth").toString, "s3fd.pth", cache)
    val expectedSum = weights.map(_ & 0xff).map(_.toLong).sum
    // every partition initializes its "model" from the broadcast bytes
    val sums = spark.range(0, 64, 1, 8).as[Long]
      .mapPartitions { it =>
        val w = bc.value // per-partition model init (demoTalkNet.py:55–61 seat)
        val s = w.map(_ & 0xff).map(_.toLong).sum
        it.map(_ => s)
      }.collect()
    assert(sums.length === 64 && sums.forall(_ === expectedSum))
  }
}
