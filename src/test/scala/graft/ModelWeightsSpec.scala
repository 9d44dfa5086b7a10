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

  /** Local HTTP fixture (JDK httpserver, loopback only — no egress):
    * serves `bytes` at /weights, counting hits; /redirect 302s to it
    * (the Drive-style indirection gdown follows). */
  private def withHttpFixture[T](bytes: Array[Byte])(
      body: (String, AtomicInteger) => T): T = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new AtomicInteger(0)
    server.createContext("/weights", (ex: com.sun.net.httpserver.HttpExchange) => {
      hits.incrementAndGet()
      ex.sendResponseHeaders(200, bytes.length.toLong)
      ex.getResponseBody.write(bytes); ex.close()
    })
    server.createContext("/redirect", (ex: com.sun.net.httpserver.HttpExchange) => {
      val port = server.getAddress.getPort
      ex.getResponseHeaders.add("Location", s"http://127.0.0.1:$port/weights")
      ex.sendResponseHeaders(302, -1); ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}", hits)
    finally server.stop(0)
  }

  test("httpFetcher GETs weights, caches once, follows the gdown-style redirect") {
    val weights = Array.tabulate[Byte](8192)(i => ((i * 131) % 251).toByte)
    withHttpFixture(weights) { (base, hits) =>
      val cache = Files.createTempDirectory("graft_wcache_http").toString
      val p1 = ModelWeights.fetchIfMissing(s"$base/weights", "w.model", cache,
        ModelWeights.httpFetcher())
      val p2 = ModelWeights.fetchIfMissing(s"$base/weights", "w.model", cache,
        ModelWeights.httpFetcher())
      assert(p1 === p2 && hits.get() === 1) // cache absorbed the second call
      assert(Files.readAllBytes(p1).toSeq === weights.toSeq)
      // redirect path (gdown's drive URLs 302 to the payload host)
      val viaRedirect = ModelWeights.httpFetcher()(s"$base/redirect")
      assert(viaRedirect.toSeq === weights.toSeq)
    }
  }

  test("resolveRedirect: relative and absolute Location values both resolve") {
    val at = java.net.URI.create("http://host:8080/a/b/weights").toURL
    assert(ModelWeights.resolveRedirect(at, "/drive/v2/payload").toString ===
      "http://host:8080/drive/v2/payload")
    assert(ModelWeights.resolveRedirect(at, "payload2").toString ===
      "http://host:8080/a/b/payload2")
    assert(ModelWeights.resolveRedirect(at, "https://cdn.example/w.model").toString ===
      "https://cdn.example/w.model")
  }

  test("checksum pinning: mismatch aborts, poisoned cache entry heals") {
    val weights = Array.tabulate[Byte](2048)(i => ((i * 37) % 256).toByte)
    val good = ModelWeights.sha256Hex(weights)
    withHttpFixture(weights) { (base, hits) =>
      val cache = Files.createTempDirectory("graft_wcache_sha").toString
      // wrong pin: fetched bytes rejected BEFORE touching the cache
      val bad = intercept[IllegalArgumentException] {
        ModelWeights.fetchIfMissing(s"$base/weights", "w.model", cache,
          ModelWeights.httpFetcher(), sha256 = Some("0" * 64))
      }
      assert(bad.getMessage.contains("checksum mismatch"))
      assert(!Files.exists(Paths.get(cache, "w.model")))
      // right pin fetches and caches
      val p = ModelWeights.fetchIfMissing(s"$base/weights", "w.model", cache,
        ModelWeights.httpFetcher(), sha256 = Some(good))
      assert(Files.readAllBytes(p).toSeq === weights.toSeq)
      val fetchesSoFar = hits.get()
      // poison the cached copy: next fetchIfMissing re-downloads + heals
      Files.write(p, Array[Byte](1, 2, 3))
      val healed = ModelWeights.fetchIfMissing(s"$base/weights", "w.model", cache,
        ModelWeights.httpFetcher(), sha256 = Some(good))
      assert(hits.get() === fetchesSoFar + 1)
      assert(Files.readAllBytes(healed).toSeq === weights.toSeq)
      // and an intact pinned cache is NOT re-fetched
      ModelWeights.fetchIfMissing(s"$base/weights", "w.model", cache,
        ModelWeights.httpFetcher(), sha256 = Some(good))
      assert(hits.get() === fetchesSoFar + 1)
    }
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
