package graft.pipeline

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** The model-weights fetch seat (demoTalkNet.py:58–61 and
  * model/faceDetector/s3fd/__init__.py:9–13: gdown the `.model`/`.pth`
  * when missing, then load): fetch-if-missing into a local cache,
  * then BROADCAST once per session — executors read the bytes from
  * the broadcast at per-partition kernel init instead of hitting the
  * artifact store N-tasks times.
  *
  * The "store" is any URI the resolver understands; the default
  * resolver handles `file:` paths (a shared filesystem at cluster
  * scale). Swapping in a real downloader (HTTP, object store) means
  * replacing ONE function — cache, broadcast, and kernel plumbing
  * stay. Weights for real S3FD/TalkNet are ~100 MB — broadcast-sized,
  * which is exactly why this seat broadcasts rather than re-reading.
  */
object ModelWeights {

  type Fetcher = String => Array[Byte]

  /** Default resolver: `file:` / plain paths read directly. */
  val fileFetcher: Fetcher = { uri =>
    val p = java.nio.file.Paths.get(uri.stripPrefix("file:"))
    java.nio.file.Files.readAllBytes(p)
  }

  /** Fetch `uri` into `cacheDir/<name>` unless already cached
    * (the gdown-if-missing contract), returning the cached path. */
  def fetchIfMissing(uri: String, name: String, cacheDir: String,
      fetcher: Fetcher = fileFetcher): java.nio.file.Path = {
    val dir = java.nio.file.Paths.get(cacheDir)
    java.nio.file.Files.createDirectories(dir)
    val target = dir.resolve(name)
    if (!java.nio.file.Files.exists(target)) {
      val bytes = fetcher(uri)
      // write-then-move so a concurrent reader never sees a torn file
      val tmp = java.nio.file.Files.createTempFile(dir, name, ".part")
      java.nio.file.Files.write(tmp, bytes)
      try java.nio.file.Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException => // racer won
        java.nio.file.Files.deleteIfExists(tmp)
      }
    }
    target
  }

  /** The full seat: fetch-if-missing, read, broadcast. Kernels call
    * `.value` inside mapPartitions init — one deserialize per
    * executor, zero artifact-store reads per task. */
  def load(spark: SparkSession, uri: String, name: String, cacheDir: String,
      fetcher: Fetcher = fileFetcher): Broadcast[Array[Byte]] = {
    val cached = fetchIfMissing(uri, name, cacheDir, fetcher)
    spark.sparkContext.broadcast(java.nio.file.Files.readAllBytes(cached))
  }
}
