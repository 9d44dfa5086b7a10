package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for oracle-exact query authoring.
  *
  * Floating-point policy — keeps Spark results bit-identical to the
  * driver's DuckDB oracle while staying order-independent (and thus
  * partition-count-independent, which is what makes the same plan
  * correct on a 1000-executor cluster):
  *
  *  1. Never SUM raw doubles across rows: the order of partial
  *     aggregation is nondeterministic under parallelism. Scale to
  *     integer cents/micros first (`cents`), sum longs (exact,
  *     associative), divide once at the end.
  *  2. Per-row double math must use the exact same IEEE expression
  *     tree as the oracle SQL (same ops, same order, same casts).
  *  3. `round()` is only ever applied to identically-derived doubles
  *     (same double in, same double out on both engines).
  *  4. Every query output is deterministically ordered on non-null
  *     keys, and output columns are only STRING / LONG / DOUBLE.
  */
object Q {
  type Fn = (SparkSession, String) => DataFrame

  /** value → integer cents (exact long; oracle: CAST(round(v*100) AS BIGINT)). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact order-independent money sum (long cents). */
  def centsSum(c: Column): Column = sum(cents(c))

  /** Exact scaled-integer sum of an already-deterministic double:
    * oracle: CAST(sum(CAST(round(x*1e6) AS BIGINT)) AS BIGINT). */
  def microsSum(c: Column): Column = sum(round(c * 1e6).cast("long"))

  /** Scratch root for the roundtrip queries (q46/q54/q55/q63): a fresh
    * unique dir under `graft.scratch.dir` if set, else the JVM temp
    * dir. On a real cluster set `graft.scratch.dir` to a SHARED
    * filesystem path (HDFS/NFS/S3A mount) — the default JVM tmpdir is
    * per-machine, so executor writes would be invisible to the
    * read-back. local[*] (the driver harness) is immune because driver
    * and executors share one machine. */
  def scratchDir(s: SparkSession, prefix: String): String = {
    val root = java.nio.file.Paths.get(s.conf.getOption("graft.scratch.dir")
      .getOrElse(System.getProperty("java.io.tmpdir")))
    java.nio.file.Files.createDirectories(root)
    val dir = java.nio.file.Files.createTempDirectory(root, prefix)
    // A bench/verify run executes the scratch queries several times
    // (warm-up + timed + re-measure) and each call gets a fresh tree;
    // free them all when THIS process exits so repeated runs don't
    // accumulate corpus-sized temp trees. Exit-time (not eager)
    // because the returned path is consumed lazily by the query plan.
    Q.reapAtExit(dir)
    dir.toString
  }

  private lazy val reaper = {
    import java.nio.file.{FileVisitResult, Files, Path, SimpleFileVisitor}
    import java.nio.file.attribute.BasicFileAttributes
    val dirs = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.forEach { d =>
        // depth-first deleting visitor: no open-stream leak, no
        // whole-tree materialization
        try Files.walkFileTree(d, new SimpleFileVisitor[Path] {
          override def visitFile(f: Path, a: BasicFileAttributes): FileVisitResult = {
            try Files.deleteIfExists(f) catch { case _: Exception => () }
            FileVisitResult.CONTINUE
          }
          override def postVisitDirectory(p: Path, e: java.io.IOException): FileVisitResult = {
            try Files.deleteIfExists(p) catch { case _: Exception => () }
            FileVisitResult.CONTINUE
          }
        }) catch { case _: Exception => () }
      }))
    dirs
  }

  private[queries] def reapAtExit(dir: java.nio.file.Path): Unit = reaper.add(dir)

  /** Empirical 1/64-quantile grid of `events.value` (computed once at
    * sf0.1; the driver generator's value distribution — log-normal-ish,
    * median ≈ 35, max ≈ 560 — is SF-stable, so one grid serves every
    * scale). Used only as `boundsHint` bucket boundaries for the
    * two-phase AP plans: boundaries steer BALANCE, never the result,
    * so a drifted distribution degrades parallelism, not correctness.
    * A naive even grid over the domain is useless here — the skew
    * packs ~90% of rows into the lowest sixth of the range. */
  val eventsValueQ64: Array[Double] = Array(
    0.8, 1.6, 2.4, 3.3, 4.1, 5.0, 5.9, 6.8, 7.6, 8.6, 9.5, 10.5, 11.4,
    12.5, 13.6, 14.6, 15.7, 16.8, 17.9, 19.1, 20.2, 21.3, 22.5, 23.7,
    25.0, 26.2, 27.5, 28.9, 30.3, 31.7, 33.2, 34.8, 36.4, 38.0, 39.7,
    41.4, 43.2, 45.1, 47.1, 49.1, 51.1, 53.3, 55.6, 58.1, 60.6, 63.3,
    66.1, 68.9, 72.1, 75.4, 79.0, 83.1, 87.4, 92.2, 97.4, 103.2, 109.9,
    117.4, 126.7, 137.9, 152.5, 172.3, 205.8)

  // ——— DuckDB-side mirrors of the graft hash/vector kernels ———

  /** RollingHash fold over a string SQL expr (per-character ascii ≡
    * per-byte on the ASCII driver corpus; see the q29/q31 notes). */
  def polyHashSql(s: String): String =
    s"(CASE WHEN length($s) = 0 THEN CAST(0 AS BIGINT) ELSE " +
      s"list_reduce(list_transform(range(1, length($s)+1), " +
      s"phi -> CAST(ascii(substr($s, CAST(phi AS INT), 1)) AS BIGINT)), " +
      s"(phh, phb) -> (phh * 31 + phb) % 1000000007) END)"

  /** The (aᵢ·x+bᵢ) mod P32 universal hash with the index given as a
    * SQL expr — mirrors the Spark side's pmod(a·pmod(x,P)+b, P)
    * EXACTLY: x is reduced sign-safely (((x%P)+P)%P) before the
    * affine step, so DuckDB's C-style % can never diverge from
    * Spark's pmod on a negative or ≥P input. For nonneg x this is
    * bit-identical to the unreduced form (a·x+b ≡ a·(x mod P)+b
    * (mod P)), so no existing oracle value moves; for negative ids
    * both engines now agree by construction (AmsF2Spec's hostile
    * vintage pins it). NOTE: this hardening was first aimed at the
    * r11 q256 red row, which it did NOT fix — the driver data's ids
    * are nonnegative, and r12 isolated the actual cause as q256's
    * unique DECIMAL(38,0) output columns under the driver's hash
    * canonicalization (fixed by emitting exact integer strings, the
    * q192/q213 policy). The sign-safety stays as a pure data-vintage
    * guard. a·(P−1) = 9.22e18 < 2⁶³−1, so the reduced product never
    * wraps. */
  def uhashSql(iExpr: String, x: String): String = {
    val xr = s"(((($x) % 4294967291) + 4294967291) % 4294967291)"
    s"(((((($iExpr)*2654435761) % 1073741824)*2+1) * $xr + " +
      s"((($iExpr)*40503+778797) % 1073741824)) % 4294967291)"
  }

  /** Fixed ±1 Johnson-Lindenstrauss sign matrix (16 projected dims ×
    * 64 input dims) from a deterministic Knuth-multiplicative
    * recurrence — generated ONCE here and embedded as literals in
    * both the Spark plan and the DuckDB oracle (q255), so the
    * projection is identical integer arithmetic on both engines by
    * construction rather than by re-derivation. */
  val jlSigns: Seq[Seq[Long]] =
    (0 until 16).map(d => (0 until 64).map { i =>
      if ((d * 64 + i + 1).toLong * 2654435761L % 4294967291L % 2 == 0) 1L
      else -1L
    })

  /** Strict left-fold Σ CAST(a[i] AS DOUBLE)·CAST(b[i] AS DOUBLE) —
    * same IEEE order as the graft kernels/DotProduct expression
    * (0.0-seeded fold ≡ fold from first element; DotProduct returns
    * 0.0 on empty arrays, hence the CASE guard — bare list_reduce
    * errors on an empty list). */
  def sqlDotD(a: String, b: String): String =
    s"(CASE WHEN len($a) = 0 OR len($b) = 0 THEN 0.0 ELSE " +
      s"list_reduce(list_transform(range(1, least(len($a), len($b))+1), " +
      s"sdi -> CAST($a[sdi] AS DOUBLE)*CAST($b[sdi] AS DOUBLE)), (sdx,sdy) -> sdx+sdy) END)"
}

/** A named bundle of queries plus their DuckDB oracle SQL. */
trait QueryPack {
  def queries: Map[String, Q.Fn]
  def oracle: Map[String, String]
}
