package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.Platform

/** Near-duplicate detection at corpus scale: MinHash + banded LSH
  * (shingle → minhash → band → bucket-join) and SimHash. These are the
  * probabilistic scale path for what q25 does exactly within blocks —
  * at 100 TB you cannot afford corpus-wide O(n²) pairs, so candidates
  * come from LSH bucket collisions and only candidates get the exact
  * Jaccard verification.
  *
  * Column-native (whole-stage codegen; no UDFs): token hashes via
  * xxhash64, the k universal hash functions as arithmetic over a
  * 32-bit-reduced token hash (a·h+b mod p stays in Long range).
  */
object Dedup {

  private val P32 = 4294967291L // largest prime < 2^32

  /** Distinct whitespace tokens of lowercased text. */
  def tokens(text: Column): Column =
    array_distinct(split(lower(trim(text)), "\\s+"))

  /** Word k-shingles (k consecutive tokens joined) — more
    * discriminative than single words for near-dup detection. */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    array_distinct(
      transform(sequence(lit(0), greatest(size(toks) - k, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** MinHash signature over PRE-HASHED tokens (`h32` = xxhash64 mod
    * P32): for i in [0, numHashes), min over tokens of (aᵢ·h+bᵢ) mod
    * P32. Taking the hashed array (not the tokens) as input matters:
    * Catalyst does no CSE across the numHashes lambda bodies, so
    * hashing inside this expression would re-hash every token
    * numHashes times. All arithmetic stays < 2^63. */
  def minhashSignature(h32: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), i => {
      val a = pmod(i.cast("long") * lit(2654435761L), lit(1L << 30)) * 2 + 1
      val b = pmod(i.cast("long") * lit(40503L) + lit(778797L), lit(1L << 30))
      array_min(transform(h32, h => pmod(a * h + b, lit(P32))))
    })

  /** xxhash64 of each token reduced into the P32 ring. */
  def tokenHashes(toks: Column): Column =
    transform(toks, t => pmod(xxhash64(t), lit(P32)))

  // ——— kernel variant: same outputs, JIT'd tight loops ———
  // Catalyst interprets higher-order-function lambdas per element, so
  // the expression form pays ~numHashes interpreted calls per token.
  // This partition kernel computes shingles + signature in plain Scala
  // (~10× faster) while staying bit-identical: same split/slice
  // semantics, same XXH64(seed=42) as functions.xxhash64, same
  // (a·h+b) mod P32 family.

  private def pmodL(x: Long, p: Long): Long = { val m = x % p; if (m < 0) m + p else m }

  /** Scala mirror of functions.xxhash64 on a string (seed 42). */
  def xxhash64String(s: String): Long = {
    val b = s.getBytes("UTF-8")
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
  }

  /** Polynomial rolling hash over UTF-8 bytes — the Scala mirror of
    * graft.functions.RollingHash (h·31+b mod 1e9+7). Unlike xxhash64
    * it is DuckDB-expressible (fold over ascii codes on an ASCII
    * corpus), so the LSH paths built on it get a full SQL oracle. */
  def polyHash(s: String): Long = {
    val bytes = s.getBytes("UTF-8")
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31L + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    h
  }

  /** The i-th universal hash (aᵢ, bᵢ) — shared by the minhash
    * signature (indices 0..numHashes-1, ≤ 128 in practice), the
    * SimHash bit family (200..263) and the ANN hyperplanes (1000+);
    * the ranges are disjoint so no two consumers reuse a function.
    * Arithmetic stays < 2^63 for h < 2^32. */
  def affine(i: Int): (Long, Long) = {
    val a = pmodL(i.toLong * 2654435761L, 1L << 30) * 2 + 1
    val b = pmodL(i.toLong * 40503L + 778797L, 1L << 30)
    (a, b)
  }

  /** Scala mirror of wordShingles (distinct, first-occurrence order). */
  def wordShinglesKernel(text: String, k: Int): Array[String] = {
    val toks = text.trim.toLowerCase.split("\\s+", -1)
    val n = toks.length
    val upper = math.max(n - k, 0)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= upper) {
      val end = math.min(i + k, n)
      seen.add(toks.slice(i, end).mkString(" "))
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** Scala mirror of tokenHashes + minhashSignature. `hashFn` picks
    * the token hash: xxhash64String (production default, best mixing)
    * or polyHash (oracle-parity path, DuckDB-expressible). */
  def minhashSignatureKernel(shingles: Array[String], numHashes: Int,
      hashFn: String => Long = xxhash64String): Array[Long] = {
    val h32 = shingles.map(s => pmodL(hashFn(s), P32))
    val sig = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val (a, b) = affine(i)
      var m = Long.MaxValue
      var j = 0
      while (j < h32.length) {
        val v = pmodL(a * h32(j) + b, P32)
        if (v < m) m = v
        j += 1
      }
      sig(i) = m
      i += 1
    }
    sig
  }

  /** (id, toks, sig) via the kernel — drop-in for the expression base. */
  def minhashBase(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, numHashes: Int, shingleK: Int,
      hashFn: String => Long = xxhash64String): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      // shingling+hashing is CPU-bound: size kernel parallelism to
      // cores, not to the scan's file count (one small parquet file =
      // one partition = serial kernel otherwise)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val sh = wordShinglesKernel(text, shingleK)
          (id, sh, minhashSignatureKernel(sh, numHashes, hashFn))
        }
      }
      .toDF("id", "toks", "sig")
  }

  /** LSH candidate pairs with exact-Jaccard verification. Signatures
    * are banded (bands × rowsPerBand = numHashes); docs sharing any
    * band bucket become candidates; only candidates are verified.
    * The bucket join carries only (id, band, bucket) — shingle arrays
    * are re-attached per candidate id afterwards, so the wide arrays
    * are never shuffled through the LSH join.
    *
    * Hot-bucket guard: a degenerate corpus (thousands of identical or
    * empty docs) puts B docs in one band bucket and the self-join
    * would emit B² candidate rows. Buckets larger than `maxBucket`
    * are skipped entirely (their members still pair through any
    * non-degenerate band). The window count rides the same
    * (band, bucket) shuffle the join needs, so the guard adds no
    * exchange. Set `spark.conf graft.lsh.logDrops=true` to count and
    * log the skipped buckets (costs one extra action). */
  /** The banded-LSH candidate step shared by minhashCandidatePairs
    * and minhashEstimatePairs: band keys are the signature slices
    * themselves (collision ⟺ slice equality EXACTLY, keeping the
    * candidate set SQL-derivable; at 100 TB you'd xxhash64 the key
    * down to 8 bytes before the exchange — same pairs modulo 2^-64
    * collisions), hot buckets above `maxBucket` skipped, duplicates
    * across bands collapsed. Returns (id_a, id_b) with id_a < id_b.
    * Only (id, band, bucket) rows ever shuffle here — never the
    * shingle or signature arrays. */
  private def bandedCandidatePairs(base: DataFrame, bands: Int, rows: Int,
      maxBucket: Int): DataFrame = {
    val spark = base.sparkSession
    val bandedAll = base.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => concat_ws(",",
          transform(slice(col("sig"), b * rows + 1, lit(rows)), x => x.cast("string")))))
        .as(Seq("band", "bucket")))
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bucket"))))
    if (spark.conf.getOption("graft.lsh.logDrops").exists(_.toBoolean)) {
      val n = bandedAll.filter(col("bsz") > maxBucket)
        .select(countDistinct(col("band"), col("bucket"))).first().getLong(0)
      if (n > 0) println(s"[graft] bandedCandidatePairs: skipped $n band buckets larger than $maxBucket")
    }
    val banded = bandedAll.filter(col("bsz") <= maxBucket).drop("bsz")
    banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  def minhashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 128, bands: Int = 32, threshold: Double = 0.8,
      shingleK: Int = 3, hashFn: String => Long = xxhash64String,
      maxBucket: Int = 100000): DataFrame = {
    val rows = numHashes / bands
    require(rows * bands == numHashes, "bands must divide numHashes")
    val spark = docs.sparkSession
    // signatures via the JIT'd kernel; the plan below is diamond-shaped
    // (banded self-join + two toks re-attach joins all read `base`), so
    // materialize once and truncate lineage — checkpoint-before-reuse;
    // recomputing shingling+minhash per branch would multiply the
    // dominant cost 4×.
    val base = minhashBase(spark, docs, idCol, textCol, numHashes, shingleK, hashFn)
      .localCheckpoint()
    val cand = bandedCandidatePairs(base, bands, rows, maxBucket)
    val toksDf = base.select(col("id"), col("toks"))
    cand
      .join(toksDf.withColumnRenamed("id", "id_a").withColumnRenamed("toks", "toks_a"), "id_a")
      .join(toksDf.withColumnRenamed("id", "id_b").withColumnRenamed("toks", "toks_b"), "id_b")
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))).cast("long"))
      .withColumn("uni", size(array_union(col("toks_a"), col("toks_b"))).cast("long"))
      .withColumn("jac", col("inter").cast("double") / col("uni"))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
  }

  /** Sketch CALIBRATION: for every LSH candidate pair, the
    * signature-based Jaccard estimate (matching minhash components /
    * numHashes) next to the exact shingle Jaccard — the measurement
    * that justifies (numHashes, bands, threshold) choices before a
    * 100 TB run commits to them. Same candidate generation as
    * minhashCandidatePairs (shared band bucket, hot-bucket guard), no
    * threshold filter; n_match is exact integer arithmetic. */
  def minhashEstimatePairs(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 128, bands: Int = 32, shingleK: Int = 3,
      hashFn: String => Long = xxhash64String,
      maxBucket: Int = 100000): DataFrame = {
    val rows = numHashes / bands
    require(rows * bands == numHashes, "bands must divide numHashes")
    val spark = docs.sparkSession
    val base = minhashBase(spark, docs, idCol, textCol, numHashes, shingleK, hashFn)
      .localCheckpoint()
    val cand = bandedCandidatePairs(base, bands, rows, maxBucket)
    val sideDf = base.select(col("id"), col("toks"), col("sig"))
    cand
      .join(sideDf.toDF("id_a", "toks_a", "sig_a"), "id_a")
      .join(sideDf.toDF("id_b", "toks_b", "sig_b"), "id_b")
      .withColumn("n_match",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1L).otherwise(0L)), lit(0L), (acc, v) => acc + v))
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))).cast("long"))
      .withColumn("uni", size(array_union(col("toks_a"), col("toks_b"))).cast("long"))
      .select(col("id_a"), col("id_b"), col("n_match"), col("inter"), col("uni"),
        (col("n_match").cast("double") / numHashes.toDouble).as("est"),
        (col("inter").cast("double") / col("uni")).as("jac"))
  }

  /** INCREMENTAL near-dup: match a batch of NEW docs against an
    * already-INDEXED corpus without re-pairing the index against
    * itself — the production dedup shape (the index's band buckets
    * are precomputed once; each arriving batch only signs itself and
    * probes them; at 100 TB the index side is a bucketed table and
    * this probe is a co-located join). Candidates = any shared band
    * bucket; survivors verified by exact shingle Jaccard; per new doc
    * the BEST match wins (max jac, then smallest index id). Returns
    * one row per new doc: (id, dup_of, jac), dup_of = −1 when clean.
    *
    * Same hot-bucket guard as minhashCandidatePairs, applied to the
    * INDEX side (a degenerate index bucket of B docs would emit B
    * candidates per probing doc): index buckets larger than
    * `maxBucket` are skipped. */
  def minhashIncrementalMatches(index: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8, shingleK: Int = 3,
      hashFn: String => Long = xxhash64String,
      maxBucket: Int = 100000): DataFrame = {
    val rows = numHashes / bands
    require(rows * bands == numHashes, "bands must divide numHashes")
    val spark = index.sparkSession
    def banded(base: DataFrame) = base.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => concat_ws(",",
          transform(slice(col("sig"), b * rows + 1, lit(rows)), x => x.cast("string")))))
        .as(Seq("band", "bucket")))
    // each side feeds the bucket join AND a toks re-attach → checkpoint
    val baseI = minhashBase(spark, index, idCol, textCol, numHashes, shingleK, hashFn)
      .localCheckpoint()
    val baseN = minhashBase(spark, newDocs, idCol, textCol, numHashes, shingleK, hashFn)
      .localCheckpoint()
    val bandedI = banded(baseI)
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("bsz") <= maxBucket).drop("bsz")
    val cand = banded(baseN).as("n")
      .join(bandedI.as("i"),
        col("n.band") === col("i.band") && col("n.bucket") === col("i.bucket"))
      .select(col("n.id").as("nid"), col("i.id").as("iid"))
      .dropDuplicates("nid", "iid")
    val ver = cand
      .join(baseN.select(col("id").as("nid"), col("toks").as("tn")), "nid")
      .join(baseI.select(col("id").as("iid"), col("toks").as("ti")), "iid")
      .withColumn("jac", size(array_intersect(col("tn"), col("ti"))).cast("double")
        / size(array_union(col("tn"), col("ti"))).cast("long"))
      .filter(col("jac") >= threshold)
    val best = ver
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("nid")).orderBy(col("jac").desc, col("iid"))))
      .filter(col("rn") === 1)
      .select(col("nid").as("id"), col("iid").as("dup_of"), col("jac"))
    baseN.select(col("id")).join(best, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of"),
        coalesce(col("jac"), lit(0.0)).as("jac"))
  }

  /** 64-bit SimHash over token xxhash64s: bit j of the result is the
    * majority vote of bit j across token hashes. SQL-level lambdas
    * (column-indexed shifts need expression-level shiftright). */
  def withSimhash64(docs: DataFrame, textCol: String, out: String = "sim64"): DataFrame =
    docs
      .withColumn("_hs", transform(tokens(col(textCol)), t => xxhash64(t)))
      .withColumn(out, expr(
        """aggregate(
          |  transform(sequence(0, 63), j ->
          |    IF(aggregate(_hs, 0L, (acc, h) -> acc + (shiftright(h, j) & 1L)) * 2 > size(_hs),
          |       shiftleft(1L, j), 0L)),
          |  0L, (acc, x) -> acc | x)""".stripMargin))
      .drop("_hs")

  /** Exact word-set Jaccard pairs within blocks, as a per-block
    * kernel: the relational self-join would shuffle the token arrays
    * once per pair; grouping by the blocking key ships each doc's
    * token set once and scores all in-block pairs with hash sets.
    * Semantics identical to
    * size(array_intersect)/size(array_union) over distinct tokens.
    * Precondition: blocks are bounded (entity-resolution style
    * blocking) — unbounded blocks need the LSH path instead. */
  def jaccardBlockedPairs(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, blockCols: Seq[String], threshold: Double): DataFrame = {
    import spark.implicits._
    docs.select(concat_ws("\u0001", blockCols.map(col): _*).as("block"),
        col(idCol).cast("long").as("id"),
        tokens(col(textCol)).as("ws"))
      .as[(String, Long, Array[String])]
      .groupByKey(_._1)
      .flatMapGroups { (_: String, it: Iterator[(String, Long, Array[String])]) =>
        val ds = it.map { case (_, id, ws) => (id, ws.toSet) }.toArray.sortBy(_._1)
        for {
          i <- ds.indices.iterator
          j <- (i + 1) until ds.length
          (ida, wa) = ds(i)
          (idb, wb) = ds(j)
          inter = wa.count(wb.contains)
          uni = wa.size + wb.size - inter
          jac = inter.toDouble / uni
          if jac >= threshold
        } yield (ida, idb, inter.toLong, uni.toLong, jac)
      }
      .toDF("id_a", "id_b", "inter", "uni", "jac")
  }

  /** SimHash bucketing: same top-`prefixBits` ⇒ candidate group.
    * Token hashes stay SQL `xxhash64` (exactly `withSimhash64`'s
    * values); the 64-bit majority vote runs as a partition kernel —
    * the SQL-lambda form is 64 interpreted folds per row, this is one
    * primitive loop (same outputs, ~10× cheaper). */
  def simhashBuckets(docs: DataFrame, idCol: String, textCol: String,
      prefixBits: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"),
        transform(tokens(col(textCol)), t => xxhash64(t)).as("hs"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Seq[Long])]
      .mapPartitions(_.map { case (id, hs) =>
        val counts = new Array[Int](64)
        hs.foreach { h =>
          var j = 0
          while (j < 64) { counts(j) += ((h >>> j) & 1L).toInt; j += 1 }
        }
        var sim = 0L
        var j = 0
        while (j < 64) { if (counts(j) * 2 > hs.length) sim |= (1L << j); j += 1 }
        (id, sim)
      })
      .toDF("id", "sim64")
      .withColumn("bucket", shiftrightunsigned(col("sim64"), 64 - prefixBits))
      .select(col("id"), col("sim64"), col("bucket"))
  }

  /** SimHash via the polynomial family — bit j of a token's influence
    * is the 1-bit universal hash ((aⱼ·polyHash(t)+bⱼ) mod P32) & 1
    * (family indices 200..263, above any minhash index so the two
    * consumers never share a function), instead of bit j of one
    * 64-bit hash.
    * Random-projection semantics are identical (64 independent ±1
    * votes per token); every step is plain integer arithmetic, so the
    * whole query has an exact DuckDB oracle. Kernel-shaped like
    * simhashBuckets: one primitive loop per row, no interpreted
    * lambdas. */
  def simhashBucketsPoly(docs: DataFrame, idCol: String, textCol: String,
      prefixBits: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"), tokens(col(textCol)).as("toks"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val ab = Array.tabulate(64)(j => affine(200 + j))
        it.map { case (id, toks) =>
        val counts = new Array[Int](64)
        toks.foreach { t =>
          val h = polyHash(t)
          var j = 0
          while (j < 64) {
            val (a, b) = ab(j)
            counts(j) += (pmodL(a * h + b, P32) & 1L).toInt
            j += 1
          }
        }
        var sim = 0L
        var j = 0
        while (j < 64) { if (counts(j) * 2 > toks.length) sim |= (1L << j); j += 1 }
        (id, sim)
        }
      }
      .toDF("id", "sim64")
      .withColumn("bucket", shiftrightunsigned(col("sim64"), 64 - prefixBits))
      .select(col("id"), col("sim64"), col("bucket"))
  }
}
