package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** LSH candidate pairs with exact-Jaccard verification. Signatures
    * are banded (bands × rowsPerBand = numHashes); docs sharing any
    * band bucket become candidates; only candidates are verified.
    * The bucket join carries only (id, band, bucket) — shingle arrays
    * are re-attached per candidate id afterwards, so the wide arrays
    * are never shuffled through the LSH join. */
  def minhashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 128, bands: Int = 32, threshold: Double = 0.8,
      shingleK: Int = 3): DataFrame = {
    val rows = numHashes / bands
    require(rows * bands == numHashes, "bands must divide numHashes")
    // shingles → token hashes → signature as SEPARATE projections
    // (each column referenced many times downstream, which blocks
    // CollapseProject from re-inlining the expensive expressions).
    // The plan below is diamond-shaped (banded self-join + two toks
    // re-attach joins all read `base`), so materialize the signatures
    // exactly once and truncate lineage — at cluster scale this is the
    // standard checkpoint-before-reuse; recomputing shingling+minhash
    // per branch would multiply the dominant cost 4×.
    val base = docs.select(col(idCol).cast("long").as("id"),
        wordShingles(col(textCol), shingleK).as("toks"))
      .withColumn("h32", tokenHashes(col("toks")))
      .withColumn("sig", minhashSignature(col("h32"), numHashes))
      .drop("h32")
      .localCheckpoint()
    val banded = base.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",",
          transform(slice(col("sig"), b * rows + 1, lit(rows)), x => x.cast("string"))), b)))
        .as(Seq("band", "bucket")))
    val cand = banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
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

  /** SimHash bucketing: same top-`prefixBits` ⇒ candidate group. */
  def simhashBuckets(docs: DataFrame, idCol: String, textCol: String,
      prefixBits: Int = 16): DataFrame =
    withSimhash64(docs.select(col(idCol).cast("long").as("id"), col(textCol)), textCol)
      .withColumn("bucket", shiftrightunsigned(col("sim64"), 64 - prefixBits))
      .select(col("id"), col("sim64"), col("bucket"))
}
