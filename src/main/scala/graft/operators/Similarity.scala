package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest neighbour over embedding columns: random
  * hyperplane LSH (sign-bit bucketing) and IVF-style coarse
  * quantization (nprobe=1) on top of the exact cosine kernel. The
  * brute-force baseline is VectorQueries.q27; these are the scale
  * paths — at 100 TB the bucket/cell join touches only colliding
  * candidates instead of the full corpus per query.
  *
  * Scale shape (both paths): ONE kernel pass over the corpus computes
  * (vd, n2, bucket) — no self-join back onto the scan — and the small
  * query side is broadcast, so the corpus is never shuffled; the only
  * wide exchange is the per-bucket top-k window, keyed by qid.
  *
  * The plane matrix is hash-derived (universal family index
  * 1000 + j·dim + d — one function per COMPONENT, hashed jointly over
  * (plane, dimension) so components are decorrelated across both axes,
  * not a per-plane arithmetic progression), not PRNG-drawn: component
  * (j,d) is ((aᵢ·(d+1)+bᵢ) mod P32)/P32 − 0.5 with i = 1000+j·dim+d —
  * uniform in [−0.5, 0.5), deterministic across executors/JVMs, and
  * reproducible in plain SQL, which gives the ANN queries an exact
  * DuckDB oracle (sign-LSH needs any symmetric component
  * distribution, not specifically a Gaussian).
  */
object Similarity {

  private val P32 = 4294967291L

  /** Hard ceiling on the QUERY side of every ANN entry point. The
    * corpus side streams unshuffled at any scale, but queries are
    * broadcast (and, for PQ, their LUTs plus one per-partition heap
    * slot each), so an unbounded query set is the one structure here
    * that could grow with the corpus — at the default the LUT
    * broadcast stays ≈ 16 MB. Callers with a genuinely larger query
    * load should batch queries through the *For entry points. */
  val DefaultMaxQueries = 16384

  /** Enforces the query-side bound WITHOUT counting the full set: a
    * `limit(max+1)` count stops scanning as soon as the bound is
    * provably exceeded, so the guard's cost is O(maxQueries) rows
    * regardless of corpus size. Returns `queries` unchanged. */
  def boundedQueries(queries: DataFrame, maxQueries: Int, who: String): DataFrame = {
    val n = queries.limit(maxQueries + 1).count()
    require(n <= maxQueries,
      s"$who: query set exceeds maxQueries=$maxQueries (got > $maxQueries rows); " +
        "pass a bounded queries DataFrame or raise maxQueries explicitly")
    queries
  }

  /** Deterministic hash-derived hyperplanes: `bits` planes × `dim`. */
  def planes(bits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(bits, dim) { (j, d) =>
      val (a, b) = Dedup.affine(1000 + j * dim + d)
      (((a * (d + 1) + b) % P32).toDouble / P32) - 0.5
    }

  /** Sign-bit bucket of one vector. */
  def bucketOf(v: Array[Float], pl: Array[Array[Double]]): Long = {
    var bucket = 0L
    var j = 0
    while (j < pl.length) {
      var dot = 0.0
      val p = pl(j)
      var d = 0
      while (d < p.length && d < v.length) { dot += p(d) * v(d); d += 1 }
      if (dot > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  /** (vec_id, embedding) → (vec_id, bucket) via a partition kernel. */
  def bucketed(spark: SparkSession, emb: DataFrame, bits: Int = 12): DataFrame = {
    import spark.implicits._
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    val pl = planes(bits, dim)
    emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it => it.map { case (id, v) => (id, bucketOf(v, pl)) } }
      .toDF("vec_id", "bucket")
  }

  /** Single corpus pass: (vec_id, vd, n2, bucket) with `bucket` from
    * an arbitrary per-vector function — no join back onto the scan. */
  private def corpusPass(spark: SparkSession, emb: DataFrame)(
      f: Array[Float] => Long): DataFrame = {
    import spark.implicits._
    emb.select(col("vec_id").cast("long"), col("embedding"))
      // dot-product bucketing is CPU-bound: parallelism = cores
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.map { case (id, v) =>
          val vd = new Array[Double](v.length)
          var n2 = 0.0
          var d = 0
          while (d < v.length) { vd(d) = v(d).toDouble; n2 += vd(d) * vd(d); d += 1 }
          (id, vd, n2, f(v))
        }
      }.toDF("vec_id", "vd", "n2", "bucket")
  }

  /** Same per-vector kernel as corpusPass but for the (bounded) QUERY
    * side: (qid, qv, qn2, qbucket). No repartition — the set is small
    * by contract. The arithmetic is the identical loop, so a vector
    * appearing on both sides gets bit-identical vd/n2/bucket. */
  private def queryPass(spark: SparkSession, queries: DataFrame)(
      f: Array[Float] => Long): DataFrame = {
    import spark.implicits._
    queries.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.map { case (id, v) =>
          val vd = new Array[Double](v.length)
          var n2 = 0.0
          var d = 0
          while (d < v.length) { vd(d) = v(d).toDouble; n2 += vd(d) * vd(d); d += 1 }
          (id, vd, n2, f(v))
        }
      }.toDF("qid", "qv", "qn2", "qbucket")
  }

  /** Shared tail: broadcast the (bounded) query rows, candidate-join
    * within bucket, exact-cosine rank, top-k. */
  private def topKWithin(withB: DataFrame, qs: DataFrame, k: Int): DataFrame = {
    val corpus = withB.select(col("vec_id").as("cid"), col("vd").as("cv"),
      col("n2").as("cn2"), col("bucket"))
    corpus.join(broadcast(qs), col("bucket") === col("qbucket") && col("cid") =!= col("qid"))
      .withColumn("cos",
        graft.functions.VectorExprs.dotp(col("qv"), col("cv"))
          / (sqrt(col("qn2")) * sqrt(col("cn2"))))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))).cast("long"))
      .filter(col("rank") <= k)
  }

  /** ANN top-k: candidates share an LSH bucket; exact cosine ranks
    * them. Queries = vec_id % `queryEvery` == 0 (as q27). */
  def annTopK(spark: SparkSession, emb: DataFrame, k: Int = 10,
      bits: Int = 12, queryEvery: Int = 50,
      maxQueries: Int = DefaultMaxQueries): DataFrame =
    annTopKFor(spark, emb, emb.filter(col("vec_id") % queryEvery === 0),
      k, bits, maxQueries)

  /** annTopK against an EXPLICIT query DataFrame(vec_id, embedding) —
    * the production entry: the query set is an external bounded input,
    * never corpus-derived. Enforced by `boundedQueries`. */
  def annTopKFor(spark: SparkSession, emb: DataFrame, queries: DataFrame,
      k: Int = 10, bits: Int = 12,
      maxQueries: Int = DefaultMaxQueries): DataFrame = {
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    val pl = planes(bits, dim)
    val withB = corpusPass(spark, emb)(v => bucketOf(v, pl))
    val qs = queryPass(spark,
      boundedQueries(queries, maxQueries, "annTopK"))(v => bucketOf(v, pl))
    topKWithin(withB, qs, k)
      .select(col("qid"), col("rank"), col("cid"), round(col("cos"), 6).as("cos_r"))
  }

  /** Top-`n` centroid ids for a vector by (dot desc, cent_id asc) —
    * the tie order mirrors the SQL oracle's
    * `ORDER BY dot DESC, cent_id`. */
  private def probeCells(v: Array[Double],
      cs: Array[(Long, Array[Double])], n: Int): Array[Long] =
    cs.map { case (id, p) =>
      var dot = 0.0; var d = 0
      while (d < p.length && d < v.length) { dot += p(d) * v(d); d += 1 }
      (id, dot)
    }.sortBy { case (id, dot) => (-dot, id) }.take(n).map(_._1)

  /** Product-quantization ANN with asymmetric distance (ADC) — the
    * compressed-corpus member of the similarity family (brute q27,
    * sign-LSH q43, IVF q52/q69). The corpus is stored as `m` codes of
    * log₂(ksub) bits each (here 8×4 bits = 4 bytes vs 256 bytes of
    * floats — the representation that lets 100 TB of embeddings sit in
    * executor memory); each QUERY keeps its exact vector and scores a
    * corpus row in O(m) table lookups instead of O(dim) multiplies.
    *
    * Codebook seat: per subspace, the subvectors of the `ksub` corpus
    * rows whose ids hash lowest under the universal family (index
    * 6000 — disjoint from every other consumer), i.e. a fixed-size
    * pseudo-random sample — O(ksub) driver collect regardless of
    * corpus size; per-subspace k-means drops in unchanged.
    *
    * Scale shape: ONE corpus pass encodes codes (no join back onto the
    * scan); queries + their m×ksub distance LUTs broadcast; the ADC
    * scan keeps a bounded per-(partition, query) top-k heap so only
    * partitions×queries×k candidate rows ever shuffle — the
    * corpus×queries product never materializes. Exact top-k of a total
    * order ((adc, cid) — cid unique) is partition-independent, so the
    * heap + global window equals the full-sort result and the plain
    * SQL oracle. Every distance is the same 0-seeded ascending fold on
    * both engines — bit-exact doubles. */
  def pqTopK(spark: SparkSession, emb: DataFrame, k: Int = 10,
      m: Int = 8, ksub: Int = 16, queryEvery: Int = 50,
      maxQueries: Int = DefaultMaxQueries): DataFrame =
    pqTopKFor(spark, emb, emb.filter(col("vec_id") % queryEvery === 0),
      k, m, ksub, maxQueries)

  /** pqTopK against an EXPLICIT query DataFrame(vec_id, embedding).
    * The m×ksub distance LUTs are built DISTRIBUTIVELY — a kernel over
    * the broadcast codebook on the query partitions — and only the
    * compact LUT rows (≤ maxQueries × m·ksub doubles, enforced by a
    * bounded take) ever reach the driver; the raw query vectors never
    * do. Per-partition heap arrays are likewise ≤ maxQueries slots. */
  def pqTopKFor(spark: SparkSession, emb: DataFrame, queries: DataFrame,
      k: Int = 10, m: Int = 8, ksub: Int = 16,
      maxQueries: Int = DefaultMaxQueries): DataFrame = {
    import spark.implicits._
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    val (ha, hb) = Dedup.affine(6000)
    val idHash = pmod(lit(ha) * pmod(col("vec_id").cast("long"), lit(P32)) + lit(hb), lit(P32))
    // cent_k = position in (hash, vec_id) order — the oracle's row_number
    val cents: Array[Array[Double]] = emb
      .select(col("vec_id").cast("long"), col("embedding"))
      .withColumn("h", idHash)
      .orderBy(col("h"), col("vec_id"))
      .limit(ksub)
      .select(col("embedding")).as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    require(cents.length == ksub, s"corpus smaller than ksub=$ksub")
    val bcC = spark.sparkContext.broadcast(cents)
    // ‖v_m − c_m‖² with the j-ascending 0-seeded fold the oracle mirrors
    def subDist(v: Array[Float], c: Array[Double], mm: Int): Double = {
      var dsum = 0.0; var j = 0
      while (j < sub) {
        val diff = v(mm * sub + j).toDouble - c(mm * sub + j)
        dsum += diff * diff; j += 1
      }
      dsum
    }
    val codes = emb.select(col("vec_id").cast("long"), col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bcC.value
        it.map { case (id, v) =>
          val code = new Array[Int](m)
          var mm = 0
          while (mm < m) {
            var best = 0; var bestD = Double.MaxValue; var kk = 0
            while (kk < ksub) {
              val d = subDist(v, cs(kk), mm)
              if (d < bestD) { bestD = d; best = kk } // strict < ⇒ min k on ties
              kk += 1
            }
            code(mm) = best; mm += 1
          }
          (id, code)
        }
      }.toDF("cid", "code")
    // query LUTs: lut(mm·ksub + kk) = ‖q_mm − c_kk,mm‖² — computed on
    // the EXECUTORS against the broadcast codebook; the driver takes
    // at most maxQueries+1 compact LUT rows (the +1 proves overflow),
    // so no driver structure scales with the corpus.
    val lutRows: Array[(Long, Array[Double])] = queries
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bcC.value
        it.map { case (qid, qv) =>
          val lut = new Array[Double](m * ksub)
          var mm = 0
          while (mm < m) {
            var kk = 0
            while (kk < ksub) { lut(mm * ksub + kk) = subDist(qv, cs(kk), mm); kk += 1 }
            mm += 1
          }
          (qid, lut)
        }
      }
      .take(maxQueries + 1)
    require(lutRows.length <= maxQueries,
      s"pqTopK: query set exceeds maxQueries=$maxQueries; " +
        "pass a bounded queries DataFrame or raise maxQueries explicitly")
    val luts = lutRows.sortBy(_._1)
    val bcL = spark.sparkContext.broadcast(luts)
    val kk = k
    val cand = codes.as[(Long, Array[Int])]
      .mapPartitions { it =>
        val ls = bcL.value
        // bounded per-(partition, query) top-k by (adc, cid) — total
        // order, so local pruning cannot change the global top-k
        val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
        val heaps = Array.fill(ls.length)(
          collection.mutable.PriorityQueue.empty[(Double, Long)](ord))
        it.foreach { case (cid, code) =>
          var qi = 0
          while (qi < ls.length) {
            val (qid, lut) = ls(qi)
            if (cid != qid) {
              var adc = 0.0; var mm = 0
              while (mm < m) { adc += lut(mm * ksub + code(mm)); mm += 1 }
              val h = heaps(qi)
              if (h.size < kk) h.enqueue((adc, cid))
              else if (ord.lt((adc, cid), h.head)) { h.dequeue(); h.enqueue((adc, cid)) }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (adc, cid) => (ls(qi)._1, cid, adc) }
        }
      }.toDF("qid", "cid", "adc")
    cand
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("adc"), col("cid"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), round(col("adc"), 6).as("adc_r"))
  }

  /** IVF-style ANN: a small deterministic coarse codebook — the
    * `codebookSize` vectors whose ids hash lowest under the universal
    * family (index 5000), i.e. a FIXED-SIZE pseudo-random sample —
    * every vector assigned to its max-dot cell inside the same corpus
    * pass, exact cosine only within probed cells. A trained k-means
    * codebook drops in unchanged.
    *
    * `nprobe` is the standard recall knob: each QUERY probes its
    * `nprobe` best cells (the corpus side always indexes into exactly
    * one). Cells are disjoint, so probing unions candidates without
    * deduplication; candidate cost grows linearly in nprobe while the
    * corpus is still never shuffled.
    *
    * At scale: the codebook selection is a distributed top-N
    * (TakeOrdered), so the driver collect and the per-executor
    * broadcast are O(codebookSize) regardless of corpus size — never
    * linear in the corpus.
    */
  def ivfTopK(spark: SparkSession, emb: DataFrame, k: Int = 10,
      codebookSize: Int = 64, queryEvery: Int = 50, nprobe: Int = 1,
      maxQueries: Int = DefaultMaxQueries): DataFrame =
    ivfTopKFor(spark, emb, emb.filter(col("vec_id") % queryEvery === 0),
      k, codebookSize, nprobe, maxQueries)

  /** ivfTopK against an EXPLICIT query DataFrame(vec_id, embedding) —
    * query side bounded by `boundedQueries`, corpus side unchanged. */
  def ivfTopKFor(spark: SparkSession, emb: DataFrame, queries: DataFrame,
      k: Int = 10, codebookSize: Int = 64, nprobe: Int = 1,
      maxQueries: Int = DefaultMaxQueries): DataFrame = {
    import spark.implicits._
    val (ha, hb) = Dedup.affine(5000)
    // uhash(5000, vec_id mod P32): id reduced into the ring first so
    // a·x never overflows 2^63 even for 64-bit ids at 100 TB scale
    val idHash = pmod(lit(ha) * pmod(col("vec_id").cast("long"), lit(P32)) + lit(hb), lit(P32))
    val cents: Array[(Long, Array[Double])] = emb
      .select(col("vec_id").cast("long"), col("embedding"))
      .withColumn("h", idHash)
      .orderBy(col("h"), col("vec_id"))
      .limit(codebookSize)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => (id, v.map(_.toDouble)) }
      .sortBy(_._1)
    val bc = emb.sparkSession.sparkContext.broadcast(cents)
    val withC = corpusPass(spark, emb) { v =>
      val vd = new Array[Double](v.length)
      var d = 0
      while (d < v.length) { vd(d) = v(d).toDouble; d += 1 }
      probeCells(vd, bc.value, 1)(0)
    }
    val bounded = boundedQueries(queries, maxQueries, "ivfTopK")
    if (nprobe <= 1) {
      val qs = queryPass(spark, bounded) { v =>
        val vd = new Array[Double](v.length)
        var d = 0
        while (d < v.length) { vd(d) = v(d).toDouble; d += 1 }
        probeCells(vd, bc.value, 1)(0)
      }
      topKWithin(withC, qs, k)
        .select(col("qid"), col("bucket").cast("long").as("cell"), col("rank"),
          col("cid"), round(col("cos"), 6).as("cos_r"))
    } else {
      // query side explodes to its nprobe best cells; the broadcast
      // stays O(queries·nprobe) and the corpus side is untouched
      val qs = bounded
        .select(col("vec_id").cast("long"), col("embedding"))
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          it.flatMap { case (id, v) =>
            val vd = new Array[Double](v.length)
            var n2 = 0.0
            var d = 0
            while (d < v.length) { vd(d) = v(d).toDouble; n2 += vd(d) * vd(d); d += 1 }
            probeCells(vd, bc.value, nprobe).map(cell => (id, vd, n2, cell))
          }
        }
        .toDF("qid", "qv", "qn2", "qbucket")
      val corpus = withC.select(col("vec_id").as("cid"), col("vd").as("cv"),
        col("n2").as("cn2"), col("bucket"))
      corpus.join(broadcast(qs), col("bucket") === col("qbucket") && col("cid") =!= col("qid"))
        .withColumn("cos",
          graft.functions.VectorExprs.dotp(col("qv"), col("cv"))
            / (sqrt(col("qn2")) * sqrt(col("cn2"))))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))).cast("long"))
        .filter(col("rank") <= k)
        .select(col("qid"), col("rank"), col("cid"), round(col("cos"), 6).as("cos_r"))
    }
  }

  /** IVF-PQ composite — the FAISS IVFPQ memory/scan shape with
    * `by_residual=false`: the coarse IVF codebook (family 5000)
    * prunes CANDIDATES (each query scans only its `nprobe` cells)
    * while the PQ codebook (family 6000) compresses the DISTANCE math
    * (ADC over `m` log₂(ksub)-bit codes). Both deterministic codebook
    * constructions are reused UNCHANGED from ivfTopK/pqTopK, so
    * trained k-means codebooks drop into the same seats.
    *
    * Scale shape: ONE corpus pass emits (cell, code) — 4 bytes of
    * code + a cell id per vector, the representation that keeps a
    * 100 TB corpus's index in executor memory; queries broadcast
    * (probe set + m×ksub LUT); the scan is pqTopK's bounded-heap ADC
    * behind a cell gate, so per-query candidate work drops by
    * ~codebookSize/nprobe and the corpus never shuffles. Exactness:
    * (adc, cid) is a total order, so partition-local heaps + the
    * global window equal the full sort — the SQL oracle composes the
    * q52 cell CTEs with the q78 PQ CTEs. */
  def ivfPqTopK(spark: SparkSession, emb: DataFrame, k: Int = 10,
      codebookSize: Int = 64, nprobe: Int = 1, m: Int = 8, ksub: Int = 16,
      queryEvery: Int = 50, maxQueries: Int = DefaultMaxQueries): DataFrame =
    ivfPqTopKFor(spark, emb, emb.filter(col("vec_id") % queryEvery === 0),
      k, codebookSize, nprobe, m, ksub, maxQueries)

  /** ivfPqTopK against an EXPLICIT query DataFrame(vec_id, embedding). */
  def ivfPqTopKFor(spark: SparkSession, emb: DataFrame, queries: DataFrame,
      k: Int = 10, codebookSize: Int = 64, nprobe: Int = 1,
      m: Int = 8, ksub: Int = 16,
      maxQueries: Int = DefaultMaxQueries): DataFrame = {
    import spark.implicits._
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    // seed rows in (uhash(family), vec_id) order — O(n) driver collect
    def seeds(family: Int, n: Int, what: String): Array[(Long, Array[Double])] = {
      val (ha, hb) = Dedup.affine(family)
      val h = pmod(lit(ha) * pmod(col("vec_id").cast("long"), lit(P32)) + lit(hb), lit(P32))
      val rows = emb.select(col("vec_id").cast("long"), col("embedding"))
        .withColumn("h", h).orderBy(col("h"), col("vec_id")).limit(n)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect()
        .map { case (id, v) => (id, v.map(_.toDouble)) }
      require(rows.length == n, s"corpus smaller than $what=$n")
      rows
    }
    val coarse = seeds(5000, codebookSize, "codebookSize").sortBy(_._1)
    val pqCents: Array[Array[Double]] = seeds(6000, ksub, "ksub").map(_._2)
    val bcCoarse = spark.sparkContext.broadcast(coarse)
    val bcPq = spark.sparkContext.broadcast(pqCents)
    def subDist(v: Array[Double], c: Array[Double], mm: Int): Double = {
      var dsum = 0.0; var j = 0
      while (j < sub) {
        val diff = v(mm * sub + j) - c(mm * sub + j)
        dsum += diff * diff; j += 1
      }
      dsum
    }
    def toD(v: Array[Float]): Array[Double] = {
      val vd = new Array[Double](v.length)
      var d = 0
      while (d < v.length) { vd(d) = v(d).toDouble; d += 1 }
      vd
    }
    // ONE corpus pass: coarse cell + PQ code per vector
    val codes = emb.select(col("vec_id").cast("long"), col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bcCoarse.value
        val pc = bcPq.value
        it.map { case (id, v) =>
          val vd = toD(v)
          val cell = probeCells(vd, cs, 1)(0)
          val code = new Array[Int](m)
          var mm = 0
          while (mm < m) {
            var best = 0; var bestD = Double.MaxValue; var kk = 0
            while (kk < ksub) {
              val d = subDist(vd, pc(kk), mm)
              if (d < bestD) { bestD = d; best = kk } // strict < ⇒ min k on ties
              kk += 1
            }
            code(mm) = best; mm += 1
          }
          (id, cell, code)
        }
      }.toDF("cid", "cell", "code")
    val bounded = boundedQueries(queries, maxQueries, "ivfPqTopK")
    val lutRows: Array[(Long, Array[Long], Array[Double])] = bounded
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bcCoarse.value
        val pc = bcPq.value
        it.map { case (qid, qv) =>
          val vd = toD(qv)
          val lut = new Array[Double](m * ksub)
          var mm = 0
          while (mm < m) {
            var kk = 0
            while (kk < ksub) { lut(mm * ksub + kk) = subDist(vd, pc(kk), mm); kk += 1 }
            mm += 1
          }
          (qid, probeCells(vd, cs, nprobe), lut)
        }
      }
      .take(maxQueries + 1)
    require(lutRows.length <= maxQueries,
      s"ivfPqTopK: query set exceeds maxQueries=$maxQueries; " +
        "pass a bounded queries DataFrame or raise maxQueries explicitly")
    val luts = lutRows.sortBy(_._1)
    val bcL = spark.sparkContext.broadcast(luts)
    val kk = k
    val cand = codes.as[(Long, Long, Array[Int])]
      .mapPartitions { it =>
        val ls = bcL.value
        val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
        val heaps = Array.fill(ls.length)(
          collection.mutable.PriorityQueue.empty[(Double, Long)](ord))
        it.foreach { case (cid, cell, code) =>
          var qi = 0
          while (qi < ls.length) {
            val (qid, probes, lut) = ls(qi)
            // nprobe is tiny — linear membership beats a set per row
            var hit = false
            var pi = 0
            while (pi < probes.length && !hit) { hit = probes(pi) == cell; pi += 1 }
            if (hit && cid != qid) {
              var adc = 0.0; var mm = 0
              while (mm < m) { adc += lut(mm * ksub + code(mm)); mm += 1 }
              val h = heaps(qi)
              if (h.size < kk) h.enqueue((adc, cid))
              else if (ord.lt((adc, cid), h.head)) { h.dequeue(); h.enqueue((adc, cid)) }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (adc, cid) => (ls(qi)._1, cid, adc) }
        }
      }.toDF("qid", "cid", "adc")
    cand
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("adc"), col("cid"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), round(col("adc"), 6).as("adc_r"))
  }
}
