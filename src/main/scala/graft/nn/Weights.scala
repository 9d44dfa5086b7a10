package graft.nn

/** Named-parameter store for network forwards. A real deployment
  * loads a binary checkpoint through pipeline/ModelWeights (the
  * reference downloads its .pth/.model the same way,
  * model/faceDetector/s3fd/__init__.py:9–13, demoTalkNet.py:63–70);
  * the sandbox default generates DETERMINISTIC pseudo-weights from
  * the same universal-hash family the engine already uses for
  * sampling — every executor materializes bit-identical parameters
  * with no driver broadcast of hundreds of MB, and every spec/oracle
  * run sees the same network. */
trait WeightStore extends Serializable {
  /** Row-major values for parameter `name` with the given shape. */
  def tensor(name: String, shape: Int*): Tensor

  def vector(name: String, n: Int): Array[Double] = tensor(name, n).data
}

object WeightStore {
  private val P32 = 4294967291L

  /** FNV-1a over the name — a stable (JVM-version-independent) layer
    * decorrelator; String.hashCode would also be stable but FNV keeps
    * the bit-mixing independent of Java's 31x chain. */
  def nameHash(name: String): Long = {
    var h = 1469598103934665603L
    var i = 0
    while (i < name.length) { h ^= name.charAt(i).toInt; h *= 1099511628211L; i += 1 }
    h & 0x7fffffffL
  }

  /** uhash(familyIdx ⊕ name, i) → [0, 1). */
  private[nn] def unit(family: Int, name: String, i: Long): Double = {
    val (a, b) = graft.operators.Dedup.affine((family + nameHash(name) % 100003).toInt)
    val h = (a * ((i + 7) % P32) + b) % P32
    h.toDouble / P32.toDouble
  }
}

/** Pseudo-random but fully deterministic parameters:
  *  - `*running_var`  → [0.5, 1.5)   (positive, as a trained var is)
  *  - `*running_mean` → [−0.1, 0.1)
  *  - norm-layer weight/bias (name contains `.bn`/`norm`) → weight
  *    centered at 1, bias small (a trained norm's neighborhood)
  *  - everything else → centered at 0 with a fan-in-ish 1/√n scale,
  *    so deep stacks neither explode nor die (the property the specs
  *    rely on: detections/scores vary with the input). */
final case class DeterministicWeights(family: Int = 7700) extends WeightStore {
  override def tensor(name: String, shape: Int*): Tensor = {
    val n = shape.product
    val isVar = name.endsWith("running_var")
    val isMean = name.endsWith("running_mean")
    val isNorm = name.contains("bn") || name.toLowerCase.contains("norm")
    val scale = if (shape.length <= 1) 0.2 else 2.0 / math.sqrt((n / shape.head).toDouble)
    val data = Array.tabulate(n) { i =>
      val u = WeightStore.unit(family, name, i.toLong)
      if (isVar) 0.5 + u
      else if (isMean) (u - 0.5) * 0.2
      else if (isNorm && name.endsWith("weight")) 0.8 + u * 0.4
      else if (isNorm && name.endsWith("bias")) (u - 0.5) * 0.2
      else (u - 0.5) * scale
    }
    Tensor(shape.toArray, data)
  }
}

/** Explicit parameter map (tests pin hand-computed goldens through
  * this; a checkpoint loader would fill the same map). */
final case class MapWeights(params: Map[String, Array[Double]],
    fallback: WeightStore = DeterministicWeights()) extends WeightStore {
  override def tensor(name: String, shape: Int*): Tensor =
    params.get(name) match {
      case Some(v) =>
        require(v.length == shape.product, s"$name: ${v.length} != ${shape.mkString("x")}")
        Tensor(shape.toArray, v)
      case None => fallback.tensor(name, shape: _*)
    }
}
