package graft.nn

import java.util.zip.ZipFile
import scala.collection.mutable

/** Reader for PyTorch's `torch.save` zip checkpoint format — the
  * piece that lets the REAL S3fdNet/TalkNet forwards run REAL weights
  * (reference demoTalkNet.py:58–61 `loadParameters`, utils/tools.py:
  * 29–33, model/faceDetector/s3fd/__init__.py:9–13 all end in
  * `torch.load` of a `.model`/`.pth` artifact).
  *
  * Format (public: PyTorch serialization.py, zipfile container since
  * torch 1.6): a ZIP archive holding `<root>/data.pkl` — a pickle of
  * the saved object where every tensor's storage is externalized as a
  * PERSISTENT ID `('storage', <StorageClass>, key, location, numel)` —
  * plus one raw little-endian payload per storage at
  * `<root>/data/<key>`. Tensors are rebuilt by
  * `torch._utils._rebuild_tensor_v2(storage, offset, size, stride,
  * requires_grad, hooks)`.
  *
  * This loader implements the minimal pickle virtual machine the
  * state_dict object graph needs (protocols 2–5 opcodes emitted by
  * CPython for dict/str/int/tuple/OrderedDict/REDUCE/persistent-id),
  * resolves the two callables that matter (`collections.OrderedDict`,
  * `torch._utils._rebuild_tensor_v2`; anything else becomes an inert
  * opaque value so exotic checkpoint extras don't abort the load),
  * then materializes each tensor ROW-MAJOR through its stride walk —
  * so permuted/transposed saves land in the layout `WeightStore
  * .tensor` serves. Output plugs 1:1 into [[MapWeights]], whose names
  * (`vgg.0.weight`, …) already follow the reference state_dicts.
  *
  * Scale posture: checkpoints load once on the driver (or once per
  * executor from a broadcast of the raw bytes via
  * pipeline/ModelWeights) — this class never appears in a per-row
  * path.
  */
object TorchCheckpoint {

  /** One parsed tensor: row-major doubles + its shape. */
  final case class Entry(name: String, shape: Seq[Int], data: Array[Double])

  // ---------------------------------------------------------------- model

  private final case class GlobalRef(module: String, name: String)
  private final case class StorageRef(dtype: String, key: String, numel: Long)
  private final case class TensorStub(storage: StorageRef, offset: Long,
      size: Seq[Int], stride: Seq[Int])
  private final case class Opaque(callable: Any, args: Any)
  private object Mark

  /** Element width in bytes per torch storage class name. */
  private def dtypeWidth(dtype: String): Int = dtype match {
    case "DoubleStorage" | "LongStorage"  => 8
    case "FloatStorage" | "IntStorage"    => 4
    case "HalfStorage" | "ShortStorage" | "BFloat16Storage" => 2
    case "ByteStorage" | "CharStorage" | "BoolStorage"      => 1
    case other => throw new IllegalArgumentException(s"unsupported storage $other")
  }

  // ------------------------------------------------------------ pickle VM

  /** Run the pickle program and return the final object. The only
    * side channel is `persistent_load`, which torch uses for storages. */
  private[graft] def unpickle(b: Array[Byte]): Any = {
    var i = 0
    def u1: Int = { val v = b(i) & 0xff; i += 1; v }
    def u2: Int = { val v = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8); i += 2; v }
    def i4: Int = {
      val v = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
      i += 4; v
    }
    def u8: Long = {
      var v = 0L; var k = 0
      while (k < 8) { v |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
      i += 8; v
    }
    def bytes(n: Int): Array[Byte] = { val v = b.slice(i, i + n); i += n; v }
    def str(n: Int): String = new String(bytes(n), "UTF-8")
    def line(): String = { // newline-terminated ASCII (GLOBAL/PERSID)
      val s = i
      while (b(i) != '\n') i += 1
      val v = new String(b, s, i - s, "UTF-8"); i += 1; v
    }

    val stack = mutable.ArrayBuffer[Any]()
    val memo = mutable.HashMap[Int, Any]()
    def push(v: Any): Unit = stack += v
    def pop(): Any = { val v = stack.last; stack.dropRightInPlace(1); v }
    def popToMark(): Seq[Any] = {
      val m = stack.lastIndexOf(Mark)
      require(m >= 0, "pickle: no MARK on stack")
      val items = stack.slice(m + 1, stack.length).toSeq
      stack.takeInPlace(m)
      items
    }

    /** torch's persistent-id contract for storages. */
    def persistentLoad(pid: Any): Any = pid match {
      case Vector("storage", GlobalRef(_, cls), key: String, _, numel: Long) =>
        StorageRef(cls, key, numel)
      case other => Opaque("persistent_id", other)
    }

    def reduce(callable: Any, args: Any): Any = (callable, args) match {
      case (GlobalRef("collections", "OrderedDict"), _) =>
        mutable.LinkedHashMap[Any, Any]()
      case (GlobalRef("torch._utils", "_rebuild_tensor_v2"), Vector(st: StorageRef,
          off: Long, size: Vector[_], stride: Vector[_], _*)) =>
        TensorStub(st, off,
          size.map(_.asInstanceOf[Long].toInt).toSeq,
          stride.map(_.asInstanceOf[Long].toInt).toSeq)
      case _ => Opaque(callable, args)
    }

    var done = false
    var result: Any = null
    while (!done) {
      val op = u1
      (op: @annotation.switch) match {
        case 0x80 => u1 // PROTO version
        case 0x95 => u8 // FRAME length (ignored)
        case '.' => result = pop(); done = true
        case '(' => push(Mark)
        case '}' => push(mutable.LinkedHashMap[Any, Any]())
        case ']' => push(mutable.ArrayBuffer[Any]())
        case ')' => push(Vector.empty)
        case 't' => push(popToMark().toVector) // TUPLE
        case 0x85 => push(Vector(pop())) // TUPLE1
        case 0x86 => { val b2 = pop(); val a = pop(); push(Vector(a, b2)) }
        case 0x87 => { val c = pop(); val b2 = pop(); val a = pop(); push(Vector(a, b2, c)) }
        case 'N' => push(null)
        case 0x88 => push(true)  // NEWTRUE
        case 0x89 => push(false) // NEWFALSE
        case 'J' => push(i4.toLong) // BININT
        case 'K' => push(u1.toLong) // BININT1
        case 'M' => push(u2.toLong) // BININT2
        case 0x8a => // LONG1: n bytes little-endian two's complement
          val n = u1
          val bs = bytes(n)
          var v = 0L; var k = 0
          while (k < n) { v |= (bs(k) & 0xffL) << (8 * k); k += 1 }
          if (n > 0 && n < 8 && (bs(n - 1) & 0x80) != 0) v -= 1L << (8 * n)
          push(v)
        case 'G' => // BINFLOAT: big-endian IEEE double
          var v = 0L; var k = 0
          while (k < 8) { v = (v << 8) | (b(i + k) & 0xffL); k += 1 }
          i += 8; push(java.lang.Double.longBitsToDouble(v))
        case 'U' => push(str(u1)) // SHORT_BINSTRING
        case 'T' => push(str(i4)) // BINSTRING
        case 'X' => push(str(i4)) // BINUNICODE
        case 0x8c => push(str(u1)) // SHORT_BINUNICODE
        case 0x8d => push(str(u8.toInt)) // BINUNICODE8
        case 'c' => push(GlobalRef(line(), line())) // GLOBAL
        case 0x93 => { val n = pop().asInstanceOf[String]; val m = pop().asInstanceOf[String]; push(GlobalRef(m, n)) } // STACK_GLOBAL
        case 'P' => push(persistentLoad(line())) // PERSID
        case 'Q' => push(persistentLoad(pop())) // BINPERSID
        case 'R' => { val args = pop(); val f = pop(); push(reduce(f, args)) }
        case 0x81 => { val args = pop(); val f = pop(); push(reduce(f, args)) } // NEWOBJ
        case 'q' => memo(u1) = stack.last // BINPUT
        case 'r' => memo(i4) = stack.last // LONG_BINPUT
        case 0x94 => memo(memo.size) = stack.last // MEMOIZE
        case 'h' => push(memo(u1)) // BINGET
        case 'j' => push(memo(i4)) // LONG_BINGET
        case 's' => // SETITEM
          val v = pop(); val k = pop()
          stack.last.asInstanceOf[mutable.Map[Any, Any]](k) = v
        case 'u' => // SETITEMS
          val items = popToMark()
          val d = stack.last.asInstanceOf[mutable.Map[Any, Any]]
          items.grouped(2).foreach { case Seq(k, v) => d(k) = v }
        case 'a' => { val v = pop(); stack.last.asInstanceOf[mutable.ArrayBuffer[Any]] += v }
        case 'e' =>
          val items = popToMark()
          stack.last.asInstanceOf[mutable.ArrayBuffer[Any]] ++= items
        case 'b' => // BUILD: fold __setstate__ dicts into dicts, else ignore
          val state = pop()
          (stack.last, state) match {
            case (d: mutable.Map[Any @unchecked, Any @unchecked],
                s: mutable.Map[Any @unchecked, Any @unchecked]) => d ++= s
            case _ => ()
          }
        case 0x8f => push(mutable.LinkedHashMap[Any, Any]()) // EMPTY_SET (inert)
        case other =>
          throw new IllegalArgumentException(
            f"pickle opcode 0x$other%02x unsupported at offset ${i - 1}")
      }
    }
    result
  }

  // ----------------------------------------------------------- zip + load

  /** Parse every tensor of a zip-format checkpoint into named entries. */
  def load(path: String): Seq[Entry] = {
    val zf = new ZipFile(path)
    try {
      import scala.jdk.CollectionConverters._
      val all = zf.entries().asScala.toSeq
      val pklEntry = all.find(e => e.getName.endsWith("/data.pkl") || e.getName == "data.pkl")
        .getOrElse(throw new IllegalArgumentException(s"$path: no data.pkl — not a zip checkpoint"))
      val root = pklEntry.getName.stripSuffix("data.pkl")
      def read(name: String): Array[Byte] = {
        val e = zf.getEntry(name)
        require(e != null, s"$path: missing entry $name")
        val in = zf.getInputStream(e)
        try in.readAllBytes() finally in.close()
      }
      val obj = unpickle(read(pklEntry.getName))

      val out = Seq.newBuilder[Entry]
      def walk(prefix: String, v: Any): Unit = v match {
        case d: mutable.Map[Any @unchecked, Any @unchecked] =>
          d.foreach {
            case (k: String, vv) if k != "_metadata" =>
              walk(if (prefix.isEmpty) k else s"$prefix.$k", vv)
            case _ => ()
          }
        case t: TensorStub =>
          out += materialize(prefix, t, read(s"${root}data/${t.storage.key}"))
        case _ => () // ints/strs/opaque extras in the dict
      }
      walk("", obj)
      out.result()
    } finally zf.close()
  }

  /** Decode the raw storage and emit the tensor row-major via its
    * stride walk (handles permuted/transposed saves). */
  private def materialize(name: String, t: TensorStub, raw: Array[Byte]): Entry = {
    val w = dtypeWidth(t.storage.dtype)
    // Byte offsets are computed as (idx*w).toInt over a single
    // Array[Byte]: a storage at/above 2 GiB must fail LOUDLY here,
    // not truncate offsets into corrupt tensors (ADVICE r10).
    require(t.storage.numel * w < Int.MaxValue,
      s"storage ${t.storage.key} ($name): ${t.storage.numel} x $w B " +
        ">= 2 GiB exceeds the single-array loader; unsupported size")
    def elem(idx: Long): Double = {
      val o = (idx * w).toInt
      t.storage.dtype match {
        case "FloatStorage" =>
          java.lang.Float.intBitsToFloat(
            (raw(o) & 0xff) | ((raw(o + 1) & 0xff) << 8) |
              ((raw(o + 2) & 0xff) << 16) | ((raw(o + 3) & 0xff) << 24)).toDouble
        case "DoubleStorage" =>
          var v = 0L; var k = 0
          while (k < 8) { v |= (raw(o + k) & 0xffL) << (8 * k); k += 1 }
          java.lang.Double.longBitsToDouble(v)
        case "LongStorage" =>
          var v = 0L; var k = 0
          while (k < 8) { v |= (raw(o + k) & 0xffL) << (8 * k); k += 1 }
          v.toDouble
        case "IntStorage" =>
          ((raw(o) & 0xff) | ((raw(o + 1) & 0xff) << 8) |
            ((raw(o + 2) & 0xff) << 16) | ((raw(o + 3) & 0xff) << 24)).toDouble
        case "ShortStorage" =>
          ((raw(o) & 0xff) | (raw(o + 1) << 8)).toShort.toDouble
        case "HalfStorage" => // IEEE binary16 → double
          val h = (raw(o) & 0xff) | ((raw(o + 1) & 0xff) << 8)
          halfToDouble(h)
        case "ByteStorage" => (raw(o) & 0xff).toDouble
        case "CharStorage" => raw(o).toDouble
        case "BoolStorage" => if (raw(o) != 0) 1.0 else 0.0
        case other => throw new IllegalArgumentException(s"dtype $other")
      }
    }
    val n = t.size.product
    val data = new Array[Double](math.max(n, 0))
    if (n > 0) {
      val dims = t.size.toArray
      val strides = t.stride.toArray
      val idx = new Array[Int](dims.length)
      var flat = 0
      while (flat < n) {
        var off = t.offset
        var d = 0
        while (d < dims.length) { off += idx(d).toLong * strides(d); d += 1 }
        data(flat) = elem(off)
        // odometer increment, last dim fastest (row-major emit order)
        d = dims.length - 1
        var carry = true
        while (carry && d >= 0) {
          idx(d) += 1
          if (idx(d) == dims(d)) { idx(d) = 0; d -= 1 } else carry = false
        }
        flat += 1
      }
    }
    Entry(name, t.size, data)
  }

  private[graft] def halfToDouble(h: Int): Double = {
    val sign = if ((h & 0x8000) != 0) -1.0 else 1.0
    val exp = (h >> 10) & 0x1f
    val frac = h & 0x3ff
    if (exp == 0) sign * frac * math.pow(2, -24)
    else if (exp == 31) { if (frac == 0) sign * Double.PositiveInfinity else Double.NaN }
    else sign * (1024 + frac) * math.pow(2, exp - 25)
  }

  /** The loader → forward seam: a [[MapWeights]] whose parameters are
    * the checkpoint's, names passed through verbatim (S3fdNet/TalkNet
    * already request PyTorch state_dict names). */
  def toWeights(path: String,
      fallback: WeightStore = DeterministicWeights()): MapWeights =
    MapWeights(load(path).map(e => e.name -> e.data).toMap, fallback)
}
