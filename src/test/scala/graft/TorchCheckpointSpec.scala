package graft

import graft.nn.{MapWeights, Tensor, TorchCheckpoint}
import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite

/** TorchCheckpoint against synthetic checkpoints authored byte-by-byte
  * in the REAL torch.save zip format (PyTorch serialization.py): a zip
  * holding `archive/data.pkl` — protocol-2 pickle of a dict whose
  * tensors are `torch._utils._rebuild_tensor_v2` REDUCEs over
  * `('storage', <cls>, key, 'cpu', numel)` persistent ids — plus one
  * raw little-endian payload per storage under `archive/data/`.
  * The mini-pickler below emits exactly the opcode stream CPython
  * produces for this object graph.
  */
class TorchCheckpointSpec extends AnyFunSuite {

  // ------------------------------------------------------- mini-pickler

  private final class Pickler {
    val out = new ByteArrayOutputStream()
    def op(c: Char): this.type = { out.write(c.toInt); this }
    def op(c: Int): this.type = { out.write(c); this }
    def proto(): this.type = { out.write(0x80); out.write(2); this }
    def str(s: String): this.type = { // BINUNICODE
      val b = s.getBytes("UTF-8")
      op('X'); i4(b.length); out.write(b); this
    }
    def i4(v: Int): this.type = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff); this
    }
    def int(v: Int): this.type = { op('J'); i4(v) } // BININT
    def global(m: String, n: String): this.type = {
      op('c'); out.write(s"$m\n$n\n".getBytes("UTF-8")); this
    }
    def tupleOf(body: => Unit): this.type = { op('('); body; op('t'); this }
    def bytesDone: Array[Byte] = { op('.'); out.toByteArray }

    /** The _rebuild_tensor_v2 REDUCE for one storage-backed tensor. */
    def tensor(cls: String, key: String, numel: Int, offset: Int,
        size: Seq[Int], stride: Seq[Int]): this.type = {
      global("torch._utils", "_rebuild_tensor_v2")
      tupleOf {
        tupleOf { str("storage"); global("torch", cls); str(key); str("cpu"); int(numel) }
        op('Q') // BINPERSID
        int(offset)
        tupleOf { size.foreach(int) }
        tupleOf { stride.foreach(int) }
        op(0x89) // False (requires_grad)
        global("collections", "OrderedDict"); op(')'); op('R') // hooks
      }
      op('R')
    }
  }

  private def leFloats(vs: Seq[Float]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(4 * vs.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putFloat); b.array()
  }
  private def leDoubles(vs: Seq[Double]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 * vs.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putDouble); b.array()
  }

  private def writeZip(pkl: Array[Byte], storages: Map[String, Array[Byte]]): String = {
    val f = java.nio.file.Files.createTempFile("ckpt", ".pth")
    val z = new ZipOutputStream(java.nio.file.Files.newOutputStream(f))
    def put(name: String, bytes: Array[Byte]): Unit = {
      z.putNextEntry(new ZipEntry(name)); z.write(bytes); z.closeEntry()
    }
    put("archive/version", "3\n".getBytes)
    put("archive/data.pkl", pkl)
    storages.foreach { case (k, v) => put(s"archive/data/$k", v) }
    z.close()
    f.toString
  }

  /** dict with a float32 conv weight, a float64 bias, and a nested
    * sub-dict (flattened with a dotted prefix like a module tree). */
  private lazy val path: String = {
    val w = Seq.tabulate(18)(i => (i * 7 % 5 - 2).toFloat) // (2,1,3,3)
    val bias = Seq(0.5, -1.25)
    val p = new Pickler
    p.proto()
    p.op('}') // EMPTY_DICT
    p.op('(')
    p.str("vgg.0.weight").tensor("FloatStorage", "0", 18, 0, Seq(2, 1, 3, 3), Seq(9, 9, 3, 1))
    p.str("vgg.0.bias").tensor("DoubleStorage", "1", 2, 0, Seq(2), Seq(1))
    // transposed view: storage 0..5, size (2,3), stride (1,2) →
    // row-major [s0, s2, s4, s1, s3, s5]
    p.str("proj.t").tensor("FloatStorage", "2", 6, 0, Seq(2, 3), Seq(1, 2))
    // offset view: last 3 of 5
    p.str("proj.off").tensor("FloatStorage", "3", 5, 2, Seq(3), Seq(1))
    p.op('u') // SETITEMS
    writeZip(p.bytesDone, Map(
      "0" -> leFloats(w),
      "1" -> leDoubles(bias),
      "2" -> leFloats(Seq(0f, 1f, 2f, 3f, 4f, 5f)),
      "3" -> leFloats(Seq(9f, 9f, 10f, 11f, 12f))))
  }

  test("zip checkpoint parses: names, shapes, float32/float64 payloads") {
    val es = TorchCheckpoint.load(path).map(e => e.name -> e).toMap
    assert(es.keySet == Set("vgg.0.weight", "vgg.0.bias", "proj.t", "proj.off"))
    assert(es("vgg.0.weight").shape == Seq(2, 1, 3, 3))
    assert(es("vgg.0.weight").data.toSeq ==
      Seq.tabulate(18)(i => (i * 7 % 5 - 2).toDouble))
    assert(es("vgg.0.bias").data.toSeq == Seq(0.5, -1.25))
  }

  test("non-contiguous stride walk materializes row-major") {
    val es = TorchCheckpoint.load(path).map(e => e.name -> e).toMap
    assert(es("proj.t").data.toSeq == Seq(0.0, 2.0, 4.0, 1.0, 3.0, 5.0))
    assert(es("proj.off").data.toSeq == Seq(10.0, 11.0, 12.0))
  }

  test("loaded weights drive a forward identically to directly-built ones") {
    val ws: MapWeights = TorchCheckpoint.toWeights(path)
    val img = Tensor(Array(1, 4, 4), Array.tabulate(16)(_.toDouble))
    val viaCkpt = Tensor.conv2d(img,
      ws.tensor("vgg.0.weight", 2, 1, 3, 3),
      Some(ws.vector("vgg.0.bias", 2)), padH = 1, padW = 1)
    val direct = Tensor.conv2d(img,
      Tensor(Array(2, 1, 3, 3), Array.tabulate(18)(i => (i * 7 % 5 - 2).toDouble)),
      Some(Array(0.5, -1.25)), padH = 1, padW = 1)
    assert(viaCkpt.data.toSeq == direct.data.toSeq)
  }

  test("nested state_dict dicts flatten with dotted prefixes") {
    // {"module": {"fc.weight": T}} → "module.fc.weight"
    val p = new Pickler
    p.proto()
    p.op('}')
    p.op('(')
    p.str("module")
    p.op('}')
    p.op('(')
    p.str("fc.weight").tensor("FloatStorage", "0", 2, 0, Seq(2), Seq(1))
    p.op('u')
    p.op('u')
    val f = writeZip(p.bytesDone, Map("0" -> leFloats(Seq(3f, 4f))))
    val es = TorchCheckpoint.load(f)
    assert(es.map(_.name) == Seq("module.fc.weight"))
    assert(es.head.data.toSeq == Seq(3.0, 4.0))
  }

  test("OrderedDict state_dict (REDUCE form) parses like a plain dict") {
    val p = new Pickler
    p.proto()
    p.global("collections", "OrderedDict"); p.op(')'); p.op('R')
    p.op('(')
    p.str("w").tensor("FloatStorage", "0", 1, 0, Seq(1), Seq(1))
    p.op('u')
    val f = writeZip(p.bytesDone, Map("0" -> leFloats(Seq(7f))))
    assert(TorchCheckpoint.load(f).map(e => e.name -> e.data.toSeq) ==
      Seq("w" -> Seq(7.0)))
  }

  test("half-precision conversion") {
    assert(TorchCheckpoint.halfToDouble(0x3c00) == 1.0)
    assert(TorchCheckpoint.halfToDouble(0xc000) == -2.0)
    assert(TorchCheckpoint.halfToDouble(0x0001) == math.pow(2, -24)) // subnormal
    assert(TorchCheckpoint.halfToDouble(0x7c00).isInfinite)
  }

  test("ModelWeights.loadCheckpoint: fetch-if-missing + parse in one call") {
    val cache = java.nio.file.Files.createTempDirectory("wcache").toString
    val ws = graft.pipeline.ModelWeights.loadCheckpoint(
      s"file:$path", "s3fd.pth", cache)
    assert(ws.tensor("vgg.0.weight", 2, 1, 3, 3).data.toSeq ==
      Seq.tabulate(18)(i => (i * 7 % 5 - 2).toDouble))
    // unknown names fall back to the deterministic store (documented)
    assert(ws.tensor("vgg.2.weight", 2, 1, 3, 3).data.length == 18)
  }

  test("memoized keys (BINPUT/BINGET) resolve") {
    // CPython memoizes repeated strings; emit one via BINPUT/BINGET
    val p = new Pickler
    p.proto()
    p.op('}')
    p.op('(')
    p.str("w"); p.op('q'); p.op(5) // BINPUT 5
    p.tensor("FloatStorage", "0", 1, 0, Seq(1), Seq(1))
    p.op('u')
    val f = writeZip(p.bytesDone, Map("0" -> leFloats(Seq(1f))))
    assert(TorchCheckpoint.load(f).map(_.name) == Seq("w"))
  }
}
