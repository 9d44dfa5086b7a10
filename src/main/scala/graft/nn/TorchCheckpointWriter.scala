package graft.nn

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Writer for the torch.save zip checkpoint format — the counterpart
  * of [[TorchCheckpoint]]: emits the protocol-2 pickle opcode stream
  * CPython produces for a `dict[str, Tensor]` state_dict (tensors as
  * `torch._utils._rebuild_tensor_v2` REDUCEs over `('storage', cls,
  * key, 'cpu', numel)` persistent ids) plus one raw little-endian
  * float32 payload per storage. Exists so fixtures and the q223
  * loader-roundtrip audit can materialize REAL-format checkpoints
  * deterministically without shipping binary blobs; a file it writes
  * is accepted by `torch.load` and by [[TorchCheckpoint.load]] alike.
  */
object TorchCheckpointWriter {

  /** Write `tensors` (name → (shape, row-major values)) as a zip
    * checkpoint; returns the serialized bytes. `doublePrecision`
    * emits torch.DoubleStorage payloads (8-byte LE doubles) instead
    * of FloatStorage — the q242 audit weights include values like
    * fl(1−1e-5) whose exactness a float32 roundtrip would destroy. */
  def write(tensors: Seq[(String, (Seq[Int], Array[Double]))],
      doublePrecision: Boolean = false): Array[Byte] = {
    val pkl = new ByteArrayOutputStream()
    def op(c: Int): Unit = pkl.write(c)
    def i4(v: Int): Unit = {
      pkl.write(v & 0xff); pkl.write((v >> 8) & 0xff)
      pkl.write((v >> 16) & 0xff); pkl.write((v >> 24) & 0xff)
    }
    def str(s: String): Unit = {
      val b = s.getBytes("UTF-8"); op('X'); i4(b.length); pkl.write(b, 0, b.length)
    }
    def int(v: Int): Unit = { op('J'); i4(v) }
    def global(m: String, n: String): Unit = {
      op('c'); val b = s"$m\n$n\n".getBytes("UTF-8"); pkl.write(b, 0, b.length)
    }
    op(0x80); op(2) // PROTO 2
    op('}')         // EMPTY_DICT
    op('(')         // MARK for SETITEMS
    tensors.zipWithIndex.foreach { case ((name, (shape, data)), k) =>
      require(shape.product == data.length,
        s"$name: ${data.length} values for shape ${shape.mkString("x")}")
      str(name)
      global("torch._utils", "_rebuild_tensor_v2")
      op('(')
      // persistent id ('storage', <cls>Storage, key, 'cpu', numel)
      op('('); str("storage")
      global("torch", if (doublePrecision) "DoubleStorage" else "FloatStorage")
      str(k.toString); str("cpu"); int(data.length); op('t')
      op('Q') // BINPERSID
      int(0)  // storage_offset
      op('('); shape.foreach(int); op('t') // size
      op('('); contiguousStride(shape).foreach(int); op('t') // stride
      op(0x89) // requires_grad = False
      global("collections", "OrderedDict"); op(')'); op('R') // hooks
      op('t')
      op('R')
    }
    op('u') // SETITEMS
    op('.') // STOP

    val out = new ByteArrayOutputStream()
    val z = new ZipOutputStream(out)
    def put(name: String, bytes: Array[Byte]): Unit = {
      z.putNextEntry(new ZipEntry(name)); z.write(bytes); z.closeEntry()
    }
    put("archive/version", "3\n".getBytes("UTF-8"))
    put("archive/data.pkl", pkl.toByteArray)
    tensors.zipWithIndex.foreach { case ((_, (_, data)), k) =>
      val w = if (doublePrecision) 8 else 4
      val b = java.nio.ByteBuffer.allocate(w * data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      if (doublePrecision) data.foreach(b.putDouble)
      else data.foreach(v => b.putFloat(v.toFloat))
      put(s"archive/data/$k", b.array())
    }
    z.close()
    out.toByteArray
  }

  private def contiguousStride(shape: Seq[Int]): Seq[Int] =
    shape.scanRight(1)(_ * _).tail
}
