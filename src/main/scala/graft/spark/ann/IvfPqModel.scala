package graft.spark.ann

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** The trained half of an IVFPQ index: coarse centroids + per-subspace PQ
  * codebooks (plus the layout parameters). A few MB at production settings
  * (nlist·dim + m·ksub·dsub floats) — persist [[toBytes]] next to the
  * encoded (vec_id, cell, codes) parquet written from
  * [[Ann.encodeIvfPq]], reload with [[IvfPqModel.fromBytes]], and query
  * with [[Ann.searchIvfPq]] — build once, search many (the FAISS
  * index-file shape; PqSpec pins the byte round-trip and that a reloaded
  * index searches identically).
  *
  * The codec is a deterministic explicit layout (magic + dims + IEEE-754
  * floats big-endian via DataOutputStream), not Java serialization — bytes
  * are stable across JVMs and md5-pinnable. */
final case class IvfPqModel(dim: Int, m: Int, residual: Boolean,
                            centroids: Array[(Int, Array[Float])],
                            books: Array[Array[Array[Float]]],
                            rotation: Option[Array[Array[Float]]] = None) {

  /** Structural consistency, enforced at the public Ann entry points and on
    * [[IvfPqModel.fromBytes]] — an inconsistent model (wrong subspace split,
    * book count != m) would otherwise silently mis-encode or die inside an
    * executor UDF instead of failing clearly on the driver. */
  def validate(): Unit = {
    require(dim > 0 && m > 0 && dim % m == 0,
      s"dim $dim must divide into m=$m subspaces")
    require(centroids.nonEmpty, "model has no coarse centroids")
    require(books.length == m, s"expected $m codebooks, found ${books.length}")
    val dsub = dim / m
    require(books.forall(_.forall(_.length == dsub)),
      s"every codebook centroid must have dsub=$dsub dims")
    rotation.foreach { r =>
      require(r.length == dim && r.forall(_.length == dim),
        s"OPQ rotation must be ${dim}x$dim, found ${r.length}x${r.headOption.map(_.length).getOrElse(0)}")
    }
  }

  /** Dense centroid-by-cell table (cell ids are 0..n-1 by construction). */
  @transient lazy val centByCell: Array[Array[Float]] = {
    val out = new Array[Array[Float]](centroids.length)
    centroids.foreach { case (i, c) => out(i) = c }
    out
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    // rotation-less models keep the original byte layout (and magic), so
    // every pre-OPQ image and golden stays valid; a rotation bumps the
    // magic to the v2 layout that appends the matrix
    o.writeInt(if (rotation.isEmpty) IvfPqModel.Magic else IvfPqModel.MagicV2)
    o.writeInt(dim)
    o.writeInt(m)
    o.writeBoolean(residual)
    o.writeInt(centroids.length)
    centroids.foreach { case (i, c) =>
      o.writeInt(i)
      o.writeInt(c.length)
      c.foreach(o.writeFloat)
    }
    o.writeInt(books.length)
    books.foreach { book =>
      o.writeInt(book.length)
      book.foreach { cent =>
        o.writeInt(cent.length)
        cent.foreach(o.writeFloat)
      }
    }
    rotation.foreach { r =>
      o.writeInt(r.length)
      r.foreach { row =>
        o.writeInt(row.length)
        row.foreach(o.writeFloat)
      }
    }
    o.flush()
    bos.toByteArray
  }
}

object IvfPqModel {
  private val Magic = 0x47495051 // "GIPQ" — v1, no rotation
  private val MagicV2 = 0x47495132 // "GIQ2" — appends the OPQ rotation

  def fromBytes(b: Array[Byte]): IvfPqModel = {
    val in = new DataInputStream(new ByteArrayInputStream(b))
    val magic = in.readInt()
    require(magic == Magic || magic == MagicV2, "not an IvfPqModel byte image")
    val dim = in.readInt()
    val m = in.readInt()
    val residual = in.readBoolean()
    val centroids = Array.fill(in.readInt()) {
      val i = in.readInt()
      (i, Array.fill(in.readInt())(in.readFloat()))
    }
    val books = Array.fill(in.readInt()) {
      Array.fill(in.readInt())(Array.fill(in.readInt())(in.readFloat()))
    }
    val rotation =
      if (magic == MagicV2)
        Some(Array.fill(in.readInt())(Array.fill(in.readInt())(in.readFloat())))
      else None
    val model = IvfPqModel(dim, m, residual, centroids, books, rotation)
    model.validate()
    model
  }
}
