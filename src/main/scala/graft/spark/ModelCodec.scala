package graft.spark

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** Shared deterministic byte codec for the small table-shaped models
  * ([[graft.spark.sample.Dsir.Model]], [[graft.spark.text.QualityClassifier.Model]]):
  * `magic(4 ASCII) | buckets i32 BE | extra longs i64 BE | table f64 BE`.
  * One implementation so length/magic validation and any future versioning
  * can't drift between the models that share the layout. */
object ModelCodec {

  def write(magic: String, buckets: Int, extraLongs: Seq[Long],
            table: Array[Double]): Array[Byte] = {
    require(magic.length == 4, s"magic must be 4 ASCII bytes, got '$magic'")
    require(table.length == buckets, s"table length ${table.length} != buckets $buckets")
    val bos = new ByteArrayOutputStream(8 + 8 * extraLongs.size + 8 * buckets)
    val out = new DataOutputStream(bos)
    out.writeBytes(magic)
    out.writeInt(buckets)
    extraLongs.foreach(out.writeLong)
    var i = 0
    while (i < buckets) { out.writeDouble(table(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  /** Returns (buckets, extraLongs, table); throws IllegalArgumentException
    * on a wrong magic, bad bucket count, or a length mismatch. */
  def read(magic: String, nExtraLongs: Int, bytes: Array[Byte],
           what: String): (Int, Array[Long], Array[Double]) = {
    require(bytes.length >= 8, s"not a $what model: too short")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val m = new Array[Byte](4)
    buf.get(m)
    require(new String(m, "US-ASCII") == magic, s"not a $what model: bad magic")
    val buckets = buf.getInt
    require(buckets > 0 && bytes.length == 8 + 8 * nExtraLongs + 8 * buckets,
      s"corrupt $what model: buckets=$buckets, ${bytes.length} bytes")
    val extras = Array.fill(nExtraLongs)(buf.getLong)
    val table = new Array[Double](buckets)
    var i = 0
    while (i < buckets) { table(i) = buf.getDouble; i += 1 }
    (buckets, extras, table)
  }
}
