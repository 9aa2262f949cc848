package graft.io

import java.nio.{ByteBuffer, ByteOrder}

/** Shared test-side IDAT v3 synthesizer (byte-for-byte per the format the
  * decoder implements, reference read_idat.py:217-398). Used by IdatSpec's
  * round trips and by the EPICv2 census fixture, which writes
  * full-array-scale files through it. */
object IdatGen {

  /** Build a minimal valid IDAT v3 file. */
  def makeIdat(ids: Array[Int], means: Array[Int], stds: Array[Int],
      beads: Array[Int], barcode: String = "barcode123",
      chipType: String = "BeadChip 8x5"): Array[Byte] = {
    val n = ids.length
    def strBytes(s: String): Array[Byte] = {
      // varint length (little-endian 7-bit groups, high bit =
      // continuation) + utf8
      val b = s.getBytes("UTF-8")
      var n = b.length
      val prefix = scala.collection.mutable.ArrayBuffer[Byte]()
      while (n >= 128) { prefix += ((n % 128) + 128).toByte; n /= 128 }
      prefix += n.toByte
      prefix.toArray ++ b
    }
    // sections payloads
    val secs = scala.collection.mutable.LinkedHashMap[Int, Array[Byte]]()
    // NUM_SNPS_READ (1000)
    secs(1000) = { val b = ByteBuffer.allocate(4)
      .order(ByteOrder.LITTLE_ENDIAN); b.putInt(n); b.array() }
    secs(102) = { val b = ByteBuffer.allocate(n * 4)
      .order(ByteOrder.LITTLE_ENDIAN); ids.foreach(b.putInt); b.array() }
    secs(104) = { val b = ByteBuffer.allocate(n * 2)
      .order(ByteOrder.LITTLE_ENDIAN)
      means.foreach(m => b.putShort((m & 0xffff).toShort)); b.array() }
    secs(103) = { val b = ByteBuffer.allocate(n * 2)
      .order(ByteOrder.LITTLE_ENDIAN)
      stds.foreach(m => b.putShort((m & 0xffff).toShort)); b.array() }
    secs(107) = beads.map(_.toByte)
    secs(402) = strBytes(barcode)
    secs(403) = strBytes(chipType)
    secs(300) = { // one run-info entry
      val entry = strBytes("2024-01-01") ++ strBytes("Scan") ++
        strBytes("params") ++ strBytes("block") ++ strBytes("1.0")
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(1)
      b.array() ++ entry
    }

    val headerLen = 4 + 8 + 4 + secs.size * 10
    var off = headerLen.toLong
    val offsets = secs.map { case (code, payload) =>
      val o = off; off += payload.length; (code, o)
    }
    val out = ByteBuffer.allocate(off.toInt).order(ByteOrder.LITTLE_ENDIAN)
    out.put("IDAT".getBytes("US-ASCII"))
    out.putLong(3L)
    out.putInt(secs.size)
    offsets.foreach { case (code, o) =>
      out.putShort(code.toShort); out.putLong(o)
    }
    secs.values.foreach(out.put)
    out.array()
  }
}
