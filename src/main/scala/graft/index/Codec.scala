package graft.index

import scala.collection.mutable.ArrayBuffer

/** Delta + unsigned-LEB128 varint codec for posting blocks.
  *
  * Plays the role of the reference's ES `index.codec: best_compression`
  * setting (reference: `hail_scripts/elasticsearch/elasticsearch_client_v7
  * .py:90` — "halves disk usage, no difference in query times"): docIds in a
  * block are strictly increasing, so we store `docs[0]` then `docs[i] -
  * docs[i-1] - 1`; tf / dl values are stored as raw varints. All values are
  * non-negative longs.
  */
object Codec {

  @inline private def writeVar(buf: ArrayBuffer[Byte], value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0L) {
      buf += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    buf += v.toByte
  }

  /** Encode non-negative longs as plain varints. */
  def encode(values: Array[Long]): Array[Byte] = {
    val buf = new ArrayBuffer[Byte](values.length * 2)
    var i = 0
    while (i < values.length) { writeVar(buf, values(i)); i += 1 }
    buf.toArray
  }

  /** Encode a strictly-increasing sequence as first value + (delta-1)s. */
  def encodeDeltas(sorted: Array[Long]): Array[Byte] = {
    val buf = new ArrayBuffer[Byte](sorted.length * 2)
    var i = 0
    var prev = 0L
    while (i < sorted.length) {
      val v = sorted(i)
      if (i == 0) writeVar(buf, v) else writeVar(buf, v - prev - 1)
      prev = v
      i += 1
    }
    buf.toArray
  }

  /** Decode `n` plain varints. */
  def decode(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var pos = 0
    var i = 0
    while (i < n) {
      var shift = 0
      var v = 0L
      var b = 0L
      do {
        b = bytes(pos) & 0xffL
        v |= (b & 0x7f) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      out(i) = v
      i += 1
    }
    out
  }

  /** Inverse of [[encodeDeltas]]. */
  def decodeDeltas(bytes: Array[Byte], n: Int): Array[Long] = {
    val raw = decode(bytes, n)
    var i = 1
    while (i < n) { raw(i) = raw(i - 1) + raw(i) + 1; i += 1 }
    raw
  }

  /** Append a delta-encoded strictly-increasing sequence to `buf` (the
    * concatenated-lists form used for per-posting positions). */
  def appendDeltas(buf: ArrayBuffer[Byte], sorted: Array[Long]): Unit = {
    var i = 0
    var prev = 0L
    while (i < sorted.length) {
      val v = sorted(i)
      if (i == 0) writeVar(buf, v) else writeVar(buf, v - prev - 1)
      prev = v
      i += 1
    }
  }

  /** Decode one `n`-element delta sequence starting at byte `offset`;
    * returns (values, offset just past the sequence). */
  def decodeDeltasFrom(bytes: Array[Byte], offset: Int, n: Int): (Array[Long], Int) = {
    val out = new Array[Long](n)
    var pos = offset
    var i = 0
    while (i < n) {
      var shift = 0
      var v = 0L
      var b = 0L
      do {
        b = bytes(pos) & 0xffL
        v |= (b & 0x7f) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      out(i) = if (i == 0) v else out(i - 1) + v + 1
      i += 1
    }
    (out, pos)
  }
}
