package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.index.Codec

/** ScalaCheck round-trip properties for the varint/delta posting codec
  * (SURVEY.md §5 mode 2 — the encode/decode inverse-pair test pattern of
  * the reference's `elasticsearch_utils_tests.py:5-59`). */
object CodecProps extends Properties("Codec") {

  private val nonNeg: Gen[Long] = Gen.chooseNum(0L, Long.MaxValue)

  property("varint roundtrip") = Prop.forAll(Gen.listOf(nonNeg)) { xs =>
    val arr = xs.toArray
    Codec.decode(Codec.encode(arr), arr.length).sameElements(arr)
  }

  private val increasing: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(1L, 1L << 40)).map { gaps =>
      var acc = -1L
      gaps.map { g => acc += g; acc }.toArray
    }

  property("delta roundtrip") = Prop.forAll(increasing) { arr =>
    Codec.decodeDeltas(Codec.encodeDeltas(arr), arr.length).sameElements(arr)
  }

  property("concatenated delta lists roundtrip (positions layout)") =
    Prop.forAll(Gen.listOf(increasing)) { lists =>
      val buf = new scala.collection.mutable.ArrayBuffer[Byte]()
      lists.foreach(l => Codec.appendDeltas(buf, l))
      val bytes = buf.toArray
      var off = 0
      lists.forall { l =>
        val (got, next) = Codec.decodeDeltasFrom(bytes, off, l.length)
        off = next
        got.sameElements(l)
      } && off == bytes.length
    }

  property("delta encoding is compact for dense runs") = Prop.forAll(
    Gen.chooseNum(0L, 1L << 30), Gen.chooseNum(1, 500)) { (start, n) =>
    val arr = Array.tabulate(n)(i => start + i)
    val bytes = Codec.encodeDeltas(arr)
    // first value ≤ 5 varint bytes, every delta-1 == 0 → 1 byte each
    bytes.length <= 5 + (n - 1)
  }
}
