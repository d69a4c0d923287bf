package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.index.FieldNames

/** ScalaCheck round-trip property for the ES-safe field-name codec — the
  * reference's inverse-pair test (`elasticsearch_utils_tests.py:5-59`)
  * generalized from a curated list to generated adversarial strings. */
object FieldNameProps extends Properties("FieldNames") {

  // bias heavily toward the escape char and the special chars so collision
  // patterns like "$$", "$dot$", "_$lp$_" are generated often
  private val char: Gen[Char] = Gen.frequency(
    5 -> Gen.const('$'),
    5 -> Gen.oneOf(FieldNames.SpecialCharMap.map(_._1)),
    3 -> Gen.oneOf('_', '-', '+'),
    3 -> Gen.oneOf("dot,comma,lp,rp,lsb".toSeq),
    4 -> Gen.alphaNumChar)

  private val str: Gen[String] = Gen.listOf(char).map(_.mkString)

  property("decode(encode(s)) == s") = Prop.forAll(str) { s =>
    FieldNames.decode(FieldNames.encode(s)) == s
  }

  property("encoded has no special chars") = Prop.forAll(str) { s =>
    val specials = FieldNames.SpecialCharMap.map(_._1).toSet
    !FieldNames.encode(s).exists(specials.contains)
  }
}
