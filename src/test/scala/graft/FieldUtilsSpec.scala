package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Validation
import graft.index.{FieldNames, IndexConfig, Sizing}

/** Field-name encode/decode (reference adversarial list), shard auto-sizing,
  * and the validation decision gate. */
class FieldUtilsSpec extends AnyFunSuite {

  /** The reference's curated adversarial list
    * (`elasticsearch_utils_tests.py:34-51`). */
  private val AdversarialStrings = Seq(
    "", "_", "+", "-", "$", "+_)(*&^%$#@!~", "~!@#$%^&*()_+", "_____",
    "$abcd./", "$$abcd./", "$dot$", "_+-$lcb$dot$--", ".$dot$_+-$lcb$dot$--",
    "s1.GQ", "s1.DP", "s1.2.3.DP", ".s1.2.3.DP", "-s1-2-3.DP")

  test("encode/decode round-trips the reference's adversarial list") {
    for (s <- AdversarialStrings) {
      val enc = FieldNames.encode(s)
      assert(FieldNames.decode(enc) == s, s"cycle broken for '$s' (encoded '$enc')")
    }
  }

  test("encoded names contain no special chars and no bad leading char") {
    val specials = FieldNames.SpecialCharMap.map(_._1).toSet
    for (s <- AdversarialStrings; if s.nonEmpty) {
      val enc = FieldNames.encode(s)
      assert(!specials.exists(enc.contains(_)), s"special char survives in '$enc'")
      assert(!FieldNames.BadLeading.contains(enc.head) || enc.head == '$',
        s"bad leading char in '$enc'")
      // the only legal leading '$' is the escape shield
      if (enc.head == '$') assert(FieldNames.decode(enc) == s)
    }
  }

  test("shard sizing follows ceil(rows*cols/1.4e9) with a floor") {
    assert(Sizing.numShards(1000L, 10L) == 1)
    assert(Sizing.numShards(1000L, 10L, minShards = 4) == 4)
    assert(Sizing.numShards(200_000_000L, 10L) == 2) // 2e9 cells
    assert(Sizing.numShards(1_400_000_000L, 1L) == 1)
    assert(Sizing.numShards(1_400_000_001L, 1L) == 2)
    val cfg = Sizing.configFor(2_000_000L, avgTokens = 1400.0, base = IndexConfig())
    assert(cfg.docsPerShard == 1_000_000L) // 2.8e9 cells → 2 shards
  }

  test("validation stats: semi-join ratios vs threshold") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ds = Seq("a", "b", "c", "d").toDF("k")
    val coding = Seq("a", "b", "x", "y").toDF("k")    // 2/4 matched = 0.5
    val noncoding = Seq("x", "y", "z", "w").toDF("k") // 0/4 matched
    val stats = Validation.sampleTypeStats(ds,
      Map("coding" -> coding, "noncoding" -> noncoding), Seq("k"), threshold = 0.3)
    assert(stats("coding") == graft.functions.ValidationStat(2, 4, true))
    assert(stats("noncoding") == graft.functions.ValidationStat(0, 4, false))
  }

  test("broadcast interval annotate: liftover-style coordinate mapping") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(("a", 5), ("b", 15), ("c", 99)).toDF("id", "pos")
    val chain = Seq((0, 10, 1000), (10, 20, 2000)).toDF("start", "end", "offset")
    val out = graft.functions.BroadcastAnnotate
      .byInterval(rows, chain, col("pos"))
      .select(col("id"), (col("pos") + col("offset")).cast("long").as("lifted"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map("a" -> 1005L, "b" -> 2015L, "c" -> -1L))

    val mapped = graft.functions.BroadcastAnnotate
      .byMap(rows, Map("a" -> "alpha", "b" -> "beta"), col("id"), "name")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(mapped == Map("a" -> "alpha", "b" -> "beta", "c" -> null))
  }

  test("decision matrix mirrors the reference's four branches") {
    assert(Validation.decide(false, false, "WES").isLeft)
    assert(Validation.decide(false, true, "WGS").isLeft)
    assert(Validation.decide(true, false, "WES") == Right("WES"))
    assert(Validation.decide(true, false, "WGS").isLeft)
    assert(Validation.decide(true, true, "WGS") == Right("WGS"))
    assert(Validation.decide(true, true, "WES").isLeft)
  }
}
