package graft.functions

import org.apache.spark.sql.DataFrame

/** One reference list's validation stats: how many of the dataset's keys hit
  * the list, the list's size, and whether the hit ratio clears the
  * threshold. */
final case class ValidationStat(matchedCount: Long, totalCount: Long, isMatch: Boolean)

/** Validation decision gate: semi-join hit-ratio thresholds against known
  * reference lists, then a match/mismatch decision matrix.
  *
  * Re-expresses the reference's `sample_type_stats`
  * (`luigi_pipeline/lib/hail_tasks.py:96-120`: count the dataset rows
  * present in each curated variant list, match iff ratio ≥ threshold) and
  * the WES/WGS decision matrix (`luigi_pipeline/seqr_loading.py:212-246`).
  * Engine framing: the curated lists are any keyed reference tables (e.g.
  * known-term or known-doc lists); the gate runs before publish, next to
  * the sha256 lineage invariant.
  */
object Validation {

  /** For each named reference list, the count of `df` rows whose `keys`
    * appear in the list (left-semi), the list size, and the threshold
    * verdict. One semi-join + count per list — both are metadata-scale
    * relative to the corpus (the lists are small; broadcast). */
  def sampleTypeStats(
      df: DataFrame,
      refs: Map[String, DataFrame],
      keys: Seq[String],
      threshold: Double = 0.3): Map[String, ValidationStat] =
    refs.map { case (name, ref) =>
      val matched = df.join(ref.select(keys.head, keys.tail: _*), keys, "left_semi").count()
      val total = ref.count()
      name -> ValidationStat(matched, total, total > 0 && matched.toDouble / total >= threshold)
    }

  /** The decision matrix over the two threshold verdicts: returns
    * Right(inferredType) when the declared type agrees with the inferred
    * one, Left(error) otherwise — mirroring the four branches of the
    * reference (no-hits, noncoding-only, coding-only=WES, both=WGS). */
  def decide(
      hasCoding: Boolean,
      hasNoncoding: Boolean,
      declaredType: String): Either[String, String] =
    (hasCoding, hasNoncoding) match {
      case (false, false) =>
        Left("validation error: dataset contains none of the expected common reference entries")
      case (false, true) =>
        Left("validation error: dataset matches the noncoding list but is missing common coding entries")
      case (true, false) =>
        if (declaredType == "WES") Right("WES")
        else Left(s"sample type validation error: declared $declaredType but appears to be WES (coding only)")
      case (true, true) =>
        if (declaredType == "WGS") Right("WGS")
        else Left(s"sample type validation error: declared $declaredType but appears to be WGS (coding + noncoding)")
    }
}
