package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Character-n-gram language identification (the classic Cavnar–Trenkle
  * n-gram-profile approach, distilled to a deterministic closed form): each
  * language is a small profile of characteristic character n-grams; a
  * document's score per language is the total occurrence count of that
  * profile's grams in the lowercased text, and the prediction is the
  * argmax with (score desc, language asc) determinism — `unk` when no
  * profile matches at all.
  *
  * The reference pipeline tags documents with a language field rather than
  * detecting one (`lang`-tagged ES fields); this provides the detection
  * operator a training-data pipeline needs at 100 TB scale: the profiles
  * are a driver-side constant folded into the Column expression (no UDF, no
  * broadcast state, fully codegen'd), and [[predictSql]] emits the
  * IDENTICAL arithmetic as ANSI-ish SQL so the operator is oracle-checkable
  * cross-engine (occurrence counts are exact integers — `replace`-shrink
  * divided by gram length).
  */
object LangId {

  /** Characteristic grams per language (public-knowledge frequency tables,
    * hand-distilled; spaces mark word boundaries). Kept deliberately
    * disjoint across languages so scores are discriminative. */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq(" der ", " und ", " die ", "sch", " ein", "ich", "cht", " ist "),
    "en" -> Seq(" the ", " and ", "ing ", " of ", " to ", " is ", "tion", " that "),
    "es" -> Seq(" que ", " los ", " una ", " es ", "ción", " las ", " como ", " más "),
    "fr" -> Seq(" les ", " des ", " une ", " est ", " dans ", " pour ", " qui ", "eux "),
    "zh" -> Seq("的", "是", "了", "在", "我", "不", "人", "有"))

  /** Exact occurrence count of `gram` in `text`: length shrink under
    * literal removal, divided by the gram length (always divides exactly —
    * `replace` removes whole occurrences). */
  private def gramCount(text: Column, gram: String): Column =
    ((length(text) - length(replace(text, lit(gram), lit("")))) / gram.length).cast("long")

  private def score(text: Column, grams: Seq[String]): Column =
    grams.map(gramCount(text, _)).reduce(_ + _)

  /** Column-expression prediction over raw text (no UDF — pure builtins,
    * codegen-friendly). */
  def predict(text: Column): Column = {
    val t = lower(text)
    val scores: Seq[(String, Column)] = Profiles.map { case (l, gs) => l -> score(t, gs) }
    val maxS = greatest(scores.map(_._2): _*)
    scores
      .foldLeft(when(maxS === 0, "unk")) { case (acc, (l, s)) => acc.when(s === maxS, l) }
      .otherwise("unk")
  }

  /** Per-language score as SQL over a lowercased text column named `t` —
    * the identical arithmetic as [[predict]], for the DuckDB oracle. */
  def scoreSqls: Seq[(String, String)] = {
    def cnt(g: String) =
      s"cast((length(t) - length(replace(t, '${g.replace("'", "''")}', ''))) / ${g.length} as bigint)"
    Profiles.map { case (l, gs) => l -> gs.map(cnt).mkString("(", " + ", ")") }
  }
}
