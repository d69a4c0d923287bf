package graft.analysis

import java.util.regex.Pattern
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Code-aware tokenizer: identifier extraction, camelCase / snake_case
  * subtoken splitting, lowercase normalization.
  *
  * Plays the role the external VEP annotator plays in the reference
  * pipeline (reference: `hail_scripts/utils/hail_utils.py:113-139` streams
  * 1000-row blocks through an external process; here the analyzer is a pure
  * Scala function so it inlines into Catalyst plans). The deterministic
  * "dummy VEP runner" test pattern (reference:
  * `luigi_pipeline/lib/hail_vep_runners.py:15-28`) maps to this analyzer
  * being fully deterministic and versioned.
  *
  * Two implementations with identical semantics (agreement is unit-tested):
  *  - [[tokenize]] — plain Scala, used in typed `mapPartitions` paths and
  *    driver-side query parsing;
  *  - [[analyze]] — `Column` form built only from codegen'd Spark SQL
  *    builtins (no UDF), used in DataFrame plans so Catalyst can prune,
  *    push down and whole-stage-codegen around it.
  */
object Analyzer {

  /** Bump when token semantics change; stamped into index metadata so a
    * query engine never reads an index built with a different analyzer. */
  val Version = "graft-analyzer-1"

  private val IdentSplit = "[^A-Za-z0-9_]+"
  // insert a boundary between a lower/digit and an upper: fooBar -> foo Bar
  private val CamelLowerUpper = "([a-z0-9])([A-Z])"
  // boundary inside an acronym run followed by a word: HTTPServer -> HTTP Server
  private val CamelAcronymWord = "([A-Z]+)([A-Z][a-z])"
  private val SubSplit = "[_ ]+"

  private val identSplitP = Pattern.compile(IdentSplit)
  private val camelLuP = Pattern.compile(CamelLowerUpper)
  private val camelAwP = Pattern.compile(CamelAcronymWord)
  private val subSplitP = Pattern.compile(SubSplit)

  /** Subtokens of a single identifier, lowercased, in order. */
  def subtokens(ident: String): Array[String] = {
    val spaced1 = camelLuP.matcher(ident).replaceAll("$1 $2")
    val spaced2 = camelAwP.matcher(spaced1).replaceAll("$1 $2")
    subSplitP.split(spaced2.toLowerCase).filter(_.nonEmpty)
  }

  /** Full analysis of a document: for each identifier emit the lowercased
    * whole token; when it splits into >1 subtoken, also emit each subtoken.
    * Document order is preserved (whole token before its subtokens). */
  def tokenize(content: String): Array[String] = {
    if (content == null) return Array.empty
    val idents = identSplitP.split(content).filter(_.nonEmpty)
    val out = Array.newBuilder[String]
    var i = 0
    while (i < idents.length) {
      val t = idents(i)
      val subs = subtokens(t)
      out += t.toLowerCase
      if (subs.length > 1) out ++= subs
      i += 1
    }
    out.result()
  }

  /** Column form of [[subtokens]] (array&lt;string&gt;). */
  private def subtokensCol(t: Column): Column = {
    val spaced =
      regexp_replace(regexp_replace(t, CamelLowerUpper, "$1 $2"), CamelAcronymWord, "$1 $2")
    filter(split(lower(spaced), SubSplit), s => length(s) > lit(0))
  }

  /** Column form of [[tokenize]] (array&lt;string&gt;), builtins only. */
  def analyze(content: Column): Column = {
    val idents = filter(split(content, IdentSplit), x => length(x) > lit(0))
    flatten(transform(idents, { t =>
      val subs = subtokensCol(t)
      when(size(subs) > lit(1), concat(array(lower(t)), subs))
        .otherwise(array(lower(t)))
    }))
  }

  /** Parse a user query into distinct sorted terms (driver-side). */
  def queryTerms(query: String): Array[String] =
    tokenize(query).distinct.sorted
}
