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

  // --- hand-rolled scanner (hot build path) ---------------------------------
  // Regex-free equivalent of the Column form below: java.util.regex.Pattern
  // .split was measured to ANTI-scale across executor threads in this
  // environment (flat ~5k ops/s from 1 to 32 threads), so the per-document
  // path scans chars directly. Semantics are pinned to the Column form by
  // the AnalyzerSpec agreement test. Identifier chars are ASCII by
  // construction ([A-Za-z0-9_]), so manual lowercasing is exact.

  @inline private def isIdentChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'
  @inline private def isUpper(c: Char): Boolean = c >= 'A' && c <= 'Z'
  @inline private def isLowerOrDigit(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
  @inline private def toLower(c: Char): Char =
    if (isUpper(c)) (c + 32).toChar else c

  private def lowerSlice(s: String, from: Int, until: Int): String = {
    val a = new Array[Char](until - from)
    var i = from
    while (i < until) { a(i - from) = toLower(s.charAt(i)); i += 1 }
    new String(a)
  }

  /** Camel boundary BEFORE position j of identifier `s` (0 < j < len):
    * lower/digit→Upper, or Upper→Upper+lower (acronym end) — the same split
    * points the two regex passes produce. */
  @inline private def camelBoundary(s: String, j: Int, len: Int): Boolean = {
    val prev = s.charAt(j - 1); val c = s.charAt(j)
    (isLowerOrDigit(prev) && isUpper(c)) ||
      (isUpper(prev) && isUpper(c) && j + 1 < len && {
        val nx = s.charAt(j + 1); nx >= 'a' && nx <= 'z'
      })
  }

  /** Emit the lowercased whole identifier `s[start,end)`, plus its subtokens
    * when it splits into more than one. */
  private def emitIdent(s: String, start: Int, end: Int, out: scala.collection.mutable.ArrayBuilder[String]): Unit = {
    out += lowerSlice(s, start, end)
    // find subtoken pieces: split at '_' runs and camel boundaries
    var pieceStart = -1
    var first = -1
    var firstEnd = -1
    var count = 0
    var j = start
    while (j <= end) {
      val atSep = j == end || s.charAt(j) == '_'
      if (pieceStart < 0) {
        if (!atSep) pieceStart = j
      } else if (atSep || (j > pieceStart && camelBoundary(s, j, end))) {
        count += 1
        if (count == 1) { first = pieceStart; firstEnd = j }
        else {
          if (count == 2) out += lowerSlice(s, first, firstEnd)
          out += lowerSlice(s, pieceStart, j)
        }
        pieceStart = if (atSep) -1 else j
      }
      j += 1
    }
  }

  /** Full analysis of a document: for each identifier emit the lowercased
    * whole token; when it splits into >1 subtoken, also emit each subtoken.
    * Document order is preserved (whole token before its subtokens). */
  def tokenize(content: String): Array[String] = {
    if (content == null) return Array.empty
    val out = Array.newBuilder[String]
    val n = content.length
    out.sizeHint(n / 6)
    var i = 0
    while (i < n) {
      while (i < n && !isIdentChar(content.charAt(i))) i += 1
      val start = i
      while (i < n && isIdentChar(content.charAt(i))) i += 1
      if (i > start) emitIdent(content, start, i, out)
    }
    out.result()
  }

  /** Subtokens of a single identifier, lowercased, in order (reference
    * implementation, regex-based — used for tests and query parsing). */
  def subtokens(ident: String): Array[String] = {
    val spaced1 = camelLuP.matcher(ident).replaceAll("$1 $2")
    val spaced2 = camelAwP.matcher(spaced1).replaceAll("$1 $2")
    subSplitP.split(spaced2.toLowerCase).filter(_.nonEmpty)
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
