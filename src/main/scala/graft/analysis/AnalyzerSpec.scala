package graft.analysis

/** Per-field analysis configuration — the ES mapping's `analyzer` knob.
  *
  * The reference derives its ES mapping per field type
  * (`hail_scripts/elasticsearch/elasticsearch_utils.py:53-121`) and ES
  * itself lets every analyzed field pick an analyzer with index-time
  * stopwords and synonyms; this is that knob for the engine's EXTRA
  * analyzed fields ([[graft.index.FieldConfig.analyzed]]). The `content`
  * field always uses the code-aware [[Analyzer]] (its bit-exact oracles
  * depend on it).
  *
  * Kinds:
  *  - `code` — the default code-aware analyzer (identifier split,
  *    camelCase/snake_case subtokens, lowercase);
  *  - `lowercase` — alphanumeric runs, lowercased, NO subtoken splitting
  *    (the ES `standard`-ish analyzer for prose fields);
  *  - `whitespace` — whitespace-delimited tokens, case preserved (the ES
  *    `whitespace` analyzer);
  *  - `porter` — alphanumeric runs, lowercased, then Porter-stemmed
  *    ([[Porter]] — the ES `stemmer(english)`/`porter_stem` token filter
  *    over the `standard`-ish tokenizer). Query-side analysis applies the
  *    same stemming, so `running` matches a document's `run`.
  *
  * Index-time filters, applied in ES order (tokenize → stop → synonym):
  *  - `stopwords` — matching tokens are REMOVED; remaining tokens keep
  *    their original position (position-increment gaps, as in ES), and the
  *    field length (dl) counts survivors only;
  *  - `synonyms` — for each surviving token with a rule, the synonym
  *    tokens are INJECTED at the same position (ES `synonym` filter,
  *    index-time). A MULTI-TOKEN target ("ml" → "machine learning" — the
  *    ES `synonym_graph` shape) injects its tokens at consecutive
  *    positions starting at the trigger's, so a phrase query for the
  *    target matches documents containing the trigger. Injected tokens do
  *    not count toward dl (Lucene discountOverlaps). Query-side analysis
  *    applies kind + stopwords but NOT injection — the classic
  *    index-time-synonym setup where the query token matches because the
  *    index already carries the synonym.
  */
final case class AnalyzerSpec(
    kind: String = "code",
    stopwords: Seq[String] = Nil,
    synonyms: Map[String, Seq[String]] = Map.empty) {

  require(AnalyzerSpec.Kinds.contains(kind),
    s"unknown analyzer kind '$kind' (have: ${AnalyzerSpec.Kinds.mkString(", ")})")

  // '|' ',' ';' '=' are the unescaped delimiters of encode/decode (the
  // persisted IndexMeta form, folded into configHash); a token carrying one
  // would round-trip to a DIFFERENT spec on the query side. Such tokens can
  // never match analyzed output anyway (every kind strips or splits on
  // them), so reject them at construction instead of corrupting the meta.
  for (t <- stopwords)
    require(!t.exists(AnalyzerSpec.ReservedDelims.contains(_)),
      s"stopword '$t' contains a reserved delimiter (one of | , ; =)")
  for ((k, vs) <- synonyms) {
    require(!k.exists(AnalyzerSpec.ReservedDelims.contains(_)),
      s"synonym key '$k' contains a reserved delimiter (one of | , ; =)")
    for (v <- vs)
      require(!v.exists(AnalyzerSpec.ReservedDelims.contains(_)),
        s"synonym value '$v' contains a reserved delimiter (one of | , ; =)")
  }

  def isCode: Boolean = kind == "code" && stopwords.isEmpty && synonyms.isEmpty

  /** Compact, deterministic string form — stored in IndexMeta and folded
    * into the index configHash (an analyzer change must force a rebuild). */
  def encode: String = {
    val sw = if (stopwords.isEmpty) "" else "|sw:" + stopwords.sorted.mkString(",")
    val syn =
      if (synonyms.isEmpty) ""
      else "|syn:" + synonyms.toSeq.sortBy(_._1)
        .map { case (k, vs) => s"$k=${vs.mkString(";")}" }.mkString(",")
    s"$kind$sw$syn"
  }
}

object AnalyzerSpec {
  val Kinds: Set[String] = Set("code", "lowercase", "whitespace", "porter")
  val ReservedDelims: Set[Char] = Set('|', ',', ';', '=')
  val Code: AnalyzerSpec = AnalyzerSpec()

  /** Inverse of [[AnalyzerSpec.encode]]. */
  def decode(s: String): AnalyzerSpec = {
    val parts = s.split('|')
    var spec = AnalyzerSpec(kind = parts(0))
    parts.drop(1).foreach {
      case p if p.startsWith("sw:") =>
        spec = spec.copy(stopwords = p.drop(3).split(',').filter(_.nonEmpty).toSeq)
      case p if p.startsWith("syn:") =>
        spec = spec.copy(synonyms = p.drop(4).split(',').filter(_.nonEmpty).map { rule =>
          val Array(k, vs) = rule.split("=", 2)
          k -> vs.split(';').filter(_.nonEmpty).toSeq
        }.toMap)
      case other => throw new IllegalArgumentException(s"bad analyzer spec part '$other'")
    }
    spec
  }

  private def baseTokens(kind: String, content: String): Array[String] = kind match {
    case "code" => Analyzer.tokenize(content)
    case "lowercase" =>
      // alphanumeric runs, lowercased — no '_' joining, no camel subtokens
      val out = Array.newBuilder[String]
      val n = content.length
      var i = 0
      while (i < n) {
        while (i < n && !Character.isLetterOrDigit(content.charAt(i))) i += 1
        val start = i
        while (i < n && Character.isLetterOrDigit(content.charAt(i))) i += 1
        if (i > start) out += content.substring(start, i).toLowerCase
      }
      out.result()
    case "whitespace" =>
      content.split("\\s+").filter(_.nonEmpty)
    case "porter" =>
      baseTokens("lowercase", content).map(Porter.stem)
    case other => throw new IllegalArgumentException(s"unknown analyzer kind '$other'")
  }

  /** Index-time analysis: (terms, positions, field length). Positions are
    * the base token-stream indices; stop-filtered tokens leave gaps;
    * synonyms are injected at their trigger's position. dl = number of
    * surviving base tokens (injections excluded — Lucene discountOverlaps). */
  def tokenizeIndexed(spec: AnalyzerSpec, content: String): (Array[String], Array[Long], Long) = {
    val base = baseTokens(spec.kind, content)
    if (spec.stopwords.isEmpty && spec.synonyms.isEmpty)
      return (base, Array.tabulate(base.length)(_.toLong), base.length.toLong)
    val stop: Set[String] = spec.stopwords.toSet
    val terms = Array.newBuilder[String]
    val poss = Array.newBuilder[Long]
    var dl = 0L
    var i = 0
    while (i < base.length) {
      val t = base(i)
      if (!stop.contains(t)) {
        dl += 1
        terms += t
        poss += i.toLong
        spec.synonyms.get(t).foreach(_.foreach { s =>
          if (s.indexOf(' ') < 0) {
            terms += s
            poss += i.toLong
          } else {
            // multi-token target: consecutive positions from the trigger's
            // (synonym_graph flattening — the target phrase matches here)
            var k = 0
            s.split(' ').foreach { st =>
              if (st.nonEmpty) { terms += st; poss += i.toLong + k; k += 1 }
            }
          }
        })
      }
      i += 1
    }
    (terms.result(), poss.result(), dl)
  }

  /** Query-time analysis: kind + stop filter, NO synonym injection (the
    * index already carries the injected tokens at the right positions). */
  def queryTokens(spec: AnalyzerSpec, text: String): Array[String] = {
    val base = baseTokens(spec.kind, text)
    if (spec.stopwords.isEmpty) base
    else {
      val stop = spec.stopwords.toSet
      base.filterNot(stop.contains)
    }
  }
}
