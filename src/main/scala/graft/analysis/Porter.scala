package graft.analysis

/** The classic Porter stemming algorithm (M.F. Porter, "An algorithm for
  * suffix stripping", Program 14(3), 1980) — the `porter` analyzer kind's
  * token filter (ES exposes the same algorithm as the `porter_stem` /
  * `stemmer(english)` token filters). Implemented from the published rule
  * tables; within a step the LONGEST matching suffix is selected first and
  * its condition then decides whether the rewrite applies (per the paper).
  *
  * Input is expected lowercase (the `porter` kind lowercases before
  * stemming); words of length ≤ 2 pass through untouched. */
object Porter {

  private def isCons(s: CharSequence, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(s, i - 1)
    case _ => true
  }

  /** The measure m of [C](VC)^m[V]: the number of vowel→consonant
    * alternations in the word. */
  private def measure(s: CharSequence): Int = {
    val n = s.length
    var m = 0
    var i = 0
    while (i < n && isCons(s, i)) i += 1
    while (i < n) {
      while (i < n && !isCons(s, i)) i += 1
      if (i < n) {
        m += 1
        while (i < n && isCons(s, i)) i += 1
      }
    }
    m
  }

  private def hasVowel(s: CharSequence): Boolean = {
    var i = 0
    while (i < s.length) { if (!isCons(s, i)) return true; i += 1 }
    false
  }

  private def endsDoubleCons(s: String): Boolean =
    s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
      isCons(s, s.length - 1)

  /** *o: stem ends cvc where the final consonant is not w, x or y. */
  private def endsCvc(s: String): Boolean = {
    val n = s.length
    n >= 3 && isCons(s, n - 3) && !isCons(s, n - 2) && isCons(s, n - 1) && {
      val c = s.charAt(n - 1)
      c != 'w' && c != 'x' && c != 'y'
    }
  }

  /** Longest-suffix-first rule table application: if some (sfx → to) pair
    * matches and the remaining stem has measure > minM, rewrite; if a pair
    * matches but the condition fails, the step still CONSUMES the match
    * (no shorter suffix is tried) — the paper's semantics. */
  private def table(b: String, minM: Int, rules: Seq[(String, String)]): String = {
    val hit = rules.sortBy(-_._1.length).find { case (sfx, _) => b.endsWith(sfx) }
    hit match {
      case Some((sfx, to)) =>
        val stem = b.substring(0, b.length - sfx.length)
        if (measure(stem) > minM) stem + to else b
      case None => b
    }
  }

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var b = word

    // ---- step 1a
    if (b.endsWith("sses")) b = b.dropRight(2)
    else if (b.endsWith("ies")) b = b.dropRight(2)
    else if (b.endsWith("ss")) ()
    else if (b.endsWith("s")) b = b.dropRight(1)

    // ---- step 1b
    var step1bCleanup = false
    if (b.endsWith("eed")) {
      if (measure(b.dropRight(3)) > 0) b = b.dropRight(1)
    } else if (b.endsWith("ed") && hasVowel(b.dropRight(2))) {
      b = b.dropRight(2); step1bCleanup = true
    } else if (b.endsWith("ing") && hasVowel(b.dropRight(3))) {
      b = b.dropRight(3); step1bCleanup = true
    }
    if (step1bCleanup) {
      if (b.endsWith("at") || b.endsWith("bl") || b.endsWith("iz")) b = b + "e"
      else if (endsDoubleCons(b) &&
        !(b.endsWith("l") || b.endsWith("s") || b.endsWith("z"))) b = b.dropRight(1)
      else if (measure(b) == 1 && endsCvc(b)) b = b + "e"
    }

    // ---- step 1c
    if (b.endsWith("y") && hasVowel(b.dropRight(1))) b = b.dropRight(1) + "i"

    // ---- step 2 (m > 0)
    b = table(b, 0, Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble"))

    // ---- step 3 (m > 0)
    b = table(b, 0, Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> ""))

    // ---- step 4 (m > 1); (s|t)ion keeps the ion only when the remaining
    // stem ends in s or t
    val step4 = Seq(
      "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
      "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
    step4.sortBy(-_.length).find(b.endsWith) match {
      case Some("ion") =>
        val stem = b.dropRight(3)
        if (measure(stem) > 1 && stem.nonEmpty &&
          (stem.endsWith("s") || stem.endsWith("t"))) b = stem
      case Some(sfx) =>
        val stem = b.substring(0, b.length - sfx.length)
        if (measure(stem) > 1) b = stem
      case None =>
    }

    // ---- step 5a
    if (b.endsWith("e")) {
      val stem = b.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) b = stem
    }
    // ---- step 5b
    if (measure(b) > 1 && endsDoubleCons(b) && b.endsWith("l")) b = b.dropRight(1)

    b
  }
}
