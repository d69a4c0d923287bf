package graft.corpus

import org.apache.spark.sql.{Dataset, SparkSession}

/** One row of the engine's input table (shape fixed by FIXTURES.md §2 /
  * BASELINE.json input_hint). */
final case class SourceFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String)

/** Deterministic synthesized source-code corpus.
  *
  * Stands in for the Iceberg table of source-code repositories (no external
  * data in this sandbox). Mirrors the reference's deterministic test-fixture
  * strategy (tiny seeded inputs + golden expectations, e.g.
  * `luigi_pipeline/tests/test_seqr_sv_loading.py:36-147`). Properties:
  *  - fully determined by (seed, nFiles) — independent of partitioning,
  *    because each row derives from its own splitmix64-scrambled stream;
  *  - zipf-ish identifier distribution plus per-language keyword stop terms,
  *    deliberately skewed so the posting build's skew handling is exercised;
  *  - identifiers are camelCase / snake_case compounds so the analyzer's
  *    subtoken path is exercised;
  *  - `commit` is a 40-hex digest of (repo, path, seed).
  */
object CorpusGen {

  val Langs: Vector[String] = Vector("scala", "java", "py", "js", "go", "rs", "md")

  // public language keywords — the high-frequency "stop terms"
  private val Keywords: Map[String, Vector[String]] = Map(
    "scala" -> Vector("def", "val", "var", "class", "object", "trait", "extends", "import", "match", "case", "if", "else", "for", "yield", "new", "override", "private", "implicit"),
    "java" -> Vector("public", "private", "static", "final", "void", "class", "interface", "extends", "implements", "import", "return", "if", "else", "for", "while", "new", "this", "throws"),
    "py" -> Vector("def", "class", "import", "from", "return", "if", "elif", "else", "for", "while", "with", "as", "lambda", "yield", "try", "except", "self", "none"),
    "js" -> Vector("function", "const", "let", "var", "return", "if", "else", "for", "while", "class", "import", "export", "async", "await", "new", "this", "typeof", "null"),
    "go" -> Vector("func", "package", "import", "type", "struct", "interface", "return", "if", "else", "for", "range", "go", "chan", "defer", "var", "const", "map", "nil"),
    "rs" -> Vector("fn", "let", "mut", "pub", "struct", "enum", "impl", "trait", "use", "match", "if", "else", "for", "while", "return", "mod", "crate", "unsafe"),
    "md" -> Vector("the", "a", "to", "and", "of", "in", "is", "for", "this", "that", "with", "as", "on", "by", "or", "an", "be", "are"))

  private val Exts: Map[String, String] = Map(
    "scala" -> "scala", "java" -> "java", "py" -> "py", "js" -> "js",
    "go" -> "go", "rs" -> "rs", "md" -> "md")

  // vocabulary for identifier parts (domain-ish english words)
  private val Words: Vector[String] = Vector(
    "get", "set", "build", "parse", "read", "write", "open", "close", "init", "load",
    "store", "fetch", "send", "recv", "merge", "split", "join", "map", "filter", "reduce",
    "index", "query", "score", "rank", "term", "doc", "token", "field", "shard", "block",
    "batch", "stream", "buffer", "cache", "pool", "queue", "stack", "heap", "tree", "graph",
    "node", "edge", "path", "file", "dir", "name", "value", "key", "hash", "code",
    "user", "group", "role", "auth", "session", "request", "response", "client", "server", "proxy",
    "config", "option", "param", "arg", "flag", "env", "ctx", "state", "event", "handler",
    "list", "array", "vector", "matrix", "table", "row", "column", "cell", "record", "entry",
    "count", "size", "length", "offset", "limit", "start", "end", "min", "max", "sum",
    "total", "avg", "mean", "stat", "metric", "log", "trace", "debug", "info", "warn",
    "error", "fail", "retry", "timeout", "delay", "tick", "clock", "time", "date", "zone",
    "parser", "lexer", "scanner", "emitter", "writer", "reader", "codec", "encoder", "decoder", "packer",
    "worker", "task", "job", "stage", "phase", "step", "plan", "rule", "expr", "pred",
    "http", "tcp", "udp", "url", "uri", "json", "xml", "yaml", "csv", "proto")

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** zipf-ish index in [0, n): heavily favors low indices. */
  private def zipfIdx(u: Double, n: Int): Int = {
    val v = math.pow(n.toDouble, u) - 1.0
    math.min(n - 1, v.toInt)
  }

  private def sha1Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  def genFile(i: Long, seed: Long): SourceFile = genFile(i, seed, 1)

  def genFile(i: Long, seed: Long, tokensScale: Int): SourceFile = {
    val rng = new java.util.Random(splitmix64(seed ^ (i * 0x9E3779B97F4A7C15L)))
    def nextInt(n: Int): Int = rng.nextInt(n)
    val lang = Langs(nextInt(Langs.length))
    val kws = Keywords(lang)
    val org = f"org${nextInt(40)}%03d"
    val repoName = f"repo${nextInt(25)}%03d"
    val repo = s"$org/$repoName"
    val depth = 1 + nextInt(3)
    val dirs = (0 until depth).map(_ => Words(nextInt(Words.length))).mkString("/")
    val path = s"src/$dirs/File${i}%s".format("." + Exts(lang))

    def ident(): String = {
      val parts = 1 + nextInt(3)
      val ws = (0 until parts).map(_ => Words(zipfIdx(rng.nextDouble(), Words.length)))
      if (parts == 1) ws.head
      else if (rng.nextBoolean()) // camelCase
        (ws.head +: ws.tail.map(w => w.head.toUpper + w.tail)).mkString
      else ws.mkString("_") // snake_case
    }

    val nTokens = (40 + nextInt(360)) * tokensScale
    val sb = new StringBuilder
    var t = 0
    while (t < nTokens) {
      val tok =
        if (rng.nextDouble() < 0.35) kws(zipfIdx(rng.nextDouble(), kws.length))
        else if (rng.nextDouble() < 0.05) (nextInt(10000)).toString
        else ident()
      sb.append(tok)
      sb.append(if (t % 8 == 7) " {\n  " else if (t % 5 == 4) "(x); " else " ")
      t += 1
    }
    val content = sb.toString
    SourceFile(repo, path, sha1Hex(s"$repo/$path@$seed"), lang, content)
  }

  def generate(
      spark: SparkSession,
      nFiles: Long,
      seed: Long = 42L,
      partitions: Int = 32,
      tokensScale: Int = 1): Dataset[SourceFile] = {
    import spark.implicits._
    spark.range(0L, nFiles, 1L, partitions).map(i => genFile(i, seed, tokensScale))
  }
}
