package graft
import java.util.regex.Pattern
object MicroScale {
  def bench(name: String, n: Int, work: Int => Unit): Unit = {
    for (threads <- Seq(1, 8, 32)) {
      val per = n / threads
      val t0 = System.nanoTime()
      val ts = (0 until threads).map(t => new Thread(() => { var i = 0; while (i < per) { work(t * per + i); i += 1 } }))
      ts.foreach(_.start()); ts.foreach(_.join())
      println(f"[micro] $name threads=$threads ops/s=${n / ((System.nanoTime()-t0)/1e9)}%.0f")
    }
  }
  def main(args: Array[String]): Unit = {
    val sample = graft.corpus.CorpusGen.genFile(1L, 42L).content
    val identSplitP = Pattern.compile("[^A-Za-z0-9_]+")
    val camelLuP = Pattern.compile("([a-z0-9])([A-Z])")
    val subSplitP = Pattern.compile("[_ ]+")
    bench("identSplit", 200000, { _ => identSplitP.split(sample) })
    bench("camelReplace", 2000000, { _ => camelLuP.matcher("getFooBar").replaceAll("$1 $2") })
    bench("subSplit", 2000000, { _ => subSplitP.split("get foo bar") })
    bench("lowercase", 2000000, { _ => "GetFooBAR".toLowerCase })
    bench("subtokens", 2000000, { _ => graft.analysis.Analyzer.subtokens("getFooBar") })
    bench("tokenize", 100000, { _ => graft.analysis.Analyzer.tokenize(sample) })
  }
}
