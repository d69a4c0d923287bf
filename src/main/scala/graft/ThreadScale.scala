package graft
object ThreadScale {
  def main(args: Array[String]): Unit = {
    for (threads <- Seq(1, 8, 32)) {
      val n = 100000
      val per = n / threads
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          var i = t * per
          var acc = 0L
          while (i < (t + 1) * per) {
            val f = graft.corpus.CorpusGen.genFile(i.toLong, 42L)
            acc += graft.analysis.Analyzer.tokenize(f.content).length
            i += 1
          }
          if (acc == -1) println("impossible")
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[threadscale] threads=$threads files/s=${n / secs}%.0f")
    }
  }
}
