package graft
import org.apache.spark.sql.SparkSession
object SparkScale {
  def main(args: Array[String]): Unit = {
    for (cores <- args(0).split(",").map(_.toInt)) {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val s = SparkSession.builder().master(s"local[$cores]").appName(s"ss-$cores")
        .config("spark.sql.shuffle.partitions", 64)
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      import s.implicits._
      // pure CPU via Dataset.map (encoder allocation path, no writes)
      var t0 = System.nanoTime()
      val c1 = s.range(0, 2000000, 1, 64).map { i =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        md.digest(java.lang.Long.toString(i).getBytes)(0).toLong
      }.filter(_ != 127).count()
      val mapSecs = (System.nanoTime()-t0)/1e9
      // corpus gen+tokenize (the doctf inner loop) without writing
      t0 = System.nanoTime()
      val c2 = graft.corpus.CorpusGen.generate(s, 100000, 42L, 64)
        .map(f => graft.analysis.Analyzer.tokenize(f.content).length.toLong).filter(_ >= 0).count()
      val tokSecs = (System.nanoTime()-t0)/1e9
      println(f"[sparkscale] cores=$cores mapJob=${2000000/mapSecs}%.0f rows/s tokenize=${100000/tokSecs}%.0f files/s ($c1 $c2)")
      s.stop()
    }
  }
}
