package graft
import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, IndexConfig}
object OrderTest {
  def session(cores: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cores]").appName(s"ot-$cores")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("OT_PARTS", "64").toInt).config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN"); s
  }
  def main(args: Array[String]): Unit = {
    val cfg = IndexConfig(buildPartitions = sys.env.getOrElse("OT_PARTS", "64").toInt, docsPerShard = 1L << 14, buildBuckets = 2)
    val n = sys.env.getOrElse("OT_FILES", "100000").toLong
    for (cores <- args(0).split(",").map(_.toInt)) {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val s = session(cores)
      val corpus = CorpusGen.generate(s, n, 42L, sys.env.getOrElse("OT_PARTS", "64").toInt, sys.env.getOrElse("OT_SCALE", "1").toInt).toDF()
      val t0 = System.nanoTime()
      new IndexBuilder(s, cfg).build(corpus, s"/dev/shm/ot-idx-$cores-${System.nanoTime()}", resume = false)
      println(f"[ordertest] cores=$cores files/s=${n / ((System.nanoTime()-t0)/1e9)}%.0f")
      s.stop()
    }
  }
}
