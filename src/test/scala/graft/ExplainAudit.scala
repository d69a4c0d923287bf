package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool (not a test): prints join strategies, shuffle counts and
  * pushed filters for selected harness queries so scale regressions
  * (accidental cartesian, missing broadcast, lost pushdown) are visible.
  * Run: `sbt "Test/runMain graft.ExplainAudit [queryName ...]"` */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (q <- names if !q.startsWith("fts")) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      def n(re: String) = re.r.findAllIn(plan).size
      println(f"$q%-22s bhj=${n("BroadcastHashJoin")} bnlj=${n("BroadcastNestedLoop")} " +
        f"smj=${n("SortMergeJoin")} shj=${n("ShuffledHashJoin")} cart=${n("CartesianProduct")} " +
        f"exch=${n("Exchange")} pushed=${n("PushedFilters: \\[[A-Za-z]")}")
    }
    spark.stop()
  }
}
