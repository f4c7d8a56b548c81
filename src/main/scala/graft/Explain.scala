package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection harness: `runMain graft.Explain <query> [sfDir]`
  * prints the formatted physical plan and wall time of one
  * SparkEntry query — the explain-and-iterate loop for plan quality
  * (pushdown, broadcast, codegen spans). */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    // timed runs REBUILD the frame and sink to noop — the same window
    // Bench measures, so gate-construction work (eager stage
    // checkpoints, driver-side fixture actions) is counted, and no
    // count()-triggered aggregate pruning skews the number
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[explain] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
