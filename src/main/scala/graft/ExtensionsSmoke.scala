package graft

import org.apache.spark.sql.SparkSession

/**
 * Proof of the CLUSTER install path: a fresh JVM whose session is
 * built with `spark.sql.extensions=graft.agg.GraftExtensions` gets
 * every `graft_*` SQL function WITHOUT any driver-side
 * `GraftFunctions.register()` call — the way a Thrift/Connect user
 * that never runs Scala code would consume the library. Run by
 * `ExtensionsInstallSpec` as a forked process (extensions only apply
 * at session construction, so an in-suite shared session can't test
 * this path).
 */
object ExtensionsSmoke {
  def main(args: Array[String]): Unit =
    // hard-exit on ANY outcome: a failed assert must not leave
    // non-daemon Spark threads holding the forked JVM open (the spec
    // reads this process's output to EOF)
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.extensions", "graft.agg.GraftExtensions")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val row = spark.sql(
        "SELECT graft_bloom_contains(graft_bloom_agg(k, 20000, 0.001), 'k3') AS hit, " +
          "graft_bloom_contains(graft_bloom_agg(k, 20000, 0.001), 'absent') AS miss, " +
          "graft_hll_estimate(graft_hll_agg(k, 12)) AS nd, " +
          "graft_lbf_count(graft_lbf_agg(k, 20000, 0.001), 'k1') AS m1 " +
          "FROM VALUES ('k1'), ('k1'), ('k2'), ('k3') AS t(k)").head()
      assert(row.getBoolean(0), "bloom membership via extensions")
      assert(!row.getBoolean(1), "bloom absent key via extensions")
      assert(row.getLong(2) == 3L, s"hll distinct via extensions, got ${row.getLong(2)}")
      assert(row.getInt(3) >= 1 && row.getInt(3) <= 2, s"lbf count via extensions, got ${row.getInt(3)}")
      println("EXTENSIONS_OK")
      spark.stop()
      sys.exit(0)
    } catch {
      case e: Throwable =>
        System.err.println(s"EXTENSIONS_FAIL: $e")
        sys.exit(1)
    }
}
