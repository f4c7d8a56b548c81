package graft.catalog

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/**
 * Lifecycle parity with the reference wire protocol
 * (`integ/test_integ.py:74-278`, `tests/bloomd/test_filtmgr.c`).
 */
class CatalogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshCatalog(): SketchCatalog =
    new SketchCatalog(spark, Files.createTempDirectory("graftcat").toString)

  test("create validation mirrors sane_* bounds") {
    val c = freshCatalog()
    assert(c.create("foo") == "Done")
    assert(c.create("foo") == "Exists")
    assert(c.create("bad name") == "Client Error: Bad filter name")
    assert(c.create("x" * 201) == "Client Error: Bad filter name")
    assert(c.create("small", capacity = 10000) == "Client Error: Bad arguments") // must be > 10000
    assert(c.create("okcap", capacity = 10001) == "Done")
    assert(c.create("badp1", prob = 0.1) == "Client Error: Bad arguments")
    assert(c.create("badp2", prob = 0.0) == "Client Error: Bad arguments")
    assert(c.create("okp", prob = 0.09) == "Done")
  }

  test("set/check/info counters follow bloomf_add/contains semantics") {
    import spark.implicits._
    val c = freshCatalog()
    c.create("f1")
    val keys = Seq("a", "b", "c", "a").toDF("k").coalesce(1)
    val res = c.setKeys("f1", keys).toOption.get.collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(res("a") && res("b") && res("c")) // all new vs initial state
    val info1 = c.info("f1").toOption.get.head()
    assert(info1.getAs[Long]("sets") == 4)
    assert(info1.getAs[Long]("set_hits") == 3)
    assert(info1.getAs[Long]("set_misses") == 1)
    assert(info1.getAs[Long]("size") == 3)

    val checks = c.checkKeys("f1", Seq("a", "zz").toDF("k")).toOption.get
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(checks("a") && !checks("zz"))
    val info2 = c.info("f1").toOption.get.head()
    assert(info2.getAs[Long]("checks") == 2)
    assert(info2.getAs[Long]("check_hits") == 1)
    assert(info2.getAs[Long]("check_misses") == 1)
    assert(info2.getAs[Int]("in_memory") == 1)
  }

  test("close -> proxied -> fault-in on check; clear only when proxied") {
    import spark.implicits._
    val c = freshCatalog()
    c.create("lc")
    c.setKeys("lc", Seq("k1", "k2").toDF("k"))
    assert(c.clear("lc") == "Filter is not proxied. Close it first.")
    assert(c.close("lc") == "Done")
    val info = c.info("lc").toOption.get.head()
    assert(info.getAs[Int]("in_memory") == 0) // proxied
    assert(info.getAs[Long]("size") == 2) // read from disk
    // fault-in on use
    val chk = c.checkKeys("lc", Seq("k1").toDF("k")).toOption.get.head()
    assert(chk.getBoolean(1))
    assert(c.info("lc").toOption.get.head().getAs[Long]("page_ins") == 1)
    // now loaded again -> clear refused, close again then clear works
    assert(c.clear("lc") == "Filter is not proxied. Close it first.")
    assert(c.close("lc") == "Done")
    assert(c.clear("lc") == "Done")
    assert(!c.exists("lc"))
  }

  test("restore across catalog restart keeps membership and size") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graftcat").toString
    val c1 = new SketchCatalog(spark, dir)
    c1.create("persist1")
    c1.setKeys("persist1", (0 until 1000).map(i => s"pk$i").toDF("k"))
    c1.flush()
    // new catalog over the same dir — restores proxied, faults in lazily
    val c2 = new SketchCatalog(spark, dir)
    assert(c2.exists("persist1"))
    val r = c2.checkKeys("persist1", Seq("pk0", "pk999", "nope").toDF("k"))
      .toOption.get.collect().map(x => (x.getString(0), x.getBoolean(1))).toMap
    assert(r("pk0") && r("pk999") && !r("nope"))
    val info = c2.info("persist1").toOption.get.head()
    assert(info.getAs[Long]("size") == 1000)
  }

  test("list with prefix, lexicographic order, drop removes files") {
    import spark.implicits._
    val c = freshCatalog()
    c.create("pfx_b"); c.create("pfx_a"); c.create("other")
    c.setKeys("pfx_a", Seq("x").toDF("k"))
    val all = c.list().collect().map(_.getString(0))
    assert(all.sameElements(Array("other", "pfx_a", "pfx_b")))
    val pfx = c.list("pfx_").collect().map(_.getString(0))
    assert(pfx.sameElements(Array("pfx_a", "pfx_b")))
    assert(c.drop("pfx_a") == "Done")
    assert(c.drop("pfx_a") == "Filter does not exist")
    assert(c.list("pfx_").collect().map(_.getString(0)).sameElements(Array("pfx_b")))
    assert(c.info("nonexistent").isLeft)
  }
}
