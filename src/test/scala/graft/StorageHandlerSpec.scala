package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.StorageHandlers

/** Storage-handler seam: write/read/exists/drop per format + transfer. */
class StorageHandlerSpec extends SparkSpec {

  import spark.implicits._

  private lazy val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "s", "x")

  test("parquet/orc/json/csv handlers round-trip") {
    for (name <- Seq("parquet", "orc", "json", "csv")) {
      val h = StorageHandlers(name)
      val store = Files.createTempDirectory(s"graft-$name").toString + "/t"
      h.exists(spark, store) shouldBe false
      h.write(spark, store, df, overwrite = true)
      h.exists(spark, store) shouldBe true
      val back = h.read(spark, store)
      back.count() shouldBe 2
      h.drop(spark, store)
      h.exists(spark, store) shouldBe false
    }
  }

  test("predicates are applied (and pushed) on handler reads") {
    val h = StorageHandlers("parquet")
    val store = Files.createTempDirectory("graft-pred").toString + "/t"
    h.write(spark, store, df, overwrite = true)
    val got = h.read(spark, store, Seq(col("x") > 2.0))
    got.collect().map(_.getLong(0)).toSeq shouldBe Seq(2L)
    got.queryExecution.executedPlan.toString should include("PushedFilters: [")
  }

  test("transfer moves data between engines") {
    val from = Files.createTempDirectory("graft-from").toString + "/t"
    val to = Files.createTempDirectory("graft-to").toString + "/t"
    StorageHandlers("parquet").write(spark, from, df, overwrite = true)
    StorageHandlers.transfer(spark, StorageHandlers("parquet"), from,
      StorageHandlers("json"), to)
    StorageHandlers("json").read(spark, to).count() shouldBe 2
  }

  test("unknown handler rejected") {
    an[IllegalArgumentException] should be thrownBy StorageHandlers("cassandra")
  }

  test("jdbc handler round-trips against embedded Derby with pushdown") {
    val dbDir = Files.createTempDirectory("graft-derby").toString + "/db"
    System.setProperty("derby.stream.error.file", "/dev/null")
    val h = new graft.sources.JdbcHandler("jdbc", s"jdbc:derby:$dbDir;create=true")
    h.exists(spark, "tbl") shouldBe false
    h.write(spark, "tbl", df, overwrite = true)
    h.exists(spark, "tbl") shouldBe true
    h.read(spark, "tbl").count() shouldBe 2
    // append then overwrite semantics
    h.write(spark, "tbl", df, overwrite = false)
    h.read(spark, "tbl").count() shouldBe 4
    h.write(spark, "tbl", df, overwrite = true)
    h.read(spark, "tbl").count() shouldBe 2
    // predicate reaches the database scan, not a post-filter
    val got = h.read(spark, "tbl", Seq(col("x") > 2.0))
    got.collect().map(_.getLong(0)).toSeq shouldBe Seq(2L)
    got.queryExecution.executedPlan.toString should include("PushedFilters: [")
    // transfer from a file engine into the database
    val from = Files.createTempDirectory("graft-j-from").toString + "/t"
    StorageHandlers("parquet").write(spark, from, df, overwrite = true)
    StorageHandlers.transfer(spark, StorageHandlers("parquet"), from, h, "tbl2")
    h.read(spark, "tbl2").count() shouldBe 2
    h.drop(spark, "tbl")
    h.exists(spark, "tbl") shouldBe false
  }
}
