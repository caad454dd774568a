package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Ingest

/** S12 (JDBC source) integration test: the sandbox has no network
  * database, but Spark ships Apache Derby (embedded, in-process) on
  * its classpath — enough to round-trip the reference's
  * `author_network(author1, author2, yr)` relation
  * (`personal_network.py:18-23`) through `Ingest.jdbc` for real,
  * including the partitioned-bounds path. */
class JdbcIngestSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  System.setProperty("derby.system.home",
    java.nio.file.Files.createTempDirectory("derby").toString)
  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("author_network round-trips through an embedded JDBC database") {
    val rows = Seq((1L, 2L, 2001), (1L, 3L, 2002), (2L, 3L, 2003),
      (3L, 4L, 2004), (4L, 5L, 2005))
    rows.toDF("author1", "author2", "yr")
      .write.mode("overwrite").jdbc(url, "author_network", props)

    val plain = Ingest.jdbc(spark, url, "author_network", props)
    assert(plain.as[(Long, Long, Int)].collect().toSet == rows.toSet)

    // partitioned read: each partition pulls its own author1 range
    val parted = Ingest.jdbc(spark, url, "author_network", props,
      partitionColumn = Some("author1"), bounds = Some((1L, 5L)),
      numPartitions = 3)
    assert(parted.rdd.getNumPartitions == 3)
    assert(parted.as[(Long, Long, Int)].collect().toSet == rows.toSet)
  }

  test("writeJdbc lands and appends through the engine's own sink") {
    val rows = Seq((10L, 20L, 2010), (10L, 30L, 2011))
    Ingest.writeJdbc(rows.toDF("author1", "author2", "yr"),
      url, "an_sink", props, numConnections = 2, batchSize = 2)
    val back = Ingest.jdbc(spark, url, "an_sink", props)
    assert(back.as[(Long, Long, Int)].collect().toSet == rows.toSet)

    val more = Seq((20L, 30L, 2012))
    Ingest.writeJdbc(more.toDF("author1", "author2", "yr"),
      url, "an_sink", props, append = true)
    val all = Ingest.jdbc(spark, url, "an_sink", props)
    assert(all.as[(Long, Long, Int)].collect().toSet == (rows ++ more).toSet)
  }

  test("partial partition spec is rejected") {
    intercept[IllegalArgumentException] {
      Ingest.jdbc(spark, url, "author_network", props,
        partitionColumn = Some("author1"), bounds = None)
    }
  }
}
