package graft

import org.apache.spark.sql.functions.{col, explode}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("rootClosure climbs a multi-level hierarchy") {
    // 1→2→3 (root), 4→3, plus a self-loop 5→5 (dropped, like the
    // reference's parent==fieldId guard), a 2-cycle 6↔7 (must not hang),
    // and a multi-parent DAG node 8 (parents 2 and 9→10): must resolve
    // ONE root deterministically via the min parent (2, hence root 3)
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 3L), (5L, 5L), (6L, 7L), (7L, 6L),
      (8L, 2L), (8L, 9L), (9L, 10L)).toDF("child", "parent")
    val rows = Graph.rootClosure(edges).as[(Long, Long)].collect()
    assert(rows.length == rows.map(_._1).distinct.length) // one row per node
    val got = rows.toMap
    assert(got(1L) == 3L && got(2L) == 3L && got(4L) == 3L && got(3L) == 3L)
    assert(got(8L) == 3L && got(9L) == 10L)
    assert(Set(6L, 7L).contains(got(6L))) // cycle: terminates, stays inside
  }

  test("egoBfs labels vertices with first-reach level") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 6L))
      .toDF("a", "b")
    val got = Graph.egoBfs(spark, edges, seed = 1L, depth = 2)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 6L -> 2))
  }

  test("connectedComponents labels by min member") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val got = Graph.connectedComponents(edges).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("toNestedTemporalEdges builds the reference DLink nested map") {
    val long = Seq(
      (1L, 2L, 2000, 7L, 3L), (1L, 2L, 2000, 8L, 1L), (1L, 2L, 2001, 7L, 5L),
      (3L, 4L, 2002, 9L, 2L)).toDF("a", "b", "year", "paper", "n")
    val got = Graph.toNestedTemporalEdges(long)
      .as[(Long, Long, Map[Int, Map[Long, Long]])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 2L)) ==
      Map(2000 -> Map(7L -> 3L, 8L -> 1L), 2001 -> Map(7L -> 5L)))
    assert(got((3L, 4L)) == Map(2002 -> Map(9L -> 2L)))
  }

  test("toTemporalEdges materializes a year-sorted map from long form") {
    val long = Seq((1L, 2L, 2001L, 5L), (1L, 2L, 2000L, 3L), (3L, 4L, 2002L, 1L))
      .toDF("a", "b", "year", "n")
    val got = Graph.toTemporalEdges(long)
      .as[(Long, Long, Map[Long, Long])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 2L)) == Map(2000L -> 3L, 2001L -> 5L))
    assert(got((3L, 4L)) == Map(2002L -> 1L))
  }

  test("toGexf renders nodes and edges") {
    val vs = Seq((1L, "alice"), (2L, "bob")).toDF("id", "label")
    val es = Seq((1L, 2L, 3L)).toDF("src", "dst", "weight")
    val xml = Graph.toGexf(vs, es)
    assert(xml.contains("""<node id="1" label="alice" />"""))
    assert(xml.contains("""<edge id="0" source="1" target="2" weight="3" />"""))
    // single-file export sink (S7)
    val out = java.nio.file.Files.createTempDirectory("gexf").toString + "/net"
    graft.sources.Ingest.writeSingleText(spark, xml, out)
    val back = spark.read.text(out).collect().map(_.getString(0)).mkString("\n")
    assert(back.contains("<gexf") && back.contains("alice"))
  }

  test("toForceJson emits valid D3 nodes/links JSON (round-trips through a JSON reader)") {
    val vs = Seq((1L, "alice \"a\""), (2L, "bob")).toDF("id", "label")
    val es = Seq((1L, 2L, 3L)).toDF("src", "dst", "weight")
    val json = Graph.toForceJson(vs, es)
    // validate with a real JSON parser: read back via Spark
    val parsed = spark.read.json(Seq(json).toDS)
    val nodes = parsed.select(explode(col("nodes")).as("n"))
      .select(col("n.id"), col("n.label")).as[(String, String)].collect().toSet
    assert(nodes == Set(("1", "alice \"a\""), ("2", "bob")))
    val links = parsed.select(explode(col("links")).as("l"))
      .select(col("l.source"), col("l.target"), col("l.weight"))
      .as[(String, String, Double)].collect().toSet
    assert(links == Set(("1", "2", 3.0)))
  }

  test("toForceHtml embeds the graph and a force-layout script") {
    val vs = Seq((1L, "alice"), (2L, "bob")).toDF("id", "label")
    val es = Seq((1L, 2L, 3L)).toDF("src", "dst", "weight")
    val html = Graph.toForceHtml(vs, es, "t")
    assert(html.contains("forceSimulation") && html.contains("\"label\":\"alice\""))
    val out = java.nio.file.Files.createTempDirectory("d3").toString + "/net.html"
    graft.sources.Ingest.writeSingleText(spark, html, out)
    val back = spark.read.text(out).collect().map(_.getString(0)).mkString("\n")
    assert(back.contains("<!DOCTYPE html>") && back.contains("forceSimulation"))
  }
}
