package graft.sources

import scala.collection.mutable

import org.w3c.dom.Element

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.Spell

/** Dynamic-GEXF reader (SURVEY.md §2.A A1; reference
  * `load_gexf_to_neo4j.py:61-98`): GEXF 1.2draft with `mode="dynamic"`,
  * `timeformat="integer"` (POSIX seconds), spells on nodes and edges.
  *
  * Parsed driver-side with the JDK DOM parser — GEXF inputs are metadata-
  * sized (the reference loads them whole into Python dicts); the heavy,
  * data-proportional work (discretization, joins) happens in Spark on the
  * resulting Dataset[Spell]. For 100 TB-scale spell streams the same schema
  * arrives via Parquet/streaming instead, so no distributed XML parse is
  * needed. */
object Gexf {

  def readSpells(spark: SparkSession, path: String): Dataset[Spell] = {
    import spark.implicits._
    spark.createDataset(parseSpells(new java.io.File(path)))
  }

  /** Parse node + edge spells; validates dynamic/integer mode like the
    * reference (`load_gexf_to_neo4j.py:63-67`). */
  def parseSpells(file: java.io.File): Seq[Spell] = {
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder().parse(file)
    val graph = doc.getElementsByTagName("graph").item(0).asInstanceOf[Element]
    require(graph.getAttribute("mode") == "dynamic", "GEXF graph must be dynamic")
    require(graph.getAttribute("timeformat") == "integer",
      "GEXF timeformat must be integer (POSIX seconds)")

    val out = mutable.ArrayBuffer.empty[Spell]
    def spellsOf(e: Element): Seq[(Long, Long)] = {
      val ns = e.getElementsByTagName("spell")
      (0 until ns.getLength).map { i =>
        val s = ns.item(i).asInstanceOf[Element]
        (s.getAttribute("start").toLong, s.getAttribute("end").toLong)
      }
    }
    val nodes = graph.getElementsByTagName("node")
    (0 until nodes.getLength).foreach { i =>
      val n = nodes.item(i).asInstanceOf[Element]
      val id = n.getAttribute("id").toLong
      spellsOf(n).foreach { case (t1, t2) => out += Spell("node", id, None, t1, t2) }
    }
    val edges = graph.getElementsByTagName("edge")
    (0 until edges.getLength).foreach { i =>
      val e = edges.item(i).asInstanceOf[Element]
      val src = e.getAttribute("source").toLong
      val dst = e.getAttribute("target").toLong
      spellsOf(e).foreach { case (t1, t2) => out += Spell("edge", src, Some(dst), t1, t2) }
    }
    out.toSeq
  }
}
