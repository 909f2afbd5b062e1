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

  /** Dynamic-GEXF writer — the reader's inverse, closing the round-trip for
    * users whose corpora live as GEXF (the reference's native input). Same
    * dialect the reader validates: 1.2draft, `mode="dynamic"`,
    * `timeformat="integer"`, spells on nodes and edges. Driver-side like the
    * reader (GEXF files are metadata-sized); entities and spells are emitted
    * in sorted order so output is byte-deterministic. */
  def writeSpells(spells: Dataset[Spell], path: String): Unit =
    writeSpells(spells.collect().toSeq, new java.io.File(path))

  def writeSpells(spells: Seq[Spell], file: java.io.File): Unit = {
    spells.foreach { s =>
      require(Set("node", "edge")(s.kind), s"unknown spell kind '${s.kind}': $s")
      require(s.kind != "edge" || s.dst.isDefined, s"edge spell without target: $s")
    }
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder().newDocument()
    val gexf = doc.createElement("gexf")
    gexf.setAttribute("xmlns", "http://www.gexf.net/1.2draft")
    gexf.setAttribute("version", "1.2")
    doc.appendChild(gexf)
    val graph = doc.createElement("graph")
    graph.setAttribute("mode", "dynamic")
    graph.setAttribute("timeformat", "integer")
    graph.setAttribute("defaultedgetype", "undirected")
    gexf.appendChild(graph)

    def spellList(parent: Element, ss: Seq[(Long, Long)]): Unit = {
      val wrap = doc.createElement("spells")
      ss.sorted.foreach { case (t1, t2) =>
        val sp = doc.createElement("spell")
        sp.setAttribute("start", t1.toString)
        sp.setAttribute("end", t2.toString)
        wrap.appendChild(sp)
      }
      parent.appendChild(wrap)
    }

    val nodesEl = doc.createElement("nodes")
    spells.filter(_.kind == "node").groupBy(_.src).toSeq.sortBy(_._1)
      .foreach { case (id, ss) =>
        val n = doc.createElement("node")
        n.setAttribute("id", id.toString)
        n.setAttribute("label", id.toString)
        spellList(n, ss.map(s => (s.t1, s.t2)))
        nodesEl.appendChild(n)
      }
    graph.appendChild(nodesEl)

    val edgesEl = doc.createElement("edges")
    spells.filter(_.kind == "edge").groupBy(s => (s.src, s.dst.get)).toSeq.sortBy(_._1)
      .zipWithIndex.foreach { case (((src, dst), ss), i) =>
        val e = doc.createElement("edge")
        e.setAttribute("id", i.toString)
        e.setAttribute("source", src.toString)
        e.setAttribute("target", dst.toString)
        spellList(e, ss.map(s => (s.t1, s.t2)))
        edgesEl.appendChild(e)
      }
    graph.appendChild(edgesEl)

    val tf = javax.xml.transform.TransformerFactory.newInstance().newTransformer()
    tf.setOutputProperty(javax.xml.transform.OutputKeys.INDENT, "yes")
    tf.transform(new javax.xml.transform.dom.DOMSource(doc),
      new javax.xml.transform.stream.StreamResult(file))
  }
}
