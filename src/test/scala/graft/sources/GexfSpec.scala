package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** GEXF reader validation, mirroring the reference's input strictness
  * (`load_gexf_to_neo4j.py:63-67`): only dynamic graphs with integer
  * timeformat are accepted; spells parse on both nodes and edges. */
class GexfSpec extends AnyFunSuite {

  private def write(xml: String): java.io.File = {
    val f = Files.createTempFile("graft-gexf", ".gexf").toFile
    Files.writeString(f.toPath, xml)
    f
  }

  private def gexf(mode: String, timeformat: String): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<gexf xmlns="http://www.gexf.net/1.2draft" version="1.2">
       |  <graph mode="$mode" defaultedgetype="undirected" timeformat="$timeformat">
       |    <nodes>
       |      <node id="7" label="seven"><spells><spell start="10" end="30"/></spells></node>
       |    </nodes>
       |    <edges>
       |      <edge id="0" source="7" target="9">
       |        <spells><spell start="12" end="20"/><spell start="25" end="28"/></spells>
       |      </edge>
       |    </edges>
       |  </graph>
       |</gexf>""".stripMargin

  test("parses node and edge spells from a dynamic integer-time GEXF") {
    val spells = Gexf.parseSpells(write(gexf("dynamic", "integer")))
    assert(spells.count(_.kind == "node") == 1)
    val edgeSpells = spells.filter(_.kind == "edge")
    assert(edgeSpells.map(s => (s.t1, s.t2)).toSet == Set((12L, 20L), (25L, 28L)))
    assert(edgeSpells.forall(s => s.src == 7L && s.dst.contains(9L)))
  }

  test("rejects a static graph like the reference") {
    val ex = intercept[IllegalArgumentException] {
      Gexf.parseSpells(write(gexf("static", "integer")))
    }
    assert(ex.getMessage.contains("dynamic"))
  }

  test("rejects non-integer timeformat like the reference") {
    val ex = intercept[IllegalArgumentException] {
      Gexf.parseSpells(write(gexf("dynamic", "date")))
    }
    assert(ex.getMessage.contains("integer"))
  }
}
