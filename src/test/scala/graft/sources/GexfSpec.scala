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

  test("write → parse round-trips the spell set (and re-validates)") {
    import graft.model.Spell
    val spells = Seq(
      Spell("node", 7L, None, 10L, 30L),
      Spell("node", 9L, None, 5L, 40L),
      Spell("edge", 7L, Some(9L), 12L, 20L),
      Spell("edge", 7L, Some(9L), 25L, 28L),
      Spell("edge", 3L, Some(9L), 1L, 2L))
    val f = Files.createTempFile("graft-gexf-rt", ".gexf").toFile
    Gexf.writeSpells(spells, f)
    val back = Gexf.parseSpells(f) // parse enforces dynamic/integer mode
    assert(back.toSet == spells.toSet)
    // byte-determinism: writing the same spells again yields identical bytes
    val f2 = Files.createTempFile("graft-gexf-rt2", ".gexf").toFile
    Gexf.writeSpells(spells.reverse, f2)
    assert(Files.readString(f.toPath) == Files.readString(f2.toPath))
  }
}
