package graft.marc

import scala.io.Source

/** Loads marc-in-json fixtures (converted from the reference's
  * test/test_support corpus by tools/marc2json.py). */
object Fixtures {
  def records(name: String): Vector[MarcRecord] = {
    val in = getClass.getClassLoader.getResourceAsStream(s"fixtures/$name.json")
    require(in != null, s"missing fixture $name")
    val src = Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map(MarcJson.parse).toVector
    finally src.close()
  }

  def first(name: String): MarcRecord = records(name).head
}
