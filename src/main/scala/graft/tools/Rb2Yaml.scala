package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** One-shot `.rb` → `.yaml` translation-map converter (the reference's
  * loader evals Ruby map files — translation_map.rb:124-142; graft parses
  * the declarative subset instead, see [[graft.marc.RbMap]]).
  *
  *   sbt "runMain graft.tools.Rb2Yaml in_map.rb [out_map.yaml]"
  *
  * With no output path, writes alongside the input with the extension
  * swapped. Procedural maps (require/method calls/interpolation) fail
  * loudly — they are code, not data, and need a human port. */
object Rb2Yaml {
  def main(args: Array[String]): Unit = {
    require(args.length == 1 || args.length == 2,
      "usage: Rb2Yaml <in.rb> [out.yaml]")
    val in = Paths.get(args(0))
    val out = if (args.length == 2) Paths.get(args(1))
      else Paths.get(args(0).stripSuffix(".rb") + ".yaml")
    val src = new String(Files.readAllBytes(in), StandardCharsets.UTF_8)
    val yaml = graft.marc.RbMap.toYaml(src)
    Files.write(out, yaml.getBytes(StandardCharsets.UTF_8))
    println(s"[rb2yaml] wrote ${out.toAbsolutePath}")
  }
}
