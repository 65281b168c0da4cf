package graft.runner

import graft.adapters.{AdapterMeta, Adapters}

/** Adapter documentation generator — parity with the reference's DocGen
  * (datacooker-dist-cli test-scope tool rendering every adapter's meta to
  * HTML, DocGen.java:42-227): renders the registry's declared metadata
  * (verbs, descriptions, params with defaults, path examples, an example
  * JSON task) to Markdown. The single source of truth is the same
  * [[graft.adapters.ParamDef]] metadata that validates configs at run
  * time, so docs cannot drift from behavior.
  */
object DocGen {

  def render(): String = {
    val sb = new StringBuilder
    sb ++= "# Adapter reference\n\nGenerated from the adapter registry"
    sb ++= " (`graft.adapters.Adapters`); regenerate with `sbt \"runMain graft.runner.DocGen\"`.\n"
    def section(title: String, metas: Seq[AdapterMeta]): Unit = {
      sb ++= s"\n## $title\n"
      metas.foreach { m =>
        sb ++= s"\n### `${m.verb}`\n\n${m.descr}\n\n"
        sb ++= s"Path examples: ${m.pathExamples.map("`" + _ + "`").mkString(", ")}\n\n"
        if (m.params.nonEmpty) {
          sb ++= "| param | description | default | required |\n|---|---|---|---|\n"
          m.params.foreach { p =>
            sb ++= s"| `${p.name}` | ${p.descr} | ${p.default.map(d => s"`$d`").getOrElse("—")} | ${if (p.required) "yes" else "no"} |\n"
          }
        }
      }
    }
    def distinctMetas(ms: Iterable[AdapterMeta]): Seq[AdapterMeta] =
      ms.toSeq.distinctBy(_.verb)
    section("Input adapters", distinctMetas(Adapters.inputs.values.map(_.meta)))
    section("Output adapters", distinctMetas(Adapters.outputs.values.map(_.meta)))
    sb ++= s"""
      |## Example task
      |
      |```json
      |{"direction1": [{
      |  "source": {"adapter": "hadoopColumnar", "path": "file:/data/in",
      |             "part_count": 8,
      |             "params": {"delimiter": ",", "schema_from_file": true,
      |                        "columns": ["id", "name"]}},
      |  "dest":   {"adapter": "hadoopParquet", "path": "file:/data/out",
      |             "params": {"codec": "snappy"}}}]}
      |```
      |""".stripMargin
    sb.result()
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "docs/adapters.md"
    val p = java.nio.file.Paths.get(out)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(p, render())
    println(s"[docgen] wrote $out")
  }
}
