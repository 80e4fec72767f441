package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-oriented sinks (SURVEY.md §2.2) re-expressed as df.write wrappers:
  * JsonWriter, DebugWriter, DelimitedWriter, CSVWriter. Each assumes the
  * pipeline output shape (one array<string> column per field, NULL = omit).
  */
object Writers {

  /** NDJSON of output docs (json_writer.rb:40-51): df.write.json already
    * omits NULL columns per row, matching output-hash serialization. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** DebugWriter (debug_writer.rb:34-70): `id fieldname values|joined`,
    * fields sorted by name, fixed-width columns. Returns the text frame so
    * callers can write or inspect. */
  def debugFrame(df: DataFrame, idField: String): DataFrame = {
    val fields = df.columns.filter(_ != idField).sorted
    val id = coalesce(array_join(col(idField), ","), lit("record"))
    val lines = fields.map { f =>
      when(col(f).isNotNull,
        format_string("%-12s %-25s %s", id, lit(f), array_join(col(f), " | ")))
    }
    df.select(explode(array(lines: _*)).as("line")).filter(col("line").isNotNull)
  }

  def writeDebug(df: DataFrame, idField: String, path: String): Unit =
    debugFrame(df, idField).write.mode("overwrite").text(path)

  /** DelimitedWriter (delimited_writer.rb:24-110): chosen fields, internal
    * separator (default |) for multi-values, delimiter-joined columns. */
  def delimitedFrame(df: DataFrame, fields: Seq[String],
                     internalDelimiter: String = "|"): DataFrame =
    df.select(fields.map(f =>
      coalesce(array_join(col(f), internalDelimiter), lit("")).as(f)): _*)

  def writeDelimited(df: DataFrame, fields: Seq[String], path: String,
                     delimiter: String = "\t", internalDelimiter: String = "|"): Unit =
    delimitedFrame(df, fields, internalDelimiter)
      .write.mode("overwrite").option("sep", delimiter).option("header", "true").csv(path)

  /** CSVWriter (csv_writer.rb:9-34): delimited with CSV quoting. */
  def writeCsv(df: DataFrame, fields: Seq[String], path: String): Unit =
    writeDelimited(df, fields, path, delimiter = ",")

  /** NullWriter — discard (null_writer.rb): noop format. */
  def writeNull(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  /** YamlWriter (yaml_writer.rb:4-8): one YAML document per record,
    * `---`-separated, field order = column order. */
  def yamlFrame(df: DataFrame): DataFrame = {
    val names = df.columns
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
    val toYaml = org.apache.spark.sql.functions.udf { (row: org.apache.spark.sql.Row) =>
      val m = new java.util.LinkedHashMap[String, Any]()
      names.zipWithIndex.foreach { case (n, i) =>
        if (!row.isNullAt(i)) row.get(i) match {
          case s: scala.collection.Seq[_] =>
            val l = new java.util.ArrayList[String]()
            s.foreach(v => l.add(String.valueOf(v)))
            m.put(n, l)
          case other => m.put(n, String.valueOf(other))
        }
      }
      mapper.writeValueAsString(m)
    }
    df.select(toYaml(struct(df.columns.map(col): _*)).as("yaml"))
  }

  def writeYaml(df: DataFrame, path: String): Unit =
    yamlFrame(df).write.mode("overwrite").text(path)
}
