package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.marc.{MarcFunctions, MarcJson, MarcRecord}

/** High-level MARC read/write surface (SURVEY.md §2.1/§2.2) spanning the
  * three serializations the reference's MarcReader dispatches on
  * (marc_source.type binary|xml|json, marc_reader.rb:54-90).
  */
object MarcIo {
  import MarcFunctions.marcRecordEncoder

  /** ISO 2709 binary via the splittable DSv2 ("marc" format).
    * `encoding` = marc_source.encoding: "UTF-8" (default) or "MARC-8"
    * (transcoded per value, invalid: :replace). */
  def readBinary(spark: SparkSession, path: String,
                 encoding: String = "UTF-8"): Dataset[MarcRecord] =
    spark.read.format("marc").option("encoding", encoding)
      .load(path).as[MarcRecord]

  /** marc-in-json NDJ (gz transparent) — see MarcSource.readJson. */
  def readJson(spark: SparkSession, path: String): Dataset[MarcRecord] =
    graft.marc.MarcSource.readJson(spark, path)

  /** MARC-XML via Spark's built-in XML source: one row per <record>,
    * mapped into the MarcRecord model. */
  def readXml(spark: SparkSession, path: String): Dataset[MarcRecord] = {
    import spark.implicits._
    // explicit schema: inference would type tag "001" as a number
    val xmlSchema = org.apache.spark.sql.types.StructType.fromDDL(
      """leader STRING,
         controlfield ARRAY<STRUCT<_VALUE: STRING, _tag: STRING>>,
         datafield ARRAY<STRUCT<_VALUE: STRING, _ind1: STRING, _ind2: STRING,
           _tag: STRING, subfield: ARRAY<STRUCT<_VALUE: STRING, _code: STRING>>>>""")
    val raw = spark.read.format("xml")
      .option("rowTag", "record")
      // MARC control fields are fixed-position: surrounding whitespace is data
      .option("ignoreSurroundingSpaces", "false")
      .schema(xmlSchema)
      .load(path)
    // Parse each record element through the lenient XML field mapper; going
    // via the row's XML is awkward, so re-read as text blocks is avoided by
    // projecting the known structure directly.
    val hasLeader = raw.columns.contains("leader")
    val sel = raw.select(
      (if (hasLeader) col("leader").cast("string") else lit(null).cast("string")).as("leader"),
      (if (raw.columns.contains("controlfield")) col("controlfield") else lit(null)).as("cf"),
      (if (raw.columns.contains("datafield")) col("datafield") else lit(null)).as("df"))
    sel.map { row =>
      val leader = row.getString(0)
      val controls = Option(row.get(1))
        .map(_ => row.getSeq[org.apache.spark.sql.Row](1).toVector)
        .getOrElse(Vector.empty).filter(_ != null).map { cf =>
        graft.marc.MarcField.control(
          str(cf, "_tag"), str(cf, "_VALUE"))
      }
      val datas = Option(row.get(2))
        .map(_ => row.getSeq[org.apache.spark.sql.Row](2).toVector)
        .getOrElse(Vector.empty).filter(_ != null).map { df =>
        val subIdx = try Some(df.fieldIndex("subfield")) catch {
          case _: IllegalArgumentException => None
        }
        val subs = subIdx.filterNot(df.isNullAt)
          .map(i => df.getSeq[org.apache.spark.sql.Row](i).toVector)
          .getOrElse(Vector.empty).filter(_ != null)
          .map(sf => graft.marc.Subfield(str(sf, "_code"), str(sf, "_VALUE")))
        graft.marc.MarcField(str(df, "_tag"), str(df, "_ind1"), str(df, "_ind2"), null, subs)
      }
      MarcRecord(leader, controls ++ datas)
    }
  }

  private def str(r: org.apache.spark.sql.Row, field: String): String =
    try {
      val i = r.fieldIndex(field)
      if (r.isNullAt(i)) null else String.valueOf(r.get(i))
    } catch { case _: IllegalArgumentException => null }

  /** Write a record Dataset as ISO 2709 part files (one per partition) —
    * the distributed analog of `marcout`/serialized binary
    * (command_line.rb:102-142). */
  def writeBinary(ds: Dataset[MarcRecord], outDir: String,
                  allowOversized: Boolean = false): Unit =
    writePartFiles(ds, outDir, "mrc") { (rows, out) =>
      rows.foreach(r => out.write(Iso2709.encode(r, allowOversized)))
    }

  /** `mode("overwrite")` + rename-on-commit semantics for raw part-file
    * sinks: the output directory is cleared up front (a rerun with fewer
    * partitions cannot leave stale part files mixed in), each task writes a
    * task-attempt-unique temp file, and the first attempt to finish renames
    * it into place — a retried/speculative attempt whose rename loses just
    * deletes its temp. */
  private def writePartFiles(ds: Dataset[MarcRecord], outDir: String, ext: String)(
      write: (Iterator[MarcRecord], org.apache.hadoop.fs.FSDataOutputStream) => Unit): Unit = {
    val dir = outDir
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      ds.sparkSession.sparkContext.hadoopConfiguration)
    val dirPath = new Path(dir)
    val dfs = dirPath.getFileSystem(hconf.value)
    if (dfs.exists(dirPath)) dfs.delete(dirPath, true): Unit
    dfs.mkdirs(dirPath): Unit
    ds.rdd.mapPartitionsWithIndex { (idx, rows) =>
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val fin = new Path(f"$dir/part-$idx%05d.$ext")
      val tmp = new Path(f"$dir/.part-$idx%05d-attempt-$attempt.$ext.tmp")
      val fs = tmp.getFileSystem(hconf.value)
      val out = fs.create(tmp, true)
      try { write(rows, out); out.close() }
      catch { case e: Throwable => out.close(); fs.delete(tmp, false); throw e }
      if (!fs.rename(tmp, fin)) fs.delete(tmp, false): Unit
      Iterator.empty
    }.count(): Unit
  }

  /** Write as marc-in-json NDJ via the JSON codec + text sink. */
  def writeJson(ds: Dataset[MarcRecord], outDir: String): Unit = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map(MarcJson.write).write.mode("overwrite").text(outDir)
  }

  /** Write as MARCXML part files (`marcout.type=xml`,
    * command_line.rb:125-126): each part is a complete collection
    * document, readable back with [[readXml]]. */
  def writeXml(ds: Dataset[MarcRecord], outDir: String): Unit =
    writePartFiles(ds, outDir, "xml") { (rows, out) =>
      out.write(("""<?xml version="1.0" encoding="UTF-8"?>""" +
        """<collection xmlns="http://www.loc.gov/MARC21/slim">""").getBytes("UTF-8"))
      rows.foreach(r => out.write(
        MarcXmlWriter.encode(r, includeNamespace = false).getBytes("UTF-8")))
      out.write("</collection>".getBytes("UTF-8"))
    }

  /** `marcout.type=human` (command_line.rb:127-128): the reference hands
    * records to a plain IO, so each one prints as ruby-marc `Record#to_s` —
    * "LEADER ..." then one line per field: control fields as `tag value`,
    * data fields as `tag i1i2 ` followed by `$c value ` per subfield. */
  def humanFormat(rec: MarcRecord): String = {
    val sb = new StringBuilder(256)
    sb.append("LEADER ").append(if (rec.leader == null) "" else rec.leader).append('\n')
    rec.fields.foreach { f =>
      sb.append(f.tag).append(' ')
      if (f.isControl) sb.append(f.value)
      else {
        sb.append(or1(f.ind1)).append(or1(f.ind2)).append(' ')
        f.subfields.foreach { sf =>
          sb.append('$').append(sf.code).append(' ').append(sf.value).append(' ')
        }
      }
      sb.append('\n')
    }
    sb.toString
  }

  private def or1(ind: String): String =
    if (ind == null || ind.isEmpty) " " else ind.take(1)

  /** Write human-readable part files (one [[humanFormat]] block per record;
    * the text sink re-adds the block's trailing newline, so records abut
    * exactly like sequential IO writes in the reference). */
  def writeHuman(ds: Dataset[MarcRecord], outDir: String): Unit = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map(r => humanFormat(r).stripSuffix("\n")).write.mode("overwrite").text(outDir)
  }
}
