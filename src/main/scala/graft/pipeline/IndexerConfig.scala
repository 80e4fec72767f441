package graft.pipeline

import org.apache.spark.sql.DataFrame

/** User-suppliable indexing configuration — the `-c config` contract of
  * the reference CLI (/root/reference/lib/traject/command_line.rb:102-142)
  * re-expressed for a compiled language: instead of an eval'd ruby file,
  * the CLI loads a named Scala object or class implementing this trait
  * (from the job jar's classpath) and calls `index` on the record frame. */
trait IndexerConfig {
  /** records: one row with a `record` struct column (leader, fields). */
  def index(records: DataFrame): DataFrame
}

object IndexerConfig {
  /** Resolve a config by fully-qualified name: a Scala `object` (MODULE$)
    * or a class with a no-arg constructor. ConfigLoadError parity
    * (command_line.rb / indexer.rb:799-813): unknown names raise with the
    * name in the message. */
  def load(name: String): IndexerConfig =
    try {
      val moduleClass =
        try Class.forName(name + "$")
        catch { case _: ClassNotFoundException => Class.forName(name) }
      if (moduleClass.getName.endsWith("$"))
        moduleClass.getField("MODULE$").get(null).asInstanceOf[IndexerConfig]
      else
        moduleClass.getDeclaredConstructor().newInstance().asInstanceOf[IndexerConfig]
    } catch {
      case e: ClassNotFoundException =>
        throw new IllegalArgumentException(
          s"Could not load indexer config '$name' (expected an object or " +
            s"no-arg class implementing graft.pipeline.IndexerConfig)", e)
      case e: ClassCastException =>
        throw new IllegalArgumentException(
          s"'$name' does not implement graft.pipeline.IndexerConfig", e)
    }
}
