package graft.pipeline

/** String-keyed pipeline settings with the reference's precedence semantics
  * (/root/reference/lib/traject/indexer/settings.rb:23-96, doc/settings.md):
  * `provide` = first-set-wins (config files use this so CLI/-s overrides
  * survive), `store` = last-set-wins (forceful override), `withDefaults` =
  * fill-only-missing (class-level defaults merged last).
  */
final class Settings private (val underlying: Map[String, String]) extends Serializable {

  def contains(key: String): Boolean = underlying.contains(key)
  def get(key: String): Option[String] = underlying.get(key)
  def getOrElse(key: String, default: => String): String = underlying.getOrElse(key, default)
  def getInt(key: String, default: Int): Int = underlying.get(key).map(_.toInt).getOrElse(default)
  def getBoolean(key: String, default: Boolean): Boolean =
    underlying.get(key).map(_.toBoolean).getOrElse(default)

  /** First-set-wins: a later provide of an existing key is a no-op. */
  def provide(key: String, value: String): Settings =
    if (contains(key)) this else new Settings(underlying + (key -> value))

  /** Last-set-wins. */
  def store(key: String, value: String): Settings =
    new Settings(underlying + (key -> value))

  /** Fill in defaults for keys not yet set (indexer-class defaults,
    * indexer.rb:282-298). */
  def withDefaults(defaults: Map[String, String]): Settings =
    new Settings(defaults ++ underlying)

  /** Output-document knobs derived from the standard keys. */
  def pipelineSettings: PipelineSettings = PipelineSettings(
    allowNilValues = getBoolean("allow_nil_values", default = false),
    allowDuplicateValues = getBoolean("allow_duplicate_values", default = true),
    allowEmptyFields = getBoolean("allow_empty_fields", default = false))
}

object Settings {
  val empty: Settings = new Settings(Map.empty)

  /** CLI -s pairs > config-file provides > class defaults — the reference's
    * merge order (command_line.rb:192-234). */
  def fromCli(cliPairs: Map[String, String]): Settings = new Settings(cliPairs)
}
