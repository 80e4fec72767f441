package graft.marc

import java.io.InputStreamReader
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** Key → value lookup used to map extracted values to vocabulary terms.
  *
  * Value model (semantics from
  * /root/reference/lib/traject/translation_map.rb:187-230):
  *  - key present mapping to string → that string;
  *  - key present mapping to an array → elements flattened into the output;
  *  - key present mapping to nil → input element removed;
  *  - key absent: default ("__default__" entry or :default option) if set,
  *    where the special default "__passthrough__" returns the input itself;
  *    otherwise removed.
  *
  * Merge: later maps override earlier, later default wins
  * (translation_map.rb:245-248).
  */
final case class TranslationMap(
    entries: Map[String, Option[Vector[String]]],
    default: Option[String] = None) extends Serializable {

  def lookup(key: String): Option[Vector[String]] =
    entries.get(key) match {
      case Some(v) => v
      case None =>
        default match {
          case Some(TranslationMap.Passthrough) => Some(Vector(key))
          case Some(d)                          => Some(Vector(d))
          case None                             => None
        }
    }

  def translateArray(values: Seq[String]): Vector[String] =
    values.iterator.flatMap(v => lookup(v).getOrElse(Vector.empty))
      .filter(_ != null).toVector // ruby translate_array drops nil outputs

  def merge(other: TranslationMap): TranslationMap =
    TranslationMap(entries ++ other.entries, other.default.orElse(default))

  /** Spark-facing view: plain Map[String, Seq[String]] of live entries
    * (removed keys map to empty), for literal-map column expressions. */
  def toFlatMap: Map[String, Seq[String]] =
    entries.map { case (k, v) => k -> v.getOrElse(Vector.empty) }
}

object TranslationMap {
  val Passthrough = "__passthrough__"
  private val DefaultKey = "__default__"

  def fromPairs(pairs: (String, String)*): TranslationMap =
    fromRaw(pairs.toMap)

  /** Build from a loosely-typed map (YAML/JSON load output): values may be
    * String, number, Boolean, List, or null. Non-string keys (YAML 1.1 turns
    * a bare `yes:` into a boolean in ruby's Psych and snakeyaml alike) are
    * stringified — such entries are unreachable by string lookup in the
    * reference too. */
  def fromRaw(anyRaw: Map[_, Any]): TranslationMap = {
    val raw: Map[String, Any] = anyRaw.map { case (k, v) => String.valueOf(k) -> v }
    val default = raw.get(DefaultKey).collect { case s: String => s }
    val entries = (raw - DefaultKey).map { case (k, v) =>
      k -> (v match {
        case null           => None
        case s: String      => Some(Vector(s))
        case l: Seq[_]      => Some(l.map(String.valueOf).toVector)
        case l: java.util.List[_] => Some(l.asScala.map(String.valueOf).toVector)
        case other          => Some(Vector(String.valueOf(other)))
      })
    }
    TranslationMap(entries, default)
  }

  /** Load a bundled map from classpath `translation_maps/<name>.rb`,
    * `.yaml`, or `.properties` — the reference's load-path order
    * (translation_map.rb:124-142). `.rb` maps load through [[RbMap]]'s
    * declarative-subset parser (hash literals, `%w` arrays, variable
    * mutation — no eval; procedural maps fail loudly; `tools/`'s
    * Rb2Yaml main converts them to YAML offline). Loaded once per JVM
    * (the reference's file cache, translation_map.rb:107-155). */
  def named(name: String): TranslationMap =
    cache.computeIfAbsent(name, loadResource)

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, TranslationMap]()

  private val loadResource = new java.util.function.Function[String, TranslationMap] {
    def apply(name: String): TranslationMap = {
      val cl = getClass.getClassLoader
      val rbPath = s"translation_maps/$name.rb"
      val yamlPath = s"translation_maps/$name.yaml"
      val propPath = s"translation_maps/$name.properties"
      Option(cl.getResourceAsStream(rbPath)).foreach { in =>
        try return RbMap.toTranslationMap(
          new String(in.readAllBytes(), StandardCharsets.UTF_8))
        finally in.close()
      }
      Option(cl.getResourceAsStream(yamlPath)) match {
        case Some(in) =>
          try {
            val yaml = new org.yaml.snakeyaml.Yaml()
            val loaded = yaml.load[java.util.Map[Any, Any]](
              new InputStreamReader(in, StandardCharsets.UTF_8))
            fromRaw(Option(loaded).map(_.asScala.toMap).getOrElse(Map.empty[Any, Any]))
          } finally in.close()
        case None =>
          val in = Option(cl.getResourceAsStream(propPath))
            .getOrElse(throw new IllegalArgumentException(
              s"No translation map definition found at classpath:$yamlPath or :$propPath"))
          try fromProperties(new String(in.readAllBytes(), StandardCharsets.UTF_8))
          finally in.close()
      }
    }
  }

  /** `.properties`-style map: `key = value` or `key: value` lines, `#`/`!`
    * comments — the third file format the reference's loader accepts. */
  def fromProperties(text: String): TranslationMap = {
    val props = new java.util.Properties()
    props.load(new java.io.StringReader(text))
    fromRaw(props.asScala.toMap)
  }
}
