package graft.etl

import org.json4s._
import org.json4s.jackson.JsonMethods

/** S8 (dependencies/spark.py:92-112): parse the reference's JSON config
  * shape (configs/etl_config.json:1-34) into the typed EtlConfig.
  * Site ids arrive as ints in the file but compare against the string
  * `info.siteseq` — normalized to strings here at the boundary instead
  * of relying on implicit coercion (SURVEY.md §1.3).
  */
object ConfigLoader {

  def fromString(json: String): EtlConfig = {
    val j = JsonMethods.parse(json)

    def ids(field: String): Seq[String] = (j \ "transform" \ field) match {
      case JArray(xs) => xs.collect {
        case JInt(n) => n.toString
        case JString(s) => s
      }
      case _ => Seq.empty
    }

    def jdbc(section: JValue): Option[JdbcConfig] = section match {
      case JObject(_) =>
        def str(k: String) = (section \ k) match {
          case JString(s) => s
          case _ => ""
        }
        Some(JdbcConfig(str("url"), str("driver"), str("user"),
          str("password"), str("dbtable")))
      case _ => None
    }

    def bool(path: JValue): Boolean = path match {
      case JBool(b) => b
      case _ => false
    }

    EtlConfig(
      types = TransformTypes(ids("default"), ids("type1"), ids("type2"), ids("type3")),
      loadPath = (j \ "file" \ "load" \ "path") match {
        case JString(s) => s; case _ => ""
      },
      savePath = (j \ "file" \ "save" \ "path") match {
        case JString(s) => s; case _ => ""
      },
      loadDb = jdbc(j \ "mysql" \ "load"),
      saveDb = jdbc(j \ "mysql" \ "save"),
      dbInsert = bool(j \ "mysql" \ "insert"),
      fileWrite = bool(j \ "file" \ "write"))
  }

  def fromFile(path: String): EtlConfig =
    fromString(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  /** Cluster-submit config discovery (dependencies/spark.py:92-112): a
    * file shipped with `spark-submit --files` lands flat in
    * `SparkFiles.getRootDirectory()`; the first filename ending in
    * `config.json` (sorted, for determinism — the reference takes
    * listdir order) is parsed. None when no config file was shipped —
    * callers fall back to their defaults, as the reference does. */
  def discover(rootDir: String = org.apache.spark.SparkFiles.getRootDirectory()): Option[EtlConfig] = {
    val dir = new java.io.File(rootDir)
    Option(dir.listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith("config.json"))
      .sortBy(_.getName)
      .headOption
      .map(f => fromFile(f.getAbsolutePath))
  }
}
