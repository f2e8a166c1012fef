package graft.snort

import java.nio.file.{Files, Paths}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** charlotte.conf parsing + validation — mirrors the reference's
  * `Config()` checks (/root/reference/charlotte/__init__.py:122-153):
  * a `global` section with the three map paths, and a non-empty
  * `spools` section where every spool has `directories` + `filename`.
  * Validation failures raise [[GraftConfigError]] with the same
  * diagnostic shape the reference logs.
  */
final case class GraftConfigError(message: String)
    extends Exception(message)

case class SpoolConfig(name: String, directories: Seq[String],
    filename: String)

case class SnortDbConfig(server: String, user: String, password: String,
    db: String)

case class GraftConfig(
    spools: Seq[SpoolConfig],
    signatureMap: String,
    generatorMap: String,
    classificationMap: String,
    snortDb: Option[SnortDbConfig])

object GraftConfig {

  def load(path: String): GraftConfig =
    parse(
      try Files.readString(Paths.get(path))
      catch { case e: Exception =>
        throw GraftConfigError(s"Unable to read config file: $e")
      })

  def parse(json: String): GraftConfig = {
    val root = try JsonMethods.parse(json)
      catch { case e: Exception =>
        throw GraftConfigError(s"Unable to read config file: $e")
      }

    val global = root \ "global" match {
      case JObject(_) => root \ "global"
      case JNothing => throw GraftConfigError("No global section in config")
      case _ => throw GraftConfigError("No global section in config")
    }
    def globalPath(key: String): String = global \ key match {
      case JString(s) => s
      case _ => throw GraftConfigError(
        s"Required section $key not in global config, exiting")
    }
    val sigMap = globalPath("signature_map")
    val genMap = globalPath("generator_map")
    val classMap = globalPath("classification_map")

    val spools = root \ "spools" match {
      case JObject(fields) =>
        if (fields.isEmpty)
          throw GraftConfigError("No spools defined, nothing to do")
        fields.map { case (name, spool) =>
          val dirs = spool \ "directories" match {
            case JArray(vs) => vs.collect { case JString(s) => s }
            case _ => throw GraftConfigError(
              s"Required section directories not in config $name")
          }
          val fn = spool \ "filename" match {
            case JString(s) => s
            case _ => throw GraftConfigError(
              s"Required section filename not in config $name")
          }
          SpoolConfig(name, dirs, fn)
        }
      case _ =>
        throw GraftConfigError("No spool section, nothing to process")
    }

    val db = root \ "plugin_snortdb" match {
      case JObject(_) =>
        def dbKey(k: String): String = root \ "plugin_snortdb" \ k match {
          case JString(s) => s
          case _ => throw GraftConfigError(s"Key $k not in DB config")
        }
        Some(SnortDbConfig(dbKey("server"), dbKey("user"),
          dbKey("password"), dbKey("db")))
      case _ => None
    }

    GraftConfig(spools, sigMap, genMap, classMap, db)
  }
}
