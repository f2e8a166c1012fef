package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.snort.{GraftConfig, GraftConfigError}

class ConfigSpec extends AnyFunSuite {

  private val valid = """{
    "spools": {
      "example1": { "directories": ["/unified/example1"], "filename": "snort.log" },
      "example2": { "directories": ["/unified/example2/1", "/unified/example2/2"], "filename": "snort.log" }
    },
    "global": {
      "signature_map": "/etc/snort/sid-msg.map",
      "generator_map": "/etc/snort/gen-msg.map",
      "classification_map": "/etc/snort/classification.config"
    },
    "plugin_snortdb": { "server": "localhost", "user": "u", "password": "p", "db": "charlotte" }
  }"""

  test("parses the reference example config shape") {
    val c = GraftConfig.parse(valid)
    assert(c.spools.map(_.name).sorted == Seq("example1", "example2"))
    assert(c.spools.find(_.name == "example2").get.directories.length == 2)
    assert(c.signatureMap == "/etc/snort/sid-msg.map")
    assert(c.snortDb.get.db == "charlotte")
  }

  test("rejects missing global section") {
    val e = intercept[GraftConfigError](GraftConfig.parse("""{"spools":{"a":{"directories":["/x"],"filename":"f"}}}"""))
    assert(e.message == "No global section in config")
  }

  test("rejects missing map keys") {
    val e = intercept[GraftConfigError](GraftConfig.parse(
      """{"spools":{"a":{"directories":["/x"],"filename":"f"}},
         "global":{"signature_map":"/s","generator_map":"/g"}}"""))
    assert(e.message.contains("classification_map"))
  }

  test("rejects empty or malformed spools") {
    assert(intercept[GraftConfigError](GraftConfig.parse(
      """{"spools":{},"global":{"signature_map":"/s","generator_map":"/g","classification_map":"/c"}}"""))
      .message == "No spools defined, nothing to do")
    assert(intercept[GraftConfigError](GraftConfig.parse(
      """{"spools":{"a":{"filename":"f"}},"global":{"signature_map":"/s","generator_map":"/g","classification_map":"/c"}}"""))
      .message.contains("directories"))
    assert(intercept[GraftConfigError](GraftConfig.parse(
      """{"global":{"signature_map":"/s","generator_map":"/g","classification_map":"/c"}}"""))
      .message == "No spool section, nothing to process")
  }

  test("rejects incomplete db plugin config") {
    val e = intercept[GraftConfigError](GraftConfig.parse(
      """{"spools":{"a":{"directories":["/x"],"filename":"f"}},
         "global":{"signature_map":"/s","generator_map":"/g","classification_map":"/c"},
         "plugin_snortdb":{"server":"h","user":"u"}}"""))
    assert(e.message.contains("not in DB config"))
  }
}
