package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Semantics from the reference's test/indexer/settings_test.rb. */
class SettingsSpec extends AnyFunSuite {

  test("provide is first-set-wins; store is last-set-wins") {
    val s = Settings.empty
      .provide("solr.url", "http://one")
      .provide("solr.url", "http://two") // no-op
      .store("writer", "json")
      .store("writer", "csv")             // overrides
    assert(s.get("solr.url").contains("http://one"))
    assert(s.get("writer").contains("csv"))
  }

  test("CLI settings beat config provides beat class defaults") {
    val s = Settings.fromCli(Map("k" -> "cli"))
      .provide("k", "config")            // loses to existing CLI value
      .provide("only_config", "config")
      .withDefaults(Map("k" -> "default", "only_default" -> "default"))
    assert(s.get("k").contains("cli"))
    assert(s.get("only_config").contains("config"))
    assert(s.get("only_default").contains("default"))
  }

  test("pipeline knobs derive from standard keys") {
    val ps = Settings.empty.store("allow_duplicate_values", "false").pipelineSettings
    assert(!ps.allowDuplicateValues && !ps.allowNilValues && !ps.allowEmptyFields)
  }
}
