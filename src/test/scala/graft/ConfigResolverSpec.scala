package graft

import graft.config.ConfigResolver
import org.scalatest.funsuite.AnyFunSuite

/** Layered config resolution semantics (reference env_manager.py:13-36 +
  * pgvector_storage.py:16-55): primary → env → default precedence,
  * throwing-primary fallback, full missing-list reporting, all-or-
  * nothing group resolution with a completeness gate. */
class ConfigResolverSpec extends AnyFunSuite {

  private def resolver(
      primary: Map[String, String] = Map.empty,
      env: Map[String, String] = Map.empty,
      defaults: Map[String, String] = Map.empty) =
    new ConfigResolver(primary.get, env.get, defaults)

  test("precedence: primary beats env beats default") {
    val r = resolver(
      primary = Map("host" -> "ssm-host"),
      env = Map("host" -> "env-host", "port" -> "5433"),
      defaults = Map("host" -> "localhost", "port" -> "5432", "name" -> "energy"))
    assert(r.get("host").contains("ssm-host"))
    assert(r.get("port").contains("5433"))
    assert(r.get("name").contains("energy"))
    assert(r.get("absent").isEmpty)
  }

  test("a throwing primary layer falls through instead of propagating") {
    val r = new ConfigResolver(
      _ => throw new RuntimeException("ssm unreachable"),
      Map("key" -> "from-env").get)
    assert(r.get("key").contains("from-env"))
  }

  test("empty-string values count as unset (os.getenv truthiness)") {
    val r = resolver(env = Map("blank" -> ""), defaults = Map("blank" -> "fallback"))
    assert(r.get("blank").contains("fallback"))
  }

  test("missing() reports every absent required key, not just the first") {
    val r = resolver(env = Map("OPENAI_API_KEY" -> "x"))
    val req = Seq("OPENAI_API_KEY", "ERCOT_API_USERNAME", "ERCOT_API_PASSWORD")
    assert(r.missing(req) == Seq("ERCOT_API_USERNAME", "ERCOT_API_PASSWORD"))
  }

  test("group() is all-or-nothing and honors the completeness gate") {
    val keys = Seq("host", "port", "password")
    val partial = resolver(env = Map("host" -> "h", "port" -> "5432"))
    assert(partial.group(keys).isEmpty) // password unresolved anywhere
    val noPw = resolver(
      env = Map("host" -> "h", "port" -> "5432"),
      defaults = Map("password" -> "")) // blank password resolves to unset
    assert(noPw.group(keys).isEmpty)
    val full = resolver(env = Map("host" -> "h", "port" -> "5432", "password" -> "s3cret"))
    // the reference's rule: a config without a password must not look usable
    assert(full.group(keys, gate = m => m("password").nonEmpty)
      .contains(Map("host" -> "h", "port" -> "5432", "password" -> "s3cret")))
  }

  test("group() tolerates a duplicated key in the request") {
    val r = resolver(env = Map("host" -> "h", "port" -> "5432"))
    // A fully-resolved group must not read as unusable just because the
    // caller listed a key twice (the resolved Map dedups it).
    assert(r.group(Seq("host", "port", "host"))
      .contains(Map("host" -> "h", "port" -> "5432")))
  }
}
