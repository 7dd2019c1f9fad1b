package graft.serve

import org.scalatest.funsuite.AnyFunSuite

/** CLI parsing parity with the reference entrypoint (app.py:40-91):
  * flags, PIHOLE_LT_STATS_* env fallbacks, and the defaults. Pure
  * function, no Spark. */
class ServeOptsSpec extends AnyFunSuite {

  test("defaults match the reference (app.py:43-91)") {
    val o = ServeMain.parseOpts(Array.empty, Map.empty)
    assert(o.source == "pihole-FTL.db" && o.port == 9292 && o.days == 31)
    assert(o.nClients == 10 && o.nDomains == 10 && o.timezone == "UTC")
    assert(o.ignoreDomains.isEmpty)
  }

  test("flags override env, env overrides defaults") {
    val env = Map(
      "PIHOLE_LT_STATS_DAYS" -> "7",
      "PIHOLE_LT_STATS_PORT" -> "1234",
      "PIHOLE_LT_STATS_TIMEZONE" -> "Asia/Tokyo",
      "PIHOLE_LT_STATS_IGNORE_DOMAINS" -> "ads.example, track.example")
    val envOnly = ServeMain.parseOpts(Array.empty, env)
    assert(envOnly.days == 7 && envOnly.port == 1234 &&
      envOnly.timezone == "Asia/Tokyo" &&
      envOnly.ignoreDomains == Seq("ads.example", "track.example"))
    val o = ServeMain.parseOpts(
      Array("--days", "3", "--db_path", "/x/a.db,/x/b.db", "--n_clients", "5"), env)
    assert(o.days == 3 && o.source == "/x/a.db,/x/b.db" && o.nClients == 5)
    assert(o.port == 1234) // env still wins where no flag given
  }

  test("positional back-compat: <source> [port]") {
    val o = ServeMain.parseOpts(Array("/data/sf0.001", "0"), Map.empty)
    assert(o.source == "/data/sf0.001" && o.port == 0)
  }

  test("dash and underscore flag spellings are equivalent") {
    val a = ServeMain.parseOpts(Array("--n-domains", "4"), Map.empty)
    val b = ServeMain.parseOpts(Array("--n_domains", "4"), Map.empty)
    assert(a.nDomains == 4 && b.nDomains == 4)
  }
}
