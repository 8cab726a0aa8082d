package graft

/** Pins [[Session.swallowedConfs]] — the guard that makes a silently
  * ignored builder conf (getOrCreate on a pre-existing session drops
  * STATIC confs) a loud failure instead of a corrupted A/B run. */
class SessionSpec extends SparkSpec {

  test("confs the live session carries are not flagged") {
    assert(Session.swallowedConfs(spark, Seq(
      "spark.sql.shuffle.partitions" -> "4",
      "spark.sql.extensions" -> "graft.plans.GraftExtensions",
      "spark.sql.session.timeZone" -> "UTC")).isEmpty)
  }

  test("a static conf the session does NOT carry is flagged as " +
    "swallowed — the exact shape of a pre-existing session eating " +
    "an extension toggle or A/B overlay") {
    val wanted = Seq(
      "spark.sql.extensions" -> "some.other.Extensions",
      "spark.graft.made.up.key" -> "v",
      "spark.sql.shuffle.partitions" -> "4")
    assert(Session.swallowedConfs(spark, wanted).map(_._1).toSet ===
      Set("spark.sql.extensions", "spark.graft.made.up.key"))
  }

  test("spark.sql.extensions is list-valued: a session carrying ours " +
    "in a comma-separated list alongside another extension is NOT " +
    "swallowed, and a list without ours IS") {
    val k = "spark.sql.extensions"
    val ours = "graft.plans.GraftExtensions"
    assert(Session.confCarries(k,
      Some(s"other.Ext, $ours"), ours))
    assert(Session.confCarries(k,
      Some(s"$ours,other.Ext"), ours))
    assert(!Session.confCarries(k, Some("other.Ext,another.Ext"), ours))
    assert(!Session.confCarries(k, None, ours))
    // non-extension keys still compare exactly — a partial match is
    // not a carried conf
    assert(!Session.confCarries("spark.sql.shuffle.partitions",
      Some("4,8"), "4"))
  }
}
