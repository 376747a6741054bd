package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): Option[String] =
    Seq(url).toDF("u").select(Url.canonicalizeUrl(col("u")))
      .as[Option[String]].head()

  test("canonicalizeUrl: the seven documented steps") {
    // scheme/host lowercase, default port, www, tracking, sort, fragment
    assert(canon("HTTP://WWW.Example.COM:80/Docs/X?utm_source=f&b=2&a=1#frag")
      .contains("http://example.com/Docs/X?a=1&b=2"))
    // path case preserved; https default port
    assert(canon("https://Example.com:443/A/b").contains("https://example.com/A/b"))
    // non-default port kept
    assert(canon("https://api.example.com:8443/v1?z=9&gclid=x&y=1")
      .contains("https://api.example.com:8443/v1?y=1&z=9"))
    // empty path becomes /; emptied query loses its ?
    assert(canon("http://example.com?utm_campaign=a").contains("http://example.com/"))
    // other schemes keep their port (the default-port table is http/https)
    assert(canon("ftp://Example.com:21/file").contains("ftp://example.com:21/file"))
    // empty params dropped; '=' -less params survive as-is
    assert(canon("http://e.com/p?&flag&b=1").contains("http://e.com/p?b=1&flag"))
    // tracker keys match case-INSENSITIVELY (real crawls carry
    // UTM_Source / Gclid); surviving params keep their case
    assert(canon("http://e.com/p?UTM_Source=f&Gclid=x&B=2&fBcLiD=y")
      .contains("http://e.com/p?B=2"))
    // a '?' INSIDE the fragment is fragment, not query (the SPA idiom) —
    // it must not resurrect as params and collide with the real ?tab=1 URL
    assert(canon("https://x.com/#/page?tab=1").contains("https://x.com/"))
    assert(canon("https://x.com/?tab=1#/page?tab=2")
      .contains("https://x.com/?tab=1"))
    // unparseable → null, never a pass-through dedup key
    assert(canon("not a url").isEmpty)
    assert(canon("/relative/path").isEmpty)
    assert(Seq(Option.empty[String]).toDF("u")
      .select(Url.canonicalizeUrl(col("u"))).as[Option[String]].head().isEmpty)
  }

  test("urlHost: lowercased, www- and port-stripped") {
    val host = Seq("HTTPS://WWW.Sub.Example.COM:8443/x?y#z").toDF("u")
      .select(Url.urlHost(col("u"))).as[String].head()
    assert(host == "sub.example.com")
  }

  test("isBlockedHost: exact and subdomain match, no substring false positives") {
    val hosts = Seq("spam.biz", "a.spam.biz", "deep.a.spam.biz",
      "notspam.biz", "spam.biz.good.com", "ok.example.com").toDF("h")
    val flagged = hosts
      .filter(Url.isBlockedHost(col("h"), Seq("Spam.BIZ")))
      .as[String].collect().sorted.toSeq
    // suffix match only at a label boundary: "notspam.biz" survives, and a
    // blocked name appearing as a PREFIX ("spam.biz.good.com") survives too
    assert(flagged == Seq("a.spam.biz", "deep.a.spam.biz", "spam.biz"))
    intercept[IllegalArgumentException](
      hosts.filter(Url.isBlockedHost(col("h"), Seq.empty)))
  }

  test("gateByBlocklist (table face) agrees with the literal face") {
    val docs = Seq(
      (1L, "https://x.spam.biz/a"), (2L, "http://www.ok.example.com/b"),
      (3L, "https://news.example.com/c"), (4L, "https://spam.biz/d"),
      (5L, "http://ok.example.com:8080/e?q=1")
    ).toDF("id", "url")
    val bl = Seq("spam.biz", "news.example.com").toDF("domain")
    val byTable = Url.gateByBlocklist(docs, "id", "url", bl, "domain")
      .select("id").as[Long].collect().sorted.toSeq
    val byLiteral = docs.filter(!Url.isBlockedHost(Url.urlHost(col("url")),
        Seq("spam.biz", "news.example.com")))
      .select("id").as[Long].collect().sorted.toSeq
    assert(byTable == Seq(2L, 5L) && byTable == byLiteral)
    // the blocklist side broadcasts — the corpus is never shuffled into
    // a sort-merge join
    val plan = Url.gateByBlocklist(docs, "id", "url", bl, "domain")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"blocklist not broadcast:\n$plan")
  }
}
