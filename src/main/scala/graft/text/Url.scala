package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and domain blocklist gating — the first two
  * gates of every web-crawl curation pipeline (C4, RefinedWeb, Gopher all
  * open with them): a crawl stores the SAME page under syntactically
  * different URLs (scheme case, default ports, `www.`, tracking params,
  * param order, fragments), so URL-level dedup is meaningless until URLs
  * are normalized; and curators maintain domain blocklists (spam, adult,
  * SEO farms) that must match SUBDOMAINS of each listed domain, not just
  * exact hosts.
  *
  * Everything here is a pure per-row string expression (map-only, fused
  * into the scan) except the table-blocklist gate, which is the one place
  * a join is semantically required — and there the blocklist side
  * broadcasts and the corpus is never shuffled.
  *
  * The canonical form (deliberately minimal and engine-portable — every
  * step is regexp/split/sort, replayable in the DuckDB oracle):
  *   1. scheme and host lowercased; path/query case preserved (paths are
  *      case-sensitive by RFC 3986; hosts are not)
  *   2. default ports dropped (http:80, https:443); explicit non-default
  *      ports kept
  *   3. a leading `www.` stripped from the host (the classic crawl-dedup
  *      alias)
  *   4. the fragment dropped (never sent to the server)
  *   5. tracking parameters removed: any `utm_*`, plus gclid / fbclid /
  *      msclkid / ref (the ad-attribution set — they vary per click, not
  *      per page). The KEY matches case-insensitively (`UTM_Source`,
  *      `Gclid` — real crawls carry mixed-case params; RFC 3986 makes
  *      query case significant, but a tracker is a tracker whatever its
  *      casing); surviving params keep their original key AND value case
  *   6. remaining query params sorted lexicographically as whole `k=v`
  *      strings (param order is almost never semantic; sorting makes the
  *      form canonical); empty params dropped; an emptied query loses its
  *      `?`
  *   7. an empty path becomes `/`
  *
  * What it deliberately does NOT do: percent-encoding normalization and
  * IDN/punycode (locale tables, not worth cross-engine drift), path
  * `..`-resolution (crawlers see server-resolved paths). */
object Url {

  private val trackingExact = Seq("gclid", "fbclid", "msclkid", "ref")

  /** hostport = everything between `://` and the first `/`, `?` or `#`. */
  private def hostPort(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))

  /** Canonical host: lowercased, `www.` stripped, port dropped. The
    * blocklist-matching face — gating cares about the registrable name,
    * never the port. */
  def urlHost(url: Column): Column =
    regexp_replace(regexp_replace(hostPort(url), "^www\\.", ""), ":[0-9]+$", "")

  /** The full canonical URL (steps 1–7 above). Null-safe: a null URL or
    * one with no `scheme://` yields null — a URL the canonicalizer cannot
    * parse must not silently pass through as its own dedup key. */
  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hp = hostPort(u)
    val host = regexp_replace(hp, "^www\\.", "")
    // default-port strip is scheme-conditional; other schemes keep theirs
    val hostNoPort = when(scheme === "http", regexp_replace(host, ":80$", ""))
      .when(scheme === "https", regexp_replace(host, ":443$", ""))
      .otherwise(host)
    val rawPath = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    // anchored to the pre-fragment region: a '?' INSIDE the fragment
    // ("https://x.com/#/page?tab=1", the SPA idiom) is part of the
    // fragment and must vanish with it, not resurrect as query params
    val rawQuery = regexp_extract(u, "^[^#]*\\?([^#]*)", 1)
    val kept = array_sort(filter(split(rawQuery, "&"), p => {
      // tracker matching is on the LOWERCASED key only; the kept param
      // `p` itself passes through with its case intact
      val key = lower(split_part(p, lit("="), lit(1)))
      p =!= "" && !key.startsWith("utm_") &&
        !trackingExact.map(t => key === t).reduce(_ || _)
    }))
    val query = when(size(kept) > 0,
      concat(lit("?"), array_join(kept, "&"))).otherwise(lit(""))
    when(scheme === "" || hp === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), hostNoPort, path, query))
  }

  /** Literal-blocklist membership: host equals a blocked domain or is a
    * subdomain of one. For the driver-held blocklist (the common case —
    * curation blocklists are thousands of rows, not millions) this folds
    * into a codegen'd OR chain, the [[graft.ops.Sampling.mixBySource]]
    * broadcast-analog: zero shuffle, zero join. */
  def isBlockedHost(host: Column, blockedDomains: Seq[String]): Column = {
    require(blockedDomains.nonEmpty, "empty blocklist: nothing to gate on")
    blockedDomains.map { d =>
      val dl = d.toLowerCase
      host === dl || host.endsWith("." + dl)
    }.reduce(_ || _)
  }

  /** Table-blocklist gate: drop rows whose URL's host is a blocked domain
    * or any subdomain of one. The join-shaped face for blocklists too big
    * to inline: each host explodes into its dot-suffixes ("a.b.com" →
    * [a.b.com, b.com, com] — bounded by label count, ~4), the suffixes
    * equi-join the broadcast blocklist, and matching ids anti-join back.
    * The corpus is scanned once and never shuffled; only (id, suffix)
    * pairs flow through the explode, and the blocked-id set that returns
    * is at most corpus-sized but in practice tiny.
    *
    * `blocklist(domainCol)` must hold bare lowercase domains (no scheme,
    * no port) — the convention curation blocklists ship in. */
  def gateByBlocklist(df: DataFrame, idCol: String, urlCol: String,
      blocklist: DataFrame, domainCol: String): DataFrame = {
    require(df.columns.contains(idCol) && df.columns.contains(urlCol),
      s"gateByBlocklist needs columns $idCol and $urlCol")
    val host = urlHost(col(urlCol))
    val parts = split(host, "\\.")
    val suffixes = transform(sequence(lit(0), size(parts) - 1),
      i => array_join(slice(parts, i + 1, size(parts) - i), "."))
    val blockedIds = df
      .select(col(idCol), explode(suffixes).as("__sfx"))
      .join(broadcast(blocklist.select(lower(col(domainCol)).as("__sfx"))),
        "__sfx")
      .select(col(idCol)).distinct()
    df.join(blockedIds, Seq(idCol), "left_anti")
  }
}
