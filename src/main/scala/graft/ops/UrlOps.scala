package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + canonical-URL deduplication — the very first
  * dedup every web-crawl pipeline runs (CCNet/C4 dedup by URL before
  * touching content; a crawl visits the same page under case-variant
  * hosts, tracking-tagged links, and fragment anchors):
  *
  *  - scheme and host lowercase (path case is PRESERVED — it is
  *    significant on real servers),
  *  - the `#fragment` drops (client-side only),
  *  - tracking parameters drop (`utm_*`, `fbclid`, `gclid`),
  *    surviving parameters keep their ORDER (reordering changes
  *    semantics on some endpoints — conservative canonicalization),
  *  - a trailing `/` on a non-root path drops.
  *
  * Every rule is an engine-portable split_part/lower/filter chain, so
  * a DuckDB oracle evaluates the identical canonicalization. Pure
  * projection at scan speed; the dedup is one groupBy(canonical) —
  * exact-dedup's shuffle shape, on a key orders of magnitude shorter
  * than the content hash it replaces.
  */
object UrlOps {

  /** The canonical form of `url` (see object doc for the rule set).
    * URLs without a scheme or an empty input canonicalize to
    * themselves lowercased-up-to-path as best effort: split_part
    * returns '' on missing separators, and the reassembly guards keep
    * the expression total. */
  def canonicalize(url: Column): Column = {
    val u = coalesce(url, lit(""))
    val scheme = lower(split_part(u, lit("://"), lit(1)))
    val rest = split_part(u, lit("://"), lit(2))
    // the host ends at the EARLIEST of '/', '?', '#' — a URL like
    // 'https://ex.com#frag' or 'https://ex.com?utm_source=x' has no
    // path, and taking everything up to '/' would swallow the
    // fragment/query into the "host" and silently skip the drop rules
    // (review finding)
    val hostRaw = split_part(split_part(split_part(rest, lit("#"), lit(1)),
      lit("?"), lit(1)), lit("/"), lit(1))
    val host = lower(hostRaw)
    // path+query = rest minus the host prefix (same length, any case)
    val pathq = rest.substr(length(hostRaw) + 1, length(rest))
    val noFrag = split_part(pathq, lit("#"), lit(1))
    val path0 = split_part(noFrag, lit("?"), lit(1))
    // strip the trailing slash of a non-root path
    val pathFixed = when(
      length(path0) > 1 && path0.substr(length(path0), lit(1)) === "/",
      path0.substr(lit(1), length(path0) - 1)).otherwise(path0)
    val query = split_part(noFrag, lit("?"), lit(2))
    val kept = filter(split(query, "&"), p =>
      !(p.startsWith("utm_") || p.startsWith("fbclid") || p.startsWith("gclid")))
    val keptStr = array_join(kept, "&")
    val tail = when(length(keptStr) > 0, concat(lit("?"), keptStr))
      .otherwise(lit(""))
    when(rest === "", lower(u))
      .otherwise(concat(scheme, lit("://"), host, pathFixed, tail))
  }

  /** Canonical-URL dedup: one surviving doc per canonical URL — the
    * smallest id (the exact-dedup representative rule). Returns
    * (id, url_canon) of the survivors. */
  def urlDedup(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs.select(col(idCol).as("id"), canonicalize(col(urlCol)).as("url_canon"))
      .groupBy("url_canon").agg(min(col("id")).as("id"))
      .select(col("id"), col("url_canon"))
      .orderBy("id")
}
