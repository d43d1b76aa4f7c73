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
  *  - the scheme's DEFAULT PORT drops (`:80` for http, `:443` for
  *    https — RFC 3986 §6.2.3; explicit non-default ports stay),
  *  - the `#fragment` drops (client-side only),
  *  - tracking parameters drop by EXACT key match — any `utm_*`-keyed
  *    param, plus `fbclid` and `gclid` exactly (a legitimate param
  *    whose name merely starts with one of those, e.g. `gclid_src`,
  *    survives); surviving parameters keep their ORDER (reordering
  *    changes semantics on some endpoints — conservative
  *    canonicalization),
  *  - a trailing `/` on a non-root path drops,
  *  - percent-escape hex lowercases (`%2F` ≡ `%2f` — RFC 3986 §6.2.2.1
  *    case normalization; this rewrite picks lowercase and applies it
  *    everywhere so the two spellings collapse).
  *
  * The split point is the FIRST `://` only, and only when the text
  * before it is a valid RFC 3986 scheme (ALPHA then ALPHA/DIGIT/+-.)
  * — a URL embedding another URL in its query (redirect/outbound-link
  * params, e.g. `https://a.com/r?u=https://b.com`) keeps everything
  * after its own scheme, and a SCHEMELESS url embedding one
  * (`Example.com/r?u=https://b.com`) is not mis-split at the embedded
  * separator; likewise the query starts at the FIRST `?`. Inputs
  * without a (valid) scheme separator are returned UNCHANGED (no
  * best-effort lowercasing: without a scheme the host/path boundary
  * is ambiguous, and path case is significant).
  *
  * Every rule is an engine-portable instr/split_part/lower/filter
  * chain, so a DuckDB oracle evaluates the identical canonicalization.
  * Pure projection at scan speed; the dedup is one groupBy(canonical)
  * — exact-dedup's shuffle shape, on a key orders of magnitude shorter
  * than the content hash it replaces.
  */
object UrlOps {

  /** Lowercase the two hex digits of every percent escape (`%4F` →
    * `%4f`); a `%` not followed by two hex digits is literal and kept
    * as-is. Split on '%' (tail empties preserved by both engines),
    * first piece passes through, each later piece lowercases its
    * leading hex pair. */
  private[ops] def lowerPercent(s: Column): Column = {
    val parts = split(s, "%")
    val fixed = transform(slice(parts, lit(2), greatest(size(parts) - 1, lit(0))),
      x => when(x.rlike("^[0-9A-Fa-f]{2}"),
        concat(lower(x.substr(lit(1), lit(2))), x.substr(lit(3), length(x))))
        .otherwise(x))
    when(size(parts) > 1,
      concat(element_at(parts, 1), lit("%"), array_join(fixed, "%")))
      .otherwise(s)
  }

  /** The canonical form of `url` (see object doc for the rule set).
    * NULL folds to ''; inputs with no `://` — or whose text before the
    * first `://` is not a valid RFC 3986 scheme — return unchanged. */
  def canonicalize(url: Column): Column = {
    val u = coalesce(url, lit(""))
    // FIRST '://' only (instr is first-occurrence): an embedded URL in
    // the query must not truncate the split (split_part with part 2
    // splits on EVERY occurrence — the round-9 advice finding)
    val sep = instr(u, "://")
    val schemeRaw = u.substr(lit(1), sep - 1)
    // the split is only real if the prefix IS a scheme (RFC 3986 §3.1:
    // ALPHA *( ALPHA / DIGIT / + - . )) — a SCHEMELESS url embedding a
    // URL in its query ('Example.com/r?u=https://b.com') would
    // otherwise be parsed as scheme 'example.com/r?u=https' and
    // mangled instead of passing through unchanged (review finding)
    val schemed = sep > 0 && schemeRaw.rlike("^[A-Za-z][A-Za-z0-9+.\\-]*$")
    val scheme = lower(schemeRaw)
    val rest = u.substr(sep + 3, length(u))
    // the host ends at the EARLIEST of '/', '?', '#' — a URL like
    // 'https://ex.com#frag' or 'https://ex.com?utm_source=x' has no
    // path, and taking everything up to '/' would swallow the
    // fragment/query into the "host" and silently skip the drop rules
    // (review finding)
    val hostRaw = split_part(split_part(split_part(rest, lit("#"), lit(1)),
      lit("?"), lit(1)), lit("/"), lit(1))
    val hostPort = lower(hostRaw)
    // default-port strip, scheme-aware: ':80' is default only for
    // http, ':443' only for https (an https://ex.com:80 stays — it IS
    // a different endpoint)
    val defPort = when(scheme === "http", lit(":80"))
      .when(scheme === "https", lit(":443")).otherwise(lit(""))
    val host = when(length(defPort) > 0 && hostPort.endsWith(defPort),
        hostPort.substr(lit(1), length(hostPort) - length(defPort)))
      .otherwise(hostPort)
    // path+query = rest minus the host prefix (same length, any case)
    val pathq = rest.substr(length(hostRaw) + 1, length(rest))
    val noFrag = split_part(pathq, lit("#"), lit(1))
    val path0 = split_part(noFrag, lit("?"), lit(1))
    // strip the trailing slash of a non-root path
    val pathFixed = when(
      length(path0) > 1 && path0.substr(length(path0), lit(1)) === "/",
      path0.substr(lit(1), length(path0) - 1)).otherwise(path0)
    // query = everything after the FIRST '?' (split_part part 2 would
    // truncate a query embedding its own '?')
    val qpos = instr(noFrag, "?")
    val query = when(qpos > 0, noFrag.substr(qpos + 1, length(noFrag)))
      .otherwise(lit(""))
    // tracking params drop by exact KEY: utm_* prefix, fbclid/gclid
    // exact — a bare startsWith on the whole param would also drop a
    // legitimate 'gclid_src=…' (round-9 verdict finding)
    val kept = filter(split(query, "&"), p => {
      val k = split_part(p, lit("="), lit(1))
      !(k.startsWith("utm_") || k === "fbclid" || k === "gclid")
    })
    val keptStr = array_join(kept, "&")
    val tail = when(length(keptStr) > 0, concat(lit("?"), keptStr))
      .otherwise(lit(""))
    when(!schemed, u)
      .otherwise(lowerPercent(concat(scheme, lit("://"), host, pathFixed, tail)))
  }

  /** Canonical-URL dedup: one surviving doc per canonical URL — the
    * smallest id (the exact-dedup representative rule). Returns
    * (id, url_canon) of the survivors. */
  def urlDedup(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    // Par.floor BELOW the canonicalization: the heavy regex/split
    // projection and the partial aggregation then run post-exchange on
    // every core (flooring the canonicalized frame instead evaluates
    // it in the single scan task and merely adds a shuffle — measured
    // 1.5s -> 2.1s that way)
    graft.ops.Par.floor(
      docs.select(col(idCol).as("id"), col(urlCol).as("__u")), col("id"))
      .select(col("id"), canonicalize(col("__u")).as("url_canon"))
      .groupBy("url_canon").agg(min(col("id")).as("id"))
      .select(col("id"), col("url_canon"))
      .orderBy("id")
}
