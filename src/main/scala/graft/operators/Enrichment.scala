package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Policy gate + bounded multi-hop enrichment + canonical query ids —
  * the remaining reference semantics from SURVEY.md §2:
  *
  *  - PolicyGate (S7): the robots.txt allow/deny check
  *    (`/root/reference/scrape/scrape.go:271-295`) as a broadcast
  *    anti-join — the cheap predicate runs BEFORE any expensive work,
  *    exactly like the reference gates before fetching; at scale the deny
  *    list is a broadcast table, never a shuffle.
  *  - MultiHop (J2): the `IsPath` link-following traversal
  *    (`/root/reference/scrape/scrape.go:519-622`) — intermediate levels
  *    only fan out, the leaf level emits rows — as a bounded chain of
  *    joins (the reference's own 4-level deepExtractPayload test shape,
  *    `scrape/scrape_test.go:199-279`).
  *  - specUid (P4): canonical payload id — volatile-free canonical JSON,
  *    md5, crc32 (`/root/reference/scrape/scrape.go:134-155`,
  *    `utils/utils.go:25-37`) — used as checkpoint/lineage identity.
  */
object Enrichment {

  /** Drop rows whose `keyCol` appears in the (small, broadcast) deny list.
    * Mirrors robots gating: deny wins, everything else passes. */
  def policyGate(df: DataFrame, denyList: DataFrame, keyCol: String): DataFrame =
    df.join(broadcast(denyList.select(col(keyCol)).distinct()), Seq(keyCol), "left_anti")

  /** One enrichment hop: join `df.fkCol` to `lookup.keyCol`, appending
    * `lookup`'s payload columns. Intermediate hops keep all columns
    * (fan-out only); the caller projects at the leaf. */
  def hop(df: DataFrame, lookup: DataFrame, fkCol: String, keyCol: String): DataFrame =
    df.join(broadcast(lookup), df(fkCol) === lookup(keyCol), "left_outer")
      .drop(lookup(keyCol))

  /** Bounded multi-hop traversal: fold a fixed list of hops (depth known at
    * plan time, like MAX_PAGES bounds the reference's pagination). */
  def multiHop(df: DataFrame, hops: Seq[(DataFrame, String, String)]): DataFrame =
    hops.foldLeft(df) { case (acc, (lookup, fk, key)) => hop(acc, lookup, fk, key) }

  /** Canonical query/lineage id: crc32(md5(canonical-json)) as the
    * reference computes task UIDs. Column form for per-row ids: */
  def uidCol(cols: Column*): Column =
    lower(hex(crc32(md5(to_json(struct(cols: _*))))))

  /** Plan-time UID for an extraction spec (drives checkpoint dir naming —
    * same query => same id => resumable). */
  def specUid(spec: ExtractionSpec): String = {
    val canonical = spec.fields.map(f =>
      s"${f.name}|${f.selector}|${f.attrs.mkString(",")}|" +
        f.filters.map { case (n, p) => s"$n=$p" }.mkString(",")).mkString(";")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8"))
    val crc = new java.util.zip.CRC32()
    crc.update(md5)
    java.lang.Long.toHexString(crc.getValue)
  }
}
