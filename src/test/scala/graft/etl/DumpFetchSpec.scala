package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDate

/** Key-selection rules of the dump-fetch path (reference fetch.py:11-95),
  * asserted against fixture listings — no network.
  */
class DumpFetchSpec extends AnyFunSuite {
  val d = LocalDate.of(2024, 2, 2)

  test("daily prefix template and fallback order") {
    assert(DumpFetch.dumpPrefix("nerc-ctl-0", d) == "dbs/nerc-ctl-0/nova-20240202")
    assert(DumpFetch.candidatePrefixes(d) == Seq(
      "dbs/nerc-ctl-0/nova-20240202",
      "dbs/nerc-ctl-1/nova-20240202",
      "dbs/nerc-ctl-2/nova-20240202"))
  }

  test("first object of the first non-empty controller listing wins") {
    // ctl-0 empty → fall through to ctl-1; its lexicographically-first
    // key is selected even when the listing arrives unsorted
    val listings = Map(
      "dbs/nerc-ctl-1/nova-20240202" -> Seq(
        "dbs/nerc-ctl-1/nova-20240202120000.sql.gz",
        "dbs/nerc-ctl-1/nova-20240202000002.sql.gz"),
      "dbs/nerc-ctl-2/nova-20240202" -> Seq(
        "dbs/nerc-ctl-2/nova-20240202000001.sql.gz"))
    val key = DumpFetch.selectDumpKey(d, p => listings.getOrElse(p, Seq.empty))
    assert(key.contains("dbs/nerc-ctl-1/nova-20240202000002.sql.gz"))
  }

  test("no dump on any controller → None") {
    assert(DumpFetch.selectDumpKey(d, _ => Seq.empty).isEmpty)
  }

  test("local path, gunzip-name derivation, s3a form") {
    val key = "dbs/nerc-ctl-0/nova-20240202000002.sql.gz"
    assert(DumpFetch.localDownloadPath(key) == "/tmp/nova-20240202000002.sql.gz")
    assert(DumpFetch.uncompressedPath("/tmp/nova-20240202000002.sql.gz") ==
      "/tmp/nova-20240202000002.sql")
    assert(DumpFetch.uncompressedPath("/tmp/nova.sql") == "/tmp/nova.sql")
    assert(DumpFetch.s3aUri("nerc-osp-backups", key) ==
      "s3a://nerc-osp-backups/dbs/nerc-ctl-0/nova-20240202000002.sql.gz")
  }
}
