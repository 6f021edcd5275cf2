package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Types.{Rates, SuTypes}

/** Invoice shaping and the CSV sink contract
  * (/root/reference/src/openstack_billing_db/billing.py:159-224) plus the
  * S3 key templates (billing.py:244-293) as pure functions.
  */
object InvoiceSink {

  /** R8 — long → wide: one row per project with a `<type>_su_hours` column
    * per SU type (billing.py:105-113). Absent types are zero-filled like
    * the dataclass defaults (billing.py:54-59).
    */
  def pivotWide(longInvoices: DataFrame): DataFrame = {
    val wide = longInvoices
      .groupBy("project_id")
      .pivot("su_type", SuTypes)
      .sum("su_hours")
    SuTypes.foldLeft(wide) { (df, t) =>
      df.withColumn(s"${t}_su_hours", coalesce(col(s"`$t`"), lit(0L))).drop(t)
    }
  }

  /** R7 — wide → long: up to six rows per project in the reference's
    * unpivot order, dropping hours == 0 rows (billing.py:188-224). Uses
    * `stack` (Spark's UNPIVOT) so the generator stays codegen-friendly.
    */
  def unpivotLong(wide: DataFrame, rates: Rates): DataFrame = {
    val stackArgs = SuTypes
      .map(t => s"'$t', ${t}_su_hours")
      .mkString(s"stack(${SuTypes.size}, ", ", ", ") as (su_type, su_hours)")
    val ratesDim = Billing.ratesDim(wide.sparkSession, rates)

    wide
      .select(col("project_id"), expr(stackArgs))
      .filter(col("su_hours") > 0) // billing.py:204
      .join(broadcast(ratesDim), Seq("su_type"))
      .withColumn("cost", (col("rate") * col("su_hours")).cast("decimal(38,6)"))
      .select("project_id", "su_type", "su_name", "su_hours", "rate", "rate_display", "cost")
  }

  /** The fixed 16-column header (billing.py:167-186). */
  val CsvHeader: Seq[String] = Seq(
    "Invoice Month", "Report Start Time", "Report End Time",
    "Project - Allocation", "Project - Allocation ID", "Manager (PI)",
    "Cluster Name", "Invoice Email", "Invoice Address", "Institution",
    "Institution - Specific Code", "SU Hours (GBhr or SUhr)", "SU Type",
    "Rate", "Cost", "Generated At")

  /** Shape long invoices into the 16-column CSV rows (billing.py:188-224):
    * constant identity columns (pi/institution empty, billing.py:130-131;
    * institution code "N/A", billing.py:61), window bounds stamped UTC ISO
    * (billing.py:133-134), cost quantized to cents HALF_UP only here
    * (billing.py:202 — Spark `round` is HALF_UP; `bround` would be wrong).
    */
  def csvRows(
      longInvoices: DataFrame,
      invoiceMonth: String,
      startIso: String,
      endIso: String,
      generatedAtIso: String
  ): DataFrame =
    longInvoices.select(
      lit(invoiceMonth).as("Invoice Month"),
      lit(startIso).as("Report Start Time"),
      lit(endIso).as("Report End Time"),
      col("project_id").as("Project - Allocation"),
      col("project_id").as("Project - Allocation ID"),
      lit("").as("Manager (PI)"),
      lit("stack").as("Cluster Name"), // CLUSTER_NAME, billing.py:16
      lit("").as("Invoice Email"),
      lit("").as("Invoice Address"),
      lit("").as("Institution"),
      lit("N/A").as("Institution - Specific Code"),
      col("su_hours").as("SU Hours (GBhr or SUhr)"),
      col("su_name").as("SU Type"),
      col("rate_display").as("Rate"), // str(Decimal) scale parity (billing.py:213)
      round(col("cost"), 2).cast("decimal(38,2)").as("Cost"),
      lit(generatedAtIso).as("Generated At"))

  /** S6 — single-file CSV, delimiter ",", quote "|", minimal quoting
    * (billing.py:163-165). `coalesce(1)` is correct here: the invoice
    * output is O(projects × 6) rows regardless of input scale.
    */
  def writeCsv(rows: DataFrame, path: String): Unit =
    rows.coalesce(1).write
      .mode("overwrite")
      .option("header", "true")
      .option("quote", "|")
      .option("emptyValue", "")
      .csv(path)

  /** Month-partitioned parquet sink for the long invoice table: the
    * cumulative-regeneration workflow (billing.py:275-284 re-uploads
    * daily) becomes partition overwrite — rewriting one month never
    * touches the others, and month-filtered reads prune partitions at
    * the file listing.
    */
  def writePartitioned(longInvoices: DataFrame, invoiceMonth: String, path: String): Unit =
    longInvoices
      .withColumn("invoice_month", lit(invoiceMonth))
      .write
      .partitionBy("invoice_month")
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(path)

  /** S7 — the three S3 destination keys (billing.py:267-291). The daily key
    * subtracts one second from the exclusive end to get the inclusive date
    * (billing.py:276-278).
    */
  def s3Keys(
      invoiceMonth: String,
      endUs: Long,
      nowUtc: java.time.Instant
  ): (String, String, String) = {
    val fmtDay = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd").withZone(java.time.ZoneOffset.UTC)
    val fmtStamp = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(java.time.ZoneOffset.UTC)
    val inclusiveEnd = java.time.Instant.ofEpochMilli((endUs - 1000000L) / 1000L)
    val primary =
      s"Invoices/$invoiceMonth/Service Invoices/NERC OpenStack $invoiceMonth.csv"
    val daily =
      s"Invoices/$invoiceMonth/Service Invoices/NERC OpenStack ${fmtDay.format(inclusiveEnd)}.csv"
    val archive =
      s"Invoices/$invoiceMonth/Archive/NERC OpenStack $invoiceMonth ${fmtStamp.format(nowUtc)}.csv"
    (primary, daily, archive)
  }

  /** S7 — the triple upload itself (billing.py:267-293): the SAME file
    * body goes to the primary key (skippable, billing.py:235
    * `upload_to_primary_location`), the daily key, and the archive key,
    * in that order. The transport is caller-supplied — an s3a
    * `FileSystem.create` loop, an S3 client, or a test capture — because
    * only the wire is environment-blocked here, not the sequencing.
    * Returns the keys written, in upload order.
    */
  def uploadInvoice(
      csvBytes: Array[Byte],
      invoiceMonth: String,
      endUs: Long,
      nowUtc: java.time.Instant,
      put: (String, Array[Byte]) => Unit,
      uploadToPrimary: Boolean = true
  ): Seq[String] = {
    val (primary, daily, archive) = s3Keys(invoiceMonth, endUs, nowUtc)
    val keys = (if (uploadToPrimary) Seq(primary) else Seq.empty) :+ daily :+ archive
    keys.foreach(put(_, csvBytes))
    keys
  }

  /** A Hadoop-FileSystem `put` for [[uploadInvoice]] — the same API over
    * `file://` fixtures and `s3a://` buckets (the `DumpFetch.fsListing`
    * pattern on the write side), which is what lets the triple upload run
    * end-to-end with zero network and unchanged against the real bucket
    * when credentials exist.
    */
  def fsPut(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): (String, Array[Byte]) => Unit = {
    (key, bytes) =>
      val out = fs.create(new org.apache.hadoop.fs.Path(root, key), true)
      try out.write(bytes) finally out.close()
  }

  /** The single CSV file `writeCsv` produced (it coalesces to one part
    * file) as bytes — what `uploadInvoice` sends.
    */
  def readCsvBytes(dir: String): Array[Byte] = {
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    val part =
      try listing.toArray.map(_.toString).filter(_.endsWith(".csv"))
      finally listing.close() // Files.list holds a directory handle
    require(part.length == 1, s"expected exactly one CSV part in $dir, found ${part.length}")
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(part(0)))
  }

  /** F6 — default billing window (main.py:21-30): start = first of (today −
    * 1 day)'s month at midnight; end = today at midnight.
    */
  def defaultWindow(today: java.time.LocalDate): (java.time.LocalDateTime, java.time.LocalDateTime) = {
    val start = today.minusDays(1).withDayOfMonth(1).atStartOfDay()
    (start, today.atStartOfDay())
  }
}
