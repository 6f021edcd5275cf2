package graft.etl

import java.time.LocalDateTime

/** S5's config-source path (reference billing.py:121-124:
  * `outages.load_from_url().get_outages_during(start, end, CLUSTER_NAME)`)
  * with the HTTP hop left to the caller, like [[RatesConfig]] and
  * [[DumpFetch]]. The semantic core is `get_outages_during`: keep this
  * cluster's outages, keep only those overlapping the billing window,
  * clip them to it. The file format here is deliberately plain CSV
  * (`cluster,start,end` per line, ISO local datetimes, `#` comments) —
  * the reference's remote YAML is fetched from a config repo whose
  * schema lives outside this codebase, so the loader stays honest about
  * what it parses; converting one format to the other is a ten-line
  * script.
  *
  * The billing run subtracts each interval with the same ±1-weighted
  * interval join as `--exclude-interval` (K2) — one pass, not the
  * reference's per-interval state-machine rerun (billing.py:94-100).
  */
object OutagesConfig {

  /** CLUSTER_NAME, billing.py:16 — the cluster this billing run bills. */
  val DefaultCluster = "stack"

  final case class Outage(cluster: String, start: LocalDateTime, end: LocalDateTime)

  /** Parse `cluster,start,end` lines. Blank lines and `#` comments skip;
    * anything else malformed fails loudly (a silently-dropped outage
    * overbills every project).
    */
  def parse(text: String): Seq[Outage] =
    text.linesIterator.zipWithIndex.flatMap { case (raw, i) =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.isEmpty) None
      else line.split(",", -1).map(_.trim) match {
        case Array(cluster, s, e) =>
          val o = Outage(cluster, graft.Main.parseTimeArg(s), graft.Main.parseTimeArg(e))
          require(!o.end.isBefore(o.start),
            s"outages line ${i + 1}: end before start: '$raw'")
          Some(o)
        case _ => throw new IllegalArgumentException(
          s"outages line ${i + 1}: expected 'cluster,start,end', got '$raw'")
      }
    }.toSeq

  /** `get_outages_during` semantics: this cluster's outages overlapping
    * [windowStart, windowEnd), clipped to the window. Returned in input
    * order; empty and zero-length results drop out.
    */
  def outagesDuring(
      outages: Seq[Outage],
      windowStart: LocalDateTime,
      windowEnd: LocalDateTime,
      cluster: String = DefaultCluster
  ): Seq[(LocalDateTime, LocalDateTime)] =
    outages
      .filter(_.cluster == cluster)
      .map { o =>
        val s = if (o.start.isBefore(windowStart)) windowStart else o.start
        val e = if (o.end.isAfter(windowEnd)) windowEnd else o.end
        (s, e)
      }
      .filter { case (s, e) => e.isAfter(s) }
}
