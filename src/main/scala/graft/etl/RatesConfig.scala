package graft.etl

import graft.core.Types.Rates

/** S4's config-repo path (reference main.py:174-192 `--use-nerc-rates`):
  * rates come from a versioned YAML instead of CLI decimals, each rate a
  * `name` plus a `history` of `{value, from[, until]}` entries over
  * invoice months, resolved by `get_value_at(name, month)`. The reference
  * fetches that YAML over HTTP (`load_from_url`); here the fetch hop is
  * the caller's (curl, a config mount, `Files.readString`) and everything
  * after it — parsing, month-range resolution, the seven billing rate
  * names — is pure and unit-tested, the same split `DumpFetch` makes for
  * the S3 hop.
  *
  * The parser handles exactly the subset the rates file uses: a top-level
  * list of `- name:` items, each with a nested `history:` list of
  * `- value:` / `from:` / `until:` scalars (quoted or bare). It is NOT a
  * YAML library — unknown keys are ignored, structure beyond this subset
  * is rejected loudly.
  */
object RatesConfig {

  /** One history row: a value valid from month `from` (inclusive) until
    * month `until` (inclusive; None = still current). Months are
    * "YYYY-MM" strings — lexicographic order IS chronological order.
    */
  final case class RateEntry(value: String, from: String, until: Option[String])

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && ((t.head == '"' && t.last == '"') ||
      (t.head == '\'' && t.last == '\''))) t.substring(1, t.length - 1)
    else t
  }

  /** Parse the rates YAML subset into name → history. */
  def parse(yaml: String): Map[String, Seq[RateEntry]] = {
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Vector[RateEntry]]
    var name: String = null
    var value: String = null
    var from: String = null
    var until: Option[String] = None
    def flushEntry(): Unit =
      if (value != null || from != null) {
        require(name != null, "rates yaml: history entry before any name")
        require(value != null && from != null,
          s"rates yaml: history entry for '$name' needs both value and from")
        acc(name) = acc.getOrElse(name, Vector.empty) :+
          RateEntry(value, from, until)
        value = null; from = null; until = None
      }
    yaml.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#')
      val t = line.trim
      if (t.nonEmpty) {
        val afterDash = if (t.startsWith("- ")) t.drop(2).trim else t
        val isNewItem = t.startsWith("- ")
        afterDash.split(":", 2) match {
          case Array(k, v) =>
            // A '- '-led line starts a new item REGARDLESS of which key
            // leads it (YAML mappings are order-independent, so
            // `- from:` is as valid an item leader as `- value:`) —
            // flush the pending entry at every item boundary, and treat
            // re-assignment within one entry as the malformed-file error
            // it is rather than silently overwriting.
            if (isNewItem) flushEntry()
            def assignOnce(cur: String, key: String, nv: String): String = {
              require(cur == null,
                s"rates yaml: duplicate '$key' within one history entry" +
                  (if (name != null) s" of '$name'" else ""))
              nv
            }
            (k.trim, unquote(v)) match {
              case ("name", n) =>
                // flush again even when not '- '-led: a pending entry
                // must never be attributed to the next rate's name
                flushEntry(); name = n; acc.getOrElseUpdate(name, Vector.empty)
              case ("history", _) => ()
              case ("value", vv) => value = assignOnce(value, "value", vv)
              case ("from", f) => from = assignOnce(from, "from", f)
              case ("until", u) =>
                require(until.isEmpty,
                  s"rates yaml: duplicate 'until' within one history entry" +
                    (if (name != null) s" of '$name'" else ""))
                until = Some(u)
              case _ => () // unknown keys tolerated
            }
          case _ =>
            throw new IllegalArgumentException(s"rates yaml: unparseable line '$t'")
        }
      }
    }
    flushEntry()
    acc.toMap.view.mapValues(_.toSeq).toMap
  }

  /** `get_value_at` semantics: the entry whose [from, until] month range
    * contains `month` ("YYYY-MM"). Loud on zero or multiple matches —
    * an ambiguous rates file must not silently price an invoice.
    */
  def valueAt(parsed: Map[String, Seq[RateEntry]], name: String,
      month: String): String = {
    val hist = parsed.getOrElse(name, throw new IllegalArgumentException(
      s"rates config has no rate named '$name' (has: ${parsed.keys.mkString(", ")})"))
    val hits = hist.filter(e => e.from <= month && e.until.forall(month <= _))
    hits match {
      case Seq(one) => one.value
      case Seq() => throw new IllegalArgumentException(
        s"no '$name' rate covers month $month")
      case many => throw new IllegalArgumentException(
        s"${many.size} '$name' rates cover month $month — ranges overlap")
    }
  }

  private def bool(s: String): Boolean = s.toLowerCase match {
    case "true" | "yes" | "on" => true
    case "false" | "no" | "off" => false
    case other => throw new IllegalArgumentException(s"not a boolean: '$other'")
  }

  /** The seven rate names the billing run needs (main.py:176-192),
    * resolved for one invoice month.
    */
  def ratesAt(parsed: Map[String, Seq[RateEntry]], month: String): Rates =
    Rates(
      cpu = BigDecimal(valueAt(parsed, "CPU SU Rate", month)),
      gpuA100 = BigDecimal(valueAt(parsed, "GPUA100 SU Rate", month)),
      gpuA100sxm4 = BigDecimal(valueAt(parsed, "GPUA100SXM4 SU Rate", month)),
      gpuV100 = BigDecimal(valueAt(parsed, "GPUV100 SU Rate", month)),
      gpuA2 = BigDecimal(valueAt(parsed, "GPUA2 SU Rate", month)),
      gpuK80 = BigDecimal(valueAt(parsed, "GPUK80 SU Rate", month)),
      includeStoppedRuntime =
        bool(valueAt(parsed, "Charge for Stopped Instances", month)))
}
