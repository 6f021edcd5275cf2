package graft.ops

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Meta-spec over the ops/ SOURCE TREE: every `collect_list` fold must
  * either run under [[SessionOps.hotKeyGuarded]] (the by-name ceiling
  * that turns a hot-key OOM into a diagnosable error) or carry an
  * explicit `// bounded:` justification stating why the collected list
  * cannot grow with key skew (per-doc, per-chunk, k-bounded,
  * parameter-bounded).
  *
  * This is the source-scan analog of the plan pins: r9's `theilSen`
  * shipped an O(m²) in-row expansion with a documented-but-unenforced
  * bounded-key contract, and only the round-9 audit caught it. With
  * this spec, the NEXT collect_list fold fails CI until its author
  * either guards it or writes down the boundedness argument.
  */
class HotKeyGuardMetaSpec extends AnyFunSuite {

  private val opsDir = Paths.get("src/main/scala/graft/ops")

  /** Strip line comments and scaladoc lines so a `collect_list` mention
    * in prose doesn't count as a call site.
    */
  private def codeLines(path: java.nio.file.Path): Vector[(String, Int)] =
    Files.readAllLines(path).asScala.toVector.zipWithIndex.map {
      case (l, i) => (l, i + 1)
    }.filterNot { case (l, _) =>
      val t = l.trim
      t.startsWith("//") || t.startsWith("*") || t.startsWith("/*")
    }

  /** Split a file into (defName, startLine, bodyLines) spans: a span
    * runs from one top-level-in-object `def`/`val` declaration to the
    * next. Two-space indentation is the object-member level across the
    * ops/ tree (enforced incidentally by every file here).
    */
  private def memberSpans(
      lines: Vector[(String, Int)]): Vector[(String, Int, Vector[String])] = {
    val decl = """^  (?:private(?:\[\w+\])? )?(?:def|val) (\w+)""".r
    val starts = lines.zipWithIndex.collect {
      case ((l, n), idx) if decl.findFirstMatchIn(l).isDefined =>
        (decl.findFirstMatchIn(l).get.group(1), n, idx)
    }
    starts.zipWithIndex.map { case ((name, n, idx), k) =>
      val end =
        if (k + 1 < starts.length) starts(k + 1)._3 else lines.length
      (name, n, lines.slice(idx, end).map(_._1))
    }
  }

  test("every collect_list fold in ops/ is hotKeyGuarded or justified") {
    val files = Files.list(opsDir).iterator().asScala.toVector
      .filter(_.toString.endsWith(".scala")).sortBy(_.toString)
    assert(files.nonEmpty, s"no sources under $opsDir — scan broken")
    var folds = 0
    var guarded = 0
    val offenders = for {
      f <- files
      lines = codeLines(f)
      (name, line, body) <- memberSpans(lines)
      if body.exists(_.contains("collect_list("))
    } yield {
      folds += 1
      val ok = body.exists(_.contains("hotKeyGuarded"))
      if (ok) guarded += 1
      // the `// bounded:` marker lives on comment lines, which
      // codeLines stripped — re-check the raw span for it
      val raw = Files.readString(f)
      val justified = {
        // find the member's span in the raw text and look for the marker
        val spanStart = raw.linesIterator.zipWithIndex
          .find(_._2 == line - 1).map(_ => line).getOrElse(line)
        val rawLines = raw.linesIterator.toVector
        val after = rawLines.drop(spanStart - 1)
        val nextDecl = after.drop(1).indexWhere(
          _.matches("""^  (?:private(?:\[\w+\])? )?(?:def|val) \w+.*"""))
        val span =
          if (nextDecl >= 0) after.take(nextDecl + 1) else after
        span.exists(_.contains("// bounded:"))
      }
      if (ok || justified) None
      else Some(s"${f.getFileName}:$line $name")
    }
    val bad = offenders.flatten
    assert(bad.isEmpty,
      s"unguarded, unjustified collect_list folds:\n  ${bad.mkString("\n  ")}")
    // sanity: the scanner actually sees the known population — if the
    // regexes rot, this fails before a real offender can slip through
    assert(folds >= 14, s"scanner found only $folds collect_list members")
    assert(guarded >= 9, s"scanner found only $guarded guarded members")
  }
}
