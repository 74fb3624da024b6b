package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Mechanical inventory of unpartitioned windows (VERDICT r06 item 4).
  *
  * `Window.orderBy(...)` without a `partitionBy` moves ALL data to one
  * partition — acceptable only when the frame is provably bounded
  * (post-agg/post-limit), twinned with a distributed form, or an
  * audit-scale sample. Each such site must carry a one-line
  * `// window-scale:` tag stating which; this test fails on any
  * untagged site, so a new accidental global window can't hide in the
  * bench tail's WindowExec warnings.
  */
class WindowScaleSpec extends AnyFunSuite {

  test("every Window.orderBy site carries a window-scale tag") {
    val root = java.nio.file.Paths.get("src/main/scala")
    assert(java.nio.file.Files.isDirectory(root),
      s"expected to run from the repo root, cwd=${System.getProperty("user.dir")}")
    val files = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala")).toSeq
    val untagged = for {
      f <- files
      lines = java.nio.file.Files.readAllLines(f).asScala.toVector
      (line, i) <- lines.zipWithIndex
      if line.contains("Window.orderBy")
      // a tag counts on the same line or within the 4 preceding lines
      context = lines.slice(math.max(0, i - 4), i + 1)
      if !context.exists(_.contains("window-scale:"))
    } yield s"$f:${i + 1}: ${line.trim.take(80)}"
    assert(untagged.isEmpty,
      "untagged global-window sites (add a `// window-scale:` note — " +
        "bounded-frame / tiny-frame / twinned / audit-sample):\n" +
        untagged.mkString("\n"))
  }

  test("the tag inventory is non-empty (the test is not vacuous)") {
    val root = java.nio.file.Paths.get("src/main/scala")
    val n = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .map(f => java.nio.file.Files.readAllLines(f).asScala
        .count(_.contains("window-scale:")))
      .sum
    // 13 audited sites through r08; r09 converted the q163/q192 layout
    // audits' global ntile windows to the distributed GlobalIndex form
    // (ScaleOps.distributedNtile), removing two sites for real
    assert(n >= 11, s"expected the 11 audited sites to stay tagged, found $n")
  }
}
