package graft

import org.scalatest.funsuite.AnyFunSuite

/** The registry-count ledger, mechanized: hand-typed totals in README/
  * SURVEY drifted twice in two rounds (r9 sf1 prose; r10's "167 = 70
  * dr" vs the real 168 = 71 dr). This spec renders the canonical
  * ledger sentence from the LIVE registry (`SparkEntry.queries`) and
  * fails unless both docs contain it verbatim (whitespace-normalized,
  * so prose wrapping is free) and contain NO other "<n> oracle-gated"
  * claim with a different n. The failure message prints the exact
  * sentence to paste.
  */
class RegistryLedgerSpec extends AnyFunSuite {

  private def familyOf(key: String): String = key.takeWhile(!_.isDigit)

  /** Stable presentation order for the ledger sentence. */
  private val familyOrder = Seq("dr", "d", "q", "s", "e", "m", "j")

  private def canonicalSentence: String = {
    val keys = SparkEntry.queries.keys.toSeq
    val byFam = keys.groupBy(familyOf).view.mapValues(_.size).toMap
    val known = familyOrder.filter(byFam.contains)
    val extra = (byFam.keySet -- familyOrder).toSeq.sorted
    val parts = (known ++ extra).map(f => s"${byFam(f)} $f")
    s"Registry: ${keys.size} oracle-gated queries = ${parts.mkString(" + ")}"
  }

  private def normalized(path: String): String = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    text.replaceAll("\\s+", " ")
  }

  test("every registry key belongs to a known family") {
    val unknown = SparkEntry.queries.keys.toSeq
      .filterNot(k => familyOrder.contains(familyOf(k)))
    assert(unknown.isEmpty,
      s"keys with unrecognized family prefix: ${unknown.sorted.mkString(", ")}" +
        " — extend familyOrder if a new family is intentional")
  }

  test("README.md and SURVEY.md carry the live ledger sentence") {
    val want = canonicalSentence
    Seq("README.md", "SURVEY.md").foreach { doc =>
      val body = normalized(doc)
      assert(body.contains(want),
        s"$doc is missing the canonical ledger sentence.\n" +
          s"Paste (wrapping allowed):\n  $want")
    }
  }

  test("no stale oracle-gated count survives anywhere in the docs") {
    val n = SparkEntry.queries.size
    val claim = "(\\d+) oracle-gated".r
    Seq("README.md", "SURVEY.md").foreach { doc =>
      val body = normalized(doc)
      val wrong = claim.findAllMatchIn(body).map(_.group(1).toInt)
        .filter(_ != n).toSeq
      assert(wrong.isEmpty,
        s"$doc claims oracle-gated counts ${wrong.mkString(",")} " +
          s"but the registry holds $n")
    }
  }

  test("oracle coverage is total: every query has an oracle entry") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without an oracleSql entry: ${missing.toSeq.sorted.mkString(", ")}")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracleSql entries without a query: ${orphans.toSeq.sorted.mkString(", ")}")
  }
}
