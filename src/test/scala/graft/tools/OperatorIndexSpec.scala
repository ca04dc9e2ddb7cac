package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The operator index is machine-checked (VERDICT r15 #8): every
  * SparkEntry.defs entry must carry an operator-id row in
  * docs/operator_xids.tsv and resolve to a unique definition site —
  * a QueryDef added without indexing it fails here. */
class OperatorIndexSpec extends AnyFunSuite {

  test("every QueryDef is indexed, no stale rows, sites resolve") {
    val errors = OperatorIndex.validate(".")
    assert(errors.isEmpty, errors.mkString("\n"))
  }

  test("index entries carry definition files and spec coverage") {
    val (entries, _) = OperatorIndex.build(".")
    assert(entries.size === graft.SparkEntry.defs.size)
    // every entry resolved to a real file under graft/queries
    entries.foreach { e =>
      assert(e.file.startsWith("src/main/scala/graft/queries/"),
        s"${e.name} resolved to ${e.file}")
      assert(e.line > 0)
    }
    // the oracle share the verdicts report is computable from the index
    val oracleShare = entries.count(_.oracle).toDouble / entries.size
    assert(oracleShare > 0.95, s"oracle share fell to $oracleShare")
  }
}
