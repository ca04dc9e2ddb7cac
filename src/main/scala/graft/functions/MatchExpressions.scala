package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring matching for banlist/safety filtering — an
  * Aho–Corasick automaton (Aho & Corasick 1975) compiled once per plan
  * and walked ONCE per document, whatever the pattern count. The naive
  * alternative (`contains`/`regexp_count` per pattern) rescans the
  * document P times; at 100 TB with a production-sized blocklist the
  * scan cost is P× the corpus. Matches are counted at every ending
  * position (overlapping occurrences included — the standard AC
  * semantics), per pattern.
  */

/** Byte-level AC automaton: goto/fail/output tables over the UTF-8
  * byte alphabet. Built at plan construction on the driver; ships to
  * executors by serializing the pattern set and rebuilding lazily
  * (tables are deterministic functions of the patterns). */
final class AcAutomaton(patternBytes: Array[Array[Byte]])
    extends Serializable {
  val numPatterns: Int = patternBytes.length

  // state count ≤ total pattern bytes + 1 (trie nodes)
  @transient private lazy val tables: (Array[Int], Array[Array[Int]]) = {
    val maxStates = patternBytes.map(_.length).sum + 1
    val gotoT = Array.fill(maxStates * 256)(-1)
    val fail = new Array[Int](maxStates)
    val outBuild = Array.fill(maxStates)(List.empty[Int])
    var nStates = 1
    // trie insert
    var p = 0
    while (p < numPatterns) {
      val pat = patternBytes(p)
      var s = 0
      var i = 0
      while (i < pat.length) {
        val c = pat(i) & 0xff
        if (gotoT(s * 256 + c) == -1) {
          gotoT(s * 256 + c) = nStates
          nStates += 1
        }
        s = gotoT(s * 256 + c)
        i += 1
      }
      outBuild(s) ::= p
      p += 1
    }
    // BFS failure links; root's missing transitions loop to root
    val queue = scala.collection.mutable.Queue.empty[Int]
    var c = 0
    while (c < 256) {
      val nxt = gotoT(c)
      if (nxt == -1) gotoT(c) = 0
      else { fail(nxt) = 0; queue.enqueue(nxt) }
      c += 1
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      outBuild(s) = outBuild(s) ::: outBuild(fail(s))
      var c = 0
      while (c < 256) {
        val nxt = gotoT(s * 256 + c)
        if (nxt == -1) gotoT(s * 256 + c) = gotoT(fail(s) * 256 + c)
        else { fail(nxt) = gotoT(fail(s) * 256 + c); queue.enqueue(nxt) }
        c += 1
      }
    }
    (gotoT, outBuild.map(_.toArray))
  }

  /** One pass over `bytes`; adds every (overlapping) occurrence into
    * `counts` by pattern index. */
  def countInto(bytes: Array[Byte], counts: Array[Long]): Unit = {
    val (gotoT, out) = tables
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = gotoT(s * 256 + (bytes(i) & 0xff))
      val hits = out(s)
      var j = 0
      while (j < hits.length) { counts(hits(j)) += 1L; j += 1 }
      i += 1
    }
  }
}

/** string → array<long> of per-pattern occurrence counts (overlapping
  * included). Null input → null. */
case class MultiMatchCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "multi_match_counts"
  override def nullable: Boolean = true

  @transient private lazy val automaton: AcAutomaton =
    new AcAutomaton(patterns.map(_.getBytes("UTF-8")).toArray)

  override def nullSafeEval(input: Any): Any =
    MultiMatchCounts.compute(input.asInstanceOf[UTF8String], automaton)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MultiMatchCounts.compute($c, $ref);""")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MultiMatchCounts {
  /** Static kernel called from generated code. */
  def compute(s: UTF8String, ac: AcAutomaton): GenericArrayData = {
    val counts = new Array[Long](ac.numPatterns)
    ac.countInto(s.getBytes, counts)
    new GenericArrayData(counts)
  }
}

object MatchFunctions {
  /** Per-pattern (overlapping) occurrence counts of `patterns` in `c`,
    * as array<long> aligned with the pattern order. */
  def multiMatchCounts(c: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(
      MultiMatchCounts(ColumnBridge.expression(c), patterns))
}
