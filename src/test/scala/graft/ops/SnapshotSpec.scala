package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SnapshotSpec extends SparkSuite {
  import spark.implicits._

  private def snap(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("diff labels all four classes correctly") {
    val oldSnap = snap(1L -> "a", 2L -> "b", 3L -> "c")
    val newSnap = snap(2L -> "b", 3L -> "C2", 4L -> "d")
    val byId = Snapshot.diff(oldSnap, newSnap, "doc_id", md5(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(byId === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("diff is total: every key from either side appears exactly once") {
    val oldSnap = snap((1L to 50L).map(i => i -> s"t$i"): _*)
    val newSnap = snap((26L to 75L).map(i => i -> s"t$i"): _*)
    val out = Snapshot.diff(oldSnap, newSnap, "doc_id", md5(col("text")))
    assert(out.count() === 75)
    assert(out.select("doc_id").distinct().count() === 75)
  }

  test("fingerprint evaluates against each side's own columns") {
    // same doc_id, different text -> changed; hash columns populated
    val out = Snapshot.diff(snap(9L -> "x"), snap(9L -> "y"),
      "doc_id", md5(col("text"))).collect().head
    assert(out.getString(3) === "changed")
    assert(out.getString(1) !== out.getString(2))
  }
}
