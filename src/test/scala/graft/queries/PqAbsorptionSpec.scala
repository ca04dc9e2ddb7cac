package graft.queries

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contracts of the X236–X237 operators beyond the oracle hash. */
class PqAbsorptionSpec extends SparkSuite {

  test("q_pq_recall: full query coverage, recall lanes consistent, " +
      "ADC ranking beats the random-overlap floor") {
    val rows = ClusterQueries.pqRecall.fn(spark, Sf0001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 10)
      assert(r.getDouble(2) == r.getLong(1) / 10.0)
    }
    // random top-10 overlap on a 500-vector corpus expects ~0.2 hits
    // per query; a working ADC ranking clears 5x that in total
    assert(rows.map(_.getLong(1)).sum >= 5,
      s"total hits ${rows.map(_.getLong(1)).sum}: ADC ranking is noise")
  }

  test("q_markov_absorption: absorbing row pinned at 1, curves " +
      "monotone in k, p1 recomputes from the transition matrix") {
    val rows = DiagnosticsQueries.markovAbsorption.fn(spark, Sf0001)
      .collect()
    assert(rows.nonEmpty)
    val purchase = rows.find(_.getString(0) == "purchase")
    assert(purchase.isDefined)
    (1 to 5).foreach(k => assert(purchase.get.getDouble(k) == 1.0))
    rows.foreach { r =>
      (1 to 5).foreach(k =>
        assert(r.getDouble(k) >= 0.0 && r.getDouble(k) <= 1.0 + 1e-9))
      (1 to 4).foreach(k =>
        assert(r.getDouble(k + 1) >= r.getDouble(k) - 1e-9,
          s"${r.getString(0)}: absorption must be monotone in k"))
    }
    // p1(a) = P(a -> purchase) directly from the pair counts
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = Tables.events(spark, Sf0001)
      .select(col("event_type"), lag("event_type", 1).over(w).as("prev"))
      .filter(col("prev").isNotNull)
      .groupBy("prev", "event_type").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val nFrom = pairs.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    rows.filter(_.getString(0) != "purchase").foreach { r =>
      val st = r.getString(0)
      val direct = pairs.getOrElse((st, "purchase"), 0L).toDouble /
        nFrom(st)
      assert(math.abs(r.getDouble(1) - direct) < 1e-6, s"$st p1")
    }
  }
}
