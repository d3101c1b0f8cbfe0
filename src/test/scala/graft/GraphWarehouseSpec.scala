package graft

import graft.ext.{Graph, Warehouse}
import org.apache.spark.sql.functions._

/** Specs for the graph and warehouse-maintenance operators: PageRank's
  * integer arithmetic against hand-computed values on a known graph,
  * and scd2Merge's four branch semantics on a tiny fixture.
  */
class GraphWarehouseSpec extends SparkSuite {
  import spark.implicits._

  test("pageRank matches hand-computed integer ranks on a star graph") {
    // star: 0 — {1,2,3}, symmetrized. deg(0)=3, deg(leaf)=1.
    val e0 = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val edges = (e0 ++ e0.map(_.swap)).toDF("src", "dst")

    // r0 = 1e6 each.
    // iter1: center <- 3x1e6: 150000 + (850*3000000) div 1000 = 2700000
    //        leaf   <- 1e6 div 3 = 333333: 150000 + 283333 = 433333
    // iter2: leaf   <- 2700000 div 3 = 900000: 150000 + 765000 = 915000
    //        center <- 3x433333 = 1299999: 150000 + 1104999 = 1254999
    val r = Graph.pageRank(edges, "src", "dst", iters = 2)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(r(0L) == 1254999L)
    assert(r(1L) == 915000L && r(2L) == 915000L && r(3L) == 915000L)
  }

  test("pageRank redistributes dangling mass: hand-computed 2-node sink graph") {
    // 1 -> 2 only: node 2 is a sink (deg 0), N = 2. Each round node 2's
    // whole rank is the dangling mass D; every node gets D div 2 on top
    // of in-edge contributions before damping.
    // r0: 1e6 each.
    // iter1: D=1e6, share=500000
    //   pr(1) = 150000 + 850*(0 + 500000) div 1000        = 575000
    //   pr(2) = 150000 + 850*(1000000 + 500000) div 1000  = 1425000
    // iter2: D=1425000, share=712500
    //   pr(1) = 150000 + 850*712500 div 1000              = 755625
    //   pr(2) = 150000 + 850*(575000 + 712500) div 1000   = 1244375
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iters = 2)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(r(1L) == 755625L, s"got $r")
    assert(r(2L) == 1244375L, s"got $r")
    // with redistribution the total is exactly conserved here (no floor
    // loss in this fixture): dropped-dangling-mass would give far less
    assert(r.values.sum == 2000000L)
  }

  test("pageRank early-stops at the integer fixpoint before maxIter") {
    // symmetrized triangle: perfectly symmetric, so r0 = 1e6 IS the
    // fixpoint (150000 + 850*1000000 div 1000 = 1000000) — the L1-delta
    // observation reads 0 on round 1 and the loop must stop there
    val e0 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val edges = (e0 ++ e0.map(_.swap)).toDF("src", "dst")
    val (df, rounds) = Graph.pageRankWithRounds(edges, "src", "dst", iters = 10)
    assert(rounds == 1, s"expected early stop after 1 round, ran $rounds")
    val r = df.collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(r.values.forall(_ == 1000000L), s"fixpoint preserved: $r")
  }

  test("pageRank conserves total mass within the damping floor bound") {
    // symmetric random-ish graph over 20 nodes
    val e0 = (0L until 40L).map(i => (i % 20, (i * 7 + 3) % 20)).filter(p => p._1 != p._2).distinct
    val edges = (e0 ++ e0.map(_.swap)).distinct.toDF("src", "dst")
    val n = edges.select("src").distinct().count()
    val total = Graph.pageRank(edges, "src", "dst", iters = 3)
      .agg(sum("pr_micro")).as[Long].head()
    // each round: total' = n*150000 + 0.85*total - (floor losses < |E| + n)
    // after 3 rounds from n*1e6 the fixpoint band is [0.96, 1.0]*n*1e6
    assert(total <= n * 1000000L, s"floors only lose mass: $total")
    assert(total > (n * 1000000L * 93) / 100, s"within floor-loss band: $total")
  }

  test("scd2Merge branch semantics: carry, close+reopen, insert, history untouched") {
    val current = Seq(
      // closed history row — must pass through byte-identical
      (1L, 100L, "A", "1985-01-01", "1990-01-01", false),
      // open rows
      (1L, 150L, "A", "1990-01-01", Warehouse.OpenEnd, true), // changed by batch
      (2L, 200L, "B", "1990-01-01", Warehouse.OpenEnd, true), // no-op update
      (3L, 300L, "C", "1990-01-01", Warehouse.OpenEnd, true)  // untouched
    ).toDF("k", "bal", "seg", "valid_from", "valid_to", "is_current")
    val updates = Seq(
      (1L, 151L, "A"), // changed attr -> close + reopen
      (2L, 200L, "B"), // identical -> carry
      (9L, 900L, "N")  // new key -> insert
    ).toDF("k", "bal", "seg")

    val out = Warehouse.scd2Merge(current, updates, "k", Seq("bal", "seg"), "1995-06-01")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getString(4), r.getBoolean(5))).toSet

    assert(out == Set(
      (1L, 100L, "A", "1985-01-01", "1990-01-01", false),          // history
      (1L, 150L, "A", "1990-01-01", "1995-06-01", false),          // closed
      (1L, 151L, "A", "1995-06-01", Warehouse.OpenEnd, true),      // reopened
      (2L, 200L, "B", "1990-01-01", Warehouse.OpenEnd, true),      // no-op carry
      (3L, 300L, "C", "1990-01-01", Warehouse.OpenEnd, true),      // untouched carry
      (9L, 900L, "N", "1995-06-01", Warehouse.OpenEnd, true)       // insert
    ))

    // invariant: exactly one open row per key
    val openPerKey = out.filter(_._6).groupBy(_._1).view.mapValues(_.size)
    assert(openPerKey.values.forall(_ == 1))
  }

  test("aggState merges are split-invariant: any batching folds to the direct state") {
    val rows = (1 to 200).map(i => (s"k${i % 3}", (i * 37 % 500).toLong))
    val df = rows.toDF("k", "v")
    val direct = Warehouse.aggState(df, Seq("k"), "v")

    // three different splits, including an empty-batch degenerate
    val splits = Seq(
      Seq(df.filter(col("v") < 250), df.filter(col("v") >= 250)),
      Seq(df.filter(col("v") % 2 === 0), df.filter(col("v") % 2 === 1)),
      Seq(df, df.filter(lit(false))))
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("k").collect().map(_.toSeq).toSeq
    splits.foreach { batches =>
      val merged = Warehouse.mergeStates(batches.map(Warehouse.aggState(_, Seq("k"), "v")), Seq("k"))
      assert(canon(merged) == canon(direct), "merge(parts) == direct")
    }

    // finalizeMean is the exact integer mean of the underlying rows
    val m = Warehouse.finalizeMean(direct).select("k", "mean_micro")
      .as[(String, Long)].collect().toMap
    rows.groupBy(_._1).foreach { case (k, vs) =>
      val exp = vs.map(_._2).sum * 1000000L / vs.size
      assert(m(k) == exp, s"mean_micro($k)")
    }
  }

  test("distinctState merges are split-invariant and exact at small cardinality") {
    val rows = (1 to 300).map(i => (s"k${i % 2}", (i * 13 % 97).toLong))
    val df = rows.toDF("k", "u")
    val direct = Warehouse.finalizeDistinct(
      Warehouse.distinctState(df, Seq("k"), "u"))
      .as[(String, Long)].collect().toMap

    // merged two-way split reads the SAME estimate as the single pass
    // (HLL union is register-wise max — batch boundaries can't show)
    val merged = Warehouse.finalizeDistinct(Warehouse.mergeDistinctStates(
      Seq(
        Warehouse.distinctState(df.filter(col("u") < 50), Seq("k"), "u"),
        Warehouse.distinctState(df.filter(col("u") >= 50), Seq("k"), "u")),
      Seq("k")))
      .as[(String, Long)].collect().toMap
    assert(merged == direct, "merge(parts) == single-pass sketch")

    // replaying a batch (idempotence) can't inflate the estimate
    val replayed = Warehouse.finalizeDistinct(Warehouse.mergeDistinctStates(
      Seq(
        Warehouse.distinctState(df, Seq("k"), "u"),
        Warehouse.distinctState(df.filter(col("u") < 50), Seq("k"), "u")),
      Seq("k")))
      .as[(String, Long)].collect().toMap
    assert(replayed == direct, "replayed batch is absorbed")

    // at this cardinality the sketch is in sparse mode: exactly right
    val exact = rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    assert(direct == exact, "sparse-mode HLL is exact here")
  }

  test("histogramState merges are split-invariant; quantile pick matches hand-computed bins") {
    // values 1..100 for k0 (bin width 10 -> bins 0..10), 5 copies of 7 for k1
    val rows = (1 to 100).map(i => ("k0", i.toLong)) ++ Seq.fill(5)(("k1", 7L))
    val df = rows.toDF("k", "v")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("k", "s_bin").as[(String, Long, Long)].collect().toSeq

    val direct = Warehouse.histogramState(df, Seq("k"), "v", 10L)
    // any split of the rows merges back to the single-pass histogram
    val merged = Warehouse.mergeHistogramStates(
      Seq(
        Warehouse.histogramState(df.filter(col("v") % 3 === 0), Seq("k"), "v", 10L),
        Warehouse.histogramState(df.filter(col("v") % 3 =!= 0), Seq("k"), "v", 10L)),
      Seq("k"))
    assert(canon(merged) == canon(direct), "merge(parts) == single-pass histogram")

    // k0: total 100, p500 -> first bin with cum >= 50. bins: bin0 holds
    // 1..9 (9 rows), bin b holds 10b..10b+9 (10 rows), bin10 holds 100.
    // cum(bin4) = 9+40 = 49 < 50, cum(bin5) = 59 >= 50 -> q500 = 50.
    // p990 -> need cum >= 99: cum(bin9) = 99 -> q990 = 90.
    // k1: single bin 0 (7 div 10) -> every quantile = 0.
    val q = Warehouse.finalizeQuantiles(direct, Seq("k"), Seq(500, 990), 10L)
      .as[(String, Int, Long)].collect().map { case (k, p, v) => (k, p) -> v }.toMap
    assert(q(("k0", 500)) == 50L)
    assert(q(("k0", 990)) == 90L)
    assert(q(("k1", 500)) == 0L && q(("k1", 990)) == 0L)
  }

  test("snapshotDiff labels added/removed/changed and drops unchanged rows") {
    val old = Seq(
      (1L, Some(100L), "A"), (2L, Some(200L), "B"), (3L, Some(300L), "C"),
      (4L, Some(400L), "D"), (6L, Some(600L), "F"))
      .toDF("id", "cents", "status")
    val nw = Seq(
      (2L, Some(200L), "B"), (3L, Some(333L), "C"), (4L, Some(400L), "X"),
      (5L, Some(500L), "E"), (6L, Option.empty[Long], "F")) // value -> NULL is a change
      .toDF("id", "cents", "status")
    val out = Warehouse.snapshotDiff(old, nw, "id", Seq("cents", "status"))
      .orderBy("id")
      .select("id", "change_type", "old_cents", "new_cents", "old_status", "new_status")
      .as[(Long, String, Option[Long], Option[Long], Option[String], Option[String])]
      .collect().toSeq
    assert(out == Seq(
      (1L, "removed", Some(100L), None, Some("A"), None),
      (3L, "changed", Some(300L), Some(333L), Some("C"), Some("C")),
      (4L, "changed", Some(400L), Some(400L), Some("D"), Some("X")),
      (5L, "added", None, Some(500L), None, Some("E")),
      (6L, "changed", Some(600L), None, Some("F"), Some("F")))) // null-safe change test
  }
}
