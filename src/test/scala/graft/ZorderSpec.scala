package graft

import graft.operators.Zorder
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class ZorderSpec extends SparkSuite {

  test("zkey matches a reference Morton implementation on random inputs") {
    import spark.implicits._
    val bits = 12
    val maxRank = (1L << bits) - 1
    def refKey(dims: Seq[(Long, Long, Long)]): Long = {
      val ranks = dims.map { case (v, mn, mx) =>
        // same scale-then-clamp as the expression; Scala Long division
        // truncates toward zero exactly like Spark's
        math.min(maxRank, math.max(0L, (v - mn) * maxRank / (mx - mn)))
      }
      (0 until bits).flatMap { i =>
        ranks.zipWithIndex.map { case (r, d) => ((r >> i) & 1L) << (i * dims.size + d) }
      }.sum
    }
    // values deliberately beyond [mn, mx) to exercise the clamps
    val rowGen = Gen.listOfN(40, Gen.zip(
      Gen.choose(-100L, 1200L), Gen.choose(-5L, 300L)))
    val prop = Prop.forAll(rowGen) { rows =>
      val df = rows.toDF("x", "y")
      val got = df.select(col("x"), col("y"),
        Zorder.zkey(Seq((col("x"), 0L, 1000L), (col("y"), 0L, 256L)), bits).as("z"))
        .as[(Long, Long, Long)].collect()
      got.forall { case (x, y, z) =>
        z == refKey(Seq((x, 0L, 1000L), (y, 0L, 256L)))
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("z-ordered layout clusters BOTH dimensions; single-column sort only one") {
    val tmp = tempDir("graft-zorder")
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("long").as("day"))
    val Array(minC, maxC, maxD) = orders
      .agg(min("o_custkey"), max("o_custkey"), max("day"))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray

    val byCust = orders
    byCust.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(s"$tmp/by_cust")
    orders.withColumn("zkey", Zorder.zkey(Seq(
        (col("o_custkey"), minC, maxC + 1),
        (col("day"), 0L, maxD + 1)), bits = 16))
      .repartitionByRange(16, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(s"$tmp/by_zkey")

    // top-quarter DATE range — the dimension the custkey sort ignores
    val dateLo = (maxD * 3) / 4
    def filesTouched(path: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(pred)
        .select(input_file_name()).distinct().count()

    val datePred = col("day") >= dateLo
    val aFiles = filesTouched(s"$tmp/by_cust", datePred)
    val zFiles = filesTouched(s"$tmp/by_zkey", datePred)
    // custkey layout scatters dates across every file; z-order keeps
    // the date range in a bounded band of the key space
    assert(aFiles >= 12, s"custkey layout unexpectedly clustered dates: $aFiles")
    assert(zFiles * 2 <= aFiles, s"z-order touched $zFiles of $aFiles files")

    // and the custkey dimension still prunes under z-order: its top
    // bit sits below the date MSB in the interleave, so a quarter
    // range maps to ~2 runs of blocks (plus boundary partials) — ~9 of
    // 16 files here, the sqrt-ish z-curve trade, far from a full scan
    val custPred = col("o_custkey") >= (minC + (maxC - minC) * 3 / 4)
    val zCust = filesTouched(s"$tmp/by_zkey", custPred)
    assert(zCust <= 10, s"z-order lost custkey locality: $zCust of 16 files")

    // layouts agree on content
    assert(
      spark.read.parquet(s"$tmp/by_cust").filter(datePred).count() ==
        spark.read.parquet(s"$tmp/by_zkey").filter(datePred).count())
  }
}
