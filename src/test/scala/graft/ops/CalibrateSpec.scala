package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CalibrateSpec extends SparkSpec {
  import spark.implicits._

  /** Independent O(B³) replica of the minimax characterization:
    * fit(i) = max_{j≤i} min_{k≥i} floor-micros(mean over buckets j..k).
    * Floor commutes with min/max, so this IS the PAV fit in micros. */
  private def minimax(buckets: Seq[(Long, Long)]): Seq[Long] =
    buckets.indices.map { i =>
      (0 to i).map { j =>
        (i until buckets.length).map { k =>
          val slice = buckets.slice(j, k + 1)
          val c = slice.map(_._1).sum
          val s = slice.map(_._2).sum
          s * 1000000L / c
        }.min
      }.max
    }

  test("PAV pools violators; fit matches the minimax replica (X77)") {
    // buckets: (score, n, pos) with a deliberate violation at scores 2-3
    val data =
      (1 to 4).map(_ => (1, 0)) ++   // score 1: 0/4
      (1 to 4).map(i => (2, if (i <= 3) 1 else 0)) ++ // score 2: 3/4
      (1 to 4).map(i => (3, if (i <= 1) 1 else 0)) ++ // score 3: 1/4 — violates
      (1 to 4).map(_ => (4, 1))      // score 4: 4/4
    val df = data.toDF("sc", "l")
    val out = Calibrate.isotonicCalibrate(df, col("sc"), col("l"))
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    // scores 2 and 3 pool to 4/8 = 0.5
    assert(out.map(_._4).toSeq == Seq(0L, 500000L, 500000L, 1000000L),
      s"got ${out.toSeq}")
    assert(out.map(r => (r._2, r._3)).toSeq ==
      Seq((4L, 0L), (4L, 3L), (4L, 1L), (4L, 4L)))
    val expect = minimax(out.map(r => (r._2, r._3)).toSeq)
    assert(out.map(_._4).toSeq == expect)
  }

  test("fit equals minimax on a pseudo-random 12-bucket fixture; monotone; deterministic") {
    // deterministic labels from a hash — no Random, replayable
    val rows = (0 until 600).map { i =>
      val sc = i % 12
      val h = ((i * 2654435761L) >>> 7) % 100
      (sc, if (h < 20 + sc * 6) 1 else 0) // noisy upward trend
    }
    val df = rows.toDF("sc", "l")
    val out = Calibrate.isotonicCalibrate(df, col("sc"), col("l"))
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    val expect = minimax(out.map(r => (r._2, r._3)).toSeq)
    assert(out.map(_._4).toSeq == expect)
    assert(out.map(_._4).toSeq == out.map(_._4).toSeq.sorted) // monotone
    val again = Calibrate.isotonicCalibrate(df.repartition(7), col("sc"),
      col("l")).as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq == out.toSeq)
  }

  test("guards: label domain, bucket cap, empty input, null handling") {
    val e = intercept[IllegalArgumentException](
      Calibrate.isotonicCalibrate(Seq((1, 2)).toDF("sc", "l"),
        col("sc"), col("l")))
    assert(e.getMessage.contains("labels must be 0/1"))
    val cap = intercept[IllegalArgumentException](
      Calibrate.isotonicCalibrate(
        (1 to 10).map(i => (i, 1)).toDF("sc", "l"),
        col("sc"), col("l"), maxBuckets = 5))
    assert(cap.getMessage.contains("bucket the score upstream"))
    intercept[IllegalArgumentException](
      Calibrate.isotonicCalibrate(Seq.empty[(Int, Int)].toDF("sc", "l"),
        col("sc"), col("l")))
    // NULL scores and labels drop; a single surviving bucket calibrates
    val n = Calibrate.isotonicCalibrate(
      Seq((Some(1), Some(1)), (Some(1), None), (None, Some(0)))
        .toDF("sc", "l"), col("sc"), col("l"))
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(n == Seq((1, 1L, 1L, 1000000L)))
    intercept[IllegalArgumentException](
      Calibrate.isotonicCalibrate(Seq((1, 1)).toDF("sc", "l"),
        col("sc"), col("l"), maxBuckets = 0))
  }
}
