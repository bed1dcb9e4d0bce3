package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.did.{AttGt, Preprocess, PreTest}

/** CELL-GRID-axis rehearsal (r7 verdict #5): every row-growth rehearsal
  * holds the (g,t) grid fixed at K=36 cells, leaving the K-dependent
  * structures unexercised — vcov is K×K, the Wald solve is K_pre³, the
  * sparse IF store is O(rows × cells-per-row), and the per-cell driver
  * state in the distributed fits is O(K). This main grows K ~11×
  * (4 cohorts × 10 periods → 10 cohorts × 40 periods, 36 → 390 cells)
  * at FIXED total panel rows and reports per-op exponents in K:
  * `log(tB/tA) / log(KB/KA)`.
  *
  * Rows are held fixed by trading units for periods (10k×40 vs 40k×10),
  * which is the honest axis isolation: at constant corpus size, a finer
  * time grain / more cohorts is exactly how a user grows K.
  *
  * Run: `sbt "runMain graft.GridRehearsal"`; optional args
  * `name:nUnits:nPeriods:nCohorts` override the two configs. */
object GridRehearsal {

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private final class Rng(seed: Long) {
    private var s = seed
    def nextLong(): Long = { s += 0x9E3779B97F4A7C15L; mix(s) }
    def nextDouble(): Double = (nextLong() >>> 11) / (1L << 53).toDouble
    def nextGaussian(): Double = {
      val u1 = math.max(nextDouble(), 1e-300)
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * nextDouble())
    }
  }

  /** Staggered panel with a parameterized grid: periods
    * 2000..2000+nPeriods-1; 40% never treated, the rest spread evenly
    * over `nCohorts` cohorts whose first-treat periods are spaced
    * across the window (every cohort keeps >= 2 pre periods). */
  def panelGrid(spark: SparkSession, nUnits: Long, nPeriods: Int,
      nCohorts: Int): DataFrame = {
    require(nPeriods >= nCohorts + 3,
      s"need nPeriods >= nCohorts + 3: $nPeriods vs $nCohorts")
    val step = math.max(1, (nPeriods - 3) / nCohorts)
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("t", DoubleType, nullable = false),
      StructField("g", DoubleType, nullable = false),
      StructField("y", DoubleType, nullable = false)))
    val rows = spark.range(nUnits).rdd.mapPartitions { it =>
      it.flatMap { uBoxed =>
        val u: Long = uBoxed
        val h = mix(u ^ 0xA11CEL)
        val g =
          if (java.lang.Math.floorMod(h, 5L) < 2L) 0.0 // 40% never
          else 2002.0 + step *
            java.lang.Math.floorMod(h / 5L, nCohorts.toLong)
        val rng = new Rng(mix(u) ^ 0x6B1DL)
        val uEff = rng.nextGaussian() * 2.0
        (2000 until 2000 + nPeriods).map { t =>
          val y = uEff + 0.3 * (t - 2000) +
            (if (g > 0 && t >= g) 2.0 else 0.0) +
            rng.nextGaussian() * 0.5
          Row(u, t.toDouble, g, y)
        }
      }
    }
    spark.createDataFrame(rows, schema)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // equal rows (400k), K grows ~11x
    val configs: Seq[(String, Long, Int, Int)] =
      if (args.nonEmpty) args.toSeq.map { a =>
        val Array(nm, u, p, c) = a.split(":")
        (nm, u.toLong, p.toInt, c.toInt)
      } else Seq(("K36", 40000L, 10, 4), ("K390", 10000L, 40, 10))
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt

    val results = configs.map { case (nm, nUnits, nPeriods, nCohorts) =>
      val pan = panelGrid(spark, nUnits, nPeriods, nCohorts)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val kCells = nCohorts * (nPeriods - 1)
      println(s"[$nm] rows=${pan.count()} K=$kCells " +
        s"($nCohorts cohorts x $nPeriods periods)")

      def timed(op: String)(f: => Long): (String, Double, Long) = {
        var out = 0L
        val t = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          out = f
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"[$nm] $op%-18s $t%7.2f s  out=$out")
        (op, t, out)
      }

      val ops = Seq(
        timed("att_fit") {
          val pp = Preprocess.run(pan, PanelView.config)
          val fit = AttGt.fit(pp)
          val n = fit.resultDF.count()
          fit.unpersist(); pp.unpersist()
          n
        },
        timed("att_fit_bstrap") {
          val pp = Preprocess.run(pan, PanelView.config)
          val fit = AttGt.fit(pp, bstrap = true)
          val n = fit.resultDF.count()
          fit.unpersist(); pp.unpersist()
          n
        },
        timed("att_cov_fit") {
          import org.apache.spark.sql.functions.{col, lit, pmod}
          val panelCov = pan.withColumn("x1",
            pmod(col("id"), lit(997L)).cast("double") / 997.0)
          val pp = Preprocess.run(panelCov,
            PanelView.config.copy(xfmla = Some("y ~ x1")))
          val fit = AttGt.fit(pp)
          val n = fit.resultDF.count()
          fit.unpersist(); pp.unpersist()
          n
        },
        timed("vcov_wald") {
          val pp = Preprocess.run(pan, PanelView.config)
          val fit = AttGt.fit(pp)
          val n = PreTest.vcov(fit).count()
          val r = PreTest.wald(fit)
          fit.unpersist(); pp.unpersist()
          require(r.pval >= 0 && r.pval <= 1)
          n
        })
      pan.unpersist()
      (nm, kCells, ops)
    }

    if (results.size == 2) {
      val (_, k1, ops1) = results.head
      val (_, k2, ops2) = results(1)
      val m1 = ops1.map(o => o._1 -> o).toMap
      val lk = math.log(k2.toDouble / k1)
      println("op,tA,tB,ratio,exponent_in_K,outA,outB")
      ops2.foreach { case (op, t2, out2) =>
        val (_, t1, out1) = m1(op)
        println(f"$op,$t1%.2f,$t2%.2f,${t2 / t1}%.2f," +
          f"${math.log(t2 / t1) / lk}%.2f,$out1,$out2")
      }
    }
    spark.stop()
  }
}
