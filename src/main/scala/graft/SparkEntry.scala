package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.did._

/** Driver contract — one named query per implemented operator
  * (SURVEY.md §2 / §7.8), each with a DuckDB oracle where the semantics
  * are ANSI-SQL-expressible.
  *
  * The DiD-shaped panel view is derived deterministically from the
  * TPC-H-ish `orders` table: unit = o_custkey, period = order year
  * (1995..2001), outcome = yearly order total, cohort = first-treated
  * year assigned by `o_custkey % 4` (0 → never treated). The same view is
  * written once as SQL (`PanelView.sql`) and once as DataFrame ops
  * (`PanelView.of`) so every pipeline stage can be oracle-checked.
  */
object PanelView {
  /** Spark-side panel: columns id (long), t (double), g (double), y (double). */
  def of(spark: SparkSession, dir: String): DataFrame = {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val g = when(col("o_custkey") % 4 === 1, 1997.0)
      .when(col("o_custkey") % 4 === 2, 1999.0)
      .when(col("o_custkey") % 4 === 3, 2001.0)
      .otherwise(0.0)
    orders.groupBy(
        col("o_custkey").as("id"),
        year(col("o_orderdate")).cast("double").as("t"),
        g.as("g"))
      .agg(round(sum("o_totalprice"), 2).as("y"))
  }

  /** Identical view in DuckDB SQL (oracle building block). */
  val sql: String =
    """SELECT o_custkey AS id,
      |  CAST(year(o_orderdate) AS DOUBLE) AS t,
      |  CAST(CASE o_custkey % 4 WHEN 1 THEN 1997 WHEN 2 THEN 1999
      |       WHEN 3 THEN 2001 ELSE 0 END AS DOUBLE) AS g,
      |  ROUND(SUM(o_totalprice), 2) AS y
      |FROM orders GROUP BY 1, 2, 3""".stripMargin

  def config: AttGtConfig =
    AttGtConfig(yname = "y", tname = "t", idname = "id", gname = "g")

  def fit(spark: SparkSession, dir: String): AttGtFit =
    AttGt.fit(Preprocess.run(of(spark, dir), config))
}

object SparkEntry {

  /** Flagship: the full ATT(g,t) surface (doubly-robust DiD, analytic SE)
    * on sf0.001. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    PanelView.fit(spark, "/root/testdata/sf0.001").resultDF

  // ---- helpers ---------------------------------------------------------

  private def pv(s: SparkSession, dir: String): DataFrame = PanelView.of(s, dir)

  private def withPanelCte(body: String): String =
    s"WITH panel AS (${PanelView.sql})\n$body"

  /** Cached fits keyed by sfDir so the many DiD-stage queries inside one
    * Verify/Bench run share a single preprocess+fit. */
  private val fitCache =
    scala.collection.concurrent.TrieMap.empty[String, AttGtFit]
  private def fitFor(s: SparkSession, dir: String): AttGtFit =
    fitCache.getOrElseUpdate(dir, PanelView.fit(s, dir))
  private val prepCache =
    scala.collection.concurrent.TrieMap.empty[String, Aggte.Prep]
  private def prepFor(s: SparkSession, dir: String): Aggte.Prep =
    prepCache.getOrElseUpdate(dir, Aggte.prepare(fitFor(s, dir)))

  private def singleValue(s: SparkSession, name: String, v: Double): DataFrame = {
    import s.implicits._
    Seq(BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .toDF(name)
  }

  // ---- query surface ---------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1/§2.2 scan + filter + projection with pushdown, §2.4 hash agg
    "q1_lineitem_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          count(lit(1)).as("cnt"))
    }),

    // the DiD panel view itself (project/derive/group)
    "q_panel_view" -> ((s, dir) => pv(s, dir)),

    // §2.4 distinct sorted period list (tlist)
    "q_distinct_periods" -> ((s, dir) =>
      pv(s, dir).select("t").distinct().sort("t")),

    // §2.4 group count: cohort sizes in observation rows
    "q_group_count" -> ((s, dir) =>
      pv(s, dir).groupBy("g").agg(count(lit(1)).as("cnt"))),

    // §2.4 group mean: per-unit weight/cohort means (aggte unit table)
    "q_group_mean" -> ((s, dir) =>
      pv(s, dir).groupBy("id")
        .agg(round(avg("g"), 4).as("gbar"), count(lit(1)).as("nobs"))),

    // §2.7 cohort probability weights pg
    "q_cohort_probs" -> ((s, dir) => {
      val units = pv(s, dir).select("id", "g").distinct()
      val tot = units.count().toDouble
      units.groupBy("g").agg(round(count(lit(1)) / tot, 6).as("pg"))
        .filter(col("g") > 0)
    }),

    // §2.5 window lag pre/post pivot (panel2cs2 intended semantics)
    "q_window_lag" -> ((s, dir) => {
      val two = pv(s, dir).filter(col("t").isin(1995.0, 1996.0))
      val w = Window.partitionBy("id").orderBy("t")
      two.withColumn("y0", lag("y", 1).over(w))
        .filter(col("y0").isNotNull)
        .select(col("id"), col("y0"), col("y").as("y1"),
          round(col("y") - col("y0"), 2).as("dy"))
    }),

    // §2.7 per-cell 2x2 weighted means (post cells, varying base,
    // never-treated control) — the estimator's sufficient statistics
    "q_cell_means_2x2" -> ((s, dir) => {
      import s.implicits._
      val p = pv(s, dir)
      val tl = p.select("t").distinct().as[Double].collect().sorted
      val gs = p.select("g").distinct().as[Double].collect()
        .filter(_ > 0).sorted
      val grid = (for {
        g <- gs; tn <- tl if tn >= g
        tpre = tl.filter(_ < g).max
      } yield (g, tn, tpre)).toSeq.toDF("cg", "ctn", "ctpre")
      p.join(broadcast(grid),
          (col("t") === col("ctn") || col("t") === col("ctpre")) &&
            (col("g") === col("cg") || col("g") === 0.0))
        .groupBy(col("cg"), col("ctn"))
        .agg(
          round(avg(when(col("g") === col("cg") && col("t") === col("ctn"), col("y"))), 4).as("mu11"),
          round(avg(when(col("g") === col("cg") && col("t") === col("ctpre"), col("y"))), 4).as("mu10"),
          round(avg(when(col("g") === 0.0 && col("t") === col("ctn"), col("y"))), 4).as("mu01"),
          round(avg(when(col("g") === 0.0 && col("t") === col("ctpre"), col("y"))), 4).as("mu00"))
        .select(col("cg").as("g"), col("ctn").as("t"),
          col("mu11"), col("mu10"), col("mu01"), col("mu00"))
    }),

    // §3.2 the ATT(g,t) surface — full engine run (dr, intercept-only
    // distributed closed form); oracle = the same 2x2 algebra in SQL
    "q_att_gt" -> ((s, dir) =>
      fitFor(s, dir).resultDF
        .filter(!col("skipped"))
        .select(col("group").as("g"), col("time").as("t"),
          round(col("att"), 4).as("att"))),

    // §2.9 simple aggregation — overall ATT (SQL-expressible weights)
    "q_aggte_simple" -> ((s, dir) =>
      singleValue(s, "att", Aggte.simple(prepFor(s, dir)).overallAtt)),

    // §2.9 group (cohort) aggregation — per-cohort ATT point estimates
    "q_aggte_group" -> ((s, dir) => {
      import s.implicits._
      val r = Aggte.group(prepFor(s, dir))
      r.egt.zip(r.attEgt).map { case (g, a) =>
        (g, BigDecimal(a).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toDF("g", "att")
    }),

    // §2.9 calendar-time aggregation — per-period ATT point estimates
    "q_aggte_calendar" -> ((s, dir) => {
      import s.implicits._
      val r = Aggte.calendar(prepFor(s, dir))
      r.egt.zip(r.attEgt).map { case (t, a) =>
        (t, BigDecimal(a).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toDF("t", "att")
    }),

    // §2.9 dynamic (event-study) aggregation — engine extension
    "q_aggte_dynamic" -> ((s, dir) => {
      import s.implicits._
      val r = Aggte.dynamic(prepFor(s, dir))
      r.egt.zip(r.attEgt).map { case (e, a) =>
        (e, BigDecimal(a).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toDF("e", "att")
    }),

    // §2.8 multiplier-bootstrap SEs (seeded; rows-only check — the
    // Rademacher draws are not SQL-expressible)
    "q_mboot_se" -> ((s, dir) => {
      import s.implicits._
      val f = AttGt.fit(Preprocess.run(pv(s, dir), PanelView.config),
        bstrap = true)
      f.cells.indices.map(i => (f.cells(i).g, f.cells(i).tn, f.se(i)))
        .toDF("g", "t", "se")
    }),

    // §2.7 influence-function store: per-cell IF sum-of-squares (feeds
    // the analytic SE); rows-only (IF algebra not SQL-expressible)
    "q_if_norms" -> ((s, dir) =>
      fitFor(s, dir).ifTable.groupBy("cell")
        .agg(round(sum(col("inf") * col("inf")), 6).as("ss"))),
  )

  // ---- oracles ---------------------------------------------------------

  /** Shared CTE: the (g, tn, tpre) post-treatment cell grid + 2x2 means.
    * `tpre` = last period strictly before g (varying base, anticipation
    * 0, never-treated control) — mirrors AttGt.buildCells for post cells. */
  private val cellMeansCte: String =
    """tl AS (SELECT DISTINCT t FROM panel),
      |gs AS (SELECT DISTINCT g FROM panel WHERE g > 0),
      |cells AS (
      |  SELECT gs.g, tl.t AS tn,
      |         (SELECT max(t2.t) FROM tl t2 WHERE t2.t < gs.g) AS tpre
      |  FROM gs CROSS JOIN tl WHERE tl.t >= gs.g),
      |m AS (
      |  SELECT c.g, c.tn,
      |    AVG(CASE WHEN p.g = c.g AND p.t = c.tn THEN p.y END) AS mu11,
      |    AVG(CASE WHEN p.g = c.g AND p.t = c.tpre THEN p.y END) AS mu10,
      |    AVG(CASE WHEN p.g = 0 AND p.t = c.tn THEN p.y END) AS mu01,
      |    AVG(CASE WHEN p.g = 0 AND p.t = c.tpre THEN p.y END) AS mu00
      |  FROM cells c JOIN panel p
      |    ON (p.t = c.tn OR p.t = c.tpre) AND (p.g = c.g OR p.g = 0)
      |  GROUP BY c.g, c.tn)""".stripMargin

  /** Full varying-base grid (pre- and post-treatment cells) matching
    * AttGt.buildCells: post cells base = last period < g; pre-treatment
    * cells base = previous period in tlist. */
  private val attGtSql: String = withPanelCte(
    """, tl AS (SELECT t, row_number() OVER (ORDER BY t) AS idx
      |         FROM (SELECT DISTINCT t FROM panel)),
      |gs AS (SELECT DISTINCT g FROM panel WHERE g > 0),
      |cells AS (
      |  SELECT gs.g, tl.t AS tn,
      |    CASE WHEN gs.g <= tl.t
      |         THEN (SELECT max(t2.t) FROM tl t2 WHERE t2.t < gs.g)
      |         ELSE (SELECT t2.t FROM tl t2 WHERE t2.idx = tl.idx - 1) END AS tpre
      |  FROM gs CROSS JOIN tl WHERE tl.idx >= 2),
      |m AS (
      |  SELECT c.g, c.tn,
      |    AVG(CASE WHEN p.g = c.g AND p.t = c.tn THEN p.y END) AS mu11,
      |    AVG(CASE WHEN p.g = c.g AND p.t = c.tpre THEN p.y END) AS mu10,
      |    AVG(CASE WHEN p.g = 0 AND p.t = c.tn THEN p.y END) AS mu01,
      |    AVG(CASE WHEN p.g = 0 AND p.t = c.tpre THEN p.y END) AS mu00
      |  FROM cells c JOIN panel p
      |    ON (p.t = c.tn OR p.t = c.tpre) AND (p.g = c.g OR p.g = 0)
      |  GROUP BY c.g, c.tn)
      |SELECT g, tn AS t, ROUND((mu11 - mu10) - (mu01 - mu00), 4) AS att
      |FROM m
      |WHERE mu11 IS NOT NULL AND mu10 IS NOT NULL
      |  AND mu01 IS NOT NULL AND mu00 IS NOT NULL""".stripMargin)

  def oracleSql: Map[String, String] = Map(
    "q1_lineitem_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_base,
        |  COUNT(*) AS cnt
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2""".stripMargin,

    "q_panel_view" -> PanelView.sql,

    "q_distinct_periods" ->
      withPanelCte("SELECT DISTINCT t FROM panel ORDER BY t"),

    "q_group_count" ->
      withPanelCte("SELECT g, COUNT(*) AS cnt FROM panel GROUP BY g"),

    "q_group_mean" ->
      withPanelCte(
        "SELECT id, ROUND(AVG(g), 4) AS gbar, COUNT(*) AS nobs FROM panel GROUP BY id"),

    "q_cohort_probs" -> withPanelCte(
      """, units AS (SELECT DISTINCT id, g FROM panel)
        |SELECT g,
        |  ROUND(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM units), 6) AS pg
        |FROM units WHERE g > 0 GROUP BY g""".stripMargin),

    "q_window_lag" -> withPanelCte(
      """, two AS (SELECT * FROM panel WHERE t IN (1995, 1996)),
        |lagged AS (
        |  SELECT id, LAG(y) OVER (PARTITION BY id ORDER BY t) AS y0, y AS y1
        |  FROM two)
        |SELECT id, y0, y1, ROUND(y1 - y0, 2) AS dy
        |FROM lagged WHERE y0 IS NOT NULL""".stripMargin),

    "q_cell_means_2x2" -> withPanelCte(
      s""", $cellMeansCte
         |SELECT g, tn AS t,
         |  ROUND(mu11, 4) AS mu11, ROUND(mu10, 4) AS mu10,
         |  ROUND(mu01, 4) AS mu01, ROUND(mu00, 4) AS mu00
         |FROM m""".stripMargin),

    "q_att_gt" -> attGtSql,

    "q_aggte_simple" -> withPanelCte(
      s""", $cellMeansCte,
         |units AS (SELECT DISTINCT id, g FROM panel),
         |pg AS (SELECT g, COUNT(*) * 1.0 / (SELECT COUNT(*) FROM units) AS pg
         |       FROM units GROUP BY g),
         |katt AS (
         |  SELECT COALESCE((m.mu11 - m.mu10) - (m.mu01 - m.mu00), 0) AS att,
         |         pg.pg
         |  FROM cells c
         |  LEFT JOIN m ON m.g = c.g AND m.tn = c.tn
         |  JOIN pg ON pg.g = c.g)
         |SELECT ROUND(SUM(att * pg) / SUM(pg), 4) AS att FROM katt""".stripMargin),
  )
}
