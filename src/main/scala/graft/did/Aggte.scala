package graft.did

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation of the ATT(g,t) surface (`compute_aggte`,
  * `csdids/ATTgt.py:519-878`): `simple`, `group` (cohort), `calendar`,
  * plus `dynamic` (event study) — accepted-but-unimplemented in the
  * reference (SURVEY.md §2.9), implemented here as a flagged extension
  * with the R `did` package semantics.
  *
  * All influence-function algebra runs distributed on the sparse
  * long-form IF table; only K-sized vectors ever reach the driver. The
  * weight-estimation influence (`wif`, `csdids/utils_aggte.py:7-36`)
  * reduces to a per-unit closed form
  * `wbar * (attW(gbar)/S - c2 * cnt(gbar))` over small broadcast
  * cohort->coefficient maps, so it is one `when`-chain column, not a
  * matrix product.
  *
  * Intended-semantics notes (SURVEY.md §7.5): the reference's overall
  * `group` wif indexes cohorts through the first nG cells
  * (`csdids/ATTgt.py:745-749`) — we use glist, the R `did` semantics.
  * Group per-cohort point estimates are UNWEIGHTED means of ATT(g,t) but
  * their IFs are pg-weighted, exactly as in the reference (`:694,701`).
  */
object Aggte {

  final case class Prep(
      fit: AttGtFit,
      units: DataFrame,      // rowid (string), wbar, gbar — persisted small
      group: Array[Double],  // recoded per-cell cohort index
      t: Array[Double],      // recoded per-cell period index
      glist: Array[Double],  // recoded cohorts
      tlistR: Array[Double], // recoded periods present in cells
      origGlist: Array[Double],
      pgByCohort: Map[Double, Double], // original cohort -> pg
      pg: Array[Double],     // per-cell pg
      origCohortOfCell: Array[Double],
      n: Long)

  def prepare(fit: AttGtFit): Prep = {
    val pp = fit.pp
    // Per-unit weights and cohort (`csdids/ATTgt.py:591-601`).
    val units0 =
      if (pp.panel)
        pp.df.filter(col("tt") === pp.tlist.head)
          .select(col("rowid").cast("string").as("rowid"),
            col("w1").as("wbar"), col("gg").as("gbar"))
      else
        pp.df.groupBy(col("rowid").cast("string").as("rowid"))
          .agg(avg("w1").as("wbar"), avg("gg").as("gbar"))
    val units = units0.persist()

    // orig2t recode (`csdids/ATTgt.py:604-629`).
    val origCohort = fit.cells.map(_.g).toArray
    val origT = fit.cells.map(_.tn).toArray
    val gtlist = (pp.tlist ++ pp.glist).distinct.sorted
    val orig2t = gtlist.zipWithIndex.map { case (v, i) => v -> i.toDouble }.toMap
    val group = origCohort.map(orig2t)
    val t = origT.map(orig2t)
    val glist = pp.glist.map(orig2t).toArray
    val tlistR = t.distinct.sorted

    // pg: cohort probability weights pg[g] = mean(wbar * 1{gbar==g})
    // (`csdids/ATTgt.py:637-646`) — one aggregation pass.
    val n = pp.n
    val aggCols = pp.glist.map(g =>
      sum(when(col("gbar") === g, col("wbar")).otherwise(0.0)).as(s"pg_$g"))
    val row = units.agg(aggCols.head, aggCols.tail: _*).first()
    val pgByCohort = pp.glist.zipWithIndex
      .map { case (g, i) => g -> row.getDouble(i) / n }.toMap
    val pg = origCohort.map(pgByCohort)

    Prep(fit, units, group, t, glist, tlistR, pp.glist.toArray,
      pgByCohort, pg, origCohort, n)
  }

  /** when-chain lookup column over a small cohort->value map. */
  private def lookup(c: Column, m: Map[Double, Double]): Column =
    m.foldLeft(lit(0.0)) { case (acc, (k, v)) => when(c === k, v).otherwise(acc) }

  /** Aggregated per-unit influence function:
    * `IF_agg = sum_k w_k * IF[:,k] (+ wif . att)` (`utils_aggte.py:38-50`),
    * distributed: weighted sum over the sparse IF table outer-joined with
    * the unit table so absent units still get their wif share.
    * `wifOn` adds the estimated-weights influence (`utils_aggte.py:7-36`).
    */
  private def aggIF(p: Prep, keepers: Seq[Int], wAgg: Map[Int, Double],
      wifOn: Boolean): DataFrame = {
    val spark = p.fit.ifTable.sparkSession
    import spark.implicits._
    val wdf = keepers.map(k => (k, wAgg(k))).toDF("cell", "wt")
    val part = p.fit.ifTable.join(broadcast(wdf), "cell")
      .groupBy("rowid").agg(sum(col("inf") * col("wt")).as("ifpart"))

    val withUnits = p.units.join(part, Seq("rowid"), "left")
      .na.fill(0.0, Seq("ifpart"))

    if (!wifOn) withUnits.select(col("rowid"), col("ifpart").as("ifagg"))
    else {
      val s = keepers.map(k => p.pg(k)).sum
      val attW = keepers.groupBy(k => p.origCohortOfCell(k))
        .map { case (g, ks) => g -> ks.map(k => p.fit.att(k)).sum }
      val cnt = keepers.groupBy(k => p.origCohortOfCell(k))
        .map { case (g, ks) => g -> ks.size.toDouble }
      val c2 = keepers.map(k => p.fit.att(k) * p.pg(k)).sum / (s * s)
      val wifCol = col("wbar") *
        ((lookup(col("gbar"), attW) / s) - (lit(c2) * lookup(col("gbar"), cnt)))
      withUnits.select(col("rowid"), (col("ifpart") + wifCol).as("ifagg"))
    }
  }

  /** wif variant where the "cells" are already cohort-level aggregates
    * (overall `group` aggregation): keepers are cohorts themselves. */
  private def aggIFCohort(p: Prep, cohortIF: DataFrame,
      attEgt: Array[Double], pgg: Array[Double]): DataFrame = {
    val spark = cohortIF.sparkSession
    import spark.implicits._
    val s = pgg.sum
    val wdf = p.origGlist.indices.map(i => (i, pgg(i) / s)).toDF("gidx", "wt")
    val part = cohortIF.join(broadcast(wdf), "gidx")
      .groupBy("rowid").agg(sum(col("infg") * col("wt")).as("ifpart"))
    val attW = p.origGlist.indices
      .map(i => p.origGlist(i) -> attEgt(i)).toMap
    val cnt = p.origGlist.map(_ -> 1.0).toMap
    val c2 = p.origGlist.indices.map(i => attEgt(i) * pgg(i)).sum / (s * s)
    val wifCol = col("wbar") *
      ((lookup(col("gbar"), attW) / s) - (lit(c2) * lookup(col("gbar"), cnt)))
    p.units.join(part, Seq("rowid"), "left").na.fill(0.0, Seq("ifpart"))
      .select(col("rowid"), (col("ifpart") + wifCol).as("ifagg"))
  }

  /** Analytic or bootstrap SE of one aggregated IF column
    * (`get_se`, `utils_aggte.py:53-66`). */
  private def seOf(p: Prep, ifCol: DataFrame, bstrap: Boolean): Double = {
    if (bstrap) {
      val cfg = p.fit.pp.config
      val tab = ifCol.select(col("rowid"), lit(0).as("cell"),
        col("ifagg").as("inf"))
      val r = MBoot.run(tab, 1, p.n, cfg.biters, cfg.alp, cfg.seed)
      r.se(0)
    } else {
      val ss = ifCol.agg(sum(col("ifagg") * col("ifagg"))).first().getDouble(0)
      math.sqrt(ss) / p.n
    }
  }

  def simple(p: Prep, maxE: Double = Double.PositiveInfinity,
      bstrap: Option[Boolean] = None): AggteResult = {
    val bs = bstrap.getOrElse(p.fit.bstrap)
    val keepers = p.group.indices
      .filter(i => p.group(i) <= p.t(i) && p.t(i) <= p.group(i) + maxE)
    val s = keepers.map(p.pg).sum
    val att = keepers.map(k => p.fit.att(k) * p.pg(k)).sum / s
    val w = keepers.map(k => k -> p.pg(k) / s).toMap
    val ifA = aggIF(p, keepers, w, wifOn = true)
    val se0 = seOf(p, ifA, bs)
    val se = if (se0 <= Stats.DegenerateTol) Double.NaN else se0
    AggteResult("simple", att, se, Nil, Nil, Nil,
      Stats.normPpf(1 - p.fit.pp.config.alp / 2), p.fit.pp.config.alp)
  }

  /** Per-unit cohort-level IFs as long form (rowid, gidx, infg): the
    * columns of `selective_inf_func_g` (`csdids/ATTgt.py:698-715`). */
  private def cohortIFTable(p: Prep, maxE: Double): DataFrame = {
    val spark = p.fit.ifTable.sparkSession
    import spark.implicits._
    val triples = p.origGlist.indices.flatMap { gi =>
      val g = p.glist(gi)
      val which = p.group.indices.filter(i =>
        p.group(i) == g && g <= p.t(i) && p.t(i) <= p.group(i) + maxE)
      val s = which.map(p.pg).sum
      which.map(k => (k, gi, p.pg(k) / s))
    }.toDF("cell", "gidx", "wt")
    p.fit.ifTable.join(broadcast(triples), "cell")
      .groupBy("rowid", "gidx").agg(sum(col("inf") * col("wt")).as("infg"))
  }

  def group(p: Prep, maxE: Double = Double.PositiveInfinity,
      bstrap: Option[Boolean] = None, cband: Option[Boolean] = None)
      : AggteResult = {
    val cfg = p.fit.pp.config
    val bs = bstrap.getOrElse(p.fit.bstrap)
    val cb = cband.getOrElse(p.fit.pp.cband)

    val attEgt = p.origGlist.indices.map { gi =>
      val g = p.glist(gi)
      val which = p.group.indices.filter(i =>
        p.group(i) == g && p.t(i) >= g && p.t(i) <= p.group(i) + maxE)
      which.map(p.fit.att).sum / which.size
    }.toArray

    val cIF = cohortIFTable(p, maxE).persist()
    val ssRows = cIF.groupBy("gidx")
      .agg(sum(col("infg") * col("infg")).as("ss")).collect()
    val seEgt = Array.fill(p.origGlist.length)(Double.NaN)
    if (bs) {
      // reference calls get_se per cohort (mboot per column)
      p.origGlist.indices.foreach { gi =>
        val one = cIF.filter(col("gidx") === gi)
          .select(col("rowid"), lit(0).as("cell"), col("infg").as("inf"))
        seEgt(gi) = MBoot.run(one, 1, p.n, cfg.biters, cfg.alp, cfg.seed).se(0)
      }
    } else ssRows.foreach { r =>
      seEgt(r.getInt(0)) = math.sqrt(r.getDouble(1)) / p.n
    }
    seEgt.indices.foreach(i =>
      if (seEgt(i) <= Stats.DegenerateTol) seEgt(i) = Double.NaN)

    var critEgt = Stats.normPpf(1 - cfg.alp / 2)
    if (cb) {
      val asCells = cIF.select(col("rowid"), col("gidx").as("cell"),
        col("infg").as("inf"))
      val c = MBoot.run(asCells, p.origGlist.length, p.n, cfg.biters,
        cfg.alp, cfg.seed).critVal
      if (!c.isNaN && !c.isInfinite && c >= Stats.normPpf(1 - cfg.alp / 2))
        critEgt = c
    }

    val pgg = p.origGlist.map(p.pgByCohort)
    val overallAtt =
      p.origGlist.indices.map(i => attEgt(i) * pgg(i)).sum / pgg.sum
    val ifOverall = aggIFCohort(p, cIF, attEgt, pgg)
    val se0 = seOf(p, ifOverall, bs)
    val se = if (se0 <= Stats.DegenerateTol) Double.NaN else se0
    cIF.unpersist()
    AggteResult("group", overallAtt, se, p.origGlist.toSeq, attEgt.toSeq,
      seEgt.toSeq, critEgt, cfg.alp)
  }

  def calendar(p: Prep, bstrap: Option[Boolean] = None,
      cband: Option[Boolean] = None): AggteResult = {
    val cfg = p.fit.pp.config
    val bs = bstrap.getOrElse(p.fit.bstrap)
    val cb = cband.getOrElse(p.fit.pp.cband)
    val spark = p.fit.ifTable.sparkSession
    import spark.implicits._

    val minG = p.group.min
    val calT = p.tlistR.filter(_ >= minG)
    val gtlist = (p.fit.pp.tlist ++ p.fit.pp.glist).distinct.sorted
    def t2orig(r: Double): Double = gtlist(r.toInt)

    val perT = calT.map { t1 =>
      val which = p.t.indices.filter(i => p.t(i) == t1 && p.group(i) <= p.t(i))
      val s = which.map(p.pg).sum
      val att = which.map(k => p.fit.att(k) * p.pg(k)).sum / s
      (t1, which, s, att)
    }

    // per-period IFs with wif (`csdids/ATTgt.py:798-812`)
    val triples = perT.zipWithIndex.flatMap { case ((_, which, s, _), ti) =>
      which.map(k => (k, ti, p.pg(k) / s))
    }.toSeq.toDF("cell", "tidx", "wt")
    val base = p.fit.ifTable.join(broadcast(triples), "cell")
      .groupBy("rowid", "tidx").agg(sum(col("inf") * col("wt")).as("ifpart"))
    // add per-period wif columns
    val withWif = perT.zipWithIndex.map { case ((_, which, s, _), ti) =>
      val attW = which.groupBy(k => p.origCohortOfCell(k))
        .map { case (g, ks) => g -> ks.map(p.fit.att(_)).sum }
      val cnt = which.groupBy(k => p.origCohortOfCell(k))
        .map { case (g, ks) => g -> ks.size.toDouble }
      val c2 = which.map(k => p.fit.att(k) * p.pg(k)).sum / (s * s)
      val wifCol = col("wbar") *
        ((lookup(col("gbar"), attW) / s) - (lit(c2) * lookup(col("gbar"), cnt)))
      p.units.join(base.filter(col("tidx") === ti), Seq("rowid"), "left")
        .na.fill(0.0, Seq("ifpart"))
        .select(col("rowid"), lit(ti).as("tidx"),
          (col("ifpart") + wifCol).as("infg"))
    }.reduce(_ union _).persist()

    val seEgt = Array.fill(calT.length)(Double.NaN)
    if (bs) {
      perT.indices.foreach { ti =>
        val one = withWif.filter(col("tidx") === ti)
          .select(col("rowid"), lit(0).as("cell"), col("infg").as("inf"))
        seEgt(ti) = MBoot.run(one, 1, p.n, cfg.biters, cfg.alp, cfg.seed).se(0)
      }
    } else {
      withWif.groupBy("tidx").agg(sum(col("infg") * col("infg")).as("ss"))
        .collect().foreach(r =>
          seEgt(r.getInt(0)) = math.sqrt(r.getDouble(1)) / p.n)
    }
    seEgt.indices.foreach(i =>
      if (seEgt(i) <= Stats.DegenerateTol) seEgt(i) = Double.NaN)

    var critEgt = Stats.normPpf(1 - cfg.alp / 2)
    if (cb) {
      val asCells = withWif.select(col("rowid"), col("tidx").as("cell"),
        col("infg").as("inf"))
      val c = MBoot.run(asCells, calT.length, p.n, cfg.biters, cfg.alp,
        cfg.seed).critVal
      if (!c.isNaN && !c.isInfinite && c >= Stats.normPpf(1 - cfg.alp / 2))
        critEgt = c
    }

    val overallAtt = perT.map(_._4).sum / perT.length
    val wdf = perT.indices.map(i => (i, 1.0 / perT.length))
      .toDF("tidx", "wt")
    val ifOverall = withWif.join(broadcast(wdf), "tidx")
      .groupBy("rowid").agg(sum(col("infg") * col("wt")).as("ifagg"))
    val ifFull = p.units.select("rowid").join(ifOverall, Seq("rowid"), "left")
      .na.fill(0.0, Seq("ifagg"))
    val se0 = seOf(p, ifFull, bs)
    val se = if (se0 <= Stats.DegenerateTol) Double.NaN else se0
    withWif.unpersist()
    AggteResult("calendar", overallAtt, se, perT.map(t => t2orig(t._1)),
      perT.map(_._4), seEgt.toSeq, critEgt, cfg.alp)
  }

  /** Event-study aggregation — EXTENSION: validated-but-unimplemented in
    * the reference (`csdids/ATTgt.py:559-560`, SURVEY.md §2.9). R `did`
    * semantics: per event time e = t - g, pg-weighted mean of ATT(g,t);
    * overall = unweighted mean over e >= 0. */
  def dynamic(p: Prep, minE: Double = Double.NegativeInfinity,
      maxE: Double = Double.PositiveInfinity,
      bstrap: Option[Boolean] = None): AggteResult = {
    val cfg = p.fit.pp.config
    val bs = bstrap.getOrElse(p.fit.bstrap)
    val spark = p.fit.ifTable.sparkSession
    import spark.implicits._

    val eAll = p.t.indices.map(i => p.t(i) - p.group(i))
    val eseq = eAll.distinct.sorted.filter(e => e >= minE && e <= maxE)
    val perE = eseq.map { e =>
      val which = p.t.indices.filter(i =>
        p.t(i) - p.group(i) == e && e >= minE && e <= maxE)
      val s = which.map(p.pg).sum
      val att = which.map(k => p.fit.att(k) * p.pg(k)).sum / s
      (e, which, s, att)
    }
    val seEgt = perE.zipWithIndex.map { case ((_, which, s, _), _) =>
      val w = which.map(k => k -> p.pg(k) / s).toMap
      val ifE = aggIF(p, which, w, wifOn = true)
      val se0 = seOf(p, ifE, bs)
      if (se0 <= Stats.DegenerateTol) Double.NaN else se0
    }
    val post = perE.filter(_._1 >= 0)
    val overallAtt = post.map(_._4).sum / post.length
    val keepersPost = post.flatMap(_._2).distinct
    // overall IF: mean over post event times of their per-e IFs
    val wOverall = post.flatMap { case (_, which, s, _) =>
      which.map(k => k -> p.pg(k) / s / post.length)
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val ifO = aggIF(p, wOverall.keys.toSeq, wOverall, wifOn = true)
    val se0 = seOf(p, ifO, bs)
    val se = if (se0 <= Stats.DegenerateTol) Double.NaN else se0
    AggteResult("dynamic", overallAtt, se, perE.map(_._1), perE.map(_._4),
      seEgt, Stats.normPpf(1 - cfg.alp / 2), cfg.alp)
  }
}
