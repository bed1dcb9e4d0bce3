package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-9 wave-23: Kaplan-Meier survival, Cohen's kappa, touch
  * attribution, FK-integrity audit, business-day lead, mutual
  * information — all against hand-computed tables. */
class Wave23Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("kaplanMeier: censoring, at-risk prefix, terminal zero pin") {
    // 10 units: deaths at 1,1,3,5,5,8,8,8; censored at 2 and 3.
    // S(1)=8/10=.8; S(3)=.8*6/7; S(5)=that*3/5; t=8 kills all 3 at
    // risk -> survival pinned 0.0. H = 2/10 + 1/7 + 2/5 + 3/3.
    val units = Seq((1, true), (1, true), (2, false), (3, true),
      (3, false), (5, true), (5, true), (8, true), (8, true),
      (8, true)).toDF("dur", "obs")
    val r = Survival.kaplanMeier(units, "dur", "obs").collect()
    r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
      x.getLong(3), x.getDouble(4), x.getDouble(5))) shouldBe Array(
      (1L, 10L, 2L, 0L, 0.8, 0.2),
      (3L, 7L, 1L, 1L, 0.685714, 0.342857),
      (5L, 5L, 2L, 0L, 0.411429, 0.742857),
      (8L, 3L, 3L, 0L, 0.0, 1.742857))
  }

  test("kaplanMeier: refuses un-bucketed duration columns loudly") {
    val wide = spark.range(Survival.MaxDistinctDurations + 1)
      .select(col("id").as("dur"), lit(true).as("obs"))
    val e = intercept[IllegalArgumentException] {
      Survival.kaplanMeier(wide, "dur", "obs")
    }
    e.getMessage should include("MaxDistinctDurations")
  }

  test("cohensKappa: the classic 2x2 textbook table") {
    // 20 yy, 15 nn, 10 yn, 5 ny: po=.7, marginals A(y30,n20)
    // B(y25,n25) -> pe=.5 -> kappa=.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(15)(("n", "n")) ++
      Seq.fill(10)(("y", "n")) ++ Seq.fill(5)(("n", "y"))
    val r = Eval.cohensKappa(rows.toDF("a", "b"), "a", "b").collect()
    r.length shouldBe 1
    r.head.getLong(0) shouldBe 50L
    r.head.getDouble(1) shouldBe 0.7
    r.head.getDouble(2) shouldBe 0.5
    r.head.getDouble(3) shouldBe 0.4
  }

  test("cohensKappa: all mass in one cell pins kappa to 1.0") {
    val r = Eval.cohensKappa(Seq.fill(5)(("a", "a")).toDF("a", "b"),
      "a", "b").collect()
    r.head.getDouble(2) shouldBe 1.0 // pe
    r.head.getDouble(3) shouldBe 1.0 // kappa, not 0/0
  }

  test("attributionCredit: first/last picks, lookback, ties, direct") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    val day = 86400L
    val evs = Seq(
      // u1: view then click then conversion -> first=view last=click
      (1L, ts(100), 1L, "view"), (1L, ts(200), 2L, "click"),
      (1L, ts(300), 3L, "purchase"),
      // u2: bare conversion -> (direct)
      (2L, ts(100), 4L, "purchase"),
      // u3: touch 8 days before the conversion -> outside the 7-day
      // lookback -> (direct)
      (3L, ts(100), 5L, "view"), (3L, ts(100 + 8 * day), 6L, "purchase"),
      // u4: touch at the SAME timestamp with a smaller event_id ->
      // composite-precedes the conversion, gets both credits
      (4L, ts(500), 39L, "click"), (4L, ts(500), 40L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = Events.attributionCredit(evs, "user_id", "ts", "event_id",
      "event_type", convType = "purchase", lookbackDays = 7)
      .collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    r shouldBe Array(("(direct)", 2L, 2L), ("click", 1L, 2L),
      ("view", 1L, 0L))
  }

  test("attributionCredit: refuses bot keys over MaxUserEvents") {
    val bot = spark.range(Events.MaxUserEvents + 1)
      .select(lit(7L).as("user_id"),
        to_timestamp(lit("2024-01-01 00:00:00")).as("ts"),
        col("id").as("event_id"), lit("view").as("event_type"))
    val e = intercept[IllegalArgumentException] {
      Events.attributionCredit(bot, "user_id", "ts", "event_id",
        "event_type", convType = "purchase")
    }
    e.getMessage should include("MaxUserEvents")
  }

  test("fkAudit: orphan rows/keys, null FKs counted separately") {
    val child = Seq(Some(1L), Some(1L), Some(2L), None, Some(5L),
      Some(5L), Some(6L)).toDF("fk")
    val parent = Seq(1L, 2L, 2L, 3L).toDF("pk") // dup keys collapse
    val r = Profile.fkAudit(child, "fk", parent, "pk", "c->p").collect()
    r.length shouldBe 1
    r.head.getString(0) shouldBe "c->p"
    r.head.getLong(1) shouldBe 7L // child_rows
    r.head.getLong(2) shouldBe 1L // null_fk
    r.head.getLong(3) shouldBe 3L // orphan_rows: 5,5,6
    r.head.getLong(4) shouldBe 2L // orphan_keys: {5,6}
    r.head.getDouble(5) shouldBe 0.428571
  }

  test("weekdaysUpTo: closed form equals the brute-force count") {
    // epoch day 0 = Thursday; weekday iff floorMod(d+3, 7) < 5
    val got = spark.range(0, 200)
      .select(Temporal.weekdaysUpTo(col("id")).as("w"))
      .collect().map(_.getLong(0))
    val want = (0L until 200L).map(d =>
      (0L to d).count(x => (x + 3) % 7 < 5).toLong)
    got.toSeq shouldBe want
  }

  test("weekdaysUpTo: interval counts survive pre-1970 epoch days") {
    // W(e) - W(s) must equal the brute weekday count in (s, e] even
    // when s or e is negative (sign-of-dividend % broke this)
    def weekday(d: Long) = Math.floorMod(d + 3, 7) < 5
    val pairs = Seq((-7L, 1L), (-14L, 0L), (-30L, -3L), (-1L, 0L),
      (-9L, -9L))
    val exprs = pairs.map { case (s, e) =>
      (Temporal.weekdaysUpTo(lit(e)) -
        Temporal.weekdaysUpTo(lit(s))).as(s"d_${s}_$e")
    }
    val row = spark.range(1).select(exprs: _*).collect().head
    pairs.zipWithIndex.foreach { case ((s, e), i) =>
      val want = ((s + 1) to e).count(weekday).toLong
      withClue(s"($s,$e]: ") { row.getLong(i) shouldBe want }
    }
  }

  test("businessDayLead: weekend spans, same-day, negatives") {
    def ts(d: Long) = new Timestamp(d * 86400L * 1000L)
    // day 4 = Mon 1970-01-05. (4,8] -> Tue..Fri = 4 bdays;
    // (9 Sat,10 Sun] -> 0; (8 Fri,11 Mon] -> 1; (11,4] negative
    val df = Seq(("g", ts(4), ts(8)), ("g", ts(9), ts(10)),
      ("g", ts(8), ts(11)), ("g", ts(11), ts(4)))
      .toDF("grp", "start", "end")
    val r = Temporal.businessDayLead(df, "grp", "start", "end")
      .collect()
    r.length shouldBe 1
    r.head.getLong(1) shouldBe 3L // n
    r.head.getLong(2) shouldBe 1L // n_negative
    r.head.getDouble(3) shouldBe 1.666667 // (4+0+1)/3
    r.head.getLong(4) shouldBe 0L
    r.head.getLong(5) shouldBe 4L
  }

  test("mutualInformation: dependent pair -> nmi 1, independent -> 0") {
    val dep = Seq(("a", "1"), ("a", "1"), ("b", "2"), ("b", "2"))
      .toDF("x", "y")
    val rd = Stats.mutualInformation(dep, "x", "y").collect().head
    rd.getAs[Double]("mi") shouldBe 0.693147 // ln 2
    rd.getAs[Double]("h_xy") shouldBe 0.693147
    rd.getAs[Double]("nmi") shouldBe 1.0
    val ind = Seq(("a", "1"), ("a", "2"), ("b", "1"), ("b", "2"))
      .toDF("x", "y")
    val ri = Stats.mutualInformation(ind, "x", "y").collect().head
    ri.getAs[Double]("mi") shouldBe 0.0
    ri.getAs[Double]("h_xy") shouldBe 1.386294 // ln 4
    ri.getAs[Double]("nmi") shouldBe 0.0
  }
}
