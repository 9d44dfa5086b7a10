package graft

import graft.operators.Eval
import org.apache.spark.sql.functions._

/** AP / 1:1 join semantics vs hand-computed reference values
  * (get_ava_active_speaker_performance.py). */
class EvalSpec extends SparkSpec {

  test("AP matches hand-computed VOC value (labels 1,0,1 by desc score)") {
    import spark.implicits._
    val df = Seq(("g", 0.9, 1L, 1L), ("g", 0.8, 0L, 2L), ("g", 0.7, 1L, 3L))
      .toDF("grp", "score", "label", "uid")
    val ap = Eval.averagePrecision(df, "grp", "score", "label", "uid")
      .select("ap").head().getDouble(0)
    // prec_env = [1, 2/3, 2/3]; Δrec = [0.5, 0, 0.5] → 0.5 + 1/3
    assert(math.abs(ap - (0.5 + 1.0 / 3.0)) < 1e-12)
  }

  test("perfect ranking gives AP 1.0, inverted gives the worst case") {
    import spark.implicits._
    val perfect = Seq(("g", 0.9, 1L, 1L), ("g", 0.8, 1L, 2L), ("g", 0.1, 0L, 3L))
      .toDF("grp", "score", "label", "uid")
    assert(Eval.averagePrecision(perfect, "grp", "score", "label", "uid")
      .select("ap").head().getDouble(0) === 1.0)
    val inverted = Seq(("g", 0.9, 0L, 1L), ("g", 0.8, 0L, 2L), ("g", 0.1, 1L, 3L))
      .toDF("grp", "score", "label", "uid")
    assert(Eval.averagePrecision(inverted, "grp", "score", "label", "uid")
      .select("ap").head().getDouble(0) === 1.0 / 3.0)
  }

  test("joinOneToOne validates 1:1 like pandas merge(validate='1:1')") {
    import spark.implicits._
    val gt = Seq((1L, "a"), (2L, "b")).toDF("uid", "g")
    val pred = Seq((1L, 0.5), (2L, 0.7)).toDF("uid", "s")
    assert(Eval.joinOneToOne(gt, pred, "uid").count() === 2)
    val dup = Seq((1L, 0.5), (1L, 0.6), (2L, 0.7)).toDF("uid", "s")
    intercept[IllegalArgumentException] { Eval.joinOneToOne(gt, dup, "uid") }
    val missing = Seq((1L, 0.5)).toDF("uid", "s")
    intercept[IllegalArgumentException] { Eval.joinOneToOne(gt, missing, "uid") }
  }

  test("bbox audit flags deviations beyond 1e-9 (reference :127–140)") {
    import spark.implicits._
    val df = Seq(
      (0.1, 0.1, 0.5, 0.5, 0.1, 0.1, 0.5, 0.5),          // exact
      (0.1, 0.1, 0.5, 0.5, 0.1 + 5e-10, 0.1, 0.5, 0.5),  // within tol
      (0.1, 0.1, 0.5, 0.5, 0.1 + 1e-6, 0.1, 0.5, 0.5))   // beyond tol
      .toDF("g_x1", "g_y1", "g_x2", "g_y2", "p_x1", "p_y1", "p_x2", "p_y2")
    val ok = Eval.bboxAudit(df, "g_", "p_").select("bbox_ok").collect().map(_.getBoolean(0))
    assert(ok.toSeq === Seq(true, true, false))
  }

  test("f1PerGroup computes F1/accuracy from binarized columns") {
    import spark.implicits._
    val df = Seq((1, 1), (1, 0), (0, 1), (0, 0), (1, 1)).map { case (p, l) => ("g", p, l) }
      .toDF("grp", "pred", "label")
    val r = Eval.f1PerGroup(df, "grp", "pred", "label").head()
    // tp=2 fp=1 fn=1 tn=1 → f1 = 4/6, acc = 3/5
    assert(math.abs(r.getAs[Double]("f1") - 4.0 / 6.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("accuracy") - 0.6) < 1e-12)
  }
}
