package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.operators.Eval
import org.apache.spark.sql.functions._

/** REFERENCE-DERIVED golden: src/test/resources/ref_ap_golden.json
  * holds AP values computed by executing the reference's own
  * merge/precision-recall/compute_average_precision code
  * (utils/get_ava_active_speaker_performance.py — pure numpy+pandas)
  * on deterministic fixtures via tools/gen_ref_ap_golden.py. This
  * spec rebuilds the identical fixtures in Scala and pins BOTH graft
  * AP plans against the reference numbers — the end-to-end metric
  * diff the earlier rounds lacked (fixtures tie-free because pandas
  * sort_values is unstable and the reference has no tie-break). */
class RefGoldenSpec extends SparkSpec {

  private case class Case(n: Int, posMod: Int, seedA: Int, ap: Double)

  private val cases: Seq[Case] = {
    val url = getClass.getResource("/ref_ap_golden.json")
    assert(url != null, "ref_ap_golden.json missing — run tools/gen_ref_ap_golden.py")
    val root = new ObjectMapper().readTree(url)
    (0 until root.size()).map { i =>
      val c = root.get(i)
      Case(c.get("n").asInt, c.get("pos_mod").asInt, c.get("seed_a").asInt, c.get("ap").asDouble)
    }
  }

  private def fixtureDf(c: Case) = {
    import spark.implicits._
    (0 until c.n).map { i =>
      val label = if ((i * 7) % c.posMod == 0) 1L else 0L
      val score = ((i * c.seedA + 3) % c.n).toDouble / c.n
      ("g", score, label, i.toLong)
    }.toDF("grp", "score", "label", "uid")
  }

  test("Eval.averagePrecision matches the reference evaluator on all golden cases") {
    cases.foreach { c =>
      val ap = Eval.averagePrecision(fixtureDf(c), "grp", "score", "label", "uid")
        .select("ap").head().getDouble(0)
      assert(math.abs(ap - c.ap) < 1e-10, s"case $c: got $ap")
    }
  }

  test("the scaled two-phase AP plan matches the reference evaluator too") {
    cases.foreach { c =>
      val ap = Eval.averagePrecisionScaled(fixtureDf(c), "grp", "score", "label", "uid", 16)
        .groupBy(col("grp")).agg(sum(col("prec_env") * col("delta_rec")).as("ap"))
        .head().getDouble(1)
      assert(math.abs(ap - c.ap) < 1e-10, s"case $c: got $ap")
    }
  }

  test("ApAggregator (typed Aggregator form) matches the reference evaluator") {
    // scores enter as exact nano-scaled longs (order-preserving); the
    // aggregator quantizes each per-row contribution to nanos (its
    // order-independence contract), so the deviation bound is
    // n·0.5e-9 ≈ 2.5e-7 at n=500
    val apUdaf = udaf(graft.functions.ApAggregator,
      org.apache.spark.sql.Encoders.product[graft.functions.ApIn])
    cases.foreach { c =>
      val ap = fixtureDf(c)
        .withColumn("score_n", round(col("score") * 1e9).cast("long"))
        .groupBy(col("grp"))
        .agg(apUdaf(col("score_n"), col("label"), col("uid")).as("ap"))
        .head().getDouble(1)
      assert(math.abs(ap - c.ap) < c.n * 0.5e-9, s"case $c: got $ap")
    }
  }
}
