package graft.ops

import graft.{SparkSpec, Tables}

/** Invariant laws for the retrieval-eval / graph / policy operators
  * (Advanced): perfect-retrieval NDCG, clique-survival k-core, perfect
  * split information gain, uniform-logging IPS identity, single-user AMS
  * exactness, planted-spike Hampel detection, conformal rank coverage,
  * and spike-representative thinning.
  */
class AdvancedSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 01:30:00")

  test("retrievalMetrics: same-bucket corpus retrieves the exact top-k (ndcg=rr=1)") {
    // all vectors positive in the first 4 dims -> one bucket -> bucketed == brute
    val rows = (0 until 120).map { i =>
      (i.toLong, Array.tabulate(8)(d => 1.0f + (i % 7) * 0.1f * (d + 1)), i % 2)
    }
    val r = Advanced.retrievalMetrics(rows.toDF("vec_id", "embedding", "label"))
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_ret") == 5L)
      assert(row.getAs[Long]("n_rel") == 5L)
      assert(row.getAs[Double]("rr") == 1.0)
      assert(math.abs(row.getAs[Double]("ndcg") - 1.0) < 1e-9)
    }
  }

  test("kCorePeel: a clique survives its own degree, a pendant is peeled") {
    // 6-brand clique via orders containing brand pairs (each pair once ->
    // all weights equal -> median keeps every edge); brand "zz" hangs off
    // one clique member only
    val brands = Seq("b1", "b2", "b3", "b4", "b5", "b6")
    val pairs = (for {
      i <- brands.indices; j <- brands.indices if i < j
    } yield (brands(i), brands(j))) :+ (("b1", "zz"))
    val li = pairs.zipWithIndex.flatMap { case ((x, y), o) =>
      Seq((o.toLong, x.hashCode.toLong), (o.toLong, y.hashCode.toLong))
    }.toDF("l_orderkey", "l_partkey")
    val part = (brands :+ "zz").map(b => (b.hashCode.toLong, b))
      .toDF("p_partkey", "p_brand")
    val r = Advanced.kCorePeel(li, part, k = 5, rounds = 6).collect()
    assert(r.map(_.getAs[String]("brand")).toSet == brands.toSet)
    r.foreach(row => assert(row.getAs[Long]("core_deg") == 5L))
  }

  test("splitGain: a perfectly separating threshold recovers the full parent entropy") {
    // 10 cheap LOW orders vs 10 expensive URGENT orders: the median split
    // is pure on both sides -> IG = H(parent) = 1 bit
    val rows = (1 to 10).map(i => (i.toLong, 100.0 + i, "5-LOW", t0)) ++
      (1 to 10).map(i => (10L + i, 9000.0 + i, "1-URGENT", t0))
    val df = rows.toDF("o_orderkey", "o_totalprice", "o_orderpriority", "o_orderdate")
    val r = Advanced.splitGain(df).collect()
    val mid = r.find(_.getAs[Long]("decile") == 5L).get
    assert(math.abs(mid.getAs[Double]("info_gain") - 1.0) < 1e-9)
    r.foreach(row => assert(row.getAs[Double]("info_gain") >= -1e-12))
  }

  test("ipsPolicyEval: uniform logging makes IPS and SNIPS the plain mean") {
    // 2 segments x 2 types, equal counts -> propensity = 1/K -> w = 1
    val rows = for {
      seg <- Seq(0L, 1L); et <- Seq("view", "buy"); i <- 1 to 25
    } yield (seg + (if (et == "buy") 10L else 20L) * 10 + i * 100, et, t0,
      (seg + 1) * 10.0 + (if (et == "buy") 5.0 else 0.0))
    // user_id % 10 must equal seg: rebuild ids as seg + 10*k
    val fixed = rows.zipWithIndex.map { case ((_, et, ts, v), i) =>
      val seg = if (i < 50) 0L else 1L
      (seg + 10L * (i + 1), et, ts, v)
    }
    val df = fixed.toDF("user_id", "event_type", "ts", "value")
    val mean = fixed.map(_._4).sum / fixed.size
    val r = Advanced.ipsPolicyEval(df).collect()(0)
    assert(math.abs(r.getAs[Double]("ips_value") - mean) < 1e-6)
    assert(math.abs(r.getAs[Double]("snips_value") - mean) < 1e-6)
  }

  test("amsF2: a single heavy user is estimated exactly (every sketch = n^2)") {
    val df = (1 to 37).map(_ => (7L, "e", t0, 1.0))
      .toDF("user_id", "event_type", "ts", "value")
    val r = Advanced.amsF2(df).collect()(0)
    assert(r.getAs[Long]("f2_exact") == 37L * 37L)
    assert(r.getAs[Long]("f2_sketch_x2") == 2L * 37L * 37L)
    assert(r.getAs[Long]("est_ratio_ppm") == 1000000L)
  }

  test("rollingHampel: exactly the planted spike is flagged on a flat series") {
    val base = java.time.LocalDate.of(2024, 3, 1)
    val rows = (0 until 30).map { d =>
      val v = if (d == 15) 500.0 else 20.0
      ("tt", java.sql.Timestamp.valueOf(base.plusDays(d.toLong).atTime(12, 0)), v)
    }
    val r = Advanced.rollingHampel(rows.toDF("event_type", "ts", "value")).collect()
    assert(r.length == 1)
    assert(r(0).getAs[java.sql.Date]("day").toLocalDate == base.plusDays(15))
    assert(r(0).getAs[Double]("revenue") == 500.0)
  }

  test("conformalIntervals: identical cal/test halves are fully covered") {
    val rows = (1 to 20).map(k => (k.toLong, 100.0 * ((k + 1) / 2), "P", t0))
    val df = rows.toDF("o_orderkey", "o_totalprice", "o_orderpriority", "o_orderdate")
    val r = Advanced.conformalIntervals(df).collect()(0)
    assert(r.getAs[Long]("n_cal") == 10L && r.getAs[Long]("n_test") == 10L)
    // rank ceil(11 * 0.9) = 10 = the max calibration score; test scores are
    // the identical multiset, so every test row is covered
    assert(r.getAs[Double]("coverage") == 1.0)
  }

  test("seriesThinning: a spike day represents its bucket; output is one row per bucket") {
    // 3 days per bucket: the spike's |x·n_b − s_b| strictly exceeds the
    // flat days' (a 2-day bucket would tie and fall back to earliest-day)
    val base = java.time.LocalDate.of(2024, 5, 1)
    val rows = (0 until 90).map { d =>
      val v = if (d == 31) 9999.0 else 100.0
      (d.toLong, v, "P", java.sql.Timestamp.valueOf(base.plusDays(d.toLong).atTime(0, 0)))
    }
    val df = rows.toDF("o_orderkey", "o_totalprice", "o_orderpriority", "o_orderdate")
    val r = Advanced.seriesThinning(df).collect()
    assert(r.length == 30)
    assert(r.map(_.getAs[Long]("bucket")).toSeq == (0L until 30L))
    assert(r.exists(row => row.getAs[java.sql.Date]("day").toLocalDate ==
      base.plusDays(31) && row.getAs[Double]("revenue") == 9999.0))
  }

  test("graphMixing + adamicAdar laws on the sf0.001 corpus") {
    val d = sf("sf0.001")
    val (li, o, s, c) = (Tables.lineitem(spark, d), Tables.orders(spark, d),
      Tables.supplier(spark, d), Tables.customer(spark, d))
    val gm = Advanced.graphMixing(li, o, s, c).collect()(0)
    val recip = gm.getAs[Double]("reciprocity")
    assert(recip > 0.0 && recip <= 1.0)
    if (!gm.isNullAt(gm.fieldIndex("assortativity"))) {
      val a = gm.getAs[Double]("assortativity")
      assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9)
    }
    val aa = Advanced.adamicAdar(li, o, s, c).collect()
    assert(aa.nonEmpty)
    aa.foreach { row =>
      assert(row.getAs[Number]("u").longValue < row.getAs[Number]("v").longValue)
      assert(row.getAs[Long]("n_common") >= 1L)
      assert(row.getAs[Double]("aa_score") > 0.0)
    }
  }
}
