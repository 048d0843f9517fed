package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.{Dedup, StockPipeline}

/** ScalaCheck properties (SURVEY.md §5.3) — algebraic invariants of the
  * operators, checked on small generated inputs (each trial runs Spark
  * jobs, so trial counts are kept low). */
object StockProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session
  import org.apache.spark.sql.functions._

  private def volSeries(vols: Seq[Long]) = {
    import spark.implicits._
    vols.zipWithIndex
      .map { case (v, i) =>
        ("A", Timestamp.valueOf(f"2024-01-01 00:${i + 1}%02d:00"), v)
      }
      .toDF("ticker", "window_timestamp", "total_volume_1m")
  }

  private def spikes(vols: Seq[Long]): Seq[Boolean] =
    StockPipeline.withSpike(volSeries(vols))
      .orderBy("window_timestamp")
      .collect().map(_.getAs[Boolean]("is_volume_spike")).toSeq

  property("spike flags are invariant under volume scaling") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(1L, 1000L)).map(_.take(12)),
        Gen.chooseNum(2L, 50L)) { (vols, k) =>
      spikes(vols) == spikes(vols.map(_ * k))
    }

  property("first minute never spikes; constant series never spikes") =
    Prop.forAll(Gen.chooseNum(1L, 1000L), Gen.chooseNum(2, 10)) { (v, n) =>
      val s = spikes(Seq.fill(n)(v))
      !s.head && s.forall(!_) // v == 2*avg only when avg==v -> strict >
    }

  property("each event lands in exactly 5 sliding windows with its own price") = {
    import spark.implicits._
    // 2-decimal prices so the operator's round-to-4 is the identity
    val priceGen = Gen.chooseNum(1, 50000).map(_ / 100.0)
    Prop.forAll(Gen.chooseNum(0, 1000), priceGen) { (minute, price) =>
      val ts = Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:30Z")
        .plusSeconds(minute * 60L))
      val df = Seq((1L, ts, 1L, "A", price, """{"k": 1}"""))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val out = StockPipeline.sma5m(StockPipeline.normalize(df)).collect()
      out.length == 5 && out.forall(_.getAs[Double]("sma_5m") == price)
    }
  }

  property("minhash signatures are equal iff built from the same shingle set") = {
    import spark.implicits._
    val words = Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e", "f"))
    Prop.forAll(words) { ws =>
      val text = ws.mkString(" ")
      val docs = Seq((1L, text, "en", "s", text.length.toLong),
          (2L, text, "en", "s", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val sigs = Dedup.minhashSignatures(docs).collect()
      sigs.length == 2 &&
        (1 until sigs(0).length).forall(i => sigs(0).get(i) == sigs(1).get(i))
    }
  }

  property("GroupedTopK equals reference top-k for random k and data") = {
    import spark.implicits._
    // expected side computed in pure Scala: the row_number window form
    // would itself be rewritten to GroupedTopK by RowNumberTopKRewrite,
    // making a window-vs-operator comparison circular
    val gen = for {
      k <- Gen.chooseNum(1, 6)
      n <- Gen.chooseNum(1, 120)
      rows <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0, 6), Gen.chooseNum(0, 50)))
    } yield (k, rows)
    Prop.forAll(gen) { case (k, rows) =>
      val data = rows.zipWithIndex
        .map { case ((key, v), i) => (s"k$key", i.toLong, v.toDouble) }
      val df = data.toDF("key", "id", "score")
      val expected = data.groupBy(_._1).toSeq.flatMap { case (key, rs) =>
        rs.sortBy { case (_, id, score) => (-score, id) }.take(k)
          .zipWithIndex.map { case ((_, id, score), i) => (key, id, score, i + 1) }
      }.sortBy(r => (r._1, r._4))
      val actual = graft.operators.TopK
        .perKey(df, Seq("key"), Seq("score" -> true, "id" -> false), k)
        .select("key", "id", "score", "rn")
        .orderBy("key", "rn").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSeq
      expected == actual
    }
  }

  property("sessions partition events: n_events sums to input count") = {
    import spark.implicits._
    val gaps = Gen.listOfN(10, Gen.chooseNum(60L, 7200L)) // 1 min .. 2 h
    Prop.forAll(gaps) { gs =>
      val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
      val times = gs.scanLeft(t0)((t, g) => t.plusSeconds(g))
      val df = times.zipWithIndex.map { case (t, i) =>
        (i.toLong, Timestamp.from(t), 1L, "A", 10.0, """{"k": 1}""")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val sessions = StockPipeline.sessions(StockPipeline.normalize(df)).collect()
      val expectedSessions = 1 + gs.count(_ >= 1800L)
      sessions.map(_.getAs[Long]("n_events")).sum == times.length &&
        sessions.length == expectedSessions
    }
  }
}
