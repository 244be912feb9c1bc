package graft.tools

import graft.Tables
import graft.etl.Cdc
import graft.operators.{Aggregates, Sessions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway 10x scale probes for the round-9 additions (not library
  * surface): transition matrix, MAD outliers, SCD2 historize + merge,
  * association/histogram profiling, the OLAP join suite, and the PCA
  * rerank kNN. Events/lineitem are replicated 10x with shifted ids
  * (+31 days per replica for events so per-user run structure repeats
  * instead of merging); embeddings replicate with shifted vec_ids. */
object R9NewOpsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val evPath = "/tmp/scale10x_events/events.parquet"
    if (!new java.io.File(evPath).exists()) {
      val e = Tables.load(spark, "/root/testdata/sf0.1", "events")
      (0 until 10).map(i =>
          e.withColumn("event_id", col("event_id") + lit(i * 10000000L))
            .withColumn("ts", col("ts") + expr(s"INTERVAL ${i * 31} DAYS")))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(evPath)
    }
    val liPath = "/tmp/scale10x_li/lineitem.parquet"
    if (!new java.io.File(liPath).exists()) {
      val li = Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
      (0 until 10).map(i =>
          li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 10000000L)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(liPath)
    }
    val embPath = "/tmp/scale10x_emb/embeddings.parquet"
    if (!new java.io.File(embPath).exists()) {
      val emb = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      (0 until 10).map(i =>
          emb.withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(embPath)
    }
    val e1 = Tables.load(spark, "/root/testdata/sf0.1", "events")
    val e10 = spark.read.parquet(evPath)
    val li1 = Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    val li10 = spark.read.parquet(liPath)
    val emb1 = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val emb10 = spark.read.parquet(embPath)

    // optional substring filter: `runMain ... benford` times only the
    // probes whose label contains "benford"
    def time(label: String)(f: => DataFrame): Unit = {
      if (args.nonEmpty && !args.exists(label.contains)) return
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = runs.map(_._1).sorted.apply(1)
      println(f"$label%-36s $med%8.3f s   rows=${runs.head._2}")
    }

    for ((tag, e) <- Seq("1x" -> e1, "10x" -> e10)) {
      time(s"transitionMatrix $tag") {
        Sessions.transitionMatrix(e, "user_id", "ts", "event_type",
          Seq(col("event_id")))
      }
      time(s"madOutliers $tag") {
        Aggregates.madOutliers(e, Seq("event_type"), "value", 3.0)
      }
      time(s"association $tag") {
        Aggregates.association(
          e.withColumn("seg", (col("user_id") % 20).cast("string")),
          "event_type", "seg")
      }
      time(s"histogram $tag") {
        Aggregates.histogram(e, "value", 20)
      }
      time(s"scd2 historize $tag") {
        Cdc.scd2(e, "user_id", "ts", Seq("event_type"),
          Seq(col("event_id")))
      }
    }
    // merge cost vs HISTORY size, fixed batch: the claim is the window
    // work is bounded by batch + touched keys, so growing history 10x
    // should move the wall only by the passthrough scan. The time-
    // shifted replica set is WRONG for this (its replicas all land
    // after the cutoff, so the "10x" history wouldn't grow) — use
    // USER-shifted replicas over the same date range instead; the
    // fixed batch touches only the base users, so 9/10 of the 10x
    // history rides the anti-join passthrough.
    val evUPath = "/tmp/scale10x_events_u/events.parquet"
    if (!new java.io.File(evUPath).exists()) {
      val e = Tables.load(spark, "/root/testdata/sf0.1", "events")
      (0 until 10).map(i =>
          e.withColumn("event_id", col("event_id") + lit(i * 10000000L))
            .withColumn("user_id", col("user_id") + lit(i * 1000000L)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(evUPath)
    }
    val eU10 = spark.read.parquet(evUPath)
    val cutoff = to_timestamp(lit("2024-01-20")).cast("timestamp_ntz")
    val batch = e1.filter(col("ts") >= cutoff &&
      col("ts") < to_timestamp(lit("2024-01-21")).cast("timestamp_ntz"))
    for ((tag, e) <- Seq("1x" -> e1, "10x" -> eU10)) {
      val hist = Cdc.scd2(e.filter(col("ts") < cutoff), "user_id", "ts",
        Seq("event_type")).localCheckpoint(true)
      time(s"scd2Merge fixed-batch hist=$tag") {
        Cdc.scd2Merge(hist, batch, "user_id", "ts", Seq("event_type"))
      }
    }
    // OLAP suite vs lineitem size (orders/dims fixed at sf0.1)
    for ((tag, li) <- Seq("1x" -> li1, "10x" -> li10)) {
      val d = "/root/testdata/sf0.1"
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      time(s"market_share-shape $tag") {
        val custN = broadcast(Tables.load(spark, d, "nation")
          .select(col("n_nationkey").as("cn_key"), col("n_regionkey")))
        val suppN = broadcast(Tables.load(spark, d, "nation")
          .select(col("n_nationkey").as("sn_key"),
            col("n_name").as("supp_nation")))
        li.join(Tables.load(spark, d, "orders"),
            col("l_orderkey") % lit(10000000L) === col("o_orderkey"))
          .join(Tables.load(spark, d, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(custN, col("c_nationkey") === col("cn_key"))
          .join(broadcast(Tables.load(spark, d, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "EUROPE")
          .join(broadcast(Tables.load(spark, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .join(suppN, col("s_nationkey") === col("sn_key"))
          .groupBy(year(col("o_orderdate")).as("yr"))
          .agg(round(sum(when(col("supp_nation") === "NATION_3", vol)
            .otherwise(lit(0.0))) / sum(vol), 6).as("mkt_share"))
      }
      time(s"avg_yearly-shape $tag") {
        val pk = broadcast(Tables.load(spark, d, "part")
          .filter(col("p_brand") === "Brand#13").select("p_partkey"))
        val lij = li.join(pk, col("l_partkey") === col("p_partkey"))
        val caps = lij.groupBy(col("l_partkey").as("__ck"))
          .agg((avg(col("l_quantity")) * lit(0.2)).as("__cap"))
        lij.join(broadcast(caps), col("l_partkey") === col("__ck"))
          .filter(col("l_quantity") < col("__cap"))
          .agg(round(sum(col("l_extendedprice")) / lit(7.0), 2)
            .as("avg_yearly"))
      }
      time(s"large_orders-shape $tag") {
        val big = li.groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("total_qty"))
          .filter(col("total_qty") > lit(200.0))
        Tables.load(spark, d, "orders")
          .join(big, col("o_orderkey") === col("l_orderkey") % lit(10000000L))
          .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(20)
      }
    }
    // PCA rerank vs corpus size (fixed 10 queries): stage 1 scales
    // with corpus at half width; stage 2 stays shortlist-bounded
    for ((tag, emb) <- Seq("1x" -> emb1, "10x" -> emb10)) {
      time(s"pcaRerankKnn $tag") {
        graft.llm.Similarity.pcaRerankKnn(
          emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding",
          5, dims = 32, shortlist = 200)
      }
    }
    // late round-9 batch: drift/AB stats, overlap sketch, basket
    // pairs, aggregate-merge refresh
    for ((tag, e) <- Seq("1x" -> e1, "10x" -> e10)) {
      val clicks = e.filter(col("event_type") === "click")
      val buys = e.filter(col("event_type") === "purchase")
      time(s"ksTwoSample $tag") {
        Aggregates.ksTwoSample(clicks, buys, "value")
      }
      time(s"welchTTest $tag") {
        Aggregates.welchTTest(clicks, buys, "value")
      }
      time(s"distinctOverlapGate $tag") {
        Aggregates.distinctOverlapGate(clicks, buys, "user_id")
      }
      time(s"peakConcurrency(sessions) $tag") {
        val sess = Sessions.sessionStats(e, "user_id", "ts", 600,
          Seq(col("event_id")))
        Sessions.peakConcurrency(sess, "sess_start", "sess_end")
      }
    }
    for ((tag, li) <- Seq("1x" -> li1, "10x" -> li10)) {
      val d = "/root/testdata/sf0.1"
      time(s"basketLift $tag") {
        val bi = li.join(broadcast(Tables.load(spark, d, "part")
            .select("p_partkey", "p_brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey"), col("p_brand"))
        Aggregates.basketLift(bi, "l_orderkey", "p_brand")
      }
    }
    // final round-9 batch: paths/forecast/diversity/CI/concentration/
    // drift — all bounded-frame aggregates
    for ((tag, e) <- Seq("1x" -> e1, "10x" -> e10)) {
      time(s"topPaths $tag") {
        Sessions.topPaths(e, "user_id", "ts", "event_type",
          Seq(col("event_id")))
      }
      time(s"seasonalBaseline $tag") {
        val cut = to_timestamp(lit("2024-01-25")).cast("timestamp_ntz")
        Aggregates.seasonalBaseline(e.filter(col("ts") < cut),
          e1.filter(col("ts") >= cut), Seq("event_type"), "ts", "value")
      }
      time(s"entropy $tag") {
        Aggregates.entropy(
          e.withColumn("seg", (col("user_id") % 20).cast("string")),
          Seq("seg"), "event_type")
      }
      time(s"wilsonInterval $tag") {
        Aggregates.wilsonInterval(
          e.withColumn("__hit", col("value") > 10.0),
          Seq("event_type"), "__hit")
      }
      time(s"gini $tag") {
        Aggregates.gini(e.groupBy(col("user_id"))
          .agg(sum(col("value")).as("rev")), "rev")
      }
      time(s"psi $tag") {
        val cut = to_timestamp(lit("2024-01-15")).cast("timestamp_ntz")
        Aggregates.psi(e.filter(col("ts") < cut),
          e.filter(col("ts") >= cut), "value")
      }
    }
    // forensic/concentration screens: digit extraction is map-side over
    // the raw scan (benford); topShare is one exact-percentile agg +
    // one conditional-sum pass over the key-cardinality revenue frame
    for ((tag, li) <- Seq("1x" -> li1, "10x" -> li10)) {
      time(s"benford $tag") {
        Aggregates.benford(li, "l_extendedprice")
      }
    }
    for ((tag, e) <- Seq("1x" -> e1, "10x" -> e10)) {
      time(s"topShare $tag") {
        Aggregates.topShare(e.groupBy(col("user_id"))
          .agg(sum(col("value")).as("rev")), "rev", 0.9)
      }
    }
    // graph/series/association batch: triangle probe replicates the
    // EDGE list with disjoint id spaces (an order-replicated lineitem
    // would collapse to the same part pairs), so 10x means 10x nodes,
    // edges and triangles; ACF gets 10x-longer daily series from the
    // time-shifted replicas; attribution 10x-longer user streams
    {
      val d = "/root/testdata/sf0.1"
      val liU = li1.join(Tables.load(spark, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val pairs1 = liU.join(liU.select(col("ok"), col("pk").as("pk2")),
          Seq("ok"))
        .filter(col("pk") < col("pk2"))
        .select(col("pk").as("id_a"), col("pk2").as("id_b"))
        .localCheckpoint(true)
      val pairs10 = (0 until 10).map(i =>
          pairs1.select((col("id_a") + lit(i * 10000000L)).as("id_a"),
            (col("id_b") + lit(i * 10000000L)).as("id_b")))
        .reduce(_ unionByName _).localCheckpoint(true)
      for ((tag, p) <- Seq("1x" -> pairs1, "10x" -> pairs10))
        time(s"triangleCount $tag") {
          graft.operators.Graph.triangleCount(p)
        }
    }
    for ((tag, e) <- Seq("1x" -> e1, "10x" -> e10)) {
      time(s"autocorrelation $tag") {
        Aggregates.autocorrelation(e, Seq("event_type"), "ts", "value", 5)
      }
      time(s"touchAttribution $tag") {
        graft.operators.Sessions.touchAttribution(e, "user_id", "ts",
          "event_type", "purchase", Seq(col("event_id")))
      }
      time(s"mutualInfo $tag") {
        Aggregates.mutualInfo(
          e.withColumn("seg", (col("user_id") % 20).cast("string")),
          "event_type", "seg")
      }
      time(s"zipfSlope $tag") {
        // term = event id (unique), so the freq table itself scales
        // 10x — probes the TakeOrdered top-N over a growing table
        Aggregates.zipfSlope(e.select(col("event_id").as("w"),
          (abs(col("value")) + lit(1.0)).as("c")), "w", "c", 1000)
      }
    }
    // BI/monitoring batch: pareto probes both growth axes (10x raw
    // rows over a fixed key frame via li10; 10x KEYS via the
    // user-shifted replicas), period/cusum get 10x-longer calendars
    // from the time-shifted replicas, rollingActive a 10x-larger
    // distinct (user, day) frame
    for ((tag, li) <- Seq("1x" -> li1, "10x" -> li10)) {
      time(s"paretoClasses rows $tag") {
        Aggregates.paretoClasses(
          li.groupBy(col("l_partkey"))
            .agg(sum(col("l_extendedprice")).as("rev")), "l_partkey", "rev")
      }
    }
    for ((tag, e) <- Seq("1x" -> e1, "10x" -> spark.read.parquet(
        "/tmp/scale10x_events_u/events.parquet"))) {
      time(s"paretoClasses keys $tag") {
        Aggregates.paretoClasses(
          e.groupBy(col("user_id")).agg(sum(col("value")).as("rev")),
          "user_id", "rev")
      }
    }
    for ((tag, e) <- Seq("1x" -> e1, "10x" -> e10)) {
      time(s"periodOverPeriod $tag") {
        Aggregates.periodOverPeriod(e, "ts", "value")
      }
      time(s"cusumChangePoint $tag") {
        Aggregates.cusumChangePoint(e, Seq("event_type"), "ts", "value")
      }
      time(s"rollingActive $tag") {
        graft.operators.Sessions.rollingActive(e, "user_id", "ts", 7)
      }
    }
    // reconciliation + semi/anti OLAP batch: diff carries only key +
    // compared columns through the one full-outer join; the Q4/Q21
    // shapes probe semi-join and double-reduction scaling (replica
    // orderkeys fold back with % so the orders dim stays fixed)
    for ((tag, li) <- Seq("1x" -> li1, "10x" -> li10)) {
      val d = "/root/testdata/sf0.1"
      time(s"diffTables $tag") {
        val old = li.filter(col("l_orderkey") % 97 =!= 0)
        val nw = li.filter(col("l_orderkey") % 89 =!= 0)
          .withColumn("l_extendedprice",
            when(col("l_orderkey") % 13 === 0,
              col("l_extendedprice") + 1000.0)
              .otherwise(col("l_extendedprice")))
        graft.etl.Cdc.diffTables(old, nw,
          Seq("l_orderkey", "l_linenumber"),
          Seq("l_extendedprice", "l_returnflag"))
      }
      time(s"late_orders-shape $tag") {
        Tables.load(spark, d, "orders")
          .join(li, col("o_orderkey") === col("l_orderkey") % lit(10000000L) &&
            col("l_shipdate") > col("o_orderdate") +
              expr("INTERVAL 60 DAYS"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_late"))
      }
      time(s"blame_supplier-shape $tag") {
        val late = li.join(Tables.load(spark, d, "orders")
            .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") % lit(10000000L) === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") +
            expr("INTERVAL 90 DAYS"))
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
          .distinct()
        val allPairs = li.select(col("l_orderkey").as("ok"),
          col("l_suppkey").as("sk")).distinct()
        val multi = allPairs.groupBy(col("ok"))
          .agg(count(lit(1)).as("ns")).filter(col("ns") > 1).select("ok")
        val sole = late.groupBy(col("ok"))
          .agg(count(lit(1)).as("nl"), max(col("sk")).as("sk"))
          .filter(col("nl") === 1)
        sole.join(multi, Seq("ok"), "left_semi")
          .join(broadcast(Tables.load(spark, d, "supplier")
            .select(col("s_suppkey"), col("s_name"))),
            col("sk") === col("s_suppkey"))
          .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name")).limit(20)
      }
    }
    // dedup observability batch: 10x docs via shifted ids (replicas
    // share text, so the exact clusters grow 10x and every gram's df
    // multiplies — both the histogram and the novelty join still ride
    // the same fixed-width exchanges)
    {
      val docPath = "/tmp/scale10x_docs/documents.parquet"
      if (!new java.io.File(docPath).exists()) {
        val doc = Tables.load(spark, "/root/testdata/sf0.1", "documents")
        (0 until 10).map(i =>
            doc.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
          .reduce(_ unionByName _)
          .write.mode("overwrite").parquet(docPath)
      }
      val d1 = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      val d10 = spark.read.parquet(docPath)
      for ((tag, doc) <- Seq("1x" -> d1, "10x" -> d10)) {
        time(s"sizeProfile $tag") {
          graft.llm.Dedup.sizeProfile(doc, "doc_id", "text")
        }
        time(s"ngramNovelty $tag") {
          graft.llm.Dedup.ngramNovelty(doc, "doc_id", "text", 3)
        }
      }
    }
    for ((tag, e) <- Seq("1x" -> e1, "10x" -> e10)) {
      time(s"kaplanMeier $tag") {
        graft.operators.Sessions.kaplanMeier(e, "user_id", "ts", 3)
      }
      time(s"qqDrift $tag") {
        Aggregates.qqDrift(e.filter(col("event_type") === "click"),
          e.filter(col("event_type") === "purchase"), "value")
      }
    }
    // agg-merge refresh: fixed one-day batch folded into a standing
    // gold aggregate built from 1x vs 10x (user-shifted) history
    for ((tag, e) <- Seq("1x" -> e1, "10x" -> eU10)) {
      def aggregate(df: DataFrame) =
        df.groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("s"),
            min(col("value")).as("mn"), max(col("value")).as("mx"))
      val gold = aggregate(e.filter(col("ts") < cutoff))
        .localCheckpoint(true)
      val batchAgg = aggregate(batch)
      time(s"mergeAggregates hist=$tag") {
        Cdc.mergeAggregates(gold, batchAgg, Seq("event_type", "day"),
          sumCols = Seq("n", "s"), minCols = Seq("mn"),
          maxCols = Seq("mx"))
      }
    }
    spark.stop()
  }
}
