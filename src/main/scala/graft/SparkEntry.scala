package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.Searcher

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry re-expresses one operator family from the reference's
  * inventory (SURVEY.md §2, with file:line citations there) as an idiomatic
  * Spark plan over the driver's parquet tables, with a DuckDB oracle in
  * [[oracleSql]]. Floating-point outputs are rounded so cross-engine
  * last-ulp noise can't fail the hash compare; integer/string outputs are
  * exact. Training-data operators (dedup, similarity, text analysis) run
  * over the `documents` / `embeddings` tables; the full-text engine itself
  * (posting build + block-max WAND) is exercised both here (`fts*`) and in
  * the ScalaTest suite against the brute-force oracle.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** documents text → lowercase word array (documents are plain
    * space-separated words; the code-aware analyzer is exercised by the
    * engine tests on the synthesized corpus). */
  private def toks(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), x => length(x) > lit(0))

  private val StopEn = Seq("the", "a", "of", "in", "to", "and", "is", "for")

  /** word-trigram shingles of `text` (docs with <3 tokens are filtered out
    * upstream in both engines). */
  private def shingles(tokens: Column): Column =
    transform(sequence(lit(1), size(tokens) - 2),
      i => concat_ws(" ", element_at(tokens, i), element_at(tokens, i + 1), element_at(tokens, i + 2)))

  private val shinglesSql =
    """SELECT doc_id, list_transform(generate_series(1, len(tk)-2),
      |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) AS sh
      |FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(text),'[^a-z0-9]+'), x -> length(x)>0) AS tk
      |      FROM documents)
      |WHERE len(tk) >= 3""".stripMargin

  /** doc_id → 8 lexicographic-min md5 minhashes over trigram shingles
    * (string min is engine-portable; no integer hash conversion needed). */
  private def minhashDf(s: SparkSession, dir: String): DataFrame = {
    val sh = t(s, dir, "documents")
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(shingles(col("tk"))).as("sh"))
    val aggs = (0 until 8).map(i => min(md5(concat(lit(s"$i|"), col("sh")))).as(s"mh$i"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  private val minhashSql = {
    val aggs = (0 until 8).map(i => s"min(md5('$i|' || sh)) AS mh$i").mkString(", ")
    s"""WITH shing AS ($shinglesSql),
       |ex AS (SELECT doc_id, unnest(sh) AS sh FROM shing)
       |SELECT doc_id, $aggs FROM ex GROUP BY doc_id""".stripMargin
  }

  /** MinHash-LSH candidate pairs (2 bands × 4 rows): the scale-safe
    * candidate generator shared by td7 (the pairs themselves) and td8
    * (exact Jaccard verification gated on these candidates — never an
    * unblocked shingle self-join). */
  private def lshCandidates(s: SparkSession, dir: String): DataFrame = {
    val sig = minhashDf(s, dir).select(
      col("doc_id"),
      md5(concat_ws("|", col("mh0"), col("mh1"), col("mh2"), col("mh3"))).as("band0"),
      md5(concat_ws("|", col("mh4"), col("mh5"), col("mh6"), col("mh7"))).as("band1"))
    val a = sig.select(col("doc_id").as("doc_a"), col("band0"), col("band1"))
    val b = sig.select(col("doc_id").as("doc_b"), col("band0").as("b0"), col("band1").as("b1"))
    a.join(b, col("band0") === col("b0") && col("doc_a") < col("doc_b")).select("doc_a", "doc_b")
      .unionByName(
        a.join(b, col("band1") === col("b1") && col("doc_a") < col("doc_b")).select("doc_a", "doc_b"))
      .distinct()
  }

  private val lshCandidatesSql =
    s"""WITH mh AS ($minhashSql),
       |sig AS (SELECT doc_id,
       |  md5(concat_ws('|', mh0, mh1, mh2, mh3)) AS band0,
       |  md5(concat_ws('|', mh4, mh5, mh6, mh7)) AS band1 FROM mh)
       |SELECT DISTINCT doc_a, doc_b FROM (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sig a JOIN sig b
       |    ON a.band0 = b.band0 AND a.doc_id < b.doc_id
       |  UNION ALL
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sig a JOIN sig b
       |    ON a.band1 = b.band1 AND a.doc_id < b.doc_id)""".stripMargin

  /** The three struct-wrapped side datasets of the J2/J3 full-outer combine
    * queries (each dataset = one struct column keyed by `k`, the reference's
    * name-clash-free wrap: combine.py:120). */
  private def fullOuterSides(s: SparkSession, d: String): Seq[DataFrame] = Seq(
    t(s, d, "customer").select(col("c_custkey").as("k"),
      struct(col("c_name").as("name"), col("c_mktsegment").as("segment")).as("cust")),
    t(s, d, "orders").groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("n"), round(max("o_totalprice"), 2).as("mx"))
      .select(col("k"), struct(col("n").as("n_orders"), col("mx").as("max_price")).as("ord")),
    t(s, d, "events").groupBy(col("user_id").as("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("k"), struct(col("n").as("n_events")).as("ev")))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg_pricing")(spark, "/root/testdata/sf0.001")

  /** One-time index-build seconds per cached family, recorded by
    * [[cachedIndex]] on a miss IN THIS JVM — lets the bench report build
    * cost separately from the query timings that absorb it (the first
    * harness query of a family pays its build; see Bench's
    * `cache_build_secs`). Keyed by family (dir basename minus the per-SF
    * hash suffix). */
  val cacheBuildSecs: scala.collection.concurrent.TrieMap[String, Double] =
    scala.collection.concurrent.TrieMap.empty

  /** Build-once cache for the harness' engine indexes: `build` runs only
    * when the sidecar fingerprint (corpus file listing + index configHash)
    * doesn't match what's on disk, so repeated harness/bench invocations of
    * the fts queries time the QUERY path, not a fresh index build, while
    * any change to the test data or config still triggers a rebuild. */
  private def cachedIndex(
      corpus: DataFrame, dir: String, cfg: IndexConfig)(build: => Unit): Unit = {
    val fp = corpus.inputFiles.sorted
      .foldLeft(1125899906842597L)((h, f) => 31 * h + f.hashCode)
      .toString + "|" + cfg.configHash + "|" + cfg.buildPartitions + "|" + cfg.buildBuckets
    val marker = s"$dir._fp"
    val hit = graft.index.Json.exists(marker) &&
      graft.index.Json.read(marker, classOf[String]) == fp
    if (!hit) {
      graft.index.Json.deleteRecursively(marker)
      graft.index.Json.deleteRecursively(dir)
      val t0 = System.nanoTime()
      build
      val family = dir.substring(dir.lastIndexOf('/') + 1).replaceAll("-\\d+$", "")
      cacheBuildSecs.put(family, (System.nanoTime() - t0) / 1e9)
      graft.index.Json.write(marker, fp)
    }
  }

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A8 — groupBy aggregation (reference call_stats/count pattern)
    "q1_agg_pricing" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("cnt"))),

    // A2 — histogram counter (agg.counter)
    "q2_counter" -> ((s, d) =>
      t(s, d, "events").groupBy("event_type").agg(count(lit(1)).as("cnt"))),

    // P1 — set-membership row filter
    "q3_filter_isin" -> ((s, d) =>
      t(s, d, "customer")
        .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select("c_custkey", "c_name", "c_mktsegment")),

    // P2 — predicate filter
    "q4_filter_pred" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_discount") >= 0.05 && col("l_discount") <= 0.07)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("price"))),

    // F1/F2 — docId-style concat + truncate (variant_id.py:70-83)
    "q5_variant_id" -> ((s, d) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        substring(concat_ws("-",
          col("l_orderkey").cast("string"), col("l_partkey").cast("string"),
          col("l_suppkey").cast("string"), col("l_linenumber").cast("string")), 1, 18).as("row_id"))),

    // F9 — case/when + coalesce/nullif conditionals
    "q6_case_coalesce" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 200000, "high")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("low").as("price_band"),
        coalesce(nullif(col("o_orderpriority"), lit("1-URGENT")), lit("URGENT")).as("prio"))),

    // F3/F23 — regex replace / extract / upper
    "q7_regex" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        regexp_replace(col("p_name"), " ", "_").as("name_slug"),
        upper(col("p_brand")).as("brand_uc"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"))),

    // F4/F5/F12 — split, array sort with computed key, array join
    "q8_split_sort_join" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        array_join(
          sort_array(transform(split(col("p_name"), " "),
            w => concat(lpad(length(w).cast("string"), 2, "0"), lit("|"), w))), ",").as("words_by_len"))),

    // F8 — xpos-style packed sort key + least-cap (variant_id.py:86-91)
    "q9_xpos" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        (col("c_nationkey").cast("long") * 1000000000L + col("c_custkey")).as("xpos"),
        least(lit(5000L), col("c_custkey")).as("capped"))),

    // J1 — keyed left lookup join (join-once-select-many)
    "q10_join_left" -> ((s, d) =>
      t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"), "left")
        .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"))),

    // J2/J10 — multi-way star join + agg (broadcast dims)
    "q11_join_star" -> ((s, d) => {
      val li = t(s, d, "lineitem"); val o = t(s, d, "orders"); val c = t(s, d, "customer")
      val n = t(s, d, "nation"); val r = t(s, d, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("cnt"))
    }),

    // J5 — semi join (validation hit-count pattern)
    "q12_semi" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")),

    // J6 — anti join (absent-ids guard)
    "q13_anti" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey")),

    // J9/A9 — union + distinct
    "q14_union_distinct" -> ((s, d) =>
      t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
        .unionByName(
          t(s, d, "orders").filter(col("o_totalprice") > 250000).select(col("o_custkey").as("k")))
        .distinct()),

    // J7 — interval (point-in-range) join against a broadcast range table
    "q15_interval_join" -> ((s, d) => {
      import s.implicits._
      val buckets = Seq((0, 10, "small"), (10, 25, "mid"), (25, 51, "large")).toDF("lo", "hi", "bucket")
      t(s, d, "part")
        .join(broadcast(buckets), col("p_size") >= col("lo") && col("p_size") < col("hi"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"), round(avg("p_retailprice"), 2).as("avg_price"))
    }),

    // A3 — collect per key, deterministically ordered (posting-list shape)
    "q16_collect_sorted" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(
          concat_ws(",", sort_array(collect_list(col("l_linenumber").cast("string")))).as("linenums"),
          count(lit(1)).as("cnt"))),

    // A4 — static bucket columns (samples_gq-style inverted buckets)
    "q17_bucket_counts" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(
          sum(when(col("o_totalprice") < 50000, 1L).otherwise(0L)).as("n_small"),
          sum(when(col("o_totalprice") >= 50000 && col("o_totalprice") < 150000, 1L).otherwise(0L)).as("n_mid"),
          sum(when(col("o_totalprice") >= 150000, 1L).otherwise(0L)).as("n_big"))),

    // A5 — min/max consensus aggregation
    "q18_minmax_dates" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          date_format(min("o_orderdate"), "yyyy-MM-dd").as("first_date"),
          date_format(max("o_orderdate"), "yyyy-MM-dd").as("last_date"),
          round(max("o_totalprice"), 2).as("max_price"))),

    // A7 — agg.any (bool_or)
    "q19_any" -> ((s, d) =>
      t(s, d, "events")
        .groupBy("user_id")
        .agg(
          expr("cast(bool_or(event_type = 'error') as int)").as("has_error"),
          count(lit(1)).as("n_events"))),

    // A9 — distinct
    "q20_distinct" -> ((s, d) =>
      t(s, d, "customer").select("c_mktsegment").distinct()),

    // O — global top-k with deterministic tie-break
    "q21_topk" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(15)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))),

    // window rank — first event per user
    "q22_window_rank" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type")),

    // F16/X6 — dictionary (enum) encoding with dense ids in sort order
    "q23_enum_encode" -> ((s, d) =>
      t(s, d, "customer").select("c_mktsegment").distinct()
        .select(col("c_mktsegment").as("seg"),
          (row_number().over(Window.orderBy("c_mktsegment")) - 1).cast("long").as("seg_id"))),

    // F18 — JSON field extraction
    "q24_json" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"), get_json_object(col("props"), "$.k").cast("int").as("k"))
        .filter(col("k") >= 50)),

    // P8 — nested-struct flatten (elasticsearch_row flatten parity)
    "q25_flatten" -> ((s, d) => {
      val nested = t(s, d, "customer").select(
        col("c_custkey"),
        struct(col("c_name").as("name"),
          struct(col("c_mktsegment").as("segment"), col("c_nationkey").as("nation")).as("mkt")).as("info"))
      graft.functions.Flatten(nested)
        .withColumnRenamed("info.name", "info_name")
        .withColumnRenamed("info.mkt.segment", "info_mkt_segment")
        .withColumnRenamed("info.mkt.nation", "info_mkt_nation")
    }),

    // rollup (hierarchical aggregation; beyond the reference's inventory)
    "q26_rollup" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("cnt"))),

    // set operations (§2.7): intersect / except at table level
    "q27_intersect" -> ((s, d) =>
      t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
        .intersect(
          t(s, d, "orders").filter(col("o_totalprice") > 200000).select(col("o_custkey").as("k")))),
    "q28_except" -> ((s, d) =>
      t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
        .except(
          t(s, d, "orders").filter(col("o_totalprice") > 400000).select(col("o_custkey").as("k")))),

    // exact interpolated percentiles
    "q29_percentile" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"))),

    // A6 — collect_set + dedupe/flatten union (hl_agg_collect_set_union)
    "q30_collect_set" -> ((s, d) =>
      t(s, d, "events")
        .groupBy("event_type")
        .agg(concat_ws(",",
          sort_array(collect_set((col("user_id") % 10).cast("string")))).as("user_buckets"))),

    // J2 — multi-way FULL-OUTER join of struct-wrapped datasets on a shared
    // key, the reference's flagship combine step (reduce over datasets each
    // pre-wrapped as one struct column — combine.py:131-138). Flattened for
    // the SQL oracle; the struct wrap + reduce is the exercised shape.
    "q31_join_full_outer" -> ((s, d) => {
      val sides = fullOuterSides(s, d)
      sides.reduce(_.join(_, Seq("k"), "full_outer"))
        .select(col("k"), col("cust.name").as("name"), col("cust.segment").as("segment"),
          col("ord.n_orders").as("n_orders"), col("ord.max_price").as("max_price"),
          col("ev.n_events").as("n_events"))
    }),

    // J3 — incremental re-join: drop one dataset's struct, outer-join its
    // fresh version, keep rows where ANY dataset struct is non-null
    // (combine.py:141-154) — the index-update/recompute pattern.
    "q32_join_incremental" -> ((s, d) => {
      val Seq(cust, ord, ev) = fullOuterSides(s, d)
      val base = Seq(cust, ord, ev).reduce(_.join(_, Seq("k"), "full_outer"))
      val freshOrd = t(s, d, "orders").filter(col("o_totalprice") > 100000)
        .groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("n"), round(max("o_totalprice"), 2).as("mx"))
        .select(col("k"), struct(col("n").as("n_orders"), col("mx").as("max_price")).as("ord"))
      base.drop("ord")
        .join(freshOrd, Seq("k"), "full_outer")
        .filter(Seq("cust", "ev", "ord").map(col(_).isNotNull).reduce(_ || _))
        .select(col("k"), col("cust.name").as("name"), col("cust.segment").as("segment"),
          col("ord.n_orders").as("n_orders"), col("ord.max_price").as("max_price"),
          col("ev.n_events").as("n_events"))
    }),

    // F6 — printf-style formatting (gcnv_mt_schema.py:60)
    "q33_format" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        format_string("%s_%s_%03d", col("p_brand"), col("p_type"), col("p_size")).as("part_tag"))),

    // F7 — parse-numerics with null-on-garbage (config.py:50-54 parse_float)
    "q34_try_cast" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        expr("try_cast(element_at(split(c_name, '#'), 2) as bigint)").as("name_num"),
        expr("try_cast(c_mktsegment as bigint)").as("bad_num"))),

    // F15/F18 — in-expression dict build + JSON stringify: group_by →
    // map_values fold → stringified map (clinvar.py:98-115, vep.py:270-294)
    "q35_map_json" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("event_type"), (col("user_id") % 5).cast("string").as("b"))
        .agg(count(lit(1)).as("c"))
        .groupBy("event_type")
        .agg(to_json(map_from_entries(sort_array(collect_list(struct(col("b"), col("c"))))))
          .as("bucket_counts_json"))),

    // A10 — deterministic sampling. df.sample(fraction, seed) is seeded but
    // not portable across engines; the oracle-able scale-safe equivalent is
    // hash-Bernoulli sampling on the key (same semantics: fixed fraction,
    // reproducible, embarrassingly parallel).
    "q36_sample_hash" -> ((s, d) =>
      t(s, d, "orders")
        .filter(substring(md5(col("o_orderkey").cast("string")), 1, 2) < "2a")
        .select("o_orderkey", "o_custkey")),

    // F19 — multi-value field parse: split(';').find(p != '.')
    // (config.py:24-25 predictor parsing)
    "q37_multi_value_parse" -> ((s, d) => {
      val multi = concat_ws(";", lit("."), col("p_brand"), lit("."), col("p_type"))
      t(s, d, "part").select(
        col("p_partkey"),
        element_at(filter(split(multi, ";"), x => x =!= "."), 1).as("first_real"))
    }),

    // P3/P4/P6 — config-driven filter, then the reference's shuffle-free
    // length-split pattern: branch on split-arity, transmute each branch,
    // union back (seqr_loading.py:150-161: split-multi only on the
    // multiallelic minority)
    "q38_split_branches" -> ((s, d) => {
      val cfgFilter = "p_size >= 5" // config-driven predicate (P4)
      val base = t(s, d, "part").filter(expr(cfgFilter))
        .select(col("p_partkey"), split(col("p_name"), " ").as("words"))
      val bi = base.filter(size(col("words")) <= 3)
        .withColumns(Map("n_words" -> size(col("words")).cast("long"),
          "branch" -> lit("short"))).drop("words") // transmute (P6)
      val multi = base.filter(size(col("words")) > 3)
        .withColumns(Map("n_words" -> size(col("words")).cast("long"),
          "branch" -> lit("long"))).drop("words")
      bi.unionByName(multi)
    }),

    // F23 — remaining scalar/array misc: slice, array_max, array_position,
    // greatest (write_splice_ai_ht.py:57-77, write_1kg_ht.py:42-51)
    "q40_array_misc" -> ((s, d) => {
      val words = split(col("p_name"), " ")
      t(s, d, "part").select(
        col("p_partkey"),
        concat_ws(",", slice(words, 2, 2)).as("middle_words"),
        array_max(transform(words, w => length(w))).as("max_word_len"),
        array_position(words, element_at(words, -1)).cast("long").as("last_word_pos"),
        greatest(col("p_size"), length(col("p_brand")), lit(7)).as("g"))
    }),

    // A1 (full shape) — call_stats-style multi-output aggregation: per
    // group, an ORDERED array of per-category counts plus scalar totals
    // (the AC[]/AN/AF-per-allele shape of hail's call_stats,
    // `luigi_pipeline/lib/hail_tasks.py:213-220`). The ordered count array
    // is emitted as a comma-delimited string (the q16 pattern) so the
    // harness comparator — which cannot lexsort array cells — hashes it
    // exactly on both engines.
    "q39_call_stats" -> ((s, d) => {
      val perStatus = t(s, d, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("c"))
      perStatus.groupBy("o_orderpriority")
        .agg(
          concat_ws(",",
            transform(sort_array(collect_list(struct(col("o_orderstatus"), col("c")))),
              x => x.getField("c").cast("string"))).as("ac"),
          sum("c").as("an"))
        .select(col("o_orderpriority"), col("ac"), col("an"))
    }),

    // ---- training-data operators over `documents` / `embeddings` ----

    // token counting
    "td1_tokens" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_tokens"),
        size(array_distinct(toks(col("text")))).cast("long").as("n_distinct"))),

    // quality scoring (length / stopword-ratio heuristics)
    "td2_quality" -> ((s, d) => {
      val tk = toks(col("text"))
      val n = size(tk).cast("double")
      val stop = size(filter(tk, x => x.isin(StopEn: _*))).cast("double")
      val ratio = stop / n
      t(s, d, "documents").select(
        col("doc_id"), col("n_chars"),
        size(tk).cast("long").as("n_tokens"),
        round(ratio, 4).as("stop_ratio"),
        round(least(lit(1.0), n / lit(400.0)) * (lit(1.0) - ratio), 4).as("quality"))
    }),

    // language id: character-n-gram profile scoring (Cavnar–Trenkle-style,
    // deterministic and codegen'd — see analysis/LangId; real-language
    // accuracy is asserted in ModulesSpec on genuinely multilingual text,
    // since this synthetic corpus shares one vocabulary across lang labels)
    "td3_langid" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        graft.analysis.LangId.predict(col("text")).as("pred_lang"),
        col("lang").as("true_lang"))),

    // document fingerprint (canonicalized content hash)
    "td4_fingerprint" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(toks(col("text")))))).as("fingerprint"))),

    // exact dedup: hash-group, keep min doc_id
    "td5_dedup_exact" -> ((s, d) =>
      t(s, d, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))),

    // MinHash signatures (8 hashes over word-trigram shingles)
    "td6_minhash" -> ((s, d) => minhashDf(s, d)),

    // LSH candidate pairs: 2 bands × 4 rows
    "td7_lsh_pairs" -> ((s, d) => lshCandidates(s, d)),

    // exact n-gram Jaccard, verified ONLY over the LSH candidate pairs —
    // the scale shape: O(candidates), never O(Σ df²) of an unblocked
    // shingle self-join. Exactness within the candidate set is preserved
    // (array_intersect over the full distinct-shingle sets).
    "td8_jaccard" -> ((s, d) => {
      val shs = t(s, d, "documents")
        .select(col("doc_id"), toks(col("text")).as("tk"))
        .filter(size(col("tk")) >= 3)
        .select(col("doc_id"), array_distinct(shingles(col("tk"))).as("shs"))
      val inter = size(array_intersect(col("sa"), col("sb")))
      lshCandidates(s, d)
        .join(shs.select(col("doc_id").as("doc_a"), col("shs").as("sa")), Seq("doc_a"))
        .join(shs.select(col("doc_id").as("doc_b"), col("shs").as("sb")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          round(inter.cast("double") /
            (size(col("sa")) + size(col("sb")) - inter).cast("double"), 4).as("jaccard"))
    }),

    // SimHash (16-bit, md5-nibble hyperplanes over distinct tokens)
    "td9_simhash" -> ((s, d) => {
      val ex = t(s, d, "documents")
        .select(col("doc_id"), explode(array_distinct(toks(col("text")))).as("tok"))
      val highs = Seq("8", "9", "a", "b", "c", "d", "e", "f")
      val sums = (1 to 16).map(j =>
        sum(when(substring(md5(col("tok")), j, 1).isin(highs: _*), 1).otherwise(-1)).as(s"s$j"))
      ex.groupBy("doc_id").agg(sums.head, sums.tail: _*)
        .select(col("doc_id"),
          concat((1 to 16).map(j => when(col(s"s$j") >= 0, "1").otherwise("0")): _*).as("simhash"))
    }),

    // embedding-cosine near-dup pairs over sign-LSH band blocks (random-
    // hyperplane LSH with axis-aligned planes: band key = sign bits of 8
    // dims; 2 bands). Exact cosine is computed only within candidate
    // buckets — O(candidates), not O(n²/labels). Bucket count scales with
    // n by widening the band (more sign bits), the documented scale knob.
    "td10_cos_pairs" -> ((s, d) => {
      val e = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      def bandKey(from: Int): Column = concat((from until from + 8).map(i =>
        when(element_at(col("v"), i + 1) >= 0, "1").otherwise("0")): _*)
      val keyed = e.select(col("vec_id"), col("v"), bandKey(0).as("b0"), bandKey(8).as("b1"))
      val a = keyed.select(col("vec_id").as("vec_a"), col("b0"), col("b1"))
      val b = keyed.select(col("vec_id").as("vec_b"), col("b0").as("c0"), col("b1").as("c1"))
      val cand = a.join(b, col("b0") === col("c0") && col("vec_a") < col("vec_b")).select("vec_a", "vec_b")
        .unionByName(
          a.join(b, col("b1") === col("c1") && col("vec_a") < col("vec_b")).select("vec_a", "vec_b"))
        .distinct()
      val dot = aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      val na = sqrt(aggregate(transform(col("va"), x => x * x), lit(0.0), (acc, x) => acc + x))
      val nb = sqrt(aggregate(transform(col("vb"), x => x * x), lit(0.0), (acc, x) => acc + x))
      cand
        .join(e.select(col("vec_id").as("vec_a"), col("v").as("va")), Seq("vec_a"))
        .join(e.select(col("vec_id").as("vec_b"), col("v").as("vb")), Seq("vec_b"))
        .select(col("vec_a"), col("vec_b"), round(dot / (na * nb), 3).as("cos"))
        .filter(col("cos") >= 0.25)
    }),

    // brute-force cosine top-k ANN (baseline; LSH variant in fts tests)
    "td11_ann_topk" -> ((s, d) => {
      val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
      val dot = aggregate(zip_with(col("v"), col("qv"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      val nv = sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0), (acc, x) => acc + x))
      val nq = sqrt(aggregate(transform(col("qv"), x => x * x), lit(0.0), (acc, x) => acc + x))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), round(dot / (nv * nq), 3).as("cos"))
        .orderBy(desc("cos"), asc("vec_id"))
        .limit(20)
    }),

    // LSH-bucketed ANN (scale path): candidates = vectors sharing ≥1 sign
    // band with the query (deterministic axis-aligned hyperplanes — SQL-
    // portable, so the candidate-gated exact top-k is DuckDB-verified),
    // exact cosine re-rank inside the candidate set. The seeded
    // random-plane variant lives in search/Ann.lshTopK with its recall
    // asserted vs exact in ModulesSpec.
    "td13_ann_lsh" -> ((s, d) => {
      val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      def bandKey(v: Column, from: Int): Column = concat((from until from + 8).map(i =>
        when(element_at(v, i + 1) >= 0, "1").otherwise("0")): _*)
      val keyed = e.select(col("vec_id"), col("v"), bandKey(col("v"), 0).as("b0"), bandKey(col("v"), 8).as("b1"))
      val q = keyed.filter(col("vec_id") === 0)
        .select(col("v").as("qv"), col("b0").as("qb0"), col("b1").as("qb1"))
      val cand = keyed.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= 0 && (col("b0") === col("qb0") || col("b1") === col("qb1")))
      val dot = aggregate(zip_with(col("v"), col("qv"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      val nv = sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0), (acc, x) => acc + x))
      val nq = sqrt(aggregate(transform(col("qv"), x => x * x), lit(0.0), (acc, x) => acc + x))
      cand.select(col("vec_id"), round(dot / (nv * nq), 3).as("cos"))
        .orderBy(desc("cos"), asc("vec_id"))
        .limit(20)
    }),

    // IVF-flat ANN (the second scale path next to sign-LSH td13) with a
    // TRAINED coarse quantizer: seeds = vectors 1..8, one deterministic
    // Lloyd refinement (assign to nearest seed → centroid = element-wise
    // cell mean) — the k-means step expressed in SQL-portable relational
    // form so the whole trained-quantizer pipeline is DuckDB-verified.
    // Every vector is then assigned to its nearest trained centroid via a
    // broadcast join, the query probes its 2 nearest cells, exact cosine
    // re-rank inside the probed cells only. (The full seeded k-means++ /
    // multi-iteration trainer is search/Ann.kmeans, recall-tested in
    // ModulesSpec.)
    "td14_ann_ivf" -> ((s, d) => {
      val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      def cosC(a: Column, b: Column): Column = {
        val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
        val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
        val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, x) => acc + x))
        dot / (na * nb)
      }
      val byVec = Window.partitionBy("vec_id").orderBy(desc("cs"), asc("cid"))
      val seeds = e.filter(col("vec_id").between(1, 8))
        .select(col("vec_id").as("cid"), col("v").as("sv"))
      val s0 = e.crossJoin(broadcast(seeds))
        .select(col("vec_id"), col("v"), col("cid"), round(cosC(col("v"), col("sv")), 4).as("cs"))
      val a0 = s0.withColumn("rn", row_number().over(byVec)).filter(col("rn") === 1)
        .select(col("vec_id"), col("v"), col("cid"))
      val dim = 64
      val meanCols = (1 to dim).map(j => avg(element_at(col("v"), j)).as(s"m$j"))
      val cents = a0.groupBy("cid").agg(meanCols.head, meanCols.tail: _*)
        .select(col("cid"), array((1 to dim).map(j => col(s"m$j")): _*).as("cv"))
      val scored = e.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("v"), col("cid"), round(cosC(col("v"), col("cv")), 4).as("cs"))
      val assign = scored.withColumn("rn", row_number().over(byVec))
        .filter(col("rn") === 1).select(col("vec_id"), col("v"), col("cid").as("cell"))
      val probed = scored.filter(col("vec_id") === 0)
        .withColumn("rn", row_number().over(byVec)).filter(col("rn") <= 2)
        .select(col("cid").as("cell"))
      val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
      assign.join(broadcast(probed), Seq("cell"))
        .filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), round(cosC(col("v"), col("qv")), 3).as("cos"))
        .orderBy(desc("cos"), asc("vec_id"))
        .limit(20)
    }),

    // multimodal plumbing: opaque binary payload + typed metadata
    "td12_multimodal_meta" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"), col("source"))
        .select(col("doc_id"),
          octet_length(col("payload")).cast("long").as("byte_len"),
          md5(col("payload")).as("payload_md5"),
          col("source"))),

    // ---- full-text engine over `documents` ----

    // BM25 brute force as a declarative plan, SQL-checkable
    "fts1_bm25_brute" -> ((s, d) => {
      val docTok = t(s, d, "documents").select(col("doc_id"), toks(col("text")).as("tk"))
        .select(col("doc_id"), size(col("tk")).cast("long").as("dl"), col("tk"))
      val stats = docTok.agg(count(lit(1)).as("n"), sum("dl").as("sumdl")).head()
      val n = stats.getAs[Long]("n"); val avgdl = stats.getAs[Long]("sumdl").toDouble / n
      val qterms = Seq("spark", "query", "merge")
      val tf = docTok.select(col("doc_id"), col("dl"), explode(col("tk")).as("term"))
        .filter(col("term").isin(qterms: _*))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val idf = log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5))
      val tfn = col("tf").cast("double") /
        (col("tf").cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / lit(avgdl)))
      tf.join(broadcast(dfc), Seq("term"))
        .select(col("doc_id"), (idf * tfn).as("c"))
        .groupBy("doc_id").agg(round(sum("c"), 4).as("score"))
        .orderBy(desc("score"), asc("doc_id"))
        .limit(50)
    }),

    // term dictionary with dense ids (the engine's stage-3 semantics),
    // expressed through the scalable DenseIds partition-offset plan —
    // NOT a global single-task Window.orderBy (the serial bottleneck the
    // engine's own DenseIds exists to avoid).
    "fts2_term_dict" -> ((s, d) => {
      val tf = t(s, d, "documents")
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val stats = tf.groupBy("term")
        .agg(count(lit(1)).as("df"), sum("tf").as("cf"))
      graft.index.DenseIds.assign(stats, Seq("term"), "term_id", 8)
        .df.select("term", "term_id", "df", "cf")
    }),

    // the real engine end-to-end: index build + block-max WAND top-k,
    // joined back to document identity so the DuckDB brute-force BM25
    // oracle (same plan as fts1, k=50) verifies rows+schema+hash. Scores
    // are rounded to 4dp (cross-engine last-ulp ln() noise); rank/score
    // bit-identity vs the Spark brute-force oracle is additionally
    // asserted in the ScalaTest suite.
    "fts3_wand" -> ((s, d) => {
      import s.implicits._
      // constant repo + zero-padded doc_id path ⇒ dense docId order equals
      // doc_id order, so the engine's (score desc, docId asc) tie-break
      // matches the oracle's (score desc, doc_id asc) exactly
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val searcher = new Searcher(s, idxDir)
      val hits = searcher.search("spark query merge", 50).toSeq.toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // segmented engine end-to-end: two disjoint ingests → multi-segment
    // WAND with exact global stats. Same oracle as fts3 — the segmented
    // result must equal a fresh single build (the SegmentedIndex
    // invariant), which the DuckDB brute-force plan independently checks.
    "fts4_segmented" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-fts4-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, dir, cfg) {
        val seg = new graft.index.SegmentedIndex(s, dir, cfg)
        seg.ingest(corpus.filter(col("path").cast("bigint") % 2 === 0))
        seg.ingest(corpus.filter(col("path").cast("bigint") % 2 === 1))
      }
      new graft.search.MultiSearcher(s, dir).search("spark query merge", 50).toSeq
        .toDF("repo", "path", "commit", "score_raw")
        .select(col("path").cast("bigint").as("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // exact-phrase engine query: positions index + conjunctive position-
    // verified kernel; phrase candidates scored by the BM25 sum over the
    // phrase's distinct terms (documented semantic, oracle-gated on
    // adjacency in DuckDB)
    "fts5_phrase" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts5-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12,
        buildBuckets = 2, storePositions = true)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir).search("\"data merge\"", 50).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // mixed phrase + loose-term query: the phrase stays required (position-
    // verified conjunction), the loose term is an optional scored extra on
    // phrase-matching documents (ES must-phrase + should-term semantics).
    // Shares fts5's cached positions index — same corpus, same config.
    "fts6_phrase_mixed" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts5-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12,
        buildBuckets = 2, storePositions = true)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir).search("\"data merge\" spark", 50).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // negated term (`-merge`, ES must_not): docs containing the excluded
    // term are rejected from candidacy; N/avgdl/df stay index-wide, so the
    // surviving docs' scores are unchanged. Shares fts3's cached index.
    "fts7_negation" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir).search("spark query -merge", 50).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // prefix pattern (`s*`, ES prefix query with the scoring_boolean
    // rewrite): every dictionary term matching the stem becomes an ordinary
    // scored term with its own idf. Shares fts3's cached index.
    "fts8_prefix" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir).search("s* merge", 50).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // negated keyword filter (`-lang:en`, ES must_not term filter): docs
    // with the filtered value are rejected via the filter term's postings;
    // scores of survivors are untouched. Shares fts3's cached index.
    "fts9_neg_filter" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir).search("spark query -lang:en", 50).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // fuzzy pattern (`merge~1`, ES fuzzy query with the scoring_boolean
    // rewrite): every dictionary term within the Levenshtein bound becomes
    // an ordinary scored term with its own idf. Shares fts3's cached index.
    "fts10_fuzzy" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir).search("merge~1 query", 50).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // query-time boost (`spark^2`, the ES boost): the boosted term's
    // contribution (idf×tfNorm) is scaled ×2; global stats untouched.
    // Shares fts3's cached index.
    "fts11_boost" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir).search("spark^2 query merge", 50).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // numeric range filter (`n_chars:>=300`, the ES `range` query in FILTER
    // context over a stored doc_values column — the reference exports xpos
    // as an int64 for exactly this, variant_id.py:86-91): candidates are
    // gated by a docs-relation scan with the predicate pushed into the
    // columnar read; global stats (N, avgdl, df) untouched, so surviving
    // docs keep their unfiltered BM25 scores. Own cached index — the range
    // column rides the docs relation as a stored-only (disable_index) field.
    "fts12_range" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("n_chars"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts12-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang"), storedOnly = Seq("n_chars")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir).search("spark query merge n_chars:>=300", 50).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // facet counts (the ES `terms` aggregation in query context): for every
    // value of a stored column, how many documents match the bool query —
    // the FULL match set (≥1 scored term), not top-k. Shares fts3's cached
    // index; the match kernel streams per-shard, the count aggregates
    // distributed with partial aggregation.
    "fts13_facets" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      new Searcher(s, idxDir).facets("spark query merge", "lang", 10).toSeq
        .toDF("value", "cnt")
    }),

    // ES `_count` in query context: how many documents match the bool query
    // (≥1 scored term + keyword filter) — the full match set via the
    // match-only kernels, no scoring, no top-k heap. Shares fts3's index.
    "fts14_count" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      Seq(new Searcher(s, idxDir).count("spark query merge lang:scala")).toDF("cnt")
    }),

    // ES `stats` aggregation in query context over a stored numeric column
    // (doc_values): one row (cnt, mn, mx, sm, av) over the match set.
    // Shares fts12's index (n_chars stored).
    "fts15_stats" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("n_chars"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts12-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang"), storedOnly = Seq("n_chars")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      new Searcher(s, idxDir).statsAgg("spark query merge", "n_chars")
        .select(col("cnt"), col("mn"), col("mx"), col("sm"), round(col("av"), 4).as("av"))
    }),

    // ES `histogram` aggregation in query context: fixed-interval buckets
    // over the match set's field values (min_doc_count 1). Shares fts12's
    // index.
    "fts16_histogram" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("n_chars"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts12-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang"), storedOnly = Seq("n_chars")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      new Searcher(s, idxDir).histogram("spark query merge", "n_chars", 100.0)
    }),

    // ES sort-by-field (doc_values sort, missing last): the match set
    // ordered by a stored numeric column instead of relevance; ties break
    // docId asc = doc_id asc by construction. Shares fts12's index.
    "fts17_sortby" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("n_chars"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts12-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang"), storedOnly = Seq("n_chars")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir)
        .searchSortedBy("spark query merge", "n_chars", ascending = false, 50)
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), col("n_chars"))
    }),

    // ES `minimum_should_match`: a doc needs ≥2 distinct scored terms to
    // match — WAND prunes as usual (rejecting candidates never loosens the
    // bounds). Shares fts3's index.
    "fts18_msm" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir)
        .search("spark query merge index stream", 50, minShouldMatch = 2).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES pagination (`from`/`size`): hits ranked [10, 30) of the same total
    // order as fts3's query — the engine computes the top from+k and drops
    // the prefix, exactly the ES per-shard rule. Shares fts3's index.
    "fts19_from" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir).search("spark query merge", 20, from = 10).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES filter-context-only bool query (constant score): no scoring clause
    // at all — every filter+range-passing doc matches with score 0, ordered
    // docId asc (= _doc). Shares fts12's index.
    "fts20_filter_only" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("n_chars"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts12-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang"), storedOnly = Seq("n_chars")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir).search("lang:scala n_chars:>=300", 50).toSeq
        .toDF("docId", "score")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), col("score"))
    }),

    // ES `search_after` deep pagination: page 2 is everything STRICTLY
    // after page 1's last (score, docId) cursor in the one total order —
    // one k-heap per page regardless of depth, unlike from/size's
    // O(from+k) heap (ES caps from+size at 10k for exactly this reason).
    // Shares fts3's index; equals ranks [10, 20) of the fts3 order.
    "fts21_search_after" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val searcher = new Searcher(s, idxDir)
      val page1 = searcher.search("spark query merge", 10)
      val hits = searcher.search("spark query merge", 10, after = page1.last).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES scroll / reindex-export: the query's FULL match set as a
    // DataFrame of stored fields — fully distributed, never collected to
    // the driver (a downstream pipeline writes it straight back out).
    // Shares fts12's index (lang keyword + n_chars stored).
    "fts22_scan" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("n_chars"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts12-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang"), storedOnly = Seq("n_chars")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      new Searcher(s, idxDir).scan("spark query merge", Seq("path", "lang", "n_chars"))
        .select(col("path").cast("bigint").as("doc_id"), col("lang"), col("n_chars"))
        .orderBy(asc("doc_id"))
    }),

    // ES `terms` aggregation with a `stats` SUB-aggregation: per lang over
    // the match set, doc count + min/max/sum/avg of n_chars — buckets
    // ordered (count desc, value asc), the ES terms-agg order. Shares
    // fts12's index.
    "fts23_facet_stats" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("n_chars"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts12-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang"), storedOnly = Seq("n_chars")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      new Searcher(s, idxDir).facetsStats("spark query merge", "lang", "n_chars", 10)
        .select(col("value"), col("cnt"), col("mn"), col("mx"), col("sm"),
          round(col("av"), 4).as("av"))
    }),

    // ES `range` aggregation: explicit half-open buckets (-inf,200),
    // [200,400), [400,800), [800,inf) over the match set's n_chars — every
    // bucket present even when empty (the ES range-agg contract). Shares
    // fts12's index.
    "fts24_range_agg" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("n_chars"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts12-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang"), storedOnly = Seq("n_chars")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      new Searcher(s, idxDir).rangeAgg("spark query merge", "n_chars", Seq(200.0, 400.0, 800.0))
    }),

    // ES `cardinality` aggregation (exact mode — the DuckDB-comparable
    // form; the HLL++ approx mode is the scale shape, recall-tested in
    // ScalaTest): distinct langs over the match set. Shares fts12's index.
    "fts25_cardinality" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("n_chars"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts12-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang"), storedOnly = Seq("n_chars")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      Seq(new Searcher(s, idxDir).cardinality("spark query merge", "lang", exact = true))
        .toDF("cnt")
    }),

    // ES `highlight` (plain-highlighter semantics): one snippet per top-k
    // hit — a 3-token window each side of the FIRST occurrence of any query
    // term, matched tokens wrapped <em>…</em>; only the k hits' stored
    // content is re-analyzed (k-bounded, pure Column builtins). Shares
    // fts3's index.
    "fts26_highlight" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hl = new Searcher(s, idxDir).highlight("spark query merge", 20, corpus, window = 3)
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hl), Seq("docId"))
        .select(col("doc_id"), round(col("score"), 4).as("score"), col("snippet"))
    }),

    // ES `significant_terms` aggregation: content terms anomalously frequent
    // in the match set vs the whole index, JLH-scored — the one postings-
    // by-document read, decoded from a 3-column pruned scan of the blocks
    // relation and joined to the match set before any shuffle. Shares
    // fts3's index.
    "fts27_sig_terms" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      new Searcher(s, idxDir).significantTerms("spark query merge", 15, minDocCount = 3)
        .select(col("term"), col("fg"), col("bg"), round(col("score"), 4).as("score"))
    }),

    // ES `more_like_this`: doc 7's text re-analyzed, its top-10 terms by
    // tf(text)·idf(index) (min_term_freq 2, min_doc_freq 5) run as an
    // ordinary disjunctive BM25 query, the source doc itself excluded
    // (candidates only — statistics untouched). Shares fts3's index.
    "fts28_mlt" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val docs = s.read.parquet(s"$idxDir/docs")
      val srcId = docs.filter(col("path") === "00000007").select("docId").head().getLong(0)
      val likeText = t(s, d, "documents").filter(col("doc_id") === 7)
        .select("text").head().getString(0)
      val hits = new Searcher(s, idxDir)
        .moreLikeThis(likeText, 15, maxQueryTerms = 10, minTermFreq = 2, minDocFreq = 5,
          excludeDocIds = Set(srcId)).toSeq
        .toDF("docId", "score_raw")
      docs.select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES `wildcard` query (`s*am`, `*ow` — scoring_boolean rewrite): each
    // dictionary term matching a pattern becomes an ordinary scored term
    // with its own idf. Shares fts3's cached index.
    "fts29_wildcard" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir).search("s*am *ow", 50).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES `regexp` query (`/s(ort|can)/` — anchored full-term match,
    // scoring_boolean rewrite) mixed with a plain term. Shares fts3's
    // cached index.
    "fts30_regexp" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir).search("/s(ort|can)/ key", 50).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES `top_hits` inside a `terms` aggregation: top-3 lang buckets by
    // match count, each with its 2 best hits by BM25 (exhaustive scored
    // match set — no global-k pruning is admissible). Shares fts12's index.
    "fts31_top_hits" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("n_chars"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts12-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang"), storedOnly = Seq("n_chars")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val th = new Searcher(s, idxDir).topHits("merge query", "lang", 3, 2)
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(th, Seq("docId"))
        .select(col("value"), col("cnt"), col("rank").as("rk"), col("doc_id"),
          round(col("score"), 4).as("score"))
    }),

    // ES `percentiles` aggregation in query context (exact / quantile_cont
    // convention for oracle parity; production default is t-digest
    // approx_percentile). Shares fts12's index.
    "fts32_percentiles" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("n_chars"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts12-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang"), storedOnly = Seq("n_chars")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      new Searcher(s, idxDir)
        .percentilesAgg("spark query merge", "n_chars", Seq(0.25, 0.5, 0.9), exact = true)
        .select(col("p"), round(col("value"), 4).as("value"))
    }),

    // ES term suggester ("did you mean"): per misspelled token, dictionary
    // candidates within edit distance 2, ranked (distance asc, df desc,
    // term asc), top 3. Shares fts3's index.
    "fts33_suggest" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      new Searcher(s, idxDir).suggest("mrege quary window", topN = 3)
        .toDF("token", "suggestion", "df", "dist")
    }),

    // ES match_phrase with slop (`"data merge"~2` — in-order span: the
    // phrase terms at strictly increasing positions with total span ≤
    // exact + 2). Matches a superset of fts5's exact phrase; scored by
    // the same BM25 sum over the phrase's distinct terms. Shares fts5's
    // cached positions index.
    "fts34_phrase_slop" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts5-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12,
        buildBuckets = 2, storePositions = true)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir).search("\"data merge\"~2", 50).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES `collapse`: the best hit per lang (score desc, id asc within the
    // group), then the global top-10 of the group heads — search-result
    // dedup by field. Shares fts12's cached index (lang keyword field).
    "fts35_collapse" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("n_chars"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts12-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang"), storedOnly = Seq("n_chars")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val cl = new Searcher(s, idxDir).collapse("merge query", "lang", 10)
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(cl, Seq("docId"))
        .select(col("doc_id"), col("value"), round(col("score"), 4).as("score"))
    }),

    // ES `date_histogram` (calendar month) in query context over a stored
    // date column (derived deterministically from doc_id on BOTH engines).
    "fts36_date_hist" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"),
        date_add(to_date(lit("2021-01-01")), (col("doc_id") % 500).cast("int")).as("mdate"),
        col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts36-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang"), storedOnly = Seq("mdate")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      new Searcher(s, idxDir).dateHistogram("merge query", "mdate", "month")
    }),

    // ES `_explain` for the top-10 hits: per contributing term the BM25
    // pieces (tf, df, idf, contribution) plus the hit's total score —
    // the pieces sum to the score bit-exactly. Shares fts3's cached index.
    "fts37_explain" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val ex = new Searcher(s, idxDir).explainHits("spark query merge", 10)
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(ex, Seq("docId"))
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          round(col("idf"), 4).as("idf"),
          round(col("contribution"), 4).as("contribution"),
          round(col("score"), 4).as("score"))
    }),

    // ES `dis_max` (tie_breaker 0.3): a doc scores its best single term
    // contribution + 0.3 × the rest — alternative-phrasing semantics
    // instead of the bool sum. Shares fts3's cached index.
    "fts38_dis_max" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir)
        .searchDisMax("spark query merge", 50, tieBreaker = 0.3).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES `function_score` with field_value_factor(n_chars, factor 0.001,
    // modifier log1p, boost_mode multiply): relevance × a document-quality
    // signal. Shares fts12's cached index (n_chars stored).
    "fts39_function_score" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("n_chars"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts12-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang"), storedOnly = Seq("n_chars")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val fs = new Searcher(s, idxDir).functionScore("merge query", "n_chars", 50,
        factor = 0.001, modifier = "log1p", boostMode = "multiply")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(fs, Seq("docId"))
        .select(col("doc_id"), round(col("score"), 4).as("score"))
    }),

    // ES `rescore`: top-30 window of 'merge query' re-ranked by adding
    // 2 × the BM25 score of 'spark' (score_mode total), best 15 returned.
    // Shares fts3's cached index.
    "fts40_rescore" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir)
        .rescore("merge query", "spark", window = 30, k = 15,
          rescoreWeight = 2.0, scoreMode = "total").toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES `extended_stats` aggregation in query context over n_chars:
    // count/min/max/sum/avg + sum_of_squares and POPULATION variance/
    // stddev (the ES convention). Shares fts12's cached index.
    "fts41_extended_stats" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("n_chars"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts12-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang"), storedOnly = Seq("n_chars")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      new Searcher(s, idxDir).extendedStatsAgg("spark query merge", "n_chars")
        .select(col("cnt"), col("mn"), col("mx"), col("sm"),
          round(col("av"), 4).as("av"), col("sum_sq"),
          round(col("variance"), 2).as("variance"),
          round(col("std_dev"), 4).as("std_dev"))
    }),

    // ES `exists` query (`exists:opt_tag` — field-presence filter over a
    // stored column that is null for 2/3 of the docs). Candidates only,
    // statistics untouched (filter context). Own index: needs the
    // nullable stored column.
    "fts42_exists" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"),
        when(col("doc_id") % 3 === 0,
          concat(lit("t"), (col("doc_id") % 7).cast("string"))).as("opt_tag"),
        col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts42-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang"), storedOnly = Seq("opt_tag")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir).search("merge query exists:opt_tag", 50).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES completion suggester: dictionary terms with prefix 's', ranked
    // df desc then term asc, top 5. Shares fts3's cached index.
    "fts43_completion" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      new Searcher(s, idxDir).suggestCompletion("s", 5).toDF("term", "df")
    }),

    // ES query-time synonyms (synonym_graph, expand=true): 'sort merge'
    // with sort→order also scores 'order' as a should-term with its own
    // idf. Shares fts3's cached index.
    "fts44_synonyms" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val q = Searcher.expandSynonyms("sort merge", Map("sort" -> Seq("order")))
      val hits = new Searcher(s, idxDir).search(q, 50).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES `boosting` query: 'merge query' hits, demoted ×0.4 when the doc
    // also matches 'spark' — demotion without exclusion. Shares fts3's
    // cached index.
    "fts45_boosting" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir)
        .searchBoosting("merge query", "spark", 50, negativeBoost = 0.4).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES GET by _id: one document's stored fields fetched by identity key
    // (the reference's es.mapping.id = docId contract). Shares fts3's
    // cached index.
    "fts46_get" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      // identity of doc_id 42 (repo, path, commit) — the ES _id
      val key = corpus.filter(col("path") === lpad(lit("42"), 8, "0"))
        .select("repo", "path", "commit").collect()(0)
      val row = new Searcher(s, idxDir)
        .getDoc(key.getString(0), key.getString(1), key.getString(2))
        .getOrElse(throw new IllegalStateException("doc 42 missing from index"))
      Seq((row.getAs[String]("path").toLong, row.getAs[String]("lang")))
        .toDF("doc_id", "lang")
    }),

    // ES `_mget`: stored fields for a batch of identity keys in ONE
    // column-pruned scan (vs one point read per id). Shares fts3's
    // cached index.
    "fts47_mget" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val keys = corpus
        .filter(col("path").isin(Seq(7L, 42L, 99L).map(i => f"$i%08d"): _*))
        .select("repo", "path", "commit").as[(String, String, String)].collect().toSeq
      new Searcher(s, idxDir).mget(keys)
        .select(col("path").cast("bigint").as("doc_id"), col("lang"), col("dl"))
    }),

    // ES `ids` query in bool filter context: BM25 scoring restricted to an
    // identity key set (candidates only — statistics index-wide). Shares
    // fts3's cached index.
    "fts48_ids" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val keys = corpus.filter(col("path").cast("bigint") % 5 === 0)
        .select("repo", "path", "commit").as[(String, String, String)].collect().toSeq
      val hits = new Searcher(s, idxDir).search("merge query", 20, withinIds = keys).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES `update_by_query`: patch a stored field on every document
    // matching 'merge' (the painless ctx._source analogue — the new value
    // is computed from an existing stored field). Own index (mutated);
    // the patch is idempotent, so the cached index stays valid across
    // harness invocations.
    "fts49_update_by_query" -> ((s, d) => {
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts49-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      graft.index.IndexMaintenance.updateByQuery(s, idxDir, "merge",
        Map("tag" -> concat(lit("hit-"), col("lang"))))
      new Searcher(s, idxDir).scan("")
        .select(col("path").cast("bigint").as("doc_id"), col("tag"))
    }),

    // ES `delete_by_query`: physically purge every 'lang:de' document,
    // then report the measured index statistics — after the purge the
    // index must be logically identical to a fresh build over the
    // survivors (N, terms, postings, avgdl all recomputed). Own index
    // (mutated); a second invocation matches nothing (no-op).
    "fts50_delete_by_query" -> ((s, d) => {
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts50-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      graft.index.IndexMaintenance.deleteByQuery(s, idxDir, "lang:de", cfg)
      new Searcher(s, idxDir).indexStats()
        .select(col("num_docs"), col("num_terms"), col("num_postings"),
          col("sum_dl"), round(col("avg_dl"), 4).as("avg_dl"))
    }),

    // ES `_reindex`: build a NEW index from the 'lang:fr' match set of
    // fts3's index, re-reading matched docs from the source corpus with
    // the sha256 lineage gate; BM25 stats (N, df, avgdl) recompute over
    // the subset — scores match a brute-force oracle over ONLY fr docs.
    "fts51_reindex" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val srcDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val dstDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts51-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, srcDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, srcDir, resume = false)
      }
      cachedIndex(corpus, dstDir, cfg) {
        graft.index.Reindex.reindex(s, srcDir, corpus, dstDir, "lang:fr", cfg); ()
      }
      val hits = new Searcher(s, dstDir).search("spark query", 20).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$dstDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES `composite` aggregation (terms source): page 2 of the lang
    // buckets over the 'merge' match set — size 2, after_key 'en'
    // (exclusive), keys ordered asc. Shares fts3's cached index.
    "fts52_composite" -> ((s, d) => {
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      new Searcher(s, idxDir).compositeAgg("merge", "lang", 2, Some("en"))
    }),

    // ES `filters` aggregation: three named buckets — a scored-term match
    // set, a keyword-filter match set, and a no-match bucket that must
    // still appear at count 0 — computed as ONE tagged-union action.
    // Shares fts3's cached index.
    "fts53_filters_agg" -> ((s, d) => {
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      new Searcher(s, idxDir).filtersAgg(Seq(
        "b_es" -> "lang:es", "b_merge" -> "merge", "b_none" -> "zzzqqqxxx"))
    }),

    // ES multi-field sort: the 'spark' match set ordered (lang asc,
    // n_chars desc, identity asc) — no scoring work at all. Shares
    // fts12's cached index (keyword lang, stored n_chars).
    "fts54_sort_multi" -> ((s, d) => {
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("n_chars"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts12-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang"), storedOnly = Seq("n_chars")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val res = new Searcher(s, idxDir)
        .searchSortedByFields("spark", Seq("lang" -> true, "n_chars" -> false), 20)
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(res), Seq("docId"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
    }),

    // ES `_stats`: index-level statistics MEASURED from the index
    // relations (and cross-checked against meta inside the engine) —
    // the oracle recomputes docs/terms/postings/dl from the raw corpus,
    // so this row is a standing dictionary/postings integrity gate.
    // Shares fts3's cached index (keyword fields lang + repo).
    "fts55_index_stats" -> ((s, d) => {
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      new Searcher(s, idxDir).indexStats()
        .select(col("num_docs"), col("num_terms"), col("num_postings"),
          col("sum_dl"), round(col("avg_dl"), 4).as("avg_dl"))
    }),

    // ES `multi_match` (type: best_fields, tie_breaker 0.3): one query
    // scored over TWO analyzed fields — content and a short derived
    // `title` field (boosted ×2) — with EXACT per-field BM25: the tagged
    // `title:token` postings carry the title's own length, and the
    // `title:` marker's dictionary row carries the field's docCount /
    // token total (per-field idf + avgdl). Own cached index (multi-field
    // mapping).
    "fts56_multi_match_best" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), concat_ws(" ", col("source"), col("lang")).as("title"),
        col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts56-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(analyzed = Seq("title")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir)
        .multiMatch("merge src3 query", Seq("content", "title^2"), 20, "best_fields", 0.3)
        .toSeq.toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES `multi_match` (type: most_fields): per-field BM25 sums added
    // across fields, restricted by a keyword filter — shares fts56's
    // cached multi-field index.
    "fts57_multi_match_most" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), concat_ws(" ", col("source"), col("lang")).as("title"),
        col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts56-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(analyzed = Seq("title")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir)
        .multiMatch("es merge lang:es", Seq("content", "title"), 20, "most_fields")
        .toSeq.toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES `_analyze`: the index analyzer's (position, token) stream for a
    // document's text — the codegen'd Column form of the code-aware
    // tokenizer inlined into the scan plan (no UDF), the same stream dl
    // counts and positions index. Needs no index at all, as in ES's
    // analyzer-only `_analyze` calls.
    "fts58_analyze" -> ((s, d) =>
      t(s, d, "documents").filter(col("doc_id") === 42)
        .select(posexplode(graft.analysis.Analyzer.analyze(col("text")))
          .as(Seq("pos", "token")))
        .select(col("pos").cast("bigint").as("position"), col("token"))),

    // ES `match_phrase_prefix` (search-as-you-type): exact phrase with a
    // trailing prefix — 'data s*' expands the stem against the dictionary
    // (≤50, lexicographic — the ES cap) and a doc scores its best matching
    // variant; ONE batched kernel pass for the whole variant set. Shares
    // fts5's cached positions index.
    "fts59_phrase_prefix" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts5-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12,
        buildBuckets = 2, storePositions = true)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir).matchPhrasePrefix("data s", 20, maxExpansions = 50)
        .toSeq.toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES `_termvectors` (term_statistics=true): doc 42's content term
    // vector — per term its tf plus index-wide df/cf from the dictionary;
    // the by-document read over the by-term layout, bounded to the owning
    // shard's blocks. Shares fts3's cached index.
    "fts60_termvectors" -> ((s, d) => {
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts3-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val key = corpus.filter(col("path") === f"${42}%08d")
        .select("repo", "path", "commit").head()
      new Searcher(s, idxDir)
        .termVectors(key.getString(0), key.getString(1), key.getString(2))
    }),

    // ES `match_phrase` on an ANALYZED EXTRA FIELD: the span must occur in
    // the `title` field's own token stream (tagged postings store
    // within-field positions), scored with the FIELD's BM25 statistics
    // (marker docCount, field avgdl, per-doc field length). Own cached
    // index (multi-field mapping + positions).
    "fts61_phrase_field" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"),
        concat_ws(" ", col("source"), col("lang"), substring(col("text"), 1, 20)).as("title"),
        col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts61-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        storePositions = true, fields = graft.index.FieldConfig(analyzed = Seq("title")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir).matchPhraseField("title", "src3 de", 20)
        .toSeq.toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES `multi_match` (type: cross_fields, tie_breaker 0.2): the fields
    // scored as ONE blended field — per-token df blended (max across
    // fields), idf against the index docCount, per-token field scores
    // combined dis_max-style, tokens summed (the Lucene BlendedTermQuery
    // shape). Shares fts56's cached multi-field index.
    "fts62_multi_match_cross" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), concat_ws(" ", col("source"), col("lang")).as("title"),
        col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts56-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(analyzed = Seq("title")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir)
        .multiMatch("merge src3", Seq("content", "title"), 20, "cross_fields", 0.2)
        .toSeq.toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES `_cat/shards`: per-shard docs / postings / encoded blocks /
    // content-token totals MEASURED from the index relations; the oracle
    // recomputes them — including the ⌈postings/blockSize⌉ packing
    // invariant per (term, shard) — from the raw corpus, a standing gate
    // on the pack stage's on-disk layout. Own small-shard index
    // (docsPerShard 128 → 4 real shards; dense docIds = doc_id order).
    "fts63_shard_stats" -> ((s, d) => {
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts63-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 128L, buildBuckets = 2)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      new Searcher(s, idxDir).shardStats()
    }),

    // ES keyword ARRAY field (the reference's tarray(tstr)→keyword
    // mapping — per-sample/tag lists, `elasticsearch_utils.py:70-121`):
    // an array<string> keyword column emits one `field:value` filter term
    // per DISTINCT element, so `tags:v` is ES `term` on an array field —
    // matches every doc whose list CONTAINS v; scoring/stats untouched.
    // Own cached index (array-keyword mapping).
    "fts64_keyword_array" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), array(col("lang"), col("source")).as("tags"),
        col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts64-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang", "repo", "tags")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir).search("merge tags:src3", 20).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES `terms` aggregation on an ARRAY field: each matching document
    // counts once per DISTINCT element of its list (the ES array-bucketing
    // rule), buckets ordered (count desc, value asc). Shares fts64's
    // cached array-keyword index.
    "fts65_facets_array" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), array(col("lang"), col("source")).as("tags"),
        col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts64-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang", "repo", "tags")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      new Searcher(s, idxDir).facets("merge", "tags", 10).toSeq.toDF("value", "cnt")
    }),

    // ES `nested` field (the reference's tarray(tstruct)→nested mapping,
    // `elasticsearch_utils.py:55-59`): an array<struct> column where a
    // nested query's clauses must hit the SAME element (Lucene block-join
    // semantics) — here symbols = [(first token, lang), (third token,
    // source)], so clauses (name=the, kind=en) match only docs whose
    // FIRST token is 'the' AND lang='en' together, never cross-element.
    // Two-phase engine plan: `symbols.sub:value` candidate postings →
    // same-element verify on the stored column → scored WAND over the
    // verified accept set. Own cached index.
    "fts66_nested" -> ((s, d) => {
      import s.implicits._
      val tk = filter(split(lower(col("text")), "[^a-z0-9]+"), x => length(x) > 0)
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"),
        array(
          struct(try_element_at(tk, lit(1)).as("name"), col("lang").as("kind")),
          struct(try_element_at(tk, lit(3)).as("name"), col("source").as("kind")))
          .as("symbols"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts66-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang", "repo"),
          nested = Seq("symbols")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir)
        .searchNested("merge", "symbols", Seq("name" -> "the", "kind" -> "en"), 20)
        .toSeq.toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES `nested` terms aggregation: the bucket unit is the nested ELEMENT
    // (Lucene's hidden child doc) — every element of every query-matching
    // parent counts once, null sub-values skipped. Shares fts66's cached
    // nested index.
    "fts67_nested_agg" -> ((s, d) => {
      import s.implicits._
      val tk = filter(split(lower(col("text")), "[^a-z0-9]+"), x => length(x) > 0)
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"),
        array(
          struct(try_element_at(tk, lit(1)).as("name"), col("lang").as("kind")),
          struct(try_element_at(tk, lit(3)).as("name"), col("source").as("kind")))
          .as("symbols"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts66-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang", "repo"),
          nested = Seq("symbols")))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      new Searcher(s, idxDir).nestedFacets("merge", "symbols", "name", 10)
        .toSeq.toDF("value", "cnt")
    }),

    // Lucene/ES `span_near(inOrder=false)`: both terms within a window of
    // ≤3 extra positions in EITHER order (the ordered variant is exactly
    // the slop-phrase, fts34) — verified on decoded positions by the same
    // conjunctive kernel, scored as the distinct-term BM25 sum. Shares the
    // fts5 positions index.
    "fts68_span_near" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts5-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12,
        buildBuckets = 2, storePositions = true)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir)
        .searchSpanNear(Seq("data", "merge"), 3, inOrder = false, 50).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // Lucene/ES `span_first`: the term must occur within the FIRST 20
    // positions of the token stream ("matches near the start of the
    // field"); scoring is the term's ordinary BM25 (full tf — the span
    // only gates the match). Shares the fts5 positions index.
    "fts69_span_first" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts5-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12,
        buildBuckets = 2, storePositions = true)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir)
        .searchSpanFirst(Seq("data"), 20, 50).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES 8 `knn` with pre-filter: exact cosine top-k over the stored
    // dense_vector column, restricted to `lang:en` BEFORE ranking (the k
    // nearest among filter-passing docs — never an underfilled k). The
    // index stores the vectors + a 8-cell IVF quantizer (exercised by
    // fts71). Own cached index over documents⋈embeddings.
    "fts70_knn" -> ((s, d) => {
      import s.implicits._
      val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val corpus = t(s, d, "documents")
        .join(emb, col("doc_id") === col("vec_id"))
        .select(
          lit("docs").as("repo"),
          lpad(col("doc_id").cast("string"), 8, "0").as("path"),
          md5(col("text")).as("commit"),
          col("lang"), col("text").as("content"), col("embedding"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts70-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang", "repo"),
          denseVector = Seq("embedding")),
        ivfCells = 8, hnswM = 8, hnswEfConstruction = 60)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val q: Array[Float] = t(s, d, "embeddings").filter(col("vec_id") === 0)
        .select("embedding").as[Array[Float]].head()
      val hits = new Searcher(s, idxDir).knn("embedding", q, 20, filter = "lang:en")
        .toSeq.toDF("docId", "cos_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("cos_raw"), 3).as("cos"))
    }),

    // IVF pruning path end-to-end (cell assignment → probed-cell isin
    // pushdown → exact re-rank): probing ALL cells is provably exact, so
    // the DuckDB oracle is the plain exact top-k — the equivalence the
    // KnnSpec nprobe tests rely on, verified here against a second engine.
    // Shares fts70's cached index.
    "fts71_knn_ivf" -> ((s, d) => {
      import s.implicits._
      val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val corpus = t(s, d, "documents")
        .join(emb, col("doc_id") === col("vec_id"))
        .select(
          lit("docs").as("repo"),
          lpad(col("doc_id").cast("string"), 8, "0").as("path"),
          md5(col("text")).as("commit"),
          col("lang"), col("text").as("content"), col("embedding"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts70-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang", "repo"),
          denseVector = Seq("embedding")),
        ivfCells = 8, hnswM = 8, hnswEfConstruction = 60)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val q: Array[Float] = t(s, d, "embeddings").filter(col("vec_id") === 7)
        .select("embedding").as[Array[Float]].head()
      val hits = new Searcher(s, idxDir).knn("embedding", q, 15, nprobe = 8)
        .toSeq.toDF("docId", "cos_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("cos_raw"), 3).as("cos"))
    }),

    // ES `percolate` (reverse search / saved-search alerting): registered
    // queries are broadcast and every document is matched in ONE narrow
    // pass — no index, no shuffle. Query semantics are the engine's bool
    // query context (should terms, must phrase, keyword filter, must_not),
    // with patterns expanded against the document's own token set.
    "fts72_percolate" -> ((s, d) => {
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val perc = new graft.search.Percolator(Seq(
        "q_merge_data" -> "\"data merge\"",
        "q_batch" -> "batch lang:en",
        "q_noindex" -> "query -index"))
      perc.percolate(corpus)
        .select(col("path").cast("bigint").as("doc_id"), col("query_id"))
    }),

    // ES hybrid search — the 8.8 `rrf` retriever: BM25 ranking ∪ kNN
    // ranking fused by RECIPROCAL RANK, score(d) = Σ 1/(60 + rank_d) over
    // the top-`window` of each branch — no score calibration across the
    // incomparable scales. The oracle reproduces both rankings (identical
    // tie-breaks) and the fusion arithmetic. Shares fts70's cached index.
    "fts73_hybrid_rrf" -> ((s, d) => {
      import s.implicits._
      val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val corpus = t(s, d, "documents")
        .join(emb, col("doc_id") === col("vec_id"))
        .select(
          lit("docs").as("repo"),
          lpad(col("doc_id").cast("string"), 8, "0").as("path"),
          md5(col("text")).as("commit"),
          col("lang"), col("text").as("content"), col("embedding"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts70-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang", "repo"),
          denseVector = Seq("embedding")),
        ivfCells = 8, hnswM = 8, hnswEfConstruction = 60)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val q: Array[Float] = t(s, d, "embeddings").filter(col("vec_id") === 0)
        .select("embedding").as[Array[Float]].head()
      val hits = new Searcher(s, idxDir)
        .hybridRrf("merge", "embedding", q, 15, windowSize = 50)
        .toSeq.toDF("docId", "rrf_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("rrf_raw"), 6).as("rrf"))
    }),

    // ES/Lucene match_phrase with PHRASE-FREQUENCY scoring: the phrase
    // scores idfSum × tfNorm(phraseFreq, dl, avgdl) — occurrence count
    // through the BM25 tf-norm, the real ES ranking for match_phrase
    // (closes the engine's documented distinct-term departure behind the
    // default of the dedicated matchPhrase API). Shares fts5's cached
    // positions index. Oracle counts occurrences positionally in DuckDB.
    "fts74_phrase_lucene" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts5-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12,
        buildBuckets = 2, storePositions = true)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir).matchPhrase("data merge", 50).toSeq
        .toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // ES 8 `knn` over the index-time PER-SHARD HNSW GRAPHS (the Lucene
    // dense_vector structure; closes the round-3 "HNSW" gap): graph walk
    // per shard with an EXHAUSTIVE beam (ef ≥ corpus — the graph is
    // connected by construction, so the walk provably reaches every node
    // and the result equals exact cosine top-k, which DuckDB verifies);
    // bounded-ef behavior and recall are asserted engine-side in KnnSpec
    // (recall@10 ≥ 0.95 on 100k vectors). Shares fts70's cached index.
    "fts76_knn_hnsw" -> ((s, d) => {
      import s.implicits._
      val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val corpus = t(s, d, "documents")
        .join(emb, col("doc_id") === col("vec_id"))
        .select(
          lit("docs").as("repo"),
          lpad(col("doc_id").cast("string"), 8, "0").as("path"),
          md5(col("text")).as("commit"),
          col("lang"), col("text").as("content"), col("embedding"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts70-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang", "repo"),
          denseVector = Seq("embedding")),
        ivfCells = 8, hnswM = 8, hnswEfConstruction = 60)
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val q: Array[Float] = t(s, d, "embeddings").filter(col("vec_id") === 0)
        .select("embedding").as[Array[Float]].head()
      val hits = new Searcher(s, idxDir)
        .knnHnsw("embedding", q, 20, ef = 1 << 20, filter = "lang:en")
        .toSeq.toDF("docId", "cos_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("cos_raw"), 3).as("cos"))
    }),

    // PER-FIELD ANALYZERS (the ES mapping's `analyzer` knob): an extra
    // analyzed field `title` (first 6 content tokens) indexed with a
    // DIFFERENT analyzer than content — lowercase kind + index-time
    // stopword ('the', position gaps + dl discount) + index-time synonym
    // (merge → combine, injected into the postings) — queried through
    // multi_match most_fields over BOTH fields with a field boost. The
    // query token 'combine' hits titles containing 'merge' via the
    // index-time injection; the oracle replicates stop-filter + injection
    // relationally.
    "fts75_analyzers" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"),
        array_join(slice(toks(col("text")), 1, 6), " ").as("title"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts75-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        fields = graft.index.FieldConfig(keyword = Seq("lang", "repo"),
          analyzed = Seq("title"),
          analyzers = Map("title" -> graft.analysis.AnalyzerSpec(
            kind = "lowercase", stopwords = Seq("the"),
            synonyms = Map("merge" -> Seq("combine"))))))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir)
        .multiMatch("combine scan", Seq("content", "title^2"), 20, "most_fields")
        .toSeq.toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    }),

    // fts77: index-time MULTI-TOKEN synonym (the ES `synonym_graph` shape:
    // "query" → "zzqa zzqb" injected at consecutive positions from the
    // trigger's) + a match_phrase on the injected target over the analyzed
    // extra field — the phrase matches exactly the docs whose title carries
    // the trigger, scored by Lucene phrase-frequency BM25 over the field's
    // own statistics. Mirrors ES index-time synonym_graph + match_phrase
    // (reference mapping knob: `elasticsearch_utils.py:53-121`).
    "fts77_syn_graph_phrase" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").select(
        lit("docs").as("repo"),
        lpad(col("doc_id").cast("string"), 8, "0").as("path"),
        md5(col("text")).as("commit"),
        col("lang"), col("text").as("content"),
        array_join(slice(toks(col("text")), 1, 6), " ").as("title"))
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-fts77-${math.abs(d.hashCode)}"
      val cfg = IndexConfig(buildPartitions = 8, docsPerShard = 1L << 12, buildBuckets = 2,
        storePositions = true,
        fields = graft.index.FieldConfig(keyword = Seq("lang", "repo"),
          analyzed = Seq("title"),
          analyzers = Map("title" -> graft.analysis.AnalyzerSpec(
            kind = "lowercase",
            synonyms = Map("query" -> Seq("zzqa zzqb"))))))
      cachedIndex(corpus, idxDir, cfg) {
        new IndexBuilder(s, cfg).build(corpus, idxDir, resume = false)
      }
      val hits = new Searcher(s, idxDir)
        .matchPhraseField("title", "zzqa zzqb", 20)
        .toSeq.toDF("docId", "score_raw")
      s.read.parquet(s"$idxDir/docs")
        .select(col("docId"), col("path").cast("bigint").as("doc_id"))
        .join(broadcast(hits), Seq("docId"))
        .select(col("doc_id"), round(col("score_raw"), 4).as("score"))
    })
  )

  // -------------------------------------------------------------- oracleSql

  def oracleSql: Map[String, String] = {
    val tokExpr = "list_filter(regexp_split_to_array(lower(text),'[^a-z0-9]+'), x -> length(x)>0)"
    val stopList = StopEn.map(w => s"'$w'").mkString("(", ",", ")")
    Map(
      "q1_agg_pricing" ->
        """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
          | round(sum(l_extendedprice),2) AS sum_price, round(avg(l_discount),4) AS avg_disc,
          | count(*) AS cnt FROM lineitem GROUP BY 1,2""".stripMargin,
      "q2_counter" ->
        "SELECT event_type, count(*) AS cnt FROM events GROUP BY 1",
      "q3_filter_isin" ->
        "SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE')",
      "q4_filter_pred" ->
        """SELECT l_orderkey, l_linenumber, round(l_extendedprice,2) AS price FROM lineitem
          | WHERE l_quantity > 45 AND l_discount >= 0.05 AND l_discount <= 0.07""".stripMargin,
      "q5_variant_id" ->
        """SELECT l_orderkey, l_linenumber,
          | substring(concat_ws('-', cast(l_orderkey as varchar), cast(l_partkey as varchar),
          |   cast(l_suppkey as varchar), cast(l_linenumber as varchar)), 1, 18) AS row_id FROM lineitem""".stripMargin,
      "q6_case_coalesce" ->
        """SELECT o_orderkey,
          | CASE WHEN o_totalprice > 200000 THEN 'high' WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS price_band,
          | coalesce(nullif(o_orderpriority, '1-URGENT'), 'URGENT') AS prio FROM orders""".stripMargin,
      "q7_regex" ->
        """SELECT p_partkey, regexp_replace(p_name, ' ', '_', 'g') AS name_slug,
          | upper(p_brand) AS brand_uc, regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num FROM part""".stripMargin,
      "q8_split_sort_join" ->
        """SELECT p_partkey, array_to_string(list_sort(list_transform(regexp_split_to_array(p_name, ' '),
          | w -> lpad(cast(length(w) as varchar), 2, '0') || '|' || w)), ',') AS words_by_len FROM part""".stripMargin,
      "q9_xpos" ->
        """SELECT c_custkey, cast(c_nationkey as bigint) * 1000000000 + c_custkey AS xpos,
          | least(5000, c_custkey) AS capped FROM customer""".stripMargin,
      "q10_join_left" ->
        """SELECT o_orderkey, c_name, c_mktsegment FROM orders
          | LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin,
      "q11_join_star" ->
        """SELECT r_name, n_name, round(sum(l_extendedprice * (1.0 - l_discount)),2) AS revenue, count(*) AS cnt
          | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          | JOIN customer ON o_custkey = c_custkey
          | JOIN nation ON c_nationkey = n_nationkey
          | JOIN region ON n_regionkey = r_regionkey
          | GROUP BY 1,2""".stripMargin,
      "q12_semi" ->
        "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
      "q13_anti" ->
        "SELECT c_custkey FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)",
      "q14_union_distinct" ->
        """SELECT DISTINCT k FROM (
          | SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
          | UNION ALL SELECT o_custkey AS k FROM orders WHERE o_totalprice > 250000)""".stripMargin,
      "q15_interval_join" ->
        """SELECT bucket, count(*) AS cnt, round(avg(p_retailprice),2) AS avg_price
          | FROM part JOIN (VALUES (0,10,'small'),(10,25,'mid'),(25,51,'large')) AS b(lo,hi,bucket)
          | ON p_size >= lo AND p_size < hi GROUP BY 1""".stripMargin,
      "q16_collect_sorted" ->
        """SELECT l_orderkey,
          | string_agg(cast(l_linenumber as varchar), ',' ORDER BY cast(l_linenumber as varchar)) AS linenums,
          | count(*) AS cnt FROM lineitem GROUP BY 1""".stripMargin,
      "q17_bucket_counts" ->
        """SELECT o_custkey,
          | cast(sum(CASE WHEN o_totalprice < 50000 THEN 1 ELSE 0 END) as bigint) AS n_small,
          | cast(sum(CASE WHEN o_totalprice >= 50000 AND o_totalprice < 150000 THEN 1 ELSE 0 END) as bigint) AS n_mid,
          | cast(sum(CASE WHEN o_totalprice >= 150000 THEN 1 ELSE 0 END) as bigint) AS n_big
          | FROM orders GROUP BY 1""".stripMargin,
      "q18_minmax_dates" ->
        """SELECT o_orderpriority, strftime(min(o_orderdate), '%Y-%m-%d') AS first_date,
          | strftime(max(o_orderdate), '%Y-%m-%d') AS last_date, round(max(o_totalprice),2) AS max_price
          | FROM orders GROUP BY 1""".stripMargin,
      "q19_any" ->
        """SELECT user_id, cast(bool_or(event_type = 'error') as int) AS has_error, count(*) AS n_events
          | FROM events GROUP BY 1""".stripMargin,
      "q20_distinct" ->
        "SELECT DISTINCT c_mktsegment FROM customer",
      "q21_topk" ->
        """SELECT o_orderkey, round(o_totalprice,2) AS price FROM orders
          | ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15""".stripMargin,
      "q22_window_rank" ->
        """SELECT user_id, event_id, event_type FROM (
          | SELECT user_id, event_id, event_type,
          |   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events)
          | WHERE rn = 1""".stripMargin,
      "q23_enum_encode" ->
        """SELECT seg, cast(row_number() OVER (ORDER BY seg) - 1 as bigint) AS seg_id
          | FROM (SELECT DISTINCT c_mktsegment AS seg FROM customer)""".stripMargin,
      "q24_json" ->
        """SELECT event_id, cast(json_extract_string(props, '$.k') as integer) AS k FROM events
          | WHERE cast(json_extract_string(props, '$.k') as integer) >= 50""".stripMargin,
      "q25_flatten" ->
        """SELECT c_custkey, c_name AS info_name, c_mktsegment AS info_mkt_segment,
          | c_nationkey AS info_mkt_nation FROM customer""".stripMargin,

      "q26_rollup" ->
        """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
          | round(sum(l_quantity),2) AS sum_qty, count(*) AS cnt
          | FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
      "q27_intersect" ->
        """SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
          | INTERSECT SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000""".stripMargin,
      "q28_except" ->
        """SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
          | EXCEPT SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000""".stripMargin,
      "q29_percentile" ->
        """SELECT o_orderpriority, round(quantile_cont(o_totalprice, 0.5),2) AS p50,
          | round(quantile_cont(o_totalprice, 0.9),2) AS p90 FROM orders GROUP BY 1""".stripMargin,
      "q30_collect_set" ->
        """SELECT event_type,
          | array_to_string(list_sort(list_distinct(list(cast(user_id % 10 as varchar)))), ',') AS user_buckets
          | FROM events GROUP BY 1""".stripMargin,
      "q31_join_full_outer" ->
        """WITH c AS (SELECT c_custkey AS k, c_name AS name, c_mktsegment AS segment FROM customer),
          |o AS (SELECT o_custkey AS k, count(*) AS n_orders, round(max(o_totalprice),2) AS max_price
          |      FROM orders GROUP BY 1),
          |e AS (SELECT user_id AS k, count(*) AS n_events FROM events GROUP BY 1),
          |co AS (SELECT coalesce(c.k, o.k) AS k, name, segment, n_orders, max_price
          |       FROM c FULL OUTER JOIN o ON c.k = o.k)
          |SELECT coalesce(co.k, e.k) AS k, name, segment, n_orders, max_price, n_events
          |FROM co FULL OUTER JOIN e ON co.k = e.k""".stripMargin,
      "q32_join_incremental" ->
        """WITH c AS (SELECT c_custkey AS k, c_name AS name, c_mktsegment AS segment FROM customer),
          |e AS (SELECT user_id AS k, count(*) AS n_events FROM events GROUP BY 1),
          |o2 AS (SELECT o_custkey AS k, count(*) AS n_orders, round(max(o_totalprice),2) AS max_price
          |       FROM orders WHERE o_totalprice > 100000 GROUP BY 1),
          |base AS (SELECT coalesce(c.k, e.k) AS k, name, segment, n_events,
          |                (c.k IS NOT NULL) AS has_c, (e.k IS NOT NULL) AS has_e
          |         FROM c FULL OUTER JOIN e ON c.k = e.k)
          |SELECT coalesce(base.k, o2.k) AS k, name, segment, n_orders, max_price, n_events
          |FROM base FULL OUTER JOIN o2 ON base.k = o2.k
          |WHERE coalesce(has_c, false) OR coalesce(has_e, false) OR o2.k IS NOT NULL""".stripMargin,
      "q33_format" ->
        "SELECT p_partkey, printf('%s_%s_%03d', p_brand, p_type, p_size) AS part_tag FROM part",
      "q34_try_cast" ->
        """SELECT c_custkey, try_cast(split_part(c_name, '#', 2) as bigint) AS name_num,
          | try_cast(c_mktsegment as bigint) AS bad_num FROM customer""".stripMargin,
      "q35_map_json" ->
        """SELECT event_type,
          | '{' || string_agg('"' || b || '":' || c, ',' ORDER BY b) || '}' AS bucket_counts_json
          |FROM (SELECT event_type, cast(user_id % 5 as varchar) AS b, count(*) AS c
          |      FROM events GROUP BY 1,2) GROUP BY event_type""".stripMargin,
      "q36_sample_hash" ->
        """SELECT o_orderkey, o_custkey FROM orders
          | WHERE substring(md5(cast(o_orderkey as varchar)), 1, 2) < '2a'""".stripMargin,
      "q37_multi_value_parse" ->
        """SELECT p_partkey,
          | list_filter(string_split('.' || ';' || p_brand || ';' || '.' || ';' || p_type, ';'),
          |   x -> x <> '.')[1] AS first_real FROM part""".stripMargin,
      "q38_split_branches" ->
        """SELECT p_partkey, cast(len(string_split(p_name, ' ')) as bigint) AS n_words,
          | CASE WHEN len(string_split(p_name, ' ')) <= 3 THEN 'short' ELSE 'long' END AS branch
          |FROM part WHERE p_size >= 5""".stripMargin,
      "q40_array_misc" ->
        """SELECT p_partkey,
          | array_to_string(list_slice(string_split(p_name, ' '), 2, 3), ',') AS middle_words,
          | list_max(list_transform(string_split(p_name, ' '), w -> length(w))) AS max_word_len,
          | cast(list_position(string_split(p_name, ' '),
          |   string_split(p_name, ' ')[-1]) as bigint) AS last_word_pos,
          | greatest(p_size, length(p_brand), 7) AS g
          |FROM part""".stripMargin,
      "q39_call_stats" ->
        """WITH ps AS (SELECT o_orderpriority, o_orderstatus, count(*) AS c
          |            FROM orders GROUP BY 1,2)
          |SELECT o_orderpriority,
          |  array_to_string(list(cast(c as varchar) ORDER BY o_orderstatus), ',') AS ac,
          |  cast(sum(c) as bigint) AS an
          |FROM ps GROUP BY 1""".stripMargin,
      "td1_tokens" ->
        s"""SELECT doc_id, cast(len(tk) as bigint) AS n_tokens, cast(len(list_distinct(tk)) as bigint) AS n_distinct
           | FROM (SELECT doc_id, $tokExpr AS tk FROM documents)""".stripMargin,
      "td2_quality" ->
        s"""SELECT doc_id, n_chars, cast(len(tk) as bigint) AS n_tokens,
           | round(len(list_filter(tk, x -> x IN $stopList)) * 1.0 / len(tk), 4) AS stop_ratio,
           | round(least(1.0, len(tk) / 400.0) * (1.0 - len(list_filter(tk, x -> x IN $stopList)) * 1.0 / len(tk)), 4) AS quality
           | FROM (SELECT doc_id, n_chars, $tokExpr AS tk FROM documents)""".stripMargin,
      "td3_langid" -> {
        val scores = graft.analysis.LangId.scoreSqls
        val cols = scores.map { case (l, e) => s"$e AS s_$l" }.mkString(", ")
        val maxE = scores.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
        val arms = scores.map { case (l, _) => s"WHEN s_$l = m THEN '$l'" }.mkString(" ")
        s"""WITH sc AS (SELECT doc_id, lang, $cols
           |  FROM (SELECT doc_id, lang, lower(text) AS t FROM documents)),
           |mx AS (SELECT *, $maxE AS m FROM sc)
           |SELECT doc_id,
           | CASE WHEN m = 0 THEN 'unk' $arms ELSE 'unk' END AS pred_lang,
           | lang AS true_lang
           |FROM mx""".stripMargin
      },
      "td4_fingerprint" ->
        s"""SELECT doc_id, md5(array_to_string(list_sort(list_distinct(tk)), ' ')) AS fingerprint
           | FROM (SELECT doc_id, $tokExpr AS tk FROM documents)""".stripMargin,
      "td5_dedup_exact" ->
        "SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n_copies FROM documents GROUP BY 1",
      "td6_minhash" -> minhashSql,
      "td7_lsh_pairs" -> lshCandidatesSql,
      "td8_jaccard" ->
        s"""WITH cand AS ($lshCandidatesSql),
           |shing AS ($shinglesSql),
           |shs AS (SELECT doc_id, list_distinct(sh) AS shs FROM shing)
           |SELECT doc_a, doc_b,
           |  round(len(list_intersect(sa.shs, sb.shs)) * 1.0 /
           |        (len(sa.shs) + len(sb.shs) - len(list_intersect(sa.shs, sb.shs))), 4) AS jaccard
           |FROM cand JOIN shs sa ON sa.doc_id = doc_a JOIN shs sb ON sb.doc_id = doc_b""".stripMargin,
      "td9_simhash" -> {
        val highs = "('8','9','a','b','c','d','e','f')"
        val sums = (1 to 16).map(j =>
          s"sum(CASE WHEN substr(md5(tok), $j, 1) IN $highs THEN 1 ELSE -1 END) AS s$j").mkString(", ")
        val bits = (1 to 16).map(j => s"CASE WHEN s$j >= 0 THEN '1' ELSE '0' END").mkString(" || ")
        s"""WITH ex AS (SELECT doc_id, unnest(list_distinct($tokExpr)) AS tok FROM documents),
           |agg AS (SELECT doc_id, $sums FROM ex GROUP BY doc_id)
           |SELECT doc_id, $bits AS simhash FROM agg""".stripMargin
      },
      "td10_cos_pairs" -> {
        def key(from: Int) = (from + 1 to from + 8)
          .map(i => s"CASE WHEN v[$i] >= 0 THEN '1' ELSE '0' END").mkString(" || ")
        s"""WITH e AS (SELECT vec_id, cast(embedding as DOUBLE[]) AS v FROM embeddings),
           |k AS (SELECT vec_id, v, ${key(0)} AS b0, ${key(8)} AS b1 FROM e),
           |cand AS (SELECT DISTINCT vec_a, vec_b FROM (
           |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b FROM k a JOIN k b
           |    ON a.b0 = b.b0 AND a.vec_id < b.vec_id
           |  UNION ALL
           |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b FROM k a JOIN k b
           |    ON a.b1 = b.b1 AND a.vec_id < b.vec_id))
           |SELECT vec_a, vec_b, round(list_cosine_similarity(ea.v, eb.v), 3) AS cos
           |FROM cand JOIN e ea ON ea.vec_id = vec_a JOIN e eb ON eb.vec_id = vec_b
           |WHERE round(list_cosine_similarity(ea.v, eb.v), 3) >= 0.25""".stripMargin
      },
      "td11_ann_topk" ->
        """WITH e AS (SELECT vec_id, cast(embedding as DOUBLE[]) AS v FROM embeddings),
          |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
          |SELECT vec_id, round(list_cosine_similarity(v, qv), 3) AS cos
          |FROM e, q WHERE vec_id <> 0
          |ORDER BY cos DESC, vec_id ASC LIMIT 20""".stripMargin,
      "td13_ann_lsh" -> {
        def key(v: String, from: Int) = (from + 1 to from + 8)
          .map(i => s"CASE WHEN $v[$i] >= 0 THEN '1' ELSE '0' END").mkString(" || ")
        s"""WITH e AS (SELECT vec_id, cast(embedding as DOUBLE[]) AS v FROM embeddings),
           |k AS (SELECT vec_id, v, ${key("v", 0)} AS b0, ${key("v", 8)} AS b1 FROM e),
           |q AS (SELECT v AS qv, b0 AS qb0, b1 AS qb1 FROM k WHERE vec_id = 0)
           |SELECT vec_id, round(list_cosine_similarity(v, qv), 3) AS cos
           |FROM k, q WHERE vec_id <> 0 AND (b0 = qb0 OR b1 = qb1)
           |ORDER BY cos DESC, vec_id ASC LIMIT 20""".stripMargin
      },
      "td14_ann_ivf" -> {
        val mean = (1 to 64).map(j => s"avg(v[$j])").mkString("list_value(", ", ", ")")
        s"""WITH e AS (SELECT vec_id, cast(embedding as DOUBLE[]) AS v FROM embeddings),
           |seeds AS (SELECT vec_id AS cid, v AS sv FROM e WHERE vec_id BETWEEN 1 AND 8),
           |s0 AS (SELECT vec_id, v, cid, round(list_cosine_similarity(v, sv), 4) AS cs
           |       FROM e CROSS JOIN seeds),
           |a0 AS (SELECT vec_id, v, cid FROM (
           |  SELECT vec_id, v, cid,
           |    row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn FROM s0)
           |  WHERE rn = 1),
           |cents AS (SELECT cid, $mean AS cv FROM a0 GROUP BY cid),
           |scored AS (SELECT vec_id, v, cid, round(list_cosine_similarity(v, cv), 4) AS cs
           |           FROM e CROSS JOIN cents),
           |assign AS (SELECT vec_id, v, cid AS cell FROM (
           |  SELECT vec_id, v, cid, cs,
           |    row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn FROM scored)
           |  WHERE rn = 1),
           |probed AS (SELECT cid AS cell FROM (
           |  SELECT cid, row_number() OVER (ORDER BY cs DESC, cid) AS rn
           |  FROM scored WHERE vec_id = 0) WHERE rn <= 2),
           |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
           |SELECT a.vec_id, round(list_cosine_similarity(a.v, qv), 3) AS cos
           |FROM assign a JOIN probed USING (cell) CROSS JOIN q
           |WHERE a.vec_id <> 0
           |ORDER BY cos DESC, a.vec_id ASC LIMIT 20""".stripMargin
      },
      "td12_multimodal_meta" ->
        """SELECT doc_id, cast(octet_length(encode(text)) as bigint) AS byte_len,
          | md5(text) AS payload_md5, source FROM documents""".stripMargin,

      "fts1_bm25_brute" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('spark','query','merge') GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT doc_id, round(sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |GROUP BY doc_id
           |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin,
      "fts3_wand" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('spark','query','merge') GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT doc_id, round(sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |GROUP BY doc_id
           |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin,
      "fts4_segmented" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('spark','query','merge') GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT doc_id, round(sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |GROUP BY doc_id
           |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin,
      "fts5_phrase" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk,
           |        len(list_filter(generate_series(1, len(tk)-1),
           |            i -> tk[i] = 'data' AND tk[i+1] = 'merge')) > 0 AS pok
           |        FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, pok, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, pok, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('data','merge') GROUP BY 1,2,3,4),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT doc_id, round(sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |WHERE pok
           |GROUP BY doc_id
           |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin,
      // Lucene match_phrase scoring: phraseFreq = positional occurrence
      // count; weight = idf('data') + idf('merge') with each term's own
      // corpus-wide df; score = weight * tfNorm(phraseFreq, dl, avgdl)
      "fts74_phrase_lucene" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl,
           |        cast(len(list_filter(generate_series(1, len(tk)-1),
           |            i -> tk[i] = 'data' AND tk[i+1] = 'merge')) as bigint) AS pf,
           |        list_contains(tk, 'data') AS h1, list_contains(tk, 'merge') AS h2
           |        FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |dfc AS (SELECT sum(CASE WHEN h1 THEN 1 ELSE 0 END) AS df1,
           |               sum(CASE WHEN h2 THEN 1 ELSE 0 END) AS df2 FROM doc)
           |SELECT doc_id, round(
           |  (ln(1.0 + (stats.n - dfc.df1 + 0.5) / (dfc.df1 + 0.5)) +
           |   ln(1.0 + (stats.n - dfc.df2 + 0.5) / (dfc.df2 + 0.5))) *
           |  (pf / (pf + 1.2 * (0.25 + 0.75 * doc.dl / stats.avgdl))), 4) AS score
           |FROM doc CROSS JOIN stats CROSS JOIN dfc
           |WHERE pf > 0
           |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin,
      // phrase requirement gates candidates; 'spark' is an optional scored
      // extra — it appears in the per-term sum wherever present on a
      // phrase-matching doc, with df computed corpus-wide like every term
      "fts6_phrase_mixed" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk,
           |        len(list_filter(generate_series(1, len(tk)-1),
           |            i -> tk[i] = 'data' AND tk[i+1] = 'merge')) > 0 AS pok
           |        FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, pok, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, pok, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('data','merge','spark') GROUP BY 1,2,3,4),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT doc_id, round(sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |WHERE pok
           |GROUP BY doc_id
           |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin,
      // must_not gate: docs containing 'merge' are rejected AFTER stats —
      // df/idf in dfc are computed corpus-wide exactly like the engine's
      // dictionary df, so surviving docs keep their unnegated scores
      "fts7_negation" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk,
           |        list_contains(tk, 'merge') AS ex FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, ex, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, ex, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('spark','query') GROUP BY 1,2,3,4),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT doc_id, round(sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |WHERE NOT ex
           |GROUP BY doc_id
           |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin,
      // prefix expansion: every corpus term LIKE 's%' is scored with its
      // own per-term df — identical to the engine's dictionary expansion
      // (scoring_boolean rewrite), plus the literal term 'merge'
      "fts8_prefix" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term LIKE 's%' OR term = 'merge' GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT doc_id, round(sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |GROUP BY doc_id
           |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin,
      // must_not TERM FILTER gate: docs with lang='en' rejected after
      // stats — survivors keep their unnegated scores
      "fts9_neg_filter" ->
        s"""WITH dt AS (SELECT doc_id, lang, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, lang, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, lang, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, lang, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('spark','query') GROUP BY 1,2,3,4),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT doc_id, round(sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |WHERE lang != 'en'
           |GROUP BY doc_id
           |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin,
      // fuzzy expansion: every corpus term within Levenshtein distance 1 of
      // 'merge' is scored with its own per-term df (scoring_boolean
      // rewrite), plus the literal term 'query' — DuckDB's levenshtein uses
      // the same unit-cost model as the engine's editWithin
      "fts10_fuzzy" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE levenshtein(term, 'merge') <= 1 OR term = 'query' GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT doc_id, round(sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |GROUP BY doc_id
           |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin,
      // query-time boost: 'spark' contributions scaled ×2.0 (idf×boost),
      // 'query'/'merge' unboosted; global n/avgdl/df untouched
      "fts11_boost" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('spark','query','merge') GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT doc_id, round(sum(
           |  (CASE WHEN tf.term = 'spark' THEN 2.0 ELSE 1.0 END) *
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |GROUP BY doc_id
           |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin,
      // range filter gates CANDIDATES only — stats/df stay corpus-wide, so
      // the WHERE lands after tf/dfc are computed over all docs
      "fts12_range" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('spark','query','merge') GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT doc_id, round(sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |WHERE doc_id IN (SELECT doc_id FROM documents WHERE n_chars >= 300)
           |GROUP BY doc_id
           |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin,
      // ES terms aggregation in query context: every doc matching ≥1 scored
      // term, grouped by the facet field, (count desc, value asc), topN
      "fts13_facets" ->
        s"""SELECT lang AS value, count(*) AS cnt
           |FROM (SELECT doc_id, lang, $tokExpr AS tk FROM documents)
           |WHERE len(list_intersect(tk, ['spark','query','merge'])) > 0
           |GROUP BY 1 ORDER BY cnt DESC, value ASC LIMIT 10""".stripMargin,
      "fts2_term_dict" ->
        """WITH tf AS (
          |  SELECT doc_id, term, count(*) AS tf FROM (
          |    SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text),'[^a-z0-9]+'), x -> length(x)>0)) AS term
          |    FROM documents) GROUP BY 1,2)
          |SELECT term, cast(row_number() OVER (ORDER BY term) - 1 as bigint) AS term_id,
          |  count(*) AS df, cast(sum(tf) as bigint) AS cf
          |FROM tf GROUP BY term""".stripMargin,
      // ES _count: docs matching ≥1 scored term AND the keyword filter
      "fts14_count" ->
        s"""SELECT count(*) AS cnt
           |FROM (SELECT lang, $tokExpr AS tk FROM documents)
           |WHERE len(list_intersect(tk, ['spark','query','merge'])) > 0
           |  AND lang = 'scala'""".stripMargin,
      // ES stats aggregation over the match set's numeric field
      "fts15_stats" ->
        s"""SELECT count(*) AS cnt,
           |  cast(min(n_chars) as double) AS mn, cast(max(n_chars) as double) AS mx,
           |  cast(sum(n_chars) as double) AS sm, round(avg(n_chars), 4) AS av
           |FROM (SELECT n_chars, $tokExpr AS tk FROM documents)
           |WHERE len(list_intersect(tk, ['spark','query','merge'])) > 0""".stripMargin,
      // ES histogram aggregation: floor(value/interval)*interval buckets
      "fts16_histogram" ->
        s"""SELECT floor(n_chars / 100.0) * 100.0 AS bucket, count(*) AS cnt
           |FROM (SELECT n_chars, $tokExpr AS tk FROM documents)
           |WHERE len(list_intersect(tk, ['spark','query','merge'])) > 0
           |GROUP BY 1 ORDER BY bucket ASC""".stripMargin,
      // ES sort-by-field: match set ordered by the field, doc_id tie-break
      "fts17_sortby" ->
        s"""SELECT doc_id, n_chars
           |FROM (SELECT doc_id, n_chars, $tokExpr AS tk FROM documents)
           |WHERE len(list_intersect(tk, ['spark','query','merge'])) > 0
           |ORDER BY n_chars DESC, doc_id ASC LIMIT 50""".stripMargin,
      // ES minimum_should_match=2: BM25 over docs with ≥2 distinct terms
      "fts18_msm" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('spark','query','merge','index','stream') GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT doc_id, round(sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |GROUP BY doc_id
           |HAVING count(*) >= 2
           |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin,
      // ES from/size pagination: ranks [10, 30) of fts3's total order
      "fts19_from" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('spark','query','merge') GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT doc_id, round(sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |GROUP BY doc_id
           |ORDER BY score DESC, doc_id ASC LIMIT 20 OFFSET 10""".stripMargin,
      // ES filter-context-only (constant score 0, _doc order)
      "fts20_filter_only" ->
        """SELECT doc_id, cast(0.0 as double) AS score FROM documents
          |WHERE lang = 'scala' AND n_chars >= 300
          |ORDER BY doc_id ASC LIMIT 50""".stripMargin,
      // ES search_after: ranks [10, 20) of fts3's total order — the cursor
      // is page 1's last (score, docId), so page 2 IS the next slice
      "fts21_search_after" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('spark','query','merge') GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT doc_id, round(sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |GROUP BY doc_id
           |ORDER BY score DESC, doc_id ASC LIMIT 10 OFFSET 10""".stripMargin,
      // ES scroll/export: the full match set's stored fields, doc order
      "fts22_scan" ->
        s"""SELECT doc_id, lang, n_chars
           |FROM (SELECT doc_id, lang, n_chars, $tokExpr AS tk FROM documents)
           |WHERE len(list_intersect(tk, ['spark','query','merge'])) > 0
           |ORDER BY doc_id ASC""".stripMargin,
      // ES terms agg + stats sub-agg: per-lang count and n_chars stats
      "fts23_facet_stats" ->
        s"""SELECT lang AS value, count(*) AS cnt,
           |  cast(min(n_chars) as double) AS mn, cast(max(n_chars) as double) AS mx,
           |  cast(sum(n_chars) as double) AS sm, round(avg(n_chars), 4) AS av
           |FROM (SELECT lang, n_chars, $tokExpr AS tk FROM documents)
           |WHERE len(list_intersect(tk, ['spark','query','merge'])) > 0
           |  AND lang IS NOT NULL
           |GROUP BY lang ORDER BY cnt DESC, value ASC LIMIT 10""".stripMargin,
      // ES range agg: every explicit bucket present, from-incl/to-excl
      "fts24_range_agg" ->
        s"""WITH m AS (SELECT n_chars
           |  FROM (SELECT n_chars, $tokExpr AS tk FROM documents)
           |  WHERE len(list_intersect(tk, ['spark','query','merge'])) > 0
           |    AND n_chars IS NOT NULL),
           |b(idx, lo, hi) AS (VALUES
           |  (0, cast(NULL as double), 200.0), (1, 200.0, 400.0),
           |  (2, 400.0, 800.0), (3, 800.0, cast(NULL as double))),
           |c AS (SELECT
           |    (CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END
           |   + CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END
           |   + CASE WHEN n_chars >= 800 THEN 1 ELSE 0 END) AS idx,
           |    count(*) AS n FROM m GROUP BY 1)
           |SELECT b.lo AS lo, b.hi AS hi, cast(coalesce(c.n, 0) as bigint) AS cnt
           |FROM b LEFT JOIN c USING (idx) ORDER BY lo ASC NULLS FIRST""".stripMargin,
      // ES cardinality agg (exact form): distinct langs over the match set
      "fts25_cardinality" ->
        s"""SELECT cast(count(DISTINCT lang) as bigint) AS cnt
           |FROM (SELECT lang, $tokExpr AS tk FROM documents)
           |WHERE len(list_intersect(tk, ['spark','query','merge'])) > 0
           |  AND lang IS NOT NULL""".stripMargin,
      // ES highlight: window of 3 tokens each side of the first query-term
      // occurrence, matched tokens wrapped <em>…</em> (plain highlighter)
      "fts26_highlight" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('spark','query','merge') GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |hits AS (SELECT doc_id, round(sum(
           |    ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |    (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |  FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |  GROUP BY doc_id
           |  ORDER BY score DESC, doc_id ASC LIMIT 20),
           |sn AS (SELECT doc_id, tk, least(
           |    coalesce(nullif(list_position(tk, 'spark'), 0), 2147483647),
           |    coalesce(nullif(list_position(tk, 'query'), 0), 2147483647),
           |    coalesce(nullif(list_position(tk, 'merge'), 0), 2147483647)) AS p
           |  FROM dt)
           |SELECT h.doc_id, h.score,
           |  CASE WHEN sn.p = 2147483647 THEN NULL ELSE array_to_string(
           |    list_transform(sn.tk[greatest(1, sn.p - 3):sn.p + 3],
           |      x -> CASE WHEN x IN ('spark','query','merge')
           |           THEN '<em>' || x || '</em>' ELSE x END), ' ')
           |  END AS snippet
           |FROM hits h JOIN sn USING (doc_id)""".stripMargin,
      // ES significant_terms: JLH over fg (match set) vs bg (whole corpus)
      // distinct-doc term frequencies, fgRate > bgRate, noise floor 3
      "fts27_sig_terms" ->
        s"""WITH t AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |m AS (SELECT doc_id, tk FROM t
           |      WHERE len(list_intersect(tk, ['spark','query','merge'])) > 0),
           |tot AS (SELECT count(*) * 1.0 AS ft FROM m),
           |nn AS (SELECT count(*) * 1.0 AS n FROM t),
           |fg AS (SELECT term, count(*) AS fg
           |       FROM (SELECT DISTINCT doc_id, unnest(tk) AS term FROM m) GROUP BY 1),
           |bg AS (SELECT term, count(*) AS bg
           |       FROM (SELECT DISTINCT doc_id, unnest(tk) AS term FROM t) GROUP BY 1)
           |SELECT term, fg, bg,
           |  round(((fg / ft) - (bg / n)) * (fg / ft) / (bg / n), 4) AS score
           |FROM fg JOIN bg USING (term) CROSS JOIN tot CROSS JOIN nn
           |WHERE fg >= 3 AND (fg / ft) > (bg / n)
           |ORDER BY score DESC, term ASC LIMIT 15""".stripMargin,
      // ES more_like_this: doc 7's top-10 terms by tf(text)·idf(index)
      // (min_term_freq 2, min_doc_freq 5) as a disjunctive BM25 query,
      // source doc excluded from candidates, stats index-wide
      "fts28_mlt" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |alltf AS (SELECT doc_id, dl, term, count(*) AS tf
           |          FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc) GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM alltf GROUP BY 1),
           |src AS (SELECT term, count(*) AS tfq
           |        FROM (SELECT unnest(tk) AS term FROM dt WHERE doc_id = 7) GROUP BY 1),
           |sel AS (SELECT src.term FROM src JOIN dfc USING (term) CROSS JOIN stats
           |        WHERE src.tfq >= 2 AND dfc.df >= 5
           |        ORDER BY src.tfq * ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) DESC,
           |          src.term ASC
           |        LIMIT 10)
           |SELECT doc_id, round(sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (alltf.tf / (alltf.tf + 1.2 * (0.25 + 0.75 * alltf.dl / stats.avgdl)))), 4) AS score
           |FROM alltf JOIN dfc ON alltf.term = dfc.term CROSS JOIN stats
           |WHERE alltf.term IN (SELECT term FROM sel) AND doc_id != 7
           |GROUP BY doc_id
           |ORDER BY score DESC, doc_id ASC LIMIT 15""".stripMargin,
      // ES wildcard query: terms matching s*am / *ow (anchored glob → regex,
      // the engine's exact translation), each scored with its own idf
      "fts29_wildcard" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE regexp_full_match(term, 's.*am')
           |          OR regexp_full_match(term, '.*ow') GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT doc_id, round(sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |GROUP BY doc_id
           |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin,
      // ES regexp query: anchored full-term match s(ort|can), plus the
      // plain term 'key'
      "fts30_regexp" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE regexp_full_match(term, 's(ort|can)')
           |          OR term = 'key' GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT doc_id, round(sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |GROUP BY doc_id
           |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin,
      // ES top_hits in a terms agg: full scored match set (brute-force
      // BM25), top-3 lang buckets by count (count desc, value asc), top-2
      // hits per bucket (score desc, doc_id asc)
      "fts31_top_hits" ->
        s"""WITH dt AS (SELECT doc_id, lang, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, lang, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, lang, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, lang, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('merge','query') GROUP BY 1,2,3,4),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |scored AS (SELECT doc_id, lang, sum(
           |    ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |    (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))) AS score
           |  FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |  GROUP BY doc_id, lang),
           |top3 AS (SELECT lang, count(*) AS cnt FROM scored
           |         GROUP BY 1 ORDER BY cnt DESC, lang ASC LIMIT 3),
           |ranked AS (SELECT lang, doc_id, score,
           |    row_number() OVER (PARTITION BY lang ORDER BY score DESC, doc_id ASC) AS rk
           |  FROM scored)
           |SELECT t.lang AS value, t.cnt, r.rk, r.doc_id, round(r.score, 4) AS score
           |FROM ranked r JOIN top3 t ON r.lang = t.lang
           |WHERE r.rk <= 2
           |ORDER BY t.cnt DESC, value ASC, r.rk ASC""".stripMargin,
      // ES percentiles agg (exact, quantile_cont linear interpolation —
      // the same convention as Spark's percentile)
      "fts32_percentiles" ->
        s"""WITH m AS (SELECT n_chars FROM (SELECT n_chars, $tokExpr AS tk FROM documents)
           |           WHERE len(list_intersect(tk, ['spark','query','merge'])) > 0)
           |SELECT p, round(v, 4) AS value FROM (
           |  SELECT cast(0.25 as double) AS p,
           |         quantile_cont(cast(n_chars as double), 0.25) AS v FROM m
           |  UNION ALL
           |  SELECT cast(0.5 as double), quantile_cont(cast(n_chars as double), 0.5) FROM m
           |  UNION ALL
           |  SELECT cast(0.9 as double), quantile_cont(cast(n_chars as double), 0.9) FROM m)""".stripMargin,
      // ES term suggester: per missing token, corpus vocabulary within
      // edit distance 2 ranked (distance asc, df desc, term asc), top 3;
      // 'window' is in the dictionary so suggest_mode=missing skips it
      "fts33_suggest" ->
        s"""WITH vocab AS (SELECT term, count(*) AS df FROM (
           |    SELECT doc_id, unnest(list_distinct($tokExpr)) AS term FROM documents)
           |  GROUP BY 1),
           |toks AS (SELECT unnest(['mrege','quary']) AS token),
           |cand AS (SELECT t.token, v.term AS suggestion, v.df,
           |    levenshtein(t.token, v.term) AS dist
           |  FROM toks t CROSS JOIN vocab v
           |  WHERE levenshtein(t.token, v.term) <= 2 AND v.term != t.token)
           |SELECT token, suggestion, df, dist FROM (
           |  SELECT *, row_number() OVER (PARTITION BY token
           |    ORDER BY dist ASC, df DESC, suggestion ASC) AS rk FROM cand)
           |WHERE rk <= 3""".stripMargin,
      // ES match_phrase slop ("data merge"~2): in-order span — 'data' at
      // position i, 'merge' at j > i, gap (j - i - 1) ≤ 2 — via a
      // positions self-join (a genuinely different formulation from the
      // engine's greedy position-chain kernel); scored by the BM25 sum
      // over the phrase's distinct terms
      "fts34_phrase_slop" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |ppos AS (SELECT doc_id, unnest(tk) AS term, generate_subscripts(tk, 1) AS p FROM dt),
           |pmatch AS (SELECT DISTINCT a.doc_id FROM ppos a JOIN ppos b
           |           ON a.doc_id = b.doc_id AND a.term = 'data' AND b.term = 'merge'
           |           AND b.p > a.p AND b.p - a.p - 1 <= 2),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('data','merge') GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT doc_id, round(sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |WHERE doc_id IN (SELECT doc_id FROM pmatch)
           |GROUP BY doc_id
           |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin,
      // ES collapse by lang: the best hit per lang (score desc, id asc),
      // then the global top-10 of the group heads
      "fts35_collapse" ->
        s"""WITH dt AS (SELECT doc_id, lang, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, lang, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, lang, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, lang, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('merge','query') GROUP BY 1,2,3,4),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |scored AS (SELECT doc_id, lang, sum(
           |    ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |    (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))) AS score
           |  FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |  GROUP BY doc_id, lang),
           |best AS (SELECT doc_id, lang AS value, score,
           |    row_number() OVER (PARTITION BY lang ORDER BY score DESC, doc_id ASC) AS r
           |  FROM scored)
           |SELECT doc_id, value, round(score, 4) AS score FROM best WHERE r = 1
           |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,
      // ES date_histogram (calendar month, min_doc_count=1) over the
      // deterministically derived date column, query context 'merge query'
      "fts36_date_hist" ->
        s"""WITH dt AS (SELECT doc_id,
           |    DATE '2021-01-01' + CAST(doc_id % 500 AS INT) AS mdate,
           |    $tokExpr AS tk FROM documents)
           |SELECT date_trunc('month', mdate) AS bucket, count(*) AS cnt
           |FROM dt WHERE len(list_intersect(tk, ['merge','query'])) > 0
           |GROUP BY 1 ORDER BY bucket""".stripMargin,
      // ES _explain: per (top-10 hit, contributing term) the BM25 pieces;
      // contribution = idf · tfNorm, pieces sum to the hit's score
      "fts37_explain" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('spark','query','merge') GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |pieces AS (SELECT doc_id, tf.term AS term, tf.tf AS tf, dfc.df AS df,
           |    ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) AS idf,
           |    ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |      (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl))) AS contrib
           |  FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats),
           |scored AS (SELECT doc_id, sum(contrib) AS score FROM pieces GROUP BY doc_id),
           |top10 AS (SELECT doc_id, score FROM scored
           |          ORDER BY score DESC, doc_id ASC LIMIT 10)
           |SELECT p.doc_id, p.term, p.tf, p.df, round(p.idf, 4) AS idf,
           |  round(p.contrib, 4) AS contribution, round(t.score, 4) AS score
           |FROM pieces p JOIN top10 t USING (doc_id)""".stripMargin,
      // ES dis_max (tie_breaker 0.3): per-doc best term contribution
      // + 0.3 × the remaining contributions, instead of the bool sum
      "fts38_dis_max" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('spark','query','merge') GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |contrib AS (SELECT doc_id,
           |    ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |    (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl))) AS c
           |  FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats)
           |SELECT doc_id, round(max(c) + 0.3 * (sum(c) - max(c)), 4) AS score
           |FROM contrib GROUP BY doc_id
           |ORDER BY max(c) + 0.3 * (sum(c) - max(c)) DESC, doc_id ASC LIMIT 50""".stripMargin,
      // ES function_score / field_value_factor: BM25 × log10(1 + 0.001·n_chars)
      // (modifier log1p is the COMMON log in ES, boost_mode multiply)
      "fts39_function_score" ->
        s"""WITH dt AS (SELECT doc_id, n_chars, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, n_chars, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, n_chars, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, n_chars, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('merge','query') GROUP BY 1,2,3,4),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |scored AS (SELECT doc_id, any_value(n_chars) AS n_chars, sum(
           |    ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |    (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))) AS bm25
           |  FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |  GROUP BY doc_id)
           |SELECT doc_id, round(bm25 * log10(1.0 + 0.001 * n_chars), 4) AS score
           |FROM scored
           |ORDER BY bm25 * log10(1.0 + 0.001 * n_chars) DESC, doc_id ASC LIMIT 50""".stripMargin,
      // ES rescore (score_mode total): top-30 of 'merge query' re-ranked by
      // + 2 × bm25('spark'); a window doc not matching the rescore query
      // keeps its base score; best 15 of the window
      "fts40_rescore" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('merge','query','spark') GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |contrib AS (SELECT doc_id, tf.term AS term,
           |    ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |    (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl))) AS c
           |  FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats),
           |base AS (SELECT doc_id, sum(c) AS score FROM contrib
           |         WHERE term IN ('merge','query') GROUP BY doc_id
           |         ORDER BY score DESC, doc_id ASC LIMIT 30),
           |sec AS (SELECT doc_id, sum(c) AS score FROM contrib
           |        WHERE term = 'spark' GROUP BY doc_id)
           |SELECT b.doc_id,
           |  round(b.score + coalesce(2.0 * s.score, 0.0), 4) AS score
           |FROM base b LEFT JOIN sec s ON b.doc_id = s.doc_id
           |ORDER BY b.score + coalesce(2.0 * s.score, 0.0) DESC, b.doc_id ASC
           |LIMIT 15""".stripMargin,
      // ES extended_stats over n_chars of the match set (population
      // variance/stddev — the ES convention)
      "fts41_extended_stats" ->
        s"""WITH m AS (SELECT cast(n_chars AS double) AS v
           |  FROM (SELECT n_chars, $tokExpr AS tk FROM documents)
           |  WHERE len(list_intersect(tk, ['spark','query','merge'])) > 0)
           |SELECT count(*) AS cnt, min(v) AS mn, max(v) AS mx, sum(v) AS sm,
           |  round(avg(v), 4) AS av, sum(v * v) AS sum_sq,
           |  round(var_pop(v), 2) AS variance,
           |  round(stddev_pop(v), 4) AS std_dev
           |FROM m""".stripMargin,
      // ES exists query: 'merge query' hits restricted to docs whose
      // opt_tag (set iff doc_id % 3 = 0) is present; stats index-wide
      "fts42_exists" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('merge','query') GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT doc_id, round(sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |WHERE doc_id % 3 = 0
           |GROUP BY doc_id
           |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin,
      // ES completion suggester: dictionary terms with prefix 's' ranked
      // df desc, term asc, top 5
      "fts43_completion" ->
        s"""SELECT term, df FROM (
           |  SELECT term, cast(count(*) AS bigint) AS df FROM (
           |    SELECT doc_id, unnest(list_distinct($tokExpr)) AS term FROM documents)
           |  WHERE term LIKE 's%' GROUP BY term)
           |ORDER BY df DESC, term ASC LIMIT 5""".stripMargin,
      // ES query-time synonyms: 'sort merge' with sort→order scores the
      // synonym as an ordinary should-term with its own idf
      "fts44_synonyms" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('sort','merge','order') GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT doc_id, round(sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |GROUP BY doc_id
           |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin,
      // ES boosting query: bm25('merge query') with a ×0.4 demotion for
      // docs that also contain 'spark' (demotion without exclusion)
      "fts45_boosting" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('merge','query') GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |base AS (SELECT doc_id, sum(
           |    ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |    (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))) AS score
           |  FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |  GROUP BY doc_id),
           |neg AS (SELECT doc_id FROM doc WHERE list_contains(tk, 'spark'))
           |SELECT b.doc_id,
           |  round(CASE WHEN n.doc_id IS NULL THEN b.score ELSE b.score * 0.4 END, 4) AS score
           |FROM base b LEFT JOIN neg n ON b.doc_id = n.doc_id
           |ORDER BY CASE WHEN n.doc_id IS NULL THEN b.score ELSE b.score * 0.4 END DESC,
           |  b.doc_id ASC LIMIT 50""".stripMargin,
      // ES GET by _id: stored fields of one document by identity key
      "fts46_get" ->
        "SELECT cast(doc_id AS bigint) AS doc_id, lang FROM documents WHERE doc_id = 42",
      "fts47_mget" ->
        s"""SELECT cast(doc_id AS bigint) AS doc_id, lang,
           | cast(len($tokExpr) AS bigint) AS dl
           |FROM documents WHERE doc_id IN (7, 42, 99)""".stripMargin,
      "fts48_ids" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('merge','query') GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |raw AS (SELECT doc_id, sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))) AS r
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |WHERE doc_id % 5 = 0 GROUP BY doc_id)
           |SELECT doc_id, round(r, 4) AS score FROM raw
           |ORDER BY r DESC, doc_id ASC LIMIT 20""".stripMargin,
      "fts49_update_by_query" ->
        s"""SELECT cast(doc_id AS bigint) AS doc_id,
           | CASE WHEN list_contains($tokExpr, 'merge') THEN 'hit-' || lang END AS tag
           |FROM documents""".stripMargin,
      "fts50_delete_by_query" ->
        s"""WITH dt AS (SELECT doc_id, lang, $tokExpr AS tk FROM documents WHERE lang <> 'de'),
           |ex AS (SELECT doc_id, unnest(tk) AS term FROM dt)
           |SELECT cast((SELECT count(*) FROM dt) AS bigint) AS num_docs,
           | cast((SELECT count(DISTINCT term) FROM ex)
           |   + (SELECT count(DISTINCT lang) FROM dt) + 1 AS bigint) AS num_terms,
           | cast((SELECT count(*) FROM (SELECT DISTINCT doc_id, term FROM ex))
           |   + 2 * (SELECT count(*) FROM dt) AS bigint) AS num_postings,
           | cast((SELECT sum(len(tk)) FROM dt) AS bigint) AS sum_dl,
           | round((SELECT sum(len(tk)) FROM dt) * 1.0
           |   / (SELECT count(*) FROM dt), 4) AS avg_dl""".stripMargin,
      "fts51_reindex" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents WHERE lang = 'fr'),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('spark','query') GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |raw AS (SELECT doc_id, sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))) AS r
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats GROUP BY doc_id)
           |SELECT doc_id, round(r, 4) AS score FROM raw
           |ORDER BY r DESC, doc_id ASC LIMIT 20""".stripMargin,
      "fts52_composite" ->
        s"""SELECT lang AS key, count(*) AS cnt FROM documents
           |WHERE list_contains($tokExpr, 'merge') AND lang > 'en'
           |GROUP BY 1 ORDER BY 1 LIMIT 2""".stripMargin,
      "fts53_filters_agg" ->
        s"""SELECT 'b_es' AS bucket,
           |  cast((SELECT count(*) FROM documents WHERE lang = 'es') AS bigint) AS cnt
           |UNION ALL SELECT 'b_merge',
           |  cast((SELECT count(*) FROM documents
           |        WHERE list_contains($tokExpr, 'merge')) AS bigint)
           |UNION ALL SELECT 'b_none', cast(0 AS bigint)""".stripMargin,
      "fts54_sort_multi" ->
        s"""SELECT cast(doc_id AS bigint) AS doc_id, lang, n_chars FROM documents
           |WHERE list_contains($tokExpr, 'spark')
           |ORDER BY lang ASC, n_chars DESC, doc_id ASC LIMIT 20""".stripMargin,
      "fts55_index_stats" ->
        s"""WITH dt AS (SELECT doc_id, lang, $tokExpr AS tk FROM documents),
           |ex AS (SELECT doc_id, unnest(tk) AS term FROM dt)
           |SELECT cast((SELECT count(*) FROM dt) AS bigint) AS num_docs,
           | cast((SELECT count(DISTINCT term) FROM ex)
           |   + (SELECT count(DISTINCT lang) FROM dt) + 1 AS bigint) AS num_terms,
           | cast((SELECT count(*) FROM (SELECT DISTINCT doc_id, term FROM ex))
           |   + 2 * (SELECT count(*) FROM dt) AS bigint) AS num_postings,
           | cast((SELECT sum(len(tk)) FROM dt) AS bigint) AS sum_dl,
           | round((SELECT sum(len(tk)) FROM dt) * 1.0
           |   / (SELECT count(*) FROM dt), 4) AS avg_dl""".stripMargin,
      // per-field BM25: content stats from all docs, title stats (docCount,
      // avgdl, df) from the title token lists ONLY — the independent
      // formulation of what the engine reads off tagged postings and the
      // `title:` marker row
      "fts56_multi_match_best" ->
        s"""WITH doc AS (SELECT doc_id, $tokExpr AS ck,
           |  list_filter(regexp_split_to_array(lower(source || ' ' || lang),'[^a-z0-9]+'),
           |              x -> length(x)>0) AS tk FROM documents),
           |cs AS (SELECT count(*) AS n, sum(len(ck)) * 1.0 / count(*) AS avgdl FROM doc),
           |fd AS (SELECT doc_id, cast(len(tk) AS bigint) AS fdl, tk FROM doc WHERE len(tk) > 0),
           |fs AS (SELECT count(*) AS n, sum(fdl) * 1.0 / count(*) AS avgdl FROM fd),
           |ctf AS (SELECT doc_id, dl, term, count(*) AS tf
           |        FROM (SELECT doc_id, cast(len(ck) AS bigint) AS dl, unnest(ck) AS term FROM doc)
           |        WHERE term IN ('merge','src3','query') GROUP BY 1,2,3),
           |cdf AS (SELECT term, count(*) AS df FROM ctf GROUP BY 1),
           |csc AS (SELECT doc_id, sum(
           |    ln(1.0 + (cs.n - cdf.df + 0.5)/(cdf.df + 0.5)) *
           |    (ctf.tf/(ctf.tf + 1.2*(0.25 + 0.75*ctf.dl/cs.avgdl)))) AS sc
           |  FROM ctf JOIN cdf USING (term) CROSS JOIN cs GROUP BY doc_id),
           |ttf AS (SELECT doc_id, fdl, term, count(*) AS tf
           |        FROM (SELECT doc_id, fdl, unnest(tk) AS term FROM fd)
           |        WHERE term IN ('merge','src3','query') GROUP BY 1,2,3),
           |tdf AS (SELECT term, count(*) AS df FROM ttf GROUP BY 1),
           |tsc AS (SELECT doc_id, sum(2.0 *
           |    ln(1.0 + (fs.n - tdf.df + 0.5)/(tdf.df + 0.5)) *
           |    (ttf.tf/(ttf.tf + 1.2*(0.25 + 0.75*ttf.fdl/fs.avgdl)))) AS sc
           |  FROM ttf JOIN tdf USING (term) CROSS JOIN fs GROUP BY doc_id),
           |allsc AS (SELECT coalesce(csc.doc_id, tsc.doc_id) AS doc_id,
           |    coalesce(csc.sc, 0) AS c, coalesce(tsc.sc, 0) AS f
           |  FROM csc FULL OUTER JOIN tsc ON csc.doc_id = tsc.doc_id),
           |raw AS (SELECT doc_id, greatest(c, f) + 0.3 * (c + f - greatest(c, f)) AS r
           |  FROM allsc)
           |SELECT doc_id, round(r, 4) AS score FROM raw
           |ORDER BY r DESC, doc_id ASC LIMIT 20""".stripMargin,
      "fts57_multi_match_most" ->
        s"""WITH doc AS (SELECT doc_id, lang, $tokExpr AS ck,
           |  list_filter(regexp_split_to_array(lower(source || ' ' || lang),'[^a-z0-9]+'),
           |              x -> length(x)>0) AS tk FROM documents),
           |cs AS (SELECT count(*) AS n, sum(len(ck)) * 1.0 / count(*) AS avgdl FROM doc),
           |fd AS (SELECT doc_id, cast(len(tk) AS bigint) AS fdl, tk FROM doc WHERE len(tk) > 0),
           |fs AS (SELECT count(*) AS n, sum(fdl) * 1.0 / count(*) AS avgdl FROM fd),
           |ctf AS (SELECT doc_id, dl, term, count(*) AS tf
           |        FROM (SELECT doc_id, cast(len(ck) AS bigint) AS dl, unnest(ck) AS term FROM doc)
           |        WHERE term IN ('es','merge') GROUP BY 1,2,3),
           |cdf AS (SELECT term, count(*) AS df FROM ctf GROUP BY 1),
           |csc AS (SELECT doc_id, sum(
           |    ln(1.0 + (cs.n - cdf.df + 0.5)/(cdf.df + 0.5)) *
           |    (ctf.tf/(ctf.tf + 1.2*(0.25 + 0.75*ctf.dl/cs.avgdl)))) AS sc
           |  FROM ctf JOIN cdf USING (term) CROSS JOIN cs GROUP BY doc_id),
           |ttf AS (SELECT doc_id, fdl, term, count(*) AS tf
           |        FROM (SELECT doc_id, fdl, unnest(tk) AS term FROM fd)
           |        WHERE term IN ('es','merge') GROUP BY 1,2,3),
           |tdf AS (SELECT term, count(*) AS df FROM ttf GROUP BY 1),
           |tsc AS (SELECT doc_id, sum(
           |    ln(1.0 + (fs.n - tdf.df + 0.5)/(tdf.df + 0.5)) *
           |    (ttf.tf/(ttf.tf + 1.2*(0.25 + 0.75*ttf.fdl/fs.avgdl)))) AS sc
           |  FROM ttf JOIN tdf USING (term) CROSS JOIN fs GROUP BY doc_id),
           |allsc AS (SELECT coalesce(csc.doc_id, tsc.doc_id) AS doc_id,
           |    coalesce(csc.sc, 0) + coalesce(tsc.sc, 0) AS r
           |  FROM csc FULL OUTER JOIN tsc ON csc.doc_id = tsc.doc_id)
           |SELECT a.doc_id, round(a.r, 4) AS score
           |FROM allsc a JOIN documents d ON a.doc_id = d.doc_id
           |WHERE d.lang = 'es'
           |ORDER BY a.r DESC, a.doc_id ASC LIMIT 20""".stripMargin,
      // per-field analyzer oracle: title = first 6 content tokens, analyzed
      // lowercase with stopword 'the' removed (fdl = survivors) and synonym
      // merge→combine INJECTED into the indexed token list; most_fields =
      // content score + 2×title score (field boost), per-field statistics
      "fts75_analyzers" ->
        s"""WITH doc AS (SELECT doc_id, $tokExpr AS ck FROM documents),
           |ft AS (SELECT doc_id, ck,
           |         list_filter(list_slice(ck, 1, 6), t -> t <> 'the') AS st FROM doc),
           |fd AS (SELECT doc_id, cast(len(st) AS bigint) AS fdl,
           |         list_concat(st,
           |           list_transform(list_filter(st, t -> t = 'merge'), t -> 'combine')) AS it
           |       FROM ft WHERE len(st) > 0),
           |cs AS (SELECT count(*) AS n, sum(len(ck)) * 1.0 / count(*) AS avgdl FROM doc),
           |fs AS (SELECT count(*) AS n, sum(fdl) * 1.0 / count(*) AS avgdl FROM fd),
           |ctf AS (SELECT doc_id, dl, term, count(*) AS tf
           |        FROM (SELECT doc_id, cast(len(ck) AS bigint) AS dl, unnest(ck) AS term FROM doc)
           |        WHERE term IN ('combine','scan') GROUP BY 1,2,3),
           |cdf AS (SELECT term, count(*) AS df FROM ctf GROUP BY 1),
           |csc AS (SELECT doc_id, sum(
           |    ln(1.0 + (cs.n - cdf.df + 0.5)/(cdf.df + 0.5)) *
           |    (ctf.tf/(ctf.tf + 1.2*(0.25 + 0.75*ctf.dl/cs.avgdl)))) AS sc
           |  FROM ctf JOIN cdf USING (term) CROSS JOIN cs GROUP BY doc_id),
           |ttf AS (SELECT doc_id, fdl, term, count(*) AS tf
           |        FROM (SELECT doc_id, fdl, unnest(it) AS term FROM fd)
           |        WHERE term IN ('combine','scan') GROUP BY 1,2,3),
           |tdf AS (SELECT term, count(*) AS df FROM ttf GROUP BY 1),
           |tsc AS (SELECT doc_id, sum(
           |    2.0 * ln(1.0 + (fs.n - tdf.df + 0.5)/(tdf.df + 0.5)) *
           |    (ttf.tf/(ttf.tf + 1.2*(0.25 + 0.75*ttf.fdl/fs.avgdl)))) AS sc
           |  FROM ttf JOIN tdf USING (term) CROSS JOIN fs GROUP BY doc_id),
           |allsc AS (SELECT coalesce(csc.doc_id, tsc.doc_id) AS doc_id,
           |    coalesce(csc.sc, 0) + coalesce(tsc.sc, 0) AS r
           |  FROM csc FULL OUTER JOIN tsc ON csc.doc_id = tsc.doc_id)
           |SELECT doc_id, round(r, 4) AS score
           |FROM allsc
           |ORDER BY r DESC, doc_id ASC LIMIT 20""".stripMargin,
      // multi-token synonym: docs whose title (first 6 text tokens) carry
      // the trigger 'query' match the injected phrase "zzqa zzqb"; phrase
      // frequency = trigger occurrences; both phrase terms share df = the
      // trigger's doc count, scored idfSum × tfNorm over the FIELD's stats
      "fts77_syn_graph_phrase" ->
        s"""WITH doc AS (SELECT doc_id, $tokExpr AS ck FROM documents),
           |ft AS (SELECT doc_id, list_slice(ck, 1, 6) AS st FROM doc),
           |fd AS (SELECT doc_id, cast(len(st) AS bigint) AS fdl,
           |         cast(len(list_filter(st, t -> t = 'query')) AS bigint) AS pf
           |       FROM ft WHERE len(st) > 0),
           |fs AS (SELECT count(*) AS n, sum(fdl) * 1.0 / count(*) AS avgdl FROM fd),
           |df AS (SELECT count(*) AS d FROM fd WHERE pf > 0),
           |sc AS (SELECT doc_id,
           |         2.0 * ln(1.0 + (fs.n - df.d + 0.5)/(df.d + 0.5)) *
           |         (pf/(pf + 1.2*(0.25 + 0.75*fdl/fs.avgdl))) AS r
           |       FROM fd CROSS JOIN fs CROSS JOIN df WHERE pf > 0)
           |SELECT doc_id, round(r, 4) AS score FROM sc
           |ORDER BY r DESC, doc_id ASC LIMIT 20""".stripMargin,
      // parallel unnest zips the token list with its 0-based positions —
      // the independent formulation of the analyzer's (position, token)
      // stream
      "fts58_analyze" ->
        s"""WITH d AS (SELECT $tokExpr AS tk FROM documents WHERE doc_id = 42)
           |SELECT cast(unnest(range(len(tk))) AS bigint) AS position,
           |       unnest(tk) AS token FROM d""".stripMargin,
      // variant set = the ≤50 lexicographically smallest dictionary terms
      // on the stem; a doc's score is its best matching variant's
      // distinct-term BM25 sum (stats corpus-wide, as the engine's)
      "fts59_phrase_prefix" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) AS bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |exp AS (SELECT term FROM (SELECT DISTINCT unnest(tk) AS term FROM doc)
           |        WHERE term LIKE 's%' ORDER BY term LIMIT 50),
           |pm AS (SELECT DISTINCT d.doc_id, e.term AS last
           |       FROM doc d, exp e
           |       WHERE len(list_filter(generate_series(1, len(d.tk)-1),
           |             i -> d.tk[i] = 'data' AND d.tk[i+1] = e.term)) > 0),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term = 'data' OR term IN (SELECT term FROM exp)
           |       GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |sc AS (SELECT doc_id, term,
           |       ln(1.0 + (stats.n - dfc.df + 0.5)/(dfc.df + 0.5)) *
           |       (tf.tf/(tf.tf + 1.2*(0.25 + 0.75*tf.dl/stats.avgdl))) AS s
           |       FROM tf JOIN dfc USING (term) CROSS JOIN stats),
           |vs AS (SELECT pm.doc_id, sd.s + se.s AS v
           |       FROM pm JOIN sc sd ON sd.doc_id = pm.doc_id AND sd.term = 'data'
           |               JOIN sc se ON se.doc_id = pm.doc_id AND se.term = pm.last),
           |raw AS (SELECT doc_id, max(v) AS r FROM vs GROUP BY doc_id)
           |SELECT doc_id, round(r, 4) AS score FROM raw
           |ORDER BY r DESC, doc_id ASC LIMIT 20""".stripMargin,
      "fts60_termvectors" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |d42 AS (SELECT unnest(tk) AS term FROM dt WHERE doc_id = 42),
           |tv AS (SELECT term, cast(count(*) AS bigint) AS tf FROM d42 GROUP BY 1),
           |ex AS (SELECT doc_id, unnest(tk) AS term FROM dt),
           |st AS (SELECT term, cast(count(DISTINCT doc_id) AS bigint) AS df,
           |       cast(count(*) AS bigint) AS cf FROM ex GROUP BY 1)
           |SELECT tv.term, tv.tf, st.df, st.cf FROM tv JOIN st USING (term)
           |ORDER BY tv.term""".stripMargin,
      // field-local phrase: adjacency verified in the title token list;
      // stats (docCount, avgdl, df) and tf/fdl all field-local
      "fts61_phrase_field" ->
        s"""WITH doc AS (SELECT doc_id,
           |  list_filter(regexp_split_to_array(
           |    lower(source || ' ' || lang || ' ' || substring(text, 1, 20)),
           |    '[^a-z0-9]+'), x -> length(x)>0) AS tk FROM documents),
           |fd AS (SELECT doc_id, cast(len(tk) AS bigint) AS fdl, tk FROM doc
           |       WHERE len(tk) > 0),
           |fs AS (SELECT count(*) AS n, sum(fdl) * 1.0 / count(*) AS avgdl FROM fd),
           |pm AS (SELECT doc_id FROM fd
           |       WHERE len(list_filter(generate_series(1, len(tk)-1),
           |             i -> tk[i] = 'src3' AND tk[i+1] = 'de')) > 0),
           |tf AS (SELECT doc_id, fdl, term, count(*) AS tf
           |       FROM (SELECT doc_id, fdl, unnest(tk) AS term FROM fd)
           |       WHERE term IN ('src3','de') GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |raw AS (SELECT tf.doc_id, sum(
           |    ln(1.0 + (fs.n - dfc.df + 0.5)/(dfc.df + 0.5)) *
           |    (tf.tf/(tf.tf + 1.2*(0.25 + 0.75*tf.fdl/fs.avgdl)))) AS r
           |  FROM tf JOIN dfc USING (term) CROSS JOIN fs
           |  WHERE tf.doc_id IN (SELECT doc_id FROM pm) GROUP BY 1)
           |SELECT doc_id, round(r, 4) AS score FROM raw
           |ORDER BY r DESC, doc_id ASC LIMIT 20""".stripMargin,
      // blended df = max across fields; idf vs index docCount; per-token
      // dis_max across fields (tb 0.2); tokens sum
      "fts62_multi_match_cross" ->
        s"""WITH doc AS (SELECT doc_id, $tokExpr AS ck,
           |  list_filter(regexp_split_to_array(lower(source || ' ' || lang),'[^a-z0-9]+'),
           |              x -> length(x)>0) AS tk FROM documents),
           |cs AS (SELECT count(*) AS n, sum(len(ck)) * 1.0 / count(*) AS avgdl FROM doc),
           |fd AS (SELECT doc_id, cast(len(tk) AS bigint) AS fdl, tk FROM doc WHERE len(tk) > 0),
           |fs AS (SELECT sum(fdl) * 1.0 / count(*) AS avgdl FROM fd),
           |ctf AS (SELECT doc_id, dl, term, count(*) AS tf
           |        FROM (SELECT doc_id, cast(len(ck) AS bigint) AS dl, unnest(ck) AS term FROM doc)
           |        WHERE term IN ('merge','src3') GROUP BY 1,2,3),
           |ttf AS (SELECT doc_id, fdl, term, count(*) AS tf
           |        FROM (SELECT doc_id, fdl, unnest(tk) AS term FROM fd)
           |        WHERE term IN ('merge','src3') GROUP BY 1,2,3),
           |cdf AS (SELECT term, count(*) AS df FROM ctf GROUP BY 1),
           |tdf AS (SELECT term, count(*) AS df FROM ttf GROUP BY 1),
           |bl AS (SELECT t.term, greatest(coalesce(cdf.df, 0), coalesce(tdf.df, 0)) AS dfb
           |       FROM (SELECT 'merge' AS term UNION ALL SELECT 'src3') t
           |       LEFT JOIN cdf USING (term) LEFT JOIN tdf USING (term)),
           |sc AS (
           |  SELECT ctf.doc_id, ctf.term,
           |    ln(1.0 + (cs.n - bl.dfb + 0.5)/(bl.dfb + 0.5)) *
           |    (ctf.tf/(ctf.tf + 1.2*(0.25 + 0.75*ctf.dl/cs.avgdl))) AS s
           |  FROM ctf JOIN bl USING (term) CROSS JOIN cs
           |  UNION ALL
           |  SELECT ttf.doc_id, ttf.term,
           |    ln(1.0 + (cs.n - bl.dfb + 0.5)/(bl.dfb + 0.5)) *
           |    (ttf.tf/(ttf.tf + 1.2*(0.25 + 0.75*ttf.fdl/fs.avgdl))) AS s
           |  FROM ttf JOIN bl USING (term) CROSS JOIN cs CROSS JOIN fs),
           |tokg AS (SELECT doc_id, term, max(s) + 0.2 * (sum(s) - max(s)) AS ts
           |         FROM sc GROUP BY 1,2),
           |raw AS (SELECT doc_id, sum(ts) AS r FROM tokg GROUP BY 1)
           |SELECT doc_id, round(r, 4) AS score FROM raw
           |ORDER BY r DESC, doc_id ASC LIMIT 20""".stripMargin,
      // dense docIds equal doc_id here (identity sort order == zero-padded
      // doc_id order), so shard = doc_id // docsPerShard; postings = per
      // doc distinct content terms + the two keyword terms; blocks =
      // Σ ⌈per-(term,shard) postings / 128⌉
      "fts63_shard_stats" ->
        s"""WITH dt AS (SELECT doc_id, lang, $tokExpr AS tk FROM documents),
           |base AS (SELECT doc_id, doc_id // 128 AS shard,
           |         cast(len(tk) AS bigint) AS dl FROM dt),
           |ex AS (SELECT doc_id, unnest(list_distinct(tk)) AS term FROM dt
           |       UNION ALL SELECT doc_id, 'lang:' || lang FROM dt
           |       UNION ALL SELECT doc_id, 'repo:docs' FROM dt),
           |ps AS (SELECT doc_id // 128 AS shard, term, count(*) AS c
           |       FROM ex GROUP BY 1, 2),
           |d AS (SELECT shard, cast(count(*) AS bigint) AS num_docs,
           |      cast(sum(dl) AS bigint) AS sum_dl FROM base GROUP BY 1),
           |p AS (SELECT shard, cast(sum(c) AS bigint) AS num_postings,
           |      cast(sum(ceil(c / 128.0)) AS bigint) AS num_blocks FROM ps GROUP BY 1)
           |SELECT d.shard, d.num_docs, p.num_postings, p.num_blocks, d.sum_dl
           |FROM d JOIN p USING (shard) ORDER BY d.shard""".stripMargin,
      // ES term query on an array field: filter = list containment;
      // statistics stay index-wide (keyword filters never affect idf/avgdl)
      "fts64_keyword_array" ->
        s"""WITH dt AS (SELECT doc_id, lang, source, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, lang, source, cast(len(tk) AS bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, lang, source, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, lang, source, dl, unnest(tk) AS term FROM doc)
           |       WHERE term = 'merge' GROUP BY 1,2,3,4,5),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |raw AS (SELECT doc_id, sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))) AS r
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |WHERE list_contains([tf.lang, tf.source], 'src3')
           |GROUP BY doc_id)
           |SELECT doc_id, round(r, 4) AS score FROM raw
           |ORDER BY r DESC, doc_id ASC LIMIT 20""".stripMargin,
      "fts65_facets_array" ->
        s"""WITH dt AS (SELECT doc_id, lang, source, $tokExpr AS tk FROM documents),
           |m AS (SELECT doc_id, lang, source FROM dt WHERE list_contains(tk, 'merge')),
           |v AS (SELECT doc_id, unnest(list_distinct([lang, source])) AS value FROM m)
           |SELECT value, count(*) AS cnt FROM v GROUP BY 1
           |ORDER BY cnt DESC, value ASC LIMIT 10""".stripMargin,
      // ES nested query: same-element clause conjunction over the
      // synthesized 2-element array [(tk[1], lang), (tk[3], source)] — the
      // filter gates candidates only, statistics stay index-wide
      "fts66_nested" ->
        s"""WITH dt AS (SELECT doc_id, lang, source, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) AS bigint) AS dl, tk,
           |        ((tk[1] = 'the' AND lang = 'en') OR (tk[3] = 'the' AND source = 'en'))
           |          AS nest_ok FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, nest_ok, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, nest_ok, unnest(tk) AS term FROM doc)
           |       WHERE term = 'merge' GROUP BY 1,2,3,4),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |raw AS (SELECT doc_id, sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))) AS r
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |WHERE tf.nest_ok GROUP BY doc_id)
           |SELECT doc_id, round(r, 4) AS score FROM raw
           |ORDER BY r DESC, doc_id ASC LIMIT 20""".stripMargin,
      // ES nested terms aggregation: bucket unit = nested element (each
      // element of each matching parent counts once; null names skipped)
      "fts67_nested_agg" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |m AS (SELECT doc_id, tk FROM dt WHERE list_contains(tk, 'merge')),
           |v AS (SELECT unnest([tk[1], tk[3]]) AS value FROM m)
           |SELECT value, count(*) AS cnt FROM v WHERE value IS NOT NULL GROUP BY 1
           |ORDER BY cnt DESC, value ASC LIMIT 10""".stripMargin,
      // span_near(inOrder=false): |p_a - p_b| - 1 <= 3 at distinct positions
      "fts68_span_near" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |ppos AS (SELECT doc_id, unnest(tk) AS term, generate_subscripts(tk, 1) AS p FROM dt),
           |pmatch AS (SELECT DISTINCT a.doc_id FROM ppos a JOIN ppos b
           |           ON a.doc_id = b.doc_id AND a.term = 'data' AND b.term = 'merge'
           |           AND a.p <> b.p AND abs(a.p - b.p) - 1 <= 3),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term IN ('data','merge') GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT doc_id, round(sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |WHERE doc_id IN (SELECT doc_id FROM pmatch)
           |GROUP BY doc_id
           |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin,
      // span_first: an occurrence within the first 20 positions
      // (generate_subscripts is 1-based; engine positions 0-based → p <= 20)
      "fts69_span_first" ->
        s"""WITH dt AS (SELECT doc_id, $tokExpr AS tk FROM documents),
           |doc AS (SELECT doc_id, cast(len(tk) as bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |ppos AS (SELECT doc_id, unnest(tk) AS term, generate_subscripts(tk, 1) AS p FROM dt),
           |pmatch AS (SELECT DISTINCT doc_id FROM ppos WHERE term = 'data' AND p <= 20),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term = 'data' GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT doc_id, round(sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))), 4) AS score
           |FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats
           |WHERE doc_id IN (SELECT doc_id FROM pmatch)
           |GROUP BY doc_id
           |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin,
      // ES 8 knn with lang:en pre-filter — exact cosine top-k
      "fts70_knn" ->
        """WITH e AS (SELECT vec_id, cast(embedding AS DOUBLE[]) AS v FROM embeddings),
          |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
          |SELECT d.doc_id, round(list_cosine_similarity(e.v, q.qv), 3) AS cos
          |FROM documents d JOIN e ON d.doc_id = e.vec_id CROSS JOIN q
          |WHERE d.lang = 'en'
          |ORDER BY list_cosine_similarity(e.v, q.qv) DESC, d.doc_id ASC
          |LIMIT 20""".stripMargin,
      // exhaustive-beam HNSW ≡ exact filtered top-k (the graph-path gate)
      "fts76_knn_hnsw" ->
        """WITH e AS (SELECT vec_id, cast(embedding AS DOUBLE[]) AS v FROM embeddings),
          |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
          |SELECT d.doc_id, round(list_cosine_similarity(e.v, q.qv), 3) AS cos
          |FROM documents d JOIN e ON d.doc_id = e.vec_id CROSS JOIN q
          |WHERE d.lang = 'en'
          |ORDER BY list_cosine_similarity(e.v, q.qv) DESC, d.doc_id ASC
          |LIMIT 20""".stripMargin,
      // IVF with all cells probed ≡ exact top-k (the pruning-path gate)
      "fts71_knn_ivf" ->
        """WITH e AS (SELECT vec_id, cast(embedding AS DOUBLE[]) AS v FROM embeddings),
          |q AS (SELECT v AS qv FROM e WHERE vec_id = 7)
          |SELECT d.doc_id, round(list_cosine_similarity(e.v, q.qv), 3) AS cos
          |FROM documents d JOIN e ON d.doc_id = e.vec_id CROSS JOIN q
          |ORDER BY list_cosine_similarity(e.v, q.qv) DESC, d.doc_id ASC
          |LIMIT 15""".stripMargin,
      // percolate: per registered query, its bool-context match set
      "fts72_percolate" ->
        s"""WITH dt AS (SELECT doc_id, lang, $tokExpr AS tk FROM documents),
           |ppos AS (SELECT doc_id, unnest(tk) AS term, generate_subscripts(tk, 1) AS p FROM dt),
           |m1 AS (SELECT DISTINCT a.doc_id, 'q_merge_data' AS query_id
           |       FROM ppos a JOIN ppos b ON a.doc_id = b.doc_id
           |       AND a.term = 'data' AND b.term = 'merge' AND b.p = a.p + 1),
           |m2 AS (SELECT doc_id, 'q_batch' AS query_id FROM dt
           |       WHERE lang = 'en' AND list_contains(tk, 'batch')),
           |m3 AS (SELECT doc_id, 'q_noindex' AS query_id FROM dt
           |       WHERE list_contains(tk, 'query') AND NOT list_contains(tk, 'index'))
           |SELECT doc_id, query_id FROM m1
           |UNION ALL SELECT doc_id, query_id FROM m2
           |UNION ALL SELECT doc_id, query_id FROM m3""".stripMargin,
      // hybrid RRF: both branch rankings with the engine's exact tie-break
      // (score desc, doc_id asc), fused 1/(60+rank) over top-50 windows
      "fts73_hybrid_rrf" ->
        s"""WITH e AS (SELECT vec_id, cast(embedding AS DOUBLE[]) AS v FROM embeddings),
           |base AS (SELECT d.doc_id, d.text, e.v FROM documents d
           |         JOIN e ON d.doc_id = e.vec_id),
           |dt AS (SELECT doc_id, v,
           |  list_filter(regexp_split_to_array(lower(text),'[^a-z0-9]+'), x -> length(x)>0)
           |    AS tk FROM base),
           |doc AS (SELECT doc_id, v, cast(len(tk) AS bigint) AS dl, tk FROM dt),
           |stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM doc),
           |tf AS (SELECT doc_id, dl, term, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM doc)
           |       WHERE term = 'merge' GROUP BY 1,2,3),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |scored AS (SELECT doc_id, sum(
           |  ln(1.0 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5)) *
           |  (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)))) AS s
           |  FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN stats GROUP BY doc_id),
           |trank AS (SELECT doc_id, r FROM (
           |  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS r
           |  FROM scored) WHERE r <= 50),
           |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
           |vrank AS (SELECT doc_id, r FROM (
           |  SELECT doc_id, row_number() OVER (
           |    ORDER BY list_cosine_similarity(v, qv) DESC, doc_id ASC) AS r
           |  FROM doc CROSS JOIN q) WHERE r <= 50),
           |fused AS (SELECT coalesce(t.doc_id, u.doc_id) AS doc_id,
           |  coalesce(1.0/(60 + t.r), 0) + coalesce(1.0/(60 + u.r), 0) AS rrf
           |  FROM trank t FULL OUTER JOIN vrank u ON t.doc_id = u.doc_id)
           |SELECT doc_id, round(rrf, 6) AS rrf FROM fused
           |ORDER BY rrf DESC, doc_id ASC LIMIT 15""".stripMargin
    )
  }
}
