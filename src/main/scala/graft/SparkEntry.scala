package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.data.{Courses, Pages}
import graft.pipeline.{Catalog, CourseEngine, SpatialJoin}
import graft.{functions => gf}

/**
 * Driver contract (SURVEY.md §7): `entry` = flagship spatial join;
 * `queries` = one entry per implemented operator (SURVEY.md §2);
 * `oracleSql` = DuckDB-equivalent SQL for every relationally-expressible
 * query (geo/hash operators are covered by scalatest + kernel fixtures
 * instead, as the contract permits).
 *
 * Oracle-parity rules used throughout (so value hashes match DuckDB):
 *  - money/quantity sums go through DECIMAL(18,2) (exact, order-independent)
 *    then CAST to DOUBLE;
 *  - double arithmetic keeps the exact same expression shape on both sides;
 *  - every aggregate/computed column is aliased identically on both sides.
 */
object SparkEntry {

  /** Pages amplification for correctness queries (bench uses its own). */
  final val Amp = 4
  /** Synthetic course count for correctness queries. */
  final val NCourses = 60

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  private def pages(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.registerAll(spark)
    Pages.pages(spark, sfDir, Amp)
  }

  private def boundsDf(spark: SparkSession): DataFrame = {
    graft.functions.registerAll(spark)
    CourseEngine.boundaries(Courses.itemsDf(spark, NCourses))
  }

  private def itemsDf(spark: SparkSession): DataFrame = {
    graft.functions.registerAll(spark)
    Courses.itemsDf(spark, NCourses)
  }

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Flagship: page -> containing course hole + tile assignments, sf0.001.
    * Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val p = pages(spark, sfDir)
    val b = boundsDf(spark)
    SpatialJoin.assignPages(p, SpatialJoin.coverDf(b), b)
      .select(col("url"), col("clubId"), col("courseId"), col("holeNumber"),
        gf.tile_x(col("lon"), lit(15)).as("tx"),
        gf.tile_y(col("lat"), lit(15)).as("ty"),
        gf.quadkey(lit(15), gf.tile_x(col("lon"), lit(15)), gf.tile_y(col("lat"), lit(15))).as("qk"),
        gf.cell_id(col("lon"), col("lat"), lit(15)).as("cell"))
  }

  // =========================================================================
  // Query suite
  // =========================================================================
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- scans / aggregations (S1-analog, A1-A5 relational forms) ----
    "q01_pricing_summary" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("n_rows"))
    }),

    "q02_filter_project" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01") && col("l_shipdate") < lit("1996-01-01") &&
          col("l_quantity") > 30)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    }),

    // ---- joins (J2/J3 relational forms) ----
    "q03_join_agg" -> ((s, d) => {
      val c = t(s, d, "customer"); val n = t(s, d, "nation"); val r = t(s, d, "region")
      val o = t(s, d, "orders")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
    }),

    "q04_semi_join" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
    }),

    "q05_anti_join" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
    }),

    // ---- windows / sorts / limits (W1-W4) ----
    "q06_window_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("rnk"))
    }),

    "q07_sort_limit" -> ((s, d) => {
      t(s, d, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    }),

    "q11_moving_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-4, 4)
      t(s, d, "events")
        .withColumn("mov_avg", round(avg(col("value")).over(w), 6))
        .select(col("user_id"), col("event_id"), col("mov_avg"))
    }),

    // ---- set operations (U1/U2 relational forms) ----
    "q08_set_ops" -> ((s, d) => {
      val custNations = t(s, d, "customer").select(col("c_nationkey").as("nk")).distinct()
      val suppNations = t(s, d, "supplier").select(col("s_nationkey").as("nk")).distinct()
      custNations.except(suppNations).withColumn("tag", lit("cust_only"))
        .unionByName(custNations.intersect(suppNations).withColumn("tag", lit("both")))
    }),

    // ---- grouping sets / distinct ----
    "q09_rollup" -> ((s, d) => {
      t(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast("double").as("total"))
    }),

    "q10_distinct_agg" -> ((s, d) => {
      t(s, d, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_cust"))
    }),

    // ---- scalar funcs: json / datetime (F8, F11-adjacent) ----
    "q12_json_extract" -> ((s, d) => {
      t(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
    }),

    "q13_date_trunc" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast("double").as("total"))
    }),

    // ---- tiles / cells over the pages table (R1/R2 assignment math) ----
    "q14_tile_assign" -> ((s, d) => {
      pages(s, d).select(col("page_id"),
        gf.tile_x(col("lon"), lit(15)).as("tx"),
        gf.tile_y(col("lat"), lit(15)).as("ty"))
    }),

    "q15_cell_xy" -> ((s, d) => {
      val cell = gf.cell_id(col("lon"), col("lat"), lit(15))
      pages(s, d).select(col("page_id"),
        gf.cell_x(cell).as("cx"),
        gf.cell_y(cell).as("cy"))
    }),

    // ---- PIP against an axis-aligned polygon (P7 with a SQL oracle) ----
    "q16_pip_rect" -> ((s, d) => {
      graft.functions.registerAll(s)
      pages(s, d)
        .filter(expr(
          """st_contains(make_polygon(array(
            |  struct(116.0d AS x, 39.5d AS y), struct(117.0d AS x, 39.5d AS y),
            |  struct(117.0d AS x, 40.5d AS y), struct(116.0d AS x, 40.5d AS y))),
            | lon, lat)""".stripMargin))
        .select(col("page_id"), col("url"))
    }),

    // ---- event-time tumbling window over warc_ts (T-suite batch form) ----
    "q17_tumbling_window" -> ((s, d) => {
      pages(s, d)
        .groupBy(window(col("warc_ts"), "1 hour").getField("start").as("wstart"), col("lang"))
        .agg(count(lit(1)).as("n"))
    }),

    "q18_cube" -> ((s, d) => {
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast("double").as("total"))
    }),

    // ---- gap sessionization over the events stream table ----
    "q19_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            expr("unix_micros(CAST(ts AS TIMESTAMP)) - unix_micros(CAST(prev_ts AS TIMESTAMP))")
              > 1800000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_sess")).over(byUser))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("t_start"), max(col("ts")).as("t_end"))
    }),

    // ---- text pipeline: dedup / stats / quality (training-data ops) ----
    "q20_dedup_exact" -> ((s, d) => {
      t(s, d, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .select(col("keep_id"), col("n_dups"))
    }),

    "q21_token_stats" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("n_chars"))
    }),

    "q22_quality_score" -> ((s, d) => {
      val nTokens = size(split(trim(col("text")), "\\s+")).cast("long")
      val nChars = length(col("text")).cast("long")
      val nSpaces = (length(col("text")) - length(regexp_replace(col("text"), " ", ""))).cast("long")
      t(s, d, "documents")
        .select(col("doc_id"), nTokens.as("n_tokens"), nChars.as("n_chars"),
          round((nChars - nSpaces).cast("double") / nTokens.cast("double"), 6).as("avg_token_len"),
          (nTokens >= 20 && nTokens <= 1000).as("is_quality"))
    }),

    "q28_bpe_tokens" -> ((s, d) => {
      // BPE-ish pre-tokenizer (GPT-2-style regex, ASCII form): contractions,
      // space-prefixed words / numbers / punctuation runs, whitespace runs —
      // the token counter a training-data pipeline budgets with
      val pat = "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9'\\s]+|\\s+"
      t(s, d, "documents").select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long").as("n_bpe_tokens"))
    }),

    "q29_stopword_ratio" -> ((s, d) => {
      val stop = Seq("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")
      val toks = split(trim(col("text")), "\\s+")
      val nStop = size(filter(toks, tk => tk.isInCollection(stop))).cast("long")
      t(s, d, "documents").select(col("doc_id"),
        nStop.as("n_stop"),
        round(nStop.cast("double") / size(toks).cast("double"), 6).as("stop_ratio"))
    }),

    // ---- embeddings: exact cosine near-dup pairs (brute force = the
    // correctness anchor; q31's LSH buckets are the 10^12-row scale path) ----
    "q32_embed_dup_pairs" -> ((s, d) => {
      graft.functions.registerAll(s)
      val e = t(s, d, "embeddings")
      val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
      a.join(broadcast(b), col("vec_a") < col("vec_b"))
        .filter(gf.cosine_sim(col("ea"), col("eb")) >= 0.451)
        .select(col("vec_a"), col("vec_b"))
    }),

    // ---- text pipeline: hash-based (no SQL oracle; scalatest-covered) ----
    "q23_fingerprint_dedup" -> ((s, d) => {
      graft.functions.registerAll(s)
      t(s, d, "documents")
        .groupBy(gf.fingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .select(col("keep_id"), col("n_dups"), col("fp"))
    }),

    "q24_langid" -> ((s, d) => {
      graft.functions.registerAll(s)
      // n-gram heuristic language id: score against tiny per-language
      // stopword profiles, predict argmax, report confusion counts
      val profiles = Seq(
        "en" -> Seq("the", "and", "of", "to", "a"),
        "es" -> Seq("el", "la", "de", "que", "y"),
        "de" -> Seq("der", "die", "und", "das", "ist"),
        "fr" -> Seq("le", "la", "et", "les", "des"))
      // score each profile ONCE into its own column, then argmax over the
      // materialized scores — an inlined when-chain fold would duplicate
      // every score expression 4x per level (exponential re-evaluation)
      val langs = profiles.map(_._1)
      val scored = profiles.foldLeft(
        t(s, d, "documents").withColumn("toks", split(trim(lower(col("text"))), "\\s+"))) {
        case (df, (lang, words)) =>
          df.withColumn(s"s_$lang",
            size(array_intersect(col("toks"), array(words.map(lit(_)): _*))))
      }
      val best = greatest(langs.map(l => col(s"s_$l")): _*)
      // first profile hitting the max wins — same tie-break as a
      // strictly-greater scan in profile order
      val pred = when(best <= 0, lit("und")).otherwise(
        langs.foldRight(lit("und"): Column) { (lang, acc) =>
          when(col(s"s_$lang") === best, lit(lang)).otherwise(acc)
        })
      scored
        .withColumn("pred_lang", pred)
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
    }),

    "q25_minhash_pairs" -> ((s, d) => {
      graft.functions.registerAll(s)
      // MinHash + LSH banding near-dup pairs: shingle -> 64-slot signature
      // -> 16 bands of 4 -> band-key equi-join -> exact jaccard >= 0.5
      val docs = t(s, d, "documents").select(col("doc_id"),
        gf.word_shingles(col("text"), lit(3)).as("sh"))
        .withColumn("sig", gf.minhash(col("sh"), lit(64), lit(7L)))
      // candidate pairs deduped on ids ONLY (never shuffle the shingle
      // arrays), then features re-joined for exact verification
      val banded = docs.select(col("doc_id"), explode(gf.lsh_bands(col("sig"), lit(4))).as("band"))
      val a = banded.as("a"); val b = banded.as("b")
      val pairs = a.join(b, col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val feat = docs.select(col("doc_id"), col("sh"))
      pairs
        .join(feat.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
        .join(feat.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
        .withColumn("jaccard",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    "q26_simhash_pairs" -> ((s, d) => {
      graft.functions.registerAll(s)
      // SimHash near-dup: 64-bit simhash, band on 4x16-bit chunks, verify
      // hamming distance <= 8
      val docs = t(s, d, "documents").select(col("doc_id"),
        gf.simhash(gf.word_shingles(col("text"), lit(1))).as("sh"))
      val banded = docs.select(col("doc_id"), col("sh"), explode(array(
        (0 until 4).map(i => concat(lit(i), lit(":"),
          (shiftright(col("sh"), i * 16).bitwiseAND(lit(0xffffL))))): _*)).as("chunk"))
      val a = banded.as("a"); val b = banded.as("b")
      val pairs = a.join(b, col("a.chunk") === col("b.chunk") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      pairs
        .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
        .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
        .withColumn("hamming", gf.hamming_dist(col("sh_a"), col("sh_b")))
        .filter(col("hamming") <= 8)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
    }),

    "q27_ngram_jaccard" -> ((s, d) => {
      graft.functions.registerAll(s)
      // n-gram Jaccard near-dup over hashed char 5-grams (sorted long
      // arrays, no gram strings). Candidates come from a document-
      // frequency-filtered inverted index: only RARE grams (2 <= df <= 10)
      // key the self-join, so common-substring grams can't hot-spot it.
      // Verification = single merge-walk jaccard over the long arrays.
      val docs = t(s, d, "documents").select(col("doc_id"),
        gf.hashed_char_shingles(col("text"), lit(5)).as("grams"))
      // near-dup docs share MANY rare grams; sampling every 16th gram of
      // the index side keeps the inverted index 16x smaller with ~no
      // recall loss (a near-dup pair still shares >= 1 sampled rare gram)
      val inv = docs.select(col("doc_id"),
        explode(filter(col("grams"), (g, i) => i % 16 === 0)).as("g"))
      val rare = inv.groupBy(col("g")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= 10)
      val keyed = inv.join(rare.select(col("g")), Seq("g"))
      val a = keyed.as("a"); val b = keyed.as("b")
      val pairs = a.join(b, col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      pairs
        .join(docs.select(col("doc_id").as("doc_a"), col("grams").as("ga")), Seq("doc_a"))
        .join(docs.select(col("doc_id").as("doc_b"), col("grams").as("gb")), Seq("doc_b"))
        .withColumn("jaccard", gf.sorted_jaccard(col("ga"), col("gb")))
        .filter(col("jaccard") >= 0.6)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // ---- embeddings: ANN (brute-force oracle path + LSH scale path) ----
    "q30_knn_brute" -> ((s, d) => {
      graft.functions.registerAll(s)
      val emb = t(s, d, "embeddings")
      val queriesDf = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      emb.crossJoin(broadcast(queriesDf))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("sim", gf.cosine_sim(col("embedding"), col("qvec")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("rank"), col("vec_id"))
    }),

    "q31_ann_lsh" -> ((s, d) => {
      graft.functions.registerAll(s)
      // LSH-bucketed ANN (the scale path, recall < 1 by construction):
      // 4 hash tables x 8 hyperplane bits; candidates share any table's
      // bucket with the query, then exact cosine top-10 over candidates.
      val tables = array((0 until 4).map(i =>
        concat(lit(i), lit(":"), gf.hyperplane_lsh(col("embedding"), lit(8), lit(100L + i)))): _*)
      val emb = t(s, d, "embeddings").withColumn("buckets", tables)
      val flat = emb.select(col("vec_id"), col("embedding"), explode(col("buckets")).as("bucket"))
      val queriesDf = flat.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
          col("bucket").as("qbucket"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      flat.join(broadcast(queriesDf), col("bucket") === col("qbucket"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), col("embedding"), col("qvec")).distinct()
        .withColumn("sim", gf.cosine_sim(col("embedding"), col("qvec")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("rank"), col("vec_id"), round(col("sim"), 6).as("sim"))
    }),

    "q36_ann_ivf" -> ((s, d) => {
      graft.functions.registerAll(s)
      // IVF-style ANN: probe the 4 nearest of 32 inverted lists, exact
      // rank within — the clustered-index scale path beside q31's LSH
      val emb = t(s, d, "embeddings")
      val queriesDf = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      graft.pipeline.Ann.ivfTopK(emb, queriesDf, k = 10, nLists = 32, nProbe = 4)
        .select(col("query_id"), col("rank"), col("vec_id"), round(col("sim"), 6).as("sim"))
    }),

    // ---- multimodal binary columns (stub decode; scalatest-covered) ----
    "q33_media_features" -> ((s, d) => {
      import graft.pipeline.Multimodal
      Multimodal.decodeFeatures(Multimodal.withMedia(t(s, d, "documents")))
        .select(col("doc_id"), col("media_type"),
          round(element_at(col("feature"), 1).cast("double"), 6).as("f0"))
    }),

    "q34_frame_sample" -> ((s, d) => {
      import graft.pipeline.Multimodal
      Multimodal.sampleFrames(Multimodal.withMedia(t(s, d, "documents")), everyN = 2)
        .select(col("doc_id"), col("frame_idx"), length(col("frame_bytes")).as("n_bytes"))
    }),

    "q35_media_meta" -> ((s, d) => {
      import graft.pipeline.Multimodal
      Multimodal.withMedia(t(s, d, "documents"))
        .select(col("doc_id"), col("media_type"),
          col("media_meta.width").as("width"), col("media_meta.height").as("height"),
          col("media_meta.sample_rate").as("sample_rate"),
          col("media_meta.n_frames").as("n_frames"),
          col("media_meta.n_bytes").as("n_bytes"))
    }),

    // ---- geo pipeline (J4/J1/W3/A1/F4/R1/R2/J5/J6 — scalatest-covered) ----
    "q40_course_assign" -> ((s, d) => {
      val b = boundsDf(s)
      SpatialJoin.assignPages(pages(s, d), SpatialJoin.coverDf(b), b)
        .select(col("url"), col("text"), col("clubId"), col("courseId"), col("holeNumber"))
    }),

    "q41_pages_in_any" -> ((s, d) => {
      val b = boundsDf(s)
      SpatialJoin.pagesInAnyCourse(pages(s, d), SpatialJoin.coverDf(b), b)
        .select(col("url"), col("lon"), col("lat"))
    }),

    "q42_pages_outside_all" -> ((s, d) => {
      val b = boundsDf(s)
      SpatialJoin.pagesOutsideAllCourses(pages(s, d), SpatialJoin.coverDf(b), b)
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    }),

    "q43_clip_join" -> ((s, d) => {
      val items = itemsDf(s)
      CourseEngine.clippedPolygons(items, CourseEngine.boundaries(items))
        .select(col("clubId"), col("courseId"), col("holeNumber"), col("itemType"),
          round(col("clip_area"), 12).as("clip_area"))
    }),

    "q44_drawlist" -> ((s, d) => {
      val items = itemsDf(s)
      CourseEngine.drawList(items, CourseEngine.boundaries(items))
        .select(col("clubId"), col("courseId"), col("holeNumber"), col("draw_seq"),
          col("zorder"), col("itemType"), col("category"))
    }),

    "q45_viewports" -> ((s, d) => {
      CourseEngine.viewports(boundsDf(s))
    }),

    "q46_tile_masks" -> ((s, d) => {
      CourseEngine.tileMasks(boundsDf(s), zoom = 17)
    }),

    "q47_tile_reverse" -> ((s, d) => {
      SpatialJoin.tileReverseIndex(CourseEngine.tileMasks(boundsDf(s), zoom = 17))
    }),

    "q48_markers" -> ((s, d) => {
      val items = itemsDf(s)
      CourseEngine.markers(items, CourseEngine.boundaries(items))
    }),

    "q49_knn_courses" -> ((s, d) => {
      SpatialJoin.knnCourses(pages(s, d).limit(2000), boundsDf(s), k = 3)
    }),

    "q50_priority_order" -> ((s, d) => {
      val b = boundsDf(s)
      CourseEngine.priorityOrder(b, Seq(
        ("club-0001", "course-0001", 1), ("club-0001", "course-0001", 2),
        ("club-0003", "course-0003", 5), ("club-0002", "course-0002", 9),
        ("club-0000", "course-0000", 3)))
        .select(col("clubId"), col("courseId"), col("holeNumber"), col("prio"))
        .limit(50)
    })
  )

  // =========================================================================
  // DuckDB oracle SQL — identical column names + value-exact expressions.
  // =========================================================================
  private def pagesCte: String = s"WITH pages AS (${Pages.sqlView(Amp)})"

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS n_rows
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_quantity > 30""".stripMargin,

    "q03_join_agg" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q04_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,

    "q05_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,

    "q06_window_topk" ->
      """SELECT o_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) WHERE rnk <= 2""".stripMargin,

    "q07_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "q08_set_ops" ->
      """SELECT nk, 'cust_only' AS tag FROM (
        |  SELECT DISTINCT c_nationkey AS nk FROM customer
        |  EXCEPT SELECT DISTINCT s_nationkey AS nk FROM supplier)
        |UNION ALL
        |SELECT nk, 'both' AS tag FROM (
        |  SELECT DISTINCT c_nationkey AS nk FROM customer
        |  INTERSECT SELECT DISTINCT s_nationkey AS nk FROM supplier)""".stripMargin,

    "q09_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin,

    "q10_distinct_agg" ->
      """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations, count(*) AS n_cust
        |FROM customer GROUP BY c_mktsegment""".stripMargin,

    "q11_moving_avg" ->
      """SELECT user_id, event_id,
        |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 4 PRECEDING AND 4 FOLLOWING), 6) AS mov_avg
        |FROM events""".stripMargin,

    "q12_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events""".stripMargin,

    "q13_date_trunc" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1""".stripMargin,

    "q14_tile_assign" -> (pagesCte +
      """
        |SELECT page_id,
        |  CAST(floor((lon + 180.0) / 360.0 * 32768.0) AS BIGINT) AS tx,
        |  CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768.0) AS BIGINT) AS ty
        |FROM pages""".stripMargin),

    "q15_cell_xy" -> (pagesCte +
      """
        |SELECT page_id,
        |  CAST(floor((lon + 180.0) / 360.0 * 32768.0) AS BIGINT) AS cx,
        |  CAST(floor((90.0 - lat) / 180.0 * 32768.0) AS BIGINT) AS cy
        |FROM pages""".stripMargin),

    "q16_pip_rect" -> (pagesCte +
      """
        |SELECT page_id, url FROM pages
        |WHERE lon > 116.0 AND lon < 117.0 AND lat > 39.5 AND lat < 40.5""".stripMargin),

    "q17_tumbling_window" -> (pagesCte +
      """
        |SELECT date_trunc('hour', warc_ts) AS wstart, lang, count(*) AS n
        |FROM pages GROUP BY 1, 2""".stripMargin),

    "q18_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,

    "q19_sessionize" ->
      """SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(*) AS n_events, min(ts) AS t_start, max(ts) AS t_end
        |FROM (
        |  SELECT user_id, ts, event_id,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
        |  FROM (
        |    SELECT user_id, ts, event_id,
        |      CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |        THEN 1 ELSE 0 END AS new_sess
        |    FROM (
        |      SELECT user_id, ts, event_id,
        |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |      FROM events)))
        |GROUP BY user_id, session_id""".stripMargin,

    "q20_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY text""".stripMargin,

    "q21_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents""".stripMargin,

    "q22_quality_score" ->
      """SELECT doc_id, n_tokens, n_chars,
        |  round(CAST(n_chars - n_spaces AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS avg_token_len,
        |  (n_tokens >= 20 AND n_tokens <= 1000) AS is_quality
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces
        |  FROM documents)""".stripMargin,

    "q28_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9''\s]+|\s+')) AS BIGINT) AS n_bpe_tokens
        |FROM documents""".stripMargin,

    "q29_stopword_ratio" ->
      """SELECT doc_id, n_stop,
        |  round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS stop_ratio
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> t IN ('the','a','and','of','to','in','is','it','for','on'))) AS BIGINT) AS n_stop,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents)""".stripMargin,

    "q32_embed_dup_pairs" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.451""".stripMargin,

    "q35_media_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN (doc_id % 4 + 1) * 64 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN (doc_id % 3 + 1) * 64 END AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 END AS INT) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN 16 END AS INT) AS n_frames,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 64 WHEN doc_id % 3 = 1 THEN 128 ELSE 256 END AS INT) AS n_bytes
        |FROM documents""".stripMargin,

    "q30_knn_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 8)
        |SELECT query_id, rank, vec_id FROM (
        |  SELECT q.query_id, e.vec_id,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_cosine_similarity(e.embedding, q.qvec) DESC, e.vec_id) AS rank
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id)
        |WHERE rank <= 10""".stripMargin
  )
}
