package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Det._

/** Scalar-function coverage (SURVEY.md §2.5): string / date / math / array /
  * JSON / conditional. The reference parses literals ad hoc inside mapper
  * filter code [RECON]; this is the full function-library surface. Every
  * expression here is a codegen'd Catalyst built-in — no UDFs in this file.
  */
object Scalars {

  /** f1 — string functions over customer (D7: POSIX-safe regex only). */
  def f1(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"),
        upper(col("c_name")).as("uname"),
        lower(col("c_mktsegment")).as("lseg"),
        substring(col("c_name"), 1, 8).as("name8"),
        length(col("c_name")).as("name_len"),
        concat(col("c_name"), lit("@"), col("c_mktsegment")).as("tagged"),
        regexp_replace(col("c_name"), "Customer", "Cust").as("shortname"),
        lpad(col("c_custkey").cast("string"), 12, "0").as("idpad"),
        trim(lit("  pad  ")).as("trimmed"),
        size(split(col("c_name"), "#")).as("split_n"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"))
      .orderBy("c_custkey")

  /** f2 — date functions over orders. dayofweek numbering divergence is
    * normalized oracle-side (DuckDB dow 0=Sun, Spark 1=Sun — SURVEY §2.5 f2).
    */
  def f2(s: SparkSession, d: String): DataFrame = {
    val od = asDate(col("o_orderdate"))
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        year(od).as("yr"), month(od).as("mo"), quarter(od).as("qtr"),
        trunc(od, "month").as("month_start"),
        date_add(od, 30).as("plus30"),
        datediff(od, lit("1995-01-01").cast("date")).as("days_since"),
        last_day(od).as("month_end"),
        dayofweek(od).as("dow"))
      .orderBy("o_orderkey")
  }

  /** f3 — math functions (all float outputs rounded to 4 dp, D4). */
  def f3(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        // *0.01 keeps the true value at exactly 4 dp → round(,4) is tie-free
        // (with *0.001, 2-dp prices put half the rows ON the boundary).
        graft.Det.round4fast(col("l_extendedprice") * 0.01).as("price_k"),
        floor(col("l_quantity")).as("qty_floor"),
        ceil(col("l_quantity")).as("qty_ceil"),
        graft.Det.round4fast(abs(col("l_discount") - 0.05)).as("disc_dev"),
        graft.Det.round4fast(sqrt(col("l_quantity"))).as("qty_sqrt"),
        graft.Det.round4fast(log(col("l_extendedprice"))).as("price_ln"),
        graft.Det.round4fast(exp(col("l_discount"))).as("disc_exp"),
        graft.Det.round4fast(pow(col("l_tax") + 1.0, 2.0)).as("tax_sq"),
        (col("l_orderkey") % 7).as("okey_mod"))
      // (okey, lnum) not unique: extend the sort with columns that pin down
      // the base (price, qty, discount, tax) so the order is total.
      .orderBy("l_orderkey", "l_linenumber", "price_k", "qty_sqrt", "disc_dev", "tax_sq")

  /** f4 — array + higher-order functions over the embedding column. Arrays
    * are cast float→double first so both engines do identical double math.
    */
  def f4(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .withColumn("emb", col("embedding").cast("array<double>"))
      .select(col("vec_id"),
        size(col("emb")).as("dim"),
        round4nz(element_at(col("emb"), 1)).as("first_val"),
        size(filter(col("emb"), x => x > 0.0)).as("pos_cnt"),
        round(aggregate(col("emb"), lit(0.0), (acc, x) => acc + abs(x)), 4).as("l1"),
        round4nz(aggregate(slice(col("emb"), 1, 8), lit(0.0), (acc, x) => acc + x))
          .as("head8_sum"))
      .orderBy("vec_id")

  /** f7 — second string batch: reverse/translate/repeat/contains/position
    * (initcap intentionally absent — DuckDB 1.0 lacks it).
    */
  def f7(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        reverse(col("p_name")).as("rev_name"),
        translate(col("p_type"), "EOC", "eoc").as("xlated"),
        repeat(col("p_brand"), 2).as("brand2"),
        col("p_name").contains("ring").as("has_ring"),
        instr(col("p_name"), "o").cast("int").as("o_pos"))
      .orderBy("p_partkey")

  /** f8 — generic JSON object traversal: parse props into a map, explode
    * (key, value) pairs, aggregate per key.
    */
  /** The events fixture is one parquet row group → one scan task; fan the
    * raw props strings out BEFORE the (CPU-bound) JSON parse so the parse
    * runs at full parallelism instead of on the scan's single task.
    */
  private def eventsFanned(s: SparkSession, d: String, cols: String*): DataFrame =
    Tables.events(s, d).select(cols.map(col): _*)
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)

  def f8(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, MapType, StringType}
    eventsFanned(s, d, "props")
      .select(explode(from_json(col("props"), MapType(StringType, LongType)))
        .as(Seq("key", "val")))
      .groupBy("key")
      .agg(count(lit(1)).as("cnt"), sum(col("val")).as("sum_val"))
      .orderBy("key")
  }

  /** f5 — JSON extraction from events.props + bucketed aggregation. */
  def f5(s: SparkSession, d: String): DataFrame =
    eventsFanned(s, d, "props", "value")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("k_bucket", expr("k div 10"))
      .groupBy("k_bucket")
      .agg(count(lit(1)).as("cnt"),
        out2(sum(dec2(col("value")))).as("sum_value"))
      .orderBy("k_bucket")

  /** f6 — conditional expressions (CASE/COALESCE/NULLIF/LEAST/GREATEST). */
  /** f9 — bitwise scalar surface over int64 keys: and/or/xor, shifts,
    * popcount. Pure integer ops — exact parity by construction (DuckDB
    * spells xor as a function, shifts/and/or as operators).
    */
  def f9(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        (col("o_orderkey").bitwiseAND(255L)).as("low_byte"),
        (col("o_orderkey").bitwiseOR(4096L)).as("with_flag"),
        (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("key_mix"),
        shiftleft(col("o_orderkey"), 3).as("shl3"),
        shiftright(col("o_orderkey"), 2).as("shr2"),
        expr("cast(bit_count(o_orderkey) as integer)").as("popcount"))
      .orderBy("o_orderkey")

  /** f10 — map-typed scalar surface (the §2.5 `map_*` gap): construct a map
    * from literal keys + part columns, then size / element_at / map_keys /
    * map_values / key membership. Map key order is construction order on
    * both engines, so the joined key/value strings are deterministic; the
    * map itself never leaves the row (narrow, no shuffle but the sort).
    */
  def f10(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .withColumn("m", map_from_arrays(
        array(lit("brand"), lit("type"), lit("size")),
        array(col("p_brand"), col("p_type"), col("p_size").cast("string"))))
      .select(col("p_partkey"),
        size(col("m")).cast("bigint").as("n_keys"),
        element_at(col("m"), "type").as("type_val"),
        array_join(map_keys(col("m")), ",").as("keys_csv"),
        array_contains(map_keys(col("m")), "brand").cast("int").as("has_brand"),
        array_join(map_values(col("m")), "|").as("vals_csv"))
      .orderBy("p_partkey")

  def f6(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_acctbal"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("tier"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(none)"))
          .as("seg_or_none"),
        least(col("c_acctbal"), lit(1000.0)).as("bal_min1k"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_nonneg"))
      .orderBy("c_custkey")

  /** f11 — struct-typed scalar surface (completes the nested-type trio with
    * f4's arrays and f10's maps): build a nested struct (profile holding an
    * inner address struct + a derived boolean), then project fields back
    * out through dotted access. Like f10's map, the struct never leaves its
    * row (structs are zero-cost column groupings in Tungsten — field access
    * compiles to a direct column read; emitting only scalar fields keeps
    * the output oracle-comparable per D8).
    */
  def f11(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .withColumn("prof", struct(
        col("c_name").as("name"),
        struct(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg")).as("addr"),
        (col("c_acctbal") > 0).as("pos")))
      .select(col("c_custkey"),
        col("prof.name").as("name"),
        col("prof.addr.nk").as("nk"),
        col("prof.addr.seg").as("seg"),
        col("prof.pos").cast("int").as("pos_bal"))
      .orderBy("c_custkey")

  /** f12 — trigonometric surface (completes f3's math group): sin/cos/tan/
    * atan/atan2/degrees/radians over integer part sizes. Both engines call
    * the same libm family on identical doubles and every output is 4-dp
    * rounded with -0 normalized (sin/cos cross zero), the x30 ln-parity
    * discipline — the rounding absorbs any last-ulp daylight; tan of an
    * integer argument is never at a pole.
    */
  def f12(s: SparkSession, d: String): DataFrame = {
    import graft.Det.round4nz
    Tables.part(s, d)
      .select(col("p_partkey"),
        round4nz(sin(col("p_size"))).as("size_sin"),
        round4nz(cos(col("p_size"))).as("size_cos"),
        round4nz(tan(col("p_size"))).as("size_tan"),
        round4nz(atan(col("p_size"))).as("size_atan"),
        round4nz(atan2(col("p_size").cast("double"),
          col("p_retailprice").cast("double"))).as("sz_atan2"),
        round4nz(degrees(col("p_size"))).as("size_deg"),
        round4nz(radians(col("p_size"))).as("size_rad"))
      .orderBy("p_partkey")
  }

  /** f13 — regex function family over part names: anchored extract (first /
    * last word), global replace (de-voweling — Spark's regexp_replace is
    * global by default, mirrored with DuckDB's 'g' option), a derived count
    * via length difference (dialect-free — avoids regexp_count's engine
    * variance), and rlike → boolean. Patterns stay in plain character
    * classes + anchors, the subset where Java regex and RE2-family engines
    * agree byte-for-byte.
    *
    * Scale: narrow projection, whole-stage codegen, no shuffle besides the
    * output sort.
    */
  def f13(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "^[a-z]+", 0).as("first_word"),
        regexp_extract(col("p_name"), "[a-z]+$", 0).as("last_word"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("devoweled"),
        (length(col("p_name")) -
          length(regexp_replace(col("p_name"), "[aeiou]", "")))
          .cast("bigint").as("n_vowels"),
        col("p_name").rlike("widget$").as("is_widget"))
      .orderBy("p_partkey")

  /** f14 — calendar-truncation family completing f2's date group: month /
    * quarter / week starts (Spark's `date_trunc` returns timestamp — cast
    * back to date; ISO Monday weeks in both engines), `last_day`, and
    * days-in-month derived by date difference (dialect-free — avoids the
    * engines' disagreeing day-of-week numberings).
    *
    * Scale: narrow codegen projection, no shuffle besides the output sort.
    */
  def f14(s: SparkSession, d: String): DataFrame = {
    val dt = col("o_orderdate").cast("date")
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        dt.as("d"),
        date_trunc("month", dt).cast("date").as("month_start"),
        date_trunc("quarter", dt).cast("date").as("quarter_start"),
        date_trunc("week", dt).cast("date").as("week_start"),
        last_day(dt).as("month_end"),
        (datediff(last_day(dt), date_trunc("month", dt).cast("date")) + 1)
          .cast("bigint").as("days_in_month"))
      .orderBy("o_orderkey")
  }

  /** f15 — string functions, third batch: pad/translate/repeat/reverse/
    * position, the formatting-and-probe family f1/f7 left out. Every
    * function is a deterministic pure-string op with an exact DuckDB
    * twin (`lpad`/`rpad` truncate to the target length on both engines
    * when the input is longer; `instr` is 1-based, 0 when absent, on
    * both). The position lands as BIGINT on both sides (Spark's INT
    * out-cast to match DuckDB's wire type — the D9 dtype rule).
    */
  def f15(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(col("p_partkey"), col("p_name"),
      lpad(col("p_name"), 30, ".").as("padded"),
      rpad(col("p_name"), 30, "*").as("rpadded"),
      translate(col("p_name"), "aeiou", "AEIOU").as("shouted"),
      reverse(col("p_name")).as("reversed"),
      repeat(substring(col("p_name"), 1, 3), 2).as("echoed"),
      instr(col("p_name"), "a").cast("bigint").as("first_a"))
      .orderBy("p_partkey")

  /** f16 — EDIT-DISTANCE batch (the fuzzy-matching scalar family j14
    * builds its join on, exposed as plain projections): `levenshtein`
    * between brand and a reference literal, between name and type, the
    * THRESHOLDED form (Spark's 3-arg levenshtein short-circuits past the
    * bound and returns −1 — mirrored in DuckDB as a CASE over the plain
    * distance, same value by definition), and the length-normalized
    * similarity (one double division + D4 round; numerator/denominator
    * both exact ints). Distances out-cast BIGINT (D9, f15's instr rule).
    *
    * Scale: narrow per-row projections, no shuffle; the thresholded form
    * is the one to reach for in a 100 TB fuzzy pass — O(k·min(m,n))
    * instead of O(m·n) per pair.
    */
  def f16(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(col("p_partkey"),
      levenshtein(col("p_brand"), lit("Brand#00")).cast("bigint")
        .as("brand_dist"),
      levenshtein(col("p_name"), col("p_type")).cast("bigint")
        .as("name_type_dist"),
      levenshtein(col("p_name"), col("p_type"), 9).cast("bigint")
        .as("name_type_capped"),
      graft.Det.round4nz(lit(1.0)
        - levenshtein(col("p_name"), col("p_type")).cast("double")
        / greatest(length(col("p_name")), length(col("p_type")))
          .cast("double")).as("name_type_sim"))
      .orderBy("p_partkey")

  /** f17 — HIGHER-ORDER array-function batch (lambda surface beyond f4's
    * filter/aggregate/slice): `transform` (per-element projection),
    * `exists`/`forall` (short-circuit predicates → BOOLEAN columns, D9-
    * stable since s18), `array_max` over a transformed array, and an
    * `aggregate` fold over the transform's output — the Catalyst
    * HigherOrderFunction family DuckDB mirrors as
    * list_transform/list_filter/list_max/list_sum. All lambdas run inside
    * codegen on the tokenized documents pass — a narrow per-row
    * projection, no shuffle, no UDF.
    *
    * Type parity pins: Spark `length` is INT while DuckDB's is BIGINT, so
    * the fold seeds a LONG accumulator and the oracle CASTs its
    * list-derived scalars to the Spark output types (INT counts, BIGINT
    * mass, BOOLEAN flags).
    */
  def f17(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("lens", transform(col("toks"), t => length(t)))
      .select(col("doc_id"),
        size(col("toks")).as("n_toks"),
        array_max(col("lens")).as("max_len"),
        aggregate(col("lens"), lit(0L), (a, x) => a + x).as("char_mass"),
        // thresholds sit inside the fixture's max-token-length range (5–8
        // at every SF), so both flags take both values corpus-wide
        exists(col("lens"), x => x > 6).as("has_long"),
        forall(col("lens"), x => x < 8).as("all_short"),
        size(filter(col("lens"), x => x >= 6)).as("n_ge6"))
      .orderBy("doc_id")

  /** f18 — string FORMATTING batch (the report/export surface f1/f7/f15
    * don't cover): C-style `format_string` (≡ DuckDB `printf` — same
    * conversion spec for `%d`/`%s`), zero/space `lpad`/`rpad`, and a
    * fixed-2-decimal money label. The money label routes through
    * DECIMAL(18,2) and CASTs the decimal to string — NEVER `%f` on the
    * raw double: C printf rounds half-even while Java's Formatter rounds
    * HALF_UP, so the engines can legitimately disagree on a `%.2f` tie,
    * whereas a decimal quantize-then-cast states identical digits on
    * both (D2's formatting corollary). Narrow per-row projection, no
    * shuffle; everything codegen'd.
    */
  def f18(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        format_string("ORD-%09d", col("o_orderkey")).as("order_tag"),
        concat(lit("$"),
          lpad(dec2(col("o_totalprice")).cast("string"), 12, " "))
          .as("price_label"),
        format_string("%s|%s", col("o_orderstatus"), col("o_orderpriority"))
          .as("status_key"),
        lpad(col("o_custkey").cast("string"), 10, "0").as("cust_pad"),
        rpad(col("o_orderstatus"), 3, ".").as("status_pad"))
      .orderBy("o_orderkey")

  /** f19 — URL parsing: a deterministic URL is synthesized per document
    * (scheme://host/path?query from the source/lang/id columns — the fixture
    * carries no real URLs) and `parse_url` extracts each component back,
    * plus one named query parameter — the crawl-pipeline normalization
    * surface (host for domain caps à la x39, path/query for dedup keys).
    * Narrow codegen projection, no shuffle. The oracle states the expected
    * components DIRECTLY from the same source columns (m1's discipline:
    * the check is that Spark's parser returns the constructed truth, not a
    * DuckDB reimplementation of java.net.URI).
    */
  def f19(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("url",
        concat(lit("https://"), col("source"), lit(".example.com/docs/"),
          col("lang"), lit("/"), col("doc_id"),
          lit("?lang="), col("lang"), lit("&chars="), col("n_chars")))
      .select(col("doc_id"), col("url"),
        parse_url(col("url"), lit("PROTOCOL")).as("proto"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY")).as("query"),
        parse_url(col("url"), lit("QUERY"), lit("chars")).as("chars_param"))
      .orderBy("doc_id")

  /** f20 — ERROR-SAFE (try_*) scalar family: `try_divide` (NULL on the
    * fixture's 2,941 zero-discount rows instead of ±Inf/error),
    * `try_cast` (NULL on malformed strings, value otherwise — float
    * strings like '17.0' deliberately avoided: DuckDB TRY_CAST rounds
    * them to INT while Spark's string→int cast rejects them), and
    * `try_element_at` (NULL past the array end, 1-based on both engines).
    * The ANSI-mode ingestion surface: a malformed row yields NULL, never
    * a task failure.
    *
    * PERF (measured): Spark's TRY string→int cast realizes the failure
    * path by CONSTRUCTING the ANSI exception per failing row (TryEval
    * catches it) — an all-malformed 600k-row column cost 8.4 s of a
    * 9.7 s floor (fillInStackTrace dominates); with failures rare the
    * same projection reads ~1.3 s. So the malformed share here is the
    * realistic one-in-a-thousand (l_orderkey % 1000 = 0 rows read a
    * non-numeric string), and the all-malformed shape is the documented
    * anti-pattern: gate a known-dirty column with a cheap regex
    * (rlike '^[0-9]+$') BEFORE try_cast at 100 TB.
    * Narrow codegen projection, no shuffle; the one derived float is
    * 4-dp quantized (D4 — NULL rides through the rounding unchanged).
    */
  def f20(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.Det.round4nz(
          expr("try_divide(l_extendedprice, l_discount)")).as("px_per_disc"),
        expr("try_cast(CASE WHEN l_orderkey % 1000 = 0 THEN l_returnflag" +
          " ELSE cast(l_linenumber AS STRING) END AS INT)").as("line_num"),
        expr("try_cast(cast(l_orderkey AS STRING) AS BIGINT)").as("ok_rt"),
        expr("try_element_at(split(concat(l_returnflag, '-', l_linestatus)," +
          " '-'), 2)").as("status_part"),
        expr("try_element_at(split(concat(l_returnflag, '-', l_linestatus)," +
          " '-'), 5)").as("beyond_end"))
      .orderBy("l_orderkey", "l_linenumber", "px_per_disc")
}
